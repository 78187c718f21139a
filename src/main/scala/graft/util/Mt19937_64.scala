package graft.util

/** mt19937_64 (Matsumoto–Nishimura, public algorithm), matching C++
  * std::mt19937_64 output for a given scalar seed. Used to regenerate the
  * reference's exact input sequences (parallel_sort.cpp:43-46 seed 12345;
  * max_aggregation.cpp:35-38 seed 999) for parity demos and tests.
  */
final class Mt19937_64(seed: Long) {
  private val NN = 312
  private val MM = 156
  private val MatrixA = 0xB5026F5AA96619E9L
  private val UM = 0xFFFFFFFF80000000L
  private val LM = 0x7FFFFFFFL
  private val mt = new Array[Long](NN)
  private var mti = NN

  mt(0) = seed
  for (i <- 1 until NN)
    mt(i) = 6364136223846793005L * (mt(i - 1) ^ (mt(i - 1) >>> 62)) + i

  def next(): Long = {
    if (mti >= NN) {
      var i = 0
      while (i < NN - MM) {
        val x = (mt(i) & UM) | (mt(i + 1) & LM)
        mt(i) = mt(i + MM) ^ (x >>> 1) ^ (if ((x & 1L) != 0) MatrixA else 0L)
        i += 1
      }
      while (i < NN - 1) {
        val x = (mt(i) & UM) | (mt(i + 1) & LM)
        mt(i) = mt(i + (MM - NN)) ^ (x >>> 1) ^ (if ((x & 1L) != 0) MatrixA else 0L)
        i += 1
      }
      val x = (mt(NN - 1) & UM) | (mt(0) & LM)
      mt(NN - 1) = mt(MM - 1) ^ (x >>> 1) ^ (if ((x & 1L) != 0) MatrixA else 0L)
      mti = 0
    }
    var x = mt(mti)
    mti += 1
    x ^= (x >>> 29) & 0x5555555555555555L
    x ^= (x << 17) & 0x71D67FFFEDA60000L
    x ^= (x << 37) & 0xFFF7EEE000000000L
    x ^= x >>> 43
    x
  }

  /** The reference's value transform: rng() & 0x7fffffff (non-negative
    * int32 domain). */
  def nextMasked(): Int = (next() & 0x7FFFFFFFL).toInt
}

object Mt19937_64 {
  def maskedSequence(seed: Long, n: Int): Array[Int] = {
    val rng = new Mt19937_64(seed)
    Array.fill(n)(rng.nextMasked())
  }
}
