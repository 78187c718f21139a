package graft

import org.apache.spark.sql.functions._

/** Reference-parity tests (SURVEY §5): regenerate the reference's exact
  * input sequences — mt19937_64 from the published Matsumoto–Nishimura
  * algorithm, seeded and masked as the reference does (parallel_sort.cpp:
  * 43-46 seed 12345; max_aggregation.cpp:35-38 seed 999) — and assert the
  * Spark operators reproduce the reference's golden outputs, including
  * `Final max: 2147482196` (reference README.md:61).
  */
class ReferenceParitySpec extends SparkSpec {

  /** Minimal mt19937_64 (public algorithm). */
  private final class Mt19937_64(seed: Long) {
    private val NN = 312
    private val mt = new Array[Long](NN)
    private var mti = NN + 1
    mt(0) = seed
    for (i <- 1 until NN)
      mt(i) = 6364136223846793005L * (mt(i - 1) ^ (mt(i - 1) >>> 62)) + i
    mti = NN

    def next(): Long = {
      if (mti >= NN) {
        val MM = 156
        val MatrixA = 0xB5026F5AA96619E9L
        val UM = 0xFFFFFFFF80000000L
        val LM = 0x7FFFFFFFL
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

    /** The reference's value transform: rng() & 0x7fffffff. */
    def nextMasked(): Int = (next() & 0x7FFFFFFFL).toInt
  }

  private def gen(seed: Long, n: Int): Array[Int] = {
    val rng = new Mt19937_64(seed)
    Array.fill(n)(rng.nextMasked())
  }

  test("golden MAX: seed 999, N=10^6 -> 2147482196 via Spark aggregation") {
    import spark.implicits._
    val data = gen(999, 1000000)
    val ds = spark.sparkContext.parallelize(data.toIndexedSeq, 8).toDS()
    val got = ds.agg(max("value")).head().getInt(0)
    assert(got == 2147482196)
  }

  test("sort parity: seed 12345, N=131072 — Spark orderBy == reference sorted output") {
    import spark.implicits._
    val data = gen(12345, 131072)
    val ds = spark.sparkContext.parallelize(data.toIndexedSeq, 8).toDS()
    val sparkSorted = ds.orderBy("value").as[Int].collect()
    val expected = data.sorted
    assert(java.util.Arrays.equals(sparkSorted, expected))
    // the reference's own post-check (parallel_sort.cpp:137-142)
    assert(sparkSorted.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
  }
}
