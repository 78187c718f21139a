package graft

import graft.util.Geometry
import org.scalatest.funsuite.AnyFunSuite

/** The adaptive-geometry contract (NormalizeTextSpec-style equality): the
  * integer formulas must agree with their real-valued definitions on every
  * n — INCLUDING exact power-of-two boundaries, where the r6 float
  * formulation could diverge between engines by 1 ulp. */
class GeometrySpec extends AnyFunSuite {

  private val sweep: Seq[Long] =
    (0L to 1030L) ++
      (1 to 40).flatMap(e => Seq((1L << e) - 1, 1L << e, (1L << e) + 1)) ++
      Seq(499L, 500L, 5000L, 50000L, 10000000L)

  test("ceilLog2 is the exact integer ceil(log2(n))") {
    for (n <- sweep if n >= 1) {
      val e = Geometry.ceilLog2(n)
      if (n == 1) assert(e == 0)
      else {
        assert(BigInt(1) << e >= BigInt(n), s"2^$e < $n")
        assert(BigInt(1) << (e - 1) < BigInt(n), s"2^${e - 1} >= $n — not minimal")
      }
    }
    assert(Geometry.ceilLog2(0) == 0)
    assert(Geometry.ceilLog2(-5) == 0)
  }

  test("adaptiveBits matches clamp(ceil(log2(n/2^occ))) exactly, boundaries included") {
    for (n <- sweep; occ <- Seq(0, 3, 4)) {
      val got = Geometry.adaptiveBits(n, occ, 8, 24)
      // real-valued reference, computed exactly with BigInt (no float log):
      // smallest b with 2^(b+occ) >= n
      val exact =
        if (n <= 1) 0
        else (0 to 63).find(b => (BigInt(1) << (b + occ)) >= BigInt(n)).get
      assert(got == math.min(24, math.max(8, exact)), s"n=$n occ=$occ")
    }
  }

  test("adaptiveBits reproduces q41's r6 geometry at the measured scales") {
    // fixture (sf0.01, 500 vecs) stays on the 8-bit floor; sf0.1 and sf1
    // land where the r6 float formula put them (log2(5000/8)=9.29 -> 10).
    assert(Geometry.adaptiveBits(500, 3, 8, 24) == 8)
    assert(Geometry.adaptiveBits(5000, 3, 8, 24) == 10)
    assert(Geometry.adaptiveBits(50000, 3, 8, 24) == 13)
    // the boundary case the float form could flip: n/8 an exact power of 2
    assert(Geometry.adaptiveBits(8 * 1024, 3, 8, 24) == 10)   // 2^10 == 1024
    assert(Geometry.adaptiveBits(8 * 1024 + 1, 3, 8, 24) == 11)
  }

  test("adaptiveCodebook tracks sqrt(n) within a factor of 2, clamped") {
    for (n <- sweep if n >= 2) {
      val b = Geometry.adaptiveCodebook(n, 16, 32768).toLong
      if (b > 16 && b < 32768) {
        assert(b.toDouble * b >= n.toDouble / 2, s"B=$b too small for n=$n")
        assert(b.toDouble * b <= 4.0 * n, s"B=$b too large for n=$n")
      }
    }
    // fixture geometry unchanged: 500 vectors keep the 16-centroid codebook
    assert(Geometry.adaptiveCodebook(500, 16, 32768) == 16)
    assert(Geometry.adaptiveCodebook(5000, 16, 32768) == 64)
    assert(Geometry.adaptiveCodebook(1000000, 16, 32768) == 1024)
    assert(Geometry.adaptiveCodebook(0, 16, 32768) == 16)
  }

  test("adaptive knobs are monotone in n") {
    val bits = sweep.filter(_ >= 0).sorted.map(Geometry.adaptiveBits(_, 3, 8, 24))
    assert(bits == bits.sorted)
    val cb = sweep.filter(_ >= 0).sorted.map(Geometry.adaptiveCodebook(_, 16, 32768))
    assert(cb == cb.sorted)
    val dig = sweep.filter(_ >= 0).sorted.map(Geometry.adaptiveDigits(_, 10, 4, 9))
    assert(dig == dig.sorted)
  }

  test("adaptiveDigits matches clamp(ceil(log10(ceil(n/occ)))) exactly, decade boundaries included") {
    val decades = (0 to 12).flatMap(e => {
      val p = BigInt(10).pow(e).toLong
      Seq(p - 1, p, p + 1)
    }).filter(_ >= 0)
    for (n <- sweep ++ decades; occ <- Seq(1L, 10L, 64L)) {
      val got = Geometry.adaptiveDigits(n, occ, 4, 9)
      val m = (n + occ - 1) / occ
      // real-valued reference via BigInt: smallest k with 10^k >= m
      val exact =
        if (m <= 1) 0
        else (0 to 19).find(k => BigInt(10).pow(k) >= BigInt(m)).get
      assert(got == math.min(9, math.max(4, exact)), s"n=$n occ=$occ m=$m")
    }
  }

  test("adaptiveDigits reproduces q156's blocking geometry at the measured scales") {
    // fixtures (sf0.01 1500 / sf0.1 15000 customers) stay on the
    // historical right-4 key; sf1 (150k) and sf3 (450k) widen to 5
    assert(Geometry.adaptiveDigits(1500, 10, 4, 9) == 4)
    assert(Geometry.adaptiveDigits(15000, 10, 4, 9) == 4)
    assert(Geometry.adaptiveDigits(150000, 10, 4, 9) == 5)
    assert(Geometry.adaptiveDigits(450000, 10, 4, 9) == 5)
    // exact decade boundary: n/occ a power of 10
    assert(Geometry.adaptiveDigits(100000, 10, 4, 9) == 4)  // 10^4 == 10000
    assert(Geometry.adaptiveDigits(100001, 10, 4, 9) == 5)
    // degenerate corpora fall to the clamp floor, never to an error
    assert(Geometry.adaptiveDigits(0, 10, 4, 9) == 4)
    assert(Geometry.adaptiveDigits(1, 10, 4, 9) == 4)
  }

  test("adaptiveSampleMod holds the expected sample size constant, boundaries included") {
    import graft.util.Geometry
    // fixture scales stay on the historical q94 modulus (floor 50)
    assert(Geometry.adaptiveSampleMod(500, 50, 5) == 50)
    assert(Geometry.adaptiveSampleMod(1024, 50, 5) == 50)
    // growth: modulus doubles with the corpus, so n/M stays ~2^5
    assert(Geometry.adaptiveSampleMod(2000, 50, 5) == 64)
    assert(Geometry.adaptiveSampleMod(20000, 50, 5) == 1024)
    assert(Geometry.adaptiveSampleMod(1L << 30, 50, 5) == (1L << 25))
    // expected sample n/M bounded in [2^4, 2^6] for every n past the floor
    Seq(3000L, 5000L, 50000L, 1000000L, 123456789L).foreach { n =>
      val m = Geometry.adaptiveSampleMod(n, 50, 5)
      val q = n.toDouble / m
      assert(q >= 16 && q <= 64, s"n=$n m=$m q=$q")
    }
    // exact power-of-two boundary: ceilLog2 flips exactly at 2^k + 1
    assert(Geometry.adaptiveSampleMod(1 << 11, 50, 5) == 64)
    assert(Geometry.adaptiveSampleMod((1 << 11) + 1, 50, 5) == 128)
    // degenerate corpora fall to the floor, never to an error
    assert(Geometry.adaptiveSampleMod(0, 50, 5) == 50)
    assert(Geometry.adaptiveSampleMod(1, 50, 5) == 50)
  }
}
