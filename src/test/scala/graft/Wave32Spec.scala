package graft

/** Value invariants for the round-12 wave-32 operator (q210): the
  * threshold curve must be an exact redistribution of the q31
  * candidate-pair relation. */
class Wave32Spec extends SparkSpec {

  test("q210: curve telescopes and redistributes exactly the q31 candidates") {
    val got = SparkEntry.queries("q210_jaccard_threshold")(spark, sfSmoke)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
      .sortBy(_._1)
    // descending-cumulative telescopes: cum(d) = n(d) + cum(next d)
    got.reverse.foldLeft(0L) { case (acc, (_, n, cum)) =>
      assert(cum == acc + n); cum
    }
    // the histogram partitions the EXACT q31 candidate relation
    val q31n = SparkEntry.queries("q31_dedup_minhash")(spark, sfSmoke).count()
    assert(got.map(_._2).sum == q31n)
    assert(got.nonEmpty && q31n > 0)
    // deciles are sane and the curve is non-trivial (the LSH geometry
    // itself guarantees candidates concentrate high — the sheet SHOWS it)
    assert(got.forall { case (d, _, _) => d >= 0 && d <= 10 })
    assert(got.map(_._1).max >= 8)
  }
}
