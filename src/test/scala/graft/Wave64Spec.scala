package graft

/** q242 (vector-serving e2e certificate) replayed from scratch in plain
  * driver Scala — same int8 quantization rule, same √n codebook, same
  * round-6 argmax assignment, same 2-probe quantized serve vs exact
  * float baseline — plus the sheet's structural invariants: recall is a
  * fraction of exact pairs, every quantizable vector saturates at least
  * one code, and occupancy accounts for every vector. */
class Wave64Spec extends SparkSpec {

  private def r(v: Double, scale: Int): Double =
    BigDecimal(v).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** CosineSim's exact semantics: strict left-to-right double fold over
    * float components, clamped to [-1, 1]. */
  private def cos6(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    val v = dot / (math.sqrt(na) * math.sqrt(nb))
    r(math.max(-1.0, math.min(1.0, v)), 6)
  }

  test("q242 equals a from-scratch driver replay; invariants hold") {
    val vecs = graft.sources.Tables.embeddings(spark, sfSmoke)
      .collect()
      .map(row => (row.getLong(0),
        row.getSeq[Float](1).toArray))
      .sortBy(_._1)
    val n = vecs.length
    val b = graft.util.Geometry.adaptiveCodebook(n.toLong, 16, 1 << 20)
    // quantize (q59 rule) + reconstruct
    val m = vecs.map { case (_, v) => v.map(x => math.abs(x.toDouble)).max }
    val codes = vecs.zip(m).map { case ((_, v), mi) =>
      v.map(x => r(x.toDouble * 127 / mi, 0).toInt)
    }
    val rv = codes.zip(m).map { case (cs, mi) =>
      cs.map(c => (c.toDouble * mi / 127).toFloat)
    }
    // IVF assignment (q37 rule): argmax over round-6 cosine, ties to cid
    val cents = vecs.filter(_._1 < b)
    def assign(v: Array[Float]): Long =
      cents.map { case (cid, cv) => (cos6(v, cv), cid) }
        .maxBy { case (s, cid) => (s, -cid) }._2
    val cid = vecs.map { case (_, v) => assign(v) }
    // serve: 8 float queries, 2-probe over the quantized corpus
    val queries = vecs.filter(_._1 < 8)
    def topk(cands: Seq[(Long, Double)], k: Int): Set[Long] =
      cands.sortBy { case (id, s) => (-s, id) }.take(k).map(_._1).toSet
    val exact = queries.map { case (qid, qv) =>
      qid -> topk(vecs.filter(_._1 != qid)
        .map { case (id, v) => (id, cos6(v, qv)) }.toSeq, 10)
    }
    val approx = queries.map { case (qid, qv) =>
      val probed = cents.map { case (c, cv) => (cos6(cv, qv), c) }
        .sortBy { case (s, c) => (-s, c) }.take(2).map(_._2).toSet
      qid -> topk(vecs.indices
        .filter(i => probed.contains(cid(i)) && vecs(i)._1 != qid)
        .map(i => (vecs(i)._1, cos6(rv(i), qv))), 10)
    }.toMap
    val exactPairs = exact.map(_._2.size).sum.toLong
    val hitPairs = exact.map { case (qid, ex) =>
      ex.intersect(approx(qid)).size }.sum.toLong
    val want = Map(
      ("a_ingest", "n_vectors") -> n.toLong,
      ("a_ingest", "n_components") -> vecs.map(_._2.length.toLong).sum,
      ("b_quantize", "quantizable_vectors") ->
        m.count(_ > 0).toLong,
      ("b_quantize", "saturated_codes") ->
        codes.map(_.count(c => math.abs(c) == 127).toLong).sum,
      ("b_quantize", "recon_sim_e6_sum") ->
        vecs.indices.map(i =>
          math.floor(cos6(vecs(i)._2, rv(i)) * 1000000 + 0.5).toLong).sum,
      ("c_index", "n_cells") -> b.toLong,
      ("c_index", "nonempty_cells") -> cid.distinct.length.toLong,
      ("c_index", "max_cell_rows") ->
        cid.groupBy(identity).values.map(_.length).max.toLong,
      ("d_serve", "exact_pairs") -> exactPairs,
      ("d_serve", "hit_pairs") -> hitPairs,
      ("d_serve", "recall_e6") ->
        hitPairs * 1000000L / math.max(exactPairs, 1L))
    val got = SparkEntry.queries("q242_vector_e2e")(spark, sfSmoke)
      .collect()
      .map(row => (row.getString(0), row.getString(1)) -> row.getLong(2))
      .toMap
    assert(got == want,
      s"diff: ${(got.toSet -- want.toSet) ++ (want.toSet -- got.toSet)}")
    // structure: the serve stage found something and recall is a fraction
    assert(exactPairs == 10L * queries.length)
    assert(hitPairs >= 0 && hitPairs <= exactPairs)
    // every quantizable vector saturates its max component to ±127
    assert(want(("b_quantize", "saturated_codes")) >=
      want(("b_quantize", "quantizable_vectors")))
    // occupancy accounts for every vector
    assert(cid.length == n)
  }
}
