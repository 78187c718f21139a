package graft

import org.apache.spark.sql.functions._

/** Value invariants for the wave-5 operators (q96-q99): each query's
  * result is cross-checked against an independently computed local truth
  * on the smoke fixture — the same facts the DuckDB oracle asserts at
  * sf0.01, provable here without DuckDB.
  */
class Wave5Spec extends SparkSpec {

  private def run(key: String) = SparkEntry.queries(key)(spark, sfSmoke)

  test("q96: shares are exact basis points of the true total") {
    val total = spark.read.parquet(s"$sfSmoke/lineitem.parquet").count()
    val rows = run("q96_key_skew").collect()
    assert(rows.length <= 20)
    // descending by count, ties by key
    val cnts = rows.map(_.getLong(1))
    assert(cnts.sameElements(cnts.sortBy(-_)))
    rows.foreach { r =>
      assert(r.getLong(2) == r.getLong(1) * 10000 / total,
        s"share_bp mismatch for key ${r.get(0)}")
    }
    // the head row really is the modal key
    val top = spark.read.parquet(s"$sfSmoke/lineitem.parquet")
      .groupBy("l_partkey").count().orderBy(col("count").desc, col("l_partkey"))
      .head()
    assert(rows.head.get(0) == top.get(0) && rows.head.getLong(1) == top.getLong(1))
  }

  test("q97: histogram mass equals twice the candidate-pair count") {
    val pairs = run("q31_dedup_minhash").count()
    val hist = run("q97_dup_graph_degree").collect()
    val mass = hist.map(r => r.getLong(0) * r.getLong(1)).sum
    assert(mass == 2 * pairs, s"sum(degree*n_docs)=$mass vs 2*|pairs|=${2 * pairs}")
    assert(hist.map(_.getLong(0)).forall(_ >= 1))
  }

  test("q98: entropy matches a local recompute and its analytic bounds") {
    val docs = spark.read.parquet(s"$sfSmoke/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = run("q98_char_entropy").collect()
    assert(rows.length == docs.size)
    rows.foreach { r =>
      val (id, k, h) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      val text = docs(id)
      val counts = text.groupBy(identity).values.map(_.length)
      assert(k == counts.size, s"doc $id alphabet size")
      val n = text.length.toDouble
      val expected = -counts.map { c =>
        (c / n) * (math.log(c / n) / math.log(2.0))
      }.sum
      assert(math.abs(h - expected) < 5e-4, s"doc $id entropy $h vs $expected")
      // 0 <= H <= log2(alphabet)
      assert(h >= 0 && h <= math.log(k.toDouble) / math.log(2.0) + 1e-9)
    }
  }

  test("q99: pair counts match a local brute-force recompute") {
    val words = spark.read.parquet(s"$sfSmoke/documents.parquet")
      .select("text").collect().iterator
      .flatMap(_.getString(0).split(" ", -1)).filter(_.length >= 2).toSeq
    val truth = words.flatMap(w => w.sliding(2)).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val rows = run("q99_bpe_pair_stats").collect()
    assert(rows.length <= 30)
    rows.foreach { r =>
      assert(truth(r.getString(0)) == r.getLong(1), s"pair ${r.getString(0)}")
    }
    // the head row is the true argmax under (cnt desc, pair asc)
    val best = truth.toSeq.sortBy { case (p, c) => (-c, p) }.head
    assert((rows.head.getString(0), rows.head.getLong(1)) == best)
  }
}
