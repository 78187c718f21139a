package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

/** Value invariants for the round-9 wave-20 operators (q171-q174):
  * driver-side from-scratch replays plus analytic cross-checks between
  * the operators themselves (AUC vs PR curve, Gini vs Lorenz). */
class Wave20Spec extends SparkSpec {

  private def h60(s: String): Long = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }
  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def tokenCounts(): Seq[Long] =
    spark.read.parquet(s"$sfSmoke/documents.parquet")
      .select(col("text")).collect()
      .map(_.getString(0).split(" ", -1).length.toLong).toSeq

  test("q171: Gini and Lorenz shares match a from-scratch sorted replay") {
    val t = tokenCounts().sorted
    val n = t.length
    val s = t.sum
    // direct Gini over the sorted sample: G = 2*sum(i*t_i)/(n*S) - (n+1)/n
    // with 1-based ranks (ties get distinct consecutive ranks — same sum)
    val num = t.zipWithIndex.map { case (v, i) => (i + 1).toLong * v }.sum
    val gini = 2.0 * num / (n.toLong * s) - (n + 1).toDouble / n
    val k1 = (n + 99) / 100
    val k10 = (n + 9) / 10
    val desc = t.reverse
    val top1 = desc.take(k1).sum
    val top10 = desc.take(k10).sum
    val r = SparkEntry.queries("q171_gini_concentration")(spark, sfSmoke)
      .collect().head
    assert(r.getLong(0) == n.toLong)
    assert(r.getLong(1) == s)
    assert(r.getDouble(2) == r6(gini), "gini")
    assert(r.getDouble(3) == r6(top1.toDouble / s), "top1")
    assert(r.getDouble(4) == r6(top10.toDouble / s), "top10")
    // sanity: 0 <= gini < 1, Lorenz shares ordered
    assert(r.getDouble(2) >= 0.0 && r.getDouble(2) < 1.0)
    assert(r.getDouble(3) <= r.getDouble(4))
    assert(r.getDouble(4) >= 0.1 - 1e-9, "top-10% of docs carry >= 10% of mass")
  }

  test("q172: PR curve matches a from-scratch replay and is monotone in the right places") {
    val rows = spark.read.parquet(s"$sfSmoke/embeddings.parquet")
      .select(col("vec_id"), col("label")).collect()
      .map(r => ((r.getInt(1) % 2), h60(s"${r.getLong(0)}:cl") % 1000))
    // the engine emits only NON-EMPTY buckets and NULL-guards each ratio,
    // so the expected bucket set derives from the data (ADVICE r9): a
    // fixture scale leaving a decile empty must not read as a regression
    val posAll = rows.count(_._1 == 1).toLong
    val want = rows.map(_._2 / 100 * 100).distinct.sorted.map { thr =>
      val predPos = rows.count(_._2 >= thr).toLong
      val tp = rows.count(r => r._1 == 1 && r._2 >= thr).toLong
      (thr, predPos, tp, predPos - tp, posAll - tp,
        if (predPos > 0) Some(r6(tp.toDouble / predPos)) else None,
        if (posAll > 0) Some(r6(tp.toDouble / posAll)) else None,
        if (predPos + posAll > 0) Some(r6(2.0 * tp / (predPos + posAll)))
        else None)
    }
    def optD(r: org.apache.spark.sql.Row, i: Int): Option[Double] =
      if (r.isNullAt(i)) None else Some(r.getDouble(i))
    val got = SparkEntry.queries("q172_pr_thresholds")(spark, sfSmoke)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), optD(r, 5), optD(r, 6), optD(r, 7)))
    assert(got.toSeq == want.toSeq)
    // recall is monotone non-increasing in the threshold
    got.sliding(2).foreach(p => assert(p(0)._7.get >= p(1)._7.get))
    // threshold 0 keeps everything: recall 1, precision = base rate
    assert(got.head._7.contains(1.0))
  }

  test("q173: IVF recall curve is well-formed and monotone in nprobe") {
    val got = SparkEntry.queries("q173_ivf_recall")(spark, sfSmoke)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(got.map(_._1).toSeq == Seq(1, 2, 4))
    // all rows agree on the query count and k
    assert(got.map(_._2).distinct.length == 1)
    assert(got.forall(_._3 == 10L))
    // recall is monotone non-decreasing in probe depth (candidate sets nest)
    got.sliding(2).foreach(p => assert(p(0)._5 <= p(1)._5,
      s"recall must not drop with more probes: $p"))
    // and strictly positive — probing the nearest cell finds something
    assert(got.head._5 > 0.0)
    assert(got.forall(_._5 <= 1.0))
  }

  test("q174: ablation sheet matches a from-scratch shingle replay") {
    val docs = spark.read.parquet(s"$sfSmoke/documents.parquet")
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def shingleSet(t: String): Set[String] = {
      val toks = t.split(" ", -1)
      if (toks.length < 5) Set.empty
      else toks.sliding(5).map(_.mkString(" ")).toSet
    }
    // (source, shingle) -> number of docs in that source carrying it
    val occ = docs.flatMap { case (_, src, t) =>
      shingleSet(t).toSeq.map(sg => (src, sg))
    }.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val nsrc = occ.keys.groupBy(_._2).map { case (sg, ks) => sg -> ks.size }
    val globalVocab = nsrc.size.toLong
    val totalPostings = occ.values.sum
    val want = occ.groupBy(_._1._1).toSeq.sortBy(_._1).map { case (src, m) =>
      val vocab = m.size.toLong
      val uniq = m.keys.count(k => nsrc(k._2) == 1).toLong
      val posts = m.values.sum
      (src, posts, vocab, uniq, r6(posts.toDouble / totalPostings),
        r6(uniq.toDouble / globalVocab))
    }
    val got = SparkEntry.queries("q174_source_ablation")(spark, sfSmoke)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5)))
    assert(got.toSeq == want)
    // the fixture's shingle space is rich enough that exclusivity is real
    assert(got.exists(_._4 > 0), "some source must own exclusive shingles")
  }
}
