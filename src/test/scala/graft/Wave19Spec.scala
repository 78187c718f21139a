package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

/** Value invariants for the round-9 wave-19 operators (q166-q170):
  * driver-side from-scratch replays (independent md5 chain, not the
  * engine's helpers) plus analytic bounds. */
class Wave19Spec extends SparkSpec {
  import spark.implicits._

  private def h60(s: String): Long = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def r4(x: Double) =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q166: AUC matches a from-scratch rank-statistic replay and a pairwise count") {
    val rows = spark.read.parquet(s"$sfSmoke/embeddings.parquet")
      .select(col("vec_id"), col("label")).collect()
      .map(r => ((r.getInt(1) % 2), h60(s"${r.getLong(0)}:cl") % 1000))
    val pos = rows.filter(_._1 == 1).map(_._2)
    val neg = rows.filter(_._1 == 0).map(_._2)
    // brute-force pairwise: wins + half-ties over all (pos, neg) pairs
    var wins2 = 0L
    for (p <- pos; q <- neg)
      wins2 += (if (p > q) 2L else if (p == q) 1L else 0L)
    val auc = wins2.toDouble / (2.0 * pos.length * neg.length)
    val r = SparkEntry.queries("q166_roc_auc")(spark, sfSmoke).collect().head
    assert(r.getLong(0) == rows.length.toLong)
    assert(r.getLong(1) == pos.length.toLong)
    assert(r.getLong(2) == neg.length.toLong)
    assert(r.getDouble(3) == r6(auc), "auc")
    assert(r.getDouble(4) == r6(wins2.toDouble / (pos.length.toDouble * neg.length) - 1.0), "gini")
    // an md5 scorer is independent of the label parity: AUC ≈ 0.5
    assert(math.abs(r.getDouble(3) - 0.5) < 0.1, s"auc=${r.getDouble(3)}")
  }

  test("q167: at-risk docs match a from-scratch hot-shingle replay") {
    val docs = spark.read.parquet(s"$sfSmoke/documents.parquet")
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def shingles(t: String): Set[String] = {
      val toks = t.split(" ", -1)
      if (toks.length < 5) Set.empty
      else toks.sliding(5).map(_.mkString(" ")).toSet
    }
    val perDoc = docs.map { case (id, src, t) => (id, src, shingles(t)) }
    val freq = perDoc.flatMap(_._3).groupBy(identity).map { case (k, v) => k -> v.length }
    val hot = freq.filter(_._2 >= 3).keySet
    val risky = perDoc.filter(d => d._3.exists(hot)).map(_._1).toSet
    val want = perDoc.groupBy(_._2).toSeq.sortBy(_._1).map { case (src, ds) =>
      val n = ds.length.toLong
      val k = ds.count(d => risky(d._1)).toLong
      (src, n, k, r6(k.toDouble / n), hot.size.toLong)
    }
    val got = SparkEntry.queries("q167_memorization_risk")(spark, sfSmoke)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4)))
    assert(got.toSeq == want)
    // the fixture's dup clusters guarantee hot shingles exist
    assert(hot.nonEmpty && risky.nonEmpty)
  }

  test("q168: fertility sheet matches a from-scratch per-lang replay") {
    val docs = spark.read.parquet(s"$sfSmoke/documents.parquet")
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val want = docs.groupBy(_._1).toSeq.sortBy(_._1).map { case (lang, ds) =>
      val toks = ds.map(_._2.split(" ", -1))
      val nTok = toks.map(_.length.toLong).sum
      val nBytes = ds.map(_._2.getBytes("UTF-8").length.toLong).sum
      val nChars = ds.map(t => t._2.codePointCount(0, t._2.length).toLong).sum
      val vocab = toks.flatten.distinct.length.toLong
      (lang, ds.length.toLong, nTok, vocab,
        r6(nBytes.toDouble / nTok), r6(nChars.toDouble / nTok),
        r4(nTok.toDouble / ds.length), r6(vocab.toDouble / nTok))
    }
    val got = SparkEntry.queries("q168_tokenizer_fertility")(spark, sfSmoke)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6),
        r.getDouble(7)))
    assert(got.toSeq == want)
    // whitespace tokens average more than one char
    assert(got.forall(_._6 > 1.0))
  }

  test("q169: temperature weights match a from-scratch replay; flattening is monotone") {
    val docs = spark.read.parquet(s"$sfSmoke/documents.parquet")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1).length.toLong))
    val src = docs.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (s, ds) => (s, ds.length.toLong, ds.map(_._2).sum) }
    val tot = src.map(_._3).sum
    def w(alpha: Int, n: Long): Long = alpha match {
      case 100 => n * 1000000L
      case 50  => math.round(math.sqrt(n.toDouble) * 1000000.0)
      case _   => math.round(math.sqrt(math.sqrt(n.toDouble)) * 1000000.0)
    }
    val want = Seq(25, 50, 100).flatMap { a =>
      val sw = src.map(s => w(a, s._3)).sum
      src.map { case (s, nd, nt) =>
        (a, s, nd, nt, r6(w(a, nt).toDouble / sw),
          r4((tot.toDouble * w(a, nt)) / (sw.toDouble * nt)))
      }
    }
    val got = SparkEntry.queries("q169_sampling_temperature")(spark, sfSmoke)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5)))
    assert(got.toSeq == want)
    // flattening: at lower α the largest source's share shrinks and the
    // smallest source's share grows
    val by = got.groupBy(_._1).map { case (a, rs) => a -> rs.sortBy(_._4) }
    val (lo, hi) = (by(25), by(100))
    assert(lo.last._5 <= hi.last._5, "largest source must flatten down")
    assert(lo.head._5 >= hi.head._5, "smallest source must flatten up")
    // probabilities sum to ~1 within integerization error
    by.values.foreach(rs => assert(math.abs(rs.map(_._5).sum - 1.0) < 1e-4))
  }

  test("q170: batch-mix sheet matches a from-scratch replay") {
    val docs = spark.read.parquet(s"$sfSmoke/documents.parquet")
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byBatch = docs.groupBy(d => h60(s"${d._1}:bat") % 64)
    val pb = byBatch.toSeq.map { case (_, ds) =>
      val n = ds.length.toLong
      val maxc = ds.groupBy(_._2).values.map(_.length.toLong).max
      val nsrc = ds.map(_._2).distinct.length.toLong
      (n, nsrc, 1000000L * maxc / n)
    }
    val globMax = docs.groupBy(_._2).values.map(_.length.toLong).max
    val glob = 1000000L * globMax / docs.length
    val r = SparkEntry.queries("q170_batch_mix")(spark, sfSmoke).collect().head
    assert(r.getLong(0) == pb.length.toLong, "n_batches")
    assert(r.getLong(1) == pb.map(_._2).min, "min_sources")
    assert(r.getLong(2) == pb.map(_._2).max, "max_sources")
    assert(r.getDouble(3) == r4(pb.map(_._2).sum.toDouble / pb.length))
    assert(r.getLong(4) == pb.map(_._3).max, "worst_share_ppm")
    assert(r.getDouble(5) ==
      BigDecimal(pb.map(_._3).sum.toDouble / pb.length)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getLong(6) == glob, "global_share_ppm")
    assert(r.getDouble(7) == r4(pb.map(_._3).max.toDouble / glob), "skew")
    // the worst batch can never beat the global share, and a share is
    // a fraction (ppm ≤ 10⁶); at smoke scale (~8 docs/batch) the worst
    // batch is legitimately concentrated, so no upper skew bound here
    assert(r.getDouble(7) >= 1.0 && r.getLong(4) <= 1000000L)
  }
}
