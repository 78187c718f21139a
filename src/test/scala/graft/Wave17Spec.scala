package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

/** Value invariants for the round-9 wave-17 operators (q159-q161):
  * driver-side from-scratch replays (independent md5 chain, not the
  * engine's helpers) plus analytic bounds — the first-principles
  * discipline every other wave has (r9 verdict task 5). */
class Wave17Spec extends SparkSpec {

  private def h60(s: String): Long = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }
  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q159: DSIR sheet matches a from-scratch hashed-bigram LM replay") {
    val docs = spark.read.parquet(s"$sfSmoke/documents.parquet")
      .select(col("doc_id"), col("source"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    val B = 1024L
    // per-doc bucket counts (docs with <2 tokens have no bigrams and are
    // absent from the sheet, like the engine's explode)
    val perDocBuckets = docs.flatMap { case (id, src, lang, text) =>
      val toks = text.split(" ", -1)
      if (toks.length < 2) None
      else Some((id, src, lang,
        toks.sliding(2).map(p => h60(p.mkString(" ")) % B)
          .toSeq.groupBy(identity).map { case (b, v) => b -> v.length.toLong }))
    }
    // two add-one-smoothed LMs over the bucket space
    val ct = new Array[Long](B.toInt); val cs = new Array[Long](B.toInt)
    perDocBuckets.foreach { case (_, _, lang, m) =>
      m.foreach { case (b, c) =>
        if (lang == "en") ct(b.toInt) += c else cs(b.toInt) += c }
    }
    val tt = ct.sum; val ts = cs.sum
    def wb(b: Int): Double =
      math.log(((ct(b) + 1.0) * (ts + B.toDouble)) /
        ((cs(b) + 1.0) * (tt + B.toDouble)))
    val perDoc = perDocBuckets.map { case (id, src, _, m) =>
      val num = m.map { case (b, c) => wb(b.toInt) * c }.sum
      (id, src, r6(num / m.values.sum))
    }
    val want = perDoc.groupBy(_._2).toSeq.sortBy(_._1).map { case (src, ds) =>
      val n = ds.length.toLong
      val sel = ds.count(_._3 > 0).toLong
      (src, n, r6(ds.map(_._3).sum / n), sel, r6(sel.toDouble / n))
    }
    val got = SparkEntry.queries("q159_dsir_importance")(spark, sfSmoke)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getDouble(4)))
    assert(got.toSeq == want)
    // both LMs saw mass (the fixture is multilingual) and selection is
    // non-degenerate corpus-wide
    assert(tt > 0 && ts > 0)
    assert(got.map(_._4).sum > 0)
  }

  test("q160: l-diversity census matches a from-scratch QI-class replay") {
    val rows = spark.read.parquet(s"$sfSmoke/customer.parquet")
      .select(col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
      .collect()
      .map(r => ((r.getInt(0), math.floor(r.getDouble(1) / 1000d).toLong),
        r.getString(2)))
    val classes = rows.groupBy(_._1).values.toSeq.map { vs =>
      (vs.map(_._2).distinct.length.toLong, vs.length.toLong)
    }
    val totClasses = classes.length.toLong
    val minL = classes.map(_._1).min
    val want = classes.groupBy(_._1).toSeq.sortBy(_._1).map { case (l, cs) =>
      (l, cs.length.toLong, cs.map(_._2).sum,
        r6(cs.length.toDouble / totClasses), minL)
    }
    val got = SparkEntry.queries("q160_l_diversity")(spark, sfSmoke)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4)))
    assert(got.toSeq == want)
    // census accounting: classes and rows both total up
    assert(got.map(_._2).sum == totClasses)
    assert(got.map(_._3).sum == rows.length.toLong)
    assert(minL >= 1L)
  }

  test("q161: DP release matches a from-scratch keyed-PRF Laplace replay") {
    val docs = spark.read.parquet(s"$sfSmoke/documents.parquet")
      .select(col("source")).collect().map(_.getString(0))
    val want = docs.groupBy(identity).toSeq.sortBy(_._1).map { case (src, ds) =>
      val nTrue = ds.length.toLong
      val u = ((h60(s"$src:dp") % 1048576L) + 0.5) / 1048576.0 - 0.5
      val noise = -10.0 * math.signum(u) * math.log(1.0 - 2.0 * math.abs(u))
      val released = math.max(0L, math.round(nTrue + noise))
      (src, nTrue, r6(noise), released, math.abs(released - nTrue))
    }
    val got = SparkEntry.queries("q161_dp_histogram")(spark, sfSmoke)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq == want)
    // Laplace(10) noise: released stays within a loose tail bound of the
    // truth (|noise| = 10·|ln(1-2|u|)| ≤ 10·ln(2^21) ≈ 146)
    assert(got.forall(_._5 <= 150L))
  }
}
