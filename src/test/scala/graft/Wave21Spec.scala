package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

/** Value invariants for the round-9 wave-21 operators (q175-q178):
  * driver-side from-scratch replays of the blocklist audit, the
  * duplication-inflation sheet, the freshness decay profile, and the
  * vocabulary-coverage audit, plus the analytic invariants that tie
  * them together (decay masses nest in the half-life, raw >= dedup,
  * OOV + in-vocab partitions the token mass). */
class Wave21Spec extends SparkSpec {

  private def h60(s: String): Long = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }
  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def docs(): Seq[(Long, String, Array[String])] =
    spark.read.parquet(s"$sfSmoke/documents.parquet")
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split(" ", -1))).toSeq

  test("q175: blocklist audit matches a from-scratch MD5 replay") {
    val ds = docs()
    val blocked = (t: String) => h60(t + ":bl") % 16 == 0
    val perSrc = ds.groupBy(_._2).toSeq.sortBy(_._1).map { case (src, rows) =>
      val nDocs = rows.length.toLong
      val hits = rows.count(_._3.exists(blocked)).toLong
      val nTok = rows.map(_._3.length.toLong).sum
      val occ = rows.map(_._3.count(blocked).toLong).sum
      (src, nDocs, hits, r6(hits.toDouble / nDocs), nTok, occ,
        occ * 1000000L / nTok)
    }
    val vocab = ds.flatMap(_._3).distinct.count(blocked).toLong
    val got = SparkEntry.queries("q175_blocklist_audit")(spark, sfSmoke)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(got.map(_._8).distinct.toSeq == Seq(vocab), "blocked vocabulary")
    assert(got.map(t => (t._1, t._2, t._3, t._4, t._5, t._6, t._7)).toSeq
      == perSrc)
    // the PRF keeps the list selective: well under half the mass blocked
    got.foreach(r => assert(r._7 < 500000L, s"ppm runaway: $r"))
  }

  test("q176: inflation sheet matches a from-scratch cluster replay") {
    val ds = docs()
    val cl = ds.groupBy(d => d._3.mkString(" ")).values.toSeq
      .map(rows => (rows.length.toLong, rows.head._3.length.toLong))
    val raw = cl.map { case (c, v) => v * c }.sum
    val dedup = cl.map(_._2).sum
    val sqrtMicro = cl.map { case (c, v) =>
      math.round(v.toDouble * math.sqrt(c.toDouble) * 1000000.0)
    }.sum
    val r = SparkEntry.queries("q176_dup_inflation")(spark, sfSmoke)
      .collect().head
    assert(r.getLong(0) == ds.length.toLong, "n_docs")
    assert(r.getLong(1) == cl.length.toLong, "n_clusters")
    assert(r.getLong(2) == ds.length.toLong - cl.length, "dup_docs")
    assert(r.getLong(3) == raw, "raw_tokens")
    assert(r.getLong(4) == dedup, "dedup_tokens")
    assert(r.getDouble(5) == r6(raw.toDouble / dedup), "inflation")
    assert(r.getLong(6) == sqrtMicro, "sqrt_mass_micro")
    // sqrt damping sits between dedup-to-one and raw
    assert(r.getDouble(5) >= 1.0)
    assert(r.getDouble(7) >= 1.0 - 1e-9 && r.getDouble(7) <= r.getDouble(5))
  }

  test("q177: decay profile matches an exact power-of-two replay") {
    val ev = spark.read.parquet(s"$sfSmoke/events.parquet")
      .select(col("event_type"), unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val mx = ev.map(_._2).max
    def wsum(rows: Seq[Long], days: Int): Long = rows.map { us =>
      val k = math.min((mx - us) / (days * 86400000000L), 40L).toInt
      1L << (40 - k)
    }.sum
    val want = ev.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, rows) =>
      val us = rows.map(_._2)
      (t, us.length.toLong, wsum(us, 7), wsum(us, 30), wsum(us, 90))
    }
    val got = SparkEntry.queries("q177_decay_profile")(spark, sfSmoke)
      .collect()
    assert(got.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(5), r.getLong(8))).toSeq == want)
    got.foreach { r =>
      val n = r.getLong(1)
      // derived columns are single rounded scalings of the exact sums
      assert(r.getDouble(3) == r6(r.getLong(2) / 1099511627776.0))
      assert(r.getDouble(4) == r6(r.getLong(2) / (n * 1099511627776.0)))
      // masses nest: a longer half-life keeps at least as much
      assert(r.getLong(2) <= r.getLong(5) && r.getLong(5) <= r.getLong(8))
      // and never exceed the undecayed mass n (weight <= 2^40 each)
      assert(r.getLong(8) <= n * 1099511627776L)
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0)
    }
  }

  test("q178: OOV audit matches a from-scratch top-V replay") {
    val ds = docs()
    val freq = ds.flatMap(_._3).groupBy(identity)
      .map { case (t, xs) => (t, xs.length.toLong) }.toSeq
    val vocab = freq.sortBy { case (t, c) => (-c, t) }.take(16)
      .map(_._1).toSet
    val perSrc = ds.groupBy(_._2).toSeq.sortBy(_._1).map { case (src, rows) =>
      val nTok = rows.map(_._3.length.toLong).sum
      val oov = rows.map(_._3.count(t => !vocab(t)).toLong).sum
      val clean = rows.count(_._3.forall(vocab)).toLong
      (src, rows.length.toLong, nTok, oov, oov * 1000000L / nTok,
        r6(clean.toDouble / rows.length))
    }
    val got = SparkEntry.queries("q178_vocab_coverage")(spark, sfSmoke)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(got.toSeq == perSrc)
    // the head vocabulary covers the majority of the token mass
    val (tokAll, oovAll) = (got.map(_._3).sum, got.map(_._4).sum)
    assert(oovAll < tokAll - oovAll, "top-V head must cover most mass")
  }
}
