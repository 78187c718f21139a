package graft

import graft.functions.TextOps
import org.apache.spark.sql.functions._

class DedupTextSpec extends SparkSpec {
  import spark.implicits._

  test("shingles: n-grams, distinctness, short-doc guard") {
    val df = Seq(
      "a b c d e f",     // 2 distinct 5-shingles
      "a b c d e a b c d e a b c d e",  // repeated -> distinct set
      "a b c"            // too short -> empty
    ).toDF("text").select(TextOps.shingles(TextOps.tokens(col("text")), 5).as("sh"))
    val got = df.collect().map(_.getSeq[String](0))
    assert(got(0) == Seq("a b c d e", "b c d e f"))
    assert(got(1).toSet == Set("a b c d e", "b c d e a", "c d e a b", "d e a b c", "e a b c d"))
    assert(got(2).isEmpty)
  }

  test("fingerprint: order- and duplicate-insensitive over token sets") {
    val df = Seq("b a c a", "c b a", "a b d").toDF("text")
      .select(TextOps.fingerprint(TextOps.tokens(col("text"))).as("fp"))
    val fps = df.collect().map(_.getString(0))
    assert(fps(0) == fps(1))   // same token set
    assert(fps(0) != fps(2))
  }

  test("q24 exact dedup is idempotent") {
    val once = SparkEntry.queries("q24_dedup_exact")(spark, sfSmoke).collect()
    assert(once.map(_.getLong(0)).distinct.length == once.length)
    // all copies accounted for
    val total = once.map(_.getLong(1)).sum
    assert(total == graft.sources.Tables.documents(spark, sfSmoke).count())
  }

  test("q25 jaccard pairs are canonical and within [0.2, 1]") {
    val rows = SparkEntry.queries("q25_dedup_near")(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.2 && r.getDouble(2) <= 1.0)
    }
  }

  test("q32 simhash: canonical pairs, hamming bound, identical docs collide") {
    val rows = SparkEntry.queries("q32_dedup_simhash")(spark, sfSmoke).collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      // 120-bit signature: the candidate bound is 30 (the 15/60 twin)
      assert(r.getInt(2) >= 0 && r.getInt(2) <= 30)
    }
  }

  test("q60 clusters: pair endpoints co-clustered, id is the component min") {
    val pairs = SparkEntry.queries("q31_dedup_minhash")(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val clusters = SparkEntry.queries("q60_dup_clusters")(spark, sfSmoke).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pairs.nonEmpty && clusters.nonEmpty)
    // every candidate pair is connected, so both ends share a cluster
    pairs.foreach { case (a, b) =>
      assert(clusters(a) == clusters(b), s"pair ($a,$b) split across clusters") }
    // the cluster label is the minimum member of the component
    clusters.groupBy(_._2).foreach { case (cid, members) =>
      assert(cid == members.keys.min, s"cluster $cid != min member") }
  }

  test("SimHash64 expression: bit votes match per-token md5-60bit folding") {
    graft.functions.SimHash64.register(spark)
    val toks = Seq("spark", "data", "join", "window", "scan")
    // independent fold over the SQL-expressible md5-60bit per-token hashes
    // (conv(substring(md5(t),1,15),16,10) — the same scheme as TextOps.minhash)
    val hashes = toks.toDF("t")
      .select(conv(substring(md5(col("t")), 1, 15), 16, 10).cast("long"))
      .collect().map(_.getLong(0))
    var expected = 0L
    for (b <- 0 until 60) {
      val ones = hashes.count(h => ((h >>> b) & 1L) != 0L)
      if (ones * 2 > hashes.length) expected |= (1L << b)
    }
    val got = Seq((1, toks)).toDF("id", "arr")
      .select(graft.functions.SimHash64(col("arr"))).head().getLong(0)
    assert(got == expected)
    // identical inputs collide; a perturbed input differs
    val sig2 = Seq((2, toks)).toDF("id", "arr")
      .select(graft.functions.SimHash64(col("arr"))).head().getLong(0)
    assert(sig2 == got)
    val sig3 = Seq((3, toks :+ "extra")).toDF("id", "arr")
      .select(graft.functions.SimHash64(col("arr"))).head().getLong(0)
    assert(sig3 != got)
  }

  test("SimHash128: halves match independent md5-60bit folds; lo half equals SimHash64") {
    graft.functions.SimHash128.register(spark)
    graft.functions.SimHash64.register(spark)
    val toks = Seq("spark", "data", "join", "window", "scan")
    // independent fold over the SQL-expressible md5 hex-digit hashes
    // (digits 1-15 and 17-31 — both halves reconstructable in DuckDB)
    val hashes = toks.toDF("t")
      .select(conv(substring(md5(col("t")), 1, 15), 16, 10).cast("long"),
        conv(substring(md5(col("t")), 17, 15), 16, 10).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    var expLo = 0L
    var expHi = 0L
    for (b <- 0 until 60) {
      if (hashes.count(h => ((h._1 >>> b) & 1L) != 0L) * 2 > hashes.length)
        expLo |= (1L << b)
      if (hashes.count(h => ((h._2 >>> b) & 1L) != 0L) * 2 > hashes.length)
        expHi |= (1L << b)
    }
    val sig = Seq((1, toks)).toDF("id", "arr")
      .select(graft.functions.SimHash128(col("arr"))).head().getSeq[Long](0)
    assert(sig == Seq(expLo, expHi))
    // the lo half IS the historical 60-bit signature (same votes, same bits)
    val sig64 = Seq((1, toks)).toDF("id", "arr")
      .select(graft.functions.SimHash64(col("arr"))).head().getLong(0)
    assert(sig(0) == sig64)
    // identical inputs collide; a perturbed input differs
    val sig3 = Seq((3, toks :+ "extra")).toDF("id", "arr")
      .select(graft.functions.SimHash128(col("arr"))).head().getSeq[Long](0)
    assert(sig3 != sig)
  }

  test("minhash signatures agree for identical shingle sets") {
    val df = Seq((1L, "x y z w v u"), (2L, "x y z w v u"), (3L, "p q r s t u"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), explode(TextOps.shingles(TextOps.tokens(col("text")), 5)).as("sh"))
      .groupBy(col("doc_id"))
      .agg(TextOps.minhash(col("sh"), 0).as("h0"), TextOps.minhash(col("sh"), 1).as("h1"))
    val m = df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m(1L) == m(2L))
    assert(m(1L) != m(3L))
  }
}
