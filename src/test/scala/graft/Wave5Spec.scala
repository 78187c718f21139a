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

  test("char_entropy kernel: analytic golden values") {
    import spark.implicits._
    graft.functions.CharEntropy.register(spark)
    val rows = Seq("abcd", "aaaa", "aabb", "").toDF("t")
      .select(graft.functions.CharEntropy(col("t")).as("e"))
      .select(col("e.n_distinct_chars"), col("e.entropy"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows(0) == ((4L, 2.0)))  // uniform over 4 symbols -> 2 bits
    assert(rows(1) == ((1L, 0.0)))  // constant -> 0 bits
    assert(rows(2) == ((2L, 1.0)))  // fair coin -> 1 bit
    assert(rows(3) == ((0L, 0.0)))  // empty -> defined as 0
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
      // 0 <= H <= log2(alphabet); empty text (k = 0) is defined as H = 0
      if (k == 0) assert(h == 0.0, s"doc $id empty text must score 0")
      else assert(h >= 0 && h <= math.log(k.toDouble) / math.log(2.0) + 1e-9)
    }
  }

  test("q100: equals the full-corpus pairs restricted to new endpoints") {
    val full = run("q31_dedup_minhash").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = full.filter { case (u, v) => u % 10 == 7 || v % 10 == 7 }
      .sorted.toSeq
    val inc = run("q100_incremental_dedup").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(inc == expected)
    // and it is a real restriction: no old×old pair leaks through
    assert(inc.forall { case (u, v) => u % 10 == 7 || v % 10 == 7 })
  }

  test("q101: buckets partition the corpus into ordered NLL terciles") {
    val rows = run("q101_perplexity_bucket").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val total = spark.read.parquet(s"$sfSmoke/documents.parquet").count()
    assert(rows.map(_._2).sum == total)
    val byBucket = rows.map(r => r._1 -> r._3).toMap
    assert(byBucket.keySet == Set("head", "middle", "tail"))
    // tercile means are ordered and sizes are near-equal thirds
    assert(byBucket("head") < byBucket("middle") &&
      byBucket("middle") < byBucket("tail"))
    rows.foreach { case (_, n, _) =>
      assert(math.abs(n - total / 3.0) <= total / 6.0, s"lopsided tercile: $n")
    }
  }

  test("q102: matches an exact local replay of integer Lloyd iterations") {
    val vecs = spark.read.parquet(s"$sfSmoke/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)
        .map(x => BigDecimal(x.toDouble * 1000)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toIndexedSeq)
      .sortBy(_._1)
    def md5Hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    var cents = vecs.sortBy { case (id, _) => (md5Hex(id.toString), id) }
      .take(4).zipWithIndex.map { case ((_, qv), i) => (i + 1).toLong -> qv }.toSeq
    def assignAll() = vecs.map { case (id, qv) =>
      val (bestId, _) = cents.map { case (c, cv) =>
        c -> qv.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum
      }.minBy { case (c, dist) => (dist, c) }
      id -> bestId
    }
    for (_ <- 1 to 2) {
      val byC = assignAll().groupBy(_._2)
      cents = byC.toSeq.sortBy(_._1).map { case (c, members) =>
        val qvs = members.map(m => vecs(vecs.indexWhere(_._1 == m._1))._2)
        c -> (0 until 64).map(i => qvs.map(_(i)).sum / qvs.length).toIndexedSeq
      }
    }
    val want = assignAll().groupBy(_._2).toSeq.sortBy(_._1).map {
      case (c, members) =>
        (c, members.length.toLong, members.map(_._1).min, members.map(_._1).max,
          cents.find(_._1 == c).get._2.sum)
    }
    val got = run("q102_kmeans").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == want)
  }

  test("q103: transition mass and per-state probability simplex") {
    val ev = graft.sources.Tables.events(spark, sfSmoke)
    val n = ev.count()
    val users = ev.select("user_id").distinct().count()
    val rows = run("q103_markov_transitions").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._3).sum == n - users)
    rows.groupBy(_._1).foreach { case (from, ts) =>
      assert(math.abs(ts.map(_._4).sum - 1.0) < 1e-9, s"from=$from")
    }
  }

  test("q104: orphans are exactly the docs outside every shared bucket") {
    val docs = spark.read.parquet(s"$sfSmoke/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val shingleDocs = docs.flatMap { case (id, text) =>
      val t = text.split(" ", -1)
      if (t.length < 5) Seq.empty
      else t.sliding(5).map(_.mkString(" ")).toSeq.distinct.map(_ -> id)
    }.groupBy(_._1).filter(_._2.length <= 1000) // stop-shingle cap
    val shared = shingleDocs.values.filter(_.length >= 2)
      .flatMap(_.map(_._2)).toSet
    val wantOrphans = docs.map(_._1).filterNot(shared).sorted.toSeq
    val got = run("q104_shingle_orphans").collect().map(_.getLong(0)).toSeq
    assert(got == wantOrphans)
  }

  test("q105: histogram mass, monotone cumsum, true median bucket") {
    val prices = spark.read.parquet(s"$sfSmoke/lineitem.parquet")
      .select("l_extendedprice").collect().map(_.getDouble(0)).sorted
    val rows = run("q105_histogram").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getBoolean(5)))
    assert(rows.map(_._2).sum == prices.length)
    assert(rows.map(_._3).toSeq == rows.map(_._2).scanLeft(0L)(_ + _).tail.toSeq)
    val medianBuckets = rows.filter(_._4)
    assert(medianBuckets.length == 1)
    // the exact lower median lands inside the flagged bucket
    val med = prices((prices.length - 1) / 2)
    val b = medianBuckets.head._1
    assert(med >= b * 5000 && med < (b + 1) * 5000)
  }

  test("q106: every frame pairs with the latest caption at or before it") {
    val caps = run("q106_frame_caption_align").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val frames = run("q62_frame_sample").count()
    assert(caps.length == frames) // no probe misses, no fan-out
    caps.foreach { case (_, frameNo, _, capStart) =>
      assert(capStart <= frameNo * 64, s"caption after frame $frameNo")
    }
    // caption ids are monotone along each doc's frame sequence
    caps.groupBy(_._1).foreach { case (docId, rows) =>
      val ordered = rows.sortBy(_._2).map(_._3)
      assert(ordered.zip(ordered.tail).forall { case (a, b) => a <= b },
        s"doc $docId caption sequence not monotone")
    }
  }

  test("q107: norms and centroid cosines respect analytic bounds") {
    val total = spark.read.parquet(s"$sfSmoke/embeddings.parquet").count()
    val rows = run("q107_embedding_audit").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.map(_._2).sum == total)
    rows.foreach { case (label, _, norm, cos) =>
      assert(norm > 0, s"$label norm")
      assert(cos >= -1.0 - 1e-9 && cos <= 1.0 + 1e-9, s"$label cosine $cos")
      // members should lean TOWARD their own centroid
      assert(cos > 0, s"$label mean cosine to own centroid is $cos")
    }
  }

  test("q108: phases partition the corpus and respect the token budget") {
    val rows = run("q108_curriculum_pack").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val docs = spark.read.parquet(s"$sfSmoke/documents.parquet")
    val totalDocs = docs.count()
    val totalTokens = docs.selectExpr("sum(size(split(text, ' ')))")
      .head().getLong(0)
    assert(rows.map(_._2).sum == totalDocs)
    assert(rows.map(_._3).sum == totalTokens)
    // phases are contiguous from 0 and easier (higher score) phases come first
    assert(rows.map(_._1).toSeq == rows.indices.map(_.toLong))
    val scores = rows.map(_._4)
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      s"avg scores not descending: ${scores.toSeq}")
    // a doc starts a new phase only after the previous budget is filled:
    // every phase except the last holds >= budget - max_doc_tokens
    val maxDoc = docs.selectExpr("max(size(split(text, ' ')))").head().getInt(0)
    rows.init.foreach { case (p, _, tok, _) =>
      assert(tok >= 10000 - maxDoc, s"phase $p underfilled: $tok")
    }
  }

  test("q109: exact counts are exact; sketches degrade gracefully") {
    val truth = spark.read.parquet(s"$sfSmoke/documents.parquet")
      .selectExpr("source", "explode(split(text, ' ')) AS tok")
      .distinct().groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = run("q109_kmv_distinct").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.length == truth.size)
    rows.foreach { case (src, exact, est, relErr) =>
      assert(exact == truth(src), s"$src exact")
      if (exact < 256) assert(est == exact.toDouble, s"$src small-set exact path")
      else assert(relErr < 0.25, s"$src sketch error $relErr") // k=256 → ~6% σ
    }
  }

  test("q110: z-scores match an exact local recompute, boundary included") {
    val counts = graft.sources.Tables.events(spark, sfSmoke)
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = counts.size.toDouble
    val mu = counts.values.sum.toDouble / n
    val sigma = math.sqrt(counts.values.map(c => c.toDouble * c).sum / n - mu * mu)
    val want = counts.toSeq.map { case (u, c) => (u, c, (c - mu) / sigma) }
      .filter { case (_, _, z) => math.abs(z) >= 2.0 }
      .map { case (u, c, z) =>
        (u, c, BigDecimal(z).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.sortBy(_._1)
    val got = run("q110_rate_outliers").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == want)
  }

  test("q111: triangle counts match a local brute-force recompute") {
    val edges = run("q31_dedup_minhash").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val verts = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val adj = edges ++ edges.map(_.swap)
    val triCount = scala.collection.mutable.Map.empty[Long, Long]
    for {
      (u, v) <- edges
      w <- verts if v < w
      if adj((u, w)) && adj((v, w))
    } Seq(u, v, w).foreach(x => triCount(x) = triCount.getOrElse(x, 0L) + 1)
    val want = triCount.toSeq.sorted
    val got = run("q111_triangle_census").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want)
  }

  test("q113: selection equals an exact local replay of the weighted line") {
    def md5Hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val docs = spark.read.parquet(s"$sfSmoke/documents.parquet")
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, _) => (md5Hex(id.toString), id) }
    val total = docs.map(_._2).sum
    val step = total / 50
    var cum = 0L
    val want = docs.flatMap { case (id, w) =>
      cum += w
      if ((cum - 1) / step > (cum - w - 1) / step) Some((id, w, cum)) else None
    }.sortBy(_._1).toSeq
    val got = run("q113_weighted_sample").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
    assert(got.length >= 40 && got.length <= 50, s"sample size ${got.length}")
  }

  test("q114/q115: cohort mass and funnel monotonicity") {
    val ev = graft.sources.Tables.events(spark, sfSmoke)
    // every signup user appears in their cohort's offset-0-or-later cells
    val signups = ev.filter(col("event_type") === "signup")
      .select("user_id").distinct().count()
    val cohorts = run("q114_retention_cohorts").collect()
      .map(r => (r.getDate(0), r.getLong(1), r.getLong(2)))
    assert(cohorts.nonEmpty && cohorts.forall(_._2 >= 0))
    val off0 = cohorts.filter(_._2 == 0L).map(_._3).sum
    assert(off0 == signups) // signup itself is offset-0 activity
    val steps = run("q115_funnel_steps").collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(steps.map(_._1).toSeq == Seq("1_view", "2_click", "3_purchase"))
    val ns = steps.map(_._2)
    assert(ns.zip(ns.tail).forall { case (a, b) => b <= a }, ns.toSeq)
    assert(steps.head._3.isEmpty)
    steps.tail.zip(ns).foreach { case ((_, n, conv), prev) =>
      assert(conv.contains(n.toDouble / prev))
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
