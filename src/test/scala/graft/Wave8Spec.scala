package graft

import org.apache.spark.sql.functions._

/** Value invariants for the round-7 wave-8 operators (q127-q132):
  * independent Scala brute-force recomputations on the smoke fixture
  * (driver-side string/arithmetic code sharing nothing with the Spark
  * plans), plus the analytic invariants each operator's algebra promises.
  */
class Wave8Spec extends SparkSpec {
  import spark.implicits._

  private def run(key: String) = SparkEntry.queries(key)(spark, sfSmoke)

  // --- q127: tokenizer APPLY against a driver-side re-encoder ---------

  test("q127: per-source BPE token counts match a Scala re-encoder") {
    val merges =
      graft.operators.CorpusQueries.trainBpeMerges(spark, sfSmoke, 3).map(_._2)
    // independent encoder: char symbols, then each merge applied as the
    // same left-to-right non-overlapping triple-pass replace
    def encode(w: String): Int = {
      var sym = " " + w.split("").mkString(" ") + " "
      merges.foreach { pair =>
        val merged = pair.replace(" ", "")
        (1 to 3).foreach { _ => sym = sym.replace(s" $pair ", s" $merged ") }
      }
      sym.trim.split(" ", -1).length
    }
    val docs = spark.read.parquet(s"$sfSmoke/documents.parquet")
      .select("source", "text").as[(String, String)].collect()
    val want = docs.flatMap { case (src, text) => text.split(" ", -1).map(src -> _) }
      .groupBy(_._1).view.mapValues { ws =>
        (ws.length.toLong, ws.map(_._2.length.toLong).sum,
          ws.map(w => encode(w._2).toLong).sum)
      }.toMap
    val got = run("q127_bpe_encode").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == want)
    got.values.foreach { case (_, chars, bpe) =>
      assert(bpe <= chars, "a merge can only shrink the symbol stream")
    }
  }

  // --- q128: compaction plan algebra ----------------------------------

  test("q128: plan conserves files/bytes and bounds bin overshoot") {
    val files = spark.read.parquet(s"$sfSmoke/documents.parquet")
      .groupBy(col("source"), pmod(col("doc_id"), lit(40)))
      .agg(sum("n_chars").as("bytes"))
      .select("bytes").as[Long].collect()
    val plan = run("q128_compaction_plan").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(plan.map(_._2).sum == files.length, "file conservation")
    assert(plan.map(_._3).sum == files.sum, "byte conservation")
    // bins are the exclusive-prefix cut: a bin's span starts inside
    // [b*T, (b+1)*T), so its total is < T plus its boundary-crossing file
    val T = 16384L
    plan.foreach { case (bin, _, total, largest) =>
      assert(bin >= 0)
      assert(total <= T + largest,
        s"bin $bin total $total exceeds target+largest ${T + largest}")
    }
    // bins must be emitted once each, in order
    assert(plan.map(_._1).toSeq == plan.map(_._1).distinct.sorted.toSeq)
  }

  // --- q129: sketch estimate is EXACT below sketch capacity -----------

  test("q129: below k the KMV estimate degrades to the exact join size") {
    val r = run("q129_join_cardinality").collect().head
    val (nA, nB) = (r.getLong(0), r.getLong(1))
    val exact = r.getLong(4)
    // smoke fixture: |A ∪ B| < k = 128, so the union head is complete and
    // every estimate must be EXACT (the estimator's degenerate-case
    // contract) — and the brute-force join must agree
    assert(nA + nB - exact < 128, "fixture outgrew the sketch; retune test")
    assert(r.getDouble(2) == (nA + nB - exact).toDouble, "est_union exact")
    assert(r.getDouble(3) == exact.toDouble, "est_inter exact")
    assert(r.getDouble(5) == 0.0, "rel_err zero")
    val a = spark.read.parquet(s"$sfSmoke/orders.parquet")
      .filter(col("o_totalprice") > 450000.0)
      .select(col("o_custkey").as("k")).distinct()
    val b = spark.read.parquet(s"$sfSmoke/customer.parquet")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("k")).distinct()
    assert(a.join(b, "k").count() == exact)
  }

  // --- q130: MAD screen against a driver-side robust recompute --------

  test("q130: outlier set matches a brute-force median/MAD computation") {
    val totals = spark.read.parquet(s"$sfSmoke/events.parquet")
      .select(col("user_id"),
        round(col("value") * 100, 0).cast("long").as("v"))
      .groupBy("user_id").agg(sum("v").as("t"))
      .as[(Long, Long)].collect().toMap
    def medianOf(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val pos = (s.length - 1) * 0.5
      val lo = s(pos.toInt)
      val hi = s(math.min(pos.toInt + 1, s.length - 1))
      lo + (pos - pos.toInt) * (hi - lo)
    }
    val med = medianOf(totals.values.map(_.toDouble).toSeq)
    val devs = totals.view.mapValues(t => math.abs(t - med)).toMap
    val mad = medianOf(devs.values.toSeq)
    val want = devs.filter(_._2 > 2.9652 * mad).keySet
    val got = run("q130_mad_outliers").collect().map(_.getLong(0)).toSet
    assert(got == want)
  }

  // --- q131: datasheet fields against direct recomputation ------------

  test("q131: card fields equal independently computed statistics") {
    val docs = spark.read.parquet(s"$sfSmoke/documents.parquet")
      .select("text", "source", "lang", "n_chars")
      .as[(String, String, String, Long)].collect()
    val r = run("q131_dataset_card").collect().head
    assert(r.getLong(0) == docs.length)
    assert(r.getLong(1) == docs.map(_._2).distinct.length)
    assert(r.getLong(2) == docs.map(_._3).distinct.length)
    assert(r.getLong(3) == docs.map(_._4).sum)
    assert(r.getLong(4) == docs.map(_._1.split(" ", -1).length.toLong).sum)
    val dupDocs = docs.groupBy(_._1).values.filter(_.length > 1).map(_.length).sum
    assert(r.getLong(5) == dupDocs)
    assert(r.getLong(6) == docs.map(_._4).max)
  }

  // --- q132: principal direction algebra ------------------------------

  test("q132: loadings are unit-norm and match a driver-side w = Vt(V1)") {
    val vecs = spark.read.parquet(s"$sfSmoke/embeddings.parquet")
      .select("embedding").as[Seq[Float]].collect()
      .map(_.map(x => math.round(x.toDouble * 1000)).toArray)
    val dim = vecs.head.length
    val w = Array.ofDim[BigInt](dim)
    java.util.Arrays.fill(w.asInstanceOf[Array[AnyRef]], BigInt(0))
    vecs.foreach { v =>
      val t = v.sum
      var j = 0
      while (j < dim) { w(j) += BigInt(v(j)) * BigInt(t); j += 1 }
    }
    val nsq = w.map(x => x * x).sum
    val norm = math.sqrt(nsq.toDouble)
    val rows = run("q132_principal_dir").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.length == dim)
    rows.foreach { case (d, loading, share) =>
      val wantL = BigDecimal(w(d - 1).toDouble / norm)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(loading - wantL) < 1e-9, s"dim $d loading")
      assert(share >= 0 && share <= 1.0)
    }
    val l2 = rows.map { case (_, l, _) => l * l }.sum
    assert(math.abs(l2 - 1.0) < 1e-4, s"loadings L2 $l2 != 1")
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4, "shares sum to 1")
  }
}
