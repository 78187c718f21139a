package graft

import org.apache.spark.sql.functions._

/** Value invariants for the round-10 wave-22 operators (q179-q184):
  * driver-side from-scratch replays plus analytic cross-checks against
  * the operators each one refines (q134, q169, q164, q152). */
class Wave22Spec extends SparkSpec {

  private def r4(x: Double) =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def docRows(): Array[(String, String)] =
    spark.read.parquet(s"$sfSmoke/documents.parquet")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))

  test("q179: containment matrix matches a from-scratch shingle-set replay") {
    def shingleSet(t: String): Set[String] = {
      val toks = t.split(" ", -1)
      if (toks.length < 5) Set.empty
      else toks.sliding(5).map(_.mkString(" ")).toSet
    }
    val bySrc = docRows().groupBy(_._1)
      .map { case (s, ds) => s -> ds.map(d => shingleSet(d._2)).reduce(_ ++ _) }
      .filter(_._2.nonEmpty)
    val srcs = bySrc.keys.toSeq.sorted
    val want = for (a <- srcs; b <- srcs if a != b) yield {
      val inter = (bySrc(a) & bySrc(b)).size.toLong
      (a, b, bySrc(a).size.toLong, inter,
        r6(inter.toDouble / bySrc(a).size))
    }
    val got = SparkEntry.queries("q179_source_containment")(spark, sfSmoke)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(got.toSeq == want)
    // containment toward a source is bounded by 1 and the matrix is
    // asymmetric in general: intersections agree across directions
    val ix = got.map(r => (r._1, r._2) -> r._4).toMap
    got.foreach { r =>
      assert(r._5 >= 0.0 && r._5 <= 1.0)
      assert(ix((r._2, r._1)) == r._4, "intersection must be symmetric")
    }
  }

  test("q180: ESS matches a from-scratch replay and flattening raises it") {
    val nTok = docRows().groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, ds) => ds.map(_._2.split(" ", -1).length.toLong).sum }
    def w(alpha: Int, n: Long): Long = alpha match {
      case 100 => n
      case 50  => math.round(math.sqrt(n.toDouble) * 1000000.0)
      case _   => math.round(math.sqrt(math.sqrt(n.toDouble)) * 1000000.0)
    }
    val want = Seq(25, 50, 100).map { a =>
      val ws = nTok.map(w(a, _))
      val s = ws.map(BigInt(_)).sum
      val q = ws.map(x => BigInt(x) * BigInt(x)).sum
      val sD = s.toDouble
      val ess = sD * sD / q.toDouble
      (a, ws.length.toLong, r4(ess), r6(ess / ws.length),
        r6(ws.max.toDouble / sD))
    }
    val got = SparkEntry.queries("q180_mixture_ess")(spark, sfSmoke)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == want)
    // flattening the mixture can only raise ESS and lower max share
    val byA = got.sortBy(_._1)
    assert(byA.map(_._3).sliding(2).forall(p => p(0) >= p(1) - 1e-9),
      "ESS non-increasing in alpha")
    assert(byA.map(_._5).sliding(2).forall(p => p(0) <= p(1) + 1e-9),
      "p_max non-decreasing in alpha")
    // ESS is between 1 and the source count
    got.foreach(r => assert(r._3 >= 1.0 && r._3 <= r._2.toDouble + 1e-9))
  }

  test("q181: span-corruption bill matches a from-scratch arithmetic replay") {
    val toks = docRows().map(_._2.split(" ", -1).length.toLong)
    val want = Seq((15, 3), (15, 10), (25, 3), (50, 10)).map { case (r, l) =>
      val masked = toks.map(t => t * r / 100)
      val spans = masked.map(m => (m + l - 1) / l)
      val input = toks.zip(masked).zip(spans).map { case ((t, m), sp) => t - m + sp }
      val target = masked.zip(spans).map { case (m, sp) => m + sp + 1 }
      (r, l, toks.length.toLong, toks.sum, masked.sum, spans.sum,
        input.sum, target.sum,
        r6(masked.sum.toDouble / toks.sum),
        r6(spans.sum.toDouble / toks.sum),
        r6((input.sum + target.sum).toDouble / toks.sum))
    }
    val got = SparkEntry.queries("q181_span_corruption_planner")(spark, sfSmoke)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getDouble(8), r.getDouble(9), r.getDouble(10)))
    assert(got.toSeq == want)
    // conservation: input + target ≈ tok + 2·spans + n_docs exactly
    got.foreach { r =>
      assert(r._7 + r._8 == r._4 + 2 * r._6 + r._3, "token conservation")
    }
  }

  test("q182: chunk-overlap sheet matches a from-scratch closed-form and a literal chunker") {
    val toks = docRows().map(_._2.split(" ", -1).length.toLong)
    // literal chunker: k = 1 + ceil(max(0, t - c) / s) chunk starts at
    // stride s, each of length min(c, t - start)
    def chunks(t: Long, c: Long, s: Long): Seq[Long] = {
      val k = 1 + math.max(0L, (math.max(0L, t - c) + s - 1) / s)
      (0L until k).map(i => math.min(c, t - i * s))
    }
    val want = Seq((256, 128), (256, 192), (256, 256), (512, 384)).map {
      case (c, s) =>
        val ks = toks.map(t => 1 + (math.max(0L, t - c) + s - 1) / s)
        val dup = ks.map(k => (k - 1) * (c - s))
        (c, s, toks.length.toLong, toks.sum, ks.sum, dup.sum,
          toks.sum + dup.sum,
          r4(ks.sum.toDouble / toks.length),
          r6(dup.sum.toDouble / (toks.sum + dup.sum)),
          r6((toks.sum + dup.sum).toDouble / toks.sum))
    }
    val got = SparkEntry.queries("q182_chunk_overlap_audit")(spark, sfSmoke)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getDouble(7), r.getDouble(8), r.getDouble(9)))
    assert(got.toSeq == want)
    // the closed form equals the literal chunker on every doc for one cell
    toks.take(200).foreach { t =>
      val lit = chunks(t, 256, 192)
      assert(lit.sum == t + (lit.length - 1) * (256 - 192), s"tok=$t")
      assert(lit.forall(_ > 0), s"tok=$t empty chunk")
    }
    // stride = chunk means zero duplication
    assert(got.find(r => r._1 == 256 && r._2 == 256).get._6 == 0L)
  }

  test("q183: 1-NN label coherence matches an exact driver replay") {
    def r6d(x: Double) = r6(x)
    val rows = spark.read.parquet(s"$sfSmoke/embeddings.parquet")
      .select(col("vec_id"), col("embedding"), col("label")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1), r.getInt(2) % 2))
    val m = graft.util.Geometry.adaptiveSampleMod(rows.length.toLong, 50L, 5)
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; nx += x * x; ny += y * y; i += 1
      }
      dot / (math.sqrt(nx) * math.sqrt(ny))
    }
    val queries = rows.filter(_._1 % m == 0)
    val want = queries.map { case (qid, qv, qy) =>
      val nn = rows.filter(_._1 != qid)
        .map { case (id, v, y) => ((r6d(cos(v, qv)), -id.toDouble), y) }
        .maxBy(_._1)
      (qy, nn._2)
    }.groupBy(_._1).toSeq.sortBy(_._1).map { case (y, ps) =>
      val agree = ps.count(p => p._1 == p._2).toLong
      (y, ps.length.toLong, agree, r6(agree.toDouble / ps.length))
    }
    val got = SparkEntry.queries("q183_knn_label_coherence")(spark, sfSmoke)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.toSeq == want)
    // both parities sampled, frieze bounds hold
    assert(got.map(_._2).sum == queries.length.toLong)
    got.foreach(r => assert(r._4 >= 0.0 && r._4 <= 1.0))
  }

  test("q184: uniqueness sheet matches a from-scratch projection census") {
    val rows = spark.read.parquet(s"$sfSmoke/customer.parquet")
      .select(col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
      .collect()
      .map(r => (r.getInt(0), math.floor(r.getDouble(1) / 1000d).toLong,
        r.getString(2)))
    def census(key: ((Int, Long, String)) => Any, name: String) = {
      val ks = rows.groupBy(key).values.map(_.length.toLong).toSeq
      val nRows = ks.sum
      val uniq = ks.count(_ == 1L).toLong
      val risk = ks.filter(_ <= 5L).sum
      (name, ks.length.toLong, nRows, uniq, 1000000L * uniq / nRows,
        ks.min, risk, 1000000L * risk / nRows)
    }
    val want = Seq(
      census(r => r._1, "nation"),
      census(r => (r._1, r._2), "nation+kb"),
      census(r => (r._1, r._2, r._3), "nation+kb+segment")).sortBy(_._1)
    val got = SparkEntry.queries("q184_linkage_uniqueness")(spark, sfSmoke)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(got.toSeq == want)
    // refinement monotonicity: finer QI sets have at least as many
    // classes and at least as many unique rows
    val byName = got.map(r => r._1 -> r).toMap
    assert(byName("nation")._2 <= byName("nation+kb")._2)
    assert(byName("nation+kb")._2 <= byName("nation+kb+segment")._2)
    assert(byName("nation")._4 <= byName("nation+kb")._4)
    assert(byName("nation+kb")._4 <= byName("nation+kb+segment")._4)
  }
}
