package graft

import org.apache.spark.sql.functions._

/** Value invariants for the round-11 wave-25 operators (q194-q196):
  * from-scratch driver-side replays of the KL sheet and the margin
  * audit, plus the label-spread's cross-operator consistency with q60. */
class Wave25Spec extends SparkSpec {

  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q194: token-KL sheet matches a from-scratch 17-cell replay") {
    val docs = graft.sources.Tables.documents(spark, sfSmoke)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val occ = docs.flatMap { case (s, t) => t.split(" ", -1).map(tok => (s, tok)) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val corpusTok = occ.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val top = corpusTok.toSeq.sortBy { case (tok, c) => (-c, tok) }.take(16)
      .map(_._1).zipWithIndex.map { case (tok, i) => tok -> (i + 1) }.toMap
    def cellsOf(counts: Map[String, Long]): IndexedSeq[Long] = {
      val cells = Array.fill(17)(0L)
      counts.foreach { case (tok, c) => cells(top.getOrElse(tok, 17) - 1) += c }
      cells.toIndexedSeq
    }
    val srcCells = occ.groupBy(_._1._1).view.mapValues(m =>
      cellsOf(m.map { case ((_, tok), c) => tok -> c }.toMap)).toMap
    val corpusCells = (0 until 17).map(i => srcCells.values.map(_(i)).sum)
    val ctot = corpusCells.sum
    val want = srcCells.toSeq.sortBy(_._1).map { case (s, cells) =>
      val tot = cells.sum
      var kl = 0.0
      (0 until 17).foreach { i =>
        if (cells(i) > 0)
          kl += (cells(i).toDouble / tot) * math.log(
            (cells(i).toDouble / tot) / (corpusCells(i).toDouble / ctot))
      }
      (s, tot, 1000000L * cells(16) / tot, r6(kl))
    }
    val got = SparkEntry.queries("q194_token_kl")(spark, sfSmoke)
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == want)
    // KL >= 0 (Gibbs) up to the 6-digit rounding of an exact-support KL
    got.foreach { case (s, _, _, kl) => assert(kl >= -1e-6, s) }
  }

  test("q195: margin audit matches a from-scratch exact-L2 replay") {
    val rows = spark.read.parquet(s"$sfSmoke/embeddings.parquet")
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getInt(1) % 2,
        r.getSeq[Float](2).map(x => BigDecimal(x.toDouble * 1000)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toIndexedSeq))
    val mod = graft.util.Geometry.adaptiveSampleMod(rows.length.toLong, 50L, 5)
    def d2(a: IndexedSeq[Long], b: IndexedSeq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val margins = rows.filter(_._1 % mod == 0).flatMap { case (qid, qy, qv) =>
      val others = rows.filter(_._1 != qid)
      val same = others.filter(_._2 == qy).map(o => d2(o._3, qv))
      val cross = others.filter(_._2 != qy).map(o => d2(o._3, qv))
      if (same.isEmpty || cross.isEmpty) None
      else Some((qy, cross.min - same.min))
    }
    val want = margins.groupBy(_._1).toSeq.sortBy(_._1).map { case (y, ms) =>
      val sum = ms.map(_._2).sum
      (y, ms.length.toLong, ms.count(_._2 <= 0).toLong, ms.map(_._2).min,
        sum, r6(sum.toDouble / ms.length / 1000000.0))
    }
    val got = SparkEntry.queries("q195_hard_negative_margin")(spark, sfSmoke)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("q196: label spread is consistent with q60's published clusters") {
    val labels = SparkEntry.queries("q60_dup_clusters")(spark, sfSmoke)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val langs = graft.sources.Tables.documents(spark, sfSmoke)
      .select(col("doc_id"), col("lang")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val members = labels.map { case (doc, cl) => (cl, doc, langs(doc)) }
    val majority = members.groupBy(_._1).view.mapValues { ms =>
      ms.groupBy(_._3).toSeq.map { case (l, g) => (-g.length, l) }.min._2
    }.toMap
    val want = members.groupBy(_._3).toSeq.sortBy(_._1).map { case (l, ms) =>
      val flipped = ms.count(m => m._3 != majority(m._1)).toLong
      (l, ms.length.toLong, flipped,
        r6(flipped.toDouble / ms.length))
    }
    val got = SparkEntry.queries("q196_cluster_label_spread")(spark, sfSmoke)
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == want)
    // every clustered doc appears exactly once in the sheet's doc counts
    assert(got.map(_._2).sum == labels.length.toLong)
  }
}
