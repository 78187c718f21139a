package graft

import org.apache.spark.sql.functions._

/** Value invariants for the round-12 wave-29 operators (q202/q203): a
  * from-scratch IVFADC replay — coarse cells, residuals, residual-PQ
  * train/encode, per-cell ADC tables, the probed search and the joint
  * recall attribution — all in plain driver Scala with the same exact
  * integer arithmetic. */
class Wave29Spec extends SparkSpec {

  private def replayIndex() = IvfadcReplay.replayIndex(spark, sfSmoke)

  private def replaySearch(cents: Seq[(Long, IndexedSeq[Long])],
      perVec: Map[Long, (Long, IndexedSeq[Long], IndexedSeq[Long])],
      books: IndexedSeq[Seq[(Long, IndexedSeq[Long])]],
      vs: Seq[(Long, IndexedSeq[Long])], qid: Long, k: Int) =
    IvfadcReplay.replaySearch(cents, perVec, books, vs, qid, k)

  private def sq(a: IndexedSeq[Long], b: IndexedSeq[Long]): Long =
    IvfadcReplay.sq(a, b)

  test("q202: IVFADC probed search matches a from-scratch replay") {
    val (cents, perVec, books, vs) = replayIndex()
    val (top, _) = replaySearch(cents, perVec, books, vs, 0L, 10)
    val want = top.map { case (id, cid, adc) =>
      (id, cid, adc, sq(vs.find(_._1 == id).get._2, vs.find(_._1 == 0L).get._2))
    }
    val got = SparkEntry.queries("q202_ivfadc_search")(spark, sfSmoke)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
    assert(got.nonEmpty)
    // the ADC ordering is an approximation: adc and exact must disagree
    // somewhere on the fixture, or the sheet prices nothing
    assert(got.map(_._3) != got.map(_._4))
  }

  test("q203: joint recall audit matches a from-scratch replay and adds up") {
    val (cents, perVec, books, vs) = replayIndex()
    val mod = graft.util.Geometry.adaptiveSampleMod(vs.length.toLong, 50L, 5)
    val qids = vs.filter(_._1 % mod == 0).map(_._1)
    var (exRows, hits, cellMiss, quantMiss) = (0L, 0L, 0L, 0L)
    qids.foreach { qid =>
      val qqv = vs.find(_._1 == qid).get._2
      val (top, probedCells) = replaySearch(cents, perVec, books, vs, qid, 10)
      val adcTop = top.map(_._1).toSet
      val exTop = vs.filter(_._1 != qid)
        .map { case (id, v) => (sq(v, qqv), id) }.sorted.take(10).map(_._2)
      exRows += exTop.length
      exTop.foreach { id =>
        if (!probedCells.contains(perVec(id)._1)) cellMiss += 1
        else if (adcTop.contains(id)) hits += 1
        else quantMiss += 1
      }
    }
    val got = SparkEntry.queries("q203_ivfadc_recall")(spark, sfSmoke)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).head
    assert(got == ((qids.length.toLong, exRows, hits, cellMiss, quantMiss,
      hits * 1000000L / exRows)))
    // attribution is a partition of the exact top-10 mass
    assert(got._3 + got._4 + got._5 == got._2)
    assert(got._1 > 0 && got._2 > 0)
    // the fixture discriminates: both miss modes occur (random vectors
    // stress both dials), and something still hits
    assert(got._4 > 0 && got._5 > 0)
  }
}
