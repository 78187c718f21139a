package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

/** Value invariants for the round-12 wave-29 operators (q202/q203): a
  * from-scratch IVFADC replay — coarse cells, residuals, residual-PQ
  * train/encode, per-cell ADC tables, the probed search and the joint
  * recall attribution — all in plain driver Scala with the same exact
  * integer arithmetic. */
class Wave29Spec extends SparkSpec {

  private val M = 4
  private val S = 16
  private val K = 4
  private val Nprobe = 2

  private def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  private def sq(a: IndexedSeq[Long], b: IndexedSeq[Long]): Long =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  /** The full from-scratch index: (cents, per-vec (cid, residual, codes)). */
  private def replayIndex(): (Seq[(Long, IndexedSeq[Long])],
      Map[Long, (Long, IndexedSeq[Long], IndexedSeq[Long])],
      IndexedSeq[Seq[(Long, IndexedSeq[Long])]],
      Seq[(Long, IndexedSeq[Long])]) = {
    val vs = spark.read.parquet(s"$sfSmoke/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(x => BigDecimal(x.toDouble * 1000)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toIndexedSeq))
      .toSeq
    val bc = graft.util.Geometry.adaptiveCodebook(vs.length.toLong, 16,
      graft.operators.Wave29Queries.IvfCap)
    val cents = vs.filter(_._1 < bc).sortBy(_._1)
    // coarse assignment: min (sqL2, cid)
    val assigned = vs.map { case (id, qv) =>
      val (cid, cv) = cents.minBy { case (c, cv) => (sq(qv, cv), c) }
      (id, cid, qv.zip(cv).map { case (a, b) => a - b })
    }
    // residual PQ train: md5-first K seeds + one integer Lloyd iteration
    val resOf = assigned.map { case (id, _, rv) => id -> rv }.toMap
    val seeds = assigned.map(_._1).sortBy(id => (md5Hex(id.toString), id))
      .take(K).map(resOf)
    def assign(books: Seq[(Long, IndexedSeq[Long])],
        sv: IndexedSeq[Long]): Long =
      books.map { case (c, cv) => (sq(sv, cv), c) }.min._2
    val books = (0 until M).map { m =>
      val init = seeds.zipWithIndex.map { case (v, i) =>
        ((i + 1).toLong, v.slice(m * S, (m + 1) * S)) }
      val subs = assigned.map { case (_, _, rv) => rv.slice(m * S, (m + 1) * S) }
      subs.groupBy(sv => assign(init, sv)).toSeq
        .map { case (c, svs) =>
          (c, (0 until S).map(i =>
            svs.map(_(i)).sum / svs.length).toIndexedSeq) }
        .sortBy(_._1)
    }
    val perVec = assigned.map { case (id, cid, rv) =>
      id -> (cid, rv, (0 until M).map(m =>
        assign(books(m), rv.slice(m * S, (m + 1) * S))).toIndexedSeq)
    }.toMap
    (cents, perVec, books, vs)
  }

  /** ADC top-k of query `qqv` within its probed cells, plus the probed
    * cell ids — the q202 search, replayed. */
  private def replaySearch(cents: Seq[(Long, IndexedSeq[Long])],
      perVec: Map[Long, (Long, IndexedSeq[Long], IndexedSeq[Long])],
      books: IndexedSeq[Seq[(Long, IndexedSeq[Long])]],
      vs: Seq[(Long, IndexedSeq[Long])], qid: Long, k: Int)
      : (Seq[(Long, Long, Long)], Set[Long]) = {
    val qqv = vs.find(_._1 == qid).get._2
    val probed = cents.sortBy { case (c, cv) => (sq(qqv, cv), c) }
      .take(Nprobe)
    val tabs = probed.map { case (cid, cv) =>
      val rq = qqv.zip(cv).map { case (a, b) => a - b }.toIndexedSeq
      cid -> (0 until M).map { m =>
        val qs = rq.slice(m * S, (m + 1) * S)
        books(m).map { case (c, bv) => c -> sq(qs, bv) }.toMap
      }
    }.toMap
    val cand = vs.filter { case (id, _) =>
      id != qid && tabs.contains(perVec(id)._1) }
    val top = cand.map { case (id, _) =>
      val (cid, _, codes) = perVec(id)
      val adc = (0 until M).map(m => tabs(cid)(m)(codes(m))).sum
      (adc, id, cid)
    }.sorted.take(k).map { case (adc, id, cid) => (id, cid, adc) }
    (top, tabs.keySet)
  }

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
