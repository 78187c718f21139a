package graft

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Shared from-scratch IVFADC replay for the wave-29/33/34 specs: the
  * full index (coarse cells, residuals, residual-PQ train/encode) and
  * the probed ADC search, in plain driver Scala with the same exact
  * integer arithmetic as the engine — one replay, three consumers
  * (q202/q203 in Wave29Spec, q211 occupancy in Wave33Spec derives its
  * own coarse replay, q212 NDCG/MRR in Wave34Spec). */
object IvfadcReplay {

  val M = 4
  val S = 16
  val K = 4
  val Nprobe = 2

  private def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  def sq(a: IndexedSeq[Long], b: IndexedSeq[Long]): Long =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  /** The full from-scratch index: (cents, per-vec (cid, residual, codes),
    * books, milli vectors). */
  def replayIndex(spark: SparkSession, dir: String)
      : (Seq[(Long, IndexedSeq[Long])],
         Map[Long, (Long, IndexedSeq[Long], IndexedSeq[Long])],
         IndexedSeq[Seq[(Long, IndexedSeq[Long])]],
         Seq[(Long, IndexedSeq[Long])]) = {
    val vs = spark.read.parquet(s"$dir/embeddings.parquet")
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

  /** ADC top-k of query `qid` within its probed cells, plus the probed
    * cell ids — the q202/q203 candidate ranking, replayed. Returns
    * ((nbr, cid, adc) rows in rank order, probed cells). */
  def replaySearch(cents: Seq[(Long, IndexedSeq[Long])],
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
}
