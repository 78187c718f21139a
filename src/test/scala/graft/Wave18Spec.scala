package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

/** Value invariants for the round-9 wave-18 operators (q162-q165):
  * driver-side from-scratch replays (independent md5 chain, not the
  * engine's helpers) plus analytic bounds — the first-principles
  * discipline every other wave has (r9 verdict task 5). */
class Wave18Spec extends SparkSpec {

  private def h60(s: String): Long = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }
  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def r4(x: Double) =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q162: deletion cascade matches a from-scratch two-hop replay (sf0.01 — non-empty list)") {
    // replay at sf0.01: the smoke fixture's 150 customers legitimately
    // hash to an EMPTY deletion list (1/97 sampling), which would make
    // the cascade replay vacuous — the next scale up has real deletions
    val sf = "/root/testdata/sf0.01"
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey")).collect().map(_.getLong(0))
    val del = cust.filter(k => h60(s"$k:del") % 97 == 0).toSet
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val delOrders = orders.filter(o => del(o._2)).map(_._1).toSet
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey")).collect().map(_.getLong(0))
    val delLi = li.count(delOrders)
    def row(name: String, tot: Long, d: Long) =
      (name, tot, d, r6(d.toDouble / tot))
    val want = Seq(
      row("customer", cust.length.toLong, del.size.toLong),
      row("lineitem", li.length.toLong, delLi.toLong),
      row("orders", orders.length.toLong, delOrders.size.toLong))
    val got = SparkEntry.queries("q162_deletion_audit")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.toSeq == want)
    // the cascade is real at this scale, and each hop can only widen
    // the absolute count while fractions stay ≈ the sampling rate
    assert(del.nonEmpty && delOrders.nonEmpty && delLi > 0)
    assert(delLi >= delOrders.size || delOrders.isEmpty)
  }

  test("q163: global-cutoff skew matches a from-scratch rank-quantile replay") {
    val docs = spark.read.parquet(s"$sfSmoke/documents.parquet")
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val sorted = docs.map(_._2).sorted
    val n = sorted.length
    // smallest value whose cumulative count reaches half the corpus =
    // the element at 0-based index ceil(n/2)-1 of the sorted sample
    val cutoff = sorted((n + 1) / 2 - 1)
    val perSrc = docs.groupBy(_._1).toSeq.sortBy(_._1).map { case (src, ds) =>
      (src, ds.length.toLong, ds.count(_._2 > cutoff).toLong)
    }
    val gf = perSrc.map(_._3).sum.toDouble / perSrc.map(_._2).sum
    val want = perSrc.map { case (src, nd, k) =>
      (src, nd, k, r6(k.toDouble / nd), cutoff, r4((k.toDouble / nd) / gf))
    }
    val got = SparkEntry.queries("q163_threshold_skew")(spark, sfSmoke)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4), r.getDouble(5)))
    assert(got.toSeq == want)
    // a median cutoff keeps roughly half the corpus
    val keptFrac = perSrc.map(_._3).sum.toDouble / n
    assert(keptFrac > 0.2 && keptFrac < 0.8, s"keptFrac=$keptFrac")
  }

  test("q164: context-planner sheet matches a from-scratch packing-arithmetic replay") {
    val toks = spark.read.parquet(s"$sfSmoke/documents.parquet")
      .select(col("text")).collect()
      .map(_.getString(0).split(" ", -1).length.toLong)
    val want = Seq(128L, 512L, 2048L).map { ctx =>
      val nDocs = toks.length.toLong
      val nTrunc = toks.count(_ > ctx).toLong
      val tokTotal = toks.sum
      val tokLost = toks.map(t => math.max(0L, t - ctx)).sum
      val pad = toks.map(t => ctx - math.min(t, ctx)).sum
      val kept = toks.map(t => math.min(t, ctx)).sum
      val seqsLb = (kept + ctx - 1) / ctx
      (ctx, nDocs, nTrunc, r6(nTrunc.toDouble / nDocs), tokTotal, tokLost,
        pad, r6(pad.toDouble / (nDocs * ctx)), seqsLb,
        r6(kept.toDouble / (seqsLb * ctx)))
    }
    val got = SparkEntry.queries("q164_context_planner")(spark, sfSmoke)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getDouble(7), r.getLong(8), r.getDouble(9)))
    assert(got.toSeq == want)
    // the tradeoff curve: truncation loss falls with ctx, padding rises
    val byCtx = want.sortBy(_._1)
    assert(byCtx.map(_._6).sliding(2).forall(p => p(0) >= p(1)), "tok_lost falls")
    assert(byCtx.map(_._8).sliding(2).forall(p => p(0) <= p(1)), "pad_frac rises")
  }

  test("q165: confident-joint counts match a from-scratch integer replay") {
    val rows = spark.read.parquet(s"$sfSmoke/embeddings.parquet")
      .select(col("vec_id"), col("label")).collect()
      .map(r => ((r.getInt(1) % 2).toLong, h60(s"${r.getLong(0)}:cl") % 1000))
    val sp1 = rows.filter(_._1 == 1).map(_._2).sum
    val n1 = rows.count(_._1 == 1).toLong
    val sp0 = rows.filter(_._1 == 0).map(_._2).sum
    val n0 = rows.count(_._1 == 0).toLong
    def pred(p: Long): Int = {
      val in1 = p * n1 >= sp1
      val in0 = p * n0 <= sp0
      if (in1 && !in0) 1
      else if (in0 && !in1) 0
      else if (in1 && in0) {
        if ((p * n1 - sp1) * n0 >= (sp0 - p * n0) * n1) 1 else 0
      } else -1
    }
    val j = rows.map { case (y, p) => (y, pred(p)) }
    val c11 = j.count(t => t._1 == 1 && t._2 == 1).toLong
    val c10 = j.count(t => t._1 == 1 && t._2 == 0).toLong
    val c01 = j.count(t => t._1 == 0 && t._2 == 1).toLong
    val c00 = j.count(t => t._1 == 0 && t._2 == 0).toLong
    val unconf = j.count(_._2 == -1).toLong
    val r = SparkEntry.queries("q165_label_noise")(spark, sfSmoke)
      .collect().head
    assert(r.getLong(0) == rows.length.toLong)
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((c11, c10, c01, c00)))
    assert(r.getLong(5) == unconf)
    assert(r.getDouble(6) ==
      r6((c10 + c01).toDouble / (c11 + c10 + c01 + c00)))
    // every example is accounted for exactly once
    assert(c11 + c10 + c01 + c00 + unconf == rows.length.toLong)
    // an md5 scorer is label-independent: the off-diagonal mass is large
    assert(r.getDouble(6) > 0.2)
  }
}
