package graft

import org.apache.spark.sql.functions._

/** Value invariants for the round-8 wave-15 operator (q155): the greedy
  * allocation is replayed sequentially on the driver and compared
  * field-for-field, plus the budget-conservation laws the closed form
  * must satisfy. */
class Wave15Spec extends SparkSpec {
  import spark.implicits._

  test("q155: allocation matches a sequential greedy replay; budget conserved") {
    val e = graft.operators.Wave15Queries.MaxEpochs
    val perSrc = spark.read.parquet(s"$sfSmoke/documents.parquet")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
        sum(size(split(col("text"), " ")).cast("bigint")).as("tok"),
        sum(col("n_chars")).as("ch"))
      .as[(String, Long, Long, Long)].collect()
    val prio = perSrc.map { case (src, n, tok, ch) =>
      (src, n, tok,
        BigDecimal(ch.toDouble / tok).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble)
    }.sortBy { case (src, _, _, p) => (-p, src) }
    val budget = perSrc.map(_._3).sum / 2
    var remaining = budget
    val want = prio.map { case (src, n, tok, p) =>
      val alloc = math.max(0L, math.min(e * tok, remaining))
      remaining -= alloc
      (src, n, tok, p, alloc,
        BigDecimal(alloc.toDouble / tok).setScale(4, BigDecimal.RoundingMode.HALF_UP)
          .toDouble)
    }
    val got = SparkEntry.queries("q155_token_budget")(spark, sfSmoke).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getDouble(5)))
    assert(got.toSeq == want.toSeq)
    // conservation: the budget is spent exactly (caps exceed it here),
    // nobody exceeds the epoch cap, and funding is prefix-shaped
    assert(got.map(_._5).sum == budget)
    got.foreach { case (src, _, tok, _, alloc, ep) =>
      assert(alloc <= e * tok, s"$src over cap")
      assert(ep <= e.toDouble, s"$src epochs")
    }
    val allocs = got.map(_._5)
    val firstZero = allocs.indexWhere(_ == 0L)
    assert(firstZero > 0, "some source must be funded and some not at fixture scale")
    assert(allocs.drop(firstZero).forall(_ == 0L), "funding must be a prefix")
  }

  test("q156: FS linkage sheet matches a driver-side replay of the model") {
    val cust = spark.read.parquet(s"$sfSmoke/customer.parquet")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        col("c_nationkey"), col("c_acctbal"),
        graft.functions.TextOps.shingleHash60(
          concat(col("c_custkey").cast("string"), lit(":lk"))).as("h"))
      .as[(Long, String, String, Int, Double, Long)].collect()
    case class Rec(key: Long, name: String, seg: String, nat: Int,
        kb: Long, blk: String)
    val clean = cust.map { case (k, nm, sg, nt, ab, _) =>
      Rec(k, nm, sg, nt, math.floor(ab / 1000d).toLong, nm.takeRight(4))
    }
    val dirty = cust.map { case (k, nm, sg, nt, ab, h) =>
      Rec(k,
        if (h % 10 == 0) "Custmoer" + nm.substring(8) else nm,
        if (h % 7 == 0) "UNKNOWN" else sg,
        if (h % 5 == 0) (nt + 1) % 25 else nt,
        math.floor(ab / 1000d).toLong, nm.takeRight(4))
    }
    def u(vals: Seq[Any]): Double = {
      val n = vals.size.toLong
      vals.groupBy(identity).values.map(g => g.size.toLong * g.size).sum
        .toDouble / (n * n)
    }
    val (uName, uSeg, uNat) =
      (u(clean.map(_.name).toSeq), u(clean.map(_.seg).toSeq), u(clean.map(_.nat).toSeq))
    def w(agree: Boolean, m: Double, uu: Double) =
      if (agree) math.log(m / uu) else math.log((1 - m) / (1 - uu))
    val byBlk = dirty.groupBy(r => (r.blk, r.kb))
    val pairs = clean.flatMap(a => byBlk.getOrElse((a.blk, a.kb), Array.empty[Rec])
      .map(b => (a, b,
        w(a.name == b.name, 9.0 / 10, uName) + w(a.seg == b.seg, 6.0 / 7, uSeg)
          + w(a.nat == b.nat, 4.0 / 5, uNat))))
    val nMatch = pairs.count(_._3 > 5.0)
    val trueMatched = pairs.count(p => p._1.key == p._2.key && p._3 > 5.0)
    val r = SparkEntry.queries("q156_record_linkage")(spark, sfSmoke)
      .collect().head
    assert(r.getLong(0) == clean.length, "n_clean")
    assert(r.getLong(1) == pairs.length, "n_cand")
    assert(r.getLong(2) == nMatch, "n_match")
    assert(r.getLong(3) == pairs.count(p => p._3 > 0.0 && p._3 <= 5.0), "n_review")
    assert(r.getLong(4) == pairs.count(_._3 <= 0.0), "n_nonmatch")
    assert(r.getLong(5) == pairs.count(p => p._1.key == p._2.key), "true_in_cand")
    assert(r.getLong(6) == trueMatched, "true_matched")
    assert(r.getDouble(7) == BigDecimal(trueMatched.toDouble / nMatch)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, "precision")
    assert(r.getDouble(8) == BigDecimal(trueMatched.toDouble / clean.length)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, "recall")
    // the model must separate: most true pairs match, and blocking
    // must not have lost a single true pair (suffix+kb are typo-stable)
    assert(r.getLong(5) == clean.length, "blocking lost a true pair")
    assert(nMatch * 10 > clean.length * 5, "matcher should catch most true pairs")
    assert(r.getLong(3) > 0 && r.getLong(4) > 0, "bands must be populated")
  }
}
