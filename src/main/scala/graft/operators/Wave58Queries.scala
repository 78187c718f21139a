package graft.operators

import graft.GQuery
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Round-14 wave 58: q236 — optimizer-histogram quality audit
  * (equi-width vs equi-depth).
  *
  * Completes the optimizer quartet (q129 cardinality estimation, q219
  * predicate ordering, q232 join order, THIS the statistics the first
  * two read): a 16-bucket histogram over lineitem price cents built
  * two ways — EQUI-WIDTH (bucket = (v−lo)·16 div span; cheap one-pass
  * build, bad on skew) and EQUI-DEPTH (bucket = (rank−1)·16 div n;
  * the build costs a rank pass, which is exactly why engines sample
  * it) — each graded against the same six literal range predicates
  * with the textbook continuous-uniformity estimator
  * est = Σ_j c_j · overlap(pred, [min_j, max_j]) div len_j. The sheet
  * reports true rows, estimated rows and error ppm per (histogram,
  * predicate) — the number a CBO's selectivity error actually is.
  * Both histograms store the same triple (count, actual min, actual
  * max) per bucket, so the comparison isolates the ASSIGNMENT rule.
  * The fixture's price column is near-uniform, so the two types TIE
  * (width even edges out depth, whose rank-split buckets overlap at
  * value ties) — an honest reading: equi-depth's bounded-count
  * guarantee is a SKEW lever, and on uniform data you pay its rank
  * pass for nothing. Per-predicate errors (0–19000 ppm, worst in the
  * 1%-tail) are the measured numbers either way.
  *
  * Exactness: cents via round(×100); fences and bucket ids are pure
  * integer arithmetic over (rank, n, lo, span); per-bucket truncating
  * division mirrored in both engines; depth ties split by the unique
  * (cents, orderkey, linenumber) rank order — identical in both.
  *
  * Scale notes (100 TB): ONE Ranks.rowNumber pass (range-sliced local
  * sorts — the equi-depth build's true price, stated honestly; the
  * equi-width path reads the same pass but only needs min/max) into
  * two 16-row bucket aggregates; the predicate grid is a 6-row
  * literal; estimation is 16×6 broadcast arithmetic; true
  * selectivities are one map-only 6-way broadcast fan-out of the scan
  * into a 6-group aggregate (map-side combine). */
object Wave58Queries {

  private val Buckets = 16
  private val Preds: Seq[(String, Int, Int)] = Seq(
    ("p00_10", 0, 10), ("p00_50", 0, 50), ("p25_75", 25, 75),
    ("p45_55", 45, 55), ("p90_100", 90, 100), ("p99_100", 99, 100))

  private val q236 = GQuery(
    "q236_hist_quality",
    (s, d) => {
      val li = Tables.lineitem(s, d).select(
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("v"),
        col("l_orderkey"), col("l_linenumber"))
      // ranked feeds both histogram branches — materialize per the
      // Ranks multi-consumer rule (the q233 sf1 lesson)
      val ranked = graft.sources.Io.materialize(
        Ranks.rowNumber(li.withColumn("_g", lit(0)), "_g",
          Seq(col("v"), col("l_orderkey"), col("l_linenumber")), "rn"))
      val stats = li.agg(count(lit(1)).as("n"), min(col("v")).as("lo"),
        max(col("v")).as("hi"))
      val withStats = ranked.crossJoin(broadcast(stats))
        .select(col("v"), col("rn").cast("long").as("rn"),
          col("n"), col("lo"), (col("hi") - col("lo") + 1).as("w"))
      def hist(name: String, bid: org.apache.spark.sql.Column) =
        withStats.groupBy(bid.as("bid"))
          .agg(count(lit(1)).as("c"), min(col("v")).as("bmin"),
            max(col("v")).as("bmax"))
          .select(lit(name).as("htype"), col("c"), col("bmin"), col("bmax"))
      val buckets = hist("width",
          expr(s"(v - lo) * $Buckets div w"))
        .unionAll(hist("depth", expr(s"(rn - 1) * $Buckets div n")))
      val grid = stats
        .select(col("n"), col("lo"), (col("hi") - col("lo") + 1).as("w"))
        .select(explode(array(Preds.map { case (nm, p1, p2) =>
          struct(lit(nm).as("pred"),
            expr(s"lo + w * $p1 div 100").as("a"),
            expr(s"lo + w * $p2 div 100").as("b"))
        }: _*)).as("x"))
        .select(col("x.pred").as("pred"), col("x.a").as("a"),
          col("x.b").as("b"))
      val est = buckets.crossJoin(broadcast(grid))
        .select(col("htype"), col("pred"),
          expr("c * greatest(0, least(b, bmax) - greatest(a, bmin) + 1)" +
            " div (bmax - bmin + 1)").as("e"))
        .groupBy(col("htype"), col("pred"))
        .agg(sum(col("e")).as("est_rows"))
      val truth = li.crossJoin(broadcast(grid))
        .filter(col("v") >= col("a") && col("v") <= col("b"))
        .groupBy(col("pred")).agg(count(lit(1)).as("true_rows"))
      est.join(broadcast(truth), "pred")
        .select(col("htype"), col("pred"), col("true_rows"),
          col("est_rows"),
          expr("abs(est_rows - true_rows) * 1000000" +
            " div greatest(true_rows, 1)").as("err_ppm"))
        .orderBy(col("htype"), col("pred"))
    },
    Some {
      val predSql = Preds.map { case (nm, p1, p2) =>
        s"('$nm', $p1, $p2)" }.mkString(", ")
      s"""WITH li AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT)
                        AS v, l_orderkey, l_linenumber
                      FROM lineitem),
              st AS (SELECT CAST(count(*) AS BIGINT) AS n,
                            min(v) AS lo, max(v) - min(v) + 1 AS w
                     FROM li),
              rk AS MATERIALIZED (
                SELECT v, row_number() OVER (
                  ORDER BY v, l_orderkey, l_linenumber) AS rn
                FROM li),
              bk AS (SELECT 'width' AS htype,
                            CAST(count(*) AS BIGINT) AS c,
                            min(v) AS bmin, max(v) AS bmax
                     FROM rk, st GROUP BY (v - lo) * $Buckets // w
                     UNION ALL
                     SELECT 'depth', CAST(count(*) AS BIGINT),
                            min(v), max(v)
                     FROM rk, st GROUP BY (rn - 1) * $Buckets // n),
              pg AS (SELECT pred, lo + w * p1 // 100 AS a,
                            lo + w * p2 // 100 AS b
                     FROM (VALUES $predSql) AS t(pred, p1, p2), st),
              es AS (SELECT htype, pred,
                            CAST(sum(c * greatest(0,
                              least(b, bmax) - greatest(a, bmin) + 1)
                              // (bmax - bmin + 1)) AS BIGINT) AS est_rows
                     FROM bk, pg GROUP BY 1, 2),
              tr AS (SELECT pred, CAST(count(*) AS BIGINT) AS true_rows
                     FROM li, pg WHERE v >= a AND v <= b GROUP BY 1)
         SELECT htype, pred, true_rows, est_rows,
                CAST(abs(est_rows - true_rows) * 1000000
                  // greatest(true_rows, 1) AS BIGINT) AS err_ppm
         FROM es JOIN tr USING (pred)
         ORDER BY htype, pred"""
    }
  )

  val all: Seq[GQuery] = Seq(q236)
}
