package graft.operators

import graft.GQuery
import graft.functions.TextOps
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-14 wave 61: q239 — DP quantile via noisy histogram.
  *
  * The privacy family releases counts (q161) and sums (q185) under
  * Laplace noise; the remaining everyday release is the QUANTILE, and
  * the standard mechanism is exactly their composition: a noisy
  * histogram over a PUBLIC, data-independent domain (here cents ∈
  * [0, 2^24) in 64 equi-width buckets — using the data's own min/max
  * would leak), every bucket INCLUDING EMPTY ONES noised (absence is
  * information too), then the quantile read off the noisy cumulative
  * — smallest bucket whose running released mass reaches
  * ⌈p·T_noisy/100⌉, reported at its midpoint. Per p ∈ {25, 50, 75,
  * 90}: the DP estimate, the exact quantile (the q228 rank machinery,
  * the audit's baseline), absolute error in cents and as ppm of the
  * public domain — the utility curve a privacy review reads against ε.
  *
  * Noise discipline = q161 verbatim: per-bucket inverse-CDF Laplace
  * (scale 10 = 1/ε at ε 0.1) from the md5-60 keyed PRF, rounded to 6
  * before release post-processing max(0, round(n + noise)) — both
  * engines reproduce every released count bit-for-bit (the ln-parity
  * precedent).
  *
  * Scale notes (100 TB): the histogram is ONE map pass with map-side
  * combine into ≤64 rows, outer-joined onto the literal bucket grid
  * (64 rows — empties get pure noise); the cumulative and the four
  * rank probes are windows/joins over that 64-row relation. The exact
  * side is one Ranks.rowNumber pass (range-sliced), priced as the
  * audit's deliberate baseline. */
object Wave61Queries {

  private val DomainBits = 24
  private val Buckets = 64
  private val Width = (1L << DomainBits) / Buckets
  private val DpScale = 10.0
  private val Ps = Seq(25L, 50L, 75L, 90L)

  private val q239 = GQuery(
    "q239_dp_quantile",
    (s, d) => {
      val li = Tables.lineitem(s, d).select(
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("v"),
        col("l_orderkey"), col("l_linenumber"))
      val hist = li.groupBy(
          least(lit(Buckets - 1L), expr(s"v div $Width")).as("b"))
        .agg(count(lit(1)).as("n_true"))
      val grid = s.range(Buckets).select(col("id").as("b"))
      val u = (pmod(TextOps.shingleHash60(
        concat(lit("dpq:"), col("b").cast("string"))), lit(1048576L))
        + lit(0.5)) / lit(1048576.0) - lit(0.5)
      val released = grid.join(hist, Seq("b"), "left")
        .select(col("b"), coalesce(col("n_true"), lit(0L)).as("n_true"))
        .withColumn("u", u)
        .withColumn("noise", round(lit(-DpScale) * signum(col("u"))
          * log(lit(1.0) - lit(2.0) * abs(col("u"))), 6))
        .select(col("b"), greatest(lit(0L),
          round(col("n_true") + col("noise"), 0).cast("bigint"))
          .as("rel"))
      val cum = released
        .withColumn("cum", sum(col("rel")).over(
          Window.partitionBy().orderBy(col("b"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .crossJoin(broadcast(released.agg(sum(col("rel")).as("t"))))
      val dp = cum.select(col("b"), col("cum"), col("t"),
          explode(array(Ps.map(p => struct(lit(p).as("p"),
            expr(s"($p * t + 99) div 100").as("rp"))): _*)).as("x"))
        .filter(col("cum") >= col("x.rp"))
        .groupBy(col("x.p").as("p")).agg(min(col("b")).as("db"))
        .select(col("p"),
          (col("db") * Width + Width / 2).as("dp_cents"))
      // ranked feeds the count aggregate and the rank probe —
      // materialize per the Ranks multi-consumer rule (the q233 lesson)
      val ranked = graft.sources.Io.materialize(
        Ranks.rowNumber(li.withColumn("_g", lit(0)), "_g",
          Seq(col("v"), col("l_orderkey"), col("l_linenumber")), "rn"))
      val ks = ranked.agg(count(lit(1)).as("n"))
        .select(explode(array(Ps.map(p => struct(lit(p).as("p"),
          expr(s"($p * n + 99) div 100").as("k"))): _*)).as("x"))
        .select(col("x.p").as("p"), col("x.k").as("k"))
      val exact = ranked.join(broadcast(ks),
          col("rn").cast("long") === col("k"))
        .select(col("p"), col("v").as("exact_cents"))
      exact.join(broadcast(dp), "p")
        .select(col("p"), col("exact_cents"), col("dp_cents"),
          abs(col("dp_cents") - col("exact_cents")).as("abs_err"),
          expr(s"abs(dp_cents - exact_cents) * 1000000" +
            s" div ${1L << DomainBits}").as("err_domain_ppm"))
        .orderBy(col("p"))
    },
    Some {
      val pRows = Ps.map(p => s"SELECT ${p}::BIGINT AS p")
        .mkString(" UNION ALL ")
      s"""WITH li AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT)
                        AS v, l_orderkey, l_linenumber
                      FROM lineitem),
              h AS (SELECT least(${Buckets - 1}, v // $Width) AS b,
                           CAST(count(*) AS BIGINT) AS n_true
                    FROM li GROUP BY 1),
              g AS (SELECT unnest(range(0, $Buckets)) AS b),
              r AS (SELECT g.b, coalesce(n_true, 0) AS n_true,
                           ((CAST(concat('0x', substr(md5('dpq:'
                              || CAST(g.b AS VARCHAR)), 1, 15)) AS BIGINT)
                              % 1048576) + 0.5) / 1048576.0 - 0.5 AS u
                    FROM g LEFT JOIN h ON g.b = h.b),
              rel AS (SELECT b, greatest(0, CAST(round(n_true
                        + round(-$DpScale * sign(u)
                            * ln(1.0 - 2.0 * abs(u)), 6)) AS BIGINT))
                        AS rel
                      FROM r),
              cm AS (SELECT b, rel, sum(rel) OVER (ORDER BY b
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum,
                       (SELECT CAST(sum(rel) AS BIGINT) FROM rel) AS t
                     FROM rel),
              ps AS ($pRows),
              dp AS (SELECT p, min(b) * $Width + ${Width / 2} AS dp_cents
                     FROM cm, ps WHERE cum >= (p * t + 99) // 100
                     GROUP BY p),
              rk AS MATERIALIZED (
                SELECT v, row_number() OVER (
                  ORDER BY v, l_orderkey, l_linenumber) AS rn
                FROM li),
              n0 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM rk),
              ex AS (SELECT p, v AS exact_cents
                     FROM ps, n0, rk WHERE rk.rn = (p * n + 99) // 100)
         SELECT p, exact_cents, dp_cents,
                abs(dp_cents - exact_cents) AS abs_err,
                CAST(abs(dp_cents - exact_cents) * 1000000
                  // ${1L << DomainBits} AS BIGINT) AS err_domain_ppm
         FROM ex JOIN dp USING (p) ORDER BY p"""
    }
  )

  val all: Seq[GQuery] = Seq(q239)
}
