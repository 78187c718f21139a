package graft.operators

import graft.GQuery
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 wave 10: the mergeable quantile sketch that completes the
  * engine's sketch family (KMV cardinality ✓, Misra–Gries frequency ✓,
  * Bloom membership ✓, MinHash/SimHash similarity ✓ — quantiles were the
  * missing one), plus graph q138 (k-core, registered with its family in
  * DedupQueries).
  */
object Wave10Queries {

  /** q137 — histogram quantile sketch vs exact: p50/p90/p99 of the event
    * value estimated from a 256-bucket equi-width histogram with linear
    * interpolation inside the crossing bucket, published NEXT TO the
    * exact rank-based quantiles and the absolute error. This is how p99
    * is actually monitored at scale (Prometheus/HDR-style bucket
    * counts): the sketch state is 256 integers, it merges by vector
    * addition (order-free, partial-combines map-side — the property
    * approx_percentile's GK sketch gives up for its tighter error), and
    * unlike GK it is deterministic and engine-portable, so the WHOLE
    * estimator is oracle-checked, not just demonstrated.
    *
    * Determinism: bucket counts are exact integers; the crossing bucket
    * per p is an integer argmin over the 256-row cumulative relation;
    * the interpolation is one literal double formula on integers; exact
    * quantiles ride Ranks.quantilesCont (the q85/q116 machinery — one
    * rank pass for all three ps).
    *
    * Scale notes: one 256-group aggregate with map-side combine (the
    * sketch), a 256-row window-over-aggregate cumsum, a 1-row n
    * broadcast; the exact side is the parallel range-partitioned rank.
    * At 100 TB only the sketch side survives (that is its point) and its
    * shuffle carries 256 longs per map partition. */
  private val HqBuckets = 256
  private val HqWidth = 2.0
  private val q137 = GQuery(
    "q137_histogram_quantiles",
    (s, d) => {
      val ev = Tables.events(s, d)
      val hist = ev
        .groupBy(least(lit(HqBuckets - 1),
          greatest(lit(0), floor(col("value") / HqWidth))).cast("int").as("b"))
        .agg(count(lit(1)).as("c"))
        .withColumn("cum", sum(col("c")).over(Window.orderBy(col("b"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .crossJoin(broadcast(ev.agg(count(lit(1)).as("n"))))
      val ps = Seq(0.50 -> "p50", 0.90 -> "p90", 0.99 -> "p99")
      val est = ps.map { case (p, name) =>
        // crossing bucket: first b with cum >= p*n; linear interpolation
        // from the bucket's exclusive prefix (cum - c)
        hist.filter(col("cum") >= col("n") * p)
          .agg(min(struct(col("b"), col("c"), col("cum"), col("n"))).as("x"))
          .select(lit(p).as("p"),
            round(col("x.b") * HqWidth
              + lit(HqWidth) * (col("x.n") * p - (col("x.cum") - col("x.c")))
                / col("x.c"), 6).as("est_value"))
      }.reduce(_ unionAll _)
      val exact = Ranks.quantilesCont(
        ev.withColumn("g", lit(1)), "g", col("value"),
        ps.map { case (p, name) => p -> name })
      val exactLong = ps.map { case (p, name) =>
        exact.select(lit(p).as("p"), round(col(name), 6).as("exact_value"))
      }.reduce(_ unionAll _)
      est.join(exactLong, "p")
        .withColumn("abs_err", round(abs(col("est_value") - col("exact_value")), 6))
        .orderBy(col("p"))
    },
    Some(s"""WITH h AS (SELECT LEAST(${HqBuckets - 1}, GREATEST(0,
                          CAST(floor(value / $HqWidth) AS INTEGER))) AS b,
                               count(*) AS c
                        FROM events GROUP BY 1),
             cm AS (SELECT b, c,
                           CAST(sum(c) OVER (ORDER BY b
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                                AS BIGINT) AS cum,
                           (SELECT count(*) FROM events) AS n
                    FROM h),
             ps AS (SELECT CAST(unnest([0.50, 0.90, 0.99]) AS DOUBLE) AS p),
             x AS (SELECT p, min_by(cm, cm.b) AS m
                   FROM ps JOIN cm ON cm.cum >= cm.n * ps.p
                   GROUP BY p),
             e AS (SELECT p,
                          round(m.b * $HqWidth
                            + $HqWidth * (m.n * p - (m.cum - m.c)) / m.c, 6)
                            AS est_value
                   FROM x),
             q AS (SELECT CAST(unnest([0.50, 0.90, 0.99]) AS DOUBLE) AS p,
                          unnest(quantile_cont(value, [0.50, 0.90, 0.99]))
                            AS exact_raw
                   FROM events)
             SELECT e.p, est_value, round(exact_raw, 6) AS exact_value,
                    round(abs(est_value - round(exact_raw, 6)), 6) AS abs_err
             FROM e JOIN q ON e.p = q.p ORDER BY e.p""")
  )

  val all: Seq[GQuery] = Seq(q137)
}
