package graft.operators

import graft.GQuery
import graft.functions.TextOps
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-14 wave 59: q237 — CUPED variance-reduction audit.
  *
  * The experiment family runs the test (q143) and the readouts
  * (q166/q172); this sheet prices the standard variance-reduction
  * preprocessing every large experimentation platform applies first:
  * CUPED (Deng et al. 2013) — regress the experiment metric on a
  * PRE-EXPERIMENT covariate and analyze the residual
  * y′ = y − θ(x − x̄), which shrinks metric variance by exactly ρ²
  * while leaving treatment effects unbiased (the covariate predates
  * assignment). Here: per-user spend cents in days [0,15) of the
  * event span is the covariate, days [15,30) the metric, treatment a
  * hash coin; the sheet reports θ, the realized variance-reduction
  * ρ² in ppm, and per arm the raw vs CUPED-adjusted metric means —
  * the numbers that decide how much traffic the platform just saved.
  * User-activity variance makes x and y genuinely correlated in the
  * fixture (more-active users spend more in both halves), so the
  * reduction is real, not an artifact.
  *
  * Exactness: the q136 moment discipline — per-user integer cents,
  * DECIMAL(38,0) exact sums and product-moments, ONE cast to double
  * per derived quantity with the identical expression shape in both
  * engines; θ and means published under round(·, 6/4), the reduction
  * floored to ppm (floor, not cast — Spark truncates double→long
  * where DuckDB rounds).
  *
  * Scale notes (100 TB): one user-keyed aggregate (map-side combine)
  * builds the per-user (x, y) relation; moments are a single-row
  * aggregate over it; arms are a 2-group aggregate; everything after
  * is 1-row broadcast arithmetic. */
object Wave59Queries {

  private val q237 = GQuery(
    "q237_cuped",
    (s, d) => {
      val dec38 = DecimalType(38, 0)
      def m(c: org.apache.spark.sql.Column) = sum(c.cast(dec38))
      def mp(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
        sum(a.cast(dec38) * b.cast(dec38))
      val users = Tables.events(s, d).select(col("user_id"),
          expr("CAST(round(value * 100) AS BIGINT)").as("vc"),
          expr("CAST(datediff(CAST(ts AS DATE), date'2024-01-01') AS INT)")
            .as("day"))
        .groupBy(col("user_id"))
        .agg(sum(when(col("day") < 15, col("vc")).otherwise(lit(0L))).as("x"),
          sum(when(col("day") >= 15, col("vc")).otherwise(lit(0L))).as("y"))
        .withColumn("t", pmod(TextOps.shingleHash60(
          concat(col("user_id").cast("string"), lit(":cuped"))), lit(2)))
      val mom = users.agg(count(lit(1)).as("n"), m(col("x")).as("sx"),
        m(col("y")).as("sy"), mp(col("x"), col("y")).as("sxy"),
        mp(col("x"), col("x")).as("sxx"), mp(col("y"), col("y")).as("syy"))
      val cov = (col("sxy") * col("n") - col("sx") * col("sy")).cast("double")
      val vx = (col("sxx") * col("n") - col("sx") * col("sx")).cast("double")
      val vy = (col("syy") * col("n") - col("sy") * col("sy")).cast("double")
      val summary = mom.select(col("n"), col("sx"),
        round(cov / vx, 6).as("theta"),
        floor(cov * cov / (vx * vy) * 1000000d).cast("long")
          .as("reduction_ppm"))
      val arms = users.groupBy(col("t"))
        .agg(count(lit(1)).as("n_arm"), m(col("x")).as("sxa"),
          m(col("y")).as("sya"))
      arms.crossJoin(broadcast(summary))
        .select(col("t"), col("n_arm"), col("theta"), col("reduction_ppm"),
          round(col("sya").cast("double") / col("n_arm"), 4).as("mean_y"),
          round((col("sya").cast("double")
            - col("theta") * (col("sxa").cast("double")
              - col("n_arm") * (col("sx").cast("double") / col("n"))))
            / col("n_arm"), 4).as("mean_y_adj"))
        .orderBy(col("t"))
    },
    Some("""WITH u AS (SELECT user_id,
                   CAST(sum(CASE WHEN day < 15 THEN vc ELSE 0 END)
                     AS BIGINT) AS x,
                   CAST(sum(CASE WHEN day >= 15 THEN vc ELSE 0 END)
                     AS BIGINT) AS y,
                   CAST(concat('0x', substr(md5(
                     CAST(user_id AS VARCHAR) || ':cuped'), 1, 15))
                     AS BIGINT) % 2 AS t
                 FROM (SELECT user_id,
                         CAST(round(value * 100) AS BIGINT) AS vc,
                         CAST(ts AS DATE) - DATE '2024-01-01' AS day
                       FROM events)
                 GROUP BY user_id),
              m AS (SELECT CAST(count(*) AS BIGINT) AS n,
                           CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
                           CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
                           CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT)
                             AS sxy,
                           CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT)
                             AS sxx,
                           CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT)
                             AS syy
                    FROM u),
              sm AS (SELECT n, sx,
                            round(CAST(sxy * n - sx * sy AS DOUBLE)
                              / CAST(sxx * n - sx * sx AS DOUBLE), 6)
                              AS theta,
                            CAST(floor(CAST(sxy * n - sx * sy AS DOUBLE)
                              * CAST(sxy * n - sx * sy AS DOUBLE)
                              / (CAST(sxx * n - sx * sx AS DOUBLE)
                                 * CAST(syy * n - sy * sy AS DOUBLE))
                              * 1000000) AS BIGINT) AS reduction_ppm
                     FROM m),
              a AS (SELECT t, CAST(count(*) AS BIGINT) AS n_arm,
                           CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sxa,
                           CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sya
                    FROM u GROUP BY 1)
         SELECT t, n_arm, theta, reduction_ppm,
                round(CAST(sya AS DOUBLE) / n_arm, 4) AS mean_y,
                round((CAST(sya AS DOUBLE)
                  - theta * (CAST(sxa AS DOUBLE)
                    - n_arm * (CAST(sx AS DOUBLE) / n))) / n_arm, 4)
                  AS mean_y_adj
         FROM a, sm ORDER BY t""")
  )

  val all: Seq[GQuery] = Seq(q237)
}
