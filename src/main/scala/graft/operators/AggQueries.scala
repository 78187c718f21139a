package graft.operators

import graft.{Cols, GQuery}
import graft.sources.{Io, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Scan + aggregation family — the reference's part 2 (max_aggregation.cpp)
  * generalized. The reference's partial-max-per-chunk then CAS/semaphore
  * combine (max_aggregation.cpp:54-60, 91-96) is exactly Spark's
  * partial→final HashAggregateExec: map-side partial aggregation, a
  * shuffle of one row per (partition × group), final merge. No shared
  * mutable state exists at any scale.
  *
  * Scale notes: all aggregates here are algebraic (partial+merge), so the
  * shuffle carries #groups rows, not #input rows. Filters and projections
  * reach the parquet scan (PushedFilters / ReadSchema — verified via
  * explain in the test suite).
  */
object AggQueries {
  import Cols._

  /** q02 — the reference's global MAX (R6-R8) on lineitem. */
  private val q02 = GQuery(
    "q02_global_max",
    (s, d) =>
      Tables.lineitem(s, d).agg(
        max(col("l_extendedprice")).as("max_price"),
        min(col("l_extendedprice")).as("min_price"),
        count(lit(1)).as("n_rows")),
    Some("""SELECT max(l_extendedprice) AS max_price, min(l_extendedprice) AS min_price,
                   count(*) AS n_rows FROM lineitem""")
  )

  /** q05 — scan + projection + predicate; both pushed to parquet. */
  private val q05 = GQuery(
    "q05_scan_project_filter",
    (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_discount") > 0.05 &&
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_discount"))
        // (l_orderkey, l_linenumber) is NOT unique in this data — order by
        // every output column so duplicate keys can't permute rows.
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_discount")),
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_discount FROM lineitem
            WHERE l_discount > 0.05 AND l_shipdate >= TIMESTAMP '1996-01-01'
            ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount""")
  )

  /** q06 — TPC-H Q1-shaped multi-aggregate group-by. Money sums accumulate
    * through exact decimal (Cols); l_quantity is integer-valued so its
    * double sum is exact; averages divide two deterministic values.
    *
    * The disc_price/charge products multiply DECIMALS, not doubles
    * (sf1 lesson): each factor is an exact-hundredth double, so its
    * decimal cast rounds identically on any engine — but the DOUBLE
    * product of those factors is not, because Spark's double→decimal
    * cast rounds the shortest decimal representation while DuckDB rounds
    * the true binary value, and once in ~10^6 rows the two land on
    * opposite sides of a scale-6 rounding boundary (one such row in the
    * sf1 fixture's F/N group shifted sum_charge by 1e-5). Decimal-first
    * products make every per-row value — and therefore the exact sums —
    * bit-identical cross-engine at any scale.
    *
    * And those two sums STAY DECIMAL in the output (second sf1 lesson):
    * at sf1 sum_charge is ~5.2e10 with scale 6 — 17 significant digits,
    * past what a double can hold — and the final decimal→double cast
    * itself diverges (Spark converts the exact decimal in one correctly-
    * rounded step; DuckDB converts the int128 to double and then divides
    * by 10^scale, two roundings). A money total a double can't represent
    * shouldn't be shipped as a double anyway. Both engines cast the sum
    * to the same explicit DECIMAL(38,s) so the driver's type-sensitive
    * hash sees identical schemas. */
  private val q06 = GQuery(
    "q06_agg_groupby",
    (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          dsum2(col("l_extendedprice")).as("sum_base_price"),
          sum(dec2(col("l_extendedprice")) *
            (lit(1.0) - col("l_discount")).cast("decimal(4,2)"))
            .cast("decimal(38,4)").as("sum_disc_price"),
          sum(dec2(col("l_extendedprice")) *
            (lit(1.0) - col("l_discount")).cast("decimal(4,2)") *
            (lit(1.0) + col("l_tax")).cast("decimal(4,2)"))
            .cast("decimal(38,6)").as("sum_charge"),
          (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          (sum(dec2(col("l_extendedprice"))).cast(DoubleType) / count(lit(1))).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus")),
    Some("""SELECT l_returnflag, l_linestatus,
                   sum(l_quantity) AS sum_qty,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))*CAST(1.0-l_discount AS DECIMAL(4,2))) AS DECIMAL(38,4)) AS sum_disc_price,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))*CAST(1.0-l_discount AS DECIMAL(4,2))*CAST(1.0+l_tax AS DECIMAL(4,2))) AS DECIMAL(38,6)) AS sum_charge,
                   sum(l_quantity)/count(*) AS avg_qty,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)/count(*) AS avg_price,
                   count(*) AS count_order
            FROM lineitem
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus""")
  )

  /** q07 — COUNT(DISTINCT): Spark plans Expand + two-phase aggregation;
    * distinct-by-key stays distributed (shuffle on the distinct key). */
  private val q07 = GQuery(
    "q07_agg_distinct",
    (s, d) =>
      Tables.orders(s, d).agg(
        countDistinct(col("o_custkey")).as("n_cust"),
        countDistinct(col("o_orderpriority")).as("n_prio"),
        count(lit(1)).as("n_orders")),
    Some("""SELECT count(DISTINCT o_custkey) AS n_cust,
                   count(DISTINCT o_orderpriority) AS n_prio,
                   count(*) AS n_orders FROM orders""")
  )

  /** q08 — ROLLUP: Expand (one replica per grouping set) + hash agg.
    * Grouping-null rows are labeled 'ALL' (sentinel outside the domain)
    * so ordering is deterministic across engines' null-order defaults. */
  private val q08 = GQuery(
    "q08_agg_rollup",
    (s, d) =>
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("sum_qty"), col("n"))
        .orderBy(col("flag"), col("status")),
    Some("""SELECT coalesce(l_returnflag, 'ALL') AS flag,
                   coalesce(l_linestatus, 'ALL') AS status,
                   sum(l_quantity) AS sum_qty, count(*) AS n
            FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
            ORDER BY flag, status""")
  )

  /** q09 — CUBE over orders, same Expand strategy as q08. */
  private val q09 = GQuery(
    "q09_agg_cube",
    (s, d) =>
      Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum2(col("o_totalprice")).as("sum_price"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("sum_price"))
        .orderBy(col("status"), col("priority")),
    Some("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
                   coalesce(o_orderpriority, 'ALL') AS priority,
                   count(*) AS n,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
            FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
            ORDER BY status, priority""")
  )

  /** q40 — statistical aggregates: stddev, correlation, exact interpolated
    * median. Rounded to 6 digits: the estimators accumulate in doubles
    * (merge-order differences ~1e-10 relative), and 6 digits is far above
    * that noise while far below data resolution. avg(discount) goes
    * through exact decimal like all money averages. */
  private val q40 = GQuery(
    "q40_agg_stats",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      // median via the distributed-rank decomposition (Ranks.quantileCont)
      // instead of `percentile`, whose per-group sort runs in ONE task —
      // same interpolated value, parallel local sorts (see q63)
      val med = Ranks.quantileCont(li, "l_returnflag",
        col("l_extendedprice"), 0.5, "med")
      li.groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
          round(sum(dec2(col("l_discount"))).cast(DoubleType) / count(lit(1)), 6).as("avg_disc"))
        .join(broadcast(med), "l_returnflag")
        .select(col("l_returnflag"), col("n"), col("sd_qty"), col("corr_qty_price"),
          round(col("med"), 6).as("median_price"), col("avg_disc"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag, count(*) AS n,
                   round(stddev_samp(l_quantity), 6) AS sd_qty,
                   round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
                   round(quantile_cont(l_extendedprice, 0.5), 6) AS median_price,
                   round(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_disc
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
  )

  /** q43 — sketch aggregates. Sketch *internals* have no cross-engine SQL
    * parity (Spark HLL++ ≠ DuckDB HLL), so the driver-checkable contract is
    * structured as: exact reference columns (oracle-diffed value-by-value)
    * plus boolean within-bound claims about the sketch outputs — Spark
    * computes |approx−exact|/exact against the documented error budget
    * (HLL++ default rsd 0.05 → 3σ budget 0.15; percentile_approx accuracy
    * 1000 → 1% value budget on this distribution), the oracle asserts TRUE.
    * Both engines' columns are then exactly comparable, and the raw sketch
    * accuracy is additionally asserted in ScalaTest (ApproxAggSpec).
    * At 100 TB the sketches replace exact distinct/percentile where a
    * bounded-memory mergeable sketch is the only sane plan: constant state
    * per partition, one tiny merge shuffle (the exact columns here are the
    * verification harness, not the production plan).
    *
    * Plan shape: the two exact distinct counts run as separate two-step
    * aggregations (dedup on (flag, key) with map-side partial dedup, then
    * count per flag) joined onto the single-pass sketch aggregate over
    * 3-row relations. A single groupBy with two countDistinct would plan
    * an Expand (×3 the input into one sort-aggregate) — measured 6× slower
    * at sf0.1 and strictly worse at scale. */
  private val q43 = GQuery(
    "q43_agg_approx",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      def exactDistinct(key: String, as: String): DataFrame =
        li.select(col("l_returnflag"), col(key)).distinct()
          .groupBy(col("l_returnflag")).agg(count(lit(1)).as(as))
      val sketches = li
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          approx_count_distinct(col("l_partkey")).as("ap"),
          approx_count_distinct(col("l_orderkey")).as("ao"),
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("am"))
      sketches
        .join(exactDistinct("l_partkey", "exact_parts"), "l_returnflag")
        .join(exactDistinct("l_orderkey", "exact_orders"), "l_returnflag")
        .join(broadcast(Ranks.quantileCont(li, "l_returnflag",
          col("l_extendedprice"), 0.5, "em")), "l_returnflag")
        .select(col("l_returnflag"), col("n"), col("exact_parts"), col("exact_orders"),
          (abs(col("ap") - col("exact_parts")) / col("exact_parts") <= 0.15).as("parts_in_bound"),
          (abs(col("ao") - col("exact_orders")) / col("exact_orders") <= 0.15).as("orders_in_bound"),
          (abs(col("am") - col("em")) / col("em") <= 0.01).as("median_in_bound"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag, count(*) AS n,
                   count(DISTINCT l_partkey) AS exact_parts,
                   count(DISTINCT l_orderkey) AS exact_orders,
                   TRUE AS parts_in_bound, TRUE AS orders_in_bound,
                   TRUE AS median_in_bound
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
  )

  /** q63 — distributed exact median: the scale path for q40/q43's exact
    * `percentile`, which sorts each group inside ONE task (3 tasks total
    * here, single-threaded at any cluster size). Decomposition via
    * Ranks.rowNumber: range-partitioned parallel local sorts + broadcast
    * slice offsets give every row its global rank per group; the median is
    * then interpolated from the two rows at positions ⌊(n−1)p⌋+1 and +2 —
    * a k-row aggregate. Ties in value make rank assignment among equals
    * arbitrary but the selected VALUES identical, so the result is exact
    * and deterministic. */
  private val q63 = GQuery(
    "q63_distributed_median",
    (s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_extendedprice"))
      Ranks.quantileCont(li, "l_returnflag", col("l_extendedprice"), 0.5, "m")
        .select(col("l_returnflag"), round(col("m"), 6).as("median_price"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag,
                   round(quantile_cont(l_extendedprice, 0.5), 6) AS median_price
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
  )

  /** q44 — GROUPING SETS beyond rollup/cube (the general form), expressed
    * through the engine's SQL-text interface over registered views — the
    * same Expand-based physical plan as q08/q09. */
  private val q44 = GQuery(
    "q44_grouping_sets",
    (s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      s.sql("""SELECT coalesce(l_returnflag, 'ALL') AS flag,
                      coalesce(l_linestatus, 'ALL') AS status,
                      sum(l_quantity) AS sum_qty, count(*) AS n
               FROM lineitem
               GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
               ORDER BY flag, status""")
    },
    Some("""SELECT coalesce(l_returnflag, 'ALL') AS flag,
                   coalesce(l_linestatus, 'ALL') AS status,
                   sum(l_quantity) AS sum_qty, count(*) AS n
            FROM lineitem
            GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
            ORDER BY flag, status""")
  )

  /** q45 — pivot (wide aggregation): per returnflag, one quantity-sum
    * column per linestatus. Explicit pivot values keep the output schema
    * deterministic; the oracle mirrors with CASE aggregation. */
  private val q45 = GQuery(
    "q45_pivot",
    (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sum(col("l_quantity")))
        .withColumnRenamed("F", "qty_f")
        .withColumnRenamed("O", "qty_o")
        .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag,
                   sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS qty_f,
                   sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS qty_o
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
  )

  /** q105 — distributed numeric histogram + sketch quantile (wave 5):
    * fixed-width 5000-unit buckets over l_extendedprice with cumulative
    * counts and the histogram-estimated median (the bucket whose
    * cumulative count first reaches half the rows). This is the
    * numeric-profiling primitive behind data validation and the
    * one-pass approximate-quantile path a 100 TB pipeline uses when
    * q63's exact rank machinery is overkill — error bounded by bucket
    * width, cost bounded by ONE map-side-combined aggregate.
    *
    * Scale notes: bucket assignment is a map-only projection; the
    * aggregate is |buckets|-sized (value-range-bounded, NOT row-bounded);
    * the cumulative window runs over that bounded aggregate (q70/q83
    * pattern). is_median_bucket is exact integer arithmetic. */
  private val q105 = GQuery(
    "q105_histogram",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wTot = Window.partitionBy()
      Tables.lineitem(s, d)
        .select(floor(col("l_extendedprice") / 5000).cast("long").as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
        .withColumn("cum_cnt", sum(col("cnt")).over(w))
        .withColumn("total", sum(col("cnt")).over(wTot))
        .select(col("bucket"),
          (col("bucket") * 5000).as("lo"), ((col("bucket") + 1) * 5000).as("hi"),
          col("cnt"), col("cum_cnt"),
          (col("cum_cnt") * 2 >= col("total") &&
            (col("cum_cnt") - col("cnt")) * 2 < col("total"))
            .as("is_median_bucket"))
        .orderBy(col("bucket"))
    },
    Some("""WITH h AS (SELECT CAST(floor(l_extendedprice / 5000) AS BIGINT) AS bucket,
                              count(*) AS cnt
                       FROM lineitem GROUP BY 1),
                 c AS (SELECT bucket, cnt,
                              CAST(sum(cnt) OVER (ORDER BY bucket
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cnt,
                              CAST(sum(cnt) OVER () AS BIGINT) AS total
                       FROM h)
            SELECT bucket, bucket * 5000 AS lo, (bucket + 1) * 5000 AS hi,
                   cnt, cum_cnt,
                   (cum_cnt * 2 >= total AND (cum_cnt - cnt) * 2 < total)
                     AS is_median_bucket
            FROM c ORDER BY bucket""")
  )

  /** q110 — activity-outlier detection (wave 5): users whose event count
    * deviates ≥ 2σ from the population — the abuse/bot screen a training
    * pipeline runs over behavioral data before trusting it. Moments are
    * EXACT integer sums (Σn, Σn², N) broadcast as one row; μ/σ/z then
    * derive through the IDENTICAL formula in both engines on
    * identical integer-valued doubles, so even the ≥ 2σ membership test
    * is deterministic — a Welford-style stddev would be reduction-order-
    * dependent and could flip a boundary user between runs.
    *
    * Scale notes: one user-keyed count (partial combine), one
    * 1-row moment aggregate over the |users|-sized relation, broadcast
    * back (BroadcastNestedLoopJoin, constant work). */
  private val q110 = GQuery(
    "q110_rate_outliers",
    (s, d) => {
      val perUser = Tables.events(s, d)
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
      val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
      // decimal-operand square (ADVICE r7 pattern): a long n² wraps
      // silently for a >3e9-event user; decimal matches the oracle's exact
      // integer arithmetic at any magnitude
      val moments = perUser.agg(sum(col("n_events")).as("s1"),
        sum(col("n_events").cast(dec38) * col("n_events").cast(dec38)).as("s2"),
        count(lit(1)).as("nu"))
      perUser.crossJoin(broadcast(moments))
        .withColumn("mu", col("s1").cast("double") / col("nu"))
        .withColumn("sigma",
          sqrt(col("s2").cast("double") / col("nu") - col("mu") * col("mu")))
        // σ = 0 (all users at the same count — any 1-user batch) must
        // yield "no outliers", not an ANSI divide-by-zero: z is null
        // there and the filter drops it. The zero test is INTEGER
        // (n·Σn² > (Σn)², exact decimal — identical to the oracle's
        // CASE), because the double-computed sigma can land at ±ε of
        // zero and disagree with the oracle about which side it is on
        .withColumn("z", when(
          col("s2").cast(org.apache.spark.sql.types.DecimalType(38, 0))
            * col("nu") >
            col("s1").cast(org.apache.spark.sql.types.DecimalType(38, 0))
              * col("s1"),
          (col("n_events") - col("mu")) / col("sigma")))
        .filter(abs(col("z")) >= 2.0)
        .select(col("user_id"), col("n_events"), round(col("z"), 4).as("z"))
        .orderBy(col("user_id"))
    },
    Some("""WITH p AS (SELECT user_id, count(*) AS n_events
                       FROM events GROUP BY user_id),
                 m AS (SELECT CAST(sum(n_events) AS BIGINT) AS s1,
                              CAST(sum(n_events * n_events) AS BIGINT) AS s2,
                              count(*) AS nu
                       FROM p),
                 z AS (SELECT user_id, n_events,
                              CASE WHEN s2 * nu > s1 * s1 THEN
                                (n_events - (CAST(s1 AS DOUBLE) / nu))
                                  / sqrt(CAST(s2 AS DOUBLE) / nu
                                         - (CAST(s1 AS DOUBLE) / nu)
                                         * (CAST(s1 AS DOUBLE) / nu)) END AS z
                       FROM p, m)
            SELECT user_id, n_events, round(z, 4) AS z
            FROM z WHERE abs(z) >= 2.0 ORDER BY user_id""")
  )

  /** Poisson(1) CDF thresholds for the q118 bootstrap weights. The exact
    * decimal strings matter more than their last-ulp accuracy: the SAME
    * literals appear in the oracle SQL, both engines parse a literal to
    * the nearest double identically, and u is bit-identical (md5-60bit /
    * 2^60 in double arithmetic), so the CASE picks the same weight on
    * both sides — no epsilon anywhere. */
  private val PoissonCdf = Seq(
    0 -> "0.36787944117144233", 1 -> "0.7357588823428847",
    2 -> "0.9196986029286058", 3 -> "0.9810118431238462",
    4 -> "0.9963401531726563", 5 -> "0.9994058151824183")

  /** q118 — Poisson-bootstrap confidence intervals (round 7): per
    * event_type, the mean of `value` with a bootstrap CI from 32
    * resampled replicates. The Poisson bootstrap is THE distributed
    * bootstrap (each row draws an independent Poisson(1) replication
    * weight per replicate — no global resample pass, no sampling without
    * replacement across partitions), and this one is fully deterministic:
    * the weight comes from inverse-CDF-transforming the md5-60bit hash
    * of (event_id, replicate). Training pipelines bootstrap exactly like
    * this to put error bars on corpus quality metrics before acting on
    * a filter threshold.
    *
    * Determinism: replicate r draws its uniform from a 16-BIT window of
    * one md5 — digest g = r div 8 over (event_id, g), hex window
    * i = r mod 8 — so u = v/65536 with v a 16-bit integer is the same
    * exact double in both engines (16-bit int to double is exact; the
    * divisor is a power of two). Weights via shared literal thresholds
    * (PoissonCdf — the 16-bit grid shifts each bucket probability by
    * < 2^-16, identically on both sides); replicate means accumulate
    * through exact decimal then divide as identical doubles; the CI is
    * an order statistic (2nd/31st of 32 sorted replicate means) — exact,
    * no floating aggregate over the replicate axis.
    *
    * Scale notes: the 32× row expansion is the bootstrap's intrinsic
    * cost and it map-side partial-combines into |event_type|·32 groups —
    * the shuffle carries groups, not rows. Hashing is NOT per replicate:
    * 4 digests serve all 32 draws (a Poisson(1) weight needs ~3 bits of
    * entropy, not 60 — the original one-md5-per-replicate cut spent 8×
    * the hash work for zero statistical gain), and Io.fanOut rebalances
    * the slim input first so the expansion runs at full width (together:
    * 5.0 s → ~0.8 s at sf0.1). The per-type CI state is a bounded
    * 32-element array; point estimates join the CI relation broadcast. */
  private val q118 = GQuery(
    "q118_poisson_bootstrap",
    (s, d) => {
      val ev = Tables.events(s, d)
      val wt = PoissonCdf.foldRight(lit(6): org.apache.spark.sql.Column) {
        case ((k, thr), rest) => when(col("u") < lit(thr.toDouble), lit(k)).otherwise(rest)
      }
      val repMeans = Io.fanOut(
        ev.select(col("event_type"), col("event_id"), col("value")))
        .withColumn("g", explode(sequence(lit(0), lit(3))))
        .withColumn("hex", md5(
          concat(col("event_id").cast("string"), lit("|"), col("g").cast("string"))))
        .withColumn("i", explode(sequence(lit(0), lit(7))))
        .withColumn("rep", col("g") * 8 + col("i"))
        .withColumn("u",
          conv(expr("substring(hex, i * 4 + 1, 4)"), 16, 10)
            .cast("long").cast("double") / lit(65536.0))
        .withColumn("wt", wt)
        .groupBy(col("event_type"), col("rep"))
        .agg(round(sum(col("wt") * Cols.dec2(col("value"))).cast(DoubleType)
          / sum(col("wt")).cast(DoubleType), 6).as("rep_mean"))
      val ci = repMeans
        .groupBy(col("event_type"))
        .agg(sort_array(collect_list(col("rep_mean"))).as("ms"))
        .select(col("event_type"), element_at(col("ms"), 2).as("ci_lo"),
          element_at(col("ms"), 31).as("ci_hi"))
      ev.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          round(Cols.dsum2(col("value")) / count(lit(1)), 6).as("mean_value"))
        .join(broadcast(ci), "event_type")
        .select(col("event_type"), col("n_events"), col("mean_value"),
          col("ci_lo"), col("ci_hi"))
        .orderBy(col("event_type"))
    },
    Some("""WITH gs AS (SELECT unnest(range(0, 4)) AS g),
            ws AS (SELECT unnest(range(0, 8)) AS i),
            h AS (SELECT e.event_type, e.value, g.g,
                    md5(concat(e.event_id, '|', g.g)) AS hex
                  FROM events e CROSS JOIN gs g),
            w AS (SELECT event_type, g * 8 + i AS rep, value,
                    CAST(CAST(concat('0x', substr(hex, i * 4 + 1, 4)) AS BIGINT) AS DOUBLE)
                      / 65536.0 AS u
                  FROM h CROSS JOIN ws),
            pw AS (SELECT event_type, rep, value,
                     CASE WHEN u < 0.36787944117144233 THEN 0
                          WHEN u < 0.7357588823428847 THEN 1
                          WHEN u < 0.9196986029286058 THEN 2
                          WHEN u < 0.9810118431238462 THEN 3
                          WHEN u < 0.9963401531726563 THEN 4
                          WHEN u < 0.9994058151824183 THEN 5
                          ELSE 6 END AS wt
                   FROM w),
            rm AS (SELECT event_type, rep,
                     round(CAST(sum(wt * CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                           / CAST(sum(wt) AS DOUBLE), 6) AS rep_mean
                   FROM pw GROUP BY event_type, rep),
            ci AS (SELECT event_type, (list_sort(list(rep_mean)))[2] AS ci_lo,
                          (list_sort(list(rep_mean)))[31] AS ci_hi
                   FROM rm GROUP BY event_type)
            SELECT e.event_type, count(*) AS n_events,
                   round(CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE)
                         / count(*), 6) AS mean_value,
                   min(ci.ci_lo) AS ci_lo, min(ci.ci_hi) AS ci_hi
            FROM events e JOIN ci USING (event_type)
            GROUP BY e.event_type ORDER BY e.event_type""")
  )

  val all: Seq[GQuery] = Seq(q02, q05, q06, q07, q08, q09, q40, q43, q44,
    q45, q63, q105, q110, q118)
}
