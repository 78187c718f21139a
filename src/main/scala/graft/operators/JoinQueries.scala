package graft.operators

import graft.{Cols, GQuery}
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Join family — absent from the reference (SURVEY §2-A absence audit);
  * mandated by the engine's north star. All joins are declared, not
  * hand-scheduled: Catalyst picks SMJ/broadcast, AQE re-plans skew at
  * runtime.
  *
  * Scale notes (100 TB): fact-to-fact joins shuffle on the join key
  * (sort-merge); dimension joins are hinted broadcast so the fact side
  * never shuffles. The as-of join deliberately avoids the join+filter
  * fan-out plan — see q15.
  */
object JoinQueries {
  import Cols._

  /** q10 — equi inner join orders ⋈ customer (FK → PK). At scale: shuffle
    * hash/sort-merge on custkey; output re-sorted by unique o_orderkey. */
  private val q10 = GQuery(
    "q10_join_inner",
    (s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      o.join(c, o("o_custkey") === c("c_custkey"))
        .select(col("o_orderkey"), col("c_name"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    },
    Some("""SELECT o_orderkey, c_name, o_totalprice
            FROM orders JOIN customer ON o_custkey = c_custkey
            ORDER BY o_orderkey""")
  )

  /** q11 — broadcast join: part is a dimension table, explicitly hinted so
    * the lineitem side avoids any shuffle (BroadcastHashJoinExec). */
  private val q11 = GQuery(
    "q11_join_broadcast",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val p = Tables.part(s, d)
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"), dsum2(col("l_extendedprice")).as("sum_price"))
        .orderBy(col("p_brand"))
    },
    Some("""SELECT p_brand, count(*) AS n,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand ORDER BY p_brand""")
  )

  /** q12 — left outer join with null-aware aggregates: customers keep a
    * row even with zero orders (count of the null key = 0). */
  private val q12 = GQuery(
    "q12_join_outer",
    (s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          coalesce(sum(dec2(col("o_totalprice"))).cast(DoubleType), lit(0.0)).as("sum_price"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, count(o_orderkey) AS n_orders,
                   coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS sum_price
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey ORDER BY c_custkey""")
  )

  /** q13 — semi + anti join (EXISTS / NOT EXISTS). Both plan as SMJ
    * semi/anti: no fan-out, left row emitted at most once. */
  private val q13 = GQuery(
    "q13_join_semi_anti",
    (s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      val semi = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), lit("has_orders").as("tag"))
      val anti = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), lit("no_orders").as("tag"))
      semi.unionAll(anti).orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, tag FROM (
              SELECT c_custkey, 'has_orders' AS tag FROM customer
              WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
              UNION ALL
              SELECT c_custkey, 'no_orders' AS tag FROM customer
              WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey))
            ORDER BY c_custkey""")
  )

  /** q14 — non-equi range join: event pairs of the same user within a
    * 5-minute forward window. The equi component (user_id) keys the
    * shuffle, the range predicate filters inside each joined group, so
    * fan-out is bounded by per-user activity in 5 minutes. At 100 TB a
    * time-bucketed key (user_id, ts_bucket) would bound the group size;
    * per-user cardinality here scales with sf (~67 events/user). */
  private val q14 = GQuery(
    "q14_join_range_theta",
    (s, d) => {
      val e = Tables.events(s, d)
      val e1 = e.select(col("user_id"), col("ts").as("ts1"))
      val e2 = e.select(col("user_id").as("uid2"), col("ts").as("ts2"))
      e1.join(e2,
          col("user_id") === col("uid2") &&
          col("ts2") > col("ts1") &&
          col("ts2") <= col("ts1") + expr("INTERVAL '5' MINUTE"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("user_id"))
    },
    Some("""SELECT e1.user_id, count(*) AS n_pairs
            FROM events e1 JOIN events e2
              ON e1.user_id = e2.user_id
             AND e2.ts > e1.ts AND e2.ts <= e1.ts + INTERVAL 5 MINUTE
            GROUP BY e1.user_id ORDER BY e1.user_id""")
  )

  /** q15 — as-of join (latest order with o_orderdate <= event ts, per
    * user). Spark SQL has no native as-of, and the naive plan
    * (inequality join then keep rank 1) materializes every event×order
    * pair before discarding all but one — quadratic per key. Instead we
    * use the scalable union-merge form: interleave build rows (orders)
    * and probe rows (events) on one per-user timeline, then carry the
    * last build row forward with `last(..., ignoreNulls)` over an
    * unbounded-preceding frame. One shuffle on user_id, O(n log n)
    * per key, no fan-out. Build rows sort before probes at equal ts
    * (inclusive <=); same-date orders tie-break by max o_orderkey. */
  private val q15 = GQuery(
    "q15_join_asof",
    (s, d) => {
      val probes = Tables.events(s, d).select(
        col("user_id"), col("ts").as("t"), lit(1).as("is_probe"),
        col("event_id"),
        lit(null).cast("bigint").as("o_orderkey"),
        lit(null).cast("double").as("o_totalprice"))
      val builds = Tables.orders(s, d).select(
        col("o_custkey").as("user_id"), col("o_orderdate").as("t"),
        lit(0).as("is_probe"),
        lit(null).cast("bigint").as("event_id"),
        col("o_orderkey"), col("o_totalprice"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("t"), col("is_probe"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      probes.unionAll(builds)
        .withColumn("asof_orderkey", last(col("o_orderkey"), ignoreNulls = true).over(w))
        .withColumn("asof_totalprice", last(col("o_totalprice"), ignoreNulls = true).over(w))
        .filter(col("is_probe") === 1)
        .select(col("event_id"), col("user_id"), col("asof_orderkey"), col("asof_totalprice"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT event_id, user_id, asof_orderkey, asof_totalprice FROM (
              SELECT e.event_id, e.user_id, o.o_orderkey AS asof_orderkey,
                     o.o_totalprice AS asof_totalprice,
                     row_number() OVER (PARTITION BY e.event_id
                       ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
              FROM events e LEFT JOIN orders o
                ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts)
            WHERE rn = 1 ORDER BY event_id""")
  )

  /** q48 — full outer join over per-nation aggregates: customer nations
    * without suppliers survive from the left, supplier nations without
    * customers from the right; both counts null-coalesce to 0. */
  private val q48 = GQuery(
    "q48_join_full_outer",
    (s, d) => {
      val cn = Tables.customer(s, d).groupBy(col("c_nationkey").as("nk_c"))
        .agg(count(lit(1)).as("n_cust"))
      val sn = Tables.supplier(s, d).groupBy(col("s_nationkey").as("nk_s"))
        .agg(count(lit(1)).as("n_supp"))
      cn.join(sn, col("nk_c") === col("nk_s"), "full_outer")
        .select(
          coalesce(col("nk_c"), col("nk_s")).as("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
        .orderBy(col("nationkey"))
    },
    Some("""SELECT coalesce(nk_c, nk_s) AS nationkey,
                   coalesce(n_cust, 0) AS n_cust,
                   coalesce(n_supp, 0) AS n_supp
            FROM (SELECT c_nationkey AS nk_c, count(*) AS n_cust
                  FROM customer GROUP BY c_nationkey) c
            FULL OUTER JOIN
                 (SELECT s_nationkey AS nk_s, count(*) AS n_supp
                  FROM supplier GROUP BY s_nationkey) s
              ON nk_c = nk_s
            ORDER BY nationkey""")
  )

  /** q49 — correlated scalar subquery (per-customer max order value):
    * Catalyst decorrelates this into an aggregate + outer join (SURVEY §4
    * "subquery decorrelation — free"); expressed through the SQL-text
    * interface to exercise exactly that path. */
  private val q49 = GQuery(
    "q49_scalar_subquery",
    (s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders")
      Tables.customer(s, d).createOrReplaceTempView("customer")
      s.sql("""SELECT c_custkey,
                      (SELECT max(o_totalprice) FROM orders
                       WHERE o_custkey = c_custkey) AS max_order
               FROM customer ORDER BY c_custkey""")
    },
    Some("""SELECT c_custkey,
                   (SELECT max(o_totalprice) FROM orders
                    WHERE o_custkey = c_custkey) AS max_order
            FROM customer ORDER BY c_custkey""")
  )

  /** q64 — skew-salted fact⋈dim join, driver-checked: the Skew.saltedJoin
    * rewrite (fact rows get a round-robin salt, the dimension replicates
    * ×salts, join key becomes (key, salt)) must be value-identical to the
    * plain join — the oracle IS the plain join. At 100 TB this is the
    * manual override when one join key holds a disproportionate share of
    * the fact table and AQE's skew split isn't available (e.g. a
    * broadcast-ineligible dim under a shuffle join). */
  private val q64 = GQuery(
    "q64_salted_join",
    (s, d) => {
      // r17 (guide §2.6): the single-file fixture scans planned 3 splits
      // for the fact and ONE for the dim — the ×8 dim explode (1.2M rows,
      // 54 MB of shuffle write at sf0.1) ran on a single task. fanOut is
      // identity on production many-file scans.
      val fact = graft.sources.Io.fanOut(
        Tables.lineitem(s, d).select(col("l_orderkey"), col("l_quantity")))
      val dim = graft.sources.Io.fanOut(Tables.orders(s, d)
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority")))
      graft.operators.Skew.saltedJoin(fact, dim, "l_orderkey", 8)
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""SELECT o_orderpriority, sum(l_quantity) AS sum_qty, count(*) AS n
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority ORDER BY o_orderpriority""")
  )

  /** q90 — bloom-pruned semi-join (wave 4): a runtime bloom filter built
    * over a selective key subquery prunes the fact table BEFORE its
    * shuffle; an exact semi-join afterwards removes the bloom's false
    * positives, so the result is value-identical to the plain semi-join
    * (which is the oracle — the q64 salted-join proof pattern).
    *
    * Scale notes (100 TB): this is the join shape where the key set is
    * too big to broadcast as a hash relation but its bloom filter is
    * kilobytes; the fact side tests membership inside whole-stage codegen
    * (native BloomContains expression — a UDF here would break the
    * codegen span at the scan) and only surviving rows reach the shuffle.
    * Spark's AQE injects such filters only under narrow conditions
    * (spark.sql.optimizer.runtime.bloomFilter.*); having it as a
    * composable operator covers the rest. The filter aggregate's partial
    * state is a constant numBits/8 bytes per task (bitwise-OR combine —
    * the reference's partial→final merge pattern).
    *
    * Two-phase on purpose: the bitset is materialized FIRST (a 1-row
    * aggregate — the driver holds only the constant-size filter, never
    * rows) and probed as a literal. Expressing the probe as a
    * crossJoin(broadcast(bloom)) instead lets Catalyst's
    * PushDownLeftSemiAntiJoin reorder the exact semi-join BELOW the
    * probe, running the full-fact join first and reducing the bloom to
    * pure overhead — the literal probe is a deterministic scan-level
    * filter the optimizer can only push further DOWN (PlanShapeSpec locks
    * it below the join). This mirrors Spark's own runtime-filter
    * execution, where the build subquery completes before the probe scan. */
  private val q90 = GQuery(
    "q90_bloom_semi_join",
    (s, d) => {
      graft.functions.Bloom.register(s)
      val keys = Tables.orders(s, d)
        .filter(col("o_totalprice") > 400000.0)
        .select(col("o_orderkey"))
      val bits = keys.agg(
          graft.functions.Bloom.buildAgg(1 << 14)(col("o_orderkey")).as("bits"))
        .head.getSeq[Long](0).toArray
      val fact = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"))
      fact
        .filter(graft.functions.Bloom.mightContain(typedLit(bits), col("l_orderkey")))
        .join(keys, fact("l_orderkey") === keys("o_orderkey"), "left_semi")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS sum_qty
            FROM lineitem
            WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                                 WHERE o_totalprice > 400000.0)
            GROUP BY l_returnflag ORDER BY l_returnflag""")
  )

  /** q96 — join-key skew profile (wave 5): the heavy-hitter diagnostic
    * that DRIVES q64's salting decision — the top-20 heaviest join keys
    * of the fact table with exact counts and corpus share in basis
    * points. At 100 TB this report is what tells an operator whether a
    * key needs salting (share_bp ≫ 10000/|keys|) before the join even
    * runs; production pipelines run it on a sample or maintain it as a
    * table statistic.
    *
    * Scale notes: one partial-combine aggregate keyed on the join key
    * (the counts relation is |keys|-sized, never row-sized), the head is
    * TakeOrderedAndProject per-partition 20-row heaps, and the
    * denominator is a 1-row broadcast (BroadcastNestedLoopJoin with a
    * single-row side — constant work, not a cartesian). Share is exact
    * integer arithmetic (`div`), so the hash compare is stable. */
  private val q96 = GQuery(
    "q96_key_skew",
    (s, d) => {
      val counts = Tables.lineitem(s, d)
        .groupBy(col("l_partkey")).agg(count(lit(1)).as("cnt"))
      val total = counts.agg(sum(col("cnt")).as("total"))
      counts.crossJoin(broadcast(total))
        .select(col("l_partkey"), col("cnt"),
          expr("(cnt * 10000) div total").as("share_bp"))
        .orderBy(col("cnt").desc, col("l_partkey"))
        .limit(20)
    },
    Some("""WITH c AS (SELECT l_partkey, count(*) AS cnt
                       FROM lineitem GROUP BY l_partkey),
                 t AS (SELECT sum(cnt) AS total FROM c)
            SELECT l_partkey, cnt,
                   CAST((cnt * 10000) // total AS BIGINT) AS share_bp
            FROM c, t ORDER BY cnt DESC, l_partkey LIMIT 20""")
  )

  /** q122 — approximate STRING self-join (round 7): pairs of distinct
    * part names within Levenshtein distance 2, with each name's row
    * count — record-linkage/entity-resolution over dirty catalogs, the
    * string-similarity join the shingle family (set semantics) cannot
    * express because edit distance sees character ORDER.
    *
    * Mechanics: symmetric-delete blocking (the FastSS/SymSpell scheme —
    * EXACT for Levenshtein: if lev(a,b) <= d, deleting <= d chars from
    * each reaches a common string, since each substitution deletes one
    * char from both sides and each insert/delete deletes from one).
    * Every distinct name emits its <= 2-deletion neighborhood
    * (~1 + L + L² keys, L = name length); candidate pairs form INSIDE
    * variant buckets (orderedPairs — never a name×name self-join); exact
    * `levenshtein` then verifies <= 2. The oracle brute-forces the
    * distinct-name relation — tractable because |distinct names| ≪ rows.
    *
    * Scale notes: works over the DISTINCT-name relation (the groupBy
    * collapses row volume first; name volume, not row volume, drives
    * cost). The variant explode is ~L² 8-char keys per name; bucket
    * sizes are the count of names within edit distance <= 4 of the key —
    * real near-duplicate clusters, not corpus-sized (mass-identical
    * names collapse in the distinct step / q24's exact-dedup class). The
    * 256 bucket cap is a hot-spot alarm far above the fixture's maximum
    * occupancy, not a scaling mechanism. */
  private val q122 = GQuery(
    "q122_fuzzy_join",
    (s, d) => {
      val names = Tables.part(s, d)
        .groupBy(col("p_name").as("nm")).agg(count(lit(1)).as("n_parts"))
      val vars = names
        .withColumn("v1", expr(
          "transform(sequence(1, length(nm)), i -> concat(substring(nm, 1, i-1), substring(nm, i+1)))"))
        .withColumn("vk", array_distinct(concat(
          array(col("nm")), col("v1"),
          flatten(expr("transform(v1, v -> transform(sequence(1, length(v)), " +
            "i -> concat(substring(v, 1, i-1), substring(v, i+1))))")))))
        .select(col("nm"), explode(col("vk")).as("key"))
      // bucket sizes are near-duplicate-cluster-sized by construction
      // (names within edit distance 4 of the key); 256 is an ALARM, not
      // a silent drop — the oracle has no cap, so capping here would
      // quietly diverge from it on pathological name sets. One tiny agg
      // probes for overflow and fails loudly instead.
      // MATERIALIZED: the alarm is an eager action and the pair path a
      // second consumer — without this, the variant explode + groupBy
      // (the query's dominant cost) ran TWICE per execution (VERDICT r10
      // "What's wrong" #1; 2.7 s → one build). Do not re-split the two
      // consumers onto a lazy plan.
      val buckets = graft.sources.Io.materialize(vars
        .groupBy(col("key"))
        .agg(sort_array(collect_set(col("nm"))).as("nms"))
        .filter(size(col("nms")) >= 2))
      val overflow = buckets.filter(size(col("nms")) > 256).limit(1).count()
      require(overflow == 0,
        "q122: deletion-variant bucket overflow (>256 near-identical names); " +
          "exact-dedup the name set first or raise the alarm threshold")
      val pairs = buckets
        .select(explode(graft.functions.TextOps.orderedPairs(col("nms"))).as("p"))
        .select(col("p.d1").as("name1"), col("p.d2").as("name2"))
        .distinct()
        .withColumn("dist", levenshtein(col("name1"), col("name2")))
        .filter(col("dist") <= 2)
      pairs
        .join(names.select(col("nm").as("name1"), col("n_parts").as("n_parts1")), "name1")
        .join(names.select(col("nm").as("name2"), col("n_parts").as("n_parts2")), "name2")
        .select(col("name1"), col("name2"), col("dist"),
          col("n_parts1"), col("n_parts2"))
        .orderBy(col("name1"), col("name2"))
    },
    Some("""WITH names AS (SELECT p_name, count(*) AS n_parts
                           FROM part GROUP BY 1)
            SELECT a.p_name AS name1, b.p_name AS name2,
                   CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist,
                   a.n_parts AS n_parts1, b.n_parts AS n_parts2
            FROM names a JOIN names b
              ON a.p_name < b.p_name
             AND levenshtein(a.p_name, b.p_name) <= 2
            ORDER BY name1, name2""")
  )

  val all: Seq[GQuery] = Seq(q10, q11, q12, q13, q14, q15, q48, q49, q64,
    q90, q96, q122)
}
