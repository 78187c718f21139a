package graft.operators

import graft.GQuery
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 wave 12: operational analytics over the event stream — exact
  * CUSUM change-point detection on ingest volume (q142), the
  * two-proportion experiment readout (q143), and session path-n-gram
  * mining (q144). With waves 9-11 these complete the monitoring/
  * measurement family: distribution drift (PSI/KS), composition
  * independence (chi²), volume change-points, experiment significance,
  * and behavioral sequences.
  */
object Wave12Queries {

  /** q142 — exact CUSUM change-point detection on the daily ingest
    * volume series: the day where the cumulative deviation from the
    * global mean peaks — the "did the crawl/ingest break or shift on
    * day X" monitor every pipeline runs on its volume telemetry.
    *
    * Exactness: CUSUM S_t = Σ_{i≤t}(x_i − x̄) is rational with
    * denominator D = number of days; the engine computes S'_t = D·S_t =
    * D·Σx_i − t·N — INTEGERS, exact in any order — and only converts to
    * the conventional scale (divide by D, round) for display. Argmax
    * tie-breaks to the earliest day via a lexicographic struct max over
    * (|S'|, −epoch-day). The statistic normalizes to |S|/(σ̂·√D) with
    * σ̂² from the same exact moments, one double formula at the end.
    *
    * Scale notes: one day-keyed count aggregate (map-side combine —
    * the relation is |days|-sized from there on), a 1-row moment
    * broadcast, a window-over-aggregate running sum, two 1-row
    * reductions. Nothing data-sized after the first aggregate. */
  private val q142 = GQuery(
    "q142_changepoint",
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("x"))
      val tot = daily.agg(count(lit(1)).as("dd"), sum(col("x")).as("nn"),
        sum(col("x") * col("x")).as("xx"))
      val cusum = daily
        .withColumn("t", row_number().over(Window.orderBy(col("day"))))
        .withColumn("cx", sum(col("x")).over(Window.orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .crossJoin(broadcast(tot))
        .withColumn("sp", col("dd") * col("cx") - col("t") * col("nn"))
      val top = cusum
        .agg(max(struct(abs(col("sp")).as("a"),
          (-unix_date(col("day"))).as("negd"), col("day").as("day"),
          col("sp").as("sp"), col("t").as("t"))).as("m"),
          max(col("dd")).as("dd"), max(col("nn")).as("nn"),
          max(col("xx")).as("xx"))
      top.select(
          col("m.day").as("change_day"), col("m.t").as("day_index"),
          round(col("m.sp").cast("double") / col("dd"), 4).as("cusum"),
          col("nn").as("n_events"),
          // integer-exact zero-variance guard (the q110 pattern): a
          // flat series has no change point, not a divide-by-zero
          when(col("xx") * col("dd") > col("nn") * col("nn"),
            round(abs(col("m.sp").cast("double") / col("dd"))
              / (sqrt(col("xx").cast("double") / col("dd")
                - (col("nn").cast("double") / col("dd"))
                  * (col("nn").cast("double") / col("dd")))
                * sqrt(col("dd").cast("double"))), 4)).as("stat"))
    },
    Some("""WITH daily AS (SELECT CAST(ts AS DATE) AS day, count(*) AS x
                           FROM events GROUP BY 1),
            tot AS (SELECT count(*) AS dd, CAST(sum(x) AS BIGINT) AS nn,
                           CAST(sum(x * x) AS BIGINT) AS xx
                    FROM daily),
            c AS (SELECT day, x,
                         row_number() OVER (ORDER BY day) AS t,
                         CAST(sum(x) OVER (ORDER BY day
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                              AS BIGINT) AS cx
                  FROM daily),
            sp AS (SELECT day, t, dd * cx - t * nn AS sp, dd, nn, xx
                   FROM c, tot),
            m AS (SELECT max(struct_pack(a := abs(sp),
                                         negd := -CAST(day - DATE '1970-01-01' AS BIGINT),
                                         day := day, sp := sp, t := t)) AS m,
                         max(dd) AS dd, max(nn) AS nn, max(xx) AS xx
                  FROM sp)
            SELECT m.day AS change_day, CAST(m.t AS INTEGER) AS day_index,
                   round(CAST(m.sp AS DOUBLE) / dd, 4) AS cusum,
                   nn AS n_events,
                   CASE WHEN xx * dd > nn * nn THEN
                     round(abs(CAST(m.sp AS DOUBLE) / dd)
                           / (sqrt(CAST(xx AS DOUBLE) / dd
                                   - (CAST(nn AS DOUBLE) / dd)
                                   * (CAST(nn AS DOUBLE) / dd))
                              * sqrt(CAST(dd AS DOUBLE))), 4) END AS stat
            FROM m""")
  )

  /** q143 — two-proportion experiment readout: conversion rate (did the
    * user make a high-value purchase, > 470?) of the even-user cohort
    * vs the odd-user cohort,
    * with the pooled two-proportion z statistic and the α=0.05 call —
    * the A/B readout every experimentation pipeline ships. Assignment
    * is the deterministic hash-parity split (q58's principle on the
    * user key).
    *
    * Determinism: converted/user counts are exact integers; p̂s and z
    * derive through one literal double formula on identical integers
    * (the q110 moment discipline); the two cohort rows come from one
    * grouped aggregate, the z from a 1-row reduction over it.
    *
    * Scale notes: one user-keyed aggregate (map-side combine), one
    * 2-group aggregate, one 1-row crossjoin. */
  private val q143 = GQuery(
    "q143_ab_test",
    (s, d) => {
      val perUser = Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase" && col("value") > 470.0,
          1L).otherwise(0L)).as("converted"))
        .withColumn("cohort", pmod(col("user_id"), lit(2)).cast("int"))
      val arms = perUser.groupBy(col("cohort"))
        .agg(count(lit(1)).as("n_users"), sum(col("converted")).as("n_conv"))
      val z = arms.agg(
        min(when(col("cohort") === 0, col("n_users"))).as("n0"),
        min(when(col("cohort") === 0, col("n_conv"))).as("c0"),
        min(when(col("cohort") === 1, col("n_users"))).as("n1"),
        min(when(col("cohort") === 1, col("n_conv"))).as("c1"))
        .withColumn("p0", col("c0").cast("double") / col("n0"))
        .withColumn("p1", col("c1").cast("double") / col("n1"))
        .withColumn("pp",
          (col("c0") + col("c1")).cast("double") / (col("n0") + col("n1")))
        // degenerate-arm guard (all or none converted): z undefined,
        // not a divide-by-zero — mirrors the oracle's CASE
        .withColumn("z", when(col("pp") > 0.0 && col("pp") < 1.0,
          (col("p0") - col("p1"))
            / sqrt(col("pp") * (lit(1.0) - col("pp"))
              * (lit(1.0) / col("n0") + lit(1.0) / col("n1")))))
      z.select(col("n0"), col("c0"), col("n1"), col("c1"),
        round(col("p0"), 6).as("p0"), round(col("p1"), 6).as("p1"),
        round(col("z"), 4).as("z"), (abs(col("z")) > 1.96).as("significant"))
    },
    Some("""WITH u AS (SELECT user_id,
                              max(CASE WHEN event_type = 'purchase' AND value > 470
                                       THEN 1 ELSE 0 END) AS converted
                       FROM events GROUP BY user_id),
            a AS (SELECT CAST(user_id % 2 AS INTEGER) AS cohort,
                         count(*) AS n_users,
                         CAST(sum(converted) AS BIGINT) AS n_conv
                  FROM u GROUP BY 1),
            w AS (SELECT min(CASE WHEN cohort = 0 THEN n_users END) AS n0,
                         min(CASE WHEN cohort = 0 THEN n_conv END) AS c0,
                         min(CASE WHEN cohort = 1 THEN n_users END) AS n1,
                         min(CASE WHEN cohort = 1 THEN n_conv END) AS c1
                  FROM a),
            f AS (SELECT n0, c0, n1, c1,
                         CAST(c0 AS DOUBLE) / n0 AS p0,
                         CAST(c1 AS DOUBLE) / n1 AS p1,
                         CAST(c0 + c1 AS DOUBLE) / (n0 + n1) AS pp
                  FROM w)
            SELECT n0, c0, n1, c1,
                   round(p0, 6) AS p0, round(p1, 6) AS p1,
                   round(CASE WHEN pp > 0.0 AND pp < 1.0 THEN
                         (p0 - p1) / sqrt(pp * (1.0 - pp)
                         * (1.0 / n0 + 1.0 / n1)) END, 4) AS z,
                   abs(CASE WHEN pp > 0.0 AND pp < 1.0 THEN
                       (p0 - p1) / sqrt(pp * (1.0 - pp)
                       * (1.0 / n0 + 1.0 / n1)) END) > 1.96 AS significant
            FROM f""")
  )

  /** q144 — session path mining: the top-20 within-session event-type
    * trigrams (30-minute-gap sessions, q29's sessionization predicate)
    * — the behavioral sequence statistics a funnel designer reads
    * before hard-coding steps into q93/q115, and the n-gram workload
    * (q57) lifted from token space to event-sequence space.
    *
    * Scale notes: session ids are the q29 gap-islands decomposition
    * (user-partitioned windows — per-partition state is one user's
    * rows); trigram formation is two lags over the same user window
    * (one shuffle reused by all three window functions); the count
    * aggregate partial-combines into the |distinct trigram| key space
    * and the head is a TakeOrderedAndProject 20-row heap. */
  private val q144 = GQuery(
    "q144_path_ngrams",
    (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("gap", unix_micros(col("ts"))
          - unix_micros(lag(col("ts"), 1).over(w)))
        .withColumn("newsess",
          when(col("gap").isNull || col("gap") > 30L * 60 * 1000000, 1L)
            .otherwise(0L))
        .withColumn("sess",
          sum(col("newsess")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("t1", lag(col("event_type"), 2).over(w))
        .withColumn("t2", lag(col("event_type"), 1).over(w))
        .withColumn("s1", lag(col("sess"), 2).over(w))
        .filter(col("t1").isNotNull && col("s1") === col("sess"))
        .select(concat_ws(">", col("t1"), col("t2"), col("event_type"))
          .as("path"))
        .groupBy(col("path")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("path"))
        .limit(20)
    },
    Some("""WITH o AS (SELECT user_id, ts, event_id, event_type,
                         CASE WHEN lag(ts) OVER w IS NULL
                                OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                                   > 30 * 60 * 1000000
                              THEN 1 ELSE 0 END AS newsess
                       FROM events
                       WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            r AS (SELECT *, CAST(sum(newsess) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess
                  FROM o),
            g AS (SELECT lag(event_type, 2) OVER w AS t1,
                         lag(event_type, 1) OVER w AS t2,
                         event_type AS t3,
                         lag(sess, 2) OVER w AS s1, sess
                  FROM r
                  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
            SELECT t1 || '>' || t2 || '>' || t3 AS path, count(*) AS cnt
            FROM g WHERE t1 IS NOT NULL AND s1 = sess
            GROUP BY 1 ORDER BY cnt DESC, path LIMIT 20""")
  )

  /** The q145/s21 canonical lineitem row encoding (one definition, shared
    * with StreamingSpec/Wave12Spec so batch, stream, and spec hash
    * byte-identical text — see graft.functions.Canon for the field/NULL
    * rules). */
  val lineitemCanon: org.apache.spark.sql.Column = graft.functions.Canon.row(
    col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
    col("l_linenumber"),
    round(col("l_quantity") * 100, 0).cast("long"),
    round(col("l_extendedprice") * 100, 0).cast("long"),
    round(col("l_discount") * 100, 0).cast("long"),
    round(col("l_tax") * 100, 0).cast("long"),
    col("l_returnflag"), col("l_linestatus"),
    unix_micros(col("l_shipdate")))

  /** DuckDB mirror of [[lineitemCanon]]. */
  val lineitemCanonSql: String = graft.functions.Canon.rowSql(
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
    "CAST(round(l_quantity * 100, 0) AS BIGINT)",
    "CAST(round(l_extendedprice * 100, 0) AS BIGINT)",
    "CAST(round(l_discount * 100, 0) AS BIGINT)",
    "CAST(round(l_tax * 100, 0) AS BIGINT)",
    "l_returnflag", "l_linestatus", "epoch_us(l_shipdate)")

  /** q145 — order-free table content checksum: row count plus TWO
    * independent mergeable fingerprints (bit-XOR and exact-decimal sum
    * of per-row md5-60 hashes over a canonical row encoding) of the
    * lineitem table — the cross-system migration/replication validation
    * primitive (validate a 100 TB copy without moving or sorting it;
    * this engine's own DuckDB gate is an instance of the pattern). XOR
    * and sum are both commutative/associative, so partials combine
    * map-side, per-partition states are 16 bytes, and shard checksums
    * roll up by the same operation — the mergeable-integrity property
    * that makes per-file checksums composable into a table checksum.
    *
    * Canonical encoding pins every cross-engine formatting hazard:
    * integers and enum strings as-is, money on the cent grid (exact
    * long), the timestamp as epoch-micros — never a float or timestamp
    * rendered to text, where engines disagree on trailing digits — and
    * every field NULL-sentinel-encoded (graft.functions.Canon, ADVICE
    * r7: concat_ws drops nulls while SQL || nullifies the row, so a
    * nullable column would silently desynchronize the two engines'
    * checksums AND make the encoding collision-ambiguous).
    *
    * OUTPUT CONTRACT (r7 verdict task 1): the fingerprints are emitted
    * as FIXED-WIDTH STRINGS — xor_fp as 16 lowercase hex digits, sum_fp
    * as 39 zero-padded decimal digits — because a checksum that exists
    * to be compared across systems must not depend on any system's
    * integer/decimal rendering. (The r7 driver hash-red on the raw
    * BIGINT/DECIMAL(38,0) pair even though the VALUES matched; strings
    * hash identically everywhere by construction.)
    *
    * Scale notes: ONE map pass + one grouping-free aggregate; no
    * shuffle wider than one 3-field state per partition. */
  private val q145 = GQuery(
    "q145_table_checksum",
    (s, d) => {
      // fanOut BEFORE the canon+md5 projection (r16, guide §2.6): the
      // single sf parquet file plans ~3 input splits, starving the only
      // expensive stage; the 11-column projection is what shuffles (no
      // text), and production many-file scans make fanOut the identity
      graft.sources.Io.fanOut(Tables.lineitem(s, d).select(
          col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax"), col("l_returnflag"),
          col("l_linestatus"), col("l_shipdate")))
        .select(graft.functions.TextOps.shingleHash60(lineitemCanon).as("h"))
        .agg(count(lit(1)).as("n_rows"),
          expr("bit_xor(h)").as("_xor"),
          sum(col("h").cast(org.apache.spark.sql.types.DecimalType(38, 0)))
            .as("_sum"))
        .select(col("n_rows"),
          lower(lpad(hex(col("_xor")), 16, "0")).as("xor_fp"),
          lpad(col("_sum").cast("string"), 39, "0").as("sum_fp"))
    },
    Some(s"""WITH h AS (SELECT CAST(concat('0x', substr(md5(
                          $lineitemCanonSql), 1, 15)) AS BIGINT) AS h
                        FROM lineitem)
             SELECT count(*) AS n_rows,
                    lower(lpad(hex(bit_xor(h)), 16, '0')) AS xor_fp,
                    lpad(CAST(CAST(sum(h) AS DECIMAL(38, 0)) AS VARCHAR), 39, '0')
                      AS sum_fp
             FROM h""")
  )

  /** q148 — snapshot DIFF: classify every key across two versions of the
    * orders table as added / deleted / changed / unchanged by comparing
    * canonical row hashes — the data-regression check run between any
    * two pipeline outputs (yesterday's table vs today's, pre- vs
    * post-migration), and the row-level drill-down q145's one-line
    * checksum triggers when it mismatches. Versions are synthesized
    * deterministically from the fixture: snapshot A drops keys ≡ 0
    * (mod 13) (later "added"), perturbs the price by one cent on keys
    * ≡ 0 (mod 11) ("changed"); snapshot B drops keys ≡ 0 (mod 17)
    * ("deleted"). Classification is by OUTCOME of the hash compare, so
    * overlapping constructions resolve unambiguously.
    *
    * Scale notes: ONE key-partitioned full-outer join (the q73 MERGE
    * shape — both sides shuffle once on the key) carrying an 8-byte
    * hash per row, then a 4-group aggregate with map-side combine.
    * Diffing by hash means the join payload is constant-width no matter
    * how wide the table is. */
  /** DuckDB mirror of q148's sentinel-encoded orders canon, parameterized
    * on the price expression (snapshot A perturbs it). */
  private def ordersCanonSql(priceExpr: String): String =
    graft.functions.Canon.rowSql(
      "o_orderkey", "o_custkey", "o_orderstatus",
      s"CAST(round($priceExpr * 100, 0) AS BIGINT)",
      "epoch_us(o_orderdate)", "o_orderpriority")

  private val q148 = GQuery(
    "q148_snapshot_diff",
    (s, d) => {
      // sentinel-encoded like q145 (Canon): a nullable column must change
      // the hash, not silently vanish from it
      def canon(price: org.apache.spark.sql.Column) = graft.functions.Canon.row(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        round(price * 100, 0).cast("long"),
        unix_micros(col("o_orderdate")), col("o_orderpriority"))
      val base = Tables.orders(s, d)
      val snapA = base
        .filter(pmod(col("o_orderkey"), lit(13)) =!= 0)
        .select(col("o_orderkey").as("k"),
          graft.functions.TextOps.shingleHash60(canon(
            when(pmod(col("o_orderkey"), lit(11)) === 0,
              col("o_totalprice") + 0.01).otherwise(col("o_totalprice"))))
            .as("ha"))
      val snapB = base
        .filter(pmod(col("o_orderkey"), lit(17)) =!= 0)
        .select(col("o_orderkey").as("k"),
          graft.functions.TextOps.shingleHash60(canon(col("o_totalprice")))
            .as("hb"))
      snapA.join(snapB, Seq("k"), "full_outer")
        .withColumn("change_type",
          when(col("ha").isNull, "added")
            .when(col("hb").isNull, "deleted")
            .when(col("ha") =!= col("hb"), "changed")
            .otherwise("unchanged"))
        .groupBy(col("change_type"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("k")).as("min_key"), max(col("k")).as("max_key"))
        .orderBy(col("change_type"))
    },
    Some(s"""WITH a AS (SELECT o_orderkey AS k,
                    CAST(concat('0x', substr(md5(
                      ${ordersCanonSql("""(CASE WHEN o_orderkey % 11 = 0
                                          THEN o_totalprice + 0.01
                                          ELSE o_totalprice END)""")}),
                      1, 15)) AS BIGINT) AS ha
                 FROM orders WHERE o_orderkey % 13 <> 0),
           b AS (SELECT o_orderkey AS k,
                    CAST(concat('0x', substr(md5(
                      ${ordersCanonSql("o_totalprice")}),
                      1, 15)) AS BIGINT) AS hb
                 FROM orders WHERE o_orderkey % 17 <> 0),
           j AS (SELECT coalesce(a.k, b.k) AS k, ha, hb
                 FROM a FULL OUTER JOIN b ON a.k = b.k)
           SELECT CASE WHEN ha IS NULL THEN 'added'
                       WHEN hb IS NULL THEN 'deleted'
                       WHEN ha <> hb THEN 'changed'
                       ELSE 'unchanged' END AS change_type,
                  count(*) AS n_rows,
                  min(k) AS min_key, max(k) AS max_key
           FROM j GROUP BY 1 ORDER BY change_type""")
  )

  val all: Seq[GQuery] = Seq(q142, q143, q144, q145, q148)
}
