package graft.operators

import graft.GQuery
import graft.functions.TextOps
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Round-14 wave 52: q230 — incremental view maintenance (IVM) audit.
  *
  * The refresh family has row-level MERGE (q73), SCD2 history (q119)
  * and snapshot diffing (q148) — but not the AGGREGATE-level algebra
  * a 100 TB nightly pipeline lives on: maintaining a standing
  * group-by view under a batch of inserts AND deletes by applying
  * SIGNED deltas (insert = +1, delete = −1) to the stored partial
  * aggregates — the classic counting algorithm (Gupta, Mumick &
  * Subrahmanian 1993), and exactly the algebra the streaming
  * aggregates (s01 family) run per micro-batch. The view here is the
  * TPC-H Q1 shape (sum(qty), count by returnflag × linestatus); the
  * incoming batch is a 1/10 hash split of lineitem, the delete set a
  * 1/15 hash sample of the base. A group whose maintained count
  * reaches zero is DROPPED (the delete-to-zero rule; the fixture's
  * dense groups never trigger it, but the filter is the semantics).
  *
  * The sheet emits, per group, the maintained aggregates NEXT TO a
  * full recompute of (base ∖ deletes) ∪ inserts plus equality
  * booleans — the driver's hash gate then certifies the delta algebra
  * itself, in both engines, against the ground-truth recompute.
  *
  * Exactness: l_quantity is integer-valued — cast to BIGINT, all sums
  * exact; the FULL join between maintained and recomputed means a
  * group appearing on only one side surfaces as a row-count mismatch
  * rather than being silently dropped.
  *
  * Scale notes (100 TB): maintenance cost is ∝ |delta batch| +
  * |affected groups| — the delta aggregate is one map-side-combined
  * pass over the batch, merged into the group-sized view by a
  * group-keyed outer join (both sides aggregate-sized). The RECOMPUTE
  * side is the audit's deliberate expensive baseline (one full base
  * scan), priced by the sheet exactly like q228's exact ranks. */
object Wave52Queries {

  private val InsMod = 10
  private val DelMod = 15

  private def h60tag(tag: String) = TextOps.shingleHash60(
    concat(col("l_orderkey").cast("string"), lit(":"),
      col("l_linenumber").cast("string"), lit(tag)))

  private val q230 = GQuery(
    "q230_ivm_delta",
    (s, d) => {
      // r17 (guide §2.3/§2.4): the r14 form consumed `li` from FOUR
      // subtrees (v0, both delta branches, recomputed) — Spark plans no
      // common-subexpression reuse across joins, so lineitem was scanned
      // four times and the two md5-based split hashes were recomputed in
      // every scan (~7 md5 evaluations per base row), then three
      // group-sized shuffles met in two full joins. Every consumer is an
      // aggregate over the SAME (flag, status) groups, so one
      // conditionally-aggregated pass (fanned out of the starved
      // single-file scan, the q224 precedent) computes all six partial
      // aggregates in a single scan + single shuffle. The full-join null
      // semantics are reproduced exactly below: v0/delta absence ↔ the
      // conditional sums go NULL (coalesced like the old join), the
      // maintained side exists iff m_cnt > 0, the recompute side iff it
      // has ≥1 contributing row, and a group on neither side — possible
      // when every row is a non-insert delete — is dropped, as the old
      // maintained-filter ∘ full-join did. Oracle-verified identical.
      val li = graft.sources.Io.fanOut(Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_returnflag"), col("l_linestatus"), col("l_quantity")))
        .select(
          col("l_returnflag").as("flag"), col("l_linestatus").as("status"),
          col("l_quantity").cast("long").as("qty"),
          (pmod(h60tag(":ivm"), lit(InsMod)) === 0).as("ins"),
          (pmod(h60tag(":ivmdel"), lit(DelMod)) === 0).as("del"))
      val g = li.groupBy(col("flag"), col("status")).agg(
        // v0: base view over the non-insert rows (NULL when none)
        sum(when(!col("ins"), col("qty"))).as("q"),
        count(when(!col("ins"), lit(1))).as("n"),
        // delta: +1 per insert, −1 per delete of a base row (NULL when
        // the group has neither — exactly "absent from delta")
        sum(when(col("ins"), col("qty"))
          .otherwise(when(col("del"), -col("qty")))).as("dq"),
        sum(when(col("ins"), lit(1L))
          .otherwise(when(col("del"), lit(-1L)))).as("dn"),
        // recompute: ground truth over (base ∖ deletes) ∪ inserts
        sum(when(col("ins") || !col("del"), col("qty"))).as("r_qty"),
        count(when(col("ins") || !col("del"), lit(1))).as("r_cnt_raw"))
      g.withColumn("m_qty0",
          coalesce(col("q"), lit(0L)) + coalesce(col("dq"), lit(0L)))
        .withColumn("m_cnt0",
          col("n") + coalesce(col("dn"), lit(0L)))
        .withColumn("has_m", col("m_cnt0") > 0)
        .withColumn("has_r", col("r_cnt_raw") > 0)
        .filter(col("has_m") || col("has_r"))
        .select(col("flag"), col("status"),
          when(col("has_m"), col("m_qty0")).as("m_qty"),
          when(col("has_m"), col("m_cnt0")).as("m_cnt"),
          when(col("has_r"), col("r_qty")).as("r_qty"),
          when(col("has_r"), col("r_cnt_raw")).as("r_cnt"))
        .select(col("flag"), col("status"), col("m_qty"), col("m_cnt"),
          col("r_qty"), col("r_cnt"),
          (col("m_qty") === col("r_qty")).as("qty_ok"),
          (col("m_cnt") === col("r_cnt")).as("cnt_ok"))
        .orderBy(col("flag"), col("status"))
    },
    Some(s"""WITH li AS (SELECT l_returnflag AS flag, l_linestatus AS status,
                    CAST(l_quantity AS BIGINT) AS qty,
                    CAST(concat('0x', substr(md5(CAST(l_orderkey AS VARCHAR)
                      || ':' || CAST(l_linenumber AS VARCHAR) || ':ivm'),
                      1, 15)) AS BIGINT) % $InsMod = 0 AS ins,
                    CAST(concat('0x', substr(md5(CAST(l_orderkey AS VARCHAR)
                      || ':' || CAST(l_linenumber AS VARCHAR) || ':ivmdel'),
                      1, 15)) AS BIGINT) % $DelMod = 0 AS del
                  FROM lineitem),
                  v0 AS (SELECT flag, status, CAST(sum(qty) AS BIGINT) AS q,
                                CAST(count(*) AS BIGINT) AS n
                         FROM li WHERE NOT ins GROUP BY 1, 2),
                  dl AS (SELECT flag, status,
                                CAST(sum(sgn * qty) AS BIGINT) AS dq,
                                CAST(sum(sgn) AS BIGINT) AS dn
                         FROM (SELECT flag, status, qty, 1 AS sgn
                               FROM li WHERE ins
                               UNION ALL
                               SELECT flag, status, qty, -1
                               FROM li WHERE NOT ins AND del)
                         GROUP BY 1, 2),
                  m AS (SELECT coalesce(v0.flag, dl.flag) AS flag,
                               coalesce(v0.status, dl.status) AS status,
                               coalesce(q, 0) + coalesce(dq, 0) AS m_qty,
                               coalesce(n, 0) + coalesce(dn, 0) AS m_cnt
                        FROM v0 FULL JOIN dl
                          ON v0.flag = dl.flag AND v0.status = dl.status
                        WHERE coalesce(n, 0) + coalesce(dn, 0) > 0),
                  rc AS (SELECT flag, status, CAST(sum(qty) AS BIGINT)
                                  AS r_qty,
                                CAST(count(*) AS BIGINT) AS r_cnt
                         FROM li WHERE (NOT ins AND NOT del) OR ins
                         GROUP BY 1, 2)
             SELECT coalesce(m.flag, rc.flag) AS flag,
                    coalesce(m.status, rc.status) AS status,
                    m_qty, m_cnt, r_qty, r_cnt,
                    m_qty = r_qty AS qty_ok, m_cnt = r_cnt AS cnt_ok
             FROM m FULL JOIN rc
               ON m.flag = rc.flag AND m.status = rc.status
             ORDER BY 1, 2""")
  )

  val all: Seq[GQuery] = Seq(q230)
}
