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
      val li = Tables.lineitem(s, d).select(
        col("l_returnflag").as("flag"), col("l_linestatus").as("status"),
        col("l_quantity").cast("long").as("qty"),
        (pmod(h60tag(":ivm"), lit(InsMod)) === 0).as("ins"),
        (pmod(h60tag(":ivmdel"), lit(DelMod)) === 0).as("del"))
      val v0 = li.filter(!col("ins")).groupBy(col("flag"), col("status"))
        .agg(sum(col("qty")).as("q"), count(lit(1)).as("n"))
      val delta = li.filter(col("ins"))
        .select(col("flag"), col("status"), col("qty"), lit(1L).as("sgn"))
        .unionAll(li.filter(!col("ins") && col("del"))
          .select(col("flag"), col("status"), col("qty"), lit(-1L).as("sgn")))
        .groupBy(col("flag"), col("status"))
        .agg(sum(col("sgn") * col("qty")).as("dq"), sum(col("sgn")).as("dn"))
      val maintained = v0.join(delta, Seq("flag", "status"), "full")
        .select(col("flag"), col("status"),
          (coalesce(col("q"), lit(0L)) + coalesce(col("dq"), lit(0L)))
            .as("m_qty"),
          (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L)))
            .as("m_cnt"))
        .filter(col("m_cnt") > 0)
      val recomputed = li.filter((!col("ins") && !col("del")) || col("ins"))
        .groupBy(col("flag"), col("status"))
        .agg(sum(col("qty")).as("r_qty"), count(lit(1)).as("r_cnt"))
      maintained.join(recomputed, Seq("flag", "status"), "full")
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
