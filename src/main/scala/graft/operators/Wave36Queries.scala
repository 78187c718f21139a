package graft.operators

import graft.GQuery
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Round-13 wave 36: q214 — zone-map data-skipping audit. The layout
  * family builds layouts (q125 z-order buckets, q128 compaction plan,
  * q150 shard placement) but never PRICES the property layouts exist
  * for: how many files a predicate can skip from footer min/max stats
  * alone. At 100 TB that fraction IS the scan cost — a reader that
  * consults zone maps reads only the files whose [min,max] range
  * intersects the predicate, so clustering the table by the predicate
  * column is the difference between touching 1% and 100% of the data.
  *
  * The audit: rows land in files under two layouts — `natural`
  * (clustered by arrival order: file = l_orderkey DIV 256, the
  * ingest-order proxy) and `shipdate` (clustered by the predicate
  * column: file = shipdate-day DIV 91) — each file publishing min/max
  * shipdate stats (what a parquet footer carries). Against a fixed
  * grid of eight 91-day shipdate windows the sheet reports, per
  * (layout, predicate): files total/read, rows total/read/matched,
  * skip_ppm (fraction of rows zone-maps eliminate) and read_amp_ppm
  * (rows read per matching row — the false-positive price of a bad
  * layout). All date arithmetic happens in integer DAY space (days
  * since 1995-01-01, the fixture epoch — SURVEY.md's corpus date
  * floor) so the two engines can never disagree on calendars;
  * predicate bounds are Scala-generated literals embedded in both.
  *
  * Scale notes (100 TB): one union-read over the fact table into a
  * file-count-sized min/max/count aggregate (map-side combine — this
  * is exactly the stats pass a writer performs for free while writing
  * footers), one map-only 8-predicate match aggregate, then a
  * (files × 8)-row broadcast join — metadata-sized. Nothing
  * data-sized shuffles; the fact table never moves.
  */
object Wave36Queries {

  private val DayBlock = 91
  private val OrdPerFile = 256
  private val Epoch = "1995-01-01"
  private val NQ = 8

  /** Predicate grid: eight 91-day windows from 1996-01-01 (day 365
    * after the epoch — deliberately NOT aligned to the 91-day file
    * blocks, so the shipdate layout still reads boundary files; well
    * inside the corpus's 1995–2001 shipdate span so every window
    * matches rows at every scale). One Scala derivation, embedded as
    * literals in both engines. */
  private val Preds: Seq[(Int, Long, Long, String)] = (0 until NQ).map { i =>
    val lo = 365L + DayBlock.toLong * i
    (i, lo, lo + DayBlock,
      java.time.LocalDate.parse(Epoch).plusDays(lo).toString)
  }

  private val q214 = GQuery(
    "q214_skipping_audit",
    (s, d) => {
      import s.implicits._
      val preds = Preds.toDF("q_id", "lo_d", "hi_d", "q_lo")
      val li = Tables.lineitem(s, d).select(col("l_orderkey"),
        expr(s"CAST(datediff(CAST(l_shipdate AS DATE), date'$Epoch')" +
          " AS BIGINT)").as("ds"))
      val both = li
        .select(lit("natural").as("layout"),
          expr(s"l_orderkey div $OrdPerFile").as("file_id"), col("ds"))
        .unionByName(li.select(lit("shipdate").as("layout"),
          expr(s"ds div $DayBlock").as("file_id"), col("ds")))
      val fstats = both.groupBy(col("layout"), col("file_id"))
        .agg(min(col("ds")).as("f_min"), max(col("ds")).as("f_max"),
          count(lit(1)).as("n"))
      val ov = col("f_min") < col("hi_d") && col("f_max") >= col("lo_d")
      val pl = fstats.crossJoin(broadcast(preds))
        .groupBy(col("layout"), col("q_id"), col("q_lo"))
        .agg(count(lit(1)).as("files_total"),
          sum(when(ov, 1L).otherwise(0L)).as("files_read"),
          sum(col("n")).as("rows_total"),
          sum(when(ov, col("n")).otherwise(0L)).as("rows_read"))
      val matched = li.crossJoin(broadcast(preds))
        .filter(col("ds") >= col("lo_d") && col("ds") < col("hi_d"))
        .groupBy(col("q_id")).agg(count(lit(1)).as("rows_matched"))
      pl.join(matched, Seq("q_id"), "left")
        .select(col("layout"), col("q_id"), col("q_lo"),
          col("files_total"), col("files_read"),
          col("rows_total"), col("rows_read"),
          coalesce(col("rows_matched"), lit(0L)).as("rows_matched"),
          expr("(rows_total - rows_read) * 1000000 div rows_total")
            .as("skip_ppm"),
          expr("rows_read * 1000000 div greatest(coalesce(rows_matched, 0L), 1L)")
            .as("read_amp_ppm"))
        .orderBy(col("layout"), col("q_id"))
    },
    Some {
      val vals = Preds.map { case (q, lo, hi, ql) =>
        s"($q, ${lo}::BIGINT, ${hi}::BIGINT, '$ql')" }.mkString(", ")
      s"""WITH preds(q_id, lo_d, hi_d, q_lo) AS (VALUES $vals),
          li AS (SELECT l_orderkey,
                        CAST(CAST(l_shipdate AS DATE)
                             - DATE '$Epoch' AS BIGINT) AS ds
                 FROM lineitem),
          f AS (SELECT 'natural' AS layout,
                       l_orderkey // $OrdPerFile AS file_id, ds FROM li
                UNION ALL
                SELECT 'shipdate', ds // $DayBlock, ds FROM li),
          fs AS (SELECT layout, file_id, min(ds) AS f_min, max(ds) AS f_max,
                        count(*) AS n
                 FROM f GROUP BY 1, 2),
          pl AS (SELECT layout, q_id, q_lo,
                   count(*) AS files_total,
                   CAST(sum(CASE WHEN f_min < hi_d AND f_max >= lo_d
                            THEN 1 ELSE 0 END) AS BIGINT) AS files_read,
                   CAST(sum(n) AS BIGINT) AS rows_total,
                   CAST(sum(CASE WHEN f_min < hi_d AND f_max >= lo_d
                            THEN n ELSE 0 END) AS BIGINT) AS rows_read
                 FROM fs, preds GROUP BY 1, 2, 3),
          m AS (SELECT q_id, count(*) AS rows_matched FROM li, preds
                WHERE ds >= lo_d AND ds < hi_d GROUP BY q_id)
          SELECT pl.layout, pl.q_id, pl.q_lo, pl.files_total, pl.files_read,
                 pl.rows_total, pl.rows_read,
                 coalesce(m.rows_matched, 0) AS rows_matched,
                 (pl.rows_total - pl.rows_read) * 1000000 // pl.rows_total
                   AS skip_ppm,
                 pl.rows_read * 1000000
                   // GREATEST(coalesce(m.rows_matched, 0), 1) AS read_amp_ppm
          FROM pl LEFT JOIN m USING (q_id)
          ORDER BY layout, q_id"""
    }
  )

  val all: Seq[GQuery] = Seq(q214)
}
