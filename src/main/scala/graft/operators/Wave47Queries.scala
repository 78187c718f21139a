package graft.operators

import graft.GQuery
import graft.functions.TextOps
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Round-14 wave 47: q225 — deletion-vector merge-on-read audit.
  *
  * The lakehouse family has upsert (q73), compaction planning by file
  * size (q128), snapshot diff (q148) and right-to-be-forgotten
  * cascades (q162) — but not the structure modern table formats
  * actually use for deletes at 100 TB: DELETION VECTORS (Delta/Iceberg
  * v2 position deletes), where a delete writes a per-file bitmap and
  * every reader pays merge-on-read (scan all rows, mask the deleted)
  * until a rewrite compacts the file. The planning question is WHICH
  * files to rewrite: rewrite too eagerly and you re-copy the table,
  * too lazily and every query pays unbounded read amplification.
  *
  * The audit: orders land in files of 256 keys (the q214 layout
  * convention); the standing deletion set is hash-sampled (md5-60 of
  * "key:del" ≡ 0 mod 20 — ~5% of rows, deterministic, scattered), so
  * per-file deletion fractions vary binomially and a threshold policy
  * has a real tail to select. For each rewrite threshold (3%, 6%, 9%
  * of a file's rows) the sheet reports: files flagged for rewrite,
  * rows rewritten (the compaction bill), deleted rows reclaimed by
  * those rewrites, and the POST-REWRITE read amplification in ppm
  * (rows a scan still reads / live rows) — the steady-state price of
  * leaving the remaining vectors unmerged.
  *
  * Scale notes (100 TB): ONE map pass over the fact table (file id
  * and delete flag are per-row arithmetic) into a file-grained
  * aggregate (map-side combine; |files| rows), then the 3-threshold
  * grid is arithmetic over the file relation unioned into 3 rows.
  * The deletion set never materializes as a relation — it is a
  * predicate, exactly like a bitmap probe. */
object Wave47Queries {

  private[graft] val KeysPerFile = 256
  // file_id = floorDiv(k, KeysPerFile) computed as an arithmetic shift
  private val FileShift = 8
  assert(KeysPerFile == (1 << FileShift))
  private[graft] val DelMod = 20
  private val ThresholdsPpm = Seq(30000L, 60000L, 90000L)

  private val q225 = GQuery(
    "q225_deletion_vectors",
    (s, d) => {
      val files = Tables.orders(s, d)
        .select(col("o_orderkey").as("k"))
        // floor semantics, matching s36 deletionVectorStream's
        // floorDiv(k, KeysPerFile): an arithmetic right shift IS
        // floorDiv for the power-of-two file size, so batch and stream
        // agree on (file, offset) for any key sign — `div` truncates
        // and would diverge on negative keys (fixture keys are
        // positive; the contract shouldn't depend on that)
        .select(shiftright(col("k"), FileShift).as("file_id"),
          (pmod(TextOps.shingleHash60(
            concat(col("k").cast("string"), lit(":del"))), lit(DelMod))
            === 0).cast("long").as("del"))
        .groupBy(col("file_id"))
        .agg(count(lit(1)).as("rows_total"), sum(col("del")).as("rows_del"))
      val perT = ThresholdsPpm.map { t =>
        files.select(col("rows_total"), col("rows_del"),
            (col("rows_del") * 1000000L >= col("rows_total") * t)
              .cast("long").as("rw"))
          .agg(count(lit(1)).as("files_total"),
            sum(col("rw")).as("files_rewritten"),
            sum(col("rows_total")).as("rows_total"),
            sum(col("rows_del")).as("rows_deleted"),
            sum(col("rw") * col("rows_total")).as("rewrite_rows"),
            sum(col("rw") * col("rows_del")).as("reclaimed"))
          .select(lit(t).as("threshold_ppm"), col("files_total"),
            col("files_rewritten"), col("rows_deleted"), col("rewrite_rows"),
            col("reclaimed"),
            // after rewriting flagged files, a scan reads (total − reclaimed)
            // rows to serve (total − deleted) live rows
            expr("((rows_total - reclaimed) * 1000000)" +
              " div (rows_total - rows_deleted)").as("read_amp_ppm"))
      }
      perT.reduce(_ unionAll _).orderBy(col("threshold_ppm"))
    },
    Some {
      def perT(t: Long): String =
        s"""SELECT ${t}::BIGINT AS threshold_ppm,
               CAST(count(*) AS BIGINT) AS files_total,
               CAST(sum(rw) AS BIGINT) AS files_rewritten,
               CAST(sum(rows_del) AS BIGINT) AS rows_deleted,
               CAST(sum(rw * rows_total) AS BIGINT) AS rewrite_rows,
               CAST(sum(rw * rows_del) AS BIGINT) AS reclaimed,
               CAST((sum(rows_total) - sum(rw * rows_del)) * 1000000
                 // (sum(rows_total) - sum(rows_del)) AS BIGINT)
                 AS read_amp_ppm
            FROM (SELECT rows_total, rows_del,
                    CASE WHEN rows_del * 1000000 >= rows_total * $t
                         THEN 1 ELSE 0 END AS rw
                  FROM f)"""
      s"""WITH f AS MATERIALIZED (
               SELECT o_orderkey // $KeysPerFile AS file_id,
                      CAST(count(*) AS BIGINT) AS rows_total,
                      CAST(sum(CASE WHEN CAST(concat('0x', substr(md5(
                        concat(CAST(o_orderkey AS VARCHAR), ':del')), 1, 15))
                        AS BIGINT) % $DelMod = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS rows_del
               FROM orders GROUP BY 1)
          ${ThresholdsPpm.map(perT).mkString(" UNION ALL ")}
          ORDER BY threshold_ppm"""
    }
  )

  val all: Seq[GQuery] = Seq(q225)
}
