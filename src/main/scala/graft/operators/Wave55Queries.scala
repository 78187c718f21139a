package graft.operators

import graft.GQuery
import graft.sources.{Io, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-14 wave 55: q233 — bitmap-index container audit (Roaring rule).
  *
  * The layout family prices zone-map skipping (q214), z-order (q125),
  * compaction (q128) and deletion vectors (q225) — but not the OTHER
  * per-file secondary structure columnar stores carry: the bitmap
  * index, whose per-(file, value) container is chosen by the Roaring
  * rule (Chambi et al. 2016) from exact counts — ARRAY (2 bytes/row:
  * sparse), BITMAP (rows/16 words: dense), RLE (2 words/run:
  * clustered). Which container wins is a LAYOUT property: this sheet
  * prices the o_orderdate MONTH column under the arrival-order layout
  * (file = orderkey div 256 — months scatter, runs ≈ rows) vs the
  * date-CLUSTERED layout a size-capped writer produces: sort by
  * (day, orderkey), cut a file every 256 rows (file = (rank−1) div
  * 256 — a real writer caps file SIZE, so file count scales with
  * data; a days-per-file grid would grow files unboundedly at 100 TB
  * and was rejected by the window tripwire). In a clustered file,
  * consecutive rows share months, so runs collapse toward
  * |months-in-file|. Reported per layout: containers, rows, runs,
  * total words under each uniform container choice, the
  * best-per-(file,value) total (the index a Roaring writer actually
  * builds), and per-container win counts (ties break RLE > ARRAY >
  * BITMAP, the compressed-first convention, identically in both
  * engines). The fixture shows the clustered layout's RLE total
  * collapsing far below arrival-order — the number that justifies
  * sorting before indexing.
  *
  * Scale notes (100 TB): the clustered layout's file assignment is
  * one Ranks.rowNumber pass (range-sliced — the true price of
  * sorting before writing, stated honestly); per layout, one shuffle
  * by file id (window partitions are ≤256 rows BY CONSTRUCTION on
  * both layouts, and file count scales ∝ n/256), a lag-based
  * run-start flag, then a (file, value)-grained aggregate (map-side
  * combine) joined to the |files|-row size relation (aggregate-sized,
  * AQE-broadcast) and a 1-row rollup. The two layouts union; nothing
  * data-sized crosses a single task. */
object Wave55Queries {

  private val Epoch = "1995-01-01"
  private val KeysPerFile = 256

  /** Per-layout container sheet: fid = file id, pos = in-file order. */
  private def sheet(name: String, df: DataFrame, fid: Column,
      pos: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(col("fid")).orderBy(pos: _*)
    val runs = df.withColumn("fid", fid)
      .withColumn("m", month(col("o_orderdate")))
      .withColumn("start",
        (lag(col("m"), 1).over(w).isNull ||
          lag(col("m"), 1).over(w) =!= col("m")).cast("long"))
    val perFV = runs.groupBy(col("fid"), col("m"))
      .agg(count(lit(1)).as("n"), sum(col("start")).as("r"))
    val perFile = runs.groupBy(col("fid"))
      .agg(count(lit(1)).as("frows"))
    val words = perFV.join(perFile, "fid")
      .select(col("n"), col("r"),
        col("n").as("aw"), (col("r") * 2).as("rw"),
        expr("(frows + 15) div 16").as("bw"))
      .withColumn("bestw", least(col("aw"), col("rw"), col("bw")))
      .withColumn("winner",
        when(col("rw") === col("bestw"), "rle")
          .when(col("aw") === col("bestw"), "array")
          .otherwise("bitmap"))
    words.agg(count(lit(1)).as("containers"),
      sum(col("n")).as("n_rows"), sum(col("r")).as("runs"),
      sum(col("aw")).as("array_words"), sum(col("rw")).as("rle_words"),
      sum(col("bw")).as("bitmap_words"), sum(col("bestw")).as("best_words"),
      sum((col("winner") === "rle").cast("long")).as("rle_wins"),
      sum((col("winner") === "array").cast("long")).as("array_wins"),
      sum((col("winner") === "bitmap").cast("long")).as("bitmap_wins"))
      .select(lit(name).as("layout"), col("containers"), col("n_rows"),
        col("runs"), col("array_words"), col("rle_words"),
        col("bitmap_words"), col("best_words"), col("rle_wins"),
        col("array_wins"), col("bitmap_wins"))
  }

  private val q233 = GQuery(
    "q233_bitmap_layout",
    (s, d) => {
      val o = Tables.orders(s, d).select(col("o_orderkey"),
        col("o_orderdate"),
        expr(s"CAST(datediff(CAST(o_orderdate AS DATE), date'$Epoch')" +
          " AS BIGINT)").as("day"))
      val arrival = sheet("arrival", o,
        expr(s"o_orderkey div $KeysPerFile"), Seq(col("o_orderkey")))
      // the ranked relation feeds BOTH the lag window and the per-file
      // size aggregate — materialize, or the two evaluations of the
      // range-slice decomposition can disagree (measured at sf1: rows
      // dropped at the _slice join and parallelism-unstable runs)
      val ranked = Io.materialize(
        Ranks.rowNumber(o.withColumn("_g", lit(0)), "_g",
          Seq(col("day"), col("o_orderkey")), "rn"))
      val clustered = sheet("clustered", ranked,
        expr(s"(CAST(rn AS BIGINT) - 1) div $KeysPerFile"), Seq(col("rn")))
      arrival.unionAll(clustered).orderBy(col("layout"))
    },
    Some {
      def layout(name: String, fid: String, ord: String): String =
        s"""SELECT '$name' AS layout,
               CAST(count(*) AS BIGINT) AS containers,
               CAST(sum(n) AS BIGINT) AS n_rows,
               CAST(sum(r) AS BIGINT) AS runs,
               CAST(sum(aw) AS BIGINT) AS array_words,
               CAST(sum(rw) AS BIGINT) AS rle_words,
               CAST(sum(bw) AS BIGINT) AS bitmap_words,
               CAST(sum(bestw) AS BIGINT) AS best_words,
               CAST(sum(CASE WHEN winner = 'rle' THEN 1 ELSE 0 END)
                 AS BIGINT) AS rle_wins,
               CAST(sum(CASE WHEN winner = 'array' THEN 1 ELSE 0 END)
                 AS BIGINT) AS array_wins,
               CAST(sum(CASE WHEN winner = 'bitmap' THEN 1 ELSE 0 END)
                 AS BIGINT) AS bitmap_wins
            FROM (
              SELECT n, r, aw, rw, bw, bestw,
                     CASE WHEN rw = bestw THEN 'rle'
                          WHEN aw = bestw THEN 'array'
                          ELSE 'bitmap' END AS winner
              FROM (
                SELECT fv.n, fv.r, fv.n AS aw, fv.r * 2 AS rw,
                       (pf.frows + 15) // 16 AS bw,
                       least(fv.n, fv.r * 2, (pf.frows + 15) // 16) AS bestw
                FROM (SELECT fid, m, CAST(count(*) AS BIGINT) AS n,
                             CAST(sum(start) AS BIGINT) AS r
                      FROM (SELECT fid, m,
                              CASE WHEN lag(m) OVER (PARTITION BY fid
                                     ORDER BY $ord) IS DISTINCT FROM m
                                   THEN 1 ELSE 0 END AS start
                            FROM (SELECT $fid AS fid,
                                    month(o_orderdate) AS m,
                                    day, o_orderkey, rn FROM ob))
                      GROUP BY 1, 2) fv
                JOIN (SELECT $fid AS fid, CAST(count(*) AS BIGINT) AS frows
                      FROM ob GROUP BY 1) pf
                  ON fv.fid = pf.fid))"""
      s"""WITH ob AS MATERIALIZED (
               SELECT o_orderkey, o_orderdate,
                      CAST(CAST(o_orderdate AS DATE) - DATE '$Epoch'
                        AS BIGINT) AS day,
                      row_number() OVER (ORDER BY
                        CAST(o_orderdate AS DATE) - DATE '$Epoch',
                        o_orderkey) AS rn
               FROM orders)
          ${layout("arrival", s"o_orderkey // $KeysPerFile", "o_orderkey")}
          UNION ALL
          ${layout("clustered", s"(rn - 1) // $KeysPerFile", "rn")}
          ORDER BY layout"""
    }
  )

  val all: Seq[GQuery] = Seq(q233)
}
