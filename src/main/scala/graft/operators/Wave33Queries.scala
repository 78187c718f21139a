package graft.operators

import graft.GQuery
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-13 wave 33: q211 — IVF coarse-cell occupancy audit, the one
  * dial in the ANN family that had no pricing sheet (r12 verdict task
  * 3): the coarse seeding is the first Bc vectors by id (the q37
  * convention), and whether that seeding yields BALANCED cells is
  * exactly what probe latency and recall ride on — a hot cell makes
  * every probe that touches it a partial scan, an empty cell wastes
  * codebook bits and sharpens its neighbours' load. This sheet turns
  * the assumption into a measurement: cell count, empty-cell count,
  * max / p99 / mean occupancy, and the max-load factor (max over the
  * uniform expectation n/Bc — q150's load-factor convention), all over
  * the SAME standing index q202 searches and q203 audits
  * ([[Wave29Queries.servingIndex]] — the audit prices the artifact the
  * cluster serves, not a private rebuild).
  *
  * Determinism: occupancies are exact integer counts (empty cells
  * included via a left join from the centroid relation); p99 is the
  * occupancy at ascending rank ceil(99·Bc/100) computed by an integer
  * cumulative count over the occupancy HISTOGRAM (the q171
  * window-over-an-aggregate pattern — the window input is the
  * |distinct occupancies|-sized histogram, never the corpus); the two
  * doubles are single rounded division chains mirrored verbatim in
  * DuckDB.
  *
  * Scale notes (100 TB): one Bc-group aggregate over the coded index
  * (map-side combine, cid-partitioned input — [[Wave29Queries
  * .servingIndex]] lays the index out by cid, so the count is
  * exchange-free past the partial), one Bc-row left join against the
  * centroid relation, then histogram + 1-row reductions — nothing
  * data-sized crosses a single task, and the audit cost is
  * index-metadata-sized (Bc ≈ √n rows), not corpus-sized.
  */
object Wave33Queries {

  private val q211 = GQuery(
    "q211_ivf_occupancy",
    (s, d) => {
      Wave29Queries.servingIndex(s, d) match {
        case Some(idx) =>
          val counts = idx.coded.groupBy(col("cid"))
            .agg(count(lit(1)).as("nv"))
          val occ = idx.cents.select(col("cid"))
            .join(counts, Seq("cid"), "left")
            .select(coalesce(col("nv"), lit(0L)).as("occ"))
          val base = occ.agg(count(lit(1)).as("n_cells"),
            sum(col("occ")).as("n_vecs"),
            sum(when(col("occ") === 0, 1L).otherwise(0L)).as("empty_cells"),
            max(col("occ")).as("max_occ"))
          val hist = occ.groupBy(col("occ")).agg(count(lit(1)).as("cnt"))
          val w = Window.orderBy(col("occ"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          val hc = hist.withColumn("cum", sum(col("cnt")).over(w))
          val p99 = hc
            .crossJoin(broadcast(base.select(col("n_cells").as("nc"))))
            .filter(col("cum") >= expr("(99 * nc + 99) DIV 100"))
            .agg(min(col("occ")).as("p99_occ"))
          base.crossJoin(broadcast(p99))
            .select(col("n_cells"), col("n_vecs"), col("empty_cells"),
              col("max_occ"), col("p99_occ"),
              round(col("n_vecs") / col("n_cells"), 6).as("mean_occ"),
              round(col("max_occ") / (col("n_vecs") / col("n_cells")), 4)
                .as("max_load_factor"))
        case None =>
          Wave24Queries.qvecs(s, d).select(
            col("vec_id").as("n_cells"), col("vec_id").as("n_vecs"),
            col("vec_id").as("empty_cells"), col("vec_id").as("max_occ"),
            col("vec_id").as("p99_occ"),
            lit(0.0).as("mean_occ"), lit(0.0).as("max_load_factor"))
            .limit(0)
      }
    },
    Some(Wave29Queries.CoarseSql +
      s""", occ AS (SELECT c.cid, count(a.vec_id) AS occ
                 FROM cents c LEFT JOIN a0g a USING (cid) GROUP BY c.cid),
          base AS (SELECT count(*) AS n_cells,
                          CAST(sum(occ) AS BIGINT) AS n_vecs,
                          CAST(sum(CASE WHEN occ = 0 THEN 1 ELSE 0 END)
                            AS BIGINT) AS empty_cells,
                          CAST(max(occ) AS BIGINT) AS max_occ
                   FROM occ),
          hist AS (SELECT occ, count(*) AS cnt FROM occ GROUP BY occ),
          hc AS (SELECT occ, sum(cnt) OVER (ORDER BY occ
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
                 FROM hist),
          p99 AS (SELECT CAST(min(occ) AS BIGINT) AS p99_occ FROM hc, base
                  WHERE cum >= (99 * base.n_cells + 99) // 100)
          SELECT base.n_cells, base.n_vecs, base.empty_cells, base.max_occ,
                 p99.p99_occ,
                 round(CAST(base.n_vecs AS DOUBLE) / base.n_cells, 6)
                   AS mean_occ,
                 round(CAST(base.max_occ AS DOUBLE)
                       / (CAST(base.n_vecs AS DOUBLE) / base.n_cells), 4)
                   AS max_load_factor
          FROM base, p99""")
  )

  val all: Seq[GQuery] = Seq(q211)
}
