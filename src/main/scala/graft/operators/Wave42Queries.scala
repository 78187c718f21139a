package graft.operators

import graft.GQuery
import graft.sources.{Io, Tables}
import graft.util.Geometry
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-13 wave 42: q220 — scalar-quantization recall audit (SQ4 /
  * SQ8, the FAISS-style per-dimension codec). The quantization-lever
  * family now prices all three production compressions: PQ (q201 —
  * subspace codebooks), dimension truncation (q217 — fewer dims), and
  * THIS — fewer bits per dim: each coordinate maps to one of 2^b − 1
  * levels on the corpus's per-dimension [min, max] grid, the scan
  * ranks on symmetric quantized L2, and the sheet reports overlap
  * recall@10 and true-NN retention vs the exact ranking, one row per
  * b ∈ {4, 8}. SQ8's near-perfect recall next to SQ4's measured loss
  * IS the sheet's point: it says which byte budget the corpus's
  * distance structure actually needs.
  *
  * Determinism: the per-dim grid is exact integer arithmetic —
  * code = (v − mn)·L DIV max(mx − mn, 1) on the milli grid (operands
  * non-negative, so Spark `div` and DuckDB `//` agree), the per-dim
  * min/max are exact corpus aggregates, and both rankings break ties
  * by (dist, nbr).
  *
  * Scale notes (100 TB): the grid stats are one posexplode →
  * 64-group min/max aggregate (map-side combine; model-sized result —
  * the 128 longs travel as literals, the q102 driver-holds-only-model
  * rule); encode is map-only inside each ranking pass; rankings are
  * the q217 shape — one broadcast-join corpus pass per b, heap-limited
  * to 10/query, nothing Q·n materialized. A production SQ index stores
  * the b-bit codes (4–8× narrower reads); here both sides encode
  * on the fly because the audit prices the RANKING loss, which is
  * independent of the storage path. */
object Wave42Queries {

  import Wave24Queries.Dim
  import Wave29Queries.{AudModFloor, AudTargetLog2, TopK}

  private val BitWidths = Seq(4, 8)

  /** Fused native kernel (r16) — the aggregate(zip_with) form was
    * interpreted per element inside the n·Q ranking expansion. */
  private def l2c(a: Column, b: Column): Column =
    graft.functions.VecDist.l2sq(a, b)

  private val q220 = GQuery(
    "q220_sq_recall",
    (s, d) => {
      graft.functions.VecDist.register(s)
      val n = Tables.embeddings(s, d).count()
      if (n == 0)
        Wave24Queries.qvecs(s, d).select(
          col("vec_id").cast("int").as("sq_bits"),
          col("vec_id").as("n_queries"), col("vec_id").as("exact_rows"),
          col("vec_id").as("overlap10_hits"), col("vec_id").as("recall_ppm"),
          col("vec_id").as("nn1_hits")).limit(0)
      else {
        val mod = Geometry.adaptiveSampleMod(n, AudModFloor, AudTargetLog2)
        val vecs = Wave24Queries.qvecs(s, d)
        // per-dim grid: exact integer min/max, 64 groups, model-sized
        val stats = vecs
          .select(posexplode(col("qv")).as(Seq("pos", "v")))
          .groupBy(col("pos"))
          .agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
          .orderBy(col("pos")).collect()
        val mns = typedLit(stats.map(_.getLong(1)).toIndexedSeq)
        val rngs = typedLit(stats.map(r =>
          math.max(r.getLong(2) - r.getLong(1), 1L)).toIndexedSeq)
        val queries = broadcast(vecs.filter(col("vec_id") % mod === 0)
          .select(col("vec_id").as("q_id"), col("qv").as("qqv")))
        // per-dim encoder: (v − mn)·L div rng, exact integers — operands
        // are non-negative so the `(num − num mod den) / den` form is
        // exactly the truncating integer division both oracles use (the
        // Column DSL's `/` alone would be DOUBLE division)
        def sq(v: Column, levels: Long): Column =
          transform(sequence(lit(1), lit(Dim)), i => {
            val num = (element_at(v, i.cast("int"))
              - element_at(mns, i.cast("int"))) * levels
            val den = element_at(rngs, i.cast("int"))
            ((num - pmod(num, den)) / den).cast("long")
          })
        // rank pre-ENCODED relations: the encoder runs n + Q times (once
        // per vector, before the join), never inside the n·Q candidate
        // expansion — measured 2.7 s → ~1.3 s at sf0.1
        def top10(corpus: DataFrame, qrel: DataFrame): DataFrame = {
          val w = Window.partitionBy(col("q_id"))
            .orderBy(col("dist"), col("nbr"))
          corpus.join(broadcast(qrel), col("vec_id") =!= col("q_id"))
            .select(col("q_id"), col("vec_id").as("nbr"),
              l2c(col("ev"), col("eq")).as("dist"))
            .withColumn("rn", row_number().over(w))
            .filter(col("rn") <= TopK)
            .select(col("q_id"), col("nbr"), col("rn"))
        }
        val full = Io.materialize(top10(
          vecs.select(col("vec_id"), col("qv").as("ev")),
          queries.select(col("q_id"), col("qqv").as("eq"))))
        val nq = queries.select(count(lit(1)).as("n_queries"))
        val perB = BitWidths.map { b =>
          val lv = (1L << b) - 1L
          val pr = Io.materialize(top10(
            vecs.select(col("vec_id"), sq(col("qv"), lv).as("ev")),
            queries.select(col("q_id"), sq(col("qqv"), lv).as("eq"))))
          val hits = full.join(pr.select(col("q_id"), col("nbr")),
              Seq("q_id", "nbr"))
            .agg(coalesce(count(lit(1)), lit(0L)).as("overlap10_hits"))
          val nn1 = full.filter(col("rn") === 1)
            .join(pr.filter(col("rn") === 1)
              .select(col("q_id"), col("nbr")), Seq("q_id", "nbr"))
            .agg(coalesce(count(lit(1)), lit(0L)).as("nn1_hits"))
          val ex = full.agg(count(lit(1)).as("exact_rows"))
          nq.crossJoin(broadcast(ex)).crossJoin(broadcast(hits))
            .crossJoin(broadcast(nn1))
            .select(lit(b).as("sq_bits"), col("n_queries"),
              col("exact_rows"), col("overlap10_hits"),
              when(col("exact_rows") > 0,
                expr("overlap10_hits * 1000000 DIV exact_rows"))
                .otherwise(lit(0L)).as("recall_ppm"),
              col("nn1_hits"))
        }
        perB.reduce(_ unionAll _).orderBy(col("sq_bits"))
      }
    },
    Some {
      def sqSql(v: String, levels: Long): String =
        s"""list_transform(range(1, ${Dim + 1}), i ->
            (($v[CAST(i AS INT)] - st.mna[CAST(i AS INT)]) * $levels)
            // st.rga[CAST(i AS INT)])"""
      def rank(name: String, dist: String, extra: String): String =
        s"""$name AS MATERIALIZED (SELECT q_id, nbr, rn FROM (
              SELECT qs.q_id, em2.vec_id AS nbr,
                     row_number() OVER (PARTITION BY qs.q_id
                       ORDER BY $dist, em2.vec_id) AS rn
              FROM em em2, qs$extra WHERE em2.vec_id <> qs.q_id)
            WHERE rn <= $TopK)"""
      def l2Sql(a: String, b: String): String =
        s"""list_sum(list_transform(range(1, ${Dim + 1}),
            i -> ($a[CAST(i AS INT)] - $b[CAST(i AS INT)])
               * ($a[CAST(i AS INT)] - $b[CAST(i AS INT)])))"""
      def perB(b: Int): String = {
        val lv = (1L << b) - 1L
        s"""SELECT $b AS sq_bits,
               (SELECT count(*) FROM qs) AS n_queries,
               (SELECT count(*) FROM xf) AS exact_rows,
               (SELECT count(*) FROM xf JOIN sq$b USING (q_id, nbr))
                 AS overlap10_hits,
               CASE WHEN (SELECT count(*) FROM xf) > 0 THEN
                 (SELECT count(*) FROM xf JOIN sq$b USING (q_id, nbr))
                   * 1000000 // (SELECT count(*) FROM xf)
               ELSE 0 END AS recall_ppm,
               (SELECT count(*) FROM xf a JOIN sq$b p
                  ON a.q_id = p.q_id AND a.nbr = p.nbr
                  AND a.rn = 1 AND p.rn = 1) AS nn1_hits
            WHERE EXISTS (SELECT 1 FROM embeddings)"""
      }
      s"""WITH em AS MATERIALIZED (SELECT vec_id, list_transform(embedding,
                x -> CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT)) AS qv
              FROM embeddings),
          qmod AS (SELECT ${Geometry.adaptiveSampleModSql("count(*)",
            AudModFloor, AudTargetLog2)} AS m FROM embeddings),
          qs AS MATERIALIZED (SELECT vec_id AS q_id, qv AS qqv
                 FROM em, qmod WHERE vec_id % qmod.m = 0),
          dimstats AS (SELECT i, min(qv[CAST(i AS INT)]) AS mn,
                         GREATEST(max(qv[CAST(i AS INT)])
                           - min(qv[CAST(i AS INT)]), 1) AS rg
                       FROM em, range(1, ${Dim + 1}) t(i) GROUP BY i),
          st AS (SELECT list(mn ORDER BY i) AS mna,
                        list(rg ORDER BY i) AS rga
                 FROM dimstats),
          ${rank("xf", l2Sql("em2.qv", "qs.qqv"), "")},
          ${BitWidths.map { b =>
            val lv = (1L << b) - 1L
            rank(s"sq$b",
              l2Sql(s"(${sqSql("em2.qv", lv)})", s"(${sqSql("qs.qqv", lv)})"),
              ", st")
          }.mkString(", ")}
          ${BitWidths.map(perB).mkString(" UNION ALL ")}
          ORDER BY sq_bits"""
    }
  )

  val all: Seq[GQuery] = Seq(q220)
}
