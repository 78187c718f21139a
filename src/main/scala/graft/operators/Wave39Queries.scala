package graft.operators

import graft.GQuery
import graft.sources.Tables
import graft.util.Geometry
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-13 wave 39: q217 — dimension-truncation recall (the
  * Matryoshka/MRL serving trick, priced). A common production lever
  * cuts ANN serving cost by ranking on a PREFIX of the embedding
  * (first P of Dim dims — 4× less arithmetic and bandwidth at P=16)
  * and keeping the full vector only for the final rerank; whether
  * that's safe is a property of the embedding's dimension layout
  * (front-loaded variance — q120's sheet — is the precondition, THIS
  * measures the consequence). For the standard query sample: exact
  * top-10 by full-dim integer L2 vs top-10 by prefix L2 at P ∈ {16,
  * 32} — overlap recall, true-NN retention at rank 1, per-P rows.
  *
  * Index-independent by design: this audits the EMBEDDING, not the
  * IVFADC artifact (no coarse cells, no codes — the ranking defect
  * measured here is what a truncated-serving index would inherit on
  * top of its own quantization losses, which q201/q203 price
  * separately).
  *
  * Scale notes (100 TB): one broadcast-join pass over the corpus per
  * ranking (3 total), each reducing immediately through a literal
  * rank ≤ 10 filter (map-side WindowGroupLimit heaps — the q203
  * discipline); nothing Q·n materializes, the corpus never shuffles,
  * and the prefix distance reads P/Dim of each vector's bytes —
  * exactly the bandwidth saving the sheet prices. */
object Wave39Queries {

  import Wave24Queries.Dim
  import Wave29Queries.{AudModFloor, AudTargetLog2, TopK}

  private val Prefixes = Seq(16, 32)

  /** Exact integer squared L2 over the first `p` dims — slice stays
    * (codegen-native copy), the fold is the fused r16 kernel instead of
    * the interpreted aggregate(zip_with) lambda. */
  private def l2p(a: Column, b: Column, p: Int): Column =
    graft.functions.VecDist.l2sq(slice(a, 1, p), slice(b, 1, p))

  private def l2pSql(a: String, b: String, p: Int): String =
    s"""list_sum(list_transform(range(1, ${p + 1}),
        i -> ($a[CAST(i AS INT)] - $b[CAST(i AS INT)])
           * ($a[CAST(i AS INT)] - $b[CAST(i AS INT)])))"""

  private val q217 = GQuery(
    "q217_dim_truncation",
    (s, d) => {
      graft.functions.VecDist.register(s)
      val n = Tables.embeddings(s, d).count()
      if (n == 0)
        Wave24Queries.qvecs(s, d).select(
          col("vec_id").cast("int").as("p_dims"),
          col("vec_id").as("n_queries"), col("vec_id").as("exact_rows"),
          col("vec_id").as("overlap10_hits"), col("vec_id").as("recall_ppm"),
          col("vec_id").as("nn1_hits")).limit(0)
      else {
        val mod = Geometry.adaptiveSampleMod(n, AudModFloor, AudTargetLog2)
        val vecs = Wave24Queries.qvecs(s, d)
        val queries = broadcast(vecs.filter(col("vec_id") % mod === 0)
          .select(col("vec_id").as("q_id"), col("qv").as("qqv")))
        // one corpus pass per ranking, heap-limited to 10/query
        def top10(p: Int): DataFrame = {
          val w = Window.partitionBy(col("q_id"))
            .orderBy(col("dist"), col("nbr"))
          vecs.join(queries, col("vec_id") =!= col("q_id"))
            .select(col("q_id"), col("vec_id").as("nbr"),
              l2p(col("qv"), col("qqv"), p).as("dist"))
            .withColumn("rn", row_number().over(w))
            .filter(col("rn") <= TopK)
            .select(col("q_id"), col("nbr"), col("rn"))
        }
        val full = graft.sources.Io.materialize(top10(Dim))
        val nq = queries.select(count(lit(1)).as("n_queries"))
        val perP = Prefixes.map { p =>
          val pr = graft.sources.Io.materialize(top10(p))
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
            .select(lit(p).as("p_dims"), col("n_queries"), col("exact_rows"),
              col("overlap10_hits"),
              when(col("exact_rows") > 0,
                expr("overlap10_hits * 1000000 DIV exact_rows"))
                .otherwise(lit(0L)).as("recall_ppm"),
              col("nn1_hits"))
        }
        perP.reduce(_ unionAll _).orderBy(col("p_dims"))
      }
    },
    Some {
      def rank(name: String, p: Int): String =
        s"""$name AS MATERIALIZED (SELECT q_id, nbr, rn FROM (
              SELECT qs.q_id, em2.vec_id AS nbr,
                     row_number() OVER (PARTITION BY qs.q_id
                       ORDER BY ${l2pSql("em2.qv", "qs.qqv", p)},
                                em2.vec_id) AS rn
              FROM em em2, qs WHERE em2.vec_id <> qs.q_id)
            WHERE rn <= $TopK)"""
      def perP(p: Int): String =
        s"""SELECT $p AS p_dims,
               (SELECT count(*) FROM qs) AS n_queries,
               (SELECT count(*) FROM xf) AS exact_rows,
               (SELECT count(*) FROM xf JOIN p$p USING (q_id, nbr))
                 AS overlap10_hits,
               CASE WHEN (SELECT count(*) FROM xf) > 0 THEN
                 (SELECT count(*) FROM xf JOIN p$p USING (q_id, nbr))
                   * 1000000 // (SELECT count(*) FROM xf)
               ELSE 0 END AS recall_ppm,
               (SELECT count(*) FROM xf a JOIN p$p b
                  ON a.q_id = b.q_id AND a.nbr = b.nbr
                  AND a.rn = 1 AND b.rn = 1) AS nn1_hits
            WHERE EXISTS (SELECT 1 FROM embeddings)"""
      s"""WITH em AS MATERIALIZED (SELECT vec_id, list_transform(embedding,
                x -> CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT)) AS qv
              FROM embeddings),
          qmod AS (SELECT ${Geometry.adaptiveSampleModSql("count(*)",
            AudModFloor, AudTargetLog2)} AS m FROM embeddings),
          qs AS MATERIALIZED (SELECT vec_id AS q_id, qv AS qqv
                 FROM em, qmod WHERE vec_id % qmod.m = 0),
          ${rank("xf", Dim)},
          ${Prefixes.map(p => rank(s"p$p", p)).mkString(", ")}
          ${Prefixes.map(perP).mkString(" UNION ALL ")}
          ORDER BY p_dims"""
    }
  )

  val all: Seq[GQuery] = Seq(q217)
}
