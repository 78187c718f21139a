package graft.operators

import graft.GQuery
import graft.sources.{Io, Tables}
import graft.util.Geometry
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-13 wave 37: q215 — two-stage retrieve-then-rerank lift. The
  * production retrieval stack is never ADC-scores-all-the-way-down:
  * the cheap stage (IVFADC) fetches a candidate pool R ≫ k, then an
  * exact rerank over those R rows fixes the quantization-induced
  * ordering errors before the top-k is served. q212 showed the served
  * ADC ranking loses NDCG to code mis-ranking; this sheet prices what
  * the standard fix buys: NDCG@10 of the raw ADC top-10 vs NDCG@10
  * after exact-reranking the ADC top-30, plus how often the TRUE
  * nearest neighbour serves at position 1 under each. The lift column
  * is the dial sheet for R — rerank cost grows linearly in R while
  * the recoverable lift is capped by cell recall (a neighbour whose
  * cell was never probed cannot be reranked back; q203's cell_misses
  * prices that half).
  *
  * Semantics: same standing index, same query sample, and (on the
  * oracle side) the same `scored`/`exd`/`xt` audited relations as
  * q203/q212 — the rerank candidates are the ADC top-30 (rank by
  * (adc, nbr)), reranked by the exact integer distance (ex, nbr);
  * graded relevance and the ppm DCG weight table are q212's verbatim.
  * Per-query NDCGs are integer DIV against the query's own ideal DCG;
  * lift_ppm = the difference of the two published means.
  *
  * Scale notes (100 TB): exactly two broadcast passes over the
  * cid-partitioned coded index — the candidate pass (probed cells
  * only, computing ADC and exact distance in ONE scan since fqv rides
  * the index) into a WindowGroupLimit heap at R = 30, and the exact-
  * baseline pass into a heap at 10 — then everything downstream is
  * Q·R rows, materialized once and consumed by both rankings. The
  * rerank itself never touches the corpus: it reorders the 30-row
  * pool per query, which is the whole point of the architecture. */
object Wave37Queries {

  import Wave29Queries.{AudModFloor, AudTargetLog2, TopK, l2, adcDist}
  import Wave34Queries.W

  private val RerankR = 30

  private val q215 = GQuery(
    "q215_rerank_lift",
    (s, d) => {
      Wave29Queries.servingIndex(s, d) match {
        case Some(idx) =>
          val n = Tables.embeddings(s, d).count()
          val mod = Geometry.adaptiveSampleMod(n, AudModFloor, AudTargetLog2)
          val queries = Wave24Queries.qvecs(s, d)
            .filter(col("vec_id") % mod === 0)
            .select(col("vec_id").as("q_id"), col("qv").as("qqv"))
          val qm = broadcast(Wave29Queries.qMeta(idx, queries))
          val isCand = array_contains(col("pcids"), col("cid"))
          // ONE candidate scan carries both distances: ADC (the serving
          // score) and exact (the rerank score) — fqv rides the index
          val wAdc = Window.partitionBy(col("q_id"))
            .orderBy(col("adc"), col("nbr"))
          val candR = Io.materialize(
            idx.coded.join(qm, isCand && col("vec_id") =!= col("q_id"))
              .select(col("q_id"), col("vec_id").as("nbr"),
                adcDist.as("adc"), l2(col("fqv"), col("qqv")).as("ex"))
              .withColumn("ark", row_number().over(wAdc))
              .filter(col("ark") <= RerankR))
          val wRr = Window.partitionBy(col("q_id"))
            .orderBy(col("ex"), col("nbr"))
          val rr10 = candR
            .withColumn("rrk", row_number().over(wRr))
            .filter(col("rrk") <= TopK)
          val adc10 = candR.filter(col("ark") <= TopK)
          // exact baseline over the full corpus (the q212 pass)
          val wEx = Window.partitionBy(col("q_id"))
            .orderBy(col("ex"), col("nbr"))
          val exTop = Io.materialize(
            idx.coded.join(qm, col("vec_id") =!= col("q_id"))
              .select(col("q_id"), col("vec_id").as("nbr"),
                l2(col("fqv"), col("qqv")).as("ex"))
              .withColumn("xrk", row_number().over(wEx))
              .filter(col("xrk") <= TopK)
              .select(col("q_id"), col("nbr"), col("xrk")))
          val wlit = typedLit(W)
          val rel = coalesce(lit(11) - col("xrk"), lit(0)).cast("long")
          val idcg = exTop.groupBy(col("q_id"))
            .agg(sum((lit(11) - col("xrk")).cast("long")
              * element_at(wlit, col("xrk"))).as("idcg"))
          val dcgA = adc10.join(exTop, Seq("q_id", "nbr"), "left")
            .groupBy(col("q_id"))
            .agg(sum(rel * element_at(wlit, col("ark"))).as("dcga"))
          val dcgR = rr10.join(exTop, Seq("q_id", "nbr"), "left")
            .groupBy(col("q_id"))
            .agg(sum(rel * element_at(wlit, col("rrk"))).as("dcgr"))
          val t1 = exTop.filter(col("xrk") === 1)
            .select(col("q_id"), col("nbr"))
          val nn1 = t1
            .join(adc10.filter(col("ark") === 1)
              .select(col("q_id"), col("nbr"), lit(1L).as("ha")),
              Seq("q_id", "nbr"), "left")
            .join(rr10.filter(col("rrk") === 1)
              .select(col("q_id"), col("nbr"), lit(1L).as("hr")),
              Seq("q_id", "nbr"), "left")
            .agg(coalesce(sum(col("ha")), lit(0L)).as("nn1_adc"),
              coalesce(sum(col("hr")), lit(0L)).as("nn1_rerank"))
          queries.select(col("q_id"))
            .join(idcg, Seq("q_id"), "left")
            .join(dcgA, Seq("q_id"), "left")
            .join(dcgR, Seq("q_id"), "left")
            .select(
              when(coalesce(col("idcg"), lit(0L)) > 0,
                expr("coalesce(dcga, 0) * 1000000 DIV idcg"))
                .otherwise(lit(0L)).as("na"),
              when(coalesce(col("idcg"), lit(0L)) > 0,
                expr("coalesce(dcgr, 0) * 1000000 DIV idcg"))
                .otherwise(lit(0L)).as("nr"))
            .agg(count(lit(1)).as("n_queries"),
              expr("sum(na) DIV count(1)").as("ndcg_adc_ppm"),
              expr("sum(nr) DIV count(1)").as("ndcg_rerank_ppm"))
            .withColumn("lift_ppm",
              col("ndcg_rerank_ppm") - col("ndcg_adc_ppm"))
            .crossJoin(broadcast(nn1))
            .select(col("n_queries"), col("ndcg_adc_ppm"),
              col("ndcg_rerank_ppm"), col("lift_ppm"),
              col("nn1_adc"), col("nn1_rerank"))
        case None =>
          Wave24Queries.qvecs(s, d).select(
            col("vec_id").as("n_queries"), col("vec_id").as("ndcg_adc_ppm"),
            col("vec_id").as("ndcg_rerank_ppm"), col("vec_id").as("lift_ppm"),
            col("vec_id").as("nn1_adc"), col("vec_id").as("nn1_rerank"))
            .limit(0)
      }
    },
    Some(Wave29Queries.IvfadcSql + Wave29Queries.AuditRankSql +
      s""", arR AS (SELECT q_id, nbr, ark FROM (
                 SELECT q_id, nbr, row_number() OVER (PARTITION BY q_id
                          ORDER BY adc, nbr) AS ark
                 FROM scored) WHERE ark <= $RerankR),
          rr10 AS (SELECT q_id, nbr, rrk FROM (
                 SELECT a.q_id, a.nbr, row_number() OVER (PARTITION BY a.q_id
                          ORDER BY x.ex, a.nbr) AS rrk
                 FROM arR a JOIN exd x ON x.q_id = a.q_id AND x.nbr = a.nbr)
               WHERE rrk <= $TopK),
          w(i, wv) AS (VALUES ${W.zipWithIndex.map { case (wv, i) =>
            s"(${i + 1}, ${wv}::BIGINT)" }.mkString(", ")}),
          idcg AS (SELECT q_id, CAST(sum((11 - xrk) * w.wv) AS BIGINT) AS idcg
                   FROM xt JOIN w ON w.i = xt.xrk GROUP BY q_id),
          dcga AS (SELECT a.q_id,
                     CAST(sum(coalesce(11 - x.xrk, 0) * w.wv) AS BIGINT) AS dcga
                   FROM ar a JOIN w ON w.i = a.ark
                   LEFT JOIN xt x ON x.q_id = a.q_id AND x.nbr = a.nbr
                   GROUP BY a.q_id),
          dcgr AS (SELECT r.q_id,
                     CAST(sum(coalesce(11 - x.xrk, 0) * w.wv) AS BIGINT) AS dcgr
                   FROM rr10 r JOIN w ON w.i = r.rrk
                   LEFT JOIN xt x ON x.q_id = r.q_id AND x.nbr = r.nbr
                   GROUP BY r.q_id),
          per AS (SELECT qs.q_id,
                    CASE WHEN coalesce(i.idcg, 0) > 0
                         THEN coalesce(a.dcga, 0) * 1000000 // i.idcg
                         ELSE 0 END AS na,
                    CASE WHEN coalesce(i.idcg, 0) > 0
                         THEN coalesce(r.dcgr, 0) * 1000000 // i.idcg
                         ELSE 0 END AS nr
                  FROM qs LEFT JOIN idcg i USING (q_id)
                          LEFT JOIN dcga a USING (q_id)
                          LEFT JOIN dcgr r USING (q_id)),
          nn1 AS (SELECT
                    CAST(coalesce(sum(CASE WHEN EXISTS (SELECT 1 FROM ar a
                      WHERE a.q_id = x.q_id AND a.nbr = x.nbr AND a.ark = 1)
                      THEN 1 ELSE 0 END), 0) AS BIGINT) AS nn1_adc,
                    CAST(coalesce(sum(CASE WHEN EXISTS (SELECT 1 FROM rr10 r
                      WHERE r.q_id = x.q_id AND r.nbr = x.nbr AND r.rrk = 1)
                      THEN 1 ELSE 0 END), 0) AS BIGINT) AS nn1_rerank
                  FROM xt x WHERE x.xrk = 1)
          SELECT (SELECT count(*) FROM per) AS n_queries,
                 (SELECT CAST(sum(na) // count(*) AS BIGINT) FROM per)
                   AS ndcg_adc_ppm,
                 (SELECT CAST(sum(nr) // count(*) AS BIGINT) FROM per)
                   AS ndcg_rerank_ppm,
                 (SELECT CAST(sum(nr) // count(*) - sum(na) // count(*)
                    AS BIGINT) FROM per) AS lift_ppm,
                 nn1.nn1_adc, nn1.nn1_rerank
          FROM nn1""")
  )

  val all: Seq[GQuery] = Seq(q215)
}
