package graft.operators

import graft.GQuery
import graft.sources.Tables
import graft.util.Geometry
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-13 wave 34: q212 — retrieval ranking-quality audit (NDCG@10 +
  * MRR) of the served IVFADC index. The scorer-evaluation family had
  * classification metrics (q166 ROC AUC, q172 PR thresholds) and SET
  * metrics for retrieval (recall@10 in q173/q201/q203), but no RANKING
  * metric — and recall is blind to order: an index that returns the
  * true top-10 reversed scores recall 1.0 while serving its worst
  * neighbour first. NDCG@10 (graded relevance = the exact ranking's own
  * positions) and MRR (reciprocal rank of the true nearest neighbour)
  * price exactly that ordering, over the SAME standing index
  * ([[Wave29Queries.servingIndex]]) and the SAME two capped rankings as
  * q203 — one more consumer of the audited relations, not a new
  * ranking definition.
  *
  * Determinism: the DCG position weights are a 10-entry literal table
  * w(i) = round(10^6 / log2(i+1)) computed ONCE in Scala and embedded
  * verbatim in both engines (no float log evaluates in either engine);
  * relevance is the exact integer 11 − xrk; per-query
  * ndcg_ppm = dcg·10^6 DIV idcg and rr_ppm = 10^6 DIV ark are integer
  * divisions; the published means are one more integer DIV each. IDCG
  * is computed per query from its own exact top-10 (the ideal ordering
  * IS the exact ranking), so queries near a corpus edge with fewer
  * than 10 neighbours normalize correctly.
  *
  * Scale notes: identical cost shape to q203 — two map-only broadcast
  * passes over the cid-partitioned coded index into WindowGroupLimit
  * heaps (PlanShapeSpec registry sweep covers them), then Q-row joins
  * and 1-row reductions. The audit reads the standing artifact; it
  * rebuilds nothing.
  */
object Wave34Queries {

  import Wave29Queries.{AudModFloor, AudTargetLog2, TopK}

  /** DCG position weights, ppm: w(i) = round(10^6 / log2(i+1)) for
    * ranks 1..10 — the single source both engines read as literals. */
  private[operators] val W: IndexedSeq[Long] = (1 to TopK).map(i =>
    math.round(1000000.0 * math.log(2.0) / math.log(i + 1.0)))

  private val q212 = GQuery(
    "q212_retrieval_ndcg",
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
          val wAdc = Window.partitionBy(col("q_id"))
            .orderBy(col("adc"), col("nbr"))
          val adcTop = idx.coded.join(qm,
              isCand && col("vec_id") =!= col("q_id"))
            .select(col("q_id"), col("vec_id").as("nbr"),
              Wave29Queries.adcDist.as("adc"))
            .withColumn("ark", row_number().over(wAdc))
            .filter(col("ark") <= TopK)
            .select(col("q_id"), col("nbr"), col("ark"))
          val wEx = Window.partitionBy(col("q_id"))
            .orderBy(col("ex"), col("nbr"))
          val exTop = idx.coded.join(qm, col("vec_id") =!= col("q_id"))
            .select(col("q_id"), col("vec_id").as("nbr"),
              Wave29Queries.l2(col("fqv"), col("qqv")).as("ex"))
            .withColumn("xrk", row_number().over(wEx))
            .filter(col("xrk") <= TopK)
            .select(col("q_id"), col("nbr"), col("xrk"))
          val wlit = typedLit(W)
          val idcg = exTop.groupBy(col("q_id"))
            .agg(sum((lit(11) - col("xrk")).cast("long")
              * element_at(wlit, col("xrk"))).as("idcg"))
          val dcg = adcTop.join(exTop, Seq("q_id", "nbr"), "left")
            .groupBy(col("q_id"))
            .agg(sum(coalesce(lit(11) - col("xrk"), lit(0)).cast("long")
              * element_at(wlit, col("ark"))).as("dcg"))
          val rr = exTop.filter(col("xrk") === 1)
            .join(adcTop, Seq("q_id", "nbr"), "left")
            .select(col("q_id"),
              coalesce(expr("1000000 DIV ark"), lit(0)).cast("long")
                .as("rr_ppm"))
          queries.select(col("q_id"))
            .join(idcg, Seq("q_id"), "left")
            .join(dcg, Seq("q_id"), "left")
            .join(rr, Seq("q_id"), "left")
            .select(col("q_id"),
              when(coalesce(col("idcg"), lit(0L)) > 0,
                expr("coalesce(dcg, 0) * 1000000 DIV idcg"))
                .otherwise(lit(0L)).as("ndcg_ppm"),
              coalesce(col("rr_ppm"), lit(0L)).as("rr_ppm"))
            .agg(count(lit(1)).as("n_queries"),
              expr("sum(ndcg_ppm) DIV count(1)").as("ndcg10_ppm"),
              expr("sum(rr_ppm) DIV count(1)").as("mrr_ppm"),
              sum(when(col("rr_ppm") === 1000000L, 1L).otherwise(0L))
                .as("nn1_at_1"))
        case None =>
          Wave24Queries.qvecs(s, d).select(
            col("vec_id").as("n_queries"), col("vec_id").as("ndcg10_ppm"),
            col("vec_id").as("mrr_ppm"), col("vec_id").as("nn1_at_1"))
            .limit(0)
      }
    },
    Some(Wave29Queries.IvfadcSql + Wave29Queries.AuditRankSql +
      s""", w(i, wv) AS (VALUES ${W.zipWithIndex.map { case (wv, i) =>
             s"(${i + 1}, ${wv}::BIGINT)" }.mkString(", ")}),
          idcg AS (SELECT q_id, CAST(sum((11 - xrk) * w.wv) AS BIGINT) AS idcg
                   FROM xt JOIN w ON w.i = xt.xrk GROUP BY q_id),
          dcg AS (SELECT a.q_id,
                    CAST(sum(coalesce(11 - x.xrk, 0) * w.wv) AS BIGINT) AS dcg
                  FROM ar a JOIN w ON w.i = a.ark
                  LEFT JOIN xt x ON x.q_id = a.q_id AND x.nbr = a.nbr
                  GROUP BY a.q_id),
          rr AS (SELECT x.q_id,
                   CAST(coalesce(1000000 // a.ark, 0) AS BIGINT) AS rr_ppm
                 FROM xt x LEFT JOIN ar a ON a.q_id = x.q_id AND a.nbr = x.nbr
                 WHERE x.xrk = 1),
          per AS (SELECT qs.q_id,
                    CASE WHEN coalesce(i.idcg, 0) > 0
                         THEN coalesce(d.dcg, 0) * 1000000 // i.idcg
                         ELSE 0 END AS ndcg_ppm,
                    coalesce(r.rr_ppm, 0) AS rr_ppm
                  FROM qs LEFT JOIN idcg i USING (q_id)
                          LEFT JOIN dcg d USING (q_id)
                          LEFT JOIN rr r USING (q_id))
          SELECT count(*) AS n_queries,
                 CAST(sum(ndcg_ppm) // count(*) AS BIGINT) AS ndcg10_ppm,
                 CAST(sum(rr_ppm) // count(*) AS BIGINT) AS mrr_ppm,
                 CAST(sum(CASE WHEN rr_ppm = 1000000 THEN 1 ELSE 0 END)
                   AS BIGINT) AS nn1_at_1
          FROM per""")
  )

  val all: Seq[GQuery] = Seq(q212)
}
