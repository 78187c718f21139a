package graft.operators

import graft.GQuery
import graft.functions.CosineSim
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector / similarity-search family over the embeddings table
  * (64-dim float vectors). Absent from the reference (SURVEY §2-A);
  * mandated by the north star. The cosine kernel's fused accumulate loop
  * is the reference's chunk-scan idiom (max_aggregation.cpp:54-55) per
  * row instead of per chunk.
  *
  * The scalar kernel is graft.functions.CosineSim — a native Catalyst
  * expression with codegen (single fused pass, no boxing). Cross-engine
  * determinism: similarity values are rounded to 4 digits and ordered by
  * (rounded sim, vec_id), so engine-level 1-ulp accumulation differences
  * cannot reorder the output.
  *
  * Scale notes (100 TB): q26 is the brute-force baseline — a broadcast of
  * ONE query vector against a fully partitioned scan, followed by
  * TakeOrderedAndProject (per-partition top-k heaps, driver merges k rows).
  * q37 is the scale path: IVF-style bucketing — vectors are assigned to
  * their nearest centroid once (any fixed codebook), the probe only scans
  * the best nProbe buckets. With B buckets the scan cost drops ~B/nProbe-
  * fold; bucket assignment is a broadcast join (codebook is tiny), so
  * nothing here shuffles the big table at query time.
  */
object VectorQueries {

  private def emb(s: SparkSession, d: String): DataFrame = Tables.embeddings(s, d)

  /** The fixed query vector (vec_id = 0), broadcast. */
  private def queryVec(s: SparkSession, d: String): DataFrame =
    emb(s, d).filter(col("vec_id") === 0).select(col("embedding").as("qv"))

  /** Oracle helper: exact cosine via per-component unnest, rounded to 4. */
  private def cosineSql(vecExpr: String, qvExpr: String): String =
    s"""round(
          (SELECT sum(CAST($vecExpr[i.i] AS DOUBLE) * CAST($qvExpr[i.i] AS DOUBLE))
           FROM range(1, 65) i(i))
          / (sqrt((SELECT sum(CAST($vecExpr[i.i] AS DOUBLE) * CAST($vecExpr[i.i] AS DOUBLE))
                   FROM range(1, 65) i(i)))
             * sqrt((SELECT sum(CAST($qvExpr[i.i] AS DOUBLE) * CAST($qvExpr[i.i] AS DOUBLE))
                     FROM range(1, 65) i(i)))), 4)"""

  /** q26 — brute-force cosine top-k vs the fixed query vector. */
  private val q26 = GQuery(
    "q26_similarity_topk",
    (s, d) => {
      CosineSim.register(s)
      emb(s, d).crossJoin(broadcast(queryVec(s, d)))
        .filter(col("vec_id") =!= 0)
        .select(col("vec_id"), round(CosineSim(col("embedding"), col("qv")), 4).as("sim"))
        .orderBy(col("sim").desc, col("vec_id"))
        .limit(10)
    },
    Some(s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
             SELECT vec_id, ${cosineSql("e.embedding", "q.qv")} AS sim
             FROM embeddings e, q WHERE vec_id <> 0
             ORDER BY sim DESC, vec_id LIMIT 10""")
  )

  /** q28 — multimodal join: documents ⋈ embeddings (1:1 key), per-language
    * stats over a vector component. The per-group mean is rounded to 6
    * digits (double accumulation across ~100 rows ≪ 1e-6). */
  private val q28 = GQuery(
    "q28_multimodal_join",
    (s, d) =>
      Tables.documents(s, d)
        .join(emb(s, d), col("doc_id") === col("vec_id"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          round(sum(element_at(col("embedding"), 1).cast("double")) / count(lit(1)), 6)
            .as("avg_first_component"))
        .orderBy(col("lang")),
    Some("""SELECT lang, count(*) AS n,
                   round(sum(CAST(embedding[1] AS DOUBLE)) / count(*), 6) AS avg_first_component
            FROM documents JOIN embeddings ON doc_id = vec_id
            GROUP BY lang ORDER BY lang""")
  )

  /** q37 — IVF-style approximate nearest neighbour: codebook = vectors
    * 0..15, every vector assigned to its nearest centroid (deterministic
    * tie-break), query probes the 2 closest buckets and brute-forces only
    * inside them. */
  private val q37 = GQuery(
    "q37_ann_ivf",
    (s, d) => {
      CosineSim.register(s)
      val cents = emb(s, d).filter(col("vec_id") < 16)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val assigned = emb(s, d).crossJoin(broadcast(cents))
        .select(col("vec_id"), col("embedding"), col("cid"),
          round(CosineSim(col("embedding"), col("cvec")), 6).as("csim"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("vec_id")).orderBy(col("csim").desc, col("cid"))))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("embedding"), col("cid"))
      val qv = queryVec(s, d)
      val probeBuckets = cents.crossJoin(broadcast(qv))
        .select(col("cid"), round(CosineSim(col("cvec"), col("qv")), 6).as("qsim"))
        .orderBy(col("qsim").desc, col("cid"))
        .limit(2)
        .select(col("cid"))
      assigned
        .join(broadcast(probeBuckets), Seq("cid"))
        .crossJoin(broadcast(qv))
        .filter(col("vec_id") =!= 0)
        .select(col("vec_id"), round(CosineSim(col("embedding"), col("qv")), 4).as("sim"))
        .orderBy(col("sim").desc, col("vec_id"))
        .limit(10)
    },
    Some(s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
             cents AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < 16),
             assigned AS (
               SELECT vec_id, embedding, cid FROM (
                 SELECT e.vec_id, e.embedding, c.cid,
                        row_number() OVER (PARTITION BY e.vec_id
                          ORDER BY ${cosineSql6("e.embedding", "c.cvec")} DESC, c.cid) AS rn
                 FROM embeddings e, cents c)
               WHERE rn = 1),
             probe AS (
               SELECT cid FROM cents c, q
               ORDER BY ${cosineSql6("c.cvec", "q.qv")} DESC, cid LIMIT 2)
             SELECT a.vec_id, ${cosineSql("a.embedding", "q.qv")} AS sim
             FROM assigned a JOIN probe USING (cid), q
             WHERE a.vec_id <> 0
             ORDER BY sim DESC, a.vec_id LIMIT 10""")
  )

  /** q41 — embedding-cosine near-duplicate candidates, blocked by label
    * (the blocking key bounds the pair blowup: B blocks shrink the
    * quadratic term ~B-fold; at 100 TB the block key would be an LSH
    * bucket à la q31 rather than a given label). Similarities rounded to
    * 4 with (v1,v2) canonical ordering. */
  private val q41 = GQuery(
    "q41_dedup_embedding",
    (s, d) => {
      CosineSim.register(s)
      val e = emb(s, d).select(col("vec_id"), col("embedding"), col("label"))
      e.as("a").join(e.as("b"),
          col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("v1"), col("b.vec_id").as("v2"),
          round(CosineSim(col("a.embedding"), col("b.embedding")), 4).as("sim"))
        .filter(col("sim") >= 0.25)
        .orderBy(col("v1"), col("v2"))
    },
    Some("""WITH p AS (SELECT a.vec_id v1, a.embedding ea, b.vec_id v2, b.embedding eb
                       FROM embeddings a JOIN embeddings b
                         ON a.label = b.label AND a.vec_id < b.vec_id),
                 s AS (SELECT v1, v2,
                              sum(CAST(ea[i.i] AS DOUBLE) * CAST(eb[i.i] AS DOUBLE)) AS dot,
                              sum(CAST(ea[i.i] AS DOUBLE) ** 2) AS na,
                              sum(CAST(eb[i.i] AS DOUBLE) ** 2) AS nb
                       FROM p, range(1, 65) i(i) GROUP BY v1, v2)
            SELECT v1, v2, round(dot / (sqrt(na) * sqrt(nb)), 4) AS sim
            FROM s WHERE round(dot / (sqrt(na) * sqrt(nb)), 4) >= 0.25
            ORDER BY v1, v2""")
  )

  /** Oracle helper at 6-digit rounding (centroid assignment). */
  private def cosineSql6(vecExpr: String, qvExpr: String): String =
    s"""round(
          (SELECT sum(CAST($vecExpr[i.i] AS DOUBLE) * CAST($qvExpr[i.i] AS DOUBLE))
           FROM range(1, 65) i(i))
          / (sqrt((SELECT sum(CAST($vecExpr[i.i] AS DOUBLE) * CAST($vecExpr[i.i] AS DOUBLE))
                   FROM range(1, 65) i(i)))
             * sqrt((SELECT sum(CAST($qvExpr[i.i] AS DOUBLE) * CAST($qvExpr[i.i] AS DOUBLE))
                     FROM range(1, 65) i(i)))), 6)"""

  val all: Seq[GQuery] = Seq(q26, q28, q37, q41)
}
