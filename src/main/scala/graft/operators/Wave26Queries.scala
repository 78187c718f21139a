package graft.operators

import graft.GQuery
import graft.functions.{CosineSim, TextOps}
import graft.sources.{Io, Tables}
import graft.util.Geometry
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-11 wave 26: split hygiene in embedding space —
  *
  *   - q197 linear-kernel MMD between the train and val splits: the
  *     squared L2 distance between the two splits' mean embeddings —
  *     the two-sample statistic that says whether a split is
  *     REPRESENTATIVE (q58/q80 check leakage and sizes; this checks
  *     distribution: a content-hash split should give MMD ≈ 0, a
  *     time- or source-correlated split drifts);
  *   - q198 cross-split embedding leakage: the q41 LSH candidate
  *     pipeline with each endpoint's split attached, reduced to the
  *     pair-type sheet (train-train / cross / val-val near-duplicate
  *     counts and their similarity tails). q80 catches verbatim
  *     shingle leakage; this catches SEMANTIC leakage — a val doc
  *     whose near-clone trains is an eval number you can't trust
  *     (the SemDedup/contamination argument, split-wise).
  *
  * Both use the md5-keyed PRF split (80/20 on vec_id — the q58
  * convention applied to the vector table) so every cell is
  * oracle-checkable.
  */
object Wave26Queries {

  private val Dim = 64

  /** The keyed-PRF 80/20 split on vec_id, identical in both engines. */
  private def splitCol =
    when(pmod(TextOps.shingleHash60(
      concat(col("vec_id").cast("string"), lit(":mmd"))), lit(10)) < 8,
      "train").otherwise("val")
  private val splitSql =
    """CASE WHEN CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)
       || ':mmd'), 1, 15)) AS BIGINT) % 10 < 8
       THEN 'train' ELSE 'val' END"""

  /** q197 — split-representativeness MMD: per-split exact integer
    * component sums (milli grid) → per-dimension mean gap in double →
    * linear-kernel MMD = Σ gap² over the 64 dims, plus the largest
    * single-dimension gap. The statistic a split review reads next to
    * q80's leakage count: near-zero for a healthy content-hash split,
    * inflated when the split correlates with content (time, source,
    * length). Mean gaps are in milli units, so MMD is in milli² —
    * reported as-is with one round(6).
    *
    * Determinism: component sums are exact integers aggregated
    * order-free; the 64 mean gaps derive one double division each; the
    * MMD fold runs in INDEX ORDER in both engines (Spark aggregate()
    * over the pos-sorted array, DuckDB list ordered by i — the q186
    * fold-order precedent).
    *
    * Scale notes: one posexplode → (split, pos) integer aggregate
    * (2·64 groups, map-side combine) + a 2-row count — the corpus is
    * touched once; everything after is a 1-row projection. */
  private val q197 = GQuery(
    "q197_split_mmd",
    (s, d) => {
      graft.functions.MilliQuant.register(s)
      val e = Io.fanOut(Tables.embeddings(s, d))
        .select(splitCol.as("split"),
          graft.functions.MilliQuant(col("embedding")).as("qv"))
      val sums = e
        .select(col("split"), posexplode(col("qv")).as(Seq("pos", "v")))
        .groupBy(col("split"), col("pos")).agg(sum(col("v")).as("sv"))
        .groupBy(col("split"))
        .agg(expr("transform(sort_array(collect_list(struct(pos, sv))), x -> x.sv)")
          .as("sva"))
      val counts = e.groupBy(col("split")).agg(count(lit(1)).as("n"))
      val tr = sums.filter(col("split") === "train").select(col("sva").as("ta"))
        .crossJoin(broadcast(counts.filter(col("split") === "train")
          .select(col("n").as("n_train"))))
      val va = sums.filter(col("split") === "val").select(col("sva").as("va"))
        .crossJoin(broadcast(counts.filter(col("split") === "val")
          .select(col("n").as("n_val"))))
      tr.crossJoin(broadcast(va))
        .withColumn("ml", zip_with(col("ta"), col("va"),
          (x, y) => x.cast("double") / col("n_train")
            - y.cast("double") / col("n_val")))
        .select(col("n_train"), col("n_val"),
          round(aggregate(col("ml"), lit(0.0), (acc, x) => acc + x * x), 6)
            .as("mmd"),
          round(array_max(transform(col("ml"), x => abs(x))), 6)
            .as("max_dim_gap"))
    },
    Some(s"""WITH e AS (SELECT $splitSql AS split,
                   list_transform(embedding,
                     x -> CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT)) AS qv
                 FROM embeddings),
          s AS (SELECT split, i.i AS i,
                       CAST(sum(qv[CAST(i.i AS INT)]) AS BIGINT) AS sv
                FROM e, range(1, ${Dim + 1}) i(i) GROUP BY split, i.i),
          c AS (SELECT split, count(*) AS n FROM e GROUP BY split),
          m AS (SELECT t.i,
                       CAST(t.sv AS DOUBLE) / ct.n - CAST(v.sv AS DOUBLE) / cv.n AS g
                FROM s t JOIN s v ON t.i = v.i
                     AND t.split = 'train' AND v.split = 'val',
                     c ct, c cv
                WHERE ct.split = 'train' AND cv.split = 'val'),
          ml AS (SELECT list(g ORDER BY i) AS l FROM m)
          SELECT ct.n AS n_train, cv.n AS n_val,
                 round(list_sum(list_transform(l, x -> x * x)), 6) AS mmd,
                 round(list_max(list_transform(l, x -> abs(x))), 6)
                   AS max_dim_gap
          FROM ml, c ct, c cv
          WHERE ct.split = 'train' AND cv.split = 'val'""")
  )

  /** q198 — cross-split semantic leakage: the q41 embedding-LSH
    * near-duplicate pipeline (same adaptive band geometry, same bucket
    * caps, same exact-cosine verify at ≥ 0.25) with the PRF split
    * attached to both endpoints, reduced per pair type. The `cross`
    * row is the eval-contamination count — near-clones straddling the
    * train/val boundary; n_high (sim ≥ 0.9) is the you-cannot-trust-
    * this-eval tail. Within-split duplication (the other two rows) is
    * the q41/q60 problem, reported for contrast.
    *
    * Determinism: the q41 kernel end-to-end (rounded sims, canonical
    * pair order); pair typing and counts exact; max_sim is a max over
    * already-rounded values.
    *
    * Scale notes: identical to q41 (bucketed LSH, adaptive band bits,
    * capped buckets, never all-pairs) plus one |pairs|-sized map and a
    * 3-group aggregate. Cites q41 at VectorQueries.scala:212. */
  private val q198 = GQuery(
    "q198_split_leakage_semantic",
    (s, d) => {
      CosineSim.register(s)
      val emb = Tables.embeddings(s, d)
      val n = emb.count()
      val bits = Geometry.adaptiveBits(n, 3, VectorQueries.LshBits, 24)
      graft.functions.LshBands.register(
        s, VectorQueries.LshBandCount, bits, VectorQueries.LshDim)
      val pairs = Io.fanOut(emb)
        .select(col("vec_id"),
          posexplode(graft.functions.LshBands(col("embedding")))
            .as(Seq("band", "bh")))
        .groupBy(col("band"), col("bh"))
        .agg(sort_array(collect_list(col("vec_id"))).as("docs"))
        .filter(size(col("docs")).between(2, VectorQueries.LshBucketCap))
        .select(explode(TextOps.orderedPairs(col("docs"))).as("p"))
        .select(col("p.d1").as("v1"), col("p.d2").as("v2"))
        .distinct()
      val ea = emb.select(col("vec_id").as("v1"), col("embedding").as("ea"))
      val eb = emb.select(col("vec_id").as("v2"), col("embedding").as("eb"))
      def sp(c: org.apache.spark.sql.Column) =
        when(pmod(TextOps.shingleHash60(
          concat(c.cast("string"), lit(":mmd"))), lit(10)) < 8,
          "train").otherwise("val")
      eb.join(ea.join(pairs, Seq("v1")), Seq("v2"))
        .select(col("v1"), col("v2"),
          round(CosineSim(col("ea"), col("eb")), 4).as("sim"))
        .filter(col("sim") >= 0.25)
        .withColumn("s1", sp(col("v1"))).withColumn("s2", sp(col("v2")))
        .withColumn("pair_type",
          when(col("s1") === col("s2"), concat(col("s1"), lit("-"), col("s2")))
            .otherwise(lit("cross")))
        .groupBy(col("pair_type"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("sim") >= 0.9, 1L).otherwise(0L)).as("n_high"),
          max(col("sim")).as("max_sim"))
        .orderBy(col("pair_type"))
    },
    Some(s"""WITH bc AS (SELECT ${Geometry.adaptiveBitsSql("count(*)", 3,
                   VectorQueries.LshBits, 24)} AS bits
                   FROM embeddings),
             wm AS (SELECT j.j AS j, i.i AS i,
                   CASE WHEN (CAST(concat('0x', substr(md5(j.j || '|' || i.i), 1, 15)) AS BIGINT) & 1) = 1
                        THEN 1.0 ELSE -1.0 END AS w
                   FROM range(0, ${VectorQueries.LshBandCount * 24}) j(j),
                        range(1, ${VectorQueries.LshDim + 1}) i(i), bc
                   WHERE j.j < ${VectorQueries.LshBandCount} * bc.bits),
             ev AS (SELECT vec_id, i.i AS i, CAST(embedding[i.i] AS DOUBLE) AS x
                    FROM embeddings, range(1, ${VectorQueries.LshDim + 1}) i(i)),
             dots AS (SELECT e.vec_id, w.j, sum(w.w * e.x) AS dot,
                             sum(e.x * e.x) AS nx, sum(w.w * w.w) AS nw
                      FROM ev e JOIN wm w ON e.i = w.i
                      GROUP BY e.vec_id, w.j),
             bits AS (SELECT vec_id, j // bc.bits AS band, j % bc.bits AS b,
                             CASE WHEN round(dot / (sqrt(nx) * sqrt(nw)), 6) >= 0 THEN 1 ELSE 0 END AS bit
                      FROM dots, bc),
             sig AS (SELECT vec_id, band, CAST(sum(bit << b) AS INTEGER) AS bh
                     FROM bits GROUP BY vec_id, band),
             ok AS (SELECT band, bh FROM sig GROUP BY band, bh
                    HAVING count(*) BETWEEN 2 AND ${VectorQueries.LshBucketCap}),
             cand AS (SELECT DISTINCT a.vec_id AS v1, b.vec_id AS v2
                      FROM sig a JOIN sig b ON a.band = b.band AND a.bh = b.bh AND a.vec_id < b.vec_id
                      JOIN ok o ON a.band = o.band AND a.bh = o.bh),
             pe AS (SELECT c.v1, c.v2, ea.embedding AS ea, eb.embedding AS eb
                    FROM cand c JOIN embeddings ea ON c.v1 = ea.vec_id
                                JOIN embeddings eb ON c.v2 = eb.vec_id),
             sm AS (SELECT v1, v2,
                          sum(CAST(ea[i.i] AS DOUBLE) * CAST(eb[i.i] AS DOUBLE)) AS dot,
                          sum(CAST(ea[i.i] AS DOUBLE) ** 2) AS na,
                          sum(CAST(eb[i.i] AS DOUBLE) ** 2) AS nb
                   FROM pe, range(1, ${VectorQueries.LshDim + 1}) i(i) GROUP BY v1, v2),
             sims AS (SELECT v1, v2, round(dot / (sqrt(na) * sqrt(nb)), 4) AS sim
                      FROM sm WHERE round(dot / (sqrt(na) * sqrt(nb)), 4) >= 0.25),
             typed AS (SELECT sim,
                       CASE WHEN s1 = s2 THEN s1 || '-' || s2 ELSE 'cross' END AS pair_type
                       FROM (SELECT sim,
                               ${splitSql.replace("vec_id", "v1")} AS s1,
                               ${splitSql.replace("vec_id", "v2")} AS s2
                             FROM sims))
             SELECT pair_type, count(*) AS n_pairs,
                    CAST(sum(CASE WHEN sim >= 0.9 THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
                    max(sim) AS max_sim
             FROM typed GROUP BY pair_type ORDER BY pair_type""")
  )

  val all: Seq[GQuery] = Seq(q197, q198)
}
