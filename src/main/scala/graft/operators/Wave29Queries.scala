package graft.operators

import graft.GQuery
import graft.sources.Tables
import graft.util.Geometry
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-12 wave 29: the composed production ANN index — IVFADC (Jégou
  * et al. 2011, "Product Quantization for Nearest Neighbor Search",
  * §IV): a coarse quantizer prunes WHICH cells a query scans (q37's
  * IVF idea on the exact milli-integer grid) and product quantization
  * on the cell RESIDUALS compresses WHAT the scan reads (q191/q192's
  * codes, trained on r = v − centroid(cell) so the codes spend their
  * bits on the part the coarse quantizer missed) —
  *
  *   - q202 the probed search itself: nprobe nearest cells by exact
  *     integer L2, ADC over residual codes inside them, top-k priced
  *     against the exact distance on the same rows;
  *   - q203 the joint recall audit: for a hash-regular query sample,
  *     exact top-10 vs IVFADC top-10, with every miss ATTRIBUTED —
  *     cell miss (the true neighbour's cell was not probed; the
  *     nprobe dial) vs quantization miss (probed, but the M×8-bit
  *     codes mis-ranked it; the M·K dial) — the sheet that says which
  *     knob to turn, completing the q173 (IVF-only) / q201 (PQ-only)
  *     price-the-approximation pair.
  *
  * Everything rides the wave-24 kernels: same milli grid, same
  * exact-integer Lloyd (trainBooksOn — on residuals here), same
  * withCodes encoder, same lowest-id tie-breaks, so all distances are
  * exact integers and DuckDB reconstructs every code bit-for-bit.
  */
object Wave29Queries {

  import Wave24Queries.{Dim, PqM, PqS}

  private val Nprobe = 2
  private val IvfFloor = 16
  private val IvfCap = 32768
  private val TopK = 10
  private val AudModFloor = 50L
  private val AudTargetLog2 = 5

  /** Exact integer squared L2 between two long-array columns. */
  private def l2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, x) => acc + x)

  private def l2SeqSql(a: String, b: String, dim: Int): String =
    s"""list_sum(list_transform(range(1, ${dim + 1}),
        i -> ($a[CAST(i AS INT)] - $b[CAST(i AS INT)])
           * ($a[CAST(i AS INT)] - $b[CAST(i AS INT)])))"""

  /** Coarse-assign + residual projection, map-only: nearest centroid
    * by exact integer L2 (ties to the lowest cid) against the ONE-row
    * broadcast centroid array, residual = elementwise difference.
    * Output: (vec_id, fqv = full milli vector, cid, qv = residual).
    * SHARED between the batch index build and the s32 ingest stream —
    * one kernel, so stream and batch can never disagree. */
  private[graft] def assignResiduals(vecs: DataFrame, centsArr: DataFrame)
      : DataFrame =
    vecs.crossJoin(broadcast(centsArr))
      .withColumn("best", array_min(transform(col("cents"), c =>
        struct(l2(col("qv"), c.getField("cvec")).as("dist"),
          c.getField("cid").as("cid"), c.getField("cvec").as("cvec")))))
      .drop("cents")
      .select(col("vec_id"), col("qv").as("fqv"),
        col("best").getField("cid").as("cid"),
        zip_with(col("qv"), col("best").getField("cvec"),
          (a, b) => a - b).as("qv"))

  /** Collapse a driver-held coarse codebook into the 1-row broadcastable
    * `cents` array [[assignResiduals]] consumes (the VectorOps
    * centroidArray shape, built from the published model — the s32
    * ingest path, where the codebook arrives as a model artifact, not a
    * corpus derivation). */
  private[graft] def centroidArrayDf(s: SparkSession,
      cents: Seq[(Long, IndexedSeq[Long])]): DataFrame = {
    import s.implicits._
    cents.map { case (c, v) => (c, v) }.toDF("cid", "cvec")
      .agg(sort_array(collect_list(struct(col("cid"), col("cvec")))).as("cents"))
  }

  /** The built index: the coded corpus plan (vec_id, fqv = full milli
    * vector, cid = coarse cell, qv = residual, codes), the residual PQ
    * books, and the coarse centroids (driver copy — the codebook IS
    * the model, Bc·Dim longs). */
  private[graft] final case class Index(
      coded: DataFrame,
      books: IndexedSeq[Seq[(Long, IndexedSeq[Long])]],
      cents: IndexedSeq[(Long, IndexedSeq[Long])])

  /** Build the IVFADC index plan: coarse centroids = the Bc md5-free
    * first vectors (the q37 convention — B ≈ √n via adaptiveCodebook,
    * so per-cell scan cost tracks √n at every scale), assignment
    * map-only against the ONE-row broadcast centroid array (ties to
    * the lowest cid), residual = exact integer elementwise difference,
    * PQ books = the wave-24 Lloyd chain trained ON the residuals.
    *
    * Scale notes: build = three corpus passes (assign+residual map-only;
    * the Lloyd update's bounded-state aggregate; the encode map-only) —
    * the q191 budget plus one subtraction; at 100 TB the coded index
    * lands partitioned by cid, so a probed search reads nprobe
    * partitions and nothing else. */
  private[graft] def buildIndex(s: SparkSession, d: String): Option[Index] = {
    val n = Tables.embeddings(s, d).count()
    if (n == 0) return None
    val bc = Geometry.adaptiveCodebook(n, IvfFloor, IvfCap)
    val vecs = Wave24Queries.qvecs(s, d)
    val centsDf = vecs.filter(col("vec_id") < bc)
      .select(col("vec_id").as("cid"), col("qv").as("cvec"))
    val centsArr = centsDf
      .agg(sort_array(collect_list(struct(col("cid"), col("cvec")))).as("cents"))
    val assigned = assignResiduals(vecs, centsArr)
    val books = Wave24Queries.trainBooksOn(
      assigned.select(col("vec_id"), col("qv")))
    if (books.isEmpty) return None
    // packed ADC keys below put cid in a 10^5 slot and (m, c) in 10^2
    // slots — collisions corrupt distances silently, so guard the
    // envelope (cap 32768 keeps cid inside it by construction)
    require(bc <= 100000 && PqM <= 100 &&
      books.forall(_.forall(b => b._1 >= 0 && b._1 < 100)),
      "IVFADC key packing needs cid < 10^5, m < 100, 0 <= code < 100")
    val cents = centsDf.collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toIndexedSeq))
      .sortBy(_._1).toIndexedSeq
    Some(Index(Wave24Queries.withCodes(assigned, books), books, cents))
  }

  /** nprobe nearest coarse cells to `q` by exact integer L2, ties to
    * the lowest cid — driver-side over the model-sized centroid copy. */
  private def probeCells(idx: Index, q: IndexedSeq[Long])
      : IndexedSeq[(Long, IndexedSeq[Long])] =
    idx.cents.sortBy { case (cid, cv) =>
      (cv.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum, cid)
    }.take(Nprobe)

  /** ADC table entries for query `q` against the probed cells: the
    * query's per-cell RESIDUAL subvectors scored against the residual
    * books — key = ((prefix·10^5 + cid)·10^2 + m)·10^2 + c. */
  private def adcEntries(idx: Index, q: IndexedSeq[Long], prefix: Long,
      probed: Seq[(Long, IndexedSeq[Long])]): Map[Long, Long] =
    probed.flatMap { case (cid, cv) =>
      val rq = q.zip(cv).map { case (a, b) => a - b }
      (0 until PqM).flatMap { m =>
        val qs = rq.slice(m * PqS, (m + 1) * PqS)
        idx.books(m).map { case (c, bv) =>
          (((prefix * 100000L + cid) * 100L + m) * 100L + c) ->
            qs.zip(bv).map { case (a, b) => (a - b) * (a - b) }.sum
        }
      }
    }.toMap

  private def adcDistCol(adcMap: Column, prefix: Column): Column =
    (0 until PqM).map { m =>
      element_at(adcMap,
        ((prefix * 100000L + col("cid")) * 100L + m) * 100L
          + element_at(col("codes"), m + 1))
    }.reduce(_ + _)

  /** Shared oracle prefix: milli grid `em` → adaptive codebook size →
    * coarse cells → assignment (lowest-cid ties) → residual relation
    * `e` feeding the wave-24 Lloyd chain (books c1 + final codes a2,
    * both ON RESIDUALS). The assignment window (a0g) deliberately
    * projects ONLY (vec_id, cid): dragging the 512-byte cvec payload
    * through the n·Bc window intermediate is what OOM'd DuckDB on the
    * r12 sf1 pass — the centroid vector joins back from the Bc-row
    * cents relation afterwards. */
  private val IvfadcSql: String =
    s"""WITH em AS MATERIALIZED (SELECT vec_id, list_transform(embedding,
                      x -> CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT)) AS qv
                    FROM embeddings),
        bsz AS (SELECT ${Geometry.adaptiveCodebookSql("count(*)", IvfFloor, IvfCap)}
                  AS b FROM embeddings),
        cents AS (SELECT vec_id AS cid, qv AS cvec FROM em, bsz
                  WHERE vec_id < bsz.b),
        a0g AS MATERIALIZED (SELECT vec_id, cid FROM (
                  SELECT em.vec_id, c.cid,
                         row_number() OVER (PARTITION BY em.vec_id
                           ORDER BY ${l2SeqSql("em.qv", "c.cvec", Dim)}, c.cid) AS rn
                  FROM em, cents c) WHERE rn = 1),
        asg AS MATERIALIZED (SELECT a.vec_id, a.cid, c.cvec
                FROM a0g a JOIN cents c USING (cid)),
        e AS MATERIALIZED (SELECT a.vec_id, list_transform(range(1, ${Dim + 1}),
                i -> a0.qv[CAST(i AS INT)] - a.cvec[CAST(i AS INT)]) AS qv
              FROM asg a JOIN em a0 USING (vec_id)),
        ${Wave24Queries.PqChainFromE}"""

  /** The per-(query, cell) ADC-table SQL body: the query's residual in
    * the probed cell scored against book entry (m, c). */
  private def adctSql(qqv: String, cvec: String): String =
    s"""list_sum(list_transform(range(1, ${PqS + 1}),
        i -> (($qqv[CAST(c1.m*$PqS + i AS INT)] - $cvec[CAST(c1.m*$PqS + i AS INT)])
               - c1.cv[CAST(i AS INT)])
           * (($qqv[CAST(c1.m*$PqS + i AS INT)] - $cvec[CAST(c1.m*$PqS + i AS INT)])
               - c1.cv[CAST(i AS INT)])))"""

  /** q202 — IVFADC probed search: the query (vec_id 0, the family's
    * fixed probe) walks nprobe = 2 nearest coarse cells and ADC-scores
    * ONLY the residual codes inside them — M table lookups per
    * candidate row, no vector arithmetic in the scan — returning the
    * top-10 with the exact distance alongside (the q173/q192
    * price-the-approximation discipline: the quantization error of the
    * ranking is visible on the sheet).
    *
    * Scale notes (100 TB): the scan touches nprobe cells ≈ nprobe·n/Bc
    * rows (Bc ≈ √n), reads M bytes of codes per row instead of Dim·4,
    * and the per-query state (nprobe·M·K ADC entries + the probed cell
    * ids) is literal-sized; top-k merges per-partition heaps
    * (TakeOrderedAndProject). Together: ~64× narrower rows × ~√n/2
    * fewer of them than q192's flat ADC scan. */
  private val q202 = GQuery(
    "q202_ivfadc_search",
    (s, d) => {
      val idxOpt = buildIndex(s, d)
      val qrow = idxOpt.flatMap(_ => Wave24Queries.qvecs(s, d)
        .filter(col("vec_id") === 0)
        .collect().headOption.map(_.getSeq[Long](1).toIndexedSeq))
      (idxOpt, qrow) match {
        case (Some(idx), Some(q)) =>
          val probed = probeCells(idx, q)
          val adcMap = typedLit(adcEntries(idx, q, 0L, probed))
          idx.coded
            .filter(col("cid").isin(probed.map(_._1): _*)
              && col("vec_id") =!= 0)
            .select(col("vec_id"), col("cid"),
              adcDistCol(adcMap, lit(0L)).as("adc_dist"),
              l2(col("fqv"), typedLit(q)).as("exact_dist"))
            .orderBy(col("adc_dist"), col("vec_id"))
            .limit(TopK)
        case _ =>
          Wave24Queries.qvecs(s, d).select(col("vec_id"),
            col("vec_id").as("cid"), col("vec_id").as("adc_dist"),
            col("vec_id").as("exact_dist")).limit(0)
      }
    },
    Some(IvfadcSql +
      s""", q AS (SELECT qv FROM em WHERE vec_id = 0),
          probe AS (SELECT cid, cvec FROM cents, q
                    ORDER BY ${l2SeqSql("cvec", "q.qv", Dim)}, cid LIMIT $Nprobe),
          adct AS (SELECT p.cid, c1.m, c1.c,
                     ${adctSql("q.qv", "p.cvec")} AS ad
                   FROM c1, probe p, q),
          scored AS (SELECT a2.vec_id, g.cid,
                       CAST(sum(t.ad) AS BIGINT) AS adc_dist
                     FROM a2 JOIN asg g USING (vec_id)
                     JOIN adct t ON t.cid = g.cid AND t.m = a2.m AND t.c = a2.c
                     WHERE a2.vec_id <> 0
                     GROUP BY a2.vec_id, g.cid),
          exd AS (SELECT em2.vec_id,
                    CAST(${l2SeqSql("em2.qv", "q.qv", Dim)} AS BIGINT) AS exact_dist
                  FROM em em2, q WHERE em2.vec_id <> 0)
          SELECT s.vec_id, s.cid, s.adc_dist, exd.exact_dist
          FROM scored s JOIN exd USING (vec_id)
          ORDER BY s.adc_dist, s.vec_id LIMIT $TopK""")
  )

  /** q203 — joint IVFADC recall audit: for the hash-regular query
    * sample (adaptiveSampleMod, Q ≈ 2^5 at any corpus size), compare
    * the exact integer-L2 top-10 against the IVFADC top-10 and
    * ATTRIBUTE every miss: `cell_misses` (the true neighbour's cell
    * was outside the nprobe probe set — turn the nprobe dial) vs
    * `quant_misses` (probed, but the residual codes mis-ranked it out
    * of the top-10 — turn the M·K dial). q173 prices the cell pruning
    * alone, q201 the quantization alone; this is the composition a
    * production index actually serves, priced jointly.
    *
    * Scale notes: every pass is a map-only broadcast crossJoin over
    * the corpus that reduces immediately — the exact baseline and the
    * candidate ranking both carry literal rank ≤ 10 filters (map-side
    * WindowGroupLimit heaps, the q201 discipline); candidate rows are
    * pre-filtered to the query's probed cells by a Q-entry literal map
    * BEFORE any scoring; nothing Q·n is ever materialized and the
    * corpus never shuffles. Driver state: Q·nprobe·M·K ADC entries +
    * Q probe lists — model-sized. */
  private val q203 = GQuery(
    "q203_ivfadc_recall",
    (s, d) => {
      val idxOpt = buildIndex(s, d)
      idxOpt match {
        case Some(idx) =>
          val coded = idx.coded
          val n = Tables.embeddings(s, d).count()
          val mod = Geometry.adaptiveSampleMod(n, AudModFloor, AudTargetLog2)
          val queries = Wave24Queries.qvecs(s, d)
            .filter(col("vec_id") % mod === 0)
            .select(col("vec_id").as("q_id"), col("qv").as("qqv"))
          val qrows = queries.collect()
            .map(r => (r.getLong(0), r.getSeq[Long](1).toIndexedSeq))
          require(qrows.length < 100000 && qrows.forall(_._1 >= 0),
            "ADC key packing needs sample index < 10^5 and qid >= 0")
          val probes = qrows.map { case (qid, q) => qid -> probeCells(idx, q) }
          val idxOf = probes.map(_._1).zipWithIndex
            .map { case (q, i) => q -> i.toLong }.toMap
          val adcMap = typedLit(qrows.flatMap { case (qid, q) =>
            adcEntries(idx, q, idxOf(qid),
              probes.find(_._1 == qid).get._2)
          }.toMap)
          val idxLit = typedLit(idxOf)
          val probeLit = typedLit(
            probes.map { case (q, cs) => q -> cs.map(_._1) }.toMap)
          val isCand = array_contains(
            element_at(probeLit, col("q_id")), col("cid"))
          // candidate pass: probed-cell rows only, ADC-scored, top-10
          // per query via group-limit heaps
          val wAdc = org.apache.spark.sql.expressions.Window
            .partitionBy(col("q_id")).orderBy(col("adc"), col("nbr"))
          val adcTop = coded.crossJoin(broadcast(queries))
            .filter(col("vec_id") =!= col("q_id") && isCand)
            .select(col("q_id"), col("vec_id").as("nbr"),
              adcDistCol(adcMap, element_at(idxLit, col("q_id"))).as("adc"))
            .withColumn("ark", row_number().over(wAdc))
            .filter(col("ark") <= TopK)
            .select(col("q_id"), col("nbr"))
          // exact baseline: full corpus, top-10 per query, each row
          // tagged with whether its cell was probed
          val wEx = org.apache.spark.sql.expressions.Window
            .partitionBy(col("q_id")).orderBy(col("ex"), col("nbr"))
          val exTop = coded.crossJoin(broadcast(queries))
            .filter(col("vec_id") =!= col("q_id"))
            .select(col("q_id"), col("vec_id").as("nbr"),
              l2(col("fqv"), col("qqv")).as("ex"),
              isCand.cast("long").as("in_probe"))
            .withColumn("xrk", row_number().over(wEx))
            .filter(col("xrk") <= TopK)
            .select(col("q_id"), col("nbr"), col("in_probe"))
          val exAgg = exTop.groupBy(col("q_id"))
            .agg(count(lit(1)).as("n_ex"), sum(col("in_probe")).as("n_cand"))
          val hits = exTop.join(adcTop, Seq("q_id", "nbr"))
            .groupBy(col("q_id")).agg(count(lit(1)).as("h"))
          queries.select(col("q_id"))
            .join(exAgg, Seq("q_id"), "left")
            .join(hits, Seq("q_id"), "left")
            .agg(count(lit(1)).as("n_queries"),
              coalesce(sum(col("n_ex")), lit(0L)).as("exact_top10_rows"),
              coalesce(sum(col("h")), lit(0L)).as("recall10_hits"),
              coalesce(sum(col("n_ex") - col("n_cand")), lit(0L))
                .as("cell_misses"),
              (coalesce(sum(col("n_cand")), lit(0L))
                - coalesce(sum(col("h")), lit(0L))).as("quant_misses"))
            .withColumn("recall_ppm",
              expr("CASE WHEN exact_top10_rows > 0 THEN " +
                "recall10_hits * 1000000 DIV exact_top10_rows ELSE 0 END"))
        case None =>
          Wave24Queries.qvecs(s, d).select(
            col("vec_id").as("n_queries"), col("vec_id").as("exact_top10_rows"),
            col("vec_id").as("recall10_hits"), col("vec_id").as("cell_misses"),
            col("vec_id").as("quant_misses"), col("vec_id").as("recall_ppm"))
            .limit(0)
      }
    },
    Some(IvfadcSql +
      s""", qmod AS (SELECT ${Geometry.adaptiveSampleModSql("count(*)",
             AudModFloor, AudTargetLog2)} AS m FROM embeddings),
          qs AS MATERIALIZED (SELECT vec_id AS q_id, qv AS qqv
                 FROM em, qmod WHERE vec_id % qmod.m = 0),
          qprobe AS (SELECT q_id, cid, cvec FROM (
                       SELECT qs.q_id, c.cid, c.cvec,
                              row_number() OVER (PARTITION BY qs.q_id
                                ORDER BY ${l2SeqSql("c.cvec", "qs.qqv", Dim)},
                                         c.cid) AS rn
                       FROM cents c, qs) WHERE rn <= $Nprobe),
          adct AS (SELECT p.q_id, p.cid, c1.m, c1.c,
                     ${adctSql("qs.qqv", "p.cvec")} AS ad
                   FROM c1, qprobe p JOIN qs USING (q_id)),
          scored AS MATERIALIZED (SELECT t.q_id, a2.vec_id AS nbr,
                       CAST(sum(t.ad) AS BIGINT) AS adc
                     FROM a2 JOIN asg g USING (vec_id)
                     JOIN adct t ON t.cid = g.cid AND t.m = a2.m AND t.c = a2.c
                     WHERE a2.vec_id <> t.q_id
                     GROUP BY t.q_id, a2.vec_id),
          ar AS (SELECT q_id, nbr FROM (
                   SELECT q_id, nbr,
                          row_number() OVER (PARTITION BY q_id
                            ORDER BY adc, nbr) AS ark
                   FROM scored) WHERE ark <= $TopK),
          exd AS MATERIALIZED (SELECT qs.q_id, em2.vec_id AS nbr, g.cid,
                    CAST(${l2SeqSql("em2.qv", "qs.qqv", Dim)} AS BIGINT) AS ex
                  FROM em em2 JOIN asg g ON em2.vec_id = g.vec_id, qs
                  WHERE em2.vec_id <> qs.q_id),
          xt AS (SELECT q_id, nbr, cid FROM (
                   SELECT q_id, nbr, cid,
                          row_number() OVER (PARTITION BY q_id
                            ORDER BY ex, nbr) AS xrk
                   FROM exd) WHERE xrk <= $TopK),
          xc AS (SELECT xt.q_id, xt.nbr,
                   CASE WHEN EXISTS (SELECT 1 FROM qprobe p
                     WHERE p.q_id = xt.q_id AND p.cid = xt.cid)
                     THEN 1 ELSE 0 END AS in_probe
                 FROM xt),
          h AS (SELECT count(*) AS hits FROM xt JOIN ar USING (q_id, nbr))
          SELECT (SELECT count(*) FROM qs) AS n_queries,
                 (SELECT count(*) FROM xc) AS exact_top10_rows,
                 (SELECT hits FROM h) AS recall10_hits,
                 (SELECT count(*) FROM xc WHERE in_probe = 0) AS cell_misses,
                 (SELECT count(*) FROM xc WHERE in_probe = 1)
                   - (SELECT hits FROM h) AS quant_misses,
                 CASE WHEN (SELECT count(*) FROM xc) > 0 THEN
                   (SELECT hits FROM h) * 1000000 // (SELECT count(*) FROM xc)
                 ELSE 0 END AS recall_ppm""")
  )

  val all: Seq[GQuery] = Seq(q202, q203)
}
