package graft.operators

import graft.GQuery
import graft.sources.{Io, Tables}
import graft.util.Geometry
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-12 wave 29 (re-architected in round 13): the composed
  * production ANN index — IVFADC (Jégou et al. 2011, "Product
  * Quantization for Nearest Neighbor Search", §IV): a coarse quantizer
  * prunes WHICH cells a query scans (q37's IVF idea on the exact
  * milli-integer grid) and product quantization on the cell RESIDUALS
  * compresses WHAT the scan reads (q191/q192's codes, trained on
  * r = v − centroid(cell) so the codes spend their bits on the part the
  * coarse quantizer missed) —
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
  * Round-13 re-architecture (r12 verdict tasks 1–2) — the coarse stage
  * no longer has a corpus-scale ceiling:
  *
  *   - coarse ASSIGNMENT is a broadcast-join + min_by aggregate over
  *     the centroid RELATION ([[assignResiduals]]) — centroids never
  *     collapse into a single array row or a driver literal, so Bc is
  *     bounded only by [[IvfCap]] (2^20 cells ≈ n = 10^12 vectors
  *     under the √n geometry), not by row-size/literal limits;
  *   - query PROBING and the per-query ADC tables are DISTRIBUTED
  *     ([[qMeta]]): queries broadcast against the centroid relation,
  *     nprobe cells per query via a WindowGroupLimit heap, ADC entries
  *     from a join with the M·K-row book relation, bundled into ONE
  *     struct-keyed map column per query — no driver-side probe loop,
  *     no packed-decimal keys (the r12 `cid < 10^5` require is gone);
  *   - the ADC scan looks each candidate row up in its own query's
  *     map column via struct keys (cid, m, code) — M lookups per row,
  *     exactly the q192 contract, with no global Q-indexed literal;
  *   - the built index is MATERIALIZED once per (session, scale) and
  *     shared ([[servingIndex]]): q202 always rebuilds (it PRICES the
  *     build honestly); q203/q211 read the standing artifact, which is
  *     what a serving audit does — the s32 ingest encoder already
  *     defines the artifact shape (cid-partitioned coded rows + model
  *     sidecar), and the cache is its single-JVM stand-in
  *     (repartition(cid) + eager localCheckpoint).
  *
  * Everything rides the wave-24 kernels: same milli grid, same
  * exact-integer Lloyd (trainBooksOn — on residuals here), same
  * withCodes encoder, same lowest-id tie-breaks, so all distances are
  * exact integers and DuckDB reconstructs every code bit-for-bit.
  */
object Wave29Queries {

  import Wave24Queries.{Dim, PqK, PqM, PqS}

  private[operators] val Nprobe = 2
  private[operators] val IvfFloor = 16
  /** Coarse-cell cap: 2^20 cells. Under the √n adaptiveCodebook
    * geometry this binds at n ≈ 10^12 vectors (≈ 0.25 PB of raw fp32
    * at Dim 64) — past the 100 TB design point. The r12 cap of 32768
    * existed only for the now-removed decimal ADC key packing. */
  private[graft] val IvfCap = 1 << 20
  private[operators] val TopK = 10
  private[operators] val AudModFloor = 50L
  private[operators] val AudTargetLog2 = 5

  /** Exact integer squared L2 between two long-array columns — the
    * fused native kernel (r16: the aggregate(zip_with) form was
    * interpreted per element; callers must VecDist.register first,
    * which every builder/helper with session access does). */
  private[operators] def l2(a: Column, b: Column): Column =
    graft.functions.VecDist.l2sq(a, b)

  private def l2SeqSql(a: String, b: String, dim: Int): String =
    s"""list_sum(list_transform(range(1, ${dim + 1}),
        i -> ($a[CAST(i AS INT)] - $b[CAST(i AS INT)])
           * ($a[CAST(i AS INT)] - $b[CAST(i AS INT)])))"""

  /** Coarse-assign + residual projection against the centroid RELATION
    * (cid, cvec): broadcast-join every vector with the Bc centroids,
    * nearest cell via a min_by aggregate keyed (dist, cid) — exact
    * integer L2, ties to the lowest cid — then the vector and its
    * winning centroid join BACK onto the slim (vec_id, cid) assignment
    * for the residual = elementwise difference. Output: (vec_id,
    * fqv = full milli vector, cid, qv = residual).
    *
    * Scale notes: the n·Bc expansion carries 24-BYTE rows only
    * (vec_id, cid, dist — the distance is computed in the join
    * projection and the vector dropped immediately), so the hot path
    * moves ~40× less data than carrying the vector through the
    * aggregate; the vector payload travels exactly once, through the
    * n-row assignment join, and the winning centroid re-enters via a
    * map-only broadcast hash join. The centroids stay a DataFrame end
    * to end — no single-row array, no driver collect, no literal — so
    * the only Bc bound is the broadcast size itself (Bc·Dim·8 bytes
    * ≈ 0.5 GB at the 2^20 cap). Deterministic: the min_by key
    * (dist, cid) is unique per candidate. */
  private[graft] def assignResiduals(vecs: DataFrame, cents: DataFrame)
      : DataFrame = {
    graft.functions.VecDist.register(vecs.sparkSession)
    val asg = vecs.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cid"),
        l2(col("qv"), col("cvec")).as("dist"))
      .groupBy(col("vec_id"))
      .agg(min_by(col("cid"), struct(col("dist"), col("cid"))).as("cid"))
    asg.join(vecs, Seq("vec_id"))
      .join(broadcast(cents), Seq("cid"))
      .select(col("vec_id"), col("qv").as("fqv"), col("cid"),
        zip_with(col("qv"), col("cvec"), (a, b) => a - b).as("qv"))
  }

  /** Map-only serving-encoder variant of [[assignResiduals]] for the
    * s32 ingest stream, against a ONE-row broadcast centroid array
    * (streaming append mode cannot aggregate, so the min_by form is a
    * batch-only shape): array_min over per-centroid (dist, cid, cvec)
    * structs — identical semantics, StreamingSpec asserts the drained
    * rows equal the batch index bit-for-bit. The array row bounds Bc at
    * the serving encoder (~2^21 cells at Dim 64 under the 2 GB row
    * limit); a stream encoder past that shards the centroid array by
    * cid range — same kernel per shard, outside fixture scope. */
  private[graft] def assignResidualsServing(vecs: DataFrame,
      centsArr: DataFrame): DataFrame = {
    graft.functions.VecDist.register(vecs.sparkSession)
    vecs.crossJoin(broadcast(centsArr))
      .withColumn("best", array_min(transform(col("cents"), c =>
        struct(l2(col("qv"), c.getField("cvec")).as("dist"),
          c.getField("cid").as("cid"), c.getField("cvec").as("cvec")))))
      .drop("cents")
      .select(col("vec_id"), col("qv").as("fqv"),
        col("best").getField("cid").as("cid"),
        zip_with(col("qv"), col("best").getField("cvec"),
          (a, b) => a - b).as("qv"))
  }

  /** Collapse a driver-held coarse codebook into the 1-row broadcastable
    * `cents` array [[assignResidualsServing]] consumes (the s32 ingest
    * path, where the codebook arrives as a published model artifact,
    * not a corpus derivation). */
  private[graft] def centroidArrayDf(s: SparkSession,
      cents: Seq[(Long, IndexedSeq[Long])]): DataFrame = {
    import s.implicits._
    cents.map { case (c, v) => (c, v) }.toDF("cid", "cvec")
      .agg(sort_array(collect_list(struct(col("cid"), col("cvec")))).as("cents"))
  }

  /** The built index: the coded corpus (vec_id, fqv = full milli
    * vector, cid = coarse cell, qv = residual, codes), the residual PQ
    * books (driver copy — M·K·S longs, the model), the coarse centroid
    * RELATION (cid, cvec — stays distributed), and the cell count. */
  private[graft] final case class Index(
      coded: DataFrame,
      books: IndexedSeq[Seq[(Long, IndexedSeq[Long])]],
      cents: DataFrame,
      bc: Int)

  /** Build the IVFADC index: coarse centroids = the Bc first vectors
    * (the q37 convention — Bc ≈ √n via adaptiveCodebook, so per-cell
    * scan cost tracks √n at every scale; q211 audits the resulting
    * occupancy), assignment via [[assignResiduals]], residual PQ books
    * = the wave-24 Lloyd chain trained ON the residuals.
    *
    * Scale notes: the assignment output is materialized ONCE
    * (localCheckpoint — the Lloyd train reads it twice and the encode
    * once, and each re-read of the raw plan would repay the n·Bc
    * distance pass); build = one assignment pass + the bounded-state
    * Lloyd aggregate + the map-only encode. At 100 TB the coded index
    * lands partitioned by cid ([[servingIndex]]), so a probed search
    * reads nprobe partitions and nothing else. */
  private[graft] def buildIndex(s: SparkSession, d: String): Option[Index] = {
    val n = Tables.embeddings(s, d).count()
    if (n == 0) return None
    val bc = Geometry.adaptiveCodebook(n, IvfFloor, IvfCap)
    val vecs = Wave24Queries.qvecs(s, d)
    val cents = vecs.filter(col("vec_id") < bc)
      .select(col("vec_id").as("cid"), col("qv").as("cvec"))
    val assigned = Io.materialize(assignResiduals(vecs, cents))
    val books = Wave24Queries.trainBooksOn(
      assigned.select(col("vec_id"), col("qv")))
    if (books.isEmpty) return None
    Some(Index(Wave24Queries.withCodes(assigned, books), books, cents, bc))
  }

  /** One standing index per (Spark application, scale dir): built once,
    * repartitioned by cid (the production partitionBy(cid) parquet
    * layout, single-JVM stand-in) and eagerly materialized; q203/q211
    * consume it — the serving/audit side reads the artifact, it does
    * not rebuild the index per query — while q202 keeps calling
    * [[buildIndex]] directly so ONE query in the registry continues to
    * price the full build honestly (r12 verdict task 2). */
  private val cache =
    scala.collection.mutable.Map.empty[String, (Option[Index], Set[Int])]
  private[graft] def servingIndex(s: SparkSession, d: String): Option[Index] =
    cache.synchronized {
      val key = s.sparkContext.applicationId + "|" + d
      cache.getOrElseUpdate(key, {
        // record which persisted RDD blocks the materialization created
        // so releaseServingIndex can drop exactly them (r13 verdict
        // task 4 — the standing artifact's memory must be accountable
        // and releasable, not a session-lifetime leak)
        val before = s.sparkContext.getPersistentRDDs.keySet
        // pinned: the serving index outlives the building query by
        // design (q203/q211 consume it across the whole session);
        // releaseServingIndex drops exactly these ids when retired
        val built = buildIndex(s, d).map { idx =>
          idx.copy(coded =
            Io.materializePinned(idx.coded.repartition(col("cid"))))
        }
        val ids = (s.sparkContext.getPersistentRDDs.keySet -- before).toSet
        (built, ids)
      })._1
    }

  /** Drop every standing serving index this session built: unpersist the
    * checkpoint blocks the materializations created and forget the cache
    * entries, so a long-lived session that is done with the ANN family
    * returns the memory (Bench reports the held bytes as cached_rdd_kb;
    * a subsequent servingIndex call simply rebuilds). */
  private[graft] def releaseServingIndex(s: SparkSession): Unit =
    cache.synchronized {
      val app = s.sparkContext.applicationId + "|"
      val mine = cache.keys.filter(_.startsWith(app)).toSeq
      mine.foreach { key =>
        val (_, ids) = cache(key)
        val live = s.sparkContext.getPersistentRDDs
        ids.foreach(id => live.get(id).foreach(_.unpersist(blocking = false)))
        cache.remove(key)
      }
    }

  /** The residual PQ books as an M·K-row relation (m, c, bv) — the
    * model sidecar in relational form, joined (not packed) into the
    * per-query ADC tables. */
  private def booksDf(s: SparkSession,
      books: IndexedSeq[Seq[(Long, IndexedSeq[Long])]]): DataFrame = {
    import s.implicits._
    books.zipWithIndex.flatMap { case (bk, m) =>
      bk.map { case (c, bv) => (m, c, bv) }
    }.toDF("m", "c", "bv")
  }

  /** Distributed query staging — the whole per-query search state in
    * ONE relation, no driver probe loop (r12 verdict task 1): for each
    * query (q_id, qqv),
    *
    *   1. probe: nprobe nearest cells by exact integer L2, ties to the
    *      lowest cid — queries broadcast against the centroid relation,
    *      rank ≤ nprobe via a literal-limit window (WindowGroupLimit
    *      heap over the model-sized centroid relation);
    *   2. ADC entries: the query's per-cell RESIDUAL subvectors scored
    *      against the M·K book relation — one row per (q_id, cid, m, c);
    *   3. bundle: per query, the sorted probed-cid array and ONE map
    *      column cid → the cell's ADC table FLATTENED to M·K longs
    *      (slot m·K + c, codes 1-based; a book slot emptied by Lloyd
    *      drop-out fills 0 and is never referenced — withCodes only
    *      emits present codes).
    *
    * Output: (q_id, qqv, pcids, qtab) — Q rows, each carrying its own
    * nprobe-entry cid → flat-table map, broadcast to the candidate
    * scan. The flat layout replaces the r13 struct-keyed (cid, m, c)
    * map (r13 verdict task 3): Spark map lookups are linear scans, so
    * the old shape paid ~M²·K·nprobe struct comparisons per candidate
    * row; now the scan probes the nprobe-entry outer map ONCE per row
    * and the fused [[graft.functions.AdcSum]] kernel does M direct
    * long loads. No key component carries a magnitude cap. */
  private[operators] def qMeta(idx: Index, queries: DataFrame): DataFrame = {
    val s = queries.sparkSession
    graft.functions.AdcSum.register(s, PqK)
    graft.functions.VecDist.register(s)
    val w = Window.partitionBy(col("q_id")).orderBy(col("dist"), col("cid"))
    val probed = idx.cents.crossJoin(broadcast(queries))
      .select(col("q_id"), col("qqv"), col("cid"), col("cvec"),
        l2(col("cvec"), col("qqv")).as("dist"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= Nprobe)
      .select(col("q_id"), col("qqv"), col("cid"), col("cvec"))
    val qs = slice(col("qqv"), col("m") * PqS + 1, lit(PqS))
    val cs = slice(col("cvec"), col("m") * PqS + 1, lit(PqS))
    // fused Σ((q−c)−b)² — the residual array zip_with(qs, cs, _-_) is
    // never materialized (r16 VecDist kernel)
    val ad = graft.functions.VecDist.residL2Sq(qs, cs, col("bv"))
    probed.crossJoin(broadcast(booksDf(s, idx.books)))
      .select(col("q_id"), col("qqv"), col("cid"), col("m"), col("c"),
        ad.as("ad"))
      .groupBy(col("q_id"), col("cid"))
      .agg(first(col("qqv")).as("qqv"),
        map_from_entries(collect_list(struct(
          (col("m") * PqK + col("c")).cast("int").as("key"),
          col("ad").as("value")))).as("pm"))
      .select(col("q_id"), col("qqv"), col("cid"),
        transform(sequence(lit(1), lit(PqM * PqK)),
          i => coalesce(element_at(col("pm"), i), lit(0L))).as("flat"))
      .groupBy(col("q_id"))
      .agg(first(col("qqv")).as("qqv"),
        sort_array(collect_set(col("cid"))).as("pcids"),
        map_from_entries(sort_array(collect_list(struct(
          col("cid").as("key"), col("flat").as("value"))))).as("qtab"))
  }

  /** ADC distance of a coded candidate row under its query's staged
    * table: one nprobe-entry map probe for the row's cell table, then
    * the fused [[graft.functions.AdcSum]] kernel — M direct long loads
    * + a sum inside whole-stage codegen, no vector arithmetic in the
    * scan (the q192 ADC contract). Callers must AdcSum.register (qMeta
    * does). */
  private[operators] def adcDist: Column =
    graft.functions.AdcSum(element_at(col("qtab"), col("cid")), col("codes"))

  /** Shared oracle prefix: milli grid `em` → adaptive codebook size →
    * coarse cells → assignment (lowest-cid ties) → residual relation
    * `e` feeding the wave-24 Lloyd chain (books c1 + final codes a2,
    * both ON RESIDUALS). The assignment window (a0g) deliberately
    * projects ONLY (vec_id, cid): dragging the 512-byte cvec payload
    * through the n·Bc window intermediate is what OOM'd DuckDB on the
    * r12 sf1 pass — the centroid vector joins back from the Bc-row
    * cents relation afterwards. The coarse prefix (through a0g) is
    * split out as [[CoarseSql]] so the q211 occupancy audit can reuse
    * it without the PQ chain. */
  private[graft] val CoarseSql: String =
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
                  FROM em, cents c) WHERE rn = 1)"""

  private[operators] val IvfadcSql: String =
    CoarseSql +
      s""", asg AS MATERIALIZED (SELECT a.vec_id, a.cid, c.cvec
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

  /** Shared audit CTE block, appended after [[IvfadcSql]]: the sampled
    * query relation (qmod/qs), per-query probe cells (qprobe) + ADC
    * tables (adct), the ADC-scored candidates (scored), and BOTH capped
    * top-10 rankings with their rank columns retained — `ar` (q_id,
    * nbr, ark) and `xt` (q_id, nbr, cid, xrk). q203 consumes the
    * membership and cells; q212 (wave 34) the ranks. One text, so the
    * two audits can never diverge on the ranking definition. */
  private[operators] val AuditRankSql: String =
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
        ar AS (SELECT q_id, nbr, ark FROM (
                 SELECT q_id, nbr,
                        row_number() OVER (PARTITION BY q_id
                          ORDER BY adc, nbr) AS ark
                 FROM scored) WHERE ark <= $TopK),
        exd AS MATERIALIZED (SELECT qs.q_id, em2.vec_id AS nbr, g.cid,
                  CAST(${l2SeqSql("em2.qv", "qs.qqv", Dim)} AS BIGINT) AS ex
                FROM em em2 JOIN asg g ON em2.vec_id = g.vec_id, qs
                WHERE em2.vec_id <> qs.q_id),
        xt AS (SELECT q_id, nbr, cid, xrk FROM (
                 SELECT q_id, nbr, cid,
                        row_number() OVER (PARTITION BY q_id
                          ORDER BY ex, nbr) AS xrk
                 FROM exd) WHERE xrk <= $TopK)"""

  /** q202 — IVFADC probed search: the query (vec_id 0, the family's
    * fixed probe) walks nprobe = 2 nearest coarse cells and ADC-scores
    * ONLY the residual codes inside them — M table lookups per
    * candidate row, no vector arithmetic in the scan — returning the
    * top-10 with the exact distance alongside (the q173/q192
    * price-the-approximation discipline: the quantization error of the
    * ranking is visible on the sheet). This is the registry's honest
    * BUILD price: it constructs the full index in-query (assignment +
    * residual Lloyd + encode) before searching it.
    *
    * Scale notes (100 TB): the scan touches nprobe cells ≈ nprobe·n/Bc
    * rows (Bc ≈ √n), reads M bytes of codes per row instead of Dim·4,
    * and the per-query state (one broadcast row: nprobe·M·K map
    * entries + the probed cid array) is model-sized; top-k merges
    * per-partition heaps (TakeOrderedAndProject). Together: ~64×
    * narrower rows × ~√n/2 fewer of them than q192's flat ADC scan. */
  private val q202 = GQuery(
    "q202_ivfadc_search",
    (s, d) => {
      buildIndex(s, d) match {
        case Some(idx) =>
          val queries = Wave24Queries.qvecs(s, d)
            .filter(col("vec_id") === 0)
            .select(col("vec_id").as("q_id"), col("qv").as("qqv"))
          val qm = qMeta(idx, queries)
          idx.coded.join(broadcast(qm),
              array_contains(col("pcids"), col("cid"))
                && col("vec_id") =!= col("q_id"))
            .select(col("vec_id"), col("cid"),
              adcDist.as("adc_dist"),
              l2(col("fqv"), col("qqv")).as("exact_dist"))
            .orderBy(col("adc_dist"), col("vec_id"))
            .limit(TopK)
        case None =>
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
    * Reads the STANDING index ([[servingIndex]] — built once per
    * session/scale, cid-partitioned, materialized): an audit runs
    * against the artifact the cluster serves, it does not rebuild the
    * index per run (r12 verdict task 2; q202 keeps pricing the build).
    *
    * Scale notes: every pass is a map-only broadcast join over the
    * corpus that reduces immediately — the exact baseline and the
    * candidate ranking both carry literal rank ≤ 10 filters (map-side
    * WindowGroupLimit heaps, the q201 discipline); candidate rows are
    * pre-filtered to the query's probed cells by each query's own
    * pcids array BEFORE any scoring; nothing Q·n is ever materialized
    * and the corpus never shuffles. Per-query state rides the Q-row
    * [[qMeta]] broadcast — no driver loop, no packed keys, no
    * Bc-dependent literals. */
  private val q203 = GQuery(
    "q203_ivfadc_recall",
    (s, d) => {
      servingIndex(s, d) match {
        case Some(idx) =>
          val coded = idx.coded
          val n = Tables.embeddings(s, d).count()
          val mod = Geometry.adaptiveSampleMod(n, AudModFloor, AudTargetLog2)
          val queries = Wave24Queries.qvecs(s, d)
            .filter(col("vec_id") % mod === 0)
            .select(col("vec_id").as("q_id"), col("qv").as("qqv"))
          val qm = broadcast(qMeta(idx, queries))
          val isCand = array_contains(col("pcids"), col("cid"))
          // candidate pass: probed-cell rows only, ADC-scored, top-10
          // per query via group-limit heaps
          val wAdc = Window.partitionBy(col("q_id"))
            .orderBy(col("adc"), col("nbr"))
          val adcTop = coded.join(qm,
              isCand && col("vec_id") =!= col("q_id"))
            .select(col("q_id"), col("vec_id").as("nbr"),
              adcDist.as("adc"))
            .withColumn("ark", row_number().over(wAdc))
            .filter(col("ark") <= TopK)
            .select(col("q_id"), col("nbr"))
          // exact baseline: full corpus, top-10 per query, each row
          // tagged with whether its cell was probed
          val wEx = Window.partitionBy(col("q_id"))
            .orderBy(col("ex"), col("nbr"))
          val exTop = coded.join(qm, col("vec_id") =!= col("q_id"))
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
    Some(IvfadcSql + AuditRankSql +
      s""", xc AS (SELECT xt.q_id, xt.nbr,
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
