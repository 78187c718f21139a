package graft.operators

import graft.GQuery
import graft.sources.{Io, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-11 wave 24: the missing half of the industrial ANN stack and
  * the arbitrary-length verbatim-dedup escalation —
  *
  *   - q191 product-quantization codebook training (per-subspace
  *     exact-integer Lloyd, the q102 recipe applied M times in one job)
  *     with the distortion sheet a PQ index build reviews;
  *   - q192 ADC-scored top-k over the PQ codes — asymmetric-distance
  *     search priced against the exact distance on the same rows
  *     (q59 quantizes scalars for storage, PQ quantizes SUBSPACES for
  *     search: M·8-bit codes replace the vector in the scan);
  *   - q193 multi-shingle-size verbatim-span escalation (k ∈ {8,16,32})
  *     — Lee et al.-style substring dedup priced across shingle
  *     granularities: small k sees every span but its frequent shingles
  *     cap out first at corpus scale; large k's shingles are rarer and
  *     survive the caps. The sheet reports each k's longest span per
  *     pair and the escalation gain (0 at fixture scale where no bucket
  *     caps — the gain IS the cap-loss measure).
  *
  * Determinism: all distances are exact integer squared-L2 on
  * milli-integerized vectors (round(x·1000), the q102 grid); codebook
  * means are integer `div`; assignment ties break to the lowest code id
  * in both engines; the only doubles are single rounded divisions over
  * exact integers.
  */
object Wave24Queries {

  private[graft] val Dim = 64
  /** PQ geometry: M subspaces × S dims, K codes per subspace. Fixture
    * constants (prod: M·K scales with the recall target; the train/
    * encode shape below is geometry-independent). Shared with the
    * IVFADC composition (Wave29) — one geometry, one kernel. */
  private[graft] val PqM = 4
  private[graft] val PqS = 16
  private[graft] val PqK = 4 // must stay < 100: q191/q201 pack (m, code)
  //                       into decimal-digit key slots (guarded by requires)
  private val AdcK = 10

  private def femb(s: SparkSession, d: String): DataFrame =
    Io.fanOut(Tables.embeddings(s, d))

  /** Milli-integerized vectors — the q102 exact-integer grid. r17: the
    * interpreted transform(round·cast) projection is now the MilliQuant
    * codegen kernel (bit-identical; see its scaladoc + VecQuantSpec). */
  private[graft] def qvecs(s: SparkSession, d: String): DataFrame = {
    graft.functions.MilliQuant.register(s)
    femb(s, d).select(col("vec_id"),
      graft.functions.MilliQuant(col("embedding")).as("qv"))
  }

  /** Per-subspace code + min squared-L2 distance, MAP-ONLY: the M·K·S
    * codebook travels as literals (the q102/q90 driver-holds-only-model
    * rule), so encoding never shuffles the vector table. Adds `codes`
    * (array of the M chosen code ids, subspace order) and `dists`
    * (array of the M per-subspace squared errors). */
  private[graft] def withCodes(df: DataFrame,
      books: IndexedSeq[Seq[(Long, IndexedSeq[Long])]]): DataFrame = {
    graft.functions.VecDist.register(df.sparkSession)
    val per = (0 until PqM).map { m =>
      val sv = slice(col("qv"), m * PqS + 1, PqS)
      val dists = array(books(m).map { case (_, cv) =>
        graft.functions.VecDist.l2sq(sv, typedLit(cv))
      }: _*)
      val ids = typedLit(books(m).map(_._1))
      struct(
        element_at(ids,
          array_position(dists, array_min(dists)).cast("int")).as("c"),
        array_min(dists).as("dist"))
    }
    df.withColumn("enc", array(per: _*))
      .withColumn("codes", expr("transform(enc, e -> e.c)"))
      .withColumn("dists", expr("transform(enc, e -> e.dist)"))
      .drop("enc")
  }

  /** Train the PQ codebooks: seeds are the K md5-first vectors'
    * subvectors (deterministic, content-independent — the q102 seeding),
    * then ONE exact-integer Lloyd iteration for all M subspaces in a
    * single job (assignment is map-only; the update is one posexplode →
    * (m, code, pos)-keyed integer-mean aggregate whose state is
    * M·K·S-bounded per task regardless of corpus size). Driver state:
    * M·K·S = 256 longs. A code emptied by the iteration drops out of
    * its subspace's book (both engines aggregate present groups — the
    * q102 drop-out rule). */
  private[graft] def trainBooks(s: SparkSession, d: String)
      : IndexedSeq[Seq[(Long, IndexedSeq[Long])]] =
    trainBooksOn(qvecs(s, d))

  /** [[trainBooks]] over an arbitrary (vec_id, qv) relation — the IVFADC
    * composition (Wave29) trains the SAME exact-integer Lloyd chain on
    * cell RESIDUALS instead of raw vectors (Jégou et al. 2011's layout:
    * coarse quantizer + PQ on what it misses). */
  private[graft] def trainBooksOn(vecs: DataFrame)
      : IndexedSeq[Seq[(Long, IndexedSeq[Long])]] = {
    val seeds = vecs
      .withColumn("mkey", md5(col("vec_id").cast("string")))
      .orderBy(col("mkey"), col("vec_id")).limit(PqK)
      .collect()
      .map(_.getSeq[Long](1).toIndexedSeq)
    if (seeds.isEmpty) return IndexedSeq.empty
    val init: IndexedSeq[Seq[(Long, IndexedSeq[Long])]] =
      (0 until PqM).map { m =>
        seeds.zipWithIndex.map { case (v, i) =>
          ((i + 1).toLong, v.slice(m * PqS, (m + 1) * PqS)) }.toSeq
      }
    val upd = withCodes(vecs.select(col("vec_id"), col("qv")), init)
      .select(col("codes"), posexplode(col("qv")).as(Seq("pos", "v")))
      .select(expr(s"pos div $PqS").cast("int").as("m"),
        element_at(col("codes"),
          (expr(s"pos div $PqS") + 1).cast("int")).as("c"),
        expr(s"pos % $PqS").cast("int").as("i"), col("v"))
      .groupBy(col("m"), col("c"), col("i"))
      .agg(expr("sum(v) div count(1)").as("v"))
      .collect()
    (0 until PqM).map { m =>
      upd.filter(_.getInt(0) == m).groupBy(_.getLong(1)).toSeq
        .map { case (c, rows) =>
          (c, rows.sortBy(_.getInt(2)).map(_.getLong(3)).toIndexedSeq) }
        .sortBy(_._1)
    }
  }

  /** The Lloyd-train CTE chain body, parameterized on a relation named
    * `e` (vec_id, qv) the caller's WITH prefix must define — so the
    * IVFADC oracle (Wave29) can train the identical chain on cell
    * residuals. Appended after "WITH e AS (...)," by callers. */
  private[graft] val PqChainFromE: String =
    s"""sub AS MATERIALIZED (SELECT vec_id, m,
                  qv[CAST(m*$PqS+1 AS INT):CAST(m*$PqS+$PqS AS INT)] AS sv
                FROM e, (SELECT unnest(range(0, $PqM)) AS m) g),
        sd AS (SELECT vec_id, row_number() OVER
                 (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS c FROM e),
        c0 AS (SELECT s.m, sd.c, s.sv AS cv FROM sub s JOIN sd USING (vec_id)
               WHERE sd.c <= $PqK),
        d1 AS (SELECT s.vec_id, s.m, c.c,
                 list_sum(list_transform(range(1, ${PqS + 1}),
                   i -> (s.sv[CAST(i AS INT)] - c.cv[CAST(i AS INT)])
                      * (s.sv[CAST(i AS INT)] - c.cv[CAST(i AS INT)]))) AS dist
               FROM sub s JOIN c0 c ON s.m = c.m),
        a1 AS (SELECT vec_id, m, c FROM
                 (SELECT *, row_number() OVER (PARTITION BY vec_id, m
                                               ORDER BY dist, c) AS rn
                  FROM d1) WHERE rn = 1),
        c1 AS MATERIALIZED (SELECT m, c, list(v ORDER BY i) AS cv FROM
                 (SELECT a.m, a.c, t.i,
                         CAST(sum(s.sv[CAST(t.i AS INT)]) AS BIGINT) // count(*) AS v
                  FROM a1 a JOIN sub s USING (vec_id, m), range(1, ${PqS + 1}) t(i)
                  GROUP BY a.m, a.c, t.i)
               GROUP BY m, c),
        d2 AS (SELECT s.vec_id, s.m, c.c,
                 list_sum(list_transform(range(1, ${PqS + 1}),
                   i -> (s.sv[CAST(i AS INT)] - c.cv[CAST(i AS INT)])
                      * (s.sv[CAST(i AS INT)] - c.cv[CAST(i AS INT)]))) AS dist
               FROM sub s JOIN c1 c ON s.m = c.m),
        a2 AS MATERIALIZED (SELECT vec_id, m, c, dist FROM
                 (SELECT *, row_number() OVER (PARTITION BY vec_id, m
                                               ORDER BY dist, c) AS rn
                  FROM d2) WHERE rn = 1)"""

  /** Shared oracle CTE chain: milli grid → subvectors → seeds → one
    * Lloyd iteration (the q102 kmIterSql pattern with a subspace column
    * so all M books train in one pass) → final assignment a2 + book c1. */
  private val PqSql: String =
    s"""WITH e AS MATERIALIZED (SELECT vec_id, list_transform(embedding,
                     x -> CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT)) AS qv
                   FROM embeddings),
        $PqChainFromE"""

  /** The shared Lloyd CTE chain, exposed for the q201 retrieval audit
    * (same books, same final assignment — the audit must price the
    * exact codes q191/q192 publish). */
  private[graft] def pqSqlForAudit: String = PqSql

  /** q191 — product-quantization codebook training + distortion sheet:
    * per (subspace, code): vectors encoded to it, total and mean squared
    * quantization error (exact integer numerator; mean in original
    * units² via one rounded division chain), and the centroid element
    * sum (the book fingerprint the encode step is checked against).
    * This is the TRAIN step of the PQ index (Jégou et al. 2011): q37's
    * IVF prunes WHICH vectors to scan, PQ compresses WHAT the scan
    * reads — codes are M·log2(K) bits instead of Dim·32.
    *
    * Scale notes (100 TB): train touches the corpus twice (assignment
    * map-only with literal books; update one bounded-state aggregate);
    * the sheet is an M·K-row aggregate over the map-only encode. In
    * production the train pass runs on a q52-style sample and only the
    * ENCODE (map-only, no shuffle) touches the full corpus. */
  private val q191 = GQuery(
    "q191_pq_codebook",
    (s, d) => {
      val books = trainBooks(s, d)
      if (books.isEmpty)
        qvecs(s, d).select(lit(0).as("subspace"), col("vec_id").as("code"),
          lit(0L).as("n_vecs"), col("vec_id").as("total_sqerr"),
          lit(0.0).as("avg_sqerr"), col("vec_id").as("centroid_sum"))
          .limit(0)
      else {
        // packed key m·10² + c silently collides (corrupting centroid
        // sums, not failing) outside its envelope — guard it (ADVICE r11)
        require(PqM <= 100 &&
          books.forall(_.forall(b => b._1 >= 0 && b._1 < 100)),
          "centroid-sum key packing needs 0 <= code < 100 and m < 100")
        val sums = typedLit(books.zipWithIndex.flatMap { case (bk, m) =>
          bk.map { case (c, cv) => (m * 100L + c) -> cv.sum } }.toMap)
        withCodes(qvecs(s, d), books)
          .select(posexplode(arrays_zip(col("codes"), col("dists")))
            .as(Seq("m0", "cd")))
          .select(col("m0").cast("int").as("subspace"),
            col("cd.codes").as("code"), col("cd.dists").as("sqerr"))
          .groupBy(col("subspace"), col("code"))
          .agg(count(lit(1)).as("n_vecs"), sum(col("sqerr")).as("total_sqerr"))
          .withColumn("avg_sqerr",
            round(col("total_sqerr").cast("double") / col("n_vecs")
              / 1000000.0, 6))
          .withColumn("centroid_sum",
            element_at(sums, col("subspace").cast("long") * 100 + col("code")))
          .select(col("subspace"), col("code"), col("n_vecs"),
            col("total_sqerr"), col("avg_sqerr"), col("centroid_sum"))
          .orderBy(col("subspace"), col("code"))
      }
    },
    Some(PqSql +
      s""", cs AS (SELECT m, c, CAST(list_sum(cv) AS BIGINT) AS centroid_sum
                   FROM c1),
           g AS (SELECT m, c, count(*) AS n_vecs,
                        CAST(sum(dist) AS BIGINT) AS total_sqerr
                 FROM a2 GROUP BY m, c)
           SELECT CAST(g.m AS INTEGER) AS subspace, g.c AS code, g.n_vecs,
                  g.total_sqerr,
                  round(CAST(g.total_sqerr AS DOUBLE) / g.n_vecs
                    / 1000000.0, 6) AS avg_sqerr,
                  cs.centroid_sum
           FROM g JOIN cs ON g.m = cs.m AND g.c = cs.c
           ORDER BY subspace, code""")
  )

  /** q192 — ADC-scored PQ top-k: the asymmetric-distance search over the
    * PQ codes (query stays full-precision, corpus rows are their M
    * codes). The ADC table — squared-L2 from each of the query's
    * subvectors to each centroid, M·K exact integers — is computed ONCE
    * per query; each corpus row's ADC distance is M table lookups + a
    * sum, NO vector arithmetic in the scan. The sheet carries the exact
    * distance on the same rows so the quantization error of the ranking
    * is visible (the q173 price-the-approximation discipline). Query =
    * vec_id 0, the family's fixed probe (q26/q37).
    *
    * Scale notes (100 TB): the scan reads codes (M bytes/row at K ≤ 256)
    * instead of Dim·4 bytes — a 64× narrower read; per-partition top-k
    * heaps merge k rows on the driver (TakeOrderedAndProject, the q26
    * shape). The ADC table is M·K literals — model-sized driver state. */
  private val q192 = GQuery(
    "q192_pq_adc_topk",
    (s, d) => {
      val books = trainBooks(s, d)
      val qrow = qvecs(s, d).filter(col("vec_id") === 0)
        .collect().headOption.map(_.getSeq[Long](1).toIndexedSeq)
      if (books.isEmpty || qrow.isEmpty)
        qvecs(s, d).select(col("vec_id"), lit("").as("code_str"),
          col("vec_id").as("adc_dist"), col("vec_id").as("exact_dist"))
          .limit(0)
      else {
        val qv = qrow.get
        val adcMaps: IndexedSeq[Map[Long, Long]] = (0 until PqM).map { m =>
          val qs = qv.slice(m * PqS, (m + 1) * PqS)
          books(m).map { case (c, cv) =>
            c -> qs.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum
          }.toMap
        }
        val adcDist = (0 until PqM).map { m =>
          element_at(typedLit(adcMaps(m)), element_at(col("codes"), m + 1))
        }.reduce(_ + _)
        val exactDist = aggregate(
          zip_with(col("qv"), typedLit(qv), (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x)
        withCodes(qvecs(s, d), books)
          .filter(col("vec_id") =!= 0)
          .select(col("vec_id"),
            concat_ws(",", expr("transform(codes, c -> CAST(c AS STRING))"))
              .as("code_str"),
            adcDist.as("adc_dist"), exactDist.as("exact_dist"))
          .orderBy(col("adc_dist"), col("vec_id"))
          .limit(AdcK)
      }
    },
    Some(PqSql +
      s""", qm AS (SELECT m, sv FROM sub WHERE vec_id = 0),
           adc AS (SELECT c1.m, c1.c,
                     list_sum(list_transform(range(1, ${PqS + 1}),
                       i -> (q.sv[CAST(i AS INT)] - c1.cv[CAST(i AS INT)])
                          * (q.sv[CAST(i AS INT)] - c1.cv[CAST(i AS INT)]))) AS ad
                   FROM c1 JOIN qm q ON c1.m = q.m),
           enc AS (SELECT vec_id, m, c FROM a2 WHERE vec_id <> 0),
           ad2 AS (SELECT e2.vec_id, CAST(sum(a.ad) AS BIGINT) AS adc_dist
                   FROM enc e2 JOIN adc a ON e2.m = a.m AND e2.c = a.c
                   GROUP BY e2.vec_id),
           cstr AS (SELECT vec_id,
                      string_agg(CAST(c AS VARCHAR), ',' ORDER BY m) AS code_str
                    FROM enc GROUP BY vec_id),
           ex AS (SELECT e3.vec_id,
                    CAST(list_sum(list_transform(range(1, ${Dim + 1}),
                      i -> (e3.qv[CAST(i AS INT)] - q.qv[CAST(i AS INT)])
                         * (e3.qv[CAST(i AS INT)] - q.qv[CAST(i AS INT)])))
                      AS BIGINT) AS exact_dist
                  FROM e e3, (SELECT qv FROM e WHERE vec_id = 0) q
                  WHERE e3.vec_id <> 0)
           SELECT a.vec_id, cstr.code_str, a.adc_dist, ex.exact_dist
           FROM ad2 a JOIN cstr USING (vec_id) JOIN ex USING (vec_id)
           ORDER BY adc_dist, vec_id LIMIT $AdcK""")
  )

  /** Multi-k escalation grid for q193: shingle sizes (tokens). All
    * levels report spans ≥ [[MultiKMinSpan]] tokens so their results
    * are comparable — a span of L ≥ 36 tokens is visible to EVERY level
    * unless the level's shingles capped out. */
  private val MultiKGrid = Seq(8, 16, 32)
  private val MultiKMinSpan = 36
  private val MultiKCap = 64

  /** q193 — multi-shingle-size verbatim-span escalation: q117's
    * fixed-k islands run at k ∈ {8, 16, 32} with ONE comparable span
    * threshold, merged per pair. At fixture scale no bucket hits the
    * cap, so all levels agree and escalation_gain = 0 — which is the
    * point: the column PRICES what the smallest k loses to its caps.
    * At corpus scale frequent 8-shingles (boilerplate) blow their
    * 64-posting buckets and k=8 goes blind exactly where k=32's rarer
    * shingles still pair up — Lee et al.'s reason substring dedup needs
    * length escalation, measured instead of assumed.
    *
    * Scale notes: three independent bucket-local passes (the q117
    * operator — positional shingles, capped buckets, gaps-and-islands)
    * over ONE shared tokenize: the (doc_id, toks) projection
    * materializes once and every level derives its shingles from it
    * (r11 verdict task 5 — each level is still exactly the audited
    * q117 kernel past the tokenize). Never all-pairs: pair generation
    * stays inside ≤64-posting buckets at every level. */
  private val q193 = GQuery(
    "q193_multik_span",
    (s, d) => {
      val toks = Io.materialize(
        Io.fanOut(Tables.documents(s, d).select(col("doc_id"), col("text")))
          .select(col("doc_id"),
            graft.functions.TextOps.tokens(col("text")).as("toks")))
      val levels = MultiKGrid.map { k =>
        CorpusOps.sharedSpansFromToks(toks, "doc_id",
            n = k, bucketCap = MultiKCap, minSpanTokens = MultiKMinSpan)
          .select(col("doc_id1"), col("doc_id2"), lit(k).as("k"),
            col("longest_span"))
      }
      levels.reduce(_ unionAll _)
        .groupBy(col("doc_id1"), col("doc_id2"))
        .agg(
          max(when(col("k") === 8, col("longest_span"))).as("span_k8"),
          max(when(col("k") === 16, col("longest_span"))).as("span_k16"),
          max(when(col("k") === 32, col("longest_span"))).as("span_k32"),
          max(col("longest_span")).as("best_span"))
        .withColumn("escalation_gain",
          col("best_span") - coalesce(col("span_k8"), lit(0L)))
        .orderBy(col("doc_id1"), col("doc_id2"))
    },
    Some {
      def level(k: Int) =
        s"""t$k AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
            p$k AS (SELECT doc_id,
                    unnest(range(1, len(toks)-${k - 2})) AS pos,
                    unnest(list_transform(range(1, len(toks)-${k - 2}),
                      i -> CAST(concat('0x', substr(md5(array_to_string(
                             toks[i:i+${k - 1}],' ')),1,15)) AS BIGINT))) AS sgh
                  FROM t$k WHERE len(toks) >= $k),
            q$k AS (SELECT p$k.* FROM p$k JOIN
                      (SELECT sgh FROM p$k GROUP BY sgh
                       HAVING count(*) <= $MultiKCap) kk USING (sgh)),
            m$k AS (SELECT a.doc_id AS doc_id1, b.doc_id AS doc_id2,
                         a.pos AS p1, b.pos AS p2
                  FROM q$k a JOIN q$k b
                    ON a.sgh = b.sgh AND a.doc_id < b.doc_id),
            i$k AS (SELECT doc_id1, doc_id2, p1, p1-p2 AS off,
                         p1 - row_number() OVER (PARTITION BY doc_id1, doc_id2, p1-p2
                                                 ORDER BY p1) AS grp
                  FROM m$k),
            s$k AS (SELECT doc_id1, doc_id2, off, grp,
                           count(*) + ${k - 1} AS span_tokens
                  FROM i$k GROUP BY doc_id1, doc_id2, off, grp),
            r$k AS (SELECT doc_id1, doc_id2, $k AS k,
                           max(span_tokens) AS longest_span
                  FROM s$k WHERE span_tokens >= $MultiKMinSpan
                  GROUP BY doc_id1, doc_id2)"""
      s"""WITH ${MultiKGrid.map(level).mkString(", ")},
          u AS (${MultiKGrid.map(k => s"SELECT * FROM r$k").mkString(" UNION ALL ")})
          SELECT doc_id1, doc_id2,
                 max(CASE WHEN k = 8 THEN longest_span END) AS span_k8,
                 max(CASE WHEN k = 16 THEN longest_span END) AS span_k16,
                 max(CASE WHEN k = 32 THEN longest_span END) AS span_k32,
                 max(longest_span) AS best_span,
                 max(longest_span)
                   - coalesce(max(CASE WHEN k = 8 THEN longest_span END), 0)
                   AS escalation_gain
          FROM u GROUP BY doc_id1, doc_id2 ORDER BY doc_id1, doc_id2"""
    }
  )

  val all: Seq[GQuery] = Seq(q191, q192, q193)
}
