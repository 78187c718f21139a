package graft.operators

import graft.GQuery
import graft.functions.TextOps
import graft.sources.{Io, Tables}
import graft.util.Geometry
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication family for the training-data pipeline surface: exact
  * (hash-keyed), n-gram Jaccard, MinHash+LSH, and SimHash. Absent from the
  * reference (SURVEY §2-A absence audit); mandated by the north star. The
  * signature aggregations reuse the reference's partial-state-then-merge
  * pattern (local extremum per chunk, then combine —
  * max_aggregation.cpp:54-60) as per-doc MIN/vote aggregates.
  *
  * Scale notes (100 TB):
  * - Exact dedup groups on md5(text) — the shuffle carries a 32-byte key
  *   instead of the document body.
  * - Jaccard candidates join on shingles with a frequency cap (stop-
  *   shingle removal), the standard guard against quadratic blowup on
  *   common shingles; the cap is mirrored in the oracle.
  * - MinHash uses an 8-hash signature in 2 bands of 4 — band collision
  *   probability j^4, so candidate volume stays near the true-duplicate
  *   count rather than the pair count.
  * - SimHash joins on 4 bands of the 120-bit signature whose width adapts
  *   to corpus size (Geometry.adaptiveBits, 15-30 bits — bucket count ∝ n
  *   at constant occupancy); full Hamming distance is then verified on
  *   candidates only.
  */
object DedupQueries {
  import TextOps._

  private val SHINGLE_N = 5
  private val STOP_SHINGLE_CAP = 1000
  private val MINHASH_K = 8

  /** (doc_id, sh) pairs surviving the stop-shingle cap — the generic
    * CorpusOps.shinglePostings applied to the fixture table (single
    * shuffle on the shingle key, bucket blowup bounded by cap²). */
  private def shingleDf(s: SparkSession, d: String): DataFrame =
    // fanOut: the tokenize+shingle+md5 expansion is the family's one
    // CPU-heavy map stage; a one-file fixture scan would run it serially
    CorpusOps.shinglePostings(
      Io.fanOut(Tables.documents(s, d).select(col("doc_id"), col("text"))),
      "doc_id", "text", SHINGLE_N, STOP_SHINGLE_CAP)

  /** THE STANDING CANDIDATE INDEX (r5 verdict item 3): the shingle
    * postings, LSH band keys, and candidate pairs are ONE corpus-level
    * relation family that a production pipeline builds once and
    * publishes — q25/q31/q79/q97/q100/q104/q111 all consume the same
    * three materialized relations instead of each re-deriving the chain
    * inside its own job (exactly the q60→q78 labels pattern, one level
    * down the derivation).
    *
    * Producer/consumer contract, mirroring publishedLabels: the natural
    * producer of each stage always RECOMPUTES and re-publishes (so its
    * bench time honestly measures that stage's build every rep — q25 owns
    * postings, q31 owns bands + pairs); every other family member
    * consumes the latest published relation for its (session, dir) and
    * only computes its own when run standalone. */
  private val publishedIndex =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  private def indexKey(kind: String, s: SparkSession, d: String): String =
    kind + "|" + s.sparkContext.applicationId + "|" + d
  private def publishIndex(kind: String, s: SparkSession, d: String)
      (build: => DataFrame): DataFrame = {
    // pinned: the published relation outlives the producing query (the
    // whole point of the family). Re-publishing unpersists the DISPLACED
    // relation's blocks immediately — producers re-publish every bench
    // rep, and before this the stale corpus-sized postings/bands/pairs
    // of every prior rep sat in the block manager until a driver GC
    // cycle that a bench session never reaches (r14 drift root cause).
    val rel = Io.materializePinned(build)
    val old = publishedIndex.put(indexKey(kind, s, d), rel)
    if (old != null) Io.unpersistMaterialized(old)
    rel
  }
  private def indexFor(kind: String, s: SparkSession, d: String)
      (build: => DataFrame): DataFrame = {
    // NOT computeIfAbsent: bandsFor's build calls postingsFor on the same
    // map, and a nested computeIfAbsent is a "Recursive update" error.
    // get-then-putIfAbsent tolerates the nesting; the benign race (two
    // callers both materialize, first wins) costs one duplicate build.
    val key = indexKey(kind, s, d)
    Option(publishedIndex.get(key)).getOrElse {
      val rel = Io.materializePinned(build)
      Option(publishedIndex.putIfAbsent(key, rel)) match {
        case Some(winner) => Io.unpersistMaterialized(rel); winner
        case None => rel
      }
    }
  }

  /** Consumer accessors (compute-if-absent so every query stays correct
    * standalone; block scans when the family runs as a pipeline). */
  private[operators] def postingsFor(s: SparkSession, d: String): DataFrame =
    indexFor("postings", s, d)(shingleDf(s, d))
  private def bandsFor(s: SparkSession, d: String): DataFrame =
    indexFor("bands", s, d)(
      CorpusOps.minhashBandsFromPostings(postingsFor(s, d), "doc_id",
        MINHASH_K, bands = 2))
  private def pairsFor(s: SparkSession, d: String): DataFrame =
    indexFor("pairs", s, d)(
      CorpusOps.candidatePairsFromBands(bandsFor(s, d), "doc_id"))

  /** In-bucket candidate pairs — shared helper (TextOps.orderedPairs). */
  private def orderedPairs(docs: Column): Column = TextOps.orderedPairs(docs)

  /** Oracle CTE prefix mirroring shingleDf: shingles carried as md5-60bit
    * BIGINTs (the engine's shuffle-byte optimization, mirrored exactly). */
  private val SHINGLE_SQL =
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        sh0 AS (SELECT doc_id,
                       CAST(concat('0x', substr(md5(sg), 1, 15)) AS BIGINT) AS sgh
                FROM (SELECT doc_id, unnest(list_distinct([array_to_string(t[i:i+${SHINGLE_N - 1}], ' ')
                        FOR i IN range(1, len(t) - ${SHINGLE_N - 2})])) AS sg
                      FROM toks WHERE len(t) >= $SHINGLE_N)),
        sh AS (SELECT doc_id, sgh FROM sh0
               WHERE sgh IN (SELECT sgh FROM sh0 GROUP BY sgh HAVING count(*) <= $STOP_SHINGLE_CAP))"""

  /** q24 — exact dedup keyed on md5(text): one representative (min doc_id)
    * per distinct content. */
  private val q24 = GQuery(
    "q24_dedup_exact",
    (s, d) =>
      CorpusOps.exactDedup(Io.fanOut(Tables.documents(s, d)), "doc_id", "text")
        .orderBy(col("doc_id")),
    Some("""SELECT min(doc_id) AS doc_id, count(*) AS n_copies
            FROM documents GROUP BY md5(text) ORDER BY doc_id""")
  )

  /** q25 — near-duplicate candidates by n-gram Jaccard over distinct
    * shingle sets (deterministic — no random permutations, SURVEY §7). */
  private val q25 = GQuery(
    "q25_dedup_near",
    (s, d) => {
      // Producer role: q25 rebuilds and RE-PUBLISHES the posting relation
      // (honest bench cost), then consumes the materialized blocks like
      // everyone else. Per-doc shingle counts (post-cap) are attached via
      // a window and carried through the bucket structs, so no
      // sizes-relation re-join.
      import org.apache.spark.sql.expressions.Window
      val shN = publishIndex("postings", s, d)(shingleDf(s, d))
        .withColumn("nsh", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      shN.groupBy(col("sgh"))
        .agg(sort_array(collect_list(struct(col("doc_id"), col("nsh")))).as("docs"))
        .select(explode(orderedPairs(col("docs"))).as("p"))
        .groupBy(col("p.d1.doc_id").as("doc1"), col("p.d1.nsh").as("nsh1"),
          col("p.d2.doc_id").as("doc2"), col("p.d2.nsh").as("nsh2"))
        .agg(count(lit(1)).as("common"))
        .withColumn("jaccard",
          col("common") / (col("nsh1") + col("nsh2") - col("common")))
        .filter(col("jaccard") >= 0.2)
        .select(col("doc1"), col("doc2"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy(col("doc1"), col("doc2"))
    },
    Some(SHINGLE_SQL +
      """, sizes AS (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY doc_id),
         pairs AS (SELECT a.doc_id AS doc1, b.doc_id AS doc2, count(*) AS common
                   FROM sh a JOIN sh b ON a.sgh = b.sgh AND a.doc_id < b.doc_id
                   GROUP BY 1, 2)
         SELECT doc1, doc2,
                round(common * 1.0 / (s1.nsh + s2.nsh - common), 6) AS jaccard
         FROM pairs
         JOIN sizes s1 ON doc1 = s1.doc_id
         JOIN sizes s2 ON doc2 = s2.doc_id
         WHERE common * 1.0 / (s1.nsh + s2.nsh - common) >= 0.2
         ORDER BY doc1, doc2""")
  )

  /** MinHash+LSH candidate pairs (unordered) — the published standing
    * index relation; q31 is its producer, q60/q86/q97/q111 consume. */
  private[operators] def minhashPairs(s: SparkSession, d: String): DataFrame =
    pairsFor(s, d)

  /** q31 — MinHash + LSH banding. Signature = 8 md5-min hashes; 2 bands of
    * 4 rows hashed to a band key; candidate pairs share a band. Fully
    * deterministic and oracle-checkable (md5 in both engines).
    *
    * Producer role: q31 rebuilds and re-publishes the band relation (from
    * the published postings) and the candidate-pair relation — the LSH
    * stages it owns in the family pipeline. */
  private val q31 = GQuery(
    "q31_dedup_minhash",
    (s, d) => {
      val bands = publishIndex("bands", s, d)(
        CorpusOps.minhashBandsFromPostings(postingsFor(s, d), "doc_id",
          MINHASH_K, bands = 2))
      publishIndex("pairs", s, d)(
        CorpusOps.candidatePairsFromBands(bands, "doc_id"))
        .orderBy(col("doc1"), col("doc2"))
    },
    Some(SHINGLE_SQL +
      """, sig AS (SELECT doc_id,
                    min(CAST(concat('0x', substr(md5('0|' || CAST(sgh AS VARCHAR)), 1, 15)) AS BIGINT)) AS h0,
                    min(CAST(concat('0x', substr(md5('1|' || CAST(sgh AS VARCHAR)), 1, 15)) AS BIGINT)) AS h1,
                    min(CAST(concat('0x', substr(md5('2|' || CAST(sgh AS VARCHAR)), 1, 15)) AS BIGINT)) AS h2,
                    min(CAST(concat('0x', substr(md5('3|' || CAST(sgh AS VARCHAR)), 1, 15)) AS BIGINT)) AS h3,
                    min(CAST(concat('0x', substr(md5('4|' || CAST(sgh AS VARCHAR)), 1, 15)) AS BIGINT)) AS h4,
                    min(CAST(concat('0x', substr(md5('5|' || CAST(sgh AS VARCHAR)), 1, 15)) AS BIGINT)) AS h5,
                    min(CAST(concat('0x', substr(md5('6|' || CAST(sgh AS VARCHAR)), 1, 15)) AS BIGINT)) AS h6,
                    min(CAST(concat('0x', substr(md5('7|' || CAST(sgh AS VARCHAR)), 1, 15)) AS BIGINT)) AS h7
                  FROM sh GROUP BY doc_id),
         band AS (SELECT doc_id, 0 AS band,
                         md5(h0 || '|' || h1 || '|' || h2 || '|' || h3) AS bh FROM sig
                  UNION ALL
                  SELECT doc_id, 1 AS band,
                         md5(h4 || '|' || h5 || '|' || h6 || '|' || h7) AS bh FROM sig)
         SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
         FROM band a JOIN band b
           ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
         ORDER BY doc1, doc2""")
  )

  /** q32 — SimHash near-dup candidates on the 120-bit ADAPTIVE-BAND
    * geometry (r6 VERDICT #1 — the last fixed bucket space in the
    * registry, now code). Signature: sign of per-bit vote sums over
    * md5-derived token hashes, computed as TWO 60-bit halves
    * (graft.functions.SimHash128 — lo = md5 hex digits 1-15, hi = digits
    * 17-31, both exactly reconstructable in DuckDB); candidates via a
    * 4-band join whose band width GROWS with the corpus, then exact
    * Hamming distance (over all 120 bits) on candidates only.
    *
    * Band geometry: width = Geometry.adaptiveBits(n, occ=2^3, 15..30) —
    * bucket count ∝ n at constant ~8 expected occupancy, the same
    * statistics-driven knob as q41 (and the same driver-side metadata
    * count feeding it). The floor keeps every corpus ≤ 2^18 docs —
    * including the oracle fixtures — on the historical 2^15-bucket
    * geometry; the 30-bit cap (2^30 buckets/band ≈ 10^9) pushes the
    * occupancy ceiling to ~10^10 docs, retiring the old 60-bit
    * signature's documented ~10^7 limit. Bands sit at fixed offsets 0/30
    * within each half, so widening bands never overlap.
    *
    * The bucket cap is the same quadratic-blowup guard as q25's
    * stop-shingles and q41's LSH cap: a band value shared by k documents
    * yields k² ∕ 2 pairs, and low-entropy corpora (here: one shared
    * vocabulary) load a few buckets with a large fraction of the corpus —
    * measured 2.24M candidate pairs from 5 000 docs uncapped. Oversized
    * buckets carry no discriminating signal (they pair near-everything)
    * and are dropped symmetrically in the oracle. With adaptive widths
    * the cap is a hot-spot guard, not the scaling mechanism. */
  private val SIMHASH_BUCKET_CAP = 200
  private val SimHashBandFloor = 15
  private val SimHashBandCap = 30
  private val SimHashHammingMax = 30 // 120-bit twin of the old 15/60 bound

  /** The DISTINCT SimHash candidate-pair relation (doc1 < doc2, exact
    * 120-bit Hamming distance) BEFORE any distance threshold — q32
    * consumes it with the [[SimHashHammingMax]] cut, the wave-31
    * threshold-curve audit (q207) histograms it to PRICE that cut.
    * One kernel, one band geometry, two published views. */
  private[operators] def simhashCandidatePairs(s: SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    // Per-row signature — no tokenize shuffle at all: the whole 120-bit
    // SimHash is one native codegen kernel (graft.functions.SimHash128)
    // over the distinct-token array. At 100 TB this is a map-only pass;
    // only the small (doc_id, lo, hi) relation ever shuffles (for the
    // band buckets).
    graft.functions.SimHash128.register(s)
    val n = Tables.documents(s, d).count() // parquet metadata scalar
    val bandBits = Geometry.adaptiveBits(n, 3, SimHashBandFloor, SimHashBandCap)
    val mask = lit((1L << bandBits) - 1L)
    val sim = Io.fanOut(Tables.documents(s, d).select(col("doc_id"), col("text")))
      .select(col("doc_id"),
        graft.functions.SimHash128(array_distinct(tokens(col("text")))).as("sig"))
      .select(col("doc_id"),
        element_at(col("sig"), 1).as("lo"), element_at(col("sig"), 2).as("hi"))
    val bands = sim.select(col("doc_id"), col("lo"), col("hi"), explode(array(
      struct(lit(0).as("band"), col("lo").bitwiseAND(mask).as("bh")),
      struct(lit(1).as("band"), shiftright(col("lo"), 30).bitwiseAND(mask).as("bh")),
      struct(lit(2).as("band"), col("hi").bitwiseAND(mask).as("bh")),
      struct(lit(3).as("band"), shiftright(col("hi"), 30).bitwiseAND(mask).as("bh"))))
      .as("e"))
      .select(col("doc_id"), col("lo"), col("hi"),
        col("e.band").as("band"), col("e.bh").as("bh"))
    bands.groupBy(col("band"), col("bh"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("lo"), col("hi")))).as("docs"))
      .filter(size(col("docs")).between(2, SIMHASH_BUCKET_CAP))
      .select(explode(orderedPairs(col("docs"))).as("p"))
      .select(col("p.d1.doc_id").as("doc1"), col("p.d2.doc_id").as("doc2"),
        (bit_count(col("p.d1.lo").bitwiseXOR(col("p.d2.lo"))) +
          bit_count(col("p.d1.hi").bitwiseXOR(col("p.d2.hi")))).as("hamming"))
      .distinct()
  }

  /** The shared oracle prefix ending in the `pairs` CTE — the exact
    * mirror of [[simhashCandidatePairs]]. */
  private[operators] val SimhashPairsSql: String =
    s"""WITH nb AS (SELECT ${Geometry.adaptiveBitsSql("count(*)", 3, 15, 30)} AS b
                         FROM documents),
                 tok AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t
                         FROM documents),
                 th AS (SELECT doc_id,
                               CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT) AS hlo,
                               CAST(concat('0x', substr(md5(t), 17, 15)) AS BIGINT) AS hhi
                        FROM tok),
                 v AS (SELECT doc_id, b.b AS b,
                              sum(CASE WHEN ((CASE WHEN b.b < 60 THEN hlo >> b.b
                                              ELSE hhi >> (b.b - 60) END) & 1) = 1
                                       THEN 1 ELSE -1 END) AS votes
                       FROM th, range(0, 120) b(b) GROUP BY doc_id, b.b),
                 sig AS (SELECT doc_id,
                                CAST(sum(CASE WHEN votes > 0 AND b < 60 THEN (1::BIGINT << b)
                                              ELSE 0::BIGINT END) AS BIGINT) AS lo,
                                CAST(sum(CASE WHEN votes > 0 AND b >= 60 THEN (1::BIGINT << (b - 60))
                                              ELSE 0::BIGINT END) AS BIGINT) AS hi
                         FROM v GROUP BY doc_id),
                 band AS (SELECT doc_id, lo, hi, b.b AS band,
                                 CASE b.b WHEN 0 THEN lo & ((1::BIGINT << nb.b) - 1)
                                          WHEN 1 THEN (lo >> 30) & ((1::BIGINT << nb.b) - 1)
                                          WHEN 2 THEN hi & ((1::BIGINT << nb.b) - 1)
                                          ELSE (hi >> 30) & ((1::BIGINT << nb.b) - 1) END AS bh
                          FROM sig, range(0, 4) b(b), nb),
                 ok AS (SELECT band, bh FROM band GROUP BY band, bh
                        HAVING count(*) BETWEEN 2 AND 200),
                 pairs AS (SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2,
                                  CAST(bit_count(xor(a.lo, b.lo))
                                    + bit_count(xor(a.hi, b.hi)) AS INTEGER) AS hamming
                           FROM band a JOIN band b
                             ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
                           JOIN ok o ON a.band = o.band AND a.bh = o.bh)"""

  private val q32 = GQuery(
    "q32_dedup_simhash",
    (s, d) => simhashCandidatePairs(s, d)
      .filter(col("hamming") <= SimHashHammingMax)
      .orderBy(col("doc1"), col("doc2")),
    Some(SimhashPairsSql +
      s""" SELECT doc1, doc2, hamming FROM pairs
           WHERE hamming <= $SimHashHammingMax ORDER BY doc1, doc2""")
  )

  /** q60 — duplicate-cluster resolution: connected components over the
    * MinHash candidate pairs, each document labeled with the min doc_id of
    * its component. This is the post-candidate step every dedup pipeline
    * runs (pairs → clusters → keep one representative per cluster).
    *
    * Runs Graph.connectedComponents — min-label propagation fused with
    * pointer doubling, so rounds are O(log diameter) (a chain component
    * of 10^6 docs converges in ~25 rounds, not 10^6), with eager
    * materialization every 2 rounds bounding plan lineage. The driver
    * loop only checks a scalar convergence count per round (the
    * canonical distributed-CC control flow — data never leaves the
    * executors).
    *
    * Converges to the unique fixpoint (component minimum) regardless of
    * execution schedule, so the output is deterministic and matches the
    * oracle's recursive-CTE transitive closure exactly. */
  /** Cluster labels SHARED between q60 (producer) and q78 (consumer): at
    * production scale no pipeline runs CC twice on the same edge set —
    * the labels are materialized once and every downstream view derives
    * from them (r3 verdict item 2). q60 always RECOMPUTES and re-publishes
    * (so its bench time honestly measures the CC loop every rep); q78
    * consumes the latest published relation when one exists for its
    * (session, dir) and only computes its own when run standalone. */
  private val publishedLabels =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  private def labelKey(s: SparkSession, d: String): String =
    s.sparkContext.applicationId + "|" + d
  private def computeLabels(s: SparkSession, d: String): DataFrame =
    Graph.connectedComponents(minhashPairs(s, d), "doc1", "doc2",
      vertexOut = "doc_id", componentOut = "cluster_id")
  private def publishLabels(s: SparkSession, d: String): DataFrame = {
    // materializePinned: the published relation is vertex-sized (16
    // bytes/row), must be a block scan for consumers — re-deriving would
    // rerun the whole CC loop — and outlives the producing query. The
    // displaced prior publication's blocks are released on replace
    // (q60 re-publishes every bench rep).
    val labels = graft.sources.Io.materializePinned(computeLabels(s, d))
    val old = publishedLabels.put(labelKey(s, d), labels)
    if (old != null) graft.sources.Io.unpersistMaterialized(old)
    labels
  }
  private def labelsFor(s: SparkSession, d: String): DataFrame =
    Option(publishedLabels.get(labelKey(s, d))).getOrElse(publishLabels(s, d))

  private val q60 = GQuery(
    "q60_dup_clusters",
    (s, d) => publishLabels(s, d).orderBy(col("doc_id")),
    Some(SHINGLE_SQL.replaceFirst("WITH ", "WITH RECURSIVE ") +
      """, sig AS (SELECT doc_id,
                    min(CAST(concat('0x', substr(md5('0|' || CAST(sgh AS VARCHAR)), 1, 15)) AS BIGINT)) AS h0,
                    min(CAST(concat('0x', substr(md5('1|' || CAST(sgh AS VARCHAR)), 1, 15)) AS BIGINT)) AS h1,
                    min(CAST(concat('0x', substr(md5('2|' || CAST(sgh AS VARCHAR)), 1, 15)) AS BIGINT)) AS h2,
                    min(CAST(concat('0x', substr(md5('3|' || CAST(sgh AS VARCHAR)), 1, 15)) AS BIGINT)) AS h3,
                    min(CAST(concat('0x', substr(md5('4|' || CAST(sgh AS VARCHAR)), 1, 15)) AS BIGINT)) AS h4,
                    min(CAST(concat('0x', substr(md5('5|' || CAST(sgh AS VARCHAR)), 1, 15)) AS BIGINT)) AS h5,
                    min(CAST(concat('0x', substr(md5('6|' || CAST(sgh AS VARCHAR)), 1, 15)) AS BIGINT)) AS h6,
                    min(CAST(concat('0x', substr(md5('7|' || CAST(sgh AS VARCHAR)), 1, 15)) AS BIGINT)) AS h7
                  FROM sh GROUP BY doc_id),
         band AS (SELECT doc_id, 0 AS band,
                         md5(h0 || '|' || h1 || '|' || h2 || '|' || h3) AS bh FROM sig
                  UNION ALL
                  SELECT doc_id, 1 AS band,
                         md5(h4 || '|' || h5 || '|' || h6 || '|' || h7) AS bh FROM sig),
         cand AS (SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
                  FROM band a JOIN band b
                    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
         edges AS (SELECT u, v FROM cand UNION SELECT v, u FROM cand),
         reach(src, dst) AS (
           SELECT DISTINCT u, u FROM edges
           UNION
           SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u)
         SELECT src AS doc_id, min(dst) AS cluster_id
         FROM reach GROUP BY src ORDER BY doc_id""")
  )

  /** The q60 oracle's cluster-label CTE chain (recursive closure over the
    * MinHash candidate graph), reusable by queries that CONSUME clusters. */
  private val CLUSTER_SQL = SHINGLE_SQL.replaceFirst("WITH ", "WITH RECURSIVE ") +
    """, sig AS (SELECT doc_id,
                    min(CAST(concat('0x', substr(md5('0|' || CAST(sgh AS VARCHAR)), 1, 15)) AS BIGINT)) AS h0,
                    min(CAST(concat('0x', substr(md5('1|' || CAST(sgh AS VARCHAR)), 1, 15)) AS BIGINT)) AS h1,
                    min(CAST(concat('0x', substr(md5('2|' || CAST(sgh AS VARCHAR)), 1, 15)) AS BIGINT)) AS h2,
                    min(CAST(concat('0x', substr(md5('3|' || CAST(sgh AS VARCHAR)), 1, 15)) AS BIGINT)) AS h3,
                    min(CAST(concat('0x', substr(md5('4|' || CAST(sgh AS VARCHAR)), 1, 15)) AS BIGINT)) AS h4,
                    min(CAST(concat('0x', substr(md5('5|' || CAST(sgh AS VARCHAR)), 1, 15)) AS BIGINT)) AS h5,
                    min(CAST(concat('0x', substr(md5('6|' || CAST(sgh AS VARCHAR)), 1, 15)) AS BIGINT)) AS h6,
                    min(CAST(concat('0x', substr(md5('7|' || CAST(sgh AS VARCHAR)), 1, 15)) AS BIGINT)) AS h7
                  FROM sh GROUP BY doc_id),
         band AS (SELECT doc_id, 0 AS band,
                         md5(h0 || '|' || h1 || '|' || h2 || '|' || h3) AS bh FROM sig
                  UNION ALL
                  SELECT doc_id, 1 AS band,
                         md5(h4 || '|' || h5 || '|' || h6 || '|' || h7) AS bh FROM sig),
         cand AS (SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
                  FROM band a JOIN band b
                    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
         edges AS (SELECT u, v FROM cand UNION SELECT v, u FROM cand),
         reach(src, dst) AS (
           SELECT DISTINCT u, u FROM edges
           UNION
           SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u),
         labels AS (SELECT src AS doc_id, min(dst) AS cluster_id
                    FROM reach GROUP BY src)"""

  /** q78 — duplicate-cluster representative selection (wave 3): the step
    * AFTER q60 in every dedup pipeline — pick ONE document to keep per
    * cluster. Policy: keep the longest version (max n_chars, ties to the
    * smallest doc_id) — the standard "keep the most complete copy" rule.
    *
    * Scale notes: consumes the vertex-sized cluster labels (already
    * LSH-reduced) PUBLISHED BY q60 — one CC execution per pipeline run,
    * not one per view (r3 verdict item 2); joins the corpus only on
    * doc_id to fetch one integer attribute, then a single argmax
    * AGGREGATE per cluster (max_by over a (n_chars, -doc_id) struct) —
    * no per-cluster window, no data-sized partitions, exactly the q73
    * MERGE argmax pattern. */
  private val q78 = GQuery(
    "q78_dedup_keep_best",
    (s, d) =>
      labelsFor(s, d)
        .join(Tables.documents(s, d).select(col("doc_id"), col("n_chars")), "doc_id")
        .groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("n_docs"),
          max(col("n_chars")).as("max_chars"),
          max_by(col("doc_id"), struct(col("n_chars"), -col("doc_id"))).as("kept_doc"))
        .orderBy(col("cluster_id")),
    Some(CLUSTER_SQL +
      """, sel AS (SELECT cluster_id, doc_id, n_chars,
                          row_number() OVER (PARTITION BY cluster_id
                            ORDER BY n_chars DESC, doc_id) AS rk
                   FROM labels JOIN documents USING (doc_id))
         SELECT cluster_id, count(*) AS n_docs, max(n_chars) AS max_chars,
                max(CASE WHEN rk = 1 THEN doc_id END) AS kept_doc
         FROM sel GROUP BY cluster_id ORDER BY cluster_id""")
  )

  /** q79 — MinHash estimation-accuracy audit (wave 3): for every LSH
    * candidate pair, the sketch's Jaccard ESTIMATE (agreeing signature
    * components / k) next to the TRUE shingle-set Jaccard, with the
    * absolute error. The sketch-quality report a pipeline publishes when
    * tuning (k, bands) — it quantifies, in-engine, what the q31 candidate
    * generation actually trades away.
    *
    * Determinism: the estimate is an integer count / 8 (exact eighths in
    * binary); the true Jaccard is an integer ratio; both round(6) after
    * one IEEE division — oracle-exact.
    *
    * Scale notes: signatures aggregate per doc from the capped shingle
    * postings (one doc-keyed shuffle); true-overlap counts come from the
    * same postings relation joined on the 8-byte shingle hash — both
    * relations are the LSH family's existing shapes; everything downstream
    * joins on the candidate-pair relation, which is duplicate-sized. */
  private val q79 = GQuery(
    "q79_minhash_accuracy",
    (s, d) => {
      // ONE evaluation of the shingle pipeline: this audit consumes the
      // posting relation five times (signatures, sizes, both sides of the
      // overlap self-join, candidate generation), and Spark does not
      // reuse exchanges across repeated subtree references — the
      // PUBLISHED standing index pins the narrow (sgh, doc_id) relation
      // once for the whole family and every consumer reads the blocks.
      val sh = postingsFor(s, d)
      val sigs = graft.sources.Io.materialize(sh.groupBy(col("doc_id"))
        .agg(TextOps.minhash(col("sgh"), 0).as("h0"),
          (1 until MINHASH_K).map(i => TextOps.minhash(col("sgh"), i).as(s"h$i")): _*))
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("nsh"))
      // candidate pairs derived from the SAME signature relation (band
      // hashing identical to CorpusOps.minhashCandidates, which q31
      // proves against the oracle); materialized because THREE consumers
      // read it (candidate-doc semi-join, signature probe, final join)
      val rowsPerBand = MINHASH_K / 2
      val bandStructs = (0 until 2).map { b =>
        val cols = (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"h$i"))
        struct(lit(b).as("band"), md5(concat_ws("|", cols: _*)).as("bh"))
      }
      val pairs = graft.sources.Io.materialize(
        sigs.select(col("doc_id"), explode(array(bandStructs: _*)).as("e"))
          .select(col("doc_id"), col("e.band").as("band"), col("e.bh").as("bh"))
          .groupBy(col("band"), col("bh"))
          .agg(sort_array(collect_list(col("doc_id"))).as("docs"))
          .filter(size(col("docs")) >= 2)
          .select(explode(TextOps.orderedPairs(col("docs"))).as("p"))
          .select(col("p.d1").as("doc1"), col("p.d2").as("doc2"))
          .distinct())
      // TRUE-Jaccard overlap restricted to CANDIDATE docs (r3 verdict
      // item 5): the audit only reports candidate pairs, so computing
      // `common` for every co-shingle pair in the corpus is pure waste —
      // semi-join the posting relation down to docs that appear in some
      // candidate pair FIRST, making the heavy sgh self-join candidate-
      // sized. At 100 TB candidates are the LSH-reduced near-dup set,
      // orders of magnitude smaller than the corpus.
      val candDocs = pairs.select(col("doc1").as("doc_id"))
        .union(pairs.select(col("doc2").as("doc_id")))
        .distinct()
      val shCand = sh.join(candDocs, Seq("doc_id"), "left_semi")
      val common = shCand.as("a").join(shCand.as("b"),
          col("a.sgh") === col("b.sgh") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"))
        .agg(count(lit(1)).as("common"))
      val withSigs = pairs
        .join(sigs.toDF("doc1" +: (0 until MINHASH_K).map(i => s"a$i"): _*), "doc1")
        .join(sigs.toDF("doc2" +: (0 until MINHASH_K).map(i => s"b$i"): _*), "doc2")
      val matches = (0 until MINHASH_K)
        .map(i => when(col(s"a$i") === col(s"b$i"), 1).otherwise(0))
        .reduce(_ + _)
      withSigs
        .join(common, Seq("doc1", "doc2"), "left")
        .join(sizes.toDF("doc1", "nsh1"), "doc1")
        .join(sizes.toDF("doc2", "nsh2"), "doc2")
        .withColumn("est_jaccard", round(matches / lit(MINHASH_K.toDouble), 6))
        .withColumn("jaccard", round(coalesce(col("common"), lit(0L)) /
          (col("nsh1") + col("nsh2") - coalesce(col("common"), lit(0L))), 6))
        .select(col("doc1"), col("doc2"), col("est_jaccard"), col("jaccard"),
          round(abs(col("est_jaccard") - col("jaccard")), 6).as("abs_err"))
        .orderBy(col("doc1"), col("doc2"))
    },
    Some(SHINGLE_SQL +
      """, sig AS (SELECT doc_id,
                    min(CAST(concat('0x', substr(md5('0|' || CAST(sgh AS VARCHAR)), 1, 15)) AS BIGINT)) AS h0,
                    min(CAST(concat('0x', substr(md5('1|' || CAST(sgh AS VARCHAR)), 1, 15)) AS BIGINT)) AS h1,
                    min(CAST(concat('0x', substr(md5('2|' || CAST(sgh AS VARCHAR)), 1, 15)) AS BIGINT)) AS h2,
                    min(CAST(concat('0x', substr(md5('3|' || CAST(sgh AS VARCHAR)), 1, 15)) AS BIGINT)) AS h3,
                    min(CAST(concat('0x', substr(md5('4|' || CAST(sgh AS VARCHAR)), 1, 15)) AS BIGINT)) AS h4,
                    min(CAST(concat('0x', substr(md5('5|' || CAST(sgh AS VARCHAR)), 1, 15)) AS BIGINT)) AS h5,
                    min(CAST(concat('0x', substr(md5('6|' || CAST(sgh AS VARCHAR)), 1, 15)) AS BIGINT)) AS h6,
                    min(CAST(concat('0x', substr(md5('7|' || CAST(sgh AS VARCHAR)), 1, 15)) AS BIGINT)) AS h7
                  FROM sh GROUP BY doc_id),
         band AS (SELECT doc_id, 0 AS band,
                         md5(h0 || '|' || h1 || '|' || h2 || '|' || h3) AS bh FROM sig
                  UNION ALL
                  SELECT doc_id, 1 AS band,
                         md5(h4 || '|' || h5 || '|' || h6 || '|' || h7) AS bh FROM sig),
         cand AS (SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
                  FROM band a JOIN band b
                    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
         sizes AS (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY doc_id),
         com AS (SELECT a.doc_id AS doc1, b.doc_id AS doc2, count(*) AS common
                 FROM sh a JOIN sh b ON a.sgh = b.sgh AND a.doc_id < b.doc_id
                 GROUP BY 1, 2),
         est AS (SELECT c.doc1, c.doc2,
                        ((CASE WHEN x.h0 = y.h0 THEN 1 ELSE 0 END) +
                         (CASE WHEN x.h1 = y.h1 THEN 1 ELSE 0 END) +
                         (CASE WHEN x.h2 = y.h2 THEN 1 ELSE 0 END) +
                         (CASE WHEN x.h3 = y.h3 THEN 1 ELSE 0 END) +
                         (CASE WHEN x.h4 = y.h4 THEN 1 ELSE 0 END) +
                         (CASE WHEN x.h5 = y.h5 THEN 1 ELSE 0 END) +
                         (CASE WHEN x.h6 = y.h6 THEN 1 ELSE 0 END) +
                         (CASE WHEN x.h7 = y.h7 THEN 1 ELSE 0 END)) AS m,
                        coalesce(com.common, 0) AS common, s1.nsh AS nsh1, s2.nsh AS nsh2
                 FROM cand c
                 JOIN sig x ON c.doc1 = x.doc_id
                 JOIN sig y ON c.doc2 = y.doc_id
                 LEFT JOIN com ON c.doc1 = com.doc1 AND c.doc2 = com.doc2
                 JOIN sizes s1 ON c.doc1 = s1.doc_id
                 JOIN sizes s2 ON c.doc2 = s2.doc_id)
         SELECT doc1, doc2,
                round(m / 8.0, 6) AS est_jaccard,
                round(common * 1.0 / (nsh1 + nsh2 - common), 6) AS jaccard,
                round(abs(round(m / 8.0, 6) - round(common * 1.0 / (nsh1 + nsh2 - common), 6)), 6) AS abs_err
         FROM est ORDER BY doc1, doc2""")
  )

  /** The candidate-graph CTE chain (shingles → signatures → bands → LSH
    * candidate pairs as (u, v)) shared by graph-consumer oracles. */
  private[operators] val CAND_SQL: String = SHINGLE_SQL +
    """, sig AS (SELECT doc_id,
                    min(CAST(concat('0x', substr(md5('0|' || CAST(sgh AS VARCHAR)), 1, 15)) AS BIGINT)) AS h0,
                    min(CAST(concat('0x', substr(md5('1|' || CAST(sgh AS VARCHAR)), 1, 15)) AS BIGINT)) AS h1,
                    min(CAST(concat('0x', substr(md5('2|' || CAST(sgh AS VARCHAR)), 1, 15)) AS BIGINT)) AS h2,
                    min(CAST(concat('0x', substr(md5('3|' || CAST(sgh AS VARCHAR)), 1, 15)) AS BIGINT)) AS h3,
                    min(CAST(concat('0x', substr(md5('4|' || CAST(sgh AS VARCHAR)), 1, 15)) AS BIGINT)) AS h4,
                    min(CAST(concat('0x', substr(md5('5|' || CAST(sgh AS VARCHAR)), 1, 15)) AS BIGINT)) AS h5,
                    min(CAST(concat('0x', substr(md5('6|' || CAST(sgh AS VARCHAR)), 1, 15)) AS BIGINT)) AS h6,
                    min(CAST(concat('0x', substr(md5('7|' || CAST(sgh AS VARCHAR)), 1, 15)) AS BIGINT)) AS h7
                  FROM sh GROUP BY doc_id),
         band AS (SELECT doc_id, 0 AS band,
                         md5(h0 || '|' || h1 || '|' || h2 || '|' || h3) AS bh FROM sig
                  UNION ALL
                  SELECT doc_id, 1 AS band,
                         md5(h4 || '|' || h5 || '|' || h6 || '|' || h7) AS bh FROM sig),
         cand AS (SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
                  FROM band a JOIN band b
                    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id)"""

  /** One PageRank iteration as a chained (non-recursive) CTE — the exact
    * integer update rule of Graph.pageRankScaled with `//` in place of
    * Spark's `div`; both truncate toward zero and all values are
    * non-negative, so the arithmetic is bit-identical. */
  private def prIterSql(k: Int): String = {
    val prev = if (k == 1) "r0" else s"r${k - 1}"
    s""", r$k AS MATERIALIZED (SELECT nd.gu,
            ((15 * (1000000000000 // (SELECT n FROM np))) // 100)
            + ((85 * coalesce(s.s, 0)) // 100) AS rank
          FROM nodes nd LEFT JOIN (
            SELECT e.gv AS gu, sum(r.rank // d.deg) AS s
            FROM e JOIN $prev r ON e.gu = r.gu JOIN deg d ON e.gu = d.gu
            GROUP BY e.gv) s ON nd.gu = s.gu)"""
  }

  /** q86 — duplicate-graph PageRank (wave 4): rank every document in the
    * near-dup candidate graph by 5 damped PageRank iterations, in scaled
    * exact-integer arithmetic (Graph.pageRankScaled). The curation use:
    * a document's rank in the duplicate graph measures how CENTRAL it is
    * to a template family — high-rank nodes are boilerplate hubs (the
    * thing to down-weight or keep exactly once), rank ≈ teleport means
    * incidental similarity. Complements q60/q78: CC says WHICH cluster,
    * PageRank says HOW HUB-LIKE within it. */
  private val q86 = GQuery(
    "q86_pagerank",
    (s, d) =>
      Graph.pageRankScaled(minhashPairs(s, d), "doc1", "doc2", iters = 5)
        .select(col("vertex").as("doc_id"), col("rank_scaled"))
        .orderBy(col("doc_id")),
    // MATERIALIZED throughout: DuckDB inlines plain CTEs per reference,
    // and the 5 chained iterations reference e/deg/nodes/np each — an
    // inlined plan re-evaluates the whole LSH candidate chain ~16× and
    // spilled >70 GB at sf1 (the r12 q203 oracle lesson, found by the
    // r13 standing full-registry sf1 sweep). Hints only — values and
    // the engine side are untouched.
    Some(CAND_SQL +
      """, e AS MATERIALIZED (SELECT u AS gu, v AS gv FROM cand
                 UNION SELECT v AS gu, u AS gv FROM cand),
         deg AS MATERIALIZED (SELECT gu, count(*) AS deg FROM e GROUP BY gu),
         nodes AS MATERIALIZED (SELECT DISTINCT gu FROM e),
         np AS MATERIALIZED (SELECT count(*) AS n FROM nodes),
         r0 AS MATERIALIZED (SELECT gu, (1000000000000 // (SELECT n FROM np)) AS rank FROM nodes)""" +
      (1 to 5).map(prIterSql).mkString +
      // CAST: DuckDB's sum() widens to HUGEINT and the width propagates
      // through the iterations; values stay < scale so BIGINT is exact
      """ SELECT gu AS doc_id, CAST(rank AS BIGINT) AS rank_scaled
          FROM r5 ORDER BY doc_id""")
  )

  /** q97 — duplicate-graph degree histogram (wave 5): how many documents
    * have k LSH candidate partners, for each k. The corpus-health report
    * behind every dedup run: a long high-degree tail means template
    * families (boilerplate hubs) and predicts CC cluster sizes, band-cap
    * hit rates, and how much q78's keep-best pass will remove — the
    * statistic one checks BEFORE committing a 100 TB dedup pass.
    *
    * Scale notes: the candidate relation fans out 2× map-side (one
    * explode — the pair subplan is evaluated once, not self-unioned),
    * the degree aggregate is keyed by doc (|docs|-sized with partial
    * combine), and the histogram aggregate is degree-bounded (≤ max
    * degree rows). No windows, no joins. */
  private val q97 = GQuery(
    "q97_dup_graph_degree",
    (s, d) =>
      minhashPairs(s, d)
        .select(explode(array(col("doc1"), col("doc2"))).as("doc_id"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("degree"))
        .groupBy(col("degree")).agg(count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
        .orderBy(col("degree")),
    Some(CAND_SQL +
      """, deg AS (SELECT doc_id, count(*) AS degree
                   FROM (SELECT u AS doc_id FROM cand
                         UNION ALL SELECT v AS doc_id FROM cand)
                   GROUP BY doc_id)
         SELECT degree, count(*) AS n_docs,
                min(doc_id) AS min_doc, max(doc_id) AS max_doc
         FROM deg GROUP BY degree ORDER BY degree""")
  )

  /** q100 — incremental near-dup admission (wave 5): dedup an INCOMING
    * ingest batch (here: doc_id ≡ 7 mod 10 — the driver-reproducible
    * stand-in for "today's crawl") against the standing corpus WITHOUT
    * re-pairing the corpus: the batch's LSH bands probe the corpus band
    * index, yielding exactly the candidate pairs with ≥1 new endpoint
    * (new×old and new×new — the batch dedups against corpus ∪ batch).
    *
    * This is how a 100 TB corpus actually stays deduplicated: the full
    * q31 pass runs once, after which every ingest runs THIS — probe-side
    * work scales with the batch, not the corpus. The band index is
    * materialized (Io.materialize) exactly as production would keep it
    * (s11's streaming deltas are the maintenance story for the same
    * relation); the probe side is batch-sized, so AQE broadcasts it at
    * measured size and the corpus side never reshuffles at fixture
    * scale. Old×old pairs are never generated — not generated-then-
    * filtered. */
  private val q100 = GQuery(
    "q100_incremental_dedup",
    (s, d) => {
      // the standing band index IS the published family relation — q100
      // probes the same materialized blocks q31 produced
      val bands = bandsFor(s, d)
      val probe = bands.filter(col("doc_id") % 10 === 7)
        .select(col("band"), col("bh"), col("doc_id").as("new_id"))
      probe.join(bands, Seq("band", "bh"))
        .filter(col("doc_id") =!= col("new_id"))
        .select(least(col("new_id"), col("doc_id")).as("doc1"),
          greatest(col("new_id"), col("doc_id")).as("doc2"))
        .distinct()
        .orderBy(col("doc1"), col("doc2"))
    },
    Some(CAND_SQL +
      """ SELECT u AS doc1, v AS doc2 FROM cand
          WHERE u % 10 = 7 OR v % 10 = 7 ORDER BY doc1, doc2""")
  )

  /** q104 — novelty audit / orphan documents (wave 5): documents that
    * share NO shingle with any other document (under the same
    * stop-shingle cap as q25 — oversized buckets carry no discriminating
    * signal and are excluded symmetrically in the oracle). The
    * complement of the dedup family: q31/q60 find what repeats, q104
    * certifies what is genuinely novel — the slice of a crawl worth
    * up-weighting, and the negative control for dedup-recall audits.
    * Shingle-less documents (< 5 tokens) are trivially orphan.
    *
    * Scale notes: the shingle relation is the PUBLISHED standing index
    * (postingsFor) and feeds both the bucket-count aggregate and the
    * membership semi-join; the anti join runs against the |docs|-sized
    * id relation. No pair generation anywhere — novelty needs bucket
    * MEMBERSHIP, not pairs. */
  private val q104 = GQuery(
    "q104_shingle_orphans",
    (s, d) => {
      val sh = postingsFor(s, d)
      val sharedShingles = sh.groupBy(col("sgh"))
        .agg(count(lit(1)).as("n")).filter(col("n") >= 2)
        .select(col("sgh"))
      val sharedDocs = sh.join(sharedShingles, Seq("sgh"), "left_semi")
        .select(col("doc_id")).distinct()
      Tables.documents(s, d)
        .join(sharedDocs, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))
    },
    Some(SHINGLE_SQL +
      """, shared AS (SELECT DISTINCT doc_id FROM sh
                      WHERE sgh IN (SELECT sgh FROM sh
                                    GROUP BY sgh HAVING count(*) >= 2))
         SELECT doc_id, lang, n_chars FROM documents
         WHERE doc_id NOT IN (SELECT doc_id FROM shared)
         ORDER BY doc_id""")
  )

  /** q111 — duplicate-graph triangle census (wave 5): per-document
    * triangle participation counts in the LSH candidate graph. Triangles
    * separate TEMPLATE FAMILIES (mutually-similar cliques — the thing to
    * collapse to one representative) from chains of incidental pairwise
    * similarity; together with q97's degrees and q86's PageRank this
    * completes the dedup-graph diagnostics: degree says how connected,
    * rank says how central, triangles say how CLIQUE-LIKE.
    *
    * Scale notes: the classic two-join kernel — wedges from an oriented
    * edge self-join, closed against the edge relation on the (v, w) pair
    * key — with edges DEGREE-oriented (r6): u→v iff (deg u, u) <
    * (deg v, v), which caps every out-degree at O(√m) and wedge volume
    * at O(m^1.5) even if a band-cap change ever admits a hot vertex;
    * the band caps were the only bound under the old id orientation.
    * The oriented edge relation is materialized once and feeds all
    * three roles (Graph.triangleCensus). */
  private val q111 = GQuery(
    "q111_triangle_census",
    (s, d) =>
      Graph.triangleCensus(minhashPairs(s, d), "doc1", "doc2")
        .select(col("vertex").as("doc_id"), col("n_triangles"))
        .orderBy(col("doc_id")),
    Some(CAND_SQL +
      """, tri AS (SELECT a.u AS x, a.v AS y, b.v AS z
                   FROM cand a JOIN cand b ON a.u = b.u AND a.v < b.v
                   JOIN cand c ON c.u = a.v AND c.v = b.v)
         SELECT doc_id, count(*) AS n_triangles
         FROM (SELECT x AS doc_id FROM tri
               UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri)
         GROUP BY doc_id ORDER BY doc_id""")
  )

  /** q117 — exact shared-SPAN near-duplication (round 7): longest run of
    * consecutive identical tokens per document pair, via
    * CorpusOps.sharedSpans (positional 8-shingles → capped bucket pairs →
    * gaps-and-islands at constant offset). The span-level complement of
    * the family: q25/q31 score whole-document set similarity, q74 counts
    * fixed 20-token passages corpus-wide; this reports the maximal
    * verbatim run BETWEEN a specific pair — the operator behind
    * substring-level dedup (Lee et al. 2022), quote/boilerplate
    * detection, and provenance tracing. Thresholds: 8-token shingles,
    * spans >= 12 tokens, bucket cap 64 (scale notes on the operator). */
  private val q117 = GQuery(
    "q117_span_dedup",
    (s, d) =>
      CorpusOps.sharedSpans(Tables.documents(s, d), "doc_id", "text",
          n = 8, bucketCap = 64, minSpanTokens = 12)
        .orderBy(col("doc_id1"), col("doc_id2")),
    Some("""WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
            p AS (SELECT doc_id,
                    unnest(range(1, len(toks)-6)) AS pos,
                    unnest(list_transform(range(1, len(toks)-6),
                      i -> CAST(concat('0x', substr(md5(array_to_string(toks[i:i+7],' ')),1,15)) AS BIGINT))) AS sgh
                  FROM t WHERE len(toks) >= 8),
            q AS (SELECT p.* FROM p JOIN (SELECT sgh FROM p GROUP BY sgh
                                          HAVING count(*) <= 64) k USING (sgh)),
            m AS (SELECT a.doc_id AS doc_id1, b.doc_id AS doc_id2,
                         a.pos AS p1, b.pos AS p2
                  FROM q a JOIN q b ON a.sgh = b.sgh AND a.doc_id < b.doc_id),
            i AS (SELECT doc_id1, doc_id2, p1, p1-p2 AS off,
                         p1 - row_number() OVER (PARTITION BY doc_id1, doc_id2, p1-p2
                                                 ORDER BY p1) AS grp
                  FROM m),
            s AS (SELECT doc_id1, doc_id2, off, grp, count(*) + 7 AS span_tokens
                  FROM i GROUP BY doc_id1, doc_id2, off, grp)
            SELECT doc_id1, doc_id2, max(span_tokens) AS longest_span,
                   count(*) AS n_spans
            FROM s WHERE span_tokens >= 12
            GROUP BY doc_id1, doc_id2 ORDER BY doc_id1, doc_id2""")
  )

  /** q138 — k-core decomposition of the duplicate graph (3 synchronous
    * peel rounds, k = 2): iteratively remove vertices of degree < k and
    * the edges they carry, reporting survivors per round. The dense-core
    * extractor run after q97's degree histogram flags a template family:
    * tendrils and chains (pairwise near-dups) peel away, what remains is
    * the mutually-interconnected boilerplate core — the cluster a
    * curation pass reviews as a unit rather than pair by pair. Peeling is
    * idempotent at the fixpoint, so a converged graph just repeats its
    * numbers — no driver-side convergence branching.
    *
    * Scale notes: each round is one vertex-keyed degree aggregate
    * (map-side combine) and two vertex-keyed semi-joins of the edge
    * relation against the surviving-vertex set — the q60/q86 iteration
    * shape; rounds materialize so round r+1 scans round r, and state
    * never exceeds the (already band-capped) candidate-edge relation.
    * The round count is a constant (3), matching the oracle's unrolled
    * CTE chain. */
  private val KCoreK = 2
  private val q138 = GQuery(
    "q138_kcore",
    (s, d) => {
      import s.implicits._
      var edges = graft.sources.Io.materialize(minhashPairs(s, d))
      val stats = (1 to 3).map { r =>
        val deg = edges
          .select(explode(array(col("doc1"), col("doc2"))).as("x"))
          .groupBy(col("x")).agg(count(lit(1)).as("deg"))
        val keep = graft.sources.Io.materialize(
          deg.filter(col("deg") >= KCoreK).select(col("x")))
        edges = graft.sources.Io.materialize(edges
          .join(keep.withColumnRenamed("x", "doc1"), "doc1")
          .join(keep.withColumnRenamed("x", "doc2"), "doc2")
          .select(col("doc1"), col("doc2")))
        (r, keep.count(), edges.count())
      }
      stats.toDF("round", "vertices_remaining", "edges_remaining")
        .orderBy(col("round"))
    },
    {
      // every CTE is MATERIALIZED: the peel chain references each round's
      // relation several times (degree union, two keep joins, the count),
      // and DuckDB 1.0 inlines CTEs by default — without materialization
      // the md5 candidate chain re-evaluates per reference and the plan
      // explodes (measured: temp-spill failure at sf1; with
      // materialization the whole oracle is seconds)
      def round(r: Int): String = {
        val prev = if (r == 1) "e0" else s"e${r - 1}"
        s"""deg$r AS MATERIALIZED (SELECT x, count(*) AS deg
                      FROM (SELECT doc1 AS x FROM $prev
                            UNION ALL SELECT doc2 FROM $prev) GROUP BY x),
            keep$r AS MATERIALIZED (SELECT x FROM deg$r WHERE deg >= $KCoreK),
            e$r AS MATERIALIZED (SELECT doc1, doc2 FROM $prev
                    JOIN keep$r a ON $prev.doc1 = a.x
                    JOIN keep$r b ON $prev.doc2 = b.x)"""
      }
      Some(CAND_SQL +
        s""", e0 AS MATERIALIZED (SELECT u AS doc1, v AS doc2 FROM cand),
           ${round(1)}, ${round(2)}, ${round(3)}
           SELECT * FROM (
             SELECT CAST(1 AS INTEGER) AS round,
                    (SELECT count(*) FROM keep1) AS vertices_remaining,
                    (SELECT count(*) FROM e1) AS edges_remaining
             UNION ALL
             SELECT CAST(2 AS INTEGER),
                    (SELECT count(*) FROM keep2), (SELECT count(*) FROM e2)
             UNION ALL
             SELECT CAST(3 AS INTEGER),
                    (SELECT count(*) FROM keep3), (SELECT count(*) FROM e3))
           ORDER BY round""")
    }
  )

  /** q146 — LSH recall/precision curve: at Jaccard thresholds
    * 0.2/0.4/0.6/0.8, how many truly-similar pairs does the q31
    * candidate generation CATCH (recall), and how much of the candidate
    * set is truly similar at that bar (precision)? q79 audits the
    * sketch's per-pair ESTIMATE error; this audits the BLOCKING — the
    * table one actually reads to choose (k, bands) before a 100 TB run,
    * where a recall miss is silent corpus duplication and a precision
    * miss is wasted verification compute.
    *
    * Ground truth is the all-pairs shingle-Jaccard relation (the q25
    * machinery without its 0.2 emission filter — bounded by the same
    * stop-shingle cap, so "truth" here means truth over surviving
    * shingles, stated honestly); candidates are the published q31
    * relation. Jaccards are rounded to 6 before thresholding on both
    * sides, so the boundary test is identical cross-engine.
    *
    * Scale notes: both inputs are the family's existing bounded
    * relations (truth = in-bucket pairs under the cap, candidates =
    * band pairs under the cap); the curve is 4 × conditional-count
    * aggregates over those pair relations after one marker left-join —
    * nothing new moves. */
  private val RecallThresholds = Seq(0.2, 0.4, 0.6, 0.8)
  private val q146 = GQuery(
    "q146_lsh_recall_curve",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val shN = postingsFor(s, d)
        .withColumn("nsh", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      val truth = Io.materialize(shN.groupBy(col("sgh"))
        .agg(sort_array(collect_list(struct(col("doc_id"), col("nsh")))).as("docs"))
        .select(explode(orderedPairs(col("docs"))).as("p"))
        .groupBy(col("p.d1.doc_id").as("doc1"), col("p.d1.nsh").as("nsh1"),
          col("p.d2.doc_id").as("doc2"), col("p.d2.nsh").as("nsh2"))
        .agg(count(lit(1)).as("common"))
        .select(col("doc1"), col("doc2"),
          round(col("common") / (col("nsh1") + col("nsh2") - col("common")), 6)
            .as("j")))
      val cand = minhashPairs(s, d).withColumn("isc", lit(1))
      val truthC = Io.materialize(
        truth.join(cand, Seq("doc1", "doc2"), "left"))
      val candJ = Io.materialize(
        cand.join(truth, Seq("doc1", "doc2"), "left")
          .withColumn("j", coalesce(col("j"), lit(0.0))))
      val th = RecallThresholds.toDF("threshold")
      val rec = th.crossJoin(truthC).groupBy(col("threshold"))
        .agg(sum(when(col("j") >= col("threshold"), 1L).otherwise(0L)).as("n_true"),
          sum(when(col("j") >= col("threshold") && col("isc").isNotNull, 1L)
            .otherwise(0L)).as("n_caught"))
      val prec = th.crossJoin(candJ).groupBy(col("threshold"))
        .agg(count(lit(1)).as("n_cand"),
          sum(when(col("j") >= col("threshold"), 1L).otherwise(0L)).as("n_prec"))
      rec.join(prec, "threshold")
        .select(col("threshold"), col("n_true"), col("n_caught"),
          when(col("n_true") > 0,
            round(col("n_caught").cast("double") / col("n_true"), 6)).as("recall"),
          col("n_cand"),
          when(col("n_cand") > 0,
            round(col("n_prec").cast("double") / col("n_cand"), 6)).as("precision"))
        .orderBy(col("threshold"))
    },
    Some(CAND_SQL +
      """, sizes AS (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY doc_id),
         tp AS MATERIALIZED (
               SELECT doc1, doc2,
                      round(common * 1.0 / (s1.nsh + s2.nsh - common), 6) AS j
               FROM (SELECT a.doc_id AS doc1, b.doc_id AS doc2, count(*) AS common
                     FROM sh a JOIN sh b ON a.sgh = b.sgh AND a.doc_id < b.doc_id
                     GROUP BY 1, 2) p
               JOIN sizes s1 ON doc1 = s1.doc_id
               JOIN sizes s2 ON doc2 = s2.doc_id),
         cd AS MATERIALIZED (SELECT u AS doc1, v AS doc2 FROM cand),
         tc AS (SELECT tp.j, (cd.doc1 IS NOT NULL) AS isc
                FROM tp LEFT JOIN cd USING (doc1, doc2)),
         cj AS (SELECT coalesce(tp.j, 0.0) AS j
                FROM cd LEFT JOIN tp USING (doc1, doc2)),
         th AS (SELECT CAST(unnest([0.2, 0.4, 0.6, 0.8]) AS DOUBLE) AS threshold),
         r AS (SELECT threshold,
                      count(*) FILTER (WHERE j >= threshold) AS n_true,
                      count(*) FILTER (WHERE j >= threshold AND isc) AS n_caught
               FROM th, tc GROUP BY threshold),
         p AS (SELECT threshold, count(*) AS n_cand,
                      count(*) FILTER (WHERE j >= threshold) AS n_prec
               FROM th, cj GROUP BY threshold)
         SELECT r.threshold, n_true, n_caught,
                CASE WHEN n_true > 0
                     THEN round(n_caught * 1.0 / n_true, 6) END AS recall,
                n_cand,
                CASE WHEN n_cand > 0
                     THEN round(n_prec * 1.0 / n_cand, 6) END AS precision
         FROM r JOIN p USING (threshold)
         ORDER BY r.threshold""")
  )

  /** q147 — exact modularity of the duplicate-cluster partition: the
    * clustering-quality score of q60's connected components over the
    * candidate graph. For a CC partition every edge is intra-cluster, so
    * Q = 1 − Σ_c d_c²/(2m)² — and multiplying through by 4m² keeps the
    * whole statistic INTEGER (Q·4m² = 4m² − Σd_c², exact in any order)
    * until one display division. Near-zero modularity means the "dup
    * graph" is one blob (banding too loose / boilerplate hub — act
    * before q78 keeps one doc per mega-cluster); high modularity means
    * well-separated duplicate families.
    *
    * Scale notes: consumes the PUBLISHED label relation (one CC run per
    * pipeline, the q60 contract) and the band-capped edge relation; one
    * vertex-keyed degree aggregate, one label join (vertex-sized), one
    * |components|-group aggregate, exact-decimal 1-row reduction. */
  private val q147 = GQuery(
    "q147_modularity",
    (s, d) => {
      val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
      val edges = minhashPairs(s, d)
      val deg = edges
        .select(explode(array(col("doc1"), col("doc2"))).as("v"))
        .groupBy(col("v")).agg(count(lit(1)).as("deg"))
      val dc = labelsFor(s, d)
        .join(deg, col("doc_id") === col("v"))
        .groupBy(col("cluster_id"))
        .agg(sum(col("deg")).as("d_c"), count(lit(1)).as("n_v"))
      val m = edges.agg(count(lit(1)).as("m"))
      dc.agg(count(lit(1)).as("n_components"),
          sum(col("n_v")).as("n_vertices"),
          // decimal-operand product (ADVICE r7): a LongType d_c² wraps
          // silently past ~3e9 while the oracle multiplies in HUGEINT
          sum(col("d_c").cast(dec38) * col("d_c").cast(dec38)).as("sum_dc2"))
        .crossJoin(broadcast(m))
        .select(col("m").as("n_edges"), col("n_vertices"),
          col("n_components"),
          when(col("m") > 0, round(
            (lit(4).cast(dec38) * col("m").cast(dec38) * col("m").cast(dec38)
              - col("sum_dc2")).cast("double")
              / (lit(4.0) * col("m") * col("m")), 6)).as("modularity"))
    },
    Some(CLUSTER_SQL +
      """, deg AS (SELECT x AS v, count(*) AS deg
                   FROM (SELECT u AS x FROM cand
                         UNION ALL SELECT v FROM cand) GROUP BY x),
         dc AS (SELECT cluster_id, CAST(sum(deg) AS BIGINT) AS d_c,
                       count(*) AS n_v
                FROM labels JOIN deg ON labels.doc_id = deg.v
                GROUP BY cluster_id),
         mm AS (SELECT count(*) AS m FROM cand),
         agg AS (SELECT count(*) AS n_components,
                        CAST(sum(n_v) AS BIGINT) AS n_vertices,
                        CAST(sum(CAST(d_c AS HUGEINT) * d_c) AS HUGEINT)
                          AS sum_dc2
                 FROM dc)
         SELECT m AS n_edges, n_vertices, n_components,
                CASE WHEN m > 0 THEN
                  round(CAST(4 * CAST(m AS HUGEINT) * m - sum_dc2 AS DOUBLE)
                        / (4.0 * m * m), 6) END AS modularity
         FROM agg, mm""")
  )

  /** q149 — asymmetric containment dedup (round 8 wave 13): for every
    * co-shingle candidate pair, |A∩B| / min(|A|,|B|) — the fraction of
    * the SMALLER document's shingles present in the larger. Jaccard
    * (q25) misses subset-style duplication by construction: a page
    * quoted whole inside a 100×-larger page has Jaccard ≈ 0.01 but
    * containment 1.0, and training-data pipelines dedup exactly that
    * shape (boilerplate inclusion, quotation, doc-in-doc aggregation).
    * Reports both scores plus which doc is the contained one, so the
    * keep-policy (usually: keep the superset) is one filter away.
    *
    * Scale notes: pure consumer of the published standing index
    * (postings materialized once per session/dir — q25 is the producer);
    * candidate generation is the same in-bucket orderedPairs as the rest
    * of the family (never a doc×doc self-join); the per-pair aggregate
    * carries an 8-byte count. Same shape as q25 — one more column of
    * arithmetic on the identical relation. */
  private val q149 = GQuery(
    "q149_containment_dedup",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val shN = postingsFor(s, d)
        .withColumn("nsh", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      shN.groupBy(col("sgh"))
        .agg(sort_array(collect_list(struct(col("doc_id"), col("nsh")))).as("docs"))
        .select(explode(orderedPairs(col("docs"))).as("p"))
        .groupBy(col("p.d1.doc_id").as("doc1"), col("p.d1.nsh").as("nsh1"),
          col("p.d2.doc_id").as("doc2"), col("p.d2.nsh").as("nsh2"))
        .agg(count(lit(1)).as("common"))
        .withColumn("containment",
          col("common") / least(col("nsh1"), col("nsh2")))
        .filter(col("containment") >= 0.5)
        .select(col("doc1"), col("doc2"),
          round(col("containment"), 6).as("containment"),
          round(col("common") /
            (col("nsh1") + col("nsh2") - col("common")), 6).as("jaccard"),
          when(col("nsh1") <= col("nsh2"), col("doc1")).otherwise(col("doc2"))
            .as("contained_doc"))
        .orderBy(col("doc1"), col("doc2"))
    },
    Some(SHINGLE_SQL +
      """, sizes AS (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY doc_id),
         pairs AS (SELECT a.doc_id AS doc1, b.doc_id AS doc2, count(*) AS common
                   FROM sh a JOIN sh b ON a.sgh = b.sgh AND a.doc_id < b.doc_id
                   GROUP BY 1, 2),
         c AS (SELECT doc1, doc2, common, s1.nsh AS nsh1, s2.nsh AS nsh2
               FROM pairs
               JOIN sizes s1 ON doc1 = s1.doc_id
               JOIN sizes s2 ON doc2 = s2.doc_id)
         SELECT doc1, doc2,
                round(common * 1.0 / LEAST(nsh1, nsh2), 6) AS containment,
                round(common * 1.0 / (nsh1 + nsh2 - common), 6) AS jaccard,
                CASE WHEN nsh1 <= nsh2 THEN doc1 ELSE doc2 END AS contained_doc
         FROM c
         WHERE common * 1.0 / LEAST(nsh1, nsh2) >= 0.5
         ORDER BY doc1, doc2""")
  )

  /** q187 — duplicate-cluster size profile (round 10 wave 23): the
    * distribution of q60's cluster sizes — per size k, how many clusters
    * and how much of the corpus they hold — plus the global cluster and
    * singleton counts. The dedup family resolves clusters (q60), picks
    * representatives (q78) and prices inflation (q176); this is the
    * census that says what SHAPE the duplication has: a corpus of pairs
    * deduplicates cheaply, one giant template cluster means a systematic
    * ingestion bug, and the k-profile is the first thing an operator
    * reads when dedup yield moves.
    *
    * Determinism: exact integer counts end-to-end; one rounded division
    * per row; ordered by k.
    *
    * Scale notes: consumes the PUBLISHED label relation (the CC loop
    * runs once per fixture — labelsFor's materialized cache); the size
    * aggregate is cluster-count-sized, the k-histogram distinct-size-
    * sized, and the globals ride a 1-row broadcast. Nothing corpus-sized
    * beyond the one count(*). */
  private val q187 = GQuery(
    "q187_dup_cluster_profile",
    (s, d) => {
      val sizes = labelsFor(s, d)
        .groupBy(col("cluster_id")).agg(count(lit(1)).as("k"))
      val glob = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
        .crossJoin(sizes.agg(count(lit(1)).as("n_clusters"),
          sum(col("k")).as("n_clustered")))
      sizes.groupBy(col("k")).agg(count(lit(1)).as("n_clusters_k"))
        .crossJoin(broadcast(glob))
        .select(col("k"), col("n_clusters_k"),
          (col("k") * col("n_clusters_k")).as("n_docs_k"),
          col("n_clusters"),
          (col("n_docs") - col("n_clustered")).as("n_singletons"),
          round((col("k") * col("n_clusters_k")) / col("n_docs").cast("double"), 6)
            .as("doc_frac"))
        .orderBy(col("k"))
    },
    Some(CLUSTER_SQL +
      """, sizes AS (SELECT cluster_id, count(*) AS k FROM labels
                     GROUP BY cluster_id),
          g AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
                       (SELECT count(*) FROM sizes) AS n_clusters,
                       (SELECT CAST(sum(k) AS BIGINT) FROM sizes)
                         AS n_clustered)
          SELECT k, count(*) AS n_clusters_k,
                 CAST(k * count(*) AS BIGINT) AS n_docs_k,
                 any_value(n_clusters) AS n_clusters,
                 CAST(any_value(n_docs) - any_value(n_clustered) AS BIGINT)
                   AS n_singletons,
                 round(k * count(*) / CAST(any_value(n_docs) AS DOUBLE), 6)
                   AS doc_frac
          FROM sizes, g GROUP BY k ORDER BY k""")
  )

  /** q196 — cluster-majority label spread (weak supervision over the
    * duplicate graph): near-duplicate copies of one underlying document
    * should carry ONE label; per q60 cluster, elect the majority lang
    * (ties to the lexicographically smallest — both engines) and count,
    * per original lang, the members whose label disagrees with their
    * cluster's majority. This is the label-denoising/propagation step a
    * weak-supervision pipeline runs before training on metadata labels
    * (q188 votes across annotators on ONE doc; this votes across
    * near-duplicate COPIES), and a high flip count per lang is the
    * mislabeled-mirror signal q134/q179 see from the content side.
    *
    * Determinism: exact integer counts; majority ties break on lang
    * order in both engines; one rounded division per row.
    *
    * Scale notes: consumes the PUBLISHED label relation (CC runs once —
    * labelsFor's cache); the majority election is a (cluster, lang)
    * aggregate with a cluster-partitioned row_number over that
    * AGGREGATE (cluster-sized, never corpus-partitioned); the final
    * sheet is a |langs| aggregate behind a cluster-keyed broadcast-
    * eligible join of the vertex-sized member relation. */
  private val q196 = GQuery(
    "q196_cluster_label_spread",
    (s, d) => {
      // MATERIALIZED: two consumers (the majority election and the final
      // per-lang reduce) — lazy, the labels ⋈ documents join and its
      // corpus projection scan would run twice per execution (the q122/
      // q162 multi-consumer rule this round re-established)
      val members = graft.sources.Io.materialize(labelsFor(s, d)
        .join(Tables.documents(s, d).select(col("doc_id"), col("lang")),
          "doc_id"))
      val wc = org.apache.spark.sql.expressions.Window
        .partitionBy(col("cluster_id")).orderBy(col("cnt").desc, col("lang"))
      val majority = members.groupBy(col("cluster_id"), col("lang"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("rk", row_number().over(wc)).filter(col("rk") === 1)
        .select(col("cluster_id"), col("lang").as("maj_lang"))
      members.join(majority, "cluster_id")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("lang") =!= col("maj_lang"), 1L).otherwise(0L))
            .as("n_flipped"))
        .select(col("lang"), col("n_docs"), col("n_flipped"),
          round(col("n_flipped") / col("n_docs"), 6).as("flip_frac"))
        .orderBy(col("lang"))
    },
    Some(CLUSTER_SQL +
      """, mem AS (SELECT l.cluster_id, d.doc_id, d.lang
                   FROM labels l JOIN documents d USING (doc_id)),
          cnt AS (SELECT cluster_id, lang, count(*) AS c
                  FROM mem GROUP BY cluster_id, lang),
          maj AS (SELECT cluster_id, lang AS maj_lang FROM (
                    SELECT cluster_id, lang,
                           row_number() OVER (PARTITION BY cluster_id
                                              ORDER BY c DESC, lang) AS rk
                    FROM cnt) WHERE rk = 1)
          SELECT m.lang, count(*) AS n_docs,
                 CAST(sum(CASE WHEN m.lang <> j.maj_lang THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_flipped,
                 round(sum(CASE WHEN m.lang <> j.maj_lang THEN 1 ELSE 0 END)
                   / CAST(count(*) AS DOUBLE), 6) AS flip_frac
          FROM mem m JOIN maj j USING (cluster_id)
          GROUP BY m.lang ORDER BY lang""")
  )

  val all: Seq[GQuery] = Seq(q24, q25, q31, q32, q60, q78, q79, q86, q97,
    q100, q104, q111, q117, q138, q146, q147, q149, q187, q196)
}
