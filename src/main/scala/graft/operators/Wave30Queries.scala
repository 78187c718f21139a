package graft.operators

import graft.GQuery
import graft.functions.TextOps
import graft.sources.{Io, Tables}
import graft.util.Geometry
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-12 wave 30: governance and accounting sheets —
  *
  *   - q204 t-closeness: the third rung of the disclosure-risk ladder
  *     (q152 k-anonymity asks "how many share my quasi-identifiers",
  *     q160 l-diversity "how many sensitive values hide among them",
  *     THIS asks "does the class's sensitive DISTRIBUTION give me away
  *     anyway" — a class can be k-large and l-diverse yet 90% one
  *     segment). Distance = total variation (the categorical EMD with
  *     unit ground distance), exact-integer numerators throughout;
  *   - q205 source-collision matrix: which source PAIRS a near-dup
  *     pass would actually spend its candidate budget on — 1-perm
  *     min-shingle buckets (the q31 MinHash with k=1), candidate-pair
  *     MASS per (source_a, source_b) computed arithmetically from
  *     bucket occupancy counts (n_a·n_b), never by materializing
  *     pairs;
  *   - q206 bloom false-positive audit: MEASURE the q90 bloom dial
  *     instead of trusting the formula — build a PRF bloom (md5-keyed,
  *     so DuckDB reconstructs every bit) over a selective key set,
  *     probe the fact side, and count exact-vs-bloom disagreements.
  *     false_negatives is published as the structural tripwire (a
  *     bloom can never have any; a nonzero value means the kernel is
  *     broken, not the data).
  */
object Wave30Queries {

  private val TvdPct = Seq(20, 35, 50)

  /** q204 — t-closeness audit over the q152/q160 quasi-identifier
    * classes (c_nationkey × acctbal-kilobucket), sensitive attribute =
    * c_mktsegment: per class, the total-variation distance between the
    * class's segment distribution and the corpus-global one; published
    * as the class census per t threshold plus the worst class. Absent
    * segments contribute their full global mass — handled CLOSED-FORM
    * ((N − Σ_present gcnt)·k) instead of a category cross join.
    *
    * Determinism: tvd numerators are exact longs (cross-multiplied —
    * |cnt·N − gcnt·k| sums); thresholds compare integers (num·100 vs
    * 2·k·N·t); max_tvd is the max over one-division rounded doubles
    * with an exact integer denominator built before the division.
    *
    * Scale notes: one (class × segment) aggregate with map-side
    * combine (class-count-sized output, the q152 argument), a
    * |segments| broadcast, a 1-row broadcast, one window OVER the
    * aggregate (sweep-sanctioned), then a 1-row reduction. */
  private val q204 = GQuery(
    "q204_t_closeness",
    (s, d) => {
      val cs = Tables.customer(s, d)
        .groupBy(col("c_nationkey"),
          floor(col("c_acctbal") / 1000d).cast("bigint").as("kb"),
          col("c_mktsegment"))
        .agg(count(lit(1)).as("cnt"))
      val g = cs.groupBy(col("c_mktsegment")).agg(sum(col("cnt")).as("gcnt"))
      val nTot = cs.agg(sum(col("cnt")).as("n"))
      val w = Window.partitionBy(col("c_nationkey"), col("kb"))
      val per = cs.join(broadcast(g), Seq("c_mktsegment"))
        .crossJoin(broadcast(nTot))
        .withColumn("k", sum(col("cnt")).over(w))
        .groupBy(col("c_nationkey"), col("kb"))
        .agg(max(col("k")).as("k"), max(col("n")).as("n"),
          (sum(abs(col("cnt") * col("n") - col("gcnt") * col("k")))
            + (max(col("n")) - sum(col("gcnt"))) * max(col("k"))).as("num"))
      val aggs = Seq(count(lit(1)).as("n_classes"),
        sum(col("k")).as("n_rows")) ++
        TvdPct.flatMap(t => Seq(
          sum(when(col("num") * 100 > col("k") * col("n") * 2 * t, 1L)
            .otherwise(0L)).as(s"classes_gt_$t"),
          sum(when(col("num") * 100 > col("k") * col("n") * 2 * t, col("k"))
            .otherwise(0L)).as(s"rows_gt_$t"))) :+
        max(round(col("num") / (col("k") * col("n") * 2).cast("double"), 6))
          .as("max_tvd")
      per.agg(aggs.head, aggs.tail: _*)
    },
    Some(s"""WITH cs AS (SELECT c_nationkey,
                    CAST(floor(c_acctbal / 1000) AS BIGINT) AS kb,
                    c_mktsegment, count(*) AS cnt
                  FROM customer GROUP BY 1, 2, 3),
          g AS (SELECT c_mktsegment, CAST(sum(cnt) AS BIGINT) AS gcnt
                FROM cs GROUP BY 1),
          n AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM cs),
          kk AS (SELECT cs.c_nationkey, cs.kb, cs.cnt, g.gcnt, n.n,
                   CAST(sum(cnt) OVER (PARTITION BY c_nationkey, kb)
                     AS BIGINT) AS k
                 FROM cs JOIN g USING (c_mktsegment), n),
          per AS (SELECT c_nationkey, kb, max(k) AS k, max(n) AS n,
                    CAST(sum(abs(cnt*n - gcnt*k))
                      + (max(n) - sum(gcnt)) * max(k) AS BIGINT) AS num
                  FROM kk GROUP BY 1, 2)
          SELECT CAST(count(*) AS BIGINT) AS n_classes,
                 CAST(sum(k) AS BIGINT) AS n_rows,
                 ${TvdPct.map(t =>
                   s"""CAST(sum(CASE WHEN num*100 > k*n*2*$t THEN 1 ELSE 0 END)
                         AS BIGINT) AS classes_gt_$t,
                       CAST(sum(CASE WHEN num*100 > k*n*2*$t THEN k ELSE 0 END)
                         AS BIGINT) AS rows_gt_$t""").mkString(", ")},
                 max(round(num / CAST(2*k*n AS DOUBLE), 6)) AS max_tvd
          FROM per""")
  )

  private val ColMinN = 3
  private val ColCap = 1000L

  /** q205 — source-collision matrix: per (source_a ≤ source_b), the
    * LSH candidate-pair mass a near-dup pass would generate between
    * them — the budget sheet that says WHERE dedup compute goes (and
    * which source pairs actually share content) before any pair is
    * materialized. Bucket = the document's minimum 3-token shingle
    * hash (1-permutation MinHash: collision probability = Jaccard —
    * the q31 signature at k = 1, coarse by design: this sheet prices
    * candidate GENERATION, not verified duplication).
    *
    * Determinism: the min-shingle is an exact md5-60 integer (map-only
    * array fold, no explode); all counts exact; pair mass is
    * arithmetic on bucket occupancies (n·(n−1)/2 within, n_a·n_b
    * across — always-even product DIV 2 is exact).
    *
    * Scale notes: one map pass → (bucket, source) aggregate → bucket
    * totals via a window OVER the aggregate → self-join restricted to
    * equal buckets, where each bucket holds ≤ |sources| rows; buckets
    * above [[ColCap]] postings are dropped (the q31 stop-shingle
    * rule — mega-template buckets carry no pairing signal and their
    * n² mass would dominate and overflow the sheet). Pairs are never
    * materialized: the matrix is |sources|²-bounded. */
  private val q205 = GQuery(
    "q205_source_collision_matrix",
    (s, d) => {
      // r16: native shingle-hash kernel for the min fold (guide §4) —
      // the transform(sequence…md5…) form was interpreted per shingle
      graft.functions.ShingleHash60.register(s, ColMinN)
      val sh = Io.fanOut(Tables.documents(s, d)
        .select(col("source"), col("text")))
        .select(col("source"), TextOps.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= ColMinN)
        .select(col("source"),
          array_min(graft.functions.ShingleHash60(col("toks"), ColMinN))
            .as("mh"))
      val k = sh.groupBy(col("mh"), col("source")).agg(count(lit(1)).as("n"))
      // materialized (r16): kc feeds BOTH sides of the self-join below.
      // Unmaterialized, each side re-ran the whole scan→min-shingle→agg
      // →window pipeline, and worse: the join's inferred isnotnull(mh)
      // constraint — containing the entire md5 min-shingle fold — was
      // pushed below the fanOut exchange onto the single-split scan
      // (profiled: 1.36 s CPU on ONE task per side at sf0.1). One
      // evaluation, narrow (mh, source, n, tot) blocks, md5 runs once
      // on the fanned partitions.
      val kc = Io.materialize(k
        .withColumn("tot", sum(col("n")).over(Window.partitionBy(col("mh"))))
        .filter(col("tot") <= ColCap))
      kc.as("a").join(kc.as("b"),
          col("a.mh") === col("b.mh") && col("a.source") <= col("b.source"))
        .select(col("a.source").as("source_a"), col("b.source").as("source_b"),
          col("a.n").as("na"), col("b.n").as("nb"))
        .withColumn("pairs", expr(
          "CASE WHEN source_a = source_b THEN na*(na-1) DIV 2 ELSE na*nb END"))
        .filter(col("pairs") > 0)
        .groupBy(col("source_a"), col("source_b"))
        .agg(count(lit(1)).as("n_buckets"), sum(col("pairs")).as("cand_pairs"))
        .orderBy(col("source_a"), col("source_b"))
    },
    Some(s"""WITH t AS (SELECT source, string_split(text, ' ') AS toks
                        FROM documents),
          sh AS (SELECT source,
                   list_min(list_transform(range(1, len(toks)-${ColMinN - 2}),
                     i -> CAST(concat('0x', substr(md5(array_to_string(
                            toks[i:i+${ColMinN - 1}], ' ')), 1, 15)) AS BIGINT)))
                     AS mh
                 FROM t WHERE len(toks) >= $ColMinN),
          k AS (SELECT mh, source, count(*) AS n FROM sh GROUP BY 1, 2),
          kc AS (SELECT *, CAST(sum(n) OVER (PARTITION BY mh) AS BIGINT) AS tot
                 FROM k),
          p AS (SELECT a.source AS source_a, b.source AS source_b,
                  CASE WHEN a.source = b.source THEN a.n*(a.n-1)//2
                       ELSE a.n*b.n END AS pairs
                FROM kc a JOIN kc b
                  ON a.mh = b.mh AND a.source <= b.source
                WHERE a.tot <= $ColCap)
          SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_buckets,
                 CAST(sum(pairs) AS BIGINT) AS cand_pairs
          FROM p WHERE pairs > 0 GROUP BY 1, 2 ORDER BY 1, 2""")
  )

  private val BloomHashes = 3
  private val BloomOccLog2 = -3 // m ≈ 8·keys → ~2.7 bits/key·hash
  private val BloomFloorBits = 8
  private val BloomCapBits = 24

  /** q206 — bloom false-positive-rate audit: build an md5-keyed PRF
    * bloom filter (k = 3 hash slices, m = 2^adaptiveBits ≈ 8·|keys|)
    * over the BUILDING-segment customer keys, probe every order, and
    * count where the bloom and the exact semi-join disagree. q90/q162
    * USE a bloom to prune shuffles and argue its fpr from the standard
    * formula — this sheet measures it, on a bloom whose every bit the
    * oracle reconstructs (the keyed-PRF discipline: positions are
    * md5-60 mod m, so Spark and DuckDB set identical bits).
    *
    * Determinism: bit positions are exact integer md5 arithmetic; all
    * published numbers are exact counts except fpr_ppm (integer floor
    * division). false_negatives is the structural invariant (== 0
    * always; a bloom admits false positives only) — published so a
    * kernel regression trips the hash gate, not a code reader.
    *
    * Scale notes: the key side reduces to a distinct-key relation
    * (here |keys| ≈ n/5 customers); its bit SET is m-bounded — the
    * bitmap travels to the fact scan as m/64 literal longs (model-
    * sized: m adapts to |keys| like every sketch here), making the
    * probe pass MAP-ONLY with three O(1) bit tests per row — no join,
    * no shuffle, the exact shape q90's native bloom executes. The
    * exact-membership column rides one broadcast key join (the audit's
    * ground truth; at a key scale beyond broadcast it becomes q90's
    * bloom-pruned shuffle — which is the thing being priced). */
  private val q206 = GQuery(
    "q206_bloom_fpr_audit",
    (s, d) => {
      val keyDf = Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").cast("bigint").as("k")).distinct()
      val nKeys = keyDf.count()
      val bits = Geometry.adaptiveBits(math.max(nKeys, 1L),
        BloomOccLog2, BloomFloorBits, BloomCapBits)
      val m = 1L << bits
      def posOf(j: Int, key: Column): Column =
        pmod(TextOps.shingleHash60(
          concat(lit(s"$j:"), key.cast("string"))), lit(m))
      val setBits = keyDf
        .select(explode(array((0 until BloomHashes)
          .map(j => posOf(j, col("k"))): _*)).as("b"))
        .distinct().collect().map(_.getLong(0))
      val bitmap = new Array[Long]((m / 64).toInt)
      setBits.foreach(p => bitmap((p / 64).toInt) |= (1L << (p % 64).toInt))
      val probe = Tables.orders(s, d).select(col("o_custkey"))
        .join(broadcast(keyDf.withColumn("is_key", lit(1L))),
          col("o_custkey") === col("k"), "left")
        .withColumn("is_key", coalesce(col("is_key"), lit(0L)))
        .withColumn("bm", typedLit(bitmap.toSeq))
        .withColumn("hits", (0 until BloomHashes).map { j =>
          val p = s"pmod(CAST(conv(substring(md5(concat('$j:', " +
            s"CAST(o_custkey AS STRING))), 1, 15), 16, 10) AS BIGINT), $m)"
          expr(s"(element_at(bm, CAST($p DIV 64 AS INT) + 1) " +
            s">> CAST($p % 64 AS INT)) & 1")
        }.reduce(_ + _))
        .withColumn("bloom_pass",
          (col("hits") === BloomHashes).cast("long"))
      probe.agg(count(lit(1)).as("n_fact"),
          lit(nKeys).as("n_keys"), lit(m).as("m_bits"),
          lit(setBits.length.toLong).as("n_bits_set"),
          sum(col("is_key")).as("exact_matches"),
          sum(col("bloom_pass")).as("bloom_passes"),
          sum(when(col("bloom_pass") === 1 && col("is_key") === 0, 1L)
            .otherwise(0L)).as("false_positives"),
          sum(when(col("is_key") === 1 && col("bloom_pass") === 0, 1L)
            .otherwise(0L)).as("false_negatives"))
        .withColumn("fpr_ppm", expr("CASE WHEN n_fact - exact_matches > 0 " +
          "THEN false_positives * 1000000 DIV (n_fact - exact_matches) " +
          "ELSE 0 END"))
    },
    Some(s"""WITH ks AS (SELECT DISTINCT CAST(c_custkey AS BIGINT) AS k
                         FROM customer WHERE c_mktsegment = 'BUILDING'),
          mb AS (SELECT (1::BIGINT << ${Geometry.adaptiveBitsSql("count(*)",
                   BloomOccLog2, BloomFloorBits, BloomCapBits)}) AS m FROM ks),
          bits AS (SELECT DISTINCT
                     CAST(concat('0x', substr(md5(concat(j.j, ':',
                       CAST(k AS VARCHAR))), 1, 15)) AS BIGINT) % mb.m AS b
                   FROM ks, (SELECT unnest(['0', '1', '2']) AS j) j, mb),
          o AS (SELECT o_custkey,
                  CASE WHEN ${(0 until BloomHashes).map(j =>
                    s"""(CAST(concat('0x', substr(md5(concat('$j', ':',
                        CAST(o_custkey AS VARCHAR))), 1, 15)) AS BIGINT) % mb.m)
                        IN (SELECT b FROM bits)""").mkString(" AND ")}
                       THEN 1 ELSE 0 END AS bloom_pass,
                  CASE WHEN o_custkey IN (SELECT k FROM ks)
                       THEN 1 ELSE 0 END AS is_key
                FROM orders, mb)
          SELECT CAST(count(*) AS BIGINT) AS n_fact,
                 (SELECT CAST(count(*) AS BIGINT) FROM ks) AS n_keys,
                 (SELECT m FROM mb) AS m_bits,
                 (SELECT CAST(count(*) AS BIGINT) FROM bits) AS n_bits_set,
                 CAST(sum(is_key) AS BIGINT) AS exact_matches,
                 CAST(sum(bloom_pass) AS BIGINT) AS bloom_passes,
                 CAST(sum(CASE WHEN bloom_pass = 1 AND is_key = 0
                   THEN 1 ELSE 0 END) AS BIGINT) AS false_positives,
                 CAST(sum(CASE WHEN is_key = 1 AND bloom_pass = 0
                   THEN 1 ELSE 0 END) AS BIGINT) AS false_negatives,
                 CAST(CASE WHEN count(*) - sum(is_key) > 0 THEN
                   sum(CASE WHEN bloom_pass = 1 AND is_key = 0
                     THEN 1 ELSE 0 END) * 1000000 // (count(*) - sum(is_key))
                 ELSE 0 END AS BIGINT) AS fpr_ppm
          FROM o""")
  )

  val all: Seq[GQuery] = Seq(q204, q205, q206)
}
