package graft.operators

import graft.GQuery
import graft.functions.TextOps.tokens
import graft.sources.{Io, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-7 wave 8: the lifecycle counterparts of existing families —
  * tokenizer APPLY (q127) to q126's tokenizer TRAIN, file-compaction
  * PLANNING (q128) to q125's layout audit, sketch-driven JOIN-SIZE
  * estimation (q129) to q109's cardinality sketch, robust MAD outliers
  * (q130) to q110's moment-based screen, the corpus datasheet (q131),
  * and the dominant principal direction (q132) to q120's per-dimension
  * variance diagonal.
  *
  * Same derivation as every other family (SURVEY §3): the reference's
  * map → one keyed shuffle with partial aggregation → bounded reduce
  * state (/root/reference/max_aggregation.cpp:17-112 generalized), with
  * each operator's scale argument in its own scaladoc.
  */
object Wave8Queries {

  private def fdocs(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    Io.fanOut(Tables.documents(s, d))

  /** q127 — BPE tokenizer APPLY (encode): the other half of the q126
    * lifecycle — run the trained 3-merge table over every document and
    * report per-source token economics (char-level tokens before, BPE
    * tokens after, compression ratio). This is the job every tokenized
    * training corpus runs at full scale after training samples a slice:
    * train on the vocabulary relation, encode the corpus.
    *
    * The merge table is learned by the IDENTICAL trainer as q126
    * (CorpusQueries.trainBpeMerges — same argmax, same tie-break, same
    * triple-replace rewrite), then applied as a map-only string rewrite
    * per word; the oracle re-derives the same merges in SQL (q126's CTE
    * chain) and applies them through a LEFT JOIN so a corpus that
    * exhausts before 3 merges still encodes identically on both sides.
    *
    * Scale notes: training cost tracks the DISTINCT-word vocabulary
    * (q126's argument); the encode pass is explode + map-only rewrite +
    * one |sources|-group aggregate with map-side partial combine — no
    * join, no window, nothing data-sized in reduce state. Driver state =
    * 3 merge strings. */
  private val q127 = GQuery(
    "q127_bpe_encode",
    (s, d) => {
      val merges = CorpusQueries.trainBpeMerges(s, d, 3).map(_._2)
      val words = fdocs(s, d)
        .select(col("source"), explode(tokens(col("text"))).as("w"))
        .withColumn("sym",
          concat(lit(" "), concat_ws(" ", split(col("w"), "")), lit(" ")))
      val encoded = merges.foldLeft(words)((df, pair) =>
        df.withColumn("sym",
          expr(CorpusQueries.bpeRewriteSql(pair, 3).format("sym"))))
      encoded
        .select(col("source"), length(col("w")).cast("long").as("chars"),
          size(split(trim(col("sym")), " ")).cast("long").as("nsym"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_words"),
          sum(col("chars")).as("tokens_char"),
          sum(col("nsym")).as("tokens_bpe"))
        .withColumn("compression",
          round(col("tokens_char").cast("double") / col("tokens_bpe"), 6))
        .orderBy(col("source"))
    },
    {
      // q126's training CTE chain (identical text), then the encode CTEs:
      // eN applies mN through LEFT JOIN so a missing merge is a no-op.
      def trainRound(i: Int): String = {
        val prev = s"s${i - 1}"
        s"""p$i AS (SELECT unnest([a[i] || ' ' || a[i + 1] FOR i IN range(1, len(a))]) AS pair,
                           freq
                    FROM (SELECT string_split(trim(sym), ' ') AS a, freq FROM $prev)),
            m$i AS (SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt FROM p$i
                    GROUP BY pair ORDER BY cnt DESC, pair LIMIT 1),
            s$i AS (SELECT ${"replace(" * 3}sym,
                             ' ' || pair || ' ', ' ' || replace(pair, ' ', '') || ' '),
                             ' ' || pair || ' ', ' ' || replace(pair, ' ', '') || ' '),
                             ' ' || pair || ' ', ' ' || replace(pair, ' ', '') || ' ') AS sym,
                           freq
                    FROM $prev, m$i)"""
      }
      def encodeRound(i: Int): String =
        s"""e$i AS (SELECT source, w,
                           CASE WHEN m.pair IS NULL THEN sym
                                ELSE ${"replace(" * 3}sym,
                                  ' ' || m.pair || ' ', ' ' || replace(m.pair, ' ', '') || ' '),
                                  ' ' || m.pair || ' ', ' ' || replace(m.pair, ' ', '') || ' '),
                                  ' ' || m.pair || ' ', ' ' || replace(m.pair, ' ', '') || ' ')
                           END AS sym
                    FROM e${i - 1} LEFT JOIN m$i m ON 1 = 1)"""
      Some(s"""WITH wf AS (SELECT w, count(*) AS freq
                           FROM (SELECT unnest(string_split(text, ' ')) AS w
                                 FROM documents) GROUP BY w),
               s0 AS (SELECT ' ' || array_to_string([w[i:i] FOR i IN range(1, len(w) + 1)], ' ')
                               || ' ' AS sym, freq
                      FROM wf),
               ${trainRound(1)}, ${trainRound(2)}, ${trainRound(3)},
               e0 AS (SELECT source, w,
                             ' ' || array_to_string([w[i:i] FOR i IN range(1, len(w) + 1)], ' ')
                               || ' ' AS sym
                      FROM (SELECT source, unnest(string_split(text, ' ')) AS w
                            FROM documents)),
               ${encodeRound(1)}, ${encodeRound(2)}, ${encodeRound(3)}
               SELECT source, count(*) AS n_words,
                      CAST(sum(len(w)) AS BIGINT) AS tokens_char,
                      CAST(sum(len(string_split(trim(sym), ' '))) AS BIGINT) AS tokens_bpe,
                      round(CAST(sum(len(w)) AS DOUBLE)
                            / sum(len(string_split(trim(sym), ' '))), 6) AS compression
               FROM e3 GROUP BY source ORDER BY source""")
    }
  )

  /** q128 — file-compaction PLANNING: assign small files to target-size
    * output bins (sorted first-fit via prefix sums) — the operator behind
    * every `OPTIMIZE` / auto-compaction pass, and the write-time
    * counterpart of q125's read-time layout audit. The small-files
    * problem IS a 100 TB problem: a crawl landing 10^6 sub-MB files per
    * day needs exactly this plan before scans stop paying per-file open
    * cost.
    *
    * "Files" here are the per-(source, doc_id%40) byte totals of the
    * documents fixture (what a real catalog's file-listing relation
    * provides); the plan orders files by size descending (tie: file_id)
    * and cuts bins at TargetBytes boundaries of the exclusive running
    * total — the size-tiered assignment production compactors use.
    *
    * Scale notes: a deliberate global-window operator — the windowed
    * relation is file METADATA, one row per file (~800k rows for 100 TB
    * at 128 MB files: catalog scale, not data scale; this is driver-side
    * work in Delta/Iceberg planners). The data-sized work (byte totals
    * per file) is one keyed aggregate with map-side combine. (The
    * registry's other unpartitioned windows sit over similarly BOUNDED
    * aggregate relations — q135's 10 deciles, q137's fixed histogram
    * grid, q142's day count; anything value-domain-sized routes through
    * the Ranks decomposition instead, as q141 does — the honest claim is
    * "no global window over an unbounded relation", not "only one
    * global window", ADVICE r7.) */
  private val TargetBytes = 16384L
  private val q128 = GQuery(
    "q128_compaction_plan",
    (s, d) => {
      val files = Tables.documents(s, d)
        .groupBy(col("source"), pmod(col("doc_id"), lit(40)).as("bucket"))
        .agg(sum(col("n_chars")).as("bytes"))
        .select(concat(col("source"), lit("_"), col("bucket")).as("file_id"),
          col("bytes"))
      files
        .withColumn("cum", sum(col("bytes")).over(
          Window.orderBy(col("bytes").desc, col("file_id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("bin", expr(s"(cum - bytes) div $TargetBytes"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n_files"),
          sum(col("bytes")).as("total_bytes"),
          max(col("bytes")).as("largest"))
        .withColumn("fill",
          round(col("total_bytes").cast("double") / TargetBytes, 4))
        .orderBy(col("bin"))
    },
    Some(s"""WITH f AS (SELECT source || '_' || CAST(doc_id % 40 AS VARCHAR) AS file_id,
                               CAST(sum(n_chars) AS BIGINT) AS bytes
                        FROM documents GROUP BY source, doc_id % 40),
             c AS (SELECT file_id, bytes,
                          CAST(sum(bytes) OVER (ORDER BY bytes DESC, file_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                               AS BIGINT) AS cum
                   FROM f),
             b AS (SELECT (cum - bytes) // $TargetBytes AS bin, bytes FROM c)
             SELECT bin, count(*) AS n_files,
                    CAST(sum(bytes) AS BIGINT) AS total_bytes,
                    CAST(max(bytes) AS BIGINT) AS largest,
                    round(CAST(sum(bytes) AS DOUBLE) / $TargetBytes, 4) AS fill
             FROM b GROUP BY bin ORDER BY bin""")
  )

  /** q129 — sketch-driven JOIN-SIZE estimation: estimate the key overlap
    * of two relations from their KMV sketches BEFORE paying for the join
    * — what a cost-based optimizer (or a pipeline deciding broadcast vs
    * shuffle vs skew-salt) consumes. q109's single-set cardinality
    * sketch extended to the two-set algebra: union via the k-smallest of
    * the merged heads (any union k-head member is in its own side's
    * k-head, so merging k-heads IS the union sketch), intersection via
    * the Beyer et al. 2007 estimator ρ/K · |A∪B|-est, where ρ counts
    * union-head members present in BOTH side sketches.
    *
    * Fixture: A = customers holding a >450k-value order (the "high-value
    * account" set), B = BUILDING-segment customers; the estimate is
    * emitted NEXT TO the exact join count and the relative error, so the
    * whole estimator is oracle-checked, not just demonstrated.
    *
    * Scale notes: each side is one distinct-key shuffle into a k-bounded
    * BoundedHead aggregate (state ≤ k longs regardless of data); the
    * exact count the audit column pays for is one key join the
    * production consumer would SKIP (that is the point of the sketch).
    * All estimate arithmetic runs the identical literal formula on
    * identical integers in both engines. */
  private val JcK = 128
  private val q129 = GQuery(
    "q129_join_cardinality",
    (s, d) => {
      val H = 1.152921504606846976e18 // 2^60 hash space
      val k = JcK
      val aKeys = Tables.orders(s, d)
        .filter(col("o_totalprice") > 450000.0)
        .select(col("o_custkey").as("key")).distinct()
      val bKeys = Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("key")).distinct()
      def sketch(keys: org.apache.spark.sql.DataFrame, p: String) =
        keys.select(graft.functions.TextOps
            .shingleHash60(col("key").cast("string")).as("h"))
          .agg(count(lit(1)).as(s"n_$p"),
            graft.functions.BoundedHead.head(k)(array(col("h"))).as(s"h_$p"))
      val exact = aKeys.join(bKeys, "key")
        .agg(count(lit(1)).as("n_inter_exact"))
      sketch(aKeys, "a").crossJoin(sketch(bKeys, "b"))
        .crossJoin(exact)
        .withColumn("hu",
          slice(array_sort(array_union(col("h_a"), col("h_b"))), 1, k))
        .withColumn("est_union",
          when(size(col("hu")) < k, size(col("hu")).cast("double"))
            .otherwise(lit((k - 1).toDouble) * H / element_at(col("hu"), k)))
        .withColumn("rho",
          size(array_intersect(array_intersect(col("hu"), col("h_a")),
            col("h_b"))))
        .withColumn("est_inter",
          when(size(col("hu")) === 0, lit(0.0))
            .otherwise(round(col("rho") * col("est_union") / size(col("hu")), 2)))
        .select(col("n_a"), col("n_b"),
          round(col("est_union"), 2).as("est_union"), col("est_inter"),
          col("n_inter_exact"),
          when(col("n_inter_exact") === 0, lit(0.0))
            .otherwise(round(abs(col("est_inter") - col("n_inter_exact"))
              / col("n_inter_exact"), 4)).as("rel_err"))
    },
    Some(s"""WITH ak AS (SELECT DISTINCT o_custkey AS key FROM orders
                         WHERE o_totalprice > 450000.0),
             bk AS (SELECT DISTINCT c_custkey AS key FROM customer
                    WHERE c_mktsegment = 'BUILDING'),
             ah AS (SELECT CAST(concat('0x', substr(md5(CAST(key AS VARCHAR)), 1, 15)) AS BIGINT) AS h FROM ak),
             bh AS (SELECT CAST(concat('0x', substr(md5(CAST(key AS VARCHAR)), 1, 15)) AS BIGINT) AS h FROM bk),
             sa AS (SELECT count(*) AS n_a, (list_sort(list(h)))[1:$JcK] AS h_a FROM ah),
             sb AS (SELECT count(*) AS n_b, (list_sort(list(h)))[1:$JcK] AS h_b FROM bh),
             ex AS (SELECT count(*) AS n_inter_exact FROM ak JOIN bk USING (key)),
             u AS (SELECT n_a, n_b, h_a, h_b, n_inter_exact,
                          (list_sort(list_distinct(list_concat(h_a, h_b))))[1:$JcK] AS hu
                   FROM sa, sb, ex),
             e AS (SELECT n_a, n_b, n_inter_exact, hu,
                          CASE WHEN len(hu) < $JcK THEN CAST(len(hu) AS DOUBLE)
                               ELSE ${(JcK - 1).toDouble} * 1.152921504606846976e18
                                    / CAST(hu[$JcK] AS DOUBLE) END AS est_union,
                          len(list_filter(hu, x -> list_contains(h_a, x)
                                                AND list_contains(h_b, x))) AS rho
                   FROM u)
             SELECT n_a, n_b, round(est_union, 2) AS est_union,
                    CASE WHEN len(hu) = 0 THEN 0.0
                         ELSE round(rho * est_union / len(hu), 2) END AS est_inter,
                    n_inter_exact,
                    CASE WHEN n_inter_exact = 0 THEN 0.0
                         ELSE round(abs((CASE WHEN len(hu) = 0 THEN 0.0
                                         ELSE round(rho * est_union / len(hu), 2) END)
                                        - n_inter_exact) * 1.0 / n_inter_exact, 4)
                    END AS rel_err
             FROM e""")
  )

  /** q130 — robust outlier screen via MAD (median absolute deviation):
    * users whose total event value deviates from the population MEDIAN
    * by more than two robust standard deviations (2 · 1.4826 · MAD). The
    * robust complement of q110's moment screen — means and σ are
    * themselves dragged by the outliers they hunt (one bot inflates σ
    * until real bots pass), while the median/MAD breakdown point is 50%;
    * this is the screen abuse pipelines actually deploy.
    *
    * Determinism: per-user totals quantize to a cent grid (×100, exact
    * long sums); both medians come from Ranks.quantilesCont (parallel
    * range-partitioned rank, never a one-task-per-group percentile) with
    * the same interpolation as the oracle's quantile_cont; deviations
    * are integer-or-half-valued doubles, so the 4.4478·MAD boundary test
    * runs on identical values in both engines.
    *
    * Scale notes: one user-keyed aggregate (map-side combine), two rank
    * passes over the |users|-sized relation — materialized once because
    * it has MULTIPLE consumers (the quantile pass and the later join;
    * Ranks itself pins its slice boundaries internally) — and a 1-row
    * broadcast of (med, mad) back to the relation. Nothing data-sized in
    * any reduce task. */
  private val q130 = GQuery(
    "q130_mad_outliers",
    (s, d) => {
      val perUser = Io.materialize(Tables.events(s, d)
        .select(col("user_id"),
          round(col("value") * 100, 0).cast("long").as("v"))
        .groupBy(col("user_id")).agg(sum(col("v")).as("total_c"))
        .withColumn("g", lit(1)))
      val med = Ranks.quantileCont(perUser, "g", col("total_c"), 0.5, "med")
      val devs = Io.materialize(perUser
        .join(broadcast(med), "g")
        .withColumn("dev", abs(col("total_c").cast("double") - col("med"))))
      val mad = Ranks.quantileCont(devs, "g", col("dev"), 0.5, "mad")
      devs.join(broadcast(mad), "g")
        .filter(col("dev") > lit(2.9652) * col("mad")) // 2 · 1.4826
        .select(col("user_id"), col("total_c"), round(col("dev"), 1).as("dev"),
          round(col("med"), 1).as("med"), round(col("mad"), 1).as("mad"))
        .orderBy(col("user_id"))
    },
    Some("""WITH p AS (SELECT user_id,
                              CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS total_c
                       FROM events GROUP BY user_id),
            m AS (SELECT quantile_cont(total_c, 0.5) AS med FROM p WHERE total_c IS NOT NULL),
            d AS (SELECT user_id, total_c, med,
                         abs(CAST(total_c AS DOUBLE) - med) AS dev
                  FROM p, m),
            md AS (SELECT quantile_cont(dev, 0.5) AS mad FROM d)
            SELECT user_id, total_c, round(dev, 1) AS dev,
                   round(med, 1) AS med, round(mad, 1) AS mad
            FROM d, md WHERE dev > 2.9652 * mad
            ORDER BY user_id""")
  )

  /** q131 — the corpus datasheet: one row of release-audit statistics
    * (doc/source/language counts, byte and token volume, exact-dup
    * count, length profile) — the "datasheets for datasets" artifact
    * (Gebru et al. 2021) every published training corpus ships, and the
    * cheapest end-to-end smoke a pipeline runs after ingest.
    *
    * Scale notes: a handful of independent 1-row aggregates over one
    * corpus scan family — counts/sums partial-combine; the dup count
    * rides the md5-60 hash groupBy (the q24 shape); the exact median
    * comes from Ranks (parallel rank, no single-task percentile); all
    * 1-row relations broadcast-join into the card. */
  private val q131 = GQuery(
    "q131_dataset_card",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val base = docs.agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        countDistinct(col("lang")).as("n_langs"),
        coalesce(sum(col("n_chars")), lit(0L)).as("total_chars"),
        coalesce(max(col("n_chars")), lit(0L)).as("max_chars"))
      val toks = docs
        .select(size(tokens(col("text"))).cast("long").as("nt"))
        .agg(coalesce(sum(col("nt")), lit(0L)).as("total_tokens"))
      val dups = docs
        .select(graft.functions.TextOps.shingleHash60(col("text")).as("h"))
        .groupBy(col("h")).agg(count(lit(1)).as("c"))
        .filter(col("c") > 1)
        .agg(coalesce(sum(col("c")), lit(0L)).as("dup_docs"))
      val p50 = Ranks.quantileCont(docs.withColumn("g", lit(1)), "g",
        col("n_chars"), 0.5, "p50_chars").drop("g")
      base.crossJoin(toks).crossJoin(dups)
        .join(broadcast(p50), lit(true), "left")
        .select(col("n_docs"), col("n_sources"), col("n_langs"),
          col("total_chars"), col("total_tokens"), col("dup_docs"),
          col("max_chars"), round(col("p50_chars"), 1).as("p50_chars"))
    },
    Some("""WITH base AS (SELECT count(*) AS n_docs,
                                 count(DISTINCT source) AS n_sources,
                                 count(DISTINCT lang) AS n_langs,
                                 coalesce(CAST(sum(n_chars) AS BIGINT), 0) AS total_chars,
                                 coalesce(CAST(max(n_chars) AS BIGINT), 0) AS max_chars
                          FROM documents),
            toks AS (SELECT coalesce(CAST(sum(len(string_split(text, ' '))) AS BIGINT), 0)
                              AS total_tokens
                     FROM documents),
            dups AS (SELECT coalesce(CAST(sum(c) AS BIGINT), 0) AS dup_docs
                     FROM (SELECT count(*) AS c FROM documents
                           GROUP BY CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT)
                           HAVING count(*) > 1)),
            p50 AS (SELECT quantile_cont(n_chars, 0.5) AS p50_chars FROM documents)
            SELECT n_docs, n_sources, n_langs, total_chars, total_tokens,
                   dup_docs, max_chars, round(p50_chars, 1) AS p50_chars
            FROM base, toks, dups, p50""")
  )

  /** q132 — dominant principal direction of the embedding cloud via ONE
    * exact power-iteration step: w = Vᵀ(V·1), reported as unit loadings
    * and per-dimension variance share. q120 audits the covariance
    * DIAGONAL (which dimensions carry signal); this reports the dominant
    * DIRECTION — the anisotropy axis whitening removes before q41/q76
    * trust cosine distances (Mu & Viswanath 2018's "all-but-the-top").
    *
    * Determinism: coordinates quantize to the shared q102/q107/q120
    * integer grid; the seed projection t_i = Σ_k v_ik and every product
    * v_ij·t_i are exact longs; per-dimension sums and the norm² Σw²
    * accumulate in exact decimal; exactly one decimal→double cast
    * (correctly rounded, engine-identical) before the final sqrt /
    * divide / round-6.
    *
    * Scale notes: t_i is a map-side array fold (no shuffle); the
    * posexplode partial-combines into exactly dim groups (the q120
    * shape — shuffle carries dim rows per map partition); norm² is a
    * 1-row aggregate over the dim-sized relation, broadcast back.
    * A second iteration would be the same two map-joins again —
    * constant-state, linear, no new shape. */
  private val q132 = GQuery(
    "q132_principal_dir",
    (s, d) => {
      val dec38 = DecimalType(38, 0)
      graft.functions.MilliQuant.register(s)
      Io.fanOut(Tables.embeddings(s, d).select(col("embedding")))
        .select(graft.functions.MilliQuant(col("embedding")).as("qv"))
        .withColumn("t", aggregate(col("qv"), lit(0L), (a, x) => a + x))
        .select(col("t"), posexplode(col("qv")).as(Seq("pos", "v")))
        .groupBy((col("pos") + 1).as("dim"))
        // decimal-operand product (ADVICE r7): long v·t wraps silently
        // for large quantized magnitudes; the oracle multiplies in HUGEINT
        .agg(sum(col("v").cast(dec38) * col("t").cast(dec38)).as("w"))
        .withColumn("nsq",
          sum((col("w") * col("w"))).over(Window.partitionBy()))
        .select(col("dim").cast("int").as("dim"),
          round(col("w").cast("double") / sqrt(col("nsq").cast("double")), 6)
            .as("loading"),
          round((col("w") * col("w")).cast("double")
            / col("nsq").cast("double"), 6).as("share"))
        .orderBy(col("dim"))
    },
    Some("""WITH e AS (SELECT list_transform(embedding,
                         x -> CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT)) AS qv
                       FROM embeddings),
            p AS (SELECT qv, CAST(list_sum(qv) AS BIGINT) AS t FROM e),
            w AS (SELECT i AS dim,
                         CAST(sum(CAST(qv[CAST(i AS INT)] AS HUGEINT) * t) AS HUGEINT) AS w
                  FROM p, range(1, 65) r(i) GROUP BY i),
            n AS (SELECT CAST(sum(w * w) AS HUGEINT) AS nsq FROM w)
            SELECT CAST(dim AS INTEGER) AS dim,
                   round(CAST(w AS DOUBLE) / sqrt(CAST(nsq AS DOUBLE)), 6) AS loading,
                   round(CAST(w * w AS DOUBLE) / CAST(nsq AS DOUBLE), 6) AS share
            FROM w, n ORDER BY dim""")
  )

  val all: Seq[GQuery] = Seq(q127, q128, q129, q130, q131, q132)
}
