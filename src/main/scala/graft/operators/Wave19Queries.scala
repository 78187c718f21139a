package graft.operators

import graft.GQuery
import graft.functions.TextOps
import graft.sources.{Io, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-9 wave 19: scorer evaluation and corpus-composition audits —
  * exact ROC AUC via the rank statistic (q166), the memorization-risk
  * census over corpus-hot shingles (q167), tokenizer fertility per
  * language (q168), temperature-scaled mixture sampling (q169), and the
  * post-shuffle batch-mix audit (q170). Every shape is map +
  * bounded-aggregate; the only windows ride over value-frequency
  * aggregates (the sweep-sanctioned q163 shape), never the corpus.
  */
object Wave19Queries {

  /** q166 — exact ROC AUC by rank statistic (Mann–Whitney U with
    * average-rank tie handling): evaluates the q165 scorer (md5
    * milli-grid confidence) against the embeddings label parity. AUC is
    * computed from the score-frequency relation: for each distinct score
    * p, positives at p beat all negatives strictly below and tie half
    * the negatives at p, so 2·U = Σ_p n1(p)·(2·cumneg_below(p) + n0(p))
    * and AUC = 2U / (2·N1·N0) — an EXACT integer numerator, one guarded
    * double division at the end. This is the threshold-free companion of
    * the q158 calibration audit: q158 asks "are the probabilities
    * honest", q166 asks "does the scorer rank at all".
    *
    * Determinism: the numerator is exact integer arithmetic over an
    * exact frequency relation; AUC and Gini are single rounded divisions
    * guarded for single-class corpora (both engines emit NULL).
    *
    * Exactness envelope: 2U ≈ 2·N1·N0 exceeds int64 past ~4.3e9 scored
    * rows — inside the 100 TB design envelope — so the accumulation is
    * WIDENED, not documented away: Spark sums decimal(38,0) with
    * decimal-operand products (the q120/q136 ADVICE-r7 pattern) and the
    * oracle mirrors in HUGEINT; both denominators multiply in double
    * (exactly-represented longs, one correctly-rounded multiply), and
    * the class-product guard is two sign tests, never an int64 product
    * (ADVICE r9).
    *
    * Scale notes: one map pass into a |distinct scores|-sized frequency
    * aggregate (≤1000 rows by construction); the running-negatives
    * window orders THAT aggregate, never the corpus; one 1-row reduce. */
  private val q166 = GQuery(
    "q166_roc_auc",
    (s, d) => {
      val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
      val sc = Tables.embeddings(s, d).select(
        (col("label") % 2).cast("int").as("y"),
        pmod(TextOps.shingleHash60(
          concat(col("vec_id").cast("string"), lit(":cl"))), lit(1000)).as("p"))
      val f = sc.groupBy(col("p")).agg(
        sum(when(col("y") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("y") === 0, 1L).otherwise(0L)).as("n0"))
      val w = Window.orderBy(col("p"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      f.withColumn("cum0", sum(col("n0")).over(w) - col("n0"))
        .agg(sum(col("n1") + col("n0")).as("n"),
          sum(col("n1")).as("n_pos"),
          sum(col("n0")).as("n_neg"),
          sum(col("n1").cast(dec38)
            * (lit(2L) * col("cum0") + col("n0")).cast(dec38)).as("num2"))
        .select(col("n"), col("n_pos"), col("n_neg"),
          when(col("n_pos") > 0 && col("n_neg") > 0,
            round(col("num2").cast("double")
              / (lit(2.0) * col("n_pos") * col("n_neg")), 6))
            .as("auc"),
          when(col("n_pos") > 0 && col("n_neg") > 0,
            round(col("num2").cast("double")
              / (col("n_pos").cast("double") * col("n_neg"))
              - 1.0, 6)).as("gini"))
    },
    Some("""WITH s AS (SELECT CAST(label % 2 AS INTEGER) AS y,
                    CAST(concat('0x', substr(md5(
                        CAST(vec_id AS VARCHAR) || ':cl'), 1, 15))
                      AS BIGINT) % 1000 AS p
              FROM embeddings),
          f AS (SELECT p,
                   CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                   CAST(sum(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0
                FROM s GROUP BY p),
          c AS (SELECT n1, n0,
                   sum(n0) OVER (ORDER BY p
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n0
                     AS cum0
                FROM f),
          a AS (SELECT CAST(sum(n1 + n0) AS BIGINT) AS n,
                       CAST(sum(n1) AS BIGINT) AS n_pos,
                       CAST(sum(n0) AS BIGINT) AS n_neg,
                       sum(CAST(n1 AS HUGEINT) * (2 * cum0 + n0)) AS num2
                FROM c)
          SELECT n, n_pos, n_neg,
                 CASE WHEN n_pos > 0 AND n_neg > 0 THEN
                   round(CAST(num2 AS DOUBLE)
                     / (2.0 * n_pos * n_neg), 6) END AS auc,
                 CASE WHEN n_pos > 0 AND n_neg > 0 THEN
                   round(CAST(num2 AS DOUBLE)
                     / (CAST(n_pos AS DOUBLE) * n_neg) - 1.0, 6)
                 END AS gini
          FROM a""")
  )

  /** Shingle width for q167 — matches the dedup family's SHINGLE_N so
    * "hot shingle" means the same unit the LSH index deduplicates on. */
  private val MemN = 5
  /** A shingle is corpus-hot when it appears in at least this many
    * distinct documents (a quality dial like the LSH band count; the
    * fixture's dup clusters are pairs/triples, so 3 already marks real
    * cross-document repetition — production raises it with corpus
    * redundancy). */
  private val MemHotT = 3

  /** q167 — memorization-risk census: shingles repeating across ≥
    * [[MemHotT]] distinct documents are the n-grams a model is most
    * likely to memorize verbatim (boilerplate, licenses, templates —
    * exactly the mass the dedup family's STOP cap excludes from pairing,
    * audited here instead of dropped). Per source: documents carrying at
    * least one hot shingle and the at-risk fraction, with the corpus hot
    * vocabulary size alongside — the sheet that decides whether to
    * dedup harder or to downweight repeated spans in the loss.
    *
    * Determinism: exact integer counts; one rounded division per row;
    * ordered by source.
    *
    * Scale notes: the UNCAPPED posting relation is built by the same
    * explode→distinct map as the dedup index and MATERIALIZED — it
    * feeds two consumers (the hot-shingle aggregate and the semi-join
    * probe), so without the checkpoint the tokenize→explode→md5 lineage
    * would run twice over the corpus (the r10 shared-relation sweep;
    * q159's fixed defect, same shape — measured 10.1 s → 6.0 s at sf3).
    * The hot set is a HAVING over the shingle-keyed aggregate
    * (vocabulary-sized input, tiny output) and rides a semi-join back
    * onto postings (AQE broadcasts it while it fits, shuffle otherwise);
    * at-risk doc_ids reduce by DISTINCT before the |sources|-sized
    * sheet. Nothing corpus-sized is collected or windowed. */
  private val q167 = GQuery(
    "q167_memorization_risk",
    (s, d) => {
      val posts = Io.materialize(CorpusOps.shingleHashes(
        Io.fanOut(Tables.documents(s, d).select(col("doc_id"), col("text"))),
        "doc_id", "text", MemN))
      val hot = posts.groupBy(col("sgh")).agg(count(lit(1)).as("nd"))
        .filter(col("nd") >= MemHotT)
      val nHot = hot.agg(count(lit(1)).as("n_hot_shingles"))
      val risky = posts.join(hot.select(col("sgh")), Seq("sgh"), "leftsemi")
        .select(col("doc_id")).distinct()
        .withColumnRenamed("doc_id", "rid")
      Tables.documents(s, d)
        .join(risky, col("doc_id") === col("rid"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("rid").isNotNull, 1L).otherwise(0L)).as("n_risk"))
        .crossJoin(broadcast(nHot))
        .select(col("source"), col("n_docs"), col("n_risk"),
          round(col("n_risk") / col("n_docs"), 6).as("risk_frac"),
          col("n_hot_shingles"))
        .orderBy(col("source"))
    },
    Some(s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
                    FROM documents),
          sh AS (SELECT doc_id,
                     CAST(concat('0x', substr(md5(sg), 1, 15)) AS BIGINT) AS sgh
                 FROM (SELECT doc_id,
                         unnest(list_distinct([array_to_string(t[i:i+${MemN - 1}], ' ')
                           FOR i IN range(1, len(t) - ${MemN - 2})])) AS sg
                       FROM toks WHERE len(t) >= $MemN)),
          hot AS (SELECT sgh FROM sh GROUP BY sgh
                  HAVING count(*) >= $MemHotT),
          nh AS (SELECT count(*) AS n_hot_shingles FROM hot),
          risky AS (SELECT DISTINCT doc_id FROM sh
                    WHERE sgh IN (SELECT sgh FROM hot))
          SELECT d.source, count(*) AS n_docs,
                 CAST(sum(CASE WHEN r.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_risk,
                 round(sum(CASE WHEN r.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                   / CAST(count(*) AS DOUBLE), 6) AS risk_frac,
                 any_value(n_hot_shingles) AS n_hot_shingles
          FROM documents d LEFT JOIN risky r ON d.doc_id = r.doc_id, nh
          GROUP BY d.source ORDER BY d.source""")
  )

  /** q168 — tokenizer fertility per language: bytes/token, chars/token,
    * tokens/doc, and the type-token ratio per language bucket — the
    * audit that prices a tokenizer's compression on each language before
    * committing a token budget (a language at 2× chars/token consumes
    * its budget twice as fast per unit text). Uses the engine's
    * whitespace tokenization so the columns are comparable with q35/q154
    * token accounting.
    *
    * Determinism: all sums exact integers; ratios are guarded rounded
    * divisions; ordered by lang.
    *
    * Scale notes: the corpus is scanned and TOKENIZED exactly once — the
    * (lang, toks, bytes, chars) projection is materialized and feeds
    * both the |langs|-sized sheet aggregate and the vocabulary side
    * (explode→distinct→count per lang, one shuffle, the q135 vocabulary
    * shape), which joins back onto the |langs|-row sheet by broadcast
    * (r9 verdict task 6: the base relation used to re-scan + re-tokenize
    * for the vocab pass). The materialized blocks are corpus-sized —
    * the trade is one block write/read against a second scan+tokenize
    * pass; on storage-tight clusters flip Io.ReliableCheckpointKey and
    * size the checkpoint dir, or drop the materialize and pay the
    * second map pass (values are identical either way). */
  private val q168 = GQuery(
    "q168_tokenizer_fertility",
    (s, d) => {
      val base = graft.sources.Io.materialize(
        graft.sources.Io.fanOut(
          Tables.documents(s, d).select(col("lang"), col("text")))
          .select(col("lang"),
            TextOps.tokens(col("text")).as("toks"),
            octet_length(col("text")).cast("bigint").as("bytes"),
            length(col("text")).cast("bigint").as("chars")))
      val agg = base.groupBy(col("lang")).agg(
        count(lit(1)).as("n_docs"),
        sum(size(col("toks")).cast("bigint")).as("n_tok"),
        sum(col("bytes")).as("n_bytes"),
        sum(col("chars")).as("n_chars"))
      val vocab = base
        .select(col("lang"), explode(col("toks")).as("tkn"))
        .distinct()
        .groupBy(col("lang")).agg(count(lit(1)).as("vocab"))
      agg.join(broadcast(vocab), Seq("lang"), "left")
        .select(col("lang"), col("n_docs"), col("n_tok"), col("vocab"),
          when(col("n_tok") > 0,
            round(col("n_bytes") / col("n_tok"), 6)).as("bytes_per_tok"),
          when(col("n_tok") > 0,
            round(col("n_chars") / col("n_tok"), 6)).as("chars_per_tok"),
          round(col("n_tok") / col("n_docs"), 4).as("toks_per_doc"),
          when(col("n_tok") > 0,
            round(col("vocab") / col("n_tok"), 6)).as("type_token_ratio"))
        .orderBy(col("lang"))
    },
    Some("""WITH b AS (SELECT lang,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS tok,
                   CAST(strlen(text) AS BIGINT) AS bytes,
                   CAST(length(text) AS BIGINT) AS chars
              FROM documents),
          a AS (SELECT lang, count(*) AS n_docs,
                   CAST(sum(tok) AS BIGINT) AS n_tok,
                   CAST(sum(bytes) AS BIGINT) AS n_bytes,
                   CAST(sum(chars) AS BIGINT) AS n_chars
                FROM b GROUP BY lang),
          v AS (SELECT lang, count(*) AS vocab FROM
                  (SELECT DISTINCT lang, unnest(string_split(text, ' ')) AS tkn
                   FROM documents) GROUP BY lang)
          SELECT a.lang, n_docs, n_tok, vocab,
                 CASE WHEN n_tok > 0 THEN
                   round(n_bytes / CAST(n_tok AS DOUBLE), 6) END AS bytes_per_tok,
                 CASE WHEN n_tok > 0 THEN
                   round(n_chars / CAST(n_tok AS DOUBLE), 6) END AS chars_per_tok,
                 round(n_tok / CAST(n_docs AS DOUBLE), 4) AS toks_per_doc,
                 CASE WHEN n_tok > 0 THEN
                   round(vocab / CAST(n_tok AS DOUBLE), 6) END AS type_token_ratio
          FROM a LEFT JOIN v ON a.lang = v.lang ORDER BY a.lang""")
  )

  /** Temperature grid for q169, in percent (25 = α 0.25). α ∈ {1, 1/2,
    * 1/4} are the IEEE-exact chain: identity, sqrt, sqrt∘sqrt — both
    * engines' sqrt is correctly rounded, so the integerized weights are
    * bit-identical without any libm-parity assumption. */
  private val TempGrid = Seq(25, 50, 100)

  /** q169 — temperature-scaled mixture sampling (the multilingual
    * sampling recipe): per temperature α, source weights w_i ∝ n_i^α
    * flatten the mixture — α=1 is proportional sampling, α→0 approaches
    * uniform — and the sheet reports each source's sampling probability
    * and its implied epoch count at a one-epoch-equivalent token budget
    * (low-resource sources exceed 1 epoch under flattening; that epoch
    * multiplier is the overfitting dial a data planner reads). Weights
    * are INTEGERIZED (round(n^α·10^6)) so every normalization sum is
    * exact integer arithmetic — no order-dependent double sums.
    *
    * Determinism: sqrt chains are IEEE-exact; weight rounding is
    * half-away-from-zero on both engines; sums are integer; the two
    * published ratios are single rounded double expressions evaluated in
    * the same operand order in both engines.
    *
    * Scale notes: the corpus reduces to a |sources|-row aggregate before
    * the ×|grid| fan-out; the per-α normalizer is a |grid|-row broadcast
    * join; everything after the first aggregate is metadata-scale. */
  private val q169 = GQuery(
    "q169_sampling_temperature",
    (s, d) => {
      val src = Tables.documents(s, d).groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        sum(size(TextOps.tokens(col("text"))).cast("bigint")).as("n_tok"))
      val tot = src.agg(sum(col("n_tok")).as("tot_tok"))
      val nt = col("n_tok").cast("double")
      val e = src
        .withColumn("alpha_pct", explode(array(TempGrid.map(lit(_)): _*)))
        .withColumn("w",
          when(col("alpha_pct") === 100, col("n_tok") * 1000000L)
            .when(col("alpha_pct") === 50,
              round(sqrt(nt) * 1000000.0).cast("bigint"))
            .otherwise(round(sqrt(sqrt(nt)) * 1000000.0).cast("bigint")))
      val sw = e.groupBy(col("alpha_pct")).agg(sum(col("w")).as("sw"))
      e.join(broadcast(sw), Seq("alpha_pct"))
        .crossJoin(broadcast(tot))
        .select(col("alpha_pct"), col("source"), col("n_docs"), col("n_tok"),
          round(col("w").cast("double") / col("sw"), 6).as("p_sample"),
          when(col("n_tok") > 0,
            round((col("tot_tok").cast("double") * col("w"))
              / (col("sw").cast("double") * col("n_tok")), 4)).as("epochs"))
        .orderBy(col("alpha_pct"), col("source"))
    },
    Some("""WITH src AS (SELECT source, count(*) AS n_docs,
                   CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tok
              FROM documents GROUP BY source),
          t AS (SELECT CAST(sum(n_tok) AS BIGINT) AS tot_tok FROM src),
          e AS (SELECT source, n_docs, n_tok, alpha_pct,
                   CASE WHEN alpha_pct = 100 THEN n_tok * 1000000
                        WHEN alpha_pct = 50 THEN
                          CAST(round(sqrt(CAST(n_tok AS DOUBLE)) * 1000000.0)
                            AS BIGINT)
                        ELSE
                          CAST(round(sqrt(sqrt(CAST(n_tok AS DOUBLE)))
                            * 1000000.0) AS BIGINT) END AS w
                FROM src, (SELECT unnest([25, 50, 100]) AS alpha_pct)),
          sw AS (SELECT alpha_pct, CAST(sum(w) AS BIGINT) AS sw FROM e
                 GROUP BY alpha_pct)
          SELECT e.alpha_pct, source, n_docs, n_tok,
                 round(CAST(w AS DOUBLE) / sw, 6) AS p_sample,
                 CASE WHEN n_tok > 0 THEN
                   round((CAST(tot_tok AS DOUBLE) * w)
                     / (CAST(sw AS DOUBLE) * n_tok), 4) END AS epochs
          FROM e JOIN sw ON e.alpha_pct = sw.alpha_pct, t
          ORDER BY e.alpha_pct, source""")
  )

  /** Batch count for q170 — the micro-batch grid a packed epoch is
    * hashed into. */
  private val MixBatches = 64

  /** q170 — batch-mix audit (shuffle quality): hash documents into
    * [[MixBatches]] training batches (the keyed-PRF convention — in
    * production this is the actual pack order) and measure how well each
    * batch mixes sources — distinct sources per batch and the largest
    * single-source share (ppm, exact integer floor division), with the
    * corpus-global share as the ideal. A well-shuffled epoch has every
    * batch's max share ≈ the global share; a sorted-by-source epoch
    * (share → 10⁶) trains on one distribution at a time and the loss
    * curve pays for it. Aggregate skew = worst batch share / global
    * share.
    *
    * Determinism: shares are exact integer floor divisions (ppm); the
    * only doubles are two rounded mean/ratio expressions over exact
    * integer sums.
    *
    * Scale notes: one (batch, source)-keyed count aggregate (map-side
    * combine), re-aggregated to |batches| rows, reduced to 1; the global
    * side reuses the same first aggregate. Nothing beyond the
    * |batches|×|sources| grid ever leaves the first shuffle. */
  private val q170 = GQuery(
    "q170_batch_mix",
    (s, d) => {
      val bs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"))
        .withColumn("batch", pmod(TextOps.shingleHash60(
          concat(col("doc_id").cast("string"), lit(":bat"))),
          lit(MixBatches)))
        .groupBy(col("batch"), col("source")).agg(count(lit(1)).as("c"))
      val pb = bs.groupBy(col("batch")).agg(
        sum(col("c")).as("n"),
        count(lit(1)).as("nsrc"),
        max(col("c")).as("maxc"))
        .withColumn("share_ppm", expr("(1000000 * maxc) DIV n"))
      val glob = bs.groupBy(col("source")).agg(sum(col("c")).as("cs"))
        .agg(sum(col("cs")).as("n_all"), max(col("cs")).as("max_all"))
        .select(expr("(1000000 * max_all) DIV n_all").as("global_share_ppm"))
      pb.agg(count(lit(1)).as("n_batches"),
        min(col("nsrc")).as("min_sources"),
        max(col("nsrc")).as("max_sources"),
        sum(col("nsrc")).as("sum_sources"),
        max(col("share_ppm")).as("worst_share_ppm"),
        sum(col("share_ppm")).as("sum_share"))
        .crossJoin(broadcast(glob))
        .select(col("n_batches"), col("min_sources"), col("max_sources"),
          round(col("sum_sources") / col("n_batches"), 4).as("avg_sources"),
          col("worst_share_ppm"),
          round(col("sum_share") / col("n_batches"), 2).as("avg_share_ppm"),
          col("global_share_ppm"),
          when(col("global_share_ppm") > 0,
            round(col("worst_share_ppm")
              / col("global_share_ppm").cast("double"), 4)).as("skew"))
    },
    Some(s"""WITH bs AS (SELECT
                   CAST(concat('0x', substr(md5(
                       CAST(doc_id AS VARCHAR) || ':bat'), 1, 15))
                     AS BIGINT) % $MixBatches AS batch,
                   source, count(*) AS c
              FROM documents GROUP BY 1, 2),
          pb AS (SELECT batch, CAST(sum(c) AS BIGINT) AS n,
                   count(*) AS nsrc, CAST(max(c) AS BIGINT) AS maxc,
                   (1000000 * CAST(max(c) AS BIGINT)) // CAST(sum(c) AS BIGINT)
                     AS share_ppm
                 FROM bs GROUP BY batch),
          g AS (SELECT (1000000 * CAST(max(cs) AS BIGINT))
                     // CAST(sum(cs) AS BIGINT) AS global_share_ppm
                FROM (SELECT source, sum(c) AS cs FROM bs GROUP BY source)),
          a AS (SELECT count(*) AS n_batches,
                   CAST(min(nsrc) AS BIGINT) AS min_sources,
                   CAST(max(nsrc) AS BIGINT) AS max_sources,
                   CAST(sum(nsrc) AS BIGINT) AS sum_sources,
                   CAST(max(share_ppm) AS BIGINT) AS worst_share_ppm,
                   CAST(sum(share_ppm) AS BIGINT) AS sum_share
                FROM pb)
          SELECT n_batches, min_sources, max_sources,
                 round(sum_sources / CAST(n_batches AS DOUBLE), 4)
                   AS avg_sources,
                 worst_share_ppm,
                 round(sum_share / CAST(n_batches AS DOUBLE), 2)
                   AS avg_share_ppm,
                 global_share_ppm,
                 CASE WHEN global_share_ppm > 0 THEN
                   round(worst_share_ppm / CAST(global_share_ppm AS DOUBLE), 4)
                 END AS skew
          FROM a, g""")
  )

  val all: Seq[GQuery] = Seq(q166, q167, q168, q169, q170)
}
