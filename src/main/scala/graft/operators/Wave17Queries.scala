package graft.operators

import graft.GQuery
import graft.functions.TextOps
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Round-9 wave 17: data selection and private release — hashed-ngram
  * importance weighting for targeted data selection (q159, the
  * DSIR-style density-ratio estimator), l-diversity (q160, the
  * sensitive-attribute refinement of q152's k-anonymity), and an ε-DP
  * noisy-histogram release (q161, the mechanism q153's contribution cap
  * exists to feed). All three are map + bounded-aggregate shapes.
  */
object Wave17Queries {

  /** Hashed-ngram LM size for q159 — the DSIR trick: bigrams hash into a
    * FIXED bucket space, so both language models are B-sized regardless
    * of vocabulary (at production scale B rises to 2^16-2^20; the model
    * stays a broadcastable array either way). */
  private val DsirBuckets = 1024
  /** Target distribution: documents in this language. */
  private val DsirTarget = "en"

  /** q159 — importance weighting for data selection (hashed-ngram
    * density ratio, the DSIR recipe): estimate per-document
    * log-importance weights log p_target/p_source from two add-one-
    * smoothed bucket LMs — target = [[DsirTarget]]-language documents,
    * source = everything else — where every bigram is hashed into
    * [[DsirBuckets]] buckets (feature hashing: the LMs stay B-sized at
    * any corpus scale). A selection pipeline keeps documents whose mean
    * bucket log-ratio is positive (they look more like the target than
    * the raw pool); this query reports the per-source selection sheet —
    * doc counts, mean weight, and the kept fraction under the weight>0
    * rule — which is the mixture audit read before committing a
    * selection run.
    *
    * Determinism: bucket counts and totals are exact longs; each bucket
    * weight is ONE ln of a ratio of integer-valued doubles (the
    * q101/q133/q156 ln-parity precedent); the per-doc mean is
    * Σ wb·cnt / Σ cnt over the doc's bucket counts (both engines reduce
    * the same ≤B-row grouped relation); per-doc weights round to 6
    * BEFORE the >0 selection test and the per-source mean, so the
    * comparison can never straddle an ulp.
    *
    * Scale notes: ONE explode→bucket map pass lands in a materialized
    * (doc_id, source, lang, b, cnt) pre-aggregate (map-side combine; ≤
    * B rows per doc, so ≪ the bigram-occurrence relation) that feeds
    * BOTH the LM aggregate and the per-doc reduce — the tokenize→
    * explode→md5 lineage runs exactly once (the q174 shared-occurrence
    * pattern; r9 verdict task 1). The LM and its totals are broadcast
    * (B rows / 1 row); the per-doc reduce is a doc-keyed weighted mean
    * of its own bucket counts; the final relation is |sources|-sized.
    * Nothing vocabulary- or corpus-sized is ever broadcast or windowed. */
  private val q159 = GQuery(
    "q159_dsir_importance",
    (s, d) => {
      // r17: the bigram-string build + md5 expression chain is exactly
      // the POSITIONAL ShingleHash60 kernel at n = 2 (same concat_ws
      // string, same md5-60 parse) — one codegen call, no intermediate
      // bigram strings, no interpreted transform.
      graft.functions.ShingleHash60.register(s, 2)
      val grams = graft.sources.Io.materialize(
        graft.sources.Io.fanOut(Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("lang"), col("text")))
          .select(col("doc_id"), col("source"), col("lang"),
            explode(graft.functions.ShingleHash60(
              TextOps.tokens(col("text")), 2)).as("gh"))
          .withColumn("b", pmod(col("gh"), lit(DsirBuckets)))
          .groupBy(col("doc_id"), col("source"), col("lang"), col("b"))
          .agg(count(lit(1)).as("cnt")))
      val lm = grams.groupBy(col("b")).agg(
        sum(when(col("lang") === DsirTarget, col("cnt")).otherwise(0L)).as("ct"),
        sum(when(col("lang") =!= DsirTarget, col("cnt")).otherwise(0L)).as("cs"))
      val tot = lm.agg(sum(col("ct")).as("tt"), sum(col("cs")).as("ts"))
      val w = lm.crossJoin(broadcast(tot))
        .select(col("b"), log(
          ((col("ct") + lit(1.0)) * (col("ts") + lit(DsirBuckets.toDouble)))
            / ((col("cs") + lit(1.0)) * (col("tt") + lit(DsirBuckets.toDouble))))
          .as("wb"))
      val perDoc = grams.join(broadcast(w), Seq("b"))
        .groupBy(col("doc_id"))
        .agg(first(col("source")).as("source"),
          round(sum(col("wb") * col("cnt")) / sum(col("cnt")), 6).as("wt"))
      perDoc.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          round(avg(col("wt")), 6).as("mean_w"),
          sum(when(col("wt") > 0, 1L).otherwise(0L)).as("n_selected"))
        .withColumn("sel_frac", round(col("n_selected") / col("n_docs"), 6))
        .orderBy(col("source"))
    },
    Some(s"""WITH t AS (SELECT doc_id, source, lang,
                    string_split(text, ' ') AS toks FROM documents),
          g AS (SELECT doc_id, source,  lang,
                    CAST(concat('0x', substr(md5(bg), 1, 15)) AS BIGINT)
                      % $DsirBuckets AS b
                FROM (SELECT doc_id, source, lang,
                        unnest([toks[i] || ' ' || toks[i+1]
                                FOR i IN range(1, len(toks))]) AS bg
                      FROM t WHERE len(toks) >= 2)),
          g2 AS (SELECT doc_id, source, lang, b, count(*) AS cnt
                 FROM g GROUP BY doc_id, source, lang, b),
          lm AS (SELECT b,
                    sum(CASE WHEN lang = '$DsirTarget' THEN cnt ELSE 0 END) AS ct,
                    sum(CASE WHEN lang <> '$DsirTarget' THEN cnt ELSE 0 END) AS cs
                 FROM g2 GROUP BY b),
          tot AS (SELECT sum(ct) AS tt, sum(cs) AS ts FROM lm),
          w AS (SELECT b, ln(((ct + 1.0) * (ts + $DsirBuckets.0))
                             / ((cs + 1.0) * (tt + $DsirBuckets.0))) AS wb
                FROM lm, tot),
          dw AS (SELECT doc_id, any_value(source) AS source,
                        round(sum(wb * cnt) / sum(cnt), 6) AS wt
                 FROM g2 JOIN w USING (b) GROUP BY doc_id)
          SELECT source, count(*) AS n_docs, round(avg(wt), 6) AS mean_w,
                 CAST(sum(CASE WHEN wt > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_selected,
                 round(sum(CASE WHEN wt > 0 THEN 1 ELSE 0 END)
                       / CAST(count(*) AS DOUBLE), 6) AS sel_frac
          FROM dw GROUP BY source ORDER BY source""")
  )

  /** q160 — l-diversity audit (the sensitive-attribute refinement of
    * q152): group customers by the quasi-identifier pair (nation,
    * account-balance kilobucket) and measure, per equivalence class, the
    * number of DISTINCT sensitive values (market segment). k-anonymity
    * alone is defeated by a homogeneous class — 50 people who all share
    * one segment leak the segment of anyone linked into the class even
    * though k=50 — and l-diversity is the census of exactly that
    * failure: the distribution of classes (and rows) by their l, plus
    * the corpus minimum. Release reviews read min_l the way q152 reads
    * min_k.
    *
    * Determinism: everything is exact counts except class_frac, one
    * rounded division per row.
    *
    * Scale notes: one QI-keyed aggregate (map-side combine,
    * class-count-sized result), one l-keyed aggregate over it (≤
    * |segments| rows), one 1-row broadcast for the total. */
  private val q160 = GQuery(
    "q160_l_diversity",
    (s, d) => {
      val classes = Tables.customer(s, d)
        .groupBy(col("c_nationkey"),
          floor(col("c_acctbal") / 1000d).cast("bigint").as("kb"))
        .agg(countDistinct(col("c_mktsegment")).as("l"),
          count(lit(1)).as("k"))
      val tot = classes.agg(count(lit(1)).as("tot_classes"),
        min(col("l")).as("min_l"))
      classes.groupBy(col("l"))
        .agg(count(lit(1)).as("n_classes"), sum(col("k")).as("n_rows"))
        .crossJoin(broadcast(tot))
        .select(col("l"), col("n_classes"), col("n_rows"),
          round(col("n_classes") / col("tot_classes"), 6).as("class_frac"),
          col("min_l"))
        .orderBy(col("l"))
    },
    Some("""WITH c AS (SELECT c_nationkey,
                    CAST(floor(c_acctbal / 1000) AS BIGINT) AS kb,
                    count(DISTINCT c_mktsegment) AS l, count(*) AS k
              FROM customer GROUP BY 1, 2),
          t AS (SELECT count(*) AS tot_classes, min(l) AS min_l FROM c)
          SELECT l, count(*) AS n_classes,
                 CAST(sum(k) AS BIGINT) AS n_rows,
                 round(count(*) / CAST(tot_classes AS DOUBLE), 6) AS class_frac,
                 CAST(min_l AS BIGINT) AS min_l
          FROM c, t GROUP BY l, tot_classes, min_l ORDER BY l""")
  )

  /** Laplace scale b = 1/ε for q161 (ε = 0.1 per released count). */
  private val DpScale = 10.0

  /** q161 — ε-differentially-private histogram release: per-source
    * document counts plus Laplace(1/ε) noise, the release mechanism that
    * q153's contribution capping exists to feed (cap bounds per-user
    * sensitivity; this adds the noise scaled to it). Noise is
    * DETERMINISTIC here by construction — the uniform draw is the
    * source name's md5 mapped into (-1/2, 1/2), inverted through the
    * Laplace CDF (u = ((h mod 2^20)+0.5)/2^20 − 1/2, noise =
    * −b·sign(u)·ln(1−2|u|)) — which is exactly how a seeded production
    * release derives per-key noise (a keyed PRF), and what lets the
    * DuckDB oracle check every released value bit-for-bit. The released
    * count is max(0, round(true+noise)) — integer post-processing, DP by
    * the post-processing theorem.
    *
    * Determinism: h is the shared md5-60 hash; u is exact dyadic
    * arithmetic; the ln/round pipeline is the fixed-formula double
    * discipline (q156 precedent); released counts are integers.
    *
    * Scale notes: one source-keyed aggregate (map-side combine) reduces
    * the corpus to |sources| rows; everything after is per-row scalar
    * arithmetic on that tiny relation. */
  private val q161 = GQuery(
    "q161_dp_histogram",
    (s, d) => {
      val counts = Tables.documents(s, d)
        .groupBy(col("source")).agg(count(lit(1)).as("n_true"))
      val h = TextOps.shingleHash60(concat(col("source"), lit(":dp")))
      val u = (pmod(h, lit(1048576L)) + lit(0.5)) / lit(1048576.0) - lit(0.5)
      counts
        .withColumn("u", u)
        .withColumn("noise",
          lit(-DpScale) * signum(col("u"))
            * log(lit(1.0) - lit(2.0) * abs(col("u"))))
        .select(col("source"), col("n_true"),
          round(col("noise"), 6).as("noise"),
          greatest(lit(0L),
            round(col("n_true") + col("noise"), 0).cast("bigint"))
            .as("released"))
        .withColumn("abs_err", abs(col("released") - col("n_true")))
        .orderBy(col("source"))
    },
    Some(s"""WITH c AS (SELECT source, count(*) AS n_true
              FROM documents GROUP BY source),
          n AS (SELECT source, n_true,
                   ((CAST(concat('0x', substr(md5(source || ':dp'), 1, 15))
                      AS BIGINT) % 1048576) + 0.5) / 1048576.0 - 0.5 AS u
                FROM c),
          r AS (SELECT source, n_true,
                   -$DpScale * sign(u) * ln(1.0 - 2.0 * abs(u)) AS noise
                FROM n)
          SELECT source, n_true, round(noise, 6) AS noise,
                 greatest(0, CAST(round(n_true + noise) AS BIGINT)) AS released,
                 abs(greatest(0, CAST(round(n_true + noise) AS BIGINT))
                     - n_true) AS abs_err
          FROM r ORDER BY source""")
  )

  val all: Seq[GQuery] = Seq(q159, q160, q161)
}
