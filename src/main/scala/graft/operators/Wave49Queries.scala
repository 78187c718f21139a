package graft.operators

import graft.GQuery
import graft.functions.TextOps
import graft.sources.{Io, Tables}
import org.apache.spark.sql.functions._

/** Round-14 wave 49: q227 — interpolated Kneser–Ney bigram estimator.
  *
  * The LM-statistics family has raw MLE bigram coherence (q75), bigram
  * novelty (q82), perplexity bucketing under an additive-smoothed LM
  * (q101) and BPE pair statistics (q99) — but not the smoothing
  * production LM-based data filters actually use: interpolated
  * Kneser–Ney (Kneser & Ney 1995; Chen & Goodman 1996 §2.7 — the
  * KenLM default), whose two ideas are absolute discounting (subtract
  * a constant D from every seen bigram count) and a CONTINUATION
  * unigram (how many distinct contexts a word follows, not how often
  * it occurs — the "San Francisco" correction).
  *
  * The estimator, with D = 3/4 exact-rational:
  *   P(w2|w1) = (c(w1 w2) − D)/c(w1·) + D·N1+(w1·)/c(w1·) · N1+(·w2)/T
  * (max(c−D, 0) never binds on a count relation — c ≥ 1 > D). Both
  * engines compute it in scaled integer arithmetic: each term is a
  * ×250000-scaled exact integer ratio (10^6·(c−3/4)/c1 =
  * (4c−3)·250000 div c1; 10^6·(3/4)·n1f·n1p/(c1·T) = 3·n1f·n1p·250000
  * div (c1·T)), truncated per term — identical operations, identical
  * truncation, so the hash gate checks the smoothing algebra itself.
  * Headroom: 3·n1f·n1p·250000 stays under 2^63 to vocabularies of
  * ~10^6 types; past that the term needs a pre-division rescale.
  *
  * Sheet: the top-20 bigrams by raw count (ties broken by (w1, w2))
  * with every ingredient — c12, c1 = Σ_w c(w1 w), N1+(w1·), N1+(·w2)
  * — and the smoothed p_ppm, so a reader can audit the discount's
  * effect against q75's raw MLE on the same pairs.
  *
  * Scale notes (100 TB): ONE corpus pass (bigram explode → (w1,w2)
  * count shuffle with map-side combine — the q57 discipline); every
  * relation after that is bigram-TYPE-sized (≤ V², with all three
  * marginals derived from the type relation, not re-scanned), joined
  * unhinted so AQE broadcasts by measured size (the q42 policy); T is
  * a 1-row broadcast. TakeOrderedAndProject serves the head. */
object Wave49Queries {

  private val q227 = GQuery(
    "q227_kn_bigram",
    (s, d) => {
      // r17: native positional-bigram kernel (see q57)
      graft.functions.ShingleStrings.register(s, 2)
      val base = Io.fanOut(Tables.documents(s, d).select(col("text")))
        .select(TextOps.tokens(col("text")).as("toks"))
      val bg = base.select(
          explode(graft.functions.ShingleStrings(col("toks"), 2)).as("b"))
        .groupBy(col("b")).agg(count(lit(1)).as("c12"))
        .select(split(col("b"), " ").getItem(0).as("w1"),
          split(col("b"), " ").getItem(1).as("w2"), col("c12"))
      val cw = bg.groupBy(col("w1"))
        .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n1f"))
      val np = bg.groupBy(col("w2")).agg(count(lit(1)).as("n1p"))
      val tot = bg.agg(count(lit(1)).as("t"))
      bg.join(cw, "w1").join(np, "w2").crossJoin(broadcast(tot))
        .select(col("w1"), col("w2"), col("c12"), col("c1"),
          col("n1f"), col("n1p"),
          (expr("(4 * c12 - 3) * 250000 div c1")
            + expr("(3 * n1f * n1p * 250000) div (c1 * t)")).as("p_ppm"))
        .orderBy(col("c12").desc, col("w1"), col("w2"))
        .limit(20)
    },
    Some("""WITH t0 AS (SELECT string_split(text, ' ') AS toks FROM documents),
                 bgo AS (SELECT unnest(list_transform(range(1, len(toks)),
                                  i -> toks[i])) AS w1,
                                unnest(list_transform(range(1, len(toks)),
                                  i -> toks[i + 1])) AS w2
                         FROM t0),
                 bg AS MATERIALIZED (
                   SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
                   FROM bgo GROUP BY 1, 2),
                 cw AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
                               CAST(count(*) AS BIGINT) AS n1f
                        FROM bg GROUP BY 1),
                 np AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1p
                        FROM bg GROUP BY 1),
                 tt AS (SELECT CAST(count(*) AS BIGINT) AS t FROM bg)
            SELECT w1, w2, c12, c1, n1f, n1p,
                   CAST((4 * c12 - 3) * 250000 // c1
                        + (3 * n1f * n1p * 250000) // (c1 * t)
                     AS BIGINT) AS p_ppm
            FROM bg JOIN cw USING (w1) JOIN np USING (w2) CROSS JOIN tt
            ORDER BY c12 DESC, w1, w2 LIMIT 20""")
  )

  val all: Seq[GQuery] = Seq(q227)
}
