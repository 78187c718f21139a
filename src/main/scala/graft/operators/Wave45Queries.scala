package graft.operators

import graft.GQuery
import graft.functions.TextOps
import graft.sources.{Io, Tables}
import org.apache.spark.sql.functions._

/** Round-14 wave 45: q223 — prefix-cache sharing audit.
  *
  * Serving economics the index family does not cover: an LLM inference
  * tier caches the KV blocks of shared PROMPT PREFIXES (vLLM-style
  * prefix caching / radix trees), and the planning question over a
  * corpus of prompts is "how many prefill tokens would a prefix cache
  * absorb at block size P?" — two requests sharing their first P
  * tokens pay the prefill once. This sheet measures that directly: at
  * each prefix length P ∈ {4, 8, 16, 32}, documents bucket by the md5
  * of their first-P-token prefix, and every bucket of size cnt saves
  * (cnt − 1)·P prefill tokens. Reported per P: eligible documents
  * (length ≥ P), distinct prefixes, saved tokens, the saved fraction
  * of all eligible prefill (ppm), and the hottest prefix's share —
  * the number the cache-sizing and router-affinity decisions read.
  *
  * Exactness: buckets are md5 STRINGS of the literal joined prefix
  * (the q36 fingerprint discipline), counts and the ppm ratio are
  * integer arithmetic — no floats anywhere.
  *
  * Scale notes (100 TB): ONE corpus pass — each document emits ≤ 4
  * (P, prefix-hash) rows map-side (a bounded fan-out, not a token
  * explode), partial-counted before the (P, hash) shuffle, whose
  * cardinality is ≤ 4·|docs| worst-case and collapses toward the
  * number of DISTINCT prefixes (the quantity being measured — a
  * high-sharing corpus shuffles LESS). The per-P rollup is a 4-group
  * aggregate over the bucket relation. A hot prefix (everyone shares
  * one template) is exactly a hot KEY carrying a partial count, not a
  * data pile-up — the count-combine absorbs it map-side. */
object Wave45Queries {

  private val Ps = Seq(4, 8, 16, 32)

  private val q223 = GQuery(
    "q223_prefix_cache",
    (s, d) => {
      val toks = Io.fanOut(Tables.documents(s, d).select(col("text")))
        .select(TextOps.tokens(col("text")).as("t"))
      val pref = toks.select(explode(array(Ps.map { p =>
          struct(lit(p.toLong).as("p"),
            when(size(col("t")) >= p,
              md5(concat_ws(" ", slice(col("t"), 1, p)))).as("ph"))
        }: _*)).as("e"))
        .select(col("e.p").as("p"), col("e.ph").as("ph"))
        .filter(col("ph").isNotNull)
      val buckets = pref.groupBy(col("p"), col("ph"))
        .agg(count(lit(1)).as("cnt"))
      buckets.groupBy(col("p"))
        .agg(sum(col("cnt")).as("docs_eligible"),
          count(lit(1)).as("prefixes"),
          sum((col("cnt") - 1L) * col("p")).as("saved_tokens"),
          max(col("cnt")).as("max_bucket"))
        .select(col("p"), col("docs_eligible"), col("prefixes"),
          col("saved_tokens"),
          expr("(saved_tokens * 1000000) div (docs_eligible * p)")
            .as("saved_ppm"),
          col("max_bucket"))
        .orderBy(col("p"))
    },
    Some(s"""WITH t AS (SELECT string_split(text, ' ') AS toks
                 FROM documents),
          pref AS (SELECT p.p,
                     md5(array_to_string(toks[1:CAST(p.p AS INT)], ' ')) AS ph
                   FROM t, (SELECT unnest([${Ps.mkString(", ")}]) AS p) p
                   WHERE len(toks) >= p.p),
          b AS (SELECT CAST(p AS BIGINT) AS p, ph,
                  CAST(count(*) AS BIGINT) AS cnt
                FROM pref GROUP BY p, ph)
          SELECT p, CAST(sum(cnt) AS BIGINT) AS docs_eligible,
                 CAST(count(*) AS BIGINT) AS prefixes,
                 CAST(sum((cnt - 1) * p) AS BIGINT) AS saved_tokens,
                 CAST(sum((cnt - 1) * p) * 1000000
                   // (sum(cnt) * p) AS BIGINT) AS saved_ppm,
                 CAST(max(cnt) AS BIGINT) AS max_bucket
          FROM b GROUP BY p ORDER BY p""")
  )

  val all: Seq[GQuery] = Seq(q223)
}
