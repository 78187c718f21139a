package graft.operators

import graft.GQuery
import graft.functions.TextOps
import graft.sources.{Io, Tables}
import graft.util.Geometry
import org.apache.spark.sql.functions._

/** Round-13 wave 40: q218 — count-min-sketch accuracy audit. The
  * sketch family has membership (bloom q206, measured), distinct-count
  * (KMV q109, HLL q43), and heavy-hitter identity (Misra–Gries q123) —
  * but no FREQUENCY sketch, and a 100 TB pipeline meters hot-key
  * frequencies (rate limits, skew salting thresholds, mixture caps)
  * from exactly this structure. Cormode & Muthukrishnan's CMS promises
  * est(t) ≥ cnt(t) always and est ≤ cnt + ε·n with high probability;
  * this sheet MEASURES both on the token stream, the q206 discipline
  * applied to frequencies: every counter is md5-keyed PRF arithmetic
  * the oracle reconstructs bit-for-bit, so the published overestimates
  * are facts about the sketch geometry, not floats about a simulation.
  *
  * Sheet: the top-10 tokens by exact count, each with its exact count,
  * CMS estimate (min over d = 3 rows of w = 2^adaptiveBits(vocab)
  * counters — w ≈ vocab/4, so collisions are REAL at every scale and
  * the overestimate column discriminates), the overestimate, and the
  * sketch geometry (width, total token mass) for the ε·n bound the
  * reader checks against.
  *
  * Scale notes (100 TB): one explode → (token)-keyed count (map-side
  * combine — the q77 shape, the family's audited tokenize), then the
  * counter build is a VOCABULARY-sized pass (d·|vocab| rows into a
  * d·w-bounded aggregate — production updates counters per instance;
  * summing per-token counts into the same cells is arithmetic-
  * identical and one corpus scan cheaper), and the audit joins a
  * 30-row broadcast probe against the d·w counter relation. Nothing
  * corpus-sized shuffles twice. */
object Wave40Queries {

  private val CmsD = 3
  // w >= vocab/4: ~4 tokens/bucket on average, so collisions (the thing
  // the sheet prices) are real at every vocabulary size — the fixture's
  // 31-word vocab included (floor 3 bits = 8 cells, not a 64-cell floor
  // that would leave singletons)
  private val CmsOccLog2 = 2
  private val CmsFloorBits = 3
  private val CmsCapBits = 20
  private val TopN = 10

  private val q218 = GQuery(
    "q218_cms_audit",
    (s, d) => {
      val exact = Io.materialize(
        Io.fanOut(Tables.documents(s, d).select(col("text")))
          .select(explode(TextOps.tokens(col("text"))).as("token"))
          .groupBy(col("token")).agg(count(lit(1)).as("cnt")))
      val vocab = exact.count()
      if (vocab == 0)
        exact.select(col("token"), col("cnt").as("exact_cnt"),
          col("cnt").as("cms_est"), col("cnt").as("overest"),
          col("cnt").as("width"), col("cnt").as("n_total")).limit(0)
      else {
        val bits = Geometry.adaptiveBits(vocab, CmsOccLog2,
          CmsFloorBits, CmsCapBits)
        val w = 1L << bits
        def buckets = explode(array((0 until CmsD).map { r =>
          struct(lit(r).as("r"),
            pmod(TextOps.shingleHash60(
              concat(lit(s"$r:"), col("token"))), lit(w)).as("b"))
        }: _*)).as("e")
        val cms = exact.select(col("cnt"), buckets)
          .groupBy(col("e.r").as("r"), col("e.b").as("b"))
          .agg(sum(col("cnt")).as("cc"))
        val top = exact.orderBy(col("cnt").desc, col("token")).limit(TopN)
        val probe = broadcast(top.select(col("token"), col("cnt"), buckets)
          .select(col("token"), col("cnt"),
            col("e.r").as("r"), col("e.b").as("b")))
        val tot = exact.agg(sum(col("cnt")).as("n_total"))
        cms.join(probe, Seq("r", "b"))
          .groupBy(col("token"), col("cnt"))
          .agg(min(col("cc")).as("cms_est"))
          .crossJoin(broadcast(tot))
          .select(col("token"), col("cnt").as("exact_cnt"), col("cms_est"),
            (col("cms_est") - col("cnt")).as("overest"),
            lit(w).as("width"), col("n_total"))
          .orderBy(col("exact_cnt").desc, col("token"))
      }
    },
    Some(s"""WITH c AS MATERIALIZED (SELECT token, count(*) AS cnt
                 FROM (SELECT unnest(string_split(text, ' ')) AS token
                       FROM documents)
                 GROUP BY token),
          wb AS (SELECT (1::BIGINT << ${Geometry.adaptiveBitsSql("count(*)",
            CmsOccLog2, CmsFloorBits, CmsCapBits)}) AS w FROM c),
          rr AS (SELECT unnest(['0', '1', '2']) AS r),
          cms AS MATERIALIZED (SELECT rr.r,
                   CAST(concat('0x', substr(md5(concat(rr.r, ':', token)),
                     1, 15)) AS BIGINT) % wb.w AS b,
                   CAST(sum(cnt) AS BIGINT) AS cc
                 FROM c, rr, wb GROUP BY 1, 2),
          top10 AS (SELECT token, cnt FROM c
                    ORDER BY cnt DESC, token LIMIT $TopN),
          tb AS (SELECT t.token, t.cnt, rr.r,
                   CAST(concat('0x', substr(md5(concat(rr.r, ':', t.token)),
                     1, 15)) AS BIGINT) % wb.w AS b
                 FROM top10 t, rr, wb),
          est AS (SELECT tb.token, tb.cnt, CAST(min(m.cc) AS BIGINT) AS est
                  FROM tb JOIN cms m ON m.r = tb.r AND m.b = tb.b
                  GROUP BY 1, 2)
          SELECT est.token, CAST(est.cnt AS BIGINT) AS exact_cnt,
                 est.est AS cms_est, est.est - est.cnt AS overest,
                 (SELECT w FROM wb) AS width,
                 (SELECT CAST(sum(cnt) AS BIGINT) FROM c) AS n_total
          FROM est ORDER BY exact_cnt DESC, token""")
  )

  val all: Seq[GQuery] = Seq(q218)
}
