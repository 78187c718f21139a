package graft.operators

import graft.GQuery
import graft.functions.TextOps
import graft.sources.{Io, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Round-14 wave 48: q226 — content-defined chunking (CDC) dedup curve.
  *
  * The dedup family prices whole-document (q24), fixed-stride passage
  * (q74: 20-token spans), shingle/MinHash/SimHash similarity (q25/q31/
  * q32) and fixed-window chunking (q66: 32-token stride-24) — but not
  * the boundary discipline storage dedup actually uses at 100 TB:
  * CONTENT-DEFINED chunking (Muthitacharoen et al. 2001, LBFS; the
  * rsync/restic/ZFS-dedup family), where a chunk ends wherever a
  * rolling hash of the content hits a residue, so an insertion early
  * in a document shifts ONE chunk instead of re-aligning every fixed
  * window after it. The planning question is the boundary modulus B
  * (expected chunk length): small chunks find more duplication but
  * cost more index entries per stored token.
  *
  * This sheet measures that curve. A token closes a chunk when the
  * repo's shared md5-60 PRF of the token ≡ 0 (mod B) — a rolling-hash
  * residue both engines reproduce bit-for-bit — and the trailing
  * tokens after the last boundary form a final partial chunk. Per
  * B ∈ {4, 8, 16}: chunk instances, distinct chunks, total vs stored
  * tokens (one copy per distinct chunk), the dedup savings in ppm,
  * and the hottest chunk's instance count. At the fixture the curve
  * is real: B=4 saves ~18% of tokens, B=16 almost nothing — exactly
  * the granularity trade the modulus buys.
  *
  * Hashing discipline (the r14 sf1 lesson, twice over): the
  * md5-per-chunk first cut ran 9.3×/decade on string rebuilds, and a
  * higher-order-function rewrite (filter + indexed transform +
  * per-chunk slice/aggregate folds) was SLOWER still — interpreted
  * lambda evaluation per token per modulus. The shipped form is one
  * native codegen kernel ([[graft.functions.CdcChunks]]): each token
  * md5-hashed ONCE, all three chunkers fed from the same long, chunks
  * travelling as a packed double 31-bit polynomial rolling hash —
  * integer arithmetic both engines reproduce exactly (intermediates
  * < 2^39, prime mods < 2^31), 2^−62 per-pair collision rate (the q74
  * passages-as-hashes discipline). Fixed-width keys keep the count
  * aggregate on HashAggregate's fast path. 43 s → ~3 s at sf1.
  *
  * Scale notes (100 TB): chunking is one map-only kernel call per
  * document (O(tokens) total; NO token-keyed shuffle to form chunks).
  * One corpus pass emits the 3·(chunks/doc) (B, chunk-key, len) rows;
  * the only shuffle is the (B, key) count with map-side combine, whose
  * cardinality is the number of DISTINCT chunks — a high-duplication
  * corpus shuffles LESS, the same property q223's prefix buckets have.
  * The rollup is a 3-group aggregate. */
object Wave48Queries {

  // one definition of the chunk-key geometry: the kernel's
  private val Bs = graft.functions.CdcChunks.Bs.toSeq
  private val M31 = graft.functions.CdcChunks.M31
  private val P1 = graft.functions.CdcChunks.P1
  private val P2 = graft.functions.CdcChunks.P2

  private val q226 = GQuery(
    "q226_cdc_chunks",
    (s, d) => {
      graft.functions.CdcChunks.register(s)
      val inst = Io.fanOut(Tables.documents(s, d).select(col("text")))
        .select(explode(graft.functions.CdcChunks(col("text"))).as("c"))
        .select(col("c.bmod").as("bmod"), col("c.k").as("k"),
          col("c.l").as("l"))
      val perChunk = inst.groupBy(col("bmod"), col("k"))
        .agg(count(lit(1)).as("cnt"), max(col("l")).as("l"))
      perChunk.groupBy(col("bmod"))
        .agg(sum(col("cnt")).as("chunks"),
          count(lit(1)).as("uniq_chunks"),
          sum(col("cnt") * col("l")).as("total_toks"),
          sum(col("l")).as("stored_toks"),
          max(col("cnt")).as("hottest"))
        .select(col("bmod"), col("chunks"), col("uniq_chunks"),
          col("total_toks"), col("stored_toks"),
          expr("(total_toks - stored_toks) * 1000000 div total_toks")
            .as("savings_ppm"),
          col("hottest"))
        .orderBy(col("bmod"))
    },
    Some {
      def perB(b: Int): String =
        s"""SELECT ${b}::BIGINT AS bmod,
               CAST(sum(cnt) AS BIGINT) AS chunks,
               CAST(count(*) AS BIGINT) AS uniq_chunks,
               CAST(sum(cnt * l) AS BIGINT) AS total_toks,
               CAST(sum(l) AS BIGINT) AS stored_toks,
               CAST((sum(cnt * l) - sum(l)) * 1000000 // sum(cnt * l)
                 AS BIGINT) AS savings_ppm,
               CAST(max(cnt) AS BIGINT) AS hottest
            FROM (
              SELECT k, count(*) AS cnt, max(l) AS l
              FROM (
                SELECT c.k AS k, c.l AS l
                FROM (
                  SELECT unnest(list_transform(ends, (e, i) ->
                           struct_pack(
                             k := list_reduce(list_prepend(0::BIGINT,
                                    hs[CASE WHEN i = 1 THEN 1
                                       ELSE ends[i - 1] + 1 END : e]),
                                    (a, x) -> (a * 131 + x % $M31) % $P1)
                                  * $M31
                                + list_reduce(list_prepend(0::BIGINT,
                                    hs[CASE WHEN i = 1 THEN 1
                                       ELSE ends[i - 1] + 1 END : e]),
                                    (a, x) -> (a * 137 + x % $M31) % $P2),
                             l := CAST(e - (CASE WHEN i = 1 THEN 1
                                            ELSE ends[i - 1] + 1 END) + 1
                                       AS BIGINT)))) AS c
                  FROM (
                    SELECT hs,
                           CASE WHEN len(bps) > 0 AND bps[-1] = len(hs)
                                THEN bps
                                ELSE list_append(bps, len(hs)) END AS ends
                    FROM (SELECT hs,
                                 list_filter(range(1, len(hs) + 1),
                                   p -> hs[p] % $b = 0) AS bps
                          FROM h))))
              GROUP BY 1)"""
      s"""WITH d AS (SELECT string_split(text, ' ') AS toks FROM documents),
              h AS MATERIALIZED (
                SELECT list_transform(toks, t ->
                         CAST(concat('0x', substr(md5(t), 1, 15))
                           AS BIGINT)) AS hs
                FROM d)
          ${Bs.map(perB).mkString(" UNION ALL ")}
          ORDER BY bmod"""
    }
  )

  val all: Seq[GQuery] = Seq(q226)
}
