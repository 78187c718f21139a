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
  * Scale notes (100 TB): chunking is per-row higher-order-function
  * arithmetic over the token array (boundary positions via filter,
  * chunk slices via transform — whole-stage codegen, NO token-keyed
  * shuffle to form chunks). One corpus pass emits the 3·(chunks/doc)
  * (B, chunk-hash, len) rows map-side; the only shuffle is the
  * (B, hash) count with map-side combine, whose cardinality is the
  * number of DISTINCT chunks — a high-duplication corpus shuffles
  * LESS, the same property q223's prefix buckets have. The rollup is
  * a 3-group aggregate. Chunks travel as md5 hashes (the q66
  * discipline), never as text. */
object Wave48Queries {

  private val Bs = Seq(4, 8, 16)

  /** Chunk list of a token array under boundary modulus b: array of
    * (h = md5 of the space-joined chunk, l = token length). Boundary
    * tokens CLOSE their chunk (inclusive); trailing tokens after the
    * last boundary form a final partial chunk. All element_at calls
    * are guarded by lazily-evaluated CASE branches (ANSI-safe). */
  private def chunks(toks: Column, b: Int): Column = {
    val n = size(toks)
    val bps = filter(sequence(lit(1), n),
      p => pmod(TextOps.shingleHash60(element_at(toks, p)), lit(b)) === 0)
    val ends = when(size(bps) === 0, array(n)).otherwise(
      when(element_at(bps, size(bps)) === n, bps)
        .otherwise(concat(bps, array(n))))
    transform(ends, (e, i) => {
      val start = when(i === 0, lit(1)).otherwise(element_at(ends, i) + 1)
      val len = e - start + 1
      struct(md5(concat_ws(" ", slice(toks, start, len))).as("h"),
        len.cast("long").as("l"))
    })
  }

  private val q226 = GQuery(
    "q226_cdc_chunks",
    (s, d) => {
      val base = Io.fanOut(Tables.documents(s, d).select(col("text")))
        .select(TextOps.tokens(col("text")).as("toks"))
      val inst = base
        .select(explode(array(Bs.map(b =>
          struct(lit(b.toLong).as("bmod"), chunks(col("toks"), b).as("cs"))): _*))
          .as("x"))
        .select(col("x.bmod").as("bmod"), explode(col("x.cs")).as("c"))
        .select(col("bmod"), col("c.h").as("h"), col("c.l").as("l"))
      val perChunk = inst.groupBy(col("bmod"), col("h"))
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
              SELECT h, count(*) AS cnt, max(l) AS l
              FROM (
                SELECT doc_id, grp,
                       md5(string_agg(tok, ' ' ORDER BY pos)) AS h,
                       count(*) AS l
                FROM (
                  SELECT doc_id, tok, pos,
                         coalesce(sum(bnd) OVER (
                           PARTITION BY doc_id ORDER BY pos
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                           0) AS grp
                  FROM (SELECT doc_id, pos, tok,
                               CASE WHEN CAST(concat('0x', substr(md5(tok),
                                 1, 15)) AS BIGINT) % $b = 0
                                 THEN 1 ELSE 0 END AS bnd
                        FROM tt))
                GROUP BY 1, 2)
              GROUP BY 1)"""
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
                     FROM documents),
              u AS (SELECT doc_id,
                           unnest(list_transform(range(1, len(toks) + 1),
                             p -> struct_pack(pos := p, tok := toks[p]))) AS x
                    FROM d),
              tt AS MATERIALIZED (
                SELECT doc_id, CAST(x.pos AS BIGINT) AS pos, x.tok AS tok
                FROM u)
          ${Bs.map(perB).mkString(" UNION ALL ")}
          ORDER BY bmod"""
    }
  )

  val all: Seq[GQuery] = Seq(q226)
}
