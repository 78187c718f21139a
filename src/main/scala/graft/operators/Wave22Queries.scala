package graft.operators

import graft.GQuery
import graft.functions.TextOps
import graft.sources.{Io, Tables}
import org.apache.spark.sql.functions._

/** Round-10 wave 22: corpus-composition direction, mixture health, and
  * sequence-budget planners — directional source containment (q179, the
  * asymmetric refinement of q134's overlap matrix), mixture effective
  * sample size (q180, the diversity dial behind q169's temperature
  * sheet), the span-corruption planning sheet (q181, the T5-style
  * masking cost grid), the RAG chunk-overlap audit (q182), and the
  * re-identification uniqueness sheet over a QI-projection grid (q184,
  * the grouping-sets census that feeds q152/q160). Every shape reduces
  * the corpus to a vocabulary-, |sources|- or |grid|-sized aggregate
  * before any window or join fan-out, and every published statistic has
  * an exact integer numerator.
  */
object Wave22Queries {

  /** Shingle width for q179 — the dedup family's unit (same as q174's
    * AblN), so "contained content" means the same 5-gram mass the LSH
    * index deduplicates on. */
  private val CntN = 5

  /** q179 — directional source-containment matrix: for every ORDERED
    * source pair (a, b), the fraction of a's distinct 5-gram shingle
    * vocabulary that also exists in b. q134's Jaccard says two sources
    * overlap; this says WHICH WAY the copying runs — a mirror site has
    * containment ≈ 1 toward its upstream while the upstream's toward it
    * is small, and that asymmetry (invisible to any symmetric measure)
    * is how a crawl triages who to drop. Read with q174: ablation prices
    * what is lost, containment says who still carries it.
    *
    * Determinism: exact distinct counts; one rounded division per row;
    * total (source_a, source_b) order.
    *
    * Scale notes: the (source, sgh) presence relation is the dedup
    * family's posting map reduced by DISTINCT (vocabulary-sized, built
    * from ONE materialized explode pass feeding both consumers); the
    * intersection is an sgh-keyed equi-self-join whose fan-out is
    * bounded by |sources|² per shingle (sources are tens, never
    * corpus-scale); the pair grid is a |sources|²-row broadcast cross.
    * Nothing corpus-sized survives the first aggregate. */
  private val q179 = GQuery(
    "q179_source_containment",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val occ = Io.materialize(
        CorpusOps.shingleHashes(
          Io.fanOut(docs.select(col("doc_id"), col("text"))),
          "doc_id", "text", CntN)
          .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
          .select(col("source"), col("sgh")).distinct())
      val per = occ.groupBy(col("source")).agg(count(lit(1)).as("vocab"))
      val inter = occ.select(col("source").as("source_a"), col("sgh"))
        .join(occ.select(col("source").as("source_b"), col("sgh")), Seq("sgh"))
        .filter(col("source_a") =!= col("source_b"))
        .groupBy(col("source_a"), col("source_b"))
        .agg(count(lit(1)).as("n_inter"))
      val grid = per.select(col("source").as("source_a"),
          col("vocab").as("vocab_a"))
        .crossJoin(broadcast(per.select(col("source").as("source_b"))))
        .filter(col("source_a") =!= col("source_b"))
      grid.join(inter, Seq("source_a", "source_b"), "left")
        .select(col("source_a"), col("source_b"), col("vocab_a"),
          coalesce(col("n_inter"), lit(0L)).as("n_inter"))
        .withColumn("containment",
          round(col("n_inter") / col("vocab_a"), 6))
        .orderBy(col("source_a"), col("source_b"))
    },
    Some(s"""WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS t
                    FROM documents),
          sh AS (SELECT DISTINCT source,
                     CAST(concat('0x', substr(md5(sg), 1, 15)) AS BIGINT) AS sgh
                 FROM (SELECT source,
                         unnest(list_distinct([array_to_string(t[i:i+${CntN - 1}], ' ')
                           FOR i IN range(1, len(t) - ${CntN - 2})])) AS sg
                       FROM toks WHERE len(t) >= $CntN)),
          per AS (SELECT source, count(*) AS vocab FROM sh GROUP BY source),
          ix AS (SELECT a.source AS source_a, b.source AS source_b,
                        count(*) AS n_inter
                 FROM sh a JOIN sh b ON a.sgh = b.sgh AND a.source <> b.source
                 GROUP BY 1, 2),
          g AS (SELECT a.source AS source_a, b.source AS source_b,
                       a.vocab AS vocab_a
                FROM per a, per b WHERE a.source <> b.source)
          SELECT source_a, source_b, vocab_a,
                 coalesce(n_inter, 0) AS n_inter,
                 round(coalesce(n_inter, 0) / CAST(vocab_a AS DOUBLE), 6)
                   AS containment
          FROM g LEFT JOIN ix USING (source_a, source_b)
          ORDER BY source_a, source_b""")
  )

  /** Temperature grid for q180 (percent) — q169's grid, measured here
    * for mixture HEALTH instead of per-source shares. */
  private val EssGrid = Seq(25, 50, 100)

  /** q180 — mixture effective sample size: for each sampling temperature
    * α, ESS = (Σw)²/Σw² of the per-source weights — the "how many
    * sources is this mixture REALLY drawing from" number (ESS = k for a
    * uniform k-source mixture, → 1 as one source dominates). q169
    * publishes each source's share; this is the one-row-per-α health
    * summary a mixture owner alarms on, plus the max single-source
    * probability. Weight convention: α=1 uses RAW token counts (exact,
    * and scale-free for ESS — the 10⁶ integerization q169 needs for its
    * share grid would push Σw² past int128 at petabyte scale for no
    * precision gain here); α=1/2, 1/4 use q169's micro-integerized
    * IEEE-exact sqrt chain.
    *
    * Determinism: Σw and Σw² accumulate exactly (decimal(38,0) /
    * HUGEINT — w² ≤ 10²⁶ at 100 TB token counts, inside both); ESS is
    * one fixed-order double expression (s·s/q) rounded once, ESS/k and
    * p_max single rounded divisions.
    *
    * Scale notes: the corpus reduces to a |sources|-row aggregate before
    * the ×|grid| fan-out; everything after is |grid|-row arithmetic. */
  private val q180 = GQuery(
    "q180_mixture_ess",
    (s, d) => {
      val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
      val src = Tables.documents(s, d).groupBy(col("source")).agg(
        sum(size(TextOps.tokens(col("text"))).cast("bigint")).as("n_tok"))
      val nt = col("n_tok").cast("double")
      val e = src
        .withColumn("alpha_pct", explode(array(EssGrid.map(lit(_)): _*)))
        .withColumn("w",
          when(col("alpha_pct") === 100, col("n_tok"))
            .when(col("alpha_pct") === 50,
              round(sqrt(nt) * 1000000.0).cast("bigint"))
            .otherwise(round(sqrt(sqrt(nt)) * 1000000.0).cast("bigint")))
      val agg = e.groupBy(col("alpha_pct")).agg(
        count(lit(1)).as("n_sources"),
        sum(col("w").cast(dec38)).as("sw"),
        sum(col("w").cast(dec38) * col("w").cast(dec38)).as("sq"),
        max(col("w")).as("wmax"))
      val sD = col("sw").cast("double")
      val ess = sD * sD / col("sq").cast("double")
      agg.select(col("alpha_pct"), col("n_sources"),
          round(ess, 4).as("ess"),
          round(ess / col("n_sources"), 6).as("ess_frac"),
          round(col("wmax").cast("double") / sD, 6).as("p_max"))
        .orderBy(col("alpha_pct"))
    },
    Some("""WITH src AS (SELECT source,
                   CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tok
              FROM documents GROUP BY source),
          e AS (SELECT source, alpha_pct,
                   CASE WHEN alpha_pct = 100 THEN n_tok
                        WHEN alpha_pct = 50 THEN
                          CAST(round(sqrt(CAST(n_tok AS DOUBLE)) * 1000000.0)
                            AS BIGINT)
                        ELSE
                          CAST(round(sqrt(sqrt(CAST(n_tok AS DOUBLE)))
                            * 1000000.0) AS BIGINT) END AS w
                FROM src, (SELECT unnest([25, 50, 100]) AS alpha_pct)),
          a AS (SELECT alpha_pct, count(*) AS n_sources,
                   sum(CAST(w AS HUGEINT)) AS sw,
                   sum(CAST(w AS HUGEINT) * w) AS sq,
                   CAST(max(w) AS BIGINT) AS wmax
                FROM e GROUP BY alpha_pct)
          SELECT alpha_pct, n_sources,
                 round(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE)
                   / CAST(sq AS DOUBLE), 4) AS ess,
                 round(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE)
                   / CAST(sq AS DOUBLE) / n_sources, 6) AS ess_frac,
                 round(CAST(wmax AS DOUBLE) / CAST(sw AS DOUBLE), 6) AS p_max
          FROM a ORDER BY alpha_pct""")
  )

  /** (mask ratio %, mean span length) grid for q181 — the corners a
    * span-corruption recipe actually tunes between. */
  private val SpanGrid = Seq((15, 3), (15, 10), (25, 3), (50, 10))

  /** q181 — span-corruption planning sheet (T5-style denoising): for
    * each (mask ratio r, mean span length L) candidate, the exact token
    * accounting of corrupting the corpus — masked tokens = ⌊tok·r/100⌋,
    * sentinel spans = ⌈masked/L⌉, encoder input = tok − masked + spans,
    * decoder target = masked + spans + 1 (EOS) — aggregated to the
    * corpus bill: total input/target tokens, sentinel overhead, and the
    * compute blowup vs plain LM ((input+target)/tok). The q164 planner
    * prices the context window; this prices the denoising recipe on the
    * same token-length distribution before a single sequence is packed.
    *
    * Determinism: integer arithmetic end-to-end (floor/ceil divisions);
    * three rounded divisions per grid row.
    *
    * Scale notes: one map pass (token count per doc) fanned ×|grid| into
    * a |grid|-group aggregate with map-side combine — the q164/q151
    * grid precedent; nothing data-sized survives the aggregate. */
  private val q181 = GQuery(
    "q181_span_corruption_planner",
    (s, d) => {
      val grid = array(SpanGrid.map { case (r, l) =>
        struct(lit(r).as("ratio_pct"), lit(l).as("span_len"))
      }: _*)
      Tables.documents(s, d)
        .select(size(TextOps.tokens(col("text"))).cast("bigint").as("tok"))
        .withColumn("g", explode(grid))
        .select(col("tok"), col("g.ratio_pct").as("ratio_pct"),
          col("g.span_len").as("span_len"))
        .withColumn("masked", expr("(tok * ratio_pct) DIV 100"))
        .withColumn("spans", expr("(masked + span_len - 1) DIV span_len"))
        .groupBy(col("ratio_pct"), col("span_len"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("tok")).as("tok_total"),
          sum(col("masked")).as("masked_total"),
          sum(col("spans")).as("n_spans"),
          sum(col("tok") - col("masked") + col("spans")).as("input_total"),
          sum(col("masked") + col("spans") + lit(1L)).as("target_total"))
        .select(col("ratio_pct"), col("span_len"), col("n_docs"),
          col("tok_total"), col("masked_total"), col("n_spans"),
          col("input_total"), col("target_total"),
          round(col("masked_total") / col("tok_total"), 6).as("mask_frac"),
          round(col("n_spans") / col("tok_total"), 6).as("sentinel_overhead"),
          round((col("input_total") + col("target_total"))
            / col("tok_total").cast("double"), 6).as("blowup"))
        .orderBy(col("ratio_pct"), col("span_len"))
    },
    Some(s"""WITH d AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT)
                    AS tok FROM documents),
          e AS (SELECT tok, ratio_pct, span_len,
                   (tok * ratio_pct) // 100 AS masked
                FROM d, (VALUES ${SpanGrid.map { case (r, l) => s"($r, $l)" }
                    .mkString(", ")}) AS g(ratio_pct, span_len)),
          f AS (SELECT tok, ratio_pct, span_len, masked,
                   (masked + span_len - 1) // span_len AS spans
                FROM e),
          a AS (SELECT ratio_pct, span_len, count(*) AS n_docs,
                   CAST(sum(tok) AS BIGINT) AS tok_total,
                   CAST(sum(masked) AS BIGINT) AS masked_total,
                   CAST(sum(spans) AS BIGINT) AS n_spans,
                   CAST(sum(tok - masked + spans) AS BIGINT) AS input_total,
                   CAST(sum(masked + spans + 1) AS BIGINT) AS target_total
                FROM f GROUP BY 1, 2)
          SELECT ratio_pct, span_len, n_docs, tok_total, masked_total,
                 n_spans, input_total, target_total,
                 round(masked_total / CAST(tok_total AS DOUBLE), 6)
                   AS mask_frac,
                 round(n_spans / CAST(tok_total AS DOUBLE), 6)
                   AS sentinel_overhead,
                 round((input_total + target_total)
                   / CAST(tok_total AS DOUBLE), 6) AS blowup
          FROM a ORDER BY ratio_pct, span_len""")
  )

  /** (chunk size, stride) grid for q182 — stride < chunk is the overlap
    * regime a retrieval index actually runs. */
  private val ChunkGrid = Seq((256, 128), (256, 192), (256, 256), (512, 384))

  /** q182 — RAG chunk-overlap audit: for each (chunk c, stride s)
    * candidate, the exact cost of chunking the corpus for a retrieval
    * index — chunks per doc k = 1 + ⌈max(0, tok−c)/s⌉, emitted tokens =
    * tok + (k−1)·(c−s) (closed form: every non-final chunk is full and
    * re-emits exactly c−s overlapped tokens), duplicated mass, and the
    * index expansion factor. Overlap buys retrieval recall at the price
    * of index size and duplicated-context token spend — this sheet is
    * that price, exact, before an embedding job runs (q66 is the chunker
    * itself; this is its planner, the q164/q181 grid pattern again).
    *
    * Determinism: integer closed forms end-to-end; two rounded divisions
    * and one rounded ratio per grid row.
    *
    * Scale notes: one map pass ×|grid| into a |grid|-group aggregate
    * with map-side combine; the closed form means no per-chunk row
    * fan-out at ANY scale (the chunker explodes; the planner never
    * does). */
  private val q182 = GQuery(
    "q182_chunk_overlap_audit",
    (s, d) => {
      val grid = array(ChunkGrid.map { case (c, st) =>
        struct(lit(c).as("chunk"), lit(st).as("stride"))
      }: _*)
      Tables.documents(s, d)
        .select(size(TextOps.tokens(col("text"))).cast("bigint").as("tok"))
        .withColumn("g", explode(grid))
        .select(col("tok"), col("g.chunk").as("chunk"),
          col("g.stride").as("stride"))
        .withColumn("k",
          expr("1 + (greatest(0L, tok - chunk) + stride - 1) DIV stride"))
        .withColumn("dup", (col("k") - 1) * (col("chunk") - col("stride")))
        .groupBy(col("chunk"), col("stride"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("tok")).as("tok_total"),
          sum(col("k")).as("n_chunks"),
          sum(col("dup")).as("dup_total"))
        .select(col("chunk"), col("stride"), col("n_docs"), col("tok_total"),
          col("n_chunks"), col("dup_total"),
          (col("tok_total") + col("dup_total")).as("emitted_total"),
          round(col("n_chunks") / col("n_docs").cast("double"), 4)
            .as("chunks_per_doc"),
          round(col("dup_total")
            / (col("tok_total") + col("dup_total")).cast("double"), 6)
            .as("dup_frac"),
          round((col("tok_total") + col("dup_total"))
            / col("tok_total").cast("double"), 6).as("expansion"))
        .orderBy(col("chunk"), col("stride"))
    },
    Some(s"""WITH d AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT)
                    AS tok FROM documents),
          e AS (SELECT tok, chunk, stride,
                   1 + (greatest(0, tok - chunk) + stride - 1) // stride AS k
                FROM d, (VALUES ${ChunkGrid.map { case (c, st) => s"($c, $st)" }
                    .mkString(", ")}) AS g(chunk, stride)),
          a AS (SELECT chunk, stride, count(*) AS n_docs,
                   CAST(sum(tok) AS BIGINT) AS tok_total,
                   CAST(sum(k) AS BIGINT) AS n_chunks,
                   CAST(sum((k - 1) * (chunk - stride)) AS BIGINT) AS dup_total
                FROM e GROUP BY 1, 2)
          SELECT chunk, stride, n_docs, tok_total, n_chunks, dup_total,
                 tok_total + dup_total AS emitted_total,
                 round(n_chunks / CAST(n_docs AS DOUBLE), 4) AS chunks_per_doc,
                 round(dup_total / CAST(tok_total + dup_total AS DOUBLE), 6)
                   AS dup_frac,
                 round((tok_total + dup_total) / CAST(tok_total AS DOUBLE), 6)
                   AS expansion
          FROM a ORDER BY chunk, stride""")
  )

  /** Class-size ceiling under which rows count as "at risk" in q184. */
  private val RiskK = 5L

  /** q184 — re-identification uniqueness sheet over a QI-projection
    * grid: for each quasi-identifier projection (nation), (nation,
    * balance-kilobucket), (nation, kilobucket, segment), the census of
    * equivalence-class sizes — singleton classes (unique rows, the
    * re-identifiable ones), ppm uniqueness, the minimum class size, and
    * the row mass in classes ≤ [[RiskK]]. This is the sheet that says
    * WHICH attribute release breaks anonymity: q152/q160 audit one
    * agreed QI set, this prices every prefix of the release in one pass
    * via ROLLUP (grouping sets — one shuffle computes all three
    * projections' classes simultaneously).
    *
    * Determinism: exact integer counts and ppm floor divisions; the QI
    * label derives from the engine-reported grouping id through the same
    * CASE in both engines (the bit convention is asserted by the label
    * mapping itself: a mismatch would produce NULL labels and fail the
    * row hash).
    *
    * Scale notes: ONE rollup aggregate (map-side combine over the
    * grouping-set expansion) produces every projection's classes; the
    * census re-aggregates the class relation (≤ 3× class count) to 3
    * rows. Nothing row-sized survives the first shuffle. */
  private val q184 = GQuery(
    "q184_linkage_uniqueness",
    (s, d) => {
      val c = Tables.customer(s, d).select(
        col("c_nationkey").as("nation"),
        floor(col("c_acctbal") / 1000d).cast("bigint").as("kb"),
        col("c_mktsegment").as("seg"))
      val cls = c.rollup(col("nation"), col("kb"), col("seg"))
        .agg(grouping_id().as("gid"), count(lit(1)).as("k"))
        .filter(col("gid") < 7)
      cls.groupBy(col("gid"))
        .agg(count(lit(1)).as("n_classes"),
          sum(col("k")).as("n_rows"),
          sum(when(col("k") === 1, 1L).otherwise(0L)).as("n_unique"),
          min(col("k")).as("min_k"),
          sum(when(col("k") <= RiskK, col("k")).otherwise(0L))
            .as("rows_at_risk"))
        .select(
          when(col("gid") === 3, "nation")
            .when(col("gid") === 1, "nation+kb")
            .when(col("gid") === 0, "nation+kb+segment").as("qi_set"),
          col("n_classes"), col("n_rows"), col("n_unique"),
          expr("(1000000 * n_unique) DIV n_rows").as("unique_ppm"),
          col("min_k"), col("rows_at_risk"),
          expr("(1000000 * rows_at_risk) DIV n_rows").as("risk_ppm"))
        .orderBy(col("qi_set"))
    },
    Some(s"""WITH c AS (SELECT c_nationkey AS nation,
                    CAST(floor(c_acctbal / 1000) AS BIGINT) AS kb,
                    c_mktsegment AS seg
              FROM customer),
          cls AS (SELECT GROUPING(nation, kb, seg) AS gid, count(*) AS k
                  FROM c GROUP BY ROLLUP (nation, kb, seg)),
          f AS (SELECT * FROM cls WHERE gid < 7),
          a AS (SELECT gid, count(*) AS n_classes,
                   CAST(sum(k) AS BIGINT) AS n_rows,
                   CAST(sum(CASE WHEN k = 1 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_unique,
                   CAST(min(k) AS BIGINT) AS min_k,
                   CAST(sum(CASE WHEN k <= $RiskK THEN k ELSE 0 END)
                     AS BIGINT) AS rows_at_risk
                FROM f GROUP BY gid)
          SELECT CASE WHEN gid = 3 THEN 'nation'
                      WHEN gid = 1 THEN 'nation+kb'
                      WHEN gid = 0 THEN 'nation+kb+segment' END AS qi_set,
                 n_classes, n_rows, n_unique,
                 (1000000 * n_unique) // n_rows AS unique_ppm,
                 min_k, rows_at_risk,
                 (1000000 * rows_at_risk) // n_rows AS risk_ppm
          FROM a ORDER BY qi_set""")
  )

  val all: Seq[GQuery] = Seq(q179, q180, q181, q182, q184)
}
