package graft.operators

import graft.GQuery
import graft.functions.TextOps
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-9 wave 20: corpus-concentration and classifier-operating-point
  * audits — exact Gini/Lorenz concentration of token mass (q171), the
  * precision/recall/F1 threshold curve (q172), and the leave-one-source
  * ablation sheet (q174). All three reduce the corpus to a frequency- or
  * vocabulary-sized aggregate before any window; every statistic has an
  * exact integer numerator.
  */
object Wave20Queries {

  /** q171 — corpus concentration (exact Gini + top-share Lorenz points):
    * how unequally token mass is spread across documents. Gini uses the
    * grouped rank-statistic form over the DISTINCT-length frequency
    * relation — G = Σ_v v·n_v·(2·cum_below + n_v + 1) / (n·S) − (n+1)/n
    * with average-rank ties, an exact integer numerator (the q166
    * companion trick, applied to inequality instead of ranking). The
    * top-1%/top-10% shares are exact too: a DESC running count picks
    * each value's contribution to the top-k docs (k = ceil-division),
    * including the partial bucket. A corpus whose tokens concentrate in
    * few giant documents packs, shuffles, and trains differently from a
    * flat one — this is the sheet that says which one you have.
    *
    * Determinism: integer arithmetic end-to-end; three rounded
    * divisions; single output row.
    *
    * Exactness envelope: the Gini numerator Σ v·n_v·(2·cum+n_v+1) ≈
    * 2·n_docs·total_tokens blows past int64 well inside the 100 TB
    * design envelope (1e8 docs × 1e13 tokens ≈ 2e21 ≫ 2^63), so the
    * accumulation is WIDENED: Spark sums decimal(38,0) with
    * decimal-operand products (the q120/q136 ADVICE-r7 pattern), the
    * oracle in HUGEINT, and the n·S denominator multiplies in double
    * (two exactly-represented longs → one correctly-rounded multiply,
    * bit-identical to converting the exact product) — no silent wrap in
    * either engine (ADVICE r9).
    *
    * Scale notes: one map pass → distinct-length frequency aggregate
    * (hundreds of rows); both windows (ASC for Gini, DESC for Lorenz)
    * ride over THAT aggregate, never the corpus — the q163 sanctioned
    * shape. */
  private val q171 = GQuery(
    "q171_gini_concentration",
    (s, d) => {
      val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
      val freq = Tables.documents(s, d)
        .select(size(TextOps.tokens(col("text"))).cast("bigint").as("v"))
        .groupBy(col("v")).agg(count(lit(1)).as("c"))
      val asc = Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val desc = Window.orderBy(col("v").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val w = freq
        .withColumn("below", sum(col("c")).over(asc) - col("c"))
        .withColumn("above", sum(col("c")).over(desc) - col("c"))
      val tot = w.agg(sum(col("c")).as("n"), sum(col("v") * col("c")).as("s"))
      w.crossJoin(broadcast(tot))
        .withColumn("k1", expr("(n + 99) DIV 100"))
        .withColumn("k10", expr("(n + 9) DIV 10"))
        .agg(first(col("n")).as("n_docs"),
          first(col("s")).as("total_tokens"),
          sum(col("v").cast(dec38) * col("c").cast(dec38)
            * (lit(2L) * col("below") + col("c") + lit(1L)).cast(dec38))
            .as("num"),
          sum(col("v") * greatest(lit(0L),
            least(col("c"), col("k1") - col("above")))).as("top1_mass"),
          sum(col("v") * greatest(lit(0L),
            least(col("c"), col("k10") - col("above")))).as("top10_mass"))
        .select(col("n_docs"), col("total_tokens"),
          when(col("total_tokens") > 0,
            round(col("num").cast("double")
              / (col("n_docs").cast("double") * col("total_tokens"))
              - (col("n_docs") + lit(1L)).cast("double") / col("n_docs"), 6))
            .as("gini"),
          when(col("total_tokens") > 0,
            round(col("top1_mass") / col("total_tokens"), 6)).as("top1_share"),
          when(col("total_tokens") > 0,
            round(col("top10_mass") / col("total_tokens"), 6))
            .as("top10_share"))
    },
    Some("""WITH f AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS v,
                    count(*) AS c
              FROM documents GROUP BY 1),
          w AS (SELECT v, c,
                   sum(c) OVER (ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c
                     AS below,
                   sum(c) OVER (ORDER BY v DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c
                     AS above
                FROM f),
          t AS (SELECT CAST(sum(c) AS BIGINT) AS n,
                       CAST(sum(v * c) AS BIGINT) AS s FROM f),
          a AS (SELECT any_value(n) AS n_docs, any_value(s) AS total_tokens,
                   sum(CAST(v AS HUGEINT) * c * (2 * below + c + 1)) AS num,
                   CAST(sum(v * greatest(0, least(c, (n + 99) // 100 - above)))
                     AS BIGINT) AS top1_mass,
                   CAST(sum(v * greatest(0, least(c, (n + 9) // 10 - above)))
                     AS BIGINT) AS top10_mass
                FROM w, t)
          SELECT n_docs, total_tokens,
                 CASE WHEN total_tokens > 0 THEN
                   round(CAST(num AS DOUBLE)
                     / (CAST(n_docs AS DOUBLE) * total_tokens)
                     - CAST(n_docs + 1 AS DOUBLE) / n_docs, 6) END AS gini,
                 CASE WHEN total_tokens > 0 THEN
                   round(top1_mass / CAST(total_tokens AS DOUBLE), 6)
                 END AS top1_share,
                 CASE WHEN total_tokens > 0 THEN
                   round(top10_mass / CAST(total_tokens AS DOUBLE), 6)
                 END AS top10_share
          FROM a""")
  )

  /** q172 — classifier operating-point curve (precision/recall/F1 at
    * every decile threshold): for the q165/q166 scorer vs the label
    * parity, the 10-row sheet a filter owner reads to PICK the
    * threshold — q166 says whether the scorer ranks, q158 whether its
    * probabilities are honest, this says what each cutoff actually
    * costs in kept-junk (precision) and lost-good (recall). Counts come
    * from one 10-bucket aggregate re-scanned by a DESC running sum —
    * TP(t) and P(t) for all thresholds in one window pass over 10 rows,
    * never a ×|grid| corpus fan-out.
    *
    * Determinism: exact integer confusion counts; three guarded rounded
    * divisions per row; ordered by threshold.
    *
    * Scale notes: one map pass → 10-row bucket aggregate (map-side
    * combine); the threshold curve is windows + arithmetic over those
    * 10 rows. */
  private val q172 = GQuery(
    "q172_pr_thresholds",
    (s, d) => {
      val sc = Tables.embeddings(s, d).select(
        (col("label") % 2).cast("int").as("y"),
        pmod(TextOps.shingleHash60(
          concat(col("vec_id").cast("string"), lit(":cl"))), lit(1000)).as("p"))
      val b = sc.groupBy((col("p") - pmod(col("p"), lit(100))).as("thr")).agg(
        count(lit(1)).as("n"),
        sum(col("y").cast("bigint")).as("npos"))
      val desc = Window.orderBy(col("thr").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = b.agg(sum(col("n")).as("n_all"), sum(col("npos")).as("pos_all"))
      b.withColumn("tp", sum(col("npos")).over(desc))
        .withColumn("pred_pos", sum(col("n")).over(desc))
        .crossJoin(broadcast(tot))
        .select(col("thr"), col("pred_pos"), col("tp"),
          (col("pred_pos") - col("tp")).as("fp"),
          (col("pos_all") - col("tp")).as("fn"),
          when(col("pred_pos") > 0,
            round(col("tp") / col("pred_pos"), 6)).as("precision"),
          when(col("pos_all") > 0,
            round(col("tp") / col("pos_all"), 6)).as("recall"),
          when(col("pred_pos") + col("pos_all") > 0,
            round((lit(2L) * col("tp"))
              / (col("pred_pos") + col("pos_all")).cast("double"), 6))
            .as("f1"))
        .orderBy(col("thr"))
    },
    Some("""WITH s AS (SELECT CAST(label % 2 AS INTEGER) AS y,
                    CAST(concat('0x', substr(md5(
                        CAST(vec_id AS VARCHAR) || ':cl'), 1, 15))
                      AS BIGINT) % 1000 AS p
              FROM embeddings),
          b AS (SELECT p - (p % 100) AS thr, count(*) AS n,
                   CAST(sum(y) AS BIGINT) AS npos
                FROM s GROUP BY 1),
          w AS (SELECT thr, n, npos,
                   CAST(sum(npos) OVER (ORDER BY thr DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS tp,
                   CAST(sum(n) OVER (ORDER BY thr DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS pred_pos
                FROM b),
          t AS (SELECT CAST(sum(n) AS BIGINT) AS n_all,
                       CAST(sum(npos) AS BIGINT) AS pos_all FROM b)
          SELECT thr, pred_pos, tp, pred_pos - tp AS fp, pos_all - tp AS fn,
                 CASE WHEN pred_pos > 0 THEN
                   round(tp / CAST(pred_pos AS DOUBLE), 6) END AS precision,
                 CASE WHEN pos_all > 0 THEN
                   round(tp / CAST(pos_all AS DOUBLE), 6) END AS recall,
                 CASE WHEN pred_pos + pos_all > 0 THEN
                   round(2 * tp / CAST(pred_pos + pos_all AS DOUBLE), 6)
                 END AS f1
          FROM w, t ORDER BY thr""")
  )

  /** Shingle width for q174 — the dedup family's unit, so "exclusive
    * content" means the same 5-gram mass the LSH index deduplicates
    * on (the fixture's 30-word unigram vocabulary is fully shared, so
    * token-level exclusivity is vacuous; shingle-level is the real
    * signal). */
  private val AblN = 5

  /** q174 — leave-one-source-out ablation sheet: per source, its
    * posting share and how much of the corpus's 5-gram shingle
    * vocabulary exists ONLY there (exclusive content — what an ablation
    * run irrecoverably loses). The flip side of q134's overlap matrix:
    * overlap says which sources mirror each other, this says which
    * sources are irreplaceable. Read together with q169's temperature
    * sheet it prices dropping or downweighting a source.
    *
    * Determinism: exact integer counts; two rounded divisions per row;
    * ordered by source.
    *
    * Scale notes: the occurrence relation is (source, shingle-hash)
    * with doc counts — the dedup family's posting map + one shuffle
    * aggregate (map-side combine); shingle source-multiplicity is a
    * vocabulary-sized aggregate joined back on the 8-byte hash; the
    * sheet is |sources|-sized and the globals ride a 1-row broadcast. */
  private val q174 = GQuery(
    "q174_source_ablation",
    (s, d) => {
      val docs = Tables.documents(s, d)
      // occ feeds two consumers (the multiplicity aggregate and the
      // sheet join) — materialize so the explode+shuffle runs once
      val occ = graft.sources.Io.materialize(
        CorpusOps.shingleHashes(graft.sources.Io.fanOut(
          docs.select(col("doc_id"), col("text"))), "doc_id", "text", AblN)
          .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
          .groupBy(col("source"), col("sgh")).agg(count(lit(1)).as("cnt")))
      val ts = graft.sources.Io.materialize(
        occ.groupBy(col("sgh")).agg(count(lit(1)).as("nsrc")))
      val sheet = occ.join(ts, Seq("sgh"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("shingle_vocab"),
          sum(when(col("nsrc") === 1, 1L).otherwise(0L)).as("shingle_unique"),
          sum(col("cnt")).as("n_postings"))
      val glob = ts.agg(count(lit(1)).as("global_vocab"))
        .crossJoin(sheet.agg(sum(col("n_postings")).as("total_postings")))
      sheet
        .crossJoin(broadcast(glob))
        .select(col("source"), col("n_postings"), col("shingle_vocab"),
          col("shingle_unique"),
          round(col("n_postings") / col("total_postings"), 6)
            .as("posting_share"),
          round(col("shingle_unique") / col("global_vocab"), 6)
            .as("unique_vocab_frac"))
        .orderBy(col("source"))
    },
    Some(s"""WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS t
                    FROM documents),
          sh AS (SELECT doc_id, source,
                     CAST(concat('0x', substr(md5(sg), 1, 15)) AS BIGINT)
                       AS sgh
                 FROM (SELECT doc_id, source,
                         unnest(list_distinct([array_to_string(t[i:i+${AblN - 1}], ' ')
                           FOR i IN range(1, len(t) - ${AblN - 2})])) AS sg
                       FROM toks WHERE len(t) >= $AblN)),
          occ AS (SELECT source, sgh, count(*) AS cnt FROM sh
                  GROUP BY source, sgh),
          ts AS (SELECT sgh, count(*) AS nsrc FROM occ GROUP BY sgh),
          g AS (SELECT (SELECT count(*) FROM ts) AS global_vocab,
                       (SELECT CAST(sum(cnt) AS BIGINT) FROM occ)
                         AS total_postings)
          SELECT source, CAST(sum(cnt) AS BIGINT) AS n_postings,
                 count(*) AS shingle_vocab,
                 CAST(sum(CASE WHEN nsrc = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS shingle_unique,
                 round(sum(cnt) / CAST(any_value(total_postings) AS DOUBLE), 6)
                   AS posting_share,
                 round(sum(CASE WHEN nsrc = 1 THEN 1 ELSE 0 END)
                   / CAST(any_value(global_vocab) AS DOUBLE), 6)
                   AS unique_vocab_frac
          FROM occ JOIN ts USING (sgh), g
          GROUP BY source ORDER BY source""")
  )

  val all: Seq[GQuery] = Seq(q171, q172, q174)
}
