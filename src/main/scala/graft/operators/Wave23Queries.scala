package graft.operators

import graft.GQuery
import graft.functions.TextOps
import graft.sources.{Io, Tables}
import org.apache.spark.sql.functions._

/** Round-10 wave 23: private aggregate release, embedding hygiene, label
  * production, and composition banding — the ε-DP clipped-sum release
  * (q185, extending q161 from counts to value aggregates), the embedding
  * norm audit (q186), majority-vote label aggregation with per-annotator
  * accuracy (q188 — the production step q157's agreement and q165's
  * noise estimate sit on either side of), the head/body/tail token-band
  * mixture sheet (q189, q178's coverage audit generalized to mass
  * bands), and the per-source PII-density governance sheet (q190, the
  * corpus-level reduce of q89's redaction kernel). All map + bounded
  * aggregates; every statistic has an exact integer numerator.
  */
object Wave23Queries {

  /** Per-event value clip (cents) and Laplace ε for q185. */
  private val ClipCents = 10000L
  private val DpSumScale = 100000.0 // b = clip/ε = 10000/0.1

  /** q185 — ε-DP clipped-sum release: per event type, the
    * differentially-private release of the VALUE SUM — each event's
    * value is integerized to cents and clipped to [[ClipCents]] (the
    * per-record sensitivity bound; the count analogue is q161, the
    * per-user cap q153), then Laplace(clip/ε) noise derived from the
    * type's md5 (the q161 keyed-PRF convention — exactly how a seeded
    * production release works, and what lets DuckDB check every
    * released value bit-for-bit). Released = max(0, round(true +
    * noise)); the sheet also reports the clipped-mass fraction so the
    * release owner can see what the clip itself cost before noise.
    *
    * Determinism: cent sums are exact integers; the uniform draw is
    * exact dyadic arithmetic; one ln per row (q161 parity precedent);
    * released values integer.
    *
    * Scale notes: one type-keyed aggregate (map-side combine) reduces
    * the corpus to |types| rows; everything after is scalar arithmetic
    * on that tiny relation. */
  private val q185 = GQuery(
    "q185_dp_sum_release",
    (s, d) => {
      val cents = round(col("value") * 100, 0).cast("bigint")
      val agg = Tables.events(s, d)
        .select(col("event_type"), cents.as("c"))
        .withColumn("cc", least(col("c"), lit(ClipCents)))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("c")).as("raw_cents"),
          sum(col("cc")).as("clipped_cents"),
          sum(when(col("c") > ClipCents, 1L).otherwise(0L)).as("n_clipped"))
      val h = TextOps.shingleHash60(concat(col("event_type"), lit(":dps")))
      val u = (pmod(h, lit(1048576L)) + lit(0.5)) / lit(1048576.0) - lit(0.5)
      agg
        .withColumn("u", u)
        .withColumn("noise",
          lit(-DpSumScale) * signum(col("u"))
            * log(lit(1.0) - lit(2.0) * abs(col("u"))))
        .select(col("event_type"), col("n"), col("raw_cents"),
          col("clipped_cents"), col("n_clipped"),
          when(col("raw_cents") > 0,
            round(lit(1.0)
              - col("clipped_cents") / col("raw_cents").cast("double"), 6))
            .as("clip_loss_frac"),
          round(col("noise"), 6).as("noise"),
          greatest(lit(0L),
            round(col("clipped_cents") + col("noise"), 0).cast("bigint"))
            .as("released_cents"))
        .orderBy(col("event_type"))
    },
    Some(s"""WITH e AS (SELECT event_type,
                    CAST(round(value * 100) AS BIGINT) AS c
              FROM events),
          a AS (SELECT event_type, count(*) AS n,
                   CAST(sum(c) AS BIGINT) AS raw_cents,
                   CAST(sum(least(c, $ClipCents)) AS BIGINT) AS clipped_cents,
                   CAST(sum(CASE WHEN c > $ClipCents THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_clipped
                FROM e GROUP BY event_type),
          nz AS (SELECT *,
                   ((CAST(concat('0x', substr(md5(event_type || ':dps'), 1, 15))
                      AS BIGINT) % 1048576) + 0.5) / 1048576.0 - 0.5 AS u
                 FROM a),
          r AS (SELECT *,
                   -$DpSumScale * sign(u) * ln(1.0 - 2.0 * abs(u)) AS noise
                FROM nz)
          SELECT event_type, n, raw_cents, clipped_cents, n_clipped,
                 CASE WHEN raw_cents > 0 THEN
                   round(1.0 - clipped_cents / CAST(raw_cents AS DOUBLE), 6)
                 END AS clip_loss_frac,
                 round(noise, 6) AS noise,
                 greatest(0, CAST(round(clipped_cents + noise) AS BIGINT))
                   AS released_cents
          FROM r ORDER BY event_type""")
  )

  /** q186 — embedding norm audit: per label parity, the distribution of
    * vector L2 norms (micro-integerized: round(∥v∥·10⁶) — exact integer
    * sums after ONE per-row sqrt). Cosine-based retrieval assumes norms
    * are irrelevant; dot-product training assumes they are controlled —
    * either way a norm distribution that drifts apart between classes
    * (or grows a zero/huge tail) breaks the geometry q107/q120 audit
    * from other angles. Mean and variance come from exact decimal
    * accumulation (the q120 discipline), min/max exact.
    *
    * Determinism: the per-row kernel is a fixed left-to-right fold +
    * one correctly-rounded sqrt, rounded to the micro grid BEFORE
    * aggregation (the q59/q94 integerize-then-aggregate rule); group
    * stats are exact integer/decimal arithmetic with rounded divisions.
    *
    * Exactness envelope (the q180 convention): the variance numerator
    * sqq·n − sq·sq is decimal(38,0); with micro-norms q ≤ Q it needs
    * (n·Q²)·n ≤ 10³⁸, i.e. n ≤ 10¹³ rows at unit-ish norms (Q ≈ 10⁶)
    * but only n ≤ 10¹² at Q ≈ 10⁷ (norm 10) — the 100 TB row-count
    * boundary. Past it, compute var as sqq/n − (sq/n)² in DOUBLE after
    * the exact integer sums (one extra rounding, no 76-digit
    * intermediate); the exact-decimal form is kept here because the
    * fixtures and the oracle sit far inside the envelope.
    *
    * Scale notes: map-only kernel → 2-group aggregate with map-side
    * combine; nothing else. */
  private val q186 = GQuery(
    "q186_embedding_norm_audit",
    (s, d) => {
      val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
      val nq = round(sqrt(expr(
        "aggregate(embedding, CAST(0.0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"))
        * 1000000.0, 0).cast("bigint")
      Io.fanOut(Tables.embeddings(s, d).select(col("label"), col("embedding")))
        .select((col("label") % 2).cast("int").as("y"), nq.as("q"))
        .groupBy(col("y"))
        .agg(count(lit(1)).as("n"),
          min(col("q")).as("min_q"),
          max(col("q")).as("max_q"),
          sum(col("q").cast(dec38)).as("sq"),
          sum(col("q").cast(dec38) * col("q").cast(dec38)).as("sqq"))
        .select(col("y").as("label_parity"), col("n"),
          round(col("min_q") / 1000000.0, 6).as("min_norm"),
          round(col("max_q") / 1000000.0, 6).as("max_norm"),
          round(col("sq").cast("double") / col("n") / 1000000.0, 6)
            .as("mean_norm"),
          round((col("sqq") * col("n") - col("sq") * col("sq")).cast("double")
            / (col("n").cast("double") * col("n")) / 1e12, 6).as("var_norm"))
        .orderBy(col("label_parity"))
    },
    Some("""WITH q AS (SELECT CAST(label % 2 AS INTEGER) AS y,
                   CAST(round(sqrt(
                     (SELECT sum(CAST(embedding[i.i] AS DOUBLE)
                                 * CAST(embedding[i.i] AS DOUBLE))
                      FROM range(1, 65) i(i))) * 1000000.0) AS BIGINT) AS qn
              FROM embeddings),
          a AS (SELECT y, count(*) AS n,
                   CAST(min(qn) AS BIGINT) AS min_q,
                   CAST(max(qn) AS BIGINT) AS max_q,
                   CAST(sum(qn) AS DECIMAL(38,0)) AS sq,
                   CAST(sum(CAST(qn AS HUGEINT) * qn) AS DECIMAL(38,0)) AS sqq
                FROM q GROUP BY y)
          SELECT y AS label_parity, n,
                 round(min_q / 1000000.0, 6) AS min_norm,
                 round(max_q / 1000000.0, 6) AS max_norm,
                 round(CAST(sq AS DOUBLE) / n / 1000000.0, 6) AS mean_norm,
                 round(CAST(sqq * n - sq * sq AS DOUBLE)
                   / (CAST(n AS DOUBLE) * n) / 1e12, 6) AS var_norm
          FROM a ORDER BY y""")
  )

  /** Per-annotator synthetic flip rates (milli) for q188 — the q158/q165
    * keyed-PRF synthetic-truth convention: ground truth is the label
    * parity, annotator j flips it with probability p_j, so every cell of
    * the sheet is assertable. */
  private val AnnFlipMilli = Seq(100L, 200L, 300L)

  /** q188 — majority-vote label aggregation with per-annotator accuracy:
    * three annotators label every example (truth ⊕ keyed-PRF flip at
    * annotator-specific rates); the sheet reports, per true class,
    * majority-vote accuracy, unanimity rate, and each annotator's
    * individual accuracy (exact ppm). This is the label-PRODUCTION step
    * of the QA family: q157 measures pairwise agreement, q165 estimates
    * noise post-hoc — this is the vote that actually makes the training
    * label, and the sheet shows majority-vote beating every individual
    * annotator (the reason the vote exists).
    *
    * Determinism: flips are md5-keyed PRF comparisons on exact integer
    * milli draws; all counts exact; ppm integer floor division; one
    * rounded division per row.
    *
    * Scale notes: one map pass (three PRF hashes per row) into a 2-group
    * aggregate with map-side combine. */
  private val q188 = GQuery(
    "q188_annotator_majority",
    (s, d) => {
      val y = (col("label") % 2).cast("int")
      def ann(j: Int): org.apache.spark.sql.Column = {
        val flip = pmod(TextOps.shingleHash60(
          concat(col("vec_id").cast("string"), lit(s":an$j"))), lit(1000L)) <
          AnnFlipMilli(j - 1)
        when(flip, lit(1) - col("y")).otherwise(col("y"))
      }
      Tables.embeddings(s, d)
        .select(col("vec_id"), y.as("y"))
        .withColumn("a1", ann(1)).withColumn("a2", ann(2))
        .withColumn("a3", ann(3))
        .withColumn("vote",
          when(col("a1") + col("a2") + col("a3") >= 2, 1).otherwise(0))
        .groupBy(col("y"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("vote") === col("y"), 1L).otherwise(0L)).as("n_maj"),
          sum(when(col("a1") === col("a2") && col("a2") === col("a3"), 1L)
            .otherwise(0L)).as("n_unanimous"),
          sum(when(col("a1") === col("y"), 1L).otherwise(0L)).as("n_a1"),
          sum(when(col("a2") === col("y"), 1L).otherwise(0L)).as("n_a2"),
          sum(when(col("a3") === col("y"), 1L).otherwise(0L)).as("n_a3"))
        .select(col("y").as("true_label"), col("n"),
          expr("(1000000 * n_maj) DIV n").as("maj_acc_ppm"),
          expr("(1000000 * n_unanimous) DIV n").as("unanimous_ppm"),
          expr("(1000000 * n_a1) DIV n").as("a1_acc_ppm"),
          expr("(1000000 * n_a2) DIV n").as("a2_acc_ppm"),
          expr("(1000000 * n_a3) DIV n").as("a3_acc_ppm"),
          round(col("n_maj") / col("n"), 6).as("maj_acc"))
        .orderBy(col("true_label"))
    },
    Some {
      def annSql(j: Int): String =
        s"""CASE WHEN CAST(concat('0x', substr(md5(
                CAST(vec_id AS VARCHAR) || ':an$j'), 1, 15)) AS BIGINT)
                % 1000 < ${AnnFlipMilli(j - 1)}
             THEN 1 - y ELSE y END"""
      s"""WITH b AS (SELECT vec_id, CAST(label % 2 AS INTEGER) AS y
                     FROM embeddings),
           v AS (SELECT y, ${annSql(1)} AS a1, ${annSql(2)} AS a2,
                        ${annSql(3)} AS a3
                 FROM b),
           w AS (SELECT y, a1, a2, a3,
                    CASE WHEN a1 + a2 + a3 >= 2 THEN 1 ELSE 0 END AS vote
                 FROM v),
           a AS (SELECT y, count(*) AS n,
                    CAST(sum(CASE WHEN vote = y THEN 1 ELSE 0 END) AS BIGINT) AS n_maj,
                    CAST(sum(CASE WHEN a1 = a2 AND a2 = a3 THEN 1 ELSE 0 END) AS BIGINT) AS n_unanimous,
                    CAST(sum(CASE WHEN a1 = y THEN 1 ELSE 0 END) AS BIGINT) AS n_a1,
                    CAST(sum(CASE WHEN a2 = y THEN 1 ELSE 0 END) AS BIGINT) AS n_a2,
                    CAST(sum(CASE WHEN a3 = y THEN 1 ELSE 0 END) AS BIGINT) AS n_a3
                 FROM w GROUP BY y)
           SELECT y AS true_label, n,
                  (1000000 * n_maj) // n AS maj_acc_ppm,
                  (1000000 * n_unanimous) // n AS unanimous_ppm,
                  (1000000 * n_a1) // n AS a1_acc_ppm,
                  (1000000 * n_a2) // n AS a2_acc_ppm,
                  (1000000 * n_a3) // n AS a3_acc_ppm,
                  round(n_maj / CAST(n AS DOUBLE), 6) AS maj_acc
           FROM a ORDER BY true_label"""
    }
  )

  /** Band cuts for q189 — head = top [[BandHead]] tokens, body = next up
    * to rank [[BandBody]], tail = everything else (by corpus frequency,
    * token-lexicographic tie-break — q178's total-order convention). */
  private val BandHead = 16
  private val BandBody = 256

  /** q189 — head/body/tail token-band mixture: per source, the fraction
    * of its token MASS that falls in the corpus frequency head, body and
    * tail (exact ppm). q178 asks what a fixed vocabulary misses; this
    * shows each source's position on the frequency curve — a source
    * whose mass is mostly tail is vocabulary-hungry (or noise, and q34
    * already said so); one that is all head is boilerplate. The mixture
    * designer reads it next to q169's temperature sheet.
    *
    * Determinism: band membership is a total-order top-K (count DESC,
    * token ASC); counts exact; ppm integer floor division; ordered
    * output.
    *
    * Scale notes: vocabulary = token-keyed count aggregate (map-side
    * combine) → TakeOrderedAndProject top-[[BandBody]] (per-partition
    * heaps, never a global sort) → one ≤[[BandBody]]-row BROADCAST join
    * onto the (source, token) count relation (itself map-side combined;
    * the corpus never reshuffles by token) → |sources|×3 aggregate. */
  private val q189 = GQuery(
    "q189_freq_band_mix",
    (s, d) => {
      val occ = Io.materialize(
        Io.fanOut(Tables.documents(s, d).select(col("source"), col("text")))
          .select(col("source"), explode(TextOps.tokens(col("text"))).as("tok"))
          .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c")))
      val top = occ.groupBy(col("tok")).agg(sum(col("c")).as("tc"))
        .orderBy(col("tc").desc, col("tok")).limit(BandBody)
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("tc").desc, col("tok"))))
        .select(col("tok"),
          when(col("rk") <= BandHead, "head").otherwise("body").as("band"))
      occ.join(broadcast(top), Seq("tok"), "left")
        .withColumn("band", coalesce(col("band"), lit("tail")))
        .groupBy(col("source"))
        .agg(sum(col("c")).as("n_tok"),
          sum(when(col("band") === "head", col("c")).otherwise(0L)).as("head_tok"),
          sum(when(col("band") === "body", col("c")).otherwise(0L)).as("body_tok"),
          sum(when(col("band") === "tail", col("c")).otherwise(0L)).as("tail_tok"))
        .select(col("source"), col("n_tok"),
          expr("(1000000 * head_tok) DIV n_tok").as("head_ppm"),
          expr("(1000000 * body_tok) DIV n_tok").as("body_ppm"),
          expr("(1000000 * tail_tok) DIV n_tok").as("tail_ppm"),
          col("tail_tok"))
        .orderBy(col("source"))
    },
    Some(s"""WITH occ AS (SELECT source, tok, count(*) AS c
              FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
                    FROM documents)
              GROUP BY source, tok),
          vocab AS (SELECT tok, sum(c) AS tc FROM occ GROUP BY tok),
          top AS (SELECT tok,
                     CASE WHEN row_number() OVER (ORDER BY tc DESC, tok)
                            <= $BandHead THEN 'head' ELSE 'body' END AS band
                  FROM vocab ORDER BY tc DESC, tok LIMIT $BandBody),
          j AS (SELECT source, c, coalesce(band, 'tail') AS band
                FROM occ LEFT JOIN top USING (tok)),
          a AS (SELECT source,
                   CAST(sum(c) AS BIGINT) AS n_tok,
                   CAST(sum(CASE WHEN band = 'head' THEN c ELSE 0 END) AS BIGINT) AS head_tok,
                   CAST(sum(CASE WHEN band = 'body' THEN c ELSE 0 END) AS BIGINT) AS body_tok,
                   CAST(sum(CASE WHEN band = 'tail' THEN c ELSE 0 END) AS BIGINT) AS tail_tok
                FROM j GROUP BY source)
          SELECT source, n_tok,
                 (1000000 * head_tok) // n_tok AS head_ppm,
                 (1000000 * body_tok) // n_tok AS body_ppm,
                 (1000000 * tail_tok) // n_tok AS tail_ppm,
                 tail_tok
          FROM a ORDER BY source""")
  )

  /** q190 — PII-density governance sheet: per source, documents carrying
    * PII, total matches, and matches per million tokens — the corpus-
    * level reduce of q89's redaction kernel (same regexes, same
    * synthetic PII-bearing body so the fixture exercises real matches;
    * a production run points the regexes at the raw text). q89 is the
    * scrubber; this is the exposure report a release review reads to
    * decide where scrubbing effort goes and whether a source should ship
    * at all.
    *
    * Determinism: regexp_count on fixed patterns; exact integer counts;
    * ppm floor division; one rounded division per row.
    *
    * Scale notes: map-only regex kernel (two scans of each document
    * string, no explode) → |sources| aggregate with map-side combine. */
  private val q190 = {
    val emailRe = "[a-z0-9._%-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val ipRe = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
    GQuery(
      "q190_pii_density",
      (s, d) =>
        Io.fanOut(Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("text")))
          .select(col("source"),
            size(TextOps.tokens(col("text"))).cast("bigint").as("tok"),
            (regexp_count(concat(col("text"), lit(" contact user"),
              col("doc_id"), lit("@mail.example.com from 10."),
              pmod(col("doc_id"), lit(200)), lit(".0."),
              pmod(col("doc_id"), lit(250))), lit(emailRe)) +
              regexp_count(concat(col("text"), lit(" contact user"),
                col("doc_id"), lit("@mail.example.com from 10."),
                pmod(col("doc_id"), lit(200)), lit(".0."),
                pmod(col("doc_id"), lit(250))), lit(ipRe))).cast("bigint")
              .as("n_pii"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("tok")).as("n_tok"),
            sum(col("n_pii")).as("n_matches"),
            sum(when(col("n_pii") > 0, 1L).otherwise(0L)).as("n_docs_pii"))
          .select(col("source"), col("n_docs"), col("n_matches"),
            round(col("n_docs_pii") / col("n_docs"), 6).as("doc_frac"),
            expr("(1000000 * n_matches) DIV n_tok").as("match_per_mtok"))
          .orderBy(col("source")),
      Some(s"""WITH p AS (SELECT source,
                      CAST(len(string_split(text, ' ')) AS BIGINT) AS tok,
                      CAST(len(regexp_extract_all(body, '$emailRe')) +
                           len(regexp_extract_all(body, '$ipRe')) AS BIGINT)
                        AS n_pii
                FROM (SELECT source, text,
                        text || ' contact user' || doc_id
                             || '@mail.example.com from 10.'
                             || (doc_id % 200) || '.0.' || (doc_id % 250)
                          AS body
                      FROM documents)),
           a AS (SELECT source, count(*) AS n_docs,
                    CAST(sum(tok) AS BIGINT) AS n_tok,
                    CAST(sum(n_pii) AS BIGINT) AS n_matches,
                    CAST(sum(CASE WHEN n_pii > 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_docs_pii
                 FROM p GROUP BY source)
           SELECT source, n_docs, n_matches,
                  round(n_docs_pii / CAST(n_docs AS DOUBLE), 6) AS doc_frac,
                  (1000000 * n_matches) // n_tok AS match_per_mtok
           FROM a ORDER BY source""")
    )
  }

  val all: Seq[GQuery] = Seq(q185, q186, q188, q189, q190)
}
