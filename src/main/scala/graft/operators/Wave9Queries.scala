package graft.operators

import graft.GQuery
import graft.functions.TextOps.tokens
import graft.sources.{Io, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-7 wave 9: corpus-health analytics — temporal input drift (q133,
  * the batch twin of streaming s19), the source-overlap matrix a mixture
  * designer consumes (q134), the Heaps-law vocabulary-growth audit
  * (q135), and exact one-pass feature correlation (q136).
  *
  * Same derivation as every family (SURVEY §3): map → one keyed shuffle
  * with partial aggregation → bounded reduce state, with each operator's
  * scale argument in its scaladoc.
  */
object Wave9Queries {

  private def fdocs(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    Io.fanOut(Tables.documents(s, d))

  /** q133 — temporal input-drift audit (batch twin of streaming s19):
    * PSI (population stability index) of the event-value distribution,
    * second half of the time range scored against the first half as
    * reference — the retrospective "did the input distribution move"
    * check a pipeline runs over a landed batch before retraining, on the
    * same 8-bucket grid and smoothing as the streaming monitor so batch
    * and stream alarm identically on the same data.
    *
    * Determinism: bucket counts are exact integers from two conditional-
    * sum aggregates; PSI is a FIXED-ORDER 8-term sum of identically-
    * formed double terms (a literal expression chain, not a SUM over a
    * relation), so both engines evaluate the identical IEEE expression.
    *
    * Scale notes: one pass, two 9-long aggregation states (the s19
    * state shape), one 1-row crossjoin — nothing keyed, nothing
    * data-sized anywhere. */
  private val DriftSplit = "2024-01-16"
  private val q133 = GQuery(
    "q133_drift_psi",
    (s, d) => {
      val B = graft.streaming.StreamOps.DriftBuckets
      val width = graft.streaming.StreamOps.DriftBucketWidth
      val bucket = least(lit(B - 1),
        greatest(lit(0), floor(col("value") / width))).cast("int")
      val ev = Tables.events(s, d).withColumn("bucket", bucket)
        .withColumn("late", col("ts") >= lit(DriftSplit).cast("timestamp"))
      def half(late: Boolean, np: String, bp: String) = {
        val aggs = count(lit(1)).as(np) +: (0 until B).map(i =>
          sum(when(col("bucket") === i, 1L).otherwise(0L)).as(s"${bp}$i"))
        ev.filter(col("late") === late).agg(aggs.head, aggs.tail: _*)
      }
      val psi = (0 until B).map { i =>
        val p = (col(s"c$i") + 0.5) / (col("n_cur") + B * 0.5)
        val r = (col(s"r$i") + 0.5) / (col("n_ref") + B * 0.5)
        (p - r) * log(p / r)
      }.reduce(_ + _)
      half(late = false, "n_ref", "r").crossJoin(half(late = true, "n_cur", "c"))
        .select(col("n_ref"), col("n_cur"), round(psi, 6).as("psi"),
          (psi > 0.2).as("drifted"))
    },
    {
      val B = 8
      def cnt(p: String, filt: String) = (0 until B).map(i =>
        s"count(*) FILTER (WHERE $filt AND bucket = $i) AS ${p}$i").mkString(", ")
      val terms = (0 until B).map { i =>
        val p = s"((c$i + 0.5) / (n_cur + 4.0))"
        val r = s"((r$i + 0.5) / (n_ref + 4.0))"
        s"($p - $r) * ln($p / $r)"
      }.mkString(" + ")
      Some(s"""WITH e AS (SELECT LEAST(7, GREATEST(0, CAST(floor(value / 64.0) AS INTEGER))) AS bucket,
                                 ts >= TIMESTAMP '$DriftSplit' AS late
                          FROM events),
               a AS (SELECT count(*) FILTER (WHERE NOT late) AS n_ref,
                            count(*) FILTER (WHERE late) AS n_cur,
                            ${cnt("r", "NOT late")}, ${cnt("c", "late")}
                     FROM e)
               SELECT n_ref, n_cur, round($terms, 6) AS psi,
                      ($terms) > 0.2 AS drifted
               FROM a""")
    }
  )

  /** q134 — source-overlap matrix: pairwise vocabulary Jaccard between
    * every pair of the corpus's sources, exact AND KMV-estimated side by
    * side — the redundancy map a mixture designer (q83/q95's weights)
    * reads before upweighting a source that is secretly a mirror of
    * another. The q129 two-set sketch algebra applied all-pairs.
    *
    * Scale notes: the occurrence relation is (source, token-hash)
    * DISTINCT — one shuffle. The EXACT intersection self-joins it on the
    * hash: each hash bucket holds ≤ |sources| rows, so the join fans out
    * to at most C(|sources|,2) pairs per token — bounded by the source
    * count, never corpus-sized. The sketch side aggregates each source
    * to a k=256-long BoundedHead and does all pair arithmetic on a
    * |sources|²-row broadcast crossjoin of 2-KB states — at a thousand
    * sources that is still metadata-scale. Sketch vs exact error is the
    * published audit column (the q129 contract, per pair). */
  private val SoK = 256
  private val q134 = GQuery(
    "q134_source_overlap",
    (s, d) => {
      val k = SoK
      val occ = Io.materialize(fdocs(s, d)
        .select(col("source"), explode(tokens(col("text"))).as("tok"))
        .select(col("source"),
          graft.functions.TextOps.shingleHash60(col("tok")).as("h"))
        .distinct())
      val per = occ.groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          graft.functions.BoundedHead.head(k)(array(col("h"))).as("hs"))
      val pairs = per.select(col("source").as("source_a"), col("n").as("n_a"),
          col("hs").as("h_a"))
        .crossJoin(broadcast(per.select(col("source").as("source_b"),
          col("n").as("n_b"), col("hs").as("h_b"))))
        .filter(col("source_a") < col("source_b"))
      val inter = occ.select(col("source").as("source_a"), col("h"))
        .join(occ.select(col("source").as("source_b"), col("h")), "h")
        .filter(col("source_a") < col("source_b"))
        .groupBy(col("source_a"), col("source_b"))
        .agg(count(lit(1)).as("n_inter"))
      pairs.join(inter, Seq("source_a", "source_b"), "left")
        .withColumn("n_inter", coalesce(col("n_inter"), lit(0L)))
        .withColumn("hu", slice(array_sort(array_union(col("h_a"), col("h_b"))), 1, k))
        .withColumn("rho", size(array_intersect(
          array_intersect(col("hu"), col("h_a")), col("h_b"))))
        .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
          col("n_inter"),
          round(col("n_inter").cast("double")
            / (col("n_a") + col("n_b") - col("n_inter")), 6).as("jacc_exact"),
          round(col("rho").cast("double") / size(col("hu")), 6).as("jacc_est"))
        .orderBy(col("source_a"), col("source_b"))
    },
    Some(s"""WITH o AS (SELECT DISTINCT source,
                    CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT) AS h
                 FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
                       FROM documents)),
           per AS (SELECT source, count(*) AS n,
                          (list_sort(list(h)))[1:$SoK] AS hs
                   FROM o GROUP BY source),
           pr AS (SELECT a.source AS source_a, b.source AS source_b,
                         a.n AS n_a, b.n AS n_b, a.hs AS h_a, b.hs AS h_b
                  FROM per a, per b WHERE a.source < b.source),
           ix AS (SELECT a.source AS source_a, b.source AS source_b,
                         count(*) AS n_inter
                  FROM o a JOIN o b ON a.h = b.h AND a.source < b.source
                  GROUP BY 1, 2),
           j AS (SELECT pr.*, coalesce(ix.n_inter, 0) AS n_inter,
                        (list_sort(list_distinct(list_concat(h_a, h_b))))[1:$SoK] AS hu
                 FROM pr LEFT JOIN ix USING (source_a, source_b))
           SELECT source_a, source_b, n_a, n_b, n_inter,
                  round(n_inter * 1.0 / (n_a + n_b - n_inter), 6) AS jacc_exact,
                  round(len(list_filter(hu, x -> list_contains(h_a, x)
                                             AND list_contains(h_b, x))) * 1.0
                        / len(hu), 6) AS jacc_est
           FROM j ORDER BY source_a, source_b""")
  )

  /** q135 — vocabulary-growth (Heaps-law) audit: new token TYPES per
    * corpus decile next to token occurrences — the curve that says
    * whether a crawl is still contributing novel vocabulary or has gone
    * asymptotic (diminishing returns for continued collection, and the
    * sizing input for hash-vocab/tokenizer capacity). First occurrence =
    * min(doc_id) per type; deciles cut the doc-id range.
    *
    * Scale notes: one vocabulary-keyed min-aggregate (map-side combine,
    * the q77 shuffle shape), one occurrence count per decile (10 groups),
    * a 1-row max broadcast for the decile width, and a 10-row running
    * sum (window over an aggregate — bounded by construction). */
  private val q135 = GQuery(
    "q135_vocab_growth",
    (s, d) => {
      val occ = fdocs(s, d)
        .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      val maxd = Tables.documents(s, d)
        .agg(max(col("doc_id")).as("maxd"))
      def decile(c: Column) = least(lit(9), c * 10 / (col("maxd") + 1))
        .cast("int")
      val novel = occ.groupBy(col("tok")).agg(min(col("doc_id")).as("first_doc"))
        .crossJoin(broadcast(maxd))
        .groupBy(decile(col("first_doc")).as("decile"))
        .agg(count(lit(1)).as("new_types"))
      val volume = occ.crossJoin(broadcast(maxd))
        .groupBy(decile(col("doc_id")).as("decile"))
        .agg(count(lit(1)).as("n_tokens"))
      volume.join(novel, Seq("decile"), "left")
        .withColumn("new_types", coalesce(col("new_types"), lit(0L)))
        .withColumn("cum_types", sum(col("new_types")).over(
          Window.orderBy(col("decile"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .orderBy(col("decile"))
    },
    Some("""WITH o AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                       FROM documents),
            m AS (SELECT max(doc_id) AS maxd FROM documents),
            nv AS (SELECT LEAST(9, CAST(min_doc * 10 // (maxd + 1) AS INTEGER)) AS decile,
                          count(*) AS new_types
                   FROM (SELECT tok, min(doc_id) AS min_doc FROM o GROUP BY tok), m
                   GROUP BY 1),
            vol AS (SELECT LEAST(9, CAST(doc_id * 10 // (maxd + 1) AS INTEGER)) AS decile,
                           count(*) AS n_tokens
                    FROM o, m GROUP BY 1)
            SELECT CAST(vol.decile AS INTEGER) AS decile, n_tokens,
                   coalesce(new_types, 0) AS new_types,
                   CAST(sum(coalesce(new_types, 0)) OVER (ORDER BY vol.decile
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                     AS cum_types
            FROM vol LEFT JOIN nv USING (decile)
            ORDER BY vol.decile""")
  )

  /** q136 — exact one-pass feature correlation: Pearson r and the
    * regression slope between document byte length and token count —
    * the feature-redundancy audit run before putting both features in a
    * quality model (q34) or stratifying on either (q88), and the
    * one-pass sufficient-statistics pattern (n, Σx, Σy, Σxy, Σx², Σy²)
    * that any pairwise feature matrix reduces to.
    *
    * Determinism: both features are exact integers; all six moments
    * accumulate in exact decimal (order-free); r and the slope derive
    * through one literal double formula on correctly-rounded casts —
    * the q110/q120 moment discipline for products as large as n·Σxy.
    * The per-row products are computed IN decimal (operands cast before
    * the multiply, ADVICE r7): a LongType x·x wraps silently in
    * non-ANSI mode once a feature nears 3e9, while the oracle multiplies
    * in HUGEINT — decimal-first keeps "exact, order-free" true at any
    * feature magnitude.
    *
    * Scale notes: ONE map-side-combined aggregate over one scan; state
    * is six numbers. The textbook distributed statistic. */
  private val q136 = GQuery(
    "q136_feature_corr",
    (s, d) => {
      val dec38 = DecimalType(38, 0)
      def m(c: Column) = sum(c.cast(dec38))
      // decimal-operand products (never long*long): see scaladoc
      def mp(a: Column, b: Column) = sum(a.cast(dec38) * b.cast(dec38))
      val stats = fdocs(s, d)
        .select(col("n_chars").as("x"),
          size(tokens(col("text"))).cast("long").as("y"))
        .agg(count(lit(1)).as("n"), m(col("x")).as("sx"), m(col("y")).as("sy"),
          mp(col("x"), col("y")).as("sxy"),
          mp(col("x"), col("x")).as("sxx"),
          mp(col("y"), col("y")).as("syy"))
      val cov = (col("sxy") * col("n") - col("sx") * col("sy")).cast("double")
      val vx = (col("sxx") * col("n") - col("sx") * col("sx")).cast("double")
      val vy = (col("syy") * col("n") - col("sy") * col("sy")).cast("double")
      stats.select(col("n"),
        round(cov / (sqrt(vx) * sqrt(vy)), 6).as("pearson_r"),
        round(cov / vx, 6).as("slope"))
    },
    Some("""WITH s AS (SELECT count(*) AS n,
                              CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
                              CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
                              CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
                              CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
                              CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
                       FROM (SELECT n_chars AS x,
                                    len(string_split(text, ' ')) AS y
                             FROM documents))
            SELECT n,
                   round(CAST(sxy * n - sx * sy AS DOUBLE)
                         / (sqrt(CAST(sxx * n - sx * sx AS DOUBLE))
                            * sqrt(CAST(syy * n - sy * sy AS DOUBLE))), 6)
                     AS pearson_r,
                   round(CAST(sxy * n - sx * sy AS DOUBLE)
                         / CAST(sxx * n - sx * sx AS DOUBLE), 6) AS slope
            FROM s""")
  )

  val all: Seq[GQuery] = Seq(q133, q134, q135, q136)
}
