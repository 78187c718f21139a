package graft.operators

import graft.GQuery
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-14 wave 60: q238 — Gini split-gain planner (decision stump).
  *
  * Feature selection for quality classifiers is a data-pipeline job
  * (which cheap column best predicts the label, so the filter cascade
  * can run it first — the q219 ordering question one level up), and
  * the standard impurity arithmetic is CART's Gini (Breiman et al.
  * 1984) — chosen here over entropy gain precisely because it is
  * RATIONAL: G = 1 − Σ p², so every quantity in the sheet is an exact
  * integer ppm ratio both engines reproduce (no logs, no libm). Label:
  * a long document (n_chars ≥ 306) over the documents table — the
  * fixture's ONE genuinely correlated pair (n_chars ↔ token count,
  * r ≈ 0.998; every lineitem column is independent by construction,
  * measured in development) — so the sheet shows the planner WORKING:
  * the token-count stump's gain dwarfs the language and source stumps'
  * (independent columns, gain ≈ 0). Candidate splits: ≥56 tokens,
  * lang = 'en', source ∈ {src0..src9}. Per
  * feature: branch sizes and positives, weighted post-split Gini ppm,
  * the gain vs the root's impurity, and the winner flag (max gain,
  * ties by feature name — a rank over the 3-row grid, so the hash
  * gate checks the CHOICE).
  *
  * Overflow discipline: G_ppm needs ⌊10^6·X/n²⌋ with X = p² + q² ≤ n²
  * — the naive 10^6·X overflows past n ≈ 3·10^6 (hit at sf1 in
  * development). Both engines instead compute the exact two-step form
  * ⌊(⌊10^6·X/n⌋)/n⌋ (the nested-floor identity), with the inner
  * division itself split as (X div n)·10^6 + ((X mod n)·10^6) div n —
  * every intermediate ≤ n·10^6, safe to n ≈ 9·10^12 rows.
  *
  * Scale notes (100 TB): ONE map pass over lineitem into a single-row
  * aggregate carrying (n, pos) per branch per feature (6 conditional
  * sums + 2 root sums — map-side combine; source ∈ {src0..src9} is
  * spelled length(source) = 4, identical in both engines); the
  * planner grid is
  * constant arithmetic over that row; the winner is a rank over the
  * 3-row grid. Nothing shuffles but partial aggregates. */
object Wave60Queries {

  private val Feats: Seq[(String, String)] = Seq(
    ("f_tokens_ge56", "ntok >= 56"),
    ("f_lang_en", "lang = 'en'"),
    ("f_src_lt10", "length(source) = 4"))

  /** Exact ⌊10^6·(p²+q²)/n²⌋ without overflow; Gini = 10^6 − that.
    * `div`/`//` spelled via the passed operator token. */
  private def giniExpr(n: String, p: String, dv: String): String = {
    val x = s"($p * $p + ($n - $p) * ($n - $p))"
    s"CASE WHEN $n = 0 THEN 0 ELSE 1000000 - " +
      s"((($x $dv $n) * 1000000 + (($x % $n) * 1000000) $dv $n) $dv $n) END"
  }

  private val q238 = GQuery(
    "q238_gini_split",
    (s, d) => {
      val li = Tables.documents(s, d).select(
        (col("n_chars") >= 306).cast("long").as("y"),
        size(split(col("text"), " ")).cast("long").as("ntok"),
        col("lang"), col("source"))
      val aggs = Feats.flatMap { case (nm, pred) => Seq(
        sum(expr(s"CASE WHEN $pred THEN 1 ELSE 0 END")).as(s"${nm}_n1"),
        sum(expr(s"CASE WHEN $pred THEN y ELSE 0 END")).as(s"${nm}_p1")) }
      val allAggs = Seq(count(lit(1)).as("n"), sum(col("y")).as("p")) ++ aggs
      val base = li.agg(allAggs.head, allAggs.tail: _*)
      val grid = base.select(col("n"), col("p"),
        expr(giniExpr("n", "p", "div")).as("root_gini_ppm"),
        explode(array(Feats.map { case (nm, _) =>
          struct(lit(nm).as("feature"),
            col(s"${nm}_n1").as("n1"), col(s"${nm}_p1").as("p1"))
        }: _*)).as("x"))
        .select(col("n"), col("p"), col("root_gini_ppm"),
          col("x.feature").as("feature"), col("x.n1").as("n1"),
          col("x.p1").as("p1"))
        .withColumn("n0", col("n") - col("n1"))
        .withColumn("p0", col("p") - col("p1"))
        .withColumn("split_gini_ppm",
          expr(s"(n1 * (${giniExpr("n1", "p1", "div")})" +
            s" + n0 * (${giniExpr("n0", "p0", "div")})) div n"))
        .withColumn("gain_ppm", col("root_gini_ppm") - col("split_gini_ppm"))
      grid.withColumn("best", row_number().over(Window.partitionBy()
          .orderBy(col("gain_ppm").desc, col("feature").desc)) === 1)
        .select(col("feature"), col("n1"), col("p1"), col("n0"), col("p0"),
          col("root_gini_ppm"), col("split_gini_ppm"), col("gain_ppm"),
          col("best"))
        .orderBy(col("feature"))
    },
    Some {
      val featAggs = Feats.map { case (nm, pred) =>
        s"""CAST(sum(CASE WHEN $pred THEN 1 ELSE 0 END) AS BIGINT)
              AS ${nm}_n1,
            CAST(sum(CASE WHEN $pred THEN y ELSE 0 END) AS BIGINT)
              AS ${nm}_p1""" }.mkString(", ")
      val featRows = Feats.map { case (nm, _) =>
        s"SELECT n, p, '$nm' AS feature, ${nm}_n1 AS n1, ${nm}_p1 AS p1" +
          " FROM b" }.mkString(" UNION ALL ")
      s"""WITH li AS (SELECT CASE WHEN n_chars >= 306 THEN 1 ELSE 0 END
                        AS y, len(string_split(text, ' ')) AS ntok,
                        lang, source
                      FROM documents),
              b AS (SELECT CAST(count(*) AS BIGINT) AS n,
                           CAST(sum(y) AS BIGINT) AS p, $featAggs
                    FROM li),
              g AS (SELECT n, p, feature, n1, p1, n - n1 AS n0, p - p1 AS p0
                    FROM ($featRows)),
              u AS (SELECT feature, n1, p1, n0, p0,
                           ${giniExpr("n", "p", "//")} AS root_gini_ppm,
                           (n1 * (${giniExpr("n1", "p1", "//")})
                            + n0 * (${giniExpr("n0", "p0", "//")})) // n
                             AS split_gini_ppm
                    FROM g)
         SELECT feature, n1, p1, n0, p0, root_gini_ppm, split_gini_ppm,
                root_gini_ppm - split_gini_ppm AS gain_ppm,
                row_number() OVER (ORDER BY
                  root_gini_ppm - split_gini_ppm DESC, feature DESC) = 1
                  AS best
         FROM u ORDER BY feature"""
    }
  )

  val all: Seq[GQuery] = Seq(q238)
}
