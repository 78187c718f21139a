package graft.operators

import graft.GQuery
import graft.functions.TextOps
import graft.sources.{Io, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-14 wave 57: q235 — KMV set-intersection (Jaccard) sketch audit.
  *
  * The sketch family prices distinct counts (KMV q109, HLL q221),
  * frequency (CMS q218), membership (bloom q206) — but not sketch SET
  * ALGEBRA: estimating the overlap of two sets from their bottom-k
  * sketches alone (Beyer et al. 2007; the theta-sketch intersection),
  * which is how a 100 TB pipeline compares source vocabularies WITHOUT
  * a cross-source join. The estimator: U_k = the k smallest hash
  * values of the union (computable by merging the two sketches — a
  * value in A that lands in U_k is necessarily in A's own bottom-k,
  * so sketch membership decides set membership exactly); then
  * Ĵ = |{h ∈ U_k : h ∈ A ∧ h ∈ B}| / k.
  *
  * The audit: distinct 3-token shingle sets of sources src0–src4
  * (C(5,2) = 10 pairs), exact Jaccard from the hash self-join (the
  * priced expensive baseline) next to the k = 128 sketch estimate and
  * its absolute error — granularity 1/k ≈ 7812 ppm against true
  * overlaps of ~25000 ppm, so the sheet shows exactly how coarse a
  * 128-value sketch is at this overlap level.
  *
  * Scale notes (100 TB): the sketches are per-source bottom-k ranks —
  * WindowGroupLimit keeps k rows per source map-side, so each source's
  * data-sized shingle relation collapses to 128 rows before anything
  * joins; pair arithmetic runs on 10×256-row relations (broadcast
  * pair grid, per-pair rank again heap-limited). The EXACT side is one
  * distinct-shingle self-join on the 60-bit hash — occupancy-bounded
  * (distinct keys), and the audit's deliberate cost. */
object Wave57Queries {

  private val K = 128
  private val Srcs = (0 until 5).map(i => s"src$i")
  private val Pairs = for {
    i <- Srcs.indices; j <- Srcs.indices if i < j
  } yield (Srcs(i), Srcs(j))

  private val q235 = GQuery(
    "q235_kmv_jaccard",
    (s, d) => {
      // r17: fused distinct-shingle-hash kernel (see CorpusOps
      // .shingleHashes) — the trailing distinct() is unchanged
      graft.functions.ShingleHash60Distinct.register(s, 3)
      val sh = Io.materialize(
        Io.fanOut(Tables.documents(s, d)
          .filter(col("source").isin(Srcs: _*))
          .select(col("source"), col("text")))
          .select(col("source"), explode(graft.functions.ShingleHash60Distinct(
            TextOps.tokens(col("text")), 3)).as("h"))
          .distinct())
      val counts = sh.groupBy(col("source")).agg(count(lit(1)).as("n"))
      val exact = sh.as("a").join(sh.as("b"),
          col("a.h") === col("b.h") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("sa"), col("b.source").as("sb"))
        .agg(count(lit(1)).as("inter"))
      val sk = sh.withColumn("rk", row_number().over(
          Window.partitionBy(col("source")).orderBy(col("h"))))
        .filter(col("rk") <= K).select(col("source"), col("h"))
      val pairRel = { import s.implicits._; Pairs.toDF("psa", "psb") }
      val tagged = sk.join(broadcast(pairRel), col("source") === col("psa"))
        .select(col("psa").as("sa"), col("psb").as("sb"), col("h"),
          lit(1L).as("ina"), lit(0L).as("inb"))
        .unionAll(sk.join(broadcast(pairRel), col("source") === col("psb"))
          .select(col("psa").as("sa"), col("psb").as("sb"), col("h"),
            lit(0L).as("ina"), lit(1L).as("inb")))
      val uk = tagged.groupBy(col("sa"), col("sb"), col("h"))
        .agg(max(col("ina")).as("ina"), max(col("inb")).as("inb"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("sa"), col("sb")).orderBy(col("h"))))
        .filter(col("rk") <= K)
      val est = uk.groupBy(col("sa"), col("sb"))
        .agg(sum(col("ina") * col("inb")).as("hits"),
          count(lit(1)).as("ku"))
      exact
        .join(counts.select(col("source").as("sa"), col("n").as("na")), "sa")
        .join(counts.select(col("source").as("sb"), col("n").as("nb")), "sb")
        .join(est, Seq("sa", "sb"))
        .select(col("sa"), col("sb"), col("na"), col("nb"), col("inter"),
          expr("inter * 1000000 div (na + nb - inter)").as("jacc_ppm"),
          expr("hits * 1000000 div ku").as("est_ppm"),
          expr("abs(inter * 1000000 div (na + nb - inter)" +
            " - hits * 1000000 div ku)").as("err_ppm"))
        .orderBy(col("sa"), col("sb"))
    },
    Some {
      val pairsSql = Pairs.map { case (a, b) => s"('$a', '$b')" }
        .mkString(", ")
      val srcList = Srcs.map(x => s"'$x'").mkString(", ")
      s"""WITH d AS (SELECT source, string_split(text, ' ') AS toks
                     FROM documents WHERE source IN ($srcList)),
              sh AS MATERIALIZED (
                SELECT DISTINCT source,
                       CAST(concat('0x', substr(md5(s.sh), 1, 15))
                         AS BIGINT) AS h
                FROM (SELECT source,
                        unnest(list_transform(range(1, len(toks) - 1),
                          i -> array_to_string(toks[i:i+2], ' '))) AS sh
                      FROM d WHERE len(toks) >= 3) s),
              cnt AS (SELECT source, CAST(count(*) AS BIGINT) AS n
                      FROM sh GROUP BY 1),
              ex AS (SELECT a.source AS sa, b.source AS sb,
                            CAST(count(*) AS BIGINT) AS inter
                     FROM sh a JOIN sh b
                       ON a.h = b.h AND a.source < b.source
                     GROUP BY 1, 2),
              sk AS (SELECT source, h FROM (
                       SELECT source, h, row_number() OVER (
                         PARTITION BY source ORDER BY h) AS rk FROM sh)
                     WHERE rk <= $K),
              pr AS (SELECT * FROM (VALUES $pairsSql) AS t(psa, psb)),
              tg AS (SELECT psa AS sa, psb AS sb, h, 1 AS ina, 0 AS inb
                     FROM sk JOIN pr ON source = psa
                     UNION ALL
                     SELECT psa, psb, h, 0, 1
                     FROM sk JOIN pr ON source = psb),
              u0 AS (SELECT sa, sb, h, max(ina) AS ina, max(inb) AS inb
                     FROM tg GROUP BY 1, 2, 3),
              uk AS (SELECT sa, sb, ina, inb FROM (
                       SELECT sa, sb, ina, inb, row_number() OVER (
                         PARTITION BY sa, sb ORDER BY h) AS rk
                       FROM u0)
                     WHERE rk <= $K),
              es AS (SELECT sa, sb, CAST(sum(ina * inb) AS BIGINT) AS hits,
                            CAST(count(*) AS BIGINT) AS ku
                     FROM uk GROUP BY 1, 2)
         SELECT sa, sb, ca.n AS na, cb.n AS nb, inter,
                CAST(inter * 1000000 // (ca.n + cb.n - inter) AS BIGINT)
                  AS jacc_ppm,
                CAST(hits * 1000000 // ku AS BIGINT) AS est_ppm,
                CAST(abs(inter * 1000000 // (ca.n + cb.n - inter)
                     - hits * 1000000 // ku) AS BIGINT) AS err_ppm
         FROM ex JOIN cnt ca ON ca.source = ex.sa
                 JOIN cnt cb ON cb.source = ex.sb
                 JOIN es USING (sa, sb)
         ORDER BY sa, sb"""
    }
  )

  val all: Seq[GQuery] = Seq(q235)
}
