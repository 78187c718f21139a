package graft.operators

import graft.GQuery
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-12 wave 32: q210 — the verified-Jaccard threshold curve, the
  * third dial-pricing sheet of the dedup family: q146 prices the LSH
  * BAND geometry (how many true pairs candidate generation reaches),
  * q207 prices the SimHash HAMMING cut, THIS prices the verification
  * threshold itself — for every candidate pair, the exact shingle-set
  * Jaccard, histogrammed by decile with descending-cumulative counts,
  * so "how many pairs does dedup-at-τ actually merge" reads straight
  * off the row for any τ. A dedup threshold nobody measured is a
  * threshold somebody guessed.
  */
object Wave32Queries {

  /** q210 — Jaccard threshold curve over the LSH candidate pairs.
    * Deciles are EXACT integers: decile = (common·10) DIV union — no
    * double ever enters a band decision (the q209 rule style); the
    * cumulative column runs DESC over the ≤ 11-row decile aggregate
    * (acceptance count at threshold decile/10).
    *
    * Scale notes: rides the family's published standing relations
    * (postings, candidate pairs — the q79 shapes): the true-overlap
    * self-join is semi-joined down to candidate docs FIRST (candidate-
    * sized, never corpus²); the histogram adds one tiny aggregate.
    * Every number is an exact count. */
  private val q210 = GQuery(
    "q210_jaccard_threshold",
    (s, d) => {
      val sh = DedupQueries.postingsFor(s, d)
      val pairs = DedupQueries.minhashPairs(s, d)
      val candDocs = pairs.select(col("doc1").as("doc_id"))
        .union(pairs.select(col("doc2").as("doc_id"))).distinct()
      val shCand = sh.join(candDocs, Seq("doc_id"), "left_semi")
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("nsh"))
      val common = shCand.as("a").join(shCand.as("b"),
          col("a.sgh") === col("b.sgh") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"))
        .agg(count(lit(1)).as("common"))
      val deciles = pairs
        .join(common, Seq("doc1", "doc2"), "left")
        .join(sizes.toDF("doc1", "nsh1"), "doc1")
        .join(sizes.toDF("doc2", "nsh2"), "doc2")
        .select(coalesce(col("common"), lit(0L)).as("common"),
          (col("nsh1") + col("nsh2") - coalesce(col("common"), lit(0L)))
            .as("un"))
        .groupBy(expr("CAST((common * 10) DIV un AS INT)")
          .as("jaccard_decile"))
        .agg(count(lit(1)).as("n_pairs"))
      val w = Window.orderBy(col("jaccard_decile").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      deciles.withColumn("cum_pairs_ge", sum(col("n_pairs")).over(w))
        .orderBy(col("jaccard_decile"))
    },
    Some(DedupQueries.CAND_SQL +
      """, sizes AS (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY doc_id),
         cd AS (SELECT u AS doc_id FROM cand
                UNION SELECT v AS doc_id FROM cand),
         shc AS (SELECT sh.* FROM sh JOIN cd USING (doc_id)),
         com AS (SELECT a.doc_id AS u, b.doc_id AS v, count(*) AS common
                 FROM shc a JOIN shc b
                   ON a.sgh = b.sgh AND a.doc_id < b.doc_id
                 GROUP BY 1, 2),
         j AS (SELECT coalesce(com.common, 0) AS common,
                      s1.nsh + s2.nsh - coalesce(com.common, 0) AS un
               FROM cand c
               LEFT JOIN com ON c.u = com.u AND c.v = com.v
               JOIN sizes s1 ON c.u = s1.doc_id
               JOIN sizes s2 ON c.v = s2.doc_id),
         d AS (SELECT CAST((common * 10) // un AS INTEGER) AS jaccard_decile,
                      count(*) AS n_pairs
               FROM j GROUP BY 1)
         SELECT jaccard_decile, n_pairs,
                CAST(sum(n_pairs) OVER (ORDER BY jaccard_decile DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum_pairs_ge
         FROM d ORDER BY jaccard_decile""")
  )

  val all: Seq[GQuery] = Seq(q210)
}
