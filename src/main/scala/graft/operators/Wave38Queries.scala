package graft.operators

import graft.GQuery
import graft.sources.{Io, Tables}
import graft.util.Geometry
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-13 wave 38: q216 — MMR-diversified retrieval (Carbonell &
  * Goldstein 1998's maximal marginal relevance, the serving stack's
  * diversity dial). A pure nearest-neighbour top-k over a deduplicated
  * corpus still serves NEAR-duplicates next to each other — the k
  * slots are spent on one cluster. MMR re-selects greedily: the next
  * result must be close to the QUERY but far from what is ALREADY
  * selected. This sheet prices that trade on the standing IVFADC
  * index: from each query's probed-cell exact top-10 pool, pick 5 by
  * MMR (score = ex − min-distance-to-selected, all exact integers,
  * ties to the lowest neighbour id) vs the plain exact top-5, and
  * report both sets' total relevance (Σ exact distance — lower is
  * better) and diversity (Σ per-query MIN pairwise distance — higher
  * is better), with the trade as two ppm columns.
  *
  * Semantics: pool = exact top-10 within the query's probed cells
  * (rank by (ex, nbr) over the same audited exd/qprobe relations as
  * q203); first pick = the pool's exact NN; each later pick minimizes
  * (ex(c) − min_{s∈S} l2(c, s), nbr) over the un-picked pool — a
  * FIXED 5-step greedy, unrolled identically in both engines (the
  * q102 chained-iteration recipe). Every score is an exact integer;
  * the only divisions are the two final ppm columns.
  *
  * Scale notes (100 TB): the corpus-sized work is ONE probed-cell
  * broadcast pass into a WindowGroupLimit heap (pool ≤ 10/query) and
  * one map-only vector fetch for the pool rows; everything after —
  * the 90-row-per-query pair grid, the 4 greedy steps, the sheet — is
  * Q·100-sized, materialized once. The greedy loop never touches the
  * corpus: diversification is a post-retrieval reorder, which is what
  * makes MMR servable at all. */
object Wave38Queries {

  import Wave24Queries.Dim
  import Wave29Queries.{AudModFloor, AudTargetLog2, l2}

  private val PoolK = 10
  private val MmrK = 5

  private def l2s(a: String, b: String): String =
    s"""list_sum(list_transform(range(1, ${Dim + 1}),
        i -> ($a[CAST(i AS INT)] - $b[CAST(i AS INT)])
           * ($a[CAST(i AS INT)] - $b[CAST(i AS INT)])))"""

  private val q216 = GQuery(
    "q216_mmr_diversify",
    (s, d) => {
      Wave29Queries.servingIndex(s, d) match {
        case Some(idx) =>
          val n = Tables.embeddings(s, d).count()
          val mod = Geometry.adaptiveSampleMod(n, AudModFloor, AudTargetLog2)
          val queries = Wave24Queries.qvecs(s, d)
            .filter(col("vec_id") % mod === 0)
            .select(col("vec_id").as("q_id"), col("qv").as("qqv"))
          val qm = broadcast(Wave29Queries.qMeta(idx, queries))
          val isCand = array_contains(col("pcids"), col("cid"))
          // pool: exact top-10 inside the probed cells, vectors kept for
          // the pair grid (fqv rides the index — no second corpus pass)
          val wEx = Window.partitionBy(col("q_id"))
            .orderBy(col("ex"), col("nbr"))
          val pool = Io.materialize(
            idx.coded.join(qm, isCand && col("vec_id") =!= col("q_id"))
              .select(col("q_id"), col("vec_id").as("nbr"),
                l2(col("fqv"), col("qqv")).as("ex"), col("fqv"))
              .withColumn("pk", row_number().over(wEx))
              .filter(col("pk") <= PoolK))
          // per-query pair grid: ≤ 90 rows/query, both directions
          val a = pool.select(col("q_id"), col("nbr").as("n1"),
            col("fqv").as("v1"))
          val b = pool.select(col("q_id"), col("nbr").as("n2"),
            col("fqv").as("v2"))
          val pairs = Io.materialize(
            a.join(b, Seq("q_id")).filter(col("n1") =!= col("n2"))
              .select(col("q_id"), col("n1"), col("n2"),
                l2(col("v1"), col("v2")).as("pd")))
          val slim = pool.select(col("q_id"), col("nbr"), col("ex"))
          // greedy MMR: first pick = the pool's exact NN, then 4 unrolled
          // steps of argmin (ex − min-dist-to-selected, nbr)
          var sel = Io.materialize(slim.groupBy(col("q_id"))
            .agg(min_by(col("nbr"), struct(col("ex"), col("nbr")))
              .as("nbr")))
          for (_ <- 2 to MmrK) {
            val pen = pairs
              .join(sel.withColumnRenamed("nbr", "n2"), Seq("q_id", "n2"))
              .groupBy(col("q_id"), col("n1")).agg(min(col("pd")).as("pen"))
            val pick = slim.join(sel, Seq("q_id", "nbr"), "left_anti")
              .join(pen.withColumnRenamed("n1", "nbr"), Seq("q_id", "nbr"))
              .select(col("q_id"), col("nbr"),
                (col("ex") - col("pen")).as("mmr"))
              .groupBy(col("q_id"))
              .agg(min_by(col("nbr"), struct(col("mmr"), col("nbr")))
                .as("nbr"))
            sel = Io.materialize(sel.unionAll(pick))
          }
          val top5 = slim.withColumn("rk", row_number().over(
              Window.partitionBy(col("q_id")).orderBy(col("ex"), col("nbr"))))
            .filter(col("rk") <= MmrK).select(col("q_id"), col("nbr"))
          def relSum(set: DataFrame, name: String): DataFrame =
            set.join(slim, Seq("q_id", "nbr"))
              .agg(coalesce(sum(col("ex")), lit(0L)).as(name))
          def divSum(set: DataFrame, name: String): DataFrame =
            pairs
              .join(set.select(col("q_id"), col("nbr").as("n1")),
                Seq("q_id", "n1"))
              .join(set.select(col("q_id"), col("nbr").as("n2")),
                Seq("q_id", "n2"))
              .groupBy(col("q_id")).agg(min(col("pd")).as("mn"))
              .agg(coalesce(sum(col("mn")), lit(0L)).as(name))
          queries.agg(count(lit(1)).as("n_queries"))
            .crossJoin(broadcast(relSum(top5, "rel_top5_sum")))
            .crossJoin(broadcast(relSum(sel, "rel_mmr_sum")))
            .crossJoin(broadcast(divSum(top5, "div_top5_sum")))
            .crossJoin(broadcast(divSum(sel, "div_mmr_sum")))
            .select(col("n_queries"),
              col("rel_top5_sum"), col("rel_mmr_sum"),
              col("div_top5_sum"), col("div_mmr_sum"),
              expr("(div_mmr_sum - div_top5_sum) * 1000000" +
                " div greatest(div_top5_sum, 1L)").as("div_gain_ppm"),
              expr("(rel_mmr_sum - rel_top5_sum) * 1000000" +
                " div greatest(rel_top5_sum, 1L)").as("rel_cost_ppm"))
        case None =>
          Wave24Queries.qvecs(s, d).select(
            col("vec_id").as("n_queries"), col("vec_id").as("rel_top5_sum"),
            col("vec_id").as("rel_mmr_sum"), col("vec_id").as("div_top5_sum"),
            col("vec_id").as("div_mmr_sum"), col("vec_id").as("div_gain_ppm"),
            col("vec_id").as("rel_cost_ppm"))
            .limit(0)
      }
    },
    Some {
      def step(t: Int): String =
        s""", pen$t AS (SELECT pp.q_id, pp.n1, min(pp.pd) AS pen
                 FROM pp JOIN sel${t - 1} s
                   ON s.q_id = pp.q_id AND s.nbr = pp.n2
                 GROUP BY pp.q_id, pp.n1),
            pick$t AS (SELECT q_id, n1 AS nbr FROM (
                 SELECT c.q_id, c.n1,
                        row_number() OVER (PARTITION BY c.q_id
                          ORDER BY p2.ex - c.pen, c.n1) AS rn
                 FROM pen$t c JOIN pool p2
                   ON p2.q_id = c.q_id AND p2.nbr = c.n1
                 WHERE NOT EXISTS (SELECT 1 FROM sel${t - 1} s
                   WHERE s.q_id = c.q_id AND s.nbr = c.n1)) WHERE rn = 1),
            sel$t AS (SELECT * FROM sel${t - 1}
                      UNION ALL SELECT * FROM pick$t)"""
      Wave29Queries.IvfadcSql + Wave29Queries.AuditRankSql +
        s""", pool AS MATERIALIZED (SELECT q_id, nbr, ex FROM (
                 SELECT e.q_id, e.nbr, e.ex,
                        row_number() OVER (PARTITION BY e.q_id
                          ORDER BY e.ex, e.nbr) AS pk
                 FROM exd e WHERE EXISTS (SELECT 1 FROM qprobe p
                   WHERE p.q_id = e.q_id AND p.cid = e.cid))
               WHERE pk <= $PoolK),
            pvv AS (SELECT p.q_id, p.nbr, em.qv FROM pool p
                    JOIN em ON em.vec_id = p.nbr),
            pp AS MATERIALIZED (SELECT x.q_id, x.nbr AS n1, y.nbr AS n2,
                   CAST(${l2s("x.qv", "y.qv")} AS BIGINT) AS pd
                 FROM pvv x JOIN pvv y
                   ON x.q_id = y.q_id AND x.nbr <> y.nbr),
            sel1 AS (SELECT q_id, nbr FROM (
                 SELECT q_id, nbr, row_number() OVER (PARTITION BY q_id
                   ORDER BY ex, nbr) AS rn FROM pool) WHERE rn = 1)
            ${(2 to MmrK).map(step).mkString},
            top5 AS (SELECT q_id, nbr FROM (
                 SELECT q_id, nbr, row_number() OVER (PARTITION BY q_id
                   ORDER BY ex, nbr) AS rk FROM pool) WHERE rk <= $MmrK),
            relt AS (SELECT CAST(coalesce(sum(p.ex), 0) AS BIGINT) AS v
                     FROM top5 s JOIN pool p
                       ON p.q_id = s.q_id AND p.nbr = s.nbr),
            relm AS (SELECT CAST(coalesce(sum(p.ex), 0) AS BIGINT) AS v
                     FROM sel$MmrK s JOIN pool p
                       ON p.q_id = s.q_id AND p.nbr = s.nbr),
            divt AS (SELECT CAST(coalesce(sum(mn), 0) AS BIGINT) AS v FROM (
                 SELECT pp.q_id, min(pp.pd) AS mn FROM pp
                 JOIN top5 a ON a.q_id = pp.q_id AND a.nbr = pp.n1
                 JOIN top5 b ON b.q_id = pp.q_id AND b.nbr = pp.n2
                 GROUP BY pp.q_id)),
            divm AS (SELECT CAST(coalesce(sum(mn), 0) AS BIGINT) AS v FROM (
                 SELECT pp.q_id, min(pp.pd) AS mn FROM pp
                 JOIN sel$MmrK a ON a.q_id = pp.q_id AND a.nbr = pp.n1
                 JOIN sel$MmrK b ON b.q_id = pp.q_id AND b.nbr = pp.n2
                 GROUP BY pp.q_id))
            SELECT (SELECT count(*) FROM qs) AS n_queries,
                   relt.v AS rel_top5_sum, relm.v AS rel_mmr_sum,
                   divt.v AS div_top5_sum, divm.v AS div_mmr_sum,
                   (divm.v - divt.v) * 1000000 // GREATEST(divt.v, 1)
                     AS div_gain_ppm,
                   (relm.v - relt.v) * 1000000 // GREATEST(relt.v, 1)
                     AS rel_cost_ppm
            FROM relt, relm, divt, divm"""
    }
  )

  val all: Seq[GQuery] = Seq(q216)
}
