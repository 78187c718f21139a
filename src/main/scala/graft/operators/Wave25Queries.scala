package graft.operators

import graft.GQuery
import graft.functions.TextOps
import graft.sources.{Io, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Geometry

/** Round-11 wave 25: mixture divergence and contrastive geometry —
  *
  *   - q194 per-source token-distribution KL divergence against the
  *     corpus mixture over a fixed 17-cell support (global top-16
  *     tokens + OTHER) — the drift number behind "source X no longer
  *     looks like the mixture it was weighted for" (q133 is PSI over
  *     event values, q189 is band mass; this is the information-
  *     theoretic sheet over actual tokens);
  *   - q195 hard-negative margin audit: per sampled query, the exact
  *     integer squared-L2 gap between its nearest CROSS-label and
  *     nearest SAME-label neighbour — the contrastive-training
  *     mining statistic (a non-positive margin = the q183 1-NN
  *     disagreement, here with the geometry's actual magnitude).
  *
  * Determinism: all counts and distances are exact integers (milli
  * grid); q194's KL is a FIXED-ORDER 17-term literal chain over
  * pivoted cell counts (the q133 PSI convention — never a double SUM
  * over a relation), one round(6) at the end; q195's margins are
  * exact integers with one rounded division per output row.
  */
object Wave25Queries {

  /** KL support: corpus-global top-V tokens + one OTHER cell. V is a
    * declared constant (the support must be identical in both engines
    * and across scales for the sheet to be comparable over time). */
  private val KlTopV = 16
  private val KlCells = KlTopV + 1

  /** q194 — per-source token-KL divergence vs the corpus mixture:
    * restrict both distributions to a fixed support (top-16 corpus
    * tokens + OTHER), pivot the source's cell counts to columns, and
    * evaluate KL(source ‖ corpus) as a literal 17-term chain. Zero
    * source cells contribute 0 (lim p→0 of p·ln(p/q)); a positive
    * source cell implies a positive corpus cell (corpus mass ≥ source
    * mass per cell), so no division guard beyond c_i > 0 is needed —
    * an invariant of measuring against the OWN corpus mixture.
    *
    * Scale notes: one (source, token) count aggregate (map-side
    * combine, materialized — the q189 occ relation), TakeOrdered
    * top-V (per-partition heaps), a ≤V-row broadcast join back, then
    * everything is |sources|×17 metadata: the corpus row derives from
    * the per-source cell sheet (never a second corpus pass), and the
    * KL chain is a projection. The row_number window ranks the V-row
    * slice only. */
  private val q194 = GQuery(
    "q194_token_kl",
    (s, d) => {
      val occ = Io.materialize(
        Io.fanOut(Tables.documents(s, d).select(col("source"), col("text")))
          .select(col("source"), explode(TextOps.tokens(col("text"))).as("tok"))
          .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c")))
      val top = occ.groupBy(col("tok")).agg(sum(col("c")).as("tc"))
        .orderBy(col("tc").desc, col("tok")).limit(KlTopV)
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("tc").desc, col("tok"))))
        .select(col("tok"), col("rk"))
      val cellAggs = (1 to KlCells).map(i =>
        sum(when(col("cell") === i, col("c")).otherwise(0L)).as(s"c$i"))
      val cells = occ.join(broadcast(top), Seq("tok"), "left")
        .withColumn("cell", coalesce(col("rk"), lit(KlCells)))
        .groupBy(col("source"))
        .agg(cellAggs.head, cellAggs.tail: _*)
      val corpus = cells.agg(
        sum(col("c1")).as("q1"),
        (2 to KlCells).map(i => sum(col(s"c$i")).as(s"q$i")): _*)
      val tot = (1 to KlCells).map(i => col(s"c$i")).reduce(_ + _)
      val ctot = (1 to KlCells).map(i => col(s"q$i")).reduce(_ + _)
      val terms = (1 to KlCells).map { i =>
        when(col(s"c$i") > 0,
          (col(s"c$i").cast("double") / col("tot"))
            * log((col(s"c$i").cast("double") / col("tot"))
              / (col(s"q$i").cast("double") / col("ctot"))))
          .otherwise(lit(0.0))
      }
      cells.crossJoin(broadcast(corpus))
        .withColumn("tot", tot).withColumn("ctot", ctot)
        .select(col("source"), col("tot").as("n_tok"),
          // ppm numerator widened to decimal(38,0): c17·10^6 overflows
          // int64 once one source's OTHER mass passes ~9.2e12 tokens —
          // inside the 100 TB envelope (the q171/q166 widening class)
          expr(s"CAST((CAST(c$KlCells AS DECIMAL(38,0)) * 1000000) DIV tot AS BIGINT)")
            .as("other_ppm"),
          round(terms.reduce(_ + _), 6).as("kl_nats"))
        .orderBy(col("source"))
    },
    Some {
      val cellCases = (1 to KlCells).map(i =>
        s"CAST(sum(CASE WHEN cell = $i THEN c ELSE 0 END) AS BIGINT) AS c$i")
        .mkString(", ")
      val qSums = (1 to KlCells).map(i =>
        s"CAST(sum(c$i) AS BIGINT) AS q$i").mkString(", ")
      val totExpr = (1 to KlCells).map(i => s"c$i").mkString(" + ")
      val ctotExpr = (1 to KlCells).map(i => s"q$i").mkString(" + ")
      val terms = (1 to KlCells).map(i =>
        s"""CASE WHEN c$i > 0 THEN
              (CAST(c$i AS DOUBLE) / tot)
                * ln((CAST(c$i AS DOUBLE) / tot)
                  / (CAST(q$i AS DOUBLE) / ctot)) ELSE 0.0 END""")
        .mkString(" + ")
      s"""WITH occ AS (SELECT source, tok, count(*) AS c
                FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
                      FROM documents)
                GROUP BY source, tok),
          top AS (SELECT tok, row_number() OVER (ORDER BY tc DESC, tok) AS rk
                  FROM (SELECT tok, sum(c) AS tc FROM occ GROUP BY tok
                        ORDER BY tc DESC, tok LIMIT $KlTopV)),
          cells AS (SELECT source, $cellCases
                    FROM (SELECT source, c, coalesce(rk, $KlCells) AS cell
                          FROM occ LEFT JOIN top USING (tok))
                    GROUP BY source),
          corpus AS (SELECT $qSums FROM cells),
          w AS (SELECT source, ($totExpr) AS tot, ($ctotExpr) AS ctot, *
                FROM cells, corpus)
          SELECT source, tot AS n_tok,
                 CAST(CAST(c$KlCells AS HUGEINT) * 1000000 // tot AS BIGINT)
                   AS other_ppm,
                 round($terms, 6) AS kl_nats
          FROM w ORDER BY source"""
    }
  )

  /** Sampling geometry for q195 — the q173/q183 audit convention:
    * modulus grows with the corpus so the query batch stays ≈2^5. */
  private val MgModFloor = 50L
  private val MgTargetLog2 = 5
  private def mgMod(s: SparkSession, d: String): Long =
    Geometry.adaptiveSampleMod(Tables.embeddings(s, d).count(),
      MgModFloor, MgTargetLog2)
  private val mgModSql =
    s"qmod AS (SELECT ${Geometry.adaptiveSampleModSql("count(*)",
      MgModFloor, MgTargetLog2)} AS m FROM embeddings)"

  /** q195 — hard-negative margin audit (contrastive mining statistic):
    * for each sampled query vector, the EXACT integer squared-L2
    * distance to its nearest same-label-parity and nearest cross-parity
    * neighbour, reduced per class to the margin distribution (count,
    * confusable count = margin ≤ 0, min/sum/avg margin). A healthy
    * embedding space has positive margins; the confusable tail is
    * where contrastive training mines its hard negatives and where
    * q165/q183 suspect label noise — this sheet gives the MAGNITUDE
    * q183's binary agreement flag cannot.
    *
    * Determinism: distances on the milli grid are exact integers; both
    * minima come from ONE conditional aggregate (no ordering anywhere);
    * margins exact; one rounded division per output row.
    *
    * Scale notes: the Q·n kernel cost is bounded by the sample, not
    * the corpus (adaptiveSampleMod keeps Q ≈ 2^5 at any scale);
    * queries travel as ONE broadcast; the corpus never shuffles — the
    * per-(query, class) minima fold in the map-side combine of a
    * Q-group aggregate. */
  private val q195 = GQuery(
    "q195_hard_negative_margin",
    (s, d) => {
      graft.functions.MilliQuant.register(s)
      graft.functions.VecDist.register(s)
      val e = Io.fanOut(Tables.embeddings(s, d))
        .select(col("vec_id"), (col("label") % 2).cast("int").as("y"),
          graft.functions.MilliQuant(col("embedding")).as("qv"))
      val queries = Tables.embeddings(s, d)
        .filter(col("vec_id") % mgMod(s, d) === 0)
        .select(col("vec_id").as("q_id"), (col("label") % 2).cast("int").as("q_y"),
          graft.functions.MilliQuant(col("embedding")).as("qqv"))
      // r17: VecDist codegen kernel replaces the interpreted
      // aggregate(zip_with) fold inside the n·Q expansion (bit-identical)
      val dist = graft.functions.VecDist.l2sq(col("qv"), col("qqv"))
      e.crossJoin(broadcast(queries))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("q_y"), col("y"), dist.as("dist"))
        .groupBy(col("q_id"), col("q_y"))
        .agg(min(when(col("y") === col("q_y"), col("dist"))).as("same_d"),
          min(when(col("y") =!= col("q_y"), col("dist"))).as("cross_d"))
        .filter(col("same_d").isNotNull && col("cross_d").isNotNull)
        .withColumn("margin", col("cross_d") - col("same_d"))
        .groupBy(col("q_y"))
        .agg(count(lit(1)).as("n_queries"),
          sum(when(col("margin") <= 0, 1L).otherwise(0L)).as("n_confusable"),
          min(col("margin")).as("min_margin"),
          sum(col("margin")).as("sum_margin"))
        .select(col("q_y").as("label_parity"), col("n_queries"),
          col("n_confusable"), col("min_margin"), col("sum_margin"),
          round(col("sum_margin").cast("double") / col("n_queries")
            / 1000000.0, 6).as("avg_margin"))
        .orderBy(col("label_parity"))
    },
    Some(s"""WITH e AS (SELECT vec_id, CAST(label % 2 AS INTEGER) AS y,
                   list_transform(embedding,
                     x -> CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT)) AS qv
                 FROM embeddings),
          $mgModSql,
          qs AS (SELECT vec_id AS q_id, y AS q_y, qv AS qqv
                 FROM e, qmod WHERE vec_id % qmod.m = 0),
          d AS (SELECT qs.q_id, qs.q_y, e.y,
                  list_sum(list_transform(range(1, 65),
                    i -> (e.qv[CAST(i AS INT)] - qs.qqv[CAST(i AS INT)])
                       * (e.qv[CAST(i AS INT)] - qs.qqv[CAST(i AS INT)]))) AS dist
                FROM e, qs WHERE e.vec_id <> qs.q_id),
          m AS (SELECT q_id, q_y,
                  CAST(min(dist) FILTER (y = q_y) AS BIGINT) AS same_d,
                  CAST(min(dist) FILTER (y <> q_y) AS BIGINT) AS cross_d
                FROM d GROUP BY q_id, q_y),
          mm AS (SELECT q_y, cross_d - same_d AS margin FROM m
                 WHERE same_d IS NOT NULL AND cross_d IS NOT NULL)
          SELECT q_y AS label_parity, count(*) AS n_queries,
                 CAST(sum(CASE WHEN margin <= 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_confusable,
                 CAST(min(margin) AS BIGINT) AS min_margin,
                 CAST(sum(margin) AS BIGINT) AS sum_margin,
                 round(CAST(sum(margin) AS DOUBLE) / count(*) / 1000000.0, 6)
                   AS avg_margin
          FROM mm GROUP BY q_y ORDER BY label_parity""")
  )

  val all: Seq[GQuery] = Seq(q194, q195)
}
