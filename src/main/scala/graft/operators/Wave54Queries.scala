package graft.operators

import graft.GQuery
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-14 wave 54: q232 — join-order planner (Selinger cost sheet).
  *
  * The optimizer-adjacent family prices cardinality estimation (q129)
  * and predicate ordering (q219); this sheet prices the THIRD classic
  * lever — left-deep JOIN ORDER (Selinger et al. 1979) — with the
  * intermediate sizes measured EXACTLY, not estimated. The fixture
  * query is a selective 3-table star: lineitem (discount > 0.07) ⋈
  * orders (status 'F') on orderkey ⋈ part (size > 25) on partkey.
  * For each connected left-deep order, cost = Σ intermediate result
  * sizes (the Selinger objective); the sheet also prices the
  * cross-product start (filtered orders × filtered part, then probe
  * lineitem) — the row that shows WHY optimizers prune disconnected
  * prefixes: its step-1 intermediate is n_o·n_p, four orders of
  * magnitude past either join start at every scale. The winning order
  * is derived RELATIONALLY (min over the 3-row plan relation, ties by
  * name) so the hash gate checks the plan choice, not just the counts.
  *
  * Exactness: both join keys are unique on the dimension side (orders,
  * part), so |L⋈O| = lineitem rows whose filtered-order key matches —
  * every intermediate is a flag-sum over ONE lineitem pass.
  *
  * Scale notes (100 TB): one pass over filtered lineitem with two
  * key-relation joins (filtered dims, AQE broadcasts by measured size
  * — the q42 policy; unique keys mean no fan-out) into a single-row
  * flag aggregate; the plan grid is constant arithmetic over that row
  * (the cross cost is a PRODUCT of two counts, never an executed
  * cross join); the winner flag is a window over the 3-row grid. */
object Wave54Queries {

  private val q232 = GQuery(
    "q232_join_order",
    (s, d) => {
      val lf = Tables.lineitem(s, d).filter(col("l_discount") > 0.07)
        .select(col("l_orderkey"), col("l_partkey"))
      val of = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"))
      val pf = Tables.part(s, d).filter(col("p_size") > 25)
        .select(col("p_partkey"))
      val flags = lf
        .join(of, col("l_orderkey") === col("o_orderkey"), "left")
        .join(pf, col("l_partkey") === col("p_partkey"), "left")
        .agg(count(lit(1)).as("n_l"),
          sum(col("o_orderkey").isNotNull.cast("long")).as("n_lo"),
          sum(col("p_partkey").isNotNull.cast("long")).as("n_lp"),
          sum((col("o_orderkey").isNotNull && col("p_partkey").isNotNull)
            .cast("long")).as("n_lop"))
        .crossJoin(broadcast(of.agg(count(lit(1)).as("n_o"))))
        .crossJoin(broadcast(pf.agg(count(lit(1)).as("n_p"))))
      val grid = flags.select(explode(array(
        struct(lit("1_LO_then_P").as("join_order"),
          col("n_lo").as("step1_rows")),
        struct(lit("2_LP_then_O").as("join_order"),
          col("n_lp").as("step1_rows")),
        struct(lit("3_OxP_then_L").as("join_order"),
          (col("n_o") * col("n_p")).as("step1_rows")))).as("g"),
        col("n_lop"))
        .select(col("g.join_order").as("join_order"),
          col("g.step1_rows").as("step1_rows"),
          col("n_lop").as("final_rows"),
          (col("g.step1_rows") + col("n_lop")).as("total_cost"))
      grid.withColumn("best",
        col("total_cost") === min(col("total_cost")).over(
          Window.partitionBy()))
        .orderBy(col("join_order"))
    },
    Some("""WITH lf AS (SELECT l_orderkey, l_partkey FROM lineitem
                        WHERE l_discount > 0.07),
                 f AS (SELECT CAST(count(*) AS BIGINT) AS n_l,
                              CAST(sum(CASE WHEN o.o_orderkey IS NOT NULL
                                THEN 1 ELSE 0 END) AS BIGINT) AS n_lo,
                              CAST(sum(CASE WHEN p.p_partkey IS NOT NULL
                                THEN 1 ELSE 0 END) AS BIGINT) AS n_lp,
                              CAST(sum(CASE WHEN o.o_orderkey IS NOT NULL
                                AND p.p_partkey IS NOT NULL
                                THEN 1 ELSE 0 END) AS BIGINT) AS n_lop
                       FROM lf
                       LEFT JOIN (SELECT o_orderkey FROM orders
                                  WHERE o_orderstatus = 'F') o
                         ON lf.l_orderkey = o.o_orderkey
                       LEFT JOIN (SELECT p_partkey FROM part
                                  WHERE p_size > 25) p
                         ON lf.l_partkey = p.p_partkey),
                 c AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM orders
                               WHERE o_orderstatus = 'F') AS n_o,
                              (SELECT CAST(count(*) AS BIGINT) FROM part
                               WHERE p_size > 25) AS n_p),
                 g AS (SELECT '1_LO_then_P' AS join_order, n_lo AS step1_rows,
                              n_lop AS final_rows FROM f
                       UNION ALL
                       SELECT '2_LP_then_O', n_lp, n_lop FROM f
                       UNION ALL
                       SELECT '3_OxP_then_L', n_o * n_p, n_lop FROM f, c),
                 t AS (SELECT join_order, step1_rows, final_rows,
                              step1_rows + final_rows AS total_cost FROM g)
            SELECT join_order, step1_rows, final_rows, total_cost,
                   total_cost = min(total_cost) OVER () AS best
            FROM t ORDER BY join_order""")
  )

  val all: Seq[GQuery] = Seq(q232)
}
