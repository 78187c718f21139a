package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Semantic equivalence of the scalable operator forms against their
  * naive reference formulations. */
class JoinSemanticsSpec extends SparkSpec {

  test("q15 union-merge as-of join equals the naive join+rank formulation") {
    val got = SparkEntry.queries("q15_join_asof")(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getLong(2),
        if (r.isNullAt(3)) null else r.getDouble(3)))

    // naive: inequality join, keep latest order per event
    val e = graft.sources.Tables.events(spark, sfSmoke)
      .select(col("event_id"), col("user_id"), col("ts"))
    val o = graft.sources.Tables.orders(spark, sfSmoke)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
    val naive = e.join(o,
        col("user_id") === col("o_custkey") && col("o_orderdate") <= col("ts"), "left")
      .withColumn("rn", row_number().over(Window.partitionBy(col("event_id"))
        .orderBy(col("o_orderdate").desc_nulls_last, col("o_orderkey").desc_nulls_last)))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("user_id"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getLong(2),
        if (r.isNullAt(3)) null else r.getDouble(3)))

    assert(got.toSeq == naive.toSeq)
    assert(got.nonEmpty)
  }

  test("q43 sketch aggregates are within tolerance of exact values") {
    val got = SparkEntry.queries("q43_agg_approx")(spark, sfSmoke).collect()
      .map(r => r.getString(0) -> r).toMap
    val exact = graft.sources.Tables.lineitem(spark, sfSmoke)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("parts"),
        countDistinct(col("l_orderkey")).as("orders"))
      .collect().map(r => r.getString(0) -> r).toMap
    exact.foreach { case (flag, ex) =>
      val g = got(flag)
      // exact reference columns really are exact
      assert(g.getLong(2) == ex.getLong(1))
      assert(g.getLong(3) == ex.getLong(2))
      // sketch outputs sit inside the documented error budget
      assert(g.getBoolean(4), s"$flag: approx parts out of bound")
      assert(g.getBoolean(5), s"$flag: approx orders out of bound")
      assert(g.getBoolean(6), s"$flag: approx median out of bound")
    }
  }

  test("bucketed tables join without a shuffle (co-located join)") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
      // a crashed prior run can leave the managed location behind with no
      // metastore entry -> LOCATION_ALREADY_EXISTS on recreate
      val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
      Seq("b_orders", "b_customer").foreach { t =>
        val dir = new java.io.File(wh, t)
        if (dir.exists()) {
          def rm(f: java.io.File): Unit = {
            if (f.isDirectory) f.listFiles().foreach(rm)
            f.delete()
          }
          rm(dir)
        }
      }
      graft.sources.Tables.orders(spark, sfSmoke)
        .write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
        .saveAsTable("b_orders")
      graft.sources.Tables.customer(spark, sfSmoke)
        .write.mode("overwrite").bucketBy(8, "c_custkey").sortBy("c_custkey")
        .saveAsTable("b_customer")
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must not introduce a shuffle on the bucketed key
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning(o_custkey"), plan)
      assert(!plan.contains("Exchange hashpartitioning(c_custkey"), plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
