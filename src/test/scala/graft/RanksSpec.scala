package graft

import graft.operators.Ranks
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranks.rowNumber must equal the classic single-window formulation while
  * never building a window partition larger than a range slice. */
class RanksSpec extends SparkSpec {

  test("distributed row_number equals the window formulation exactly") {
    val li = graft.sources.Tables.lineitem(spark, sfSmoke)
      .select(col("l_returnflag"), col("l_extendedprice"),
        col("l_orderkey"), col("l_linenumber"))
    val order = Seq(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))

    val classic = li.withColumn("rn", row_number().over(
      Window.partitionBy(col("l_returnflag")).orderBy(order: _*)))
    val dist = Ranks.rowNumber(li, "l_returnflag", order, "rn")

    val key = Seq("l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber", "rn")
      .map(col)
    assert(dist.select(key: _*).except(classic.select(key: _*)).isEmpty)
    assert(classic.select(key: _*).except(dist.select(key: _*)).isEmpty)
  }

  test("distributed row_number equals the window form on adversarial data") {
    import spark.implicits._
    // heavy skew: one group holds 90% of rows; duplicate order values force
    // the tie-break columns to matter; fixed seed for reproducibility
    val rnd = new scala.util.Random(4242)
    val rows = (1 to 5000).map { i =>
      val g = if (rnd.nextInt(10) < 9) "hot" else s"g${rnd.nextInt(5)}"
      (g, rnd.nextInt(50).toLong, i.toLong) // value collisions guaranteed
    }
    val df = rows.toDF("grp", "value", "id").repartition(13)
    val order = Seq(col("value").desc, col("id"))
    val classic = df.withColumn("rn", row_number().over(
      Window.partitionBy(col("grp")).orderBy(order: _*)))
    val dist = Ranks.rowNumber(df, "grp", order, "rn")
    val key = Seq("grp", "value", "id", "rn").map(col)
    assert(dist.select(key: _*).except(classic.select(key: _*)).isEmpty)
    assert(classic.select(key: _*).except(dist.select(key: _*)).isEmpty)
  }

  test("runningSum equals the window prefix sum on adversarial data") {
    import spark.implicits._
    val rnd = new scala.util.Random(77)
    val rows = (1 to 3000).map { i =>
      val g = if (rnd.nextInt(10) < 8) "hot" else s"g${rnd.nextInt(4)}"
      (g, rnd.nextInt(30).toLong, i.toLong, rnd.nextInt(9) + 1.0)
    }
    val df = rows.toDF("grp", "k", "id", "v").repartition(11)
    val order = Seq(col("k"), col("id"))
    val classic = df.withColumn("run", sum(col("v")).over(
      Window.partitionBy(col("grp")).orderBy(order: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val dist = Ranks.runningSum(df, "grp", order, col("v"), "run")
    val key = Seq("grp", "k", "id", "v", "run").map(col)
    assert(dist.select(key: _*).except(classic.select(key: _*)).isEmpty)
    assert(classic.select(key: _*).except(dist.select(key: _*)).isEmpty)
  }

  test("quantileCont equals the built-in percentile per group") {
    val li = graft.sources.Tables.lineitem(spark, sfSmoke)
    val builtin = li.groupBy(col("l_returnflag"))
      .agg(percentile(col("l_extendedprice"), lit(0.5)).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val dist = Ranks.quantileCont(li, "l_returnflag",
        col("l_extendedprice"), 0.5, "m")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(builtin.keySet == dist.keySet)
    builtin.foreach { case (g, m) =>
      assert(math.abs(dist(g) - m) < 1e-9, s"$g: ${dist(g)} vs $m") }
  }

  test("no window partition spans more than one range slice") {
    val li = graft.sources.Tables.lineitem(spark, sfSmoke)
      .select(col("l_returnflag"), col("l_extendedprice"),
        col("l_orderkey"), col("l_linenumber"))
    val plan = Ranks.rowNumber(li, "l_returnflag",
      Seq(col("l_extendedprice")), "rn").queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical
    val wins = plan.collect { case w: logical.Window => w }
    // the data-sized window partitions on (_slice, group); the offset
    // window runs over the k-row slice-count aggregate only
    assert(wins.nonEmpty)
    wins.foreach { w =>
      val slicePartitioned =
        w.partitionSpec.exists(_.references.exists(_.name == "_slice"))
      val aboveAggregate =
        w.child.collectFirst { case a: logical.Aggregate => a }.isDefined
      assert(slicePartitioned || aboveAggregate, plan.toString)
    }
  }
}
