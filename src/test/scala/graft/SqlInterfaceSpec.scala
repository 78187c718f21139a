package graft

import graft.sources.Tables

/** The engine is usable from plain SQL text: registerViews + spark.sql. */
class SqlInterfaceSpec extends SparkSpec {

  test("registerViews exposes all tables to spark.sql") {
    Tables.registerViews(spark, sfSmoke)
    val n = spark.sql(
      """SELECT count(*) FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_mktsegment = 'BUILDING'""".stripMargin).head().getLong(0)
    assert(n > 0)
  }

  test("events view has the converted microsecond timestamp type") {
    Tables.registerViews(spark, sfSmoke)
    val t = spark.sql("SELECT min(ts) FROM events").schema.head.dataType
    assert(t == org.apache.spark.sql.types.TimestampType)
  }

  test("SQL text and Column API produce identical results (q06 shape)") {
    Tables.registerViews(spark, sfSmoke)
    // q02's oracle SQL is plain ANSI, runnable verbatim by Spark too
    val viaSql = spark.sql(SparkEntry.oracleSql("q02_global_max")).collect()
    val viaApi = SparkEntry.queries("q02_global_max")(spark, sfSmoke).collect()
    assert(viaSql.map(_.toSeq).toSeq == viaApi.map(_.toSeq).toSeq)
  }
}
