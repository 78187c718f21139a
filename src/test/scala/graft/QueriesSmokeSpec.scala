package graft

import org.apache.spark.sql.functions._

/** Every registered query runs on sf0.001, returns rows, and is
  * deterministic (two runs collect identical results) — the local
  * counterpart of the driver's rows-only check; value correctness against
  * DuckDB is checked by scripts/check.sh. */
class QueriesSmokeSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql covers exactly the SQL-expressible queries") {
    val keys = SparkEntry.queries.keySet
    val oracleKeys = SparkEntry.oracleSql.keySet
    assert(oracleKeys.subsetOf(keys))
    // every registered query carries a driver-checkable oracle
    assert(keys -- oracleKeys == Set.empty[String])
  }

  SparkEntry.registry.foreach { q =>
    test(s"${q.key} runs and is deterministic on sf0.001") {
      val r1 = q.run(spark, sfSmoke).collect()
      val r2 = q.run(spark, sfSmoke).collect()
      assert(r1.nonEmpty, s"${q.key} returned no rows")
      assert(r1.toSeq == r2.toSeq, s"${q.key} is nondeterministic")
    }
  }
}
