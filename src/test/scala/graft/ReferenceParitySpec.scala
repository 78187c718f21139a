package graft

import org.apache.spark.sql.functions._

/** Reference-parity tests (SURVEY §5): regenerate the reference's exact
  * input sequences — mt19937_64 from the published Matsumoto–Nishimura
  * algorithm, seeded and masked as the reference does (parallel_sort.cpp:
  * 43-46 seed 12345; max_aggregation.cpp:35-38 seed 999) — and assert the
  * Spark operators reproduce the reference's golden outputs, including
  * `Final max: 2147482196` (reference README.md:61).
  */
class ReferenceParitySpec extends SparkSpec {

  private def gen(seed: Long, n: Int): Array[Int] =
    graft.util.Mt19937_64.maskedSequence(seed, n)

  test("R14 parity: peak RSS is readable and plausibly sized") {
    val kb = graft.util.PeakRss.kb()
    assert(kb > 10 * 1024, s"VmHWM=$kb KB")  // a JVM uses >10MB
  }

  test("golden MAX: seed 999, N=10^6 -> 2147482196 via Spark aggregation") {
    import spark.implicits._
    val data = gen(999, 1000000)
    val ds = spark.sparkContext.parallelize(data.toIndexedSeq, 8).toDS()
    val got = ds.agg(max("value")).head().getInt(0)
    assert(got == 2147482196)
  }

  test("sort parity: seed 12345, N=131072 — Spark orderBy == reference sorted output") {
    import spark.implicits._
    val data = gen(12345, 131072)
    val ds = spark.sparkContext.parallelize(data.toIndexedSeq, 8).toDS()
    val sparkSorted = ds.orderBy("value").as[Int].collect()
    val expected = data.sorted
    assert(java.util.Arrays.equals(sparkSorted, expected))
    // the reference's own post-check (parallel_sort.cpp:137-142)
    assert(sparkSorted.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
  }
}
