package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based tests (SURVEY §5): the reference's two invariants
  * generalized over arbitrary generated data — (a) a global sort is a
  * sorted permutation of its input multiset (≙ parallel_sort.cpp's
  * Sorted-OK check plus content preservation it does NOT check);
  * (b) distributed max equals local max (≙ max_aggregation golden);
  * (c) exact dedup is idempotent and partitions the input. ScalaCheck
  * generators with fixed seeds keep runs reproducible.
  */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val listGen: Gen[List[Int]] =
    Gen.chooseNum(0, 400).flatMap(n => Gen.listOfN(n, Gen.chooseNum(Int.MinValue, Int.MaxValue)))

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("property: orderedPairs emits exactly the C(n,2) ordered pairs") {
    val sizeGen = Gen.chooseNum(0, 40)
    samples(sizeGen, 12).foreach { n =>
      val ids = (1L to n.toLong).toList
      val row = Seq(Tuple1(ids)).toDF("docs")
        .select(explode(graft.functions.TextOps.orderedPairs(col("docs"))).as("p"))
        .select(col("p.d1"), col("p.d2"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(row.length == n * (n - 1) / 2, s"n=$n")
      assert(row.forall { case (a, b) => a < b }, s"n=$n")
      assert(row.distinct.length == row.length, s"n=$n")
    }
  }

  test("property: orderBy is a sorted permutation of the input multiset") {
    samples(listGen, 15).foreach { xs =>
      val sorted = xs.toDS().orderBy("value").as[Int].collect().toList
      assert(sorted == xs.sorted)
    }
  }

  test("property: distributed max/min equal local max/min") {
    samples(listGen, 15).filter(_.nonEmpty).foreach { xs =>
      val row = xs.toDS().agg(max("value"), min("value")).head()
      assert(row.getInt(0) == xs.max && row.getInt(1) == xs.min)
    }
  }

  test("property: empty input aggregates to null (SQL semantics)") {
    val row = List.empty[Int].toDS().agg(max("value")).head()
    assert(row.isNullAt(0))
  }

  test("property: exact dedup is idempotent and partitions the input") {
    val gen = Gen.listOfN(120, Gen.chooseNum(0, 20))
    samples(gen, 10).foreach { xs =>
      val df = xs.zipWithIndex.map { case (v, i) => (i.toLong, s"doc $v") }.toDF("doc_id", "text")
      val dedup = df.groupBy(col("text"))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      val rows = dedup.collect()
      assert(rows.map(_.getAs[Long]("n_copies")).sum == xs.length)   // partition
      assert(rows.length == xs.map(v => s"doc $v").distinct.length)
      val again = dedup.groupBy(col("text"))
        .agg(min(col("doc_id")), count(lit(1)).as("n"))
      assert(again.collect().forall(_.getAs[Long]("n") == 1L))       // idempotent
    }
  }
}
