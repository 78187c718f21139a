package graft

import graft.operators.MapReducePrimitives
import graft.util.Mt19937_64

class MapReducePrimitivesSpec extends SparkSpec {

  test("RDD globalMax reproduces the reference golden value") {
    val data = Mt19937_64.maskedSequence(999, 1000000)
    val rdd = spark.sparkContext.parallelize(data.toIndexedSeq, 8)
    assert(MapReducePrimitives.globalMax(rdd).contains(2147482196))
    assert(MapReducePrimitives.globalMax(
      spark.sparkContext.parallelize(Seq.empty[Int], 2)).isEmpty)
  }

  test("RDD distributedSort sorts across partition boundaries") {
    val data = Mt19937_64.maskedSequence(12345, 131072)
    val rdd = spark.sparkContext.parallelize(data.toIndexedSeq, 8)
    val sorted = MapReducePrimitives.distributedSort(rdd)
    // within partitions sorted, and partition maxima non-decreasing
    val perPart = sorted.mapPartitionsWithIndex { (i, it) =>
      val a = it.toArray
      Iterator.single((i, a.headOption, a.lastOption,
        a.sliding(2).forall(p => p.length < 2 || p(0) <= p(1))))
    }.collect().sortBy(_._1)
    assert(perPart.forall(_._4))
    val bounds = perPart.flatMap(p => p._2.zip(p._3))
    bounds.sliding(2).foreach {
      case Array((_, max1), (min2, _)) => assert(max1 <= min2)
      case _ =>
    }
    assert(sorted.count() == data.length)
  }

  test("RDD wordCount matches the DataFrame term frequency (q27 core)") {
    val lines = graft.sources.Tables.documents(spark, sfSmoke)
      .select("text").collect().map(_.getString(0))
    val rdd = spark.sparkContext.parallelize(lines.toIndexedSeq, 8)
    val viaRdd = MapReducePrimitives.wordCount(rdd).collect().toMap
    import org.apache.spark.sql.functions._
    val viaDf = graft.sources.Tables.documents(spark, sfSmoke)
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaRdd == viaDf)
  }
}
