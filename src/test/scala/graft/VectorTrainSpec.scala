package graft

import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration._

import graft.functions.Vectors
import graft.sources.Tables

class VectorTrainSpec extends SparkSpec {

  test("IVF codebook training improves the clustering objective") {
    val emb = Tables.embeddings(spark, sfSmoke)
    val init = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 8)
      .select(org.apache.spark.sql.functions.col("vec_id").as("cid"),
        org.apache.spark.sql.functions.col("embedding").as("cvec"))
    val before = Vectors.objective(emb, init)
    val trained = Vectors.trainCentroids(emb, k = 8, iters = 2)
    val cents = trained.collect()
    assert(cents.nonEmpty && cents.length <= 8)
    assert(cents.forall(_.getSeq[Float](1).length == 64))
    val after = Vectors.objective(emb, trained)
    assert(after >= before - 1e-9, s"objective degraded: $before -> $after")
  }

  test("vector_avg is callable from SQL text and matches the typed result") {
    import org.apache.spark.sql.functions._
    graft.functions.VectorAvg.register(spark)
    Tables.embeddings(spark, sfSmoke).createOrReplaceTempView("vavg_emb")
    val sqlAvg = spark.sql(
      "SELECT vector_avg(embedding) AS c FROM vavg_emb WHERE vec_id < 100")
      .head().getSeq[Float](0)
    assert(sqlAvg.length == 64)
    // exact cross-check of component 0 via a plain aggregate
    val c0 = Tables.embeddings(spark, sfSmoke).filter(col("vec_id") < 100)
      .agg(avg(element_at(col("embedding"), 1).cast("double"))).head().getDouble(0)
    assert(math.abs(sqlAvg(0) - c0) < 1e-5, s"${sqlAvg(0)} vs $c0")
  }

  test("queries run concurrently on one shared session without interference") {
    val keys = Seq("q02_global_max", "q06_agg_groupby", "q22_scalar_json",
      "q26_similarity_topk", "q30_events_tumbling", "q36_fingerprint")
    val sequential = keys.map(k =>
      k -> SparkEntry.queries(k)(spark, sfSmoke).collect().toSeq).toMap
    val concurrent = Await.result(
      Future.sequence(keys.map(k => Future(
        k -> SparkEntry.queries(k)(spark, sfSmoke).collect().toSeq))),
      5.minutes).toMap
    keys.foreach { k =>
      assert(concurrent(k) == sequential(k), s"$k differs under concurrency")
    }
  }
}
