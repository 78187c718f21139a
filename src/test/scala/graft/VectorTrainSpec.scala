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
