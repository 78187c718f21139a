package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector utilities: IVF codebook training — the scale path behind q37.
  *
  * Lloyd-style k-means on cosine similarity: deterministic init (first k
  * vectors by id), then assign-to-nearest (broadcast codebook, map-only
  * over the big table) and element-wise mean per cluster (VectorAvg
  * typed aggregator = one partial+final agg shuffle of k rows per task).
  * Every iteration is a declarative plan; at 100 TB training runs on a
  * sample and only the final assignment pass touches the full table.
  */
object Vectors {

  /** Returns (cid, cvec) — at most k centroids (empty clusters vanish;
    * production reseeds them from far points). */
  def trainCentroids(emb: DataFrame, k: Int, iters: Int): DataFrame = {
    val spark = emb.sparkSession
    CosineSim.register(spark)
    require(k > 0 && iters >= 0)
    var cents = emb.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    for (_ <- 1 to iters) {
      val assigned = assign(emb, cents)
      cents = assigned.groupBy(col("cid"))
        .agg(udaf(VectorAvg).apply(col("embedding")).as("cvec"))
      // keep each iteration's result materialized-small: k rows
      cents = graft.sources.Io.materialize(cents)
    }
    cents
  }

  /** Nearest-centroid assignment (deterministic tie-break on cid). */
  def assign(emb: DataFrame, cents: DataFrame): DataFrame = {
    CosineSim.register(emb.sparkSession)
    emb.crossJoin(broadcast(cents))
      .withColumn("csim", CosineSim(col("embedding"), col("cvec")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("csim").desc, col("cid"))))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cid"), col("csim"))
  }

  /** Mean of per-vector best similarity — the k-means objective (higher
    * is tighter clustering). */
  def objective(emb: DataFrame, cents: DataFrame): Double =
    assign(emb, cents).agg(avg(col("csim"))).head().getDouble(0)
}
