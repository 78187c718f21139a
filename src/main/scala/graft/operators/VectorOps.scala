package graft.operators

import graft.functions.CosineSim
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared IVF assignment kernels, used by the batch index builds
  * (q37/q76/q94/q173) and the streaming ingest-time assigner (s24) —
  * one semantics, two execution shapes, so the paths cannot drift (the
  * CorpusOps.minhashBands discipline from the dedup family, applied to
  * vectors; VectorSpec pins the two shapes row-for-row equal).
  *
  * Round-14 (r13 verdict task 1): the BATCH path is
  * [[assignCellsRelation]] — broadcast-join against the centroid
  * RELATION + a max-struct aggregate, the Wave29Queries.assignResiduals
  * architecture — so the codebook never collapses into a single array
  * row and the cell count is bounded only by the broadcast size
  * (Bc·Dim·8 ≈ 0.5 GB at the 2^20 cap), not by the 2 GB single-row
  * limit. [[assignCells]] (the collapsed 1-row array form) remains as
  * the STREAMING shape only: append-mode streams cannot aggregate, so
  * s24 keeps the map-only projection — the same batch/stream split
  * Wave29 documents for assignResiduals vs assignResidualsServing.
  */
object VectorOps {

  /** Collapse a (cid, cvec) codebook relation into ONE row holding the
    * sorted (cid, cvec) struct array — the broadcastable form assignCells
    * consumes. Sorting makes the array order (and thus any tie-break walk)
    * deterministic regardless of the codebook relation's partitioning. */
  def centroidArray(cents: DataFrame): DataFrame =
    cents.agg(sort_array(collect_list(struct(col("cid"), col("cvec")))).as("cents"))

  /** Nearest-centroid assignment against the centroid RELATION (cid,
    * cvec) — the batch shape, no collapsed-row ceiling: every vector
    * broadcast-joins with the Bc centroids, the winning cell is a
    * max-struct aggregate over (round(cosine, 6), -cid) — ties to the
    * smallest cid, exactly the SQL `row_number() ... ORDER BY sim DESC,
    * cid` oracle contract — and the vector payload re-enters via an
    * n-row join on the slim (vec_id, cid, csim) assignment. Emits the
    * input columns plus `cid` and `csim`.
    *
    * Scale notes: the n·Bc expansion carries ~24-byte rows only
    * (vec_id, cid, csim — the cosine is computed in the join projection
    * and the vector dropped immediately), and the broadcast cross join
    * keeps a vector's Bc candidates co-partitioned, so the partial
    * max-aggregate collapses them map-side and the shuffle is n slim
    * rows. The centroids stay a DataFrame end to end — no single-row
    * array, no driver collect — so the only Bc bound is the broadcast
    * itself (~0.5 GB at the 2^20 [[graft.operators.VectorQueries]]
    * IvfCap, Dim 64), past the 100 TB design point under √n geometry. */
  def assignCellsRelation(vectors: DataFrame, cents: DataFrame): DataFrame = {
    CosineSim.register(vectors.sparkSession)
    val slim = vectors.crossJoin(broadcast(cents))
      .select(col("vec_id"),
        round(CosineSim(col("embedding"), col("cvec")), 6).as("csim"),
        col("cid"))
      .groupBy(col("vec_id"))
      .agg(max(struct(col("csim"), (-col("cid")).as("ncid"))).as("best"))
      .select(col("vec_id"), (-col("best.ncid")).as("cid"),
        col("best.csim").as("csim"))
    vectors.join(slim, Seq("vec_id"))
  }

  /** Nearest-centroid assignment against the collapsed 1-row codebook
    * array — the STREAMING shape (s24): same contract as
    * [[assignCellsRelation]] (round(cosine, 6) argmax, ties to the
    * smallest cid), as one stateless map-only projection (`array_max`
    * over (similarity, -cid) structs), because an append-mode stream
    * cannot run the max aggregate. The 1-row array bounds Bc at ~2^21
    * cells at Dim 64 under the 2 GB row limit — past the 2^20 IvfCap,
    * so the streaming shape has headroom over the whole supported cell
    * range; an encoder past that shards the array by cid range (the
    * Wave29 assignResidualsServing note). Emits the input columns plus
    * `cid` and `csim`. */
  def assignCells(vectors: DataFrame, centsArr: DataFrame): DataFrame = {
    CosineSim.register(vectors.sparkSession)
    vectors.crossJoin(broadcast(centsArr))
      .withColumn("best", array_max(transform(col("cents"), c =>
        struct(round(CosineSim(col("embedding"), c.getField("cvec")), 6).as("csim"),
          (-c.getField("cid")).as("ncid")))))
      .drop("cents")
      .withColumn("cid", -col("best").getField("ncid"))
      .withColumn("csim", col("best").getField("csim"))
      .drop("best")
  }
}
