package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.HashPartitioner

/** RDD-level MapReduce primitives — the reference's execution pattern
  * (map over chunks → combine → reduce; parallel_sort.cpp /
  * max_aggregation.cpp) expressed on Spark's lowest public API, for the
  * rare per-partition imperative cases the DataFrame API doesn't cover
  * (north star: "DataFrame/RDD API mimicking MapReduce"). Everything in
  * the query surface uses DataFrames; this module exists to show the
  * mapping explicitly and for genuinely imperative partition-local work.
  *
  * Reference ↔ Spark mapping (SURVEY §3):
  * - worker chunk           ↔ RDD partition
  * - per-chunk local max    ↔ mapPartitions partial (combiner)
  * - CAS/semaphore combine  ↔ reduce of partials (shuffle-free treeReduce)
  * - per-chunk sort + merge ↔ repartitionAndSortWithinPartitions over a
  *                            range partitioner (parallel reduce — the
  *                            reference's sequential-merge limitation,
  *                            its README.md:170, does not exist here)
  */
object MapReducePrimitives {

  /** Global max: map-side partial per partition, single tiny reduce. */
  def globalMax(data: RDD[Int]): Option[Int] = {
    val partials = data.mapPartitions { it =>
      if (it.isEmpty) Iterator.empty
      else Iterator.single(it.max)     // ≙ the reference's local_max loop
    }
    val all = partials.collect()       // one int per partition
    if (all.isEmpty) None else Some(all.max) // ≙ the CAS/semaphore combine
  }

  /** Distributed sort: range partition (sampled bounds) + per-partition
    * sort — the parallel form of map-sort/merge-reduce. Returns the
    * sorted RDD; ordering holds within and across partition indices. */
  def distributedSort(data: RDD[Int]): RDD[Int] =
    data.map(x => (x, ())).sortByKey(numPartitions = data.getNumPartitions)
      .map(_._1)

  /** Canonical MapReduce wordcount with an explicit map-side combiner:
    * reduceByKey = combine in the map stage + merge after one shuffle. */
  def wordCount(lines: RDD[String], partitions: Int = 8): RDD[(String, Long)] =
    lines.flatMap(_.split(" ").iterator.filter(_.nonEmpty))
      .map(w => (w, 1L))
      .reduceByKey(new HashPartitioner(partitions), _ + _)
}
