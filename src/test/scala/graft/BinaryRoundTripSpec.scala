package graft

import graft.operators.MultimodalQueries.MediaDecoder
import org.apache.spark.sql.functions._

/** Binary (multimodal payload) columns must survive a parquet round-trip
  * byte-exact — the storage half of the q38/q39 plumbing. */
class BinaryRoundTripSpec extends SparkSpec {
  import spark.implicits._

  test("binary payload column round-trips through parquet byte-exact") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bin").toString
    val src = graft.sources.Tables.documents(spark, sfSmoke)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    src.write.mode("overwrite").parquet(s"$dir/bin")
    val back = spark.read.parquet(s"$dir/bin")
    assert(back.schema("payload").dataType ==
      org.apache.spark.sql.types.BinaryType)
    // decode features equal whether computed pre- or post-storage
    val before = src.as[(Long, Array[Byte])].collect()
      .map { case (id, p) => id -> MediaDecoder.decode(p) }.toMap
    val after = back.as[(Long, Array[Byte])].collect()
      .map { case (id, p) => id -> MediaDecoder.decode(p) }.toMap
    assert(before == after)
    assert(before.nonEmpty)
  }
}
