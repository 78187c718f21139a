package graft.operators

import graft.GQuery
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Multimodal-column family: media payloads ride through the engine as
  * opaque `binary` columns plus typed metadata, and per-item decode /
  * feature-extraction runs as a distributed partition-local transform.
  *
  * The container has no image/audio codecs, so the decode kernel is a
  * clearly-marked deterministic stub (see FakeDecoder) — the Spark-side
  * plumbing (schema, binary handling, partition-local batch transform,
  * output schema) is real and tested. On a real cluster the stub body is
  * replaced by the actual codec call; nothing else changes.
  *
  * Scale notes: q38 is a pure projection (no shuffle). q39's decode is
  * mapPartitions — one JVM-local pass per partition, no data movement;
  * this is exactly how a 100 TB media decode runs (the codec is CPU work
  * local to each partition).
  */
object MultimodalQueries {

  /** q38 — binary payload + metadata projection, oracle-checked: the
    * "payload" is the utf-8 encoding of the text (the corpus is ascii, so
    * byte length == char length is NOT assumed — both engines measure the
    * actual blob). */
  private val q38 = GQuery(
    "q38_multimodal_meta",
    (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          col("text").cast("binary").as("payload"))
        .select(col("doc_id"), col("source"),
          octet_length(col("payload")).cast("bigint").as("byte_len"))
        .withColumn("fake_width", pmod(col("byte_len"), lit(640)))
        .withColumn("fake_frames", (col("byte_len") / lit(1024)).cast("bigint") + 1)
        .orderBy(col("doc_id")),
    Some("""SELECT doc_id, source,
                   CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS byte_len,
                   CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) % 640 AS fake_width,
                   CAST(octet_length(CAST(text AS BLOB)) // 1024 AS BIGINT) + 1 AS fake_frames
            FROM documents ORDER BY doc_id""")
  )

  /** Deterministic stand-in for a media decoder: derives "features" from
    * the payload bytes only (first-byte, checksum-style fold, length).
    * Replace the body with a real codec (e.g. JPEG decode + resize) in
    * production; signature and batching stay identical. */
  object FakeDecoder {
    def decode(payload: Array[Byte]): (Int, Long, Int) = {
      // ??? <- real codec goes here; deterministic fake below
      val first = if (payload.nonEmpty) payload(0) & 0xFF else -1
      var acc = 0L
      var i = 0
      while (i < payload.length) { acc = acc * 31 + (payload(i) & 0xFF); i += 1 }
      (first, acc, payload.length)
    }
  }

  /** q39 — distributed decode via mapPartitions over the binary column
    * (rows-only check: the fold hash has no SQL equivalent; ScalaTest
    * asserts determinism and schema). */
  private val q39 = GQuery(
    "q39_multimodal_decode",
    (s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (docId, payload) =>
          val (first, hash, len) = FakeDecoder.decode(payload)
          (docId, first, hash, len)
        })
        .toDF("doc_id", "first_byte", "content_hash", "byte_len")
        .orderBy(col("doc_id"))
    },
    None
  )

  val all: Seq[GQuery] = Seq(q38, q39)
}
