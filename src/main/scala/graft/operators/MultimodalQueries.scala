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
    * the payload bytes only — first UTF-8 codepoint (imperative byte-level
    * decode), md5-60bit content hash (the engine's shared cross-engine
    * scheme, graft.functions.SimHash64.tokenHash60), byte length. Replace
    * the body with a real codec (e.g. JPEG decode + resize) in production;
    * signature and batching stay identical. Every feature is reproducible
    * in portable SQL, so q39's full pipeline is oracle-checkable. */
  object FakeDecoder {
    def decode(payload: Array[Byte]): (Int, Long, Int) = {
      // ??? <- real codec goes here; deterministic fake below
      val first =
        if (payload.isEmpty) -1
        else new String(payload, 0, math.min(4, payload.length),
          java.nio.charset.StandardCharsets.UTF_8).codePointAt(0)
      (first, graft.functions.SimHash64.tokenHash60(payload), payload.length)
    }
  }

  /** q39 — distributed decode via mapPartitions over the binary column.
    * The kernel is partition-local imperative JVM work (how a real codec
    * runs); the stub's features are also SQL-expressible, which is what
    * lets the driver diff the whole mapPartitions pipeline against DuckDB
    * value-by-value. */
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
        .toDF("doc_id", "first_cp", "content_hash", "byte_len")
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
                   CAST(ord(substr(text, 1, 1)) AS INTEGER) AS first_cp,
                   CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) AS content_hash,
                   CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS byte_len
            FROM documents ORDER BY doc_id""")
  )

  val all: Seq[GQuery] = Seq(q38, q39)
}
