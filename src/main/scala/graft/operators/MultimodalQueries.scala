package graft.operators

import graft.GQuery
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column family: media payloads ride through the engine as
  * opaque `binary` columns plus typed metadata, and per-item decode /
  * feature-extraction runs as a distributed partition-local transform.
  *
  * The decode kernel (MediaDecoder) sniffs the payload: PNG bytes take a
  * REAL codec path through the JDK's built-in `javax.imageio` reader
  * (no extra dependency), everything else takes a clearly-marked
  * deterministic text stub whose features are SQL-expressible — which is
  * what keeps q39 oracle-checkable over the text-payload fixture while
  * the same partition-local seam decodes genuine image bytes
  * (MediaDecodeSpec). Other media types (JPEG/audio/video) would slot in
  * as further sniff branches; the Spark-side plumbing (schema, binary
  * handling, batch shape, output schema) does not change.
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

  /** The per-item decode kernel: partition-local imperative JVM work (how
    * a real codec runs). Output row shape is (first_cp, content_hash,
    * byte_len) on both paths:
    *
    *  - **PNG payloads** (8-byte magic sniffed) decode through
    *    `javax.imageio.ImageIO` — a real image codec, JDK-builtin. Features:
    *    first_cp = (width << 16) | height (both fit 16 bits for any sane
    *    frame), content_hash = md5-60bit over the decoded ARGB raster in
    *    row-major big-endian order. Hashing DECODED pixels (via getRGB,
    *    which normalizes any storage layout to ARGB) makes the hash a
    *    content identity: two encodings of the same image — different
    *    color models, filter choices, compression levels — collide, which
    *    is exactly what image-level dedup wants (MediaDecodeSpec asserts
    *    this with an RGB vs BGR re-encode).
    *  - **Everything else** keeps the deterministic text stub: first UTF-8
    *    codepoint, md5-60bit of the raw bytes
    *    (graft.functions.SimHash64.tokenHash60), byte length. Every stub
    *    feature is reproducible in portable SQL, so q39's full
    *    mapPartitions pipeline stays oracle-checkable over the
    *    text-payload documents fixture. */
  object MediaDecoder {
    private val PngMagic = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)
    def isPng(payload: Array[Byte]): Boolean =
      payload.length >= 8 &&
        java.util.Arrays.equals(payload, 0, 8, PngMagic, 0, 8)

    /** md5-60bit over the decoded ARGB raster (codec-independent). */
    def pixelHash(img: java.awt.image.BufferedImage): Long = {
      val w = img.getWidth
      val h = img.getHeight
      val px = img.getRGB(0, 0, w, h, null, 0, w)
      val bb = java.nio.ByteBuffer.allocate(px.length * 4)
      px.foreach(bb.putInt)
      graft.functions.SimHash64.tokenHash60(bb.array())
    }

    def decode(payload: Array[Byte]): (Int, Long, Int) =
      if (isPng(payload)) {
        // ImageIO.read returns null — it does NOT throw — when a payload
        // passes the 8-byte magic sniff but is truncated/corrupt or an
        // unsupported color variant; readers may also throw IOException on
        // malformed chunks. Either way the row falls back to the
        // deterministic byte stub: one undecodable payload must never fail
        // a distributed decode job (ADVICE r7).
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
          catch { case _: java.io.IOException => null }
        if (img == null) stubFeatures(payload)
        else (packDims(img.getWidth, img.getHeight), pixelHash(img),
          payload.length)
      } else stubFeatures(payload)

    /** 16 bits per side in the packed dims feature; dimensions are masked
      * (not clamped) so an oversized frame truncates its OWN field
      * explicitly instead of silently corrupting the other one. */
    def packDims(w: Int, h: Int): Int = ((w & 0xFFFF) << 16) | (h & 0xFFFF)

    /** The SQL-expressible stub: first UTF-8 codepoint (U+FFFD for
      * non-text bytes — deterministic), md5-60bit content hash, length. */
    private def stubFeatures(payload: Array[Byte]): (Int, Long, Int) = {
      val first =
        if (payload.isEmpty) -1
        else new String(payload, 0, math.min(4, payload.length),
          java.nio.charset.StandardCharsets.UTF_8).codePointAt(0)
      (first, graft.functions.SimHash64.tokenHash60(payload), payload.length)
    }
  }

  /** The q39 seam, shared with MediaDecodeSpec: mapPartitions over
    * (id, payload) — one JVM-local pass per partition, no data movement. */
  def decodeFeatures(ds: Dataset[(Long, Array[Byte])]): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { case (docId, payload) =>
        val (first, hash, len) = MediaDecoder.decode(payload)
        (docId, first, hash, len)
      })
      .toDF("doc_id", "first_cp", "content_hash", "byte_len")
  }

  /** q39 — distributed decode via mapPartitions over the binary column.
    * The kernel is partition-local imperative JVM work (a real codec for
    * PNG payloads, the SQL-expressible stub for text — see MediaDecoder),
    * which is what lets the driver diff the whole mapPartitions pipeline
    * against DuckDB value-by-value on the text-payload fixture. */
  private val q39 = GQuery(
    "q39_multimodal_decode",
    (s, d) => {
      import s.implicits._
      decodeFeatures(
        Tables.documents(s, d)
          .select(col("doc_id"), col("text").cast("binary").as("payload"))
          .as[(Long, Array[Byte])])
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
                   CAST(ord(substr(text, 1, 1)) AS INTEGER) AS first_cp,
                   CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) AS content_hash,
                   CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS byte_len
            FROM documents ORDER BY doc_id""")
  )

  /** q62 — frame sampling: the 1:N decode fan-out (every media pipeline's
    * second shape after q39's 1:1 map — think video → every 4th frame).
    * The payload is divided into fixed 256-char frames; every 4th frame is
    * emitted with its md5-60bit content hash. The kernel is an imperative
    * partition-local flatMap (one input row → n output rows, streamed
    * through the iterator without materializing a document's frames);
    * frames are defined over decoded characters so the oracle is exact for
    * any input encoding. */
  private val FrameChars = 64
  private val FrameStride = 2

  private val q62 = GQuery(
    "q62_frame_sample",
    (s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions(_.flatMap { case (docId, payload) =>
          // ??? <- real frame decoder goes here; fixed-width frames below.
          // Frames are measured in CODEPOINTS (not UTF-16 units): SQL
          // substr/length count codepoints, and a unit-based split could
          // cut a surrogate pair in half. Empty payloads emit no frames.
          val text = new String(payload, java.nio.charset.StandardCharsets.UTF_8)
          val cps = text.codePoints().toArray
          Iterator.range(0, cps.length, FrameChars * FrameStride).map { off =>
            val n = math.min(FrameChars, cps.length - off)
            val frame = new String(cps, off, n)
            val bytes = frame.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            (docId, off / FrameChars,
              graft.functions.SimHash64.tokenHash60(bytes), n)
          }
        })
        .toDF("doc_id", "frame_no", "frame_hash", "frame_chars")
        .orderBy(col("doc_id"), col("frame_no"))
    },
    Some(s"""SELECT doc_id,
                    CAST(i * $FrameStride AS INTEGER) AS frame_no,
                    CAST(concat('0x', substr(md5(substr(text, i * ${FrameChars * FrameStride} + 1, $FrameChars)), 1, 15)) AS BIGINT) AS frame_hash,
                    CAST(length(substr(text, i * ${FrameChars * FrameStride} + 1, $FrameChars)) AS INTEGER) AS frame_chars
             FROM (SELECT doc_id, text,
                          unnest(range(0, CAST(ceil(length(text) / ${(FrameChars * FrameStride).toDouble}) AS BIGINT))) AS i
                   FROM documents)
             ORDER BY doc_id, frame_no""")
  )

  /** q106 — frame ↔ caption as-of alignment (wave 5): pair every sampled
    * video frame (q62's grid: frame f starts at codepoint f·64) with the
    * caption segment in force at that position — the text chunk (q66's
    * 24-token stride) whose start offset is the latest ≤ the frame start.
    * This is the multimodal pairing step that builds (image, text)
    * training examples from time-aligned media: caption starts are
    * IRREGULAR in character space (token lengths vary), so the alignment
    * is a genuine as-of join, not modular arithmetic.
    *
    * Scale notes: frames and caption starts are map-only fan-outs (the
    * caption offset is a per-row aggregate() over the token-prefix — no
    * join against a positions relation); the as-of is q15's union-merge
    * form — one doc-keyed shuffle, per-doc state bounded by that doc's
    * frames + captions, no inequality join, no fan-out. Every doc has a
    * caption at offset 0, so no probe misses. */
  private val CapStride = 24 // tokens per caption segment (q66's stride)
  private val q106 = GQuery(
    "q106_frame_caption_align",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
        .select(col("doc_id"),
          graft.functions.TextOps.tokens(col("text")).as("toks"),
          length(col("text")).as("tlen"))
      val captions = docs
        .select(col("doc_id"), col("toks"),
          explode(sequence(lit(0),
            expr(s"(size(toks) - 1) div $CapStride"))).as("caption_id"))
        .select(col("doc_id"), col("caption_id").cast("long").as("caption_id"),
          (aggregate(slice(col("toks"), lit(1), col("caption_id") * CapStride),
            lit(0), (a, x) => a + length(x))
            + col("caption_id") * CapStride).cast("long").as("pos"))
      val frames = docs.filter(col("tlen") > 0)
        .select(col("doc_id"),
          explode(sequence(lit(0),
            ceil(col("tlen") / lit((FrameChars * FrameStride).toDouble))
              .cast("int") - 1)).as("i"))
        .select(col("doc_id"), (col("i") * FrameStride).cast("long").as("frame_no"),
          (col("i") * FrameChars * FrameStride).cast("long").as("pos"))
      val probes = frames.select(col("doc_id"), col("pos"), lit(1).as("is_probe"),
        col("frame_no"), lit(null).cast("long").as("caption_id"),
        lit(null).cast("long").as("caption_start"))
      val builds = captions.select(col("doc_id"), col("pos"), lit(0).as("is_probe"),
        lit(null).cast("long").as("frame_no"), col("caption_id"),
        col("pos").as("caption_start"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("pos"), col("is_probe"), col("caption_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      probes.unionAll(builds)
        .withColumn("cap", last(col("caption_id"), ignoreNulls = true).over(w))
        .withColumn("cap_start", last(col("caption_start"), ignoreNulls = true).over(w))
        .filter(col("is_probe") === 1)
        .select(col("doc_id"), col("frame_no"), col("cap").as("caption_id"),
          col("cap_start").as("caption_start"))
        .orderBy(col("doc_id"), col("frame_no"))
    },
    Some(s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks,
                               length(text) AS tlen
                        FROM documents),
           cap AS (SELECT doc_id, CAST(caption_id AS BIGINT) AS caption_id,
                          CAST(coalesce(len(array_to_string(toks[1:CAST(caption_id * $CapStride AS INT)], ' ')), 0)
                            + (CASE WHEN caption_id > 0 THEN 1 ELSE 0 END) AS BIGINT) AS pos
                   FROM (SELECT doc_id, toks,
                                unnest(range(0, ((len(toks) - 1) // $CapStride) + 1)) AS caption_id
                         FROM t)),
           fr AS (SELECT doc_id, CAST(i * $FrameStride AS BIGINT) AS frame_no,
                         CAST(i * ${FrameChars * FrameStride} AS BIGINT) AS pos
                  FROM (SELECT doc_id,
                               unnest(range(0, CAST(ceil(tlen / ${(FrameChars * FrameStride).toDouble}) AS BIGINT))) AS i
                        FROM t WHERE tlen > 0)),
           j AS (SELECT f.doc_id, f.frame_no, c.caption_id, c.pos AS caption_start,
                        row_number() OVER (PARTITION BY f.doc_id, f.frame_no
                          ORDER BY c.pos DESC, c.caption_id DESC) AS rn
                 FROM fr f JOIN cap c
                   ON f.doc_id = c.doc_id AND c.pos <= f.pos)
           SELECT doc_id, frame_no, caption_id, caption_start
           FROM j WHERE rn = 1 ORDER BY doc_id, frame_no""")
  )

  val all: Seq[GQuery] = Seq(q38, q39, q62, q106)
}
