package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import graft.operators.MultimodalQueries
import graft.operators.MultimodalQueries.MediaDecoder

/** Real-codec proof for the q39 decode seam: genuine PNG bytes, encoded
  * and decoded through the JDK's javax.imageio, flow through the exact
  * mapPartitions pipeline q39 uses (MultimodalQueries.decodeFeatures) and
  * come out with decoded-raster features — alongside text payloads that
  * keep the SQL-expressible stub features in the same partition. */
class MediaDecodeSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic w×h test pattern (gradient + channel mix). */
  private def pattern(w: Int, h: Int, imageType: Int): BufferedImage = {
    val img = new BufferedImage(w, h, imageType)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, 0xff000000 |
        ((x * 8) % 256 << 16) | ((y * 8) % 256 << 8) | ((x + y) % 256))
    img
  }

  private def png(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos), "JDK PNG writer missing")
    bos.toByteArray
  }

  test("q39 seam decodes real PNG bytes via javax.imageio") {
    val rgb = pattern(31, 17, BufferedImage.TYPE_INT_RGB)
    val pngBytes = png(rgb)
    assert(MediaDecoder.isPng(pngBytes))
    val textBytes = "plain text payload".getBytes("UTF-8")

    val out = MultimodalQueries
      .decodeFeatures(Seq((1L, pngBytes), (2L, textBytes)).toDS().repartition(1))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getInt(3)))).toMap

    // PNG row: dimensions unpacked from the real decode, content hash of
    // the decoded raster, byte_len of the encoded payload
    val (dims, hash, len) = out(1L)
    assert(dims == ((31 << 16) | 17))
    assert(hash == MediaDecoder.pixelHash(rgb))
    assert(len == pngBytes.length)
    // text row in the same partition keeps the deterministic stub features
    assert(out(2L) == (('p'.toInt,
      graft.functions.SimHash64.tokenHash60(textBytes), textBytes.length)))
  }

  test("content hash is a pixel identity, not a byte identity") {
    // Same pixels stored under two color models encode to different PNG
    // bytes (opaque RGBA writes PNG color type 6, RGB writes type 2), but
    // getRGB normalizes both rasters to ARGB — so the content hash
    // collides, which is what image-level dedup over re-encoded copies
    // requires.
    val a = pattern(23, 9, BufferedImage.TYPE_INT_RGB)
    val b = pattern(23, 9, BufferedImage.TYPE_INT_ARGB)
    val (pa, pb) = (png(a), png(b))
    assert(!java.util.Arrays.equals(pa, pb))
    val fa = MediaDecoder.decode(pa)
    val fb = MediaDecoder.decode(pb)
    assert(fa._2 == fb._2)
    assert(fa._1 == fb._1)
    // and a different image does NOT collide
    val c = pattern(23, 9, BufferedImage.TYPE_INT_RGB)
    c.setRGB(0, 0, 0xffffff)
    assert(MediaDecoder.decode(png(c))._2 != fa._2)
  }

  test("undecodable magic-valid payloads fall back to stub features, never kill the job") {
    // ImageIO.read returns null (it does NOT throw) on a payload that
    // passes the 8-byte magic sniff but is truncated; readers may also
    // throw IOException on malformed chunks. Either way one bad payload
    // must degrade that ROW to the deterministic byte stub, not fail a
    // distributed decode job (r7 verdict task 2).
    val good = png(pattern(31, 17, BufferedImage.TYPE_INT_RGB))
    val truncated = good.take(24) // magic + partial IHDR: sniffs as PNG
    assert(MediaDecoder.isPng(truncated))
    val garbageBody = good.take(8) ++ Array.fill[Byte](64)(0x41)
    assert(MediaDecoder.isPng(garbageBody))

    val out = MultimodalQueries
      .decodeFeatures(Seq((1L, truncated), (2L, garbageBody), (3L, good))
        .toDS().repartition(1))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getInt(3)))).toMap

    // both bad rows carry the stub features of their raw bytes
    assert(out(1L) == ((new String(truncated.take(4), "UTF-8").codePointAt(0),
      graft.functions.SimHash64.tokenHash60(truncated), truncated.length)))
    assert(out(2L)._2 == graft.functions.SimHash64.tokenHash60(garbageBody))
    // and the good row in the same partition still real-decodes
    assert(out(3L)._1 == ((31 << 16) | 17))
  }

  test("packed dims mask oversized frames instead of corrupting the other field") {
    // without the mask, a >65535-px width would bleed into the height
    // bits (r7 verdict task 5)
    assert(MediaDecoder.packDims(31, 17) == ((31 << 16) | 17))
    assert(MediaDecoder.packDims(70000, 17) == (((70000 - 65536) << 16) | 17))
    assert((MediaDecoder.packDims(70000, 17) & 0xFFFF) == 17,
      "height field must survive an oversized width")
    assert(MediaDecoder.packDims(65535, 65535) == 0xFFFFFFFF)
  }

  test("q39 oracle rows are unchanged: text fixture never hits the PNG path") {
    val docs = graft.sources.Tables.documents(spark, sfSmoke)
      .select(org.apache.spark.sql.functions.col("text").cast("binary"))
      .as[Array[Byte]].collect()
    assert(docs.nonEmpty && docs.forall(p => !MediaDecoder.isPng(p)))
  }
}
