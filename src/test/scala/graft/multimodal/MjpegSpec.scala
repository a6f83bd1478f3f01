package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** MJPEG-style video decode: synthesized concatenated-JPEG "videos"
  * must split into the right frames and featurize through the SAME
  * ImageIO raster path still images use.
  */
class MjpegSpec extends AnyFunSuite {

  private implicit val spark: org.apache.spark.sql.SparkSession =
    SparkTestSession.spark
  import spark.implicits._

  private def jpegOf(rgb: Int, w: Int = 32, h: Int = 24): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(rgb))
    g.fillRect(0, 0, w, h)
    g.dispose()
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("splitMjpeg recovers each concatenated frame byte-exactly") {
    val frames = Seq(jpegOf(0xFF0000), jpegOf(0x00FF00), jpegOf(0x0000FF))
    val stream = frames.reduce(_ ++ _)
    val got = MediaDecode.splitMjpeg(stream)
    assert(got.length === 3)
    got.zip(frames).foreach { case (g, w) => assert(g.sameElements(w)) }
    // padding between frames and a truncated tail are dropped
    val dirty = Array[Byte](0, 1, 2) ++ frames.head ++
      Array[Byte](9, 9) ++ frames(1) ++ frames(2).dropRight(4)
    val got2 = MediaDecode.splitMjpeg(dirty)
    assert(got2.length === 2)
    assert(got2.head.sameElements(frames.head))
    assert(got2(1).sameElements(frames(1)))
    assert(MediaDecode.splitMjpeg("not a jpeg".getBytes).isEmpty)
  }

  test("decodeMjpeg: per-frame ImageIO features, golden color ordering") {
    val video = jpegOf(0xFF0000) ++ jpegOf(0x00FF00) ++ jpegOf(0x0000FF)
    val ds = Seq(MediaDecode.MediaRecord(7L, "mjpeg", video)).toDS()
    val rows = MediaDecode.decodeMjpeg(ds).collect().sortBy(_.frame_idx)
    assert(rows.map(f => (f.doc_id, f.frame_idx)).toSeq ===
      Seq((7L, 0), (7L, 1), (7L, 2)))
    // feature contract: indices 3/4/5 are mean R/G/B — each solid
    // frame's own channel must dominate (JPEG is lossy; the dominant
    // channel survives with huge margin)
    val Seq(red, green, blue) = rows.map(_.features).toSeq
    assert(red(3) > 0.8f && red(4) < 0.3f && red(5) < 0.3f)
    assert(green(4) > 0.8f && green(3) < 0.4f && green(5) < 0.4f)
    assert(blue(5) > 0.8f && blue(3) < 0.3f && blue(4) < 0.3f)
    // and each frame equals the still-image featurizer on its own bytes
    val stills = Seq(jpegOf(0xFF0000), jpegOf(0x00FF00), jpegOf(0x0000FF))
      .map(b => MediaDecode.decodeBatch(
        Seq(MediaDecode.MediaRecord(0L, "image", b))).head.features.toSeq)
    assert(rows.map(_.features.toSeq).toSeq === stills)
  }
}
