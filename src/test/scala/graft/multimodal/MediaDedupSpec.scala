package graft.multimodal

import graft.SparkTestSession
import graft.multimodal.MediaDecode.MediaRecord
import java.awt.image.BufferedImage
import org.scalatest.funsuite.AnyFunSuite

/** Golden spec for perceptual image dedup (no DuckDB oracle — image
  * decode has no SQL mirror, the M3 precedent): synthesized rasters
  * with known relationships must hash to known hamming regimes, and
  * the banded pair join must find exactly the perceptual pair.
  */
class MediaDedupSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark

  private def noiseImage(seed: Long, w: Int = 64, h: Int = 64,
      brighten: Int = 0): BufferedImage = {
    val rnd = new scala.util.Random(seed)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      def c(v: Int) = math.min(255, math.max(0, v + brighten))
      val (r, g, b) =
        (rnd.nextInt(200) + 20, rnd.nextInt(200) + 20, rnd.nextInt(200) + 20)
      img.setRGB(x, y, (c(r) << 16) | (c(g) << 8) | c(b))
    }
    img
  }

  private def png(img: BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("aHash: brightness-invariant for near-dups, far for unrelated images") {
    val base = MediaDedup.aHash64(noiseImage(7))
    val bright = MediaDedup.aHash64(noiseImage(7, brighten = 6))
    val other = MediaDedup.aHash64(noiseImage(99))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // uniform brightening moves every cell mean and the global mean
    // together — only clipping can flip a borderline cell
    assert(hamming(base, bright) <= 2,
      s"brightened copy drifted ${hamming(base, bright)} bits")
    // two independent noise fields share no structure: expected ~32
    assert(hamming(base, other) > 10,
      s"unrelated images suspiciously close: ${hamming(base, other)} bits")
  }

  test("pipeline finds the perceptual pair, skips undecodable payloads") {
    import spark.implicits._
    val records = Seq(
      MediaRecord(1L, "png", png(noiseImage(7))),
      MediaRecord(2L, "png", png(noiseImage(7, brighten = 6))),
      MediaRecord(3L, "png", png(noiseImage(99))),
      MediaRecord(4L, "bin", Array[Byte](1, 2, 3, 4))).toDS()
    val hashes = MediaDedup.perceptualHashes(records)
    assert(hashes.count() === 3) // the raw-bytes row has no image
    val pairs = MediaDedup.nearDuplicatePairs(hashes, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
  }
}
