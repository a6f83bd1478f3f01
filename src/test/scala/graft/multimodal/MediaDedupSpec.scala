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

  // amplitude-modulated tone: the ENVELOPE (where the loud windows
  // are) is the perceptual signature; `gain` scales every sample,
  // `envPhase` moves the loud parts, `noiseAmp` adds jitter
  private def wav(envPhase: Double, gain: Double = 1.0,
      noiseAmp: Double = 0.0, seed: Long = 5): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val sr = 8000
    val n = 4000
    val rnd = new scala.util.Random(seed)
    val bytes = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val env = 0.55 + 0.45 * math.sin(2 * math.Pi * 3 * i / n + envPhase)
      val v = gain * env * 12000.0 * math.sin(2 * math.Pi * 440 * i / sr) +
        noiseAmp * (rnd.nextDouble() - 0.5) * 2000.0
      val s = math.max(-32768, math.min(32767, math.round(v))).toInt
      bytes(2 * i) = (s & 0xff).toByte
      bytes(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(sr.toFloat, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new java.io.ByteArrayInputStream(bytes), fmt, n),
      AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("audio hash: gain-invariant for near-dups, far for a moved envelope") {
    def hashOf(payload: Array[Byte]): Long =
      MediaDedup.audioHash64(
        javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload)))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val base = hashOf(wav(0.0))
    val quiet = hashOf(wav(0.0, gain = 0.4))
    val noisy = hashOf(wav(0.0, noiseAmp = 1.0))
    val moved = hashOf(wav(math.Pi)) // loud windows relocated
    assert(hamming(base, quiet) <= 2,
      s"volume-scaled copy drifted ${hamming(base, quiet)} bits")
    assert(hamming(base, noisy) <= 3,
      s"noisy copy drifted ${hamming(base, noisy)} bits")
    assert(hamming(base, moved) > 10,
      s"relocated envelope suspiciously close: ${hamming(base, moved)} bits")
  }

  test("audio pipeline finds the gain pair, skips non-audio payloads") {
    import spark.implicits._
    val records = Seq(
      MediaRecord(1L, "wav", wav(0.0)),
      MediaRecord(2L, "wav", wav(0.0, gain = 0.4)),
      MediaRecord(3L, "wav", wav(math.Pi)),
      MediaRecord(4L, "png", png(noiseImage(7)))).toDS()
    val hashes = MediaDedup.audioPerceptualHashes(records)
    assert(hashes.count() === 3) // the png row is not audio
    val pairs = MediaDedup.nearDuplicatePairs(hashes, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
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

  test("video frame near-dup: re-encoded copy found, disjoint video not") {
    import spark.implicits._
    def jpeg(img: BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    def video(frames: BufferedImage*): Array[Byte] =
      frames.map(jpeg).reduce(_ ++ _)
    // v1 and v2 share two frames up to a uniform brightening (aHash
    // thresholds at the mean, so the shift cancels); v3 is disjoint
    val v1 = video(noiseImage(1), noiseImage(2), noiseImage(3))
    val v2 = video(noiseImage(1, brighten = 4), noiseImage(2, brighten = 4),
      noiseImage(99))
    val v3 = video(noiseImage(50), noiseImage(60))
    val ds = Seq(MediaRecord(1L, "mjpeg", v1), MediaRecord(2L, "mjpeg", v2),
      MediaRecord(3L, "mjpeg", v3)).toDS()
    val hashes = MediaDedup.videoFrameHashes(ds)
    assert(hashes.count() === 8) // 3 + 3 + 2 decodable frames
    val pairs = MediaDedup
      .videoNearDupPairs(hashes, maxHamming = 7, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq === Seq((1L, 2L, 2L)))
  }
}
