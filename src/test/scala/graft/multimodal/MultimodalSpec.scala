package graft.multimodal

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

class MultimodalSpec extends AnyFunSuite {

  private implicit val spark: org.apache.spark.sql.SparkSession =
    SparkTestSession.spark
  import spark.implicits._

  test("undecodable payloads fall back to deterministic stripe features") {
    val payload = Array.tabulate(64)(i => i.toByte) // not a valid image
    val ds = Seq(MediaDecode.MediaRecord(7L, "png", payload)).toDS()
    val out = MediaDecode.decode(ds).collect()
    assert(out.length === 1)
    assert(out.head.doc_id === 7L)
    assert(out.head.features.length === MediaDecode.FeatureDim)
    // stripe i = bytes [8i, 8i+8): mean = 8i + 3.5, scaled by 256
    val expected = Array.tabulate(8)(i => ((8 * i + 3.5) / 256).toFloat)
    assert(out.head.features.toSeq === expected.toSeq)
    // determinism across runs
    assert(MediaDecode.decode(ds).collect().head.features.toSeq ===
      out.head.features.toSeq)
  }

  test("real PNG decode: raster features match the drawn image") {
    import java.awt.image.BufferedImage
    // 2x1: left pixel pure red, right pixel pure blue
    val img = new BufferedImage(2, 1, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xFF0000)
    img.setRGB(1, 0, 0x0000FF)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val ds = Seq(MediaDecode.MediaRecord(1L, "png", bos.toByteArray)).toDS()
    val f = MediaDecode.decode(ds).collect().head.features
    def approx(a: Float, b: Double) = assert(math.abs(a - b) < 1e-3, s"$a vs $b")
    approx(f(0), 2.0 / 4096) // width
    approx(f(1), 1.0 / 4096) // height
    approx(f(2), 2.0 / 3)    // aspect w/(w+h)
    approx(f(3), 0.5)        // mean R: one pure-red of two pixels
    approx(f(4), 0.0)        // mean G
    approx(f(5), 0.5)        // mean B
    approx(f(6), (0.299 + 0.114) / 2) // BT.601 luma mean
    // luma stddev: two-point distribution at 0.299*255 and 0.114*255
    approx(f(7), (0.299 - 0.114) / 2)
  }

  test("real BMP decode: same contract through a second JDK reader") {
    import java.awt.image.BufferedImage
    // 4x4 uniform mid-gray: zero variance, known means
    val img = new BufferedImage(4, 4, BufferedImage.TYPE_INT_RGB)
    (0 until 4).foreach(x => (0 until 4).foreach(y =>
      img.setRGB(x, y, 0x808080)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bos)
    val ds = Seq(MediaDecode.MediaRecord(2L, "bmp", bos.toByteArray)).toDS()
    val f = MediaDecode.decode(ds).collect().head.features
    def approx(a: Float, b: Double) = assert(math.abs(a - b) < 1e-3, s"$a vs $b")
    approx(f(3), 128.0 / 255); approx(f(4), 128.0 / 255)
    approx(f(5), 128.0 / 255); approx(f(6), 128.0 / 255)
    approx(f(7), 0.0) // uniform image: zero luma variance
  }

  test("real WAV decode: PCM features match the synthesized sine wave") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // 0.25 s of a 440 Hz sine at half amplitude, 8 kHz mono 16-bit LE
    val sr = 8000
    val n = 2000
    val amp = 16384.0 // 0.5 full scale
    val bytes = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val s = math.round(amp * math.sin(2 * math.Pi * 440 * i / sr)).toInt
      bytes(2 * i) = (s & 0xff).toByte
      bytes(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(sr.toFloat, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new java.io.ByteArrayInputStream(bytes), fmt, n),
      AudioFileFormat.Type.WAVE, bos)
    val ds = Seq(MediaDecode.MediaRecord(7L, "wav", bos.toByteArray)).toDS()
    val f = MediaDecode.decode(ds).collect().head.features
    def approx(a: Float, b: Double, tol: Double = 1e-2) =
      assert(math.abs(a - b) < tol, s"$a vs $b")
    approx(f(0), sr / 96000.0, 1e-4)          // sample rate
    approx(f(1), 1.0 / 8, 1e-4)               // mono
    approx(f(2), 0.25 / 60, 1e-4)             // duration
    approx(f(3), 0.5 / math.sqrt(2))          // sine RMS = A/√2
    approx(f(4), 0.5)                         // peak = A
    approx(f(5), 2.0 * 440 / sr, 2e-3)        // ZCR = 2·f/sr
    approx(f(6), 0.5 * 2 / math.Pi)           // sine mean |s| = 2A/π
    approx(f(7), 0.5, 1e-3)                   // zero DC offset → 0.5
  }

  test("decode batches: partition sizes that don't divide batchSize all decode") {
    val recs = (0L until 150L).map(i =>
      MediaDecode.MediaRecord(i, "wav", Array.tabulate(64)(b => (b + i).toByte)))
    val ds = recs.toDS().repartition(4) // ragged partitions vs batchSize 64
    val out = MediaDecode.decode(ds, batchSize = 64).collect()
    assert(out.length === 150)
    assert(out.map(_.doc_id).sorted.toSeq === (0L until 150L))
    assert(out.forall(_.features.length === MediaDecode.FeatureDim))
  }

  test("binaryFile source reads payloads with metadata attached") {
    val dir = Files.createTempDirectory("graft-bin").toString
    Files.write(Paths.get(dir, "a.png"), Array[Byte](1, 2, 3))
    Files.write(Paths.get(dir, "b.png"), Array[Byte](4, 5, 6, 7))
    Files.write(Paths.get(dir, "skip.txt"), Array[Byte](9))
    val df = MediaIngest.readBinaryDir(spark, dir, "*.png")
    val out = MediaIngest.withMeta(df, "content", "path")
      .select(col("meta.byte_len")).collect().map(_.getInt(0)).sorted
    assert(out.toSeq === Seq(3, 4))
  }

  test("frame sampling slices the right bytes") {
    val payload = Array.tabulate(64)(i => i.toByte)
    val df = Seq((1L, payload)).toDF("doc_id", "payload")
    val frames = Frames.sample(df, "doc_id", "payload", 16, 2)
      .orderBy("frame_idx").collect()
    assert(frames.map(_.getInt(1)).toSeq === Seq(0, 2))
    assert(frames(0).getAs[Array[Byte]]("frame").toSeq ===
      payload.slice(0, 16).toSeq)
    assert(frames(1).getAs[Array[Byte]]("frame").toSeq ===
      payload.slice(32, 48).toSeq)
  }

  test("short payloads yield only complete frames") {
    val df = Seq((1L, Array.tabulate(20)(_.toByte))).toDF("doc_id", "payload")
    val frames = Frames.sample(df, "doc_id", "payload", 16, 1).collect()
    assert(frames.length === 1) // 20 bytes = one 16-byte frame, tail dropped
  }

  test("metadata-only queries prune the payload column at the parquet scan") {
    val dir = Files.createTempDirectory("graft-mm").toString
    val docs = Seq((1L, "hello world"), (2L, "foo bar")).toDF("doc_id", "text")
    MediaIngest.synthesizeCorpus(docs, "doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/corpus")
    val scan = spark.read.parquet(s"$dir/corpus")
      .groupBy(col("meta.fmt")).agg(sum(col("meta.byte_len")))
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema"))
    assert(!plan.contains("payload"),
      "metadata aggregate must not read the payload column:\n" + plan)
  }
}
