package graft.multimodal

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed media records and the decode/feature-extract stage.
  *
  * Images are REALLY decoded: `javax.imageio` ships PNG/BMP/GIF/JPEG
  * readers inside the JDK (no external codecs), so the byte→pixels→
  * features path is genuine — dimensions, channel means and luminance
  * statistics of the actual raster. Payloads ImageIO cannot read
  * (audio/video — the JDK has no such codecs, and this container adds
  * none) fall back to a deterministic byte-stripe featurizer, clearly
  * marked below, preserving the fixed 8-dim feature contract either
  * way.
  *
  * Distribution shape (the part that matters at 100 TB): decode runs
  * `mapPartitions` in batches where the bytes already live — no
  * shuffle, codec state amortized per partition — and emits a typed
  * features record that downstream ANN search consumes directly.
  */
object MediaDecode {

  val FeatureDim = 8

  case class MediaRecord(doc_id: Long, fmt: String, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, fmt: String, features: Array[Float])

  /** 8-dim feature contract for a decoded raster:
    * {{{
    * 0: width  / 4096 (clipped)      4: mean G / 255
    * 1: height / 4096 (clipped)      5: mean B / 255
    * 2: aspect w/(w+h)               6: mean luma / 255 (BT.601)
    * 3: mean R / 255                 7: luma stddev / 255
    * }}}
    * Pixels are sampled on a ≤64×64 grid so one pathological 100 MP
    * payload cannot stall its whole partition.
    */
  private[multimodal] def imageFeatures(
      img: java.awt.image.BufferedImage): Array[Float] = {
    val (w, h) = (img.getWidth, img.getHeight)
    val (sx, sy) = (math.max(1, w / 64), math.max(1, h / 64))
    var (sr, sg, sb, sl, sl2) = (0.0, 0.0, 0.0, 0.0, 0.0)
    var n = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff
        val g = (rgb >> 8) & 0xff
        val b = rgb & 0xff
        val l = 0.299 * r + 0.587 * g + 0.114 * b
        sr += r; sg += g; sb += b; sl += l; sl2 += l * l
        n += 1
        x += sx
      }
      y += sy
    }
    val lMean = sl / n
    val lVar = math.max(0.0, sl2 / n - lMean * lMean)
    Array(
      math.min(w, 4096) / 4096f,
      math.min(h, 4096) / 4096f,
      w.toFloat / (w + h),
      (sr / n / 255.0).toFloat,
      (sg / n / 255.0).toFloat,
      (sb / n / 255.0).toFloat,
      (lMean / 255.0).toFloat,
      (math.sqrt(lVar) / 255.0).toFloat)
  }

  /** FALLBACK featurizer for payloads with no JDK codec (audio/video):
    * one feature per 8-byte stripe = mean byte value scaled to [0,1).
    * Deterministic and codec-free — a stand-in distribution, not a
    * real decode; swap in a native codec here when one is available.
    */
  private[multimodal] def stripeFeatures(payload: Array[Byte]): Array[Float] = {
    val stripe = math.max(1, payload.length / FeatureDim)
    Array.tabulate(FeatureDim) { i =>
      val slice = payload.slice(i * stripe, (i + 1) * stripe)
      if (slice.isEmpty) 0f
      else (slice.map(b => (b & 0xff).toLong).sum.toFloat / slice.length) / 256f
    }
  }

  /** Decode one batch: ImageIO raster features when a reader accepts
    * the bytes (PNG/BMP/GIF/JPEG in any stock JDK), stripe fallback
    * otherwise. Batching exists so a future native codec can amortize
    * per-batch buffers; ImageIO itself is stateless.
    */
  private[multimodal] def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
    batch.map { r =>
      val img =
        try ImageIOHolder.read(r.payload)
        catch { case scala.util.control.NonFatal(_) => null }
      val feats = if (img != null) imageFeatures(img) else stripeFeatures(r.payload)
      MediaFeatures(r.doc_id, r.fmt, feats)
    }

  /** Distributed decode: batches of `batchSize` per partition through
    * [[decodeBatch]]. No shuffle — featurization happens where the
    * bytes already live.
    */
  def decode(records: Dataset[MediaRecord], batchSize: Int = 64)
      (implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    records.mapPartitions { it =>
      it.grouped(batchSize).flatMap(g => decodeBatch(g.toSeq))
    }
  }

  /** ImageIO entry, isolated so executors initialize headless AWT once
    * per JVM (class-load time) instead of per record.
    */
  private object ImageIOHolder {
    System.setProperty("java.awt.headless", "true")
    def read(bytes: Array[Byte]): java.awt.image.BufferedImage =
      javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
  }
}
