package graft.multimodal

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed media records and the decode/feature-extract stage.
  *
  * Images and PCM audio are REALLY decoded: `javax.imageio` ships
  * PNG/BMP/GIF/JPEG readers and `javax.sound.sampled` ships WAV/AIFF/AU
  * readers inside the JDK (no external codecs), so both byte→samples→
  * features paths are genuine — raster dimensions/channel/luma stats
  * for images, sample-rate/RMS/zero-crossing stats for audio. Only
  * payloads with no JDK codec at all (video) fall back to a
  * deterministic byte-stripe featurizer, clearly marked below; every
  * path preserves the fixed 8-dim feature contract.
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

  /** 8-dim feature contract for decoded PCM audio (WAV/AIFF/AU — the
    * formats `javax.sound.sampled` reads in any stock JDK):
    * {{{
    * 0: sample rate / 96 kHz (clipped)  4: peak |sample|
    * 1: channels / 8                    5: zero-crossing rate
    * 2: duration / 60 s (clipped)      6: mean |sample|
    * 3: RMS amplitude                   7: DC offset, mapped to [0,1]
    * }}}
    * Samples normalize through a 16-bit signed PCM conversion; at most
    * 4 MiB of PCM is read so one pathological hour-long payload cannot
    * stall its partition (same bounding idea as the image grid).
    */
  private[multimodal] def audioFeatures(
      stream: javax.sound.sampled.AudioInputStream): Array[Float] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    val base = stream.getFormat
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      base.getSampleRate, 16, base.getChannels, 2 * base.getChannels,
      base.getSampleRate, false)
    val pcm = AudioSystem.getAudioInputStream(fmt, stream)
    val bytes = pcm.readNBytes(4 << 20)
    val n = bytes.length / 2
    var (sum, sumAbs, sumSq) = (0.0, 0.0, 0.0)
    var peak = 0
    var crossings = 0L
    var prevSign = 0
    var i = 0
    while (i < n) {
      val s = ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)).toShort.toInt
      sum += s; sumAbs += math.abs(s); sumSq += s.toDouble * s
      if (math.abs(s) > peak) peak = math.abs(s)
      val sign = Integer.signum(s)
      if (sign != 0) {
        if (prevSign != 0 && sign != prevSign) crossings += 1
        prevSign = sign
      }
      i += 1
    }
    val frames = n.toDouble / base.getChannels
    Array(
      math.min(base.getSampleRate, 96000f) / 96000f,
      math.min(base.getChannels, 8) / 8f,
      math.min(frames / base.getSampleRate / 60.0, 1.0).toFloat,
      if (n == 0) 0f else (math.sqrt(sumSq / n) / 32768.0).toFloat,
      peak / 32768f,
      if (n == 0) 0f else (crossings.toDouble / n).toFloat,
      if (n == 0) 0f else (sumAbs / n / 32768.0).toFloat,
      if (n == 0) 0.5f else ((sum / n / 32768.0 + 1.0) / 2.0).toFloat)
  }

  /** FALLBACK featurizer for payloads with no JDK codec (video — the
    * JDK has neither mp4 demuxers nor video codecs, and this container
    * adds none): one feature per 8-byte stripe = mean byte value scaled
    * to [0,1). Deterministic and codec-free — a stand-in distribution,
    * not a real decode; swap in a native codec here when one is
    * available.
    */
  private[multimodal] def stripeFeatures(payload: Array[Byte]): Array[Float] = {
    val stripe = math.max(1, payload.length / FeatureDim)
    Array.tabulate(FeatureDim) { i =>
      val slice = payload.slice(i * stripe, (i + 1) * stripe)
      if (slice.isEmpty) 0f
      else (slice.map(b => (b & 0xff).toLong).sum.toFloat / slice.length) / 256f
    }
  }

  /** Container sniff: the JDK decoders discover "not my format" by
    * registry scan + thrown exception — ruinously slow when most of a
    * mixed corpus is other media. Dispatch on magic bytes first (what
    * production decode farms do); a payload whose magic lies (corrupt
    * container) still falls through to the stripe features, exactly as
    * the blind-attempt path did.
    */
  private[multimodal] def looksImage(p: Array[Byte]): Boolean =
    p.length >= 4 && (
      (p(0) == 0x89.toByte && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') ||
      (p(0) == 0xFF.toByte && p(1) == 0xD8.toByte) || // JPEG SOI
      (p(0) == 'G' && p(1) == 'I' && p(2) == 'F') ||
      (p(0) == 'B' && p(1) == 'M') ||
      // TIFF, both byte orders — the JDK 9+ registry reads it too
      (p(0) == 'I' && p(1) == 'I' && p(2) == 0x2A.toByte && p(3) == 0) ||
      (p(0) == 'M' && p(1) == 'M' && p(2) == 0 && p(3) == 0x2A.toByte))

  private[multimodal] def looksAudio(p: Array[Byte]): Boolean =
    p.length >= 4 && (
      (p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F') || // WAV
      (p(0) == 'F' && p(1) == 'O' && p(2) == 'R' && p(3) == 'M') || // AIFF
      (p(0) == '.' && p(1) == 's' && p(2) == 'n' && p(3) == 'd')) // AU

  /** Decode one batch: ImageIO raster features when the bytes carry an
    * image magic (PNG/BMP/GIF/JPEG in any stock JDK), PCM audio
    * features on an audio container magic (WAV/AIFF/AU), stripe
    * fallback otherwise (video, unknown, corrupt). Batching exists so
    * a future native codec can amortize per-batch buffers; both JDK
    * decoders are stateless.
    */
  private[multimodal] def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
    batch.map { r =>
      val img =
        if (!looksImage(r.payload)) null
        else
          try ImageIOHolder.read(r.payload)
          catch { case scala.util.control.NonFatal(_) => null }
      val feats =
        if (img != null) imageFeatures(img)
        else {
          val audio =
            if (!looksAudio(r.payload)) null
            else
              try javax.sound.sampled.AudioSystem.getAudioInputStream(
                new ByteArrayInputStream(r.payload))
              catch { case scala.util.control.NonFatal(_) => null }
          if (audio != null) audioFeatures(audio)
          else stripeFeatures(r.payload)
        }
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

  case class FrameFeatures(doc_id: Long, frame_idx: Int,
      features: Array[Float])

  /** Split an MJPEG-style stream — concatenated baseline JPEGs, the
    * one video container whose frames a stock JDK CAN decode — into
    * per-frame byte slices: each frame runs from an SOI marker
    * (FF D8) to its matching EOI (FF D9). A top-level scan (no marker
    * nesting) is correct for motion-JPEG streams, whose frames are
    * baseline JPEGs without embedded thumbnails; bytes between frames
    * (padding, partial tail) are dropped.
    */
  private[multimodal] def splitMjpeg(payload: Array[Byte]): Seq[Array[Byte]] = {
    val out = Seq.newBuilder[Array[Byte]]
    var i = 0
    val n = payload.length
    while (i + 1 < n) {
      if (payload(i) == 0xFF.toByte && payload(i + 1) == 0xD8.toByte) {
        var j = i + 2
        var end = -1
        while (j + 1 < n && end < 0) {
          if (payload(j) == 0xFF.toByte && payload(j + 1) == 0xD9.toByte)
            end = j + 2
          j += 1
        }
        if (end > 0) { out += payload.slice(i, end); i = end }
        else i = n // truncated tail frame: drop
      } else i += 1
    }
    out.result()
  }

  /** REAL video-frame decode for the MJPEG case: split each payload
    * into JPEG frames and run every frame through the same ImageIO
    * raster featurizer images use — (doc_id, frame_idx, features) per
    * frame. Same distribution shape as [[decode]]: `mapPartitions`
    * where the bytes live, no shuffle. A frame whose JPEG is corrupt
    * falls back to its stripe features (never dropped silently);
    * payloads that are not JPEG streams at all yield zero rows —
    * route those through [[decode]]'s stripe fallback instead.
    */
  def decodeMjpeg(records: Dataset[MediaRecord])
      (implicit spark: SparkSession): Dataset[FrameFeatures] = {
    import spark.implicits._
    records.mapPartitions(_.flatMap { r =>
      splitMjpeg(r.payload).zipWithIndex.map { case (frame, idx) =>
        val img =
          try ImageIOHolder.read(frame)
          catch { case scala.util.control.NonFatal(_) => null }
        FrameFeatures(r.doc_id, idx,
          if (img != null) imageFeatures(img) else stripeFeatures(frame))
      }
    })
  }

  /** ImageIO entry, isolated so executors initialize headless AWT once
    * per JVM (class-load time) instead of per record.
    */
  private object ImageIOHolder {
    System.setProperty("java.awt.headless", "true")
    def read(bytes: Array[Byte]): java.awt.image.BufferedImage =
      javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
  }

  /** Raster read for sibling decode stages ([[MediaDedup]]) — throws
    * on undecodable bytes (callers decide their fallback).
    */
  private[multimodal] def readImage(
      bytes: Array[Byte]): java.awt.image.BufferedImage = {
    val img = ImageIOHolder.read(bytes)
    if (img == null) throw new java.io.IOException("undecodable image bytes")
    img
  }
}
