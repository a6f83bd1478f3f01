package graft.multimodal

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed media records and the decode/feature-extract stage.
  *
  * The Spark-side plumbing here is REAL and tested: case-class
  * encoders, a `mapPartitions` stage that processes records in batches
  * (the shape a native decoder wants — amortize codec init per
  * partition, reuse buffers per batch), partitioning preserved, and a
  * typed features output that downstream similarity search consumes
  * directly.
  *
  * The byte→pixels step itself is a clearly-marked STUB: this
  * container ships no image/audio codecs, so `decodeBatch` derives a
  * deterministic fake feature vector from the payload bytes. Swapping
  * in a real decoder means replacing ONLY `decodeBatch`'s body — the
  * schema, batching and distribution story don't change.
  */
object DecodeStub {

  val FeatureDim = 8

  case class MediaRecord(doc_id: Long, fmt: String, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, fmt: String, features: Array[Float])

  /** STUB decode: one feature per 8-byte stripe = mean byte value
    * scaled to [0,1). Deterministic, codec-free. A real implementation
    * decodes `r.payload` with a per-partition codec instance instead.
    */
  private[multimodal] def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
    batch.map { r =>
      val stripe = math.max(1, r.payload.length / FeatureDim)
      val feats = Array.tabulate(FeatureDim) { i =>
        val slice = r.payload.slice(i * stripe, (i + 1) * stripe)
        if (slice.isEmpty) 0f
        else (slice.map(b => (b & 0xff).toLong).sum.toFloat / slice.length) / 256f
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
}
