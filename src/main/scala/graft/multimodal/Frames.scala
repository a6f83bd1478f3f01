package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-size frame/block sampling over binary payloads — the
  * video-frame / audio-window primitive, expressed as pure byte
  * slicing so it needs no codec.
  *
  * One `posexplode` projection per payload; zero shuffle. At scale the
  * fanout is rows × frames, which is exactly what downstream
  * per-frame featurization wants to parallelize over.
  */
object Frames {

  /** Explode each payload into (frame_idx, frame) rows: frames of
    * `frameSize` bytes, taking every `stride`-th frame (stride 2 =
    * every other frame). Truncated tail frames are dropped.
    */
  def sample(df: DataFrame, idCol: String, payloadCol: String,
      frameSize: Int, stride: Int): DataFrame = {
    require(frameSize > 0 && stride > 0,
      s"frameSize and stride must be positive, got $frameSize/$stride" +
        " (zero would null out the frame arithmetic and silently drop rows)")
    val nFrames = (length(col(payloadCol)) / frameSize).cast("int")
    val idxs = filter(
      sequence(lit(0), greatest(nFrames - 1, lit(0))),
      i => i % stride === 0 && (i + 1) * frameSize <= length(col(payloadCol)))
    df.select(col(idCol), posexplode(
        transform(idxs, i =>
          struct(i.as("frame_idx"),
            col(payloadCol).substr(i * frameSize + 1, lit(frameSize))
              .as("frame")))))
      .select(col(idCol), col("col.frame_idx").as("frame_idx"),
        col("col.frame").as("frame"))
  }
}
