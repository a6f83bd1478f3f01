package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema conformance for drifting ingest feeds: normalize an incoming
  * batch to a TARGET schema — upstream producers add, drop, retype,
  * and reorder columns between crawls, and a pipeline that hard-fails
  * on the first drifted batch (or worse, silently unions mismatched
  * schemas) loses the night's data. The batch companion to the diff
  * core's lenient asymmetric-schema mode.
  *
  * Policy (each action auditable):
  *   - missing target column  → added as typed nulls   (`add_null`)
  *   - type mismatch          → `cast` when Spark can, else reject
  *   - extra batch column     → dropped                (`drop_extra`)
  *   - matching column        → passed through         (`keep`)
  *
  * Casting uses Spark's own `Cast.canCast` lattice — a widening or
  * string cast conforms, an incompatible one (array → int) rejects
  * loudly instead of nulling data. Pure projection: zero shuffle, and
  * the plan is the same SELECT a 100 TB backfill would run.
  */
object SchemaConform {

  /** One row per target/extra column describing the action taken. */
  final case class Action(column: String, action: String,
      from: String, to: String)

  /** The conforming projection plus its audit. Throws
    * IllegalArgumentException when any column cannot conform.
    */
  def conform(batch: DataFrame, target: StructType)
      : (DataFrame, Seq[Action]) = {
    val have = batch.schema.fields.map(f => f.name -> f).toMap
    val actions = collection.mutable.ArrayBuffer.empty[Action]
    val cols = target.fields.map { tf =>
      have.get(tf.name) match {
        case None =>
          actions += Action(tf.name, "add_null", "-", tf.dataType.simpleString)
          lit(null).cast(tf.dataType).as(tf.name)
        case Some(bf) if bf.dataType == tf.dataType =>
          actions += Action(tf.name, "keep", bf.dataType.simpleString,
            tf.dataType.simpleString)
          col(tf.name)
        case Some(bf) =>
          require(org.apache.spark.sql.catalyst.expressions.Cast
            .canCast(bf.dataType, tf.dataType),
            s"column ${tf.name}: cannot conform ${bf.dataType.simpleString}" +
              s" to ${tf.dataType.simpleString}")
          actions += Action(tf.name, "cast", bf.dataType.simpleString,
            tf.dataType.simpleString)
          col(tf.name).cast(tf.dataType).as(tf.name)
      }
    }
    batch.schema.fields.filterNot(f => target.fieldNames.contains(f.name))
      .foreach(f => actions +=
        Action(f.name, "drop_extra", f.dataType.simpleString, "-"))
    (batch.select(cols.toIndexedSeq: _*), actions.toSeq)
  }

  /** Conform-and-union: the standard "fold a drifted batch into the
    * standing table" step.
    */
  def conformUnion(standing: DataFrame, batch: DataFrame): DataFrame =
    standing.unionByName(conform(batch, standing.schema)._1)
}
