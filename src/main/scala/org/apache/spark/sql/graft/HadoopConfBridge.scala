package org.apache.spark.sql.graft

import org.apache.hadoop.conf.Configuration
import org.apache.spark.SparkContext
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.util.SerializableConfiguration

/** Bridge into Spark's `private[spark]` [[SerializableConfiguration]]
  * — the standard way to ship the session's Hadoop configuration into
  * tasks (a raw `Configuration` is not serializable, and a fresh
  * `new Configuration()` on the executor would drop the session's
  * filesystem settings). Used by the distributed file copy of
  * [[graft.tables.CowTable.deepClone]].
  */
object HadoopConfBridge {

  def broadcast(sc: SparkContext,
      conf: Configuration): Broadcast[SerializableConfiguration] =
    SerializableConfiguration.broadcast(sc, conf)

  def value(b: Broadcast[SerializableConfiguration]): Configuration =
    b.value.value
}
