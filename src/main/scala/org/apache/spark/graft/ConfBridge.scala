package org.apache.spark.graft

import org.apache.hadoop.conf.Configuration
import org.apache.spark.util.SerializableConfiguration

/** Access bridge for `private[spark]` [[SerializableConfiguration]] —
  * executor-side Hadoop FS access must carry the SESSION's
  * configuration (credentials, endpoints, committers), not a blank
  * `new Configuration()` that silently loses S3A/HDFS settings on a
  * real cluster. Same shim pattern as [[org.apache.spark.sql.graft.Bridge]];
  * kept to one forwarder. */
object ConfBridge {
  def serializable(conf: Configuration): SerializableConfiguration =
    new SerializableConfiguration(conf)
}
