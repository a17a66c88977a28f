package org.apache.spark.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** The ONE `private[sql]` access this engine needs: a v1 streaming
  * `Source.getBatch` must return a frame whose plan is marked
  * `isStreaming` (MicroBatchExecution asserts it), and the only
  * constructor for that is `SQLContext.internalCreateDataFrame` —
  * package-private to `org.apache.spark.sql` by design, which is why
  * every out-of-tree v1 source (including the ones Spark itself
  * shipped before DSv2) uses exactly this bridge shape. Nothing else
  * in the repo reaches into Spark internals this way; keep it that
  * way. */
object GraftStreamingBridge {
  def streamingFrame(sqlContext: SQLContext, rdd: RDD[InternalRow],
      schema: StructType): DataFrame =
    sqlContext.asInstanceOf[classic.SQLContext]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)
}
