package org.apache.spark.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** The streaming halves of the engine's `private[sql]` seam (the DML
  * half is [[GraftDmlBridge]] — between them, every internals access
  * in the repo lives in these two files):
  *
  *  - [[streamingFrame]]: a v1 `Source.getBatch` must return a frame
  *    whose plan is marked `isStreaming` (MicroBatchExecution asserts
  *    it), and the only constructor for that is
  *    `SQLContext.internalCreateDataFrame` — package-private by
  *    design, which is why every out-of-tree v1 source (including the
  *    ones Spark itself shipped before DSv2) uses exactly this shape.
  *  - [[batchFrame]]: the inverse, for a v1 `Sink.addBatch` — the
  *    engine hands the sink a STREAMING-flagged frame that refuses
  *    normal actions (`CALL_ON_STREAMING_DATASET_UNSUPPORTED`);
  *    rewrapping its executed plan as a batch frame is exactly what
  *    Spark's own `ForeachBatchSink` does before invoking user code.
  *    The wrapped RDD is lazy and replays the deterministic
  *    incremental plan, so downstream multi-action commit paths
  *    (expectation gates + staging writes) stay correct. */
object GraftStreamingBridge {
  def streamingFrame(sqlContext: SQLContext, rdd: RDD[InternalRow],
      schema: StructType): DataFrame =
    sqlContext.asInstanceOf[classic.SQLContext]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)

  def batchFrame(df: DataFrame): DataFrame =
    df.sparkSession.asInstanceOf[classic.SparkSession].sqlContext
      .internalCreateDataFrame(
        df.queryExecution.toRdd, df.schema, isStreaming = false)
}
