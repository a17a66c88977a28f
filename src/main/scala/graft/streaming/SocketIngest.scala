package graft.streaming

import graft.lake.{Envelope, Layout}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Network ingest edge — the engine form of the reference's
  * `POST /{source}` entry point (API Gateway → Firehose → S3,
  * `/root/reference/serverless_datalake/serverless_datalake_stack.py:150-216`),
  * which was the one reference behavior previously demo-able only from
  * a pre-seeded drop directory.
  *
  * Envelope lines ([[Envelope.wrap]] output — the VTL request template
  * shape) arrive on a TCP socket; each micro-batch is unwrapped and
  * flushed as per-source CONCATENATED gzip JSON objects under
  * `bronze/<source>/` — exactly the Firehose buffer contract (O2):
  * time-bounded buffers (the trigger interval ↔ the 60 s buffering
  * hint), gzip, concatenated payloads, one object per flush. The
  * existing [[StreamIngest]] then discovers the objects and runs
  * catalog + fan-out unchanged.
  *
  * Scale: the object write fans out per source WITHIN each executor
  * partition (`repartition(source)` keeps one source's records
  * together, Hadoop FS API so the same code hits HDFS/S3A); object
  * names carry (batch, partition) so concurrent flushes never collide.
  * Spark's socket source itself is single-connection — a production
  * edge would run one such stream per frontend, which is exactly the
  * reference's shape (one Firehose delivery stream per source, many
  * API nodes in front).
  */
object SocketIngest {

  /** Start the socket→bronze buffer stream; `host:port` is the
    * listening frontend to connect to. */
  def start(spark: SparkSession, layout: Layout, host: String, port: Int,
      trigger: Trigger = Trigger.ProcessingTime("1 second")): StreamingQuery =
    spark.readStream
      .format("socket")
      .option("host", host)
      .option("port", port)
      .load()
      .writeStream
      .option("checkpointLocation", s"${layout.checkpointDir}/socket-ingest")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        flushBatch(batch, layout, batchId)
      }
      .start()

  /** API-key-gated variant of [[start]] — the full reference edge
    * with `api_key_required=True`: lines are POST-shaped requests
    * `{"api_key": <key>, "env": <Envelope.wrap output>}`; each batch
    * is gated through [[graft.lake.Access]] (401/403/429 semantics),
    * accepted envelopes flush to bronze, accepted usage is billed, and
    * rejections are logged as data under `_access/rejections` — the
    * edge never throws on bad credentials. */
  def startGated(spark: SparkSession, layout: Layout, host: String, port: Int,
      trigger: Trigger = Trigger.ProcessingTime("1 second"),
      nowMs: () => Long = () => System.currentTimeMillis()): StreamingQuery =
    spark.readStream
      .format("socket")
      .option("host", host)
      .option("port", port)
      .load()
      .writeStream
      .option("checkpointLocation", s"${layout.checkpointDir}/socket-ingest-gated")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        gatedFlush(spark, layout, batch, batchId, nowMs())
      }
      .start()

  /** One gated micro-batch: parse request lines, gate, flush accepted,
    * bill usage, log rejections. Factored out for batch tests. */
  def gatedFlush(spark: SparkSession, layout: Layout, batch: DataFrame,
      batchId: Long, nowMs: Long): Unit = {
    if (batch.isEmpty) return
    val reqType = org.apache.spark.sql.types.DataType
      .fromDDL("STRUCT<api_key: STRING, env: STRING>")
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val parsed = batch
      .select(from_json(col("value"), reqType).as("r"))
      .select(col("r.api_key").as("api_key"), col("r.env").as("env"))
    // the claimed source is INSIDE the envelope (DeliveryStreamName) —
    // same as the reference, where the posted resource names the stream
    val (srcCol, _) = Envelope.unwrap(col("env"))
    val requests = parsed.select(col("api_key"), srcCol.as("source"), col("env"))
      .filter(col("source").isNotNull)
    val (accepted, rejected) = graft.lake.Access.gate(spark, layout, requests, nowMs)
    val acc = accepted.persist() // flush and billing must see identical rows
    try {
      flushBatch(acc.select(col("env").as("value")), layout, batchId)
      graft.lake.Access.recordUsage(spark, layout, acc, nowMs)
      // append-only like the usage ledger — fold periodically with the
      // same Access.compactUsage-style maintenance if the edge runs hot
      rejected.groupBy(col("source"), col("reason")).agg(count(lit(1)).as("n"))
        .withColumn("batch_id", lit(batchId))
        .write.mode("append").parquet(s"${layout.root}/_access/rejections")
    } finally acc.unpersist()
  }

  /** Unwrap one micro-batch of envelope lines and flush per-source
    * gzip bronze objects. Factored out so batch tests can drive it
    * without a live socket. */
  def flushBatch(envelopes: DataFrame, layout: Layout, batchId: Long): Unit = {
    if (envelopes.isEmpty) return
    val bronzeDir = layout.bronzeDir
    // ship the SESSION's Hadoop conf to executors — a blank
    // Configuration would silently lose S3A/HDFS credentials and
    // committer settings on a real cluster
    val hconf = org.apache.spark.graft.ConfBridge.serializable(
      envelopes.sparkSession.sparkContext.hadoopConfiguration)
    Envelope.unwrapAll(envelopes, "value")
      .filter(col("source").isNotNull && col("json").isNotNull)
      .repartition(col("source"))
      .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        val part = org.apache.spark.TaskContext.getPartitionId()
        rows.toSeq.groupBy(_.getString(0)).foreach { case (source, recs) =>
          // write-then-rename: the reference's S3 PUT is atomic (an
          // object is visible only complete), but a filesystem create
          // is NOT — the discovery stream would read a half-written
          // gzip (EOFException). Dot-prefixed temp names are invisible
          // to Spark's file source until the rename commits them.
          val path = new org.apache.hadoop.fs.Path(
            s"$bronzeDir/$source/socket-b$batchId-p$part.gz")
          val tmp = new org.apache.hadoop.fs.Path(
            s"$bronzeDir/$source/.socket-b$batchId-p$part.gz.tmp")
          val fs = path.getFileSystem(hconf.value)
          val out = new java.util.zip.GZIPOutputStream(fs.create(tmp, true))
          try recs.foreach(r => out.write(r.getString(1).getBytes("UTF-8")))
          finally out.close()
          if (!fs.rename(tmp, path)) {
            fs.delete(path, false) // replayed batch left a complete object
            if (!fs.rename(tmp, path))
              throw new java.io.IOException(s"bronze commit failed: $tmp -> $path")
          }
        }
      }
  }
}
