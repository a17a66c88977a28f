package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Sink, Source}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType
import graft.lake.{Catalog, Layout}

/** FIRST-CLASS STREAMING SINK into the lake — the write half of the
  * `graft-lake-cdf` source, completing the Delta streaming-table
  * idiom without a hand-rolled `foreachBatch`:
  *
  * {{{
  * df.writeStream.format("graft-lake")
  *   .option("root", layoutRoot)
  *   .option("checkpointLocation", ckpt)      // required: keys the markers
  *   .option("mode", "append")                // default; or:
  *   .option("mode", "upsert")
  *   .option("keys", "k1,k2").option("seqCol", "ts")
  *   .start()
  * // a streaming AGGREGATE mirrors into the lake via Complete mode:
  * agg.writeStream.format("graft-lake").outputMode("complete")
  *   .option("root", r).option("checkpointLocation", c).start()
  * }}}
  *
  * Exactly-once, per micro-batch, via the engine's batch-marker
  * protocol (the one [[StreamUpsert]]/[[StreamIngest]] prove): the
  * batch-completion marker lands in the SAME atomic log record as the
  * data, [[Catalog.recoverAppends]] runs before every batch so a
  * crash between CLAIM and publish is finished (marker included), and
  * a redelivered batch that finds its marker is SKIPPED — the log
  * gains no duplicate version. Each micro-batch is ONE commit: a
  * snapshot reader sees batch boundaries, never a torn batch; the CDF
  * shows each batch as one version (pinned by the consumer E2E spec).
  *
  * `mode=append` routes through [[Catalog.commitLake]] (expectations,
  * widening up-casts, partitioned staging); `mode=upsert` through
  * [[StreamUpsert.applyBatch]] (collapse to latest per key by
  * `seqCol`, then the one-record DV+append merge).
  *
  * v1 `Sink` on purpose: `addBatch` receives the batch as a REPLAYABLE
  * frame (offsets pin it), and the commit path is driver-coordinated
  * staging — the same reason the CDF source stays a v1 `Source` (and
  * the same choice Delta's sink makes). Multiple actions over the
  * batch (expectation gates + the staging write) re-execute a
  * deterministic incremental plan. */
class LakeSinkProvider extends StreamSinkProvider with StreamSourceProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-lake"

  // ------------------------------------------------------------------
  // The READ half: `readStream.format("graft-lake")` — the lake's
  // append stream as plain payload rows ([[LakeRowsSource]]), so ONE
  // format name is the table's streaming identity in both directions
  // (the Delta idiom: readStream and writeStream on the same format).
  // ------------------------------------------------------------------

  private def payloadSchema(sqlContext: SQLContext,
      parameters: Map[String, String]): StructType = {
    val layout = LakeCdfSource.layoutOf(parameters)
    val snap = Catalog.loadLakeSnapshot(sqlContext.sparkSession, layout)
    require(snap.columns.nonEmpty,
      "graft-lake source: the lake has no committed files yet — commit " +
        "first or pass an explicit schema")
    snap.schema
  }

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), schema.getOrElse(payloadSchema(sqlContext, parameters)))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    def opt(name: String): Option[String] =
      parameters.get(name).orElse(parameters.get(name.toLowerCase))
    val layout = LakeCdfSource.layoutOf(parameters)
    val from = LakeCdfSource.persistedStart(sqlContext, metadataPath,
      LakeCdfSource.startingVersionOf(sqlContext, parameters, layout))
    val maxPerTrigger = opt("maxVersionsPerTrigger").map(_.toLong)
    maxPerTrigger.foreach(k => require(k >= 1,
      s"graft-lake: maxVersionsPerTrigger must be >= 1, got $k"))
    val ignoreDeletes = opt("ignoreDeletes").exists(_.toBoolean)
    new LakeRowsSource(sqlContext, layout,
      schema.getOrElse(payloadSchema(sqlContext, parameters)), from,
      maxPerTrigger, ignoreDeletes)
  }

  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    def opt(name: String): Option[String] =
      parameters.get(name).orElse(parameters.get(name.toLowerCase))
    // root [+ table] — a created table is a streaming sink by name too
    val layout = LakeCdfSource.layoutOf(parameters)
    val checkpoint = opt("checkpointLocation").getOrElse(
      throw new IllegalArgumentException("graft-lake sink: " +
        "checkpointLocation is required — it keys the exactly-once markers"))
    // OutputMode is load-bearing for correctness, not decoration:
    //  - Complete: every batch is the WHOLE result — map it to the
    //    atomic replace (overwriteLake), the streaming-aggregate →
    //    lake-mirror idiom (Delta's complete-mode replaceWhere).
    //  - Update: batches carry re-emitted rows for changed keys —
    //    appending them would duplicate every update, so Update
    //    REQUIRES mode=upsert (keys merge the re-emissions).
    //  - Append: plain appends, or upsert if asked.
    val mode = opt("mode").getOrElse("append")
    if (outputMode == OutputMode.Complete()) {
      if (mode != "append") throw new IllegalArgumentException(
        "graft-lake sink: Complete output replaces the lake wholesale — " +
          "drop mode=" + mode)
      return new LakeCompleteSink(layout, checkpoint)
    }
    if (outputMode == OutputMode.Update() && mode != "upsert")
      throw new IllegalArgumentException(
        "graft-lake sink: Update output re-emits changed keys — appending " +
          "them would duplicate every update; use mode=upsert with keys/" +
          "seqCol (or aggregate in Complete mode)")
    mode match {
      case "append" => new LakeAppendSink(layout, checkpoint)
      case "upsert" =>
        val keys = opt("keys").getOrElse(throw new IllegalArgumentException(
          "graft-lake sink: mode=upsert needs option 'keys' (comma-separated)"))
          .split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val seqCol = opt("seqCol").getOrElse(
          throw new IllegalArgumentException(
            "graft-lake sink: mode=upsert needs option 'seqCol' (the " +
              "per-key version order within a batch)"))
        new LakeUpsertSink(layout, checkpoint, keys, seqCol)
      case other => throw new IllegalArgumentException(
        s"graft-lake sink: mode must be append|upsert, got '$other'")
    }
  }
}

private[streaming] abstract class LakeSinkBase(layout: Layout,
    checkpointDir: String) extends Sink {

  protected def apply(batch: DataFrame, marker: String): Unit

  final override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val marker = s"$checkpointDir/_graft_lake_sink_markers/$batchId"
    val p = new org.apache.hadoop.fs.Path(marker)
    val fs = p.getFileSystem(
      data.sparkSession.sparkContext.hadoopConfiguration)
    // recover FIRST, then check the marker (the StreamUpsert ordering):
    // a prior attempt that crashed between CLAIM and publish has no
    // marker yet — recovery finishes it, marker included; checking
    // first would re-apply the batch and mint a duplicate version
    Catalog.recoverAppends(data.sparkSession, layout)
    // the engine hands a STREAMING-flagged frame that refuses normal
    // actions — rewrap the executed incremental plan as a batch frame
    // (the ForeachBatchSink move) so the commit path runs unchanged
    if (!fs.exists(p))
      apply(org.apache.spark.sql.GraftStreamingBridge.batchFrame(data), marker)
  }
}

private[streaming] class LakeAppendSink(layout: Layout, checkpointDir: String)
    extends LakeSinkBase(layout, checkpointDir) {
  override protected def apply(batch: DataFrame, marker: String): Unit = {
    Catalog.commitLake(batch.sparkSession, layout, batch,
      marker = Some(marker))
    ()
  }
}

private[streaming] class LakeUpsertSink(layout: Layout, checkpointDir: String,
    keys: Seq[String], seqCol: String)
    extends LakeSinkBase(layout, checkpointDir) {
  override protected def apply(batch: DataFrame, marker: String): Unit = {
    StreamUpsert.applyBatch(layout, batch, keys, seqCol, Some(marker))
    ()
  }
}

/** Complete-mode: each batch is the whole result — ONE atomic replace
  * per batch ([[Catalog.overwriteLake]]): readers see consecutive
  * whole results, never a mix; the CDF shows each batch as one
  * retract+insert version, so an [[graft.lake.Mv]] downstream of the
  * mirrored aggregate refreshes across it. */
private[streaming] class LakeCompleteSink(layout: Layout,
    checkpointDir: String) extends LakeSinkBase(layout, checkpointDir) {
  override protected def apply(batch: DataFrame, marker: String): Unit = {
    Catalog.overwriteLake(batch.sparkSession, layout, batch,
      marker = Some(marker))
    ()
  }
}
