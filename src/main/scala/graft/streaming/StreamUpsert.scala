package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery
import graft.lake.{Catalog, Layout}

/** Streaming CDC APPLY: a change stream (each row the NEW version of
  * its key, carrying the lake's `source` partition column) is merged
  * into the lake per micro-batch through
  * [[graft.lake.Catalog.upsertLakeByKey]] — one atomic log commit per
  * batch DV-deletes the superseded versions and appends the new ones,
  * so a [[graft.lake.Catalog.loadLakeSnapshot]] reader always sees a
  * key's state as of some batch boundary, never a torn mix.
  *
  * Redelivery: re-applying a batch deletes the rows the first
  * application inserted and re-inserts identical ones — the LIVE VIEW
  * is idempotent under at-least-once delivery (the log gains a
  * version, the state does not change). Within one batch, later
  * changes to a key must supersede earlier ones, so the batch is
  * collapsed to the last version per key by `seqCol` BEFORE the merge
  * — without that, both versions would land side by side.
  *
  * Scale: per batch, O(batch + matched rows) — the match scan prunes
  * through the snapshot read and no data file is ever rewritten;
  * deferred compaction is [[graft.lake.Catalog.materializeLakeDeletes]]
  * on a maintenance schedule, exactly like the non-streaming path. */
object StreamUpsert {

  /** Collapse `batch` to the highest-`seqCol` row per key, then merge. */
  def applyBatch(layout: Layout, batch: DataFrame, keyCols: Seq[String],
      seqCol: String, markerPath: Option[String] = None): Long = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(seqCol).desc)
    val latest = batch.withColumn("_graft_rn", row_number().over(w))
      .filter(col("_graft_rn") === 1).drop("_graft_rn")
    Catalog.upsertLakeByKey(batch.sparkSession, layout, latest, keyCols,
      markerPath = markerPath)
  }

  private def markerFor(checkpointDir: String, batchId: Long): String =
    s"$checkpointDir/_graft_upsert_markers/$batchId"

  /** The exactly-once guard around [[applyBatch]]: skip when this
    * batch id's marker already exists (the marker lands in the SAME
    * log record as the upsert, and [[graft.lake.Catalog.recoverAppends]]
    * re-creates it when finishing a torn commit — so a crash anywhere
    * leaves either no trace or a complete, marked commit). Returns
    * true when the batch was applied, false when skipped. */
  def applyBatchOnce(layout: Layout, batch: DataFrame, keyCols: Seq[String],
      seqCol: String, checkpointDir: String, batchId: Long): Boolean = {
    val marker = markerFor(checkpointDir, batchId)
    val p = new org.apache.hadoop.fs.Path(marker)
    val fs = p.getFileSystem(batch.sparkSession.sparkContext.hadoopConfiguration)
    // recover FIRST, then check the marker (StreamIngest's ordering):
    // a prior attempt that crashed between CLAIM and publish has no
    // marker yet — recovery recreates it, and checking before
    // recovering would re-apply the batch, minting a duplicate log
    // version despite the exactly-once claim
    Catalog.recoverAppends(batch.sparkSession, layout)
    if (fs.exists(p)) false
    else {
      applyBatch(layout, batch, keyCols, seqCol, Some(marker))
      true
    }
  }

  /** EXACTLY-ONCE per micro-batch: a redelivered batch that finds its
    * marker is SKIPPED — no duplicate log version, on top of the
    * state-idempotence the merge already has. */
  def start(changes: DataFrame, layout: Layout, keyCols: Seq[String],
      seqCol: String, checkpointDir: String): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatchOnce(layout, batch, keyCols, seqCol, checkpointDir, batchId)
        ()
      }
      .start()
}
