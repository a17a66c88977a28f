package graft.streaming

import graft.ops.Sketch
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming Count-Min sketch: maintain key frequencies over an
  * unbounded stream in O(d·w) state per batch. Each micro-batch is
  * collapsed to its d×w cell table ([[Sketch.cellsOf]] — a monoid) and
  * written to `store/batch=<id>/`; readers merge by cell-wise sum.
  *
  * Exactly-once without any transaction log: a batch directory is
  * OVERWRITTEN keyed by its batch id, so a replayed micro-batch after a
  * checkpoint-recovery rewrites the same bytes instead of double
  * counting — the same marker-idempotence contract StreamIngest
  * documents for its catalog appends.
  *
  * Scale: the shuffle per batch carries at most d·w cells regardless of
  * batch size (map-side partial agg does the collapse), and the store
  * grows one fixed-size partition per batch — compact with a cell-sum
  * rewrite when batch count dwarfs d·w.
  */
object StreamSketch {

  /** Start folding `key` of the streaming frame `events` into a cell
    * store at `storeDir`. */
  def start(events: DataFrame, key: Column, storeDir: String,
      checkpointDir: String): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Sketch.cellsOf(batch, key)
          .coalesce(1)
          .write.mode("overwrite").parquet(s"$storeDir/batch=$batchId")
        ()
      }
      .start()

  /** The merged sketch: cell-wise sum across every batch partition. */
  def mergedCells(spark: SparkSession, storeDir: String): DataFrame =
    spark.read.parquet(storeDir)
      .groupBy(col("row_no"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Rewrite the store as ONE pre-merged cell partition and drop every
    * per-batch partition — run when batch count dwarfs d·w. The merged
    * sketch is BOUNDED at d·w cells (the whole point of the structure),
    * so it is collected and rewritten as a snapshot partition; repeated
    * compactions fold prior snapshots in.
    *
    * Crash-safe commit protocol: the snapshot is written to a hidden
    * temp dir (invisible to parquet readers), stamped with a `_folded`
    * manifest naming exactly the input partitions it merged, renamed
    * into place, and ONLY THEN are the inputs deleted. A crash before
    * the rename loses nothing (temp dirs are garbage-collected on the
    * next compact); a crash after the rename is finished by
    * [[recover]] — the manifest says which inputs are safe to delete —
    * so no interleaving can lose counts. After a mid-delete crash, run
    * `compact` (or `recover`) before reading: until then the snapshot
    * and its not-yet-deleted inputs double count.
    *
    * Run only while the stream is stopped with its last batch
    * committed: compacting an UNCOMMITTED batch's partition and then
    * replaying that batch after recovery would fold its counts twice
    * (the per-batch overwrite idempotence protects exactly the
    * partitions compaction removes). */
  def compact(spark: SparkSession, storeDir: String): Unit = {
    import spark.implicits._
    val root = new org.apache.hadoop.fs.Path(storeDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recover(fs, root)
    val inputs = fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
      .map(_.getPath).sortBy(_.getName)
    if (inputs.isEmpty) return
    val cells = spark.read.parquet(inputs.map(_.toString): _*)
      .groupBy(col("row_no"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))
      .collect()
      .map(r => (r.getAs[Int]("row_no"), r.getAs[Long]("bucket"), r.getAs[Long]("cnt")))
      .toSeq
    val gen = 1L + inputs.map(_.getName)
      .filter(_.startsWith("batch=compacted_g"))
      .map(_.stripPrefix("batch=compacted_g").toLong)
      .foldLeft(0L)(math.max)
    val tmp = new org.apache.hadoop.fs.Path(root, s"_compact_tmp_g$gen")
    fs.delete(tmp, true)
    cells.toDF("row_no", "bucket", "cnt").coalesce(1)
      .write.mode("overwrite").parquet(tmp.toString)
    val mf = fs.create(new org.apache.hadoop.fs.Path(tmp, "_folded"), true)
    mf.write(inputs.map(_.getName).mkString("\n").getBytes("UTF-8"))
    mf.close()
    val snapshot = new org.apache.hadoop.fs.Path(root, s"batch=compacted_g$gen")
    if (!fs.rename(tmp, snapshot))
      sys.error(s"StreamSketch.compact: rename $tmp -> $snapshot failed")
    inputs.foreach(p => fs.delete(p, true))
  }

  /** Finish any interrupted compaction: drop uncommitted temp dirs and
    * delete input partitions that a committed snapshot's `_folded`
    * manifest records as already merged. Idempotent. */
  def recover(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Unit = {
    if (!fs.exists(root)) return
    val entries = fs.listStatus(root)
    entries.filter(s => s.isDirectory && s.getPath.getName.startsWith("_compact_tmp_g"))
      .foreach(s => fs.delete(s.getPath, true))
    entries.filter(s => s.isDirectory && s.getPath.getName.startsWith("batch=compacted_g"))
      .foreach { snap =>
        val manifest = new org.apache.hadoop.fs.Path(snap.getPath, "_folded")
        if (fs.exists(manifest)) {
          val in = fs.open(manifest)
          val folded = try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
          finally in.close()
          folded.filter(n => n.nonEmpty && n != snap.getPath.getName)
            .foreach(n => fs.delete(new org.apache.hadoop.fs.Path(root, n), true))
        }
      }
  }

  /** Point estimate for each key in `keys` from the merged store:
    * min over the d cells the key hashes to — never an undercount.
    * Probes LEFT-join the cell table with absent cells counting as 0,
    * so a never-seen key returns est = 0 (instead of vanishing) and a
    * key with some empty cells takes the true min over all d cells. */
  def estimate(spark: SparkSession, storeDir: String, keys: DataFrame,
      key: Column): DataFrame = {
    val probes = keys.select(key.as("key")).distinct()
      .select(col("key"), explode(array((0 until Sketch.Depth).map(i =>
        struct(lit(i).as("row_no"), Sketch.bucketOf(i, col("key")).as("bucket"))): _*)).as("p"))
      .select(col("key"), col("p.row_no").as("row_no"), col("p.bucket").as("bucket"))
    probes.join(mergedCells(spark, storeDir), Seq("row_no", "bucket"), "left")
      .groupBy(col("key"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}
