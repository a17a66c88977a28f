package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Crash-safe fold-to-snapshot protocol shared by the batch-partition
  * sketch stores ([[StreamSketch]] cells, [[StreamKmv]] hash sets):
  * a store is a directory of `batch=<id>/` parquet partitions written
  * overwrite-idempotently per micro-batch; `compact` folds every
  * partition into one bounded snapshot partition without a window in
  * which counts can be lost or double-read after recovery.
  *
  * Commit protocol (identical for any monoid payload): write the
  * merged snapshot to a hidden `_compact_tmp_g<N>` dir (invisible to
  * parquet readers of the root), stamp it with a `_folded` manifest
  * naming exactly the input partitions it merged, rename into place as
  * `batch=compacted_g<N>`, stamp a `_committed` marker, and ONLY THEN
  * delete the inputs. The marker — not the rename — is the commit
  * point: on filesystems with atomic rename (HDFS, local) the rename
  * alone would suffice, but on object stores (S3A) "rename" is a
  * non-atomic copy+delete and a crash mid-copy leaves a PARTIAL
  * snapshot dir in place; [[recover]] therefore deletes any snapshot
  * without the marker (its inputs are untouched — input deletion is
  * gated on the marker — so nothing is lost, the next compact redoes
  * the fold). A crash before the marker loses nothing; a crash after
  * it is finished by [[recover]] — the manifest says which inputs are
  * safe to delete. Until recovery runs after a mid-delete crash, the
  * snapshot and its not-yet-deleted inputs double count — run
  * `compact`/`recover` before reading.
  *
  * Run only while the stream is stopped with its last batch committed:
  * compacting an UNCOMMITTED batch and then replaying it after
  * checkpoint recovery would fold its contribution twice (the
  * per-batch overwrite idempotence protects exactly the partitions
  * compaction removes).
  */
private[streaming] object SnapshotStore {

  /** Fold all `batch=` partitions of `storeDir` into one snapshot via
    * `merge` (given the input partition paths; must return a frame
    * bounded by the sketch size, not the stream size). */
  def compact(spark: SparkSession, storeDir: String)
      (merge: Seq[String] => DataFrame): Unit = {
    val root = new Path(storeDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recover(fs, root)
    val inputs = fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
      .map(_.getPath).sortBy(_.getName)
    if (inputs.isEmpty) return
    val gen = 1L + inputs.map(_.getName)
      .filter(_.startsWith("batch=compacted_g"))
      .map(_.stripPrefix("batch=compacted_g").toLong)
      .foldLeft(0L)(math.max)
    val tmp = new Path(root, s"_compact_tmp_g$gen")
    fs.delete(tmp, true)
    // inputs still exist while the snapshot derives from them; they are
    // deleted only after the rename commits the snapshot
    merge(inputs.map(_.toString).toSeq)
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val mf = fs.create(new Path(tmp, "_folded"), true)
    mf.write(inputs.map(_.getName).mkString("\n").getBytes("UTF-8"))
    mf.close()
    val snapshot = new Path(root, s"batch=compacted_g$gen")
    if (!fs.rename(tmp, snapshot))
      sys.error(s"SnapshotStore.compact: rename $tmp -> $snapshot failed")
    // commit point: the marker, not the rename (see class doc — on
    // object stores the "rename" is a copy and can be left partial)
    fs.create(new Path(snapshot, "_committed"), true).close()
    inputs.foreach(p => fs.delete(p, true))
  }

  /** Finish any interrupted compaction: drop uncommitted temp dirs,
    * drop snapshot dirs missing the `_committed` marker (a non-atomic
    * object-store rename can be left partial — their inputs still
    * exist, so deletion is the safe direction), and delete input
    * partitions that a COMMITTED snapshot's `_folded` manifest records
    * as already merged. Idempotent. */
  def recover(fs: FileSystem, root: Path): Unit = {
    if (!fs.exists(root)) return
    val entries = fs.listStatus(root)
    entries.filter(s => s.isDirectory && s.getPath.getName.startsWith("_compact_tmp_g"))
      .foreach(s => fs.delete(s.getPath, true))
    entries.filter(s => s.isDirectory && s.getPath.getName.startsWith("batch=compacted_g"))
      .foreach { snap =>
        val manifest = new Path(snap.getPath, "_folded")
        if (!fs.exists(new Path(snap.getPath, "_committed"))) {
          fs.delete(snap.getPath, true)
        } else if (fs.exists(manifest)) {
          val in = fs.open(manifest)
          val folded = try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
          finally in.close()
          folded.filter(n => n.nonEmpty && n != snap.getPath.getName)
            .foreach(n => fs.delete(new Path(root, n), true))
        }
      }
  }
}
