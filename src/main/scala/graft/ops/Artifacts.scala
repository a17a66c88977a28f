package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Cross-JVM derived-index artifacts (the near-dup pair table, the IVF
  * coarse assignment): corpus-fingerprint-keyed parquet dirs under a
  * SHARED root — unlike the oracle exports, which isolate per run
  * because DuckDB globs them, these exist precisely to be reused by
  * later JVMs over the same corpus.
  *
  * Commit protocol (two builders may race): build into a private
  * `<dir>.tmp-<uuid>`, then ATOMIC directory rename onto the final
  * path. Exactly one rename wins; the loser observes the winner's
  * committed artifact (same corpus ⇒ same deterministic content) and
  * discards its temp. A crashed build leaves only an invisible temp
  * dir; a `_SUCCESS`-less final dir (pre-protocol crash) is replaced. */
private[ops] object Artifacts {

  def commit(spark: SparkSession, exportDir: String)
      (write: String => Unit): String = {
    val dir = new Path(exportDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new Path(exportDir, "_SUCCESS")
    if (fs.exists(marker)) return exportDir
    val tmp = new Path(exportDir + ".tmp-" + java.util.UUID.randomUUID().toString.take(8))
    write(tmp.toString)
    // a committed dir carries the parquet committer's _SUCCESS; a dir
    // WITHOUT one is a crashed builder's leftover and is replaced.
    // rename is only attempted onto an ABSENT dst (Hadoop rename onto
    // an existing directory nests src inside it on some FS impls).
    if (!fs.exists(marker) && fs.exists(dir)) fs.delete(dir, true)
    val renamed = !fs.exists(dir) && fs.rename(tmp, dir)
    if (!renamed && fs.exists(tmp)) fs.delete(tmp, true) // lost the race — winner's is equal
    // self-heal the rename-race pollution case: a temp nested INSIDE
    // the winner's dir would otherwise be read as extra parquet files
    val nested = new Path(dir, tmp.getName)
    if (fs.exists(nested)) fs.delete(nested, true)
    if (!fs.exists(marker))
      throw new java.io.IOException(s"artifact commit failed for $exportDir")
    exportDir
  }
}
