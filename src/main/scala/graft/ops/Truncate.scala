package graft.ops

import org.apache.spark.sql.DataFrame

/** Lineage truncation for iterative plans (PageRank/BFS frontiers, the
  * band-tune signature table, the MMR shortlist), with a DURABILITY
  * POSTURE FLAG:
  *
  *  - default (`spark.graft.durableTruncate` unset/false):
  *    `localCheckpoint(eager)` — partitions live in executor storage,
  *    zero extra I/O. Right for local mode and for clusters where a
  *    lost executor may fail the job (localCheckpoint severs the
  *    recompute lineage, so executor loss IS job loss).
  *  - durable (`spark.graft.durableTruncate=true`): a parquet
  *    round-trip under `spark.graft.truncateDir` (defaults to the JVM
  *    tmpdir locally; point it at job scratch on shared storage for a
  *    real cluster) — the [[Artifacts]] posture applied to iteration
  *    state: any executor can re-read it, so one executor loss
  *    mid-iteration costs a task retry, not the whole PageRank/BFS/
  *    band-tune run.
  *
  * Both paths return a frame with identical rows and a truncated
  * lineage; the flag changes fault tolerance, never results. */
object Truncate {

  /** True when the durable posture is on for this session. */
  def durable(df: DataFrame): Boolean =
    df.sparkSession.conf.get("spark.graft.durableTruncate", "false").toBoolean

  /** Truncate `df`'s lineage per the session posture. `tag` names the
    * scratch dir (uniquified per call — iterations never overwrite a
    * frame a later stage still reads). Every scratch dir is registered
    * for JVM-exit deletion (`FileSystem.deleteOnExit`), so iterative
    * callers (PageRank per 5 iters, BFS per hop, MMR per pick) cannot
    * leak dirs ACROSS runs; within a run they stay readable — a later
    * stage may still scan an earlier iteration's frame. A long-lived
    * service JVM that never exits should point `spark.graft.truncateDir`
    * at job-scoped scratch and reclaim it per job. */
  def apply(df: DataFrame, tag: String): DataFrame =
    if (!durable(df)) df.localCheckpoint(true)
    else {
      val spark = df.sparkSession
      val root = spark.conf.get("spark.graft.truncateDir",
        s"${System.getProperty("java.io.tmpdir", "/tmp")}/graft-truncate")
      val dir = s"$root/$tag-${java.util.UUID.randomUUID().toString.take(8)}"
      df.write.mode("overwrite").parquet(dir)
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).deleteOnExit(p)
      spark.read.parquet(dir)
    }
}
