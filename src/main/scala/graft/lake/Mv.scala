package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained materialized view over the committed lake,
  * fed by the manifest-log change feed ([[Catalog.lakeChangesBetween]])
  * — the downstream half of the CDC story ([[Catalog.upsertLakeByKey]]
  * and [[graft.streaming.StreamUpsert]] being the upstream half).
  *
  * The view is a per-key retractable aggregate: `n_rows` (count) and
  * `sum_v` (sum of `valueCol`, exact BIGINT). Inserts add, deletes
  * subtract, and a group whose count retracts to zero vanishes —
  * count/sum form a group under retraction, so NO base-table rescan is
  * ever needed (min/max do not; for extremum maintenance under deletes
  * see [[graft.ops.Aggregates.incrAggDelete]]'s recompute-touched-groups
  * pattern). Each [[refresh]] costs O(changes since the last refresh) +
  * O(view), independent of lake size.
  *
  * State protocol (crash-safe on any filesystem with atomic rename):
  * the view lives in `stateDir/s<version>/` parquet; a `_current`
  * pointer file names the live directory and is flipped by temp+rename
  * AFTER the new state is fully written. A crash between state write
  * and pointer flip leaves an orphan directory that the next refresh
  * sweeps; a reader never observes a half-written view.
  *
  * Concurrency: the view is SINGLE-WRITER (one refresher owns a
  * stateDir — the norm for a maintained view); concurrent READS are
  * always safe (the pointer only ever names a fully-written
  * directory). Two concurrent refreshes would race the pointer flip —
  * last writer wins with a complete, correct state, but work is
  * wasted; serialize refreshes per stateDir.
  *
  * Erasure caveat (inherited from the feed, documented there): an
  * [[Erase]] rewrite is deliberately not re-emitted as deletes, so a
  * view refreshed across an erase still counts the erased rows — call
  * [[rebuild]] after an erase to re-derive the view from the live
  * snapshot (the same obligation every external CDC consumer has). */
object Mv {

  /** Bring the view up to the lake head. Returns the version the view
    * is now at (unchanged when no new commits exist — an idempotent
    * no-op). First call bootstraps from version 0, i.e. replays the
    * full feed; prefer [[rebuild]] for the bootstrap when the feed's
    * early files may already be vacuumed. */
  def refresh(spark: SparkSession, layout: Layout, stateDir: String,
      keyCols: Seq[String], valueCol: String): Long = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val head = Catalog.headVersion(spark, layout)
    val cur = currentVersion(spark, stateDir)
    sweepOrphans(spark, stateDir, cur)
    val v0 = cur.getOrElse(0L)
    if (head <= v0) return v0
    val changes = Catalog.lakeChangesBetween(spark, layout, v0, head)
    val sign = when(col("_change_type") === "insert", 1L).otherwise(-1L)
    val delta = changes.groupBy(keyCols.map(col): _*)
      .agg(sum(sign).as("n_rows"),
        sum(sign * col(valueCol).cast("long")).as("sum_v"))
    val merged = cur match {
      case None => delta
      case Some(_) => read(spark, stateDir).unionByName(delta)
        .groupBy(keyCols.map(col): _*)
        .agg(sum(col("n_rows")).as("n_rows"), sum(col("sum_v")).as("sum_v"))
    }
    commitState(spark, stateDir,
      merged.filter(col("n_rows") =!= 0L), head)
    head
  }

  /** Re-derive the view directly from the live committed snapshot and
    * stamp it at the head version — the post-erase (or bootstrap)
    * path that needs no historical change files. */
  def rebuild(spark: SparkSession, layout: Layout, stateDir: String,
      keyCols: Seq[String], valueCol: String): Long = {
    val head = Catalog.headVersion(spark, layout)
    sweepOrphans(spark, stateDir, currentVersion(spark, stateDir))
    val snap = Catalog.loadLakeSnapshot(spark, layout, head)
    val agg =
      if (snap.columns.isEmpty)
        spark.range(0).select(
          (keyCols.map(k => lit(null).cast("string").as(k)) ++
            Seq(lit(0L).as("n_rows"), lit(0L).as("sum_v"))): _*).limit(0)
      else snap.groupBy(keyCols.map(col): _*)
        .agg(count(lit(1)).as("n_rows"),
          sum(col(valueCol).cast("long")).as("sum_v"))
    commitState(spark, stateDir, agg, head)
    head
  }

  /** The live view: `(keyCols…, n_rows, sum_v)`. Empty (no columns)
    * before the first refresh. */
  def read(spark: SparkSession, stateDir: String): DataFrame =
    currentVersion(spark, stateDir) match {
      case Some(v) => spark.read.parquet(s"$stateDir/s$v")
      case None => spark.emptyDataFrame
    }

  /** The version the view is at, None before the first refresh. */
  def currentVersion(spark: SparkSession, stateDir: String): Option[Long] = {
    val fs = fsOf(spark, stateDir)
    val p = new org.apache.hadoop.fs.Path(s"$stateDir/_current")
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val name = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
    finally in.close()
    Option(name).filter(_.startsWith("s")).map(_.stripPrefix("s").toLong)
  }

  private def commitState(spark: SparkSession, stateDir: String,
      view: DataFrame, version: Long): Unit = {
    val fs = fsOf(spark, stateDir)
    val tmp = new org.apache.hadoop.fs.Path(
      s"$stateDir/_tmp-${java.util.UUID.randomUUID().toString.take(12)}")
    view.write.mode("overwrite").parquet(tmp.toString)
    val dst = new org.apache.hadoop.fs.Path(s"$stateDir/s$version")
    if (fs.exists(dst)) fs.delete(dst, true) // re-refresh at same head
    require(fs.rename(tmp, dst), s"mv state rename failed: $tmp -> $dst")
    val ptmp = new org.apache.hadoop.fs.Path(
      s"$stateDir/_ptr-${java.util.UUID.randomUUID().toString.take(12)}")
    val out = fs.create(ptmp, true)
    try out.write(s"s$version".getBytes("UTF-8")) finally out.close()
    val ptr = new org.apache.hadoop.fs.Path(s"$stateDir/_current")
    fs.delete(ptr, false)
    require(fs.rename(ptmp, ptr), "mv pointer rename failed")
  }

  /** Drop state dirs the pointer does not reference (crash leftovers
    * and superseded versions). */
  private def sweepOrphans(spark: SparkSession, stateDir: String,
      live: Option[Long]): Unit = {
    val fs = fsOf(spark, stateDir)
    val root = new org.apache.hadoop.fs.Path(stateDir)
    if (!fs.exists(root)) return
    val keep = live.map(v => s"s$v").getOrElse("")
    fs.listStatus(root).foreach { st =>
      val n = st.getPath.getName
      if (st.isDirectory && n != keep && (n.startsWith("s") || n.startsWith("_tmp-")))
        fs.delete(st.getPath, true)
    }
  }

  private def fsOf(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
}
