package graft.lake

/** Lake directory layout. Mirrors the reference's storage design
  * (`/root/reference/serverless_datalake/serverless_datalake_stack.py:144`:
  * one object-store prefix per source) as Hive-style partition dirs,
  * which Catalyst prunes before listing at any scale.
  *
  *  - `bronze/` — raw ingested objects as arrived (gzip JSON), laid out
  *    `bronze/<source>/<object>`; the source is carried by the path,
  *    exactly like the reference's S3 key prefix.
  *  - `lake/` — canonical parquet, `partitionBy(source)`.
  *  - `catalog/` — the queryable metadata table (O6/O7/O11),
  *    `partitionBy(source)` so the replay range scan prunes to one
  *    partition like DynamoDB's partition-key equality.
  *  - `distribution/` — per-source fan-out area (the SNS-topic
  *    equivalent, `serverless_datalake_stack.py:233-248`); subscribers
  *    are just readers of `distribution/source=<s>/`.
  */
final case class Layout(root: String) {
  val bronzeDir: String = s"$root/bronze"
  val lakeDir: String = s"$root/lake"
  val catalogDir: String = s"$root/catalog"
  val distributionDir: String = s"$root/distribution"
  val checkpointDir: String = s"$root/_checkpoints"

  def bronzeSourceDir(source: String): String = s"$bronzeDir/$source"
}

/** Small-file compaction for the lake's partition dirs — streaming
  * ingest at a 60 s trigger writes one file per micro-batch per
  * source; over days that is thousands of small files per partition,
  * and at 100 TB the file-listing + per-file open cost dominates
  * scans. Compaction rewrites a partition to `targetFiles` files;
  * readers see the change atomically at the partition-dir level
  * (overwrite of one `source=` dir). */
object Compaction {
  import org.apache.spark.sql.SparkSession

  def compactSource(spark: SparkSession, layout: Layout, source: String,
      targetFiles: Int = 1): Long = {
    val dir = s"${layout.distributionDir}/source=$source"
    val df = spark.read.format("json").load(dir)
    val n = df.count()
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    val tmpF = new java.io.File(s"$dir.__compacting")
    val bak = new java.io.File(s"$dir.__old")
    // clear leftovers of a crashed prior run BEFORE writing, so the
    // renames below cannot fail against stale targets
    if (tmpF.exists()) rm(tmpF)
    if (bak.exists()) rm(bak)
    df.coalesce(targetFiles).write.mode("overwrite").format("json").save(tmpF.toString)
    val fs = new java.io.File(dir)
    // every rename is checked: on failure the original data is intact
    // (or restorable from the backup) and we fail loudly — the one
    // unrecoverable mistake would be deleting the backup after a
    // failed swap-in.
    if (!fs.renameTo(bak))
      throw new java.io.IOException(s"compaction: cannot move $dir aside")
    if (!tmpF.renameTo(fs)) {
      bak.renameTo(fs) // restore
      throw new java.io.IOException(s"compaction: cannot swap in compacted $dir")
    }
    rm(bak)
    n
  }
}
