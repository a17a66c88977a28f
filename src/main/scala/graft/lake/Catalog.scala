package graft.lake

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One catalog row per ingested data object — the engine's equivalent
  * of the reference's DynamoDB table (partition key `Source`, sort key
  * `Timestamp`, attribute `Key`;
  * `/root/reference/serverless_datalake/serverless_datalake_stack.py:63-77`,
  * rows built at `/root/reference/src/event_recorder/lambda_function.py:16-31`).
  *
  * Semantics preserved (SURVEY.md §2.3):
  *  - `ts` is ARRIVAL time (the reference uses SQS SentTimestamp, not
  *    event time); `tsRaw` keeps the reference's 13-digit epoch-millis
  *    string for bit-compatibility with its lexicographic BETWEEN.
  *  - append-only; replay never appends (enforced in [[Replay]]).
  *
  * Semantics fixed: range comparison is native TimestampType, not
  * string comparison (identical results for 13-digit-era strings).
  */
final case class CatalogEntry(source: String, ts: java.sql.Timestamp, tsRaw: String, key: String)

object Catalog {

  /** O6+O7: project (source, ts, key) and append to the catalog table.
    * The write is distributed and uncapped (the reference's DynamoDB
    * 25-item batch cap and its silent drop of unprocessed items have
    * no equivalent here), and the layout gives replay partition
    * pruning on source.
    *
    * CONCURRENT-WRITER SAFE via a manifest-log commit (the reference
    * gets per-item atomicity from DynamoDB; a naive
    * `mode("append")` does not — two Spark jobs appending to one
    * directory share the `_temporary` committer staging dir, and
    * either job's cleanup can delete the other's in-flight files):
    *
    *  1. STAGE — the batch is written with the normal committer into a
    *     private `_staged/<uuid>/` dir (underscore-prefixed: invisible
    *     to every parquet reader of the catalog root), so concurrent
    *     appends never share committer state.
    *  2. CLAIM — the writer claims the next commit id by atomically
    *     creating `_log/<seq>.commit` (create-no-overwrite; atomic on
    *     HDFS, the standard claim primitive) and records the staged
    *     uuid + the file list inside it.
    *  3. PUBLISH — each staged file is renamed into its live
    *     `source=X/` partition dir under the collision-free name
    *     `c<seq>-<origname>`. File renames are atomic, so a reader
    *     sees only whole files; rows of one batch are independent
    *     catalog facts, so batch-level atomicity is not required —
    *     a concurrent reader sees a prefix of the commit, never a
    *     torn file.
    *  4. DONE — `_log/<seq>.done` marks the publish complete; only
    *     then is the staging dir deleted. A crash between CLAIM and
    *     DONE is finished (never re-done) by [[recoverAppends]] from
    *     the commit record. A crash before CLAIM leaves an orphan
    *     staging dir that readers can never see; recoverAppends sweeps
    *     staging dirs not named by any commit record. */
  def append(spark: SparkSession, layout: Layout, entries: Dataset[CatalogEntry]): Unit = {
    val fs = new org.apache.hadoop.fs.Path(layout.catalogDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val uuid = java.util.UUID.randomUUID().toString
    val stage = new org.apache.hadoop.fs.Path(s"${layout.catalogDir}/_staged/$uuid")
    entries.toDF()
      .write.mode("overwrite")
      .partitionBy("source")
      .parquet(stage.toString)
    // relative staged data-file paths, e.g. source=clicks/part-0000….parquet
    val staged = stagedFiles(fs, stage)
    if (staged.isEmpty) { fs.delete(stage, true); return }
    val seq = claimCommit(fs, layout, uuid, staged)
    publish(fs, layout, uuid, seq, staged)
  }

  private[lake] def stagedFiles(fs: org.apache.hadoop.fs.FileSystem,
      stage: org.apache.hadoop.fs.Path): Seq[String] =
    fs.listStatus(stage)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("source="))
      .flatMap(d => fs.listStatus(d.getPath)
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        .map(f => s"${d.getPath.getName}/${f.getPath.getName}"))
      .toSeq.sorted

  private def logDir(layout: Layout) = s"${layout.catalogDir}/_log"

  /** Atomically claim the next commit sequence number by creating its
    * `.commit` record with overwrite=false; on contention, re-list and
    * retry at the next number. The record body names the staged uuid
    * and every file the commit publishes — enough for recovery to
    * finish the publish exactly. */
  private[lake] def claimCommit(fs: org.apache.hadoop.fs.FileSystem, layout: Layout,
      uuid: String, staged: Seq[String]): Long = {
    val dir = new org.apache.hadoop.fs.Path(logDir(layout))
    fs.mkdirs(dir)
    var attempts = 0
    while (attempts < 10000) {
      // checkpoints count in the numbering scan: after pruneLog drops
      // folded .commit records, the checkpoint seq is the only trace
      // of them — ignoring it would re-issue a used commit id
      val next = 1L + fs.listStatus(dir)
        .map(_.getPath.getName)
        .collect {
          case n if n.endsWith(".commit") => n.stripSuffix(".commit").toLong
          case n if n.endsWith(".checkpoint") => n.stripSuffix(".checkpoint").toLong
        }
        .foldLeft(0L)(math.max)
      val rec = new org.apache.hadoop.fs.Path(dir, f"$next%020d.commit")
      try {
        val out = fs.create(rec, false) // claim: atomic create-no-overwrite
        try out.write((uuid +: staged).mkString("\n").getBytes("UTF-8"))
        finally out.close()
        return next
      } catch {
        case _: java.io.IOException => attempts += 1 // lost the race; renumber
      }
    }
    sys.error("Catalog.append: could not claim a commit id after 10000 attempts")
  }

  /** Rename staged files into the live partition dirs under their
    * commit-prefixed names, then mark the commit done and drop the
    * staging dir. Idempotent: skips files already published (so
    * recovery can re-drive it). */
  private[lake] def publish(fs: org.apache.hadoop.fs.FileSystem, layout: Layout,
      uuid: String, seq: Long, staged: Seq[String]): Unit = {
    val stage = new org.apache.hadoop.fs.Path(s"${layout.catalogDir}/_staged/$uuid")
    staged.foreach { rel =>
      val slash = rel.indexOf('/')
      val (part, name) = (rel.substring(0, slash), rel.substring(slash + 1))
      val src = new org.apache.hadoop.fs.Path(stage, rel)
      val dstDir = new org.apache.hadoop.fs.Path(s"${layout.catalogDir}/$part")
      val dst = new org.apache.hadoop.fs.Path(dstDir, f"c$seq%020d-$name")
      if (!fs.exists(dst)) {
        fs.mkdirs(dstDir)
        if (!fs.rename(src, dst) && !fs.exists(dst))
          throw new java.io.IOException(s"catalog publish failed: $src -> $dst")
      }
    }
    fs.create(new org.apache.hadoop.fs.Path(logDir(layout), f"$seq%020d.done"), true).close()
    fs.delete(stage, true)
  }

  /** Finish or sweep interrupted appends: commits with a `.commit`
    * record but no `.done` marker are re-driven from the record
    * (publish is idempotent — already-renamed files are skipped);
    * staging dirs named by no commit record are orphans from a crash
    * before CLAIM and are deleted. Idempotent; run from maintenance,
    * like [[graft.streaming.SnapshotStore.recover]]. */
  def recoverAppends(spark: SparkSession, layout: Layout): Unit = {
    val fs = new org.apache.hadoop.fs.Path(layout.catalogDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val log = new org.apache.hadoop.fs.Path(logDir(layout))
    var claimed = Set.empty[String]
    if (fs.exists(log)) {
      val entries = fs.listStatus(log).map(_.getPath.getName)
      val done = entries.filter(_.endsWith(".done")).map(_.stripSuffix(".done")).toSet
      entries.filter(_.endsWith(".commit")).sorted.foreach { rec =>
        val seqStr = rec.stripSuffix(".commit")
        val in = fs.open(new org.apache.hadoop.fs.Path(log, rec))
        val lines = try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
        finally in.close()
        val uuid = lines.head
        claimed += uuid
        if (!done.contains(seqStr))
          publish(fs, layout, uuid, seqStr.toLong, lines.tail)
      }
    }
    val stagedRoot = new org.apache.hadoop.fs.Path(s"${layout.catalogDir}/_staged")
    if (fs.exists(stagedRoot))
      fs.listStatus(stagedRoot).map(_.getPath)
        .filterNot(p => claimed.contains(p.getName))
        .foreach(p => fs.delete(p, true))
  }

  /** Derive catalog entries for a batch of ingested records that carry
    * `source` + `key` (object path) columns; arrival time is stamped
    * once per batch (the micro-batch is the unit of arrival, like the
    * reference's SQS delivery). */
  def entriesFor(batch: DataFrame, arrivalMs: Long): Dataset[CatalogEntry] = {
    import batch.sparkSession.implicits._
    batch.select(col("source"), col("key")).distinct()
      .withColumn("ts", timestamp_millis(lit(arrivalMs)))
      .withColumn("tsRaw", lit(arrivalMs.toString))
      .select(col("source"), col("ts"), col("tsRaw"), col("key"))
      .as[CatalogEntry]
  }

  def load(spark: SparkSession, layout: Layout): DataFrame =
    spark.read.parquet(layout.catalogDir)

  /** Committed (fully published) catalog versions, ascending — the
    * manifest log's `.commit` records that carry a `.done` marker.
    * A crashed commit (claimed, not done) is invisible here until
    * [[recoverAppends]] finishes it, so snapshot readers never see a
    * torn commit. */
  def versions(spark: SparkSession, layout: Layout): Seq[Long] =
    logEntries(spark, layout).map(_._1).distinct.sorted

  /** Fold the committed log prefix into ONE checkpoint record — the
    * Delta-style log checkpoint: at thousands of commits,
    * [[versions]]/[[loadAsOf]] would replay O(commits) tiny records;
    * after a checkpoint they read one file plus the tail. The record
    * (`_log/<seq>.checkpoint`) lists every (commit seq, live file)
    * pair for committed commits ≤ seq, so snapshot reads BELOW the
    * checkpoint stay exact. Written create-no-overwrite (the
    * [[claimCommit]] claim primitive), so concurrent checkpointers
    * collapse to one winner; [[pruneLog]] may then drop the folded
    * `.commit`/`.done` records. Returns the checkpointed seq (None on
    * an empty log). */
  def checkpoint(spark: SparkSession, layout: Layout): Option[Long] = {
    val fs = new org.apache.hadoop.fs.Path(layout.catalogDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = logEntries(spark, layout)
    if (entries.isEmpty) return None
    val upTo = entries.map(_._1).max
    val rec = new org.apache.hadoop.fs.Path(logDir(layout), f"$upTo%020d.checkpoint")
    if (fs.exists(rec)) return Some(upTo)
    val body = entries.sortBy(e => (e._1, e._2))
      .map { case (seq, live) => s"$seq $live" }.mkString("\n")
    try {
      val out = fs.create(rec, false)
      try out.write(body.getBytes("UTF-8")) finally out.close()
    } catch { case _: java.io.IOException => /* concurrent winner */ }
    Some(upTo)
  }

  /** Drop `.commit`/`.done` records already folded into a checkpoint —
    * the log-growth bound. Only records ≤ the LATEST checkpoint seq
    * are removable; the checkpoint itself carries their history. */
  def pruneLog(spark: SparkSession, layout: Layout): Long = {
    val fs = new org.apache.hadoop.fs.Path(layout.catalogDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val log = new org.apache.hadoop.fs.Path(logDir(layout))
    if (!fs.exists(log)) return 0L
    val names = fs.listStatus(log).map(_.getPath.getName)
    val cps = names.filter(_.endsWith(".checkpoint"))
      .map(_.stripSuffix(".checkpoint").toLong)
    if (cps.isEmpty) return 0L
    val upTo = cps.max
    val done = names.filter(_.endsWith(".done")).map(_.stripSuffix(".done")).toSet
    var dropped = 0L
    names.foreach { n =>
      val isCommit = n.endsWith(".commit"); val isDone = n.endsWith(".done")
      if (isCommit || isDone) {
        val seq = n.stripSuffix(".commit").stripSuffix(".done").toLong
        // never prune a claimed-but-unfinished commit: recovery needs it
        if (seq <= upTo && done.contains(f"$seq%020d")) {
          fs.delete(new org.apache.hadoop.fs.Path(log, n), false)
          dropped += 1
        }
      }
    }
    dropped
  }

  /** Every committed (seq, live-file) pair: the latest checkpoint's
    * history plus the committed `.commit` tail above it. Live paths
    * are relative (`source=X/c<seq>-name`). */
  private def logEntries(spark: SparkSession, layout: Layout): Seq[(Long, String)] = {
    val fs = new org.apache.hadoop.fs.Path(layout.catalogDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val log = new org.apache.hadoop.fs.Path(logDir(layout))
    if (!fs.exists(log)) return Seq.empty
    val names = fs.listStatus(log).map(_.getPath.getName)
    val cps = names.filter(_.endsWith(".checkpoint"))
      .map(_.stripSuffix(".checkpoint").toLong)
    def readLines(p: org.apache.hadoop.fs.Path): List[String] = {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
    }
    val (cpSeq, cpEntries) =
      if (cps.isEmpty) (0L, Seq.empty[(Long, String)])
      else {
        val top = cps.max
        val lines = readLines(new org.apache.hadoop.fs.Path(log, f"$top%020d.checkpoint"))
        (top, lines.filter(_.nonEmpty).map { l =>
          val sp = l.indexOf(' '); (l.substring(0, sp).toLong, l.substring(sp + 1))
        })
      }
    val done = names.filter(_.endsWith(".done")).map(_.stripSuffix(".done")).toSet
    val tail = names
      .filter(n => n.endsWith(".commit") && done.contains(n.stripSuffix(".commit")))
      .map(_.stripSuffix(".commit").toLong).filter(_ > cpSeq).sorted
      .flatMap { seq =>
        val padded = f"$seq%020d"
        readLines(new org.apache.hadoop.fs.Path(log, s"$padded.commit")).tail
          .map { rel =>
            val slash = rel.indexOf('/')
            (seq, s"${rel.substring(0, slash)}/c$padded-${rel.substring(slash + 1)}")
          }
      }
    cpEntries ++ tail
  }

  /** Time travel: the catalog exactly as of commit `version` — the
    * Delta/Iceberg `VERSION AS OF` read, reconstructed from the
    * manifest log rather than a directory listing (so a concurrent
    * writer's in-flight files are invisible regardless of rename
    * timing). Each qualifying `.commit` record names its published
    * files; the snapshot is the union of those file lists for
    * committed versions ≤ `version`, read with the catalog root as
    * basePath so `source` partition pruning still applies.
    *
    * Scale: the log is one tiny record per commit (driver-side list,
    * O(commits) — the same order as Delta's log replay); the data
    * read is a normal pruned parquet scan. */
  def loadAsOf(spark: SparkSession, layout: Layout, version: Long): DataFrame = {
    val paths = logEntries(spark, layout)
      .filter(_._1 <= version)
      .map { case (_, live) => s"${layout.catalogDir}/$live" }
    if (paths.isEmpty)
      spark.emptyDataFrame
    else
      spark.read.option("basePath", layout.catalogDir).parquet(paths: _*)
  }

  /** O11: `Source = s AND ts BETWEEN t0 AND t1`. Equality on the
    * partition column prunes directories (DynamoDB partition-key
    * equality); the range predicate pushes into parquet row-group
    * min/max stats (sort-key BETWEEN). Storage-side pruning at any SF. */
  def rangeQuery(spark: SparkSession, layout: Layout, source: String,
      t0: java.sql.Timestamp, t1: java.sql.Timestamp): DataFrame =
    load(spark, layout)
      .filter(col("source") === source && col("ts").between(t0, t1))
}
