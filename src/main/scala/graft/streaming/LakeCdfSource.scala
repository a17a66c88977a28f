package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import graft.lake.{Catalog, Layout}

/** STREAMING SOURCE over the lake's change data feed — the
  * Delta-streaming-source shape as a first-class Spark source:
  * `spark.readStream.format("graft-lake-cdf").option("root", …)` (or
  * the provider class name) yields an unbounded stream of row-level
  * changes (`_change_type` insert|delete, `_commit_version`) driven
  * entirely by the manifest log.
  *
  * Exactly-once: offsets ARE committed versions. `getOffset` reports
  * the log head; `getBatch(start, end)` is
  * [[Catalog.lakeChangesBetween]] over `(start, end]` — a pure
  * function of the immutable log + data files, so the engine's
  * checkpoint replay after a crash re-derives the identical batch and
  * a committed batch is never re-delivered. No state beyond the
  * engine's own offset log.
  *
  * Schema is DECLARED ONCE at stream start (the current snapshot's
  * payload columns + the two feed columns) and every batch is
  * projected onto it — columns added by a later schema evolution are
  * invisible to a running stream (restart to pick them up; the Delta
  * source makes the same call). `startingVersion` (default 0) skips
  * history already consumed elsewhere.
  *
  * Inherits the feed's erasure posture: rewrite commits contribute
  * nothing, and ranges whose files were vacuumed fail LOUD rather
  * than silently dropping changes. */
class LakeCdfSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-lake-cdf"

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) =
    (shortName(), schema.getOrElse(LakeCdfSource.schemaFor(sqlContext, parameters)))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val layout = LakeCdfSource.layoutOf(parameters)
    val from = LakeCdfSource.persistedStart(sqlContext, metadataPath,
      LakeCdfSource.startingVersionOf(sqlContext, parameters, layout))
    val maxPerTrigger = parameters.get("maxversionspertrigger")
      .orElse(parameters.get("maxVersionsPerTrigger")).map(_.toLong)
    maxPerTrigger.foreach(k => require(k >= 1,
      s"graft-lake-cdf: maxVersionsPerTrigger must be >= 1, got $k"))
    new LakeCdfSource(sqlContext, layout,
      schema.getOrElse(LakeCdfSource.schemaFor(sqlContext, parameters)), from,
      maxPerTrigger)
  }
}

object LakeCdfSource {
  /** Streaming options → layout: `root` is the catalog root; the
    * optional `table` addresses a created table's own layout
    * (`<root>/_tables/<table>` — the [[graft.sql.GraftCatalog]]
    * convention), so every table a SQL user creates is streamable by
    * name. Shared by the CDF source, the plain-rows source and the
    * sink. */
  private[streaming] def layoutOf(parameters: Map[String, String]): Layout = {
    val root = parameters.getOrElse("root",
      throw new IllegalArgumentException(
        "graft-lake streaming: option 'root' (the layout root) is required"))
    parameters.get("table").orElse(parameters.get("Table"))
      // validated name → layout: the identifier rule also blocks a
      // crafted option("table", "../..") from escaping the _tables
      // namespace (review catch)
      .map(t => graft.sql.GraftAddress.tableLayout(root, t))
      .getOrElse(Layout(root))
  }

  /** `startingVersion` / `startingTimestamp` → the stream's starting
    * version (EXCLUSIVE lower bound: the stream emits versions
    * strictly above it). A timestamp resolves through
    * [[Catalog.versionAtTimestamp]] — Delta-parity wiring: the as-of
    * version at the timestamp is where history "had already happened",
    * so everything after it streams. A timestamp below the first
    * commit streams everything; one that falls in PRUNED history
    * refuses LOUD inside versionAtTimestamp (below-checkpoint commits
    * are no longer timestamp-addressable — silently starting at the
    * fold would drop changes the caller asked for). Accepts epoch
    * millis, SQL timestamp (`yyyy-MM-dd HH:mm:ss[.f]`, parsed as UTC
    * explicitly — `Timestamp.valueOf` would bind it to the driver's
    * default zone, review catch), or ISO-8601 instant.
    *
    * Returns a THUNK, and option/format validation happens here
    * (eagerly, at stream construction) while the version RESOLUTION
    * is deferred to first use: a RESTARTING stream recovers its
    * position from checkpointed offsets and never consults the
    * starting option (the Delta contract) — an eager resolve would
    * permanently brick a restart once routine log maintenance (this
    * round's auto-checkpoint folds included) prunes history below
    * the original timestamp (review catch). */
  private[streaming] def startingVersionOf(sqlContext: SQLContext,
      parameters: Map[String, String], layout: Layout): () => Long = {
    def opt(name: String): Option[String] =
      parameters.get(name).orElse(parameters.get(name.toLowerCase))
    val sv = opt("startingVersion")
    val st = opt("startingTimestamp")
    require(sv.isEmpty || st.isEmpty, "graft-lake streaming: set " +
      "startingVersion OR startingTimestamp, not both")
    st match {
      case None =>
        val v = sv.map(_.toLong).getOrElse(0L)
        () => v
      case Some(raw) =>
        val ms = raw.trim.toLongOption.getOrElse {
          try java.time.LocalDateTime
            .parse(raw.trim.replace(' ', 'T'))
            .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
          catch { case _: java.time.format.DateTimeParseException =>
            java.time.Instant.parse(raw.trim).toEpochMilli }
        }
        () => Catalog.versionAtTimestamp(sqlContext.sparkSession, layout, ms)
          .getOrElse(0L)
    }
  }

  /** Persist the RESOLVED starting version under the source's
    * `metadataPath` (the KafkaSource/FileStreamSource pattern): the
    * engine replays `getBatch(None, end)` for batch 0 on EVERY
    * restart, so the start must come back identical — re-resolving a
    * startingTimestamp later would either throw (history pruned
    * below it — the bricked-restart failure) or resolve to a
    * DIFFERENT version (monotonized commit times can shift as the
    * tail grows), silently changing what batch 0 meant. First start
    * resolves and writes once (temp + rename, concurrent winner
    * read back); every restart reads the persisted value and never
    * consults the option again. */
  private[streaming] def persistedStart(sqlContext: SQLContext,
      metadataPath: String, resolve: () => Long): () => Long = () => {
    val dir = new org.apache.hadoop.fs.Path(metadataPath)
    val p = new org.apache.hadoop.fs.Path(dir, "graft-start")
    val fs = p.getFileSystem(
      sqlContext.sparkSession.sparkContext.hadoopConfiguration)
    // ONLY FileNotFoundException means "absent" — any other
    // IOException must propagate (second-pass review catch):
    // swallowing a transient read failure here would silently
    // RE-RESOLVE the starting option, which either bricks the restart
    // (timestamp pruned) or quietly changes what batch 0 means; a
    // loud failure lets the stream's own restart policy retry the
    // read instead
    def read(): Option[Long] =
      try {
        val in = fs.open(p)
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
          .toLongOption
        finally in.close()
      } catch { case _: java.io.FileNotFoundException => None }
    read().getOrElse {
      val v = resolve()
      fs.mkdirs(dir)
      val tmp = new org.apache.hadoop.fs.Path(dir,
        s"graft-start.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
      val out = fs.create(tmp, true)
      try out.write(v.toString.getBytes("UTF-8")) finally out.close()
      if (fs.rename(tmp, p)) v
      else { fs.delete(tmp, false); read().getOrElse(v) } // winner kept
    }
  }

  /** The stream's declared schema: current committed payload columns
    * (evolution merged as of NOW) + the feed columns. */
  def schemaFor(sqlContext: SQLContext, parameters: Map[String, String]): StructType = {
    val layout = layoutOf(parameters)
    val snap = Catalog.loadLakeSnapshot(sqlContext.sparkSession, layout)
    require(snap.columns.nonEmpty,
      "graft-lake-cdf: the lake has no committed files yet — commit first " +
        "or pass an explicit schema")
    snap.schema.add("_commit_version", LongType).add("_change_type", StringType)
  }
}

class LakeCdfSource(sqlContext: SQLContext, layout: Layout,
    declaredSchema: StructType, startVersionThunk: () => Long,
    maxVersionsPerTrigger: Option[Long] = None) extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.{streaming => cstream}

  override def schema: StructType = declaredSchema

  /** Resolved on FIRST USE through [[LakeCdfSource.persistedStart]]:
    * a fresh start resolves the starting option once and persists the
    * result under the stream's metadata path; every restart reads the
    * persisted value back — so a startingTimestamp whose history was
    * later pruned can never brick a restart, and the engine's batch-0
    * replay (`getBatch(None, end)` on every restart) always means the
    * same range. */
  private lazy val startVersion: Long = startVersionThunk()

  /** `Trigger.AvailableNow` terminal: the head captured at start-up —
    * the drain target. Without [[cstream.SupportsTriggerAvailableNow]]
    * the engine wraps a v1 source with a ONE-SHOT offset fetch, and a
    * rate-limited source would report one capped window and be declared
    * drained (losing the rest of the backlog); implementing the trait
    * (the `FileStreamSource` shape — the same v1-source + admission-
    * control combination) makes the engine loop batches to this cap. */
  private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(Catalog.resolvedHead(sqlContext.sparkSession, layout))

  /** RATE LIMITING (`maxVersionsPerTrigger`): at 100 TB a cold start —
    * or a consumer catching up after downtime — must not serve the
    * whole backlog as ONE micro-batch (one giant scan, one giant
    * checkpoint state delta, no progress marks). The engine drives
    * admission through [[latestOffset]] with the PREVIOUS end offset,
    * so the cap is `start + k` versions, sliced exactly on commit
    * boundaries — correctness untouched (each `(start, end]` range is
    * exact), restart pacing from the offset log by construction.
    * Uncapped by default, like Delta. */
  override def getDefaultReadLimit: cstream.ReadLimit =
    maxVersionsPerTrigger.map(k => cstream.ReadLimit.maxRows(k))
      .getOrElse(cstream.ReadLimit.allAvailable())

  override def latestOffset(startOffset: cstream.Offset,
      limit: cstream.ReadLimit): cstream.Offset = {
    val base = Option(startOffset).map(anyToLong).getOrElse(startVersion)
    val head0 = Catalog.resolvedHead(sqlContext.sparkSession, layout)
    val head = availableNowCap.fold(head0)(math.min(head0, _))
    val end = limit match {
      case r: cstream.ReadMaxRows => math.min(head, base + r.maxRows())
      case _ => head
    }
    if (end <= base) null else LongOffset(end)
  }

  override def reportLatestOffset(): cstream.Offset =
    LongOffset(Catalog.resolvedHead(sqlContext.sparkSession, layout))

  /** Admission-control sources are driven through [[latestOffset]];
    * the engine never calls this (the `FileStreamSource` posture). */
  override def getOffset: Option[Offset] =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead of this")

  private def anyToLong(o: cstream.Offset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other => other.json().trim.toLong
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val projected = batchFrame(
      start.map(toLong).getOrElse(startVersion), toLong(end))
    // v1 sources must hand back a STREAMING frame; the projected plan's
    // executed RDD keeps the work distributed
    org.apache.spark.sql.GraftStreamingBridge.streamingFrame(
      sqlContext, projected.queryExecution.toRdd, schema)
  }

  /** The BATCH-level frame for `(from, to]` — split out so the
    * plain-rows subclass ([[LakeRowsSource]]) can post-process before
    * the streaming wrap. */
  protected def batchFrame(from: Long, to: Long): DataFrame = {
    val changes = Catalog.lakeChangesBetween(
      sqlContext.sparkSession, layout, from, to)
    val cols = declaredSchema.fields.map { f =>
      if (changes.columns.contains(f.name)) {
        // a TYPE WIDENING committed after stream start makes the feed
        // wider than the declared schema — casting DOWN would silently
        // corrupt values past the narrow range, so refuse loud: the
        // stream must restart to pick up the widened schema (the same
        // restart contract as added columns, but a wrong-answer risk
        // rather than a missing-column one)
        val feedType = changes.schema(f.name).dataType
        if (feedType != f.dataType &&
            !org.apache.spark.sql.catalyst.expressions.Cast
              .canUpCast(feedType, f.dataType))
          throw new IllegalStateException(
            s"graft-lake-cdf: column '${f.name}' widened to " +
              s"${feedType.sql} after stream start (declared " +
              s"${f.dataType.sql}) — restart the stream from its " +
              "checkpoint to adopt the widened schema")
        col(f.name).cast(f.dataType).as(f.name)
      } else {
        // a column ABSENT from the feed is only legitimately null when
        // the feed predates its ADD; a declared name the feed lost to
        // a RENAME/DROP after stream start would null real data — the
        // same silent-corruption class as a narrow-cast, refuse loud
        val retired =
          Catalog.lakeRenamedColumns(sqlContext.sparkSession, layout, to)
            .exists(_._2 == f.name) ||
          Catalog.lakeDroppedColumns(sqlContext.sparkSession, layout, to)
            .exists(_._2 == f.name)
        if (retired) throw new IllegalStateException(
          s"graft-lake-cdf: column '${f.name}' was renamed or dropped " +
            "after stream start — restart the stream from its checkpoint " +
            "to adopt the evolved schema")
        lit(null).cast(f.dataType).as(f.name)
      }
    }
    changes.select(cols.toSeq: _*)
  }

  private def toLong(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other => other.json().trim.toLong
  }

  override def stop(): Unit = ()
}

/** PLAIN-ROWS streaming read of the lake —
  * `spark.readStream.format("graft-lake").option("root", …)`: the
  * append stream as payload rows (no feed columns), the Delta
  * streaming-table read. A consumer that just wants new rows no
  * longer needs to know the CDF's `_change_type` contract.
  *
  * Built ON the change-feed source (same offsets = committed
  * versions, same admission control / `Trigger.AvailableNow` drain,
  * same exactly-once replay), keeping ONE read path: each batch is
  * the feed's `insert` rows projected to the payload.
  *
  * DELETES REFUSE LOUD unless `ignoreDeletes=true` (Delta's source
  * contract): a range containing row-level deletes cannot be served
  * as an append-only stream — silently dropping the retractions would
  * leave every downstream aggregate permanently wrong. The check is
  * log-only ([[graft.lake.Catalog.lakeHasDeletesBetween]]): no data
  * file is opened to decide. With `ignoreDeletes=true` the consumer
  * has declared deletes irrelevant (an append-mostly table vacuumed
  * by partition — Delta's same opt-in). */
class LakeRowsSource(sqlContext: SQLContext, layout: Layout,
    payloadSchema: StructType, startVersionThunk: () => Long,
    maxVersionsPerTrigger: Option[Long], ignoreDeletes: Boolean)
    extends LakeCdfSource(sqlContext, layout,
      payloadSchema.add("_commit_version", LongType)
        .add("_change_type", StringType),
      startVersionThunk, maxVersionsPerTrigger) {

  override def schema: StructType = payloadSchema

  override protected def batchFrame(from: Long, to: Long): DataFrame = {
    if (!ignoreDeletes &&
        Catalog.lakeHasDeletesBetween(sqlContext.sparkSession, layout, from, to))
      throw new IllegalStateException(
        s"graft-lake source: versions ($from, $to] contain row-level " +
          "deletes — an append-only rows stream cannot represent them " +
          "(downstream state would silently keep deleted rows). Read " +
          "format(\"graft-lake-cdf\") to consume the retractions, or " +
          "opt in with option(\"ignoreDeletes\", \"true\")")
    super.batchFrame(from, to)
      .filter(org.apache.spark.sql.functions.col("_change_type") === "insert")
      .select(payloadSchema.fieldNames.toSeq.map(col): _*)
  }
}
