package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamScd2Spec extends SparkTestBase {

  private def sampledEvents(): Seq[StreamScd2.Ev] =
    graft.Tables.events(spark, sfDir)
      .filter(col("user_id") % 50 === 0)
      .selectExpr("user_id", "event_id", "unix_millis(ts) AS ts_ms", "event_type")
      .collect()
      .map(r => StreamScd2.Ev(r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(e => (e.tsMs, e.eventId))

  test("streamed closed intervals == the batch SCD2 query's closed rows") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evs = sampledEvents()
    assert(evs.nonEmpty)
    // split mid-timeline: runs spanning the boundary must close correctly
    val cut = evs(evs.length / 2).tsMs
    val mem = MemoryStream[StreamScd2.Ev]
    val out = StreamScd2.intervals(spark, mem.toDS())
    val q = out.writeStream.format("memory").queryName("scd2_out")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("scd2-ckpt")).start()
    mem.addData(evs.filter(_.tsMs <= cut): _*)
    q.processAllAvailable()
    mem.addData(evs.filter(_.tsMs > cut): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("scd2_out").collect()
      .map(r => (r.getAs[Long]("userId"), r.getAs[String]("state"),
        r.getAs[Long]("validFromMs"), r.getAs[Long]("validToMs"), r.getAs[Long]("nEvents")))
      .sortBy(t => (t._1, t._3)).toSeq
    val batch = graft.ops.EventOps.scd2Intervals(spark, sfDir).collect()
      .filter(r => !r.isNullAt(r.fieldIndex("valid_to_ms")))
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("state"),
        r.getAs[Long]("valid_from_ms"), r.getAs[Long]("valid_to_ms"),
        r.getAs[Long]("n_events")))
      .sortBy(t => (t._1, t._3)).toSeq
    assert(streamed == batch,
      s"stream/batch divergence\nstreamed: ${streamed.take(5)}…\nbatch:    ${batch.take(5)}…")
  }

  test("open runs stay in state: total streamed+open events cover the log") {
    val evs = sampledEvents()
    // pure-function replay: drive onUser directly per user in one pass
    val closedByFn = evs.groupBy(_.userId).toSeq.flatMap { case (u, es) =>
      val state = new TestGroupState[StreamScd2.RunState]
      StreamScd2.onUser(u, es.iterator, state).toSeq.map(_.nEvents) ++
        state.value.map(_.nEvents)
    }
    assert(closedByFn.sum == evs.length.toLong)
  }

  /** Minimal GroupState stub for driving the pure transition function. */
  private class TestGroupState[S] extends org.apache.spark.sql.streaming.GroupState[S] {
    var value: Option[S] = None
    override def exists: Boolean = value.isDefined
    override def get: S = value.get
    override def getOption: Option[S] = value
    override def update(s: S): Unit = value = Some(s)
    override def remove(): Unit = value = None
    override def hasTimedOut: Boolean = false
    override def setTimeoutDuration(d: Long): Unit = ()
    override def setTimeoutDuration(d: String): Unit = ()
    override def setTimeoutTimestamp(t: Long): Unit = ()
    override def setTimeoutTimestamp(t: Long, additional: String): Unit = ()
    override def setTimeoutTimestamp(t: java.sql.Date): Unit = ()
    override def setTimeoutTimestamp(t: java.sql.Date, additional: String): Unit = ()
    override def getCurrentWatermarkMs(): Long = 0L
    override def getCurrentProcessingTimeMs(): Long = 0L
  }
}
