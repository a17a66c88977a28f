package graft.streaming

import graft.SparkTestBase
import graft.streaming.StatefulSessions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** flatMapGroupsWithState sessionizer: sessions close on gap within a
  * batch and on event-time timeout across batches. */
class StatefulSessionsSpec extends SparkTestBase {
  import spark.implicits._

  private def ms(s: String) = java.sql.Timestamp.valueOf(s).getTime

  test("in-batch gap closes a session with correct aggregates") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = sessionize(spark, mem.toDS()).writeStream
      .format("memory").queryName("fs_out")
      .outputMode("append").trigger(Trigger.ProcessingTime("1 second")).start()

    mem.addData(
      Event(1L, ms("2024-01-01 00:00:00"), 1.0),
      Event(1L, ms("2024-01-01 00:10:00"), 2.0),
      // 40 min gap → closes the first session in-batch
      Event(1L, ms("2024-01-01 00:50:00"), 5.0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("fs_out").as[ClosedSession].collect()
    assert(rows.length == 1)
    val s = rows.head
    assert(s.userId == 1L && s.nEvents == 2 && s.sumValue == 3.0)
    assert(s.startMs == ms("2024-01-01 00:00:00") && s.endMs == ms("2024-01-01 00:10:00"))
  }

  test("late event older than the open session by more than the gap becomes its own session") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = sessionize(spark, mem.toDS()).writeStream
      .format("memory").queryName("fs_late")
      .outputMode("append").trigger(Trigger.ProcessingTime("1 second")).start()

    mem.addData(Event(1L, ms("2024-01-01 12:00:00"), 1.0), Event(1L, ms("2024-01-01 12:10:00"), 2.0))
    q.processAllAvailable()
    // within the 1h watermark but >30min before the session start:
    // must NOT merge into (and pollute) the 12:00 session
    mem.addData(Event(1L, ms("2024-01-01 11:15:00"), 50.0))
    q.processAllAvailable()
    mem.addData(Event(2L, ms("2024-01-01 20:00:00"), 0.0)) // close everything
    q.processAllAvailable()
    mem.addData(Event(2L, ms("2024-01-01 23:00:00"), 0.0)) // fire timeouts
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("fs_late").as[ClosedSession].collect().filter(_.userId == 1L)
      .sortBy(_.startMs)
    assert(rows.length == 2, rows.mkString(","))
    assert(rows(0).nEvents == 1 && rows(0).sumValue == 50.0 && rows(0).startMs == ms("2024-01-01 11:15:00"))
    assert(rows(1).nEvents == 2 && rows(1).sumValue == 3.0 && rows(1).startMs == ms("2024-01-01 12:00:00"))
  }

  test("event-time timeout closes idle sessions across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = sessionize(spark, mem.toDS()).writeStream
      .format("memory").queryName("fs_out2")
      .outputMode("append").trigger(Trigger.ProcessingTime("1 second")).start()

    mem.addData(Event(7L, ms("2024-01-01 00:00:00"), 4.0))
    q.processAllAvailable()
    // push the watermark far past user 7's last event + gap
    mem.addData(Event(8L, ms("2024-01-01 06:00:00"), 1.0))
    q.processAllAvailable()
    mem.addData(Event(8L, ms("2024-01-01 07:30:00"), 1.0)) // advance again to fire timeouts
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("fs_out2").as[ClosedSession].collect().filter(_.userId == 7L)
    assert(rows.length == 1)
    assert(rows.head.nEvents == 1 && rows.head.sumValue == 4.0)
  }
}
