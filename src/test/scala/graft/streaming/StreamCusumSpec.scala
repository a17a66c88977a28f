package graft.streaming

import graft.SparkTestBase
import graft.streaming.StreamCusum._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

class StreamCusumSpec extends SparkTestBase {

  // trusted corpus: alternating 90/110 → μ₀ = 100, σ_pop = 10,
  // so κ = 5 and h = 50 — a +1σ shift (x = 110) adds 5 per obs and
  // must alarm on the 11th shifted observation (55 > 50), then reset
  private def trainedRef: Map[String, Ref] = {
    val s = spark
    import s.implicits._
    reference(Seq.tabulate(100)(i => ("s", if (i % 2 == 0) 90L else 110L)).toDS())
  }

  // seq 1..20 stable at μ, 21..45 at μ+σ, 46..60 at μ−σ:
  // highs alarm at seq 31 and 42, the low side at seq 56
  private val obsAll: Seq[Obs] =
    (1 to 20).map(i => Obs("s", i.toLong, 100L)) ++
    (21 to 45).map(i => Obs("s", i.toLong, 110L)) ++
    (46 to 60).map(i => Obs("s", i.toLong, 90L))

  private val expectedAlarms = Set(
    ("s", 31L, "high"), ("s", 42L, "high"), ("s", 56L, "low"))

  private def runStream(batches: Seq[Seq[Obs]]): Set[(String, Long, String)] = {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = tmpDir("cusum-ckpt")
    val refs = trainedRef
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, String)]()
    val mem = MemoryStream[Obs]
    batches.foreach { b =>
      mem.addData(b: _*)
      val q = monitor(spark, mem.toDS(), refs)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (alarms: org.apache.spark.sql.Dataset[Alarm], _: Long) =>
          alarms.collect().foreach(a => buf.add((a.key, a.seq, a.side)))
          ()
        }
        .start()
      q.awaitTermination()
    }
    import scala.jdk.CollectionConverters._
    buf.asScala.toSet
  }

  test("trained reference matches the textbook 1-sigma design") {
    val r = trainedRef("s")
    assert(r == Ref("s", 100L, 5L, 50L))
  }

  test("onKey fold: exact alarm positions for a constructed shift (pure, no stream)") {
    // drive the pure transition with Spark's public test harness state
    val state = org.apache.spark.sql.streaming.TestGroupState.create[CusumState](
      org.apache.spark.api.java.Optional.empty[CusumState](),
      org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout(),
      0L, org.apache.spark.api.java.Optional.empty[Long](), false)
    val alarms = onKey(trainedRef)("s", obsAll.iterator, state)
      .map(a => (a.key, a.seq, a.side)).toSet
    assert(alarms == expectedAlarms)
    assert(state.get.nAlarms == 3 && state.get.nSeen == 60)
  }

  test("streamed alarms equal the single-batch fold under ANY batch framing") {
    val one = runStream(Seq(obsAll))
    assert(one == expectedAlarms, s"single batch: $one")
    val framed = runStream(Seq(obsAll.take(30), obsAll.slice(30, 50), obsAll.drop(50)))
    assert(framed == expectedAlarms, s"3-batch framing: $framed")
  }

  test("a late observation (seq <= last folded) is dropped, not folded out of order") {
    def freshState = org.apache.spark.sql.streaming.TestGroupState.create[CusumState](
      org.apache.spark.api.java.Optional.empty[CusumState](),
      org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout(),
      0L, org.apache.spark.api.java.Optional.empty[Long](), false)
    // clean two-batch fold as the yardstick
    val clean = freshState
    val a1 = onKey(trainedRef)("s", obsAll.take(30).iterator, clean).toSet
    val a2 = onKey(trainedRef)("s", obsAll.drop(30).iterator, clean).toSet
    // same framing, but batch 2 smuggles in a redelivery of seq 15 and
    // a genuinely late seq 3 carrying a wild value that would reshape
    // every subsequent alarm if it were folded
    val dirty = freshState
    val b1 = onKey(trainedRef)("s", obsAll.take(30).iterator, dirty).toSet
    val late = Seq(Obs("s", 15L, 110L), Obs("s", 3L, 1000000L))
    val b2 = onKey(trainedRef)("s", (late ++ obsAll.drop(30)).iterator, dirty).toSet
    assert(b1.map(a => (a.seq, a.side)) == a1.map(a => (a.seq, a.side)))
    assert(b2.map(a => (a.seq, a.side)) == a2.map(a => (a.seq, a.side)),
      "late rows must not change alarm positions")
    assert(dirty.get.nLate == 2L, "both late rows counted")
    assert(dirty.get.nSeen == clean.get.nSeen, "late rows not folded")
    assert(dirty.get.lastSeq == 60L)
  }

  test("unmonitored keys pass through silently") {
    val alarms = runStream(Seq(Seq(Obs("unknown", 1, 1000000L), Obs("s", 1, 100L))))
    assert(alarms.isEmpty)
  }
}
