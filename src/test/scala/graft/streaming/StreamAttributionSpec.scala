package graft.streaming

import graft.{SparkTestBase, Tables}
import graft.streaming.StreamAttribution._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Stream ≡ batch for last-touch attribution: the per-credit stream
  * aggregates to exactly the batch `q_attribution` channel rollup on
  * the real corpus, under any framing; a purchase whose touch arrived
  * in an earlier micro-batch is still credited (state carries the
  * touch); late rows drop at the high-water mark. */
class StreamAttributionSpec extends SparkTestBase {

  private val LookbackUs = 7L * 86400 * 1000000

  private def freshState = org.apache.spark.sql.streaming.TestGroupState.create[TouchState](
    org.apache.spark.api.java.Optional.empty[TouchState](),
    org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout(),
    0L, org.apache.spark.api.java.Optional.empty[Long](), false)

  /** sf0.001's events as Ev rows; seq encodes the batch query's
    * (ts, event_id) window order. */
  private def corpusEvents: Seq[Ev] =
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")),
        col("event_type"), round(col("value") * 100).cast("long"))
      .collect().map { r =>
        Ev(r.getLong(0), r.getLong(2) * (1L << 20) + r.getLong(1),
          r.getString(3), r.getLong(2), r.getLong(4))
      }.toSeq

  private def runStream(batches: Seq[Seq[Ev]]): Seq[(Long, Long, String, Long)] = {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = tmpDir("attr-ckpt")
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, String, Long)]()
    val mem = MemoryStream[Ev]
    batches.foreach { b =>
      mem.addData(b: _*)
      val q = credits(spark, mem.toDS(), LookbackUs)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (cs: org.apache.spark.sql.Dataset[Credit], _: Long) =>
          cs.collect().foreach(c => buf.add((c.user, c.seq, c.channel, c.cents)))
          ()
        }
        .start()
      q.awaitTermination()
    }
    import scala.jdk.CollectionConverters._
    buf.asScala.toSeq
  }

  test("streamed credits aggregate to the batch q_attribution rollup, under any framing") {
    val evs = corpusEvents
    val batchAgg = graft.ops.Behavior.attribution(spark, sfDir).collect()
      .map(r => r.getAs[String]("channel") ->
        ((r.getAs[Long]("n_purchases"), r.getAs[Long]("n_users"),
          r.getAs[Long]("sum_cents")))).toMap

    def aggOf(cs: Seq[(Long, Long, String, Long)]): Map[String, (Long, Long, Long)] =
      cs.groupBy(_._3).map { case (ch, s) =>
        ch -> ((s.size.toLong, s.map(_._1).distinct.size.toLong, s.map(_._4).sum))
      }

    val one = runStream(Seq(evs))
    assert(aggOf(one) == batchAgg, "single-batch stream must equal the batch rollup")

    val rnd = new scala.util.Random(7)
    val ordered = evs.sortBy(_.seq)
    val third = ordered.size / 3
    val framed = runStream(Seq(
      rnd.shuffle(ordered.take(third)),
      rnd.shuffle(ordered.slice(third, 2 * third)),
      rnd.shuffle(ordered.drop(2 * third))))
    assert(framed.toSet == one.toSet,
      "3-batch within-batch-shuffled framing must emit the same credits")
    assert(one.nonEmpty)
  }

  test("a touch in an earlier batch still earns the credit; outside lookback goes direct") {
    val evs = Seq(
      Ev(1L, 1L, "click", 1000L, 0L),
      Ev(1L, 2L, "purchase", 2000L, 500L),
      Ev(1L, 3L, "purchase", 2000L + LookbackUs + 1, 700L))
    val split = runStream(Seq(evs.take(1), evs.drop(1)))
    assert(split.toSet == Set(
      (1L, 2L, "click", 500L),
      (1L, 3L, "direct", 700L)))
  }

  test("pure fold: purchase does not become a touch; late rows drop and count") {
    // purchase then purchase: the first must NOT channel the second
    val st1 = freshState
    val c1 = onKey(LookbackUs)(1L, Iterator(
      Ev(1L, 1L, "view", 0L, 0L), Ev(1L, 2L, "purchase", 10L, 100L),
      Ev(1L, 3L, "purchase", 20L, 200L)), st1).toSeq
    assert(c1.map(c => (c.seq, c.channel)) == Seq((2L, "view"), (3L, "view")),
      "the view stays the last touch across both purchases")
    // replayed seq is dropped, not re-credited (exactly-once credits)
    val st2 = freshState
    onKey(LookbackUs)(1L, Iterator(
      Ev(1L, 1L, "click", 0L, 0L), Ev(1L, 2L, "purchase", 5L, 100L)), st2)
    val c2 = onKey(LookbackUs)(1L, Iterator(
      Ev(1L, 2L, "purchase", 5L, 100L)), st2).toSeq
    assert(c2.isEmpty, "a redelivered purchase must not be double-credited")
    assert(st2.get.nLate == 1L)
  }
}
