package graft.streaming

import graft.{SparkTestBase, Tables}
import graft.streaming.StreamMultiTouch._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Stream ≡ batch for linear multi-touch attribution on the real
  * corpus under any framing; window eviction bounds state without
  * changing credits; conservation survives streaming. */
class StreamMultiTouchSpec extends SparkTestBase {

  private val LookbackUs = 7L * 86400 * 1000000

  private def freshState = org.apache.spark.sql.streaming.TestGroupState.create[TouchWindow](
    org.apache.spark.api.java.Optional.empty[TouchWindow](),
    org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout(),
    0L, org.apache.spark.api.java.Optional.empty[Long](), false)

  private def corpusEvents: Seq[Ev] =
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")),
        col("event_type"), round(col("value") * 100).cast("long"))
      .collect().map { r =>
        Ev(r.getLong(0), r.getLong(2) * (1L << 20) + r.getLong(1),
          r.getString(3), r.getLong(2), r.getLong(4))
      }.toSeq

  private def runStream(batches: Seq[Seq[Ev]], rule: Rule = Linear): Seq[Credit] = {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = tmpDir("mt-ckpt")
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[Credit]()
    val mem = MemoryStream[Ev]
    batches.foreach { b =>
      mem.addData(b: _*)
      val q = credits(spark, mem.toDS(), LookbackUs, rule)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (cs: org.apache.spark.sql.Dataset[Credit], _: Long) =>
          cs.collect().foreach(buf.add); ()
        }
        .start()
      q.awaitTermination()
    }
    import scala.jdk.CollectionConverters._
    buf.asScala.toSeq
  }

  test("streamed credits roll up to the batch q_multi_touch exactly, under any framing") {
    val evs = corpusEvents
    val batch = graft.ops.Behavior.multiTouch(spark, sfDir).collect()
      .map(r => r.getAs[String]("channel") ->
        ((r.getAs[Long]("n_credits"), r.getAs[Long]("sum_credit_e6")))).toMap

    def rollup(cs: Seq[Credit]): Map[String, (Long, Long)] =
      cs.groupBy(_.channel).map { case (ch, s) =>
        ch -> ((s.size.toLong, s.map(_.creditE6).sum))
      }

    val one = runStream(Seq(evs))
    assert(rollup(one) == batch, "single-batch stream must equal the batch rollup")
    // conservation under streaming
    val totalPurchase = evs.filter(_.eventType == "purchase").map(_.cents).sum * 1000000L
    assert(one.map(_.creditE6).sum == totalPurchase)

    val rnd = new scala.util.Random(13)
    val ordered = evs.sortBy(_.seq)
    val third = ordered.size / 3
    val framed = runStream(Seq(
      rnd.shuffle(ordered.take(third)),
      rnd.shuffle(ordered.slice(third, 2 * third)),
      rnd.shuffle(ordered.drop(2 * third))))
    assert(rollup(framed) == batch)
    assert(framed.toSet == one.toSet,
      "per-credit output must be framing-invariant, not just the rollup")
  }

  test("streamed DECAY and U-SHAPED credits roll up to their batch queries exactly, " +
      "under shuffled framings") {
    val evs = corpusEvents
    def rollup(cs: Seq[Credit]): Map[String, (Long, Long)] =
      cs.groupBy(_.channel).map { case (ch, s) =>
        ch -> ((s.size.toLong, s.map(_.creditE6).sum))
      }
    def batchMap(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Long)] =
      df.collect().map(r => r.getAs[String]("channel") ->
        ((r.getAs[Long]("n_credits"), r.getAs[Long]("sum_credit_e6")))).toMap

    val rnd = new scala.util.Random(29)
    val ordered = evs.sortBy(_.seq)
    val third = ordered.size / 3
    val framing = Seq(
      rnd.shuffle(ordered.take(third)),
      rnd.shuffle(ordered.slice(third, 2 * third)),
      rnd.shuffle(ordered.drop(2 * third)))
    val totalPurchase = evs.filter(_.eventType == "purchase").map(_.cents).sum * 1000000L

    Seq[(Rule, org.apache.spark.sql.DataFrame)](
      (Decay, graft.ops.Behavior.multiTouchDecay(spark, sfDir)),
      (UShaped, graft.ops.Behavior.multiTouchUShape(spark, sfDir))
    ).foreach { case (rule, batchDf) =>
      val streamed = runStream(framing, rule)
      assert(rollup(streamed) == batchMap(batchDf),
        s"$rule: stream must equal the batch rollup under shuffled framing")
      assert(streamed.map(_.creditE6).sum == totalPurchase,
        s"$rule: conservation must survive streaming")
    }
  }

  test("pure fold: window eviction, split + remainder, redelivery exactly-once") {
    val st = freshState
    // two touches then a purchase: 350 cents -> 175e6 each... with
    // integer e6: 350*1e6/2 each, no remainder; then an odd split
    val c1 = onKey(LookbackUs)(1L, Iterator(
      Ev(1L, 1L, "view", 0L, 0L), Ev(1L, 2L, "click", 10L, 0L),
      Ev(1L, 3L, "purchase", 20L, 350L)), st).toSeq
    assert(c1.map(c => (c.channel, c.creditE6)).sorted ==
      Seq(("click", 175000000L), ("view", 175000000L)))
    // odd split: 101 cents over 3 touches -> 2 x 33666666 + latest gets +2
    val st2 = freshState
    val c2 = onKey(LookbackUs)(1L, Iterator(
      Ev(1L, 1L, "view", 0L, 0L), Ev(1L, 2L, "click", 10L, 0L),
      Ev(1L, 3L, "signup", 20L, 0L), Ev(1L, 4L, "purchase", 30L, 101L)), st2).toSeq
    assert(c2.map(_.creditE6).sum == 101000000L, "conservation incl. remainder")
    assert(c2.find(_.channel == "signup").get.creditE6 == 33666666L + 101000000L % 3)
    // a touch beyond the lookback is evicted and cannot credit
    val st3 = freshState
    val c3 = onKey(LookbackUs)(1L, Iterator(
      Ev(1L, 1L, "view", 0L, 0L),
      Ev(1L, 2L, "purchase", LookbackUs + 1, 100L)), st3).toSeq
    assert(c3.map(_.channel) == Seq("direct"))
    assert(st3.get.touches.isEmpty, "expired touches must leave the state")
    // redelivered purchase seq: dropped, never double-credited
    val st4 = freshState
    onKey(LookbackUs)(1L, Iterator(
      Ev(1L, 1L, "click", 0L, 0L), Ev(1L, 2L, "purchase", 5L, 100L)), st4)
    val c4 = onKey(LookbackUs)(1L, Iterator(Ev(1L, 2L, "purchase", 5L, 100L)), st4).toSeq
    assert(c4.isEmpty && st4.get.nLate == 1L)
  }
}
