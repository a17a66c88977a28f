package graft.streaming

import graft.{SparkTestBase, Tables}
import graft.streaming.StreamPattern._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class StreamPatternSpec extends SparkTestBase {

  private val SpanMs = 172800000L

  private def freshState = org.apache.spark.sql.streaming.TestGroupState.create[PatternState](
    org.apache.spark.api.java.Optional.empty[PatternState](),
    org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout(),
    0L, org.apache.spark.api.java.Optional.empty[Long](), false)

  /** sf0.001's filtered alphabet stream as Ev rows; seq encodes the
    * batch query's (ts_ms, event_id) order. */
  private def corpusEvents: Seq[Ev] =
    Tables.events(spark, sfDir)
      .filter(col("event_type").isin(Pattern: _*))
      .select(col("user_id"), col("event_type"), unix_millis(col("ts")), col("event_id"))
      .collect().map { r =>
        Ev(r.getLong(0), r.getLong(2) * (1L << 20) + r.getLong(3),
          r.getString(1), r.getLong(2))
      }.toSeq

  private def runStream(batches: Seq[Seq[Ev]]): Set[(Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = tmpDir("pat-ckpt")
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long)]()
    val mem = MemoryStream[Ev]
    batches.foreach { b =>
      mem.addData(b: _*)
      val q = matches(spark, mem.toDS(), SpanMs)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (ms: org.apache.spark.sql.Dataset[Match], _: Long) =>
          ms.collect().foreach(m => buf.add((m.user, m.startTs, m.endTs)))
          ()
        }
        .start()
      q.awaitTermination()
    }
    import scala.jdk.CollectionConverters._
    buf.asScala.toSet
  }

  test("streamed matches aggregate to the batch query, under any framing") {
    val evs = corpusEvents
    val batchAgg = graft.ops.Behavior.seqPattern(spark, sfDir, SpanMs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

    def aggOf(ms: Set[(Long, Long, Long)]): Map[Long, (Long, Long, Long)] =
      ms.groupBy(_._1).map { case (u, s) =>
        val spans = s.toSeq.map(m => m._3 - m._2)
        u -> ((spans.size.toLong, spans.min, spans.max))
      }

    val one = runStream(Seq(evs))
    assert(aggOf(one) == batchAgg, "single-batch stream must equal the batch query")
    // arrival order INSIDE a batch is irrelevant (the fold sorts by
    // seq) and batch boundaries anywhere cannot change the matches;
    // across batches seq must be monotone — that's the late-data
    // contract (an out-of-order row in a LATER batch is dropped by
    // the high-water mark, exactly like StreamCusum)
    val rnd = new scala.util.Random(11)
    val ordered = evs.sortBy(_.seq)
    val third = ordered.size / 3
    val framed = runStream(Seq(
      rnd.shuffle(ordered.take(third)),
      rnd.shuffle(ordered.slice(third, 2 * third)),
      rnd.shuffle(ordered.drop(2 * third))))
    assert(framed == one, "3-batch within-batch-shuffled framing must emit the same matches")
    assert(one.nonEmpty, "the corpus must exercise the pattern")
  }

  test("a triple split by a batch boundary is still matched (state carries the prefix)") {
    val evs = Seq(
      Ev(1L, 1L, "view", 1000L), Ev(1L, 2L, "click", 2000L),
      Ev(1L, 3L, "purchase", 3000L))
    val split = runStream(Seq(evs.take(2), evs.drop(2)))
    assert(split == Set((1L, 1000L, 3000L)))
  }

  test("pure fold: breaks, span bound, overlap semantics, and late-row drop") {
    // view view click purchase: only ONE match (the second view starts it)
    val st1 = freshState
    val m1 = onKey(SpanMs)(1L, Iterator(
      Ev(1L, 1L, "view", 0L), Ev(1L, 2L, "view", 10L),
      Ev(1L, 3L, "click", 20L), Ev(1L, 4L, "purchase", 30L)), st1).toSeq
    assert(m1.map(m => (m.startTs, m.endTs)) == Seq((10L, 30L)))
    // a pattern-alphabet intruder breaks the prefix
    val st2 = freshState
    val m2 = onKey(SpanMs)(1L, Iterator(
      Ev(1L, 1L, "view", 0L), Ev(1L, 2L, "click", 10L),
      Ev(1L, 3L, "click", 20L), Ev(1L, 4L, "purchase", 30L)), st2).toSeq
    assert(m2.isEmpty)
    // span bound is inclusive and measured first-to-last
    val st3 = freshState
    val m3 = onKey(2L)(1L, Iterator(
      Ev(1L, 1L, "view", 0L), Ev(1L, 2L, "click", 1L),
      Ev(1L, 3L, "purchase", 2L), Ev(1L, 4L, "view", 10L),
      Ev(1L, 5L, "click", 11L), Ev(1L, 6L, "purchase", 13L)), st3).toSeq
    assert(m3.map(m => (m.startTs, m.endTs)) == Seq((0L, 2L)))
    // a redelivered/late seq is dropped and counted, matches unchanged
    val st4 = freshState
    onKey(SpanMs)(1L, Iterator(Ev(1L, 5L, "view", 0L)), st4)
    val m4 = onKey(SpanMs)(1L, Iterator(
      Ev(1L, 5L, "view", 100L), Ev(1L, 6L, "click", 10L),
      Ev(1L, 7L, "purchase", 20L)), st4).toSeq
    assert(m4.map(m => (m.startTs, m.endTs)) == Seq((0L, 20L)),
      "the replayed seq 5 must not displace the already-folded view")
    assert(st4.get.nLate == 1L)
  }
}
