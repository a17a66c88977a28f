package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-static as-of enrichment: stream ≡ batch under shuffled
  * framings for a fixed dimension, and a MID-STREAM dimension update
  * is applied snapshot-consistently (later batches only) with
  * interval-correct attribution. */
private[streaming] case class EnrichEv(
    user_id: Long, event_id: Long, ts_ms: Long, cents: Long)

class StreamEnrichSpec extends SparkTestBase {

  private def realEvents(): Seq[EnrichEv] =
    graft.Tables.events(spark, sfDir)
      .filter(col("user_id") % 100 === 0)
      .selectExpr("user_id", "event_id", "unix_millis(ts) AS ts_ms",
        "CAST(round(value * 100) AS BIGINT) AS cents")
      .collect()
      .map(r => EnrichEv(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(e => (e.ts_ms, e.event_id))

  /** The SCD2 dimension derived from the real corpus (closed + open
    * intervals), filtered to the sampled users. */
  private def realDim() =
    graft.ops.EventOps.scd2Intervals(spark, sfDir)
      .filter(col("user_id") % 100 === 0)
      .select("user_id", "state", "valid_from_ms", "valid_to_ms")

  test("stream enrichment == batch enrichment under a shuffled 3-batch framing") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evs = realEvents()
    assert(evs.nonEmpty)
    val dim = realDim().cache()
    val want = StreamEnrich
      .enrichBatch(evs.toDF(), dim)
      .collect().map(_.toString).sorted.toSeq

    // shuffled framing: batch membership must not matter for a static dim
    val shuffled = new scala.util.Random(8).shuffle(evs)
    val parts = shuffled.grouped(math.max(1, shuffled.size / 3 + 1)).toSeq
    val mem = MemoryStream[EnrichEv]
    val got = scala.collection.mutable.ArrayBuffer.empty[String]
    val q = StreamEnrich.start(mem.toDF(), () => dim,
      (b, _) => got.synchronized { got ++= b.collect().map(_.toString) },
      tmpDir("enrich-ckpt"))
    parts.foreach { p => mem.addData(p: _*); q.processAllAvailable() }
    q.stop()
    assert(got.sorted.toSeq == want, "stream must equal batch for a fixed dimension")
    // spot-check interval correctness: every enriched state matches the
    // dimension row covering the event time
    val dimRows = dim.collect().map(r => (r.getLong(0), r.getString(1),
      r.getLong(2), if (r.isNullAt(3)) Long.MaxValue else r.getLong(3)))
    val stateOf = (u: Long, t: Long) => dimRows
      .collectFirst { case (du, st, f, to) if du == u && t >= f && t < to => st }
      .getOrElse("unknown")
    want.take(0) // silence unused warning paths
    StreamEnrich.enrichBatch(evs.toDF(), dim).collect().foreach { r =>
      assert(r.getAs[String]("state") == stateOf(r.getAs[Long]("user_id"),
        r.getAs[Long]("ts_ms")))
    }
    dim.unpersist()
  }

  test("the no-broadcast merge formulation is row-identical to the interval join " +
      "on the real corpus (incl. gaps past closed intervals)") {
    val s = spark
    import s.implicits._
    val evs = realEvents()
    val dim = realDim().cache()
    val evDf = evs.toDF()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    assert(rows(StreamEnrich.enrichBatchMerge(evDf, dim)) ==
      rows(StreamEnrich.enrichBatch(evDf, dim)))
    // gap behavior: a closed interval must NOT carry past its end
    val gapDim = Seq((1L, "bronze", 0L, java.lang.Long.valueOf(150L)))
      .toDF("user_id", "state", "valid_from_ms", "valid_to_ms")
      .withColumn("valid_to_ms", col("valid_to_ms").cast("long"))
    val gapEvs = Seq(EnrichEv(1, 1, 100, 0), EnrichEv(1, 2, 150, 0),
      EnrichEv(1, 3, 999, 0)).toDF()
    val got = StreamEnrich.enrichBatchMerge(gapEvs, gapDim).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[String]("state")).toMap
    assert(got == Map(1L -> "bronze", 2L -> "unknown", 3L -> "unknown"),
      s"half-open end + gap semantics: $got")
    // and the merge plan carries NO broadcast of the dimension
    val plan = StreamEnrich.enrichBatchMerge(evDf, dim)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastExchange"),
      "the merge path must survive an unbroadcastable dimension")
    dim.unpersist()
  }

  test("a mid-stream dimension update is snapshot-consistent per batch " +
      "and interval-correct") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // synthetic: user 1 is 'bronze' from t=0; the update (between
    // batches) promotes them to 'gold' from t=150
    val dimV1 = Seq((1L, "bronze", 0L, null.asInstanceOf[java.lang.Long]))
      .toDF("user_id", "state", "valid_from_ms", "valid_to_ms")
      .withColumn("valid_to_ms", col("valid_to_ms").cast("long"))
    val dimV2 = Seq(
      (1L, "bronze", 0L, java.lang.Long.valueOf(150L)),
      (1L, "gold", 150L, null.asInstanceOf[java.lang.Long]))
      .toDF("user_id", "state", "valid_from_ms", "valid_to_ms")
      .withColumn("valid_to_ms", col("valid_to_ms").cast("long"))
    @volatile var dim = dimV1

    val mem = MemoryStream[EnrichEv]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String)]
    val q = StreamEnrich.start(mem.toDF(), () => dim,
      (b, _) => got.synchronized {
        got ++= b.collect().map(r => (r.getAs[Long]("event_id"),
          r.getAs[Long]("ts_ms"), r.getAs[String]("state")))
      },
      tmpDir("enrich-ckpt2"))
    // batch 1: events at t=100 and t=200, dimension still V1
    mem.addData(EnrichEv(1, 10, 100, 5), EnrichEv(1, 11, 200, 5))
    q.processAllAvailable()
    // the update lands BETWEEN batches
    dim = dimV2
    // batch 2: a new event after the promotion, plus a LATE event from
    // before it — interval keying must send them to different versions
    mem.addData(EnrichEv(1, 12, 300, 5), EnrichEv(1, 13, 120, 5))
    q.processAllAvailable()
    q.stop()

    val byId = got.map(t => t._1 -> t._3).toMap
    assert(byId(10L) == "bronze")
    assert(byId(11L) == "bronze",
      "batch 1 ran against the V1 snapshot: even t=200 is bronze there")
    assert(byId(12L) == "gold", "post-promotion event joins the new interval")
    assert(byId(13L) == "bronze",
      "a late pre-promotion event must join the OLD interval, not the open row")
  }
}
