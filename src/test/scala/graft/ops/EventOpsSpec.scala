package graft.ops

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Guards the declared event-type vocabulary: every static pivot over
  * `event_type` uses [[Tables.eventTypes]], and this pin makes schema
  * growth a loud test failure instead of a silently dropped category
  * (a value outside the list would vanish from the pivot while the
  * GROUP BY oracle keeps it). */
class EventOpsSpec extends SparkTestBase {

  test("Tables.eventTypes equals the observed distinct event_type set") {
    val observed = Tables.events(spark, sfDir)
      .select(col("event_type")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(observed == Tables.eventTypes.toSet,
      s"event_type vocabulary drifted: data has $observed, " +
        s"declared list is ${Tables.eventTypes.toSet} — update Tables.eventTypes " +
        "(pivot/unpivot/salt queries all read it)")
    assert(Tables.eventTypes == Tables.eventTypes.sorted,
      "keep the declared list sorted so pivot column order is deterministic")
  }

  test("unpivot of pivot restores exactly the present (user, type) pairs") {
    val longForm = Tables.events(spark, sfDir)
      .groupBy(col("user_id"), col("event_type")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val melted = EventOps.eventTypeUnpivot(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(melted == longForm)
  }

  test("resampleOhlc matches brute-force bars and plans without a window") {
    val df = EventOps.resampleOhlc(spark, sfDir)
    // the struct-extremum formulation's point: ONE agg pass, no
    // Window operator anywhere in the engine plan
    assert(!df.queryExecution.executedPlan.toString.contains("Window"),
      "OHLC must come from aggregation, not a window")
    val events = graft.Events.events(spark, sfDir)
      .select(col("event_type"), unix_millis(col("ts")).as("ts_ms"),
        col("event_id"), round(col("value") * 100).cast("long").as("cents"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expect = events.groupBy(e => (e._1, e._2 / 900000L)).map { case (k, g) =>
      val sorted = g.sortBy(e => (e._2, e._3))
      k -> (sorted.head._4, g.map(_._4).max, g.map(_._4).min, sorted.last._4,
        g.size.toLong, g.map(_._4).sum)
    }
    val got = df.collect().map { r =>
      (r.getString(0), r.getAs[Long]("bucket")) ->
        (r.getAs[Long]("open_c"), r.getAs[Long]("high_c"), r.getAs[Long]("low_c"),
          r.getAs[Long]("close_c"), r.getAs[Long]("n_events"), r.getAs[Long]("sum_c"))
    }.toMap
    assert(got == expect)
    // bar sanity: low <= open, close <= high
    got.values.foreach { case (o, h, l, c, _, _) =>
      assert(l <= o && o <= h && l <= c && c <= h)
    }
  }
}
