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
}
