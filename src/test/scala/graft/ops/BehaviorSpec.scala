package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins the banded interval-overlap join ([[Behavior.sessionOverlapOf]])
  * row-for-row against the naive O(n²) inequality self-join it
  * replaces at scale — the single-capture argument (later session's
  * start bucket is always among the earlier session's covered buckets;
  * ties break on (start, user)) is subtle enough to deserve a direct
  * equivalence witness beyond the oracle run. */
class BehaviorSpec extends SparkTestBase {
  import spark.implicits._

  private val HourMs = 3600000L

  private def naiveOverlap(s: org.apache.spark.sql.DataFrame) = {
    val a = s.select(col("user_id").as("user_a"),
      col("session_start_ms").as("start_a"), col("session_end_ms").as("end_a"))
    val b = s.select(col("user_id").as("user_b"),
      col("session_start_ms").as("start_b"), col("session_end_ms").as("end_b"))
    a.crossJoin(b)
      .filter(col("user_a") =!= col("user_b"))
      .filter(col("start_b") <= col("end_a") && col("start_a") <= col("end_b"))
      .filter(col("start_a") < col("start_b") ||
        (col("start_a") === col("start_b") && col("user_a") < col("user_b")))
      .groupBy(floor(greatest(col("start_a"), col("start_b")) / lit(HourMs.toDouble))
        .cast("long").as("hour_bucket"))
      .agg(count(lit(1)).as("n_pairs"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("banded session overlap == naive inequality self-join, incl. boundary corners") {
    val rnd = new scala.util.Random(42)
    val random = (0 until 200).map { i =>
      val start = rnd.nextLong(10L * HourMs)
      (i.toLong % 10, start, start + rnd.nextLong(5L * HourMs / 2))
    }
    val corners = Seq(
      // equal starts, different users (the tie-break corner)
      (90L, 7L * HourMs + 5, 7L * HourMs + 100),
      (91L, 7L * HourMs + 5, 7L * HourMs + 200),
      // end exactly ON a bucket boundary, next starts exactly there
      (92L, 11L * HourMs, 12L * HourMs),
      (93L, 12L * HourMs, 12L * HourMs + 1),
      // point session (start == end) inside a long containing session
      (94L, 13L * HourMs + 7, 13L * HourMs + 7),
      (95L, 13L * HourMs, 16L * HourMs))
    val s = (random ++ corners)
      .toDF("user_id", "session_start_ms", "session_end_ms")
    val naive = naiveOverlap(s)
    // band width must not change the result — only the plan's
    // fan-out/bucket-size trade (minute bands for dense corpora, the
    // default hour, and a band wider than the reporting bucket)
    Seq(60000L, 3600000L, 7200000L).foreach { bandMs =>
      val banded = Behavior.sessionOverlapOf(s, bandMs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(banded == naive,
        s"bandMs=$bandMs banded=${banded.toSeq.sorted} naive=${naive.toSeq.sorted}")
    }
    assert(naive.values.sum > 50, "fixture must actually exercise overlaps")
  }
}
