package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class WindowsSpec extends SparkTestBase {

  test("rollingRangeRevenue matches a brute-force 28-day window replay") {
    val orders = graft.Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderkey"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01")).cast("long"),
        round(col("o_totalprice") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byCust = orders.groupBy(_._1)
    val expected = orders.map { case (c, k, day, _) =>
      val peers = byCust(c).filter(o => o._3 >= day - 27 && o._3 <= day)
      (c, k, day, peers.map(_._4).sum, peers.length.toLong)
    }.sortBy(t => (t._1, t._2)).toSeq
    val got = Windows.rollingRangeRevenue(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("o_custkey"), r.getAs[Long]("o_orderkey"),
        r.getAs[Long]("day"), r.getAs[Long]("win_cents"), r.getAs[Long]("win_orders")))
      .toSeq
    assert(got == expected)
  }

  test("RANGE frame counts same-day peer orders that a ROWS frame would miss") {
    // at least one customer must have two orders on one day for the
    // RANGE-vs-ROWS distinction to be exercised at all
    val sameDay = Windows.rollingRangeRevenue(spark, "/root/testdata/sf0.01")
      .groupBy(col("o_custkey"), col("day")).count().filter(col("count") > 1)
    assert(sameDay.count() > 0, "corpus has no same-day order pair; frame test is vacuous")
    // every order on a multi-order day must count ALL that day's orders
    val dayCounts = Windows.rollingRangeRevenue(spark, "/root/testdata/sf0.01")
      .join(sameDay.select(col("o_custkey"), col("day")), Seq("o_custkey", "day"))
    assert(dayCounts.filter(col("win_orders") < 2).count() == 0)
  }

  test("eventTypeUnpivot equals the plain two-key GROUP BY (melt of pivot = identity)") {
    val expected = graft.Tables.events(spark, sfDir)
      .groupBy(col("user_id"), col("event_type")).count()
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    val got = EventOps.eventTypeUnpivot(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[Long]("cnt"))).toSeq
    assert(got == expected)
  }
}
