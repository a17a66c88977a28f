package graft.lake

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Co-located join: bucketed+sorted tables join with ZERO exchanges —
  * the layout decision that removes the dominant shuffle for repeated
  * fact⋈fact joins at scale. */
class BucketingSpec extends SparkTestBase {

  test("bucketed fact tables sort-merge join without any shuffle") {
    val li = graft.Tables.lineitem(spark, sfDir)
    val ord = graft.Tables.orders(spark, sfDir)
    Bucketing.writeBucketed(li, "li_bucketed", "l_orderkey", 8)
    Bucketing.writeBucketed(ord, "ord_bucketed", "o_orderkey", 8)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val joined = Bucketing.colocatedJoin(spark, "li_bucketed", "ord_bucketed",
        "l_orderkey", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      // and it computes the right thing
      val n = joined.count()
      val expected = li.join(ord, col("l_orderkey") === col("o_orderkey")).count()
      assert(n == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
