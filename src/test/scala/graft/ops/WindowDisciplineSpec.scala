package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** Round-13: the UNPARTITIONED-WINDOW discipline as a GLOBAL
  * invariant, not a per-query convention — a `WindowExec` with an
  * empty partition spec moves its whole input to ONE task, so it is
  * only ever acceptable above a child that is provably model-sized
  * (aggregated, limited, or driver-materialized). The sweep audits
  * EVERY `SparkEntry.queries` physical plan; a deliberately-broken
  * fixture proves the checker fires. */
class WindowDisciplineSpec extends SparkTestBase {

  /** A subtree is BOUNDED when every leaf-ward path passes through an
    * aggregate, a limit/top-k, or a driver-materialized relation
    * before reaching an unbounded scan. Conservative: raw file/RDD
    * scans are unbounded; unknown leaves are unbounded. */
  private def bounded(p: SparkPlan): Boolean = p match {
    case _: org.apache.spark.sql.execution.aggregate.HashAggregateExec => true
    case _: org.apache.spark.sql.execution.aggregate.SortAggregateExec => true
    case _: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => true
    case _: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => true
    case _: org.apache.spark.sql.execution.GlobalLimitExec => true
    case _: org.apache.spark.sql.execution.CollectLimitExec => true
    case _: org.apache.spark.sql.execution.LocalTableScanExec => true
    case _: org.apache.spark.sql.execution.RangeExec => true
    case leaf if leaf.children.isEmpty => false
    case other => other.children.forall(bounded)
  }

  /** Offending unpartitioned windows in a plan, physical subquery
    * plans included (collectWithSubqueries also surfaces LOGICAL
    * subquery plans, which cannot cast — walk only SparkPlans). */
  private def offenders(plan: SparkPlan): Seq[String] = {
    def allPlans(p: SparkPlan): Seq[SparkPlan] =
      p +: p.subqueries.collect { case sp: SparkPlan => sp }.flatMap(allPlans)
    allPlans(plan).flatMap(_.collect {
      case w: WindowExec if w.partitionSpec.isEmpty && !bounded(w.child) =>
        s"WindowExec over ${w.child.getClass.getSimpleName}"
      case w: WindowGroupLimitExec
          if w.partitionSpec.isEmpty && !bounded(w.child) =>
        s"WindowGroupLimitExec over ${w.child.getClass.getSimpleName}"
    })
  }

  /** Queries whose unpartitioned window is LEGITIMATE, each with the
    * reviewed reason. Additions require the same review. */
  private val allowlist: Map[String, String] = Map(
    // (empty — every current query passes the bounded-child rule)
  )

  test("EVERY SparkEntry query plan: an unpartitioned window only ever " +
      "sits above a bounded (aggregated/limited/model-sized) child") {
    val bad = scala.collection.mutable.ArrayBuffer[String]()
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, q) =>
      if (!allowlist.contains(name)) {
        val plan =
          try q(spark, sfDir).queryExecution.sparkPlan
          catch { case e: Throwable =>
            fail(s"$name failed to PLAN: ${e.getMessage}") }
        val off = offenders(plan)
        if (off.nonEmpty) bad += s"$name: ${off.mkString("; ")}"
      }
    }
    assert(bad.isEmpty,
      s"unpartitioned windows over unbounded children:\n${bad.mkString("\n")}\n" +
        "— partition the window, pre-aggregate its input, or allowlist " +
        "with a reviewed reason")
  }

  test("the checker FIRES on a deliberately-broken plan (global " +
      "row_number over a raw corpus scan) and accepts the fixed one") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val broken = docs.withColumn("r",
      row_number().over(Window.orderBy(col("doc_id"))))
    assert(offenders(broken.queryExecution.sparkPlan).nonEmpty,
      "a global window over a raw scan must be flagged")
    val fixedPartitioned = docs.withColumn("r",
      row_number().over(Window.partitionBy(col("lang"))
        .orderBy(col("doc_id"))))
    assert(offenders(fixedPartitioned.queryExecution.sparkPlan).isEmpty)
    val fixedBounded = docs.groupBy("lang").count()
      .withColumn("r", row_number().over(Window.orderBy(col("lang"))))
    assert(offenders(fixedBounded.queryExecution.sparkPlan).isEmpty,
      "an aggregated (model-sized) child is acceptable")
  }
}
