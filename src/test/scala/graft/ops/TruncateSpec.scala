package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins the round-15 Truncate mechanics: lazy materialization (no job
  * at construction), the release() storage hygiene the bench/verify
  * harnesses rely on, and the plan-audit disable conf. */
class TruncateSpec extends SparkTestBase {

  test("construction runs no job (lazy): a poisoned subtree truncates " +
      "fine and only throws at the first action") {
    // spark.range (not a LocalRelation): ConvertToLocalRelation would
    // otherwise evaluate the poison during OPTIMIZATION of a local
    // source, which is not the eagerness under test
    val poisoned = spark.range(1).toDF("id")
      .select(when(col("id") >= 0,
        raise_error(lit("boom"))).otherwise(col("id")).as("id"))
    // eager truncation would execute (and throw) HERE
    val t = Truncate(poisoned, "spec-poison")
    val e = intercept[Exception] { t.count() }
    def msgs(x: Throwable): Seq[String] =
      if (x == null) Seq.empty else Option(x.getMessage).toSeq ++ msgs(x.getCause)
    assert(msgs(e).exists(_.contains("boom")))
    Truncate.release()
  }

  test("release() unpersists the checkpoint blocks apply() registered") {
    val before = spark.sparkContext.getPersistentRDDs.size
    val t = Truncate(spark.range(1000).toDF("id"), "spec-release")
    t.count() // materialize the lazy checkpoint
    assert(spark.sparkContext.getPersistentRDDs.size > before,
      "checkpoint should appear in persistent RDDs")
    val n = Truncate.release()
    assert(n >= 1, s"expected at least one released RDD, got $n")
    assert(spark.sparkContext.getPersistentRDDs.size <= before,
      "released checkpoint blocks must leave the persistent-RDD registry")
    // idempotent: nothing left to release
    assert(Truncate.release() == 0)
  }

  test("spark.graft.truncate.enabled=false is the identity (full lineage kept)") {
    spark.conf.set("spark.graft.truncate.enabled", "false")
    try {
      val df = spark.range(10).toDF("id").groupBy(col("id") % 3).count()
      val t = Truncate(df, "spec-disabled")
      assert(t eq df, "disabled truncation must return the frame unchanged")
    } finally spark.conf.unset("spark.graft.truncate.enabled")
  }

  test("rows identical across postures (default, big, durable)") {
    val df = spark.range(100).toDF("id")
      .select(col("id"), (col("id") % 7).as("m"))
    // row SETS: checkpoint/parquet round-trips may reorder partitions
    def rows(d: org.apache.spark.sql.DataFrame): Seq[String] =
      d.collect().map(_.toString).sorted.toSeq
    val plain = rows(df)
    assert(rows(Truncate(df, "spec-rows")) == plain)
    assert(rows(Truncate(df, "spec-rows-big", big = true)) == plain)
    spark.conf.set("spark.graft.durableTruncate", "true")
    try assert(rows(Truncate(df, "spec-rows-durable")) == plain)
    finally spark.conf.unset("spark.graft.durableTruncate")
    Truncate.release()
  }
}
