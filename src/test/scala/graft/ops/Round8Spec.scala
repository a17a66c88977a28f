package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-8 fixes: the attribution family's day-band explode derives
  * from `lookbackUs` (a hardcoded 7 silently dropped eligible pairs
  * for longer lookbacks and diverged from the SQL oracle twins). */
class Round8Spec extends SparkTestBase {

  /** Unbanded replay of [[Behavior.multiTouch]]'s semantics: pair via a
    * plain user_id join + exact time filter (quadratic — fine at
    * sf0.001), then the identical integer credit rule. */
  private def naiveMultiTouch(lookbackUs: Long): Seq[(String, Long, Long)] = {
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        col("event_type"), round(col("value") * 100).cast("long").as("cents"))
    val touches = ev.filter(col("event_type") =!= "purchase")
      .select(col("user_id"), col("event_id").as("t_id"), col("us").as("t_us"),
        col("event_type").as("channel"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("us").as("p_us"),
        col("cents"))
    val pairs = purchases.join(touches, Seq("user_id"))
      .filter(col("t_us") < col("p_us") && col("p_us") - col("t_us") <= lookbackUs)
      .select(col("p_id"), col("cents"), col("channel"), col("t_us"), col("t_id"))
    val wn = Window.partitionBy(col("p_id"))
    val wr = Window.partitionBy(col("p_id")).orderBy(col("t_us").desc, col("t_id").desc)
    val credited = pairs
      .withColumn("n", count(lit(1)).over(wn))
      .withColumn("rn", row_number().over(wr))
      .select(col("p_id"), col("channel"),
        (expr("(cents * 1000000) DIV n") +
          when(col("rn") === 1, expr("(cents * 1000000) % n")).otherwise(lit(0L)))
          .as("credit_e6"))
    val direct = ev.filter(col("event_type") === "purchase")
      .join(credited.select(col("p_id")).distinct()
          .withColumnRenamed("p_id", "event_id"),
        Seq("event_id"), "left_anti")
      .select(lit("direct").as("channel"),
        (col("cents") * lit(1000000L)).as("credit_e6"))
    credited.select(col("channel"), col("credit_e6"))
      .unionByName(direct)
      .groupBy(col("channel"))
      .agg(count(lit(1)).cast("long").as("n_credits"),
        sum(col("credit_e6")).cast("long").as("sum_credit_e6"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
  }

  test("multiTouch band count derives from lookbackUs: a 12-day lookback " +
      "matches the unbanded replay (and differs from the 7-day default)") {
    def got(look: Long) = Behavior.multiTouch(spark, sfDir, look).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val look12 = 12L * 86400 * 1000000
    assert(got(look12) == naiveMultiTouch(look12),
      "banded join must credit every pair inside the 12-day window")
    assert(got(look12) != got(7L * 86400 * 1000000),
      "the 12-day corpus must actually exercise pairs past day 7")
    // defaults unchanged: the 7-day banded result matches its replay too
    assert(got(7L * 86400 * 1000000) == naiveMultiTouch(7L * 86400 * 1000000))
  }

  test("durable-truncation posture: PageRank, BFS, band-tune and MMR return " +
      "identical rows through the parquet path as through localCheckpoint") {
    def all(): Seq[Seq[String]] = Seq(
      Graph.nearDupPagerank(spark, sfDir, iters = 6), // crosses the %5 truncation
      Graph.nearDupBfsDistributed(spark, sfDir),
      Dedup.lshBandTune(spark, sfDir),
      Similarity.mmrRerank(spark, sfDir)
    ).map(_.collect().map(_.toString).sorted.toSeq)
    val local = all()
    spark.conf.set("spark.graft.durableTruncate", "true")
    spark.conf.set("spark.graft.truncateDir", tmpDir("trunc"))
    try {
      val durable = all()
      local.zip(durable).zipWithIndex.foreach { case ((l, d), i) =>
        assert(l == d, s"query $i diverged between truncation postures")
      }
    } finally {
      spark.conf.unset("spark.graft.durableTruncate")
      spark.conf.unset("spark.graft.truncateDir")
    }
  }

  test("weighted attribution conserves credit exactly at a 12-day lookback " +
      "(touchPairs band fix)") {
    val look12 = 12L * 86400 * 1000000
    val totalE6 = graft.Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .agg(sum(round(col("value") * 100).cast("long") * lit(1000000L)))
      .collect().head.getLong(0)
    Seq(Behavior.multiTouchDecay(spark, sfDir, look12),
        Behavior.multiTouchUShape(spark, sfDir, look12)).foreach { df =>
      val s = df.agg(sum(col("sum_credit_e6"))).collect().head.getLong(0)
      assert(s == totalE6, s"credit must conserve: $s != $totalE6")
    }
  }
}
