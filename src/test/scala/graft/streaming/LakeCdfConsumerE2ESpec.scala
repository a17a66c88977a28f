package graft.streaming

import graft.SparkTestBase
import graft.lake.{Catalog, Layout, Mv}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The silver→gold idiom END TO END: a CHECKPOINTED streaming query
  * over the `graft-lake-cdf` source maintains a downstream per-key
  * retractable aggregate — exactly once across a kill-and-restart, an
  * upsert, a DV delete, a compaction (which must contribute nothing),
  * and a FORCED replay of the last micro-batch (crash after sink
  * write, before the engine's commit). The maintained gold table must
  * equal [[Mv.rebuild]] from the live snapshot at every checkpoint —
  * the composition [[LakeCdfSourceSpec]] pins only piecewise. */
class LakeCdfConsumerE2ESpec extends SparkTestBase {

  /** Gold maintenance: each micro-batch folds its changes into a
    * SIGNED per-source delta written under `deltaRoot/b<batchId>` with
    * overwrite — the canonical idempotent foreachBatch sink (a
    * replayed batch re-lands on its own directory, so at-least-once
    * delivery folds to exactly-once state). */
  private def startGold(layout: Layout, ckpt: String, deltaRoot: String) =
    spark.readStream
      .format(classOf[LakeCdfSourceProvider].getName)
      .option("root", layout.root)
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        val sign = when(col("_change_type") === "insert", 1L).otherwise(-1L)
        df.groupBy("source")
          .agg(sum(sign).as("n_rows"), sum(sign * col("v")).as("sum_v"))
          .write.mode("overwrite").parquet(s"$deltaRoot/b$batchId")
        ()
      }
      .start()

  /** The gold table: fold of every committed delta. */
  private def gold(deltaRoot: String): Map[String, (Long, Long)] = {
    val dirs = Option(new java.io.File(deltaRoot).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("b"))
      .map(_.getAbsolutePath).sorted
    if (dirs.isEmpty) return Map.empty
    spark.read.parquet(dirs.toIndexedSeq: _*)
      .groupBy("source")
      .agg(sum("n_rows").as("n"), sum("sum_v").as("s"))
      .filter(col("n") =!= 0L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
  }

  private def expected(layout: Layout): Map[String, (Long, Long)] = {
    // the reference answer TWO ways: a fresh Mv.rebuild and the raw
    // snapshot aggregate — all three surfaces must agree
    val snap = Catalog.loadLakeSnapshot(spark, layout)
    if (snap.columns.isEmpty) return Map.empty
    val byHand = snap.groupBy("source")
      .agg(count(lit(1)).as("n"), sum(col("v").cast("long")).as("s"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val state = tmpDir("cdf-gold-ref")
    Mv.rebuild(spark, layout, state, Seq("source"), "v")
    val mv = Mv.read(spark, state)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(mv == byHand, s"Mv.rebuild=$mv snapshot=$byHand")
    byHand
  }

  test("checkpointed CDF consumer: gold ≡ Mv.rebuild across restart, " +
      "upsert, DV delete, compaction (zero contribution), and a forced " +
      "last-batch replay") {
    val layout = Layout(tmpDir("cdf-consumer"))
    val ckpt = tmpDir("cdf-consumer-ckpt")
    val deltas = tmpDir("cdf-consumer-gold")
    val s = spark
    import s.implicits._

    // v1: seed two sources
    Catalog.commitLake(spark, layout,
      Seq(("clicks", "k1", 10L), ("clicks", "k2", 20L), ("web", "k3", 30L))
        .toDF("source", "key", "v"))

    val q1 = startGold(layout, ckpt, deltas)
    q1.processAllAvailable()
    assert(gold(deltas) == expected(layout), "gold after seed")

    // more commits while LIVE: append + upsert (delete+insert in one
    // version) + a plain DV delete
    Catalog.commitLake(spark, layout,
      Seq(("clicks", "k4", 40L)).toDF("source", "key", "v"))
    q1.processAllAvailable()
    Catalog.upsertLakeByKey(spark, layout,
      Seq(("clicks", "k2", 25L)).toDF("source", "key", "v"), Seq("key"))
    q1.processAllAvailable()
    assert(gold(deltas) == expected(layout), "gold after append + upsert")
    q1.stop() // kill

    // commits while the consumer is DOWN
    Catalog.deleteLakeWhere(spark, layout, col("key") === "k1")
    Catalog.commitLake(spark, layout,
      Seq(("web", "k5", 50L)).toDF("source", "key", "v"))

    // restart from the checkpoint: only the missed window arrives
    val q2 = startGold(layout, ckpt, deltas)
    q2.processAllAvailable()
    assert(gold(deltas) == expected(layout), "gold after restart catch-up")

    // compaction + DV materialization: the live view is unchanged, so
    // the feed — and therefore gold — must not move
    val before = gold(deltas)
    assert(Catalog.materializeLakeDeletes(spark, layout) > 0)
    Catalog.optimizeLake(spark, layout, targetBytes = 1L << 30)
    q2.processAllAvailable()
    assert(gold(deltas) == before, "a rewrite must contribute nothing")
    assert(gold(deltas) == expected(layout))
    q2.stop()

    // FORCED REPLAY: drop the engine's newest batch commit marker —
    // the restarted query re-executes that batch (at-least-once
    // delivery); the batchId-keyed overwrite folds it to exactly-once
    Catalog.commitLake(spark, layout,
      Seq(("clicks", "k6", 60L)).toDF("source", "key", "v"))
    val q3 = startGold(layout, ckpt, deltas)
    q3.processAllAvailable()
    q3.stop()
    val afterK6 = gold(deltas)
    assert(afterK6 == expected(layout), "gold after k6")
    val commits = new java.io.File(s"$ckpt/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toLong)
    assert(commits.nonEmpty)
    val crc = new java.io.File(commits.last.getParentFile,
      s".${commits.last.getName}.crc")
    assert(commits.last.delete(), "simulate crash before engine commit")
    if (crc.exists) crc.delete() // local-FS checksum sidecar goes with it
    val q4 = startGold(layout, ckpt, deltas)
    q4.processAllAvailable()
    q4.stop()
    assert(gold(deltas) == afterK6,
      "replayed batch must fold to the same gold state (idempotent sink)")
    assert(gold(deltas) == expected(layout))
  }
}
