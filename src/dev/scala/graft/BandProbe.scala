package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only session-overlap band-width prober: for each corpus dir,
  * print what [[ops.Behavior.chooseBandMs]] picks and time the banded
  * join at every ladder rung; then repeat on a synthetic flash-dense
  * corpus (the 100× per-minute density regime) to show where minute
  * bands lose to the second-band fallback.
  * Usage: runMain graft.BandProbe [<dir> ...] */
object BandProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    spark.range(1000000).selectExpr("sum(id)").collect()

    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.1", "/tmp/sfbig")
    dirs.foreach { d =>
      val s = ops.Windows.sessions(spark, d)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"[$d] sessions=${s.count()} chosen=${ops.Behavior.chooseBandMs(s)} ms")
      ops.Behavior.BandLadderMs.foreach { w =>
        DevTiming.time("band")(s"$d W=${w}ms")(
          ops.Behavior.sessionOverlapOf(s, w).count())
      }
      s.unpersist()
    }

    // flash-dense synthetic: 100k sessions of ~15 s inside 10 minutes —
    // per-minute density ~100× the sfbig regime
    val rnd = new scala.util.Random(11)
    val dense = (0 until 100000).map { i =>
      val start = rnd.nextLong(10L * 60000L)
      (i.toLong, start, start + 5000L + rnd.nextLong(20000L))
    }.toDF("user_id", "session_start_ms", "session_end_ms")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[flash-dense 100k/10min] chosen=${ops.Behavior.chooseBandMs(dense)} ms")
    Seq(60000L, 1000L).foreach { w =>
      DevTiming.time("band")(s"flash-dense W=${w}ms")(
        ops.Behavior.sessionOverlapOf(dense, w).count())
    }
    dense.unpersist()
    spark.stop()
  }
}
