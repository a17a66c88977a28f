package graft
import graft.lake._
import java.io.{File, FileOutputStream}
import java.util.zip.GZIPOutputStream
import org.apache.spark.sql.SparkSession

/** Ingest/replay throughput measurement: synthesizes a bronze area
  * (gzip concatenated-JSON objects across sources — the reference's
  * Firehose output shape) and measures end-to-end ingest and replay
  * rates. Run: `sbt "runMain graft.IngestBench [nObjects recordsPerObject]"`. */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val nObjects = args.headOption.map(_.toInt).getOrElse(200)
    val perObject = args.drop(1).headOption.map(_.toInt).getOrElse(500)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val layout = Layout("/tmp/graft_ingest_bench_" + System.nanoTime())
    val sources = Seq("clicks", "tweets", "views", "errors")
    var i = 0
    while (i < nObjects) {
      val src = sources(i % sources.length)
      val d = new File(layout.bronzeSourceDir(src)); d.mkdirs()
      val out = new GZIPOutputStream(new FileOutputStream(new File(d, f"obj$i%05d.gz")))
      val sb = new StringBuilder
      var j = 0
      while (j < perObject) {
        sb.append(s"""{"event_id":${i.toLong * perObject + j},"source":"$src","page":"/p${j % 97}","value":${(j % 1000) / 10.0}}""")
        j += 1
      }
      out.write(sb.toString.getBytes("UTF-8")); out.close()
      i += 1
    }
    val total = nObjects.toLong * perObject

    val t0 = System.nanoTime()
    val n = Ingest.ingestBatch(spark, layout, System.currentTimeMillis())
    val ingestS = (System.nanoTime() - t0) / 1e9
    require(n == total, s"$n != $total")

    val t1 = System.nanoTime()
    val replayed = Replay.replay(spark, layout, "clicks",
      new java.sql.Timestamp(0), new java.sql.Timestamp(Long.MaxValue >> 16))
    val replayS = (System.nanoTime() - t1) / 1e9

    println(f"""{"ingest_records":$total,"ingest_sec":$ingestS%.2f,"ingest_rec_per_sec":${total / ingestS}%.0f,"replay_records":$replayed,"replay_sec":$replayS%.2f,"replay_rec_per_sec":${replayed / replayS}%.0f}""")
    spark.stop()
    def rm(f: File): Unit = { if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm)); f.delete() }
    rm(new File(layout.root))
  }
}
