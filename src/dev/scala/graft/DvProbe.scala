package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.lake.{Catalog, Layout}

/** Dev-only probe for the deletion-vector scale claim: deleting a few
  * rows from a many-file lake must cost O(deleted rows) (a DV commit),
  * not O(lake) (the copy-on-write rewrite). Builds a lake of `files`
  * parquet files × `rowsPerFile` rows, deletes ONE user's rows three
  * ways and prints wall times + bytes written:
  *   dv          — deleteLakeWhere (merge-on-read commit)
  *   read-after  — loadLakeSnapshot full count with DVs applied
  *   materialize — the deferred compaction half
  * Usage: runMain graft.DvProbe [files] [rowsPerFile] */
object DvProbe {
  def main(args: Array[String]): Unit = {
    val files = args.headOption.map(_.toInt).getOrElse(200)
    val rows = args.drop(1).headOption.map(_.toInt).getOrElse(50000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def t[T](name: String)(f: => T): T = DevTiming.time("dv")(name)(f)

    val root = s"/tmp/dvprobe-lake-$files-$rows"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    val layout = Layout(root)
    t(s"build lake ${files}x$rows") {
      Catalog.commitLake(spark, layout,
        spark.range(files.toLong * rows).select(
          lit("events").as("source"),
          (col("id") % (files.toLong * rows / 100)).as("user_id"),
          col("id").as("seq"),
          md5(col("id").cast("string")).as("payload"))
          .repartition(files))
    }
    def treeBytes(p: String): Long =
      org.apache.commons.io.FileUtils.sizeOfDirectory(new java.io.File(p))
    val bytesBefore = treeBytes(layout.lakeDir)
    val seq = t("deleteLakeWhere one user") {
      Catalog.deleteLakeWhere(spark, layout, col("user_id") === 7L)
    }
    val bytesAfterDv = treeBytes(layout.lakeDir)
    println(s"[dv] commit seq=$seq, dv bytes written = ${bytesAfterDv - bytesBefore}" +
      s" (lake = $bytesBefore)")
    val n = t("loadLakeSnapshot count (DVs applied)") {
      Catalog.loadLakeSnapshot(spark, layout).count()
    }
    println(s"[dv] live rows after delete = $n (expected ${files.toLong * rows - 100})")
    t("materializeLakeDeletes") { Catalog.materializeLakeDeletes(spark, layout) }
    t("vacuumLake") { Catalog.vacuumLake(spark, layout, graceMs = 0L) }
    val n2 = Catalog.loadLakeSnapshot(spark, layout).count()
    println(s"[dv] live rows after materialize+vacuum = $n2")
    spark.stop()
  }
}
