package graft
import org.apache.spark.sql.SparkSession

/** Dev-only IVF-PQ probe auditor: builds (or reuses) the stored index
  * for each given corpus dir, prints whether the probe's code scan is
  * PARTITION-PRUNED to the probed lists (the 10⁹-vector property:
  * probe cost ∝ nprobe list sizes, NOT corpus size), and times warm
  * probes. Usage: runMain graft.PqPlanProbe <dir> [<dir> ...] */
object PqPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.1")
    dirs.foreach { d =>
      val nVecs = Tables.embeddings(spark, d).count()
      DevTiming.time("pqplan")(s"index build $d ($nVecs vecs)")(
        ops.Pq.buildIvfPqIndex(spark, d))
      val probe = ops.Pq.ivfPqTopK(spark, d)
      probe.collect() // warm + finalize AQE plan
      val plan = probe.queryExecution.executedPlan.toString
      val scans = plan.linesIterator.filter(_.contains("ivfpq_codes")).toList
      val pruned = plan.contains("dynamicpruning") ||
        scans.exists(l => l.contains("PartitionFilters: [") && !l.contains("PartitionFilters: []"))
      println(s"  [$d] codes-scan partition-pruned: $pruned")
      if (!pruned)
        plan.linesIterator.filter(l => l.contains("PartitionFilters") ||
          l.contains("dynamicpruning")).take(5).foreach(l => println("    " + l.trim.take(200)))
      (1 to 3).foreach(i =>
        DevTiming.time("pqplan")(s"warm probe $d rep$i")(
          ops.Pq.ivfPqTopK(spark, d).collect()))
    }
    spark.stop()
  }
}
