package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe for the IVF index-BUILD scale fix (round 8): the
  * exact coarse assignment is O(n·C); the two-level build
  * (`spark.graft.ivfBuild=twoLevel`) is O(n·(S + 2·C/S)) with S ≈ √C.
  * Re-synthesizes the round-6 sfvec100 corpus (200k vecs, 4000 lists)
  * and prints, per mode: coarse-assignment time, full IVF-PQ index
  * build time, probe recall@10 vs the exact scan, and the
  * exact-vs-two-level assignment agreement.
  * Usage: runMain graft.IvfBuildProbe [exact|twoLevel|both] */
object IvfBuildProbe {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("both")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def t[T](name: String)(f: => T): T = DevTiming.time("ivfbuild")(name)(f)

    val d = "/tmp/sfvec100"
    val vecs = s"$d/embeddings.parquet"
    if (!new java.io.File(vecs).exists()) {
      val base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      val n = base.agg(max(col("vec_id"))).collect()(0).getLong(0) + 1
      t("synthesize 100x embeddings") {
        base.crossJoin(spark.range(100).select(col("id").as("rep")))
          .select(
            (col("vec_id") + col("rep") * n).as("vec_id"),
            transform(col("embedding"),
              (v, i) => when(i === pmod(col("rep"), size(col("embedding"))),
                v + (col("rep") % 17 + 1).cast("float") * 0.01f).otherwise(v))
              .as("embedding"),
            col("label"))
          .repartition(64)
          .write.mode("overwrite").parquet(vecs)
      }
    }
    val nVecs = Tables.embeddings(spark, d).count()
    val nCentroids = Tables.embeddings(spark, d)
      .filter(col("vec_id") % 50 === 0).count()
    val stride = ops.Similarity.defaultSuperStride(nCentroids)
    println(s"  corpus: $nVecs vecs, $nCentroids lists, super stride $stride")

    // exact ground truth for recall: top-10 by cosine from vec 0
    val gt = t("exact top-10 scan (ground truth)")(
      ops.Similarity.knnBruteForce(spark, d)
        .select("vec_id").collect().map(_.getLong(0)).toSet)

    def recallOf(probe: org.apache.spark.sql.DataFrame): Double = {
      val got = probe.select("vec_id").collect().map(_.getLong(0)).toSet
      got.intersect(gt).size.toDouble / gt.size
    }

    if (mode != "twoLevel") {
      spark.conf.set("spark.graft.ivfBuild", "exact")
      t(s"EXACT coarse assignment ($nVecs x $nCentroids)")(
        ops.Similarity.buildAssignments(spark, d))
      t("EXACT full IVF-PQ index build")(ops.Pq.buildIvfPqIndex(spark, d))
      val r = recallOf(t("probe (exact index, nprobe=16)")(
        ops.Pq.ivfPqTopK(spark, d, nprobe = 16)))
      println(s"  exact-index probe recall@10 = $r")
    }
    if (mode != "exact") {
      spark.conf.set("spark.graft.ivfBuild", "twoLevel")
      t(s"TWO-LEVEL coarse assignment (stride $stride, probe 2)")(
        ops.Similarity.buildAssignments(spark, d))
      t("TWO-LEVEL full IVF-PQ index build")(ops.Pq.buildIvfPqIndex(spark, d))
      val r = recallOf(t("probe (two-level index, nprobe=16)")(
        ops.Pq.ivfPqTopK(spark, d, nprobe = 16)))
      println(s"  two-level-index probe recall@10 = $r")
      t("exact-vs-two-level agreement")(
        ops.Similarity.ivfBuildAgreement(spark, d, stride).show(false))
    }
    spark.stop()
  }
}
