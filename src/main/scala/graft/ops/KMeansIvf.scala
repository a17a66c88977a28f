package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lloyd's k-means over embedding columns — the trained-centroid
  * upgrade for the IVF index build ([[Similarity.ivfAssign]] uses
  * modulo-sampled centroids for its oracle query; this produces real
  * centroids with the same output contract: (centroid_id, c_emb)).
  *
  * Driver-coordinated, like Spark MLlib's own KMeans: the k·dim
  * centroid state lives on the driver between iterations (bounded
  * tiny — it is the MODEL, not data) and each iteration is exactly one
  * distributed pass: broadcast-assign → posexplode → mean per
  * (centroid, pos) → collect of ≤ k·dim scalar rows. The previous
  * all-DataFrame formulation paid a localCheckpoint job plus a
  * window-renumber per iteration to keep lineage from re-executing
  * under each broadcast — coordinating the tiny state on the driver
  * removes those jobs entirely (2.6 s → well under 1 s at sf0.1).
  * Deterministic: init = k lowest vec_ids; ties in assignment break to
  * the lower centroid id; means are rounded to float exactly as the
  * DataFrame reassembly did. No collect of corpus vectors at any
  * point.
  */
object KMeansIvf {

  /** Train k centroids with `iters` Lloyd iterations. Returns
    * (centroid_id, c_emb ARRAY<FLOAT>). */
  def trainCentroids(spark: SparkSession, emb: DataFrame, k: Int, iters: Int): DataFrame = {
    import spark.implicits._
    // same fixed-width contract the hyperplane-LSH path enforces: the
    // mean-reassembly below indexes each centroid array by component
    // position, so a mixed-width corpus would otherwise die in an
    // opaque ArrayIndexOutOfBoundsException mid-iteration. One extra
    // validation pass is noise next to the iters×|train| training cost,
    // and buildTrainedCentroids runs this at most once per corpus.
    Similarity.fixedEmbeddingWidth(emb, "KMeansIvf.trainCentroids")
    def centDf(cs: Array[Array[Float]]): DataFrame =
      cs.zipWithIndex.map { case (c, i) => (i.toLong, c) }.toSeq
        .toDF("centroid_id", "c_emb")
    // init = the k lowest vec_ids' vectors, ids renumbered 0..k-1
    var cents: Array[Array[Float]] = emb.orderBy(col("vec_id")).limit(k)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray)
    var i = 0
    while (i < iters && cents.nonEmpty) {
      val means = emb.join(assign(emb, centDf(cents)).select("vec_id", "centroid_id"), Seq("vec_id"))
        .select(col("centroid_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("centroid_id"), col("pos"))
        .agg(avg(col("v")).cast("float").as("m"))
        .collect() // ≤ k·dim rows — model-sized, never corpus-sized
      // a centroid that captured no vectors keeps its previous
      // position — the function always returns exactly k centroids
      val next = cents.map(_.clone())
      means.foreach(r => next(r.getLong(0).toInt)(r.getInt(1)) = r.getFloat(2))
      cents = next
      i += 1
    }
    centDf(cents)
  }

  /** Nearest-centroid assignment: (vec_id, centroid_id, sim). Same
    * payload-free max-struct shape as [[Similarity]]'s assignment. */
  def assign(emb: DataFrame, centroids: DataFrame): DataFrame =
    emb.crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("centroid_id"),
        Similarity.cosine(col("embedding"), col("c_emb")).as("sim"))
      .groupBy(col("vec_id"))
      .agg(max(struct(col("sim"), (-col("centroid_id")).as("neg_cid"))).as("best"))
      .select(col("vec_id"),
        (-col("best.neg_cid")).cast("long").as("centroid_id"),
        col("best.sim").as("sim"))

  /** Mean assignment similarity — the objective the iterations climb
    * (cosine form of minimizing within-cluster distance). */
  def objective(emb: DataFrame, centroids: DataFrame): Double =
    assign(emb, centroids).agg(avg(col("sim"))).collect()(0).getDouble(0)
}
