package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lloyd's k-means over embedding columns, entirely in DataFrames —
  * the trained-centroid upgrade for the IVF index build
  * ([[Similarity.ivfAssign]] uses modulo-sampled centroids for its
  * oracle query; this produces real centroids with the same output
  * contract: (centroid_id, c_emb)).
  *
  * Every iteration is two shuffles, both payload-light:
  *  1. assignment — corpus × k broadcast scores, max-struct agg on
  *     (vec_id, centroid_id, sim) only (no vectors through the agg);
  *  2. re-centering — posexplode to (centroid, pos, component), mean
  *     per (centroid, pos) — k·dim rows — then position-sorted
  *     reassembly.
  * Deterministic: init = k lowest vec_ids; ties in assignment break to
  * the lower centroid id. No collect of vectors at any point.
  */
object KMeansIvf {

  /** Train k centroids with `iters` Lloyd iterations. Returns
    * (centroid_id, c_emb ARRAY<FLOAT>). */
  def trainCentroids(spark: SparkSession, emb: DataFrame, k: Int, iters: Int): DataFrame = {
    var centroids = emb.orderBy(col("vec_id")).limit(k)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("c_emb"))
    // renumber to stable 0..k-1 so iterations compare like-for-like
    centroids = centroids.orderBy(col("centroid_id"))
      .withColumn("centroid_id", row_number()
        .over(org.apache.spark.sql.expressions.Window.orderBy(col("centroid_id"))).cast("long") - 1)

    var i = 0
    while (i < iters) {
      val assigned = assign(emb, centroids)
      val recentered = emb.join(assigned, Seq("vec_id"))
        .select(col("centroid_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("centroid_id"), col("pos"))
        .agg(avg(col("v")).as("m"))
        .groupBy(col("centroid_id"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          x => x.getField("m").cast("float")).as("c_emb"))
      // a centroid that captured no vectors keeps its previous
      // position — the function always returns exactly k centroids
      centroids = centroids
        .select(col("centroid_id"), col("c_emb").as("prev_emb"))
        .join(recentered, Seq("centroid_id"), "left")
        .select(col("centroid_id"), coalesce(col("c_emb"), col("prev_emb")).as("c_emb"))
        // materialize each iteration (k rows — trivially cheap): each
        // assign() broadcasts the centroid frame, and a broadcast
        // EXECUTES its plan — without truncation iteration i's
        // broadcast re-runs iterations 1..i-1 and training cost grows
        // superlinearly in iters (profiled: 2 iters ≈ 3 s at sf0.1
        // where the per-iteration work is < 1 s)
        .localCheckpoint()
      i += 1
    }
    centroids
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
