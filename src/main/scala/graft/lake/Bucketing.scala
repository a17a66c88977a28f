package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (co-located) table layout — the shuffle-elimination tool
  * for repeated fact⋈fact joins (SURVEY.md §2.2 joins row; the
  * `lineitem⋈orders` class of query).
  *
  * A sort-merge join between two tables bucketed AND sorted on the
  * join key needs no exchange at all: each task zips bucket i of both
  * sides. At 100 TB this converts the dominant per-query shuffle
  * (terabytes over the network, repeated per query) into a one-time
  * layout cost at write — the standard warehouse-layout decision for
  * fact tables that join on the same key daily.
  */
object Bucketing {

  /** Persist `df` as a bucketed+sorted table on `key`. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket keys — with matching
    * bucket counts the planner emits a zero-exchange sort-merge join. */
  def colocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      leftKey: String, rightKey: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable),
      org.apache.spark.sql.functions.col(leftKey) === org.apache.spark.sql.functions.col(rightKey))
}
