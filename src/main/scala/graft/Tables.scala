package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's parquet testdata (TESTDATA.md).
  *
  * Scale posture: each table is a plain parquet scan — Catalyst handles
  * column pruning + filter pushdown, so callers compose filters freely
  * and the scan stays minimal at any SF (100 TB included: the same code
  * over a partitioned lake path prunes directories before reading).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** `events.parquet` stores TIMESTAMP(NANOS); see [[Events.events]]. */
  def events(s: SparkSession, d: String): DataFrame = Events.events(s, d)

  /** The closed event-type vocabulary of `events.parquet` — the ONE
    * declared list every static pivot/unpivot/salt-map over
    * `event_type` must use, so schema growth is a single edit (and a
    * single failing pin test, `EventOpsSpec`) instead of a silently
    * dropped category in one of several hardcoded copies. */
  val eventTypes: Seq[String] =
    Seq("click", "error", "purchase", "signup", "view")
}
