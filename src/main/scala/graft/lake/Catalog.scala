package graft.lake

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One catalog row per ingested data object — the engine's equivalent
  * of the reference's DynamoDB table (partition key `Source`, sort key
  * `Timestamp`, attribute `Key`;
  * `/root/reference/serverless_datalake/serverless_datalake_stack.py:63-77`,
  * rows built at `/root/reference/src/event_recorder/lambda_function.py:16-31`).
  *
  * Semantics preserved (SURVEY.md §2.3):
  *  - `ts` is ARRIVAL time (the reference uses SQS SentTimestamp, not
  *    event time); `tsRaw` keeps the reference's 13-digit epoch-millis
  *    string for bit-compatibility with its lexicographic BETWEEN.
  *  - append-only; replay never appends (enforced in [[Replay]]).
  *
  * Semantics fixed: range comparison is native TimestampType, not
  * string comparison (identical results for 13-digit-era strings).
  */
final case class CatalogEntry(source: String, ts: java.sql.Timestamp, tsRaw: String, key: String)

object Catalog {

  /** O6+O7: project (source, ts, key) and append to the catalog table.
    * Parquet append partitioned by source — the write is distributed,
    * uncapped (the reference's DynamoDB 25-item batch cap and its
    * silent drop of unprocessed items have no equivalent here), and
    * the layout gives replay partition pruning on source. */
  def append(spark: SparkSession, layout: Layout, entries: Dataset[CatalogEntry]): Unit =
    entries.toDF()
      .write.mode("append")
      .partitionBy("source")
      .parquet(layout.catalogDir)

  /** Derive catalog entries for a batch of ingested records that carry
    * `source` + `key` (object path) columns; arrival time is stamped
    * once per batch (the micro-batch is the unit of arrival, like the
    * reference's SQS delivery). */
  def entriesFor(batch: DataFrame, arrivalMs: Long): Dataset[CatalogEntry] = {
    import batch.sparkSession.implicits._
    batch.select(col("source"), col("key")).distinct()
      .withColumn("ts", timestamp_millis(lit(arrivalMs)))
      .withColumn("tsRaw", lit(arrivalMs.toString))
      .select(col("source"), col("ts"), col("tsRaw"), col("key"))
      .as[CatalogEntry]
  }

  def load(spark: SparkSession, layout: Layout): DataFrame =
    spark.read.parquet(layout.catalogDir)

  /** O11: `Source = s AND ts BETWEEN t0 AND t1`. Equality on the
    * partition column prunes directories (DynamoDB partition-key
    * equality); the range predicate pushes into parquet row-group
    * min/max stats (sort-key BETWEEN). Storage-side pruning at any SF. */
  def rangeQuery(spark: SparkSession, layout: Layout, source: String,
      t0: java.sql.Timestamp, t1: java.sql.Timestamp): DataFrame =
    load(spark, layout)
      .filter(col("source") === source && col("ts").between(t0, t1))
}
