package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The `events` table ships as parquet TIMESTAMP(NANOS, int64). Spark has
  * no nanosecond timestamp type; depending on version/config the column
  * either surfaces as TimestampType (truncated) or must be read as Long
  * via `spark.sql.legacy.parquet.nanosAsLong`. This loader normalizes to
  * a microsecond `TimestampType` column `ts` (identical to DuckDB's
  * `ts::TIMESTAMP` truncation) so every downstream operator — windows,
  * watermarks, as-of joins — sees one canonical event-time type.
  */
object Events {
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val path = s"$sfDir/events.parquet"
    val raw =
      try {
        val df = spark.read.parquet(path)
        df.schema("ts").dataType match {
          case org.apache.spark.sql.types.LongType =>
            // nanosAsLong already on: ns epoch → micros
            df.withColumn("ts", timestamp_micros((col("ts") / 1000L).cast("long")))
          case _ => df // TimestampType (or NTZ) already
        }
      } catch {
        case _: Throwable =>
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          spark.read.parquet(path)
            .withColumn("ts", timestamp_micros((col("ts") / 1000L).cast("long")))
      }
    // Normalize TIMESTAMP_NTZ → TIMESTAMP (session TZ is pinned to UTC).
    raw.schema("ts").dataType.typeName match {
      case "timestamp_ntz" => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
}
