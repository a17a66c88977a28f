package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The `events` table ships as parquet TIMESTAMP(NANOS, int64). Spark
  * has no nanosecond timestamp type and (unlike DuckDB) refuses the
  * physical type outright — `spark.read.parquet` fails at scan time
  * with ILLEGAL_PARQUET_TYPE. The supported escape hatch is
  * `spark.sql.legacy.parquet.nanosAsLong`, which surfaces the column
  * as a raw ns-epoch Long; this loader flips that conf and converts to
  * a microsecond `TimestampType` with *integer* division (truncation),
  * matching DuckDB's `ts::TIMESTAMP` cast exactly — `a / b` on Columns
  * is double division and silently loses precision above 2^53 ns, an
  * off-by-1-µs bug the oracle caught.
  *
  * Every downstream operator — windows, watermarks, as-of joins — sees
  * one canonical event-time type.
  */
object Events {
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/events.parquet")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp")) // session TZ is UTC
      case _ => df
    }
  }
}
