package graft.lake

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Source/sink format coverage: the lake's payloads round-trip
  * byte-identically through every columnar/text format and codec the
  * runtime ships (parquet+zstd, ORC+snappy, JSON+gzip, CSV+header) —
  * the capability a user switching storage tiers or exporting to a
  * foreign consumer relies on. Parquet is the lake's canonical format;
  * the others are import/export surfaces. */
class FormatsSpec extends SparkTestBase {

  private def sample = Tables.documents(spark, sfDir)
    .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
    .orderBy(col("doc_id")).limit(50)

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, String, String, Long)] =
    df.select("doc_id", "lang", "source", "n_chars").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[String]("source"), r.getAs[Long]("n_chars"))).sortBy(_._1).toSeq

  test("parquet+zstd, orc+snappy, json+gzip, csv+header all round-trip identically") {
    val expected = rows(sample)
    val base = tmpDir("formats")

    sample.write.option("compression", "zstd").parquet(s"$base/p")
    assert(rows(spark.read.parquet(s"$base/p")) == expected)

    sample.write.option("compression", "snappy").orc(s"$base/o")
    assert(rows(spark.read.orc(s"$base/o")) == expected)

    sample.write.option("compression", "gzip").json(s"$base/j")
    // JSON is schemaless on read: restore types via the writer's schema
    assert(rows(spark.read.schema(sample.schema).json(s"$base/j")) == expected)

    sample.write.option("header", "true").csv(s"$base/c")
    assert(rows(spark.read.option("header", "true").schema(sample.schema)
      .csv(s"$base/c")) == expected)
  }

  test("text payloads with embedded quotes/newlines survive the csv escape round-trip") {
    val s = spark
    import s.implicits._
    val tricky = Seq(
      (1L, "a \"quoted\" value"),
      (2L, "comma, separated, text"),
      (3L, "line\nbreak"),
      (4L, "trailing space "),
      (5L, "")).toDF("id", "text")
    val dir = s"${tmpDir("csv-esc")}/t"
    tricky.write.option("header", "true").option("multiLine", "true")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false").csv(dir)
    // BOTH csv sides TRIM whitespace by default — these options are the
    // capability pin a faithful text export depends on
    val back = spark.read.option("header", "true").option("multiLine", "true")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .schema(tricky.schema).csv(dir)
      .collect().map(r => (r.getLong(0), Option(r.getString(1)).getOrElse(""))).sortBy(_._1).toSeq
    val orig = tricky.collect().map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("")))
      .sortBy(_._1).toSeq
    assert(back == orig)
  }
}
