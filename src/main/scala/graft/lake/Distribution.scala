package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-source fan-out — the engine form of the reference's SNS
  * topic-per-source publish (O8–O10,
  * `/root/reference/src/event_recorder/lambda_function.py:55-65`):
  * every record of source s is delivered once under the source's
  * distribution path; subscribers are downstream readers (batch or
  * `readStream`) of `distribution/source=<s>/`.
  *
  * The reference's per-record SNS publish loop has a shadowing bug
  * (`for content in content[source]` clobbers the dict, mis-iterating
  * multi-source batches — SURVEY.md §2.3 item 6); the *intent* — every
  * record of every source published exactly once — is what
  * `partitionBy(source)` gives, shuffle-free and per-record
  * (JSON-lines: one line = one delivered message).
  *
  * The "topic registry" (SSM parameter per source, O10) degenerates to
  * the deterministic path mapping below — resolvable without lookup on
  * both publisher and subscriber side.
  */
object Distribution {

  /** O10: topic-ARN equivalent for a source. */
  def topicPath(layout: Layout, source: String): String =
    s"${layout.distributionDir}/source=$source"

  /** O8+O9: publish a batch of (source, …) records to the per-source
    * distribution area. Rows with the same source co-locate by the
    * partitionBy layout without a shuffle. */
  def publish(batch: DataFrame, layout: Layout): Unit =
    batch.write.mode("append").partitionBy("source").format("json")
      .save(layout.distributionDir)

  /** Subscriber view of one source's stream (the test_subscriber
    * equivalent, `/root/reference/src/test_subscriber/lambda_function.py:8-9`).
    *
    * Compaction-aware: [[Compaction.compactSource]]'s swap is two
    * renames, so there is a window where `source=X` is absent while a
    * `_`-prefixed transient sibling exists. A subscriber that planned
    * in that window used to silently see an EMPTY view of a populated
    * partition; now it detects the in-flight swap (the transient
    * sibling is the marker), waits for it to finish, and fails loudly
    * if it never does — an absent partition with NO marker still means
    * "no data yet", which stays a valid empty view. */
  def subscribe(spark: SparkSession, layout: Layout, source: String,
      maxWaitMs: Long = 10000L, pollMs: Long = 50L): DataFrame = {
    Compaction.awaitQuiescent(spark, layout, source, maxWaitMs, pollMs)
    spark.read.format("json").load(layout.distributionDir)
      .filter(col("source") === source)
  }
}
