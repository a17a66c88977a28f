package graft.streaming

import graft.functions.FastCdc
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, ValueState}

/** Streaming chunk-level storage dedup — FastCDC at INGEST: each
  * arriving record is chunked by the native
  * [[graft.functions.FastCdcChunks]] expression, chunk fingerprints
  * are checked against the persistent SEEN set (keyed state, one
  * survivor per fingerprint), and the query emits the per-chunk
  * verdicts a dedup store acts on (store the chunk vs reference the
  * existing copy). This is the rsync/LBFS backup-ingest shape: the
  * dedup RATIO comes out as a running aggregate over the verdicts.
  *
  * Semantics (first-occurrence): the FIRST arrival of a fingerprint
  * is `is_new = true`, every later arrival false — identical to the
  * batch rule "distinct fp keeps one copy", so stream ≡ batch is
  * testable exactly (StreamCdcSpec pins it under shuffled framings;
  * which duplicate WITHIN one micro-batch wins is arrival-order
  * dependent, but the chosen survivor carries the same fp and len, so
  * every downstream number is framing-invariant).
  *
  * Scale: chunking is stateless per record (the one-loop native
  * expression); the seen-set is hash-partitioned by fingerprint
  * across the state store — state size = distinct chunks, the same
  * bound the batch dedup's shuffle pays, and the RocksDB store spills
  * it. No shuffle of the chunk stream beyond the state-key
  * partitioning. */
object StreamCdc {

  /** One chunk occurrence: where it came from, its fingerprint, its
    * byte length, and whether this occurrence is the fingerprint's
    * first (the copy a dedup store would persist). */
  final case class ChunkVerdict(source: String, key: String, fp: Long,
      len: Long, isNew: Boolean)

  final case class ChunkOcc(source: String, key: String, fp: Long, len: Long)

  /** First-occurrence marker per fingerprint (persistent across
    * batches; no TTL — a dedup store's index lives as long as the
    * store; wire a TTLConfig here for windowed dedup stores). */
  class SeenChunkProcessor
      extends StatefulProcessor[Long, ChunkOcc, ChunkVerdict] {
    @transient private var seen: ValueState[Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Boolean]("seen", Encoders.scalaBoolean,
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[ChunkOcc],
        timerValues: TimerValues): Iterator[ChunkVerdict] = {
      // consume eagerly: the state handle must not be touched from a
      // lazily-evaluated iterator after the processor call returns
      val occs = rows.toList
      val alreadySeen = seen.exists()
      if (occs.nonEmpty && !alreadySeen) seen.update(true)
      occs.zipWithIndex.iterator.map { case (o, i) =>
        ChunkVerdict(o.source, o.key, o.fp, o.len, !alreadySeen && i == 0)
      }
    }
  }

  /** Chunk a (source, key, json) record stream and emit per-chunk
    * first-occurrence verdicts. */
  def verdicts(spark: SparkSession, records: DataFrame): Dataset[ChunkVerdict] = {
    import spark.implicits._
    records
      .select(col("source"), col("key"),
        explode(FastCdc.chunks(col("json"))).as("ch"))
      .select(col("source"), col("key"),
        col("ch.fp").as("fp"), col("ch.len").as("len"))
      .as[ChunkOcc]
      .groupByKey(_.fp)
      .transformWithState(new SeenChunkProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append())
  }

  /** Batch twin of the running totals: per source, total chunk bytes,
    * bytes a dedup store actually persists (one copy per fingerprint —
    * global first-occurrence, so a chunk shared across sources is
    * charged to the source that arrived first), and the savings rate.
    * The spec pins stream-verdict rollups to this. */
  def savingsOf(verdicts: DataFrame): DataFrame =
    verdicts.groupBy(col("source"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("len")).cast("long").as("total_bytes"),
        sum(when(col("isNew"), col("len")).otherwise(0L)).cast("long")
          .as("stored_bytes"))
      .withColumn("saved_ppm",
        expr("((total_bytes - stored_bytes) * 1000000) DIV total_bytes"))
      .orderBy(col("source"))
}
