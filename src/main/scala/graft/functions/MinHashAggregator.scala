package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import java.security.MessageDigest

/** The MinHash hashing scheme shared by every surface that produces
  * signatures — the relational formulation ([[graft.ops.Dedup]]), this
  * UDAF, and the DuckDB oracle SQL all derive from these constants, so
  * band values stay byte-identical across surfaces by construction.
  *
  * One md5 per shingle, parsed to a 32-bit int h from the first 8 hex
  * digits; permutation k is the universal-hash mix `(a_k·h + b_k) mod
  * p`, p = 2³¹−1. Bounds: a_k < 2³¹ and h < 2³² keep a_k·h + b_k <
  * 2⁶³ — DuckDB errors on int64 overflow (Java wraps), so staying in
  * range keeps every engine identical.
  */
object MinHashScheme {
  val P: Long = 2147483647L // 2^31 − 1 (prime)
  val A: IndexedSeq[Long] = IndexedSeq(1103515245L, 1200556037L, 1431655765L, 2027485109L)
  val B: IndexedSeq[Long] = IndexedSeq(12345L, 987654321L, 555555555L, 111111111L)

  /** JVM-side h(shingle): first 32 md5 bits as a long (== Spark
    * `conv(substring(md5(s),1,8),16,10)` ≡ DuckDB
    * `('0x'||substr(md5(s),1,8))::BIGINT`). */
  def hash32(md: MessageDigest, shingle: String): Long = {
    val d = md.digest(shingle.getBytes("UTF-8"))
    // first 4 bytes big-endian == first 8 hex digits
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  def mix(k: Int, h: Long): Long = (A(k) * h + B(k)) % P
}

/** Typed UDAF (SURVEY.md §2.2 "UDF/UDAF" row): MinHash signature as an
  * `Aggregator[IN, BUF, OUT]` — aggregates a group's shingles into a
  * k-wide signature of min-mixed shingle hashes, identical in value to
  * the relational formulation in [[graft.ops.Dedup]] (same
  * [[MinHashScheme]]), so either surface can produce signatures.
  *
  * The buffer is a fixed k-array of the current minima — mergeable
  * (element-wise min), so Spark runs it as a proper two-phase
  * (partial/final) aggregate: at 100 TB the shuffle carries one
  * k-array per group per partition, never the shingles.
  *
  * Usage:
  * {{{
  *   val sig = new MinHashAggregator(4).toColumn
  *   shingled.groupByKey(_.docId).agg(sig)   // or groupBy(...).agg(
  *   //   udaf(new MinHashAggregator(4)).apply(col("shingle")))
  * }}}
  */
class MinHashAggregator(k: Int) extends Aggregator[String, Array[Long], Array[Long]] {

  // Long.MaxValue = "no shingle seen yet": mixes are in [0, P) so any
  // real value replaces it; [[finish]] maps an untouched buffer to a
  // NULL signature, matching the relational surface exactly
  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  // one digest per deserialized aggregator copy (= per task), not per
  // shingle: MD5 digest() resets itself after each call, and instance
  // construction per row was measurable in the near-dup profile
  @transient private lazy val md: MessageDigest = MessageDigest.getInstance("MD5")

  override def reduce(buf: Array[Long], shingle: String): Array[Long] = {
    // NULL shingles occur for degenerate docs (explode_outer over an
    // empty shingle array) — the relational min() skips them; so do we
    if (shingle == null) return buf
    val h = MinHashScheme.hash32(md, shingle)
    var i = 0
    while (i < k) {
      val m = MinHashScheme.mix(i, h)
      if (m < buf(i)) buf(i) = m
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) {
      if (b(i) < a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  // a group that never saw a real shingle yields a NULL signature —
  // the relational surface's NULL-band semantics (NULL never
  // equi-joins), NOT a real-looking MaxValue that would collapse every
  // degenerate doc into one fake LSH bucket
  override def finish(buf: Array[Long]): Array[Long] =
    if (buf.forall(_ == Long.MaxValue)) null else buf

  override def bufferEncoder: Encoder[Array[Long]] = MinHashAggregator.arrEnc
  override def outputEncoder: Encoder[Array[Long]] = MinHashAggregator.arrEnc
}

object MinHashAggregator {
  private val arrEnc: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
