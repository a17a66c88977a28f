package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import java.security.MessageDigest

/** Typed UDAF (SURVEY.md §2.2 "UDF/UDAF" row): MinHash signature as an
  * `Aggregator[IN, BUF, OUT]` — aggregates a group's shingles into a
  * k-wide signature of lexicographic-min salted md5s, identical in
  * value to the relational formulation in [[graft.ops.Dedup]] (same
  * salt|shingle hashing), so either surface can produce signatures.
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
class MinHashAggregator(k: Int) extends Aggregator[String, Array[String], Array[String]] {

  override def zero: Array[String] = Array.fill(k)(null)

  override def reduce(buf: Array[String], shingle: String): Array[String] = {
    val md = MessageDigest.getInstance("MD5")
    var i = 0
    while (i < k) {
      val h = MinHashAggregator.hex(md.digest(s"$i|$shingle".getBytes("UTF-8")))
      if (buf(i) == null || h < buf(i)) buf(i) = h
      i += 1
    }
    buf
  }

  override def merge(a: Array[String], b: Array[String]): Array[String] = {
    var i = 0
    while (i < k) {
      if (a(i) == null || (b(i) != null && b(i) < a(i))) a(i) = b(i)
      i += 1
    }
    a
  }

  override def finish(buf: Array[String]): Array[String] = buf

  override def bufferEncoder: Encoder[Array[String]] = MinHashAggregator.arrEnc
  override def outputEncoder: Encoder[Array[String]] = MinHashAggregator.arrEnc
}

object MinHashAggregator {
  private val arrEnc: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()

  private[functions] def hex(bytes: Array[Byte]): String = {
    val sb = new StringBuilder(bytes.length * 2)
    bytes.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }
}
