package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level FastCDC chunking constants + the canonical fold
  * definition, shared by the native expression below, the declarative
  * `aggregate` twin in [[graft.ops.Dedup]], and the oracle SQL (gear
  * values interpolated as literals).
  *
  * Gear table: 256 pseudo-random 32-bit values, `GEAR[b]` = the first
  * 8 hex digits of md5 of the byte's decimal string — a published,
  * engine-reproducible construction (no runtime hashing anywhere; the
  * table is baked in as literals on every side).
  *
  * Chunking rule per byte b (g, len, fp are the running chunk state):
  * {{{
  *   g   ← (2·g + GEAR[b]) mod 2³¹
  *   len ← len + 1
  *   fp  ← (1000003·fp + b) mod (2³¹ − 1)
  *   cut when (16 ≤ len < 64 ∧ g ≡ 0 mod 128)       — strict mask
  *          ∨ (len ≥ 64       ∧ g ≡ 0 mod 32)       — loose mask
  *          ∨ len ≥ 256                              — forced
  * }}}
  * — the FastCDC normalized-chunking shape: stricter cut odds below
  * the 64-byte normal point, looser above it, hard cap at 256. */
object FastCdc {
  val minLen = 16L
  val normLen = 64L
  val maxLen = 256L

  lazy val gear: Array[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until 256).map { b =>
      md.reset()
      val hex = md.digest(b.toString.getBytes("UTF-8")).map(x => f"$x%02x").mkString
      java.lang.Long.parseLong(hex.take(8), 16)
    }.toArray
  }

  /** DataFrame-surface column: `fastcdc_chunks(text)` →
    * `ARRAY<STRUCT<len: BIGINT, fp: BIGINT>>`. */
  def chunks(c: Column): Column = Bridge.column(FastCdcChunks(Bridge.expression(c)))

  /** The reference fold in plain JVM code over a byte array — the one
    * definition every representation must reproduce. */
  def chunkBytes(bs: Array[Byte]): Array[(Long, Long)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var g = 0L; var len = 0L; var fp = 0L
    var i = 0
    while (i < bs.length) {
      val b = (bs(i) & 0xff).toLong
      g = (g * 2 + gear(b.toInt)) % 2147483648L
      len += 1
      fp = (fp * 1000003L + b) % 2147483647L
      if ((len >= minLen && len < normLen && g % 128 == 0) ||
          (len >= normLen && g % 32 == 0) || len >= maxLen) {
        out += ((len, fp)); g = 0L; len = 0L; fp = 0L
      }
      i += 1
    }
    if (len > 0) out += ((len, fp))
    out.toArray
  }
}

/** Native FastCDC chunker: one tight JVM loop over the string's UTF-8
  * BYTES per row, emitting the chunk (len, fp) list.
  *
  * Why native (the [[DistinctCharBigrams]] reasoning): the
  * declarative twin is a higher-order `aggregate` whose lambda is
  * interpreted PER BYTE — ~6 expression dispatches × every byte of
  * the corpus (measured: q_cdc_bytes 1.7 s warm at sf0.1 on the HOF
  * path, ~0.2 s on this expression — the fold itself is a few
  * arithmetic ops per byte). CodegenFallback costs one boundary per
  * DOCUMENT, orders of magnitude fewer crossings.
  *
  * Semantics: BYTE-level (true CDC over the UTF-8 encoding, any
  * input); the declarative twin's `ascii()` path only matches on
  * single-byte text — the equivalence is pinned on ASCII corpora in
  * Round7OpsSpec, where the oracle comparison lives too. */
/** Native winnowing selector: md5-hash every token `k`-gram and slide
  * a `w`-window minimum in ONE loop per row, returning the DISTINCT
  * selected keys `h·2²⁰ + pos` (smallest hash wins, ties to the
  * earliest position — the deterministic rule the declarative
  * window-min in [[graft.ops.Text.winnowing]] uses; equality pinned
  * in Round7OpsSpec). Replaces a 2.5M-row explode + per-doc ordered
  * window sort with one pass over the doc's own grams. */
case class WinnowKeys(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1 && w >= 1)

  override def prettyName: String = "winnow_keys"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"winnow_keys requires ARRAY<STRING> input, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    val nGrams = n - (k - 1)
    if (nGrams < w) return new GenericArrayData(Array.empty[Any])
    val md = java.security.MessageDigest.getInstance("MD5")
    val keys = new Array[Long](nGrams) // key at gram position i (1-based pos = i+1)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < nGrams) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(if (arr.isNullAt(i + j)) "" else arr.getUTF8String(i + j).toString)
        j += 1
      }
      md.reset()
      val d = md.digest(sb.toString.getBytes("UTF-8"))
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      keys(i) = h * 1048576L + (i + 1)
      i += 1
    }
    val selected = new java.util.LinkedHashSet[java.lang.Long]()
    var p = w - 1 // first FULL window ends at gram index w-1 (pos = w)
    while (p < nGrams) {
      var min = keys(p)
      var q = p - 1
      while (q > p - w) { if (keys(q) < min) min = keys(q); q -= 1 }
      selected.add(min)
      p += 1
    }
    val out = new Array[Any](selected.size)
    val it = selected.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next().longValue(); o += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowKeys {
  def of(tokens: Column, k: Int, w: Int): Column =
    Bridge.column(WinnowKeys(Bridge.expression(tokens), k, w))
}

case class FastCdcChunks(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "fastcdc_chunks"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"fastcdc_chunks requires STRING input, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("len", LongType, nullable = false),
      StructField("fp", LongType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val chunks = FastCdc.chunkBytes(v.asInstanceOf[UTF8String].getBytes)
    val rows = new Array[Any](chunks.length)
    var i = 0
    while (i < chunks.length) {
      rows(i) = new GenericInternalRow(Array[Any](chunks(i)._1, chunks(i)._2))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
