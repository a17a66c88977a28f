package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native SimHash fingerprinting: `simhash_fields(tokens)` computes
  * the document's `nBands`×16-bit SimHash fields in ONE loop per row —
  * md5 per token (digest object reused), ±1 per bit per band summed,
  * sign → bit.
  *
  * Replaces the declarative shape value-for-value (pinned in
  * Round7OpsSpec): explode(tokens) → one md5 + 16·nBands
  * shift/mask/sum columns per TOKEN row → per-doc agg. That shape
  * shuffles the (partially-aggregated) token stream and pays
  * expression dispatch per token×bit; this pays one codegen boundary
  * per DOCUMENT ([[DistinctCharBigrams]]'s reasoning) and emits the
  * fingerprint AT THE SCAN — no explode, no agg, no shuffle before
  * the band join. Duplicate tokens weigh bits by frequency, exactly
  * like the exploded form.
  *
  * Band m's 16-bit slice = md5 hex digits 4m+1..4m+4 (digest bytes
  * 2m, 2m+1 big-endian) — identical to the
  * `conv(substring(md5(token), 1+4m, 4), 16, 10)` column and the
  * oracle's `('0x' || substr(md5(token), …))::BIGINT`. */
case class SimHashFields(child: Expression, nBands: Int)
    extends UnaryExpression with CodegenFallback {

  require(nBands >= 1 && nBands <= 8, "md5 yields at most 8 16-bit slices")

  override def prettyName: String = "simhash_fields"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash_fields requires ARRAY<STRING> input, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val md = java.security.MessageDigest.getInstance("MD5")
    val sums = new Array[Int](nBands * 16)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        val digest = md.digest(arr.getUTF8String(i).getBytes)
        var m = 0
        while (m < nBands) {
          val h = ((digest(2 * m) & 0xff) << 8) | (digest(2 * m + 1) & 0xff)
          var j = 0
          while (j < 16) {
            sums(m * 16 + j) += (((h >> j) & 1) << 1) - 1 // bit → +1, else −1
            j += 1
          }
          m += 1
        }
      }
      i += 1
    }
    val fields = new Array[Any](nBands)
    var m = 0
    while (m < nBands) {
      var f = 0L
      var j = 0
      while (j < 16) {
        if (sums(m * 16 + j) > 0) f |= 1L << j
        j += 1
      }
      fields(m) = f
      m += 1
    }
    new GenericArrayData(fields)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashFields {
  /** DataFrame-surface column: nBands 16-bit fields as ARRAY<BIGINT>. */
  def of(tokens: Column, nBands: Int): Column =
    Bridge.column(SimHashFields(Bridge.expression(tokens), nBands))
}
