package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for cosine similarity over
  * ARRAY<FLOAT> columns.
  *
  * Why a custom Expression (SURVEY.md §7.3): the composable
  * formulation — `aggregate(zip_with(a,b,*), 0d, +) / (sqrt(…)·sqrt(…))`
  * — uses higher-order functions, which are CodegenFallback: every
  * element pays interpreted-lambda dispatch and the arrays are
  * traversed five times (profiled ~0.14 ms per 64-dim pair). This
  * expression emits a single fused loop inside whole-stage codegen:
  * one pass, three double accumulators, no allocation.
  *
  * Semantics (kept bit-identical to the HOF formulation and the DuckDB
  * oracle `list_cosine_similarity(a::DOUBLE[], b::DOUBLE[])`): each
  * float is widened to double, accumulation is sequential in index
  * order, result = dot / (√Σx² · √Σy²). Null input → null, and a null
  * ELEMENT → null (the HOF aggregate poisons on null; the element scan
  * is only emitted when the schema's containsNull admits it, so
  * containsNull=false stays branch-free). Mismatched lengths use the
  * shorter prefix for the dot product (zip semantics) but full norms —
  * callers should pass equal-dimension vectors.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"cosine_sim requires ARRAY<FLOAT> inputs, got (${left.dataType.sql}, ${right.dataType.sql})")
    }
  override def dataType: DataType = DoubleType
  // a null ELEMENT also nulls the result (HOF-reference semantics:
  // null poisons the aggregate), so nullability follows containsNull
  // too, not just top-level input nullability
  override def nullable: Boolean = left.nullable || right.nullable || mayHaveNullElements
  private def mayHaveNullElements: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  })

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // null element anywhere → null result, matching the HOF reference
    // (zip_with/aggregate propagate null through the accumulator);
    // only checked when the schema admits null elements
    if (mayHaveNullElements) {
      var i = 0
      while (i < x.numElements()) { if (x.isNullAt(i)) return null; i += 1 }
      i = 0
      while (i < y.numElements()) { if (y.isNullAt(i)) return null; i += 1 }
    }
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    var j = n
    while (j < x.numElements()) { val v = x.getFloat(j).toDouble; nx += v * v; j += 1 }
    j = n
    while (j < y.numElements()) { val v = y.getFloat(j).toDouble; ny += v * v; j += 1 }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val v = ctx.freshName("v")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      // null-element scan emitted ONLY when the schema admits null
      // elements — the containsNull=false hot path stays branch-free
      val nullScan = if (mayHaveNullElements) {
        s"""
          |for (int $i = 0; $i < $a.numElements(); $i++) {
          |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
          |}
          |for (int $i = 0; $i < $b.numElements() && !${ev.isNull}; $i++) {
          |  if ($b.isNullAt($i)) { ${ev.isNull} = true; break; }
          |}
          |if (!${ev.isNull}) {
         """.stripMargin
      } else "{"
      s"""
        |$nullScan
        |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  double $x = (double) $a.getFloat($i);
        |  double $y = (double) $b.getFloat($i);
        |  $dot += $x * $y; $nx += $x * $x; $ny += $y * $y;
        |}
        |for (int $i = $n; $i < $a.numElements(); $i++) {
        |  double $v = (double) $a.getFloat($i); $nx += $v * $v;
        |}
        |for (int $i = $n; $i < $b.numElements(); $i++) {
        |  double $v = (double) $b.getFloat($i); $ny += $v * $v;
        |}
        |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
        |}
      """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Column-API entry point: cosine_sim(a, b) over ARRAY<FLOAT>. */
  def cosine_sim(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))
}
