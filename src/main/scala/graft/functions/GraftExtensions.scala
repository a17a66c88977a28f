package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point — registers the engine's native
  * expressions into the SQL function registry, so plain SQL users get
  * them too:
  *
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  *     ...
  *   spark.sql("SELECT cosine_sim(a.embedding, b.embedding) ...")
  * }}}
  *
  * (Injected functions are the (b)-tier of the custom-operator ladder
  * in SURVEY.md §7.3 — no planner rules are needed anywhere in this
  * engine, the DataFrame surface plus these expressions cover it.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.cosineSimDescriptor)
  }
}

object GraftExtensions {
  type FunctionDescriptor =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val cosineSimDescriptor: FunctionDescriptor = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "cosine_sim takes exactly 2 arguments")
      CosineSimilarity(children.head, children(1))
    })

  /** Imperative registration for an existing session (tests, REPL). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val (_, _, builder) = cosineSimDescriptor
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", builder, "built-in")
  }
}
