package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import graft.lake.{Catalog => Lake}

/** `table_changes(catalog_or_root, fromVersion [, toVersion])` — the
  * Delta-style change-feed TABLE-VALUED FUNCTION, registered through
  * `SparkSessionExtensions.injectTableFunction`
  * (`spark.sql.extensions = graft.functions.GraftExtensions`):
  *
  * {{{
  * SELECT * FROM table_changes('graft', 2)          -- (2, head]
  * SELECT * FROM table_changes('graft', 2, 5)       -- (2, 5]
  * SELECT * FROM table_changes('/data/lake-root', 0)
  * }}}
  *
  * The first argument is a registered [[GraftCatalog]] name (resolved
  * through `spark.sql.catalog.<name>.root`), `catalog.table` for a
  * created table's own feed, or a layout root path;
  * the versions are manifest-log commit seqs, `(from, to]` as in
  * [[graft.lake.Catalog.lakeChangesBetween]]. This supersedes the
  * session-conf range of the `lake_changes` DSv2 table
  * (`spark.graft.cdf.startingVersion`/`endingVersion`), which cannot
  * express two ranges in one statement — the conf path remains for
  * plain table reads but new SQL should use this function.
  *
  * The builder replaces the function call with the change-feed
  * DataFrame's analyzed plan — the same manifest-log plan the Scala
  * API builds, so there is no second read path. Non-literal arguments
  * refuse loudly (the range binds at analysis, exactly like
  * `VERSION AS OF`). */
object TableChanges {

  val descriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => LogicalPlan) = (
    FunctionIdentifier("table_changes"),
    new ExpressionInfo(TableChanges.getClass.getName, "table_changes"),
    (args: Seq[Expression]) => build(SparkSession.active, args))

  private def build(spark: SparkSession, args: Seq[Expression]): LogicalPlan = {
    require(args.length == 2 || args.length == 3,
      "table_changes(catalog_or_root, fromVersion[, toVersion]) — got " +
        s"${args.length} args")
    val target = literal(args.head).toString
    val from = asVersion(args(1), "fromVersion")
    val to = if (args.length == 3) asVersion(args(2), "toVersion")
             else Long.MaxValue
    // 'catalog' | 'catalog.table' | a literal layout-root path
    Lake.lakeChangesBetween(spark, GraftAddress.layout(spark, target), from, to)
      .queryExecution.analyzed
  }

  private def literal(e: Expression): Any = e match {
    case Literal(v, _) if v != null => v
    case other => throw new IllegalArgumentException(
      "table_changes: arguments must be literals (the range binds at " +
        s"analysis, like VERSION AS OF) — got $other")
  }

  private def asVersion(e: Expression, what: String): Long = literal(e) match {
    case n: java.lang.Number => n.longValue()
    case other => throw new IllegalArgumentException(
      s"table_changes: $what must be an integer commit seq, got '$other'")
  }
}
