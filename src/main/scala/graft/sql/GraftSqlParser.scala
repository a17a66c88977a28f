package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{LongType, StructType}
import org.apache.spark.sql.Row
import graft.lake.{Catalog => Lake, Layout}

/** The one statement Spark's grammar lacks and no injection point can
  * express: `RESTORE TABLE <catalog>.lake TO VERSION|TIMESTAMP AS OF …`
  * — a DELEGATING parser (the Delta `DeltaSqlParser` pattern, the
  * public precedent for out-of-tree lakehouse statements): everything
  * that is not a RESTORE statement passes to Spark's own parser
  * verbatim, so the session's SQL surface is unchanged except for the
  * one new verb.
  *
  * Why not a TVF like the maintenance verbs: TVF builders run at
  * ANALYSIS (`EXPLAIN` would execute them), which [[Maintenance]]
  * accepts only because its verbs are content-preserving and
  * idempotent. RESTORE changes the live content — it must be a
  * statement, like MERGE/UPDATE ([[GraftDmlRule]]).
  *
  * Forms (a trailing `;` is accepted):
  * {{{
  * RESTORE TABLE graft.lake TO VERSION AS OF 3
  * RESTORE TABLE graft.lake TO TIMESTAMP AS OF '2026-08-16 12:00:00'
  * }}}
  * The table must be a registered [[GraftCatalog]]'s `lake` table (or
  * `<root>.lake` with a literal layout root, the
  * [[TableChanges]]/[[Maintenance]] addressing convention). The
  * timestamp form resolves through [[graft.lake.Catalog.versionAtTimestamp]]
  * — same session-timezone epoch-ms contract as `TIMESTAMP AS OF`
  * reads, refusing loud below retained history. Returns one row
  * `(restored_to_version, commit_seq)`; `commit_seq = -1` when head
  * already equals the target. */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  import GraftSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    // Spark's grammar owns EXPLAIN and would re-parse the inner
    // statement itself (never reaching this parser) — intercept the
    // prefix so EXPLAIN RESTORE plans without executing
    case Explain(mode, rest) if Restore.pattern.matcher(rest).matches() =>
      org.apache.spark.sql.execution.command.ExplainCommand(
        parsePlan(rest),
        mode = org.apache.spark.sql.execution.ExplainMode.fromString(
          Option(mode).map(_.trim.toLowerCase).getOrElse("simple")))
    case Restore(table, how, valueRaw) =>
      val value = valueRaw.trim
      val parts = table.split('.').map(_.stripPrefix("`").stripSuffix("`"))
      require(parts.length == 2 && parts.last.equalsIgnoreCase("lake"),
        s"RESTORE TABLE wants <catalog>.lake, got '$table' — only the " +
          "head lake table is restorable")
      GraftRestoreCommand(parts.head,
        if (how.equalsIgnoreCase("VERSION")) Left(value.toLongOption.getOrElse(
          throw new IllegalArgumentException(
            s"RESTORE … VERSION AS OF wants a commit seq, got '$value'")))
        else Right(unquote(value)))
    case _ => delegate.parsePlan(sqlText)
  }

  private def unquote(v: String): String =
    if (v.length >= 2 && (v.head == '\'' || v.head == '"') && v.last == v.head)
      v.substring(1, v.length - 1)
    else v

  /** Parameterized `spark.sql(text, args)`: the delegate OVERRIDES the
    * interface default (its parameter substitution lives there), so
    * forward rather than inherit — a RESTORE statement takes no
    * parameters and goes through [[parsePlan]]. */
  override def parsePlanWithParameters(sqlText: String,
      ctx: org.apache.spark.sql.catalyst.parser.ParameterContext): LogicalPlan =
    sqlText match {
      case Restore(_, _, _) | Explain(_, _) => parsePlan(sqlText)
      case _ => delegate.parsePlanWithParameters(sqlText, ctx)
    }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
}

object GraftSqlParser {
  /** `RESTORE TABLE <ident> TO VERSION|TIMESTAMP AS OF <value>[;]` —
    * anchored and whitespace-tolerant; the value runs to the end so
    * quoted timestamps with spaces survive. */
  private val Restore =
    ("""(?is)\s*RESTORE\s+TABLE\s+([\w.$`]+)\s+TO\s+(VERSION|TIMESTAMP)""" +
      """\s+AS\s+OF\s+(.+?)\s*;?\s*""").r

  private val Explain =
    """(?is)\s*EXPLAIN(\s+EXTENDED|\s+FORMATTED|\s+CODEGEN|\s+COST)?\s+(RESTORE\s.+)""".r
}

/** The captured RESTORE statement: resolves the catalog name to its
  * layout root at EXECUTION (so `EXPLAIN` stays side-effect-free) and
  * commits the metadata-only rewind ([[graft.lake.Catalog.restoreLake]]). */
case class GraftRestoreCommand(catalogOrRoot: String,
    target: Either[Long, String]) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("restored_to_version", LongType, nullable = false)(),
    AttributeReference("commit_seq", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val root = spark.conf.getOption(s"spark.sql.catalog.$catalogOrRoot.root")
      .getOrElse(catalogOrRoot)
    val layout = Layout(root)
    val version = target match {
      case Left(v) => v
      case Right(ts) =>
        val ms = java.sql.Timestamp.valueOf(ts).getTime
        Lake.versionAtTimestamp(spark, layout, ms).getOrElse(
          throw new IllegalArgumentException(
            s"RESTORE … TIMESTAMP AS OF: no committed version at or " +
              s"before '$ts'"))
    }
    val seq = Lake.restoreLake(spark, layout, version)
    Seq(Row(version, seq))
  }
}
