package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.Row
import graft.lake.{Catalog => Lake, Layout}

/** The statements Spark's grammar lacks and no injection point can
  * express — a DELEGATING parser (the Delta `DeltaSqlParser` pattern,
  * the public precedent for out-of-tree lakehouse statements):
  * everything that is not one of the verbs below passes to Spark's own
  * parser verbatim, so the session's SQL surface is otherwise
  * unchanged.
  *
  * Verbs (a trailing `;` is accepted; `<tbl>` is `catalog.table`,
  * a bare catalog name — its root `lake` table — or a layout root,
  * resolved through [[GraftAddress]] at EXECUTION so `EXPLAIN` stays
  * side-effect-free):
  * {{{
  * RESTORE TABLE graft.events TO VERSION AS OF 3
  * RESTORE TABLE graft.lake TO TIMESTAMP AS OF '2026-08-16 12:00:00'
  * OPTIMIZE graft.events [TARGET 268435456] [ZORDER BY (ts, user_id)]
  * VACUUM graft.events [RETAIN 168 HOURS] [DRY RUN]
  * CHECKPOINT graft.events
  * MATERIALIZE DELETES graft.events
  * }}}
  *
  * Why statements and not TVFs: TVF builders run at ANALYSIS, so
  * `EXPLAIN SELECT * FROM lake_optimize(…)` would run the optimize —
  * observable (rewritten files, a pruned log) even when the verb is
  * content-preserving. Every verb that MUTATES storage is therefore a
  * statement whose command body runs only at execution, exactly like
  * MERGE/UPDATE ([[GraftDmlRule]]); the TVF face remains only for the
  * read-only forms ([[Maintenance]]: `lake_fsck`, dry `lake_vacuum`).
  *
  * Each maintenance statement returns one row
  * `(verb, result, head_version)` — `result` the verb's own count
  * (files rewritten / reclaimed, the checkpoint seq, -1 for nothing to
  * do), `head_version` the log head AFTER the verb. RESTORE returns
  * `(restored_to_version, commit_seq)`. */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  import GraftSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    // Spark's grammar owns EXPLAIN and would re-parse the inner
    // statement itself (never reaching this parser) — intercept the
    // prefix so EXPLAIN <graft statement> plans without executing
    case Explain(mode, rest) if graftStatement(rest) =>
      org.apache.spark.sql.execution.command.ExplainCommand(
        parsePlan(rest),
        mode = org.apache.spark.sql.execution.ExplainMode.fromString(
          Option(mode).map(_.trim.toLowerCase).getOrElse("simple")))
    case Restore(table, how, valueRaw) if graftTarget(table) =>
      val value = valueRaw.trim
      val t = tableAddress(table, "RESTORE TABLE")
      GraftRestoreCommand(t,
        if (how.equalsIgnoreCase("VERSION")) Left(value.toLongOption.getOrElse(
          throw new IllegalArgumentException(
            s"RESTORE … VERSION AS OF wants a commit seq, got '$value'")))
        else Right(unquote(value)))
    case Optimize(table, target, zcols) if graftTarget(table) =>
      val targetBytes = Option(target).map(_.toLong).getOrElse(128L << 20)
      require(targetBytes > 0, s"OPTIMIZE TARGET must be positive")
      val zdims: Seq[String] = Option(zcols).map { cs =>
        val cols = cs.split(',').map(_.trim.stripPrefix("`").stripSuffix("`"))
          .filter(_.nonEmpty).toSeq
        require(cols.length >= 1 && cols.length <= 6,
          "ZORDER BY wants 1..6 columns (one column degrades to a " +
            "linear range-sort, like Delta; 2..6 Z-interleave), got " +
            s"(${cols.mkString(", ")})")
        cols
      }.getOrElse(Seq.empty)
      GraftMaintenanceCommand("optimize", tableAddress(table, "OPTIMIZE"),
        (s, l) => Lake.optimizeLake(s, l, targetBytes = targetBytes,
          zorderCols = zdims))
    case Vacuum(table, hours, dry) if graftTarget(table) =>
      val graceMs = Option(hours).map(_.toLong * 3600 * 1000)
        .getOrElse(24L * 3600 * 1000)
      val dryRun = dry != null
      GraftMaintenanceCommand(if (dryRun) "vacuum_dry" else "vacuum",
        tableAddress(table, "VACUUM"),
        (s, l) => Lake.vacuumLake(s, l, graceMs = graceMs, dryRun = dryRun))
    case Checkpoint(table) if graftTarget(table) =>
      GraftMaintenanceCommand("checkpoint", tableAddress(table, "CHECKPOINT"),
        (s, l) => {
          val seq = Lake.checkpoint(s, l)
          Lake.pruneLog(s, l)
          seq.getOrElse(-1L)
        })
    case Materialize(table) if graftTarget(table) =>
      GraftMaintenanceCommand("materialize_deletes",
        tableAddress(table, "MATERIALIZE DELETES"),
        (s, l) => Lake.materializeLakeDeletes(s, l))
    case Move(src, dst, pred) if graftTarget(src) && graftTarget(dst) =>
      // validate the predicate's GRAMMAR at parse time (loud syntax
      // errors stay at the statement), resolution happens at
      // execution against the source snapshot
      delegate.parseExpression(pred)
      GraftMoveCommand(tableAddress(src, "MOVE"),
        tableAddress(dst, "MOVE … TO"), pred)
    case DescribeHistory(table) if graftTarget(table) =>
      // the Delta `DESCRIBE HISTORY` syntax, REWRITTEN onto the
      // derived `_history` surface (one engine path, no second
      // history reader to drift): `<cat>.<t>` → `<cat>.<t>_history`,
      // a bare catalog → its root `lake_history`
      val t = tableAddress(table, "DESCRIBE HISTORY")
      require(!t.contains("/"),
        "DESCRIBE HISTORY wants a catalog table (the `_history` " +
          "surface); for a bare layout path use the typed " +
          "Catalog.lakeHistory")
      val rewritten =
        if (t.contains(".")) s"${t}_history"
        else s"$t.lake_history"
      delegate.parsePlan(s"SELECT * FROM $rewritten")
    case _ => delegate.parsePlan(sqlText)
  }

  /** Strip backticks per part; refuse derived surfaces (maintenance
    * lands on base tables only). A literal layout-root PATH target
    * (contains '/') is exempt — the suffix reservation is an
    * identifier rule, and a root named `…/pipeline_history` is a
    * perfectly valid directory. */
  private def tableAddress(raw: String, verb: String): String = {
    val parts = raw.split('.').map(_.stripPrefix("`").stripSuffix("`"))
    require(raw.contains("/") ||
        (!GraftAddress.DerivedSuffixes.exists(parts.last.endsWith) &&
          parts.last != GraftAddress.RootCatalogName),
      s"$verb wants a base table, got derived surface '$raw'")
    parts.mkString(".")
  }

  private def unquote(v: String): String =
    if (v.length >= 2 && (v.head == '\'' || v.head == '"') && v.last == v.head)
      v.substring(1, v.length - 1)
    else v

  /** Parameterized `spark.sql(text, args)`: the delegate OVERRIDES the
    * interface default (its parameter substitution lives there), so
    * forward rather than inherit — graft statements take no parameters
    * and go through [[parsePlan]]. An EXPLAIN short-circuits here ONLY
    * when its inner statement actually parses as a graft verb: an
    * EXPLAIN whose inner text merely STARTS with a verb-looking word
    * but belongs to Spark's grammar must delegate WITH the
    * ParameterContext, or its parameter markers would go unbound. */
  override def parsePlanWithParameters(sqlText: String,
      ctx: org.apache.spark.sql.catalyst.parser.ParameterContext): LogicalPlan =
    sqlText match {
      case _ if graftStatement(sqlText) => parsePlan(sqlText)
      case Explain(_, rest) if graftStatement(rest) => parsePlan(sqlText)
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

  /** `OPTIMIZE <ident> [TARGET <bytes>] [ZORDER BY (c1, c2)][;]`. */
  private val Optimize =
    ("""(?is)\s*OPTIMIZE\s+([\w.$`/\-]+)""" +
      """(?:\s+TARGET\s+(\d+))?""" +
      """(?:\s+ZORDER\s+BY\s*\(([^)]+)\))?\s*;?\s*""").r

  /** `VACUUM <ident> [RETAIN <n> HOURS] [DRY RUN][;]` (Delta's form). */
  private val Vacuum =
    ("""(?is)\s*VACUUM\s+([\w.$`/\-]+)""" +
      """(?:\s+RETAIN\s+(\d+)\s+HOURS)?""" +
      """(?:\s+(DRY\s+RUN))?\s*;?\s*""").r

  /** `CHECKPOINT <ident>[;]` — fold the log + prune folded records. */
  private val Checkpoint =
    """(?is)\s*CHECKPOINT\s+([\w.$`/\-]+)\s*;?\s*""".r

  /** `MATERIALIZE DELETES <ident>[;]` — rewrite DV'd files. */
  private val Materialize =
    """(?is)\s*MATERIALIZE\s+DELETES\s+([\w.$`/\-]+)\s*;?\s*""".r

  /** `DESCRIBE HISTORY <ident>[;]` (Delta's syntax) — rewritten onto
    * the `_history` derived surface. */
  private val DescribeHistory =
    """(?is)\s*DESCRIBE\s+HISTORY\s+([\w.$`/\-]+)\s*;?\s*""".r

  /** `MOVE <src> TO <dst> WHERE <predicate>[;]` — the atomic
    * quarantine/reconciliation statement
    * ([[graft.lake.Catalog.moveLakeRows]]): matching rows leave `src`
    * and land in `dst` under ONE transaction marker. */
  private val Move =
    """(?is)\s*MOVE\s+([\w.$`/\-]+)\s+TO\s+([\w.$`/\-]+)\s+WHERE\s+(.+?)\s*;?\s*""".r

  /** Is this target OURS to execute? A literal layout-root path
    * always is; an identifier only when its catalog (the first dotted
    * part, or the whole name) is REGISTERED to [[GraftCatalog]].
    * Anything else DELEGATES — `RESTORE TABLE` / `OPTIMIZE` / `VACUUM`
    * / `DESCRIBE HISTORY` are also Delta's public syntax, and a
    * session chaining both parsers must route each statement to the
    * engine that owns the table (review catch: unconditional capture
    * stole other catalogs' statements). */
  private[sql] def graftTarget(raw: String): Boolean = {
    val base = raw.split('.').head.stripPrefix("`").stripSuffix("`")
    if (raw.contains("/")) {
      // a literal layout-root path is ours — UNLESS the dotted prefix
      // names a catalog registered to a FOREIGN implementation: that
      // is another lakehouse's path form (Delta's
      // ``RESTORE TABLE delta.`/path/to/t` ``) and claiming it would
      // steal the statement only to fail in existingLayout
      // (advice-r13 catch). A prefix registered to graft, or no
      // registered prefix at all, keeps the path ours.
      val foreign = base != raw && !base.contains("/") &&
        org.apache.spark.sql.SparkSession.getActiveSession.exists(s =>
          s.conf.getOption(s"spark.sql.catalog.$base")
            .exists(impl => !impl.contains("GraftCatalog")))
      return !foreign
    }
    // no active session on the parsing thread (a harness driving the
    // parser directly): fall back to claiming the verb — graft-only
    // deployments keep working; precise mixed-session routing (both
    // here and in the path form above) needs the session's catalog
    // registrations and therefore only happens inside sql()
    org.apache.spark.sql.SparkSession.getActiveSession.forall(s =>
      s.conf.getOption(s"spark.sql.catalog.$base")
        .exists(_.contains("GraftCatalog")))
  }

  private[sql] def graftStatement(text: String): Boolean = (text match {
    case Restore(t, _, _) => Some(t)
    case Optimize(t, _, _) => Some(t)
    case Vacuum(t, _, _) => Some(t)
    case Checkpoint(t) => Some(t)
    case Materialize(t) => Some(t)
    case DescribeHistory(t) => Some(t)
    case Move(s, d, _) => return graftTarget(s) && graftTarget(d)
    case _ => None
  }).exists(graftTarget)

  private val Explain =
    ("""(?is)\s*EXPLAIN(\s+EXTENDED|\s+FORMATTED|\s+CODEGEN|\s+COST)?""" +
      """\s+((?:RESTORE|OPTIMIZE|VACUUM|CHECKPOINT|MATERIALIZE|MOVE|""" +
      """DESCRIBE\s+HISTORY)\s.+)""").r
}

/** The captured RESTORE statement: resolves the table address
  * (`catalog.table` / bare catalog / root path — [[GraftAddress]]) to
  * its layout at EXECUTION (so `EXPLAIN` stays side-effect-free) and
  * commits the metadata-only rewind ([[graft.lake.Catalog.restoreLake]]). */
case class GraftRestoreCommand(catalogOrRoot: String,
    target: Either[Long, String]) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("restored_to_version", LongType, nullable = false)(),
    AttributeReference("commit_seq", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val layout = GraftAddress.existingLayout(spark, catalogOrRoot)
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

/** The captured `MOVE <src> TO <dst> WHERE <pred>` statement — the
  * atomic quarantine/reconciliation verb: matching rows are DV-deleted
  * from `src` and appended to `dst` under ONE `_txn` marker
  * ([[graft.lake.Catalog.moveLakeRows]] — the insert batch and the
  * deletion vector derive from the same under-lock scan, so
  * concurrent deletes can never resurrect rows into `dst`). Address
  * resolution and the move itself run at EXECUTION only (`EXPLAIN`
  * stays side-effect-free). One row
  * `(verb, from_version, to_version)`; both -1 when nothing matched. */
case class GraftMoveCommand(fromTable: String, toTable: String,
    predicateSql: String) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("verb", StringType, nullable = false)(),
    AttributeReference("from_version", LongType, nullable = false)(),
    AttributeReference("to_version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val fromL = GraftAddress.existingLayout(spark, fromTable)
    val toL = GraftAddress.existingLayout(spark, toTable)
    val (fromSeq, toSeq) = Lake.moveLakeRows(spark, fromL, toL,
      org.apache.spark.sql.functions.expr(predicateSql))
    Seq(Row("move", fromSeq, toSeq))
  }
}

/** A captured maintenance statement (OPTIMIZE / VACUUM / CHECKPOINT /
  * MATERIALIZE DELETES): the verb body runs at EXECUTION only —
  * `EXPLAIN` plans it without touching storage. One row
  * `(verb, result, head_version)`, the [[Maintenance]] TVF shape. */
case class GraftMaintenanceCommand(verb: String, targetTable: String,
    body: (SparkSession, Layout) => Long) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("verb", StringType, nullable = false)(),
    AttributeReference("result", LongType, nullable = false)(),
    AttributeReference("head_version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    // existence-gated: a maintenance verb against a never-written
    // layout is a phantom no-op, not a success (ADVICE r12 catch)
    val layout = GraftAddress.existingLayout(spark, targetTable)
    val result = body(spark, layout)
    Seq(Row(verb, result, Lake.headVersion(spark, layout)))
  }
}
