package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import graft.lake.{Catalog => Lake}

/** The READ-ONLY maintenance surface as `CALL`-style TABLE-VALUED
  * FUNCTIONS — registered through the same `injectTableFunction`
  * pattern as [[TableChanges]]:
  *
  * {{{
  * SELECT * FROM lake_fsck('graft')           -- consistency audit
  * SELECT * FROM lake_vacuum('graft', 0, 'dry') -- count reclaimable
  * }}}
  *
  * TVF builders run at ANALYSIS — `EXPLAIN SELECT * FROM f(…)` runs
  * the builder — so ONLY verbs that touch nothing live here: `lake_fsck`
  * and the DRY vacuum (Delta's `VACUUM … DRY RUN`). Every MUTATING
  * verb is a [[GraftSqlParser]] STATEMENT (`OPTIMIZE` / `VACUUM` /
  * `CHECKPOINT` / `MATERIALIZE DELETES` / `RESTORE TABLE`), whose
  * command body runs at execution only. The old mutating TVF names
  * remain registered as loud refusals naming their statement — a
  * round-11 caller migrates with a copy-paste, never with a silent
  * no-op.
  *
  * The first argument is a registered [[GraftCatalog]] name,
  * `catalog.table` for a created table, or a layout root
  * ([[GraftAddress]]). */
object Maintenance {

  type Descriptor = (FunctionIdentifier, ExpressionInfo,
    Seq[Expression] => LogicalPlan)

  private def literal(e: Expression, fn: String): Any = e match {
    case Literal(v, _) if v != null => v
    case other => throw new IllegalArgumentException(
      s"$fn: arguments must be literals, got $other")
  }

  private def numArg(args: Seq[Expression], fn: String, what: String,
      default: Long): Long = {
    require(args.length <= 1, s"$fn takes at most one $what argument")
    val v = args.headOption.map(literal(_, fn) match {
      case n: java.lang.Number => n.longValue()
      case other => throw new IllegalArgumentException(
        s"$fn: $what must be an integer, got '$other'")
    }).getOrElse(default)
    require(v >= 0, s"$fn: $what must be non-negative, got $v")
    v
  }

  /** A retired mutating TVF: refuses at analysis, naming the statement
    * that replaced it and why (EXPLAIN must never mutate). */
  private def movedToStatement(name: String, statement: String): Descriptor = (
    FunctionIdentifier(name),
    new ExpressionInfo(Maintenance.getClass.getName, name),
    (_: Seq[Expression]) => throw new UnsupportedOperationException(
      s"$name(…) is now the statement `$statement` — table-valued " +
        "functions build at analysis, so EXPLAIN would have executed " +
        "the verb; the statement form runs at execution only"))

  val optimizeDescriptor: Descriptor = movedToStatement("lake_optimize",
    "OPTIMIZE <catalog>.<table> [TARGET <bytes>] [ZORDER BY (c1, c2)]")
  val checkpointDescriptor: Descriptor = movedToStatement("lake_checkpoint",
    "CHECKPOINT <catalog>.<table>")
  val materializeDescriptor: Descriptor = movedToStatement(
    "lake_materialize_deletes", "MATERIALIZE DELETES <catalog>.<table>")

  /** `lake_vacuum(root, graceMs, 'dry')` →
    * [[graft.lake.Catalog.vacuumLake]] DRY RUN: count the reclaimable
    * files, delete nothing — read-only, so the TVF form is sound. The
    * wet form is the `VACUUM` statement. */
  val vacuumDescriptor: Descriptor = (
    FunctionIdentifier("lake_vacuum"),
    new ExpressionInfo(Maintenance.getClass.getName, "lake_vacuum"),
    (args: Seq[Expression]) => {
      require(args.nonEmpty,
        "lake_vacuum(catalog_or_root, graceMs, 'dry') needs the " +
          "catalog/root argument")
      val dry = args.lastOption.map(literal(_, "lake_vacuum")).exists {
        case s: org.apache.spark.unsafe.types.UTF8String => s.toString == "dry"
        case s: String => s == "dry"
        case _ => false
      }
      if (!dry) throw new UnsupportedOperationException(
        "lake_vacuum(…) without the 'dry' literal is now the statement " +
          "`VACUUM <catalog>.<table> [RETAIN <n> HOURS]` — table-valued " +
          "functions build at analysis, so EXPLAIN would have deleted " +
          "files; only the read-only DRY form stays a TVF")
      val spark = SparkSession.active
      val target = literal(args.head, "lake_vacuum").toString
      val layout = GraftAddress.layout(spark, target)
      val result = Lake.vacuumLake(spark, layout,
        graceMs = numArg(args.drop(1).dropRight(1), "lake_vacuum", "graceMs",
          24L * 3600 * 1000),
        dryRun = true)
      val head = Lake.headVersion(spark, layout)
      import spark.implicits._
      Seq(("vacuum_dry", result, head)).toDF("verb", "result", "head_version")
        .queryExecution.analyzed
    })

  /** `lake_fsck(root)` → [[graft.lake.Catalog.fsckLake]] — the
    * consistency audit as a multi-row TVF (read-only and idempotent,
    * so the EXPLAIN-runs-it caveat is harmless). */
  val fsckDescriptor: Descriptor = (
    FunctionIdentifier("lake_fsck"),
    new ExpressionInfo(Maintenance.getClass.getName, "lake_fsck"),
    (args: Seq[Expression]) => {
      require(args.length == 1, "lake_fsck(catalog_or_root)")
      val spark = SparkSession.active
      val target = literal(args.head, "lake_fsck").toString
      Lake.fsckLake(spark, GraftAddress.layout(spark, target))
        .queryExecution.analyzed
    })

  val descriptors: Seq[Descriptor] = Seq(optimizeDescriptor,
    vacuumDescriptor, checkpointDescriptor, materializeDescriptor,
    fsckDescriptor)
}
