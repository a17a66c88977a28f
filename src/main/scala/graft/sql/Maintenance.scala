package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import graft.lake.{Catalog => Lake, Layout}

/** The lake's maintenance verbs as `CALL`-style TABLE-VALUED FUNCTIONS
  * — the SQL face Delta exposes as `OPTIMIZE`/`VACUUM` statements,
  * mapped onto the typed API through the same `injectTableFunction`
  * pattern as [[TableChanges]] (no parser fork):
  *
  * {{{
  * SELECT * FROM lake_optimize('graft')            -- compact small files
  * SELECT * FROM lake_optimize('graft', 268435456) -- …to a target size
  * SELECT * FROM lake_vacuum('graft', 0)           -- reclaim removed files
  * SELECT * FROM lake_checkpoint('graft')          -- fold + prune the log
  * SELECT * FROM lake_materialize_deletes('graft') -- rewrite DV'd files
  * }}}
  *
  * Each returns ONE row `(verb, result, head_version)` — `result` is
  * the verb's own count (files compacted / reclaimed / rewritten, the
  * checkpoint seq, -1 where the verb found nothing to do) and
  * `head_version` the log head AFTER the verb. The first argument is
  * a registered [[GraftCatalog]] name or a layout root, exactly like
  * `table_changes`. Numeric arguments must be non-negative literals;
  * anything else refuses loud at analysis.
  *
  * Like every TVF, the builder runs at ANALYSIS — so `EXPLAIN SELECT *
  * FROM lake_optimize(…)` runs the optimize. That is acceptable
  * precisely because every verb here is maintenance-idempotent: a
  * duplicate run converges (optimize finds nothing left to compact,
  * vacuum nothing aged, checkpoint nothing new) and NEVER changes the
  * logical table content — the reason DML verbs (MERGE/UPDATE/DELETE)
  * are statements through [[GraftDmlRule]], not TVFs. */
object Maintenance {

  type Descriptor = (FunctionIdentifier, ExpressionInfo,
    Seq[Expression] => LogicalPlan)

  private def descriptor(name: String)(
      run: (SparkSession, Layout, Seq[Expression]) => Long): Descriptor = (
    FunctionIdentifier(name),
    new ExpressionInfo(Maintenance.getClass.getName, name),
    (args: Seq[Expression]) => {
      require(args.nonEmpty,
        s"$name(catalog_or_root[, arg]) needs the catalog/root argument")
      val spark = SparkSession.active
      val target = literal(args.head, name).toString
      val root = spark.conf.getOption(s"spark.sql.catalog.$target.root")
        .getOrElse(target)
      val layout = Layout(root)
      val result = run(spark, layout, args.tail)
      val head = Lake.headVersion(spark, layout)
      import spark.implicits._
      Seq((name, result, head)).toDF("verb", "result", "head_version")
        .queryExecution.analyzed
    })

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

  /** `lake_optimize(root[, targetBytes])` →
    * [[graft.lake.Catalog.optimizeLake]] (bin-packing small-file
    * compaction, one atomic add+remove record, every prior version
    * still readable). */
  val optimizeDescriptor: Descriptor = descriptor("lake_optimize") {
    (spark, layout, rest) =>
      Lake.optimizeLake(spark, layout,
        targetBytes = numArg(rest, "lake_optimize", "targetBytes", 128L << 20))
  }

  /** `lake_vacuum(root[, graceMs[, 'dry']])` →
    * [[graft.lake.Catalog.vacuumLake]] (physically reclaim files
    * removed from the committed set at least graceMs ago; logical
    * content untouched). The optional third literal `'dry'` makes it
    * Delta's `VACUUM … DRY RUN`: count the reclaimable files, delete
    * nothing — which also keeps the TVF's EXPLAIN-runs-it caveat
    * harmless for the dry form. */
  val vacuumDescriptor: Descriptor = descriptor("lake_vacuum") {
    (spark, layout, rest) =>
      val (numArgs, dry) = rest.lastOption.map(literal(_, "lake_vacuum")) match {
        case Some(s: org.apache.spark.unsafe.types.UTF8String) =>
          require(s.toString == "dry",
            s"lake_vacuum: the mode argument must be 'dry', got '$s'")
          (rest.init, true)
        case Some(s: String) =>
          require(s == "dry", s"lake_vacuum: mode must be 'dry', got '$s'")
          (rest.init, true)
        case _ => (rest, false)
      }
      Lake.vacuumLake(spark, layout,
        graceMs = numArg(numArgs, "lake_vacuum", "graceMs", 24L * 3600 * 1000),
        dryRun = dry)
  }

  /** `lake_checkpoint(root)` → [[graft.lake.Catalog.checkpoint]] +
    * [[graft.lake.Catalog.pruneLog]]: fold the log into one snapshot
    * record and drop superseded lines; returns the checkpoint seq
    * (-1 when there was nothing new to fold). */
  val checkpointDescriptor: Descriptor = descriptor("lake_checkpoint") {
    (spark, layout, rest) =>
      require(rest.isEmpty, "lake_checkpoint takes only the catalog/root")
      val seq = Lake.checkpoint(spark, layout)
      Lake.pruneLog(spark, layout)
      seq.getOrElse(-1L)
  }

  /** `lake_materialize_deletes(root)` →
    * [[graft.lake.Catalog.materializeLakeDeletes]]: rewrite DV'd files
    * without their deleted rows (the physical-erasure half of
    * merge-on-read); returns files rewritten. */
  val materializeDescriptor: Descriptor = descriptor("lake_materialize_deletes") {
    (spark, layout, rest) =>
      require(rest.isEmpty,
        "lake_materialize_deletes takes only the catalog/root")
      Lake.materializeLakeDeletes(spark, layout)
  }

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
      val root = spark.conf.getOption(s"spark.sql.catalog.$target.root")
        .getOrElse(target)
      Lake.fsckLake(spark, Layout(root)).queryExecution.analyzed
    })

  val descriptors: Seq[Descriptor] = Seq(optimizeDescriptor,
    vacuumDescriptor, checkpointDescriptor, materializeDescriptor,
    fsckDescriptor)
}
