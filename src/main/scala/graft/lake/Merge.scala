package graft.lake

import org.apache.spark.sql.{Column, DataFrame, GraftDmlBridge, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** MERGE INTO the lake — the general row-level DML primitive
  * ([[Catalog.upsertLakeByKey]] is its equi-key special case): one
  * source frame, one join condition, and ordered WHEN clauses per
  * match category, executed merge-on-read as ONE atomic log record
  * {deletion vector over modified target rows + appended new rows} —
  * a snapshot reader sees the pre-merge table or the post-merge one,
  * never a torn middle; time travel below the commit is untouched;
  * the change feed shows the merge as retractions + inserts at a
  * single version (the shape incremental consumers already handle).
  *
  * Scala API (the SQL `MERGE INTO` statement lands on the same entry
  * through [[graft.sql.GraftDmlRule]]):
  *
  * {{{
  * Merge.mergeIntoLake(spark, layout, changes,
  *   on = col("t.key") === col("s.key"),
  *   matched = Seq(
  *     Merge.Update(Some(col("s.op") === "U"), Map("v" -> col("s.v"))),
  *     Merge.Delete(Some(col("s.op") === "D"))),
  *   notMatched = Seq(Merge.Insert(None, Map(
  *     "source" -> col("s.source"), "key" -> col("s.key"), "v" -> col("s.v")))))
  * }}}
  *
  * Conditions and values reference the target as `t.<col>` and the
  * source as `s.<col>` (override the aliases via `targetAlias` /
  * `sourceAlias`). Within a category, the FIRST clause whose
  * condition is satisfied applies (SQL semantics; a NULL condition
  * does not match). SQL's cardinality rule is enforced: a target row
  * matched by more than one modifying source row fails loud.
  *
  * Execution shape, designed for the 100 TB posture:
  *  1. target = committed snapshot + row identity
  *     ([[Catalog.lakeSnapshotWithPos]] — DV-applied, evolution-
  *     merged), joined to the source with exactly the outer-ness the
  *     clause set needs (inner when only MATCHED clauses exist,
  *     right-outer to add NOT MATCHED, left-outer/full for NOT
  *     MATCHED BY SOURCE) — a small source broadcasts, so a CDC-sized
  *     merge never shuffles the lake;
  *  2. the per-row action (first satisfied clause) and the post-merge
  *     row are computed in ONE pass and MATERIALIZED to a staging
  *     parquet — the deletion-vector half and the insert half are
  *     then derived from that one artifact, so a non-deterministic
  *     source (rand(), uuid()) can never produce a DV half and an
  *     insert half that disagree (the two-executions hazard);
  *  3. commit under the per-source maintenance locks with
  *     [[Catalog.upsertLakeByKey]]'s conflict discipline — target
  *     files must still be live, no new files in a source we modify
  *     (rows the scan never saw), and with NOT-MATCHED-BY-SOURCE
  *     clauses no live-set movement at all (those clauses read the
  *     whole target) — retrying the scan+join when a writer won.
  *
  * Cost: O(target scan + source + modified rows); no data file is
  * rewritten. Like Delta's merge, an un-prunable ON condition reads
  * the full target — pre-filter the lake into a view or carry
  * partition predicates in the matched conditions where possible. */
object Merge {

  /** One WHEN clause. `condition = None` means WHEN <category> with no
    * AND — always applies to rows of its category. */
  sealed trait Clause { def condition: Option[Column] }
  /** `WHEN [NOT] MATCHED [BY SOURCE] AND cond THEN UPDATE SET …` —
    * unassigned target columns keep their values. */
  final case class Update(condition: Option[Column],
      set: Map[String, Column]) extends Clause
  /** `WHEN [NOT] MATCHED [BY SOURCE] AND cond THEN DELETE`. */
  final case class Delete(condition: Option[Column]) extends Clause
  /** `WHEN NOT MATCHED AND cond THEN INSERT (…) VALUES (…)` —
    * unassigned columns insert NULL; `source` must be assigned. */
  final case class Insert(condition: Option[Column],
      values: Map[String, Column]) extends Clause

  /** The alias the SQL rule binds the target under — reserved-looking
    * on purpose, so it can never collide with an alias inside the
    * user's source query. */
  private[graft] val SqlTargetAlias = "__graft_t"

  private val OpNop = 0
  private val OpDelete = 1 // DV only
  private val OpUpdate = 2 // DV + insert the post-update row
  private val OpInsert = 3 // insert only

  private def opOf(c: Clause): Int = c match {
    case _: Update => OpUpdate
    case _: Delete => OpDelete
    case _: Insert => OpInsert
  }

  /** The ON condition arrives in one of two pre-analysis shapes: the
    * SQL rule's rebuilt catalyst tree (`EqualTo`/`And`) or the Scala
    * Column DSL's converted node tree, where operators are still
    * `UnresolvedFunction("=" | "and", …)` — both are matched. */
  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case UnresolvedFn("and", Seq(l, r)) =>
      splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  private def asEquality(e: Expression): Option[(Expression, Expression)] =
    e match {
      case EqualTo(l, r) => Some((l, r))
      case UnresolvedFn("=" | "==", Seq(l, r)) => Some((l, r))
      case _ => None
    }

  private object UnresolvedFn {
    def unapply(e: Expression): Option[(String, Seq[Expression])] = e match {
      case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
          if f.nameParts.length == 1 && !f.isDistinct =>
        Some((f.nameParts.head.toLowerCase, f.arguments))
      case _ => None
    }
  }

  /** `t.<col>` — a target reference in EITHER binding the merge
    * accepts: the Scala API's alias-qualified unresolved name
    * (`col("t.key")`) or the SQL rule's rewritten
    * `UnresolvedAttribute(Seq(targetAlias, col))`. Resolved
    * [[AttributeReference]]s are SOURCE-side by construction
    * ([[graft.sql.GraftDmlRule.toCol]] rewrites every target ref). */
  private def targetRefName(e: Expression, targetAlias: String): Option[String] =
    e match {
      case ua: UnresolvedAttribute
          if ua.nameParts.length == 2 && ua.nameParts.head == targetAlias =>
        Some(ua.nameParts(1))
      case _ => None
    }

  private def referencesTarget(e: Expression, targetAlias: String): Boolean =
    e.exists {
      case ua: UnresolvedAttribute =>
        ua.nameParts.headOption.contains(targetAlias)
      case _ => false
    }

  /** DYNAMIC FILE PRUNING through the skipping index, generalized from
    * [[Catalog.upsertLakeByKey]]'s single-key form to the merge's ON
    * condition: every AND-conjunct `t.<col> = <source-only expr>`
    * bounds the match scan — a file whose committed min/max excludes
    * the source expression's [min, max] cannot hold a matched row, so
    * it is never opened. Sound by construction: files without stats
    * are always kept, the conflict checks stay against the FULL live
    * list, and the pruned-out files' rows are exactly the
    * "not matched by source" rows no clause touches (callers gate on
    * `notMatchedBySource.isEmpty`). One scalar aggregate over the
    * source per merge buys a scan of O(overlapping files) instead of
    * O(lake) — at 100 TB the difference between a CDC merge costing
    * O(batch) and a full-table read. Returns `live` untouched when
    * nothing is extractable (no equi-conjunct, no stats, an
    * unevaluable source side); an all-NULL source key returns the
    * empty set (equality never matches NULL). */
  private def pruneByOn(spark: SparkSession, layout: Layout,
      live: Seq[String], source: DataFrame, on: Column,
      targetAlias: String, sourceAlias: String): Seq[String] = {
    // ONE stats capture, filtered against the caller's OWN `live`
    // listing — never a fresh log read per conjunct: a concurrent
    // OPTIMIZE between the caller's listing and a re-read would
    // replace a live file's stats key, and an overlap test against
    // the NEW head's keys would wrongly prune the OLD (still-live,
    // still-on-disk) file — its matched rows would then read as
    // not-matched with no conflict check firing (review catch). With
    // the captured map, an unknown file is always kept.
    val stats = Catalog.lakeFileStatsAsOf(spark, layout)
    if (stats.isEmpty) return live
    val pairs = splitConjuncts(GraftDmlBridge.expression(on))
      .flatMap(asEquality).flatMap { case (l, r) =>
        (targetRefName(l, targetAlias), targetRefName(r, targetAlias)) match {
          case (Some(c), None) if !referencesTarget(r, targetAlias) &&
            r.deterministic => Some((c, r))
          case (None, Some(c)) if !referencesTarget(l, targetAlias) &&
            l.deterministic => Some((c, l))
          case _ => None
        }
      }
    if (pairs.isEmpty) return live
    val aggs = pairs.zipWithIndex.flatMap { case ((_, sexpr), i) =>
      val c = GraftDmlBridge.column(sexpr)
      Seq(min(c).as(s"__graft_lo_$i"), max(c).as(s"__graft_hi_$i"))
    }
    // the source expr must evaluate against the source frame alone —
    // an unresolvable/ill-typed side falls back to no pruning (sound)
    val row = try source.alias(sourceAlias).agg(aggs.head, aggs.tail: _*).head
    catch { case scala.util.control.NonFatal(_) => return live }
    pairs.indices.foldLeft(live) { (keep, i) =>
      if (keep.isEmpty) keep
      else if (row.isNullAt(2 * i)) Seq.empty // all-NULL: matches nothing
      else keep.filter(Catalog.overlapKeeps(stats, _,
        pairs(i)._1, row.get(2 * i), row.get(2 * i + 1)))
    }
  }

  /** The un-materialized per-row action frame for one attempt's target
    * — (__gfile, __gpos, __gop, __gnew) with nop rows dropped.
    * Factored out (and `private[graft]`-visible) so plan audits can
    * pin the join strategy: a CDC-sized source must broadcast, the
    * lake side must not shuffle. */
  private[graft] def actionFrame(tgt0: DataFrame, source: DataFrame,
      on: Column, matched: Seq[Clause], notMatched: Seq[Clause],
      notMatchedBySource: Seq[Clause],
      targetAlias: String, sourceAlias: String): DataFrame = {
    val payload = tgt0.schema.fields
      .filterNot(_.name.startsWith("__graft_")).toSeq
    val newType = StructType(payload.map(_.copy(nullable = true)))
    val nullStruct = lit(null).cast(newType)

    val tgtA = tgt0.alias(targetAlias)
    val srcA = source.withColumn("__graft_src", lit(1)).alias(sourceAlias)
    val joinType = (notMatched.nonEmpty, notMatchedBySource.nonEmpty) match {
      case (true, true) => "full_outer"
      case (true, false) => "right_outer"
      case (false, true) => "left_outer"
      case (false, false) => "inner"
    }
    val joined = tgtA.join(srcA, on, joinType)

    def newOf(cl: Clause): Column = cl match {
      case Update(_, set) => struct(payload.map(f =>
        set.get(f.name).map(_.cast(f.dataType))
          .getOrElse(tgtA(f.name)).as(f.name)): _*).cast(newType)
      case Insert(_, values) => struct(payload.map(f =>
        values.getOrElse(f.name, lit(null)).cast(f.dataType).as(f.name)): _*)
        .cast(newType)
      case Delete(_) => nullStruct
    }
    // ONE action struct per row — the op code and the post-merge row
    // come out of the SAME clause-condition evaluation. Two parallel
    // ladders (one for op, one for the row) would evaluate each
    // condition twice, and a non-deterministic condition (rand()) could
    // then pick DIFFERENT branches for op vs row. The select-then-
    // filter split below keeps it single-evaluation even against
    // filter pushdown: a non-deterministic projection blocks the
    // pushdown, a deterministic one makes re-evaluation harmless.
    val nopAct = struct(lit(OpNop).as("op"), nullStruct.as("nw"))
    def actLadder(clauses: Seq[Clause]): Column =
      clauses.foldRight(nopAct) { (cl, els) =>
        when(cl.condition.getOrElse(lit(true)),
          struct(lit(opOf(cl)).as("op"), newOf(cl).as("nw"))).otherwise(els)
      }
    val tP = tgtA("__graft_pos").isNotNull
    val sP = srcA("__graft_src").isNotNull
    val act =
      when(tP && sP, actLadder(matched))
        .when(!tP && sP, actLadder(notMatched))
        .when(tP && !sP, actLadder(notMatchedBySource))
        .otherwise(nopAct)
    joined.select(
        tgtA("__graft_file").as("__gfile"),
        tgtA("__graft_pos").as("__gpos"),
        act.as("__gact"))
      .filter(col("__gact.op") =!= OpNop)
      .select(col("__gfile"), col("__gpos"),
        col("__gact.op").as("__gop"), col("__gact.nw").as("__gnew"))
  }

  /** Run the merge; returns the commit seq, or -1 when no row matched
    * any clause (nothing to do, nothing committed). */
  def mergeIntoLake(spark: SparkSession, layout: Layout,
      source: DataFrame, on: Column,
      matched: Seq[Clause] = Seq.empty,
      notMatched: Seq[Clause] = Seq.empty,
      notMatchedBySource: Seq[Clause] = Seq.empty,
      targetAlias: String = "t", sourceAlias: String = "s",
      lockTtlMs: Long = 10 * 60 * 1000L, waitMs: Long = 60 * 1000L,
      checkCardinality: Boolean = true): Long = {
    require(matched.nonEmpty || notMatched.nonEmpty || notMatchedBySource.nonEmpty,
      "MERGE with no WHEN clauses")
    matched.foreach {
      case _: Insert => throw new IllegalArgumentException(
        "WHEN MATCHED supports UPDATE/DELETE, not INSERT")
      case _ => ()
    }
    notMatched.foreach {
      case _: Insert => ()
      case other => throw new IllegalArgumentException(
        s"WHEN NOT MATCHED supports INSERT only, got $other")
    }
    notMatchedBySource.foreach {
      case _: Insert => throw new IllegalArgumentException(
        "WHEN NOT MATCHED BY SOURCE supports UPDATE/DELETE, not INSERT")
      case _ => ()
    }
    require(!source.columns.exists(_.startsWith("__graft_")),
      "source carries reserved __graft_* columns")

    val fs = new org.apache.hadoop.fs.Path(layout.lakeDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // MERGE SOURCE MATERIALIZATION (Delta's merge-source-
    // materialization idea): the merge executes the source plan more
    // than once — [[pruneByOn]]'s min/max aggregate, then the action
    // join (and again per conflict retry). A NONDETERMINISTIC source
    // (rand(), uuid(), a nondeterministic UDF) could report a narrower
    // key range to the pruner than the rows the join later produces —
    // files holding matched rows would be wrongly pruned and those
    // rows silently re-inserted as duplicates, with no conflict check
    // firing. Staging such a source to parquet ONCE makes every
    // execution read the same rows. Deterministic plans skip the copy:
    // their file listings are pinned at read time, so repeated
    // executions agree.
    val sourceNondet = source.queryExecution.analyzed.exists(
      p => p.expressions.exists(e => e.exists(!_.deterministic)))
    val (src, srcStage) =
      if (!sourceNondet) (source, None)
      else {
        val p = s"${layout.lakeDir}/_staged/merge-src-" +
          java.util.UUID.randomUUID().toString
        source.write.mode("overwrite").parquet(p)
        // schema passed explicitly: an empty staged source writes no
        // part files and inference would fail
        (spark.read.schema(source.schema).parquet(p), Some(p))
      }
    try {
    var attempt = 0
    while (attempt < 8) {
      val live = Catalog.lakeFilesAsOf(spark, layout)
      // DYNAMIC FILE PRUNING on the ON condition's equi-conjuncts —
      // only when every clause is match-driven: a NOT MATCHED BY
      // SOURCE clause reads the whole target, so nothing may prune
      val scanFiles =
        if (live.isEmpty || notMatchedBySource.nonEmpty) live
        else pruneByOn(spark, layout, live, src, on,
          targetAlias, sourceAlias)
      val tgt0 =
        if (scanFiles.nonEmpty)
          Catalog.lakeSnapshotWithPos(spark, layout, scanFiles)
        else {
          // everything pruned (or an empty lake): serve the SCHEMA so
          // the NOT-MATCHED arm still inserts — facts-born when the
          // log carries schema facts, else one live file's evolved
          // frame emptied (plan-only; never executed over its rows —
          // probed for physical existence, since a pruned-out file's
          // bytes being gone is exactly the case pruning protects)
          val facts = Catalog.lakeSnapshotWithPos(spark, layout, Seq.empty)
          if (facts.columns.nonEmpty || live.isEmpty) facts
          else {
            val probe = live.find(rel => fs.exists(
              new org.apache.hadoop.fs.Path(s"${layout.lakeDir}/$rel")))
              .getOrElse(live.head)
            Catalog.lakeSnapshotWithPos(spark, layout, Seq(probe))
              .where(lit(false))
          }
        }
      require(tgt0.columns.nonEmpty,
        "MERGE into an empty lake has no target schema — commitLake a " +
          "first batch (or use INSERT)")
      val payload = tgt0.schema.fields
        .filterNot(_.name.startsWith("__graft_")).toSeq
      val payloadNames = payload.map(_.name).toSet
      (matched ++ notMatchedBySource).foreach {
        case Update(_, set) => set.keys.foreach(k => require(payloadNames(k),
          s"UPDATE SET references unknown lake column '$k'"))
        case _ => ()
      }
      notMatched.foreach {
        case Insert(_, values) =>
          values.keys.foreach(k => require(payloadNames(k),
            s"INSERT references unknown lake column '$k'"))
          require(values.contains("source"),
            "INSERT must assign the source partition column")
        case _ => ()
      }
      // ---- ONE materializing pass: per-row action + post-merge row ----
      val actionsPath = s"${layout.lakeDir}/_staged/" +
        s"merge-${java.util.UUID.randomUUID().toString}"
      try {
        actionFrame(tgt0, src, on, matched, notMatched,
            notMatchedBySource, targetAlias, sourceAlias)
          .write.mode("overwrite").parquet(actionsPath)
        val st = spark.read.parquet(actionsPath)

        if (checkCardinality && matched.nonEmpty) {
          val dup = st
            .filter(col("__gop").isin(OpDelete, OpUpdate) &&
              col("__gfile").isNotNull)
            .groupBy("__gfile", "__gpos").agg(count(lit(1)).as("n"))
            .filter(col("n") > 1).limit(1).count()
          if (dup > 0) throw new IllegalStateException(
            "MERGE: a target row is modified by more than one source row " +
              "— the SQL cardinality rule; make ON + the matched " +
              "conditions unique per target row, or pre-aggregate the source")
        }

        val dels = st.filter(col("__gop").isin(OpDelete, OpUpdate))
          .select(col("__gfile").as("file"), col("__gpos").as("pos"))
        val inserts0 = st.filter(col("__gop").isin(OpUpdate, OpInsert))
          .select(col("__gnew.*"))
        // the partition key must be present on every inserted row — in
        // the single derivation pass, like the SQL INSERT guard
        val inserts = inserts0.withColumn("source",
          when(col("source").isNull, raise_error(lit(
            "MERGE: NULL source on an inserted/updated row — every lake " +
              "row needs the source partition key"))).otherwise(col("source")))
        Catalog.enforceExpectations(spark, layout, inserts)

        val files = dels.select("file").distinct().collect()
          .map(_.getString(0)).toSeq
        if (files.isEmpty && inserts.isEmpty) return -1L
        val delSources = files.map(Catalog.sourceOfRel).distinct
        // NOT MATCHED BY SOURCE reads the whole target: any live-set
        // movement invalidates the scan, so lock every live source
        val lockSources =
          if (notMatchedBySource.nonEmpty)
            (live.map(Catalog.sourceOfRel).distinct ++ delSources).distinct
          else delSources
        val livePre = live.toSet
        val committed = Catalog.withSourceLocks(spark, layout,
            lockSources.sorted, lockTtlMs, waitMs) {
          val liveNow = Catalog.lakeFilesAsOf(spark, layout)
          val liveNowSet = liveNow.toSet
          if (!files.forall(liveNowSet.contains)) None
          else if (notMatchedBySource.nonEmpty && liveNowSet != livePre) None
          else if (liveNow.exists(rel =>
              delSources.contains(Catalog.sourceOfRel(rel)) &&
                !livePre.contains(rel))) None
          else Some(Catalog.commitStagedDvAndAppend(spark, layout,
            Some(Catalog.widenBatch(spark, layout, inserts)),
            if (files.isEmpty) None else Some(dels),
            note = Some("merge"))._1)
        }
        committed match {
          case Some(seq) => return seq
          case None => attempt += 1; Catalog.conflictBackoff(attempt)
        }
      } finally {
        fs.delete(new org.apache.hadoop.fs.Path(actionsPath), true)
      }
    }
    throw new java.io.IOException(
      "mergeIntoLake: 8 attempts lost to concurrent commits into merged " +
        "sources — serialize writers per key space or retry")
    } finally {
      srcStage.foreach(p =>
        fs.delete(new org.apache.hadoop.fs.Path(p), true))
    }
  }

  /** SQL `UPDATE lake SET … [WHERE …]` — a merge whose source is a
    * single dummy row joined to every target row (broadcast, so the
    * cost is exactly one target scan): matched rows take the UPDATE,
    * everything else is untouched. Same one-record DV+append commit. */
  def updateLake(spark: SparkSession, layout: Layout,
      set: Map[String, Column], condition: Option[Column],
      targetAlias: String = "t",
      lockTtlMs: Long = 10 * 60 * 1000L, waitMs: Long = 60 * 1000L): Long = {
    require(set.nonEmpty, "UPDATE with no assignments")
    val dummy = spark.range(1).toDF("__dummy_one")
    mergeIntoLake(spark, layout, dummy, on = lit(true),
      matched = Seq(Update(condition, set)),
      targetAlias = targetAlias, sourceAlias = "__graft_upd_src",
      lockTtlMs = lockTtlMs, waitMs = waitMs,
      // 1 source row ⇒ provably 1:1; skip the duplicate-match agg
      checkCardinality = false)
  }
}
