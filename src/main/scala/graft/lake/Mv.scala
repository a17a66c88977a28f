package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained materialized view over the committed lake,
  * fed by the manifest-log change feed ([[Catalog.lakeChangesBetween]])
  * — the downstream half of the CDC story ([[Catalog.upsertLakeByKey]]
  * and [[graft.streaming.StreamUpsert]] being the upstream half).
  *
  * The view is a per-key retractable aggregate: `n_rows` (count) and
  * `sum_v` (sum of `valueCol`, exact BIGINT) — count/sum form a group
  * under retraction, so those never rescan the base table — plus,
  * under `trackExtrema = true`, `min_v`/`max_v` maintained by the
  * [[graft.ops.Aggregates.incrAggDelete]] rule: inserts tighten the
  * extrema ALGEBRAICALLY (least/greatest), and only groups where a
  * delete TOUCHED the boundary (deleted value ≤ running min or ≥
  * running max — the one case stored extrema cannot answer) pay a
  * key-pruned snapshot recompute. A group whose count retracts to
  * zero vanishes. Each [[refresh]] costs O(changes) + O(view) (+
  * O(extremum-touched groups' rows) when tracking extrema),
  * independent of lake size.
  *
  * State protocol (crash-safe with NO atomic-rename assumption beyond
  * what Spark's own committer provides): each commit writes a FRESH
  * `s<version>-<uuid>/` parquet directory — Spark's `_SUCCESS` marker
  * is the completeness fact — and the live view is simply the
  * lexicographically-highest complete directory (versions are
  * zero-padded, so name order = (version, uuid) order). Nothing is
  * ever deleted before its replacement is complete; a crash at ANY
  * point leaves the previous complete state live, and [[refresh]]
  * sweeps superseded/incomplete directories afterwards. A reader never
  * observes a half-written view because it never looks at a directory
  * without `_SUCCESS`.
  *
  * Concurrency: the view is SINGLE-WRITER (one refresher owns a
  * stateDir — the norm for a maintained view); concurrent READS are
  * always safe. Two concurrent refreshes both land complete states and
  * name order picks one — correct but wasted work; serialize refreshes
  * per stateDir.
  *
  * Erasure (round 9 — SELF-HEALING): an [[Erase]] rewrite is
  * deliberately not re-emitted as deletes on the feed, but the erase
  * leg stamps its commit with the `"erase"` note
  * ([[Catalog.commitNotes]]) — [[refresh]] detects one inside its
  * `(v0, head]` range and automatically falls back to [[rebuild]]
  * (re-deriving from the live snapshot, at the same returned head
  * version), so a forgotten manual rebuild can no longer serve the
  * erased subject's contribution. External CDC consumers carry the
  * same obligation and should consult the same notes. */
object Mv {

  /** Bring the view up to the lake head. Returns the version the view
    * is now at (unchanged when no new commits exist — an idempotent
    * no-op). First call bootstraps from version 0, i.e. replays the
    * full feed; prefer [[rebuild]] for the bootstrap when the feed's
    * early files may already be vacuumed. A head that advanced with NO
    * lake-area commits yet (catalog/distribution-only tables) leaves
    * the view untouched. A view's column shape is fixed at creation:
    * flipping `trackExtrema` on an existing stateDir fails loudly on
    * the state read rather than silently mixing shapes. */
  def refresh(spark: SparkSession, layout: Layout, stateDir: String,
      keyCols: Seq[String], valueCol: String,
      trackExtrema: Boolean = false): Long = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    register(spark, layout, ViewDef(stateDir, keyCols, valueCol, trackExtrema))
    val head = Catalog.resolvedHead(spark, layout)
    val cur = liveState(spark, stateDir)
    val v0 = cur.map(_._1).getOrElse(0L)
    if (head <= v0) return v0
    // an ERASE rewrite inside the range changed content the feed does
    // not (must not) re-emit: incremental maintenance would keep the
    // erased rows' contribution forever — rebuild from the live
    // snapshot instead (view-preserving rewrites carry no note and
    // refresh through normally). A RESTORE ("restore <v>") is a rewind
    // with no incremental delta at all — same rebuild path (the feed
    // itself REFUSES ranges spanning one).
    if (Catalog.commitNotes(spark, layout)
        .exists { case (seq, n) => (n == "erase" || n.startsWith("restore")) &&
          seq > v0 && seq <= head })
      return rebuild(spark, layout, stateDir, keyCols, valueCol, trackExtrema)
    val changes = Catalog.lakeChangesBetween(spark, layout, v0, head)
    val payload = changes.columns
      .filterNot(Set("_change_type", "_commit_version").contains)
    if (payload.isEmpty) {
      // no lake data exists yet (the empty feed has no payload schema):
      // nothing to fold, nothing to stamp — retry once the lake commits
      return v0
    }
    // the feed HAS a payload schema: a missing key/value column here is
    // a misspelling, not an empty lake — silently returning v0 would
    // make every refresh a permanent no-op serving a stale view.
    // BEHAVIOR NOTE (round 9+): a view whose value column only arrives
    // via a LATER schema evolution (addcol after the first data commit)
    // must be registered/refreshed only once that evolution is
    // committed — before it, this throws rather than bootstrapping at
    // v0, because a missing-by-evolution column and a misspelled one
    // are indistinguishable here and the silent no-op was the worse
    // failure. Commit the addcol first (it is a metadata-only commit),
    // then register the view.
    val missing = (keyCols :+ valueCol).filterNot(changes.columns.contains)
    if (missing.nonEmpty) throw new IllegalArgumentException(
      s"Mv.refresh: column(s) ${missing.mkString(", ")} absent from the " +
        s"change feed (payload columns: ${payload.mkString(", ")})")
    val keys = keyCols.map(col)
    val sign = when(col("_change_type") === "insert", 1L).otherwise(-1L)
    val vc = col(valueCol).cast("long")
    if (!trackExtrema) {
      val delta = changes.groupBy(keys: _*)
        .agg(sum(sign).as("n_rows"), sum(sign * vc).as("sum_v"))
      val merged = cur match {
        case None => delta
        case Some((_, dir)) => spark.read.parquet(dir).unionByName(delta)
          .groupBy(keys: _*)
          .agg(sum(col("n_rows")).as("n_rows"), sum(col("sum_v")).as("sum_v"))
      }
      commitState(spark, stateDir, merged.filter(col("n_rows") =!= 0L), head)
      return head
    }
    val delta = changes.groupBy(keys: _*)
      .agg(sum(sign).as("d_n"), sum(sign * vc).as("d_sum"),
        min(when(col("_change_type") === "insert", vc)).as("ins_min"),
        max(when(col("_change_type") === "insert", vc)).as("ins_max"),
        min(when(col("_change_type") === "delete", vc)).as("del_min"),
        max(when(col("_change_type") === "delete", vc)).as("del_max"))
    val old = cur match {
      case Some((_, dir)) => spark.read.parquet(dir)
        .select(keys ++ Seq(col("n_rows").as("o_n"), col("sum_v").as("o_sum"),
          col("min_v").as("o_min"), col("max_v").as("o_max")): _*)
      case None => delta.select(keys: _*).limit(0)
        .withColumn("o_n", lit(null).cast("long"))
        .withColumn("o_sum", lit(null).cast("long"))
        .withColumn("o_min", lit(null).cast("long"))
        .withColumn("o_max", lit(null).cast("long"))
    }
    val joined = old.join(delta, keyCols, "full_outer")
      .withColumn("n_rows", coalesce(col("o_n"), lit(0L)) + coalesce(col("d_n"), lit(0L)))
      .withColumn("sum_v", coalesce(col("o_sum"), lit(0L)) + coalesce(col("d_sum"), lit(0L)))
      .filter(col("n_rows") =!= 0L)
      // inserts tighten extrema algebraically (least/greatest skip NULLs)
      .withColumn("alg_min", least(col("o_min"), col("ins_min")))
      .withColumn("alg_max", greatest(col("o_max"), col("ins_max")))
      // a delete at the running boundary is the one case stored extrema
      // cannot answer: the deleted value may have BEEN the extremum
      // coalesce(true): a NULL verdict (unreachable for consistent
      // tracked state) falls to the recompute path — correct, never wrong
      .withColumn("touched", coalesce(
        (col("del_min").isNotNull && col("del_min") <= col("alg_min")) ||
          (col("del_max").isNotNull && col("del_max") >= col("alg_max")),
        lit(true)))
    val safe = joined.filter(!col("touched"))
      .select(keys ++ Seq(col("n_rows"), col("sum_v"),
        col("alg_min").as("min_v"), col("alg_max").as("max_v")): _*)
    val needs = joined.filter(col("touched"))
      .select(keys ++ Seq(col("n_rows"), col("sum_v")): _*)
    val merged =
      if (needs.isEmpty) safe
      else {
        val rec = Catalog.loadLakeSnapshot(spark, layout, head)
          .join(needs.select(keys: _*), keyCols, "left_semi")
          .groupBy(keys: _*)
          .agg(min(vc).as("min_v"), max(vc).as("max_v"))
        safe.unionByName(needs.join(rec, keyCols))
      }
    commitState(spark, stateDir, merged, head)
    head
  }

  /** Re-derive the view directly from the live committed snapshot and
    * stamp it at the head version — the post-erase (or bootstrap)
    * path that needs no historical change files. A never-written lake
    * is a no-op (there is no schema to derive) — but a lake whose
    * live file set was emptied by a FULL erasure empties the view
    * (keeping the old state would serve every erased row). */
  def rebuild(spark: SparkSession, layout: Layout, stateDir: String,
      keyCols: Seq[String], valueCol: String,
      trackExtrema: Boolean = false): Long = {
    register(spark, layout, ViewDef(stateDir, keyCols, valueCol, trackExtrema))
    val head = Catalog.resolvedHead(spark, layout)
    val snap = Catalog.loadLakeSnapshot(spark, layout, head)
    if (snap.columns.isEmpty) return liveState(spark, stateDir) match {
      case None => 0L
      case Some((_, dir)) =>
        commitState(spark, stateDir, spark.read.parquet(dir).limit(0), head)
        head
    }
    val vc = col(valueCol).cast("long")
    val aggs = Seq(count(lit(1)).as("n_rows"), sum(vc).as("sum_v")) ++
      (if (trackExtrema) Seq(min(vc).as("min_v"), max(vc).as("max_v")) else Nil)
    val agg = snap.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    commitState(spark, stateDir, agg, head)
    head
  }

  /** Maintained JOIN view: per-key count/sum over
    * `lake ⋈ broadcast(dim)` (inner equi-join on `joinCols`, `dim`
    * read from `dimPath` — a small dimension table), delta-maintained
    * from the change feed. Enriching a change row and THEN folding it
    * retractably is exact because the join is row-local: an inserted
    * (deleted) lake row contributes (retracts) exactly its joined
    * rows, so per refresh the cost is O(changes ⋈ dim) + O(view) —
    * never a lake rescan. `keyCols` may name lake and/or dim columns
    * (the group-by runs on the enriched frame).
    *
    * Contract: `dim` must be CHANGE-STATIC between refreshes — the
    * view is maintained against lake changes only; after a dimension
    * change call [[rebuildJoined]] (same obligation as a batch
    * join-aggregate consumer). A dim key matching several dim rows
    * multiplies contributions exactly like the batch join does.
    * Erase-aware like [[refresh]]: an `"erase"` note in the range
    * falls back to [[rebuildJoined]]. */
  def refreshJoined(spark: SparkSession, layout: Layout, stateDir: String,
      dimPath: String, joinCols: Seq[String],
      keyCols: Seq[String], valueCol: String): Long = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(joinCols.nonEmpty, "joinCols must be non-empty")
    register(spark, layout,
      ViewDef(stateDir, keyCols, valueCol, dimPath = Some(dimPath), joinCols = joinCols))
    val head = Catalog.resolvedHead(spark, layout)
    val cur = liveState(spark, stateDir)
    val v0 = cur.map(_._1).getOrElse(0L)
    if (head <= v0) return v0
    if (Catalog.commitNotes(spark, layout)
        .exists { case (seq, n) => (n == "erase" || n.startsWith("restore")) &&
          seq > v0 && seq <= head })
      return rebuildJoined(spark, layout, stateDir, dimPath, joinCols,
        keyCols, valueCol)
    val changes = Catalog.lakeChangesBetween(spark, layout, v0, head)
    val payload = changes.columns
      .filterNot(Set("_change_type", "_commit_version").contains)
    if (payload.isEmpty) return v0
    val dim = spark.read.parquet(dimPath)
    val missing = (joinCols :+ valueCol).filterNot(changes.columns.contains) ++
      keyCols.filterNot(c => changes.columns.contains(c) || dim.columns.contains(c))
    if (missing.nonEmpty) throw new IllegalArgumentException(
      s"Mv.refreshJoined: column(s) ${missing.mkString(", ")} absent from " +
        s"feed payload (${payload.mkString(", ")}) and dim (${dim.columns.mkString(", ")})")
    val enriched = changes.join(broadcast(dim), joinCols)
    val keys = keyCols.map(col)
    val sign = when(col("_change_type") === "insert", 1L).otherwise(-1L)
    val delta = enriched.groupBy(keys: _*)
      .agg(sum(sign).as("n_rows"), sum(sign * col(valueCol).cast("long")).as("sum_v"))
    val merged = cur match {
      case None => delta
      case Some((_, dir)) => spark.read.parquet(dir).unionByName(delta)
        .groupBy(keys: _*)
        .agg(sum(col("n_rows")).as("n_rows"), sum(col("sum_v")).as("sum_v"))
    }
    commitState(spark, stateDir, merged.filter(col("n_rows") =!= 0L), head)
    head
  }

  /** Re-derive the join view from the live snapshot ⋈ dim — the
    * bootstrap / post-erase / post-dimension-change path. Empty-lake
    * semantics mirror [[rebuild]]. */
  def rebuildJoined(spark: SparkSession, layout: Layout, stateDir: String,
      dimPath: String, joinCols: Seq[String],
      keyCols: Seq[String], valueCol: String): Long = {
    register(spark, layout,
      ViewDef(stateDir, keyCols, valueCol, dimPath = Some(dimPath), joinCols = joinCols))
    val head = Catalog.resolvedHead(spark, layout)
    val snap = Catalog.loadLakeSnapshot(spark, layout, head)
    if (snap.columns.isEmpty) return liveState(spark, stateDir) match {
      case None => 0L
      case Some((_, dir)) =>
        commitState(spark, stateDir, spark.read.parquet(dir).limit(0), head)
        head
    }
    val dim = spark.read.parquet(dimPath)
    val agg = snap.join(broadcast(dim), joinCols)
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        sum(col(valueCol).cast("long")).as("sum_v"))
    commitState(spark, stateDir, agg, head)
    head
  }

  // --------------------------------------------------------------------
  // View registry: the layout knows its own maintained views
  // --------------------------------------------------------------------

  /** A registered maintained view — everything needed to rebuild it
    * with NO caller knowledge (the GDPR obligation: a view nobody
    * remembers must still shed an erased subject immediately, not at
    * its next incidental refresh). Flat when `dimPath` is None, a
    * maintained JOIN view otherwise. */
  final case class ViewDef(stateDir: String, keyCols: Seq[String],
      valueCol: String, trackExtrema: Boolean = false,
      dimPath: Option[String] = None, joinCols: Seq[String] = Seq.empty)

  private def viewsDir(layout: Layout) = s"${layout.root}/_views"

  private def viewFileName(stateDir: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-1")
      .digest(stateDir.getBytes("UTF-8"))
    "v" + d.take(8).map(b => f"$b%02x").mkString + ".json"
  }

  /** Register (or re-register) a view in the layout-level registry —
    * one JSON file per stateDir under `<root>/_views/`, tmp + OVERWRITE
    * rename so a reader never sees a torn OR ABSENT entry: a
    * delete-then-rename swap would open a window in which a concurrent
    * `registered()`/[[Erase.eraseEverywhere]] sees no entry and
    * silently skips rebuilding that view — the exact GDPR gap the
    * registry exists to close. The overwrite rename is atomic on the
    * local FS (NIO `ATOMIC_MOVE`) and on HDFS (`FileContext` +
    * `Options.Rename.OVERWRITE`); two racing registers with DIFFERENT
    * bodies resolve last-writer-wins with a whole body — an entry for
    * the stateDir is present throughout. Idempotent; an unchanged
    * definition writes nothing (refresh calls this every time). Every
    * [[refresh]]/[[rebuild]]/[[refreshJoined]]/[[rebuildJoined]]
    * registers automatically, so any view that was EVER maintained
    * against this layout is discoverable by
    * [[Erase.eraseEverywhere]]. */
  def register(spark: SparkSession, layout: Layout, v: ViewDef): Unit = {
    val fs = fsOf(spark, viewsDir(layout))
    val dir = new org.apache.hadoop.fs.Path(viewsDir(layout))
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = m.createObjectNode()
    node.put("stateDir", v.stateDir)
    val kc = node.putArray("keyCols"); v.keyCols.foreach(kc.add)
    node.put("valueCol", v.valueCol)
    node.put("trackExtrema", v.trackExtrema)
    v.dimPath.foreach(node.put("dimPath", _))
    val jc = node.putArray("joinCols"); v.joinCols.foreach(jc.add)
    val body = m.writeValueAsString(node)
    val p = new org.apache.hadoop.fs.Path(dir, viewFileName(v.stateDir))
    if (fs.exists(p)) {
      val in = fs.open(p)
      val cur = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      if (cur == body) return
    }
    fs.mkdirs(dir)
    val tmp = new org.apache.hadoop.fs.Path(dir,
      s"_tmp-${java.util.UUID.randomUUID().toString.take(12)}")
    if ("file" == Option(fs.getScheme).getOrElse("")) {
      // NIO end to end: no checksum sidecar is written for tmp, and a
      // sidecar left by the pre-overwrite-rename era (fs.create +
      // fs.rename moved the .crc along) is dropped BEFORE the move so
      // a reader never sees new body + stale checksum
      java.nio.file.Files.write(
        java.nio.file.Paths.get(tmp.toUri.getPath), body.getBytes("UTF-8"))
      fs.delete(new org.apache.hadoop.fs.Path(dir, s".${p.getName}.crc"), false)
      java.nio.file.Files.move(
        java.nio.file.Paths.get(tmp.toUri.getPath),
        java.nio.file.Paths.get(p.toUri.getPath),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } else {
      val out = fs.create(tmp, true)
      try out.write(body.getBytes("UTF-8")) finally out.close()
      try org.apache.hadoop.fs.FileContext
        .getFileContext(p.toUri, spark.sparkContext.hadoopConfiguration)
        .rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      catch { case e: Throwable => fs.delete(tmp, false); throw e }
    }
  }

  /** Drop a view from the registry (the state dir itself is the
    * caller's to delete). Returns whether an entry existed. */
  def unregister(spark: SparkSession, layout: Layout, stateDir: String): Boolean =
    fsOf(spark, viewsDir(layout)).delete(
      new org.apache.hadoop.fs.Path(viewsDir(layout), viewFileName(stateDir)), false)

  /** Every registered view of this layout. A torn/foreign file in the
    * registry fails LOUD — silently skipping one would quietly exempt
    * a view from erasure. */
  def registered(spark: SparkSession, layout: Layout): Seq[ViewDef] = {
    val fs = fsOf(spark, viewsDir(layout))
    val dir = new org.apache.hadoop.fs.Path(viewsDir(layout))
    if (!fs.exists(dir)) return Seq.empty
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    fs.listStatus(dir).map(_.getPath).filter(p =>
      p.getName.endsWith(".json") && !p.getName.startsWith("_"))
      .sortBy(_.getName).map { p =>
        val in = fs.open(p)
        val body = try new String(in.readAllBytes(), "UTF-8") finally in.close()
        val n = m.readTree(body)
        def arr(field: String): Seq[String] = {
          val it = n.path(field).elements()
          val b = Seq.newBuilder[String]
          while (it.hasNext) b += it.next().asText()
          b.result()
        }
        require(n.hasNonNull("stateDir") && n.hasNonNull("valueCol"),
          s"torn or foreign view-registry entry: $p")
        ViewDef(n.get("stateDir").asText(), arr("keyCols"),
          n.get("valueCol").asText(), n.path("trackExtrema").asBoolean(false),
          Option(n.get("dimPath")).filter(_.isTextual).map(_.asText()),
          arr("joinCols"))
      }.toSeq
  }

  /** Rebuild ONE registered view from the live snapshot — the
    * post-erase path, dispatching flat vs joined. */
  def rebuildView(spark: SparkSession, layout: Layout, v: ViewDef): Long =
    v.dimPath match {
      case Some(dim) => rebuildJoined(spark, layout, v.stateDir, dim,
        v.joinCols, v.keyCols, v.valueCol)
      case None => rebuild(spark, layout, v.stateDir, v.keyCols, v.valueCol,
        v.trackExtrema)
    }

  /** Incrementally refresh EVERY registered view of this layout — the
    * one call a post-commit hook or scheduler needs (each refresh is
    * O(changes)+O(view), erase-aware, and self-heals via the commit
    * note). Returns (stateDir, version-now-at) per view, registry
    * order. */
  def refreshRegistered(spark: SparkSession, layout: Layout): Seq[(String, Long)] =
    registered(spark, layout).map { v =>
      val at = v.dimPath match {
        case Some(dim) => refreshJoined(spark, layout, v.stateDir, dim,
          v.joinCols, v.keyCols, v.valueCol)
        case None => refresh(spark, layout, v.stateDir, v.keyCols, v.valueCol,
          v.trackExtrema)
      }
      (v.stateDir, at)
    }

  /** The live view: `(keyCols…, n_rows, sum_v)`. Empty (no columns)
    * before the first refresh. */
  def read(spark: SparkSession, stateDir: String): DataFrame =
    liveState(spark, stateDir) match {
      case Some((_, dir)) => spark.read.parquet(dir)
      case None => spark.emptyDataFrame
    }

  /** The version the view is at, None before the first refresh. */
  def currentVersion(spark: SparkSession, stateDir: String): Option[Long] =
    liveState(spark, stateDir).map(_._1)

  /** The lexicographically-highest COMPLETE (`_SUCCESS`-marked) state
    * directory — zero-padded versions make name order (version, uuid)
    * order, and completeness-gating makes a half-written directory
    * invisible. */
  private def liveState(spark: SparkSession,
      stateDir: String): Option[(Long, String)] = {
    val fs = fsOf(spark, stateDir)
    val root = new org.apache.hadoop.fs.Path(stateDir)
    if (!fs.exists(root)) return None
    fs.listStatus(root)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("s") &&
        fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")))
      .map(_.getPath.getName).sorted.lastOption
      .map(n => (n.stripPrefix("s").takeWhile(_ != '-').toLong, s"$stateDir/$n"))
  }

  /** Write a fresh complete state, THEN sweep — never delete before
    * the replacement exists, and keep the IMMEDIATELY-PREVIOUS complete
    * state as read grace (a reader that resolved the old directory just
    * before this commit finishes its scan; it is reclaimed on the next
    * refresh — the vacuum-grace idea at view scale). */
  private def commitState(spark: SparkSession, stateDir: String,
      view: DataFrame, version: Long): Unit = {
    val fs = fsOf(spark, stateDir)
    val name = f"s$version%020d-${java.util.UUID.randomUUID().toString.take(8)}"
    view.write.mode("overwrite").parquet(s"$stateDir/$name")
    val root = new org.apache.hadoop.fs.Path(stateDir)
    val complete = fs.listStatus(root)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("s") &&
        fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")))
      .map(_.getPath.getName).sorted
    val keep = complete.takeRight(2).toSet
    fs.listStatus(root).foreach { st =>
      val n = st.getPath.getName
      if (st.isDirectory && !keep.contains(n) && n.startsWith("s"))
        fs.delete(st.getPath, true)
    }
    // legacy pointer file from the pre-_SUCCESS protocol, if any
    fs.delete(new org.apache.hadoop.fs.Path(s"$stateDir/_current"), false)
  }

  private def fsOf(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
}
