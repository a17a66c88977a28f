package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.lake.{Catalog, Layout}

/** The ORACLE-GATED face of the DSv2 catalog ([[GraftCatalog]]): a
  * deterministic manifest-log lake derived from the `events` corpus,
  * addressed through PURE `spark.sql` over `« catalog ».lake` /
  * `lake_changes` — so the driver's DuckDB oracle exercises the SQL
  * catalog path on real corpus volume (the reference's catalog is its
  * only queryable structure, `/root/reference/serverless_datalake/
  * serverless_datalake_stack.py:63-77`; here the SQL face of the whole
  * lake is the gated surface).
  *
  * Fixture content (2 commits, versions fixed by construction):
  *  - v1 `commitLake`: every event as `(source = event_type, event_id,
  *    user_id, cents)` — integer cents via `floor(value·100 + 0.5)`
  *    (exact-tie-safe on both engines, unlike `round`);
  *  - v2 `deleteLakeWhere(event_id % 10 = 3)`: a deletion-vector
  *    commit, so the snapshot/AS-OF/CDF queries all have non-trivial
  *    answers the oracle can replay over the raw `events` parquet.
  *
  * The lake is corpus-keyed and built ONCE under the shared artifact
  * root ([[graft.ops.Artifacts.commit]] atomic-rename protocol — safe
  * under parallel suites and reused across JVMs); the manifest log
  * stores relative paths, so the build-in-temp + rename is sound.
  * Scale: the fixture build is one partitioned write + one DV commit —
  * O(corpus); every query below is a pruned committed-snapshot scan
  * through the catalog's pushdown path. */
object SqlLake {

  /** Corpus key: events parquet byte length + dir basename — stable
    * per generated corpus, no data scan needed. */
  private def corpusKey(spark: SparkSession, sfDir: String): String = {
    val p = new org.apache.hadoop.fs.Path(s"$sfDir/events.parquet")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val len = fs.getContentSummary(p).getLength
    val base = new org.apache.hadoop.fs.Path(sfDir).getName
      .replaceAll("[^A-Za-z0-9]", "_")
    s"${base}_$len"
  }

  /** Build (once) the deterministic lake for `sfDir`'s events corpus;
    * returns its layout root. */
  def lakeRoot(spark: SparkSession, sfDir: String): String = {
    val dir =
      s"${graft.ops.Artifacts.sharedRoot}/sql_lake/k=${corpusKey(spark, sfDir)}"
    graft.ops.Artifacts.commit(spark, dir) { tmp =>
      val lay = Layout(tmp)
      val batch = graft.Events.events(spark, sfDir).select(
        col("event_type").as("source"),
        col("event_id"), col("user_id"),
        floor(col("value") * lit(100) + lit(0.5)).cast("long").as("cents"))
      val v1 = Catalog.commitLake(spark, lay, batch)
      require(v1 == 1L, s"fixture commit seq drifted: $v1")
      val v2 = Catalog.deleteLakeWhere(spark, lay, col("event_id") % 10 === 3)
      require(v2 == 2L, s"fixture delete seq drifted: $v2")
      val fs = new org.apache.hadoop.fs.Path(tmp)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.create(new org.apache.hadoop.fs.Path(tmp, "_SUCCESS"), true).close()
    }
    dir
  }

  /** Register (idempotently) a DSv2 catalog over the fixture lake and
    * return its name — corpus-keyed, because catalog instances are
    * cached per name and must never see a different root. */
  def ensureCatalog(spark: SparkSession, sfDir: String): String = {
    val root = lakeRoot(spark, sfDir)
    val name = s"graft_${corpusKey(spark, sfDir)}"
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    name
  }

  /** `q_sql_lake_agg`: committed-snapshot aggregate through pure SQL —
    * DV-applied (the v2 delete is invisible), grouped per source. */
  def snapshotAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val cat = ensureCatalog(spark, sfDir)
    spark.sql(
      s"""SELECT source, count(*) AS n_events,
         |  CAST(sum(cents) AS BIGINT) AS sum_cents
         |FROM $cat.lake GROUP BY source ORDER BY source""".stripMargin)
  }

  val snapshotAggOracleSql: String =
    """SELECT event_type AS source, count(*) AS n_events,
      |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
      |FROM events WHERE NOT (event_id % 10 = 3)
      |GROUP BY event_type ORDER BY source""".stripMargin

  /** `q_sql_lake_asof`: `VERSION AS OF 1` — the snapshot BEFORE the
    * DV delete; time travel bound at SQL analysis. */
  def asOfAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val cat = ensureCatalog(spark, sfDir)
    spark.sql(
      s"""SELECT source, count(*) AS n_events,
         |  CAST(sum(cents) AS BIGINT) AS sum_cents
         |FROM $cat.lake VERSION AS OF 1
         |GROUP BY source ORDER BY source""".stripMargin)
  }

  val asOfAggOracleSql: String =
    """SELECT event_type AS source, count(*) AS n_events,
      |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
      |FROM events
      |GROUP BY event_type ORDER BY source""".stripMargin

  /** `q_sql_lake_changes`: the change data feed through pure SQL —
    * net per-change-type counts/sums over the full version range
    * (inserts = the v1 append, deletes = the v2 DV commit). */
  def changesAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val cat = ensureCatalog(spark, sfDir)
    // pin the full range explicitly: the conf is session-shared
    spark.conf.set("spark.graft.cdf.startingVersion", "0")
    spark.conf.set("spark.graft.cdf.endingVersion", Long.MaxValue.toString)
    spark.sql(
      s"""SELECT _change_type, count(*) AS n,
         |  CAST(sum(cents) AS BIGINT) AS sum_cents
         |FROM $cat.lake_changes
         |GROUP BY _change_type ORDER BY _change_type""".stripMargin)
  }

  val changesAggOracleSql: String =
    """SELECT * FROM (
      |  SELECT 'delete' AS _change_type, count(*) AS n,
      |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
      |  FROM events WHERE event_id % 10 = 3
      |  UNION ALL
      |  SELECT 'insert' AS _change_type, count(*) AS n,
      |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
      |  FROM events
      |) ORDER BY _change_type""".stripMargin

  /** `q_sql_table_changes`: the `table_changes` TVF through pure SQL —
    * the window `(1, 2]` is exactly the DV-delete commit, so the feed
    * is deletes-only, per source. Exercises
    * [[TableChanges]] (analysis-time range binding) rather than the
    * session-conf `lake_changes` table. */
  def tvfChangesAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val cat = ensureCatalog(spark, sfDir)
    graft.functions.GraftExtensions.register(spark) // the TVF
    spark.sql(
      s"""SELECT source, _change_type, count(*) AS n,
         |  CAST(sum(cents) AS BIGINT) AS sum_cents
         |FROM table_changes('$cat', 1, 2)
         |GROUP BY source, _change_type ORDER BY source, _change_type""".stripMargin)
  }

  val tvfChangesAggOracleSql: String =
    """SELECT event_type AS source, 'delete' AS _change_type, count(*) AS n,
      |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
      |FROM events WHERE event_id % 10 = 3
      |GROUP BY event_type ORDER BY source, _change_type""".stripMargin

  /** Second deterministic fixture, WITH a widening boundary: v1 = the
    * even-event-id half with `cents_i` committed as INT (physical
    * int32 pages), v2 = `commitLakeWidenColumn(cents_i → bigint)`,
    * v3 = the odd half with `cents_i + 10^10` as LONG (values no int
    * can hold). The [[tvfWidenAgg]] query below makes TYPE WIDENING
    * itself oracle-gated: its answer is only right if the narrow
    * files promote losslessly, the write-time up-cast landed the v3
    * files wide, and the epoch-merged explicit-schema scan unions
    * them — the DuckDB replay over raw `events` knows nothing of any
    * of that. */
  private def widenLakeRoot(spark: SparkSession, sfDir: String): String = {
    val dir =
      s"${graft.ops.Artifacts.sharedRoot}/sql_lake_w/k=${corpusKey(spark, sfDir)}"
    graft.ops.Artifacts.commit(spark, dir) { tmp =>
      val lay = Layout(tmp)
      val base = graft.Events.events(spark, sfDir).select(
        col("event_type").as("source"), col("event_id"),
        floor(col("value") * lit(100) + lit(0.5)).cast("long").as("cents"))
      val v1 = Catalog.commitLake(spark, lay,
        base.filter(col("event_id") % 2 === 0)
          .withColumn("cents_i", col("cents").cast("int")).drop("cents"))
      require(v1 == 1L, s"widen fixture seq drifted: $v1")
      val v2 = Catalog.commitLakeWidenColumn(spark, lay, "cents_i", "bigint")
      require(v2 == 2L, s"widen fixture seq drifted: $v2")
      val v3 = Catalog.commitLake(spark, lay,
        base.filter(col("event_id") % 2 === 1)
          .withColumn("cents_i", col("cents") + lit(10000000000L)).drop("cents"))
      require(v3 == 3L, s"widen fixture seq drifted: $v3")
      val fs = new org.apache.hadoop.fs.Path(tmp)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.create(new org.apache.hadoop.fs.Path(tmp, "_SUCCESS"), true).close()
    }
    dir
  }

  /** `q_sql_lake_widen`: per-source count + exact BIGINT sum over the
    * widened snapshot, pure SQL through the DSv2 catalog. */
  def widenAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val root = widenLakeRoot(spark, sfDir)
    val name = s"graftw_${corpusKey(spark, sfDir)}"
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    spark.sql(
      s"""SELECT source, count(*) AS n_events,
         |  CAST(sum(cents_i) AS BIGINT) AS sum_cents
         |FROM $name.lake GROUP BY source ORDER BY source""".stripMargin)
  }

  val widenAggOracleSql: String =
    """SELECT event_type AS source, count(*) AS n_events,
      |  CAST(sum(CASE WHEN event_id % 2 = 0
      |    THEN CAST(CAST(floor(value * 100 + 0.5) AS BIGINT) AS INT)
      |    ELSE CAST(floor(value * 100 + 0.5) AS BIGINT) + 10000000000 END)
      |    AS BIGINT) AS sum_cents
      |FROM events
      |GROUP BY event_type ORDER BY source""".stripMargin

  /** Third deterministic fixture — the SQL ROW-LEVEL DML surface: v1 =
    * the full corpus as `(source, event_id, user_id, cents)`; v2 = a
    * `MERGE INTO` executed through the STATEMENT path
    * ([[GraftDmlRule]] → [[graft.lake.Merge]]) with all three arms —
    * matched odd multiples of 7 DELETE, matched even multiples UPDATE
    * (`cents + 1e6`), new ids (`event_id + 1e9`, `cents + 55`) INSERT;
    * v3 = a SQL `UPDATE … SET cents = cents + 7 WHERE event_id % 3 =
    * 0`. The queries below replay in DuckDB over raw `events`, so a
    * green row proves the statement binding, the clause ladder, the
    * one-record DV+append commit AND the snapshot read — end to end
    * on corpus volume. */
  private def mergeLakeRoot(spark: SparkSession, sfDir: String): String = {
    val dir =
      s"${graft.ops.Artifacts.sharedRoot}/sql_lake_dml/k=${corpusKey(spark, sfDir)}"
    graft.ops.Artifacts.commit(spark, dir) { tmp =>
      val lay = Layout(tmp)
      val base = graft.Events.events(spark, sfDir).select(
        col("event_type").as("source"), col("event_id"), col("user_id"),
        floor(col("value") * lit(100) + lit(0.5)).cast("long").as("cents"))
      val v1 = Catalog.commitLake(spark, lay, base)
      require(v1 == 1L, s"merge fixture seq drifted: $v1")
      val cand = base.filter(col("event_id") % 7 === 0)
      val srcView = s"graft_merge_src_${java.util.UUID.randomUUID()
        .toString.replace("-", "")}"
      cand.withColumn("op",
          when(col("event_id") % 2 === 1, lit("D")).otherwise(lit("U")))
        .unionByName(cand.select(col("source"),
          (col("event_id") + lit(1000000000L)).as("event_id"),
          col("user_id"), (col("cents") + lit(55L)).as("cents"))
          .withColumn("op", lit("I")))
        .createOrReplaceTempView(srcView)
      // transient catalog name: instances are cached per name and this
      // one binds the pre-rename tmp dir — never reuse it
      val name = s"graftm_build_${java.util.UUID.randomUUID()
        .toString.replace("-", "")}"
      spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$name.root", tmp)
      spark.sql(
        s"""MERGE INTO $name.lake t USING $srcView s
           |ON t.event_id = s.event_id
           |WHEN MATCHED AND s.op = 'D' THEN DELETE
           |WHEN MATCHED THEN UPDATE SET cents = s.cents + 1000000
           |WHEN NOT MATCHED THEN INSERT (source, event_id, user_id, cents)
           |  VALUES (s.source, s.event_id, s.user_id, s.cents)""".stripMargin)
      spark.sql(
        s"UPDATE $name.lake SET cents = cents + 7 WHERE event_id % 3 = 0")
      // v4: SELF-REFERENTIAL atomic replace — the source reads the
      // table's own v3 (time travel binds at analysis, files are
      // immutable), the write replaces everything in ONE record
      // positional INSERT: the snapshot schema carries the partition
      // column LAST (event_id, user_id, cents, source)
      spark.sql(
        s"""INSERT OVERWRITE $name.lake
           |SELECT event_id, user_id, cents, source
           |FROM $name.lake VERSION AS OF 3
           |WHERE event_id % 2 = 0""".stripMargin)
      spark.catalog.dropTempView(srcView)
      val head = Catalog.headVersion(spark, lay)
      require(head == 4L, s"merge fixture head drifted: $head")
      val fs = new org.apache.hadoop.fs.Path(tmp)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.create(new org.apache.hadoop.fs.Path(tmp, "_SUCCESS"), true).close()
    }
    dir
  }

  private def mergeCatalog(spark: SparkSession, sfDir: String): String = {
    val root = mergeLakeRoot(spark, sfDir)
    val name = s"graftdml_${corpusKey(spark, sfDir)}"
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    name
  }

  /** `q_sql_lake_merge`: the post-MERGE snapshot (`VERSION AS OF 2` —
    * above the merge, below the update, so the row also pins time
    * travel over a DV+append record). */
  def mergeAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val cat = mergeCatalog(spark, sfDir)
    spark.sql(
      s"""SELECT source, count(*) AS n_events,
         |  CAST(sum(cents) AS BIGINT) AS sum_cents
         |FROM $cat.lake VERSION AS OF 2
         |GROUP BY source ORDER BY source""".stripMargin)
  }

  val mergeAggOracleSql: String =
    """WITH base AS (
      |  SELECT event_type AS source, event_id,
      |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events),
      |merged AS (
      |  SELECT source,
      |    CASE WHEN event_id % 7 = 0 AND event_id % 2 = 0
      |      THEN cents + 1000000 ELSE cents END AS cents
      |  FROM base WHERE NOT (event_id % 7 = 0 AND event_id % 2 = 1)
      |  UNION ALL
      |  SELECT source, cents + 55 AS cents FROM base WHERE event_id % 7 = 0)
      |SELECT source, count(*) AS n_events,
      |  CAST(sum(cents) AS BIGINT) AS sum_cents
      |FROM merged GROUP BY source ORDER BY source""".stripMargin

  /** `q_sql_lake_update`: `VERSION AS OF 3` — the SQL `UPDATE`
    * statement's `cents + 7` applied on top of the merge (below the
    * v4 overwrite). */
  def updateAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val cat = mergeCatalog(spark, sfDir)
    spark.sql(
      s"""SELECT source, count(*) AS n_events,
         |  CAST(sum(cents) AS BIGINT) AS sum_cents
         |FROM $cat.lake VERSION AS OF 3
         |GROUP BY source ORDER BY source""".stripMargin)
  }

  val updateAggOracleSql: String =
    """WITH base AS (
      |  SELECT event_type AS source, event_id,
      |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events),
      |merged AS (
      |  SELECT source, event_id,
      |    CASE WHEN event_id % 7 = 0 AND event_id % 2 = 0
      |      THEN cents + 1000000 ELSE cents END AS cents
      |  FROM base WHERE NOT (event_id % 7 = 0 AND event_id % 2 = 1)
      |  UNION ALL
      |  SELECT source, event_id + 1000000000 AS event_id, cents + 55 AS cents
      |  FROM base WHERE event_id % 7 = 0),
      |updated AS (
      |  SELECT source,
      |    CASE WHEN event_id % 3 = 0 THEN cents + 7 ELSE cents END AS cents
      |  FROM merged)
      |SELECT source, count(*) AS n_events,
      |  CAST(sum(cents) AS BIGINT) AS sum_cents
      |FROM updated GROUP BY source ORDER BY source""".stripMargin

  /** `q_sql_lake_overwrite`: the head snapshot after the v4
    * SELF-REFERENTIAL `INSERT OVERWRITE … SELECT … FROM <self>
    * VERSION AS OF 3 WHERE event_id % 2 = 0` — green only if the
    * atomic replace kept exactly the even-id rows of the post-update
    * state (and the time-traveled self-read saw v3, not the write in
    * flight). */
  def overwriteAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val cat = mergeCatalog(spark, sfDir)
    spark.sql(
      s"""SELECT source, count(*) AS n_events,
         |  CAST(sum(cents) AS BIGINT) AS sum_cents
         |FROM $cat.lake GROUP BY source ORDER BY source""".stripMargin)
  }

  val overwriteAggOracleSql: String =
    """WITH base AS (
      |  SELECT event_type AS source, event_id,
      |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events),
      |merged AS (
      |  SELECT source, event_id,
      |    CASE WHEN event_id % 7 = 0 AND event_id % 2 = 0
      |      THEN cents + 1000000 ELSE cents END AS cents
      |  FROM base WHERE NOT (event_id % 7 = 0 AND event_id % 2 = 1)
      |  UNION ALL
      |  SELECT source, event_id + 1000000000 AS event_id, cents + 55 AS cents
      |  FROM base WHERE event_id % 7 = 0),
      |updated AS (
      |  SELECT source, event_id,
      |    CASE WHEN event_id % 3 = 0 THEN cents + 7 ELSE cents END AS cents
      |  FROM merged)
      |SELECT source, count(*) AS n_events,
      |  CAST(sum(cents) AS BIGINT) AS sum_cents
      |FROM updated WHERE event_id % 2 = 0
      |GROUP BY source ORDER BY source""".stripMargin

  /** `q_sql_lake_merge_changes`: the change feed of EXACTLY the merge
    * commit — `table_changes(cat, 1, 2)` — per change type: the
    * matched keys' OLD rows retract (both the DELETE and the UPDATE
    * arms), the updated and inserted rows arrive, all at one
    * version. */
  def mergeCdfAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val cat = mergeCatalog(spark, sfDir)
    graft.functions.GraftExtensions.register(spark) // the TVF
    spark.sql(
      s"""SELECT _change_type, count(*) AS n,
         |  CAST(sum(cents) AS BIGINT) AS sum_cents
         |FROM table_changes('$cat', 1, 2)
         |GROUP BY _change_type ORDER BY _change_type""".stripMargin)
  }

  /** Fourth deterministic fixture — the RESTORE statement: v1 = the
    * full corpus; v2 = `deleteLakeWhere(event_id % 10 = 3)` (a DV
    * commit); v3 = `materializeLakeDeletes` (rewrites the DV'd files
    * WITHOUT the deleted rows, drops the DV, removes the originals);
    * v4 = SQL `RESTORE TABLE … TO VERSION AS OF 2`. The restore must
    * therefore RE-ADD the original data files AND the retired DV file
    * while removing the materialized rewrites — the head snapshot is
    * only right if the re-added DV applies to the re-added files
    * again. A DuckDB replay over raw `events` gates exactly that. */
  private def restoreLakeRoot(spark: SparkSession, sfDir: String): String = {
    val dir =
      s"${graft.ops.Artifacts.sharedRoot}/sql_lake_restore/k=${corpusKey(spark, sfDir)}"
    graft.ops.Artifacts.commit(spark, dir) { tmp =>
      val lay = Layout(tmp)
      val base = graft.Events.events(spark, sfDir).select(
        col("event_type").as("source"), col("event_id"), col("user_id"),
        floor(col("value") * lit(100) + lit(0.5)).cast("long").as("cents"))
      val v1 = Catalog.commitLake(spark, lay, base)
      require(v1 == 1L, s"restore fixture seq drifted: $v1")
      val v2 = Catalog.deleteLakeWhere(spark, lay, col("event_id") % 10 === 3)
      require(v2 == 2L, s"restore fixture seq drifted: $v2")
      require(Catalog.materializeLakeDeletes(spark, lay) > 0,
        "restore fixture: materialize found nothing to rewrite")
      require(Catalog.headVersion(spark, lay) == 3L, "materialize seq drifted")
      val name = s"graftr_build_${java.util.UUID.randomUUID()
        .toString.replace("-", "")}"
      spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$name.root", tmp)
      val out = spark.sql(s"RESTORE TABLE $name.lake TO VERSION AS OF 2")
        .collect().head
      require(out.getLong(0) == 2L && out.getLong(1) == 4L,
        s"restore fixture: unexpected restore result $out")
      val fs = new org.apache.hadoop.fs.Path(tmp)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.create(new org.apache.hadoop.fs.Path(tmp, "_SUCCESS"), true).close()
    }
    dir
  }

  /** `q_sql_lake_restore`: the head snapshot after the v4 RESTORE —
    * the v2 view again (deletions re-applied through the RE-ADDED DV
    * over the RE-ADDED original files; the materialized rewrites
    * retired), plus the restored version's history attribution. */
  def restoreAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val root = restoreLakeRoot(spark, sfDir)
    val name = s"graftr_${corpusKey(spark, sfDir)}"
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    spark.sql(
      s"""SELECT source, count(*) AS n_events,
         |  CAST(sum(cents) AS BIGINT) AS sum_cents
         |FROM $name.lake GROUP BY source ORDER BY source""".stripMargin)
  }

  val restoreAggOracleSql: String =
    """SELECT event_type AS source, count(*) AS n_events,
      |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
      |FROM events WHERE NOT (event_id % 10 = 3)
      |GROUP BY event_type ORDER BY source""".stripMargin

  /** Fifth deterministic fixture — RENAME/DROP COLUMN: v1 = the even
    * half with columns `(source, event_id, amount, tag)`; v2 = `RENAME
    * COLUMN amount TO cents` + v3 = `DROP COLUMN tag` (both SQL DDL
    * through the catalog); v4 = the odd half written with the NEW
    * schema `(source, event_id, cents)`. The head aggregate below is
    * only right if the v1 files' physical `amount` maps onto `cents`
    * at read (two name epochs union), and `tag` is projected away —
    * the DuckDB replay over raw `events` knows nothing of either. */
  private def renameLakeRoot(spark: SparkSession, sfDir: String): String = {
    val dir =
      s"${graft.ops.Artifacts.sharedRoot}/sql_lake_rn/k=${corpusKey(spark, sfDir)}"
    graft.ops.Artifacts.commit(spark, dir) { tmp =>
      val lay = Layout(tmp)
      val base = graft.Events.events(spark, sfDir).select(
        col("event_type").as("source"), col("event_id"),
        floor(col("value") * lit(100) + lit(0.5)).cast("long").as("cents"))
      val v1 = Catalog.commitLake(spark, lay,
        base.filter(col("event_id") % 2 === 0)
          .withColumnRenamed("cents", "amount")
          .withColumn("tag", lit("legacy")))
      require(v1 == 1L, s"rename fixture seq drifted: $v1")
      val name = s"graftrn_build_${java.util.UUID.randomUUID()
        .toString.replace("-", "")}"
      spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$name.root", tmp)
      spark.sql(s"ALTER TABLE $name.lake RENAME COLUMN amount TO cents")
      spark.sql(s"ALTER TABLE $name.lake DROP COLUMN tag")
      val v4 = Catalog.commitLake(spark, lay,
        base.filter(col("event_id") % 2 === 1))
      require(v4 == 4L, s"rename fixture seq drifted: $v4")
      val fs = new org.apache.hadoop.fs.Path(tmp)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.create(new org.apache.hadoop.fs.Path(tmp, "_SUCCESS"), true).close()
    }
    dir
  }

  /** `q_sql_lake_rename`: per-source count + exact sum over BOTH name
    * epochs through the renamed column, pure SQL. */
  def renameAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val root = renameLakeRoot(spark, sfDir)
    val name = s"graftrn_${corpusKey(spark, sfDir)}"
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    spark.sql(
      s"""SELECT source, count(*) AS n_events,
         |  CAST(sum(cents) AS BIGINT) AS sum_cents
         |FROM $name.lake GROUP BY source ORDER BY source""".stripMargin)
  }

  val renameAggOracleSql: String =
    """SELECT event_type AS source, count(*) AS n_events,
      |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
      |FROM events
      |GROUP BY event_type ORDER BY source""".stripMargin

  /** Sixth deterministic fixture — the pure-SQL bootstrap: the lake is
    * BORN via `CREATE TABLE` (schema facts on an empty log) and filled
    * by `INSERT INTO … SELECT` from a temp view over the corpus; no
    * typed Scala commit anywhere. Green only if the facts-born schema
    * (source reported LAST), Spark's INSERT alignment against it, and
    * the ordinary snapshot read all compose. */
  private def createLakeRoot(spark: SparkSession, sfDir: String): String = {
    // `_cr2`: the round-12 fixture declares skipping stats as TABLE
    // properties (a different build than round 11's `_cr` — the
    // artifact path must change with it)
    val dir =
      s"${graft.ops.Artifacts.sharedRoot}/sql_lake_cr2/k=${corpusKey(spark, sfDir)}"
    graft.ops.Artifacts.commit(spark, dir) { tmp =>
      val lay = Layout(tmp)
      val base = graft.Events.events(spark, sfDir).select(
        col("event_type").as("source"), col("event_id"), col("user_id"),
        floor(col("value") * lit(100) + lit(0.5)).cast("long").as("cents"))
      val srcView = s"graft_create_src_${java.util.UUID.randomUUID()
        .toString.replace("-", "")}"
      base.createOrReplaceTempView(srcView)
      val name = s"graftcr_build_${java.util.UUID.randomUUID()
        .toString.replace("-", "")}"
      spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$name.root", tmp)
      val colsDdl = base.schema.fields
        .map(f => s"${f.name} ${f.dataType.sql}").mkString(", ")
      // skipping stats as a TABLE fact (round 12): the INSERT below
      // commits per-file min/max on event_id and a bloom on user_id
      // with no typed call anywhere — [[pointAgg]] reads through them
      spark.sql(s"CREATE TABLE $name.lake ($colsDdl) " +
        "PARTITIONED BY (source) " +
        "TBLPROPERTIES('stats.cols'='event_id', 'bloom.cols'='user_id')")
      // positional INSERT against the reported order: source LAST
      val nonSrc = base.schema.fieldNames.filterNot(_ == "source")
      spark.sql(s"INSERT INTO $name.lake SELECT ${nonSrc.mkString(", ")}, " +
        s"source FROM $srcView")
      spark.catalog.dropTempView(srcView)
      require(Catalog.headVersion(spark, lay) == 2L, "create fixture drifted")
      val fs = new org.apache.hadoop.fs.Path(tmp)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.create(new org.apache.hadoop.fs.Path(tmp, "_SUCCESS"), true).close()
    }
    dir
  }

  /** `q_sql_lake_create`: the snapshot aggregate over the SQL-born
    * lake — full corpus, per source. */
  def createAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val root = createLakeRoot(spark, sfDir)
    val name = s"graftcr_${corpusKey(spark, sfDir)}"
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    spark.sql(
      s"""SELECT source, count(*) AS n_events,
         |  CAST(sum(cents) AS BIGINT) AS sum_cents
         |FROM $name.lake GROUP BY source ORDER BY source""".stripMargin)
  }

  val createAggOracleSql: String =
    """SELECT event_type AS source, count(*) AS n_events,
      |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
      |FROM events
      |GROUP BY event_type ORDER BY source""".stripMargin

  /** `q_sql_lake_point`: a selective range + point predicate over the
    * SQL-born, TBLPROPERTIES-stats lake — the pushed conjuncts reach
    * the manifest-log skipping index (file-level min/max on
    * `event_id`, bloom on `user_id`) before any footer opens; the
    * DuckDB replay over raw events gates that the pruned read is
    * EXACT, at corpus volume, through a lake no typed call ever
    * touched. */
  def pointAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val root = createLakeRoot(spark, sfDir)
    val name = s"graftcr_${corpusKey(spark, sfDir)}"
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    spark.sql(
      s"""SELECT event_id, user_id, cents
         |FROM $name.lake
         |WHERE event_id >= 1000 AND event_id <= 1200
         |ORDER BY event_id, user_id, cents""".stripMargin)
  }

  val pointAggOracleSql: String =
    """SELECT event_id, user_id,
      |  CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      |FROM events
      |WHERE event_id >= 1000 AND event_id <= 1200
      |ORDER BY event_id, user_id, cents""".stripMargin

  /** Seventh deterministic fixture — the MULTI-TABLE catalog: two
    * tables born via `CREATE TABLE <cat>.<name>` (per-table manifest
    * logs under `_tables/`), filled by SQL INSERT, one thinned by a
    * per-table SQL DELETE — no typed Scala commit anywhere. The join
    * query below is only right if each verb landed on ITS OWN log
    * (the DELETE's deletion vector must thin `usr` without touching
    * `ev`) and the cross-table join reads both snapshots. */
  private def twoTablesRoot(spark: SparkSession, sfDir: String): String = {
    val dir =
      s"${graft.ops.Artifacts.sharedRoot}/sql_lake_2t/k=${corpusKey(spark, sfDir)}"
    graft.ops.Artifacts.commit(spark, dir) { tmp =>
      val base = graft.Events.events(spark, sfDir).select(
        col("event_type").as("source"), col("event_id"), col("user_id"),
        floor(col("value") * lit(100) + lit(0.5)).cast("long").as("cents"))
      val srcView = s"graft_2t_src_${java.util.UUID.randomUUID()
        .toString.replace("-", "")}"
      base.createOrReplaceTempView(srcView)
      val name = s"graft2t_build_${java.util.UUID.randomUUID()
        .toString.replace("-", "")}"
      spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$name.root", tmp)
      spark.sql(s"CREATE TABLE $name.ev (event_id BIGINT, user_id BIGINT, " +
        "cents BIGINT, source STRING) PARTITIONED BY (source)")
      spark.sql(s"CREATE TABLE $name.usr (user_id BIGINT, grp BIGINT, " +
        "source STRING)")
      spark.sql(s"INSERT INTO $name.ev " +
        s"SELECT event_id, user_id, cents, source FROM $srcView")
      spark.sql(s"INSERT INTO $name.usr " +
        s"SELECT DISTINCT user_id, user_id % 7, 'dim' FROM $srcView")
      // an attribute-level predicate (the SupportsDelete filter language)
      spark.sql(s"DELETE FROM $name.usr WHERE grp = 0")
      spark.catalog.dropTempView(srcView)
      require(Catalog.headVersion(spark,
        Layout(s"$tmp/_tables/ev")) == 2L, "2t fixture: ev log drifted")
      require(Catalog.headVersion(spark,
        Layout(s"$tmp/_tables/usr")) == 3L, "2t fixture: usr log drifted")
      val fs = new org.apache.hadoop.fs.Path(tmp)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.create(new org.apache.hadoop.fs.Path(tmp, "_SUCCESS"), true).close()
    }
    dir
  }

  /** `q_sql_lake_two_tables`: the cross-table join over two SQL-born
    * tables with independent histories — per user group, events of
    * surviving (undeleted) users. */
  def twoTablesAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val root = twoTablesRoot(spark, sfDir)
    val name = s"graft2t_${corpusKey(spark, sfDir)}"
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    spark.sql(
      s"""SELECT u.grp, count(*) AS n_events,
         |  CAST(sum(e.cents) AS BIGINT) AS sum_cents
         |FROM $name.ev e JOIN $name.usr u ON e.user_id = u.user_id
         |GROUP BY u.grp ORDER BY u.grp""".stripMargin)
  }

  val twoTablesAggOracleSql: String =
    """SELECT user_id % 7 AS grp, count(*) AS n_events,
      |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
      |FROM events WHERE NOT (user_id % 7 = 0)
      |GROUP BY user_id % 7 ORDER BY grp""".stripMargin

  /** Eighth fixture — CROSS-TABLE ATOMIC COMMIT
    * ([[Catalog.commitLakeTransaction]]): the pair (ev, usr) is built
    * by TWO transactions (each writing half of both tables as one
    * unit) with a deliberately CRASHED transaction in between whose
    * poison rows (cents inflated ×10⁶, a phantom user group 999) must
    * never surface — recovery aborts it, and the final join is only
    * right if every committed leg is visible and the aborted legs are
    * not. The reference analogue is the recorder's catalog+fan-out
    * retried as one unit (`event_recorder/lambda_function.py:91`). */
  private def txnRoot(spark: SparkSession, sfDir: String): String = {
    val dir =
      s"${graft.ops.Artifacts.sharedRoot}/sql_lake_txn/k=${corpusKey(spark, sfDir)}"
    graft.ops.Artifacts.commit(spark, dir) { tmp =>
      val base = graft.Events.events(spark, sfDir).select(
        col("event_type").as("source"), col("event_id"), col("user_id"),
        floor(col("value") * lit(100) + lit(0.5)).cast("long").as("cents"))
      val users = base.select(col("user_id"),
        (col("user_id") % 7).as("grp"), lit("dim").as("source")).distinct()
      val name = s"grafttxn_build_${java.util.UUID.randomUUID()
        .toString.replace("-", "")}"
      spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$name.root", tmp)
      spark.sql(s"CREATE TABLE $name.ev (source STRING, event_id BIGINT, " +
        "user_id BIGINT, cents BIGINT) PARTITIONED BY (source)")
      spark.sql(s"CREATE TABLE $name.usr (user_id BIGINT, grp BIGINT, " +
        "source STRING)")
      val evL = Layout(s"$tmp/_tables/ev")
      val usrL = Layout(s"$tmp/_tables/usr")
      Catalog.commitLakeTransaction(spark, Seq(
        evL -> base.filter(col("event_id") % 2 === 0),
        usrL -> users.filter(col("grp") % 2 === 0)))
      // the crashed transaction: poison in BOTH tables, never bound
      try Catalog.commitLakeTransactionImpl(spark, Seq(
          evL -> base.limit(50).withColumn("cents",
            col("cents") + lit(1000000000L)),
          usrL -> users.limit(50).withColumn("grp", lit(999L))),
        None, beforeBind =
          () => throw new RuntimeException("injected crash"))
      catch { case e: RuntimeException
          if e.getMessage == "injected crash" => () }
      require(Catalog.resolveTransactions(spark, evL, 0L).nonEmpty,
        "txn fixture: the crashed transaction must be pending")
      Catalog.resolveTransactions(spark, usrL, 0L)
      Catalog.commitLakeTransaction(spark, Seq(
        evL -> base.filter(col("event_id") % 2 === 1),
        usrL -> users.filter(col("grp") % 2 === 1)))
      require(Catalog.pendingTransactions(spark, evL).isEmpty &&
        Catalog.pendingTransactions(spark, usrL).isEmpty,
        "txn fixture: unresolved legs remain")
      val fs = new org.apache.hadoop.fs.Path(tmp)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.create(new org.apache.hadoop.fs.Path(tmp, "_SUCCESS"), true).close()
    }
    dir
  }

  /** `q_sql_lake_txn`: per user group, events of transactionally-
    * committed users — exact iff both transactions are fully visible
    * and the aborted one fully invisible. */
  def txnAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val root = txnRoot(spark, sfDir)
    val name = s"grafttxn_${corpusKey(spark, sfDir)}"
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    spark.sql(
      s"""SELECT u.grp, count(*) AS n_events,
         |  CAST(sum(e.cents) AS BIGINT) AS sum_cents
         |FROM $name.ev e JOIN $name.usr u ON e.user_id = u.user_id
         |GROUP BY u.grp ORDER BY u.grp""".stripMargin)
  }

  val txnAggOracleSql: String =
    """SELECT user_id % 7 AS grp, count(*) AS n_events,
      |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
      |FROM events GROUP BY user_id % 7 ORDER BY grp""".stripMargin

  /** Round-14 fixture — MIXED-VERB cross-table transaction
    * ([[Catalog.commitLakeTransactionLegs]]): the classic MOVE shape.
    * After a committed full build of (ev, usr), ONE transaction
    * deletes the `user_id % 13 = 0` slice from `ev` AND inserts
    * exactly those rows into `quar` — atomic, so the final split is
    * exact iff the delete leg's DV and the insert leg became visible
    * together. A second mixed-verb transaction (poison: delete the
    * `% 13 = 1` slice + quarantine rows with cents ×10⁹) CRASHES
    * before its bind and is recovery-aborted — neither its DV nor its
    * rows may surface, and `resolveTransactions` on `ev` alone must
    * sweep the quarantine leg's bytes (the round-14 sibling sweep). */
  private def txnMoveRoot(spark: SparkSession, sfDir: String): String = {
    val dir = s"${graft.ops.Artifacts.sharedRoot}/sql_lake_txn_move/" +
      s"k=${corpusKey(spark, sfDir)}"
    graft.ops.Artifacts.commit(spark, dir) { tmp =>
      val base = graft.Events.events(spark, sfDir).select(
        col("event_type").as("source"), col("event_id"), col("user_id"),
        floor(col("value") * lit(100) + lit(0.5)).cast("long").as("cents"))
      val users = base.select(col("user_id"),
        (col("user_id") % 7).as("grp"), lit("dim").as("source")).distinct()
      val name = s"graftmv_build_${java.util.UUID.randomUUID()
        .toString.replace("-", "")}"
      spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$name.root", tmp)
      spark.sql(s"CREATE TABLE $name.ev (source STRING, event_id BIGINT, " +
        "user_id BIGINT, cents BIGINT) PARTITIONED BY (source)")
      spark.sql(s"CREATE TABLE $name.usr (user_id BIGINT, grp BIGINT, " +
        "source STRING)")
      spark.sql(s"CREATE TABLE $name.quar (source STRING, event_id BIGINT, " +
        "user_id BIGINT, cents BIGINT) PARTITIONED BY (source)")
      val evL = Layout(s"$tmp/_tables/ev")
      val usrL = Layout(s"$tmp/_tables/usr")
      val quarL = Layout(s"$tmp/_tables/quar")
      Catalog.commitLakeTransaction(spark, Seq(evL -> base, usrL -> users))
      // THE MOVE, through the round-14 SQL statement (the atomic
      // delete-from-ev + insert-into-quar under one txn marker; the
      // statement path exercises moveLakeRows' under-lock lockstep
      // derivation end-to-end against the oracle)
      val mv = spark.sql(
        s"MOVE $name.ev TO $name.quar WHERE user_id % 13 = 0").head
      require(mv.getString(0) == "move" && mv.getLong(1) > 0 &&
        mv.getLong(2) > 0, s"move must claim both legs: $mv")
      // the crashed mixed-verb transaction: a poison delete slice in
      // ev + poison rows in quar, never bound
      try Catalog.commitLakeTransactionLegsImpl(spark, Seq(
          Catalog.TxnLeg(evL, deleteWhere = Some(col("user_id") % 13 === 1)),
          Catalog.TxnLeg(quarL, batch = Some(base.limit(50)
            .withColumn("cents", col("cents") + lit(1000000000L))))),
        None, beforeBind = () => throw new RuntimeException("injected crash"))
      catch { case e: RuntimeException
          if e.getMessage == "injected crash" => () }
      require(Catalog.resolveTransactions(spark, evL, 0L).nonEmpty,
        "txn-move fixture: the crashed transaction must be pending")
      require(Catalog.pendingTransactions(spark, evL).isEmpty &&
        Catalog.pendingTransactions(spark, quarL).isEmpty,
        "txn-move fixture: unresolved legs remain (sibling sweep ran)")
      val fs = new org.apache.hadoop.fs.Path(tmp)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.create(new org.apache.hadoop.fs.Path(tmp, "_SUCCESS"), true).close()
    }
    dir
  }

  /** `q_sql_lake_txn_move`: the post-move split, both sides — exact
    * iff the move's delete leg and insert leg are visible TOGETHER
    * and the aborted mixed-verb transaction is fully invisible. */
  def txnMoveAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val root = txnMoveRoot(spark, sfDir)
    val name = s"graftmv_${corpusKey(spark, sfDir)}"
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    spark.sql(
      s"""SELECT 'live' AS part, u.grp, count(*) AS n_events,
         |  CAST(sum(e.cents) AS BIGINT) AS sum_cents
         |FROM $name.ev e JOIN $name.usr u ON e.user_id = u.user_id
         |GROUP BY u.grp
         |UNION ALL
         |SELECT 'moved' AS part, u.grp, count(*) AS n_events,
         |  CAST(sum(q.cents) AS BIGINT) AS sum_cents
         |FROM $name.quar q JOIN $name.usr u ON q.user_id = u.user_id
         |GROUP BY u.grp
         |ORDER BY part, grp""".stripMargin)
  }

  val txnMoveAggOracleSql: String =
    """SELECT 'live' AS part, user_id % 7 AS grp, count(*) AS n_events,
      |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
      |FROM events WHERE NOT user_id % 13 = 0 GROUP BY user_id % 7
      |UNION ALL
      |SELECT 'moved' AS part, user_id % 7 AS grp, count(*) AS n_events,
      |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
      |FROM events WHERE user_id % 13 = 0 GROUP BY user_id % 7
      |ORDER BY part, grp""".stripMargin

  /** Ninth fixture — NULL-COUNT file skipping at corpus volume: a
    * SQL-born table whose `cents` is NULL on a deterministic slice
    * (event_id % 11 = 0), `stats.cols` declared so every committed
    * file carries per-column null counts. The `IS NULL` query below
    * consults them through the DSv2 pushdown
    * ([[GraftFilters.nullChecksOf]]) — the quality-gate scan shape
    * min/max can never serve (physical deleted-bytes pin:
    * FileStatsSpec). */
  private def nullsRoot(spark: SparkSession, sfDir: String): String = {
    val dir =
      s"${graft.ops.Artifacts.sharedRoot}/sql_lake_nulls/k=${corpusKey(spark, sfDir)}"
    graft.ops.Artifacts.commit(spark, dir) { tmp =>
      // cents NULL iff event_id % 11 = 0, REGARDLESS of `value`: a
      // NULL value must not add extra null rows the oracle's
      // event_id-only predicate would miss (review catch — the tested
      // corpora carry no NULL value, but the fixture must not depend
      // on that)
      val base = graft.Events.events(spark, sfDir).select(
        col("event_type").as("source"), col("event_id"),
        when(col("event_id") % 11 === 0, lit(null))
          .otherwise(coalesce(
            floor(col("value") * lit(100) + lit(0.5)).cast("long"), lit(0L)))
          .as("cents"))
      val srcView = s"graft_nulls_src_${java.util.UUID.randomUUID()
        .toString.replace("-", "")}"
      base.createOrReplaceTempView(srcView)
      val name = s"graftnulls_build_${java.util.UUID.randomUUID()
        .toString.replace("-", "")}"
      spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$name.root", tmp)
      spark.sql(s"CREATE TABLE $name.nt (event_id BIGINT, cents BIGINT, " +
        "source STRING) PARTITIONED BY (source) " +
        "TBLPROPERTIES('stats.cols'='cents')")
      spark.sql(s"INSERT INTO $name.nt " +
        s"SELECT event_id, cents, source FROM $srcView")
      spark.catalog.dropTempView(srcView)
      val fs = new org.apache.hadoop.fs.Path(tmp)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.create(new org.apache.hadoop.fs.Path(tmp, "_SUCCESS"), true).close()
    }
    dir
  }

  /** `q_sql_lake_nulls`: the `IS NULL` quality-gate scan per source —
    * exact iff the null-count skip keeps every null-bearing file and
    * the residual predicate stays applied. */
  def nullsAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val root = nullsRoot(spark, sfDir)
    val name = s"graftnulls_${corpusKey(spark, sfDir)}"
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    spark.sql(
      s"""SELECT source, count(*) AS n_null,
         |  CAST(sum(event_id) AS BIGINT) AS sum_id
         |FROM $name.nt WHERE cents IS NULL
         |GROUP BY source ORDER BY source""".stripMargin)
  }

  val nullsAggOracleSql: String =
    """SELECT event_type AS source, count(*) AS n_null,
      |  CAST(sum(event_id) AS BIGINT) AS sum_id
      |FROM events WHERE event_id % 11 = 0
      |GROUP BY event_type ORDER BY source""".stripMargin

  val mergeCdfAggOracleSql: String =
    """WITH base AS (
      |  SELECT event_type AS source, event_id,
      |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events),
      |ch AS (
      |  SELECT 'delete' AS _change_type, cents
      |  FROM base WHERE event_id % 7 = 0
      |  UNION ALL
      |  SELECT 'insert' AS _change_type, cents + 1000000 AS cents
      |  FROM base WHERE event_id % 7 = 0 AND event_id % 2 = 0
      |  UNION ALL
      |  SELECT 'insert' AS _change_type, cents + 55 AS cents
      |  FROM base WHERE event_id % 7 = 0)
      |SELECT _change_type, count(*) AS n,
      |  CAST(sum(cents) AS BIGINT) AS sum_cents
      |FROM ch GROUP BY _change_type ORDER BY _change_type""".stripMargin
}
