package graft.lake

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The DSv2 `graft.sql.GraftCatalog` read surface: snapshot SQL,
  * VERSION AS OF / TIMESTAMP AS OF parity with the Scala API, the
  * conf-ranged change-feed table, filter/column pushdown into the
  * inner plan, and read-only enforcement. */
class GraftCatalogSpec extends SparkTestBase {

  private var n = 0
  /** Register a fresh catalog name over `layout` (catalog instances
    * are cached per name, so each test binds its own). */
  private def register(layout: Layout): String = {
    n += 1
    val name = s"g9t$n"
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.sql.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", layout.root)
    name
  }

  test("snapshot SQL ≡ loadLakeSnapshot; VERSION AS OF ≡ loadLakeSnapshot(v); " +
      "TIMESTAMP AS OF resolves through versionAtTimestamp") {
    val layout = Layout(tmpDir("dsv2-basic"))
    val s = spark
    import s.implicits._
    val v1 = Catalog.commitLake(spark, layout,
      Seq(("clicks", "k1", 10L), ("clicks", "k2", 20L), ("logs", "k3", 30L))
        .toDF("source", "key", "v"))
    val v2 = Catalog.deleteLakeWhere(spark, layout, col("key") === "k2")
    val v3 = Catalog.commitLake(spark, layout,
      Seq(("logs", "k4", 40L)).toDF("source", "key", "v"))
    val cat = register(layout)

    def rows(sql: String): Seq[(String, String, Long)] =
      spark.sql(sql).collect()
        .map(r => (r.getAs[String]("source"), r.getAs[String]("key"),
          r.getAs[Long]("v"))).sortBy(_._2).toSeq

    assert(rows(s"SELECT source, key, v FROM $cat.lake") ==
      Seq(("clicks", "k1", 10L), ("logs", "k3", 30L), ("logs", "k4", 40L)))
    assert(rows(s"SELECT source, key, v FROM $cat.lake VERSION AS OF $v1") ==
      Seq(("clicks", "k1", 10L), ("clicks", "k2", 20L), ("logs", "k3", 30L)))
    assert(rows(s"SELECT source, key, v FROM $cat.lake VERSION AS OF $v2") ==
      Seq(("clicks", "k1", 10L), ("logs", "k3", 30L)))

    // full parity with the Scala API at every committed version
    Seq(v1, v2, v3).foreach { v =>
      val api = Catalog.loadLakeSnapshot(spark, layout, v)
        .select("source", "key", "v").collect().map(_.toSeq).toSet
      val sql = spark.sql(s"SELECT source, key, v FROM $cat.lake VERSION AS OF $v")
        .collect().map(_.toSeq).toSet
      assert(sql == api, s"version $v")
    }

    // TIMESTAMP AS OF: far future resolves to head; far past refuses loud
    assert(rows(s"SELECT source, key, v FROM $cat.lake " +
      "TIMESTAMP AS OF '2099-01-01 00:00:00'") ==
      rows(s"SELECT source, key, v FROM $cat.lake"))
    val e = intercept[Exception](
      spark.sql(s"SELECT * FROM $cat.lake TIMESTAMP AS OF '1990-01-01'").collect())
    assert(e.getMessage.contains("TIMESTAMP AS OF") ||
      e.getCause != null && e.getCause.getMessage.contains("TIMESTAMP AS OF"))

    // count(*) exercises the empty-required-columns path
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.lake").collect()
      .head.getLong(0) == 3L)
  }

  test("lake_changes: the conf-ranged CDF table through pure SQL") {
    val layout = Layout(tmpDir("dsv2-cdf"))
    val s = spark
    import s.implicits._
    val v1 = Catalog.commitLake(spark, layout,
      Seq(("clicks", "k1", 10L), ("clicks", "k2", 20L)).toDF("source", "key", "v"))
    Catalog.deleteLakeWhere(spark, layout, col("key") === "k1")
    Catalog.commitLake(spark, layout, Seq(("clicks", "k3", 30L)).toDF("source", "key", "v"))
    val cat = register(layout)
    spark.conf.set("spark.graft.cdf.startingVersion", v1.toString)
    try {
      val got = spark.sql(
        s"SELECT _change_type, key, v FROM $cat.lake_changes ORDER BY key")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
      assert(got == Seq(("delete", "k1", 10L), ("insert", "k3", 30L)))
    } finally spark.conf.unset("spark.graft.cdf.startingVersion")
    // conf cleared: the full feed from version 0
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.lake_changes")
      .collect().head.getLong(0) == 4L)
  }

  test("pushdown: supported filters and the column projection reach the " +
      "inner plan (parquet PushedFilters), unsupported ones still apply") {
    val layout = Layout(tmpDir("dsv2-push"))
    val s = spark
    import s.implicits._
    Catalog.commitLake(spark, layout,
      (1 to 100).map(i => ("clicks", s"k$i", i.toLong)).toDF("source", "key", "v"))
    val cat = register(layout)
    val q = spark.sql(s"SELECT key FROM $cat.lake WHERE v > 90 AND length(key) > 1")
    val plan = q.queryExecution.executedPlan.toString
    // the translatable filter lands in the INNER parquet scan's
    // PushedFilters; length(key) stays above as a residual
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(v,90"),
      s"v > 90 must reach the parquet scan:\n$plan")
    assert(q.collect().map(_.getString(0)).toSet ==
      (91 to 100).map(i => s"k$i").toSet)
    // projection pruning: json-free query must not read the key column
    val q2 = spark.sql(s"SELECT sum(v) AS sv FROM $cat.lake")
    val plan2 = q2.queryExecution.executedPlan.toString
    assert(plan2.contains("ReadSchema: struct<v:bigint>"),
      s"column pruning must reach the scan:\n$plan2")
    assert(q2.collect().head.getLong(0) == (1 to 100).map(_.toLong).sum)
  }

  test("write surface boundaries: lake_changes/lake_catalog refuse INSERT, " +
      "DROP refuses everywhere; listTables lists the three surfaces") {
    val layout = Layout(tmpDir("dsv2-ro"))
    val s = spark
    import s.implicits._
    Catalog.commitLake(spark, layout, Seq(("clicks", "k1", 1L)).toDF("source", "key", "v"))
    val cat = register(layout)
    // derived surfaces stay read-only (the lake table itself now takes
    // INSERT — covered by its own test)
    val e = intercept[Exception](
      spark.sql(s"INSERT INTO $cat.lake_changes SELECT * FROM $cat.lake_changes"))
    assert(e.getMessage.toLowerCase.contains("does not support") ||
      e.getMessage.contains("UNSUPPORTED"), e.getMessage)
    // round-12: created tables drop; the ROOT lake still refuses (it
    // shares the root with the ingest areas)
    val e2 = intercept[Exception](spark.sql(s"DROP TABLE $cat.lake"))
    assert(e2.getMessage.toLowerCase.contains("cannot be dropped"), e2.getMessage)
    assert(spark.sql(s"SHOW TABLES IN $cat").collect()
      .map(_.getString(1)).toSet ==
      Set("lake", "lake_changes", "lake_catalog", "lake_history",
        "lake_detail"))

    // lake_detail ≡ DESCRIBE DETAIL: one row of table-level facts
    val d = spark.sql(s"SELECT * FROM $cat.lake_detail").collect().head
    assert(d.getAs[Long]("n_files") == 1L)
    assert(d.getAs[Long]("total_bytes") > 0L)
    assert(d.getAs[Long]("n_sources") == 1L)
    assert(d.getAs[String]("schema_ddl").contains("key"))
    assert(d.getAs[String]("partition_columns") == "source")
    intercept[Exception](
      spark.sql(s"SELECT * FROM $cat.lake_detail VERSION AS OF 1").collect())
  }

  test("lake_history ≡ DESCRIBE HISTORY: one row per retained version " +
      "with per-commit attribution; commit times monotone; the erase " +
      "note surfaces in SQL") {
    val layout = Layout(tmpDir("dsv2-hist"))
    val s = spark
    import s.implicits._
    val v1 = Catalog.commitLake(spark, layout, Seq(
      ("clicks", "k1", """{"user":"A"}""", 10L),
      ("clicks", "k2", """{"user":"B"}""", 20L)).toDF("source", "key", "json", "v"))
    val v2 = Catalog.commitLakeAddColumn(spark, layout, "score", "int")
    val v3 = Catalog.commitLakeWidenColumn(spark, layout, "score", "bigint")
    val v4 = Catalog.deleteLakeWhere(spark, layout, col("key") === "k2")
    val v5 = Catalog.addLakeExpectation(spark, layout, "v_pos", "v > 0")
    Erase.eraseWhere(spark, layout, "clicks", Erase.jsonFieldEquals("user", "A"))
    val cat = register(layout)

    val hist = spark.sql(s"SELECT * FROM $cat.lake_history ORDER BY version")
      .collect()
    val byV = hist.map(r => r.getAs[Long]("version") -> r).toMap
    assert(hist.map(_.getAs[Long]("version")).toSeq ==
      (1L to Catalog.headVersion(spark, layout)))
    assert(byV(v1).getAs[Int]("n_lake_added") > 0)
    assert(byV(v2).getAs[String]("added_columns") == "score")
    assert(byV(v3).getAs[String]("widened_columns") == "score:bigint")
    assert(byV(v4).getAs[Int]("n_dv_files") > 0)
    assert(byV(v5).getAs[String]("expectation_changes") == "+v_pos")
    assert(hist.exists(_.getAs[String]("note") == "erase"),
      "the erase rewrite must be visible in SQL history")
    val erasedRow = hist.find(_.getAs[String]("note") == "erase").get
    assert(erasedRow.getAs[Int]("n_lake_removed") > 0)
    // times monotone in version order
    val ts = hist.map(_.getAs[java.sql.Timestamp]("commit_ts").getTime).toSeq
    assert(ts == ts.sorted)
  }

  test("INSERT INTO graft.lake ≡ commitLake: one atomic version, visible " +
      "to the CDF, expectations gate it, widened columns land wide; " +
      "NULL source refuses; INSERT OVERWRITE = atomic truncate+append " +
      "in ONE record; TRUNCATE = DV over all") {
    val layout = Layout(tmpDir("dsv2-insert"))
    val s = spark
    import s.implicits._
    Catalog.commitLake(spark, layout,
      Seq(("clicks", "k1", 10)).toDF("source", "key", "v"))
    spark.sql(s"ALTER TABLE ${register(layout)}.lake ALTER COLUMN v TYPE bigint")
    val cat = register(layout)
    val v0 = Catalog.headVersion(spark, layout)

    spark.sql(s"INSERT INTO $cat.lake VALUES ('k2', 5000000000, 'clicks')," +
      s" ('k3', 30, 'logs')")
    val v1 = Catalog.headVersion(spark, layout)
    assert(v1 == v0 + 1, "one INSERT = one atomic commit")
    assert(spark.sql(s"SELECT sum(v) AS sv FROM $cat.lake").head.getLong(0) ==
      10L + 5000000000L + 30L)
    // the CDF carries the inserted rows at their version
    assert(Catalog.lakeChangesBetween(spark, layout, v0)
      .filter(col("_change_type") === "insert").count() == 2L)
    // physical: the staged files carry the widened type
    Catalog.lakeFilesAsOf(spark, layout).filter(_.contains(f"c$v1%020d"))
      .foreach { rel =>
        assert(spark.read.parquet(s"${layout.lakeDir}/$rel")
          .schema("v").dataType == org.apache.spark.sql.types.LongType, rel)
      }

    // an expectation gates the SQL INSERT exactly like the typed path
    spark.sql(s"ALTER TABLE $cat.lake ADD CONSTRAINT v_pos CHECK (v > 0)")
    val eGate = intercept[Exception](
      spark.sql(s"INSERT INTO $cat.lake VALUES ('bad', -5, 'clicks')"))
    assert(eGate.getMessage.contains("v_pos") ||
      (eGate.getCause != null && eGate.getCause.getMessage.contains("v_pos")),
      eGate.getMessage)
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.lake").head.getLong(0) == 3L)

    // NULL source refuses IN the write pass (raise_error in the
    // partition projection), nothing staged
    val eNull = intercept[Exception](
      spark.sql(s"INSERT INTO $cat.lake VALUES ('x', 1, CAST(NULL AS STRING))"))
    assert(eNull.getMessage.contains("source") ||
      (eNull.getCause != null && eNull.getCause.getMessage.contains("source")),
      eNull.getMessage)
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.lake").head.getLong(0) == 3L)

    // INSERT OVERWRITE: atomic truncate+append in ONE log record —
    // old rows replaced, history below intact, expectations gate the
    // NEW rows (a violating overwrite leaves the table untouched)
    val vPre = Catalog.headVersion(spark, layout)
    spark.sql(s"INSERT OVERWRITE $cat.lake VALUES ('only', 7, 'clicks')")
    assert(Catalog.headVersion(spark, layout) == vPre + 1,
      "one OVERWRITE = one atomic commit")
    assert(spark.sql(s"SELECT key, v FROM $cat.lake").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("only", 7L)))
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.lake VERSION AS OF $v1")
      .head.getLong(0) == 3L, "time travel below the overwrite")
    intercept[Exception](
      spark.sql(s"INSERT OVERWRITE $cat.lake VALUES ('bad', -5, 'clicks')"))
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.lake").head.getLong(0) == 1L)

    // TRUNCATE: everything DV-deleted, history intact below
    spark.sql(s"TRUNCATE TABLE $cat.lake")
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.lake").head.getLong(0) == 0L)
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.lake VERSION AS OF $v1")
      .head.getLong(0) == 3L)
  }

  test("ALTER TABLE through the catalog ≡ the typed evolution commits: " +
      "ADD COLUMNS, ALTER COLUMN TYPE widening, ADD/DROP CONSTRAINT " +
      "CHECK; lossy and unsupported ALTERs refuse") {
    val layout = Layout(tmpDir("dsv2-alter"))
    val s = spark
    import s.implicits._
    Catalog.commitLake(spark, layout,
      Seq(("clicks", "k1", 10), ("clicks", "k2", 20)).toDF("source", "key", "v"))
    val cat = register(layout)

    // ADD COLUMNS → commitLakeAddColumn (null-backfilled at read)
    spark.sql(s"ALTER TABLE $cat.lake ADD COLUMNS (score bigint)")
    assert(Catalog.lakeAddedColumns(spark, layout).map(t => (t._2, t._3.toLowerCase))
      == Seq(("score", "bigint")))
    assert(spark.sql(s"SELECT score FROM $cat.lake").collect()
      .forall(_.isNullAt(0)))

    // ALTER COLUMN TYPE → commitLakeWidenColumn; post-widening SQL
    // reads the wide type over the narrow files
    spark.sql(s"ALTER TABLE $cat.lake ALTER COLUMN v TYPE bigint")
    assert(Catalog.lakeWidenedColumns(spark, layout).map(t => (t._2, t._3.toLowerCase))
      == Seq(("v", "bigint")))
    assert(spark.sql(s"SELECT v FROM $cat.lake").schema("v").dataType ==
      org.apache.spark.sql.types.LongType)
    Catalog.commitLake(spark, layout,
      Seq(("clicks", "k3", 5000000000L)).toDF("source", "key", "v"))
    assert(spark.sql(s"SELECT sum(v) AS sv FROM $cat.lake").head.getLong(0) ==
      10L + 20L + 5000000000L)
    // a LOSSY type change refuses, nothing committed — Spark's own
    // analysis-time upcast check (NOT_SUPPORTED_CHANGE_COLUMN) fires
    // first; the catalog's widening whitelist backstops API callers
    val eLossy = intercept[Exception](
      spark.sql(s"ALTER TABLE $cat.lake ALTER COLUMN v TYPE int"))
    assert(eLossy.getMessage.contains("widening") ||
      eLossy.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN"),
      eLossy.getMessage)
    assert(Catalog.lakeWidenedColumns(spark, layout).size == 1)

    // ADD CONSTRAINT … CHECK → a commit-time expectation that rejects
    // a violating batch on the TYPED path
    spark.sql(s"ALTER TABLE $cat.lake ADD CONSTRAINT v_pos CHECK (v > 0)")
    assert(Catalog.lakeExpectations(spark, layout) == Map("v_pos" -> "v > 0"))
    val eGate = intercept[IllegalArgumentException](Catalog.commitLake(spark, layout,
      Seq(("clicks", "bad", -1L)).toDF("source", "key", "v")))
    assert(eGate.getMessage.contains("v_pos"))
    // DROP CONSTRAINT disarms it
    spark.sql(s"ALTER TABLE $cat.lake DROP CONSTRAINT v_pos")
    assert(Catalog.lakeExpectations(spark, layout).isEmpty)

    // renames/drops are metadata-only log facts since round 11
    // (RenameDropSpec owns the semantics; here: the DDL routes)
    spark.sql(s"ALTER TABLE $cat.lake RENAME COLUMN key TO k")
    assert(spark.sql(s"SELECT k FROM $cat.lake").count() > 0)
    // nested fields stay unsupported
    intercept[Exception](
      spark.sql(s"ALTER TABLE $cat.lake RENAME COLUMN a.b TO c"))
  }

  test("multi-change ALTER is ATOMIC: a refused change leaves NOTHING " +
      "committed; a valid mixed statement lands as ONE log record") {
    val layout = Layout(tmpDir("dsv2-alter-atomic"))
    val s = spark
    import s.implicits._
    Catalog.commitLake(spark, layout,
      Seq(("clicks", "k1", 10)).toDF("source", "key", "v"))
    val cat = register(layout)
    val v0 = Catalog.headVersion(spark, layout)

    // second column duplicates an existing one → the FIRST must not
    // stay committed (the old per-change loop stranded it)
    intercept[Exception](
      spark.sql(s"ALTER TABLE $cat.lake ADD COLUMNS (a bigint, key string)"))
    assert(Catalog.lakeAddedColumns(spark, layout).isEmpty,
      "refused multi-ADD must leave no committed prefix")
    assert(Catalog.headVersion(spark, layout) == v0)

    // two adds in one statement: ONE version, both visible, and the
    // statement may widen a column it just added
    spark.sql(s"ALTER TABLE $cat.lake ADD COLUMNS (a int, b bigint)")
    assert(Catalog.headVersion(spark, layout) == v0 + 1,
      "one ALTER statement = one commit")
    assert(Catalog.lakeAddedColumns(spark, layout).map(_._2) == Seq("a", "b"))
    spark.sql(s"ALTER TABLE $cat.lake ALTER COLUMN a TYPE bigint")
    assert(spark.sql(s"SELECT a FROM $cat.lake").schema("a").dataType ==
      org.apache.spark.sql.types.LongType)

    // racing widenings of ONE column serialize under the schema lock:
    // exactly one of int→long / int→double wins, the loser refuses
    // against the NEW effective type (never a long+double chain)
    val layout2 = Layout(tmpDir("dsv2-widen-race"))
    Catalog.commitLake(spark, layout2,
      Seq(("clicks", "k1", 10)).toDF("source", "key", "v"))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val attempts = Seq("bigint", "double").map(t => Future(
      try Right(Catalog.commitLakeWidenColumn(spark, layout2, "v", t))
      catch { case e: IllegalArgumentException => Left(e.getMessage) }))
    val results = Await.result(Future.sequence(attempts), 120.seconds)
    val wins = results.collect { case Right(v) => v }
    assert(wins.size == 1, s"exactly one widening must win, got $results")
    assert(Catalog.lakeWidenedColumns(spark, layout2).size == 1)
  }

  test("SQL data skipping at the FILE level: a pushed range predicate " +
      "prunes stats-excluded files before parquet opens them (pinned " +
      "physically — the excluded file's bytes are gone), result exact") {
    val layout = Layout(tmpDir("dsv2-skip"))
    val s = spark
    import s.implicits._
    Catalog.commitLake(spark, layout,
      (0L to 99L).map(k => ("clicks", k, k * 10)).toDF("source", "k", "v"),
      statsCols = Seq("k"))
    Catalog.commitLake(spark, layout,
      (1000L to 1099L).map(k => ("clicks", k, k * 10)).toDF("source", "k", "v"),
      statsCols = Seq("k"))
    val cat = register(layout)
    // both ranges visible through SQL first (plans the full file list)
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.lake").head.getLong(0)
      == 200L)
    // physically remove range A's bytes — the log still lists it live,
    // so ONLY a file-pruned scan can answer range-B queries
    val fs = new org.apache.hadoop.fs.Path(layout.lakeDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Catalog.lakeFilesAsOf(spark, layout)
      .filter(_.contains(f"c${1L}%020d"))
      .foreach(rel => assert(fs.delete(new org.apache.hadoop.fs.Path(
        s"${layout.lakeDir}/$rel"), false), rel))

    val rows = spark.sql(s"SELECT k, v FROM $cat.lake " +
        "WHERE k >= 1000 AND k <= 1005 ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows == (1000L to 1005L).map(k => (k, k * 10)),
      s"pruned range read stays exact: $rows")
    assert(spark.sql(
      s"SELECT count(*) AS n FROM $cat.lake WHERE k = 1050").head.getLong(0)
      == 1L, "point predicate prunes too")
    // the UNBOUNDED scan must still need range A — proves the pruned
    // queries above really skipped it rather than the file being
    // invisible for some other reason
    intercept[Exception](
      spark.sql(s"SELECT sum(v) FROM $cat.lake").collect())

    // BLOOM skipping: two single-file commits with the SAME key range
    // (min/max can never separate them) but disjoint values — an
    // equality on a value only file B holds must skip file A's carcass
    // via its committed bloom. A bloom has a deterministic ~2% FP set,
    // so the probe key is CHOSEN from the committed filter itself: the
    // first odd key file A's bloom provably rejects.
    val layout2 = Layout(tmpDir("dsv2-skip-bloom"))
    Catalog.commitLake(spark, layout2,
      (0L to 998L by 2).map(k => ("clicks", k, k)).toDF("source", "k", "v")
        .coalesce(1),
      statsCols = Seq("k"), bloomCols = Seq("k"))
    Catalog.commitLake(spark, layout2,
      (1L to 999L by 2).map(k => ("clicks", k, k)).toDF("source", "k", "v")
        .coalesce(1),
      statsCols = Seq("k"), bloomCols = Seq("k"))
    val cat2 = register(layout2)
    // warm the snapshot plan (schema derivation reads every footer;
    // the physical-carcass pin below needs the memoized plan, exactly
    // like a live planner that built its snapshot before a vacuum)
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat2.lake")
      .head.getLong(0) == 1000L)
    val fileA = Catalog.lakeFilesAsOf(spark, layout2)
      .filter(_.contains(f"c${1L}%020d")) match { case Seq(one) => one }
    val bloomA = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(Catalog.lakeFileStatsAsOf(spark, layout2)(fileA))
      .path("_bloom").path("k").asText()
    val probeKey = (1L to 999L by 2).find(k =>
      !BloomStats.mightContain(bloomA, BloomStats.canonical(k))).get
    val fs2 = new org.apache.hadoop.fs.Path(layout2.lakeDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs2.delete(new org.apache.hadoop.fs.Path(
      s"${layout2.lakeDir}/$fileA"), false))
    assert(spark.sql(s"SELECT v FROM $cat2.lake WHERE k = $probeKey")
      .head.getLong(0) == probeKey, "the probe key lives only in file B")
    intercept[Exception](spark.sql(
      s"SELECT count(*) FROM $cat2.lake WHERE k >= 0").collect())
  }

  test("maintenance statements ≡ the typed verbs: OPTIMIZE compacts with " +
      "every prior version readable, MATERIALIZE DELETES rewrites " +
      "DV'd files, VACUUM reclaims, CHECKPOINT folds the log — " +
      "content identical throughout; EXPLAIN plans without executing; " +
      "the retired mutating TVFs refuse naming their statement") {
    val layout = Layout(tmpDir("dsv2-maint"))
    val s = spark
    import s.implicits._
    (1 to 3).foreach { i =>
      Catalog.commitLake(spark, layout,
        Seq(("clicks", s"k$i", i.toLong)).toDF("source", "key", "v"))
    }
    Catalog.deleteLakeWhere(spark, layout, col("key") === "k2")
    val cat = register(layout)
    val vPre = Catalog.headVersion(spark, layout)
    def content: Set[(String, Long)] =
      Catalog.loadLakeSnapshot(spark, layout).select("key", "v").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
    val before = content

    // EXPLAIN OPTIMIZE plans WITHOUT executing — the whole reason the
    // mutating verbs are statements, not analysis-time TVFs
    spark.sql(s"EXPLAIN OPTIMIZE $cat.lake").collect()
    assert(Catalog.headVersion(spark, layout) == vPre,
      "EXPLAIN must not run the optimize")

    // OPTIMIZE: the 3 small files bin-pack; snapshot content identical;
    // every prior version still readable (old files only logically
    // removed until vacuum)
    val opt = spark.sql(s"OPTIMIZE $cat.lake").head
    assert(opt.getAs[String]("verb") == "optimize")
    assert(opt.getAs[Long]("result") == 3L, s"3 small files rewritten: $opt")
    assert(opt.getAs[Long]("head_version") == vPre + 1)
    assert(content == before)
    (1L to vPre).foreach { v =>
      Catalog.loadLakeSnapshot(spark, layout, v).count() // must not throw
    }

    // MATERIALIZE: nothing left (optimize already materialized the DV);
    // add a fresh DV and materialize it away
    Catalog.deleteLakeWhere(spark, layout, col("key") === "k3")
    val mat = spark.sql(s"MATERIALIZE DELETES $cat.lake").head
    assert(mat.getAs[String]("verb") == "materialize_deletes")
    assert(mat.getAs[Long]("result") == 1L, s"one DV'd file rewritten: $mat")
    assert(content == Set(("k1", 1L)))

    // VACUUM DRY RUN first: counts the reclaimable files, deletes
    // nothing (every prior version still readable afterwards)
    val dry = spark.sql(s"SELECT * FROM lake_vacuum('$cat', 0, 'dry')").head
    assert(dry.getAs[Long]("result") > 0L, s"dry-run count: $dry")
    (1L to vPre).foreach { v =>
      Catalog.loadLakeSnapshot(spark, layout, v).count() // still readable
    }
    // VACUUM RETAIN 0 HOURS: the superseded originals reclaim —
    // exactly the dry-run's count; head content unchanged (vacuum
    // never touches the live view)
    val vac = spark.sql(s"VACUUM $cat.lake RETAIN 0 HOURS").head
    assert(vac.getAs[String]("verb") == "vacuum")
    assert(vac.getAs[Long]("result") == dry.getAs[Long]("result"),
      s"real run must reclaim what the dry run counted: $dry vs $vac")
    assert(content == Set(("k1", 1L)))
    intercept[Exception](
      spark.sql(s"SELECT * FROM lake_vacuum('$cat', 0, 'wet')"))

    // CHECKPOINT: folds + prunes; reads keep working above it
    val ck = spark.sql(s"CHECKPOINT $cat.lake").head
    assert(ck.getAs[String]("verb") == "checkpoint")
    assert(ck.getAs[Long]("result") >= 1L, s"checkpoint seq: $ck")
    assert(content == Set(("k1", 1L)))

    // the RETIRED mutating TVFs refuse loud, each naming its statement
    Seq(s"SELECT * FROM lake_optimize('$cat')",
        s"SELECT * FROM lake_vacuum('$cat', 0)", // wet form
        s"SELECT * FROM lake_checkpoint('$cat')",
        s"SELECT * FROM lake_materialize_deletes('$cat')").foreach { q =>
      val e = intercept[Exception](spark.sql(q))
      assert(e.getMessage.toLowerCase.contains("statement"), s"$q → $e")
    }
    assert(content == Set(("k1", 1L)))

    // FSCK: the healthy lake audits clean through SQL…
    def fsck(): Map[String, (Boolean, Long)] =
      spark.sql(s"SELECT * FROM lake_fsck('$cat')").collect()
        .map(r => r.getString(0) -> (r.getBoolean(1), r.getLong(2))).toMap
    val clean = fsck()
    assert(clean.values.forall(_._1), s"healthy lake must audit ok: $clean")
    assert(clean("live_files_exist")._2 == 0)
    // …and a live file whose bytes vanished out-of-band is CAUGHT
    val victim = Catalog.lakeFilesAsOf(spark, layout).head
    val fsk = new org.apache.hadoop.fs.Path(layout.lakeDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fsk.delete(new org.apache.hadoop.fs.Path(
      s"${layout.lakeDir}/$victim"), false))
    val broken = fsck()
    assert(!broken("live_files_exist")._1 &&
      broken("live_files_exist")._2 == 1, broken.toString)
  }

  test("table_changes TVF: two ranges in ONE statement (what the conf " +
      "path cannot express); catalog names and raw roots both resolve; " +
      "non-literal versions refuse loud") {
    val layout = Layout(tmpDir("dsv2-tvf"))
    val s = spark
    import s.implicits._
    val v1 = Catalog.commitLake(spark, layout,
      Seq(("clicks", "k1", 10L), ("clicks", "k2", 20L)).toDF("source", "key", "v"))
    val v2 = Catalog.deleteLakeWhere(spark, layout, col("key") === "k1")
    Catalog.commitLake(spark, layout,
      Seq(("clicks", "k3", 30L)).toDF("source", "key", "v"))
    val cat = register(layout)

    // two DIFFERENT ranges, one statement
    val both = spark.sql(
      s"""SELECT (SELECT count(*) FROM table_changes('$cat', 0, $v1)) AS early,
         |       (SELECT count(*) FROM table_changes('$cat', $v1)) AS late""".stripMargin)
      .head
    assert(both.getLong(0) == 2L, "(0, v1]: the two seed inserts")
    assert(both.getLong(1) == 2L, "(v1, head]: one delete + one insert")

    // rows and change types match the Scala API exactly
    val sql = spark.sql(s"SELECT key, v, _change_type, _commit_version " +
      s"FROM table_changes('$cat', 0)").collect().map(_.toSeq).toSet
    val api = Catalog.lakeChangesBetween(spark, layout, 0L)
      .select("key", "v", "_change_type", "_commit_version")
      .collect().map(_.toSeq).toSet
    assert(sql == api)
    assert(sql.exists(r => r(0) == "k1" && r(2) == "delete" &&
      r(3) == v2))

    // a raw layout root works without any catalog registration
    assert(spark.sql(
      s"SELECT count(*) AS n FROM table_changes('${layout.root}', $v1)")
      .head.getLong(0) == 2L)

    // non-literal version: loud analysis-time refusal
    val e = intercept[Exception](spark.sql(
      s"SELECT * FROM table_changes('$cat', rand())").collect())
    assert(e.getMessage.contains("literal") ||
      (e.getCause != null && e.getCause.getMessage.contains("literal")),
      e.getMessage)
  }

  test("DELETE FROM graft.lake WHERE … ≡ deleteLakeWhere: a DV commit, " +
      "visible in the CDF, history intact below it; untranslatable " +
      "predicates refuse loud with nothing deleted") {
    val layoutSql = Layout(tmpDir("dsv2-del-sql"))
    val layoutApi = Layout(tmpDir("dsv2-del-api"))
    val s = spark
    import s.implicits._
    def seed(layout: Layout): Long = Catalog.commitLake(spark, layout,
      Seq(("clicks", "k1", 10L), ("clicks", "k2", 20L), ("logs", "k3", 30L),
        ("logs", "k4", 40L)).toDF("source", "key", "v"))
    val v1 = seed(layoutSql); seed(layoutApi)
    val cat = register(layoutSql)

    spark.sql(s"DELETE FROM $cat.lake WHERE v > 20 AND source = 'logs'")
    Catalog.deleteLakeWhere(spark, layoutApi,
      col("v") > 20 && col("source") === "logs")

    // SQL ≡ API: identical survivors, identical commit shape (a DV
    // commit — no data file rewritten)
    val sqlRows = Catalog.loadLakeSnapshot(spark, layoutSql)
      .select("key").collect().map(_.getString(0)).toSet
    val apiRows = Catalog.loadLakeSnapshot(spark, layoutApi)
      .select("key").collect().map(_.getString(0)).toSet
    assert(sqlRows == apiRows && sqlRows == Set("k1", "k2"))
    assert(Catalog.lakeFilesAsOf(spark, layoutSql).toSet ==
      Catalog.lakeFilesAsOf(spark, layoutSql, v1).toSet,
      "SQL DELETE must be merge-on-read: same data files, new DV")
    assert(Catalog.dvFilesAsOf(spark, layoutSql).nonEmpty)

    // the delete is on the change feed, exactly once per row
    val dels = Catalog.lakeChangesBetween(spark, layoutSql, v1)
      .filter(col("_change_type") === "delete")
      .select("key").collect().map(_.getString(0)).toSet
    assert(dels == Set("k3", "k4"))
    // time travel below the DELETE still reads all four rows
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.lake VERSION AS OF $v1")
      .head.getLong(0) == 4L)

    // an untranslatable predicate refuses LOUD, deleting nothing
    val e = intercept[Exception](
      spark.sql(s"DELETE FROM $cat.lake WHERE length(key) > 1"))
    assert(e.getMessage.toLowerCase.contains("delete"), e.getMessage)
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.lake").head.getLong(0) == 2L)
  }

  test("RESTORE TABLE … TO VERSION AS OF ≡ restoreLake (the injected " +
      "parser statement): content rewinds, EXPLAIN is side-effect-free, " +
      "the timestamp form resolves, and ordinary SQL still parses") {
    val layout = Layout(tmpDir("dsv2-restore"))
    val s = spark
    import s.implicits._
    val v1 = Catalog.commitLake(spark, layout,
      Seq(("clicks", "k1", 10L), ("clicks", "k2", 20L)).toDF("source", "key", "v"))
    val v2 = Catalog.deleteLakeWhere(spark, layout, col("key") === "k2")
    val cat = register(layout)
    def keys(): Set[String] =
      spark.sql(s"SELECT key FROM $cat.lake").collect().map(_.getString(0)).toSet
    assert(keys() == Set("k1"))

    // EXPLAIN must not restore (the reason this is a statement, not a
    // TVF): plan it, content unchanged
    spark.sql(s"EXPLAIN RESTORE TABLE $cat.lake TO VERSION AS OF $v1").collect()
    assert(keys() == Set("k1"))

    val out = spark.sql(s"RESTORE TABLE $cat.lake TO VERSION AS OF $v1")
      .collect().head
    assert(out.getLong(0) == v1 && out.getLong(1) > v2)
    assert(keys() == Set("k1", "k2"))
    // SQL ≡ API: re-restoring to the same version is a no-op (-1)
    assert(spark.sql(s"RESTORE TABLE $cat.lake TO VERSION AS OF $v1")
      .collect().head.getLong(1) == -1L)
    // the deleted view is still served below the restore
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.lake VERSION AS OF $v2")
      .head.getLong(0) == 1L)

    // the TIMESTAMP form: far future = head state = no-op
    assert(spark.sql(s"RESTORE TABLE $cat.lake TO TIMESTAMP AS OF " +
      "'2099-01-01 00:00:00'").collect().head.getLong(1) == -1L)
    // backquoted identifiers parse too
    assert(spark.sql(s"RESTORE TABLE `$cat`.`lake` TO VERSION AS OF $v1")
      .collect().head.getLong(1) == -1L)

    // only <catalog>.lake is restorable; and ordinary SQL (including a
    // query with 'restore' inside it) still parses through the delegate
    val bad = intercept[Exception](
      spark.sql(s"RESTORE TABLE $cat.lake_history TO VERSION AS OF 1"))
    assert(bad.getMessage.contains("lake"), bad.getMessage)
    assert(spark.sql("SELECT 'RESTORE TABLE x TO VERSION AS OF 1' AS t")
      .head.getString(0).startsWith("RESTORE"))
    // parameterized SQL forwards to the delegate's substitution
    assert(spark.sql("SELECT ? + 1 AS n", Array(41))
      .head.getInt(0) == 42)
  }

  test("CREATE TABLE = schema facts on an empty log: the whole lifecycle " +
      "(CREATE, INSERT, MERGE bootstrap, constraint, evolution) is pure " +
      "SQL; IF NOT EXISTS no-ops on a populated root; CTAS works") {
    val layout = Layout(tmpDir("dsv2-create"))
    val cat = register(layout)
    // (spark.catalog.tableExists resolves via loadTable, which always
    // serves the surfaces — the CREATE gate is the catalog's own
    // tableExists, exercised by the duplicate-CREATE refusal below)
    spark.sql(s"CREATE TABLE $cat.lake (source STRING, key STRING, v BIGINT) " +
      "PARTITIONED BY (source)")
    // empty frame WITH the declared schema, source LAST
    val empt = spark.sql(s"SELECT * FROM $cat.lake")
    assert(empt.columns.toSeq == Seq("key", "v", "source"), empt.columns.toSeq)
    assert(empt.count() == 0)
    // duplicate CREATE refuses; IF NOT EXISTS no-ops
    val dup = intercept[Exception](spark.sql(
      s"CREATE TABLE $cat.lake (source STRING, x INT)"))
    assert(dup.getMessage.contains("already exists"), dup.getMessage)
    spark.sql(s"CREATE TABLE IF NOT EXISTS $cat.lake (source STRING, x INT)")
    assert(spark.sql(s"SELECT * FROM $cat.lake").columns.length == 3)

    // INSERT INTO the created-but-empty table (positional: source last)
    spark.sql(s"INSERT INTO $cat.lake VALUES ('k1', 10, 'clicks')")
    assert(spark.sql(s"SELECT key, v, source FROM $cat.lake").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq ==
      Seq(("k1", 10L, "clicks")))

    // MERGE bootstrap into another CREATEd table with ZERO rows: the
    // NOT MATCHED arm inserts through the empty facts-born target
    val layout2 = Layout(tmpDir("dsv2-create2"))
    val cat2 = register(layout2)
    spark.sql(s"CREATE TABLE $cat2.lake (source STRING, key STRING, v BIGINT)")
    spark.sql(
      s"""MERGE INTO $cat2.lake t USING (SELECT 'clicks' AS source,
         |  'k9' AS key, CAST(90 AS BIGINT) AS v) s
         |ON t.key = s.key
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED THEN INSERT (source, key, v)
         |  VALUES (s.source, s.key, s.v)""".stripMargin)
    assert(spark.sql(s"SELECT key, v FROM $cat2.lake").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("k9", 90L)))

    // refusals: no source column; bad partitioning; LOCATION
    val layout3 = Layout(tmpDir("dsv2-create3"))
    val cat3 = register(layout3)
    assert(intercept[Exception](spark.sql(
      s"CREATE TABLE $cat3.lake (key STRING)")).getMessage.contains("source"))
    assert(intercept[Exception](spark.sql(
      s"CREATE TABLE $cat3.lake (source STRING, key STRING) " +
        "PARTITIONED BY (key)")).getMessage.contains("source"))
    assert(intercept[Exception](spark.sql(
      s"CREATE TABLE $cat3.lake (source STRING) LOCATION '/tmp/x'"))
      .getMessage.contains("root"))
    // round-12: other base names are creatable too (MultiTableSpec);
    // only reserved derived-surface names refuse
    assert(intercept[Exception](spark.sql(
      s"CREATE TABLE $cat3.other_history (source STRING)"))
      .getMessage.toLowerCase.contains("creatable"))

    // CTAS: createTable + the write path in one statement
    spark.sql(s"CREATE TABLE $cat3.lake PARTITIONED BY (source) AS " +
      s"SELECT key, v, source FROM $cat.lake")
    assert(spark.sql(s"SELECT key, v, source FROM $cat3.lake").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq ==
      Seq(("k1", 10L, "clicks")))
  }

  test("SQL `OPTIMIZE … ZORDER BY` ≡ the typed zorder optimize: stats " +
      "tighten on both dimensions through a PURE-SQL lifecycle " +
      "(declared stats.cols feed the rewrite), live view unchanged") {
    val layout = Layout(tmpDir("dsv2-zorder"))
    val s = spark
    import s.implicits._
    // insertion-ordered commits: every file spans the full (a, b)
    // space — the worst case for skipping (OptimizeLakeSpec's shape)
    val rows = (for (a <- 0 until 32; b <- 0 until 32)
      yield ("ev", a.toLong, b.toLong))
      .sortBy { case (_, a, b) => ((a * 37 + b * 17) % 101, a, b) }
    rows.grouped(256).foreach { chunk =>
      Catalog.commitLake(spark, layout,
        chunk.toDF("source", "a", "b").coalesce(1))
    }
    val cat = register(layout)
    // declare the skipping columns as a TABLE fact — the SQL OPTIMIZE
    // statement has no statsCols argument on purpose
    spark.sql(s"ALTER TABLE $cat.lake SET TBLPROPERTIES('stats.cols'='a,b')")
    val before = Catalog.loadLakeSnapshot(spark, layout)
      .select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    def prunedCount(): Int =
      Catalog.lakeFilesOverlapping(spark, layout, "a", 3L, 4L).toSet
        .intersect(
          Catalog.lakeFilesOverlapping(spark, layout, "b", 3L, 4L).toSet).size
    val total = Catalog.lakeFilesAsOf(spark, layout).map(rel =>
      new java.io.File(s"${layout.lakeDir}/$rel").length).sum
    val out = spark.sql(
      s"OPTIMIZE $cat.lake TARGET ${total / 4} ZORDER BY (a, b)").head
    assert(out.getAs[String]("verb") == "optimize")
    assert(out.getAs[Long]("result") >= 4L, s"all files re-clustered: $out")
    val after = Catalog.loadLakeSnapshot(spark, layout)
      .select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(after == before, "re-clustering must not change the live view")
    val filesAfter = Catalog.lakeFilesAsOf(spark, layout).size
    assert(filesAfter >= 2, s"multi-file clustered layout: $filesAfter")
    assert(prunedCount() < filesAfter,
      "a 2-D point range must now skip at least one clustered file")
    // one-column ZORDER is accepted since round 13 (linear-sort
    // degrade — Round13FixSpec pins it); seven columns still refuse
    assert(intercept[Exception](
      spark.sql(s"OPTIMIZE $cat.lake ZORDER BY (a,b,a,b,a,b,a)"))
      .getMessage.contains("1..6 columns"))
  }
}
