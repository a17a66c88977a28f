package graft.lake

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Round-12: table properties as manifest-log facts, and the
  * `stats.cols`/`bloom.cols` declarations honored by EVERY write path
  * — a lake built purely through SQL INSERT / MERGE / UPDATE
  * file-skips exactly like one built by typed
  * `commitLake(statsCols = …)` callers. */
class TablePropsSpec extends SparkTestBase {

  private def registerCatalog(root: String): String = {
    val name = s"gprops_${java.util.UUID.randomUUID().toString.take(8)}"
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.sql.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    name
  }

  test("properties are last-wins log facts; SET/UNSET through SQL ALTER; " +
      "unset of a missing key refuses; checkpoint+prune round-trips them") {
    val s = spark
    import s.implicits._
    val layout = Layout(tmpDir("props-basic"))
    Catalog.commitLake(spark, layout,
      Seq(("clicks", 1L)).toDF("source", "k"))
    val cat = registerCatalog(layout.root)
    spark.sql(s"ALTER TABLE $cat.lake SET TBLPROPERTIES('team'='data', 'tier'='gold')")
    spark.sql(s"ALTER TABLE $cat.lake SET TBLPROPERTIES('tier'='silver')")
    assert(Catalog.lakeProperties(spark, layout) ==
      Map("team" -> "data", "tier" -> "silver"))
    spark.sql(s"ALTER TABLE $cat.lake UNSET TBLPROPERTIES('team')")
    assert(Catalog.lakeProperties(spark, layout) == Map("tier" -> "silver"))
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.lake UNSET TBLPROPERTIES('nope')")
    }
    assert(e.getMessage.contains("no such table property"))
    // version-scoped read: before the first SET there were none
    assert(Catalog.lakeProperties(spark, layout, version = 1L).isEmpty)
    // fold + prune must carry the property facts
    Catalog.checkpoint(spark, layout)
    Catalog.pruneLog(spark, layout)
    assert(Catalog.lakeProperties(spark, layout) == Map("tier" -> "silver"))
    // SHOW TBLPROPERTIES serves the committed facts
    val shown = spark.sql(s"SHOW TBLPROPERTIES $cat.lake").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(shown.get("tier").contains("silver"))
    // DESCRIBE DETAIL carries them too
    assert(spark.sql(s"SELECT properties FROM $cat.lake_detail")
      .head.getString(0).contains("tier=silver"))
  }

  test("declared stats.cols ride every write path: typed append, SQL " +
      "INSERT, MERGE inserts, UPDATE appends all commit fstat lines") {
    val s = spark
    import s.implicits._
    val layout = Layout(tmpDir("props-stats"))
    Catalog.commitLake(spark, layout,
      Seq(("clicks", 1L, 10L)).toDF("source", "k", "v"))
    Catalog.commitLakeAlter(spark, layout,
      setProps = Seq(Catalog.StatsColsProp -> "k"))
    // the pre-declaration file legitimately has no stats
    val statless = Catalog.lakeFilesAsOf(spark, layout).toSet

    // typed append with NO caller statsCols
    Catalog.commitLake(spark, layout,
      Seq(("clicks", 2L, 20L)).toDF("source", "k", "v"))
    val cat = registerCatalog(layout.root)
    // SQL INSERT (V1Write bridge)
    spark.sql(s"INSERT INTO $cat.lake VALUES (3, 30, 'clicks')")
    // SQL MERGE (DV+append core)
    spark.sql(
      s"""MERGE INTO $cat.lake t USING (SELECT 'clicks' src, 4L kk, 40L vv) s
         |ON t.k = s.kk
         |WHEN NOT MATCHED THEN INSERT (source, k, v) VALUES (s.src, s.kk, s.vv)
         |""".stripMargin)
    // SQL UPDATE (merge core, appends the post-update rows)
    spark.sql(s"UPDATE $cat.lake SET v = v + 1 WHERE k = 2")

    val stats = Catalog.lakeFileStatsAsOf(spark, layout)
    val live = Catalog.lakeFilesAsOf(spark, layout)
    val missing = live.filterNot(stats.contains).filterNot(statless.contains)
    assert(missing.isEmpty,
      s"files committed after the declaration without stats: $missing")
    assert(stats.values.forall(_.contains("\"k\"")))
  }

  test("PHYSICAL PIN, pure-SQL lifecycle: a lake born via CREATE TABLE " +
      "TBLPROPERTIES('stats.cols') and filled by SQL INSERT is file-" +
      "skipped — a stats-excluded file with its bytes deleted is never " +
      "opened by a point query") {
    val root = tmpDir("props-pin")
    val layout = Layout(root)
    val cat = registerCatalog(root)
    spark.sql(s"CREATE TABLE $cat.lake (k BIGINT, v BIGINT, source STRING) " +
      "PARTITIONED BY (source) " +
      "TBLPROPERTIES('stats.cols'='k')")
    assert(Catalog.lakeProperties(spark, layout)
      .get(Catalog.StatsColsProp).contains("k"))
    spark.sql(s"INSERT INTO $cat.lake " +
      "SELECT id AS k, id * 10 AS v, 'clicks' AS source FROM range(0, 100)")
    spark.sql(s"INSERT INTO $cat.lake " +
      "SELECT id AS k, id * 10 AS v, 'clicks' AS source FROM range(1000, 1100)")
    // plan the full list once while both ranges exist (the r11 pin
    // discipline: proves the files were live and visible)
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.lake").head.getLong(0)
      == 200L)
    val rangeA = Catalog.lakeFilesAsOf(spark, layout)
      .filter(_.contains(f"c${2L}%020d")) // CREATE=1, first INSERT=2
    assert(rangeA.nonEmpty)
    val fs = new org.apache.hadoop.fs.Path(layout.lakeDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    rangeA.foreach { rel =>
      assert(fs.delete(new org.apache.hadoop.fs.Path(
        s"${layout.lakeDir}/$rel"), false), rel)
    }
    // an UNPRUNED scan would open range A's vanished bytes and fail
    val hit = spark.sql(s"SELECT v FROM $cat.lake WHERE k = 1005").collect()
    assert(hit.map(_.getLong(0)).toSeq == Seq(10050L))
  }

  test("a props-only ALTER advances the head (review catch: RESTORE's " +
      "optimistic head+1 claim would otherwise brick); RESTORE works " +
      "with a props commit as the newest record") {
    val s = spark
    import s.implicits._
    val layout = Layout(tmpDir("props-head"))
    val v1 = Catalog.commitLake(spark, layout,
      Seq(("clicks", 1L)).toDF("source", "k"))
    Catalog.commitLake(spark, layout, Seq(("clicks", 2L)).toDF("source", "k"))
    Catalog.commitLakeAlter(spark, layout, setProps = Seq("team" -> "data"))
    assert(Catalog.headVersion(spark, layout) == 3L,
      "the props-only commit must advance the head")
    val cat = registerCatalog(layout.root)
    val out = spark.sql(s"RESTORE TABLE $cat.lake TO VERSION AS OF $v1")
      .collect().head
    assert(out.getLong(0) == v1 && out.getLong(1) == 4L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.lake").head.getLong(0) == 1L)
  }

  test("DROP COLUMN strips the column from declared stats/bloom cols in " +
      "the same record (review catch: a dangling declaration would " +
      "silently stat nothing forever); emptied declarations unset") {
    val s = spark
    import s.implicits._
    val layout = Layout(tmpDir("props-drop"))
    Catalog.commitLake(spark, layout,
      Seq(("clicks", 1L, 2L)).toDF("source", "a", "b"))
    Catalog.commitLakeAlter(spark, layout,
      setProps = Seq(Catalog.StatsColsProp -> "a,b",
        Catalog.BloomColsProp -> "a"))
    Catalog.commitLakeDropColumn(spark, layout, "a")
    val props = Catalog.lakeProperties(spark, layout)
    assert(props.get(Catalog.StatsColsProp).contains("b"),
      s"'a' must be stripped: $props")
    assert(!props.contains(Catalog.BloomColsProp),
      s"an emptied declaration unsets: $props")
  }

  test("stats.cols validation: unknown column refuses; a RENAME of a " +
      "declared stats column re-points the declaration in the same record") {
    val s = spark
    import s.implicits._
    val layout = Layout(tmpDir("props-val"))
    Catalog.commitLake(spark, layout,
      Seq(("clicks", 1L)).toDF("source", "k"))
    val e = intercept[IllegalArgumentException] {
      Catalog.commitLakeAlter(spark, layout,
        setProps = Seq(Catalog.StatsColsProp -> "k,typo"))
    }
    assert(e.getMessage.contains("unknown column 'typo'"))
    Catalog.commitLakeAlter(spark, layout,
      setProps = Seq(Catalog.StatsColsProp -> "k"))
    Catalog.commitLakeRenameColumn(spark, layout, "k", "key")
    assert(Catalog.lakeProperties(spark, layout)
      .get(Catalog.StatsColsProp).contains("key"))
    // new-epoch files stat the NEW name
    Catalog.commitLake(spark, layout,
      Seq(("clicks", 2L)).toDF("source", "key"))
    val newest = Catalog.lakeFileStatsAsOf(spark, layout)
      .filter(_._1.contains(f"c${4L}%020d"))
    assert(newest.nonEmpty && newest.values.forall(_.contains("\"key\"")))
  }
}
