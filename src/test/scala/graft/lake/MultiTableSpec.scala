package graft.lake

import graft.SparkTestBase

/** Round-12: the DSv2 catalog generalized from the single hardwired
  * `lake` table to arbitrary `CREATE TABLE graft.<name>` — one
  * manifest log per table under `<root>/_tables/<name>`, every verb
  * (INSERT / MERGE / UPDATE / DELETE / ALTER / RESTORE / TVFs /
  * derived surfaces) addressed per table, independent histories,
  * clean DROP. */
class MultiTableSpec extends SparkTestBase {

  private def registerCatalog(root: String): String = {
    val name = s"gmt_${java.util.UUID.randomUUID().toString.take(8)}"
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.sql.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    name
  }

  test("two tables created, written, merged and joined through pure SQL " +
      "with independent histories") {
    val root = tmpDir("mt-two")
    val cat = registerCatalog(root)
    spark.sql(s"CREATE TABLE $cat.events (k BIGINT, v BIGINT, source STRING) " +
      "PARTITIONED BY (source)")
    spark.sql(s"CREATE TABLE $cat.dims (k BIGINT, grp STRING, source STRING)")
    spark.sql(s"INSERT INTO $cat.events " +
      "SELECT id, id * 10, 'clicks' FROM range(0, 100)")
    spark.sql(s"INSERT INTO $cat.dims " +
      "SELECT id, CASE WHEN id % 2 = 0 THEN 'even' ELSE 'odd' END, 'dim' " +
      "FROM range(0, 100)")
    // MERGE into ONE table only
    spark.sql(
      s"""MERGE INTO $cat.events t USING (SELECT 5L kk, 999L vv) s
         |ON t.k = s.kk
         |WHEN MATCHED THEN UPDATE SET v = s.vv""".stripMargin)
    // cross-table join through pure SQL
    val joined = spark.sql(
      s"""SELECT d.grp, count(*) AS n, sum(e.v) AS sv
         |FROM $cat.events e JOIN $cat.dims d ON e.k = d.k
         |GROUP BY d.grp ORDER BY d.grp""".stripMargin).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val evenSum = (0L until 100L by 2).map(_ * 10).sum
    val oddSum = (1L until 100L by 2).map(_ * 10).sum - 50 + 999
    assert(joined.toSeq == Seq(("even", 50L, evenSum), ("odd", 50L, oddSum)))

    // independent histories: events has CREATE+INSERT+MERGE, dims
    // CREATE+INSERT; the root lake table is untouched
    assert(Catalog.headVersion(spark,
      Layout(s"$root/_tables/events")) == 3L)
    assert(Catalog.headVersion(spark, Layout(s"$root/_tables/dims")) == 2L)
    assert(!Catalog.lakeTableExists(spark, Layout(root)))
    // per-table derived surfaces
    assert(spark.sql(s"SELECT count(*) FROM $cat.events_history")
      .head.getLong(0) == 3L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.dims_history")
      .head.getLong(0) == 2L)
    // per-table change feed through the TVF's catalog.table addressing
    graft.functions.GraftExtensions.register(spark)
    assert(spark.sql(
      s"SELECT count(*) FROM table_changes('$cat.events', 2, 3)")
      .head.getLong(0) == 2L) // the merge: one retract + one insert
    // time travel per table
    assert(spark.sql(s"SELECT sum(v) FROM $cat.events VERSION AS OF 2")
      .head.getLong(0) == (0L until 100L).map(_ * 10).sum)
    // SHOW TABLES lists both with their surfaces
    val listed = spark.sql(s"SHOW TABLES IN $cat").collect()
      .map(_.getString(1)).toSet
    assert(listed.contains("events") && listed.contains("dims") &&
      listed.contains("events_changes") && listed.contains("dims_detail"))
  }

  test("per-table RESTORE / DELETE / ALTER; DROP TABLE removes the " +
      "table whole; the root lake table refuses DROP") {
    val root = tmpDir("mt-verbs")
    val cat = registerCatalog(root)
    spark.sql(s"CREATE TABLE $cat.t1 (k BIGINT, source STRING)")
    spark.sql(s"INSERT INTO $cat.t1 SELECT id, 'a' FROM range(0, 10)")
    spark.sql(s"DELETE FROM $cat.t1 WHERE k >= 5")
    assert(spark.sql(s"SELECT count(*) FROM $cat.t1").head.getLong(0) == 5L)
    // RESTORE the created table by <catalog>.<table>
    val out = spark.sql(s"RESTORE TABLE $cat.t1 TO VERSION AS OF 2")
      .collect().head
    assert(out.getLong(0) == 2L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.t1").head.getLong(0) == 10L)
    // ALTER lands on the table's own log
    spark.sql(s"ALTER TABLE $cat.t1 ADD COLUMNS (tag STRING)")
    assert(spark.sql(s"SELECT * FROM $cat.t1").columns.contains("tag"))

    spark.sql(s"CREATE TABLE $cat.t2 (k BIGINT, source STRING)")
    spark.sql(s"INSERT INTO $cat.t2 SELECT id, 'b' FROM range(0, 3)")
    spark.sql(s"DROP TABLE $cat.t2")
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/_tables/t2")))
    assert(!spark.sql(s"SHOW TABLES IN $cat").collect()
      .map(_.getString(1)).contains("t2"))
    // t1 untouched by t2's drop
    assert(spark.sql(s"SELECT count(*) FROM $cat.t1").head.getLong(0) == 10L)
    // the root lake table refuses DROP (it shares the root with the
    // ingest areas) — born from a typed commit so it exists first
    val s = spark
    import s.implicits._
    Catalog.commitLake(spark, Layout(root),
      Seq(("clicks", 1L)).toDF("source", "k"))
    val e = intercept[Exception](spark.sql(s"DROP TABLE $cat.lake"))
    assert(e.getMessage.contains("cannot be dropped"))
  }

  test("maintenance statements accept a literal root PATH whose last " +
      "segment ends with a reserved suffix (the reservation is an " +
      "identifier rule, not a path rule)") {
    val s = spark
    import s.implicits._
    val root = tmpDir("mt-path-suffix") + "/pipeline_history"
    Catalog.commitLake(spark, Layout(root),
      Seq(("a", 1L)).toDF("source", "k"))
    val out = spark.sql(s"VACUUM $root RETAIN 0 HOURS").head
    assert(out.getAs[String]("verb") == "vacuum")
    // the identifier form still refuses derived surfaces
    val cat = registerCatalog(tmpDir("mt-path-suffix2"))
    val e = intercept[Exception](
      spark.sql(s"OPTIMIZE $cat.events_history"))
    assert(e.getMessage.contains("derived surface"))
  }

  test("reserved names refuse at CREATE; a missing created table is " +
      "NoSuchTable; the legacy root lake still works beside created tables") {
    val s = spark
    import s.implicits._
    val root = tmpDir("mt-reserved")
    val cat = registerCatalog(root)
    val e1 = intercept[Exception](
      spark.sql(s"CREATE TABLE $cat.foo_changes (k BIGINT, source STRING)"))
    assert(e1.getMessage.contains("not a creatable"))
    // lake_catalog "always exists" as a derived surface, so Spark's
    // own pre-check refuses the CREATE before the catalog is asked
    val e2 = intercept[Exception](
      spark.sql(s"CREATE TABLE $cat.lake_catalog (k BIGINT, source STRING)"))
    assert(e2.getMessage.contains("already exists"))
    intercept[Exception](spark.sql(s"SELECT * FROM $cat.nope").collect())

    // legacy root lake born from a typed commit coexists
    Catalog.commitLake(spark, Layout(root),
      Seq(("clicks", 1L)).toDF("source", "k"))
    spark.sql(s"CREATE TABLE $cat.side (k BIGINT, source STRING)")
    spark.sql(s"INSERT INTO $cat.side VALUES (7, 's')")
    assert(spark.sql(s"SELECT count(*) FROM $cat.lake").head.getLong(0) == 1L)
    assert(spark.sql(s"SELECT k FROM $cat.side").head.getLong(0) == 7L)

    // CTAS into a new sub-table: createTable + the write path in one
    // statement, landing on its own log
    spark.sql(s"CREATE TABLE $cat.side2 PARTITIONED BY (source) AS " +
      s"SELECT k, source FROM $cat.side")
    assert(spark.sql(s"SELECT k FROM $cat.side2").head.getLong(0) == 7L)
    assert(Catalog.headVersion(spark, Layout(s"$root/_tables/side2")) == 2L)

    // MEMO INDEPENDENCE: snapshot plans are keyed per table layout —
    // a commit into side2 must NOT invalidate side's memoized plan
    // (the per-statement analysis cost stays once-per-COMMIT per
    // TABLE, not once-per-statement across tables)
    val sideLay = Layout(s"$root/_tables/side")
    val planBefore = Catalog.loadLakeSnapshot(spark, sideLay)
    spark.sql(s"INSERT INTO $cat.side2 VALUES (8, 's')")
    assert(Catalog.loadLakeSnapshot(spark, sideLay) eq planBefore,
      "a commit to another table invalidated this table's plan memo")
  }

  test("memo LRU (round 13): an 80-table round-robin re-plans " +
      "once-per-commit per table, not once-per-statement — the old " +
      ">64 wholesale clear would rebuild every round") {
    val s = spark
    import s.implicits._
    val root = tmpDir("memo-lru")
    val layouts = (0 until 80).map(i => Layout(s"$root/_tables/t$i"))
    layouts.zipWithIndex.foreach { case (l, i) =>
      Catalog.commitLake(spark, l,
        Seq(("s", i.toLong)).toDF("source", "k"))
    }
    // warm every table's plan once
    layouts.foreach(Catalog.loadLakeSnapshot(spark, _))
    val before = Catalog.snapshotBuilds.get()
    (1 to 3).foreach(_ => layouts.foreach(Catalog.loadLakeSnapshot(spark, _)))
    assert(Catalog.snapshotBuilds.get() == before,
      "three round-robin rounds over 80 hot tables must be ALL memo hits")
    // one commit invalidates exactly its own table's plan
    Catalog.commitLake(spark, layouts.head,
      Seq(("s", 999L)).toDF("source", "k"))
    layouts.foreach(Catalog.loadLakeSnapshot(spark, _))
    assert(Catalog.snapshotBuilds.get() == before + 1,
      "a commit re-plans its OWN table once; the other 79 stay memoized")
  }
}
