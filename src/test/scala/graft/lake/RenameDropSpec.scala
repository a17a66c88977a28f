package graft.lake

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** RENAME / DROP COLUMN as metadata-only log facts
  * ([[Catalog.commitLakeRenameColumn]]/[[Catalog.commitLakeDropColumn]],
  * read through [[Catalog.applyNameMap]]'s physical→logical chain):
  * old files keep their physical names and the read path maps them;
  * names are retired forever (the no-physical-ids soundness rule);
  * time travel below an evolution serves the old schema; every
  * DML/maintenance verb speaks the logical names. */
class RenameDropSpec extends SparkTestBase {

  test("rename across write epochs: old files' physical name maps at " +
      "read, new files carry the new name, time travel below serves the " +
      "old schema, and the CDF speaks the range-end names") {
    val s = spark
    import s.implicits._
    val layout = Layout(tmpDir("rn-basic"))
    val v1 = Catalog.commitLake(spark, layout,
      Seq(("clicks", "k1", 10L), ("clicks", "k2", 20L))
        .toDF("source", "key", "amount"))
    val v2 = Catalog.commitLakeRenameColumn(spark, layout, "amount", "cents")
    val v3 = Catalog.commitLake(spark, layout,
      Seq(("clicks", "k3", 30L)).toDF("source", "key", "cents"))

    val head = Catalog.loadLakeSnapshot(spark, layout)
    assert(head.columns.contains("cents") && !head.columns.contains("amount"))
    assert(head.select("key", "cents").collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq ==
      Seq(("k1", 10L), ("k2", 20L), ("k3", 30L)))
    // time travel below the rename: the OLD name, exactly
    val atV1 = Catalog.loadLakeSnapshot(spark, layout, v1)
    assert(atV1.columns.contains("amount") && !atV1.columns.contains("cents"))
    assert(atV1.select("amount").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(10L, 20L))
    // the change feed speaks the names in force at the range END
    val feed = Catalog.lakeChangesBetween(spark, layout, 0L)
    assert(feed.columns.contains("cents") && !feed.columns.contains("amount"))
    assert(feed.filter(col("_change_type") === "insert")
      .select("cents").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(10L, 20L, 30L))
    // history attributes the rename
    val hist = Catalog.lakeHistory(spark, layout)
      .filter(col("version") === v2).select("name_changes").head.getString(0)
    assert(hist == "amount->cents", hist)
  }

  test("DML on renamed columns: DELETE by predicate, upsert by a renamed " +
      "key, and a pre-rename DV still applies (positions are path-keyed)") {
    val s = spark
    import s.implicits._
    val layout = Layout(tmpDir("rn-dml"))
    Catalog.commitLake(spark, layout,
      Seq(("clicks", "k1", 10L), ("clicks", "k2", 20L), ("clicks", "k3", 30L))
        .toDF("source", "id_old", "v"))
    // a DV committed BEFORE the rename
    Catalog.deleteLakeWhere(spark, layout, col("id_old") === "k3")
    Catalog.commitLakeRenameColumn(spark, layout, "id_old", "id")
    // the old DV still applies through the mapped read
    assert(Catalog.loadLakeSnapshot(spark, layout)
      .select("id").collect().map(_.getString(0)).sorted.toSeq == Seq("k1", "k2"))
    // DELETE with a predicate on the NEW name reaches old files' rows
    Catalog.deleteLakeWhere(spark, layout, col("id") === "k2")
    assert(Catalog.loadLakeSnapshot(spark, layout)
      .select("id").collect().map(_.getString(0)).toSeq == Seq("k1"))
    // upsert keyed by the renamed column matches the old file's row
    val seq = Catalog.upsertLakeByKey(spark, layout,
      Seq(("clicks", "k1", 11L), ("clicks", "k9", 90L)).toDF("source", "id", "v"),
      keyCols = Seq("id"))
    assert(seq > 0)
    assert(Catalog.loadLakeSnapshot(spark, layout)
      .select("id", "v").collect().map(r => (r.getString(0), r.getLong(1)))
      .sorted.toSeq == Seq(("k1", 11L), ("k9", 90L)))
  }

  test("drop hides the column from head reads while time travel below " +
      "still serves it; retired names (dropped or renamed-away) can " +
      "never be reused; 'source' is protected") {
    val s = spark
    import s.implicits._
    val layout = Layout(tmpDir("rn-drop"))
    val v1 = Catalog.commitLake(spark, layout,
      Seq(("clicks", "k1", 10L, "x")).toDF("source", "key", "v", "tmp"))
    val v2 = Catalog.commitLakeDropColumn(spark, layout, "tmp")
    val head = Catalog.loadLakeSnapshot(spark, layout)
    assert(!head.columns.contains("tmp"))
    assert(head.select("key", "v").head.getString(0) == "k1")
    assert(Catalog.loadLakeSnapshot(spark, layout, v1)
      .select("tmp").head.getString(0) == "x")
    // retirement: re-adding the dropped name refuses
    val e1 = intercept[IllegalArgumentException](
      Catalog.commitLakeAddColumn(spark, layout, "tmp", "string"))
    assert(e1.getMessage.contains("RETIRED"), e1.getMessage)
    // renamed-away names are retired too
    Catalog.commitLakeRenameColumn(spark, layout, "v", "v2")
    val e2 = intercept[IllegalArgumentException](
      Catalog.commitLakeAlter(spark, layout, renameCols = Seq(("v2", "v"))))
    assert(e2.getMessage.contains("RETIRED"), e2.getMessage)
    // the partition column is untouchable
    assert(intercept[IllegalArgumentException](
      Catalog.commitLakeRenameColumn(spark, layout, "source", "src"))
      .getMessage.contains("source"))
    assert(intercept[IllegalArgumentException](
      Catalog.commitLakeDropColumn(spark, layout, "source"))
      .getMessage.contains("source"))
    // a wholly unknown name refuses too
    assert(intercept[IllegalArgumentException](
      Catalog.commitLakeDropColumn(spark, layout, "nope"))
      .getMessage.contains("unknown"))
  }

  test("rename composes with widening and chained renames: the widen " +
      "fact keyed by the old name still promotes old narrow files after " +
      "a->b->c, and rewrites (OPTIMIZE) land files under the current name") {
    val s = spark
    import s.implicits._
    val layout = Layout(tmpDir("rn-widen"))
    Catalog.commitLake(spark, layout,
      Seq(("clicks", "k1", 1)).toDF("source", "key", "a")
        .withColumn("a", col("a").cast("int")))
    Catalog.commitLakeWidenColumn(spark, layout, "a", "bigint")
    Catalog.commitLakeRenameColumn(spark, layout, "a", "b")
    Catalog.commitLake(spark, layout,
      Seq(("clicks", "k2", 10000000000L)).toDF("source", "key", "b"))
    Catalog.commitLakeRenameColumn(spark, layout, "b", "c")
    val head = Catalog.loadLakeSnapshot(spark, layout)
    assert(head.schema("c").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(head.select("key", "c").collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq ==
      Seq(("k1", 1L), ("k2", 10000000000L)))
    // a rewrite lands the CURRENT physical name: compact, then read the
    // compacted file raw — it must carry 'c'
    assert(Catalog.optimizeLake(spark, layout) > 0)
    val live = Catalog.lakeFilesAsOf(spark, layout)
    assert(live.size == 1, live.toString)
    val raw = spark.read.parquet(s"${layout.lakeDir}/${live.head}")
    assert(raw.columns.contains("c") && !raw.columns.contains("a") &&
      !raw.columns.contains("b"), raw.columns.mkString(","))
    assert(Catalog.loadLakeSnapshot(spark, layout)
      .select("c").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 10000000000L))
    // and a DROP followed by OPTIMIZE physically removes the retired
    // bytes from the live tree (the Delta REORG-PURGE effect for free)
    Catalog.commitLakeDropColumn(spark, layout, "key")
    Catalog.commitLake(spark, layout,
      Seq(("clicks", 7L)).toDF("source", "c"))
    assert(Catalog.optimizeLake(spark, layout) > 0)
    val live2 = Catalog.lakeFilesAsOf(spark, layout)
    live2.foreach { rel =>
      val cols = spark.read.parquet(s"${layout.lakeDir}/$rel").columns
      assert(!cols.contains("key"), s"$rel still carries dropped bytes")
    }
  }

  test("an in-force CHECK constraint blocks renaming/dropping its " +
      "column (drop the constraint first); SQL ALTER TABLE RENAME/DROP " +
      "COLUMN route through the catalog") {
    val s = spark
    import s.implicits._
    val layout = Layout(tmpDir("rn-sql"))
    Catalog.commitLake(spark, layout,
      Seq(("clicks", "k1", 10L)).toDF("source", "key", "v"))
    Catalog.addLakeExpectation(spark, layout, "v_pos", "v >= 0")
    val e = intercept[IllegalArgumentException](
      Catalog.commitLakeRenameColumn(spark, layout, "v", "w"))
    assert(e.getMessage.contains("v_pos"), e.getMessage)
    Catalog.removeLakeExpectation(spark, layout, "v_pos")

    val cat = s"g11rn"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sql.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", layout.root)
    spark.sql(s"ALTER TABLE $cat.lake RENAME COLUMN v TO w")
    assert(spark.sql(s"SELECT w FROM $cat.lake").head.getLong(0) == 10L)
    spark.sql(s"ALTER TABLE $cat.lake ADD COLUMNS (extra string)")
    spark.sql(s"ALTER TABLE $cat.lake DROP COLUMN extra")
    assert(!spark.sql(s"SELECT * FROM $cat.lake").columns.contains("extra"))
    // SQL sees the retirement refusal as well
    val e2 = intercept[Exception](
      spark.sql(s"ALTER TABLE $cat.lake ADD COLUMNS (extra string)"))
    assert(e2.getMessage.contains("RETIRED"), e2.getMessage)
  }

  test("RESTORE below a rename: the content rewinds while the schema " +
      "stays monotone — the restored head speaks the NEW names") {
    val s = spark
    import s.implicits._
    val layout = Layout(tmpDir("rn-restore"))
    val v1 = Catalog.commitLake(spark, layout,
      Seq(("clicks", "k1", 10L)).toDF("source", "key", "amount"))
    Catalog.commitLake(spark, layout,
      Seq(("clicks", "k2", 20L)).toDF("source", "key", "amount"))
    Catalog.commitLakeRenameColumn(spark, layout, "amount", "cents")
    assert(Catalog.restoreLake(spark, layout, v1) > 0)
    val head = Catalog.loadLakeSnapshot(spark, layout)
    assert(head.columns.contains("cents") && !head.columns.contains("amount"))
    assert(head.select("key", "cents").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("k1", 10L)))
    // and time travel below the restore still serves v2's two rows
    assert(Catalog.loadLakeSnapshot(spark, layout, v1 + 1).count() == 2L)
  }
}
