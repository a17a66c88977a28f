package graft.lake

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema evolution, part two: TYPE WIDENING as a manifest-log fact
  * ([[Catalog.commitLakeWidenColumn]]) — int→long / float→double with
  * read-side promotion of old narrow files, write-time up-cast of new
  * batches, time travel below the widening keeping the old type, and
  * the change feed staying green across the boundary. */
class TypeWideningSpec extends SparkTestBase {

  test("int→long widening: old narrow files promote at read, new batches " +
      "cast up at staging, snapshot mixes both; time travel below the " +
      "widening keeps IntegerType; survives a checkpoint") {
    val layout = Layout(tmpDir("widen-int-long"))
    val s = spark
    import s.implicits._
    // v1: an INT-typed column lands in physical int32 pages
    val v1 = Catalog.commitLake(spark, layout,
      Seq(("clicks", "k1", 1), ("clicks", "k2", 2)).toDF("source", "key", "v"))
    assert(Catalog.loadLakeSnapshot(spark, layout).schema("v").dataType == IntegerType)

    // v2: the widening fact — metadata-only commit
    val v2 = Catalog.commitLakeWidenColumn(spark, layout, "v", "bigint")
    assert(v2 == v1 + 1)

    // v3: a batch STILL writing int — staged up-cast must make the file long
    val v3 = Catalog.commitLake(spark, layout,
      Seq(("clicks", "k3", 3)).toDF("source", "key", "v"))
    // v4: a batch already long, plus a value only long can hold
    val v4 = Catalog.commitLake(spark, layout,
      Seq(("clicks", "k4", 5000000000L)).toDF("source", "key", "v"))

    // live read: ONE schema (long), all four rows, values exact
    val live = Catalog.loadLakeSnapshot(spark, layout)
    assert(live.schema("v").dataType == LongType)
    assert(live.count() == 4)
    assert(live.agg(sum("v")).head.getLong(0) == 1L + 2L + 3L + 5000000000L)

    // time travel below the widening: the OLD type, old rows only
    val old = Catalog.loadLakeSnapshot(spark, layout, v1)
    assert(old.schema("v").dataType == IntegerType,
      "a read below the widening must keep the pre-widening type")
    assert(old.count() == 2)
    // at the widening's own version: type already wide, still 2 rows
    val atW = Catalog.loadLakeSnapshot(spark, layout, v2)
    assert(atW.schema("v").dataType == LongType && atW.count() == 2)

    // change feed ACROSS the boundary: one consumer schema (long),
    // every insert present exactly once
    val feed = Catalog.lakeChangesBetween(spark, layout, 0L)
    assert(feed.schema("v").dataType == LongType)
    val ins = feed.filter(col("_change_type") === "insert")
    assert(ins.count() == 4)
    assert(ins.agg(sum("v")).head.getLong(0) == 1L + 2L + 3L + 5000000000L)
    // a window STARTING above the widening is long-typed too
    assert(Catalog.lakeChangesBetween(spark, layout, v3)
      .schema("v").dataType == LongType)
    // a window ENDING below it keeps the old type
    assert(Catalog.lakeChangesBetween(spark, layout, 0L, v1)
      .schema("v").dataType == IntegerType)

    // PLAN: the widened explicit-schema scan keeps filter pushdown and
    // column pruning — the wide-typed predicate reaches the parquet
    // scan over narrow AND wide files (read-side promotion evaluates
    // it), vectorized
    val q = Catalog.loadLakeSnapshot(spark, layout)
      .filter(org.apache.spark.sql.functions.col("v") > 1L).select("key", "v")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThan(v,1"), s"pushdown lost:\n$plan")
    assert(plan.contains("ReadSchema: struct<key:string,v:bigint>"),
      s"pruning or widening lost:\n$plan")
    assert(plan.contains("Batched: true"), s"vectorized reader lost:\n$plan")
    assert(q.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("k2", 2L), ("k3", 3L), ("k4", 5000000000L)))

    // the fact survives the checkpoint fold + prune
    assert(Catalog.checkpoint(spark, layout).contains(v4))
    Catalog.pruneLog(spark, layout)
    assert(Catalog.lakeWidenedColumns(spark, layout).map(t => (t._2, t._3)) ==
      Seq(("v", "bigint")))
    assert(Catalog.loadLakeSnapshot(spark, layout).schema("v").dataType == LongType)
    assert(Catalog.loadLakeSnapshot(spark, layout).count() == 4)
  }

  test("float→double widening, chained int→long after byte-stage chains, " +
      "and refusals: narrowing, lossy long→double, unknown column") {
    val layout = Layout(tmpDir("widen-float-refusals"))
    val s = spark
    import s.implicits._
    Catalog.commitLake(spark, layout,
      Seq(("clicks", "k1", 1.5f, 7L)).toDF("source", "key", "f", "big"))
    Catalog.commitLakeWidenColumn(spark, layout, "f", "double")
    Catalog.commitLake(spark, layout,
      Seq(("clicks", "k2", 2.25, 8L)).toDF("source", "key", "f", "big"))
    val live = Catalog.loadLakeSnapshot(spark, layout)
    assert(live.schema("f").dataType == DoubleType)
    assert(live.agg(sum("f")).head.getDouble(0) == 1.5 + 2.25)

    // refusals: all loud, nothing committed
    intercept[IllegalArgumentException](
      Catalog.commitLakeWidenColumn(spark, layout, "f", "float")) // narrowing
    intercept[IllegalArgumentException](
      Catalog.commitLakeWidenColumn(spark, layout, "big", "double")) // lossy
    intercept[IllegalArgumentException](
      Catalog.commitLakeWidenColumn(spark, layout, "nope", "bigint")) // unknown
    assert(Catalog.lakeWidenedColumns(spark, layout).size == 1)
  }

  test("widening composes with DV deletes, upsert, OPTIMIZE (rewrites come " +
      "out wide) and an Mv refresh across the boundary") {
    val layout = Layout(tmpDir("widen-compose"))
    val s = spark
    import s.implicits._
    Catalog.commitLake(spark, layout,
      Seq(("clicks", "k1", 10), ("clicks", "k2", 20), ("web", "k3", 30))
        .toDF("source", "key", "v"))
    // Mv bootstraps BELOW the widening
    val state = tmpDir("widen-mv")
    Mv.refresh(spark, layout, state, Seq("source"), "v")

    Catalog.commitLakeWidenColumn(spark, layout, "v", "bigint")
    // upsert across the boundary: k2 gets a long-sized value
    Catalog.upsertLakeByKey(spark, layout,
      Seq(("clicks", "k2", 6000000000L)).toDF("source", "key", "v"), Seq("key"))
    // delete k3 through the SQL-shaped predicate path
    Catalog.deleteLakeWhere(spark, layout, col("key") === "k3")

    val live = Catalog.loadLakeSnapshot(spark, layout)
    assert(live.schema("v").dataType == LongType)
    assert(live.count() == 2)
    assert(live.agg(sum("v")).head.getLong(0) == 10L + 6000000000L)

    // Mv refresh across widening + upsert + delete ≡ snapshot aggregate
    Mv.refresh(spark, layout, state, Seq("source"), "v")
    val mv = Mv.read(spark, state).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val byHand = live.groupBy("source")
      .agg(count(lit(1)).as("n"), sum("v").as("s")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(mv == byHand, s"mv=$mv snapshot=$byHand")

    // materialize the DV'd file, then OPTIMIZE: every rewrite reads
    // narrow+wide files and must land wide (a single-file source with
    // no DV rows is not a candidate for either — by design)
    Catalog.materializeLakeDeletes(spark, layout)
    Catalog.optimizeLake(spark, layout, targetBytes = 1L << 30)
    val after = Catalog.loadLakeSnapshot(spark, layout)
    assert(after.schema("v").dataType == LongType)
    assert(after.agg(sum("v")).head.getLong(0) == 10L + 6000000000L)
    // physical check: every live file now carries int64 for v
    Catalog.lakeFilesAsOf(spark, layout).foreach { rel =>
      val sch = spark.read.parquet(s"${layout.lakeDir}/$rel").schema
      if (sch.fieldNames.contains("v"))
        assert(sch("v").dataType == LongType, s"$rel still narrow")
    }
  }

  test("GDPR erase across a widening boundary: the mixed-width partition " +
      "rewrites through the epoch scan, survivors keep exact long values, " +
      "and the rewrite lands wide") {
    val layout = Layout(tmpDir("widen-erase"))
    val s = spark
    import s.implicits._
    Catalog.commitLake(spark, layout, Seq(
      ("clicks", "k1", """{"user":"A"}""", 10),
      ("clicks", "k2", """{"user":"B"}""", 20)).toDF("source", "key", "json", "v"))
    Catalog.commitLakeWidenColumn(spark, layout, "v", "bigint")
    Catalog.commitLake(spark, layout, Seq(
      ("clicks", "k3", """{"user":"A"}""", 6000000000L),
      ("clicks", "k4", """{"user":"B"}""", 7000000000L))
      .toDF("source", "key", "json", "v"))

    val rep = Erase.eraseWhere(spark, layout, "clicks",
      Erase.jsonFieldEquals("user", "A"))
    assert(rep.lakeRowsDropped == 2L, rep.toString)
    val live = Catalog.loadLakeSnapshot(spark, layout)
    assert(live.schema("v").dataType == LongType)
    assert(live.select("key").collect().map(_.getString(0)).toSet ==
      Set("k2", "k4"))
    assert(live.agg(sum("v")).head.getLong(0) == 20L + 7000000000L,
      "pre-widening survivors must promote exactly, post ones stay exact")
    // the rewrite's files are physically wide
    Catalog.lakeFilesAsOf(spark, layout).foreach { rel =>
      val sch = spark.read.parquet(s"${layout.lakeDir}/$rel").schema
      if (sch.fieldNames.contains("v"))
        assert(sch("v").dataType == LongType, s"$rel still narrow")
    }
  }

  test("widening an addcol-evolved column: null backfill follows the wide " +
      "type; point/range reads through the skipping index stay exact") {
    val layout = Layout(tmpDir("widen-addcol"))
    val s = spark
    import s.implicits._
    Catalog.commitLake(spark, layout,
      Seq(("clicks", "k1", 1)).toDF("source", "key", "v"),
      statsCols = Seq("v"))
    Catalog.commitLakeAddColumn(spark, layout, "score", "int")
    Catalog.commitLakeWidenColumn(spark, layout, "score", "bigint")
    Catalog.commitLakeWidenColumn(spark, layout, "v", "bigint")
    Catalog.commitLake(spark, layout,
      Seq(("clicks", "k2", 7000000000L, 9L)).toDF("source", "key", "v", "score"),
      statsCols = Seq("v"))

    val live = Catalog.loadLakeSnapshot(spark, layout)
    assert(live.schema("score").dataType == LongType,
      "a column added narrow then widened must read wide")
    assert(live.schema("v").dataType == LongType)
    assert(live.filter(col("score").isNull).count() == 1)

    // stats-pruned range read over the widened column is exact
    val r = Catalog.loadLakeRange(spark, layout, "v", 0L, 10L)
    assert(r.count() == 1 && r.head.getAs[Long]("v") == 1L)
    val r2 = Catalog.loadLakeRange(spark, layout, "v", 6999999999L, 7000000001L)
    assert(r2.count() == 1 && r2.head.getAs[Long]("v") == 7000000000L)
  }
}
