package graft.lake

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Commit-time expectations ([[Catalog.addLakeExpectation]]): Delta-style
  * CHECK constraints on the manifest log — violating batches are
  * rejected BEFORE staging on every typed write surface, existing data
  * is validated at add time, NULL passes (SQL CHECK), removal lifts the
  * gate, and the facts survive checkpoint folds. */
class ExpectationsSpec extends SparkTestBase {

  test("a committed expectation rejects violating commitLake and upsert " +
      "batches loudly, passes clean ones, and leaves no torn version") {
    val layout = Layout(tmpDir("expect-basic"))
    val s = spark
    import s.implicits._
    Catalog.commitLake(spark, layout,
      Seq(("clicks", "k1", 10L)).toDF("source", "key", "v"))
    Catalog.addLakeExpectation(spark, layout, "v_nonneg", "v >= 0")
    assert(Catalog.lakeExpectations(spark, layout) == Map("v_nonneg" -> "v >= 0"))
    val headBefore = Catalog.headVersion(spark, layout)

    val e = intercept[IllegalArgumentException](
      Catalog.commitLake(spark, layout,
        Seq(("clicks", "k2", -5L), ("clicks", "k3", 7L)).toDF("source", "key", "v")))
    assert(e.getMessage.contains("v_nonneg") && e.getMessage.contains("1 batch rows"))
    assert(Catalog.headVersion(spark, layout) == headBefore,
      "a rejected batch must not claim a version")
    assert(Catalog.loadLakeSnapshot(spark, layout).count() == 1)

    val e2 = intercept[IllegalArgumentException](
      Catalog.upsertLakeByKey(spark, layout,
        Seq(("clicks", "k1", -1L)).toDF("source", "key", "v"), keyCols = Seq("key")))
    assert(e2.getMessage.contains("v_nonneg"))

    // clean batches sail through both surfaces
    assert(Catalog.commitLake(spark, layout,
      Seq(("clicks", "k4", 40L)).toDF("source", "key", "v")) > 0)
    assert(Catalog.upsertLakeByKey(spark, layout,
      Seq(("clicks", "k1", 11L)).toDF("source", "key", "v"), keyCols = Seq("key")) > 0)

    // removal lifts the gate; re-adding against now-bad data refuses
    Catalog.removeLakeExpectation(spark, layout, "v_nonneg")
    assert(Catalog.lakeExpectations(spark, layout).isEmpty)
    Catalog.commitLake(spark, layout,
      Seq(("clicks", "k9", -9L)).toDF("source", "key", "v"))
    val e3 = intercept[IllegalStateException](
      Catalog.addLakeExpectation(spark, layout, "v_nonneg", "v >= 0"))
    assert(e3.getMessage.contains("1 committed rows"))
  }

  test("NULL predicate passes (SQL CHECK); a predicate over a column the " +
      "batch lacks is inapplicable; facts survive checkpoint+prune; " +
      "time travel shows the expectation set as of the version") {
    val layout = Layout(tmpDir("expect-null"))
    val s = spark
    import s.implicits._
    Catalog.commitLake(spark, layout,
      Seq(("clicks", "k1", 10L)).toDF("source", "key", "v"))
    val vAdd = Catalog.addLakeExpectation(spark, layout, "score_band",
      "score BETWEEN 0 AND 100")
    // the evolved column doesn't exist yet: old-schema writers pass
    assert(Catalog.commitLake(spark, layout,
      Seq(("clicks", "k2", 20L)).toDF("source", "key", "v")) > 0)
    Catalog.commitLakeAddColumn(spark, layout, "score", "bigint")
    // NULL score passes (SQL CHECK), a real violation does not
    assert(Catalog.commitLake(spark, layout,
      Seq(("clicks", "k3", 30L, null.asInstanceOf[java.lang.Long]))
        .toDF("source", "key", "v", "score")) > 0)
    intercept[IllegalArgumentException](
      Catalog.commitLake(spark, layout,
        Seq(("clicks", "k4", 40L, java.lang.Long.valueOf(999L)))
          .toDF("source", "key", "v", "score")))
    // survives the fold
    assert(Catalog.checkpoint(spark, layout).isDefined)
    Catalog.pruneLog(spark, layout)
    assert(Catalog.lakeExpectations(spark, layout) ==
      Map("score_band" -> "score BETWEEN 0 AND 100"))
    intercept[IllegalArgumentException](
      Catalog.commitLake(spark, layout,
        Seq(("clicks", "k5", 50L, java.lang.Long.valueOf(-1L)))
          .toDF("source", "key", "v", "score")))
    // as-of below the add shows no expectation
    assert(Catalog.lakeExpectations(spark, layout, vAdd - 1).isEmpty)
  }
}
