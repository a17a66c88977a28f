package graft.lake

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Round-13: the auto-compaction policy —
  * `TBLPROPERTIES('autoOptimize.target'=N)` turns every commitLake
  * append into a small-file check on the sources it touched, running
  * the committed bin-pack inline once a source crosses
  * `autoOptimize.minFiles`. The first operational pain of a real
  * streaming lake (Delta ships autoCompact for the same reason):
  * without it, sustained small appends grow one live file per commit
  * and every reader pays the listing. */
class AutoOptimizeSpec extends SparkTestBase {

  private def oneRow(k: Long) = {
    val s = spark
    import s.implicits._
    Seq(("clicks", k, k * 10)).toDF("source", "k", "v")
  }

  test("sustained small appends keep the live file count BOUNDED " +
      "(policy on) and every row survives exactly once; the same " +
      "workload without the policy grows one file per commit") {
    val on = Layout(tmpDir("auto-opt-on"))
    val off = Layout(tmpDir("auto-opt-off"))
    Catalog.commitLake(spark, on, oneRow(0L))
    Catalog.commitLakeAlter(spark, on, setProps = Seq(
      Catalog.AutoOptimizeTargetProp -> (64L << 20).toString,
      Catalog.AutoOptimizeMinFilesProp -> "8"))
    val n = 60
    var maxLive = 0
    (1 until n).foreach { k =>
      Catalog.commitLake(spark, on, oneRow(k.toLong))
      maxLive = math.max(maxLive, Catalog.lakeFilesAsOf(spark, on).size)
      Catalog.commitLake(spark, off, oneRow(k.toLong))
    }
    val liveOn = Catalog.lakeFilesAsOf(spark, on).size
    val liveOff = Catalog.lakeFilesAsOf(spark, off).size
    assert(liveOff >= n - 1, s"control table grows per commit: $liveOff")
    assert(liveOn <= 9, s"policy table stays under minFiles+1: $liveOn")
    assert(maxLive <= 9, s"bounded THROUGHOUT the workload, not just " +
      s"at the end: $maxLive")
    // exactness: every append visible exactly once
    val rows = Catalog.loadLakeSnapshot(spark, on)
      .select("k", "v").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length == n && rows.map(_._1).toSet == (0L until n).toSet)
    assert(rows.forall { case (k, v) => v == k * 10 })
  }

  test("snapshot reads at EVERY prior version are unchanged by the " +
      "inline compactions (OPTIMIZE's content contract holds for the " +
      "auto path), and time travel still serves the small-file era") {
    val layout = Layout(tmpDir("auto-opt-tt"))
    Catalog.commitLake(spark, layout, oneRow(0L))
    Catalog.commitLakeAlter(spark, layout, setProps = Seq(
      Catalog.AutoOptimizeTargetProp -> (64L << 20).toString,
      Catalog.AutoOptimizeMinFilesProp -> "6"))
    val versionAfter = scala.collection.mutable.Map[Int, Long]()
    (1 until 20).foreach { k =>
      Catalog.commitLake(spark, layout, oneRow(k.toLong))
      versionAfter(k) = Catalog.headVersion(spark, layout)
    }
    // at the version captured after append k, exactly keys 0..k
    Seq(3, 9, 16).foreach { k =>
      val keys = Catalog.loadLakeSnapshot(spark, layout, versionAfter(k))
        .select("k").collect().map(_.getLong(0)).toSet
      assert(keys == (0L to k.toLong).toSet,
        s"time travel to post-append-$k must be unaffected: $keys")
    }
  }

  test("guardrails: the policy is inert when unset or when the source " +
      "is under minFiles; a non-numeric knob refuses at SET time") {
    val layout = Layout(tmpDir("auto-opt-guard"))
    Catalog.commitLake(spark, layout, oneRow(0L))
    intercept[IllegalArgumentException] {
      Catalog.commitLakeAlter(spark, layout,
        setProps = Seq(Catalog.AutoOptimizeTargetProp -> "lots"))
    }
    Catalog.commitLakeAlter(spark, layout, setProps = Seq(
      Catalog.AutoOptimizeTargetProp -> (64L << 20).toString,
      Catalog.AutoOptimizeMinFilesProp -> "50"))
    (1 until 10).foreach(k => Catalog.commitLake(spark, layout, oneRow(k.toLong)))
    assert(Catalog.lakeFilesAsOf(spark, layout).size == 10,
      "under minFiles: no compaction fires")
  }

  test("the SQL INSERT path inherits the policy (a pure-SQL lake " +
      "stays bounded under sustained per-row INSERTs)") {
    val root = tmpDir("auto-opt-sql")
    val cat = s"ao_${java.util.UUID.randomUUID().toString.take(8)}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sql.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, v BIGINT, source STRING) " +
      "PARTITIONED BY (source) TBLPROPERTIES(" +
      s"'${Catalog.AutoOptimizeTargetProp}'='${64L << 20}', " +
      s"'${Catalog.AutoOptimizeMinFilesProp}'='8')")
    (0 until 24).foreach(k =>
      spark.sql(s"INSERT INTO $cat.t VALUES ($k, ${k * 10}, 'clicks')"))
    val layout = Layout(s"$root/_tables/t")
    assert(Catalog.lakeFilesAsOf(spark, layout).size <= 9,
      s"SQL-born lake bounded: ${Catalog.lakeFilesAsOf(spark, layout).size}")
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").head.getLong(0) == 24L)
    assert(spark.sql(s"SELECT sum(v) FROM $cat.t").head.getLong(0) ==
      (0 until 24).map(_ * 10).sum)
  }
}
