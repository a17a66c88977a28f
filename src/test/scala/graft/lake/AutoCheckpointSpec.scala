package graft.lake

import graft.SparkTestBase

/** Round-14: the auto-checkpoint policy —
  * `TBLPROPERTIES('checkpoint.every'=N)` makes every write path fold
  * the committed log prefix once the un-folded tail reaches N records
  * (Delta checkpoints every 10 commits for the same reason): without
  * it only StreamIngest self-checkpointed, and a SQL-born table under
  * sustained INSERT/MERGE traffic grew an unbounded tail — every cold
  * read paying LIST + parse over thousands of tiny records. */
class AutoCheckpointSpec extends SparkTestBase {

  private def oneRow(k: Long) = {
    val s = spark
    import s.implicits._
    Seq(("clicks", k, k * 10)).toDF("source", "k", "v")
  }

  /** Un-folded tail: `.commit` records above the latest checkpoint
    * seq (pruneLog drops folded ones, so post-fold these are exactly
    * the records a cold read must parse individually). */
  private def tailSize(layout: Layout): Int = {
    val d = new java.io.File(s"${layout.catalogDir}/_log")
    val names = Option(d.listFiles()).map(_.map(_.getName))
      .getOrElse(Array.empty[String])
    val cp = names.filter(_.endsWith(".checkpoint"))
      .map(_.stripSuffix(".checkpoint").toLong).foldLeft(0L)(math.max)
    names.count(n => n.endsWith(".commit") &&
      n.stripSuffix(".commit").toLong > cp)
  }

  test("checkpoint.every=10 under a 200-INSERT workload: the un-folded " +
      "tail stays ≤ 10 THROUGHOUT, folded records are pruned, content " +
      "is exactly-once, and the control table without the policy grows " +
      "one record per commit") {
    val on = Layout(tmpDir("auto-cp-on"))
    val off = Layout(tmpDir("auto-cp-off"))
    Catalog.commitLake(spark, on, oneRow(0L))
    Catalog.commitLakeAlter(spark, on,
      setProps = Seq(Catalog.CheckpointEveryProp -> "10"))
    val n = 200
    var maxTail = 0
    (1 until n).foreach { k =>
      Catalog.commitLake(spark, on, oneRow(k.toLong))
      maxTail = math.max(maxTail, tailSize(on))
      Catalog.commitLake(spark, off, oneRow(k.toLong))
    }
    assert(maxTail <= 10, s"tail must stay ≤ every throughout: $maxTail")
    assert(tailSize(off) >= n - 1, s"control grows per commit: ${tailSize(off)}")
    // folded records actually pruned: the log dir itself stays small
    val logFiles = new java.io.File(s"${on.catalogDir}/_log").listFiles()
    assert(logFiles.length <= 2 * 10 + 25,
      s"folded .commit/.done pruned, retained checkpoints bounded: " +
        s"${logFiles.length}")
    val rows = Catalog.loadLakeSnapshot(spark, on)
      .select("k", "v").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length == n && rows.map(_._1).toSet == (0L until n).toSet)
    assert(rows.forall { case (k, v) => v == k * 10 })
  }

  test("time travel below the folds stays intact: snapshot reads at " +
      "versions the checkpoints folded away serve exactly their era") {
    val layout = Layout(tmpDir("auto-cp-tt"))
    Catalog.commitLake(spark, layout, oneRow(0L))
    Catalog.commitLakeAlter(spark, layout,
      setProps = Seq(Catalog.CheckpointEveryProp -> "5"))
    val versionAfter = scala.collection.mutable.Map[Int, Long]()
    (1 until 40).foreach { k =>
      Catalog.commitLake(spark, layout, oneRow(k.toLong))
      versionAfter(k) = Catalog.headVersion(spark, layout)
    }
    assert(tailSize(layout) <= 5)
    Seq(3, 11, 26, 37).foreach { k =>
      val keys = Catalog.loadLakeSnapshot(spark, layout, versionAfter(k))
        .select("k").collect().map(_.getLong(0)).toSet
      assert(keys == (0L to k.toLong).toSet,
        s"time travel to post-append-$k through the folds: $keys")
    }
  }

  test("MERGE and DELETE trigger the policy too (the sustained-CDC " +
      "shape), and a deliberately-pending cross-table txn leg caps the " +
      "fold below itself instead of losing it") {
    val layout = Layout(tmpDir("auto-cp-dml"))
    Catalog.commitLake(spark, layout, oneRow(0L))
    Catalog.commitLakeAlter(spark, layout,
      setProps = Seq(Catalog.CheckpointEveryProp -> "6"))
    (1 until 12).foreach { k =>
      Catalog.upsertLakeByKey(spark, layout, oneRow(k % 4), Seq("k"))
    }
    assert(tailSize(layout) <= 6, s"MERGE path folds: ${tailSize(layout)}")
    import org.apache.spark.sql.functions.col
    (12 until 20).foreach { k =>
      Catalog.commitLake(spark, layout, oneRow(k.toLong))
      Catalog.deleteLakeWhere(spark, layout, col("k") === (k - 6).toLong)
    }
    assert(tailSize(layout) <= 6, s"DELETE path folds: ${tailSize(layout)}")
    // a crashed txn writer mid-transaction: its pending leg must CAP
    // the auto-fold (not be lost), exactly like the manual checkpoint
    intercept[RuntimeException] {
      Catalog.commitLakeTransactionImpl(spark, Seq((layout, oneRow(99L))),
        None, () => throw new RuntimeException("crash before bind"))
    }
    val pendingSeq = Catalog.pendingTransactions(spark, layout).head._1
    (20 until 30).foreach(k => Catalog.commitLake(spark, layout, oneRow(k.toLong)))
    val d = new java.io.File(s"${layout.catalogDir}/_log")
    val cps = d.listFiles().map(_.getName).filter(_.endsWith(".checkpoint"))
      .map(_.stripSuffix(".checkpoint").toLong)
    assert(cps.forall(_ < pendingSeq),
      s"no fold may swallow the pending txn leg at $pendingSeq: " +
        cps.sorted.mkString(","))
    // and the pending record itself is still present for a later bind
    assert(new java.io.File(d, f"$pendingSeq%020d.commit").exists())
  }

  test("guardrails: non-numeric checkpoint.every refuses at SET time; " +
      "the SQL INSERT path inherits the policy (a pure-SQL lake folds " +
      "its own log)") {
    val layout = Layout(tmpDir("auto-cp-guard"))
    Catalog.commitLake(spark, layout, oneRow(0L))
    intercept[IllegalArgumentException] {
      Catalog.commitLakeAlter(spark, layout,
        setProps = Seq(Catalog.CheckpointEveryProp -> "often"))
    }
    val root = tmpDir("auto-cp-sql")
    val cat = s"acp_${java.util.UUID.randomUUID().toString.take(8)}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sql.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, source STRING) " +
      "PARTITIONED BY (source) TBLPROPERTIES(" +
      s"'${Catalog.CheckpointEveryProp}'='8')")
    (0 until 25).foreach(k =>
      spark.sql(s"INSERT INTO $cat.t VALUES ($k, 'clicks')"))
    assert(tailSize(Layout(s"$root/_tables/t")) <= 8,
      s"SQL-born lake folds: ${tailSize(Layout(s"$root/_tables/t"))}")
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").head.getLong(0) == 25L)
  }
}
