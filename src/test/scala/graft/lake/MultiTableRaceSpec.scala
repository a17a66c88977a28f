package graft.lake

import graft.SparkTestBase

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import scala.util.Try

/** Round-12 adversarial: the multi-table catalog under concurrency —
  * racing CREATEs of one name admit exactly one winner (loudly, never
  * a half-created table), and writers into DIFFERENT tables share no
  * locks (their logs advance independently, in parallel). */
class MultiTableRaceSpec extends SparkTestBase {

  private def registerCatalog(root: String): String = {
    val name = s"gmr_${java.util.UUID.randomUUID().toString.take(8)}"
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.sql.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    name
  }

  test("two racing CREATE TABLEs of the same name: exactly one wins, " +
      "the loser refuses loud, and the table is fully usable after") {
    val root = tmpDir("mtrace-create")
    val cat = registerCatalog(root)
    val pool = Executors.newFixedThreadPool(2)
    try {
      val gate = new CountDownLatch(1)
      val results = (1 to 2).map { i =>
        pool.submit(new java.util.concurrent.Callable[Try[Unit]] {
          override def call(): Try[Unit] = {
            gate.await(10, TimeUnit.SECONDS)
            Try(spark.sql(
              s"CREATE TABLE $cat.raced (k BIGINT, v$i BIGINT, source STRING)")
              : Unit)
          }
        })
      }
      gate.countDown()
      val outcomes = results.map(_.get(120, TimeUnit.SECONDS))
      val winners = outcomes.count(_.isSuccess)
      // both claims serialize on the table's schema lock: the loser's
      // addcol validation sees the winner's columns and refuses — one
      // winner ALWAYS; a both-fail outcome would mean a torn create
      assert(winners == 1,
        s"exactly one CREATE must win, got $winners: $outcomes")
      // the surviving table carries exactly ONE schema and works
      val cols = spark.sql(s"SELECT * FROM $cat.raced").columns.toSet
      assert(cols.contains("k") && cols.contains("source"))
      assert(!(cols.contains("v1") && cols.contains("v2")),
        s"a merged schema would mean both creates half-landed: $cols")
      spark.sql(s"INSERT INTO $cat.raced SELECT id, id, 's' FROM range(0, 5)")
      assert(spark.sql(s"SELECT count(*) FROM $cat.raced").head.getLong(0) == 5L)
    } finally pool.shutdownNow()
  }

  test("concurrent MERGEs into DIFFERENT tables run independently: no " +
      "shared lock, both commit, each log advances by exactly one") {
    val root = tmpDir("mtrace-merge")
    val cat = registerCatalog(root)
    Seq("ta", "tb").foreach { t =>
      spark.sql(s"CREATE TABLE $cat.$t (k BIGINT, v BIGINT, source STRING)")
      spark.sql(s"INSERT INTO $cat.$t SELECT id, id * 10, 'x' FROM range(0, 1000)")
    }
    val pool = Executors.newFixedThreadPool(2)
    try {
      val gate = new CountDownLatch(1)
      val futures = Seq("ta", "tb").map { t =>
        pool.submit(new java.util.concurrent.Callable[Try[Unit]] {
          override def call(): Try[Unit] = {
            gate.await(10, TimeUnit.SECONDS)
            Try(spark.sql(
              s"""MERGE INTO $cat.$t t USING (SELECT 5L kk, -1L vv) s
                 |ON t.k = s.kk
                 |WHEN MATCHED THEN UPDATE SET v = s.vv""".stripMargin): Unit)
          }
        })
      }
      gate.countDown()
      val outcomes = futures.map(_.get(180, TimeUnit.SECONDS))
      assert(outcomes.forall(_.isSuccess), s"both merges commit: $outcomes")
      Seq("ta", "tb").foreach { t =>
        assert(Catalog.headVersion(spark,
          Layout(s"$root/_tables/$t")) == 3L, s"$t log advanced by one")
        assert(spark.sql(s"SELECT v FROM $cat.$t WHERE k = 5")
          .head.getLong(0) == -1L)
      }
    } finally pool.shutdownNow()
  }
}
