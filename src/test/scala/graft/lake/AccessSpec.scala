package graft.lake

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** API-key gate + usage plan semantics: registered key on its own
  * source passes, unknown key is 401-equivalent, cross-source key is
  * 403-equivalent, quota exhaustion is 429-equivalent and
  * deterministic, and billing only counts accepted requests. */
class AccessSpec extends SparkTestBase {
  import spark.implicits._

  private val T0 = 1704067200000L // 2024-01-01 00:00:00 UTC

  private def requests(rows: (String, String, String)*) =
    rows.toSeq.toDF("api_key", "source", "env")

  test("gate splits accepted/rejected by key validity, binding, and quota") {
    val layout = Layout(tmpDir("access"))
    Access.register(spark, layout, "clicks", "ck-secret", quota = 2L, registeredMs = T0)
    Access.register(spark, layout, "tweets", "tw-secret", quota = 10L, registeredMs = T0)

    val batch = requests(
      ("ck-secret", "clicks", "e1"),
      ("ck-secret", "clicks", "e2"),
      ("ck-secret", "clicks", "e3"),   // third click: over the quota of 2
      // clicks key on the tweets source; env "a0" sorts FIRST so this
      // also proves a wrong-source request cannot consume a quota slot
      ("ck-secret", "tweets", "a0"),
      ("nobody", "clicks", "e5"))      // unregistered
    val (accepted, rejected) = Access.gate(spark, layout, batch, nowMs = T0)

    val acc = accepted.select("source", "env").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // deterministic quota ranking: envelopes sort lexicographically,
    // so e1 and e2 pass and e3 is the one over the line
    assert(acc == Set(("clicks", "e1"), ("clicks", "e2")))
    val rej = rejected.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(rej == Set(
      ("clicks", "over_quota"),
      ("tweets", "wrong_source"),
      ("clicks", "missing_key")))
  }

  test("usage is billed across batches and re-registration updates the quota") {
    val layout = Layout(tmpDir("access2"))
    Access.register(spark, layout, "clicks", "k", quota = 3L, registeredMs = T0)

    val (a1, _) = Access.gate(spark, layout, requests(
      ("k", "clicks", "a"), ("k", "clicks", "b")), nowMs = T0)
    assert(a1.count() == 2)
    Access.recordUsage(spark, layout, a1, nowMs = T0)

    // 2 of 3 consumed: the next batch of two gets exactly one through
    val (a2, r2) = Access.gate(spark, layout, requests(
      ("k", "clicks", "c"), ("k", "clicks", "d")), nowMs = T0 + 1000)
    assert(a2.count() == 1 && r2.count() == 1)
    Access.recordUsage(spark, layout, a2, nowMs = T0 + 1000)

    // next UTC day: the window resets
    val nextDay = T0 + 86400000L
    val (a3, _) = Access.gate(spark, layout, requests(
      ("k", "clicks", "e"), ("k", "clicks", "f"), ("k", "clicks", "g")), nowMs = nextDay)
    assert(a3.count() == 3, "daily quota must reset with the UTC window")

    // raising the quota by re-registering: newest registration wins
    Access.register(spark, layout, "clicks", "k", quota = 100L, registeredMs = T0 + 2000)
    val (a4, r4) = Access.gate(spark, layout, requests(
      (1 to 10).map(i => ("k", "clicks", s"x$i")): _*), nowMs = nextDay)
    assert(a4.count() == 10 && r4.count() == 0)
  }

  test("compactUsage folds a day's appends without changing any gate decision") {
    val layout = Layout(tmpDir("access4"))
    Access.register(spark, layout, "clicks", "k", quota = 10L, registeredMs = T0)
    // five separate billed batches -> five append files in day=...
    (0 until 5).foreach { i =>
      val (a, _) = Access.gate(spark, layout,
        requests(("k", "clicks", s"e$i")), nowMs = T0 + i)
      Access.recordUsage(spark, layout, a, nowMs = T0 + i)
    }
    def dayFiles: Array[java.io.File] = {
      val d = new java.io.File(s"${layout.root}/_access/usage")
        .listFiles().filter(_.getName.startsWith("day=")).head
      d.listFiles().filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
    }
    assert(dayFiles.length >= 5, s"expected >=5 append files, got ${dayFiles.length}")
    val before = Access.usedToday(spark, layout, T0)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    Access.compactUsage(spark, layout, T0)
    assert(dayFiles.length == 1, "the fold must leave ONE data file")
    val after = Access.usedToday(spark, layout, T0)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after == before, "folding must not change any usage total")
    // 5 of 10 consumed: the next batch of 6 admits exactly 5, same as unfolded
    val (a6, r6) = Access.gate(spark, layout,
      requests((1 to 6).map(i => ("k", "clicks", s"x$i")): _*), nowMs = T0 + 99)
    assert(a6.count() == 5 && r6.count() == 1)
  }

  test("the registry stores digests, never plaintext keys") {
    val layout = Layout(tmpDir("access3"))
    Access.register(spark, layout, "clicks", "super-secret-key", 5L, T0)
    val stored = spark.read.parquet(s"${layout.root}/_access/keys")
    assert(stored.columns.toSet == Set("source", "key_hash", "quota", "registered_ms"))
    val hashes = stored.select("key_hash").collect().map(_.getString(0))
    assert(hashes.forall(h => h.length == 64 && h != "super-secret-key"))
  }
}
