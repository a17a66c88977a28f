package graft.lake

import graft.SparkTestBase
import graft.sql.GraftAddress
import org.apache.spark.sql.functions._

/** Round-13 pins for the ADVICE r12 catches:
  *  - a maintenance/RESTORE target that resolves to nothing REFUSES
  *    loud instead of running against a phantom empty layout;
  *  - OPTIMIZE … ZORDER BY accepts one column (linear-sort degrade);
  *  - RESTORE rewinds TBLPROPERTIES along with the file set, with the
  *    skipping declarations re-pointed through later renames/drops;
  *  - parameterized EXPLAIN of a NON-graft statement delegates WITH
  *    its ParameterContext intact. */
class Round13FixSpec extends SparkTestBase {

  private def freshCat(root: String): String = {
    val name = s"r13_${java.util.UUID.randomUUID().toString.take(8)}"
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.sql.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    name
  }

  private def seed(layout: Layout): Unit = {
    val s = spark
    import s.implicits._
    Catalog.commitLake(spark, layout,
      Seq(("clicks", 1L, 10L), ("clicks", 2L, 20L)).toDF("source", "k", "v"))
  }

  test("a typo'd catalog / phantom target REFUSES loud on every " +
      "maintenance verb instead of reporting success against a " +
      "phantom relative-path layout") {
    // a target whose catalog is NOT registered to graft is NOT OURS —
    // the statement DELEGATES (another lakehouse parser in the chain
    // may own it; here nothing does, so Spark's parser refuses)
    intercept[Exception](spark.sql("VACUUM grft_nope.events").collect())
    intercept[Exception](spark.sql("CHECKPOINT not_a_catalog").collect())
    // a literal path with no manifest log: OURS (paths always are),
    // and a phantom — refuse loud
    val empty = tmpDir("r13-phantom")
    val e3 = intercept[Exception] {
      spark.sql(s"OPTIMIZE $empty").collect()
    }
    assert(e3.getMessage.contains("no graft table"), e3.getMessage)
    // a registered-catalog TABLE that was never created: refuse too
    val cat = freshCat(tmpDir("r13-phantom-cat"))
    val e4 = intercept[Exception] {
      spark.sql(s"VACUUM $cat.never_created").collect()
    }
    assert(e4.getMessage.contains("no graft table"), e4.getMessage)
    // but the BARE registered catalog (its root lake table) stays a
    // legitimate no-op even before the first commit
    val row = spark.sql(s"VACUUM $cat DRY RUN").head
    assert(row.getLong(1) == 0L)
    // and EXPLAIN of a graft-owned verb stays side-effect-free AND
    // plannable (resolution happens at execution)
    assert(spark.sql(s"EXPLAIN VACUUM $cat.never_created")
      .collect().nonEmpty)
  }

  test("OPTIMIZE … ZORDER BY (one column) degrades to a linear " +
      "range-sort: accepted, rewrites, and per-file stats tighten on " +
      "that column") {
    val s = spark
    import s.implicits._
    val root = tmpDir("r13-z1")
    val layout = Layout(root)
    val cat = freshCat(root)
    // two interleaved-range files: unsorted, so each file's k-range
    // spans the whole domain
    Catalog.commitLake(spark, layout,
      (0L until 100L).map(k => ("clicks", k, k)).toDF("source", "k", "v"),
      statsCols = Seq("k"))
    Catalog.commitLake(spark, layout,
      (0L until 100L).map(k => ("clicks", k + 1, k)).toDF("source", "k", "v"),
      statsCols = Seq("k"))
    // table-level declaration so the rewrite records fresh k stats
    Catalog.commitLakeAlter(spark, layout,
      setProps = Seq(Catalog.StatsColsProp -> "k"))
    // a tiny TARGET forces several output files, so disjoint per-file
    // ranges actually prove the sort (one big file would trivially
    // span the domain once)
    val out = spark.sql(s"OPTIMIZE $cat TARGET 1024 ZORDER BY (k)").head
    assert(out.getLong(1) >= 2L, s"expected a rewrite, got $out")
    // post-cluster: file k-ranges must be (near-)disjoint — the sum of
    // per-file spans collapses to ~the domain span
    val stats = Catalog.lakeFileStatsAsOf(spark, layout)
    val live = Catalog.lakeFilesAsOf(spark, layout)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val spans = live.flatMap(stats.get).flatMap { j =>
      Option(mapper.readTree(j).get("k"))
        .map(o => o.get("max").asDouble() - o.get("min").asDouble())
    }
    assert(spans.length >= 2, s"want several clustered files: $spans")
    assert(spans.sum <= 110.0,
      s"one-column ZORDER must sort-cluster: per-file spans $spans")
    // rows unchanged by the rewrite
    assert(spark.sql(s"SELECT count(*) FROM $cat.lake").head.getLong(0) == 200L)
  }

  test("RESTORE rewinds TBLPROPERTIES with the file set: changed keys " +
      "revert, later keys vanish, and a props-only diff still commits") {
    val root = tmpDir("r13-restore-props")
    val layout = Layout(root)
    seed(layout)
    Catalog.commitLakeAlter(spark, layout,
      setProps = Seq("tier" -> "gold", "team" -> "data"))
    val v1 = Catalog.headVersion(spark, layout)
    Catalog.commitLakeAlter(spark, layout,
      setProps = Seq("tier" -> "silver", "extra" -> "x"),
      unsetProps = Seq("team"))
    val seq = Catalog.restoreLake(spark, layout, v1)
    assert(seq > 0, "props-only diff must still commit a restore record")
    val props = Catalog.lakeProperties(spark, layout)
    assert(props.get("tier").contains("gold"), props.toString)
    assert(props.get("team").contains("data"), props.toString)
    assert(!props.contains("extra"), props.toString)
    // idempotent: nothing left to do
    assert(Catalog.restoreLake(spark, layout, v1) == -1L)
  }

  test("RESTORE re-points a restored skipping declaration through a " +
      "later RENAME and drops one emptied by a later DROP COLUMN — " +
      "schema is monotone, so the declaration must name head columns") {
    val root = tmpDir("r13-restore-decl")
    val layout = Layout(root)
    seed(layout)
    Catalog.commitLakeAlter(spark, layout,
      setProps = Seq(Catalog.StatsColsProp -> "k",
        Catalog.BloomColsProp -> "v"))
    val v1 = Catalog.headVersion(spark, layout)
    // later: k renamed, v dropped, both declarations unset at head
    Catalog.commitLakeRenameColumn(spark, layout, "k", "kk")
    Catalog.commitLakeDropColumn(spark, layout, "v")
    Catalog.commitLakeAlter(spark, layout,
      unsetProps = Seq(Catalog.StatsColsProp))
    assert(Catalog.restoreLake(spark, layout, v1) > 0)
    val props = Catalog.lakeProperties(spark, layout)
    assert(props.get(Catalog.StatsColsProp).contains("kk"),
      s"stats.cols must restore re-pointed to the renamed column: $props")
    assert(!props.contains(Catalog.BloomColsProp),
      s"a declaration emptied by a later DROP must not restore: $props")
  }

  test("DESCRIBE HISTORY (Delta syntax) rewrites onto the `_history` " +
      "surface for created tables and the bare catalog; SHOW TABLES " +
      "lists `_tables` entries with their derived surfaces") {
    val root = tmpDir("r13-desc-hist")
    val cat = freshCat(root)
    spark.sql(s"CREATE TABLE $cat.ev (k BIGINT, source STRING) " +
      "PARTITIONED BY (source)")
    spark.sql(s"INSERT INTO $cat.ev VALUES (1, 's')")
    spark.sql(s"INSERT INTO $cat.ev VALUES (2, 's')")
    val viaStmt = spark.sql(s"DESCRIBE HISTORY $cat.ev").collect()
    val viaSurface = spark.sql(s"SELECT * FROM $cat.ev_history").collect()
    assert(viaStmt.length == 3 && viaStmt.toSeq == viaSurface.toSeq,
      "one engine path: the statement IS the derived surface")
    // bare catalog → the root lake's history
    seed(Layout(root))
    assert(spark.sql(s"DESCRIBE HISTORY $cat").collect().nonEmpty)
    // derived names refuse (history of a history is meaningless)
    assert(intercept[Exception](
      spark.sql(s"DESCRIBE HISTORY $cat.ev_history"))
      .getMessage.contains("base table"))
    val shown = spark.sql(s"SHOW TABLES IN $cat").collect()
      .map(_.getString(1)).toSet
    assert(Set("lake", "ev", "ev_history", "ev_changes", "ev_detail")
      .subsetOf(shown), s"SHOW TABLES lists created+derived: $shown")
  }

  test("parameterized EXPLAIN of a non-graft statement delegates with " +
      "its parameters bound; graft verbs with parameters still parse") {
    // positional parameter inside an EXPLAIN: must NOT be stolen by
    // the graft parser (the pre-fix routing dropped the
    // ParameterContext for anything verb-prefixed)
    val rows = spark.sql("EXPLAIN SELECT ? + 1", Array(41)).collect()
    assert(rows.nonEmpty)
    // and a graft statement through the parameterized entry point
    val root = tmpDir("r13-param")
    val layout = Layout(root)
    seed(layout)
    val out = spark.sql(s"CHECKPOINT $root", Map.empty[String, Any]).head
    assert(out.getString(0) == "checkpoint")
  }

  test("round-14 (advice-r13): a FOREIGN catalog's path form " +
      "(delta.`/path/to/t`) is NOT stolen by the '/'-is-ours rule — " +
      "the statement delegates to the chain; bare paths stay ours") {
    // a catalog registered to some OTHER lakehouse implementation
    spark.conf.set("spark.sql.catalog.fdelta", "org.example.DeltaCatalog")
    try {
      val e = intercept[Exception] {
        spark.sql("RESTORE TABLE fdelta.`/tmp/never` TO VERSION AS OF 0")
          .collect()
      }
      // delegated: the failure is the CHAIN's (nothing downstream
      // parses it), never graft's layout-resolution error
      assert(!e.getMessage.contains("no graft table"), e.getMessage)
      assert(!e.isInstanceOf[NoSuchElementException], e.toString)
      val e2 = intercept[Exception] {
        spark.sql("VACUUM fdelta.`/tmp/never`").collect()
      }
      assert(!e2.getMessage.contains("no graft table"), e2.getMessage)
      // a BARE path (no dotted prefix) keeps routing to graft
      val empty = tmpDir("r14-bare-path")
      val e3 = intercept[Exception](spark.sql(s"OPTIMIZE $empty").collect())
      assert(e3.getMessage.contains("no graft table"), e3.getMessage)
      // and a GRAFT-registered catalog prefix with a path target stays
      // ours (routing only; address resolution decides validity)
      val cat = freshCat(tmpDir("r14-graft-path"))
      val e4 = intercept[Exception] {
        spark.sql(s"VACUUM $cat.`/tmp/never`").collect()
      }
      assert(e4.getMessage.contains("no graft table") ||
        e4.getMessage.contains("identifier"), e4.getMessage)
    } finally spark.conf.unset("spark.sql.catalog.fdelta")
  }
}
