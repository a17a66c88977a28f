package graft.sql

import java.util

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsDelete, SupportsRead, SupportsWrite, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.functions.{col, lit, raise_error, when}
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{BaseRelation, Filter, InsertableRelation, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.lake.{Catalog => Lake, Layout}

/** DataSource-v2 `TableCatalog` over the manifest-log lake — the SQL
  * addressability surface every Delta/Iceberg user expects (the
  * reference's ONLY queryable structure is its catalog,
  * `/root/reference/serverless_datalake/serverless_datalake_stack.py:63-77`;
  * here the
  * whole committed lake is SQL-addressable). Register per layout root:
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
  * spark.conf.set("spark.sql.catalog.graft.root", "/data/my-lake")
  * spark.sql("SELECT * FROM graft.lake VERSION AS OF 3")
  * }}}
  *
  * Tables (reads, the full DML verb set — INSERT / INSERT OVERWRITE /
  * DELETE / TRUNCATE here, MERGE INTO / UPDATE via the injected
  * [[GraftDmlRule]] — and evolution DDL; every verb maps onto the
  * typed commit protocol, so SQL and Scala writes produce identical
  * log shapes):
  *
  *  - `lake` — the committed snapshot ([[graft.lake.Catalog.loadLakeSnapshot]]):
  *    DV-applied, schema-evolved, snapshot-isolated. Supports
  *    `VERSION AS OF <seq>` and `TIMESTAMP AS OF <ts>`
  *    ([[graft.lake.Catalog.versionAtTimestamp]] semantics, pruned
  *    history refusing loud).
  *  - `lake_changes` — the change data feed
  *    ([[graft.lake.Catalog.lakeChangesBetween]]) over the session-conf
  *    range `spark.graft.cdf.startingVersion` (exclusive, default 0) to
  *    `spark.graft.cdf.endingVersion` (inclusive, default head) — the
  *    conf stands in for Delta's `table_changes(...)` arguments, which
  *    SQL cannot pass to a v2 catalog table.
  *  - `lake_catalog` — the ingest catalog area (the reference's
  *    DynamoDB table), with the same version-as-of surface via
  *    [[graft.lake.Catalog.loadAsOf]].
  *  - `lake_history` — `DESCRIBE HISTORY`
  *    ([[graft.lake.Catalog.lakeHistory]]): one row per retained
  *    version — files added/removed, DV files, evolutions, name
  *    changes, expectation changes, commit time, note.
  *  - `lake_detail` — `DESCRIBE DETAIL`
  *    ([[graft.lake.Catalog.lakeDetail]]): one row of table-level
  *    facts at head.
  *
  * Execution: scans go through [[V1Scan]] — the plan is BUILT with the
  * library's own public DataFrame reads (manifest-log file listing, DV
  * anti-join, evolution merge), so there is no second read path to
  * keep correct; supported filters and the required-column set are
  * pushed INTO that inner plan (reaching the parquet scans via
  * Catalyst as usual), unsupported ones are left for Spark to apply
  * above. Time travel binds at analysis (`loadTable`), exactly the
  * DSv2 contract. */
class GraftCatalog extends TableCatalog {

  private var catalogName: String = _
  private var layout: Layout = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    val root = options.get("root")
    require(root != null && root.nonEmpty,
      s"catalog '$name' needs option spark.sql.catalog.$name.root = <layout root dir>")
    catalogName = name
    layout = Layout(root)
  }

  override def name(): String = catalogName

  // opt into ADD/DROP CONSTRAINT DDL (mapped onto expectations below)
  override def capabilities(): util.Set[
      org.apache.spark.sql.connector.catalog.TableCatalogCapability] =
    util.EnumSet.of(org.apache.spark.sql.connector.catalog
      .TableCatalogCapability.SUPPORT_TABLE_CONSTRAINT)

  private def spark: SparkSession = SparkSession.active

  /** Derived read-surface suffixes: for any base table `t`, the names
    * `t_changes` / `t_history` / `t_detail` serve its change feed,
    * DESCRIBE HISTORY and DESCRIBE DETAIL. Reserved at CREATE, so
    * identifier parsing stays unambiguous. ONE shared definition
    * ([[GraftAddress]]) with the parser and streaming providers. */
  private def derivedSuffixes = GraftAddress.DerivedSuffixes

  /** Base table → its layout. The legacy `lake` table IS the catalog
    * root (the reference pipeline's bronze/catalog/distribution areas
    * live beside it); every other table is a self-contained layout
    * under `_tables/<name>` — one manifest log per table, every typed
    * verb addressed per table. The `_` prefix keeps whole-root file
    * listings from picking table dirs up as data; the nesting keeps
    * user table names from colliding with the root's area dirs. */
  private[sql] def tableLayout(table: String): Layout =
    GraftAddress.tableLayout(layout.root, table)

  private def validBaseName(n: String): Boolean =
    GraftAddress.validBaseName(n)

  /** Identifier name → (base table, derived surface). `lake_catalog`
    * parses as a derived surface of the root (the ingest area). */
  private def parseName(name: String): Option[(String, Option[String])] =
    if (name == GraftAddress.RootCatalogName) Some(("lake", Some("_catalog")))
    else derivedSuffixes.find(name.endsWith) match {
      case Some(sfx) =>
        val base = name.stripSuffix(sfx)
        if (validBaseName(base)) Some((base, Some(sfx))) else None
      case None => if (validBaseName(name)) Some((name, None)) else None
    }

  private def defaultNs(ns: Array[String]): Boolean =
    ns.isEmpty || ns.sameElements(Array("default"))

  private def resolvable(ident: Identifier): Boolean =
    defaultNs(ident.namespace) && parseName(ident.name).isDefined

  /** The base tables that EXIST: `lake` when the root log carries lake
    * facts, plus every `_tables/<t>` whose own log does. */
  private def existingTables: Seq[String] = {
    val s = spark
    val legacy = if (Lake.lakeTableExists(s, layout)) Seq("lake") else Seq.empty
    val dir = new org.apache.hadoop.fs.Path(
      s"${layout.root}/${GraftAddress.TablesDir}")
    val fs = dir.getFileSystem(s.sparkContext.hadoopConfiguration)
    val subs =
      if (!fs.exists(dir)) Seq.empty
      else fs.listStatus(dir).filter(_.isDirectory).map(_.getPath.getName)
        .filter(n => validBaseName(n) && n != "lake")
        .filter(n => Lake.lakeTableExists(s, tableLayout(n)))
        .toSeq.sorted
    legacy ++ subs
  }

  // mirror resolvable(): listing a namespace loadTable would refuse
  // (SHOW TABLES IN graft.foo) returns nothing, not phantom tables.
  // The legacy surfaces list unconditionally (they always resolve);
  // created tables list with their derived surfaces once they exist.
  override def listTables(namespace: Array[String]): Array[Identifier] =
    if (defaultNs(namespace)) {
      val legacy =
        Seq("lake", "lake_changes", "lake_catalog", "lake_history", "lake_detail")
      val created = existingTables.filterNot(_ == "lake")
        .flatMap(t => t +: derivedSuffixes.map(sfx => s"$t$sfx"))
      (legacy ++ created).map(Identifier.of(namespace, _)).toArray
    } else Array.empty

  /** A base table "exists" once its log carries any LAKE fact — a data
    * file ever committed or a CREATE's schema facts; catalog/
    * distribution-area commits don't count (an ingest-only root's lake
    * is still creatable). Gates `CREATE TABLE` vs
    * `TableAlreadyExistsException` and makes `IF NOT EXISTS` a no-op
    * on a populated root. The legacy lake's derived surfaces always
    * exist; a created table's exist with it. */
  override def tableExists(ident: Identifier): Boolean =
    resolvable(ident) && {
      val (base, derived) = parseName(ident.name).get
      (base == "lake" && derived.isDefined) ||
        Lake.lakeTableExists(spark, tableLayout(base))
    }

  override def loadTable(ident: Identifier): Table = tableAt(ident, None)

  /** `VERSION AS OF <v>` — the commit seq, as in the Scala API. */
  override def loadTable(ident: Identifier, version: String): Table =
    tableAt(ident, Some(version.toLongOption.getOrElse(
      throw new IllegalArgumentException(
        s"VERSION AS OF wants a commit seq, got '$version'"))))

  /** `TIMESTAMP AS OF <ts>` — Spark hands the timestamp down in
    * MICROseconds since the epoch. Refuses loud below the oldest
    * reconstructible version (the pruned-history retention bound). */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val ms = timestamp / 1000L
    val v = Lake.versionAtTimestamp(spark, layout, ms).getOrElse(
      throw new IllegalArgumentException(
        s"TIMESTAMP AS OF: no committed version at or before epoch-ms $ms " +
          "(before the first commit, or pruned history)"))
    tableAt(ident, Some(v))
  }

  private def tableAt(ident: Identifier, version: Option[Long]): Table = {
    if (!resolvable(ident)) throw new NoSuchTableException(ident)
    val s = spark
    val (base, derived) = parseName(ident.name).get
    val tl = tableLayout(base)
    // a created table must actually exist to serve reads; the legacy
    // lake stays loadable pre-creation (its derived surfaces and the
    // empty-frame read predate CREATE TABLE support)
    if (base != "lake" && !Lake.lakeTableExists(s, tl))
      throw new NoSuchTableException(ident)
    val qname = s"$catalogName.${ident.name}"
    derived match {
      case None =>
        version match {
          // the HEAD table is the DML surface: DELETE FROM graft.<t>
          // WHERE … routes into the typed path (locks + expectations)
          case None => new GraftLakeTable(qname, tl,
            () => Lake.loadLakeSnapshot(s, tl))
          case Some(v) => new GraftTable(qname,
            () => Lake.loadLakeSnapshot(s, tl, v))
        }
      case Some("_catalog") =>
        new GraftTable(qname,
          () => version match {
            case Some(v) => Lake.loadAsOf(s, tl, v)
            case None => Lake.load(s, tl)
          })
      case Some("_history") =>
        // DESCRIBE HISTORY: per-retained-version commit summary
        if (version.isDefined) throw new UnsupportedOperationException(
          s"${ident.name} is the version timeline itself — no AS OF")
        new GraftTable(qname, () => Lake.lakeHistory(s, tl))
      case Some("_detail") =>
        // DESCRIBE DETAIL: one row of table-level facts at head
        if (version.isDefined) throw new UnsupportedOperationException(
          s"${ident.name} describes the head — use VERSION AS OF on $base")
        new GraftTable(qname, () => Lake.lakeDetail(s, tl))
      case Some("_changes") =>
        if (version.isDefined) throw new UnsupportedOperationException(
          s"${ident.name} is already a version range — set " +
            "spark.graft.cdf.startingVersion / endingVersion instead of AS OF")
        // conf is read HERE (loadTable runs per query analysis), so two
        // queries under different conf values see different ranges
        val from = s.conf.get("spark.graft.cdf.startingVersion", "0").toLong
        val to = s.conf.get("spark.graft.cdf.endingVersion",
          Long.MaxValue.toString).toLong
        new GraftTable(qname, () => Lake.lakeChangesBetween(s, tl, from, to))
      case _ => throw new NoSuchTableException(ident)
    }
  }

  /** `CREATE TABLE <cat>.<name> (…) PARTITIONED BY (source)` — schema
    * facts on an EMPTY log: every declared column lands as an addcol
    * fact in ONE atomic record ([[graft.lake.Catalog.commitLakeAlter]]),
    * so the table reads as an empty frame WITH that schema and the
    * whole lifecycle — `INSERT INTO`, `MERGE INTO` (the NOT-MATCHED
    * bootstrap), constraints, evolution — is reachable from pure SQL
    * with no typed bootstrap commit. Any valid base name is creatable
    * (its manifest log lives under `_tables/<name>`; `lake` is the
    * catalog-root table itself); derived-surface suffixes
    * (`*_changes`/`*_history`/`*_detail`) and `lake_catalog` are
    * reserved. The schema carries `source STRING` (the partition key
    * every maintenance path keys on); partitioning is absent or
    * exactly `source`. The reported column order puts `source` LAST
    * (the data-born convention), regardless of declaration order.
    * Refuses on an existing table ([[tableExists]] gates
    * `IF NOT EXISTS` upstream). */
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    if (!defaultNs(ident.namespace) || !validBaseName(ident.name) ||
        parseName(ident.name).exists(_._2.isDefined))
      throw new UnsupportedOperationException(
        s"'${ident.name}' is not a creatable table name — any " +
          "identifier not ending in the reserved derived suffixes " +
          s"(${derivedSuffixes.mkString(", ")}) works")
    val s = spark
    val tblLayout = tableLayout(ident.name)
    if (Lake.lakeTableExists(s, tblLayout))
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(Array(name(), ident.name))
    val src = schema.fields.find(_.name == "source").getOrElse(
      throw new IllegalArgumentException(
        "CREATE TABLE needs a 'source STRING' column — the lake's " +
          "partition key"))
    require(src.dataType == org.apache.spark.sql.types.StringType,
      s"'source' must be STRING, got ${src.dataType.sql}")
    partitions.foreach { t =>
      val ok = t.name() == "identity" &&
        t.references().map(_.fieldNames().mkString(".")).sameElements(
          Array("source"))
      if (!ok) throw new UnsupportedOperationException(
        s"the lake is partitioned by 'source' (got $t) — declare " +
          "PARTITIONED BY (source) or nothing")
    }
    Option(properties.get("location")).foreach(_ =>
      throw new UnsupportedOperationException(
        "LOCATION is the catalog root — set spark.sql.catalog.<name>.root"))
    // TBLPROPERTIES land as atomic log facts with the schema —
    // `stats.cols`/`bloom.cols` make file skipping a TABLE fact every
    // write path honors. Spark's own bookkeeping keys are dropped.
    val sparkManaged = Set("location", "provider", "owner", "external",
      "is_managed_location")
    val props = {
      import scala.jdk.CollectionConverters._
      properties.asScala.toSeq.filterNot(p => sparkManaged(p._1.toLowerCase))
    }
    Lake.commitLakeAlter(s, tblLayout,
      addCols = schema.fields.toSeq.map(f => f.name -> f.dataType.sql),
      setProps = props)
    tableAt(ident, None)
  }
  /** SQL DDL for the evolutions the manifest log supports — each maps
    * onto its typed commit, so ALTER through SQL and through the Scala
    * API produce the identical log fact:
    *
    *  - `ADD COLUMNS (c T)` → [[graft.lake.Catalog.commitLakeAddColumn]]
    *  - `ALTER COLUMN c TYPE T` → [[graft.lake.Catalog.commitLakeWidenColumn]]
    *    (the lossless-widening whitelist is enforced there)
    *  - `ADD CONSTRAINT n CHECK (…)` → [[graft.lake.Catalog.addLakeExpectation]]
    *    (validated against committed data at add time)
    *  - `DROP CONSTRAINT n` → [[graft.lake.Catalog.removeLakeExpectation]]
    *  - `RENAME COLUMN o TO n` → [[graft.lake.Catalog.commitLakeRenameColumn]]
    *    (metadata-only; the read path maps old files' physical name)
    *  - `DROP COLUMN c` → [[graft.lake.Catalog.commitLakeDropColumn]]
    *    (metadata-only; retired names never return)
    *
    * Anything else (nested fields, property bags) refuses loudly.
    * Only the head `lake` table is alterable.
    *
    * A multi-change statement (`ADD COLUMNS (a int, b int)`, or mixed
    * adds + widenings + constraints) is ATOMIC: every change is
    * validated first and all facts land in ONE manifest-log record
    * ([[graft.lake.Catalog.commitLakeAlter]]) — a refused change
    * leaves the table exactly as the statement found it, never with a
    * committed prefix of itself. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    if (!resolvable(ident)) throw new NoSuchTableException(ident)
    val (base, derived) = parseName(ident.name).get
    if (derived.isDefined) throw new UnsupportedOperationException(
      s"${ident.name} is a derived surface; evolutions land on '$base'")
    // deliberately shadows the catalog-root field: every commit below
    // lands on THIS table's manifest log
    val layout = tableLayout(base)
    if (base != "lake" && !Lake.lakeTableExists(spark, layout))
      throw new NoSuchTableException(ident)
    val s = spark
    def topLevel(fieldNames: Array[String]): String = {
      if (fieldNames.length != 1) throw new UnsupportedOperationException(
        s"nested fields are not evolvable: ${fieldNames.mkString(".")}")
      fieldNames(0)
    }
    val addCols = Seq.newBuilder[(String, String)]
    val widenCols = Seq.newBuilder[(String, String)]
    val renameCols = Seq.newBuilder[(String, String)]
    val dropCols = Seq.newBuilder[String]
    val expectAdds = Seq.newBuilder[(String, String)]
    val expectRms = Seq.newBuilder[String]
    val setProps = Seq.newBuilder[(String, String)]
    val unsetProps = Seq.newBuilder[String]
    changes.foreach {
      case sp: TableChange.SetProperty =>
        setProps += ((sp.property(), sp.value()))
      case rp: TableChange.RemoveProperty =>
        unsetProps += rp.property()
      case ac: TableChange.AddColumn =>
        addCols += ((topLevel(ac.fieldNames()), ac.dataType().sql))
      case ut: TableChange.UpdateColumnType =>
        widenCols += ((topLevel(ut.fieldNames()), ut.newDataType().sql))
      case rc: TableChange.RenameColumn =>
        renameCols += ((topLevel(rc.fieldNames()), rc.newName()))
      case dc: TableChange.DeleteColumn =>
        dropCols += topLevel(dc.fieldNames())
      case acn: TableChange.AddConstraint =>
        acn.constraint() match {
          case c: org.apache.spark.sql.connector.catalog.constraints.Check =>
            expectAdds += ((c.name(), c.predicateSql()))
          case other => throw new UnsupportedOperationException(
            s"only CHECK constraints are supported, got $other")
        }
      case dcn: TableChange.DropConstraint =>
        if (dcn.ifExists() &&
            !Lake.lakeExpectations(s, layout).contains(dcn.name())) ()
        else expectRms += dcn.name()
      case other => throw new UnsupportedOperationException(
        s"unsupported ALTER on the manifest log: $other — supported: " +
          "ADD COLUMNS, ALTER COLUMN TYPE (lossless widening), " +
          "RENAME COLUMN, DROP COLUMN, ADD/DROP CONSTRAINT … CHECK")
    }
    val (ac, wc, rc, dc, ea, er, ps, pr) =
      (addCols.result(), widenCols.result(), renameCols.result(),
        dropCols.result(), expectAdds.result(), expectRms.result(),
        setProps.result(), unsetProps.result())
    // a lone DROP CONSTRAINT IF EXISTS on a missing name is a no-op
    if (ac.nonEmpty || wc.nonEmpty || rc.nonEmpty || dc.nonEmpty ||
        ea.nonEmpty || er.nonEmpty || ps.nonEmpty || pr.nonEmpty)
      Lake.commitLakeAlter(s, layout, ac, wc, ea, er,
        renameCols = rc, dropCols = dc, setProps = ps, unsetProps = pr)
    tableAt(ident, None)
  }
  /** `DROP TABLE <cat>.<name>`: a created table is a self-contained
    * layout under `_tables/<name>` — dropping deletes it whole (log,
    * data, DVs, history; there is nothing else in the dir). The legacy
    * `lake` table REFUSES: it shares the catalog root with the ingest
    * pipeline's bronze/catalog/distribution areas, and deleting those
    * as a side effect of a table verb would be a destructive surprise
    * (clear the root itself to retire a whole deployment). */
  override def dropTable(ident: Identifier): Boolean = {
    if (!resolvable(ident)) return false
    val (base, derived) = parseName(ident.name).get
    if (derived.isDefined) throw new UnsupportedOperationException(
      s"${ident.name} is a derived surface of '$base' — drop the table")
    if (base == "lake") throw new UnsupportedOperationException(
      "the root 'lake' table shares the catalog root with the ingest " +
        "areas (bronze/catalog/distribution) and cannot be dropped " +
        "through a table verb — created tables (CREATE TABLE " +
        s"$catalogName.<name>) drop cleanly")
    val s = spark
    val tl = tableLayout(base)
    if (!Lake.lakeTableExists(s, tl)) return false
    val dir = new org.apache.hadoop.fs.Path(tl.root)
    val fs = dir.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(dir, true)
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "RENAME TABLE is not supported: checkpoints, subscriber offsets " +
        "and shared-artifact keys are addressed by layout root — " +
        "create-as-select into the new name instead")
}

/** Shared lake-addressing for every out-of-band SQL surface (TVFs,
  * RESTORE, maintenance statements): a target string is a registered
  * catalog name (its root `lake` table), `catalog.table` (that
  * catalog's created table), or a literal layout-root path. */
private[graft] object GraftAddress {
  /** Created tables live under `<root>/_tables/<name>` — `_`-prefixed
    * so whole-root file listings skip them, nested so user table names
    * can never collide with the root's area dirs. */
  val TablesDir = "_tables"

  /** Reserved derived-surface suffixes and the root ingest-area name —
    * ONE definition shared by the catalog, the statement parser and
    * the streaming providers (a second copy would drift). */
  val DerivedSuffixes: Seq[String] = Seq("_changes", "_history", "_detail")
  val RootCatalogName = "lake_catalog"

  private val baseNameRe = "[A-Za-z][A-Za-z0-9_]*".r

  /** A creatable / addressable BASE table name: the identifier rule
    * also blocks path traversal (`../..`) from surfaces that
    * interpolate the name into a layout path. */
  def validBaseName(n: String): Boolean =
    n == "lake" || (baseNameRe.matches(n) && n != RootCatalogName &&
      !DerivedSuffixes.exists(n.endsWith))

  /** The layout of catalog root `root`'s table `name` — validated, so
    * no caller can aim outside the `_tables` namespace. */
  def tableLayout(root: String, name: String): Layout = {
    require(validBaseName(name),
      s"'$name' is not a valid graft table name")
    if (name == "lake") Layout(root) else Layout(s"$root/$TablesDir/$name")
  }

  def layout(spark: SparkSession, target: String): Layout = {
    def rootOf(cat: String): Option[String] =
      spark.conf.getOption(s"spark.sql.catalog.$cat.root")
    rootOf(target) match {
      case Some(r) => Layout(r)
      case None if target.contains('/') =>
        Layout(target) // a literal layout-root path
      case None =>
        // an identifier-shaped target (no '/') MUST resolve through a
        // registered catalog — falling back to a relative-path layout
        // here would turn a typo'd catalog (`VACUUM grft.events`) into
        // a phantom empty table that every verb "succeeds" against
        val dot = target.indexOf('.')
        if (dot > 0) {
          val (cat, tbl) = (target.substring(0, dot), target.substring(dot + 1))
          rootOf(cat) match {
            case Some(r) => tableLayout(r, tbl)
            case None => throw new NoSuchElementException(
              s"'$cat' is not a registered graft catalog — register it " +
                s"(spark.sql.catalog.$cat = graft.sql.GraftCatalog + " +
                s"spark.sql.catalog.$cat.root = <dir>) or address the " +
                "table by its layout-root path")
          }
        } else throw new NoSuchElementException(
          s"'$target' is neither a registered graft catalog nor a " +
            "layout-root path (paths contain '/')")
    }
  }

  /** [[layout]] + an EXISTENCE gate for the mutating statements
    * (RESTORE / OPTIMIZE / VACUUM / CHECKPOINT / MATERIALIZE): a
    * created table or a path target must already carry a manifest log
    * — otherwise the verb would run against a phantom empty layout
    * and report success (result -1, head 0) where Delta raises
    * no-such-table. A BARE registered catalog is exempt: its root
    * `lake` table exists by registration, and maintenance on a
    * not-yet-written deployment is a legitimate no-op. */
  def existingLayout(spark: SparkSession, target: String): Layout = {
    val l = layout(spark, target)
    val bareRegisteredCatalog =
      spark.conf.getOption(s"spark.sql.catalog.$target.root").isDefined
    if (!bareRegisteredCatalog &&
        graft.lake.Catalog.headVersion(spark, l) == 0L)
      throw new NoSuchElementException(
        s"no graft table at '$target' — nothing is committed there " +
          "(check the table name; CREATE TABLE / a first commit " +
          "creates the manifest log)")
    l
  }
}

/** A lazily-planned read-only table: `frame` builds the DataFrame from
  * the manifest log on first use (schema and scans both come from it —
  * one source of truth). */
private[sql] class GraftTable(tableName: String, frame: () => DataFrame)
    extends Table with SupportsRead {
  protected lazy val df: DataFrame = frame()
  override def name(): String = tableName
  override def schema(): StructType = df.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(df)
}

/** The head `lake` table: readable like every [[GraftTable]], plus the
  * DML verbs that map losslessly onto the manifest log:
  *
  *  - `DELETE FROM graft.lake WHERE …` → [[graft.lake.Catalog
  *    .deleteLakeWhere]]: per-source maintenance locks, optimistic
  *    re-check under them, a deletion-vector commit (no data files
  *    rewritten), CDF visibility. A predicate the translator cannot
  *    express (nested fields, exotic ops) makes `canDeleteWhere`
  *    false and Spark refuses loudly — never a partial delete.
  *    `TRUNCATE TABLE` / unqualified DELETE = a DV over every row, so
  *    time travel below it still reads the history.
  *  - `INSERT INTO graft.lake …` → [[graft.lake.Catalog.commitLake]]
  *    through the [[V1Write]] bridge: the SQL verb gets the typed
  *    write path whole — commit-time expectations, widening up-cast
  *    at staging, one atomic log record. A NULL `source` refuses IN
  *    the write pass (`raise_error` in the partition projection, so a
  *    non-deterministic inserted query cannot slip past a pre-check)
  *    — it would corrupt the partition scheme every maintenance path
  *    keys on.
  *  - `INSERT OVERWRITE TABLE graft.lake …` →
  *    [[graft.lake.Catalog.overwriteLake]]: atomic truncate + append
  *    in ONE log record (a DV over every live row + the new files) —
  *    readers see the old table or the new one, never empty; history
  *    below stays time-travelable; expectations gate the new rows.
  *  - `MERGE INTO graft.lake` / `UPDATE graft.lake` land through the
  *    injected resolution rule ([[GraftDmlRule]]) on the same
  *    one-record DV+append machinery. */
private[sql] class GraftLakeTable(tableName: String,
    private[sql] val layout: Layout,
    frame: () => DataFrame) extends GraftTable(tableName, frame)
    with SupportsDelete with SupportsWrite {

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)

  // SHOW TBLPROPERTIES / DESCRIBE EXTENDED read committed log facts
  override def properties(): util.Map[String, String] = {
    val m = new util.HashMap[String, String]()
    Lake.lakeProperties(SparkSession.active, layout)
      .foreach { case (k, v) => m.put(k, v) }
    m
  }

  // the head table's scans consult the manifest-log skipping index:
  // pushed range/point conjuncts prune the FILE LIST (min/max stats)
  // before parquet opens a footer — SQL data skipping, the
  // Delta/Iceberg scan behavior (time-travel tables keep the plain
  // path: their frames are version-bound at loadTable)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(df, filters =>
      Lake.loadLakeSnapshotForBounds(SparkSession.active, layout,
        GraftFilters.boundsOf(filters),
        GraftFilters.nullChecksOf(filters)))

  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    filters.forall(f => GraftFilters.toColumn(f).isDefined)

  override def deleteWhere(filters: Array[Filter]): Unit = {
    val pred = filters.flatMap(GraftFilters.toColumn)
      .reduceOption(_ && _).getOrElse(lit(true))
    Lake.deleteLakeWhere(SparkSession.active, layout, pred)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      // INSERT OVERWRITE arrives as OverwriteByExpression(true) and is
      // negotiated on the BUILDER (truncate()), not the relation — keep
      // both signals and honor either
      private var replaceAll = false
      override def truncate(): WriteBuilder = { replaceAll = true; this }
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, overwrite: Boolean): Unit = {
              // the NULL-source guard rides INSIDE the single write pass
              // (raise_error in the partition column's own projection):
              // a pre-check job would execute the inserted query twice,
              // and a non-deterministic query (rand(), uuid(), …) could
              // pass the check yet stage different rows — letting NULL
              // rows land in __HIVE_DEFAULT_PARTITION__ and corrupt the
              // partition scheme every maintenance path keys on
              val guarded = data.withColumn("source",
                when(col("source").isNull, raise_error(lit(
                  "INSERT INTO lake: NULL source — every row needs the " +
                    "source partition key"))).otherwise(col("source")))
              if (overwrite || replaceAll)
                Lake.overwriteLake(SparkSession.active, layout, guarded)
              else Lake.commitLake(SparkSession.active, layout, guarded)
            }
          }
      }
    }
}

/** Pushes supported filters and the required-column projection into
  * the inner DataFrame plan (where Catalyst carries them down to the
  * parquet scans); anything it cannot translate is returned to Spark
  * to evaluate above the scan — never dropped.
  *
  * `filePruner` (the head lake table's hook): given the accepted
  * filters, an optional REPLACEMENT base frame whose file list was
  * pruned through the manifest-log skipping index
  * ([[graft.lake.Catalog.loadLakeSnapshotForBounds]]) — SQL data
  * skipping at the FILE level, before parquet ever opens a footer.
  * The row predicates are re-applied on the replacement (stats skip
  * files, never rows), so the result is exact by construction. */
private[sql] class GraftScanBuilder(df: DataFrame,
    filePruner: Array[Filter] => Option[DataFrame] = _ => None)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var filtered: DataFrame = df
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, residual) = filters.partition(f => toColumn(f).isDefined)
    val base = filePruner(supported).getOrElse(filtered)
    filtered = supported.flatMap(toColumn(_)).foldLeft(base)(_.filter(_))
    pushed = supported
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    if (requiredSchema.fields.isEmpty) {
      // SELECT count(*): no columns are required — project only the
      // CHEAPEST table column so the row boundary carries narrow rows
      // instead of the full width (the scan's readSchema must stay a
      // subset of the table schema, so a literal cannot stand in)
      filtered.schema.fields.sortBy(f => (f.dataType.defaultSize, f.name))
        .headOption.foreach(f => filtered = filtered.select(col(f.name)))
    } else if (requiredSchema.fieldNames.forall(filtered.columns.contains))
      filtered = filtered.select(
        requiredSchema.fieldNames.toIndexedSeq.map(col): _*)

  override def build(): Scan = new GraftV1Scan(filtered)

  private def toColumn(f: Filter): Option[Column] = GraftFilters.toColumn(f)
}

/** `sources.Filter` → `Column` for the ANSI basics; `None` =
  * unsupported (nested attributes, exotic predicates) — left for Spark
  * to evaluate above a scan, or refused outright by DML. Shared by the
  * read pushdown ([[GraftScanBuilder]]) and `DELETE`
  * ([[GraftLakeTable]]) so both surfaces accept exactly the same
  * predicate language. */
private[sql] object GraftFilters {
  def toColumn(f: Filter): Option[Column] = {
    def simple(attr: String): Boolean = !attr.contains(".")
    f match {
      case sources.EqualTo(a, v) if simple(a) => Some(col(a) === lit(v))
      case sources.EqualNullSafe(a, v) if simple(a) => Some(col(a) <=> lit(v))
      case sources.GreaterThan(a, v) if simple(a) => Some(col(a) > lit(v))
      case sources.GreaterThanOrEqual(a, v) if simple(a) => Some(col(a) >= lit(v))
      case sources.LessThan(a, v) if simple(a) => Some(col(a) < lit(v))
      case sources.LessThanOrEqual(a, v) if simple(a) => Some(col(a) <= lit(v))
      case sources.In(a, vs) if simple(a) =>
        Some(col(a).isin(vs.toIndexedSeq: _*))
      case sources.IsNull(a) if simple(a) => Some(col(a).isNull)
      case sources.IsNotNull(a) if simple(a) => Some(col(a).isNotNull)
      case sources.StringStartsWith(a, v) if simple(a) => Some(col(a).startsWith(v))
      case sources.StringEndsWith(a, v) if simple(a) => Some(col(a).endsWith(v))
      case sources.StringContains(a, v) if simple(a) => Some(col(a).contains(v))
      case sources.And(l, r) =>
        for (lc <- toColumn(l); rc <- toColumn(r)) yield lc && rc
      case sources.Or(l, r) =>
        for (lc <- toColumn(l); rc <- toColumn(r)) yield lc || rc
      case sources.Not(c) => toColumn(c).map(!_)
      // TRUNCATE arrives as deleteWhere(AlwaysTrue) — must translate,
      // or the default truncateTable() silently no-ops
      case sources.AlwaysTrue() => Some(lit(true))
      case sources.AlwaysFalse() => Some(lit(false))
      case _ => None
    }
  }

  /** Per-column `(col, lo?, hi?)` bounds from the pushed conjuncts —
    * the input to file-level skipping. Only shapes whose bound is
    * EXACTLY implied are translated (GT uses an inclusive lo: keeping
    * a boundary file is sound, dropping one would not be); anything
    * else contributes no bound and prunes nothing. */
  def boundsOf(filters: Array[Filter]): Seq[(String, Option[Any], Option[Any])] = {
    def simple(attr: String): Boolean = !attr.contains(".")
    def walk(f: Filter): Seq[(String, Option[Any], Option[Any])] = f match {
      case sources.EqualTo(a, v) if simple(a) && v != null =>
        Seq((a, Some(v), Some(v)))
      case sources.GreaterThan(a, v) if simple(a) && v != null =>
        Seq((a, Some(v), None))
      case sources.GreaterThanOrEqual(a, v) if simple(a) && v != null =>
        Seq((a, Some(v), None))
      case sources.LessThan(a, v) if simple(a) && v != null =>
        Seq((a, None, Some(v)))
      case sources.LessThanOrEqual(a, v) if simple(a) && v != null =>
        Seq((a, None, Some(v)))
      case sources.And(l, r) => walk(l) ++ walk(r)
      case _ => Seq.empty // OR/IN/nulls/...: no file bound, never wrong
    }
    filters.toSeq.flatMap(walk)
  }

  /** Per-column `(col, wantNull)` conjuncts from the pushed filters —
    * the `IS [NOT] NULL` file-skipping input (committed per-file null
    * counts). Only top-level/AND conjuncts translate; anything under
    * OR/NOT contributes nothing (sound). */
  def nullChecksOf(filters: Array[Filter]): Seq[(String, Boolean)] = {
    def simple(attr: String): Boolean = !attr.contains(".")
    def walk(f: Filter): Seq[(String, Boolean)] = f match {
      case sources.IsNull(a) if simple(a) => Seq((a, true))
      case sources.IsNotNull(a) if simple(a) => Seq((a, false))
      case sources.EqualNullSafe(a, null) if simple(a) => Seq((a, true))
      case sources.And(l, r) => walk(l) ++ walk(r)
      case _ => Seq.empty
    }
    filters.toSeq.flatMap(walk)
  }
}

/** The V1 fallback scan (the JDBC-connector pattern): Spark's own
  * planner wraps the relation in a RowDataSourceScanExec; rows come
  * from executing the pushed-down inner plan. `needConversion = false`
  * is the load-bearing line: the relation hands Spark the inner plan's
  * OWN `InternalRow` output (`queryExecution.toRdd`) instead of
  * round-tripping every row through external `Row` objects — the same
  * contract the built-in relations use, so rows surviving pushdown
  * cross the V1 boundary with zero per-row conversion (the
  * RowDataSourceScanExec above projects them into its unsafe output
  * as it would any scan). */
private[sql] class GraftV1Scan(df: DataFrame) extends V1Scan {
  override def readSchema(): StructType = df.schema
  override def description(): String = s"GraftLake${df.schema.catalogString}"
  override def toV1TableScan[T <: BaseRelation with TableScan](
      context: SQLContext): T =
    new BaseRelation with TableScan {
      override def sqlContext: SQLContext = context
      override def schema: StructType = df.schema
      override def needConversion: Boolean = false
      override def buildScan(): RDD[Row] =
        df.queryExecution.toRdd.asInstanceOf[RDD[Row]]
    }.asInstanceOf[T]
}
