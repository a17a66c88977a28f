package graft.lake

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Z-order layout: key correctness (Morton interleave) and the
  * file-skipping property — z-clustered files bound BOTH dimensions,
  * while single-column clustering leaves the other dimension's
  * per-file range near-global. */
class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  test("Morton key interleaves bits correctly") {
    val rows = Seq((0, 0), (1, 0), (0, 1), (1, 1), (3, 5), (65535, 65535))
      .toDF("a", "b")
      .select(ZOrder.zorderKey(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0))
    // interleave(3,5): a=011, b=101 -> bits: a0=1->b0, b0=1->b1, a1=1->b2,
    // b1=0, a2=0, b2=1->b5 = 1+2+4+32 = 39
    assert(rows.toSeq == Seq(0L, 1L, 2L, 3L, 39L, (1L << 32) - 1))
  }

  /** Per-file (min, max) spread of a column, averaged across files —
    * the proxy for how much a filter on that column can skip. */
  private def avgSpread(path: String, column: String): Double = {
    val files = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString)
    val spreads = files.flatMap { f =>
      val mm = spark.read.parquet(f).agg(min(col(column)), max(col(column))).collect()(0)
      if (mm.isNullAt(0)) None // empty range partition → empty file
      else Some((mm.getLong(1) - mm.getLong(0)).toDouble)
    }
    spreads.sum / spreads.length
  }

  test("z-ordered files bound both dimensions; single-sort bounds only one") {
    val li = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_suppkey"), col("l_orderkey"))
    val zPath = tmpDir("zorder")
    val sPath = tmpDir("singlesort")
    ZOrder.writeZOrdered(li, zPath, "l_partkey", "l_suppkey", nFiles = 8)
    li.repartitionByRange(8, col("l_partkey")).sortWithinPartitions(col("l_partkey"))
      .write.mode("overwrite").parquet(sPath)

    // data is preserved
    assert(spark.read.parquet(zPath).count() == li.count())

    val globalSupp = li.agg(max(col("l_suppkey")) - min(col("l_suppkey")))
      .collect()(0).getLong(0).toDouble
    // single-column sort: supplier spread per file ≈ global (no pruning power)
    val singleSupp = avgSpread(sPath, "l_suppkey")
    assert(singleSupp > globalSupp * 0.8, s"single=$singleSupp global=$globalSupp")
    // z-order: partkey spread per file must shrink vs global partkey spread
    val globalPart = li.agg(max(col("l_partkey")) - min(col("l_partkey")))
      .collect()(0).getLong(0).toDouble
    val zPart = avgSpread(zPath, "l_partkey")
    assert(zPart < globalPart * 0.8, s"z part spread $zPart vs global $globalPart")
  }

  test("N-dim key (round 12): zorderKeyN(2) ≡ the historical 2-dim " +
      "layout; 3-dim clustering shrinks per-file spread on ALL THREE " +
      "dimensions vs single-column sort") {
    // bit-layout compatibility: the 2-dim N-key must equal zorderKey
    val pairs = Seq((3, 5), (65535, 65535), (0, 1), (1234, 4321)).toDF("a", "b")
    val both = pairs.select(
      ZOrder.zorderKey(col("a"), col("b")).as("z2"),
      ZOrder.zorderKeyN(Seq(col("a"), col("b"))).as("zn")).collect()
    assert(both.forall(r => r.getLong(0) == r.getLong(1)))
    // 2..6 bounds refuse
    intercept[IllegalArgumentException](ZOrder.zorderKeyN(Seq(col("a"))))

    val li = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_suppkey"), col("l_orderkey"))
    val z3Path = tmpDir("zorder3")
    ZOrder.clusteredByN(li, Seq("l_partkey", "l_suppkey", "l_orderkey"), 8)
      .write.mode("overwrite").parquet(z3Path)
    assert(spark.read.parquet(z3Path).count() == li.count())
    Seq("l_partkey", "l_suppkey", "l_orderkey").foreach { c =>
      val global = li.agg(max(col(c)) - min(col(c))).collect()(0)
        .getLong(0).toDouble
      val spread = avgSpread(z3Path, c)
      assert(spread < global * 0.9,
        s"3-dim clustering must tighten $c: $spread vs $global")
    }
  }
}
