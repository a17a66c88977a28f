package graft.lake

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) layout key: interleaves the low bits of two
  * integer dimensions so that range-sorting by the key co-locates rows
  * that are close in BOTH dimensions — the multi-dimension
  * file-skipping layout (each file's parquet min/max stats then bound
  * both columns, so predicates on either dimension prune files;
  * single-column sort only prunes its own column).
  *
  * The key is a pure codegen'd column expression (16 bits per
  * dimension interleaved into a 32-bit key) — usable in
  * `repartitionByRange(zorderKey(...)).sortWithinPartitions(...)`
  * writes at any scale.
  */
object ZOrder {

  val bitsPerDim = 16

  /** Morton-interleave the LOW 16 BITS of two non-negative int
    * columns: bit i of `a` → bit 2i, bit i of `b` → bit 2i+1.
    * CONTRACT: inputs must fit 16 bits — higher bits are discarded and
    * values 2¹⁶ apart would alias. [[writeZOrdered]] normalizes
    * arbitrary ranges into the key domain before calling this. */
  def zorderKey(a: Column, b: Column): Column = {
    val la = a.cast("long")
    val lb = b.cast("long")
    (0 until bitsPerDim).map { i =>
      shiftleft(shiftright(la, i).bitwiseAND(1), 2 * i)
        .bitwiseOR(shiftleft(shiftright(lb, i).bitwiseAND(1), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Rewrite a table into `nFiles` files clustered by the z-key of the
    * two dimensions (range partition on the key, sort within files).
    * Each dimension is min/max-scaled into the 16-bit key domain first
    * (two cheap scalar aggs), so arbitrary value ranges never alias —
    * the same normalize-then-interleave approach production layout
    * optimizers use, robust at any scale. */
  def writeZOrdered(df: DataFrame, path: String, dimA: String, dimB: String,
      nFiles: Int): Unit =
    clusteredBy(df, dimA, dimB, nFiles).write.mode("overwrite").parquet(path)

  /** The clustering itself, without the write: `df` range-partitioned
    * into `nFiles` partitions by the normalized z-key and sorted within
    * them — for callers that route the output through their own commit
    * protocol ([[Catalog.optimizeLake]]). */
  def clusteredBy(df: DataFrame, dimA: String, dimB: String,
      nFiles: Int): DataFrame = {
    val maxKey = (1 << bitsPerDim) - 1
    val r = df.agg(
      min(col(dimA)).cast("double"), max(col(dimA)).cast("double"),
      min(col(dimB)).cast("double"), max(col(dimB)).cast("double")).collect()(0)
    // an empty table or an all-NULL dimension yields NULL aggregates —
    // getDouble would NPE; such a dimension carries no clustering
    // signal, so it degrades to the constant-0 key axis
    def stat(i: Int): Double = if (r.isNullAt(i)) 0.0 else r.getDouble(i)
    val (aMin, aMax, bMin, bMax) = (stat(0), stat(1), stat(2), stat(3))
    def scaled(c: Column, lo: Double, hi: Double): Column =
      // NULL dim values land at the low edge of the key domain (a NULL
      // would otherwise null the whole interleaved key and make row
      // order nondeterministic under range partition)
      if (hi > lo) floor((coalesce(c.cast("double"), lit(lo)) - lo) * maxKey / (hi - lo)).cast("long")
      else lit(0L)
    df.withColumn("__z", zorderKey(scaled(col(dimA), aMin, aMax), scaled(col(dimB), bMin, bMax)))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
