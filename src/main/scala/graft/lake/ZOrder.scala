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

  /** Morton-interleave the low 16 bits of two non-negative int
    * columns: bit i of `a` → bit 2i, bit i of `b` → bit 2i+1. */
  def zorderKey(a: Column, b: Column): Column = {
    val la = a.cast("long")
    val lb = b.cast("long")
    (0 until bitsPerDim).map { i =>
      shiftleft(shiftright(la, i).bitwiseAND(1), 2 * i)
        .bitwiseOR(shiftleft(shiftright(lb, i).bitwiseAND(1), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Rewrite a table into `nFiles` files clustered by the z-key of the
    * two dimensions (range partition on the key, sort within files). */
  def writeZOrdered(df: DataFrame, path: String, dimA: String, dimB: String,
      nFiles: Int): Unit =
    df.withColumn("__z", zorderKey(col(dimA), col(dimB)))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
