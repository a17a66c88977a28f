package graft.lake

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) layout key: interleaves the low bits of N
  * integer dimensions so that range-sorting by the key co-locates rows
  * that are close in EVERY dimension — the multi-dimension
  * file-skipping layout (each file's parquet min/max stats then bound
  * all columns, so predicates on any dimension prune files;
  * single-column sort only prunes its own column).
  *
  * The key is a pure codegen'd column expression — usable in
  * `repartitionByRange(zorderKeyN(...)).sortWithinPartitions(...)`
  * writes at any scale. Bit budget: 16 bits per dimension up to 3
  * dims, then `48 / n` (the 63-bit signed-long headroom split evenly —
  * fewer bits per dim = coarser cells, the standard N-dim trade; Delta
  * caps its ZORDER columns for the same reason). 2–6 dims supported. */
object ZOrder {

  val bitsPerDim = 16

  /** Bits per dimension for an `n`-dim key: 16 while it fits the
    * 63-bit signed-long headroom, else the even split. */
  def bitsFor(n: Int): Int = math.min(bitsPerDim, 48 / n)

  /** Morton-interleave the LOW `bitsFor(n)` BITS of `n` non-negative
    * int columns: bit i of dim j → bit n·i + j (dim 0 owns the least
    * significant lane, matching the historical 2-dim layout).
    * CONTRACT: inputs must fit the per-dim bit budget — higher bits
    * are discarded and values 2^bits apart would alias.
    * [[clusteredByN]] normalizes arbitrary ranges into the key domain
    * before calling this. */
  def zorderKeyN(dims: Seq[Column]): Column = {
    val n = dims.length
    require(n >= 2 && n <= 6, s"zorder wants 2..6 dimensions, got $n")
    val bits = bitsFor(n)
    val longs = dims.map(_.cast("long"))
    (for (i <- 0 until bits; j <- 0 until n) yield
      shiftleft(shiftright(longs(j), i).bitwiseAND(1), n * i + j))
      .reduce(_ bitwiseOR _)
  }

  /** The historical two-dimension key — identical bit layout to
    * `zorderKeyN(Seq(a, b))`. */
  def zorderKey(a: Column, b: Column): Column = zorderKeyN(Seq(a, b))

  /** Rewrite a table into `nFiles` files clustered by the z-key of the
    * two dimensions (range partition on the key, sort within files). */
  def writeZOrdered(df: DataFrame, path: String, dimA: String, dimB: String,
      nFiles: Int): Unit =
    clusteredBy(df, dimA, dimB, nFiles).write.mode("overwrite").parquet(path)

  /** Two-dimension clustering (the historical API) — delegates to the
    * N-dimension form. */
  def clusteredBy(df: DataFrame, dimA: String, dimB: String,
      nFiles: Int): DataFrame = clusteredByN(df, Seq(dimA, dimB), nFiles)

  /** The clustering itself, without the write: `df` range-partitioned
    * into `nFiles` partitions by the normalized z-key and sorted within
    * them — for callers that route the output through their own commit
    * protocol ([[Catalog.optimizeLake]]). Each dimension is
    * min/max-scaled into the per-dim key domain first (one cheap
    * scalar agg row), so arbitrary value ranges never alias — the
    * normalize-then-interleave approach production layout optimizers
    * use, robust at any scale. */
  def clusteredByN(df: DataFrame, dims: Seq[String],
      nFiles: Int): DataFrame = {
    val n = dims.length
    require(n >= 1 && n <= 6, s"zorder wants 1..6 dimensions, got $n")
    // one dimension: Z-order IS a linear sort there (no interleave) —
    // range-partition + sort on the column itself, the exact Delta
    // degradation for a single ZORDER BY column
    if (n == 1) return df
      .repartitionByRange(nFiles, col(dims.head))
      .sortWithinPartitions(col(dims.head))
    val maxKey = (1 << bitsFor(n)) - 1
    val aggs = dims.flatMap(d =>
      Seq(min(col(d)).cast("double"), max(col(d)).cast("double")))
    val r = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    // an empty table or an all-NULL dimension yields NULL aggregates —
    // getDouble would NPE; such a dimension carries no clustering
    // signal, so it degrades to the constant-0 key axis
    def stat(i: Int): Double = if (r.isNullAt(i)) 0.0 else r.getDouble(i)
    def scaled(c: Column, lo: Double, hi: Double): Column =
      // NULL dim values land at the low edge of the key domain (a NULL
      // would otherwise null the whole interleaved key and make row
      // order nondeterministic under range partition)
      if (hi > lo) floor((coalesce(c.cast("double"), lit(lo)) - lo) * maxKey / (hi - lo)).cast("long")
      else lit(0L)
    val key = zorderKeyN(dims.zipWithIndex.map { case (d, j) =>
      scaled(col(d), stat(2 * j), stat(2 * j + 1)) })
    df.withColumn("__z", key)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
