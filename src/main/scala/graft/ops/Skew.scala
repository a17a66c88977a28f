package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting (SURVEY.md §4.3) — the manual tool
  * for the hot-key joins AQE's skew handling can't fully rescue (e.g.
  * one key holding >10% of a 100 TB fact table).
  *
  * Shape: the skewed (big) side gets a deterministic salt in [0, n)
  * derived from a high-entropy payload column; the small side is
  * replicated n× with every salt value. The join key becomes
  * (key, salt), splitting each hot key's rows across n reducers.
  * Results are identical to the unsalted join (tested) — salting only
  * changes the partitioning.
  */
object Skew {

  /** Deterministic salt from an existing column (no rand(): results
    * stay reproducible and retry-stable — nondeterministic salts break
    * task retries at scale). */
  def saltColumn(entropy: Column, n: Int): Column =
    pmod(xxhash64(entropy), lit(n)).cast("int")

  /** Salted inner equi-join of a skewed `big` side with a `small`
    * side. `entropy` must be a big-side column with per-row variance
    * (an id, a timestamp). */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String, smallKey: String,
      entropy: String, n: Int): DataFrame = {
    val salted = big.withColumn("__salt", saltColumn(col(entropy), n))
    val replicated = small.withColumn("__salt",
      explode(array((0 until n).map(lit): _*)))
    salted.join(replicated,
        salted(bigKey) === replicated(smallKey) && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
