package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The north-star analogue of `lake/EndToEndLoopSpec`: one test that
  * chains the WHOLE curation pipeline — funnel verdicts → materialized
  * keep set → derived corpus on disk → train/val/test split → budget
  * allocation → exact sample → sequence packing → epoch shards — and
  * asserts the cross-stage accounting identities that no single
  * query's oracle can see (the report counts THE SAME set that ships,
  * every stage conserves it, and the final artifacts partition it).
  */
class EndToEndCurationSpec extends SparkTestBase {

  test("funnel -> keep set -> split/alloc/sample/pack/shards, accounting conserved") {
    // ---- stage 1: verdicts + materialized survivors -----------------
    val funnel = Pipeline.curationFunnel(spark, sfDir).collect()
    val survivors = funnel.maxBy(_.getAs[Int]("stage_no"))
    val kept = Pipeline.curationKeepSet(spark, sfDir)
    val keptN = kept.count()
    val keptToks = kept.agg(sum(size(split(col("text"), " ")).cast("long")))
      .head().getLong(0)
    // the report's last stage counts exactly the set that ships
    assert(survivors.getAs[Long]("n_docs") == keptN)
    assert(survivors.getAs[Long]("n_tokens") == keptToks)
    assert(keptN > 0, "the funnel must keep something on the driver corpus")

    // ---- stage 2: the keep set becomes a corpus of its own ----------
    val derived = tmpDir("curated")
    kept.write.mode("overwrite").parquet(s"$derived/documents.parquet")

    // ---- stage 3: split partitions the derived corpus exactly -------
    val splits = Pipeline.dataSplit(spark, derived).collect()
    assert(splits.map(_.getAs[Long]("n_docs")).sum == keptN)
    assert(splits.map(_.getAs[Long]("sum_tokens")).sum == keptToks)

    // ---- stage 4: allocation plan + exact-sample execution ----------
    val budget = math.min(100L, keptN)
    val alloc = Selection.proportionalAlloc(spark, derived, budget).collect()
    assert(alloc.map(_.getAs[Long]("quota")).sum == budget)
    val sampled = Selection.exactSample(spark, derived, budget).collect()
    val perSrcDocs = kept.groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val quotas = alloc.map(r => r.getAs[String]("source") -> r.getAs[Long]("quota")).toMap
    sampled.foreach { r =>
      val src = r.getAs[String]("source")
      assert(r.getAs[Long]("kept_docs") == math.min(quotas(src), perSrcDocs(src)))
    }

    // ---- stage 5: packing lays out every surviving token ------------
    val packs = Pipeline.seqPackSplit(spark, derived).collect()
    assert(packs.map(_.getAs[Long]("pack_tokens")).sum == keptToks)

    // ---- stage 6: epoch shards permute the derived corpus -----------
    val shards = Pipeline.epochShuffle(spark, derived).collect()
    assert(shards.map(_.getAs[Long]("n_docs")).sum == keptN)
    assert(shards.map(_.getAs[Long]("sum_tokens")).sum == keptToks)
  }
}
