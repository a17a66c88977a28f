package graft.streaming

import graft.SparkTestBase
import graft.ops.{Dedup, Text}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** The full streaming TRAINING-DATA INTAKE pipeline, composed from the
  * library's own stages inside one foreachBatch:
  *
  *   quality filter (decile ≥ threshold) → exact dedup vs everything
  *   already accepted (fingerprint anti-join) → near-dup check vs the
  *   accepted corpus band index → survivors appended to the corpus +
  *   both indices updated.
  *
  * This is the composition the north-star operators exist for; each
  * stage is the battle-tested operator (same expressions as the oracle
  * queries), and the loop never rescans the accepted corpus — each
  * batch pays O(batch) work plus equi joins into the two indices.
  *
  * Delivery note: the three appends inside one foreachBatch are
  * at-least-once on batch retry, exactly like
  * [[StreamIngest.processBatch]]'s catalog/distribution pair — a
  * production intake adds the same batch-id marker guard StreamIngest
  * ships (and the fp anti-join already makes a replayed batch a no-op
  * for the corpus, since its survivors' fingerprints are indexed).
  */
class StreamIntakeSpec extends SparkTestBase {
  import spark.implicits._

  test("quality-filter -> exact-dedup -> near-dedup intake accepts exactly the right docs") {
    implicit val sqlCtx = spark.sqlContext
    val root = tmpDir("intake")
    val corpusPath = s"$root/accepted"
    val fpPath = s"$root/fp_index"
    val bandPath = s"$root/band_index"

    // seed: one good accepted doc (stopword-rich, diverse)
    val good = (1 to 30).map(i => s"the tok$i of and").mkString(" ")
    val seed = Seq((1L, good)).toDF("doc_id", "text")
    seed.write.mode("overwrite").parquet(corpusPath)
    seed.select(col("doc_id"), md5(col("text")).as("fp")).write.mode("overwrite").parquet(fpPath)
    Dedup.bandIndexOf(seed).write.mode("overwrite").parquet(bandPath)

    val accepted = scala.collection.mutable.ArrayBuffer.empty[Long]
    val stages = scala.collection.mutable.ArrayBuffer.empty[String]
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          // 0. PII scrub BEFORE anything is hashed or indexed — the
          // fingerprint/band indices must never memorize raw PII, and
          // docs differing only in their PII become exact dups the
          // very next stage removes
          val scrubbed = batch.select(col("doc_id"),
            graft.ops.Pipeline.redactPii(col("text")).as("text"))
          // 1. quality gate — junk (low-diversity, stopword-free)
          // lands in deciles ≤ 3 on this scoring, so the bar is 4
          val quality = scrubbed.filter(Text.qualityDecile >= 4)
          // 2. exact dedup vs ACCEPTED fingerprints (anti join) AND
          // within the batch itself — two identical docs arriving in
          // one micro-batch both miss the index, so the intra-batch
          // dropDuplicates is load-bearing, not belt-and-braces
          val fps = s.read.parquet(fpPath)
          val novel = quality.withColumn("fp", md5(col("text")))
            .dropDuplicates("fp")
            .join(fps.select(col("fp")), Seq("fp"), "left_anti")
          // 3. near-dup gate vs the accepted band index
          val nearDups = Dedup.incrementalNearDups(s, s.read.parquet(bandPath),
            s.read.parquet(corpusPath), novel, 0.5)
            .select(col("new_doc").as("doc_id")).distinct()
          val survivors = novel.join(nearDups, Seq("doc_id"), "left_anti")
            .select(col("doc_id"), col("text")).persist()
          val ids = survivors.collect().map(_.getLong(0))
          // 4. accept: corpus + both indices grow
          survivors.write.mode("append").parquet(corpusPath)
          survivors.select(col("doc_id"), md5(col("text")).as("fp"))
            .write.mode("append").parquet(fpPath)
          Dedup.bandIndexOf(survivors).write.mode("append").parquet(bandPath)
          survivors.unpersist()
          accepted.synchronized {
            accepted ++= ids
            stages += s"batch$bid: in=${batch.count()} q=${quality.count()} accepted=${ids.mkString(",")}"
          }
          ()
        }
      }
      .start()

    val junk = "aaa aaa aaa aaa aaa aaa aaa aaa" // low diversity, no stopwords
    val exactCopy = good
    val nearCopy = good.split(" ").dropRight(3).mkString(" ")
    val freshDoc = (1 to 30).map(i => s"the zz$i of and is").mkString(" ")
    val twinDoc = (1 to 30).map(i => s"the ww$i of and is").mkString(" ")
    // 14/15: the SAME doc twice within one batch — only the
    // intra-batch dropDuplicates can catch this (neither fp is in the
    // accepted index yet)
    mem.addData((10L, junk), (11L, exactCopy), (12L, nearCopy), (13L, freshDoc),
      (14L, twinDoc), (15L, twinDoc))
    q.processAllAvailable()
    // second batch: an exact copy of the doc accepted in batch 1 must
    // now be rejected by the UPDATED fingerprint index
    mem.addData((20L, freshDoc), (21L, (1 to 30).map(i => s"the qq$i of and is").mkString(" ")))
    q.processAllAvailable()
    // third batch: two docs identical EXCEPT for their PII — the scrub
    // stage collapses them to the same placeholder text, so the
    // intra-batch exact dedup keeps exactly one, stored scrubbed
    val piiBase = (1 to 30).map(i => s"the yy$i of and is").mkString(" ")
    mem.addData((30L, piiBase + " mail alice@corp.example.com now"),
      (31L, piiBase + " mail bob.smith@other.example.org now"))
    q.processAllAvailable()
    q.stop()

    stages.synchronized(stages.foreach(l => info(l)))
    val got = accepted.synchronized(accepted.toSet)
    // exactly one of the intra-batch twins survives (which one is
    // dropDuplicates' arbitrary pick)
    assert(got.intersect(Set(14L, 15L)).size == 1, s"twin handling wrong: $got")
    assert(got.intersect(Set(30L, 31L)).size == 1, s"PII twin handling wrong: $got")
    assert(got -- Set(14L, 15L, 30L, 31L) == Set(13L, 21L),
      s"expected only the fresh docs accepted, got $got: $stages")
    // the accepted corpus = seed + two fresh docs + one twin + one scrubbed PII doc
    val corpus = spark.read.parquet(corpusPath)
    assert(corpus.count() == 5)
    // no raw PII ever reached the corpus; the placeholder did
    val stored = corpus.filter(col("doc_id").isin(30L, 31L))
      .select(col("text")).as[String].collect()
    assert(stored.length == 1 && stored.head.contains("<EMAIL>")
      && !stored.head.contains("@"), stored.mkString)
  }

  test("decontamination gate: batches reject docs overlapping the persisted eval-shingle index") {
    implicit val sqlCtx = spark.sqlContext
    val root = tmpDir("decontam")
    val evalShPath = s"$root/eval_shingles"
    // the "benchmark suite": one eval doc; its distinct-shingle set is
    // materialized ONCE — every micro-batch equi-joins into it (the
    // streaming form of q_decontaminate's train-vs-eval check)
    val evalDoc = (1 to 40).map(i => s"bench$i").mkString(" ")
    Dedup.shingleSetOf(Seq((999L, evalDoc)).toDF("doc_id", "text"))
      .select(col("sh")).distinct()
      .write.mode("overwrite").parquet(evalShPath)

    val rejected = scala.collection.mutable.ArrayBuffer.empty[Long]
    val passed = scala.collection.mutable.ArrayBuffer.empty[Long]
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          val contaminated = Dedup.contaminatedIds(
            batch, s.read.parquet(evalShPath), minShared = 3L)
          val bad = contaminated.collect().map(_.getLong(0))
          val ok = batch.join(contaminated.select(col("doc_id")), Seq("doc_id"), "left_anti")
            .select(col("doc_id")).collect().map(_.getLong(0))
          rejected.synchronized { rejected ++= bad; passed ++= ok }
          ()
        }
      }
      .start()

    // doc 30 lifts a 10-token window straight out of the eval doc
    // (8 shared shingles >= 3); doc 31 shares only ONE isolated eval
    // token (shingles all differ); doc 32 is clean
    val leaked = "intro " + (10 to 19).map(i => s"bench$i").mkString(" ") + " outro"
    val brushed = (1 to 20).map(i => s"tok$i").mkString(" ") + " bench5 " +
      (21 to 30).map(i => s"tok$i").mkString(" ")
    val clean = (1 to 25).map(i => s"clean$i").mkString(" ")
    mem.addData((30L, leaked), (31L, brushed), (32L, clean))
    q.processAllAvailable()
    q.stop()

    assert(rejected.synchronized(rejected.toSet) == Set(30L),
      s"only the lifted-window doc is contaminated: $rejected")
    assert(passed.synchronized(passed.toSet) == Set(31L, 32L),
      "a single brushed token must not reject a doc at minShared=3")
  }

  test("batch-trained DSIR model gates the stream identically to batch scoring") {
    implicit val sqlCtx = spark.sqlContext
    // TRAIN once, batch-side, on the full corpus; the model is the
    // buckets-row llr table — materialized to parquet like any other
    // shipped model artifact
    val corpus = graft.Tables.documents(spark, sfDir)
    val modelPath = tmpDir("dsir_model") + "/llr.parquet"
    graft.ops.Selection.dsirLlrTable(corpus, "src0").write.parquet(modelPath)

    // batch truth: every doc's weight under the model
    val batchW = graft.ops.Selection
      .dsirDocWeights(corpus, spark.read.parquet(modelPath))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // threshold at the overall mean so both sides of the gate are hit
    val thr = batchW.values.sum / batchW.size

    val streamed = corpus.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val kept = scala.collection.mutable.ArrayBuffer.empty[Long]
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          // APPLY per micro-batch: O(batch) explode + broadcast join
          // into the model — the same integers as the batch path
          val ids = graft.ops.Selection
            .dsirDocWeights(batch, s.read.parquet(modelPath))
            .filter(col("w_tmn") > thr)
            .collect().map(_.getLong(0))
          kept.synchronized { kept ++= ids }
          ()
        }
      }
      .start()
    // three micro-batches: the gate must not depend on batch framing
    streamed.grouped(math.max(1, streamed.length / 3)).foreach { g =>
      mem.addData(g.toSeq: _*); q.processAllAvailable()
    }
    q.stop()

    val expect = batchW.filter(_._2 > thr).keySet
    assert(kept.synchronized(kept.toSet) == expect,
      "stream gate must keep exactly the batch-scored set")
    assert(expect.nonEmpty && expect.size < batchW.size,
      "threshold must split the corpus for the test to mean anything")
  }
}
