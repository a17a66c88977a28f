package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** BPE trainer + merge-rule application: the trainer follows the
  * classic most-frequent-pair algorithm with deterministic
  * tie-breaks, and the SQL-expressible replace-chain application is
  * byte-identical to the JVM reference implementation. */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  test("trainer learns the obvious merges from a tiny corpus") {
    // "aaab"×10, "aab"×5: pair (a,a) dominates, then (aa,a) in doc 1
    val merges = Bpe.train(Seq("aaab" -> 10L, "aab" -> 5L), 3)
    assert(merges.head == ("a", "a"))
    // after (a,a): "aaab" -> [aa, a, b] (left-to-right non-overlap),
    // "aab" -> [aa, b]; counts: (aa,a)=10, (a,b)=10, (aa,b)=5 →
    // tie 10/10 breaks lexicographically: ("a","b") < ("aa","a")
    assert(merges(1) == ("a", "b"))
  }

  test("trainer is deterministic and stops when no pair repeats") {
    val corpus = Seq("xy" -> 1L, "zw" -> 1L)
    assert(Bpe.train(corpus, 10).isEmpty) // every pair occurs once
    val m1 = Bpe.train(Bpe.seedCorpus, 32)
    val m2 = Bpe.train(Bpe.seedCorpus, 32)
    assert(m1 == m2 && m1 == Bpe.merges && m1.length == 32)
  }

  test("column replace-chain application == JVM reference, incl. adjacent merges") {
    // the double-delimiter encoding must merge ADJACENT pairs in one
    // replace pass ("abab" with merge (a,b) -> [ab, ab], not [ab,a,b])
    val words = Seq("the", "that", "weather", "information", "abab", "aaaa",
      "x", "thethe", "station", "zzz") ++ Bpe.seedCorpus.map(_._1)
    val viaCol = words.toDF("word")
      .select(col("word"), Bpe.tokenCountCol(col("word")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    words.foreach { w =>
      val ref = Bpe.applyMerges(w, Bpe.merges).length
      assert(viaCol(w) == ref.toLong, s"'$w': col=${viaCol(w)} ref=$ref")
    }
    // and the vocab actually compresses: common words collapse
    assert(Bpe.applyMerges("the", Bpe.merges) == Vector("the"))
    assert(Bpe.applyMerges("thethe", Bpe.merges) == Vector("the", "the"))
  }

  test("ScalaCheck: replace-chain == JVM reference on random words") {
    import org.scalacheck.Gen
    val word = Gen.chooseNum(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    // fixed seed: same 40 random-ish words every run
    val words = Gen.listOfN(40, word)
      .apply(Gen.Parameters.default, org.scalacheck.rng.Seed(42L)).get.distinct
    val viaCol = words.toDF("word")
      .select(col("word"), Bpe.tokenCountCol(col("word")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    words.foreach { w =>
      assert(viaCol(w) == Bpe.applyMerges(w, Bpe.merges).length.toLong, s"'$w'")
    }
  }

  test("bpe token counts: one row per lang, tokens <= chars, positive") {
    val rows = Bpe.bpeTokens(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nWords, nTok) = (r.getLong(1), r.getLong(2))
      assert(nTok >= nWords, "every word is at least one token")
      assert(r.getDouble(3) >= 1.0, "a token is at least one char")
    }
  }
}
