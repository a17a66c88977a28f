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

  test("native rank-greedy BpeTokens == JVM reference == replace chain") {
    import graft.functions.TextFunctions
    val words = Seq("the", "that", "weather", "information", "abab", "aaaa",
      "x", "thethe", "station", "zzz", "anotherinformation") ++ Bpe.seedCorpus.map(_._1)
    val rows = words.toDF("word")
      .select(col("word"),
        TextFunctions.bpe_tokens(col("word"), Bpe.merges).as("toks"),
        Bpe.tokenCountCol(col("word")).as("n_chain"))
      .collect()
    rows.foreach { r =>
      val w = r.getString(0)
      val ref = Bpe.applyMerges(w, Bpe.merges)
      assert(r.getSeq[String](1) == ref, s"'$w': native=${r.getSeq[String](1)} ref=$ref")
      assert(r.getLong(2) == ref.length.toLong, s"'$w' chain count")
    }
    // NULL propagates
    val nr = Seq[Option[String]](None).toDF("word")
      .select(TextFunctions.bpe_tokens(col("word"), Bpe.merges)).collect()(0)
    assert(nr.isNullAt(0))
    // empty word -> empty token list (replace chain can't express this
    // row -- its count formula yields -1 -- but [a-z]+ extraction never
    // feeds it an empty word; the native path handles it cleanly)
    val er = Seq("").toDF("word")
      .select(TextFunctions.bpe_tokens(col("word"), Bpe.merges)).collect()(0)
    assert(er.getSeq[String](0).isEmpty)
  }

  test("native BpeTokens on a large (10k-rule) vocab stays correct and vocab-size-independent") {
    // a big TRAINED vocab is unreachable from the tiny seed corpus, so
    // extend the real table with synthetic training-ordered rules over
    // symbols that cannot occur in [a-z]+ words (digits): they satisfy
    // the training invariant trivially (never applicable) and exercise
    // exactly what a 50k vocab costs the apply path -- rank-map size.
    val padded = Bpe.merges ++ (0 until 10000).map(i => (s"${i}#", s"#${i}"))
    val words = Seq("the", "weather", "information", "abab", "thethe", "zzz")
    val rows = words.toDF("word")
      .select(col("word"),
        graft.functions.TextFunctions.bpe_tokens(col("word"), padded).as("toks"))
      .collect()
    rows.foreach { r =>
      val w = r.getString(0)
      // padding rules never fire: same result as the 32-rule table
      assert(r.getSeq[String](1) == Bpe.applyMerges(w, Bpe.merges), s"'$w'")
    }
  }

  test("ScalaCheck: native rank-greedy == sequential fold on random words and vocabs") {
    import org.scalacheck.Gen
    // re-train a DIFFERENT vocab from a random corpus, then compare
    // orders on random words: exercises the training-invariant
    // equivalence argument, not just the pinned 32-rule table
    val word = Gen.chooseNum(1, 14).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString))
    val seed = org.scalacheck.rng.Seed(7L)
    val corpusWords = Gen.listOfN(30, word).apply(Gen.Parameters.default, seed).get
    val vocab = Bpe.train(corpusWords.map(_ -> 3L), 24)
    val testWords = Gen.listOfN(60, word)
      .apply(Gen.Parameters.default, org.scalacheck.rng.Seed(8L)).get.distinct
    val rows = testWords.toDF("word")
      .select(col("word"),
        graft.functions.TextFunctions.bpe_tokens(col("word"), vocab).as("toks"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    testWords.foreach { w =>
      assert(rows(w) == Bpe.applyMerges(w, vocab), s"'$w' vocab=$vocab")
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
