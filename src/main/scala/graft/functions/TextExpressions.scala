package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct overlapping character bigrams of a string, in first-
  * occurrence order — a native expression replacing the HOF
  * formulation
  * `array_distinct(transform(sequence(1, greatest(len-1, 1)), i -> substr(text, i, 2)))`
  * value-for-value (FunctionsSpec pins the equivalence, including the
  * degenerate empty/1-char/multibyte cases).
  *
  * Why native (same reasoning as [[CosineSimilarity]]): higher-order
  * functions are CodegenFallback with per-ELEMENT interpreted lambda
  * dispatch — profiled at 2.3 s of q_lang_id_ngram's 3.9 s at sf0.1
  * (~5M interpreted substr calls). This runs one tight JVM loop per
  * ROW (|docs| rows, not |chars| elements); it is itself
  * CodegenFallback, which costs a codegen boundary per document — three
  * orders of magnitude fewer crossings than per-element dispatch.
  *
  * Oracle parity: the DuckDB side keeps its
  * `list_distinct(list_transform(range(...), substr))` formulation —
  * both produce the same VALUES, which is all the hash compare sees.
  */
case class DistinctCharBigrams(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"distinct_char_bigrams requires STRING input, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String]
    val seen = new java.util.LinkedHashSet[UTF8String]()
    BigramWalk.foreach(s) { bg => seen.add(bg); () }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One-pass character-bigram enumeration over a UTF8String's BYTES.
  *
  * Yields exactly the elements of the HOF formulation
  * `sequence(1, greatest(numChars-1, 1)).map(i => substringSQL(i, 2))`
  * — including the degenerate cases (empty input → one "" element,
  * 1-char input → that char) — but in O(bytes) total: `substringSQL(i,
  * 2)` re-scans from byte 0 to locate the i-th char boundary, so a
  * per-position loop over it is O(chars²) per document. That quadratic
  * was invisible on 300-char test docs and cost 261 s on a 50k-doc
  * corpus of ~2 KiB docs (ScaleProbe, round 5) — the walk below took
  * the same probe to single-digit seconds with byte-identical output.
  */
private[functions] object BigramWalk {
  def foreach(s: UTF8String)(f: UTF8String => Unit): Unit = {
    val bytes = s.getBytes
    if (bytes.length == 0) { f(UTF8String.EMPTY_UTF8); return }
    var o = 0
    var l1 = UTF8String.numBytesForFirstByte(bytes(0))
    if (l1 >= bytes.length) { f(s); return } // single-char input
    while (o + l1 < bytes.length) {
      // clamp guards malformed UTF-8 claiming bytes past the end —
      // substringSQL clamps the same way
      val l2 = math.min(
        UTF8String.numBytesForFirstByte(bytes(o + l1)).toLong,
        (bytes.length - o - l1).toLong).toInt
      f(UTF8String.fromBytes(bytes, o, l1 + l2))
      o += l1
      l1 = l2
    }
  }
}

/** Best-matching bigram profile of a string: the index (into
  * `profiles`) of the profile sharing the most DISTINCT character
  * bigrams with the input, ties to the LOWEST index, or -1 when no
  * profile bigram occurs at all. Bigram enumeration is identical to
  * [[DistinctCharBigrams]] (pinned against the HOF formulation in
  * FunctionsSpec), and FunctionsSpec pins this expression against the
  * relational explode→join→count→rank-1 formulation, including
  * empty/1-char/multibyte/NULL inputs, equal-score ties, zero-hit -1,
  * and bigrams belonging to more than one profile.
  *
  * This is the scoring stage of n-gram language ID collapsed to one
  * map pass: the relational form (explode every doc's bigrams →
  * broadcast-join the profile table → count per (doc, lang) → rank-1
  * window) materializes |corpus bigrams| rows and shuffles twice to
  * compute what is per-row arithmetic over a model-sized lookup
  * table. The profile set rides along as a literal (it IS the model —
  * ≤ profiles×topK strings); per bigram the profile memberships are a
  * precomputed bitmask, so scoring costs one hash probe per distinct
  * bigram regardless of profile count (≤ 64 profiles).
  *
  * Oracle parity: the DuckDB side keeps the relational join+window
  * formulation — argmax with (score DESC, index ASC) tie-break over
  * counts of distinct-bigram hits is exactly row_number()=1 there,
  * and docs with zero hits drop out of the join on both sides (-1 is
  * filtered by the caller).
  */
case class BigramProfileBest(child: Expression, profiles: Seq[Seq[String]])
    extends UnaryExpression with CodegenFallback {
  require(profiles.length <= 64, "bitmask scoring supports at most 64 profiles")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bigram_profile_best requires STRING input, got ${t.sql}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  @transient private lazy val masks: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long]()
    profiles.zipWithIndex.foreach { case (bigrams, idx) =>
      bigrams.foreach { bg =>
        val k = UTF8String.fromString(bg)
        val prev = m.get(k)
        m.put(k, java.lang.Long.valueOf((if (prev == null) 0L else prev.longValue()) | (1L << idx)))
      }
    }
    m
  }

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String]
    val seen = new java.util.HashSet[UTF8String]()
    val counts = new Array[Int](profiles.length)
    BigramWalk.foreach(s) { bg =>
      if (seen.add(bg)) {
        val mask = masks.get(bg)
        if (mask != null) {
          var bits = mask.longValue()
          while (bits != 0L) {
            val idx = java.lang.Long.numberOfTrailingZeros(bits)
            counts(idx) += 1
            bits &= bits - 1
          }
        }
      }
    }
    var best = -1; var bestScore = 0; var j = 0
    while (j < counts.length) {
      if (counts(j) > bestScore) { best = j; bestScore = counts(j) }
      j += 1
    }
    best
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** BPE tokenization of a word by rank-greedy merge application — the
  * LARGE-VOCAB production path next to [[graft.ops.Bpe]]'s
  * replace-chain (which is oracle-expressible but whose expression
  * tree grows linearly with the rule count: every word pays one full
  * string-rewrite pass PER RULE, applicable or not — untenable at the
  * 50k merges a real tokenizer vocab carries).
  *
  * Algorithm (the one production tokenizers use): the merge table
  * becomes a pair→rank hash; per word, repeatedly find the
  * lowest-rank adjacent symbol pair and merge all its occurrences
  * left-to-right, until no pair is in the table. Cost is
  * O(applied · |word|) hash probes — independent of vocab size.
  *
  * Equivalence with sequential rule-order application (what
  * `Bpe.applyMerges` and the replace chain do) holds for any
  * TRAINING-ORDERED rule table: a merge at rank k only creates pairs
  * involving its output symbol, and any rule consuming that symbol
  * was necessarily trained after rank k — so no pair with rank < k
  * can ever (re)appear once k is the minimum, and the two orders
  * coincide. BpeSpec pins this against both reference forms,
  * including adjacent-merge and repeated-symbol words. The table is
  * ARBITRARY-rule-unsafe by contract (a hand-built table violating
  * the training invariant may diverge from sequential order).
  *
  * Per-ROW JVM loop + CodegenFallback, same trade as
  * [[DistinctCharBigrams]]: one codegen boundary per word vs a
  * 50k-deep codegen'd expression chain that would not even compile. */
case class BpeTokens(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_tokens requires STRING input, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  // pair→rank; key is a NUL-joined pair (symbols are substrings of
  // real words, which never contain NUL)
  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      m.putIfAbsent(a + "\u0000" + b, Integer.valueOf(i))
    }
    m
  }
  @transient private lazy val mergesArr: Array[(String, String)] = merges.toArray

  override def nullSafeEval(v: Any): Any = {
    val word = v.asInstanceOf[UTF8String].toString
    var syms = new scala.collection.mutable.ArrayBuffer[String](word.length)
    var ci = 0
    while (ci < word.length) {
      val cp = word.codePointAt(ci)
      val n = Character.charCount(cp)
      syms += word.substring(ci, ci + n)
      ci += n
    }
    var continue = syms.length > 1
    while (continue) {
      var best = Integer.MAX_VALUE
      var i = 0
      while (i + 1 < syms.length) {
        val r = ranks.get(syms(i) + "\u0000" + syms(i + 1))
        if (r != null && r.intValue() < best) best = r.intValue()
        i += 1
      }
      if (best == Integer.MAX_VALUE) continue = false
      else {
        val (a, b) = mergesArr(best)
        val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        var j = 0
        while (j < syms.length) {
          if (j + 1 < syms.length && syms(j) == a && syms(j + 1) == b) {
            out += (a + b); j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out
        if (syms.length < 2) continue = false
      }
    }
    new GenericArrayData(syms.map(UTF8String.fromString _).toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Unigram-LM (SentencePiece-style) Viterbi segmentation over a fixed
  * piece table of scaled-integer log-probs — the apply half of
  * [[graft.ops.Unigram]]. One tight JVM loop per word (dp over char
  * positions, piece lookup via hash map, ties to the longest piece);
  * integer scores keep the argmax bit-identical to the plain-Scala
  * replay ([[graft.ops.Unigram.viterbi]], spec-pinned) and to the
  * recursive-CTE oracle. Per-row JVM + CodegenFallback — the
  * [[BpeTokens]] trade: one codegen boundary per word instead of a
  * vocab-sized expression tree. */
case class UnigramPieces(child: Expression, pieces: Seq[(String, Long)])
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "unigram_pieces"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"unigram_pieces requires STRING input, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val lp: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](pieces.length * 2)
    pieces.foreach { case (p, v) => m.putIfAbsent(p, java.lang.Long.valueOf(v)) }
    m
  }
  @transient private lazy val maxLen: Int =
    pieces.iterator.map(_._1.length).foldLeft(1)(math.max)

  override def nullSafeEval(v: Any): Any = {
    val word = v.asInstanceOf[UTF8String].toString
    val n = word.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val dp = new Array[Long](n + 1)
    val back = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      var best = Long.MinValue
      var bestL = 0
      var l = math.min(maxLen, i)
      while (l >= 1) { // descending + strict >: ties keep the longest
        val p = lp.get(word.substring(i - l, i))
        if (p != null) {
          val cand = dp(i - l) + p.longValue()
          if (cand > best) { best = cand; bestL = l }
        }
        l -= 1
      }
      if (bestL == 0) return null // unsegmentable (char outside the vocab)
      dp(i) = best; back(i) = bestL
      i += 1
    }
    var out = List.empty[Any]
    var j = n
    while (j > 0) {
      out = UTF8String.fromString(word.substring(j - back(j), j)) :: out
      j -= back(j)
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextFunctions {
  /** Column-API entry point. */
  def distinct_char_bigrams(c: Column): Column =
    Bridge.column(DistinctCharBigrams(Bridge.expression(c)))

  /** Column-API entry point for [[UnigramPieces]]. */
  def unigram_pieces(c: Column, pieces: Seq[(String, Long)]): Column =
    Bridge.column(UnigramPieces(Bridge.expression(c), pieces))

  /** Column-API entry point for [[BigramProfileBest]]. */
  def bigram_profile_best(c: Column, profiles: Seq[Seq[String]]): Column =
    Bridge.column(BigramProfileBest(Bridge.expression(c), profiles))

  /** Column-API entry point for [[BpeTokens]]. */
  def bpe_tokens(c: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(BpeTokens(Bridge.expression(c), merges))
}
