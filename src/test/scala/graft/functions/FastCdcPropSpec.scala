package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck properties of the FastCDC reference fold — the one
  * definition the native expression, the HOF twin, and the oracle CTE
  * all reproduce (their mutual equality is pinned in Round7OpsSpec;
  * these pin the fold itself on arbitrary byte strings). */
class FastCdcPropSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val byteStr: Gen[Array[Byte]] =
    Gen.choose(0, 2000).flatMap(n =>
      Gen.containerOfN[Array, Byte](n, Gen.choose(Byte.MinValue, Byte.MaxValue)))

  test("property: chunking is total, byte-conserving, and bounded") {
    check(Prop.forAll(byteStr) { bs =>
      val chunks = FastCdc.chunkBytes(bs)
      val conserving = chunks.map(_._1).sum == bs.length.toLong
      val bounded = chunks.forall { case (len, fp) =>
        len >= 1L && len <= FastCdc.maxLen && fp >= 0L && fp < 2147483647L
      }
      val deterministic = FastCdc.chunkBytes(bs).toSeq == chunks.toSeq
      conserving && bounded && deterministic
    })
  }

  test("property: appending bytes never disturbs already-cut chunks " +
      "(left-fold causality — only the unterminated tail can change)") {
    check(Prop.forAll(byteStr, byteStr) { (a, b) =>
      val ca = FastCdc.chunkBytes(a)
      val cab = FastCdc.chunkBytes(a ++ b)
      // every chunk of `a` except its flushed tail was cut by the hash
      // rule on bytes of `a` alone, so it must reappear verbatim
      ca.isEmpty || cab.take(ca.length - 1).toSeq == ca.init.toSeq
    })
  }

  test("property: identical content chunks identically wherever it appears " +
      "after re-synchronization (shared suffix => shared tail chunks)") {
    // two streams with different prefixes but a long shared suffix end
    // in the same chunk sequence once the cut points re-synchronize
    val gen = for {
      p1 <- Gen.containerOfN[Array, Byte](64, Gen.choose(Byte.MinValue, Byte.MaxValue))
      p2 <- Gen.containerOfN[Array, Byte](91, Gen.choose(Byte.MinValue, Byte.MaxValue))
      shared <- Gen.containerOfN[Array, Byte](2048, Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield (p1, p2, shared)
    check(Prop.forAll(gen) { case (p1, p2, shared) =>
      val c1 = FastCdc.chunkBytes(p1 ++ shared)
      val c2 = FastCdc.chunkBytes(p2 ++ shared)
      var k = 0
      while (k < math.min(c1.length, c2.length) &&
        c1(c1.length - 1 - k) == c2(c2.length - 1 - k)) k += 1
      // with a 2 KiB shared suffix and <=256-byte chunks, at least a
      // few trailing chunks must have re-synchronized
      k >= 3
    })
  }
}
