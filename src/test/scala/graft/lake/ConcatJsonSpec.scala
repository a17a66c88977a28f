package graft.lake

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

class ConcatJsonSpec extends AnyFunSuite {

  /** Run a ScalaCheck property under ScalaTest (no scalatestplus
    * bridge in the offline cache). */
  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("splits back-to-back objects") {
    assert(ConcatJson.split("""{"a":1}{"a":2}""") == Seq("""{"a":1}""", """{"a":2}"""))
  }

  test("splits JSON-Lines identically") {
    assert(ConcatJson.split("{\"a\":1}\n{\"a\":2}\n") == Seq("""{"a":1}""", """{"a":2}"""))
  }

  test("handles the \"}{\" -in-string pathology the reference corrupts") {
    // reference's `}{` -> `},{` splice (event_recorder/lambda_function.py:42)
    // would cut this record in half; the state-machine splitter must not.
    val evil = """{"page":"}{","id":1}{"id":2}"""
    assert(ConcatJson.split(evil) == Seq("""{"page":"}{","id":1}""", """{"id":2}"""))
  }

  test("handles escaped quotes and nested structures") {
    val s = """{"a":"x\"}{\"y","b":{"c":[1,{"d":2}]}}{"e":[]}"""
    assert(ConcatJson.split(s) == Seq("""{"a":"x\"}{\"y","b":{"c":[1,{"d":2}]}}""", """{"e":[]}"""))
  }

  test("tolerates whitespace between records and empty input") {
    assert(ConcatJson.split("  {\"a\":1}  \n\t {\"b\":2} ") == Seq("""{"a":1}""", """{"b":2}"""))
    assert(ConcatJson.split("") == Seq.empty)
    assert(ConcatJson.split("   ") == Seq.empty)
  }

  // property: concat-then-split is identity for rendered JSON objects
  private val jsonString: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('"', '\\', '{', '}', '[', ']', ':', ',', ' ')))
      .map(_.mkString)
  private val record: Gen[String] = for {
    id <- Gen.choose(0, 1000000)
    s <- jsonString
  } yield s"""{"id":$id,"s":"${s.replace("\\", "\\\\").replace("\"", "\\\"")}"}"""

  test("property: split(concat(records)) == records") {
    check(Prop.forAll(Gen.listOf(record)) { records =>
      ConcatJson.split(records.mkString) == records
    })
  }

  test("property: split is robust to newline separation") {
    check(Prop.forAll(Gen.listOf(record)) { records =>
      ConcatJson.split(records.mkString("\n")) == records
    })
  }
}
