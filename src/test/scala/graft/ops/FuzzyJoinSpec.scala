package graft.ops

import graft.SparkTestBase

class FuzzyJoinSpec extends SparkTestBase {

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("fuzzyNamePairs finds EVERY distance<=2 pair a brute-force all-pairs scan finds") {
    val names = graft.Tables.part(spark, sfDir)
      .groupBy("p_name").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val keys = names.keys.toSeq.sorted
    val expected = (for {
      a <- keys; b <- keys if a < b
      d = lev(a, b) if d >= 1 && d <= 2
    } yield (a, b, d.toLong, names(a) + names(b)))
      .sortBy(t => (t._3, t._1, t._2))
    val got = SetAndScalar.fuzzyNamePairs(spark, sfDir).collect()
      .map(r => (r.getAs[String]("name_a"), r.getAs[String]("name_b"),
        r.getAs[Long]("edit_dist"), r.getAs[Long]("n_parts"))).toSeq
    assert(got == expected,
      s"banding must lose nothing vs brute force\ngot:      $got\nexpected: $expected")
    assert(got.nonEmpty, "fixture must contain fuzzy-matchable names")
  }
}
