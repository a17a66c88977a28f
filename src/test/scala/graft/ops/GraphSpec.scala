package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class GraphSpec extends SparkTestBase {

  test("nearDupPagerank matches an exact JVM fixed-point replay") {
    val pairs = Dedup.lshNearDupPairs(spark, sfDir)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    val edges = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    var r = deg.keys.map(_ -> 1000000L).toMap
    (1 to 2).foreach { _ =>
      val in = edges.groupBy(_._2).view.mapValues { es =>
        es.map { case (src, _) => r(src) / deg(src) }.sum
      }.toMap
      r = r.keys.map(id => id -> (150000L + (850000L * in.getOrElse(id, 0L)) / 1000000L)).toMap
    }
    val expectedTop = r.toSeq.sortBy { case (id, rk) => (-rk, id) }.take(20)
    val got = Graph.nearDupPagerank(spark, sfDir).collect()
      .map(row => (row.getAs[Long]("doc_id"), row.getAs[Long]("rank_e6")))
    assert(got.toSeq == expectedTop, s"\ngot:      ${got.toSeq}\nexpected: $expectedTop")
  }

  test("nearDupBfs matches a JVM breadth-first replay") {
    val pairs = Dedup.lshNearDupPairs(spark, sfDir)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    val adj = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val seed = adj.keys.min
    var dist = Map(seed -> 0L)
    var frontier = Set(seed)
    (1 to 3).foreach { h =>
      frontier = frontier.flatMap(adj(_)).filterNot(dist.contains)
      dist ++= frontier.map(_ -> h.toLong)
    }
    val expected = dist.toSeq.sortBy { case (id, hop) => (hop, id) }
    val got = Graph.nearDupBfs(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("hop"))).toSeq
    assert(got == expected, s"\ngot:      $got\nexpected: $expected")
  }

  test("nearDupBfs hop-0 row is the lowest doc_id with any edge") {
    val got = Graph.nearDupBfs(spark, sfDir).collect()
    val seeds = got.filter(_.getAs[Long]("hop") == 0L).map(_.getAs[Long]("doc_id"))
    val minEdge = Dedup.lshNearDupPairs(spark, sfDir)
      .select(col("doc_a"), col("doc_b")).collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).min
    assert(seeds.toSeq == Seq(minEdge))
  }

  test("nearDupBfs driver-guard path equals the forced distributed path") {
    val guarded = Graph.nearDupBfs(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val distributed = Graph.nearDupBfsDistributed(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(guarded == distributed)
  }

  test("nearDupPagerank degrees are the symmetrized pair counts") {
    val got = Graph.nearDupPagerank(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("degree")).toMap
    val pairs = Dedup.lshNearDupPairs(spark, sfDir)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val deg = pairs.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    got.foreach { case (id, d) => assert(d == deg(id), s"doc $id") }
  }
}
