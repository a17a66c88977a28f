package graft.ops

import graft.SparkTestBase
import java.security.MessageDigest

class SketchSpec extends SparkTestBase {

  /** First 32 md5 bits of "i:key" mod width — the JVM reference for the
    * engine-portable CMS hash (same arithmetic as MinHashScheme.hash32,
    * over the row-salted key string). */
  private def bucket(i: Int, key: Long): Long = {
    val d = MessageDigest.getInstance("MD5").digest(s"$i:$key".getBytes("UTF-8"))
    val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    h % Sketch.Width
  }

  test("cmsHeavyHitters matches an exact JVM sketch replay") {
    val keys = graft.Tables.lineitem(spark, sfDir)
      .select("l_partkey").collect().map(_.getLong(0))
    // build the d×w sketch and the exact counts the same way the query does
    val cells = keys.flatMap(k => (0 until Sketch.Depth).map(i => (i, bucket(i, k))))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val exact = keys.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expected = exact.toSeq.sortBy { case (k, n) => (-n, k) }.take(10)
      .map { case (k, n) =>
        val est = (0 until Sketch.Depth).map(i => cells((i, bucket(i, k)))).min
        (k, n, est, est - n)
      }
    val got = Sketch.cmsHeavyHitters(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("l_partkey"), r.getAs[Long]("exact"),
        r.getAs[Long]("est"), r.getAs[Long]("overcount"))).toSeq
    assert(got == expected, s"\ngot:      $got\nexpected: $expected")
  }

  test("count-min never undercounts: est >= exact on every probed key") {
    Sketch.cmsHeavyHitters(spark, sfDir).collect().foreach { r =>
      assert(r.getAs[Long]("est") >= r.getAs[Long]("exact"),
        s"key ${r.getAs[Long]("l_partkey")} undercounted")
      assert(r.getAs[Long]("overcount") == r.getAs[Long]("est") - r.getAs[Long]("exact"))
    }
  }

  private def bloomPos(i: Int, key: Long): Long = {
    val d = MessageDigest.getInstance("MD5").digest(s"$i:$key".getBytes("UTF-8"))
    val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    h % Sketch.BloomBits
  }

  test("bloomSemiJoin matches a JVM bloom replay; members NEVER fail the filter") {
    import org.apache.spark.sql.functions._
    val hot = graft.Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1995-03-01") && col("l_shipdate") < lit("1995-04-01"))
      .select("l_orderkey").collect().map(_.getLong(0)).toSet
    val bits = hot.flatMap(k => (0 until Sketch.BloomK).map(i => bloomPos(i, k)))
    val orders = graft.Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_orderpriority").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = orders.groupBy(_._2).view.mapValues { os =>
      val pass = os.count { case (k, _) =>
        (0 until Sketch.BloomK).forall(i => bits.contains(bloomPos(i, k)))
      }
      val members = os.count(o => hot.contains(o._1))
      val fp = os.count { case (k, _) =>
        !hot.contains(k) &&
          (0 until Sketch.BloomK).forall(i => bits.contains(bloomPos(i, k)))
      }
      (os.length.toLong, pass.toLong, members.toLong, fp.toLong)
    }.toMap
    val got = Sketch.bloomSemiJoin(spark, sfDir).collect()
      .map(r => r.getAs[String]("o_orderpriority") ->
        (r.getAs[Long]("n_orders"), r.getAs[Long]("pass_bloom"),
          r.getAs[Long]("members"), r.getAs[Long]("false_pos"))).toMap
    assert(got == expected, s"\ngot:      $got\nexpected: $expected")
    // the defining bloom guarantee: pass ⊇ members (zero false negatives)
    got.values.foreach { case (_, pass, members, fp) =>
      assert(pass == members + fp && pass >= members)
    }
  }

  test("minhashAccuracy estimates true jaccard within MinHash theory bounds") {
    val rows = Sketch.minhashAccuracy(spark, sfDir).collect()
    // audits exactly the confirmed pair table, nothing else
    assert(rows.length == Dedup.lshNearDupPairs(spark, sfDir).count())
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val m = r.getAs[Long]("matches")
      assert(m >= 0 && m <= 64)
      assert(r.getAs[Long]("est_ppm") == m * 1000000L / 64)
      // pairs enter the table at J >= 0.5: a k=64 estimate more than
      // ~5 sigma out (sigma <= 0.0625) means broken hashing, not noise
      assert(r.getAs[Long]("abs_err_ppm") <= 320000L,
        s"estimator off by ${r.getAs[Long]("abs_err_ppm")} ppm on " +
          s"(${r.getAs[Long]("doc_a")}, ${r.getAs[Long]("doc_b")})")
    }
    // and in aggregate the estimator is unbiased-ish: mean abs error
    // well under one sigma
    val meanErr = rows.map(_.getAs[Long]("abs_err_ppm")).sum / rows.length
    assert(meanErr <= 60000L, s"mean abs err $meanErr ppm")
  }

  test("kmvSetOps matches an exact JVM k-min-sketch replay on every pair") {
    val k = Sketch.KmvK
    val rows = Sketch.kmvSetOps(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(u: Long): Long = {
      val hex = md.digest(u.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16)
    }
    val tu = graft.Tables.events(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.col("user_id"))
      .distinct().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val byType = tu.groupBy(_._1).view.mapValues(_.map(p => h(p._2)).toSet).toMap
    rows.foreach { r =>
      val (ta, tb) = (r.getAs[String]("ta"), r.getAs[String]("tb"))
      val (sa, sb) = (byType(ta), byType(tb))
      val skA = sa.toSeq.sorted.take(k).toSet
      val skB = sb.toSeq.sorted.take(k).toSet
      val merged = (skA ++ skB).toSeq.sorted.take(k)
      val kInter = merged.count(x => skA(x) && skB(x)).toLong
      val mCnt = merged.size.toLong
      val estU =
        if (mCnt < k) mCnt else (k - 1).toLong * 4294967296L / merged.last
      val estI = if (mCnt < k) kInter else kInter * estU / k
      assert(r.getAs[Long]("n_union") == (sa ++ sb).size.toLong)
      assert(r.getAs[Long]("n_inter") == (sa & sb).size.toLong)
      assert(r.getAs[Long]("kmv_union") == estU, s"($ta,$tb) union est")
      assert(r.getAs[Long]("kmv_inter") == estI, s"($ta,$tb) inter est")
      val jacKmv = if (mCnt < k) kInter * 1000000L / mCnt else kInter * 1000000L / k
      assert(r.getAs[Long]("kmv_jac_ppm") == jacKmv)
      // set-algebra sanity on the estimates themselves
      assert(estI <= estU, "an intersection estimate above the union is broken")
    }
  }
}
