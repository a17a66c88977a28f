package graft.streaming

import graft.SparkTestBase
import org.apache.hadoop.fs.Path

/** Pins the [[SnapshotStore]] commit protocol, in particular the
  * `_committed` marker being the commit point rather than the rename
  * (which is a non-atomic copy on object stores). */
class SnapshotStoreSpec extends SparkTestBase {
  import spark.implicits._

  private def fsOf(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("compact folds inputs into a marker-stamped snapshot and deletes them") {
    val store = tmpDir("snapstore")
    Seq((1L, 10L)).toDF("k", "v").write.parquet(s"$store/batch=0")
    Seq((1L, 5L), (2L, 7L)).toDF("k", "v").write.parquet(s"$store/batch=1")
    SnapshotStore.compact(spark, store) { ins =>
      spark.read.parquet(ins: _*).groupBy("k").sum("v").toDF("k", "v")
    }
    val fs = fsOf(store)
    val snap = new Path(store, "batch=compacted_g1")
    assert(fs.exists(snap))
    assert(fs.exists(new Path(snap, "_committed")), "commit marker must exist")
    assert(!fs.exists(new Path(store, "batch=0")) && !fs.exists(new Path(store, "batch=1")))
    val folded = spark.read.parquet(snap.toString).as[(Long, Long)].collect().toMap
    assert(folded == Map(1L -> 15L, 2L -> 7L))
  }

  test("recover deletes a markerless (partially renamed) snapshot and keeps its inputs") {
    val store = tmpDir("snaprec")
    val fs = fsOf(store)
    Seq((1L, 10L)).toDF("k", "v").write.parquet(s"$store/batch=0")
    // simulate an object-store crash mid-"rename": the snapshot dir
    // exists with its manifest but NO marker, and inputs still exist
    val partial = new Path(store, "batch=compacted_g1")
    fs.mkdirs(partial)
    val mf = fs.create(new Path(partial, "_folded"), true)
    mf.write("batch=0".getBytes("UTF-8")); mf.close()
    SnapshotStore.recover(fs, new Path(store))
    assert(!fs.exists(partial), "uncommitted snapshot must be dropped")
    assert(fs.exists(new Path(store, "batch=0")),
      "inputs of an uncommitted snapshot must survive — deletion is gated on the marker")
    // and the next compact redoes the fold cleanly
    SnapshotStore.compact(spark, store) { ins =>
      spark.read.parquet(ins: _*).groupBy("k").sum("v").toDF("k", "v")
    }
    assert(fs.exists(new Path(store, "batch=compacted_g1/_committed")))
  }
}
