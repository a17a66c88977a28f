package graft.lake

import graft.SparkTestBase
import org.apache.hadoop.fs.{FilterFileSystem, Path, RawLocalFileSystem}

/** Round-12: the object-store log-commit seam — manifest-log claims
  * dispatch per FS scheme: local hard-link, HDFS create-exclusive, a
  * registered conditional-put for object stores, and a LOUD refusal
  * when a scheme has neither (an S3A "claim" that can silently lose a
  * commit is strictly worse than an error naming the fix). */
class LogCommitSeamSpec extends SparkTestBase {

  /** A local FS masquerading as an object-store scheme: not an
    * instance of Local/RawLocalFileSystem, so the claim primitive
    * dispatches on the SCHEME, exactly as it would against s3a. */
  private def schemeFs(scheme0: String): FilterFileSystem = {
    val raw = new RawLocalFileSystem
    raw.initialize(java.net.URI.create("file:///"),
      spark.sparkContext.hadoopConfiguration)
    new FilterFileSystem(raw) {
      override def getScheme: String = scheme0
    }
  }

  test("an unregistered object-store scheme REFUSES the claim, naming " +
      "registerLogCommitter — nothing is written") {
    val layout = Layout(tmpDir("seam-refuse"))
    val fs = schemeFs("s3a")
    val e = intercept[UnsupportedOperationException] {
      Catalog.claimBody(fs, layout, "v2 -1 0")
    }
    assert(e.getMessage.contains("registerLogCommitter"))
    assert(e.getMessage.contains("s3a"))
    val log = new Path(s"${layout.catalogDir}/_log")
    assert(fs.listStatus(log).isEmpty, "a refused claim must write nothing")
  }

  test("a registered conditional-put serves claims: dense numbering " +
      "through claimBody, exact-id arbitration through claimBodyAt") {
    val scheme = "fakeobj"
    // the test's conditional-put: O_CREAT|O_EXCL on the local path —
    // stands in for S3 If-None-Match / GCS generation-match
    Catalog.registerLogCommitter(scheme, (fs, path, body) => {
      val f = new java.io.File(path.toUri.getPath)
      if (!f.createNewFile()) false
      else {
        val out = new java.io.FileOutputStream(f)
        try out.write(body) finally out.close()
        true
      }
    })
    val layout = Layout(tmpDir("seam-put"))
    val fs = schemeFs(scheme)
    assert(Catalog.claimBody(fs, layout, "v2 -1 0") == 1L)
    assert(Catalog.claimBody(fs, layout, "v2 -1 0") == 2L)
    // exact-id claim: 3 is free, 2 is taken
    assert(Catalog.claimBodyAt(fs, layout, "v2 -1 0", 3L))
    assert(!Catalog.claimBodyAt(fs, layout, "v2 -1 0", 2L))
  }
}
