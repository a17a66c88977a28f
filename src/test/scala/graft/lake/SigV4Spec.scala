package graft.lake

import java.net.InetSocketAddress
import java.net.http.HttpRequest
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.time.Instant

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.SparkTestBase
import org.apache.hadoop.fs.{FilterFileSystem, Path, RawLocalFileSystem}

/** Round-14: the [[SigV4]] request signer, pinned three independent
  * ways:
  *  1. AWS's PUBLISHED signing-key derivation example (date 20120215,
  *     us-east-1/iam) — the HMAC chain byte-for-byte;
  *  2. AWS's published SigV4 test-suite `get-vanilla` request — the
  *     full canonicalization → string-to-sign → signature pipeline
  *     against the documented constants;
  *  3. an HTTP object-store double that INDEPENDENTLY re-canonicalizes
  *     every request server-side (its own ~20-line reimplementation,
  *     not the class under test) and 403s any signature mismatch —
  *     then the whole commit seam (conf-driven `auth=sigv4`
  *     registration, claim, ambiguity read-back arbitration) runs
  *     against it. */
class SigV4Spec extends SparkTestBase {

  private val testSecret = "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY"
  private val testAccess = "AKIDEXAMPLE"

  test("signing-key derivation matches AWS's published example " +
      "(20120215 / us-east-1 / iam)") {
    val signer = new SigV4(testAccess, testSecret, "us-east-1", "iam")
    assert(SigV4.hex(signer.signingKey("20120215")) ==
      "f4780e2d9f65fa895f9c67b32ce1baf0b0d8a43505a000a1a9e090d414db404d")
  }

  test("the published get-vanilla test vector: full signature over " +
      "GET http://example.amazonaws.com/ at 20150830T123600Z") {
    val signer = new SigV4(testAccess, testSecret, "us-east-1", "service",
      signPayload = false,
      clock = () => Instant.parse("2015-08-30T12:36:00Z"))
    val uri = java.net.URI.create("http://example.amazonaws.com/")
    val req = signer.sign(HttpRequest.newBuilder(uri).GET(), "GET", uri,
      Array.emptyByteArray).build()
    val auth = req.headers().firstValue("Authorization").orElseThrow()
    assert(auth == "AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/20150830/" +
      "us-east-1/service/aws4_request, SignedHeaders=host;x-amz-date, " +
      "Signature=" +
      "5fa00fa31553b73ebf1942676e86291e8372ff2a2260956d9b8aae1d763fbf31")
    assert(req.headers().firstValue("x-amz-date").orElseThrow() ==
      "20150830T123600Z")
  }

  test("S3 mode signs the payload hash and a session token when " +
      "present — the signed-header set names them all") {
    val signer = new SigV4(testAccess, testSecret, "eu-west-1", "s3",
      sessionToken = Some("THETOKEN"),
      clock = () => Instant.parse("2015-08-30T12:36:00Z"))
    val uri = java.net.URI.create("http://s3.local:9000/bucket/k")
    val body = "payload".getBytes("UTF-8")
    val req = signer.sign(HttpRequest.newBuilder(uri)
      .PUT(HttpRequest.BodyPublishers.ofByteArray(body)), "PUT", uri, body)
      .build()
    val auth = req.headers().firstValue("Authorization").orElseThrow()
    assert(auth.contains("SignedHeaders=host;x-amz-content-sha256;" +
      "x-amz-date;x-amz-security-token"))
    assert(auth.contains("/eu-west-1/s3/aws4_request"))
    assert(req.headers().firstValue("x-amz-content-sha256").orElseThrow()
      == SigV4.hex(SigV4.sha256(body)))
    assert(req.headers().firstValue("x-amz-security-token").orElseThrow()
      == "THETOKEN")
  }

  // ---- the signature-ASSERTING object-store double ----------------------

  /** Server-side SigV4 verification — an INDEPENDENT reimplementation
    * (so a shared bug in [[SigV4]] cannot self-certify): rebuild the
    * canonical request from what actually arrived on the wire, re-run
    * the HMAC chain with the shared secret, compare signatures. */
  /** AWS's documented S3 canonical-URI rule, reimplemented
    * INDEPENDENTLY of [[SigV4.canonicalPath]] (byte-range checks, no
    * shared code): decode the wire path, re-encode every byte outside
    * RFC-3986 unreserved as uppercase %XX — raw sub-delims a URI may
    * legally carry ('+', '=', ':') MUST come out encoded, which is
    * what real S3 computes and what an identity re-canonicalization
    * would miss. */
  private def awsCanonicalPath(raw: String): String =
    raw.split("/", -1).map { seg =>
      val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
      var i = 0
      while (i < seg.length) {
        if (seg(i) == '%' && i + 2 < seg.length) {
          buf += java.lang.Integer.valueOf(seg.substring(i + 1, i + 3), 16)
            .byteValue
          i += 3
        } else { seg(i).toString.getBytes("UTF-8").foreach(buf += _); i += 1 }
      }
      buf.map { b =>
        val ok = (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z') ||
          (b >= '0' && b <= '9') || b == '-' || b == '.' || b == '_' ||
          b == '~'
        if (ok) (b & 0xff).toChar.toString else f"%%${b & 0xff}%02X"
      }.mkString
    }.mkString("/")

  private def verifySigV4(x: HttpExchange, body: Array[Byte]): Boolean = {
    val auth = Option(x.getRequestHeaders.getFirst("Authorization"))
      .getOrElse(return false)
    val m = ("""AWS4-HMAC-SHA256 Credential=([^/]+)/(\d{8})/([^/]+)/([^/]+)/""" +
      """aws4_request, SignedHeaders=([^,]+), Signature=([0-9a-f]{64})""").r
    auth match {
      case m(access, day, region, service, signedHeaders, signature) =>
        if (access != testAccess) return false
        // payload-hash header must match the actual bytes received
        val bodyHash = SigV4.hex(SigV4.sha256(body))
        if (!Option(x.getRequestHeaders.getFirst("x-amz-content-sha256"))
          .contains(bodyHash)) return false
        val canonicalHeaders = signedHeaders.split(';').map { h =>
          s"$h:${x.getRequestHeaders.getFirst(h).trim}\n"
        }.mkString
        val canonical = Seq(x.getRequestMethod,
          awsCanonicalPath(x.getRequestURI.getRawPath),
          Option(x.getRequestURI.getRawQuery).getOrElse(""),
          canonicalHeaders, signedHeaders, bodyHash).mkString("\n")
        val toSign = Seq("AWS4-HMAC-SHA256",
          x.getRequestHeaders.getFirst("x-amz-date"),
          s"$day/$region/$service/aws4_request",
          SigV4.hex(SigV4.sha256(canonical.getBytes("UTF-8")))).mkString("\n")
        val kSigning = SigV4.hmac(SigV4.hmac(SigV4.hmac(SigV4.hmac(
          ("AWS4" + testSecret).getBytes("UTF-8"), day), region), service),
          "aws4_request")
        SigV4.hex(SigV4.hmac(kSigning, toSign)) == signature
      case _ => false
    }
  }

  @volatile private var fault: String = "none"
  @volatile private var rejected: Int = 0
  private val mutex = new Object

  private lazy val server: HttpServer = {
    val s = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    s.createContext("/", (x: HttpExchange) => handle(x))
    s.start()
    s
  }

  private def handle(x: HttpExchange): Unit = try {
    val p = Paths.get(x.getRequestURI.getPath)
    x.getRequestMethod match {
      case "PUT" => mutex.synchronized {
        val body = x.getRequestBody.readAllBytes()
        if (!verifySigV4(x, body)) {
          rejected += 1; x.sendResponseHeaders(403, -1); return
        }
        if (!Option(x.getRequestHeaders.getFirst("If-None-Match"))
          .contains("*")) { x.sendResponseHeaders(400, -1); return }
        if (Files.exists(p)) { x.sendResponseHeaders(412, -1); return }
        fault match {
          case "land-then-500" =>
            fault = "none"
            Files.createDirectories(p.getParent)
            Files.write(p, body, StandardOpenOption.CREATE_NEW)
            x.sendResponseHeaders(500, -1)
          case _ =>
            Files.createDirectories(p.getParent)
            Files.write(p, body, StandardOpenOption.CREATE_NEW)
            x.sendResponseHeaders(200, -1)
        }
      }
      case "GET" =>
        if (!verifySigV4(x, Array.emptyByteArray)) {
          rejected += 1; x.sendResponseHeaders(403, -1); return
        }
        if (Files.exists(p)) {
          val b = Files.readAllBytes(p)
          x.sendResponseHeaders(200, b.length.max(1))
          if (b.nonEmpty) x.getResponseBody.write(b)
        } else x.sendResponseHeaders(404, -1)
      case _ => x.sendResponseHeaders(405, -1)
    }
  } finally x.close()

  private def schemeFs(scheme0: String,
      extraConf: Map[String, String]): FilterFileSystem = {
    val raw = new RawLocalFileSystem
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    extraConf.foreach { case (k, v) => conf.set(k, v) }
    raw.initialize(java.net.URI.create("file:///"), conf)
    new FilterFileSystem(raw) { override def getScheme: String = scheme0 }
  }

  test("end-to-end: conf-driven auth=sigv4 registration signs every " +
      "claim PUT and every arbitration GET — the double verifies each " +
      "signature with an independent reimplementation and 403s " +
      "mismatches; ambiguity arbitration composes with signing") {
    val conf = Map(
      "graft.committer.s3sig.endpoint" ->
        s"http://127.0.0.1:${server.getAddress.getPort}",
      "graft.committer.s3sig.auth" -> "sigv4",
      "graft.committer.s3sig.access" -> testAccess,
      "graft.committer.s3sig.secret" -> testSecret,
      "graft.committer.s3sig.region" -> "us-east-1")
    val fs = schemeFs("s3sig", conf)
    val layout = Layout(tmpDir("sigv4-e2e"))
    rejected = 0
    assert(Catalog.claimBody(fs, layout, "v2 -1 10") == 1L)
    // ambiguous-landed: the read-back GET must be signed too
    fault = "land-then-500"
    assert(Catalog.claimBody(fs, layout, "v2 -1 11") == 2L)
    assert(rejected == 0, s"the double rejected $rejected signed requests")
    val d = new java.io.File(s"${layout.catalogDir}/_log")
    assert(d.listFiles().map(_.getName).count(_.endsWith(".commit")) == 2)
  }

  test("canonicalPath applies AWS's S3 single-encode rule: raw " +
      "sub-delims a URI legally carries get percent-encoded, " +
      "pre-encoded escapes normalize unchanged, unreserved bytes " +
      "stay raw, multibyte UTF-8 encodes per byte") {
    assert(SigV4.canonicalPath("") == "/")
    assert(SigV4.canonicalPath("/") == "/")
    assert(SigV4.canonicalPath("/bkt/a+b=c:d,e!f") ==
      "/bkt/a%2Bb%3Dc%3Ad%2Ce%21f")
    assert(SigV4.canonicalPath("/bkt/a%20dir/x~-._9") ==
      "/bkt/a%20dir/x~-._9")
    assert(SigV4.canonicalPath("/bkt/café") == "/bkt/caf%C3%A9")
  }

  test("end-to-end: a layout root carrying RAW sub-delims ('+') and " +
      "spaces still signs verifiably — the double's independent " +
      "canonicalization encodes them exactly like real S3 would, so " +
      "an identity-canonicalizing signer would 403 here") {
    val conf = Map(
      "graft.committer.s3enc.endpoint" ->
        s"http://127.0.0.1:${server.getAddress.getPort}",
      "graft.committer.s3enc.auth" -> "sigv4",
      "graft.committer.s3enc.access" -> testAccess,
      "graft.committer.s3enc.secret" -> testSecret)
    val fs = schemeFs("s3enc", conf)
    val layout = Layout(tmpDir("sigv4-enc") + "/ads+web dir")
    rejected = 0
    assert(Catalog.claimBody(fs, layout, "v2 -1 40") == 1L)
    assert(rejected == 0, s"the double rejected $rejected signed requests")
  }

  test("a WRONG secret is rejected by the double (the verification " +
      "loop actually bites) and surfaces as a loud non-conditional " +
      "status, never a silent claim") {
    val conf = Map(
      "graft.committer.s3bad.endpoint" ->
        s"http://127.0.0.1:${server.getAddress.getPort}",
      "graft.committer.s3bad.auth" -> "sigv4",
      "graft.committer.s3bad.access" -> testAccess,
      "graft.committer.s3bad.secret" -> "not-the-secret")
    val fs = schemeFs("s3bad", conf)
    val layout = Layout(tmpDir("sigv4-bad"))
    val e = intercept[java.io.IOException] {
      Catalog.claimBody(fs, layout, "v2 -1 20")
    }
    assert(e.getMessage.contains("403"))
  }

  test("conf-conflict refusal (advice-r13 medium): a second session " +
      "asking a DIFFERENT endpoint for an already-resolved scheme " +
      "fails loud instead of silently routing through the first store") {
    val port = server.getAddress.getPort
    val creds = Map(
      "graft.committer.s3cfl.auth" -> "sigv4",
      "graft.committer.s3cfl.access" -> testAccess,
      "graft.committer.s3cfl.secret" -> testSecret)
    val fs1 = schemeFs("s3cfl", creds +
      ("graft.committer.s3cfl.endpoint" -> s"http://127.0.0.1:$port"))
    val layout = Layout(tmpDir("sigv4-conflict"))
    assert(Catalog.claimBody(fs1, layout, "v2 -1 30") == 1L)
    val fs2 = schemeFs("s3cfl", creds +
      ("graft.committer.s3cfl.endpoint" -> s"http://127.0.0.1:${port + 1}"))
    val e = intercept[IllegalStateException] {
      Catalog.claimBody(fs2, layout, "v2 -1 31")
    }
    assert(e.getMessage.contains("conflict"))
    // the SAME conf keeps working (fingerprint match, cached reuse)
    assert(Catalog.claimBody(fs1, layout, "v2 -1 32") == 2L)
  }

  test("rotated credentials on the SAME endpoint conflict too (review " +
      "catch): the fingerprint covers credential identity, so a " +
      "session with a new secret fails loud instead of silently " +
      "signing with the stale one — and no secret leaks into the " +
      "error") {
    val port = server.getAddress.getPort
    val base = Map(
      "graft.committer.s3rot.endpoint" -> s"http://127.0.0.1:$port",
      "graft.committer.s3rot.auth" -> "sigv4",
      "graft.committer.s3rot.access" -> testAccess)
    val fs1 = schemeFs("s3rot",
      base + ("graft.committer.s3rot.secret" -> testSecret))
    val layout = Layout(tmpDir("sigv4-rot"))
    assert(Catalog.claimBody(fs1, layout, "v2 -1 50") == 1L)
    val fs2 = schemeFs("s3rot",
      base + ("graft.committer.s3rot.secret" -> "rotated-secret"))
    val e = intercept[IllegalStateException] {
      Catalog.claimBody(fs2, layout, "v2 -1 51")
    }
    assert(e.getMessage.contains("conflict"))
    assert(!e.getMessage.contains("rotated-secret") &&
      !e.getMessage.contains(testSecret),
      s"secrets must never leak into the error: ${e.getMessage}")
  }

  test("pathStyle percent-encodes reserved characters (advice-r13): a " +
      "layout root with spaces maps to a valid URL with %20, not a " +
      "URI.create crash") {
    val f = ObjectStoreCommit.HttpStore.pathStyle("http://h:1")
    assert(f(new Path("s3a://bkt/a dir/file 1.commit")).toString ==
      "http://h:1/bkt/a%20dir/file%201.commit")
    // and the unreserved fast path is byte-identical to round-13
    assert(f(new Path("s3a://bkt/a/b.commit")).toString ==
      "http://h:1/bkt/a/b.commit")
    // STRICT single-encoding on the wire (second-pass review catch):
    // sub-delims a URI could legally carry raw are emitted encoded,
    // so the sent bytes equal the strictly-canonicalized signed bytes
    // under EITHER server interpretation
    assert(f(new Path("s3a://bkt/ads+web/k=1,v:2.commit")).toString ==
      "http://h:1/bkt/ads%2Bweb/k%3D1%2Cv%3A2.commit")
    assert(SigV4.canonicalPath("/bkt/ads%2Bweb/k%3D1%2Cv%3A2.commit") ==
      "/bkt/ads%2Bweb/k%3D1%2Cv%3A2.commit",
      "canonicalization is the IDENTITY on pathStyle's own output")
  }

  override def afterAll(): Unit = {
    try server.stop(0) finally super.afterAll()
  }
}
