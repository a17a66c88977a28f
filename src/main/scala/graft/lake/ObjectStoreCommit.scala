package graft.lake

import java.io.IOException
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import org.apache.hadoop.fs.{FileSystem, Path}

/** SHIPPED object-store committers for the manifest-log commit seam
  * ([[Catalog.registerLogCommitter]]) — the round-12 seam refuses
  * loud on `s3a`/`gs`; this module is the registered implementation,
  * so a 100 TB deployment (the reference's storage IS S3,
  * `serverless_datalake_stack.py:38-52`) actually commits there.
  *
  * Design: every store that matters exposes ONE atomic primitive —
  * conditional PUT (S3 `If-None-Match: *`, GCS
  * `x-goog-if-generation-match: 0`, Azure `If-None-Match: *`) — but
  * its FAILURE modes are what break naive commit protocols: a PUT
  * that times out (or 5xx's) AFTER landing leaves the writer not
  * knowing whether it owns the record. This module factors the
  * protocol from the transport:
  *
  *  - [[ConditionalStore]]: the minimal transport contract —
  *    `putIfAbsent` with a three-valued result (created / exists /
  *    AMBIGUOUS) plus `read` for arbitration;
  *  - [[committer]]: the retry + arbitration loop that turns any
  *    such store into a sound [[Catalog.ExclusiveCreate]]: an
  *    ambiguous PUT is resolved by reading the record back — OUR
  *    body ⇒ the earlier attempt landed, we won; ANOTHER body ⇒ we
  *    lost; ABSENT ⇒ the PUT never landed, retry. A writer can
  *    therefore never double-claim a commit id, and never loses a
  *    claim it actually won (the "timed out after landing" case the
  *    contract test injects).
  *
  * Arbitration soundness rests on commit bodies being WRITER-UNIQUE.
  * Staged-file records are (they embed a fresh uuid); a pure-fact
  * record (e.g. two writers SET the same TBLPROPERTY in the same
  * millisecond) could theoretically collide byte-for-byte — then BOTH
  * writers are told "won", which is harmless by construction: the log
  * contains exactly the byte-identical record both asked for, so
  * either writer's postcondition holds.
  *
  * Two transports ship:
  *  - [[HttpStore]]: SDK-free `java.net.http` against the store's
  *    REST API (S3 and S3-compatible stores like MinIO via
  *    path-style endpoints; GCS XML API). Authentication is a
  *    constructor hook (`sign`) — plug SigV4/OAuth/an auth proxy
  *    there; the protocol code does not change.
  *  - [[HadoopCreateStore]]: adapts a Hadoop connector whose
  *    `create(path, overwrite = false)` IS an atomic conditional PUT
  *    (S3A on Hadoop ≥ 3.4.2 with `fs.s3a.create.conditional.enabled`,
  *    the GCS connector) — an explicit DEPLOYMENT ASSERTION, because
  *    on older connectors that call is exists()-then-PUT and nothing
  *    client-side can make it atomic.
  */
object ObjectStoreCommit {

  /** The store's answer to one conditional PUT. */
  sealed trait PutResult
  /** The precondition held and the object was created — we won. */
  case object Created extends PutResult
  /** The precondition failed — an object already exists under the
    * name (possibly OURS, from an earlier ambiguous attempt). */
  case object AlreadyExists extends PutResult
  /** The request's effect is UNKNOWN: timeout, connection drop, 5xx,
    * or S3's 409 ConditionalRequestConflict — the PUT may or may not
    * have landed. The committer arbitrates by read-back. */
  final case class Ambiguous(cause: Throwable) extends PutResult

  /** Minimal transport contract the commit protocol needs. */
  trait ConditionalStore {
    /** Atomically create `path` with `body` iff absent. MUST map an
      * indeterminate outcome to [[Ambiguous]], never to a guess. */
    def putIfAbsent(path: Path, body: Array[Byte]): PutResult
    /** Read the object back; None when absent. MUST throw (not
      * return None) on an indeterminate failure — arbitration would
      * otherwise mistake "could not read" for "not there" and
      * double-claim. */
    def read(path: Path): Option[Array[Byte]]
  }

  /** Turn a [[ConditionalStore]] into the seam's exclusive-create:
    * retry with read-back arbitration (semantics in the object doc).
    * Loud after `maxAttempts` unresolved ambiguities — never a
    * silent guess. */
  def committer(store: ConditionalStore,
      maxAttempts: Int = 5): Catalog.ExclusiveCreate =
    (_: FileSystem, path: Path, body: Array[Byte]) => {
      var attempt = 0
      var result: Option[Boolean] = None
      while (result.isEmpty) {
        store.putIfAbsent(path, body) match {
          case Created => result = Some(true)
          case AlreadyExists =>
            // ours from an earlier ambiguous attempt, or a rival's —
            // the body decides (absent again ⇒ pruned ⇒ a rival's)
            result = Some(store.read(path)
              .exists(java.util.Arrays.equals(_, body)))
          case Ambiguous(cause) =>
            store.read(path) match {
              case Some(b) => result = Some(java.util.Arrays.equals(b, body))
              case None =>
                attempt += 1
                if (attempt >= maxAttempts) throw new IOException(
                  s"object-store commit claim on $path still ambiguous " +
                    s"after $maxAttempts attempts — refusing to guess " +
                    "(a silent double-claim would lose a commit record)",
                  cause)
                Thread.sleep(math.min(100L << attempt, 2000L))
            }
        }
      }
      result.get
    }

  /** Register a store's committer for an FS scheme (JVM-wide, like
    * the seam itself): `register("s3a", store)` makes every
    * manifest-log claim on `s3a://…` route through it. */
  def register(scheme: String, store: ConditionalStore,
      maxAttempts: Int = 5): Unit =
    Catalog.registerLogCommitter(scheme, committer(store, maxAttempts))

  // --------------------------------------------------------------------
  // Transport 1: SDK-free HTTP (S3 / GCS dialects)
  // --------------------------------------------------------------------

  /** The store's conditional-PUT dialect: which header asserts
    * "create only if absent" and which statuses mean what. */
  sealed trait Dialect {
    def conditionalHeaders: Seq[(String, String)]
    /** Statuses meaning "the precondition failed — object exists". */
    def existsStatus(code: Int): Boolean = code == 412
    /** Statuses meaning "outcome unknown — arbitrate". 409 is S3's
      * ConditionalRequestConflict (a CONCURRENT conditional write was
      * in flight; ours may have lost OR landed first). */
    def ambiguousStatus(code: Int): Boolean = code == 409 || code >= 500
  }
  /** S3 and S3-compatible (MinIO, R2, …): `If-None-Match: *`. */
  case object S3Dialect extends Dialect {
    val conditionalHeaders = Seq("If-None-Match" -> "*")
  }
  /** GCS XML API: generation 0 = "no live generation exists". */
  case object GcsDialect extends Dialect {
    val conditionalHeaders = Seq("x-goog-if-generation-match" -> "0")
  }

  /** Authentication hook for [[HttpStore]]: receives the request
    * builder PLUS everything a signature covers — method, final URI,
    * payload — and returns the builder with the deployment's auth
    * added ([[SigV4]] for plain S3, a bearer token, nothing for an
    * auth proxy / IAM-fronted endpoint). A plain
    * `Builder => Builder` hook was the round-13 shape; it cannot
    * compute a payload hash (the JDK builder is write-only), which is
    * exactly what SigV4 needs — hence the wider contract. */
  trait RequestSigner {
    def sign(b: HttpRequest.Builder, method: String, uri: URI,
        payload: Array[Byte]): HttpRequest.Builder
  }

  /** No authentication (IAM proxy / MinIO-style deployments). */
  object NoSign extends RequestSigner {
    override def sign(b: HttpRequest.Builder, method: String, uri: URI,
        payload: Array[Byte]): HttpRequest.Builder = b
  }

  /** REST conditional store over `java.net.http`. `endpoint` maps the
    * Hadoop path to the object URL — use [[HttpStore.pathStyle]] for
    * path-style S3/MinIO/GCS endpoints. `signer` is the auth hook
    * ([[RequestSigner]]); the protocol code does not change with
    * authentication. */
  final class HttpStore(endpoint: Path => URI, dialect: Dialect,
      signer: RequestSigner = NoSign,
      requestTimeout: Duration = Duration.ofSeconds(30),
      client: HttpClient = HttpClient.newBuilder()
        .connectTimeout(Duration.ofSeconds(10)).build())
      extends ConditionalStore {

    override def putIfAbsent(path: Path, body: Array[Byte]): PutResult = {
      val uri = endpoint(path)
      val b = HttpRequest.newBuilder(uri)
        .timeout(requestTimeout)
        .PUT(HttpRequest.BodyPublishers.ofByteArray(body))
      dialect.conditionalHeaders.foreach { case (k, v) => b.header(k, v) }
      val resp =
        try client.send(signer.sign(b, "PUT", uri, body).build(),
          HttpResponse.BodyHandlers.ofByteArray())
        catch { case e: Exception => return Ambiguous(e) }
      resp.statusCode() match {
        case c if c >= 200 && c < 300 => Created
        case c if dialect.existsStatus(c) => AlreadyExists
        case c if dialect.ambiguousStatus(c) => Ambiguous(new IOException(
          s"conditional PUT ${endpoint(path)} → HTTP $c"))
        case c => throw new IOException(
          s"conditional PUT ${endpoint(path)} → HTTP $c (not a " +
            "conditional-write outcome — check endpoint/auth)")
      }
    }

    override def read(path: Path): Option[Array[Byte]] = {
      val uri = endpoint(path)
      // a FRESH builder per attempt: signing mutates the builder
      // (adds auth headers), so reusing one across retries would
      // accumulate duplicate headers and a stale date
      def request() = signer.sign(
        HttpRequest.newBuilder(uri).timeout(requestTimeout).GET(),
        "GET", uri, Array.emptyByteArray).build()
      // read-back failures RETRY here, then throw — arbitration must
      // never mistake "could not read" for "absent"
      var last: Throwable = null
      for (attempt <- 1 to 3) {
        try {
          val resp = client.send(request(),
            HttpResponse.BodyHandlers.ofByteArray())
          resp.statusCode() match {
            case c if c >= 200 && c < 300 => return Some(resp.body())
            case 404 => return None
            case c => last = new IOException(
              s"read-back GET ${endpoint(path)} → HTTP $c")
          }
        } catch { case e: Exception => last = e }
        if (attempt < 3) Thread.sleep(100L * attempt)
      }
      throw new IOException(
        s"read-back of ${endpoint(path)} failed 3× — cannot arbitrate " +
          "an ambiguous claim without it", last)
    }
  }

  object HttpStore {
    /** Path-style endpoint mapping: `s3a://bucket/a/b` →
      * `<base>/bucket/a/b` — the layout MinIO/R2 and regional S3
      * path-style endpoints serve. Every path segment is STRICTLY
      * single-encoded ([[SigV4.strictEncodeSegment]]: all
      * non-unreserved bytes, uppercase hex — the form the AWS SDKs
      * put on the wire), not merely made URI-legal: a URI may
      * legally carry `+ = :` raw, but then the bytes SENT differ
      * from the bytes a strict canonicalizer SIGNS, and whether the
      * request verifies would depend on how the server
      * re-canonicalizes (second-pass review catch). Emitting the
      * strict form makes signed bytes ≡ sent bytes, so the
      * signature is valid under BOTH server interpretations
      * (literal-path and decode-re-encode). */
    def pathStyle(base: String): Path => URI = { p =>
      val u = p.toUri
      // an authority-less path (a local-FS test double) must not leave
      // a degenerate `//` in the URL — some servers 400 an empty
      // leading segment
      val bucket = Option(u.getAuthority).filter(_.nonEmpty)
        .map(a => "/" + SigV4.strictEncodeSegment(a)).getOrElse("")
      val enc = u.getPath.stripPrefix("/").split("/", -1)
        .map(SigV4.strictEncodeSegment).mkString("/")
      URI.create(s"${base.stripSuffix("/")}$bucket/$enc")
    }
  }

  // --------------------------------------------------------------------
  // Transport 2: a Hadoop connector whose create(overwrite=false) IS
  // an atomic conditional PUT
  // --------------------------------------------------------------------

  /** Adapter for connectors with ATOMIC `create(path, overwrite =
    * false)` — S3A on Hadoop ≥ 3.4.2 (`fs.s3a.create.conditional.
    * enabled`, HADOOP-19256: the If-None-Match PUT happens at
    * close()), the GCS connector (generation-match create). Using it
    * IS the deployment's assertion of that atomicity: on an older
    * connector the call is exists()-then-PUT and no client-side code
    * can repair it — that is exactly why the seam refuses unregistered
    * schemes instead of defaulting here.
    *
    * Failure mapping: FileAlreadyExists ⇒ exists; ANY other failure
    * of create/write/close ⇒ ambiguous (the connector uploads at
    * close; a close() timeout may follow a landed PUT) — the
    * committer's read-back then arbitrates. */
  final class HadoopCreateStore(fs: FileSystem) extends ConditionalStore {
    override def putIfAbsent(path: Path, body: Array[Byte]): PutResult =
      try {
        val out = fs.create(path, false)
        try out.write(body) finally out.close()
        Created
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
          AlreadyExists
        case e: IOException if e.getMessage != null &&
            (e.getMessage.contains("PreconditionFailed") ||
              e.getMessage.contains("412") ||
              e.getMessage.contains("At least one of the pre-conditions")) =>
          AlreadyExists
        case e: IOException => Ambiguous(e)
      }

    override def read(path: Path): Option[Array[Byte]] =
      try {
        val in = fs.open(path)
        try {
          val buf = new java.io.ByteArrayOutputStream()
          val chunk = new Array[Byte](8192)
          var n = in.read(chunk)
          while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
          Some(buf.toByteArray)
        } finally in.close()
      } catch { case _: java.io.FileNotFoundException => None }
  }
}
