package graft.streaming

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

/** The real HTTP edge in front of the socket relay — the engine form
  * of the reference's API Gateway REST entry
  * (`/root/reference/serverless_datalake/serverless_datalake_stack.py:150-216`):
  * `POST /{source}` with an `x-api-key` header, JSON body forwarded to
  * the per-source delivery stream. JDK-only (`com.sun.net.httpserver`),
  * no new dependencies.
  *
  * Division of authority mirrors the reference exactly:
  *  - the FRONT answers synchronously from a registry snapshot —
  *    401 unknown key, 403 key bound to another source, 429 local
  *    request count at/over quota — the way API Gateway validates keys
  *    and throttles at the edge without consulting the backend;
  *  - the BATCH gate ([[graft.lake.Access.gate]] inside
  *    [[SocketIngest.startGated]]) remains the deterministic authority:
  *    every accepted request is forwarded in the gated
  *    `{"api_key":…,"env":…}` shape and re-judged against the durable
  *    usage ledger, so a front restarted with a stale snapshot can
  *    only over-admit transiently — never under-bill.
  *
  * Scale: the front is IO-bound line shuffling (one small in-memory
  * map, one outbound socket); run one per node behind any balancer,
  * all feeding one [[SocketRelay]] — the reference's many-API-nodes /
  * one-Firehose fan-in.
  */
class HttpIngestFront(
    port: Int,
    forwardHost: String,
    forwardPort: Int,
    registry: Map[String, HttpIngestFront.KeyInfo],
    usedToday: Map[String, Long] = Map.empty,
    replayHandler: Option[(String, Long, Long) => Unit] = None) {

  import HttpIngestFront._

  private val counters = {
    val m = new ConcurrentHashMap[String, AtomicLong]()
    usedToday.foreach { case (kh, n) => m.put(kh, new AtomicLong(n)) }
    m
  }

  // one persistent line connection to the relay; writes serialized.
  // Reconnect-once on failure: the relay accepting is all it takes.
  private var out: java.io.Writer = null
  private def connect(): Unit = {
    val s = new Socket(forwardHost, forwardPort)
    out = new java.io.OutputStreamWriter(s.getOutputStream, StandardCharsets.UTF_8)
  }
  private def forward(line: String): Unit = synchronized {
    if (out == null) connect()
    try { out.write(line); out.write('\n'); out.flush() }
    catch {
      case _: java.io.IOException =>
        try out.close() catch { case _: Exception => () }
        connect()
        out.write(line); out.write('\n'); out.flush()
    }
  }

  private val server = HttpServer.create(new InetSocketAddress(port), 0)
  server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
  server.createContext("/", (ex: HttpExchange) => handle(ex))
  server.start()

  /** Actual bound port (pass 0 for an ephemeral bind). */
  def portBound: Int = server.getAddress.getPort

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  private def handle(ex: HttpExchange): Unit = try {
    if (ex.getRequestMethod != "POST") {
      respond(ex, 405, """{"message":"Method Not Allowed"}"""); return
    }
    val segments = ex.getRequestURI.getPath.split("/").filter(_.nonEmpty)
    if (segments.length == 2 && segments(1) == "replay") { handleReplay(ex); return }
    if (segments.length != 1) {
      respond(ex, 404, """{"message":"Not Found"}"""); return
    }
    val source = segments(0)
    val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
    val key = Option(ex.getRequestHeaders.getFirst("x-api-key"))
    val info = key.map(sha256Hex).flatMap(h => registry.get(h).map(h -> _))
    info match {
      case None =>
        respond(ex, 401, """{"message":"Unauthorized"}""")
      case Some((_, ki)) if ki.source != source =>
        respond(ex, 403, """{"message":"Forbidden"}""")
      case Some((kh, ki)) =>
        val c = counters.computeIfAbsent(kh, _ => new AtomicLong(0L))
        // reserve a slot atomically; over-quota reservations roll back
        // so concurrent bursts settle at exactly `quota` admissions
        if (c.incrementAndGet() > ki.quota) {
          c.decrementAndGet()
          respond(ex, 429, """{"message":"Limit Exceeded"}""")
        } else {
          forward(gatedLine(key.get, wrapJvm(source, body)))
          respond(ex, 200, """{"ok":true}""")
        }
    }
  } catch {
    case _: Exception =>
      try respond(ex, 500, """{"message":"Internal Server Error"}""")
      catch { case _: Exception => () }
  }

  // replay runs async off the handler thread — the reference's replay
  // POST answers 202 and does the work via SQS; ours answers 202 and
  // does it on this executor
  private val replayExec = java.util.concurrent.Executors.newSingleThreadExecutor()

  /** `POST /{source}/replay` with `{"Source":…, "IntervalStart":…,
    * "IntervalEnd":…}` (13-digit epoch-millis strings — the
    * reference's catalog sort-key format,
    * `src/event_replayer/lambda_function.py:59-61`): 202 accepted,
    * 400 on malformed input, 404 when no replay handler is wired. The
    * reference does not key-gate replay; neither do we. */
  private def handleReplay(ex: HttpExchange): Unit = {
    if (replayHandler.isEmpty) { respond(ex, 404, """{"message":"Not Found"}"""); return }
    val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
    val parsed =
      try {
        val om = new com.fasterxml.jackson.databind.ObjectMapper()
        val n = om.readTree(body)
        val src = n.get("Source"); val lo = n.get("IntervalStart"); val hi = n.get("IntervalEnd")
        if (src == null || lo == null || hi == null) None
        else Some((src.asText(), lo.asText().toLong, hi.asText().toLong))
      } catch { case _: Exception => None }
    parsed match {
      case None => respond(ex, 400, """{"message":"Bad Request"}""")
      case Some((src, lo, hi)) =>
        val h = replayHandler.get
        replayExec.submit(new Runnable { def run(): Unit =
          try h(src, lo, hi) catch { case _: Exception => () } })
        respond(ex, 202, """{"accepted":true}""")
    }
  }

  def close(): Unit = {
    server.stop(0)
    replayExec.shutdown()
    synchronized { if (out != null) { try out.close() catch { case _: Exception => () } } }
  }
}

object HttpIngestFront {

  /** One registry snapshot row: the source a key is bound to and its
    * per-UTC-day quota. */
  case class KeyInfo(source: String, quota: Long)

  /** Lowercase hex SHA-256 — byte-identical to Spark's
    * `sha2(key, 256)` used by [[graft.lake.Access]], so the front and
    * the batch gate look up the same registry rows. */
  def sha256Hex(key: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(key.getBytes(StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString

  /** Plain-JVM envelope wrap producing the same shape as
    * [[graft.lake.Envelope.wrap]] (`{"DeliveryStreamName":…,
    * "Record":{"Data":<b64>}}`) — the front must not run a Spark job
    * per request. */
  def wrapJvm(source: String, body: String): String = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val b64 = java.util.Base64.getEncoder
      .encodeToString(body.getBytes(StandardCharsets.UTF_8))
    s"""{"DeliveryStreamName":${om.writeValueAsString(source)},"Record":{"Data":"$b64"}}"""
  }

  /** The gated request line [[SocketIngest.gatedFlush]] parses. */
  def gatedLine(apiKey: String, envelope: String): String = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    s"""{"api_key":${om.writeValueAsString(apiKey)},"env":${om.writeValueAsString(envelope)}}"""
  }

  /** Load the front's synchronous snapshot from the lake: effective
    * registry (newest row per key hash) + today's billed usage. The
    * snapshot is immutable by design — refresh by constructing a new
    * front, the way an API Gateway stage redeploys. */
  def snapshot(spark: org.apache.spark.sql.SparkSession, layout: graft.lake.Layout,
      nowMs: Long): (Map[String, KeyInfo], Map[String, Long]) = {
    val reg = graft.lake.Access.registry(spark, layout).collect()
      .map(r => r.getString(0) -> KeyInfo(r.getString(1), r.getLong(2))).toMap
    val used = graft.lake.Access.usedToday(spark, layout, nowMs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    (reg, used)
  }
}
