package graft.streaming

import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter, Writer}
import java.net.ServerSocket
import java.nio.charset.StandardCharsets
import java.util.concurrent.LinkedBlockingDeque
import java.util.concurrent.atomic.AtomicBoolean

/** Multi-client line relay closing the single-connection limit of the
  * engine's socket edge: Spark's socket source holds ONE connection,
  * but the reference's edge is many API nodes in front of one
  * delivery stream (`serverless_datalake_stack.py` — per-source
  * Firehose behind an API Gateway fleet). The relay is that fan-in:
  * any number of frontends connect to `clientPort` and write envelope
  * lines; the relay serializes them — line-atomically, arrival order —
  * onto the single downstream connection the engine's
  * [[SocketIngest.start]] source reads from `servePort`.
  *
  * Delivery: lines buffer in a bounded in-memory queue while no
  * consumer is attached (backpressure: producers block when it fills,
  * like Firehose throttling PutRecord) and drain once the engine
  * connects. A relay crash loses its queue — the same at-most-once
  * edge window the reference has between API accept and Firehose
  * durability; everything after bronze is the engine's exactly-once.
  *
  * Scale: one relay per source/stream, horizontally many relays — the
  * relay itself is IO-bound line shuffling, never parses.
  */
class SocketRelay(val clientPort: Int, val servePort: Int,
    queueCapacity: Int = 65536) {

  private val queue = new LinkedBlockingDeque[String](queueCapacity)
  private val running = new AtomicBoolean(true)
  private val clientServer = new ServerSocket(clientPort)
  private val serveServer = new ServerSocket(servePort)
  private val threads = java.util.concurrent.ConcurrentHashMap.newKeySet[Thread]()
  private val clientSockets =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.net.Socket]()

  private def daemon(name: String)(body: => Unit): Thread = {
    val t = new Thread(() => try body finally threads.remove(Thread.currentThread()),
      name)
    t.setDaemon(true)
    threads.add(t)
    t.start()
    t
  }

  // accept loop: every frontend gets a reader thread; a dropped
  // client never affects the others or the downstream. Sockets are
  // TRACKED so close() can unblock their readers — Thread.interrupt
  // does NOT wake a blocking socket read; closing the socket does.
  daemon("relay-accept-clients") {
    while (running.get()) {
      try {
        val s = clientServer.accept()
        clientSockets.add(s)
        daemon(s"relay-client-${s.getPort}") {
          val in = new BufferedReader(
            new InputStreamReader(s.getInputStream, StandardCharsets.UTF_8))
          try {
            var line = in.readLine()
            while (line != null && running.get()) {
              queue.putLast(line) // blocks when full = producer backpressure
              line = in.readLine()
            }
          } catch {
            case _: java.io.IOException => ()    // client went away
            case _: InterruptedException => ()   // close() while queue full
          } finally { clientSockets.remove(s); s.close() }
        }
      } catch { case _: java.io.IOException => () } // closed during accept
    }
  }

  // downstream loop: one consumer at a time (the Spark socket source);
  // if the consumer restarts, the next accept resumes the drain.
  // `carry` is the serve thread's private head slot: a line taken but
  // not yet flushed stays here across consumer restarts — it is NEVER
  // pushed back into the bounded deque, where a refilled queue would
  // silently reject (and so drop) it.
  daemon("relay-serve") {
    var carry: String = null
    while (running.get()) {
      var out: Writer = null
      try {
        val s = serveServer.accept()
        out = new OutputStreamWriter(s.getOutputStream, StandardCharsets.UTF_8)
        while (running.get()) {
          if (carry == null) carry = queue.takeFirst()
          out.write(carry); out.write('\n'); out.flush()
          carry = null // flushed — next consumer never re-sees it
        }
      } catch {
        case _: java.io.IOException => ()          // consumer went away
        case _: InterruptedException => ()         // close()
      } finally {
        if (out != null) { try out.close() catch { case _: Exception => () } }
      }
    }
  }

  /** Lines accepted but not yet drained downstream. */
  def pending: Int = queue.size()

  /** Actual bound ports (pass 0 to either constructor port for an
    * ephemeral bind, then read the real one back here). */
  def clientPortBound: Int = clientServer.getLocalPort
  def servePortBound: Int = serveServer.getLocalPort

  def close(): Unit = {
    running.set(false)
    try clientServer.close() catch { case _: Exception => () }
    try serveServer.close() catch { case _: Exception => () }
    // closing each accepted socket unblocks its reader (interrupt
    // alone cannot); interrupt covers readers parked on a full queue
    clientSockets.forEach(s => try s.close() catch { case _: Exception => () })
    threads.forEach(_.interrupt())
  }
}
