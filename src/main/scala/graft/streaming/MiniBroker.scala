package graft.streaming

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.{InetAddress, ServerSocket, Socket, SocketException}
import java.nio.charset.StandardCharsets
import java.util.Base64
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

import scala.collection.mutable.ArrayBuffer

/** In-process message broker speaking a line-based wire protocol — the
  * local twin of the reference's topic/subscription service surface
  * (reference util/util.go:25-43 `GetOrCreateTopic`, :45-70
  * `GetOrCreateSubscription`; flood.go:59-85 `Receive` + `m.Ack()`).
  * Nothing here is Spark-specific: it is the *other end of the wire* that
  * [[graft.sources.SocketEventsSource]] connects to, so the connector's
  * protocol handling (framing, re-delivery, cumulative ack) is exercised
  * over a real TCP socket rather than an in-JVM queue.
  *
  * Protocol (UTF-8 lines):
  *  - client → `SUB <topic> <subscription>` — get-or-create both (the
  *    util.go:45-70 chain), then the broker pushes every retained message
  *    with seq > the subscription's cumulative ack, followed by live
  *    messages as they arrive. Push-with-ack is exactly the reference's
  *    Receive-callback contract.
  *  - broker → `MSG <seq> <base64-payload>` — seqs are topic-stable and
  *    1-based, so re-delivery after a reconnect carries the SAME seq: the
  *    consumer can dedup client-side while the broker stays simple.
  *  - client → `ACK <subscription> <seq>` — CUMULATIVE: everything ≤ seq
  *    is done. The reference acks per message inside the callback; a
  *    batch consumer acks once per committed epoch — same at-least-once
  *    contract, coarser grain.
  *  - client → `PUB <topic> <base64-payload>` — publish over the wire
  *    (tests may also use [[publish]] in-process).
  *
  * Retention is unbounded for the broker's lifetime (test-scale); a
  * production broker trims below min-ack across subscriptions — the
  * protocol already carries everything needed for that.
  */
class MiniBroker {
  private final class Topic {
    val seq = new AtomicLong(0L)
    val log = new ArrayBuffer[(Long, String)]() // (seq, base64 payload)
  }
  private final class Sub(val topic: String) {
    val acked = new AtomicLong(0L)
  }

  private val topics = new ConcurrentHashMap[String, Topic]()
  private val subs = new ConcurrentHashMap[String, Sub]()
  private val running = new AtomicBoolean(false)
  @volatile private var server: ServerSocket = _

  private def topic(name: String): Topic =
    topics.computeIfAbsent(name, _ => new Topic)

  /** In-process publish (what a test harness uses). Returns the seq. */
  def publish(topicName: String, payload: String): Long = {
    val t = topic(topicName)
    val b64 = Base64.getEncoder.encodeToString(
      payload.getBytes(StandardCharsets.UTF_8))
    t.log.synchronized {
      val s = t.seq.incrementAndGet()
      t.log += ((s, b64))
      t.log.notifyAll()
      s
    }
  }

  /** Cumulative ack position of a subscription (0 if none). */
  def ackedSeq(subscription: String): Long =
    Option(subs.get(subscription)).map(_.acked.get()).getOrElse(0L)

  def start(): Int = {
    server = new ServerSocket(0, 64, InetAddress.getLoopbackAddress)
    running.set(true)
    val acceptor = new Thread(() => {
      while (running.get()) {
        try {
          val sock = server.accept()
          val t = new Thread(() => handle(sock), "mini-broker-conn")
          t.setDaemon(true)
          t.start()
        } catch { case _: SocketException => () /* closed */ }
      }
    }, "mini-broker-accept")
    acceptor.setDaemon(true)
    acceptor.start()
    server.getLocalPort
  }

  def stop(): Unit = {
    running.set(false)
    if (server != null) server.close()
  }

  /** One connection: a blocking reader thread for verbs; the first SUB
    * spawns a dedicated push thread that owns the output stream (the
    * reference's Receive is also a push loop — flood.go:59). Separate
    * threads avoid the partial-line loss a read-timeout poll risks.
    */
  private def handle(sock: Socket): Unit = {
    val in = new BufferedReader(
      new InputStreamReader(sock.getInputStream, StandardCharsets.UTF_8))
    val out = new PrintWriter(sock.getOutputStream, false)
    val closed = new AtomicBoolean(false)
    try {
      var line = in.readLine()
      while (running.get() && line != null) {
        val parts = line.trim.split("\\s+")
        parts(0) match {
          case "SUB" if parts.length == 3 =>
            topic(parts(1)) // get-or-create topic first (util.go chain)
            val sub = subs.computeIfAbsent(parts(2), _ => new Sub(parts(1)))
            val pusher = new Thread(() => push(sub, out, closed),
              "mini-broker-push")
            pusher.setDaemon(true)
            pusher.start()
          case "ACK" if parts.length == 3 =>
            Option(subs.get(parts(1))).foreach { s =>
              val v = parts(2).toLong
              s.acked.updateAndGet(prev => math.max(prev, v))
            }
          case "PUB" if parts.length == 3 =>
            val t = topic(parts(1))
            t.log.synchronized {
              val s = t.seq.incrementAndGet()
              t.log += ((s, parts(2)))
              t.log.notifyAll()
            }
          case _ => () // blank keep-alive or unknown verb: ignore
        }
        line = in.readLine()
      }
    } catch {
      case _: SocketException => () // peer reset
    } finally {
      closed.set(true)
      try sock.close() catch { case _: Throwable => () }
    }
  }

  /** Push loop: stream every retained message with seq > the sub's ack
    * (re-delivery), then live messages as they land. Owns `out`. */
  private def push(sub: Sub, out: PrintWriter,
      closed: AtomicBoolean): Unit = {
    val t = topic(sub.topic)
    var cursor = sub.acked.get() // re-delivery starts after the ack
    try {
      while (running.get() && !closed.get() && !out.checkError()) {
        // seqs are contiguous and 1-based per topic, so seq s lives at
        // log index s-1 — the pending suffix is an O(pending) slice, not
        // an O(log) rescan (which would be quadratic over a soak run)
        val pending = t.log.synchronized {
          if (t.log.length <= cursor) { t.log.wait(50); Array.empty[(Long, String)] }
          else t.log.slice(cursor.toInt, t.log.length).toArray
        }
        if (pending.nonEmpty) {
          pending.foreach { case (s, b64) => out.println(s"MSG $s $b64") }
          out.flush()
          cursor = pending.last._1
        }
      }
    } catch { case _: InterruptedException => () }
  }
}
