package graft.streaming

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.Socket
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.Base64

import org.scalatest.funsuite.AnyFunSuite

/** The durability contract under a REAL kill: a [[BrokerMain]] child JVM
  * on a WAL dataDir is `destroyForcibly()`'d (SIGKILL — no shutdown
  * hooks, no flush) at an arbitrary moment mid-traffic, restarted on the
  * same dataDir, and the recovered state must honor the two producer /
  * consumer-visible guarantees the scaladoc promises:
  *
  *  - mid-PUBA kill: every batch whose `OK` the producer READ is fully
  *    present after restart (never lost, never partial); batches with no
  *    OK are retried whole by the producer (the at-least-once loop
  *    [[BrokerSink]] runs), so after dedup-by-payload the topic holds
  *    exactly the sent multiset — and any duplicate can only be a
  *    retried batch (the kill landed between append and reply).
  *  - mid-ACK kill: the replayed ack never exceeds what a client sent,
  *    the retention trim never passes the replayed ack, and the entire
  *    unacked suffix is still FETCHable gap-free — an ack line lost to
  *    the tear re-delivers (at-least-once), never loses.
  *
  * In-JVM coverage of replay/torn-tail/compaction determinism lives in
  * [[BrokerWalSpec]]; this spec exists because only a real SIGKILL
  * exercises a tear at an arbitrary byte boundary under concurrent load.
  */
class BrokerKillChaosSpec extends AnyFunSuite {

  private def b64(s: String): String =
    Base64.getEncoder.encodeToString(s.getBytes(StandardCharsets.UTF_8))
  private def unb64(s: String): String =
    new String(Base64.getDecoder.decode(s), StandardCharsets.UTF_8)

  /** Spawn a durable broker child JVM; returns (process, port). stderr is
    * inherited: a piped-and-undrained stderr would deadlock the child
    * behind a full pipe buffer. */
  private def spawn(dataDir: String): (Process, Int) = {
    val java = s"${System.getProperty("java.home")}/bin/java"
    val cp = System.getProperty("java.class.path")
    val p = new ProcessBuilder(
      java, "-Xmx1g", "-cp", cp, "graft.streaming.BrokerMain", dataDir)
      .redirectError(ProcessBuilder.Redirect.INHERIT)
      .start()
    val in = new BufferedReader(
      new InputStreamReader(p.getInputStream, StandardCharsets.UTF_8))
    val line = in.readLine()
    require(line != null && line.startsWith("PORT "),
      s"broker child failed to start: $line")
    (p, line.drop(5).trim.toInt)
  }

  private def stopChild(p: Process): Unit = {
    p.getOutputStream.close()
    if (!p.waitFor(5, java.util.concurrent.TimeUnit.SECONDS))
      p.destroyForcibly()
  }

  /** PUBA one batch and read its OK; returns false on any socket error /
    * missing OK (the producer's retry-whole-batch signal). */
  private def pubaBatch(port: Int, topic: String,
      payloads: Seq[String]): Boolean =
    try {
      val sock = new Socket("127.0.0.1", port)
      try {
        sock.setSoTimeout(5000)
        val out = new PrintWriter(new java.io.OutputStreamWriter(
          sock.getOutputStream, StandardCharsets.UTF_8), false)
        val in = new BufferedReader(new InputStreamReader(
          sock.getInputStream, StandardCharsets.UTF_8))
        out.println(s"PUBA $topic ${payloads.length}")
        payloads.foreach(p => out.println(b64(p)))
        out.flush()
        val resp = in.readLine()
        resp != null && resp.startsWith("OK ")
      } finally sock.close()
    } catch { case _: java.io.IOException => false }

  /** STAT + full-range FETCH of a restarted broker's retained suffix. */
  private def fetchAll(port: Int, topic: String): (Long, Long, Seq[(Long, String)]) = {
    val sock = new Socket("127.0.0.1", port)
    try {
      sock.setSoTimeout(10000)
      val out = new PrintWriter(new java.io.OutputStreamWriter(
        sock.getOutputStream, StandardCharsets.UTF_8), false)
      val in = new BufferedReader(new InputStreamReader(
        sock.getInputStream, StandardCharsets.UTF_8))
      out.println(s"STAT $topic probe"); out.flush()
      val stat = in.readLine().split("\\s+")
      assert(stat(0) == "SEQ", s"STAT answered ${stat.mkString(" ")}")
      val latest = stat(1).toLong
      // FETCH refuses trimmed ranges loudly, so start at the trim point
      out.println(s"FETCH $topic 0 1 0 $latest"); out.flush()
      val first = in.readLine()
      val (from, head) =
        if (first.startsWith("ERR fetch trimmed-below")) {
          val base = first.split("\\s+").last.toLong
          out.println(s"FETCH $topic 0 1 $base $latest"); out.flush()
          (base, in.readLine())
        } else (0L, first)
      val msgs = Seq.newBuilder[(Long, String)]
      var l = head
      while (l != null && !l.startsWith("EOF")) {
        val p = l.split("\\s+")
        assert(p(0) == "MSG", s"unexpected line: $l")
        msgs += ((p(1).toLong, unb64(p(2))))
        l = in.readLine()
      }
      (latest, from, msgs.result())
    } finally sock.close()
  }

  test("SIGKILL mid-PUBA flood + restart: no OK'd batch lost, retries dedup to the exact sent multiset") {
    val dir = Files.createTempDirectory("graft_kill_a").toString
    val (p1, port1) = spawn(dir)
    val nBatches = 400
    val batchSize = 200
    def payloadsOf(bid: Int): Seq[String] =
      (0 until batchSize).map(i => s"b$bid-i$i-${"x" * 80}")

    // producer thread: synchronous PUBA per batch, recording which OKs it
    // actually READ — the only receipts the durability claim covers
    val okRead = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val sent = new java.util.concurrent.atomic.AtomicInteger(0)
    val producer = new Thread(() => {
      var bid = 0
      var dead = false
      while (bid < nBatches && !dead) {
        sent.set(bid + 1)
        if (pubaBatch(port1, "chaos", payloadsOf(bid))) okRead.add(bid)
        else dead = true // broker gone: stop, everything unacked retries
        bid += 1
      }
    }, "chaos-producer")
    producer.start()
    // let some batches land, then SIGKILL at an arbitrary moment — the
    // producer is mid-flood, so the tear lands wherever it lands
    val deadline = System.currentTimeMillis + 20000
    while (okRead.size < 25 && System.currentTimeMillis < deadline)
      Thread.sleep(5)
    assert(okRead.size >= 25, s"flood too slow: ${okRead.size} OKs in 20s")
    p1.destroyForcibly()
    p1.waitFor()
    producer.join(20000)
    assert(!producer.isAlive, "producer never observed the kill")
    val attempted = sent.get()

    // restart on the same dataDir; retry every batch with no OK receipt
    val (p2, port2) = spawn(dir)
    try {
      val retried = (0 until attempted).filterNot(okRead.contains)
      // a fast producer can drain every batch (and read every OK) between
      // the 25-OK threshold check and destroyForcibly landing — nothing
      // is wrong with the broker then, there's just no retry to prove:
      // cancel (inconclusive) rather than fail
      if (retried.isEmpty)
        cancel("kill landed after the last OK — no retry to prove this run")
      retried.foreach { bid =>
        assert(pubaBatch(port2, "chaos", payloadsOf(bid)),
          s"retry of batch $bid failed against the restarted broker")
      }

      val (latest, from, msgs) = fetchAll(port2, "chaos")
      // seq contiguity: the retained range replays gap-free
      assert(msgs.map(_._1) == (from + 1 to latest),
        "seq gap in recovered log")
      val counts = msgs.groupBy(_._2).map { case (pl, v) => pl -> v.size }
      val expected = (0 until attempted).flatMap(payloadsOf).toSet
      // no loss: every OK'd batch payload present; retried ones too
      assert(counts.keySet == expected,
        s"payload set drift: missing=${(expected -- counts.keySet).take(3)} " +
          s"extra=${(counts.keySet -- expected).take(3)}")
      // no silent duplication: a payload can appear twice ONLY if its
      // batch was retried (OK written by the broker, never read by the
      // producer — the at-least-once window consumers dedup)
      val dup = counts.filter(_._2 > 1)
      val retriedSet = retried.toSet
      assert(dup.forall { case (pl, c) =>
        c == 2 && retriedSet.contains(pl.drop(1).takeWhile(_ != '-').toInt)
      }, s"non-retry duplicate: ${dup.take(3)}")
    } finally stopChild(p2)
  }

  test("SIGKILL mid-ACK stream + restart: ack never overshoots, trim never passes it, unacked suffix gap-free") {
    val dir = Files.createTempDirectory("graft_kill_b").toString
    val (p1, port1) = spawn(dir)
    val total = 20000
    // seed the topic fully first (all OK'd), so the kill window contains
    // ONLY ack/trim traffic
    (0 until total).grouped(1000).foreach { g =>
      assert(pubaBatch(port1, "at", g.map(i => s"m$i").toSeq))
    }
    val lastSent = new java.util.concurrent.atomic.AtomicLong(0L)
    val acker = new Thread(() => {
      try {
        val sock = new Socket("127.0.0.1", port1)
        try {
          val out = new PrintWriter(new java.io.OutputStreamWriter(
            sock.getOutputStream, StandardCharsets.UTF_8), false)
          val in = new BufferedReader(new InputStreamReader(
            sock.getInputStream, StandardCharsets.UTF_8))
          out.println("REG at s"); out.flush()
          assert(in.readLine().startsWith("OK"))
          var a = 0L
          while (a < total) {
            a += 1
            out.println(s"ACK at s $a"); out.flush()
            lastSent.set(a) // sent, not necessarily WAL'd before the kill
          }
        } finally sock.close()
      } catch { case _: java.io.IOException => () } // broker died under us
    }, "chaos-acker")
    acker.start()
    val deadline = System.currentTimeMillis + 20000
    while (lastSent.get() < 2000 && System.currentTimeMillis < deadline)
      Thread.sleep(2)
    p1.destroyForcibly()
    p1.waitFor()
    acker.join(20000)
    assert(!acker.isAlive)

    val (p2, port2) = spawn(dir)
    try {
      val (latest, from, msgs) = fetchAll(port2, "at")
      assert(latest == total.toLong, s"message loss: latest=$latest")
      // `from` is the replayed trim base; the ack that survived replay is
      // >= it (trim never passes min-ack) and <= the last ack sent
      val sock = new Socket("127.0.0.1", port2)
      val acked = try {
        sock.setSoTimeout(5000)
        val out = new PrintWriter(new java.io.OutputStreamWriter(
          sock.getOutputStream, StandardCharsets.UTF_8), false)
        val in = new BufferedReader(new InputStreamReader(
          sock.getInputStream, StandardCharsets.UTF_8))
        out.println("STAT at s"); out.flush()
        in.readLine().split("\\s+")(2).toLong
      } finally sock.close()
      assert(acked <= lastSent.get(),
        s"replayed ack $acked overshoots last sent ${lastSent.get()}")
      assert(from <= acked, s"trim $from passed the replayed ack $acked")
      // everything past the replayed ack is still deliverable, gap-free:
      // acks torn off the WAL tail re-deliver, never lose
      assert(msgs.map(_._1) == (from + 1 to latest), "gap in unacked suffix")
      assert(msgs.map(_._2) == (from until latest).map(i => s"m$i"),
        "payload drift in unacked suffix")
    } finally stopChild(p2)
  }
}
