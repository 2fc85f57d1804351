package graft.streaming

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.Socket
import java.nio.charset.StandardCharsets
import java.util.Base64

import org.scalatest.funsuite.AnyFunSuite

/** Raw wire-protocol coverage of [[MiniBroker]] — the behaviors the
  * round-9 verdict/advice asked for, asserted at the socket level with no
  * Spark in the loop: (topic, subscription) keying, retention trim below
  * min-ack with re-delivery of every unacked seq, the trim-aware start of
  * late subscriptions, the one-pusher-per-connection guard, and the
  * FETCH range/shard contract (disjoint slices, loud refusal of trimmed
  * ranges).
  */
class MiniBrokerSpec extends AnyFunSuite {

  private def b64(s: String): String =
    Base64.getEncoder.encodeToString(s.getBytes(StandardCharsets.UTF_8))
  private def unb64(s: String): String =
    new String(Base64.getDecoder.decode(s), StandardCharsets.UTF_8)

  /** Minimal test client: send lines, read lines with a deadline. */
  private final class Cli(port: Int) {
    private val sock = new Socket("127.0.0.1", port)
    sock.setSoTimeout(5000)
    private val out = new PrintWriter(sock.getOutputStream, false)
    private val in = new BufferedReader(
      new InputStreamReader(sock.getInputStream, StandardCharsets.UTF_8))
    def send(l: String): Unit = { out.println(l); out.flush() }
    def read(): String = in.readLine()
    /** Read until `p` matches or n lines consumed; returns all lines. */
    def readUntil(n: Int)(p: String => Boolean): Seq[String] = {
      val got = Seq.newBuilder[String]
      var i = 0
      var done = false
      while (i < n && !done) {
        val l = in.readLine()
        if (l == null) done = true
        else { got += l; if (p(l)) done = true; i += 1 }
      }
      got.result()
    }
    def close(): Unit = sock.close()
  }

  test("subscriptions are keyed by (topic, subscription): same name, two topics, independent state") {
    val broker = new MiniBroker
    val port = broker.start()
    try {
      for (i <- 1 to 5) broker.publish("topicA", s"a$i")
      for (i <- 1 to 3) broker.publish("topicB", s"b$i")

      val ca = new Cli(port)
      val cb = new Cli(port)
      try {
        ca.send("SUB topicA shared")
        cb.send("SUB topicB shared")
        val msgsA = ca.readUntil(10)(_.endsWith(b64("a5")))
        val msgsB = cb.readUntil(10)(_.endsWith(b64("b3")))
        assert(msgsA.map(l => unb64(l.split("\\s+")(2))) ==
          (1 to 5).map(i => s"a$i"), s"topicA stream wrong: $msgsA")
        assert(msgsB.map(l => unb64(l.split("\\s+")(2))) ==
          (1 to 3).map(i => s"b$i"), s"topicB stream wrong: $msgsB")

        // acking one must not move the other (the round-9 name-collision
        // bug shared one ack cell across topics)
        ca.send("ACK topicA shared 5")
        Thread.sleep(200)
        assert(broker.ackedSeq("topicA", "shared") == 5L)
        assert(broker.ackedSeq("topicB", "shared") == 0L)
      } finally { ca.close(); cb.close() }
    } finally broker.stop()
  }

  test("retention trims below min-ack; re-delivery still honors the laggiest unacked seq") {
    val broker = new MiniBroker
    val port = broker.start()
    try {
      for (i <- 1 to 100) broker.publish("tt", s"m$i")
      val c = new Cli(port)
      try {
        // register BOTH subscriptions before any ack: retention only
        // protects subscriptions that exist (a sub born later starts at
        // the trim point — asserted below), so u2 must be known before
        // u1's ack or the min would be over {u1} alone. Registration is
        // the explicit REG admin verb — STAT is a pure read now.
        c.send("REG tt u1"); assert(c.read() == "OK 0")
        c.send("REG tt u2"); assert(c.read() == "OK 0")
        c.send("STAT tt u1"); assert(c.read() == "SEQ 100 0")
        // two subscriptions at different acks: trim follows the MINIMUM
        c.send("ACK tt u1 60")
        c.send("ACK tt u2 40")
        Thread.sleep(200)
        assert(broker.trimmedBelow("tt") == 40L,
          s"trim point ${broker.trimmedBelow("tt")}")
        assert(broker.retainedCount("tt") == 60)

        // the laggiest sub catches up → trim advances to the next min
        c.send("ACK tt u2 100")
        Thread.sleep(200)
        assert(broker.trimmedBelow("tt") == 60L)
        assert(broker.retainedCount("tt") == 40)

        // re-SUB of u1 must receive exactly its unacked suffix 61..100 —
        // the trim never passed u1's ack, so nothing it still needs is
        // gone
        val c2 = new Cli(port)
        try {
          c2.send("SUB tt u1")
          val msgs = c2.readUntil(50)(_.endsWith(b64("m100")))
          assert(msgs.map(l => unb64(l.split("\\s+")(2))) ==
            (61 to 100).map(i => s"m$i"), s"re-delivery wrong: $msgs")
        } finally c2.close()

        // a subscription born after the trim starts at the trim point:
        // REG answers acked=60, not 0 (it cannot be served 1..60) —
        // while a STAT of a name nobody registered stays a pure read
        c.send("STAT tt late"); assert(c.read() == "SEQ 100 0")
        c.send("REG tt late"); assert(c.read() == "OK 60")
        c.send("STAT tt late"); assert(c.read() == "SEQ 100 60")
      } finally c.close()
    } finally broker.stop()
  }

  test("PUBB bulk publish assigns contiguous seqs and delivers like per-message PUB") {
    val broker = new MiniBroker
    val port = broker.start()
    try {
      val c = new Cli(port)
      try {
        c.send("PUB tb " + b64("one"))
        c.send("PUBB tb 3")
        c.send(b64("two")); c.send(b64("three")); c.send(b64("four"))
        c.send("PUB tb " + b64("five"))
        val sub = new Cli(port)
        try {
          sub.send("SUB tb s")
          val msgs = sub.readUntil(10)(_.endsWith(b64("five")))
          assert(msgs.map(_.split("\\s+")(1).toLong) == (1L to 5L),
            s"seqs not contiguous across PUB/PUBB: $msgs")
          assert(msgs.map(l => unb64(l.split("\\s+")(2))) ==
            Seq("one", "two", "three", "four", "five"),
            s"bulk payloads mangled: $msgs")
        } finally sub.close()
      } finally c.close()
    } finally broker.stop()
  }

  test("second SUB on one connection is refused, not a duplicate pusher") {
    val broker = new MiniBroker
    val port = broker.start()
    try {
      for (i <- 1 to 3) broker.publish("tp", s"p$i")
      val c = new Cli(port)
      try {
        c.send("SUB tp s1")
        val first = c.readUntil(5)(_.endsWith(b64("p3")))
        assert(first.length == 3)
        // refuse a second SUB even under a DIFFERENT sub name — and the
        // refusal must NOT register the name: a phantom (topic, sub)
        // entry with a frozen ack would pin the topic's retention trim
        // forever
        c.send("SUB tp s2")
        // the only new line must be the refusal — a second pusher would
        // re-deliver p1..p3 interleaved into the same writer
        assert(c.read() == "ERR already-subscribed")
        broker.publish("tp", "p4")
        val next = c.readUntil(3)(_.endsWith(b64("p4")))
        assert(next.length == 1, s"duplicate stream detected: $next")
        c.send("ACK tp s1 4")
        Thread.sleep(200)
        assert(broker.trimmedBelow("tp") == 4L,
          "refused SUB registered a phantom sub and pinned the trim")
      } finally c.close()
    } finally broker.stop()
  }

  test("malformed verb arguments answer ERR and keep the connection alive") {
    val broker = new MiniBroker
    val port = broker.start()
    try {
      for (i <- 1 to 4) broker.publish("te", s"e$i")
      val c = new Cli(port)
      try {
        c.send("FETCH te 0 0 0 4") // zero shards
        assert(c.read().startsWith("ERR fetch bad-shard"))
        c.send("FETCH te x 1 0 4") // non-numeric shard
        assert(c.read().startsWith("ERR bad-request"))
        // the handler survived both — a valid request still works
        c.send("FETCH te 0 1 0 4")
        val msgs = c.readUntil(10)(_.startsWith("EOF"))
        assert(msgs.count(_.startsWith("MSG")) == 4,
          s"connection unusable after bad requests: $msgs")
      } finally c.close()
    } finally broker.stop()
  }

  test("FETCH serves disjoint shard slices whose union is the range; trimmed ranges are refused") {
    val broker = new MiniBroker
    val port = broker.start()
    try {
      for (i <- 1 to 10) broker.publish("tf", s"f$i")
      val c = new Cli(port)
      try {
        def fetch(shard: Int, n: Int, after: Long, upTo: Long): Seq[Long] = {
          c.send(s"FETCH tf $shard $n $after $upTo")
          c.readUntil(20)(_.startsWith("EOF"))
            .filter(_.startsWith("MSG")).map(_.split("\\s+")(1).toLong)
        }
        val s0 = fetch(0, 2, 0, 10)
        val s1 = fetch(1, 2, 0, 10)
        assert(s0 == Seq(2L, 4L, 6L, 8L, 10L), s"shard 0: $s0")
        assert(s1 == Seq(1L, 3L, 5L, 7L, 9L), s"shard 1: $s1")

        // sub-range with numShards=1 is the plain range read
        assert(fetch(0, 1, 3, 7) == Seq(4L, 5L, 6L, 7L))

        // trim 1..6, then a fetch starting below the trim point must be
        // refused loudly (a silently partial slice would break
        // at-least-once). The sub must be REGistered first — ACK never
        // creates.
        c.send("REG tf u"); assert(c.read() == "OK 0")
        c.send("ACK tf u 6")
        Thread.sleep(200)
        assert(broker.trimmedBelow("tf") == 6L)
        c.send("FETCH tf 0 1 3 9")
        assert(c.read().startsWith("ERR fetch trimmed-below"))
        // while a fetch above it still works
        assert(fetch(0, 1, 6, 10) == Seq(7L, 8L, 9L, 10L))
      } finally c.close()
    } finally broker.stop()
  }

  test("SUB validates its shard pair; a rejected SUB doesn't poison the connection") {
    val broker = new MiniBroker
    val port = broker.start()
    try {
      broker.publish("ts", "m1")
      val c = new Cli(port)
      try {
        // nShards=0 used to pass validation and kill the pusher thread
        // with an uncaught division — the client then waited forever on
        // a silently dead stream
        c.send("SUB ts s 0 0")
        assert(c.read().startsWith("ERR sub bad-shard"))
        // shard >= nShards likewise streams nothing, silently
        c.send("SUB ts s 5 2")
        assert(c.read().startsWith("ERR sub bad-shard"))
        // a malformed pair used to flip the one-pusher guard BEFORE
        // parsing, so the retry answered already-subscribed forever
        c.send("SUB ts s x y")
        assert(c.read().startsWith("ERR bad-request"))
        // the corrected SUB on the SAME connection must now stream
        c.send("SUB ts s 0 1")
        val got = c.readUntil(3)(_.startsWith("MSG"))
        assert(got.exists(_.startsWith("MSG 1 ")),
          s"valid SUB after rejected ones did not stream: $got")
      } finally c.close()
    } finally broker.stop()
  }

  test("PUBB with a non-numeric count drops the connection like out-of-range") {
    val broker = new MiniBroker
    val port = broker.start()
    try {
      val c = new Cli(port)
      try {
        // the generic bad-request path would keep the connection and
        // misread the payload lines that follow as verbs
        c.send("PUBB tn 3x")
        assert(c.read().startsWith("ERR pubb-count"))
        assert(c.read() == null, "connection survived an unparseable PUBB")
      } finally c.close()
      assert(broker.retainedCount("tn") == 0)
    } finally broker.stop()
  }

  test("PUBB with an absurd count answers ERR instead of allocating (round-11 ADVICE)") {
    val broker = new MiniBroker
    val port = broker.start()
    try {
      val c = new Cli(port)
      try {
        // 2 billion declared lines: a trusting broker would allocate a
        // multi-GB array before reading a single payload byte
        c.send("PUBB tb 2000000000")
        assert(c.read().startsWith("ERR pubb-count"),
          "bogus batch count was not refused")
        // the verb stream is unavoidably desynced (the client believes
        // it owes payload lines), so the broker drops the connection
        assert(c.read() == null, "connection survived a desynced PUBB")
      } finally c.close()
      // negative counts refuse the same way, and the broker still works
      val c2 = new Cli(port)
      try {
        c2.send("PUBB tb -1")
        assert(c2.read().startsWith("ERR pubb-count"))
      } finally c2.close()
      val c3 = new Cli(port)
      try {
        c3.send("PUBB tb 2")
        c3.send(b64("p1")); c3.send(b64("p2"))
        c3.send("STAT tb x"); assert(c3.read() == "SEQ 2 0")
      } finally c3.close()
      assert(broker.retainedCount("tb") == 2)
    } finally broker.stop()
  }

  test("PUBB short read drops the partial batch instead of publishing it") {
    val broker = new MiniBroker
    val port = broker.start()
    try {
      val c = new Cli(port)
      c.send("PUBB ts 5")
      c.send(b64("only")); c.send(b64("two"))
      c.close() // peer dies mid-batch
      Thread.sleep(300)
      // an at-least-once producer re-sends the WHOLE batch on reconnect,
      // so publishing the orphaned prefix would guarantee duplicates the
      // producer cannot reason about
      assert(broker.retainedCount("ts") == 0,
        "partial PUBB batch was published")
    } finally broker.stop()
  }

  test("STAT and ACK never create subscriptions; REG does, at the trim point") {
    val broker = new MiniBroker
    val port = broker.start()
    try {
      for (i <- 1 to 10) broker.publish("tg", s"g$i")
      val c = new Cli(port)
      try {
        // a mistyped STAT is a pure read: SEQ answers, nothing registers
        c.send("STAT tg phantom"); assert(c.read() == "SEQ 10 0")
        // an ACK against an unknown name refuses instead of minting a
        // retention-pinning entry
        c.send("ACK tg ghost 5")
        assert(c.read().startsWith("ERR unknown-subscription"))
        // the real subscription: REG, ack everything, trim follows the
        // ONLY registered sub — neither phantom nor ghost pins it
        c.send("REG tg real"); assert(c.read() == "OK 0")
        c.send("ACK tg real 10")
        Thread.sleep(200)
        assert(broker.trimmedBelow("tg") == 10L,
          "a phantom subscription pinned the retention trim")
        // REG after the trim starts at the trim point (the dropped
        // prefix cannot be re-delivered to anyone), and REG is
        // idempotent for the existing sub
        c.send("REG tg late"); assert(c.read() == "OK 10")
        c.send("REG tg real"); assert(c.read() == "OK 10")
      } finally c.close()
    } finally broker.stop()
  }
}
