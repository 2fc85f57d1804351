package graft

import java.io.{BufferedReader, BufferedWriter, InputStreamReader, OutputStreamWriter}
import java.net.Socket
import java.nio.charset.StandardCharsets
import java.util.Base64

import graft.streaming.BrokerGroup

/** Multi-process broker scale-out soak (round-10 verdict task #2, carried
  * through round 11): the single-JVM MiniBroker write path ceilings at
  * ~1.06M msg/s — every producer serializes on one topic log's monitor
  * inside one heap. This soak demonstrates the horizontal path the
  * reference actually deploys (topic service replicas, deploy:34-77):
  *
  *   N REAL broker JVMs (spawned [[graft.streaming.BrokerMain]]
  *   processes) × P producer sockets, topic sharded across members by
  *   [[BrokerGroup]] routing — producer p floods member p % N over TCP
  *   with PUBB batches.
  *
  * Phases: 1-broker baseline, then N-broker, same total message count and
  * producer count. `speedup` is the headline — the done-bar is ≥1.5× at
  * N=2, i.e. the ceiling is the JVM (lock + heap + accept loop), not the
  * protocol, so capacity scales by adding members. Completion is
  * confirmed by [[BrokerGroup.statAll]]: Σ member seqs must equal the
  * published count before the clock stops (PUBB has no per-batch ack, so
  * producer-side completion alone would under-measure).
  *
  * No Spark in this soak: it isolates the broker tier the way the wire
  * soaks isolate ingest. Usage:
  * `sbt "runMain graft.BrokerScaleSoak [nMsgs] [maxBrokers] [producers] [dataRoot[,dataRoot2…] [sync]]"`
  * (non-empty dataRoot ⇒ durable children — see the field note below;
  * comma-separated roots give member i its own volume, roots(i % n) —
  * the per-member-volume deployment shape; a literal 5th arg `sync`
  * adds fdatasync per PUBB chunk: the power-loss-durable ingest price).
  */
object BrokerScaleSoak {
  def main(args: Array[String]): Unit = {
    // default sized for the stable regime: at 4M msgs a phase lasts
    // ~0.5 s and JVM warm-up noise dominates (measured 1.41× at 4M vs
    // 2.89× at 20M for the same 2-broker config)
    val nMsgs = args.headOption.map(_.toLong).getOrElse(20000000L)
    val maxBrokers = if (args.length > 1) args(1).toInt else 2
    val producers = if (args.length > 2) args(2).toInt else 8
    // non-empty 4th arg: DURABLE broker children (per-child WAL dirs
    // under dataRoot, fresh per phase — a reused dir would replay the
    // previous phase's log into the next phase's baseline). This is the
    // durability-priced write-path number the round-15 verdict asked
    // for: same wire, same batches, plus one WAL flush per PUBB chunk.
    // FRESHNESS IS ENFORCED, not hoped for: dirs nest under a per-run
    // pid+nanos segment, so neither a phase-label collision (maxBrokers=1
    // reuses "phase1") nor the documented back-to-back A/B workflow can
    // hand a child a previous run's multi-GB WAL to replay (the child
    // would OOM in readAllBytes or start with millions of retained
    // messages and the parent would hang on its PORT line). Best-effort
    // deleted at exit — a 20M-msg run leaves ~1.3 GB per broker behind.
    // Round-17 (r16 verdict #1 "What's missing"): the 4th arg may be a
    // COMMA-SEPARATED list of roots — member i writes under
    // roots(i % roots.length). One root = the r16 shared-device
    // configuration; two roots (e.g. `/tmp/soak,/dev/shm/soak`) give each
    // member its own volume, emulating the "per-member volumes"
    // deployment guidance on a one-disk sandbox: tmpfs isolates member
    // 1's write traffic from the ext4 device entirely, so the measured
    // A/B pins that the shared-device kernel-writeback-throttle collapse
    // is DEVICE contention, not a software ceiling. (tmpfs is the upper
    // bound of an isolated volume — the claim demonstrated is the
    // collapse mode's absence, not an exact 2-disk speedup.)
    val runRoots: Seq[java.nio.file.Path] = args.lift(3).filter(_.nonEmpty)
      .map(_.split(',').toSeq.filter(_.nonEmpty).map(SoakDirs.freshRunRoot))
      .getOrElse(Seq.empty)
    val durable = runRoots.nonEmpty
    // `sync` is only meaningful with a dataRoot (r16 advisor): with an
    // empty-string args(3) the child would get Seq("0","sync") — "0" as
    // its dataDir and "sync" parsed as a port — die on NumberFormat, and
    // the parent would block forever on its PORT line. Fail fast instead.
    val walSync = args.length > 4 && args(4) == "sync"
    require(!walSync || durable,
      "sync requires a non-empty dataRoot (arg 4): a memory-only broker " +
        "has no WAL to fdatasync")
    val batch = 10000

    /** Spawn k broker JVMs; returns (processes, endpoints). */
    def spawn(k: Int, phaseLabel: String): (Seq[Process], Seq[(String, Int)]) = {
      val javaBin = s"${System.getProperty("java.home")}/bin/java"
      val cp = System.getProperty("java.class.path")
      val started = (0 until k).map { i =>
        val childArgs = (if (durable) {
          val d = runRoots(i % runRoots.size).resolve(s"$phaseLabel-b$i")
          java.nio.file.Files.createDirectories(d)
          Seq(d.toString)
        } else Seq.empty) ++ (if (walSync) Seq("0", "sync") else Seq.empty)
        val p = new ProcessBuilder(
          (Seq(javaBin, "-Xmx4g", "-cp", cp, "graft.streaming.BrokerMain") ++
            childArgs): _*)
          .redirectErrorStream(false)
          .start()
        val in = new BufferedReader(
          new InputStreamReader(p.getInputStream, StandardCharsets.UTF_8))
        val line = in.readLine()
        require(line != null && line.startsWith("PORT "),
          s"broker child failed to start: $line")
        (p, ("127.0.0.1", line.drop(5).trim.toInt))
      }
      (started.map(_._1), started.map(_._2))
    }

    // ONE payload reused for every message: the soak measures broker
    // ingest (socket read + append under the log lock), not producer-side
    // string formatting — and both phases reuse it identically.
    val payload = Base64.getEncoder.encodeToString(
      """{"id":3,"n":7,"ts_us":1704067200000000}"""
        .getBytes(StandardCharsets.UTF_8))

    /** Flood `nMsgs` across the group from `producers` threads; returns
      * wall secs from first byte to Σ member seqs == nMsgs. */
    def flood(endpoints: Seq[(String, Int)], topic: String): Double = {
      val group = new BrokerGroup(endpoints)
      val perProducer = nMsgs / producers
      val remainder = nMsgs - perProducer * producers
      val t0 = System.nanoTime()
      val threads = (0 until producers).map { p =>
        val t = new Thread(() => {
          val (host, port) = endpoints(p % endpoints.size)
          val sock = new Socket(host, port)
          sock.setTcpNoDelay(false)
          val out = new BufferedWriter(new OutputStreamWriter(
            sock.getOutputStream, StandardCharsets.UTF_8), 1 << 16)
          var left = perProducer + (if (p == 0) remainder else 0L)
          while (left > 0) {
            val n = math.min(left, batch.toLong).toInt
            out.write(s"PUBB $topic $n\n")
            var i = 0
            while (i < n) { out.write(payload); out.write("\n"); i += 1 }
            left -= n
          }
          out.flush()
          sock.close()
        }, s"producer-$p")
        t.start()
        t
      }
      threads.foreach(_.join())
      // producers returned when bytes were WRITTEN; the clock stops when
      // every member has APPENDED its slice
      var published = group.statAll(topic, "probe")._1
      while (published < nMsgs) {
        Thread.sleep(20)
        published = group.statAll(topic, "probe")._1
      }
      val secs = (System.nanoTime() - t0) / 1e9
      require(published == nMsgs,
        s"published $published != expected $nMsgs (duplicated batch?)")
      group.close()
      secs
    }

    def phase(k: Int): Long = {
      val (procs, endpoints) = spawn(k, s"phase$k")
      try {
        val secs = flood(endpoints, "scale")
        (nMsgs / secs).round
      } finally {
        procs.foreach { p =>
          p.getOutputStream.close() // stdin EOF → broker exits
          if (!p.waitFor(5, java.util.concurrent.TimeUnit.SECONDS))
            p.destroyForcibly()
        }
        // Durable phases leave ~nMsgs×lineBytes of DIRTY pages (WAL
        // flush ≠ fsync): without a barrier the NEXT phase runs inside
        // the kernel's writeback throttle paying this phase's debt —
        // measured as a bogus 0.57× "negative scale-out" at 20M msgs
        // (phase 2 durable slower than phase 1) on a device that
        // handles two concurrent sequential writers at full rate. Each
        // phase must pay for its own bytes.
        if (durable) {
          new ProcessBuilder("sync").inheritIO().start().waitFor()
          Thread.sleep(1000)
        }
      }
    }

    val (one, many) =
      try (phase(1), phase(maxBrokers))
      // best-effort reclaim of this run's WAL bytes (children are dead
      // by here; a failure just leaves the uniquely-named dirs behind)
      finally runRoots.foreach(SoakDirs.deleteRecursively)
    val speedup = many.toDouble / one
    val volumes = runRoots.map(r => "\"" + r.getParent + "\"")
      .mkString("[", ",", "]")
    val line =
      s"""{"metric":"broker_scaleout_msgs_per_sec","value":$many,"unit":"msgs/sec","brokers":$maxBrokers,"one_broker_msgs_per_sec":$one,"speedup":${"%.2f".formatLocal(java.util.Locale.ROOT, speedup)},"msgs":$nMsgs,"producers":$producers,"durable":$durable,"wal_sync":$walSync,"volumes":$volumes}"""
    System.err.println(line)
    println(line)
  }
}
