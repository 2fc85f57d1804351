package graft

import java.nio.file.Files

import graft.streaming.{MiniBroker, SocketEventSource, StreamOps}

/** Throughput soak for the WIRE path: publishers → [[MiniBroker]] (TCP,
  * STAT/FETCH/ACK) → [[graft.sources.SocketEventsSource]] → the full
  * [[StreamOps.pipeline]] graph. [[StreamSoak]] measures the engine's
  * streaming throughput from an in-engine generator; this one puts actual
  * sockets, line framing, base64+JSON codec, and the ack protocol in the
  * data path — the honest number for the reference's deployment shape
  * (broker in the middle, README.md:16-24).
  *
  * Round-10 shape: four phases over pre-published topics (pure drain —
  * catch-up throughput with no publisher bottleneck; per-phase topics
  * keep retention/ack state independent):
  *  - `wire` ×1 and ×`shards` leases: the source drained through a
  *    stateless noop sink — the INGEST leg alone (socket + framing +
  *    base64/JSON codec), which is what the executor-parallel leases
  *    scale, and what the reference scales with flood×8 (deploy:75-76).
  *    `speedup` compares these two — the horizontal-ingest claim.
  *  - `pipeline` ×1 and ×`shards`: the full StreamOps.pipeline graph —
  *    the e2e headline. Its speedup is Amdahl-bounded by the windowed
  *    aggregation, which is lease-count-invariant (32-way parallel
  *    either way), so it reads lower than the wire speedup by design.
  *
  *  - `wire_group` (round 12): the same drain with the topic sharded
  *    across `groupW` brokers (union-of-members source composition,
  *    total lease count unchanged) — the single-broker wire leg ceilings
  *    ~1.2M msg/s at ANY lease count because the broker JVM is the
  *    limit, and this phase shows the ceiling moving with broker count.
  *    Measured at 2M msgs, 8 leases, 32 cores: 1 broker 1.21-1.28M,
  *    2 brokers 2.10M, 4 brokers 2.36M msg/s.
  *
  * Usage: `SPARK_GRAFT_CPUS=32 sbt "runMain graft.SocketSoak [nMsgs] [shards] [brokers]"`
  * Emits one JSON line (per-batch table on stderr).
  */
object SocketSoak {
  def main(args: Array[String]): Unit = {
    val nMsgs = args.headOption.map(_.toLong).getOrElse(2000000L)
    val shards = if (args.length > 1) args(1).toInt else 4
    // broker-group width for the round-12 `wire_group` phase: the
    // single-broker wire leg ceilings ~1.2M msg/s at any lease count
    // (the broker JVM, not the leases, is the limit), so the group phase
    // drains the same message count from `groupW` in-process brokers via
    // the union-of-members source composition, total leases unchanged.
    val groupW = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.local(cpus, "graft-socket-soak")

    val broker = new MiniBroker
    val port = broker.start()

    /** Publish nMsgs KnobsMessage-shaped payloads (reference
      * util/util.go:17-20) round-robin into `topic` across `members`
      * (untimed), then stream-drain them with `nParts` shard leases PER
      * MEMBER through `graph` (identity = wire-only), reading the union
      * of per-member streams. Returns (wallSecs, batches, rows). */
    def runPhaseOn(members: Seq[(MiniBroker, Int)], topic: String,
        nParts: Int,
        graph: org.apache.spark.sql.Dataset[graft.streaming.KnobEvent] =>
          org.apache.spark.sql.Dataset[_]): (Double, Int, Long) = {
      for (i <- 0L until nMsgs) {
        members((i % members.size).toInt)._1.publish(topic,
          s"""{"id":${i % 5},"n":${i % 10 + 1},"ts_us":${1704067200000000L + i * 1000L}}""")
      }
      val seen = scala.collection.mutable.LinkedHashMap.empty[Long, (Long, Long)]
      val seenLock = new Object
      import org.apache.spark.sql.streaming.StreamingQueryListener
      val listener = new StreamingQueryListener {
        override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
        override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
          val p = e.progress
          // the listener bus is async and q.stop() does not drain it: a
          // trailing event from the PREVIOUS phase's query can arrive
          // after this phase registered its listener — filter by the
          // phase's query name or it poisons the batchId dedup
          if (p.name != s"soak_$topic") return
          seenLock.synchronized {
            if (!seen.contains(p.batchId)) {
              val dur = p.durationMs.getOrDefault("triggerExecution", 0L)
              seen(p.batchId) = (p.numInputRows, dur)
              System.err.println(
                s"[socket-soak] $topic x$nParts batch ${p.batchId}: " +
                  s"${p.numInputRows} msgs in $dur ms")
            }
          }
        }
      }
      spark.streams.addListener(listener)
      val ckpt = Files.createTempDirectory(s"graft_socket_soak_$topic").toString
      val ds = members.map { case (_, p) =>
        new SocketEventSource("127.0.0.1", p, topic, s"$topic-sub",
          maxRowsPerBatch = 500000L, numPartitions = nParts).stream(spark)
      }.reduce(_ unionByName _)
      val wall0 = System.nanoTime()
      val q = graph(ds)
        .writeStream
        .queryName(s"soak_$topic")
        .format("noop")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
      while (q.exception.isEmpty &&
          seenLock.synchronized(seen.values.map(_._1).sum) < nMsgs) {
        Thread.sleep(100)
      }
      val wallSecs = (System.nanoTime() - wall0) / 1e9
      q.stop()
      q.awaitTermination()
      spark.streams.removeListener(listener)
      q.exception.foreach(throw _)
      val rows = seenLock.synchronized(seen.values.map(_._1).sum)
      (wallSecs, seenLock.synchronized(seen.size), rows)
    }

    val wireGraph = (ds: org.apache.spark.sql.Dataset[graft.streaming.KnobEvent]) => ds
    val pipeGraph = (ds: org.apache.spark.sql.Dataset[graft.streaming.KnobEvent]) =>
      StreamOps.pipeline(ds)

    // one-lease baselines first, then the sharded runs: same message
    // count, separate topics (retention/ack state independent)
    // distinct per-phase topic names even for shards=1 — reusing a
    // topic+subscription would inherit the earlier phase's ack/retention
    // state and re-deliver its unacked tail into the next measurement
    val one = Seq((broker, port))
    val (ww1, _, wr1) = runPhaseOn(one, "wire_one", 1, wireGraph)
    val (wwN, _, wrN) = runPhaseOn(one, "wire_many", shards, wireGraph)
    // the group phase: same total lease count spread across groupW
    // brokers — past the single-JVM broker ceiling via scale-OUT, not
    // more leases
    val group = Seq.fill(math.max(1, groupW) - 1)(new MiniBroker)
      .map(b => (b, b.start())) :+ ((broker, port))
    val (wwG, _, wrG) = runPhaseOn(group, "wire_group",
      math.max(1, shards / group.size), wireGraph)
    val (pw1, _, pr1) = runPhaseOn(one, "pipe_one", 1, pipeGraph)
    val (pwN, bN, prN) = runPhaseOn(one, "pipe_many", shards, pipeGraph)
    group.foreach(_._1.stop()) // includes `broker`

    def rate(rows: Long, secs: Double): Long = (rows / secs).round
    val wire1 = rate(wr1, ww1)
    val wireN = rate(wrN, wwN)
    val wireG = rate(wrG, wwG)
    val pipe1 = rate(pr1, pw1)
    val pipeN = rate(prN, pwN)
    val speedup = wireN.toDouble / wire1
    val groupSpeedup = wireG.toDouble / wireN
    val line =
      s"""{"metric":"socket_soak_msgs_per_sec","value":$pipeN,"unit":"msgs/sec","shards":$shards,"wire_msgs_per_sec":$wireN,"wire_one_lease_msgs_per_sec":$wire1,"wire_speedup":${"%.2f".formatLocal(java.util.Locale.ROOT, speedup)},"wire_group_msgs_per_sec":$wireG,"wire_group_brokers":${group.size},"wire_group_speedup":${"%.2f".formatLocal(java.util.Locale.ROOT, groupSpeedup)},"pipeline_one_lease_msgs_per_sec":$pipe1,"msgs":$prN,"wall_secs":${"%.1f".formatLocal(java.util.Locale.ROOT, pwN)},"batches":$bN,"cpus":$cpus}"""
    System.err.println(line)
    println(line)
    spark.stop()
  }
}
