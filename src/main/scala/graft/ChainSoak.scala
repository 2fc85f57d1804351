package graft

import java.nio.file.Files

import graft.streaming.{BrokerSink, MiniBroker, SocketEventSource, StreamOps}

/** Two-deployment topology soak: the reference's stages compose THROUGH
  * broker topics (knobs publishes what flood consumes, deploy:75-76), so
  * this measures that exact shape end-to-end in the engine —
  *
  *   pre-published topic `in`
  *     → stage A (Spark streaming query #1): wire source (shard FETCH
  *       leases) → relay → [[BrokerSink]] publish to topic `mid`
  *       (executor-parallel PUB, one socket per partition)
  *     → stage B (Spark streaming query #2): wire source on `mid` →
  *       the full [[StreamOps.pipeline]] graph → noop
  *
  * Every message crosses the wire TWICE (FETCH into A, PUB out of A,
  * FETCH into B) plus two full base64+JSON codec round-trips — the
  * honest cost of composing two independently-scaled jobs the way the
  * reference composes its deployments. Reported as end-to-end msgs/sec
  * from stage A's start until stage B has ingested everything.
  *
  * Usage: `SPARK_GRAFT_CPUS=32 sbt "runMain graft.ChainSoak [nMsgs] [shards]"`
  */
object ChainSoak {
  def main(args: Array[String]): Unit = {
    val nMsgs = args.headOption.map(_.toLong).getOrElse(1000000L)
    val shards = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.local(cpus, "graft-chain-soak")

    val broker = new MiniBroker
    val port = broker.start()
    for (i <- 0L until nMsgs) {
      broker.publish("in",
        s"""{"id":${i % 5},"n":${i % 10 + 1},"ts_us":${1704067200000000L + i * 1000L}}""")
    }

    val rowsB = new java.util.concurrent.atomic.AtomicLong(0L)
    // (rows, triggerMs) per B batch after batch 0 — batch 0 pays both
    // queries' stream init, so the steady rate excludes it (the
    // SocketSoak convention)
    val steadyRows = new java.util.concurrent.atomic.AtomicLong(0L)
    val steadyMs = new java.util.concurrent.atomic.AtomicLong(0L)
    import org.apache.spark.sql.streaming.StreamingQueryListener
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        if (e.progress.name == "chain_b") {
          rowsB.addAndGet(e.progress.numInputRows)
          val dur = e.progress.durationMs.getOrDefault("triggerExecution", 0L)
          if (e.progress.batchId > 0 && e.progress.numInputRows > 0) {
            steadyRows.addAndGet(e.progress.numInputRows)
            steadyMs.addAndGet(dur)
          }
          System.err.println(s"[chain-soak] B batch ${e.progress.batchId}: " +
            s"${e.progress.numInputRows} msgs ($dur ms)")
        }
      }
    }
    spark.streams.addListener(listener)

    val wall0 = System.nanoTime()
    val srcA = new SocketEventSource("127.0.0.1", port, "in", "a-sub",
      maxRowsPerBatch = 500000L, numPartitions = shards)
    val qa = BrokerSink.publishTo("127.0.0.1", port, "mid")(srcA.stream(spark))
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft_chain_a").toString)
      .start()
    val srcB = new SocketEventSource("127.0.0.1", port, "mid", "b-sub",
      maxRowsPerBatch = 500000L, numPartitions = shards)
    val qb = StreamOps.pipeline(srcB.stream(spark))
      .writeStream
      .queryName("chain_b")
      .format("noop")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft_chain_b").toString)
      .start()

    while (qa.exception.isEmpty && qb.exception.isEmpty &&
        rowsB.get() < nMsgs) {
      Thread.sleep(100)
    }
    val wallSecs = (System.nanoTime() - wall0) / 1e9
    qa.stop(); qb.stop()
    qa.awaitTermination(); qb.awaitTermination()
    spark.streams.removeListener(listener)
    qa.exception.foreach(throw _)
    qb.exception.foreach(throw _)
    broker.stop()

    val rate = (rowsB.get() / wallSecs).round
    val steady =
      if (steadyMs.get() > 0) (steadyRows.get() * 1000.0 / steadyMs.get()).round
      else -1L
    val line =
      s"""{"metric":"chain_soak_msgs_per_sec","value":$rate,"unit":"msgs/sec","steady_msgs_per_sec":$steady,"msgs":${rowsB.get()},"wall_secs":${"%.1f".formatLocal(java.util.Locale.ROOT, wallSecs)},"shards":$shards,"hops":2,"cpus":$cpus}"""
    System.err.println(line)
    println(line)
    spark.stop()
  }
}
