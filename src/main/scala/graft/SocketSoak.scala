package graft

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicLong

import graft.streaming.{MiniBroker, SocketEventSource, StreamOps}

/** Throughput soak for the WIRE path: publishers → [[MiniBroker]] (TCP,
  * SUB/MSG/ACK) → [[graft.sources.SocketEventsSource]] → the full
  * [[StreamOps.pipeline]] graph. [[StreamSoak]] measures the engine's
  * streaming throughput from an in-engine generator; this one puts an
  * actual socket, line framing, base64+JSON codec, and the ack protocol
  * in the data path — the honest number for the reference's deployment
  * shape (broker in the middle, README.md:7-24).
  *
  * The wire leg is ONE socket and ONE driver-side receiver by design
  * (see the scale note on SocketEventsSource: production shards
  * subscriptions across executors; the protocol already allows it), so
  * this reports the per-connection wire rate, not an engine ceiling.
  *
  * Usage: `SPARK_GRAFT_CPUS=32 sbt "runMain graft.SocketSoak [nMsgs] [publishers]"`
  * Emits one JSON line (per-batch table on stderr).
  */
object SocketSoak {
  def main(args: Array[String]): Unit = {
    val nMsgs = args.headOption.map(_.toLong).getOrElse(2000000L)
    val nPub = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.local(cpus, "graft-socket-soak")

    val broker = new MiniBroker
    val port = broker.start()
    val published = new AtomicLong(0L)
    val pubNanos = new AtomicLong(0L)
    val publishers = (0 until nPub).map { p =>
      val t = new Thread(() => {
        val t0 = System.nanoTime()
        var i = published.getAndIncrement()
        while (i < nMsgs) {
          // KnobsMessage shape (reference util/util.go:17-20): key, value,
          // event time — every message is a real JSON codec round-trip
          broker.publish("soak",
            s"""{"id":${i % 5},"n":${i % 10 + 1},"ts_us":${1704067200000000L + i * 1000L}}""")
          i = published.getAndIncrement()
        }
        pubNanos.addAndGet(System.nanoTime() - t0)
      }, s"soak-pub-$p")
      t.start(); t
    }

    val seen = scala.collection.mutable.LinkedHashMap.empty[Long, (Long, Long)]
    val seenLock = new Object
    import org.apache.spark.sql.streaming.StreamingQueryListener
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        seenLock.synchronized {
          if (!seen.contains(p.batchId)) {
            val dur = p.durationMs.getOrDefault("triggerExecution", 0L)
            seen(p.batchId) = (p.numInputRows, dur)
            System.err.println(
              s"[socket-soak] batch ${p.batchId}: ${p.numInputRows} msgs in $dur ms")
          }
        }
      }
    }
    spark.streams.addListener(listener)

    val ckpt = Files.createTempDirectory("graft_socket_soak_ckpt").toString
    val wall0 = System.nanoTime()
    val src = new SocketEventSource("127.0.0.1", port, "soak", "soak-sub",
      maxRowsPerBatch = 500000L)
    val q = StreamOps.pipeline(src.stream(spark))
      .writeStream
      .format("noop")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()

    // run until every published message has entered a batch
    while (q.exception.isEmpty &&
        seenLock.synchronized(seen.values.map(_._1).sum) < nMsgs) {
      Thread.sleep(250)
    }
    val wallSecs = (System.nanoTime() - wall0) / 1e9
    q.stop()
    q.awaitTermination()
    spark.streams.removeListener(listener)
    q.exception.foreach(throw _)
    publishers.foreach(_.join())
    broker.stop()

    val msgs = seenLock.synchronized(seen.values.map(_._1).sum)
    val procSecs = seenLock.synchronized(
      seen.collect { case (id, (_, d)) if id > 0 => d }.sum / 1000.0)
    // end-to-end: publish begins the clock, last message entering a batch
    // ends it — the number a deployment sees, socket and codec included
    val e2e = (msgs / wallSecs).round
    // steady-state: batch 0 pays stream init, so rate it separately
    val steadyMsgs = seenLock.synchronized(
      seen.collect { case (id, (m, _)) if id > 0 => m }.sum)
    val steady = if (procSecs > 0) (steadyMsgs / procSecs).round else -1L
    val pubRate = (nMsgs * nPub / (pubNanos.get() / 1e9)).round
    val line =
      s"""{"metric":"socket_soak_msgs_per_sec","value":$e2e,"unit":"msgs/sec","msgs":$msgs,"wall_secs":${"%.1f".formatLocal(java.util.Locale.ROOT, wallSecs)},"steady_msgs_per_sec":$steady,"proc_secs":${"%.1f".formatLocal(java.util.Locale.ROOT, procSecs)},"publish_side_msgs_per_sec":$pubRate,"publishers":$nPub,"cpus":$cpus}"""
    System.err.println(line)
    println(line)
    spark.stop()
  }
}
