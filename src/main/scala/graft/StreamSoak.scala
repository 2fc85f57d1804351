package graft

import java.nio.file.Files

import graft.streaming.{RateEventSource, StreamOps}

/** Streaming soak for the reference's headline number (reference
  * README.md:2: ~1M msgs/s sustained through the knobs→flood→mapper→
  * reducer pipeline on 18×8-vCPU nodes). The batch twin in [[Bench]]
  * already exceeds that rate, but batch throughput says nothing about the
  * STREAMING path — micro-batch scheduling, watermark advance, and the
  * windowed-aggregate state store all sit between the source and the
  * sink. This main drives the full [[StreamOps.pipeline]] (latest-per-key
  * semantics fold into the fan-out + windowed count) from the
  * deterministic `rate-micro-batch` source and reports the SUSTAINED
  * input rate over ≥30 s of processing, measured from the engine's own
  * per-batch progress metrics.
  *
  * Usage: `SPARK_GRAFT_CPUS=32 sbt "runMain graft.StreamSoak [rowsPerBatch] [minSeconds]"`
  * Emits one JSON line (and the per-batch table on stderr).
  */
object StreamSoak {
  def main(args: Array[String]): Unit = {
    val rowsPerBatch = args.headOption.map(_.toLong).getOrElse(4000000L)
    val minProcSecs = if (args.length > 1) args(1).toDouble else 30.0
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.local(cpus, "graft-stream-soak")

    val ckpt = Files.createTempDirectory("graft_soak_ckpt").toString

    // Progress capture via StreamingQueryListener, NOT recentProgress
    // polling: recentProgress retains only the last
    // spark.sql.streaming.numRecentProgressUpdates (100) entries, so a
    // single GC pause in the poll loop past ~100 fast batches would
    // silently drop rows and deflate the reported rate. The listener gets
    // EVERY progress event pushed by the engine; the contiguity assert
    // below makes any residual gap loud instead of a wrong number.
    val seen = scala.collection.mutable.LinkedHashMap.empty[Long, (Long, Long)]
    val seenLock = new Object
    @volatile var procMs = 0L
    import org.apache.spark.sql.streaming.StreamingQueryListener
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        seenLock.synchronized {
          if (!seen.contains(p.batchId)) {
            val dur = p.durationMs.getOrDefault("triggerExecution", 0L)
            seen(p.batchId) = (p.numInputRows, dur)
            // batch 0 excluded — it pays stream init
            if (p.batchId > 0) procMs += dur
            System.err.println(
              s"[soak] batch ${p.batchId}: ${p.numInputRows} msgs in ${dur} ms")
          }
        }
      }
    }
    spark.streams.addListener(listener)

    val q = StreamOps.pipeline(new RateEventSource(rowsPerBatch).stream(spark))
      .writeStream
      .format("noop")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()

    // Wait until the CUMULATIVE batch-processing time crosses the soak
    // horizon. Rates are computed from the engine's own triggerExecution
    // durations, so the number is processing throughput, not wall time.
    while (procMs < (minProcSecs * 1000).toLong && q.exception.isEmpty) {
      Thread.sleep(250)
    }
    q.stop()
    q.awaitTermination()
    spark.streams.removeListener(listener)
    q.exception.foreach(throw _)

    val batchIds = seenLock.synchronized(seen.keys.toSeq.sorted)
    require(batchIds == (batchIds.head to batchIds.last),
      s"non-contiguous batch ids captured (${batchIds.length} of " +
        s"${batchIds.last - batchIds.head + 1}) — rate would under-report")
    val steady = seenLock.synchronized(
      seen.toSeq.collect { case (id, rd) if id > 0 => rd })
    val msgs = steady.map(_._1).sum
    val secs = steady.map(_._2).sum / 1000.0
    val rate = msgs / secs
    // pipeline fan-out: n = value % 10 + 1, mean 5.5 unit rows per message
    val unitRate = rate * 5.5
    val line =
      s"""{"metric":"stream_soak_msgs_per_sec","value":${rate.round},"unit":"msgs/sec","batches":${steady.length},"msgs":$msgs,"proc_secs":${"%.1f".formatLocal(java.util.Locale.ROOT, secs)},"unit_rows_per_sec":${unitRate.round},"rows_per_batch":$rowsPerBatch,"cpus":$cpus}"""
    System.err.println(line)
    println(line)
    spark.stop()
  }
}
