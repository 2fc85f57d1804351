package graft

import org.apache.spark.sql.functions._

/** Characterization probe for the bench's pipeline-throughput twin
  * (r19 verdict "what's wrong" #3): the driver's figure swung 105M →
  * 65M rows/s between 0-contended runs with Bench.scala untouched, and
  * the committed idle history brackets both (65–117M). This main runs
  * the EXACT plan Bench.pipelineThroughput runs — `range` → codegen'd
  * explode(sequence) fan-out → groupBy count → noop sink; no file I/O,
  * so page cache is structurally ruled out — as `nSamples` back-to-back
  * samples in ONE fresh JVM, printing each one, so the within-JVM
  * trajectory separates the remaining hypotheses:
  *  - strong rise from sample 1 to a plateau = JIT/codegen warm-up →
  *    the bench median depends on how many samples the surrounding
  *    run's interleave collects while warm vs cold;
  *  - flat-but-low across a whole JVM = box state (CPU contention or
  *    thermal), invisible to `uptime` snapshots;
  *  - sawtooth = GC/heap pressure from the surrounding work (absent
  *    here — this JVM runs nothing else — so sawtooth would implicate
  *    the bench's neighboring queries, already mitigated by the
  *    clearCache before each sample).
  * Run 3× back-to-back (3 JVMs) for an interleaved-sample discipline:
  * `for i in 1 2 3; do sbt "runMain graft.PipelineTwinProbe"; done`.
  * One JSON line per JVM. */
object PipelineTwinProbe {
  def main(args: Array[String]): Unit = {
    val nSamples = args.headOption.map(_.toInt).getOrElse(10)
    val spark = Sessions.local(appName = "graft-pipeline-twin-probe")
    val updates = 5000000L
    val fanout = 10L
    val samples = (1 to nSamples).map { i =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      spark.range(0, updates)
        .select((col("id") % 5).as("knob_id"), (col("id") % 1000).as("w"),
          explode(sequence(lit(1L), lit(fanout))).as("unit"))
        .groupBy("knob_id", "w")
        .agg(count(lit(1)).as("cnt"))
        .write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      val mps = updates * fanout / secs
      println(f"[pipeline-twin] sample $i%2d: ${mps / 1e6}%7.1f M rows/s")
      mps
    }
    val sorted = samples.sorted
    val json = samples.map(s => f"${s / 1e6}%.1f").mkString("[", ",", "]")
    println(
      s"""{"probe":"pipeline_twin","n_samples":$nSamples,""" +
        s""""samples_mrows_per_s":$json,""" +
        s""""median":${f"${sorted(nSamples / 2) / 1e6}%.1f"},""" +
        s""""first":${f"${samples.head / 1e6}%.1f"},""" +
        s""""max":${f"${sorted.last / 1e6}%.1f"}}""")
    spark.stop()
  }
}
