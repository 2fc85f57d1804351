package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Runnable example driving the streaming surface end to end:
  * `runMain graft.streaming.StreamDemo`. Shows the out-of-order drop,
  * append-mode late-data semantics, and the bounded-retry sink. */
object StreamDemo {
  def ts(s: Long) = new Timestamp(s * 1000L)
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("4", "stream-demo")
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    // 1. latest-per-key with out-of-order arrival
    val in1 = MemoryStream[KnobEvent]
    val q1 = StreamOps.latestPerKey(in1.toDS()).writeStream
      .format("memory").queryName("s1").outputMode(OutputMode.Update()).start()
    in1.addData(KnobEvent(1, 5, ts(100)))
    q1.processAllAvailable()
    in1.addData(KnobEvent(1, 99, ts(50)))  // stale
    q1.processAllAvailable()
    println("DEMO latest: " + spark.table("s1").collect().toList)
    q1.stop()

    // 2. pipeline invariant + late-data drop probe (append mode windows)
    val in2 = MemoryStream[KnobEvent]
    val q2 = StreamOps.windowedCounts(in2.toDS(), "10 seconds").writeStream
      .format("memory").queryName("s2").outputMode(OutputMode.Append()).start()
    in2.addData(KnobEvent(1, 3, ts(100)))
    q2.processAllAvailable()
    in2.addData(KnobEvent(1, 4, ts(500)))  // watermark -> 470
    q2.processAllAvailable()
    in2.addData(KnobEvent(1, 7, ts(100))) // LATE beyond watermark: must be dropped
    q2.processAllAvailable()
    in2.addData(KnobEvent(1, 1, ts(900))) // flush
    q2.processAllAvailable()
    println("DEMO windows(append, late dropped): " + spark.table("s2").collect().toList)
    q2.stop()

    // 3. retry sink giving up
    try { RetrySink.pushWithRetry(3, 1)(() => sys.error("down")) }
    catch { case e: Throwable => println("DEMO retry exhausted with: " + e.getMessage) }
    spark.stop()
  }
}
