package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** R14 scenarios (FIXTURES.md §B): constant-rate steady state, sine-wave
  * ramp tracking, and the shutdown zero-out drain.
  */
class SimulatorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("constant schedule: event cadence matches the reference's (i+1)x250ms") {
    val ev = KnobSimulator.schedule(spark, knobs = 5, horizonSeconds = 10,
      amplitude = 7L)
    val counts = ev.groupBy("id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // knob i ticks every (i+1)*250ms over 10s -> 40/(i+1) events
    assert(counts == Map(0L -> 40L, 1L -> 20L, 2L -> 14L, 3L -> 10L, 4L -> 8L),
      s"got $counts")
    assert(ev.filter(col("n") =!= 7L).isEmpty)
  }

  test("sine schedule: windowed unit counts rise then fall over the period") {
    // knob 0: period 20s; 5-second tumbling windows over one period
    val ev = KnobSimulator.schedule(spark, knobs = 1, horizonSeconds = 20,
      amplitude = 1000L, sine = true)
    val winSums = ev
      .groupBy(window(col("ts"), "5 seconds"))
      .agg(sum("n").as("units"))
      .orderBy("window.start")
      .collect().map(_.getLong(1))
    assert(winSums.length == 4)
    // half-sine hump: quarters 2 and 3 (around the peak) dominate 1 and 4
    assert(winSums(1) > winSums(0) && winSums(2) > winSums(3),
      s"not a hump: ${winSums.toSeq}")
    assert(math.abs(winSums(1) - winSums(2)) < winSums(1) / 4,
      s"peak not symmetric-ish: ${winSums.toSeq}")
    // sin(0)=0: the very first event is zero
    assert(ev.orderBy("ts").first().n == 0L)
  }

  test("shutdown zero-out drains latest-per-key state to zero") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    val base = KnobSimulator.schedule(spark, knobs = 3, horizonSeconds = 5,
      amplitude = 9L)
    val drained = KnobSimulator.withShutdownZeroOut(base, knobs = 3, horizonSeconds = 5)
      .orderBy("ts").collect()
    val input = MemoryStream[KnobEvent]
    val q = StreamOps.latestPerKey(input.toDS()).writeStream
      .format("memory").queryName("drain_sink").outputMode(OutputMode.Update()).start()
    try {
      input.addData(drained.toIndexedSeq)
      q.processAllAvailable()
      val finalState = spark.table("drain_sink").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (k, vs) => k -> vs.last._2 }
      assert(finalState == Map(0L -> 0L, 1L -> 0L, 2L -> 0L),
        s"state not drained: $finalState")
    } finally q.stop()
  }
}
