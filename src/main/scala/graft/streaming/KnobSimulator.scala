package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic twin of the reference's load generator (R14,
  * simulate-knobs.go): knob `i` publishes every (i+1)×250 ms
  * (simulate-knobs.go:20-21,80); `n` is either constant or the half-sine
  * ramp `N·sin(π·(t mod T)/T)` with period `T = 20·(i+1)` seconds
  * (simulate-knobs.go:65-70). Events carry proper timestamps from a fixed
  * epoch so replays are bit-identical — no wall clock anywhere.
  *
  * Generation is a `spark.range` cross the knob ids, entirely inside
  * codegen: the schedule scales to arbitrary horizons without a driver
  * loop, and `.orderBy(ts)` replays it through `MemoryStream` in arrival
  * order for the streaming suite.
  */
object KnobSimulator {

  val BaseEpochMs: Long = 1704067200000L // 2024-01-01T00:00:00Z

  def schedule(
      spark: SparkSession,
      knobs: Int = 5,
      horizonSeconds: Int = 60,
      amplitude: Long = 1000L,
      sine: Boolean = false): Dataset[KnobEvent] = {
    import spark.implicits._
    val maxTicks = horizonSeconds * 4L // knob 0 ticks every 250 ms
    val periodMs = (col("id") + 1) * 250L
    val tMs = col("tick") * periodMs
    val n =
      if (sine) {
        val tSec = tMs / 1000.0
        val period = (col("id") + 1) * 20.0
        floor(lit(amplitude) *
          sin(lit(math.Pi) * pmod(tSec, period) / period)).cast("long")
      } else lit(amplitude)
    spark.range(0, knobs.toLong).toDF("id")
      .crossJoin(spark.range(0, maxTicks).toDF("tick"))
      .filter(tMs < horizonSeconds * 1000L)
      .select(col("id"), n.as("n"),
        timestamp_millis(lit(BaseEpochMs) + tMs).as("ts"))
      .as[KnobEvent]
  }

  /** Scenario 6 (FIXTURES.md §B): the SIGINT drain — one trailing n=0
    * event per knob after the horizon (simulate-knobs.go:97-99). */
  def withShutdownZeroOut(
      events: Dataset[KnobEvent], knobs: Int, horizonSeconds: Int): Dataset[KnobEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    val zeros = (0 until knobs).map { i =>
      KnobEvent(i.toLong, 0L,
        new Timestamp(BaseEpochMs + horizonSeconds * 1000L))
    }
    events.union(zeros.toDS())
  }
}
