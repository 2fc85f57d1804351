package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SyntheticEventsSource (DataSource V2) contract: deterministic
  * generation, filter pushdown that prunes whole splits, and column
  * pruning that reaches the reader.
  */
class Dsv2SourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def load(rows: Long = 10000, partitions: Int = 8): DataFrame =
    spark.read.format("graft.sources.SyntheticEventsSource")
      .option("rows", rows).option("partitions", partitions)
      .option("seed", 42).load()

  test("generates exactly `rows` deterministic rows across `partitions` splits") {
    val df = load()
    assert(df.count() == 10000)
    assert(df.rdd.getNumPartitions == 8)
    val a = df.collect().map(_.toString).sorted
    val b = load().collect().map(_.toString).sorted
    assert(a.sameElements(b), "source not deterministic across reads")
    // all five event types appear; values live in the declared domain
    assert(df.select("event_type").distinct().count() == 5)
    assert(df.agg(min("value"), max("value")).head.getDouble(1) <= 10000.0)
  }

  test("event_id range filter prunes whole input splits at planning time") {
    val df = load().filter(col("event_id") < 2500)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedRange=[0,2500)"),
      s"range filter not pushed:\n$scan")
    // 10000 rows / 8 splits = 1250 per split; ids [0, 2500) live entirely
    // in the first TWO splits — the other six must never be scheduled
    assert(df.rdd.getNumPartitions == 2,
      s"expected 2 surviving splits, got ${df.rdd.getNumPartitions}")
    assert(df.count() == 2500)
  }

  test("pushed event_type equality filters inside the generator, exactly") {
    val pushed = load().filter(col("event_type") === "click")
    val scan = pushed.queryExecution.executedPlan.toString
    assert(scan.contains("PushedType=click"),
      s"type filter not pushed:\n$scan")
    // same rows as filtering the unfiltered read post-hoc
    val expected = load().collect().count(_.getAs[String]("event_type") == "click")
    assert(pushed.count() == expected && expected > 0)
  }

  test("conflicting pushed event_type equalities yield the empty set") {
    // Both conjuncts are fully pushed (Spark will NOT re-apply them), so
    // the scan itself must resolve the contradiction: type='a' AND
    // type='b' can never match. A source that kept only the last value
    // would wrongly return that type's rows.
    val df = load().filter(col("event_type") === "click")
      .filter(col("event_type") === "error")
    assert(df.count() == 0, "contradictory pushed equalities must be empty")
    assert(df.rdd.getNumPartitions == 0, "no splits should be scheduled")
    // a repeated IDENTICAL equality is not a contradiction
    val same = load().filter(col("event_type") === "click")
      .filter(col("event_type") === "click")
    assert(same.count() > 0)
  }

  test("streaming sink commit is idempotent per epoch (restart re-delivery)") {
    import graft.sources.CountingSink
    CountingSink.reset("t_epoch")
    // simulate Spark re-delivering the last epoch's commit after restart:
    // same (name, epoch) must fold in exactly once
    assert(CountingSink.addEpoch("t_epoch", 0L, 100L))
    assert(CountingSink.addEpoch("t_epoch", 1L, 50L))
    assert(!CountingSink.addEpoch("t_epoch", 1L, 50L), "re-delivered epoch applied twice")
    assert(!CountingSink.addEpoch("t_epoch", 0L, 100L), "stale epoch applied")
    assert(CountingSink.total("t_epoch") == 150L)
    assert(CountingSink.committedEpoch("t_epoch") == 1L)
    CountingSink.reset("t_epoch")
  }

  test("column pruning reaches the reader (ReadSchema shrinks)") {
    val two = load().select("event_id", "user_id")
    val scan = two.queryExecution.executedPlan.toString
    assert(scan.contains("ReadSchema=event_id,user_id"),
      s"projection not pruned into the scan:\n$scan")
    assert(two.columns.toSeq == Seq("event_id", "user_id"))
    assert(two.count() == 10000)
  }

  test("micro-batch stream: admission control paces batches, replay is exact") {
    // the same generator as a streaming connector: offsets are event_id
    // high-water marks, each batch admits rowsPerBatch ids, and
    // processAllAvailable drains to the `rows` cap and stops
    val q = spark.readStream.format("graft.sources.SyntheticEventsSource")
      .option("rows", 10000).option("partitions", 4)
      .option("seed", 42).option("rowsPerBatch", 1500)
      .load()
      .writeStream.format("memory").queryName("synth_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("synth_stream")
      assert(got.count() == 10000)
      // ≥ ceil(10000/1500) = 7 batches — admission control actually paced
      val batches = q.recentProgress.count(_.numInputRows > 0)
      assert(batches >= 7, s"expected >= 7 paced batches, got $batches")
      // streamed rows ARE the batch rows: the offset range fully
      // determines content, so the two paths must agree bit-for-bit
      val batch = load().collect().map(_.toString).sorted
      val streamed = got.collect().map(_.toString).sorted
      assert(streamed.sameElements(batch), "stream != batch replay")
    } finally q.stop()
  }

  test("custom connector feeds a watermarked windowed aggregate end-to-end") {
    // the connector's event-time column (1 event/ms from a fixed epoch)
    // through the full streaming stack: watermark, 1-second tumbling
    // windows, stateful aggregation — 10000 events = exactly 10 windows
    // of 1000
    val q = spark.readStream.format("graft.sources.SyntheticEventsSource")
      .option("rows", 10000).option("partitions", 4)
      .option("seed", 42).option("rowsPerBatch", 2500)
      .load()
      .withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "1 second")).count()
      .writeStream.format("memory").queryName("synth_win")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val wins = spark.table("synth_win").collect()
      assert(wins.length == 10, s"expected 10 windows, got ${wins.length}")
      assert(wins.forall(_.getLong(1) == 1000L),
        s"uneven windows: ${wins.mkString(", ")}")
    } finally q.stop()
  }

  test("v2 sink: batch and streaming writes count only committed rows") {
    import graft.sources.CountingSink
    CountingSink.reset("t_batch"); CountingSink.reset("t_stream")
    // batch path: task counts surface only through the driver commit
    load(rows = 3000).write.format("graft.sources.CountingSink")
      .option("name", "t_batch").mode("append").save()
    assert(CountingSink.total("t_batch") == 3000)
    // streaming path: per-epoch commits accumulate to the drained total
    val q = spark.readStream.format("graft.sources.SyntheticEventsSource")
      .option("rows", 5000).option("rowsPerBatch", 1500)
      .load()
      .writeStream.format("graft.sources.CountingSink")
      .option("name", "t_stream")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_sink_ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      assert(CountingSink.total("t_stream") == 5000,
        s"streamed total ${CountingSink.total("t_stream")}")
    } finally q.stop()
  }

  test("the source composes with ordinary relational ops") {
    // per-user counts over the generated load — the reference's
    // count-by-key pipeline shape running on the v2 source
    val counts = load().groupBy("user_id").agg(count(lit(1)).as("cnt"))
    assert(counts.agg(sum("cnt")).head.getLong(0) == 10000)
    assert(counts.count() == 1000) // users are mod-1000 of the mix
  }
}
