package graft.streaming

import java.sql.Timestamp

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{base64, col, struct, to_json}
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** MemoryStream scenarios from FIXTURES.md §B: out-of-order updates must
  * not regress state (reference knobs.go:101-102), duplicate delivery is
  * deduped, windows count correctly, zero windows are suppressed, and the
  * retry sink honors the reference's ≤10×/100 ms policy
  * (reducer.go:24-25,118-126).
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: Long): Timestamp = new Timestamp(s * 1000L)

  test("latestPerKey keeps newest by event time; out-of-order update is dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KnobEvent]
    val q = StreamOps.latestPerKey(input.toDS()).writeStream
      .format("memory").queryName("latest_sink").outputMode(OutputMode.Update()).start()
    try {
      input.addData(KnobEvent(1, 5, ts(100)), KnobEvent(2, 7, ts(100)))
      q.processAllAvailable()
      // batch 2: id 1 gets an OLDER event with a different n — must be ignored
      input.addData(KnobEvent(1, 99, ts(50)))
      q.processAllAvailable()
      // batch 3: id 1 gets a genuinely newer event — must win
      input.addData(KnobEvent(1, 11, ts(200)))
      q.processAllAvailable()
      val states = spark.table("latest_sink")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val lastPerKey = states.groupBy(_._1).map { case (k, vs) => k -> vs.last }
      assert(lastPerKey(1L) == ((1L, 11L, 200L * 1000000L)),
        s"id 1 final state wrong: ${lastPerKey(1L)}")
      assert(lastPerKey(2L) == ((2L, 7L, 100L * 1000000L)))
      // the out-of-order n=99 must never have been emitted as an update
      assert(!states.contains((1L, 99L, 50L * 1000000L)),
        "stale out-of-order update regressed the state")
    } finally q.stop()
  }

  test("windowedCounts sums per tumbling window and suppresses zero windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KnobEvent]
    val q = StreamOps.windowedCounts(input.toDS(), "10 seconds").writeStream
      .format("memory").queryName("win_sink").outputMode(OutputMode.Update()).start()
    try {
      input.addData(
        KnobEvent(1, 3, ts(100)), KnobEvent(1, 4, ts(105)), // window [100,110)
        KnobEvent(1, 6, ts(112)),                           // window [110,120)
        KnobEvent(2, 0, ts(100)))                           // zero → suppressed
      q.processAllAvailable()
      val rows = spark.table("win_sink")
        .collect().map(r => (r.getTimestamp(0).getTime / 1000, r.getLong(1), r.getLong(2)))
        .toSet
      assert(rows == Set((100L, 1L, 7L), (110L, 1L, 6L)), s"got $rows")
    } finally q.stop()
  }

  test("trendingKeys surfaces dominant keys per window and merges sketch state across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KnobEvent]
    val q = StreamOps.trendingKeys(input.toDS(), "10 seconds", cap = 4).writeStream
      .format("memory").queryName("trend_sink").outputMode(OutputMode.Update()).start()
    try {
      // window [100,110): key 7 has 6 of 10 events > 10/(cap+1)=2 — the
      // sketch MUST keep it, and ranked first
      input.addData(
        (1 to 6).map(i => KnobEvent(7, 1, ts(100 + i % 9))) ++
          (1 to 3).map(i => KnobEvent(8, 1, ts(101 + i % 9))) ++
          Seq(KnobEvent(99, 1, ts(103))): _*)
      q.processAllAvailable()
      val first = spark.table("trend_sink").collect()
      assert(first.length == 1)
      val cands = first.head.getSeq[org.apache.spark.sql.Row](1)
      assert(cands.length <= 4, s"sketch exceeded cap: $cands")
      assert(cands.head.getString(0) == "7", s"dominant key not first: $cands")
      // a later batch lands in the SAME window: the stored sketch state
      // must merge, not reset — key 8 overtakes 7 (9 vs 6) in the update
      input.addData((1 to 6).map(i => KnobEvent(8, 1, ts(102 + i % 7))): _*)
      q.processAllAvailable()
      val updated = spark.table("trend_sink").collect()
        .filter(_.getTimestamp(0).getTime / 1000 == 100)
        .map(_.getSeq[org.apache.spark.sql.Row](1))
      assert(updated.exists(cs =>
        cs.nonEmpty && cs.head.getString(0) == "8" && cs.head.getLong(1) >= 7L),
        s"cross-batch merge lost counts: ${updated.toSeq}")
    } finally q.stop()
  }

  test("trendingKeys drops late data once the watermark evicted the window's sketch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KnobEvent]
    val q = StreamOps.trendingKeys(input.toDS(), "10 seconds",
      watermark = "30 seconds", cap = 4).writeStream
      .format("memory").queryName("trend_late_sink")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData((1 to 5).map(i => KnobEvent(1, 1, ts(100 + i % 9))) ++
        Seq(KnobEvent(2, 1, ts(104))): _*)
      q.processAllAvailable()
      // event time jumps to 300: the NEXT batch runs with watermark
      // 300 - 30 = 270, far past window [100,110) — its sketch state is
      // evicted from the store
      input.addData(KnobEvent(5, 1, ts(300)))
      q.processAllAvailable()
      input.addData(KnobEvent(5, 1, ts(301))) // wm now actually 270
      q.processAllAvailable()
      val before = spark.table("trend_late_sink").collect()
        .count(_.getTimestamp(0).getTime / 1000 == 100)
      // a LATE burst into the evicted window — under the watermark, it
      // must be DROPPED, not resurrect a fresh (and now wrong: superset
      // only of the late burst) sketch for the window
      input.addData((1 to 5).map(i => KnobEvent(9, 1, ts(101 + i % 8))): _*)
      q.processAllAvailable()
      val w100 = spark.table("trend_late_sink").collect()
        .filter(_.getTimestamp(0).getTime / 1000 == 100)
      assert(w100.length == before,
        s"late data produced a new window-100 update: ${w100.toSeq}")
      assert(!w100.exists(_.getSeq[org.apache.spark.sql.Row](1)
          .exists(_.getString(0) == "9")),
        "late key leaked into the evicted window's candidates")
      // the live window kept flowing
      assert(spark.table("trend_late_sink").collect()
        .exists(_.getTimestamp(0).getTime / 1000 == 300))
    } finally q.stop()
  }

  test("trendingKeys: adversarial churn over cap every batch keeps the heavy key (superset guarantee)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KnobEvent]
    val cap = 4
    val q = StreamOps.trendingKeys(input.toDS(), "10 seconds", cap = cap)
      .writeStream
      .format("memory").queryName("trend_churn_sink")
      .outputMode(OutputMode.Update()).start()
    try {
      // 5 batches into ONE window: each batch brings the heavy key 7 (×3)
      // plus 6 NEVER-REPEATED churn keys, so the per-batch sketch always
      // exceeds cap and Misra–Gries decrements fire on every merge into
      // the state store. Totals: N = 5·9 = 45, count(7) = 15 >
      // N/(cap+1) = 9 — the mergeable-summaries guarantee says 7 MUST
      // survive every partial → state → final merge.
      for (b <- 0 until 5) {
        val churn = (1 to 6).map(j =>
          KnobEvent(1000 + b * 10 + j, 1, ts(100 + (b + j) % 9)))
        input.addData((1 to 3).map(i =>
          KnobEvent(7, 1, ts(100 + (b + i) % 9))) ++ churn: _*)
        q.processAllAvailable()
      }
      val w100 = spark.table("trend_churn_sink").collect()
        .filter(_.getTimestamp(0).getTime / 1000 == 100)
        .map(_.getSeq[org.apache.spark.sql.Row](1))
      assert(w100.nonEmpty, "no window-100 updates emitted")
      assert(w100.forall(_.length <= cap),
        s"sketch exceeded cap under churn: ${w100.toSeq}")
      val last = w100.last
      val heavy = last.find(_.getString(0) == "7")
      assert(heavy.isDefined,
        s"heavy key lost under adversarial churn: $last")
      // MG estimates are LOWER bounds within N/(cap+1) of truth
      assert(heavy.get.getLong(1) <= 15L && heavy.get.getLong(1) >= 15L - 9L,
        s"estimate ${heavy.get.getLong(1)} outside [6, 15]")
    } finally q.stop()
  }

  test("dedup drops exact duplicate deliveries within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KnobEvent]
    val q = StreamOps.dedup(input.toDS()).writeStream
      .format("memory").queryName("dedup_sink").outputMode(OutputMode.Append()).start()
    try {
      val e = KnobEvent(1, 5, ts(100))
      input.addData(e, e) // duplicate within one batch
      q.processAllAvailable()
      input.addData(e) // redelivery in a later batch
      q.processAllAvailable()
      assert(spark.table("dedup_sink").count() == 1)
    } finally q.stop()
  }

  test("dedupPayload drops a redelivery re-stamped with a fresh timestamp") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KnobEvent]
    val q = StreamOps.dedupPayload(input.toDS()).writeStream
      .format("memory").queryName("deduppl_sink")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(KnobEvent(1, 5, ts(100)))
      q.processAllAvailable()
      // broker retry: same payload (id=1, n=5), NEW timestamp — the case
      // full-identity dedup("id","n","ts") would double-count
      input.addData(KnobEvent(1, 5, ts(103)))
      // genuinely different payload on the same key survives
      input.addData(KnobEvent(1, 6, ts(104)))
      q.processAllAvailable()
      val rows = spark.table("deduppl_sink")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      assert(rows == Seq((1L, 5L), (1L, 6L)), s"got $rows")
    } finally q.stop()
  }

  test("transformWithState sessionization: timer flush, state cleared, re-sessioned") {
    // The arbitrary-state API end-to-end: ValueState aggregate + event-time
    // timers under the RocksDB provider (transformWithState's required
    // backend). Sessions close when the WATERMARK passes lastEvent+gap —
    // assert exact totals/counts/close times, then that a post-flush event
    // opens a FRESH session (state really cleared, timer really re-armed).
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[KnobEvent]
    val q = StreamOps.sessionTotalsTws(input.toDS(), gapMs = 5000L)
      .writeStream.format("memory").queryName("tws_sink")
      .outputMode(OutputMode.Append()).start()
    try {
      def sessions() = spark.table("tws_sink").as[SessionTotal].collect().toSet
      // session 1: key 1 gets (5, 4) at ts 100/102, key 2 gets 3 at ts 101
      input.addData(KnobEvent(1, 5, ts(100)), KnobEvent(2, 3, ts(101)),
        KnobEvent(1, 4, ts(102)))
      q.processAllAvailable()
      // watermark trails one batch: push event time forward twice so the
      // wm (maxTs - 30s) passes the armed deadlines (107s / 106s)
      input.addData(KnobEvent(9, 1, ts(200)))
      q.processAllAvailable()
      input.addData(KnobEvent(9, 1, ts(201)))
      q.processAllAvailable()
      assert(sessions() == Set(SessionTotal(1, 9, 2, 107000L),
        SessionTotal(2, 3, 1, 106000L)), s"got ${sessions()}")
      // key 1 again AFTER its flush: must be a brand-new session
      input.addData(KnobEvent(1, 7, ts(300)))
      q.processAllAvailable()
      input.addData(KnobEvent(9, 1, ts(400)))
      q.processAllAvailable()
      input.addData(KnobEvent(9, 1, ts(401)))
      q.processAllAvailable()
      assert(sessions().contains(SessionTotal(1, 7, 1, 305000L)),
        s"got ${sessions()}")
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }

  test("pipeline: constant knobs produce n-per-window counts (reference invariant)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KnobEvent]
    val q = StreamOps.pipeline(input.toDS(), "10 seconds").writeStream
      .format("memory").queryName("pipe_sink").outputMode(OutputMode.Update()).start()
    try {
      // two knobs at constant n in one window, plus a zero knob
      input.addData(KnobEvent(1, 5, ts(100)), KnobEvent(2, 3, ts(101)),
        KnobEvent(3, 0, ts(102)))
      q.processAllAvailable()
      val rows = spark.table("pipe_sink")
        .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
      assert(rows == Set((1L, 5L), (2L, 3L)), s"got $rows")
    } finally q.stop()
  }

  test("sessionCounts groups activity bursts split by the gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KnobEvent]
    // session windows only support append mode: sessions emit once the
    // watermark passes their end, so a late high-ts event flushes them.
    val q = StreamOps.sessionCounts(input.toDS(), gap = "5 seconds").writeStream
      .format("memory").queryName("sess_sink").outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        KnobEvent(1, 1, ts(100)), KnobEvent(1, 1, ts(103)), // one session
        KnobEvent(1, 1, ts(120)))                           // new session
      q.processAllAvailable()
      input.addData(KnobEvent(1, 1, ts(200))) // watermark → 170, flushes both
      q.processAllAvailable()
      val sessions = spark.table("sess_sink")
        .collect().map(r => (r.getLong(2), r.getLong(3))).toList.sorted
      assert(sessions == List((1L, 1L), (1L, 2L)), s"got $sessions")
    } finally q.stop()
  }

  test("file stream source: parquet files appearing in a directory flow through the pipeline") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_src").toString
    // seed file must exist before readStream infers the schema
    Seq(KnobEvent(1, 2, ts(100))).toDS().write.mode("overwrite").parquet(s"$dir/batch0")
    val src = spark.readStream
      .schema(Seq.empty[KnobEvent].toDS().schema)
      .parquet(s"$dir/*")
    val q = StreamOps.pipeline(src.as[KnobEvent], "10 seconds").writeStream
      .format("memory").queryName("file_sink").outputMode(OutputMode.Update()).start()
    try {
      q.processAllAvailable()
      // a new file lands mid-stream — the source must pick it up
      Seq(KnobEvent(2, 3, ts(105))).toDS().write.mode("overwrite").parquet(s"$dir/batch1")
      q.processAllAvailable()
      val rows = spark.table("file_sink")
        .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
      assert(rows == Set((1L, 2L), (2L, 3L)), s"got $rows")
    } finally q.stop()
  }

  test("RocksDB state store: same results as default provider, provider engaged") {
    // The 100 TB streaming path: HDFSBackedStateStore keeps every key in
    // executor heap, so a crawl-scale dedup/window state OOMs; RocksDB
    // spills state to local disk with incremental checkpointing. The
    // provider must be a drop-in — identical results, only the state
    // backend swapped (rocksdbjni ships in /opt/spark/jars).
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[KnobEvent]
    val q = StreamOps.pipeline(input.toDS(), "10 seconds").writeStream
      .format("memory").queryName("rocks_sink")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(KnobEvent(1, 5, ts(100)), KnobEvent(2, 3, ts(101)),
        KnobEvent(3, 0, ts(102)))
      q.processAllAvailable()
      input.addData(KnobEvent(1, 4, ts(112))) // second window, state carries
      q.processAllAvailable()
      val rows = spark.table("rocks_sink")
        .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
      assert(rows == Set((1L, 5L), (2L, 3L), (1L, 4L)), s"got $rows")
      // prove RocksDB actually backed the state operator, not a silent
      // fallback: its custom metrics are provider-specific
      val metrics = q.lastProgress.stateOperators.flatMap(
        _.customMetrics.keySet().toArray(Array.empty[String]))
      assert(metrics.exists(_.toLowerCase.contains("rocksdb")),
        s"no rocksdb metrics in ${metrics.toSeq}")
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }

  test("Trigger.AvailableNow drains the backlog with stream semantics, then stops") {
    // The backfill pattern: reprocess accumulated history through the
    // SAME streaming plan (state, windows, exactly-once sink), terminating
    // when the backlog drains — no always-on cluster for catch-up jobs.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_avnow").toString
    Seq(KnobEvent(1, 5, ts(100))).toDS().write.parquet(s"$dir/b0")
    Seq(KnobEvent(2, 3, ts(101)), KnobEvent(1, 4, ts(112)))
      .toDS().write.parquet(s"$dir/b1")
    val src = spark.readStream
      .schema(Seq.empty[KnobEvent].toDS().schema)
      .option("maxFilesPerTrigger", 1) // backlog spans several micro-batches
      .parquet(s"$dir/*")
    val q = StreamOps.pipeline(src.as[KnobEvent], "10 seconds").writeStream
      .format("memory").queryName("avnow_sink")
      .outputMode(OutputMode.Update())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      assert(q.awaitTermination(60000), "AvailableNow query did not stop")
      val rows = spark.table("avnow_sink")
        .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
      assert(rows == Set((1L, 5L), (2L, 3L), (1L, 4L)), s"got $rows")
    } finally q.stop()
  }

  test("EventSource seam: pipeline results are identical via memory and file sources") {
    import spark.implicits._
    val fixture = Seq(KnobEvent(1, 5, ts(100)), KnobEvent(2, 3, ts(101)),
      KnobEvent(3, 0, ts(102)))
    val dir = java.nio.file.Files.createTempDirectory("graft_evsrc").toString
    fixture.toDS().write.mode("overwrite").parquet(s"$dir/b0")
    val memSrc = new MemoryEventSource(spark)
    memSrc.add(fixture: _*)
    val results = Seq("ev_file" -> (new FileEventSource(dir): EventSource),
      "ev_mem" -> (memSrc: EventSource)).map { case (sink, src) =>
      val q = StreamOps.pipeline(src.stream(spark), "10 seconds").writeStream
        .format("memory").queryName(sink).outputMode(OutputMode.Update()).start()
      try q.processAllAvailable() finally q.stop()
      spark.table(sink).collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    }
    assert(results.head == Set((1L, 5L), (2L, 3L)), s"file source: ${results.head}")
    assert(results.head == results(1),
      s"sources diverged: file=${results.head} mem=${results(1)}")
  }

  test("EventSource seam: rate-micro-batch emits the deterministic value mapping") {
    val src = new RateEventSource(rowsPerBatch = 10)
    val q = src.stream(spark).writeStream
      .format("memory").queryName("ev_rate").outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try q.awaitTermination(60000) finally q.stop()
    // first batch is values 0..9: id = v % 5, n = v % 10 + 1 — pure function
    val got = spark.table("ev_rate")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.take(10).toList
    assert(got == (0 until 10).map(v => (v % 5L, v % 10 + 1L)).sorted.toList,
      s"got $got")
  }

  test("runningTotals accumulates across batches (R13 streaming form)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KnobEvent]
    val q = StreamOps.runningTotals(input.toDS()).writeStream
      .format("memory").queryName("tot_sink").outputMode(OutputMode.Update()).start()
    try {
      input.addData(KnobEvent(1, 5, ts(100)))
      q.processAllAvailable()
      input.addData(KnobEvent(1, 7, ts(101)), KnobEvent(2, 2, ts(101)))
      q.processAllAvailable()
      val latest = spark.table("tot_sink").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (k, vs) => k -> vs.last._2 }
      assert(latest == Map(1L -> 12L, 2L -> 2L), s"got $latest")
    } finally q.stop()
  }

  test("checkpointed window state survives a stop/restart (exactly-once)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("graft_ckpt_out").toString
    // run 1: open a window, stop before the watermark closes it
    val in1 = MemoryStream[KnobEvent]
    val q1 = StreamOps.windowedCounts(in1.toDS(), "10 seconds").writeStream
      .format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()
    in1.addData(KnobEvent(1, 3, ts(100)))
    q1.processAllAvailable()
    q1.stop()
    // run 2, same checkpoint: more data for the SAME window, then a flush.
    // If state was lost the window would emit 4 (or two rows); restored
    // state emits one row totalling 7.
    val in2 = MemoryStream[KnobEvent]
    in2.addData(KnobEvent(1, 3, ts(100))) // replayed offsets land here too
    val q2 = StreamOps.windowedCounts(in2.toDS(), "10 seconds").writeStream
      .format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()
    in2.addData(KnobEvent(1, 4, ts(105)))
    in2.addData(KnobEvent(1, 1, ts(500))) // watermark -> 470, closes [100,110)
    q2.processAllAvailable()
    q2.stop()
    val rows = spark.read.parquet(out)
      .collect().map(r => (r.getTimestamp(0).getTime / 1000, r.getLong(1), r.getLong(2)))
      .filter(_._1 == 100L)
    assert(rows.toSeq == Seq((100L, 1L, 7L)),
      s"window state not restored across restart: ${rows.toSeq}")
  }

  test("RetrySink: succeeds after transient failures, counts attempts") {
    var failures = 3
    var delivered = false
    val attempts = RetrySink.pushWithRetry(maxTries = 10, backoffMs = 1) { () =>
      if (failures > 0) { failures -= 1; sys.error("transient") }
      delivered = true
    }
    assert(attempts == 4 && delivered)
  }

  test("RetrySink: exhausts maxTries then rethrows (no silent drop)") {
    var attempts = 0
    val e = intercept[RuntimeException] {
      RetrySink.pushWithRetry(maxTries = 10, backoffMs = 1) { () =>
        attempts += 1; sys.error("permanent")
      }
    }
    assert(attempts == 10 && e.getMessage == "permanent")
  }

  test("RetrySink drives a foreachBatch external push exactly-once per batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KnobEvent]
    val pushed = scala.collection.mutable.ArrayBuffer[String]()
    var flaky = 2
    val q = input.toDS().writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[KnobEvent], _: Long) =>
        // R16: the sink payload is base64-wrapped JSON, exactly the
        // reference's device-config push format (reducer.go:101-110)
        val payloads = batch
          .select(base64(to_json(struct(col("id"), col("n")))).as("p"))
          .collect().map(_.getString(0)) // small per-batch aggregate
        RetrySink.pushWithRetry(maxTries = 10, backoffMs = 1) { () =>
          if (flaky > 0) { flaky -= 1; sys.error("sink down") }
          pushed ++= payloads
        }
        ()
      }
      .start()
    try {
      input.addData(KnobEvent(1, 5, ts(100)), KnobEvent(2, 3, ts(101)))
      q.processAllAvailable()
      val decoded = pushed.map(p =>
        new String(java.util.Base64.getDecoder.decode(p), "UTF-8")).sorted
      assert(decoded == Seq("""{"id":1,"n":5}""", """{"id":2,"n":3}"""),
        s"got $decoded")
    } finally q.stop()
  }

  test("intervalJoin pairs same-key events within the time bound only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val left = MemoryStream[KnobEvent]
    val right = MemoryStream[KnobEvent]
    val q = StreamOps
      .intervalJoin(left.toDS(), right.toDS(), within = "10 seconds")
      .writeStream
      .format("memory").queryName("ij_sink").outputMode(OutputMode.Append())
      .start()
    try {
      left.addData(KnobEvent(1, 100, ts(100)), KnobEvent(2, 200, ts(100)))
      right.addData(
        KnobEvent(1, 7, ts(105)),  // same key, inside [100, 110] → match
        KnobEvent(1, 8, ts(115)),  // same key, outside the bound → no
        KnobEvent(1, 9, ts(95)),   // same key, BEFORE the left event → no
        KnobEvent(3, 1, ts(105)))  // no left for key 3 → no
      q.processAllAvailable()
      val rows = spark.table("ij_sink")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(rows.toSet == Set((1L, 100L, 7L)), s"got ${rows.toSeq}")
    } finally q.stop()
  }

  test("left_outer intervalJoin emits unmatched lefts after the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val left = MemoryStream[KnobEvent]
    val right = MemoryStream[KnobEvent]
    val q = StreamOps.intervalJoin(left.toDS(), right.toDS(),
        watermark = "30 seconds", within = "10 seconds",
        joinType = "left_outer")
      .writeStream
      .format("memory").queryName("loj_sink").outputMode(OutputMode.Append())
      .start()
    try {
      left.addData(KnobEvent(1, 100, ts(100)),  // will match
        KnobEvent(5, 500, ts(100)))             // never matches
      right.addData(KnobEvent(1, 7, ts(105)))
      q.processAllAvailable()
      // advance BOTH watermarks far past 100+10+30 so the unmatched left
      // is provably final; the extra batch lets the state store evict it
      left.addData(KnobEvent(9, 1, ts(500)))
      right.addData(KnobEvent(9, 1, ts(500)))
      q.processAllAvailable()
      left.addData(KnobEvent(9, 2, ts(501)))
      q.processAllAvailable()
      val rows = spark.table("loj_sink").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
      assert(rows.contains((1L, 100L, 7L)), s"match missing: $rows")
      assert(rows.contains((5L, 500L, -1L)),
        s"unmatched left not emitted with NULL right: $rows")
    } finally q.stop()
  }

  test("enrich decorates the stream from a static dimension, keeping unknown keys") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KnobEvent]
    val dim = Seq((1L, "alpha"), (2L, "beta")).toDF("id", "name")
    val q = StreamOps.enrich(input.toDS(), dim)
      .writeStream
      .format("memory").queryName("enrich_sink").outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(KnobEvent(1, 10, ts(100)), KnobEvent(2, 20, ts(101)),
        KnobEvent(7, 70, ts(102))) // key 7 has no dimension row
      q.processAllAvailable()
      val rows = spark.table("enrich_sink")
        .select("id", "n", "name").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) null else r.getString(2))).toSet
      assert(rows == Set((1L, 10L, "alpha"), (2L, 20L, "beta"),
        (7L, 70L, null)), s"got $rows")
    } finally q.stop()
  }
}
