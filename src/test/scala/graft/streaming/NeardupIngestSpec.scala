package graft.streaming

import java.nio.file.Files

import graft.TestSpark
import graft.operators.SimilarityOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming at-ingest near-dup dedup: batch-vs-corpus verdicts across
  * micro-batches, index survival across a query restart from checkpoint,
  * the within-batch-twins contract boundary, and bit-equality of the
  * in-row signature path with the batch explode+groupBy hash family.
  *
  * The texts are fixed, the hash family is deterministic, and the
  * signature-agreement estimate is a pure function of both — so every
  * verdict asserted here is exactly reproducible, not probabilistic.
  */
class NeardupIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // ≥3 words each so every doc has a signature; `wide` and `wideTweak`
  // share all but one word of 60, a true Jaccard ≈ 0.95 near-dup; `other`
  // shares nothing with either.
  private val wide =
    (1 to 60).map(i => s"w$i").mkString(" ")
  private val wideTweak =
    (1 to 60).map(i => if (i == 30) "CHANGED" else s"w$i").mkString(" ")
  private val other =
    (1 to 40).map(i => s"z$i").mkString(" ")
  private val third =
    (1 to 40).map(i => s"y$i").mkString(" ")

  private def dirs(): (String, String, String) = (
    Files.createTempDirectory("graft_ndi_idx").toString,
    Files.createTempDirectory("graft_ndi_out").toString,
    Files.createTempDirectory("graft_ndi_ckpt").toString)

  /** Reads an index table's partitions as explicit leaf paths, the way
    * the operator itself does — a root-dir read would trip partition-name
    * inference on the mixed batch=/compact= directory names. */
  private def readParts(dir: String, schema: String) = {
    val parts = new java.io.File(dir).list().toSeq
      .filter(n => n.startsWith("batch=") || n.startsWith("compact="))
      .map(n => s"$dir/$n")
    spark.read.schema(schema).parquet(parts: _*)
  }

  private def verdicts(verdictDir: String): Map[Long, (Boolean, Option[Long])] =
    spark.read
      .schema("doc_id long, kept boolean, dup_of long")
      .parquet(verdictDir)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getBoolean(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))))
      .toMap

  test("batches dedup against the accepted corpus; dropped docs leave no state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (idx, out, ckpt) = dirs()
    val input = MemoryStream[(Long, String)]
    val q = NeardupIngest.start(
      input.toDF().toDF("doc_id", "text"), idx, out, ckpt)
    try {
      // batch 0: two distinct docs — both kept (empty corpus)
      input.addData((1L, wide), (2L, other))
      q.processAllAvailable()
      // batch 1: a near-copy of doc 1 and a novel doc
      input.addData((3L, wideTweak), (4L, third))
      q.processAllAvailable()
      // batch 2: an exact copy of the DROPPED doc 3's text — doc 3 is not
      // corpus, but the text still near-dups the ACCEPTED doc 1
      input.addData((5L, wideTweak))
      q.processAllAvailable()
      val v = verdicts(out)
      assert(v(1L) == ((true, None)) && v(2L) == ((true, None)),
        s"first batch must be kept wholesale: $v")
      assert(v(3L) == ((false, Some(1L))), s"near-copy not dropped against 1: $v")
      assert(v(4L) == ((true, None)), s"novel doc dropped: $v")
      assert(v(5L) == ((false, Some(1L))),
        s"copy-of-dropped must still dup the ACCEPTED original: $v")
      // only accepted docs hold index state
      val indexed = spark.read
        .schema("doc_id long, sig array<long>")
        .parquet(s"$idx/sigs").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(indexed == Set(1L, 2L, 4L),
        s"index must carry exactly the accepted docs: $indexed")
    } finally q.stop()
  }

  test("within-batch twins are both kept (batch-vs-corpus contract); sub-3-word docs always kept") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (idx, out, ckpt) = dirs()
    val input = MemoryStream[(Long, String)]
    val q = NeardupIngest.start(
      input.toDF().toDF("doc_id", "text"), idx, out, ckpt)
    try {
      input.addData((10L, wide), (11L, wide), (12L, "just two"))
      q.processAllAvailable()
      // next batch: the twins ARE corpus now — a third copy is dropped
      input.addData((13L, wide))
      q.processAllAvailable()
      val v = verdicts(out)
      assert(v(10L)._1 && v(11L)._1,
        s"within-batch twins must both be kept: $v")
      assert(v(12L) == ((true, None)), s"sub-3-word doc must be kept: $v")
      assert(v(13L) == ((false, Some(10L))),
        s"cross-batch copy must drop against the smallest twin: $v")
    } finally q.stop()
  }

  test("restart from checkpoint: the corpus index survives and verdicts continue") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (idx, out, ckpt) = dirs()
    val input = MemoryStream[(Long, String)]
    val df = input.toDF().toDF("doc_id", "text")
    val q1 = NeardupIngest.start(df, idx, out, ckpt)
    try {
      input.addData((1L, wide), (2L, other))
      q1.processAllAvailable()
    } finally q1.stop()
    val q2 = NeardupIngest.start(df, idx, out, ckpt)
    try {
      input.addData((6L, other), (7L, third))
      q2.processAllAvailable()
      val v = verdicts(out)
      assert(v(6L) == ((false, Some(2L))),
        s"post-restart dup of a pre-restart doc must drop: $v")
      assert(v(7L) == ((true, None)), s"post-restart novel doc kept: $v")
    } finally q2.stop()
  }

  test("replay safety: re-running a batch id sees only the PRE-batch corpus and overwrites its output") {
    import spark.implicits._
    val (idx, out, _) = dirs()
    def batch(rows: (Long, String)*): DataFrame =
      rows.toDF("doc_id", "text")
    NeardupIngest.processBatch(batch((1L, wide)), 0L, idx, out, 0.8)
    NeardupIngest.processBatch(batch((2L, wideTweak), (3L, third)), 1L, idx, out, 0.8)
    val first = verdicts(out)
    assert(first(2L) == ((false, Some(1L))) && first(3L)._1)
    // a crash re-delivers batch 1: its earlier half-write must not count
    // as corpus (doc 3 would otherwise self-dup), and the partition is
    // overwritten, not appended
    NeardupIngest.processBatch(batch((2L, wideTweak), (3L, third)), 1L, idx, out, 0.8)
    val second = verdicts(out)
    assert(second == first, s"replay must be idempotent: $second vs $first")
    val bandDocs = spark.read
      .schema("doc_id long, band int, bh long")
      .parquet(s"$idx/bands")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(bandDocs == Set(1L, 3L), s"index after replay: $bandDocs")
  }

  test("compaction folds settled batches, never the newest; verdicts continue unchanged") {
    import spark.implicits._
    val (idx, out, _) = dirs()
    def batch(rows: (Long, String)*): DataFrame =
      rows.toDF("doc_id", "text")
    NeardupIngest.processBatch(batch((1L, wide)), 0L, idx, out, 0.8)
    NeardupIngest.processBatch(batch((2L, other)), 1L, idx, out, 0.8)
    NeardupIngest.processBatch(batch((3L, third)), 2L, idx, out, 0.8)
    NeardupIngest.compact(spark, idx)
    // batch=2 survives: the newest batch partition may be on disk while
    // the streaming checkpoint has not committed it, and its replay reads
    // strictly below 2 — folding it into compact=2 would hide the
    // pre-batch corpus from that replay
    val listed = new java.io.File(s"$idx/bands").list().toSet
    assert(listed.filter(n => n.startsWith("batch=") || n.startsWith("compact="))
      == Set("compact=1", "batch=2"), s"bands partitions after compact: $listed")
    // ingest continues against the compacted corpus: dup of a pre-compact
    // doc drops, novel doc is kept, and a second compaction folds the
    // now-settled batches into a new compact dir
    NeardupIngest.processBatch(batch((4L, wide), (5L, "k1 k2 k3 k4 k5")), 3L, idx, out, 0.8)
    val v = verdicts(out)
    assert(v(4L) == ((false, Some(1L))), s"dup vs compacted corpus: $v")
    assert(v(5L) == ((true, None)), s"novel doc vs compacted corpus: $v")
    NeardupIngest.compact(spark, idx)
    val relisted = new java.io.File(s"$idx/sigs").list().toSet
    assert(relisted.filter(n => n.startsWith("batch=") || n.startsWith("compact="))
      == Set("compact=2", "batch=3"), s"sigs partitions after second compact: $relisted")
    val indexed = readParts(s"$idx/sigs", "doc_id long, sig array<long>")
      .select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(indexed == Set(1L, 2L, 3L, 5L), s"compacted corpus: $indexed")
  }

  test("a replayed newest batch after compaction still sees the full pre-batch corpus") {
    import spark.implicits._
    val (idx, out, _) = dirs()
    def batch(rows: (Long, String)*): DataFrame =
      rows.toDF("doc_id", "text")
    NeardupIngest.processBatch(batch((1L, wide)), 0L, idx, out, 0.8)
    // batch 1 lands on disk but the checkpoint "never commits" it; a
    // compaction runs in the stopped window, then the batch replays with
    // the same id. Its dup-of-batch-0 doc must still drop: the corpus
    // below id 1 must remain visible after compaction.
    NeardupIngest.processBatch(batch((6L, wideTweak), (7L, third)), 1L, idx, out, 0.8)
    NeardupIngest.compact(spark, idx)
    NeardupIngest.processBatch(batch((6L, wideTweak), (7L, third)), 1L, idx, out, 0.8)
    val v = verdicts(out)
    assert(v(6L) == ((false, Some(1L))),
      s"replay after compaction lost the pre-batch corpus: $v")
    assert(v(7L) == ((true, None)), s"novel doc in replayed batch: $v")
  }

  test("a compacted index tolerates duplicate rows from an interrupted cleanup") {
    import spark.implicits._
    val (idx, out, _) = dirs()
    def batch(rows: (Long, String)*): DataFrame =
      rows.toDF("doc_id", "text")
    NeardupIngest.processBatch(batch((1L, wide)), 0L, idx, out, 0.8)
    NeardupIngest.processBatch(batch((2L, other)), 1L, idx, out, 0.8)
    // simulate a crash AFTER the merged dir committed but BEFORE the
    // constituent deletes: copy the merge by hand, keep the originals
    val merged = spark.read
      .schema("doc_id long, band int, bh long")
      .parquet(s"$idx/bands/batch=0", s"$idx/bands/batch=1")
    merged.coalesce(1).write.parquet(s"$idx/bands/compact=1")
    val mergedSigs = spark.read
      .schema("doc_id long, sig array<long>")
      .parquet(s"$idx/sigs/batch=0", s"$idx/sigs/batch=1")
    mergedSigs.coalesce(1).write.parquet(s"$idx/sigs/compact=1")
    // every corpus row is now present twice; verdicts must be unaffected
    NeardupIngest.processBatch(batch((6L, wide), (7L, third)), 2L, idx, out, 0.8)
    val v = verdicts(out)
    assert(v(6L) == ((false, Some(1L))), s"dup verdict under duplicated rows: $v")
    assert(v(7L) == ((true, None)), s"novel verdict under duplicated rows: $v")
    // and the next compaction heals WITHOUT re-merging: batches 0/1 are
    // at-or-below the committed compact id, so they are recognized as
    // already merged and deleted — re-unioning them would duplicate their
    // rows in the index permanently. batch=2 stays (newest rule).
    NeardupIngest.compact(spark, idx)
    val listed = new java.io.File(s"$idx/bands").list().toSet
      .filter(n => n.startsWith("batch=") || n.startsWith("compact="))
    assert(listed == Set("compact=1", "batch=2"), s"healed partitions: $listed")
    val bandRows = readParts(s"$idx/bands", "doc_id long, band int, bh long")
    assert(bandRows.count() == bandRows.distinct().count(),
      "healing left duplicate band rows in the index")
  }

  test("healing tolerates a stale OLDER compact left by an interrupted cleanup") {
    import spark.implicits._
    val (idx, out, _) = dirs()
    def batch(rows: (Long, String)*): DataFrame =
      rows.toDF("doc_id", "text")
    // Build the two-compact crash state: compact=1 covers batches 0/1,
    // then batches 2/3/4 land and a second compaction merges
    // {compact=1, batch=2, batch=3} into compact=3 — but "crashes" before
    // deleting its constituents. compact=1 is then a strict SUBSET of
    // compact=3; the next compaction must recognize it as already merged
    // (deleting it without re-reading), not re-merge it into a target
    // whose name — compact=3 — already exists on disk.
    NeardupIngest.processBatch(batch((1L, wide)), 0L, idx, out, 0.8)
    NeardupIngest.processBatch(batch((2L, other)), 1L, idx, out, 0.8)
    NeardupIngest.processBatch(batch((3L, third)), 2L, idx, out, 0.8)
    NeardupIngest.compact(spark, idx) // -> compact=1 (batch 2 newest, kept)
    NeardupIngest.processBatch(
      batch((4L, (1 to 40).map(i => s"p$i").mkString(" "))), 3L, idx, out, 0.8)
    NeardupIngest.processBatch(
      batch((5L, (1 to 40).map(i => s"q$i").mkString(" "))), 4L, idx, out, 0.8)
    for (table <- Seq("bands", "sigs")) {
      val schema =
        if (table == "bands") "doc_id long, band int, bh long"
        else "doc_id long, sig array<long>"
      val merged = spark.read.schema(schema).parquet(
        s"$idx/$table/compact=1", s"$idx/$table/batch=2", s"$idx/$table/batch=3")
      merged.coalesce(1).write.parquet(s"$idx/$table/compact=3")
      // constituents deliberately left in place: the interrupted cleanup
    }
    // The heal must neither throw (ErrorIfExists on compact=3) nor
    // duplicate rows; batch=4 stays under the newest rule.
    NeardupIngest.compact(spark, idx)
    val listed = new java.io.File(s"$idx/bands").list().toSet
      .filter(n => n.startsWith("batch=") || n.startsWith("compact="))
    assert(listed == Set("compact=3", "batch=4"), s"healed partitions: $listed")
    val bandRows = readParts(s"$idx/bands", "doc_id long, band int, bh long")
    assert(bandRows.count() == bandRows.distinct().count(),
      "healing left duplicate band rows in the index")
    // and the corpus still answers: a dup of doc 1 (which lives only in
    // compact=3 now) is dropped by the next batch
    NeardupIngest.processBatch(batch((9L, wideTweak)), 5L, idx, out, 0.8)
    assert(verdicts(out)(9L) == ((false, Some(1L))),
      "corpus row lost through the two-compact heal")
  }

  test("in-row signature path is bit-identical to the batch explode+groupBy hash family") {
    val batchSigs = SimilarityOps.minhashSigs(spark, TestSpark.sf)
    val inRow = graft.Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"), SimilarityOps.sigExpr(col("text")).as("sig"))
      .filter(col("sig").isNotNull)
    assert(batchSigs.count() == inRow.count(),
      "signature-bearing doc sets differ")
    val mismatches = batchSigs.as("b")
      .join(inRow.as("r"), Seq("doc_id"))
      .filter(col("b.sig") =!= col("r.sig"))
      .count()
    assert(mismatches == 0, s"$mismatches signature mismatches")
  }
}
