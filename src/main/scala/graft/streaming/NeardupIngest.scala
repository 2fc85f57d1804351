package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.SimilarityOps

/** Streaming at-ingest near-duplicate dedup — the streaming twin of
  * q_dedup_incremental (SimilarityOps): every micro-batch of incoming
  * documents is kept only where it does NOT near-duplicate the corpus
  * accepted by all EARLIER batches. The reference has no streaming dedup;
  * this is part of the training-data-pipeline surface (a crawl ingest
  * dedups against the accumulated corpus as it lands, not in a nightly
  * batch over 100 TB of text).
  *
  * Shape (all sizes per ACCEPTED doc, independent of text length):
  *
  *  - Signatures are computed MAP-SIDE in-row (SimilarityOps.sigExpr —
  *    bit-identical hash family to the batch explode+groupBy form, spec-
  *    asserted), so the per-trigger plan puts no tokenization shuffle on
  *    the ingest path.
  *  - The persisted corpus state is the two-table LSH index layout:
  *    `bands/` rows are (doc_id, band, bh) — 24 B/band, the only thing
  *    the candidate join scans — and `sigs/` rows are (doc_id, sig[K]) —
  *    fetched by join for candidate pairs ONLY. Corpus TEXT is never
  *    stored or re-read: the dup gate is the signature-agreement Jaccard
  *    estimate (SimilarityOps.estSim), the standard trade of an at-ingest
  *    dedup whose state must stay a few hundred bytes per document.
  *  - Candidate generation is the same asymmetric batch×corpus band-bucket
  *    equality join as q_dedup_incremental — never all-pairs. At 100 TB
  *    the stored bands would be compacted offline into the bucketed-by-
  *    (band, bh) layout ScalePatternsSpec proves joins with zero corpus-
  *    side exchange; the per-batch partition layout here is what the
  *    exactly-once contract needs at write time.
  *
  * Exactly-once across restarts, with plain parquet (no transactional
  * table format in this environment): every batch writes its verdicts and
  * its accepted docs' index rows to `batch=<batchId>` partition
  * directories with overwrite semantics, and the corpus read for batch N
  * filters to partitions with id < N. A restarted query re-delivers the
  * last uncommitted batch under the SAME batchId (foreachBatch contract),
  * so a half-written crash re-runs against exactly the pre-batch corpus
  * and overwrites its own partial output — re-delivery cannot double-add
  * state or let a batch's own rows shadow it as "corpus".
  *
  * Contract boundaries (shared with q_dedup_incremental): within-batch
  * twins are BOTH kept — intra-batch dedup is the batch operators' job
  * (q_dedup_canonical) and an ingest that also self-joined every batch
  * would pay an extra shuffle per trigger for pairs the nightly compaction
  * catches anyway. Sub-3-word docs have no signature and are always kept.
  */
object NeardupIngest {

  /** Starts the ingest on a streaming (doc_id: long, text: string) frame.
    * Verdicts land in `verdictDir/batch=N` as (doc_id, kept, dup_of —
    * smallest matching corpus doc, NULL when kept); the accepted corpus
    * index accumulates under `indexDir/{bands,sigs}/batch=N`. */
  def start(
      docs: DataFrame,
      indexDir: String,
      verdictDir: String,
      checkpointDir: String,
      simThreshold: Double = 0.8): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        processBatch(batch, batchId, indexDir, verdictDir, simThreshold)
      }
      .start()

  /** Offline index compaction — the shared [[IngestIndex.compact]] over
    * this operator's two tables (see there for the crash-safety
    * analysis: newest batch partition never folded, already-merged
    * constituents deleted without re-reading, uncommitted merge attempts
    * purged). Run while the ingest query is STOPPED. */
  def compact(spark: SparkSession, indexDir: String): Unit =
    IngestIndex.compact(spark,
      Seq(s"$indexDir/bands" -> "doc_id long, band int, bh long",
        s"$indexDir/sigs" -> "doc_id long, sig array<long>"))

  private[graft] def processBatch(
      batchRaw: DataFrame,
      batchId: Long,
      indexDir: String,
      verdictDir: String,
      simThreshold: Double): Unit = {
    val spark = batchRaw.sparkSession
    val bandsDir = s"$indexDir/bands"
    val sigsDir = s"$indexDir/sigs"

    // Map-side signatures at the WIDE gate width (SimilarityOps.GateK):
    // the first K components — the only ones the band keys read — are
    // bit-identical to the batch family, while the tail tightens the
    // accept/reject estimator from se≈0.07 to ≈0.04 at J=0.8 (the
    // round-12 recall gap was estimator variance, not banding — see the
    // GateK scaladoc). Persisted because verdicts, the bands write, and
    // the sigs write all consume this frame within the batch.
    val sigs = batchRaw
      .select(col("doc_id").cast("long").as("doc_id"),
        SimilarityOps.sigExprK(col("text"), SimilarityOps.GateK).as("sig"))
      .persist()
    try {
      val newBands = sigs
        .filter(col("sig").isNotNull)
        .select(col("doc_id"),
          explode(SimilarityOps.bandStructs(col("sig"))).as("bb"))
        .select(col("doc_id"), col("bb.band").as("band"), col("bb.bh").as("bh"))

      val corpusBandPaths = IngestIndex.batchPaths(spark, bandsDir, batchId)
      val dupped: DataFrame =
        if (corpusBandPaths.isEmpty)
          spark.range(0).select(col("id").as("doc_id"), col("id").as("dup_of"))
        else {
          // Explicit schemas: a batch that accepted zero docs leaves a
          // partition directory with no data files, and schema INFERENCE
          // (not the read itself) is what throws on those.
          val cBands = spark.read
            .schema("doc_id long, band int, bh long")
            .parquet(corpusBandPaths: _*)
          // Loud width guard: an index written at a different signature
          // width (pre-GateK deployments) must FAIL, not silently gate at
          // a deflated estimate — zip_with null-pads a 32-wide corpus sig
          // against a 96-wide batch sig, capping est at 0.33 < any sane
          // threshold, which would wave EVERY historical near-dup through
          // as novel with zero errors. Rebuild the sigs table to upgrade.
          val cSigs = spark.read
            .schema("doc_id long, sig array<long>")
            .parquet(IngestIndex.batchPaths(spark, sigsDir, batchId): _*)
            .select(col("doc_id").as("corpus_doc"),
              when(size(col("sig")) === SimilarityOps.GateK, col("sig"))
                .otherwise(raise_error(concat(
                  lit(s"sigs index width "), size(col("sig")).cast("string"),
                  lit(s" != gate width ${SimilarityOps.GateK} for doc "),
                  col("doc_id").cast("string"))))
                .as("corpus_sig"))
          newBands.as("n")
            .join(cBands.as("c"),
              col("n.band") === col("c.band") && col("n.bh") === col("c.bh"))
            .select(col("n.doc_id").as("doc_id"), col("c.doc_id").as("corpus_doc"))
            .distinct()
            .join(cSigs, Seq("corpus_doc"))
            .join(sigs.select(col("doc_id"), col("sig")), Seq("doc_id"))
            .filter(SimilarityOps.estSimK(col("sig"), col("corpus_sig"),
              SimilarityOps.GateK) >= simThreshold)
            .groupBy("doc_id")
            .agg(min("corpus_doc").as("dup_of"))
        }

      val verdicts = sigs
        .select("doc_id")
        .join(dupped, Seq("doc_id"), "left_outer")
        .select(col("doc_id"), col("dup_of").isNull.as("kept"), col("dup_of"))
        .persist()
      try {
        val keptIds = verdicts.filter(col("kept")).select("doc_id")
        newBands
          .join(keptIds, Seq("doc_id"), "left_semi")
          .write.mode(SaveMode.Overwrite).parquet(s"$bandsDir/batch=$batchId")
        sigs
          .filter(col("sig").isNotNull)
          .join(keptIds, Seq("doc_id"), "left_semi")
          .write.mode(SaveMode.Overwrite).parquet(s"$sigsDir/batch=$batchId")
        verdicts.write.mode(SaveMode.Overwrite)
          .parquet(s"$verdictDir/batch=$batchId")
      } finally verdicts.unpersist()
    } finally sigs.unpersist()
  }
}
