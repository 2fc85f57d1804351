package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.AnnPlanes

/** Streaming at-ingest SEMANTIC dedup over an embedding stream — the
  * embedding-space twin of [[NeardupIngest]] and the streaming face of
  * q_embed_dedup_canonical's SemDeDup shape (Abbas et al. 2023,
  * arXiv:2303.09540): every micro-batch of (vec_id, v) rows is kept only
  * where it does not cosine-duplicate the corpus accepted by earlier
  * batches. This is the modality where at-ingest dedup verifies EXACTLY:
  * an embedding is a few hundred bytes, so the stored corpus state IS the
  * vector, and the gate is true cosine ≥ τ on candidates — no estimator,
  * no recall loss vs the batch twin (contrast NeardupIngest, where
  * storing corpus text is off the table and the gate is the
  * signature-agreement estimate).
  *
  * Shape:
  *  - The candidate structure is the SAME 8-bit hyperplane sketch in 2
  *    bands of 4 bits as the batch embed family (AnnPlanes — fixed
  *    planes, so batch and stream bucket identically), computed map-side
  *    with the native `dot_product`.
  *  - Corpus state is the two-table layout: `bands/` rows (vec_id, band,
  *    bv) drive the candidate equality join; `vecs/` rows (vec_id, v)
  *    are fetched by join for candidates only, and exact `cosine_sim`
  *    decides. Zero-norm vectors yield NaN cosine, which Spark orders
  *    ABOVE every number (NaN ≥ τ is TRUE) — the verdict filter guards
  *    with an explicit `!isnan`, so they are never duplicates, matching
  *    the batch family's identical guard.
  *  - Exactly-once, replay safety, and offline compaction are
  *    [[IngestIndex]]'s per-batch partition machinery, shared with
  *    NeardupIngest (see there for the crash analysis).
  *
  * Contract boundaries (shared with the text twin): within-batch
  * duplicates are both kept — intra-batch dedup is the batch operators'
  * job; the ingest gate is batch-vs-corpus only.
  */
object EmbedIngest {

  /** Starts the ingest on a streaming (vec_id: long, v: array<double>)
    * frame. Verdicts land in `verdictDir/batch=N` as (vec_id, kept,
    * dup_of — smallest matching corpus vec, NULL when kept); the
    * accepted corpus index accumulates under
    * `indexDir/{bands,vecs}/batch=N`. */
  def start(
      vecs: DataFrame,
      indexDir: String,
      verdictDir: String,
      checkpointDir: String,
      cosThreshold: Double = 0.9): StreamingQuery =
    vecs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        processBatch(batch, batchId, indexDir, verdictDir, cosThreshold)
      }
      .start()

  /** Offline index compaction — [[IngestIndex.compact]] over this
    * operator's two tables. Run while the ingest query is STOPPED. */
  def compact(spark: SparkSession, indexDir: String): Unit =
    IngestIndex.compact(spark,
      Seq(s"$indexDir/bands" -> "vec_id long, band int, bv int",
        s"$indexDir/vecs" -> "vec_id long, v array<double>"))

  /** The 8-bit hyperplane sketch of a vector column — the same fixed
    * planes and bit rule as the batch embed family, so a vector buckets
    * identically whether it arrives by stream or by batch. */
  private def sketchOf(v: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (0 until 8).map { m =>
      val plane = array(AnnPlanes.planes(m).map(lit): _*)
      when(call_function("dot_product", v, plane) > 0, shiftleft(lit(1), m))
        .otherwise(0)
    }.reduce(_ + _)

  private[graft] def processBatch(
      batchRaw: DataFrame,
      batchId: Long,
      indexDir: String,
      verdictDir: String,
      cosThreshold: Double): Unit = {
    val spark = batchRaw.sparkSession
    val bandsDir = s"$indexDir/bands"
    val vecsDir = s"$indexDir/vecs"

    val feats = batchRaw
      .select(col("vec_id").cast("long").as("vec_id"),
        col("v").cast("array<double>").as("v"))
      .persist()
    try {
      val newBands = feats
        .select(col("vec_id"), sketchOf(col("v")).as("sketch"))
        .select(col("vec_id"), explode(sequence(lit(0), lit(1))).as("band"),
          col("sketch"))
        .select(col("vec_id"), col("band"),
          expr("shiftright(sketch, band * 4)").bitwiseAND(15).as("bv"))

      val corpusBandPaths = IngestIndex.batchPaths(spark, bandsDir, batchId)
      val dupped: DataFrame =
        if (corpusBandPaths.isEmpty)
          spark.range(0).select(col("id").as("vec_id"), col("id").as("dup_of"))
        else {
          val cBands = spark.read
            .schema("vec_id long, band int, bv int")
            .parquet(corpusBandPaths: _*)
          val cVecs = spark.read
            .schema("vec_id long, v array<double>")
            .parquet(IngestIndex.batchPaths(spark, vecsDir, batchId): _*)
            .select(col("vec_id").as("corpus_vec"), col("v").as("cv"))
          newBands.as("n")
            .join(cBands.as("c"),
              col("n.band") === col("c.band") && col("n.bv") === col("c.bv"))
            .select(col("n.vec_id").as("vec_id"), col("c.vec_id").as("corpus_vec"))
            .distinct()
            .join(cVecs, Seq("corpus_vec"))
            .join(feats.select(col("vec_id"), col("v")), Seq("vec_id"))
            // !isnan is load-bearing: Spark evaluates NaN >= τ as TRUE
            // (NaN orders above every number), so without the guard one
            // zero-norm vector — incoming or stored — would "duplicate"
            // every bucket-mate and mass-drop real vectors.
            .filter(!isnan(call_function("cosine_sim", col("v"), col("cv")))
              && call_function("cosine_sim", col("v"), col("cv"))
              >= cosThreshold)
            .groupBy("vec_id")
            .agg(min("corpus_vec").as("dup_of"))
        }

      val verdicts = feats
        .select("vec_id")
        .join(dupped, Seq("vec_id"), "left_outer")
        .select(col("vec_id"), col("dup_of").isNull.as("kept"), col("dup_of"))
        .persist()
      try {
        val keptIds = verdicts.filter(col("kept")).select("vec_id")
        newBands
          .join(keptIds, Seq("vec_id"), "left_semi")
          .write.mode(SaveMode.Overwrite).parquet(s"$bandsDir/batch=$batchId")
        feats
          .join(keptIds, Seq("vec_id"), "left_semi")
          .write.mode(SaveMode.Overwrite).parquet(s"$vecsDir/batch=$batchId")
        verdicts.write.mode(SaveMode.Overwrite)
          .parquet(s"$verdictDir/batch=$batchId")
      } finally verdicts.unpersist()
    } finally feats.unpersist()
  }
}
