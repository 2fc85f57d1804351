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
    * `indexDir/{bands,vecs}/batch=N`.
    *
    * `bandBits` sizes the candidate structure to the DEPLOYMENT scale:
    * n bands of b bits ⇒ per-batch candidate cosines ≈ n·batch·corpus/2^b.
    * The default 4 matches the historical fixture-scale structure; a
    * corpus expected to reach 10⁸+ vectors wants 12-16 (the same
    * fixed-key-space quadratic the batch face's adaptive bandBits
    * closes — a stream can't re-count its corpus per batch, so the width
    * is a deployment choice, pinned per index by an on-disk marker that
    * makes a mismatched restart FAIL instead of silently re-bucketing
    * and missing every historical candidate).
    *
    * `nBands` is the RECALL knob at a given depth (round-13 verdict: the
    * measured 0.9728 near-recall at 2×12 sat ON the theory bound
    * 1−(1−p¹²)², so more of the same two bands could never help). Each
    * extra band multiplies index band-rows and candidate rate by
    * (n+1)/n but exponentially shrinks the miss: at cos ≈ 0.9988
    * (per-bit agreement p ≈ 0.9844, p¹² ≈ 0.83) two bands miss ~2.9%,
    * three ~0.5%. Deployments needing ≥0.99 at cos ≈ 0.999 run
    * nBands=3 at depth 12; the marker pins bands alongside bits, so a
    * mismatched reopen on EITHER fails loud. */
  def start(
      vecs: DataFrame,
      indexDir: String,
      verdictDir: String,
      checkpointDir: String,
      cosThreshold: Double = 0.9,
      bandBits: Int = 4,
      nBands: Int = 2): StreamingQuery =
    vecs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        processBatch(batch, batchId, indexDir, verdictDir, cosThreshold,
          bandBits, nBands)
      }
      .start()

  /** Offline index compaction — [[IngestIndex.compact]] over this
    * operator's two tables. Run while the ingest query is STOPPED. */
  def compact(spark: SparkSession, indexDir: String): Unit =
    IngestIndex.compact(spark,
      Seq(s"$indexDir/bands" -> "vec_id long, band int, bv long",
        s"$indexDir/vecs" -> "vec_id long, v array<double>"))

  /** The hyperplane sketch — the ONE shared construction
    * ([[AnnPlanes.sketchCol]]), so at equal width a vector buckets
    * identically whether it arrives by stream or by batch, enforced by
    * the compiler rather than a manually-synced copy. */
  private def sketchOf(v: org.apache.spark.sql.Column,
      nPlanes: Int): org.apache.spark.sql.Column =
    AnnPlanes.sketchCol(v, nPlanes)

  /** Pin the index's band STRUCTURE (width and band count) on disk:
    * first touch writes the marker, every later batch verifies it. A
    * width change re-buckets silently — every historical candidate would
    * be missed with zero errors — and a band-count change half-misses
    * (bands past the stored count have no corpus rows), so a mismatch on
    * either must be a loud failure, not a recall collapse.
    *
    * Marker format: `bits` (legacy, written when nBands == 2 so indexes
    * opened at the historical structure stay byte-compatible) or
    * `bits bands`. A legacy single-number marker therefore pins
    * nBands = 2 — exactly the structure every pre-knob index was built
    * with.
    *
    * Two review-found edges: (a) a LEGACY index (bands data, no marker)
    * predates width markers and was necessarily built at the historical
    * default 4×2 — minting a marker at the passed structure would be the
    * exact silent re-bucketing this guard exists to prevent, so the
    * legacy case requires bandBits == 4 && nBands == 2 and then pins it;
    * (b) the marker write is create-temp-then-rename (atomic on real
    * filesystems) and the read treats an empty/garbled marker — a crash
    * inside a non-atomic write, or hand editing — as the same loud
    * failure, never an NPE. */
  private def checkWidthMarker(
      spark: SparkSession, indexDir: String, bandBits: Int, nBands: Int): Unit = {
    val dir = new org.apache.hadoop.fs.Path(indexDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(dir, "_band_bits")
    if (fs.exists(marker)) {
      val in = fs.open(marker)
      val line = try new java.io.BufferedReader(
        new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8))
        .readLine()
      finally in.close()
      val stored = Option(line).map(_.trim)
        .filter(_.matches("\\d+( \\d+)?"))
        .map(_.split(" ") match {
          case Array(b) => (b.toInt, 2) // legacy: width only ⇒ 2 bands
          case Array(b, n) => (b.toInt, n.toInt)
        })
      require(stored.isDefined,
        s"unreadable band-width marker $marker (content: $line) — a crashed " +
          "write or hand edit; restore it to the structure the index was " +
          "built with, or rebuild the index")
      require(stored.get._1 == bandBits,
        s"index at $indexDir was built with bandBits=${stored.get._1}; " +
          s"reopening it at $bandBits would re-bucket silently and miss " +
          "every historical candidate — use the original width or rebuild")
      require(stored.get._2 == nBands,
        s"index at $indexDir was built with nBands=${stored.get._2}; " +
          s"reopening it at $nBands would mis-join the stored bands and " +
          "miss historical candidates — use the original band count or rebuild")
    } else {
      val hasLegacyData = fs.exists(new org.apache.hadoop.fs.Path(dir, "bands")) &&
        fs.listStatus(new org.apache.hadoop.fs.Path(dir, "bands")).nonEmpty
      require(!hasLegacyData || (bandBits == 4 && nBands == 2),
        s"index at $indexDir has band data but no width marker — it " +
          "predates width pinning and was built at the historical default " +
          s"4 bits × 2 bands; reopening it at $bandBits×$nBands would " +
          "re-bucket silently. Reopen at 4×2 or rebuild the index at the " +
          "new structure")
      fs.mkdirs(dir)
      val tmp = new org.apache.hadoop.fs.Path(dir, "_band_bits.tmp")
      val out = fs.create(tmp, true)
      val content = if (nBands == 2) s"$bandBits\n" else s"$bandBits $nBands\n"
      try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      if (!fs.rename(tmp, marker)) {
        // lost a create race or stale tmp: re-validate against whoever won
        fs.delete(tmp, false)
        checkWidthMarker(spark, indexDir, bandBits, nBands)
      }
    }
  }

  private[graft] def processBatch(
      batchRaw: DataFrame,
      batchId: Long,
      indexDir: String,
      verdictDir: String,
      cosThreshold: Double,
      bandBits: Int = 4,
      nBands: Int = 2): Unit = {
    require(bandBits >= 1 && bandBits <= 16, s"bandBits=$bandBits not in [1,16]")
    require(nBands >= 2 && nBands * bandBits <= 63,
      s"nBands=$nBands: need >= 2 bands and nBands*bandBits <= 63 " +
        "(the sketch is one long)")
    val spark = batchRaw.sparkSession
    checkWidthMarker(spark, indexDir, bandBits, nBands)
    val bandsDir = s"$indexDir/bands"
    val vecsDir = s"$indexDir/vecs"

    val feats = batchRaw
      .select(col("vec_id").cast("long").as("vec_id"),
        col("v").cast("array<double>").as("v"))
      .persist()
    try {
      val newBands = feats
        .select(col("vec_id"),
          sketchOf(col("v"), nBands * bandBits).as("sketch"))
        .select(col("vec_id"),
          explode(sequence(lit(0), lit(nBands - 1))).as("band"),
          col("sketch"))
        .select(col("vec_id"), col("band"),
          expr(s"shiftright(sketch, band * $bandBits)")
            .bitwiseAND(lit((1L << bandBits) - 1)).as("bv"))

      val corpusBandPaths = IngestIndex.batchPaths(spark, bandsDir, batchId)
      val dupped: DataFrame =
        if (corpusBandPaths.isEmpty)
          spark.range(0).select(col("id").as("vec_id"), col("id").as("dup_of"))
        else {
          val cBands = spark.read
            .schema("vec_id long, band int, bv long")
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
