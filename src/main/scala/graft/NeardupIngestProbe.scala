package graft

import org.apache.spark.sql.functions._

import graft.streaming.NeardupIngest

/** At-ingest dedup probe: `runMain graft.NeardupIngestProbe [nDocs]
  * [nBatches]` (defaults 200,000 docs / 10 batches).
  *
  * Generates a ScaleProbe-style corpus (hash-derived 60-word docs over a
  * 500-word vocabulary), splits it into sequential micro-batches, and
  * drives NeardupIngest.processBatch — the exact code path foreachBatch
  * runs — measuring per-batch wall time and end-to-end docs/s. The final
  * batch holds a twin (last 3 of 60 words replaced, trigram Jaccard
  * ≈ 0.90) of every 100th earlier doc plus an equal count of novel docs,
  * so the probe reports:
  *
  *  - recall: planted twins the signature-agreement gate dropped. The
  *    gate is sketch-only (no corpus text at verify time), so recall at
  *    J≈0.9 is bounded by the K=32 estimator's spread, ~0.95-0.99 —
  *    MEASURED here, not assumed; a production ingest tightens it by
  *    raising K (config, not code).
  *  - false drops: novel docs dropped anywhere (random-pair band
  *    collision then est ≥ 0.8 — should be zero at this scale).
  *
  * compact() runs mid-stream to prove ingestion continues against a
  * compacted corpus and the partition listing stays bounded.
  */
object NeardupIngestProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(200000L)
    val nBatches = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    require(nBatches >= 2, "need at least one base batch plus the twin batch")
    val spark = Sessions.local(appName = "graft-ndi-probe")

    val root = s"/tmp/graft_ndi_probe_$nDocs"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    val idx = s"$root/index"
    val out = s"$root/verdicts"

    val vocabSize = 500
    val wordsPerDoc = 60
    val word = (seed: org.apache.spark.sql.Column) =>
      concat(lit("w"), pmod(xxhash64(seed), lit(vocabSize)))
    def baseDocs(lo: Long, hi: Long) =
      spark.range(lo, hi)
        .select(col("id").as("doc_id"),
          concat_ws(" ", (0 until wordsPerDoc).map(j =>
            word(concat(col("id"), lit(s"_$j")))): _*).as("text"))

    val perBatch = nDocs / nBatches
    var done = 0L
    val t0 = System.nanoTime()
    for (b <- 0 until (nBatches - 1)) {
      val batch = baseDocs(b * perBatch, (b + 1) * perBatch)
      val tb = System.nanoTime()
      NeardupIngest.processBatch(batch, b.toLong, idx, out, 0.8)
      done += perBatch
      println(f"[ndi-probe] batch $b: $perBatch docs in " +
        f"${(System.nanoTime() - tb) / 1e9}%.2f s")
      if (b == nBatches / 2) {
        val tc = System.nanoTime()
        NeardupIngest.compact(spark, idx)
        println(f"[ndi-probe] compacted after batch $b in " +
          f"${(System.nanoTime() - tc) / 1e9}%.2f s")
      }
    }
    // final batch: twins of every 100th earlier doc + as many novel docs
    val seen = (nBatches - 1) * perBatch
    val twins = baseDocs(0, seen).filter(col("doc_id") % 100 === 0)
      .select((col("doc_id") + nDocs).as("doc_id"),
        concat(expr(s"substring_index(text, ' ', ${wordsPerDoc - 3})"),
          lit(" zz1 zz2 zz3")).as("text"))
    val novel = spark.range(2 * nDocs, 2 * nDocs + seen / 100)
      .select(col("id").as("doc_id"),
        concat_ws(" ", (0 until wordsPerDoc).map(j =>
          word(concat(col("id"), lit(s"_n$j")))): _*).as("text"))
    // Counted from the frame, not derived: seen/100 undercounts by one
    // whenever seen is not a multiple of 100 (doc 0 is always a twin
    // source), which inflated recall past 1.0 on non-round batch sizes.
    val nTwins = twins.count()
    val tb = System.nanoTime()
    NeardupIngest.processBatch(twins.unionByName(novel),
      (nBatches - 1).toLong, idx, out, 0.8)
    done += nTwins + seen / 100
    println(f"[ndi-probe] final batch: ${nTwins + seen / 100} docs in " +
      f"${(System.nanoTime() - tb) / 1e9}%.2f s")
    val totalSecs = (System.nanoTime() - t0) / 1e9

    val v = spark.read
      .schema("doc_id long, kept boolean, dup_of long")
      .parquet(out)
    val twinsDropped = v
      .filter(col("doc_id") >= nDocs && col("doc_id") < 2 * nDocs
        && !col("kept")).count()
    val falseDrops = v
      .filter((col("doc_id") < nDocs || col("doc_id") >= 2 * nDocs)
        && !col("kept")).count()
    val docsPerSec = (done / totalSecs).toLong
    println(s"""{"metric":"neardup_ingest_probe","docs":$done,""" +
      s""""batches":$nBatches,"secs":${f"$totalSecs%.2f"},""" +
      s""""docs_per_sec":$docsPerSec,""" +
      s""""recall":${f"${twinsDropped.toDouble / nTwins}%.4f"},""" +
      s""""planted":$nTwins,"dropped":$twinsDropped,""" +
      s""""false_drops":$falseDrops}""")
    spark.stop()
  }
}
