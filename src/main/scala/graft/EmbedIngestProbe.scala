package graft

import org.apache.spark.sql.functions._

import graft.streaming.EmbedIngest

/** At-ingest EMBEDDING dedup probe: `runMain graft.EmbedIngestProbe
  * [nVecs] [nBatches] [bandBits] [nBands]` (defaults 200,000 / 10 / 12 / 2).
  *
  * The embedding twin of NeardupIngestProbe: generates hash-seeded
  * gaussian vectors (the ScaleProbe recipe), splits them into sequential
  * micro-batches, and drives EmbedIngest.processBatch — the exact
  * foreachBatch path — at the DEPLOYMENT band width (12 bits, the
  * 10⁸-corpus setting, vs the fixture-scale default 4). The final batch
  * plants, for every 100th accepted vector: an EXACT duplicate direction
  * (the vector scaled ×2 — cosine exactly 1, and an identical sketch, so
  * banding can never lose it) and a NEAR copy (5% gaussian noise,
  * cos ≈ 0.9988), plus an equal count of novel vectors. Reported:
  *
  *  - exact_recall: scaled copies dropped — must be 1.0 (identical
  *    sketch ⇒ candidate for sure; exact cosine gate decides).
  *  - near_recall: noisy copies dropped — bounded by the n-band depth-b
  *    collision rate at cos 0.9988 (per-band p^b; at 2×12 pair ≈ 0.978,
  *    at 3×12 ≈ 0.995 — nBands is the knob for deployments needing
  *    ≥0.99, measured ON the bound because the gate verifies true
  *    cosine on stored vectors, no estimator (contrast the text twin's
  *    signature-agreement estimate).
  *  - false_drops: novel vectors dropped anywhere — must be 0 (a random
  *    64-d pair at cos ≥ 0.9 is ~impossible even among candidates).
  */
object EmbedIngestProbe {
  def main(args: Array[String]): Unit = {
    val nVecs = args.headOption.map(_.toLong).getOrElse(200000L)
    val nBatches = args.lift(1).map(_.toInt).getOrElse(10)
    val bandBits = args.lift(2).map(_.toInt).getOrElse(12)
    val nBands = args.lift(3).map(_.toInt).getOrElse(2)
    require(nBatches >= 2, "need base batches plus the twin batch")
    val spark = Sessions.local(appName = "graft-ei-probe")

    val root = s"/tmp/graft_ei_probe_${nVecs}_$nBands"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    val idx = s"$root/index"
    val out = s"$root/verdicts"

    val dim = 64
    def unif(c: org.apache.spark.sql.Column, salt: String) =
      (pmod(xxhash64(concat(c, lit(salt))), lit(1000000000L)).cast("double")
        + 0.5) / 1000000000.0
    def gauss(c: org.apache.spark.sql.Column, j: Int) =
      sqrt(lit(-2.0) * log(unif(c, s"_a$j"))) *
        cos(lit(2 * math.Pi) * unif(c, s"_b$j"))
    def baseVecs(lo: Long, hi: Long) =
      spark.range(lo, hi).select(col("id").as("vec_id"),
        array((0 until dim).map(j => gauss(col("id"), j)): _*).as("v"))

    val perBatch = nVecs / nBatches
    val t0 = System.nanoTime()
    for (b <- 0 until (nBatches - 1)) {
      val tb = System.nanoTime()
      EmbedIngest.processBatch(baseVecs(b * perBatch, (b + 1) * perBatch),
        b.toLong, idx, out, 0.9, bandBits, nBands)
      println(f"[ei-probe] batch $b: $perBatch vecs in " +
        f"${(System.nanoTime() - tb) / 1e9}%.2f s")
      if (b == nBatches / 2) {
        val tc = System.nanoTime()
        EmbedIngest.compact(spark, idx)
        println(f"[ei-probe] compacted after batch $b in " +
          f"${(System.nanoTime() - tc) / 1e9}%.2f s")
      }
    }
    // final batch: exact-direction copies (×2 scale, cos = 1, identical
    // sketch), near copies (5% noise, cos ≈ 0.9988), novel vectors
    val seen = (nBatches - 1) * perBatch
    val exacts = baseVecs(0, seen).filter(col("vec_id") % 100 === 0)
      .select((col("vec_id") + nVecs).as("vec_id"),
        transform(col("v"), x => x * 2.0).as("v"))
    // noise salt MUST differ from the base generation's: gauss(vec_id, j)
    // here resolves to the ORIGINAL id (sibling select expressions read
    // input columns), and with the same _a/_b salts the "noise" would be
    // bit-identical to the vector itself — a 1.05x scaled copy at cos
    // exactly 1, making near_recall vacuous (review find: the probe
    // measured nothing until the salt diverged)
    def noise(c: org.apache.spark.sql.Column, j: Int) =
      sqrt(lit(-2.0) * log(unif(c, s"_na$j"))) *
        cos(lit(2 * math.Pi) * unif(c, s"_nb$j"))
    val nears = baseVecs(0, seen).filter(col("vec_id") % 100 === 50)
      .select((col("vec_id") + 2 * nVecs).as("vec_id"),
        array((0 until dim).map(j =>
          element_at(col("v"), j + 1) +
            lit(0.05) * noise(col("vec_id"), j)): _*).as("v"))
    val novel = spark.range(4 * nVecs, 4 * nVecs + seen / 100)
      .select(col("id").as("vec_id"),
        array((0 until dim).map(j => gauss(concat(col("id"), lit("_n")), j)): _*).as("v"))
    val nExact = exacts.count(); val nNear = nears.count()
    require(nExact > 0 && nNear > 0,
      s"args too small to plant twins (exact=$nExact near=$nNear) — " +
        "the recall ratios would be NaN and the JSON line unparseable")
    val tb = System.nanoTime()
    EmbedIngest.processBatch(exacts.unionByName(nears).unionByName(novel),
      (nBatches - 1).toLong, idx, out, 0.9, bandBits, nBands)
    println(f"[ei-probe] final batch: ${nExact + nNear + seen / 100} vecs in " +
      f"${(System.nanoTime() - tb) / 1e9}%.2f s")
    val totalSecs = (System.nanoTime() - t0) / 1e9

    val v = spark.read
      .schema("vec_id long, kept boolean, dup_of long")
      .parquet(out)
    val exactDropped = v.filter(col("vec_id") >= nVecs &&
      col("vec_id") < 2 * nVecs && !col("kept")).count()
    val nearDropped = v.filter(col("vec_id") >= 2 * nVecs &&
      col("vec_id") < 3 * nVecs && !col("kept")).count()
    val falseDrops = v.filter((col("vec_id") < nVecs ||
      col("vec_id") >= 4 * nVecs) && !col("kept")).count()
    val done = seen + nExact + nNear + seen / 100
    println(s"""{"metric":"embed_ingest_probe","vecs":$done,""" +
      s""""batches":$nBatches,"band_bits":$bandBits,"n_bands":$nBands,""" +
      s""""secs":${f"$totalSecs%.2f"},""" +
      s""""vecs_per_sec":${(done / totalSecs).toLong},""" +
      s""""exact_recall":${f"${exactDropped.toDouble / nExact}%.4f"},""" +
      s""""near_recall":${f"${nearDropped.toDouble / nNear}%.4f"},""" +
      s""""planted":${nExact + nNear},"false_drops":$falseDrops}""")
    spark.stop()
  }
}
