package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.SimilarityOps

/** Streaming IVF-PQ index MAINTENANCE — the at-ingest face of
  * q_ivfpq_topk/q_ivfpq_knn_join's store (Jégou et al. 2011 §IV-A). The
  * batch family trains codebooks and encodes a corpus in one job; a
  * production index is built once and then fed forever, so the streaming
  * shape is: codebooks FROZEN at build time (standard IVFADC practice —
  * retraining per batch would silently re-bucket history, the same
  * failure mode EmbedIngest's band marker guards), every micro-batch
  * encoded map-side against the broadcast structures and APPENDED to the
  * cid-partitioned codes store that retrieval partition-prunes.
  *
  *  - Store layout: `indexDir/codes/batch=N/cid=K/…` — 8 B of code per
  *    vector (the 100 TB dividend), batch dirs for exactly-once replay
  *    (a replayed batch OVERWRITES its own dir, never dupes), cid dirs
  *    so the nprobe filter stays disk-level partition pruning across
  *    the accumulated index.
  *  - Codebook identity is PINNED on disk (`_codebook` marker carrying
  *    shape + a content hash of centroids and codebooks): codes from
  *    different codebooks are incomparable, so reopening the index with
  *    retrained structures must FAIL LOUD, not corrupt retrieval
  *    silently — the lesson EmbedIngest.checkWidthMarker institutionalized.
  *  - Each batch also writes `stats/batch=N`: row count + mean/max
  *    quantization error ‖residual − decode(code)‖² (computed in the
  *    SAME encode pass — the argmin distance is the error). This is the
  *    retrain signal: frozen codebooks price distribution drift as
  *    rising qerr, and a deployment watches the trend instead of
  *    guessing when to rebuild.
  *
  * Encoding arithmetic is BIT-IDENTICAL to the batch
  * [[SimilarityOps.ivfPqEncode]] (same CentIndex assign, same residual
  * subtraction, same strict-< argmin), pinned by IvfPqIngestSpec: the
  * accumulated streamed store equals a one-shot batch encode of the same
  * vectors row for row, so batch-built and stream-maintained indexes are
  * interchangeable.
  */
object IvfPqIngest {

  /** Starts the ingest on a streaming (vec_id: long, v: array<double>)
    * frame, encoding against the frozen `cents`/`cb`. */
  def start(
      vecs: DataFrame,
      indexDir: String,
      checkpointDir: String,
      cents: Array[(Int, Array[Double])],
      cb: Array[Array[Array[Double]]]): StreamingQuery =
    vecs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        processBatch(batch, batchId, indexDir, cents, cb)
      }
      .start()

  /** Deterministic identity of the frozen structures: shape plus an MD5
    * over the exact double bits of centroids and codebooks, so "same
    * hash" means "same arithmetic", not "probably similar". */
  private[graft] def codebookId(
      cents: Array[(Int, Array[Double])],
      cb: Array[Array[Array[Double]]]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val buf = java.nio.ByteBuffer.allocate(8)
    def putD(d: Double): Unit = {
      buf.clear(); buf.putLong(java.lang.Double.doubleToLongBits(d))
      md.update(buf.array())
    }
    cents.sortBy(_._1).foreach { case (cid, c) =>
      buf.clear(); buf.putLong(cid.toLong); md.update(buf.array())
      c.foreach(putD)
    }
    cb.foreach(_.foreach(_.foreach(putD)))
    val hash = md.digest().map("%02x".format(_)).mkString
    s"ivfpq ${cents.length} ${cb.length} ${cb(0).length} $hash"
  }

  /** First touch writes the marker (atomic temp+rename); every later
    * batch verifies it. Mismatch = loud failure with the rebuild
    * instruction, never silent garbage retrieval. */
  private def checkCodebookMarker(
      spark: SparkSession, indexDir: String, id: String): Unit = {
    val dir = new org.apache.hadoop.fs.Path(indexDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(dir, "_codebook")
    if (fs.exists(marker)) {
      val in = fs.open(marker)
      val line = try new java.io.BufferedReader(
        new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8))
        .readLine()
      finally in.close()
      require(Option(line).map(_.trim).contains(id),
        s"index at $indexDir was built with codebook [$line]; this ingest " +
          s"carries [$id] — codes from different codebooks are " +
          "incomparable, so retrieval would be silently wrong. Re-open " +
          "with the original structures or rebuild the index")
    } else {
      fs.mkdirs(dir)
      val tmp = new org.apache.hadoop.fs.Path(dir, "_codebook.tmp")
      val out = fs.create(tmp, true)
      try out.write((id + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      if (!fs.rename(tmp, marker)) {
        fs.delete(tmp, false)
        checkCodebookMarker(spark, indexDir, id)
      }
    }
  }

  private[graft] def processBatch(
      batchRaw: DataFrame,
      batchId: Long,
      indexDir: String,
      cents: Array[(Int, Array[Double])],
      cb: Array[Array[Array[Double]]]): Unit = {
    val spark = batchRaw.sparkSession
    import spark.implicits._
    checkCodebookMarker(spark, indexDir, codebookId(cents, cb))

    val bcIdx = spark.sparkContext.broadcast(new SimilarityOps.CentIndex(cents))
    val bcC = spark.sparkContext.broadcast(cents.toMap)
    val bcCb = spark.sparkContext.broadcast(cb)
    // One map pass: assign → residual → per-subspace argmin code, PLUS
    // the quantization error (Σ over subspaces of the argmin distance —
    // exactly ‖residual − decode(code)‖², free at encode time). Same
    // arithmetic as SimilarityOps.ivfPqEncode, spec-pinned bit-identical.
    val coded = batchRaw
      .select(col("vec_id").cast("long").as("vec_id"),
        col("v").cast("array<double>").as("v"))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val idx = bcIdx.value
        val cm = bcC.value
        val books = bcCb.value
        val n = books.length
        val ds = books(0)(0).length
        it.map { case (id, v) =>
          val (cid, _) = idx.assign(v)
          val c = cm(cid)
          val r = new Array[Double](v.length)
          var j = 0
          while (j < v.length) { r(j) = v(j) - c(j); j += 1 }
          val code = new Array[Short](n)
          var qerr = 0.0
          var m = 0
          while (m < n) {
            val best = SimilarityOps.pqNearest(books(m), r, m * ds)
            code(m) = best.toByte.toShort
            val ce = books(m)(best)
            var dd = 0.0
            var k = 0
            while (k < ds) { val t = r(m * ds + k) - ce(k); dd += t * t; k += 1 }
            qerr += dd
            m += 1
          }
          (id, cid, code, qerr)
        }
      }
      .toDF("vec_id", "cid", "code", "qerr")
      .withColumn("code", col("code").cast("array<tinyint>"))
      .persist()
    try {
      coded.select("vec_id", "cid", "code")
        .write.mode(SaveMode.Overwrite).partitionBy("cid")
        .parquet(s"$indexDir/codes/batch=$batchId")
      coded.agg(
        count(lit(1)).as("n"),
        avg(col("qerr")).as("mean_qerr"),
        max(col("qerr")).as("max_qerr"))
        .write.mode(SaveMode.Overwrite)
        .parquet(s"$indexDir/stats/batch=$batchId")
    } finally {
      coded.unpersist()
      // per-batch broadcasts, released eagerly: a long-running stream
      // creates three per micro-batch, and leaving them to the
      // ContextCleaner means thousands of retained broadcast blocks at
      // production codebook sizes before a GC happens to notice
      bcIdx.destroy()
      bcC.destroy()
      bcCb.destroy()
    }
  }

  /** ADC retrieval over the ACCUMULATED store: probed cells from the
    * frozen centroids, per-cell residual LUTs broadcast, the cid filter
    * partition-prunes the codes scan (batch dirs and cid dirs are both
    * partition columns), ADC top-k from codes alone — 8 B/row, no
    * vectors fetched. Returns (vec_id, adc) ascending. */
  def retrieve(
      spark: SparkSession,
      indexDir: String,
      cents: Array[(Int, Array[Double])],
      cb: Array[Array[Array[Double]]],
      pv: Array[Double],
      nprobe: Int,
      k: Int): DataFrame = {
    checkCodebookMarker(spark, indexDir, codebookId(cents, cb))
    val ksub = cb(0).length
    val nSub = cb.length
    val probed = SimilarityOps.ivfPqProbedCells(cents, pv, nprobe)
    val luts = probed.map { case (cid, c) =>
      (cid, SimilarityOps.pqLut(cb,
        Array.tabulate(pv.length)(j => pv(j) - c(j))))
    }
    val lutDf = broadcast(
      spark.createDataFrame(luts.toSeq).toDF("cid", "lut"))
    spark.read.parquet(s"$indexDir/codes")
      .filter(col("cid").isin(probed.map(_._1): _*)) // partition prune
      .join(lutDf, "cid")
      .withColumn("adc",
        SimilarityOps.pqAdcColOf(col("lut"), col("code"), ksub, nSub))
      .orderBy(col("adc").asc, col("vec_id"))
      .limit(k)
      .select("vec_id", "adc")
  }
}
