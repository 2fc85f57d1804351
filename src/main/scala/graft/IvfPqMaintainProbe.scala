package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.SimilarityOps
import graft.streaming.IvfPqIngest

/** Scale probe for the SELF-MAINTENANCE loop
  * ([[graft.streaming.IvfPqIngest.maintain]]):
  * `runMain graft.IvfPqMaintainProbe [nVecs] [nBatches] [nOodBatches]`
  * (defaults 200,000 / 10 / 3).
  *
  * IvfPqMigrateProbe drives the drift lifecycle by HAND-SEQUENCING four
  * calls (read stats, train, begin, migrate flagged-first then bulk);
  * this probe drives the SAME fixture through the single unattended
  * entry point and requires the same outcomes:
  *
  *  1. gen-0 store: bootstrap-trained structures, in-dist batches, then
  *     DRIFTED batches (fresh cluster geometry + constant shift);
  *  2. ONE maintain() call must: flag exactly the drifted batches
  *     (worst first), train gen 1 on the operator's recent window with
  *     the ARMING RULE (this mixture corpus is variance-balanced, so
  *     the rule must DISARM — the r19-adjudicated regime split),
  *     persist + publish the structures, migrate flagged batches first
  *     and the rest in one bulk job;
  *  3. post-maintain, the drifted batches' qerr must sit back inside
  *     the gen-1 band (ratio < 2 — the hand-sequenced probe's own bar);
  *  4. a SECOND maintain() must be a NO-OP (the signal was consumed);
  *  5. retrieval over the maintained store must surface planted twins
  *     on both the in-dist and the drifted side, through the persisted
  *     structures alone (loadGeneration — the operator needs nothing
  *     in memory).
  * One JSON line at the end.
  */
object IvfPqMaintainProbe {
  def main(args: Array[String]): Unit = {
    val nVecs = args.headOption.map(_.toLong).getOrElse(200000L)
    val nBatches = args.lift(1).map(_.toInt).getOrElse(10)
    val nOod = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = Sessions.local(appName = "graft-ivfpq-maintain-probe")

    val dim = 64
    val nCenters = 512
    val spread = 0.35
    val perBatch = nVecs / nBatches
    val dir = s"/tmp/graft_ivfpq_maintain_probe_${nVecs}_${System.nanoTime()}"

    def unif(c: org.apache.spark.sql.Column, salt: String) =
      (pmod(xxhash64(concat(c, lit(salt))), lit(1000000000L)).cast("double")
        + 0.5) / 1000000000.0
    def gauss(c: org.apache.spark.sql.Column, j: Int) =
      sqrt(lit(-2.0) * log(unif(c, s"_a$j"))) *
        cos(lit(2 * math.Pi) * unif(c, s"_b$j"))
    def centersFor(salt: String) = broadcast(spark.range(0, nCenters)
      .select(col("id").as("cidx"),
        array((0 until dim).map(j =>
          gauss(concat(lit(salt), col("id")), j)): _*).as("ctr")))
    val centersIn = centersFor("C")
    val centersOod = centersFor("D")
    def mixture(from: Long, until: Long, centers: DataFrame,
        offset: Double): DataFrame = {
      val comps = (0 until dim).map { j =>
        element_at(col("ctr"), j + 1) + lit(spread) * gauss(col("vec_id"), j) +
          lit(offset)
      }
      spark.range(from, until)
        .select(col("id").as("vec_id"),
          pmod(xxhash64(concat(lit("ctr"), col("id"))), lit(nCenters))
            .as("cidx"))
        .join(centers, "cidx")
        .select(col("vec_id"), array(comps: _*).as("v"))
    }
    def inDist(from: Long, until: Long) = mixture(from, until, centersIn, 0.0)
    def ood(from: Long, until: Long) = mixture(from, until, centersOod, 2.0)

    def timed[T](name: String)(f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[ivfpq-maintain] $name%-34s $secs%8.2f s")
      (r, secs)
    }

    def twinsOf(target: Array[Double], baseId: Long, seed: Int) =
      (0 until 5).map { i =>
        val rng = new scala.util.Random(seed + i)
        (baseId + i,
          Array.tabulate(dim)(j => target(j) + 0.01 * rng.nextGaussian()))
      }

    // ---- gen 0: bootstrap + in-dist stream, then drift ---------------
    val boot = inDist(0, perBatch).persist()
    val (gen0, train0Wall) = timed("gen0 train (coarse + PQ)") {
      val c = SimilarityOps.kmCentroids(boot, 64, 2)
      val resid = SimilarityOps.ivfPqResiduals(boot, c)
        .select(col("vec_id"), col("r").as("v"))
      IvfPqIngest.GenStructs(c, SimilarityOps.pqTrain(resid, 8, 256, 2))
    }
    val targetIn = boot.filter(col("vec_id") === 7)
      .select("v").head().getSeq[Double](0).toArray
    val twinsIn = twinsOf(targetIn, nVecs, 100)
    IvfPqIngest.processBatch(boot, 0L, dir, gen0.cents, gen0.cb)
    boot.unpersist()
    for (b <- 1 until nBatches) {
      val batch = inDist(b * perBatch, (b + 1) * perBatch)
      val withTwins =
        if (b == nBatches - 1)
          batch.unionByName(spark.createDataFrame(twinsIn).toDF("vec_id", "v"))
        else batch
      IvfPqIngest.processBatch(withTwins, b.toLong, dir, gen0.cents, gen0.cb)
    }
    val oodBase = 10 * nVecs
    val targetOod = ood(oodBase, oodBase + 1)
      .select("v").head().getSeq[Double](0).toArray
    val twinsOod = twinsOf(targetOod, 20 * nVecs, 200)
    for (b <- 0 until nOod) {
      val batch = ood(oodBase + b * perBatch, oodBase + (b + 1) * perBatch)
      val withTwins =
        if (b == nOod - 1)
          batch.unionByName(spark.createDataFrame(twinsOod).toDF("vec_id", "v"))
        else batch
      IvfPqIngest.processBatch(withTwins, (nBatches + b).toLong, dir,
        gen0.cents, gen0.cb)
    }

    // ---- ONE call heals the store ------------------------------------
    val window = inDist((nBatches - 1) * perBatch, nBatches * perBatch)
      .unionByName(ood(oodBase, oodBase + nOod * perBatch))
      .select((row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy("vec_id")) - 1).cast("long").as("vec_id"), col("v"))
    val corpus = inDist(0, nVecs)
      .unionByName(spark.createDataFrame(twinsIn).toDF("vec_id", "v"))
      .unionByName(ood(oodBase, oodBase + nOod * perBatch))
      .unionByName(spark.createDataFrame(twinsOod).toDF("vec_id", "v"))
    val flaggedExpected = (nBatches until nBatches + nOod).map(_.toLong).toSet
    val (report, maintainWall) = timed("maintain() (train+publish+migrate)") {
      IvfPqIngest.maintain(spark, dir, corpus, window, 64, 8, 256)
    }
    println(s"[ivfpq-maintain] report: $report")
    require(report.newGen.contains(1),
      s"drift did not roll a generation: $report")
    require(report.flagged.toSet == flaggedExpected,
      s"flagged ${report.flagged} != drifted $flaggedExpected")
    require(report.worstRatio > 3,
      f"drift not priced (worstRatio ${report.worstRatio}%.1f) — fixture broken")
    // armed is REPORTED, not required: unlike OpqRecallProbe's pure
    // mixture (adjudicated disarm), this retrain window mixes in-dist
    // and constant-shifted data — a rank-1 covariance component the
    // rotation may legitimately exploit; either verdict is correct
    // here and the migration handles both.
    println(s"[ivfpq-maintain] arming rule verdict on the drift window: " +
      s"armed=${report.armed}")
    require(report.migrated == nBatches + nOod,
      s"expected ${nBatches + nOod} batches migrated: $report")
    val totalVecs = nVecs + 5 + nOod * perBatch + 5
    val maintainVecsPerSec = totalVecs / maintainWall

    // ---- the loop closed: ratio back in band, second call a no-op ----
    def meanQerr(gen: Int, batches: Range): Double = {
      val m = spark.read.parquet(s"$dir/stats")
        .filter(col("gen") === gen)
        .select(col("batch").cast("long"), col("mean_qerr")).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      batches.map(b => m(b.toLong)).sum / batches.size
    }
    val inBand1 = meanQerr(1, 0 until nBatches)
    val oodQerr1 = meanQerr(1, nBatches until nBatches + nOod)
    val ratio1 = oodQerr1 / inBand1
    println(f"[ivfpq-maintain] gen1 qerr: in-dist $inBand1%.3f, " +
      f"healed-drift $oodQerr1%.3f (ratio $ratio1%.2f×, was " +
      f"${report.worstRatio}%.1f×)")
    require(ratio1 < 2,
      f"post-maintain drifted qerr ratio $ratio1%.1f still outside the band")
    val (report2, noopWall) = timed("maintain() again (must no-op)") {
      IvfPqIngest.maintain(spark, dir, corpus, window, 64, 8, 256)
    }
    require(report2.newGen.isEmpty && report2.migrated == 0 && !report2.resumed,
      s"second maintain() was not a no-op: $report2")

    // ---- retrieval through the PERSISTED structures only -------------
    val s1 = IvfPqIngest.loadGeneration(spark, dir, 1).getOrElse(
      sys.error("maintain() did not persist the generation it published"))
    val gens = Map(1 -> s1)
    def found(pv: Array[Double], twins: Seq[(Long, Array[Double])]): Int = {
      val ids = IvfPqIngest.retrieveGens(spark, dir, gens, pv, 4, 20)
        .collect().map(_.getLong(0)).toSet
      twins.map(_._1).count(ids)
    }
    val (twinsFound, retrWall) = timed("retrieval via loadGeneration (2 probes)") {
      (found(targetIn, twinsIn), found(targetOod, twinsOod))
    }
    println(s"[ivfpq-maintain] twins via persisted structures: " +
      s"${twinsFound._1}/5 in-dist, ${twinsFound._2}/5 healed-drift")
    require(twinsFound._1 == 5 && twinsFound._2 == 5,
      s"maintained store lost twins: $twinsFound")

    println(
      s"""{"probe":"ivfpq_maintain","n_vecs":$totalVecs,""" +
        s""""n_batches":${nBatches + nOod},""" +
        s""""gen0_train_s":${f"$train0Wall%.2f"},""" +
        s""""flagged":[${report.flagged.mkString(",")}],""" +
        s""""ood_qerr_ratio_gen0":${f"${report.worstRatio}%.1f"},""" +
        s""""ood_qerr_ratio_gen1":${f"$ratio1%.2f"},""" +
        s""""armed":${report.armed},""" +
        s""""maintain_s":${f"$maintainWall%.2f"},""" +
        s""""maintain_vecs_per_sec":${maintainVecsPerSec.round},""" +
        s""""noop_s":${f"$noopWall%.2f"},""" +
        s""""retrieval_twins":[${twinsFound._1},${twinsFound._2}],""" +
        s""""retrieval_s":${f"$retrWall%.2f"},""" +
        s""""batches_migrated":${report.migrated}}""")
    graft.SoakDirs.deleteRecursively(java.nio.file.Paths.get(dir))
    spark.stop()
  }
}
