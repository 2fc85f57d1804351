package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.SimilarityOps
import graft.streaming.IvfPqIngest
import graft.streaming.IvfPqIngest.GenStructs

/** OPQ-in-the-store probe (r18 verdict #1): the trained rotation rolled
  * into a LIVE IVF-PQ store through the generation machinery —
  * `runMain graft.IvfPqOpqProbe [nVecs] [nProbes] [trainCap]`
  * (defaults 200,000 / 100 / 50,000).
  *
  * Corpus: the OpqRecallProbe ANISOTROPIC mixture (512 gaussian
  * centers, dims 0..7 ×10, the rest ×0.1) — the regime OPQ exists for.
  * The lifecycle:
  *  1. gen 0 = UNROTATED IVF-PQ (nlist=64, ksub=256, M=8) ingests the
  *     stream in 10 batches; recall@10 vs exact brute at shortlist
  *     {64, 256} over held-out probes is the baseline (measured through
  *     the BATCH face over the store's own codes — the
  *     q_ivfpq_knn_join shape reading `dir/codes`);
  *  2. gen 1 = OPQ: R trained on a `trainCap` sample
  *     ([[SimilarityOps.opqTrainRotation]]), coarse centroids + residual
  *     codebooks trained in ROTATED space;
  *  3. HALF the batches migrate through the INCREMENTAL surface
  *     ([[IvfPqIngest.migrateBatch]]) — mid-rollout, the store is mixed
  *     rotated/unrotated and recall is measured ACROSS the mix (each
  *     generation scored in its own space, one global top-k; the
  *     (gen, cid) prune is plan-asserted via [[IvfPqIngest.retrieveGens]]);
  *  4. the rest migrates via the bulk surface; post-rollout OPQ recall
  *     must exceed the unrotated baseline at shortlist 256 — the
  *     OpqRecallProbe step (0.758 → 0.851 flat-PQ analog) delivered
  *     through the live store's own migration machinery.
  * One JSON line at the end. */
object IvfPqOpqProbe {
  def main(args: Array[String]): Unit = {
    val nVecs = args.headOption.map(_.toLong).getOrElse(200000L)
    val nProbes = args.lift(1).map(_.toInt).getOrElse(100)
    val trainCap = args.lift(2).map(_.toLong).getOrElse(50000L)
    val spark = Sessions.local(appName = "graft-ivfpq-opq-probe")
    import spark.implicits._

    val dim = 64
    val nCenters = 512
    val spread = 0.35
    val nlist = 64
    val ksub = 256
    val nSub = 8
    val nprobe = 16
    val shortlists = Seq(64, 256)
    val nBatches = 10
    val perBatch = nVecs / nBatches
    val dir = s"/tmp/graft_ivfpq_opq_probe_${nVecs}_${System.nanoTime()}"

    def unif(c: org.apache.spark.sql.Column, salt: String) =
      (pmod(xxhash64(concat(c, lit(salt))), lit(1000000000L)).cast("double")
        + 0.5) / 1000000000.0
    def gauss(c: org.apache.spark.sql.Column, j: Int) =
      sqrt(lit(-2.0) * log(unif(c, s"_a$j"))) *
        cos(lit(2 * math.Pi) * unif(c, s"_b$j"))
    val centers = broadcast(spark.range(0, nCenters)
      .select(col("id").as("cidx"),
        array((0 until dim).map(j =>
          gauss(concat(lit("C"), col("id")), j)): _*).as("ctr")))
    def scaleOf(j: Int): Double = if (j < 8) 10.0 else 0.1
    def mixture(from: Long, until: Long): DataFrame = {
      val comps = (0 until dim).map { j =>
        lit(scaleOf(j)) * (element_at(col("ctr"), j + 1)
          + lit(spread) * gauss(col("vec_id"), j))
      }
      spark.range(from, until)
        .select(col("id").as("vec_id"),
          pmod(xxhash64(concat(lit("ctr"), col("id"))), lit(nCenters))
            .as("cidx"))
        .join(centers, "cidx")
        .select(col("vec_id"), array(comps: _*).as("v"))
    }

    def timed[T](name: String)(f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[ivfpq-opq] $name%-42s $secs%8.2f s")
      (r, secs)
    }
    def rotVec(r: Array[Array[Double]], v: Array[Double]): Array[Double] =
      Array.tabulate(r.length) { i =>
        var s = 0.0; var j = 0
        while (j < r.length) { s += r(i)(j) * v(j); j += 1 }
        s
      }

    // ---- corpus + held-out probes + exact truth ----------------------
    val corpusPath = s"$dir/corpus"
    timed("corpus write") {
      mixture(0, nVecs).write.mode("overwrite").parquet(corpusPath)
    }
    val corpus = spark.read.parquet(corpusPath)
    val probes: Array[(Long, Array[Double])] =
      mixture(nVecs, nVecs + nProbes)
        .as[(Long, Array[Double])].collect().sortBy(_._1)
    val probeDf = broadcast(
      spark.createDataFrame(probes.toSeq).toDF("probe_id", "p"))
    import org.apache.spark.sql.expressions.Window
    val perProbeCos = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    val perProbeAdc = Window.partitionBy(col("probe_id"))
      .orderBy(col("adc").asc, col("vec_id"))
    val (truth, bruteWall) = timed("brute exact top-10") {
      corpus.crossJoin(probeDf)
        .select(col("probe_id"), col("vec_id"),
          expr("cosine_sim(v, p)").as("cos"))
        .filter(!isnan(col("cos")))
        .withColumn("rk", row_number().over(perProbeCos))
        .filter(col("rk") <= 10)
        .select("probe_id", "vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    }

    // ---- gen 0: unrotated IVF-PQ, 10-batch ingest --------------------
    val trainSample = corpus.filter(col("vec_id") < trainCap)
    val (gen0, train0Wall) = timed("gen0 train (unrotated)") {
      val c = SimilarityOps.kmCentroids(trainSample, nlist, 2)
      val resid = SimilarityOps.ivfPqResiduals(trainSample, c)
        .select(col("vec_id"), col("r").as("v"))
      GenStructs(c, SimilarityOps.pqTrain(resid, nSub, ksub, 2))
    }
    val (_, ingestWall) = timed(s"ingest $nBatches batches (gen 0)") {
      for (b <- 0 until nBatches)
        IvfPqIngest.processBatch(
          corpus.filter(col("vec_id") >= b * perBatch &&
            col("vec_id") < (b + 1) * perBatch),
          b.toLong, dir, gen0.cents, gen0.cb)
    }

    /** Recall@10 of the STORE's batch retrieval face at each shortlist:
      * the q_ivfpq_knn_join shape over `dir/codes` — per-(probe, gen,
      * cell) residual LUTs on one broadcast, the (gen, cid) join doing
      * nprobe-prune + LUT dispatch, WindowGroupLimit ADC shortlist,
      * exact re-rank on survivors only. Works unchanged on a MIXED
      * store: each generation's rows score in their own space. */
    def storeRecall(gens: Map[Int, GenStructs]): Seq[(Int, Double)] = {
      val lutRows = probes.toSeq.flatMap { case (pid, pv) =>
        gens.toSeq.flatMap { case (g, s) =>
          val pg = s.rot.map(rotVec(_, pv)).getOrElse(pv)
          SimilarityOps.ivfPqProbedCells(s.cents, pg, nprobe).map {
            case (cid, c) =>
              (pid, g, cid, SimilarityOps.pqLut(s.cb,
                Array.tabulate(dim)(j => pg(j) - c(j))))
          }
        }
      }
      val lutDf = broadcast(spark.createDataFrame(lutRows)
        .toDF("probe_id", "gen", "cid", "lut"))
      val cand = spark.read.parquet(s"$dir/codes")
        .join(lutDf, Seq("gen", "cid"))
        .select(col("probe_id"), col("vec_id"),
          SimilarityOps.pqAdcColOf(col("lut"), col("code"), ksub, nSub)
            .as("adc"))
        .withColumn("rk", row_number().over(perProbeAdc))
        .filter(col("rk") <= shortlists.max)
        .select("probe_id", "vec_id", "rk")
        .as[(Long, Long, Int)].collect()
      shortlists.map { short =>
        val candS = cand.filter(_._3 <= short).map(t => (t._1, t._2))
        val candDf = broadcast(
          spark.createDataFrame(candS.toSeq).toDF("probe_id", "vec_id"))
        val got = candDf.join(corpus, "vec_id")
          .join(probeDf, "probe_id")
          .select(col("probe_id"), col("vec_id"),
            expr("cosine_sim(v, p)").as("cos"))
          .filter(!isnan(col("cos")))
          .withColumn("rk", row_number().over(perProbeCos))
          .filter(col("rk") <= 10)
          .select("probe_id", "vec_id").as[(Long, Long)].collect()
          .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        val recall = probes.map { case (pid, _) =>
          val t = truth.getOrElse(pid, Set.empty)
          if (t.isEmpty) 1.0
          else t.count(got.getOrElse(pid, Set.empty)).toDouble / t.size
        }.sum / probes.length
        short -> recall
      }
    }

    val (flatRecalls, flatWall) = timed("recall (gen 0, unrotated)") {
      storeRecall(Map(0 -> gen0))
    }
    flatRecalls.foreach { case (s, r) =>
      println(f"[ivfpq-opq] ARM flat  short=$s%-5d recall@10=$r%.4f")
    }

    // ---- gen 1: OPQ — rotation + rotated-space structures ------------
    val (gen1, train1Wall) = timed("gen1 train (OPQ rotation + structures)") {
      val r = SimilarityOps.opqTrainRotation(trainSample, nSub, ksub, 2, 2)
      val rotTrain = SimilarityOps.rotateBy(trainSample, r)
      val c = SimilarityOps.kmCentroids(rotTrain, nlist, 2)
      val resid = SimilarityOps.ivfPqResiduals(rotTrain, c)
        .select(col("vec_id"), col("r").as("v"))
      GenStructs(c, SimilarityOps.pqTrain(resid, nSub, ksub, 2), Some(r))
    }
    IvfPqIngest.beginGeneration(spark, dir, 1, gen1.cents, gen1.cb, gen1.rot)

    // ---- incremental rollout: HALF the batches, then measure MIXED ---
    val half = (0 until nBatches / 2).map(_.toLong)
    val (_, migHalfWall) = timed(s"migrateBatch x${half.size} (incremental)") {
      half.foreach(b => IvfPqIngest.migrateBatch(
        spark, dir, b, corpus, 0, 1, gen1.cents, gen1.cb, gen1.rot))
    }
    val gens = Map(0 -> gen0, 1 -> gen1)
    // The store face itself: one retrieveGens call must keep (gen, cid)
    // partition pruning across the rotated/unrotated mix.
    val planDf = IvfPqIngest.retrieveGens(
      spark, dir, gens, probes.head._2, nprobe, 10)
    val plan = planDf.queryExecution.executedPlan.toString
    require(plan.contains("PartitionFilters: [") &&
      plan.split("PartitionFilters:")(1).takeWhile(_ != ']').contains("cid"),
      "(gen, cid) filter did not partition-prune the mixed rotated store")
    require(planDf.collect().length == 10, "mixed retrieveGens under-filled")
    val (mixedRecalls, mixedWall) = timed("recall (MIXED rotated/unrotated)") {
      storeRecall(gens)
    }
    mixedRecalls.foreach { case (s, r) =>
      println(f"[ivfpq-opq] ARM mixed short=$s%-5d recall@10=$r%.4f")
    }

    // ---- finish the rollout (bulk), measure OPQ ----------------------
    val (movedRest, migRestWall) = timed("migrate remainder (bulk)") {
      IvfPqIngest.migrate(spark, dir, corpus, 1, gen1.cents, gen1.cb, gen1.rot)
    }
    require(IvfPqIngest.listBatches(spark, dir)
      .getOrElse(0, Set.empty).isEmpty, "gen-0 batches survived the rollout")
    val (opqRecalls, opqWall) = timed("recall (gen 1, OPQ)") {
      storeRecall(Map(1 -> gen1))
    }
    opqRecalls.foreach { case (s, r) =>
      println(f"[ivfpq-opq] ARM opq   short=$s%-5d recall@10=$r%.4f")
    }

    def at(recs: Seq[(Int, Double)], s: Int): Double =
      recs.find(_._1 == s).get._2
    // The load-bearing claims, asserted not just printed:
    require(at(opqRecalls, 256) > at(flatRecalls, 256),
      f"OPQ rollout did not buy recall on the anisotropic store: " +
        f"flat ${at(flatRecalls, 256)}%.4f vs opq ${at(opqRecalls, 256)}%.4f")
    // Mid-rollout the mixed store must stay serviceable — never
    // meaningfully below the WORSE of its two endpoints.
    val floor = math.min(at(flatRecalls, 256), at(opqRecalls, 256)) - 0.03
    require(at(mixedRecalls, 256) >= floor,
      f"mixed-generation recall ${at(mixedRecalls, 256)}%.4f fell below " +
        f"the endpoint floor $floor%.4f — the rollout degraded retrieval")

    val migWall = migHalfWall + migRestWall
    def rj(recs: Seq[(Int, Double)]) = recs.map { case (s, r) =>
      f""""$s":$r%.4f""" }.mkString("{", ",", "}")
    println(
      s"""{"probe":"ivfpq_opq_store","n_vecs":$nVecs,"n_probes":$nProbes,""" +
        s""""train_cap":$trainCap,"nlist":$nlist,"ksub":$ksub,""" +
        s""""nprobe":$nprobe,""" +
        s""""recall_flat":${rj(flatRecalls)},""" +
        s""""recall_mixed":${rj(mixedRecalls)},""" +
        s""""recall_opq":${rj(opqRecalls)},""" +
        s""""gen0_train_s":${f"$train0Wall%.2f"},""" +
        s""""gen1_train_s":${f"$train1Wall%.2f"},""" +
        s""""ingest_s":${f"$ingestWall%.2f"},""" +
        s""""migrate_s":${f"$migWall%.2f"},""" +
        s""""migrate_vecs_per_sec":${(nVecs / migWall).round},""" +
        s""""recall_walls_s":[${f"$flatWall%.1f"},${f"$mixedWall%.1f"},""" +
        s"""${f"$opqWall%.1f"}],"brute_s":${f"$bruteWall%.2f"},""" +
        s""""batches_migrated":${half.size + movedRest}}""")
    graft.SoakDirs.deleteRecursively(java.nio.file.Paths.get(dir))
    spark.stop()
  }
}
