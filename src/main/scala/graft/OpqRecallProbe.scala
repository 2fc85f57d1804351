package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.SimilarityOps

/** RR-vs-OPQ A/B at scale (r17 verdict #4):
  * `runMain graft.OpqRecallProbe [nVecs] [nProbes] [trainCap]`
  * (defaults 1,000,000 / 100 / 100,000).
  *
  * Three flat-PQ arms — identity (no rotation), RR (the q_rrpq_encode
  * baseline), OPQ (the q_opq_encode trained rotation, learned on a
  * `trainCap` sample as published) — on TWO corpora:
  *  - `mixture`: the PqRecallProbe mixture (512 gaussian centers,
  *    spread 0.35) — variance already near-balanced, so rotation should
  *    buy little; an honest parity check, not a rigged win;
  *  - `aniso`: the same mixture with per-dim scales (dims 0..7 ×10,
  *    the rest ×0.1) — the cluster structure collapses into one
  *    subspace, the regime OPQ exists for.
  * Per (corpus, arm): train+encode wall, total quantization error (the
  * objective the alternation minimizes — unambiguous even where recall
  * saturates), and recall@10 vs exact brute cosine at matched
  * shortlists {16, 64, 256, 1024} over `nProbes` HELD-OUT probes (ADC
  * scan through the WindowGroupLimit partial, exact re-rank — the
  * PqRecallProbe protocol). One JSON line at the end.
  */
object OpqRecallProbe {
  def main(args: Array[String]): Unit = {
    val nVecs = args.headOption.map(_.toLong).getOrElse(1000000L)
    val nProbes = args.lift(1).map(_.toInt).getOrElse(100)
    val trainCap = args.lift(2).map(_.toLong).getOrElse(100000L)
    val spark = Sessions.local(appName = "graft-opq-recall-probe")
    import spark.implicits._

    val dim = 64
    val nCenters = 512
    val spread = 0.35
    val ksub = 256
    val nSub = 8
    val shortlists = Seq(16, 64, 256, 1024)
    val maxShort = shortlists.max
    val vdir = s"/tmp/graft_opq_recall_${nVecs}_${System.nanoTime()}"

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
    def scaleOf(j: Int, aniso: Boolean): Double =
      if (!aniso) 1.0 else if (j < 8) 10.0 else 0.1
    def mixture(n: Long, offset: Long, aniso: Boolean): DataFrame = {
      val comps = (0 until dim).map { j =>
        lit(scaleOf(j, aniso)) * (element_at(col("ctr"), j + 1)
          + lit(spread) * gauss(col("vec_id"), j))
      }
      spark.range(offset, offset + n)
        .select(col("id").as("vec_id"),
          pmod(xxhash64(concat(lit("ctr"), col("id"))), lit(nCenters))
            .as("cidx"))
        .join(centers, "cidx")
        .select(col("vec_id"), array(comps: _*).as("v"))
    }

    def timed[T](name: String)(f: => T): (T, Double) = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val r = f
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[opq-recall] $name%-40s $secs%8.2f s")
      (r, secs)
    }

    import org.apache.spark.sql.expressions.Window
    val perProbeCos = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    val perProbeAdc = Window.partitionBy(col("probe_id"))
      .orderBy(col("adc").asc, col("vec_id"))

    val results = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, Double, Double, Seq[(Int, Double)])]
    // (corpus, arm, qerr, trainEncodeWall, (shortlist, recall))

    for (corpusName <- Seq("mixture", "aniso")) {
      val aniso = corpusName == "aniso"
      timed(s"[$corpusName] corpus write") {
        mixture(nVecs, 0, aniso)
          .write.mode("overwrite").parquet(s"$vdir/$corpusName")
      }
      val corpus = spark.read.parquet(s"$vdir/$corpusName")
      val probes: Array[(Long, Array[Double])] =
        mixture(nProbes, nVecs, aniso)
          .as[(Long, Array[Double])].collect().sortBy(_._1)
      val probeDf = broadcast(
        spark.createDataFrame(probes.toSeq).toDF("probe_id", "p"))
      val (truth, bruteWall) = timed(s"[$corpusName] brute exact top-10") {
        corpus.crossJoin(probeDf)
          .select(col("probe_id"), col("vec_id"),
            expr("cosine_sim(v, p)").as("cos"))
          .filter(!isnan(col("cos")))
          .withColumn("rk", row_number().over(perProbeCos))
          .filter(col("rk") <= 10)
          .select("probe_id", "vec_id").as[(Long, Long)].collect()
          .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      }

      val identity = Array.tabulate(dim, dim)((i, j) => if (i == j) 1.0 else 0.0)
      val trainSample = corpus.filter(col("vec_id") < trainCap)
      val (opqR, opqTrainWall) = timed(s"[$corpusName] OPQ rotation train " +
        s"($trainCap sample)") {
        SimilarityOps.opqTrainRotation(trainSample, nSub, ksub, 2, 2)
      }
      val arms = Seq(
        ("flat", identity, 0.0),
        ("rr", SimilarityOps.rrMatrix, 0.0),
        ("opq", opqR, opqTrainWall))

      for ((armName, r, extraWall) <- arms) {
        val rot = SimilarityOps.rotateBy(corpus, r)
        val (cb, trainWall) = timed(s"[$corpusName/$armName] pq train") {
          SimilarityOps.pqTrain(rot, nSub, ksub, 2)
        }
        val (qerrTotal, encWall) = timed(s"[$corpusName/$armName] encode+qerr") {
          // encode + decoded error in one distributed pass
          val bcCb = spark.sparkContext.broadcast(cb)
          val out = rot.select(col("vec_id"), col("v"))
            .as[(Long, Array[Double])]
            .mapPartitions { it =>
              val books = bcCb.value
              val ds = books(0)(0).length
              it.map { case (_, y) =>
                var err = 0.0
                var m = 0
                while (m < books.length) {
                  val best = SimilarityOps.pqNearest(books(m), y, m * ds)
                  val ce = books(m)(best)
                  var j = 0
                  while (j < ds) {
                    val t = y(m * ds + j) - ce(j); err += t * t; j += 1
                  }
                  m += 1
                }
                err
              }
            }.reduce(_ + _)
          bcCb.destroy()
          out
        }
        // codes once per arm (the ADC scan input)
        SimilarityOps.pqEncode(rot, cb).select("vec_id", "code")
          .write.mode("overwrite").parquet(s"$vdir/codes_$corpusName$armName")
        val codes = spark.read.parquet(s"$vdir/codes_$corpusName$armName")
        val lutDf = broadcast(spark.createDataFrame(
          probes.toSeq.map { case (pid, pv) =>
            val pvRot = Array.tabulate(dim) { i =>
              var s = 0.0; var j = 0
              while (j < dim) { s += r(i)(j) * pv(j); j += 1 }
              s
            }
            (pid, SimilarityOps.pqLut(cb, pvRot))
          }).toDF("probe_id", "lut"))
        val (cand, scanWall) = timed(s"[$corpusName/$armName] adc scan") {
          codes.crossJoin(lutDf)
            .select(col("probe_id"), col("vec_id"),
              SimilarityOps.pqAdcColOf(col("lut"), col("code"), ksub, nSub)
                .as("adc"))
            .withColumn("rk", row_number().over(perProbeAdc))
            .filter(col("rk") <= maxShort)
            .select("probe_id", "vec_id", "rk")
            .as[(Long, Long, Int)].collect()
        }
        val recalls = shortlists.map { short =>
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
        recalls.foreach { case (s, rec) =>
          println(f"[opq-recall] ARM $corpusName/$armName%-5s short=$s%-5d " +
            f"recall@10=$rec%.4f qerr=$qerrTotal%.1f")
        }
        results += ((corpusName, armName, qerrTotal,
          extraWall + trainWall + encWall + scanWall, recalls))
      }
      println(f"[opq-recall] [$corpusName] brute=$bruteWall%.2f s")
    }

    // The load-bearing comparisons, asserted not just printed:
    def recallOf(c: String, a: String, s: Int): Double =
      results.find(r => r._1 == c && r._2 == a).get._5
        .find(_._1 == s).get._2
    def qerrOf(c: String, a: String): Double =
      results.find(r => r._1 == c && r._2 == a).get._3
    // OPQ must not lose to RR on its own objective, on either corpus.
    require(qerrOf("mixture", "opq") <= qerrOf("mixture", "rr") * 1.02 &&
      qerrOf("aniso", "opq") <= qerrOf("aniso", "rr") * 1.02,
      "OPQ quantization error above RR — the alternation regressed")
    // On the anisotropic corpus the rotation family must beat identity.
    require(recallOf("aniso", "opq", 256) > recallOf("aniso", "flat", 256),
      "OPQ did not beat un-rotated PQ on anisotropic data")
    // ---- Arming-rule adjudication (r18 verdict #2) -------------------
    // The deployment rule must split the regimes on MEASURED qerr: the
    // anisotropic corpus arms (drop >= 15%), the balanced mixture must
    // not — its ~6% qerr win came with a one-signed recall REGRESSION
    // vs RR at every shortlist (r18: 4-for-4, ~2σ each; re-measured
    // here at whatever nProbes this run carries).
    val armed = Seq("mixture", "aniso").map { c =>
      c -> SimilarityOps.opqArmed(qerrOf(c, "rr"), qerrOf(c, "opq"))
    }.toMap
    require(armed("aniso"),
      "anisotropic corpus did not arm OPQ — the threshold is too high")
    // The mixture recall gap, against a 3σ sampling bound (recall@10
    // over nProbes probes ≈ 10·nProbes Bernoulli draws, p(1−p) ≤ ¼):
    // either the gap is noise, or the arming rule must already keep
    // OPQ OFF for this regime — a real regression is acceptable only
    // disarmed.
    val noise = 3.0 * math.sqrt(0.25 / (10.0 * nProbes))
    val worstGap = shortlists.map(s =>
      recallOf("mixture", "rr", s) - recallOf("mixture", "opq", s)).max
    println(f"[opq-recall] mixture RR-vs-OPQ worst recall gap " +
      f"$worstGap%.4f (3σ noise bound $noise%.4f); armed=$armed")
    require(worstGap <= noise || !armed("mixture"),
      f"mixture recall regression $worstGap%.4f beyond noise $noise%.4f " +
        "AND the arming rule would still deploy OPQ — lower the threshold")

    val armsJson = results.map { case (c, a, q, w, recs) =>
      val rj = recs.map { case (s, rec) =>
        f""""$s":$rec%.4f""" }.mkString("{", ",", "}")
      f"""{"corpus":"$c","arm":"$a","qerr":$q%.1f,"wall_s":$w%.1f,"recall_at_10":$rj}"""
    }.mkString("[", ",", "]")
    println(
      s"""{"probe":"opq_recall","n_vecs":$nVecs,"n_probes":$nProbes,""" +
        s""""train_cap":$trainCap,"ksub":$ksub,""" +
        f""""armed":{"mixture":${armed("mixture")},"aniso":${armed("aniso")}},""" +
        f""""mixture_worst_gap":$worstGap%.4f,"gap_noise_bound":$noise%.4f,""" +
        s""""arms":$armsJson}""")
    def rmTree(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
    }
    rmTree(java.nio.file.Paths.get(vdir))
    spark.stop()
  }
}
