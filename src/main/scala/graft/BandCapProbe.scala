package graft

import org.apache.spark.sql.functions._

/** Band-cap recall probe: `runMain graft.BandCapProbe [nHot]` (default
  * 50,000).
  *
  * q_cluster_dedup's hot-cell band cap (SimilarityOps.clusterDedupQ's
  * `maxCellReps`) is a recall trade that only arms past 65,536 DISTINCT
  * vectors in one k-means cell — far above every fixture and every
  * planted probe cell, so through round 13 its recall cost was a proof
  * sketch (per-bit sketch agreement 1 − θ/π), never a measured number.
  * This main builds the adversarial corpus the cap exists for — one cell
  * holding nHot DISTINCT vectors, with near-dup structure planted at two
  * cosine levels — lowers the cap so the banding actually arms, and
  * reports MEASURED recall against an exact within-cell reference.
  *
  * Corpus (deterministic, float32 like the fixture):
  *  - ids 0..6: far-apart anchor vectors (scale 100) that pin seven of
  *    the k=8 Lloyd's cells away from the hot region, so every hot
  *    vector lands in ONE cell (id 7's);
  *  - 600 groups × 3 members at cos ≈ 0.997 (τ=0.99 targets) and 600
  *    pairs at cos ≈ 0.93 (τ=0.9 targets), their centers spread at
  *    cos ≈ 0.61 from each other (and ≈ 0.78 from the cell base — wide
  *    enough that nothing links through the base), planted among a sea
  *    of distinct vectors at the same spread — in-cell but safely below
  *    both thresholds.
  *
  * Exact reference: all nHot²/2 in-cell cosines on the driver (parallel
  * over 32 threads — the very quadratic the cap avoids ON AN EXECUTOR is
  * fine once, here, as ground truth), same left-to-right folds and the
  * same round(·×10⁶)/10⁶ ≥ τ gate as the engine, then union-find →
  * dropped = everyone whose component has a smaller id. The capped
  * engine path can only LOSE pairs (bands partition the cell), so
  * dropped_capped ⊆ dropped_exact and recall = |capped|/|exact|;
  * false_drops (capped-dropped outside exact-dropped) must be 0.
  */
object BandCapProbe {
  def main(args: Array[String]): Unit = {
    // `runMain graft.BandCapProbe borderline [nHot]` runs the driver-side
    // boundary diagnosis instead of the engine arms — see the block below
    val borderline = args.headOption.contains("borderline")
    val rest = if (borderline) args.drop(1) else args
    val nHot = rest.headOption.map(_.toInt).getOrElse(50000)
    val dim = 64
    val spark = Sessions.local(appName = "graft-bandcap-probe")

    // ---- deterministic corpus on the driver (float32, fixture-shaped)
    val rng = new scala.util.Random(41)
    def gauss(): Array[Float] = Array.fill(dim)(rng.nextGaussian().toFloat)
    def axpy(base: Array[Float], sigma: Double): Array[Float] = {
      val n = gauss()
      Array.tabulate(dim)(i => (base(i) + sigma * n(i)).toFloat)
    }
    val anchors = (0 until 7).map { a =>
      val v = gauss(); v.map(x => x * 100f + (if (a % 2 == 0) 300f else -300f))
    }
    val hotBase = gauss()
    val vecs = Array.newBuilder[Array[Float]]
    anchors.foreach(vecs += _)
    vecs += hotBase // id 7: the hot cell's initial centroid
    val nGroups3 = 600
    val nPairs93 = 600
    // center spread 0.8: cos(B, c) ≈ 1/√1.64 ≈ 0.78 and cross-center
    // cos ≈ 1/1.64 ≈ 0.61 — nothing outside a planted group can reach
    // τ=0.9, so the exact components are the planted ones, not a giant
    // star through the base
    // groups of 3 at cos ≈ 0.997: member = center + 0.07·noise
    for (_ <- 0 until nGroups3) {
      val c = axpy(hotBase, 0.8)
      for (_ <- 0 until 3) vecs += axpy(c, 0.07)
    }
    // pairs at cos ≈ 0.93: member = center + 0.35·noise
    for (_ <- 0 until nPairs93) {
      val c = axpy(hotBase, 0.8)
      for (_ <- 0 until 2) vecs += axpy(c, 0.35)
    }
    // singleton sea at the same spread (pairwise cos ≈ 0.61)
    val nSea = nHot - (8 + nGroups3 * 3 + nPairs93 * 2)
    require(nSea > 0, s"nHot=$nHot too small for the planted structure")
    for (_ <- 0 until nSea) vecs += axpy(hotBase, 0.8)
    val all = vecs.result()
    val n = all.length
    println(s"[bandcap-probe] corpus: $n vectors " +
      s"(${nGroups3}x3 groups @~.997, ${nPairs93}x2 pairs @~.93, $nSea sea)")

    val dir = s"/tmp/graft_bandcap_$nHot"
    spark.createDataFrame(
        all.toSeq.zipWithIndex.map { case (v, i) => (i.toLong, v, 0) })
      .toDF("vec_id", "embedding", "label")
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    // ---- exact within-cell reference on the driver, per τ ----
    // float32 values widened to double — the identical operands the
    // engine's transform(cast("double")) sees
    val vd = all.map(_.map(_.toDouble))
    // cosine_sim's exact fused fold: dot, |a|², |b|² accumulated in ONE
    // left-to-right loop, then dot / (√na · √nb) — same doubles as the
    // engine (the per-term adds are the same additions in the same order
    // whether one loop carries three accumulators or three loops carry
    // one each)
    val norms = vd.map { v =>
      var s = 0.0; var i = 0
      while (i < dim) { s += v(i) * v(i); i += 1 }
      math.sqrt(s)
    }
    def cosOf(a: Int, b: Int): Double = {
      var d = 0.0; var i = 0
      val va = vd(a); val vb = vd(b)
      while (i < dim) { d += va(i) * vb(i); i += 1 }
      d / (norms(a) * norms(b))
    }
    /** the engine's gate: round(cos·10⁶, HALF_UP)/10⁶ ≥ τ. The BigDecimal
      * replication of Spark's Round only runs in the ±1-ulp borderline
      * window — 1.25e9 BigDecimal constructions would dominate the probe. */
    def passes(c: Double, tau: Double): Boolean = {
      val z = c * 1000000
      val t = tau * 1000000
      if (z >= t + 1) true
      else if (z < t - 1) false
      else java.math.BigDecimal.valueOf(z)
        .setScale(0, java.math.RoundingMode.HALF_UP)
        .doubleValue() / 1000000 >= tau
    }
    // ---- borderline diagnosis (round-16): the r16 run's τ=0.9 cap=off
    // arm reported ONE more dropped vector than the exact reference
    // (recall 1.0000, false_drops=1 over 1.25e9 in-cell pairs) — the
    // statistical signature of a ±1-ulp cosine difference between the
    // engine's codegen fold and this replication flipping the HALF_UP
    // boundary of round(cos·10⁶): fold-order noise is ~1e-15 relative,
    // the flip window is ~1e-9 of cos-space, so the expected count over
    // 1.25e9 pairs is O(1). This mode makes that concrete: it prints
    // every pair whose EXACT cos·10⁶ sits within `win` of the .5
    // rounding line for either τ, then recomputes each under a reversed
    // fold — a pair whose gate verdict flips across mathematically-equal
    // fold orders is the borderline in the flesh, and its count bounds
    // how many flips ANY fold-order change can cause.
    if (borderline) {
      // The r16 boundary scan found NO pair within 1e-3 of the round
      // line — so the one extra drop was NOT an ulp flip. The remaining
      // engine/reference population difference: the reference's pair
      // loops start at id 8, but id 7 (the cell BASE) is in the hot
      // cell, so the engine checks (7, x) pairs the reference never
      // sees. The scaladoc's "nothing links through the base" was an
      // expectation about cos(B, member) ≈ 0.78 — with 49,992 draws a
      // tail above τ=0.9 is plausible. Scan it:
      val baseLinks = (8 until n).map(x => (cosOf(7, x), x)).sortBy(-_._1)
      val over90 = baseLinks.takeWhile(p => passes(p._1, 0.9))
      val over99 = baseLinks.takeWhile(p => passes(p._1, 0.99))
      println(f"[bandcap-borderline] base links: max cos(7,x)=${baseLinks.head._1}%.6f " +
        s"(x=${baseLinks.head._2}); ${over90.size} pass tau=0.9 " +
        s"[${over90.map(_._2).mkString(", ")}]; ${over99.size} pass tau=0.99")
      // ONE all-pairs scan serves both τ boundaries (the scan is the
      // ~1.25e9-dot-product cost; testing a second |·−b| per pair is
      // free) — and it starts at id 7: the base IS in the hot cell, so
      // a borderline (7, x) pair is exactly as diagnosable as any other
      // (the earlier 8-start scan reintroduced the blind spot the id-7
      // reference fix closed).
      val taus = Seq(0.99, 0.9)
      val boundaries = taus.map(t => t * 1000000 - 0.5) // HALF_UP flip lines
      val win = 1e-3
      val hitsPerTau = taus.map(_ =>
        new java.util.concurrent.ConcurrentLinkedQueue[(Int, Int)]())
      java.util.stream.IntStream.range(7, n).parallel().forEach { a =>
        var b = a + 1
        while (b < n) {
          val z = cosOf(a, b) * 1000000
          var t = 0
          while (t < boundaries.length) {
            if (math.abs(z - boundaries(t)) < win) hitsPerTau(t).add((a, b))
            t += 1
          }
          b += 1
        }
      }
      import scala.jdk.CollectionConverters._
      taus.zip(hitsPerTau).foreach { case (tau, hits) =>
        println(s"[bandcap-borderline] tau=$tau: ${hits.size} pair(s) " +
          s"within $win of the round boundary (of ${(n.toLong - 7) * (n - 8) / 2})")
        def gate(x: Double): Boolean = java.math.BigDecimal.valueOf(x * 1000000)
          .setScale(0, java.math.RoundingMode.HALF_UP)
          .doubleValue() / 1000000 >= tau
        hits.asScala.foreach { case (a, b) =>
          val c = cosOf(a, b)
          val va = vd(a); val vb = vd(b)
          var dr = 0.0; var i = dim - 1
          while (i >= 0) { dr += va(i) * vb(i); i -= 1 }
          val cRev = dr / (norms(a) * norms(b))
          println(f"[bandcap-borderline]   pair ($a,$b): " +
            f"cos*1e6=${c * 1000000}%.9f gate=${gate(c)} | " +
            f"rev cos*1e6=${cRev * 1000000}%.9f gate=${gate(cRev)} | " +
            s"flips=${gate(c) != gate(cRev)}")
        }
      }
      spark.stop()
      return
    }

    def exactDropped(tau: Double): Set[Long] = {
      // per-thread edge buffers, then one sequential union-find.
      // Pair loops start at id 7: the reference must cover exactly the
      // within-cell population the capped engine path compares — the hot
      // cell's ids, WHICH INCLUDE the base (id 7 is the cell's initial
      // centroid and lives in it). The 7 anchors (0..6) sit alone in
      // their own cells (each is its own centroid), so the engine can
      // never drop them, but same-sign anchor pairs DO reach cos ≈ 0.9:
      // including them here put anchor-anchor edges in the exact
      // reference and biased measured recall below 1.0 independent of
      // the cap (round-14 ADVICE). Round-16: the r15 fix over-excluded —
      // it started at 8, dropping the base's own pairs, and the class
      // doc's "nothing links through the base" (cos(B, member) ≈ 0.78)
      // is a distributional expectation, not an invariant: the first
      // 50k run found EXACTLY one sea member at cos(B, x) = 0.9067
      // (borderline mode, x=49294), which the engine correctly linked
      // to the base and dropped — scored as a phantom false_drop by the
      // 8-start reference.
      val nThreads = Runtime.getRuntime.availableProcessors()
      val buffers = Array.fill(nThreads)(Vector.newBuilder[(Int, Int)])
      val t0 = System.nanoTime()
      java.util.stream.IntStream.range(7, n).parallel().forEach { a =>
        val buf = buffers((a % nThreads + nThreads) % nThreads)
        var b = a + 1
        val local = Vector.newBuilder[(Int, Int)]
        while (b < n) {
          if (passes(cosOf(a, b), tau)) local += ((a, b))
          b += 1
        }
        buf.synchronized { buf ++= local.result() }
      }
      val edges = buffers.flatMap(_.result())
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      edges.foreach { case (a, b) =>
        val ra = find(a); val rb = find(b)
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val minOf = scala.collection.mutable.Map[Int, Int]()
      (0 until n).foreach { i =>
        val r = find(i)
        if (minOf.getOrElse(r, Int.MaxValue) > i) minOf(r) = i
      }
      val dropped = (0 until n).filter(i => minOf(find(i)) != i).map(_.toLong).toSet
      println(f"[bandcap-probe] exact tau=$tau%.2f: ${edges.length} edges, " +
        f"${dropped.size} dropped, ${(System.nanoTime() - t0) / 1e9}%.1f s " +
        s"(all ${(n.toLong - 7) * (n - 8) / 2} in-cell pairs)")
      dropped
    }

    def cappedDropped(tau: Double, cap: Int): (Set[Long], Double) = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val kept = graft.operators.SimilarityOps
        .clusterDedupQ(8, 2, tau, maxCellReps = cap)(spark, dir)
        .collect().map(_.getLong(0)).toSet
      val secs = (System.nanoTime() - t0) / 1e9
      ((0L until n.toLong).toSet -- kept, secs)
    }

    // sanity: the hot region really is one cell
    val cells = graft.operators.SimilarityOps.kmeansAssignQ(8, 2)(spark, dir)
      .select("vec_id", "cluster").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val hotCells = cells.filter(_._1 >= 8).map(_._2).toSet
    // hard requirement, not a printed hint: if Lloyd's ever splits the
    // hot region across cells, the exact all-pairs reference no longer
    // matches the engine's within-cell population and every recall
    // number below is meaningless (round-14 ADVICE)
    require(hotCells.size == 1,
      s"hot vectors split across cells $hotCells — probe invalidated")

    // Int.MaxValue first: the UNCAPPED engine baseline (banding never
    // arms) — the recall-1.0 floor the capped rows are read against.
    // Optional 2nd arg picks one τ (e.g. `50000 0.9`) so a reference
    // fix affecting a single τ doesn't re-pay the other's ~30-minute
    // uncapped arm.
    val taus = rest.lift(1).map(t => Seq(t.toDouble)).getOrElse(Seq(0.99, 0.9))
    for (tau <- taus) {
      val exact = exactDropped(tau)
      for (cap <- Seq(Int.MaxValue, 16384, 4096, 1024)) {
        val (capped, secs) = cappedDropped(tau, cap)
        val falseDrops = capped -- exact
        val recall =
          if (exact.isEmpty) 1.0 else (capped & exact).size.toDouble / exact.size
        val capLabel = if (cap == Int.MaxValue) "off" else cap.toString
        println(f"[bandcap-probe] tau=$tau%.2f cap=$capLabel%-5s: " +
          f"dropped=${capped.size}%6d/${exact.size}%6d recall=$recall%.4f " +
          f"false_drops=${falseDrops.size} wall=$secs%6.1f s")
        // name the ids so a nonzero count is immediately diagnosable
        // with the `borderline` mode (1-ulp gate flips land here)
        if (falseDrops.nonEmpty)
          println(s"[bandcap-probe]   false-dropped ids: " +
            falseDrops.toSeq.sorted.take(20).mkString(", "))
      }
    }
    spark.stop()
  }
}
