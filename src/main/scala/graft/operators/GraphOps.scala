package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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

  /** As [[connectedComponents]], also returning the number of star rounds
    * it took to converge (exposed so tests can assert the O(log n) bound —
    * the round-6 defect was exactly an unbounded round count). */
  def connectedComponentsWithRounds(
      edgesIn: DataFrame, maxRounds: Int = 60): (DataFrame, Int) = {
    val Array(ua, va) = edgesIn.columns.take(2)
    val sess = edgesIn.sparkSession
    // Canonical working form: strictly big→small, no self-loops, distinct.
    // Materialized UNDER THE SESSION DEFAULT conf (AQE on): `edgesIn` is
    // typically an expensive candidate-generation plan (band joins, cell
    // assignment) whose join planning wants AQE — only the star rounds
    // below, which operate on the materialized LogicalRDD, run with it
    // off. Each round MUST truncate lineage, not just cache: the stars
    // union their input with itself, so the logical plan grows
    // several-fold per round and a persist-only loop stack-overflows
    // Catalyst within ~8 rounds. localCheckpoint materializes the round to
    // RDD blocks and replaces the plan with a LogicalRDD — the canonical
    // Spark shape for iterative graph algorithms.
    var edges = edgesIn
      .filter(col(ua) =!= col(va))
      .select(greatest(col(ua), col(va)).as("u"),
        least(col(ua), col(va)).as("v"))
      .distinct()
      .localCheckpoint(true)
    var rounds = 0
    val nEdges = edges.count() // one tiny job over the cached blocks
    var converged = nEdges == 0L
    // Loop execution conf, restored below (the caller's consumption of the
    // returned labels runs under the session defaults). Two coupled
    // choices, both from optimization-round measurement (guide §1, §2):
    //
    //  - AQE OFF for the rounds: a round is two windows + one aggregate
    //    over the previous round's materialized blocks — no joins, so
    //    AQE's real levers (skew-join splitting, join-strategy switching;
    //    it cannot split window or aggregation partitions) can never fire
    //    here. What it DID contribute was materializing each round's 3
    //    exchanges as separately scheduled jobs with a driver re-planning
    //    gap between them — q_neardup_groups spent 31 jobs / ~2.2 s on a
    //    graph whose total task time is ~0.3 s. With the static plan plus
    //    the LAZY per-round checkpoint (eager = false: the fixpoint
    //    aggregate is the action that materializes the round's blocks) a
    //    round is ONE job.
    //  - Loop shuffle partitions DERIVED FROM THE MEASURED EDGE COUNT
    //    (guide §2.2: scale-adaptive, never a constant), clamped to the
    //    session setting: ⌈|E| / 4M⌉ keeps round partitions in the
    //    ~100 MB class at any corpus size, while a fixture-scale graph
    //    runs its rounds 1-wide — the static-plan equivalent of what AQE
    //    coalescing chose, without its per-exchange job cascade. The
    //    session value stays the cap so a cluster's own sizing is never
    //    exceeded... and never silently under-parallelized either: |E|/4M
    //    rows per partition is the BOUND per round (star rounds never
    //    grow the deduped edge set), so a partition can only shrink as
    //    rounds contract.
    val aqeKey = "spark.sql.adaptive.enabled"
    val partKey = "spark.sql.shuffle.partitions"
    val aqeWas = sess.conf.get(aqeKey, "true")
    val partWas = sess.conf.get(partKey)
    val loopParts = math.max(1L,
      math.min(partWas.toLongOption.getOrElse(200L),
        nEdges / 4000000L + 1L)).toString
    try {
      sess.conf.set(aqeKey, "false")
      sess.conf.set(partKey, loopParts)
      while (!converged && rounds < maxRounds) {
        rounds += 1
        // Dedup + flag-merge share ONE shuffle: the round is fixpoint iff
        // no surviving (u, v) saw any relabelled source row.
        val next = smallStarRows(largeStarRows(edges))
          .groupBy("u", "v").agg(max("chg").as("chg"))
          .localCheckpoint(false)
        // One action per round: computes the round, persists its blocks
        // (the lazy checkpoint materializes under this job), and folds
        // the fixpoint probe over them.
        val moved = next.agg(max("chg")).head.getBoolean(0)
        converged = !moved
        // The previous round's checkpoint blocks are released by the
        // ContextCleaner once this Dataset reference drops (Dataset.rdd
        // would be a NEW derived RDD — unpersisting it is a silent no-op,
        // and the real block-holder RDD is private to the LogicalRDD
        // node).
        edges = next.select("u", "v")
      }
    } finally {
      sess.conf.set(aqeKey, aqeWas)
      sess.conf.set(partKey, partWas)
    }
    // No silent caps (round-6 principle): an unconverged edge set means
    // some component is still multi-level and its members would get
    // inconsistent labels, so this throws rather than returning. The
    // PROVEN bound for the alternating algorithm is O(log² n) rounds
    // (Kiveris et al. SoCC'14, Thm 4); the O(log n) behavior is their
    // empirical result (and GraphProbe's, ≤ ~12 rounds on adversarial
    // shapes at 10⁶ nodes), so 60 is generous headroom, not a theorem —
    // a graph legitimately needing more is cured by raising maxRounds.
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents: star contraction did not converge in " +
          s"$maxRounds rounds; labels would be inconsistent if returned. " +
          "Raise maxRounds (proven bound is O(log^2 n); the default " +
          "covers the empirical O(log n) behavior with slack)")
    // Fixpoint edges are stars (member → component min): members label
    // from their one edge, roots label themselves (a root never appears
    // as the big endpoint at fixpoint).
    val ccLabels = edges.select(col("u").as("id"), col("v").as("component"))
      .union(edges.select(col("v").as("id"), col("v").as("component")))
      .distinct()
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
}
