package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components via alternating large-star/small-star
  * contraction (Kiveris et al., "Connected Components in MapReduce and
  * Beyond", SoCC'14). This replaces the round-6 min-label propagation,
  * whose iteration count was O(component diameter) and hard-aborted at 20:
  * a crawl-scale dedup corpus has chain-shaped duplicate components far
  * deeper than that. Star contraction converges in O(log n) rounds
  * REGARDLESS of component shape — a diameter-10⁶ chain collapses as fast
  * as a clique — and each round is the same distributed building blocks
  * (groupBy-min + equality join + distinct) the rest of the engine uses,
  * so nothing here assumes local mode.
  *
  * Both stars keep every edge strictly (u > v)-oriented and deduplicated,
  * so the working edge set never exceeds O(|E|) and shrinks monotonically
  * toward the fixpoint: one star per component, every member pointing at
  * the component's minimum id.
  */
object GraphOps {

  private val mem = StorageLevel.MEMORY_AND_DISK

  /** Large-star: every node u connects its LARGER neighbors to
    * m(u) = min(Γ(u) ∪ {u}). Operates on the symmetric closure so each
    * endpoint sees its full neighborhood; emitted edges are (v, m) with
    * v > u ≥ m, i.e. strictly big→small. */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
    val mins = sym.groupBy("u").agg(min("v").as("mn"))
      .select(col("u"), least(col("u"), col("mn")).as("m"))
    sym.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .distinct()
  }

  /** Small-star: every node u connects its SMALLER neighbors (and itself)
    * to the minimum of that set. Input is big→small oriented, so grouping
    * by the big endpoint sees exactly the smaller neighborhood. */
  private def smallStar(e: DataFrame): DataFrame = {
    val mins = e.groupBy("u").agg(min("v").as("m"))
    e.join(mins, "u")
      .filter(col("v") =!= col("m"))
      .select(col("v").as("u"), col("m").as("v"))
      .union(mins.select(col("u"), col("m").as("v")))
      .distinct()
  }

  /** (id, component) for every node that appears in `edgesIn` (isolated
    * nodes, having no edges, are the caller's concern); component = the
    * component's minimum id. The first two columns of `edgesIn` are the
    * endpoints — any orderable type. */
  def connectedComponents(edgesIn: DataFrame): DataFrame =
    connectedComponentsWithRounds(edgesIn)._1

  /** As [[connectedComponents]], also returning the number of star rounds
    * it took to converge (exposed so tests can assert the O(log n) bound —
    * the round-6 defect was exactly an unbounded round count). */
  def connectedComponentsWithRounds(
      edgesIn: DataFrame, maxRounds: Int = 60): (DataFrame, Int) = {
    val Array(ua, va) = edgesIn.columns.take(2)
    // Canonical working form: strictly big→small, no self-loops, distinct.
    // Each round MUST truncate lineage, not just cache: both stars
    // reference their input several times (union + join), so the logical
    // plan grows ~6× per round and a persist-only loop stack-overflows
    // Catalyst within ~8 rounds. localCheckpoint(eager) materializes the
    // round to RDD blocks and replaces the plan with a LogicalRDD — the
    // canonical Spark shape for iterative graph algorithms.
    var edges = edgesIn
      .filter(col(ua) =!= col(va))
      .select(greatest(col(ua), col(va)).as("u"),
        least(col(ua), col(va)).as("v"))
      .distinct()
      .localCheckpoint(true)
    var n = edges.count()
    var rounds = 0
    var converged = n == 0L
    while (!converged && rounds < maxRounds) {
      rounds += 1
      // (smallStar consumes its input twice — groupBy-min and join sides —
      // but materializing the large-star between them measured as a wash:
      // ReusedExchange already shares the shuffled subtree, and the extra
      // checkpoint job cancels the saving. One checkpoint per round.)
      val next = smallStar(largeStar(edges)).localCheckpoint(true)
      val nNext = next.count()
      // Exact set-equality fixpoint test (both sides are distinct sets, so
      // equal counts + empty one-sided difference ⇒ equal sets). A
      // checksum would be one job cheaper but a collision would stop the
      // contraction EARLY with silently wrong labels — same no-silent-cap
      // principle as the abort below.
      converged = nNext == n && next.except(edges).isEmpty
      // The previous round's checkpoint blocks are released by the
      // ContextCleaner once this Dataset reference drops (Dataset.rdd
      // would be a NEW derived RDD — unpersisting it is a silent no-op,
      // and the real block-holder RDD is private to the LogicalRDD node).
      edges = next
      n = nNext
    }
    // No silent caps (round-6 principle): an unconverged edge set means
    // some component is still multi-level and its members would get
    // inconsistent labels. With O(log n) convergence, 60 rounds covers any
    // physically storable graph, so reaching this is a logic error, not a
    // data-size limitation.
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents: star contraction did not converge in " +
          s"$maxRounds rounds ($n edges still moving) — this indicates a " +
          "bug, not an oversized graph; O(log n) rounds suffice for any n")
    // Fixpoint edges are stars (member → component min): members label
    // from their one edge, roots label themselves (a root never appears
    // as the big endpoint at fixpoint).
    val labels = edges.select(col("u").as("id"), col("v").as("component"))
      .union(edges.select(col("v").as("id"), col("v").as("component")))
      .distinct()
    (labels, rounds)
  }
}
