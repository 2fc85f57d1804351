package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, BindReferences, Expression, GreaterThan, GreaterThanOrEqual, JoinedRow, LessThan, LessThanOrEqual, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Broadcast range join — the custom planner-strategy tier of the
  * extension surface (SURVEY.md §4; the guide's preference order (c)).
  *
  * Spark plans an inner join whose only condition is
  * `point >= lo AND point < hi` as BroadcastNestedLoopJoin: every fact
  * row is tested against EVERY interval — O(rows × intervals). With 5
  * price bands that is fine; with 10^5 histogram buckets, tariff windows,
  * or IP ranges it is the join that never finishes. This strategy plans
  * the same logical shape as [[BroadcastRangeJoinExec]]: collect the
  * interval side (it must be broadcast-small — the strategy fires only
  * under the session's autoBroadcastJoinThreshold, mirroring Spark's own
  * broadcast decision), sort by `lo` once, and probe each fact row by
  * BINARY SEARCH + a prefix-max-hi early stop — O(rows × (log intervals
  * + matches)). Results are bit-identical to the nested-loop plan (the
  * DuckDB oracle for q_join_theta_range keeps proving it every round).
  */
object RangeJoinStrategy extends SparkStrategy {
  /** One bound of an interval condition: which side it bounds and whether
    * the comparison is inclusive. */
  private sealed trait Bound
  private case class Lower(p: Expression, lo: Expression, incl: Boolean)
    extends Bound
  private case class Upper(p: Expression, hi: Expression, incl: Boolean)
    extends Bound

  /** Split a conjunction of one lower and one upper bound on the same
    * left-side point against right-side limits — every operand order and
    * inclusivity Catalyst produces (`>= <`, `> <=`, BETWEEN's `>= <=`,
    * and the flipped `lo <= p` spellings). */
  private def matchRange(cond: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Expression, Boolean, Boolean)] = {
    def fromLeft(e: Expression) = e.references.subsetOf(left.outputSet) &&
      e.references.nonEmpty
    def fromRight(e: Expression) = e.references.subsetOf(right.outputSet) &&
      e.references.nonEmpty
    def bound(e: Expression): Option[Bound] = e match {
      case GreaterThanOrEqual(p, b) if fromLeft(p) && fromRight(b) =>
        Some(Lower(p, b, incl = true))
      case LessThanOrEqual(b, p) if fromLeft(p) && fromRight(b) =>
        Some(Lower(p, b, incl = true))
      case GreaterThan(p, b) if fromLeft(p) && fromRight(b) =>
        Some(Lower(p, b, incl = false))
      case LessThan(b, p) if fromLeft(p) && fromRight(b) =>
        Some(Lower(p, b, incl = false))
      case LessThanOrEqual(p, b) if fromLeft(p) && fromRight(b) =>
        Some(Upper(p, b, incl = true))
      case GreaterThanOrEqual(b, p) if fromLeft(p) && fromRight(b) =>
        Some(Upper(p, b, incl = true))
      case LessThan(p, b) if fromLeft(p) && fromRight(b) =>
        Some(Upper(p, b, incl = false))
      case GreaterThan(b, p) if fromLeft(p) && fromRight(b) =>
        Some(Upper(p, b, incl = false))
      case _ => None
    }
    cond match {
      case And(a, b) => (bound(a), bound(b)) match {
        case (Some(Lower(p1, lo, li)), Some(Upper(p2, hi, hi_)))
            if p1.semanticEquals(p2) => Some((p1, lo, hi, li, hi_))
        case (Some(Upper(p1, hi, hi_)), Some(Lower(p2, lo, li)))
            if p1.semanticEquals(p2) => Some((p1, lo, hi, li, hi_))
        case _ => None
      }
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    // batch-only: a micro-batch plan must keep Spark's streaming join
    // execs (state store, watermark semantics) — stand down on streaming.
    // Also stand down on (a) NON-DETERMINISTIC conditions — this exec
    // evaluates each interval bound ONCE at driver collect time where
    // the nested-loop plan re-evaluates per (row, interval) pair, so
    // claiming e.g. a rand()-perturbed bound would change semantics
    // (Spark's own equi-join extraction requires determinism too) — and
    // (b) joins whose explicit strategy hint asks for something OTHER
    // than broadcasting the interval side: a user who wrote
    // hint("merge") to keep that side off the driver must get their
    // plan, not this one. `broadcast(intervals)` — a BROADCAST hint on
    // the right — is exactly what this exec does, so it stays eligible
    // (the production q_join_theta_range spells it that way).
    case Join(left, right, Inner, Some(cond), hint)
        if !left.isStreaming && !right.isStreaming &&
          cond.deterministic &&
          hint.leftHint.forall(_.strategy.isEmpty) &&
          hint.rightHint.forall(_.strategy.forall(
            _ == org.apache.spark.sql.catalyst.plans.logical.BROADCAST)) &&
          right.stats.sizeInBytes <=
          org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold =>
      matchRange(cond, left, right) match {
        case Some((point, lo, hi, loIncl, hiIncl)) =>
          BroadcastRangeJoinExec(planLater(left), planLater(right),
            point, lo, hi, loIncl, hiIncl) :: Nil
        case None => Nil
      }
    case _ => Nil
  }
}

/** Inner join of `left` against broadcast intervals `[lo, hi)` from
  * `right`, probing by binary search over the lo-sorted interval array.
  * Overlapping intervals are handled with a prefix-max-hi array: the
  * backward scan from the insertion point stops as soon as no earlier
  * interval can still cover the probe — one step for disjoint bands,
  * never a full scan.
  */
case class BroadcastRangeJoinExec(left: SparkPlan, right: SparkPlan,
    point: Expression, lo: Expression, hi: Expression,
    loInclusive: Boolean, hiInclusive: Boolean)
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  // partition-preserving over the streamed side (the broadcast side adds
  // columns, never moves rows) — without this claim the default
  // UnknownPartitioning forces a needless re-shuffle when a downstream
  // operator re-keys on the left side's existing distribution, exactly
  // like Spark's own broadcast joins propagate streamedPlan partitioning
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastRangeJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val ordering = TypeUtils.getInterpretedOrdering(point.dataType)
    val loBound = BindReferences.bindReference(lo, right.output)
    val hiBound = BindReferences.bindReference(hi, right.output)
    // interval side: collected once on the driver (the strategy only
    // fires under the broadcast threshold), sorted by lo, prefix-max hi
    val rightRows = right.executeCollect().map(_.copy())
    val sorted = rightRows
      .map(r => (loBound.eval(r), hiBound.eval(r), r))
      .filter(t => t._1 != null && t._2 != null)
      .sortWith((a, b) => ordering.lt(a._1, b._1))
    val los = sorted.map(_._1)
    val his = sorted.map(_._2)
    val rows = sorted.map(_._3)
    val prefixMaxHi = new Array[Any](his.length)
    var i = 0
    while (i < his.length) {
      prefixMaxHi(i) =
        if (i == 0) his(0)
        else if (ordering.gt(his(i), prefixMaxHi(i - 1))) his(i)
        else prefixMaxHi(i - 1)
      i += 1
    }
    val bc = sparkContext.broadcast((los, his, rows, prefixMaxHi))
    val pointBound = BindReferences.bindReference(point, left.output)
    val outputAttrs = output
    // local copies: referencing the case-class fields inside the closure
    // would capture `this` — the whole operator including both child
    // plan trees — into every task's serialized closure
    val loIncl = loInclusive
    val hiIncl = hiInclusive
    left.execute().mapPartitions { iter =>
      val (blos, bhis, brows, bmax) = bc.value
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(outputAttrs, outputAttrs)
      iter.flatMap { lrow =>
        val p = pointBound.eval(lrow)
        if (p == null || blos.isEmpty) Iterator.empty
        else {
          // binary search: first index whose LOWER bound fails for p
          // (inclusive: first lo > p; strict: first lo >= p)
          var a = 0; var b = blos.length
          while (a < b) {
            val m = (a + b) >>> 1
            val loOk = if (loIncl) ordering.lteq(blos(m), p)
                       else ordering.lt(blos(m), p)
            if (loOk) a = m + 1 else b = m
          }
          def hiOk(h: Any): Boolean =
            if (hiIncl) ordering.gteq(h, p) else ordering.gt(h, p)
          // scan backwards while some earlier interval can still reach p
          val out = Iterator.unfold(a - 1) { j =>
            if (j < 0 || !hiOk(bmax(j))) None
            else Some((j, j - 1))
          }.filter(j => hiOk(bhis(j)))
          out.map(j => proj(joined(lrow, brows(j))))
        }
      }
    }
  }
}
