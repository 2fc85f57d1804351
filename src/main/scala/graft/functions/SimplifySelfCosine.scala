package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer extension-point demonstrator (SURVEY.md §4 custom item —
  * "register one trivial no-op-safe Rule to prove the extension point"),
  * with a real algebraic rewrite: the cosine of a vector with ITSELF is
  * 1.0 by definition, so `cosine_sim(x, x)` folds to a literal and the
  * whole array traversal disappears from the plan.
  *
  * Guarded to non-nullable deterministic children: a null or NaN-bearing
  * vector could legally produce null/NaN, which the fold would mask.
  * Registered via GraftExtensions.injectOptimizerRule.
  */
object SimplifySelfCosine extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CosineSimilarity(a, b)
          if a.semanticEquals(b) && a.deterministic && !a.nullable =>
        Literal(1.0, DoubleType)
    }
}
