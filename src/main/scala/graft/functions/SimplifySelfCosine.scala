package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** `cosine_sim(x, x)` reduced to a single traversal: with both sides equal,
  * dot = Σx² = s, so the result is s/(√s·√s) — evaluated EXACTLY in that
  * form, not simplified to s/s, because √s·√s differs from s by 1 ulp for
  * roughly half of all norms (2/(√2·√2) = 0.9999999999999998 in IEEE
  * double). An optimizer rule must never change observable results, so the
  * rewrite keeps the full formula's bit pattern, including the degenerate
  * cases (zero vector → 0/0 = NaN, NaN/∞ element → NaN). NOT folded to a
  * literal: nullability can't see value-dependent degeneracy, so a
  * constant 1.0 would silently change results for zero or NaN-bearing
  * vectors — and for every norm on the wrong side of that ulp.
  */
case class SelfCosine(child: Expression)
    extends UnaryExpression with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  // return type inferred: AbstractDataType is private[sql] in Spark 4
  override def inputTypes = Seq(ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "self_cosine"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var s = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) { val v = x.getDouble(i); s += v * v; i += 1 }
    s / (math.sqrt(s) * math.sqrt(s))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      s"""
         |double $s = 0.0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  double $v = $a.getDouble($i);
         |  $s += $v * $v;
         |}
         |${ev.value} = $s / (java.lang.Math.sqrt($s) * java.lang.Math.sqrt($s));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SelfCosine =
    copy(child = newChild)
}

/** Optimizer extension-point demonstrator (SURVEY.md §4): rewrites the
  * self-similarity `cosine_sim(x, x)` to [[SelfCosine]] — one array
  * traversal instead of three, bit-identical results INCLUDING the
  * degenerate cases (zero vectors and NaN elements stay NaN; an earlier
  * version folded straight to 1.0 and silently changed those results).
  * Registered via GraftExtensions.injectOptimizerRule.
  */
object SimplifySelfCosine extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CosineSimilarity(a, b) if a.semanticEquals(b) && a.deterministic =>
        SelfCosine(a)
    }
}
