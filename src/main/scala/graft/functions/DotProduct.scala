package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product of two double vectors with whole-stage codegen —
  * the hot inner loop of the ANN family (hyperplane sketch bits, IVF cell
  * scores, brute-force ranking). One fused loop per pair instead of the
  * `aggregate(zip_with(...))` HOF chain's per-element lambda dispatch and
  * intermediate product array.
  *
  * Accumulates strictly left-to-right, so results over arrays with no
  * NULL elements are BIT-IDENTICAL to the HOF formulation and to the
  * DuckDB oracle's `list_sum(list_transform(...))` — swapping this in
  * cannot change any hash-compared output (ExtensionsSpec asserts the
  * bit-equality; the fixtures contain no NULL elements). Mismatched
  * lengths yield NULL, like the null-poisoned zip_with sum, and so does a
  * NULL element in either array, matching the HOF's `acc + x*y` fold
  * (reading the null slot as 0.0 would silently diverge). NOTE this last
  * case deliberately follows the HOF, NOT DuckDB: `list_sum` SKIPS NULL
  * elements and returns the partial sum, so a query that feeds
  * NULL-element vectors to both engines would hash-diverge — the Spark
  * side null-poisons by design (a partial dot product is not a dot
  * product).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // return type inferred: AbstractDataType is private[sql] in Spark 4
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      dot += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true;
         |    } else {
         |      $dot += $a.getDouble($i) * $b.getDouble($i);
         |    }
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
