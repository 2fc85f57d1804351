package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass 3-word-shingle hash array of a text column: one long
  * per shingle position (the raw multiset — duplicates preserved), in a
  * single fused loop per row.
  *
  * Exists for the same reason as [[MinHashSig]]: the declarative spelling
  * — `transform(sequence(...), i => concat_ws(" ", element_at(w,i), ...))`
  * then `xxhash64` per element — evaluates INTERPRETED (higher-order
  * functions get no whole-stage codegen), and at corpus scale the shingle
  * explode is the first stage of every set-similarity operator
  * (jaccard / containment / incremental dedup), so the per-element lambda
  * dispatch sits on the hottest path there is. Measured on the 101k-doc
  * text probe: the HOF explode+hash pipeline ran ~7 s where this
  * expression runs the identical computation in well under one.
  *
  * The hash family is BIT-IDENTICAL to the HOF spelling (SimilaritySpec
  * asserts it): element i = xxhash64 over the UTF-8 bytes of
  * `w[i] ++ " " ++ w[i+1] ++ " " ++ w[i+2]` at Spark's default seed 42 —
  * exactly `xxhash64(concat_ws(" ", ...))` — and word splitting is
  * UTF8String.split on the literal-space pattern with limit -1, the same
  * call `split(text, " ")` lowers to. Sub-3-word docs yield an EMPTY
  * array (zero shingles), so `explode` drops them exactly like the old
  * empty-array branch did.
  */
case class ShingleHashes(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      s"${ev.value} = graft.functions.ShingleHashes.compute($t);"
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  private val Space = UTF8String.fromString(" ")
  private val DefaultSeed = 42L
  private val Empty = UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)

  /** Called from both eval and generated code. */
  def compute(text: UTF8String): ArrayData = {
    val words = text.split(Space, -1)
    if (words.length < 3) return Empty
    val out = new Array[Long](words.length - 2)
    var i = 0
    val last = words.length - 3
    while (i <= last) {
      val sh = UTF8String.concat(words(i), Space, words(i + 1), Space, words(i + 2))
      out(i) = XXH64.hashUnsafeBytes(
        sh.getBaseObject, sh.getBaseOffset, sh.numBytes, DefaultSeed)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
