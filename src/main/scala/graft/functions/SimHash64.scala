package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass 64-bit SimHash sketch over 3-word shingles — the
  * in-row companion of [[MinHashSig]], for the same reason: the sketch is
  * a pure per-document function, and deriving it via shingle explode +
  * 64 grouped bit-sums puts a corpus-tokenization shuffle in front of a
  * computation the scan projection can do in one fused loop.
  *
  * Bit-identical to the grouped spelling (SimilaritySpec pins it):
  * shingle ids are xxhash64 over the UTF-8 bytes of the space-joined
  * 3-word window at Spark's default seed 42 — the SAME ids as the
  * MinHash family — each multiset occurrence contributes +1/-1 per bit
  * position by that bit of its id, and sketch bit j is set iff the sum
  * is strictly positive (ties at 0 clear the bit, matching
  * `when(s_j > 0, ...)`). Addition is commutative, so in-row document
  * order equals any grouped order. Sub-3-word docs yield NULL (the
  * grouped form has no row for them).
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val boxed = ctx.freshName("boxed")
      s"""
         |Long $boxed = graft.functions.SimHash64.compute($t);
         |${ev.isNull} = $boxed == null;
         |if (!${ev.isNull}) {
         |  ${ev.value} = $boxed.longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  private val Space = UTF8String.fromString(" ")
  private val DefaultSeed = 42L

  /** Called from both eval and generated code. Returns null for sub-3-word
    * input (no shingles → no sketch). Boxed so codegen has a null channel. */
  def compute(text: UTF8String): java.lang.Long = {
    val words = text.split(Space, -1)
    if (words.length < 3) return null
    val counts = new Array[Int](64)
    var i = 0
    val last = words.length - 3
    while (i <= last) {
      val sh = UTF8String.concat(words(i), Space, words(i + 1), Space, words(i + 2))
      val id = XXH64.hashUnsafeBytes(
        sh.getBaseObject, sh.getBaseOffset, sh.numBytes, DefaultSeed)
      var j = 0
      while (j < 64) {
        if (((id >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var sketch = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) sketch |= (1L << j)
      j += 1
    }
    java.lang.Long.valueOf(sketch)
  }
}
