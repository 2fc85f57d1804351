package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{CollectionGenerator, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom UDTF (Generator): one row per word n-gram shingle of a text —
  * the table-function form of the reference's fan-out (flood.go:74-81,
  * one input row → many output rows) applied to text.
  *
  * SURVEY.md §2B "UDTF" demonstrator: `explode(...)` covers correctness,
  * but a native Generator shows the extension surface and avoids
  * materializing the full shingle array per row — rows are emitted
  * lazily from the iterator.
  */
case class ShingleGenerator(child: Expression, n: Int)
    extends UnaryExpression with CollectionGenerator with CodegenFallback {

  override def position: Boolean = false
  override def inline: Boolean = false
  override def collectionType: DataType = ArrayType(elementSchema, containsNull = false)
  override def elementSchema: StructType =
    new StructType().add("shingle", StringType, nullable = false)
  override def prettyName: String = "shingles"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) Iterator.empty
    else {
      val words = t.asInstanceOf[UTF8String].toString.split(" ")
      if (words.length < n) Iterator.empty
      else (0 to words.length - n).iterator.map { i =>
        InternalRow(UTF8String.fromString(words.slice(i, i + n).mkString(" ")))
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleGenerator =
    copy(child = newChild)
}
