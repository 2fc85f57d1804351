package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `freq_candidates(item, capacity)` — Misra–Gries frequent-items sketch
  * as a TypedImperativeAggregate: O(capacity) state regardless of input
  * size, partial-aggregated map-side and mergeable, returning
  * `array<struct<item, cnt>>` (cnt = the sketch's LOWER-BOUND estimate,
  * ordered cnt DESC, item ASC).
  *
  * The guarantee that matters at 100 TB (Misra & Gries 1982; merge rule
  * from Agarwal et al., "Mergeable Summaries", PODS 2012): after any
  * sequence of updates and merges over N items, every item with true
  * frequency > N/(capacity+1) is IN the sketch, and each kept count
  * under-estimates truth by at most N/(capacity+1). So the sketch is a
  * candidate PRUNER: a full heavy-hitters query shuffles the whole
  * vocabulary (O(distinct items)); the sketch shuffles ≤ capacity
  * entries per partition, and an exact counting pass over just the
  * candidates (broadcast semi-join, map-side filtered) makes the final
  * answer exact — the classic 2-pass exact heavy hitters.
  *
  * Exactly which NON-heavy extras survive depends on partition/merge
  * order, so queries must treat the membership list as a superset and
  * re-verify counts (q_heavy_hitters does; its output is deterministic
  * and oracle-checked). The decrement step is O(capacity) amortized
  * O(1) per input.
  *
  * Contract: `item` must be STRING, `capacity` a positive integer
  * literal (evaluated at planning time to size the map).
  */
case class FreqCandidates(
    item: Expression,
    capExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
  with BinaryLike[Expression] {

  private lazy val cap: Int = capExpr.eval() match {
    case i: Int  => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(
      s"freq_candidates: capacity must be an integer literal, got $other")
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (item.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"freq_candidates(item, capacity): item must be STRING, got " +
          item.dataType.simpleString)
    else if (!capExpr.foldable)
      TypeCheckResult.TypeCheckFailure("freq_candidates: capacity must be a literal")
    else capExpr.eval() match {
      case i: Int if i > 0  => TypeCheckResult.TypeCheckSuccess
      case l: Long if l > 0 => TypeCheckResult.TypeCheckSuccess
      case v => TypeCheckResult.TypeCheckFailure(
        s"freq_candidates: capacity must be a positive integer literal, got $v")
    }
  }

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = item.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      buf.get(s) match {
        case Some(c) => buf(s) = c + 1
        case None if buf.size < cap =>
          // clone: the input UTF8String may point into a reused buffer
          buf(s.clone()) = 1L
        case None =>
          // decrement-all (the Misra–Gries step): every tracked count
          // pays one, zeros evicted — amortized O(1) per input
          val dead = mutable.ArrayBuffer.empty[UTF8String]
          buf.mapValuesInPlace { (_, c) => c - 1 }
          buf.foreach { case (k, c) => if (c <= 0) dead += k }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (k, v) =>
      buf(k) = buf.getOrElse(k, 0L) + v
    }
    if (buf.size > cap) {
      // Mergeable-summaries rule: subtract the (cap+1)-th largest count
      // from everything; what stays positive (≤ cap entries) keeps the
      // error bound additive across merges.
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - (cap + 1))
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      buf.mapValuesInPlace { (_, c) => c - cut }
      buf.foreach { case (k, c) => if (c <= 0) dead += k }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val sorted = buf.toArray.sortWith { (a, b) =>
      a._2 > b._2 || (a._2 == b._2 && a._1.compareTo(b._1) < 0)
    }
    new GenericArrayData(sorted.map { case (s, c) => InternalRow(s, c) })
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, c) =>
      val b = s.getBytes
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf(UTF8String.fromBytes(b)) = in.readLong()
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def left: Expression = item
  override def right: Expression = capExpr

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqCandidates =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqCandidates =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FreqCandidates =
    copy(item = newLeft, capExpr = newRight)
}
