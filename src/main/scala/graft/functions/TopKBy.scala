package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `top_k_by(payload, ord, k)` — bounded top-k-per-group aggregate: keeps
  * the k rows with the LARGEST `ord` (ties broken toward the smaller
  * `payload`), returned as `array<struct<ord, payload>>` in rank order.
  *
  * Why a custom TypedImperativeAggregate: Spark's two stock answers to
  * "top k per group" both carry unbounded cost on hot groups —
  * `collect_list` + sort ships EVERY group member through the shuffle
  * (OOM on a million-row key), and the window row_number form sorts each
  * partition even though only k rows survive (WindowGroupLimit prunes map-
  * side, but still sorts per partition). This aggregate's state is a
  * k-bounded min-heap: O(k) memory per group REGARDLESS of group size,
  * partial-aggregated map-side and merged heap-into-heap, so the shuffle
  * carries at most k pairs per (partition, group). At 100 TB with a
  * power-law key (one user with 10^8 events), the heap aggregate is the
  * only shape whose state does not scale with the hot key.
  *
  * Determinism: (ord DESC, payload ASC) is a total order over distinct
  * (ord, payload) pairs, so the kept set and its order are independent of
  * partitioning — required by the oracle hash-compare.
  *
  * Contract: `payload` and `ord` must be BIGINT (encode doubles as
  * scaled integers first — exactly what the oracle-compare discipline
  * already requires of ordering keys) and `k` must be a literal (it is
  * evaluated at planning time to size the heap). Generalizing to
  * arbitrary orderable types means swapping the two Longs for an
  * InternalRow + TypeUtils ordering; the bounded-state shape is the
  * point here.
  */
case class TopKBy(
    payload: Expression,
    ord: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, Long)]]
  with TernaryLike[Expression] {

  private lazy val k: Int = kExpr.eval() match {
    case i: Int  => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(
      s"top_k_by: k must be an integer literal, got $other")
  }

  /** Misuse fails at ANALYSIS, not as a runtime ClassCastException in an
    * executor: both data columns must be BIGINT and k a foldable
    * positive integer. */
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (payload.dataType != LongType || ord.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"top_k_by(payload, ord, k): payload and ord must be BIGINT, got " +
          s"${payload.dataType.simpleString} / ${ord.dataType.simpleString}")
    else if (!kExpr.foldable)
      TypeCheckResult.TypeCheckFailure("top_k_by: k must be a literal")
    else kExpr.eval() match {
      case i: Int if i > 0  => TypeCheckResult.TypeCheckSuccess
      case l: Long if l > 0 => TypeCheckResult.TypeCheckSuccess
      case v => TypeCheckResult.TypeCheckFailure(
        s"top_k_by: k must be a positive integer literal, got $v")
    }
  }

  // One ordering, two uses: compare(a, b) > 0 iff a is WORSE than b under
  // (ord DESC, payload ASC). PriorityQueue's max-heap head is then the
  // worst kept pair (the eviction candidate), and sorted-ascending emits
  // best-first (rank order). Explicit Long.compare, NOT negation —
  // Long.MinValue negates to itself, so an Ordering.by(-_._1) would treat
  // the smallest possible ord as the largest and corrupt both the kept
  // set and the emitted order.
  private val worstFirst: Ordering[(Long, Long)] = new Ordering[(Long, Long)] {
    override def compare(a: (Long, Long), b: (Long, Long)): Int = {
      val c = java.lang.Long.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }
  private val evictionOrder: Ordering[(Long, Long)] = worstFirst

  /** a strictly better than b under (ord DESC, payload ASC). */
  private def better(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def createAggregationBuffer(): mutable.PriorityQueue[(Long, Long)] =
    mutable.PriorityQueue.empty(evictionOrder)

  private def offer(buf: mutable.PriorityQueue[(Long, Long)],
      cand: (Long, Long)): Unit = {
    if (buf.size < k) buf.enqueue(cand)
    else if (better(cand, buf.head)) { buf.dequeue(); buf.enqueue(cand) }
  }

  override def update(buf: mutable.PriorityQueue[(Long, Long)],
      input: InternalRow): mutable.PriorityQueue[(Long, Long)] = {
    val o = ord.eval(input)
    val p = payload.eval(input)
    if (o != null && p != null)
      offer(buf, (o.asInstanceOf[Long], p.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Long, Long)],
      other: mutable.PriorityQueue[(Long, Long)]): mutable.PriorityQueue[(Long, Long)] = {
    other.foreach(offer(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Long, Long)]): Any = {
    val sorted = buf.toArray.sorted(worstFirst) // ascending = best-first
    new GenericArrayData(sorted.map(t => InternalRow(t._1, t._2)))
  }

  override def serialize(buf: mutable.PriorityQueue[(Long, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (o, p) => out.writeLong(o); out.writeLong(p) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Long, Long)] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.enqueue((in.readLong(), in.readLong())); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("ord", LongType, nullable = false),
    StructField("payload", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def first: Expression = payload
  override def second: Expression = ord
  override def third: Expression = kExpr

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKBy =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKBy =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): TopKBy =
    copy(payload = newFirst, ord = newSecond, kExpr = newThird)
}
