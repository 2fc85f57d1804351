package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions

/** Typed element-wise vector-sum Aggregator (SURVEY.md §4 custom item 1):
  * the reference's reducer holds a global array and atomically adds each
  * partial vector into it (reducer.go:77,146-153); this is the same fold as
  * a Catalyst Aggregator — partial sums per partition, then a merge tree —
  * with no shared mutable state and no driver involvement until the final
  * k-element result.
  *
  * The empty array is the identity so the aggregator is dimension-agnostic:
  * buffers adopt the first row's length (embeddings: 64).
  */
object VectorAgg {

  private def add(a: Array[Double], b: Array[Double]): Array[Double] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      require(a.length == b.length, s"vector dims differ: ${a.length} vs ${b.length}")
      val out = new Array[Double](a.length)
      var i = 0
      while (i < a.length) { out(i) = a(i) + b(i); i += 1 }
      out
    }

  val vectorSum: Aggregator[Array[Double], Array[Double], Array[Double]] =
    new Aggregator[Array[Double], Array[Double], Array[Double]] {
      def zero: Array[Double] = Array.emptyDoubleArray
      def reduce(buf: Array[Double], row: Array[Double]): Array[Double] = add(buf, row)
      def merge(a: Array[Double], b: Array[Double]): Array[Double] = add(a, b)
      def finish(r: Array[Double]): Array[Double] = r
      def bufferEncoder: ExpressionEncoder[Array[Double]] = ExpressionEncoder()
      def outputEncoder: ExpressionEncoder[Array[Double]] = ExpressionEncoder()
    }

  /** Untyped column form for use in `DataFrame.agg`. */
  def vectorSumUdaf: org.apache.spark.sql.expressions.UserDefinedFunction =
    functions.udaf(vectorSum, ExpressionEncoder[Array[Double]]())
}
