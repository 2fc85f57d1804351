package org.apache.spark.sql

/** Narrow bridge into Spark's `private[sql]` surface (public Spark source,
  * stable across 4.x): re-bind a DataFrame's analyzed logical plan to a
  * sibling SparkSession of the SAME SparkContext. Used by the quantizer
  * training scope (SimilarityOps.trainConf) to run join-free training
  * collects on a session clone whose conf (AQE off, clamped shuffle
  * partitions) is ISOLATED from the caller's session — the public
  * alternative (`createDataFrame(df.rdd, schema)`) inserts a
  * deserialization barrier that breaks column pruning and codegen fusion
  * with the scan, which is exactly the cost the training path cannot pay.
  *
  * Only valid for sessions sharing one SparkContext/SharedState (cache
  * manager, catalog listeners): `rebind` asserts it.
  */
object GraftSqlBridge {
  def rebind(df: Dataset[Row], to: SparkSession): Dataset[Row] = {
    val cdf = df.asInstanceOf[classic.Dataset[Row]]
    val cs = to.asInstanceOf[classic.SparkSession]
    require(cdf.sparkSession.sparkContext eq cs.sparkContext,
      "rebind requires sessions of the same SparkContext")
    classic.Dataset.ofRows(cs, cdf.logicalPlan)
  }
}
