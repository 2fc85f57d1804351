package graft.operators

import graft.Tables
import graft.Tables.Q
import graft.functions.VectorAgg
import org.apache.spark.sql.functions._

/** Vector aggregation (UDAF surface) + sketch aggregates (SURVEY.md §2B
  * "UDAF" and "approx distinct" rows).
  */
object VectorOps {

  val queries: Map[String, Q] = Map(
    // Per-label centroid of the 64-dim embeddings via the typed vector-sum
    // Aggregator: partial vector sums per partition, one shuffle of
    // (label, vec64) rows — the reference's reducer fold (reducer.go:146-153)
    // as a first-class Catalyst aggregate.
    // Output is LONG FORM (label, dim, c) rather than one array<double>
    // row per label: raw array columns crash the driver's pandas
    // comparator (unhashable ndarray), and the long form is also what a
    // downstream per-dimension analysis would join against.
    "q_vector_centroid" -> ((s, d) => {
      val e = Tables.embeddings(s, d).select(
        col("label").cast("long").as("label"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      e.groupBy("label")
        .agg(VectorAgg.vectorSumUdaf(col("v")).as("vsum"),
          count(lit(1)).as("n"))
        .select(col("label"), col("n"), posexplode(col("vsum")))
        .select(col("label"), (col("pos") + 1).cast("long").as("dim"),
          (round(col("col") / col("n") * 10000) / 10000).as("c"))
        .orderBy("label", "dim")
    }),

    // HLL sketch distinct — no oracle (sketches differ across engines);
    // scalatest bounds-checks vs exact. At 100 TB this is THE way to count
    // distincts: fixed-size sketch per partition, tiny merge, no Expand.
    "q_approx_distinct" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"))
        .orderBy("l_returnflag")
    })
  )

  val oracleSql: Map[String, String] = Map(
    // Per-dim average via a constant 64-row series cross join — arithmetic
    // mirrored (sum/count then scaled round), one row per (label, dim).
    "q_vector_centroid" ->
      """SELECT CAST(label AS BIGINT) AS label, CAST(i AS BIGINT) AS dim,
                round(sum(embedding[i]::DOUBLE) / count(*) * 10000) / 10000 AS c
         FROM embeddings, generate_series(1, 64) AS g(i)
         GROUP BY label, i
         ORDER BY label, dim"""
  )
}
