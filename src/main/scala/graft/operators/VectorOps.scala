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

    // Symmetric int8 quantization of the embedding column — the storage
    // move that cuts a 100 TB float32 embedding store to a quarter (plus
    // one float scale per vector). Entirely codegen'd array HOFs over the
    // scan: no UDF, no shuffle, no driver involvement. Output is a
    // per-vector summary (scale, exact integer checksums of the quantized
    // vector, reconstruction error) rather than the raw int array — integer
    // sums make the cross-engine compare exact, and the driver comparator
    // does not take array columns. Both engines run the identical double
    // expression tree left-to-right, so the rounded doubles hash-match.
    "q_embed_quantize" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("v"))
        .withColumn("scale", array_max(transform(col("v"), x => abs(x))))
        // Degenerate all-zero vector: scale = 0 would make x/scale NaN in
        // Spark but NULL in DuckDB float division — guard to an all-zero
        // quantized vector so both engines agree (recon_err is then exactly
        // 0.0 through the shared expression tree, no second guard needed).
        .withColumn("q",
          when(col("scale") === 0.0, transform(col("v"), _ => lit(0L)))
            .otherwise(
              transform(col("v"), x => round(x / col("scale") * 127).cast("long"))))
      Tables.orderedOnce(e.select(col("vec_id"),
        (round(col("scale") * 1e6) / 1e6).as("scale_r"),
        aggregate(col("q"), lit(0L), (a, x) => a + x).as("q_sum"),
        aggregate(col("q"), lit(0L), (a, x) => a + abs(x)).as("q_abs_sum"),
        (round(sqrt(aggregate(
          zip_with(col("v"), col("q"), (x, qi) => {
            val diff = x - qi * col("scale") / lit(127)
            diff * diff
          }),
          lit(0.0), (a, x) => a + x)) * 1e6) / 1e6).as("recon_err")),
        col("vec_id"))
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
         ORDER BY label, dim""",
    // list_sum accumulates left-to-right like Spark's aggregate() fold, so
    // the rounded doubles are bit-comparable; the squared term is written
    // as an explicit product (NOT pow) because Math.pow and C pow may
    // differ in the last ulp.
    "q_embed_quantize" ->
      """WITH e AS (
           SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
           FROM embeddings
         ),
         s AS (SELECT vec_id, v,
                      list_max(list_transform(v, x -> abs(x))) AS scale FROM e),
         q AS (SELECT vec_id, v, scale,
                      CASE WHEN scale = 0 THEN list_transform(v, x -> 0.0)
                           ELSE list_transform(v, x -> round(x / scale * 127))
                      END AS qd FROM s)
         SELECT vec_id,
           round(scale * 1000000) / 1000000 AS scale_r,
           CAST(list_sum(qd) AS BIGINT) AS q_sum,
           CAST(list_sum(list_transform(qd, x -> abs(x))) AS BIGINT) AS q_abs_sum,
           round(sqrt(list_sum(list_transform(range(1, len(v) + 1),
               i -> (v[i] - qd[i] * scale / 127) * (v[i] - qd[i] * scale / 127))))
             * 1000000) / 1000000 AS recon_err
         FROM q ORDER BY vec_id"""
  )
}
