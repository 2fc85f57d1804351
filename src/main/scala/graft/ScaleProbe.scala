package graft

import org.apache.spark.sql.functions._

/** Scale probe: `runMain graft.ScaleProbe [nDocs]` (default 50,000).
  *
  * The fixture `documents` table is 500 rows at every sf, so the near-dup
  * pipeline's scaling behavior is otherwise untested. This main generates
  * an nDocs-corpus (deterministic, hash-derived words, ~60 words/doc) with
  * 1% planted near-duplicates (a copy of another doc with the last 3 words
  * changed), writes it as a fixture-shaped parquet dir, runs the REAL
  * registered queries against it, and reports wall-times plus near-dup
  * recall on the planted pairs. Everything — generation included — is
  * distributed DataFrame work; the driver only sees counters.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(50000L)
    val spark = Sessions.local(appName = "graft-scale-probe")
    import spark.implicits._

    val dir = s"/tmp/graft_scale_$nDocs"
    val vocabSize = 500
    val wordsPerDoc = 60

    // base corpus: doc i = 60 hash-derived words over a 500-word vocabulary
    val word = (seed: org.apache.spark.sql.Column) =>
      concat(lit("w"), pmod(xxhash64(seed), lit(vocabSize)))
    val base = spark.range(0, nDocs)
      .select(col("id").as("doc_id"),
        concat_ws(" ", (0 until wordsPerDoc).map(j =>
          word(concat(col("id"), lit(s"_$j")))): _*).as("text"))
    // planted near-dups: every 100th doc gets a twin (id + nDocs) equal to
    // it except the last 3 words — trigram Jaccard ≈ 0.90
    val twins = base.filter(col("doc_id") % 100 === 0)
      .select((col("doc_id") + nDocs).as("doc_id"),
        concat(
          expr(s"substring_index(text, ' ', ${wordsPerDoc - 3})"),
          lit(" zz1 zz2 zz3")).as("text"))
    base.unionByName(twins)
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("synth").as("source"), length(col("text")).as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val total = nDocs + nDocs / 100
    println(s"[scale-probe] corpus: $total docs at $dir")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scale-probe] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }

    time("q_dedup_exact") {
      SparkEntry.queries("q_dedup_exact")(spark, dir)
        .write.format("noop").mode("overwrite").save(); total
    }
    time("q_text_wordcount") {
      SparkEntry.queries("q_text_wordcount")(spark, dir).count()
    }
    time("q_doc_fingerprint") {
      SparkEntry.queries("q_doc_fingerprint")(spark, dir)
        .write.format("noop").mode("overwrite").save(); total
    }
    var found: Array[(Long, Long)] = Array.empty
    time("q_minhash_neardup") {
      found = SparkEntry.queries("q_minhash_neardup")(spark, dir)
        .select("doc_a", "doc_b").as[(Long, Long)].collect()
      found.length
    }
    val planted = (0L until nDocs by 100).map(i => (i, i + nDocs)).toSet
    val recall = planted.count(found.toSet).toDouble / planted.size
    println(f"[scale-probe] planted-pair recall: $recall%.3f " +
      s"(${planted.count(found.toSet)}/${planted.size} found, " +
      s"${found.length - planted.count(found.toSet)} extra pairs)")
    spark.stop()
  }
}
