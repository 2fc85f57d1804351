package graft

import org.apache.spark.sql.functions._

/** Heavy-hitters scale probe: `runMain graft.HeavyProbe [nDocs]` (default
  * 200,000).
  *
  * The fixture corpus (and TextProbe's synthetic one) has a tiny closed
  * vocabulary, so the full-vocabulary groupBy that q_heavy_hitters exists
  * to avoid is cheap there — the sketch's advantage only shows when the
  * vocabulary is web-scale. This main builds a corpus shaped like real
  * text: ~60 words/doc where each position is one of TEN hot words with
  * probability ~1/5 and otherwise a corpus-unique token, i.e. ~48 distinct
  * tokens per doc and ~`0.8 * 60 * nDocs` distinct tokens overall (9.6M at
  * the 200k default). (Ten, not fifty: the hot index below is pmod(h, 50)
  * CONDITIONED on pmod(h, 5) == 0, so only the ten multiples of 5 occur —
  * each hot word carries ~2% of the corpus, deliberately above the 1%
  * heavy-hitter threshold. Hashing the index independently would spread
  * the 20% hot mass over 50 words at 0.4% each and the probe would have
  * nothing to find.) It then times
  *
  *  - `naive`: the textbook plan — groupBy over the full vocabulary, then
  *    the 1% threshold. Shuffles every distinct token.
  *  - `sketch`: the registered q_heavy_hitters — Misra–Gries candidates +
  *    total N in one map-side aggregate, exact verify over ≤100 broadcast
  *    candidates. Shuffles ≤100 tokens per partition, twice scans, no
  *    vocabulary-sized state anywhere.
  *
  * and asserts the two answers are IDENTICAL (both are exact; the sketch
  * is only a pruner). The hash-derived corpus is deterministic, so runs
  * are reproducible.
  */
object HeavyProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(200000L)
    val spark = Sessions.local(appName = "graft-heavy-probe")

    val dir = s"/tmp/graft_heavy_$nDocs"
    val wordsPerDoc = 60
    // position j of doc i: hot word h<0,5,..,45> (ten values — pmod(h,50)
    // restricted to the pmod(h,5)==0 band, see scaladoc) when xxhash64
    // lands in the 1-in-5 band, else the unique token u<doc>_<pos>
    // (never repeats)
    val pos = (j: Int) => {
      val h = xxhash64(concat(col("id"), lit(s"_$j")))
      when(pmod(h, lit(5)) === 0, concat(lit("h"), pmod(h, lit(50))))
        .otherwise(concat(lit("u"), col("id"), lit(s"_$j")))
    }
    spark.range(0, nDocs)
      .select(col("id").as("doc_id"),
        concat_ws(" ", (0 until wordsPerDoc).map(pos): _*).as("text"),
        lit("en").as("lang"), lit("synth").as("source"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    println(s"[heavy-probe] corpus: $nDocs docs × $wordsPerDoc words at $dir")

    def time[T](name: String)(f: => T): T = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val r = f
      println(f"[heavy-probe] $name%-8s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val naive = time("naive") {
      val words = spark.read.parquet(s"$dir/documents.parquet")
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")) > 0)
      val counts = words.groupBy("word").agg(count(lit(1)).as("cnt"))
      val n = counts.agg(sum("cnt")).head.getLong(0)
      counts.filter(col("cnt") * 100 > n)
        .orderBy(col("cnt").desc, col("word"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    }
    val sketch = time("sketch") {
      SparkEntry.queries("q_heavy_hitters")(spark, dir)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    }
    require(naive == sketch,
      s"sketch diverged from exact: naive=${naive.take(3)}… sketch=${sketch.take(3)}…")
    println(s"[heavy-probe] identical answers: ${sketch.size} heavy hitters " +
      s"(top: ${sketch.take(3).mkString(", ")})")
    spark.stop()
  }
}
