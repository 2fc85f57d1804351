package graft

import graft.functions.LangId
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("cosine_sim expression matches the HOF formulation bit-for-bit") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(0.5, -0.5, 0.0), Array(0.5, 0.5, 0.0))).toDF("a", "b")
    val hof = df.select(
      (aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0),
        (acc, x) => acc + x) /
        (sqrt(aggregate(transform(col("a"), x => x * x), lit(0.0), (a, x) => a + x)) *
          sqrt(aggregate(transform(col("b"), x => x * x), lit(0.0), (a, x) => a + x))))
        .as("c")).collect().map(_.getDouble(0))
    val native = df.select(expr("cosine_sim(a, b)")).collect().map(_.getDouble(0))
    assert(native.sameElements(hof))
  }

  test("cosine_sim participates in whole-stage codegen (no fallback)") {
    // A local Seq would be constant-folded to LocalTableScan; a parquet
    // scan forces a real codegen stage. Arguments must DIFFER or the
    // SimplifySelfCosine rule rewrites the expression to self_cosine.
    val e = Tables.embeddings(spark, TestSpark.sf)
      .select(transform(col("embedding"), x => x.cast("double")).as("v"))
      .select(expr("cosine_sim(v, reverse(v))").as("c"))
    // codegen stages render as "*(n)" in the plan string; the Project
    // evaluating cosine_sim must carry the asterisk (i.e. not fall back).
    val plan = e.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[cosine_sim.*"),
      s"cosine_sim Project not codegen'd:\n$plan")
    assert(e.collect().forall(r => math.abs(r.getDouble(0)) <= 1.0 + 1e-9))
  }

  test("dot_product matches the HOF formulation bit-for-bit, NULL on ragged") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(0.5, -0.5, 0.25), Array(8.0, 0.125, -3.0))).toDF("a", "b")
    val hof = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0),
        (acc, x) => acc + x).as("d")).collect().map(_.getDouble(0))
    val native = df.select(expr("dot_product(a, b)")).collect().map(_.getDouble(0))
    assert(native.zip(hof).forall { case (n, h) =>
      java.lang.Double.doubleToRawLongBits(n) ==
        java.lang.Double.doubleToRawLongBits(h)
    })
    val ragged = Seq((Array(1.0, 2.0), Array(1.0))).toDF("a", "b")
    assert(ragged.select(expr("dot_product(a, b)")).first().isNullAt(0))
  }

  test("dot_product NULL element poisons the result in BOTH execution modes") {
    // The round-6 fix was exactly a divergence between the interpreted and
    // codegen forms of this path, so each mode is pinned explicitly. The
    // arrays depend on `id` so nothing constant-folds away the projection.
    def q = spark.range(1)
      .select(
        array(col("id").cast("double"), lit(null).cast("double"), lit(2.0)).as("a"),
        array(lit(1.0), lit(2.0), col("id").cast("double") + 3.0).as("b"))
      .select(expr("dot_product(a, b)").as("d"))
    // 1) whole-stage codegen ON (default): the ev.isNull loop in doGenCode
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[dot_product.*"),
      s"expected a codegen'd dot_product Project:\n$plan")
    assert(q.first().isNullAt(0))
    // 2) codegen OFF: the interpreted nullSafeEval early-return
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(q.first().isNullAt(0))
    finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("shingles UDTF emits one row per n-gram, none for short texts") {
    import spark.implicits._
    val df = Seq((1L, "a b c d"), (2L, "x y"), (3L, "p q r")).toDF("id", "text")
    val got = df.select(col("id"), expr("shingles(text, 3)"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toList.sorted
    assert(got == List((1L, "a b c"), (1L, "b c d"), (3L, "p q r")))
  }

  test("optimizer rule rewrites cosine_sim(x, x) to the one-pass self_cosine") {
    val df = spark.range(3)
      .select(col("id"), array(col("id").cast("double"), lit(2.0)).as("v"))
      .select(col("id"), expr("cosine_sim(v, v)").as("c"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("self_cosine") && !optimized.contains("cosine_sim"),
      s"rule did not rewrite:\n$optimized")
    // An optimizer rule must not change observable results: the rewrite
    // evaluates s/(√s·√s) — which is 1 ulp BELOW 1.0 for about half of all
    // norms (e.g. s=5) — so assert BIT-equality against the unrewritten
    // formula, never == 1.0 (that was the bug the rewrite fix removed).
    val got = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    (0L to 2L).foreach { i =>
      val s = i.toDouble * i.toDouble + 4.0 // v = [i, 2.0] → Σx² = i² + 4
      val expected = s / (math.sqrt(s) * math.sqrt(s))
      assert(java.lang.Double.doubleToRawLongBits(got(i)) ==
        java.lang.Double.doubleToRawLongBits(expected),
        s"id=$i: got ${got(i)}, expected $expected (bit-exact)")
    }
  }

  test("cosine_sim returns NULL for mismatched lengths, matching the HOF form") {
    import spark.implicits._
    // Interpreted path: a LocalRelation project is constant-folded through
    // nullSafeEval by ConvertToLocalRelation.
    val local = Seq((Array(1.0, 2.0, 3.0), Array(1.0, 2.0))).toDF("a", "b")
    assert(local.select(expr("cosine_sim(a, b)")).first().isNullAt(0))
    // The zip_with HOF formulation null-pads the shorter side and poisons
    // the sum — NULL out, same contract.
    val hof = local.select(
      (aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0),
        (acc, x) => acc + x) /
        (sqrt(aggregate(transform(col("a"), x => x * x), lit(0.0), (a, x) => a + x)) *
          sqrt(aggregate(transform(col("b"), x => x * x), lit(0.0), (a, x) => a + x))))
        .as("c"))
    assert(hof.first().isNullAt(0))
    // Codegen path: range input is not foldable, so the isNull branch in
    // doGenCode executes inside WholeStageCodegen.
    val gen = spark.range(1)
      .select(array(col("id").cast("double"), lit(1.0), lit(2.0)).as("a"),
        array(col("id").cast("double"), lit(1.0)).as("b"))
      .select(expr("cosine_sim(a, b)").as("c"))
    assert(gen.first().isNullAt(0))
    // equal lengths on the same codegen path still compute (sanity).
    // a and b must DIFFER IN VALUE: semantically-equal expressions collapse
    // under project-merge and SimplifySelfCosine rewrites them to
    // self_cosine, bypassing the compute branch this case is meant to hit.
    val ok = spark.range(1)
      .select(array(col("id") + 1.0, lit(2.0)).as("a"),
        array(col("id") + 3.0, lit(4.0)).as("b"))
      .select(expr("cosine_sim(a, b)").as("c"))
    // id=0 → a=[1,2], b=[3,4]; same fused-loop order as the expression
    val expected = (1.0 * 3.0 + 2.0 * 4.0) /
      (math.sqrt(1.0 * 1.0 + 2.0 * 2.0) * math.sqrt(3.0 * 3.0 + 4.0 * 4.0))
    assert(java.lang.Double.doubleToRawLongBits(ok.first().getDouble(0)) ==
      java.lang.Double.doubleToRawLongBits(expected))
  }

  test("self-cosine rewrite preserves NaN for zero vectors (no constant fold)") {
    val df = spark.range(1)
      .select(array(lit(0.0), lit(0.0)).as("v"))
      .select(expr("cosine_sim(v, v)").as("c"))
    // a literal-1.0 fold would wrongly return 1.0 here; the rewrite must
    // keep the degenerate 0/0 = NaN semantics of the full formula
    assert(df.first().getDouble(0).isNaN)
  }

  test("malformed JSON yields null, not a task failure (error containment)") {
    // the reference logs-and-continues on parse errors (knobs.go:85-90);
    // the engine's equivalent is permissive parsing: corrupt input -> NULL
    import spark.implicits._
    val df = Seq("""{"k": 7}""", """{broken""", "", """[1,2]""", null)
      .toDF("props")
      .select(get_json_object(col("props"), "$.k").cast("long").as("k"))
    assert(df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
      .toSeq == Seq(Some(7L), None, None, None, None))
  }

  test("top_k_by matches the window row_number form exactly, including ties") {
    import spark.implicits._
    // planted ties: several payloads share ord values — the (ord DESC,
    // payload ASC) tie-break must agree with the window spec
    val rows = (1L to 500L).map(i => (i % 7, i, (i % 13) * 10))
    val df = rows.toDF("g", "payload", "ord")
    val viaAgg = df.groupBy("g")
      .agg(org.apache.spark.sql.functions.expr("top_k_by(payload, ord, 4)").as("top"))
      .select($"g", org.apache.spark.sql.functions.posexplode($"top"))
      .select($"g", ($"pos" + 1).as("rn"), $"col.ord".as("ord"),
        $"col.payload".as("payload"))
      .collect().map(_.toString).sorted
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy($"ord".desc, $"payload")
    val viaWindow = df
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w)
        .cast("int"))
      .filter($"rn" <= 4).select($"g", $"rn", $"ord", $"payload")
      .collect().map(_.toString).sorted
    assert(viaAgg.sameElements(viaWindow), "heap aggregate diverged from window spec")
  }

  test("top_k_by treats Long.MinValue ord as the smallest, not the largest") {
    import spark.implicits._
    // -Long.MinValue == Long.MinValue, so any negation-based ordering
    // ranks it LARGEST; the explicit comparator must rank it smallest
    val df = Seq(
      (0L, 10L, Long.MinValue), (0L, 11L, 5L), (0L, 12L, 3L), (0L, 13L, 1L))
      .toDF("g", "payload", "ord")
    val top = df.groupBy("g")
      .agg(org.apache.spark.sql.functions.expr("top_k_by(payload, ord, 2)").as("t"))
      .select(org.apache.spark.sql.functions.explode($"t"))
      .select($"col.ord", $"col.payload")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(top.toSeq == Seq((5L, 11L), (3L, 12L)),
      s"MinValue ord corrupted the kept set: ${top.mkString(", ")}")
    // and MinValue still survives when k covers it
    val all = df.groupBy("g")
      .agg(org.apache.spark.sql.functions.expr("top_k_by(payload, ord, 4)").as("t"))
      .select(org.apache.spark.sql.functions.explode($"t"))
      .select($"col.ord").collect().map(_.getLong(0))
    assert(all.last == Long.MinValue, "MinValue must rank last, not first")
  }

  test("top_k_by plans a partial ObjectHashAggregate (map-side heap merge)") {
    import spark.implicits._
    val df = (1L to 1000L).map(i => (i % 3, i, i * 2)).toDF("g", "p", "o")
      .groupBy("g")
      .agg(org.apache.spark.sql.functions.expr("top_k_by(p, o, 5)").as("top"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"expected object hash aggregate:\n$plan")
    assert(plan.contains("partial_topkby"),
      s"no map-side partial aggregation:\n$plan")
    // a 1000-row hot group still returns exactly k rows
    assert(df.collect().forall(_.getSeq[Any](1).length == 5))
  }

  test("top_k_by rejects wrong types and non-literal k at analysis time") {
    import spark.implicits._
    val df = Seq((1L, "x", 2.5)).toDF("g", "s", "d")
    // string payload / double ord → analysis failure, not executor CCE
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      df.groupBy("g")
        .agg(org.apache.spark.sql.functions.expr("top_k_by(s, d, 3)"))
        .collect()
    }
    assert(e1.getMessage.contains("BIGINT"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      df.groupBy("g")
        .agg(org.apache.spark.sql.functions.expr("top_k_by(g, g, g)"))
        .collect()
    }
    assert(e2.getMessage.toLowerCase.contains("literal"))
  }

  test("freq_candidates keeps every item above the N/(cap+1) guarantee") {
    import spark.implicits._
    // planted zipf-ish stream: item i appears 1000/i times (i = 1..50)
    // plus 5000 singletons; cap 20 ⇒ every item with freq > N/21 MUST
    // survive any partitioning. Shuffle the rows and spread them over
    // many partitions so the merge path is genuinely exercised.
    val rows = scala.util.Random.shuffle(
      (1 to 50).flatMap(i => Seq.fill(1000 / i)(s"hot$i")) ++
        (1 to 5000).map(i => s"one$i"))
    val df = rows.toDF("w").repartition(17)
    val n = rows.length
    val kept = df.agg(org.apache.spark.sql.functions
        .expr("freq_candidates(w, 20)").as("cs"))
      .select(org.apache.spark.sql.functions.explode($"cs").as("c"))
      .select($"c.item").collect().map(_.getString(0)).toSet
    assert(kept.size <= 20, s"sketch exceeded capacity: ${kept.size}")
    val exact = rows.groupBy(identity).view.mapValues(_.size)
    val mustKeep = exact.collect {
      case (w, c) if c.toLong * 21 > n => w
    }.toSet
    assert(mustKeep.nonEmpty && mustKeep.subsetOf(kept),
      s"guarantee violated: missing ${mustKeep -- kept}")
  }

  test("q_heavy_hitters equals the exact full-vocabulary answer") {
    val got = SparkEntry.queries("q_heavy_hitters")(spark, TestSpark.sf)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    import spark.implicits._
    val words = Tables.documents(spark, TestSpark.sf)
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split($"text", " ")).as("w"))
      .filter(org.apache.spark.sql.functions.length($"w") > 0)
      .as[String].collect()
    val n = words.length
    val expect = words.groupBy(identity).view.mapValues(_.size)
      .collect { case (w, c) if c.toLong * 100 > n => (w, c.toLong) }
      .toArray.sortBy { case (w, c) => (-c, w) }
    assert(got.sameElements(expect),
      s"2-pass result diverged from exact: got ${got.take(3).mkString(",")}")
  }

  test("freq_candidates rejects wrong types and non-literal cap at analysis time") {
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("g", "s")
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      df.groupBy("g")
        .agg(org.apache.spark.sql.functions.expr("freq_candidates(g, 3)"))
        .collect()
    }
    assert(e1.getMessage.contains("STRING"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      df.groupBy("g")
        .agg(org.apache.spark.sql.functions.expr("freq_candidates(s, g)"))
        .collect()
    }
    assert(e2.getMessage.toLowerCase.contains("literal"))
  }

  test("lang-id detects the dominant language of real sentences") {
    assert(LangId.detect("the quick brown fox jumps over the lazy dog near the riverbank") == "en")
    assert(LangId.detect("der schnelle braune fuchs springt und die hunde schlafen unter dem baum") == "de")
    assert(LangId.detect("el rapido zorro marron salta sobre el perro perezoso en la casa") == "es")
    assert(LangId.detect("") == "und")
    assert(LangId.detect(null) == "und")
  }
}
