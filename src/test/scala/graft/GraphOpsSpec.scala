package graft

import graft.operators.GraphOps
import org.apache.spark.sql.functions._

/** Laws for the PageRank tier. The oracle gate hash-compares the
  * 5-iteration sweep against DuckDB's unrolled-CTE twin at sf0.01;
  * these pin the algorithm itself — mass conservation, a hand-computed
  * closed form, hub dominance — plus bit determinism. */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  test("mass conservation: with no dangling nodes the rank vector " +
    "sums to 1 after every sweep") {
    val e0 = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"))
      .toDF("src", "dst")
    val edges = e0.union(e0.select(col("dst").as("src"),
      col("src").as("dst")))
    (1 to 4).foreach { it =>
      val total = GraphOps.pageRank(edges, iterations = it)
        .agg(sum("r")).head().getDouble(0)
      assert(math.abs(total - 1.0) < 1e-9, s"iteration $it")
    }
  }

  test("closed form on a symmetric star: after one sweep the hub " +
    "holds (1-d)/N + d*k/(k+... ) computed by hand, leaves are equal, " +
    "and the hub outranks every leaf at any iteration count") {
    // star: hub h connected to 3 leaves, symmetrized. N=4.
    // outdeg(h)=3, outdeg(leaf)=1. r0 = 1/4 each.
    // r1(h)   = 0.15/4 + 0.85 * (3 * (1/4)/1)     = 0.0375 + 0.6375
    // r1(leaf)= 0.15/4 + 0.85 * ((1/4)/3)         = 0.0375 + 0.0708333...
    val e0 = Seq(("h", "l1"), ("h", "l2"), ("h", "l3")).toDF("src", "dst")
    val edges = e0.union(e0.select(col("dst").as("src"),
      col("src").as("dst")))
    val r1 = GraphOps.pageRank(edges, iterations = 1)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(r1("h") - 0.675) < 1e-9)
    Seq("l1", "l2", "l3").foreach { l =>
      assert(math.abs(r1(l) - (0.0375 + 0.85 * 0.25 / 3)) < 1e-9, l)
    }
    (2 to 6).foreach { it =>
      val r = GraphOps.pageRank(edges, iterations = it)
        .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
      assert(r("h") > r("l1") && r("l1") === r("l2") &&
        r("l2") === r("l3"), s"iteration $it")
    }
  }

  test("bit-determinism under repartitioning (DECIMAL contribution " +
    "sums): the full q_pagerank top-20 is identical at any layout") {
    val base = SparkEntry.queries("q_pagerank")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(base.size === 20)
    // ranks descend and the (rank, node) order is total
    assert(base.map(_._2) === base.map(_._2).sorted.reverse)
    val again = SparkEntry.queries("q_pagerank")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(base === again)
  }

  test("parameter domains are validated") {
    val edges = Seq(("a", "b")).toDF("src", "dst")
    assert(intercept[IllegalArgumentException] {
      GraphOps.pageRank(edges, iterations = 0)
    }.getMessage.contains("iterations"))
    assert(intercept[IllegalArgumentException] {
      GraphOps.pageRank(edges, damping = 1.0)
    }.getMessage.contains("damping"))
    assert(intercept[IllegalArgumentException] {
      GraphOps.labelPropagation(edges, iterations = 0)
    }.getMessage.contains("iterations"))
  }

  test("labelPropagation: two disjoint triangles converge to their " +
    "min-id labels; an isolated bridge-free component never leaks") {
    val e0 = Seq((1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12))
      .toDF("src", "dst")
    val edges = e0.union(e0.select(col("dst").as("src"),
      col("src").as("dst")))
    val got = GraphOps.labelPropagation(edges, iterations = 4)
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(got === Map(1 -> 1, 2 -> 1, 3 -> 1,
      10 -> 10, 11 -> 10, 12 -> 10))
  }

  test("labelPropagation: deterministic under repartitioning and the " +
    "min-label tiebreak picks the smallest label on exact ties") {
    // star with two leaves: center 5's neighbors {7, 9} tie 1-1 →
    // label 7 (smallest); sync update, neighbors-only
    val e0 = Seq((5, 7), (5, 9)).toDF("src", "dst")
    val edges = e0.union(e0.select(col("dst").as("src"),
      col("src").as("dst")))
    val l1 = GraphOps.labelPropagation(edges, iterations = 1)
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(l1(5) === 7 && l1(7) === 5 && l1(9) === 5)
    val base = SparkEntry.queries("q_label_prop")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val again = SparkEntry.queries("q_label_prop")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(base === again && base.nonEmpty)
    // sizes descend; communities are distinct
    val sizes = base.map(_(1).asInstanceOf[Long])
    assert(sizes === sizes.sorted.reverse)
    assert(base.map(_(0)).distinct.length === base.length)
  }

  test("shortestPaths: hand-computed distances on a path-plus-chord " +
    "graph, unreachable nodes absent, maxHops truncates the frontier") {
    // 1—2—3—4—5 with chord 1—4; node 9 isolated edge 9—10.
    // From 1: d(1)=0, d(2)=1, d(4)=1 (chord beats the path), d(3)=2,
    // d(5)=2; 9/10 unreachable.
    val e0 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L),
      (9L, 10L)).toDF("src", "dst")
    val edges = e0.union(e0.select(col("dst").as("src"),
      col("src").as("dst")))
    val d = GraphOps.shortestPaths(edges, sourceId = 1L, maxHops = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(d === Map(1L -> 0, 2L -> 1, 4L -> 1, 3L -> 2, 5L -> 2))
    // maxHops=1 stops at the first layer
    val d1 = GraphOps.shortestPaths(edges, sourceId = 1L, maxHops = 1)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(d1 === Map(1L -> 0, 2L -> 1, 4L -> 1))
  }

  test("tolerance-stop pageRank: stops before the cap, returns exactly " +
    "the fixed-iteration result at the sweep it stopped on, and " +
    "tolerance=0 runs the full budget") {
    val e0 = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"))
      .toDF("src", "dst")
    val edges = e0.union(e0.select(col("dst").as("src"),
      col("src").as("dst")))
    val (converged, k) = GraphOps.pageRankWithRounds(edges,
      iterations = 50, tolerance = Some(1e-9))
    assert(k < 50, s"loose tolerance must stop early; ran $k")
    // a tolerance run that stops after k sweeps IS the fixed-k run:
    // same DECIMAL-summed arithmetic, the delta is only a stop signal
    val fixed = GraphOps.pageRank(edges, iterations = k)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val got = converged.collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got === fixed)
    // tolerance 0 can't trigger on a still-moving vector: runs the cap
    val (_, kAll) = GraphOps.pageRankWithRounds(edges,
      iterations = 3, tolerance = Some(0.0))
    assert(kAll === 3)
  }

  test("reliable-checkpoint mode: pageRank and shortestPaths reproduce " +
    "exactly with a checkpoint dir set, and blocks land in the dir") {
    val e0 = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"))
      .toDF("src", "dst")
    val edges = e0.union(e0.select(col("dst").as("src"),
      col("src").as("dst")))
    val prLocal = GraphOps.pageRank(edges, iterations = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val e1 = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val bfsEdges = e1.union(e1.select(col("dst").as("src"),
      col("src").as("dst")))
    val bfsLocal = GraphOps.shortestPaths(bfsEdges, 1L, maxHops = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val dir = java.nio.file.Files.createTempDirectory("graft_graph_ckpt_")
    spark.sparkContext.setCheckpointDir(dir.toString)
    try {
      val prReliable = GraphOps.pageRank(edges, iterations = 3)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(prReliable === prLocal)
      val bfsReliable = GraphOps.shortestPaths(bfsEdges, 1L, maxHops = 4)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(bfsReliable === bfsLocal)
      val wrote = java.nio.file.Files.walk(dir)
        .filter(p => java.nio.file.Files.isRegularFile(p)).count()
      assert(wrote > 0, s"no checkpoint files written under $dir")
    } finally {
      spark.sparkContext.setCheckpointDir(null)
    }
  }

  test("shortestPaths: BFS first-arrival equals min distance under " +
    "repartitioning, and the visited set never revises a distance") {
    val e0 = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
      .repartition(7)
    val edges = e0.union(e0.select(col("dst").as("src"),
      col("src").as("dst")))
    val d = GraphOps.shortestPaths(edges, 1L, maxHops = 6)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // 3 is reachable in 1 via the direct edge AND in 2 via 2 — the
    // visited anti-join must keep the hop-1 arrival
    assert(d === Map(1L -> 0, 2L -> 1, 3L -> 1))
  }

  test("kCore: multi-round peeling equals the brute force on random " +
    "sparse graphs, a path has no 2-core, a clique survives intact, " +
    "and non-convergence throws") {
    import spark.implicits._
    def brute(edges: Set[(Long, Long)], k: Int): Map[Long, Int] = {
      var e = edges
      var stable = false
      while (!stable) {
        val deg = e.toSeq.flatMap(p => Seq(p._1, p._2))
          .groupBy(identity).map { case (n, xs) => n -> xs.size }
        val bad = deg.filter(_._2 < k).keySet
        if (bad.isEmpty) stable = true
        else e = e.filter(p => !bad(p._1) && !bad(p._2))
      }
      e.toSeq.flatMap(p => Seq(p._1, p._2)).groupBy(identity)
        .map { case (n, xs) => n -> xs.size }
    }
    val rnd = new scala.util.Random(17)
    // sparse random graph: genuinely multi-round peeling
    val es = (1 to 600).map(_ =>
      (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).toSet
    Seq(2, 3, 4).foreach { k =>
      val got = graft.operators.GraphOps
        .kCore(es.toSeq.toDF("src", "dst"), k).collect()
        .map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
      assert(got === brute(es, k), s"k=$k")
    }
    // a path graph has NO 2-core (peels from the ends inward)
    val path = (1L to 10L).sliding(2).map(s => (s(0), s(1))).toSeq
    assert(graft.operators.GraphOps
      .kCore(path.toDF("src", "dst"), 2, maxRounds = 16).isEmpty)
    // a 5-clique is its own 4-core
    val clique = (for (i <- 1L to 5L; j <- i + 1 to 5L) yield (i, j))
    val kc = graft.operators.GraphOps
      .kCore(clique.toDF("src", "dst"), 4).collect()
    assert(kc.length === 5 && kc.forall(_.getLong(1) === 4L))
    // forbidding rounds on a peelable graph throws, never half-peels
    val e = intercept[IllegalStateException] {
      graft.operators.GraphOps
        .kCore(path.toDF("src", "dst"), 2, maxRounds = 0).collect()
    }
    assert(e.getMessage.contains("did not stabilize"))
  }

  test("broadcast variants are value-identical: shortestPaths " +
    "broadcastFrontier and kCore broadcastNodes reproduce the shuffle " +
    "path exactly") {
    val e0 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L),
      (9L, 10L)).toDF("src", "dst")
    val edges = e0.union(e0.select(col("dst").as("src"),
      col("src").as("dst")))
    def toMapBfs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(
      toMapBfs(GraphOps.shortestPaths(edges, 1L, maxHops = 4,
        broadcastFrontier = true)) ===
      toMapBfs(GraphOps.shortestPaths(edges, 1L, maxHops = 4)))
    val rnd = new scala.util.Random(23)
    val es = (1 to 400).map(_ =>
      (rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter(p => p._1 != p._2).toSeq
    def toMapCore(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(
      toMapCore(GraphOps.kCore(es.toDF("src", "dst"), 3,
        broadcastNodes = true)) ===
      toMapCore(GraphOps.kCore(es.toDF("src", "dst"), 3)))
  }
}
