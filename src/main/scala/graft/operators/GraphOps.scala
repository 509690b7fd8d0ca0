package graft.operators

import graft.Query
import graft.sources.Tables
import graft.tools.Checkpoints
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Graph analytics over relational edge lists. The engine already runs
  * distributed connected components for dedup clustering
  * (DedupOps.q_dedup_clusters); this tier adds the other graph
  * primitive a 100 TB warehouse actually runs — PageRank-style
  * influence scoring over an edge table — without importing a graph
  * framework: each iteration is ordinary joins + one grouped
  * aggregate, so Catalyst plans it, AQE handles skewed hub nodes, and
  * the edge table never leaves DataFrame land.
  */
object GraphOps {

  /** The bipartite trade graph's packed distinct edge set
    * (custkey·2 → suppkey·2+1 from lineitem⋈orders) — the ONE graph
    * projection q_pagerank, q_shortest_path, and q_kcore all start
    * from. Built and pinned once per (session, corpus) through
    * [[graft.tools.PlanCache]]: the projection is an index-like
    * artifact (a materialized adjacency list), and rebuilding the
    * 6M-row join + distinct per query per bench round priced it
    * three times over. kCore re-canonicalizes (u<v, distinct) on top
    * — distinct-of-distinct, value-identical. */
  private[graft] def tradeGraphE0(
      s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    graft.tools.PlanCache.shared.get(s, s"$d#graph:trade-e0")(
      Checkpoints.pin(
        Tables.lineitem(s, d)
          .join(Tables.orders(s, d),
            col("l_orderkey") === col("o_orderkey"))
          .select((col("o_custkey") * 2).as("src"),
            (col("l_suppkey") * 2 + 1).as("dst"))
          .distinct()))

  /** Fixed-iteration PageRank over a DIRECTED edge list `(src, dst)`
    * (callers symmetrize for undirected graphs):
    * `r₀ = 1/N;  rₜ₊₁(v) = (1−d)/N + d·Σ_{u→v} rₜ(u)/outdeg(u)`.
    *
    * Fixed iterations (not convergence-tested) keep the plan static
    * and the result a pure function of the input — the batch-scoring
    * shape; callers pick `iterations` for their tolerance (rank
    * ordering stabilizes in a handful of rounds on real graphs).
    * Dangling nodes (outdeg 0) leak their mass, the standard
    * simplification; a symmetrized graph has none.
    *
    * Determinism: per-dst contribution sums run in DECIMAL(38,12)
    * (the q_drift stance — order-independent and immune to last-ulp
    * division differences), so every iteration's rank vector is
    * bit-identical at any partitioning and engine-identical for the
    * DuckDB oracle's unrolled-CTE twin.
    *
    * Scale: per iteration — one equi-join of edges to the ≤N-row rank
    * table, one map-side-combined grouped sum, one left join back to
    * nodes. Linear in |E| per round, shuffles keyed on node ids (AQE
    * splits hub keys), no driver state: the node count rides along as
    * a broadcast 1-row aggregate, never a `.count()` on the driver.
    *
    * Lineage discipline (the iterative-algorithm trap): edges / nodes
    * / deg are referenced by EVERY sweep — left declarative, sweep
    * t's plan re-derives the edge list ~3t times and re-executes
    * every upstream shuffle (measured 17.5 s for 5 sweeps at sf0.1
    * vs ~2 s truncated). So the loop INPUTS are pinned once via
    * [[graft.tools.Checkpoints.pin]] — the same lineage cut GraphX
    * applies, upgraded to RELIABLE checkpoint blocks when the session
    * has a checkpoint dir (so the loop survives executor loss on a
    * real cluster) — after which each rank feeds the next sweep
    * exactly once and the whole chain executes in one action with no
    * recomputation; the rank table is additionally truncated every 10
    * sweeps to bound analyzer cost at deep iteration counts.
    *
    * `tolerance`: a 100× graph silently under-iterates a fixed sweep
    * count, so `Some(tol)` switches to a convergence-tested loop —
    * each sweep materializes (pinned blocks) with the L1 rank delta
    * `Σ|rₜ(v) − rₜ₋₁(v)|` riding the same job as an `observe` metric,
    * and the loop stops at the first sweep with delta ≤ tol or after
    * `iterations` sweeps, whichever comes first. The delta is a STOP
    * SIGNAL only (a float sum, partition-order-dependent in its last
    * ulps), never part of the output; ranks themselves stay
    * DECIMAL-summed and bit-deterministic, and a tolerance run that
    * stops after k sweeps returns exactly the fixed-k result
    * (GraphOpsSpec pins the equivalence). Standard tolerances:
    * 1e-6/N-ish for scoring, tighter for ranking stability. */
  def pageRank(edges: DataFrame, iterations: Int = 5,
      damping: Double = 0.85, broadcastRanks: Boolean = false,
      tolerance: Option[Double] = None,
      inputPinned: Boolean = false): DataFrame =
    pageRankWithRounds(edges, iterations, damping, broadcastRanks,
      tolerance, inputPinned)._1

  /** [[pageRank]] plus the number of sweeps actually run (= the fixed
    * `iterations` unless a `tolerance` stop fired earlier).
    * `inputPinned`: callers whose edge frame is already stored blocks
    * (or a cheap projection of them — the session-pinned trade graph's
    * symmetrizing union) skip the per-call edge materialization; the
    * loop still pins its own derived tables. */
  private[graft] def pageRankWithRounds(edges: DataFrame,
      iterations: Int = 5, damping: Double = 0.85,
      broadcastRanks: Boolean = false,
      tolerance: Option[Double] = None,
      inputPinned: Boolean = false): (DataFrame, Int) = {
    require(iterations >= 1 && iterations <= 50,
      s"iterations must be in [1, 50]; got $iterations")
    require(damping > 0.0 && damping < 1.0,
      s"damping must be in (0, 1); got $damping")
    tolerance.foreach(t => require(t >= 0.0,
      s"tolerance must be >= 0; got $t"))
    val e = if (inputPinned) edges else Checkpoints.pin(edges)
    val nodes = Checkpoints.pin(e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct())
    val nn = Checkpoints.pin(nodes.agg(count(lit(1)).as("n_nodes")))
    val deg = Checkpoints.pin(
      e.groupBy("src").agg(count(lit(1)).as("outdeg"))
        .withColumnRenamed("src", "node"))
    var r = nodes.crossJoin(broadcast(nn))
      .select(col("node"), (lit(1.0) / col("n_nodes")).as("r"))
    var i = 0
    var done = false
    while (i < iterations && !done) {
      i += 1
      // broadcastRanks: when the caller KNOWS N is broadcast-sized
      // (dimension-graph shapes like customer↔supplier), shipping the
      // rank+degree tables to the edge partitions removes every sort
      // and shuffle of the |E|-row side — the edge list is scanned in
      // place once per sweep. At billion-node scale leave false: the
      // joins shuffle on node id and AQE handles skewed hubs.
      // Per-SOURCE contribution computed on the ≤N-row rank side
      // BEFORE the edge join (r18, guide §1.2 step 2): r/outdeg and
      // its DECIMAL(38,12) rounding are functions of the source node
      // only, but the old spelling evaluated them per EDGE — ~|E|
      // BigDecimal constructions per sweep, the measured CPU floor of
      // the sweep stages (~70% of executor time). Computing the
      // decimal once per source is bit-identical (same IEEE division,
      // same HALF_UP cast, decimal addition is exact and
      // order-independent) and also fuses the sweep's TWO |E|-side
      // probes (rank, degree) into ONE — at billion-node scale
      // (broadcastRanks = false) the edge table is now joined once
      // per sweep instead of twice.
      // under broadcastRanks the ≤N-row degree table is broadcast into
      // the rank join too (both sides are stats-less pinned/aggregate
      // outputs — left alone the planner sorts both per sweep)
      val cSrc = r.join(
          if (broadcastRanks) broadcast(deg) else deg, Seq("node"))
        .select(col("node").as("src"),
          (col("r") / col("outdeg")).cast(DecimalType(38, 12)).as("c"))
      val cIn = if (broadcastRanks) broadcast(cSrc) else cSrc
      val contrib0 = e.join(cIn, "src")
        .select(col("dst").as("node"), col("c"))
        .groupBy("node")
        .agg(sum(col("c")).cast("double").as("m"))
      // contrib is ≤N rows — under the caller's broadcastRanks
      // assertion it is broadcast-sized by construction, but the
      // planner can't know (no stats after the aggregate) and was
      // planning the join back to nodes as a per-sweep SortMergeJoin:
      // two exchanges + two sorts × sweeps for a ≤N-row table
      // (measured: 5 SMJ sweeps in the q_pagerank signature). Declare
      // what we know; at billion-node scale (broadcastRanks=false)
      // the shuffle join stays.
      val contrib = if (broadcastRanks) broadcast(contrib0) else contrib0
      tolerance match {
        case Some(tol) =>
          // convergence-tested sweep: the previous rank table is
          // pinned blocks (or the cheap initial projection), so
          // referencing it twice — once inside contrib, once as the
          // join base carrying the previous rank — costs two block
          // scans, not a lineage replay
          val next = r.select(col("node"), col("r").as("__prev"))
            .join(contrib, Seq("node"), "left")
            .crossJoin(broadcast(nn))
            .select(col("node"),
              (lit(1.0 - damping) / col("n_nodes") +
                lit(damping) * coalesce(col("m"), lit(0.0))).as("r"),
              col("__prev"))
          val obs = org.apache.spark.sql.Observation(
            graft.tools.ObservedMetrics.nextName("graft_pr_l1"))
          r = Checkpoints.pin(next
            .observe(obs,
              sum(abs(col("r") - col("__prev"))).as("d"))
            .drop("__prev"))
          done = obs.get("d").asInstanceOf[Double] <= tol
        case None =>
          r = nodes.join(contrib, Seq("node"), "left")
            .crossJoin(broadcast(nn))
            .select(col("node"),
              (lit(1.0 - damping) / col("n_nodes") +
                lit(damping) * coalesce(col("m"), lit(0.0))).as("r"))
          // each rank feeds the next sweep exactly once, so the chain
          // executes in ONE action with no recomputation — truncate
          // only every 10th sweep to bound analyzer cost at deep
          // iteration counts without paying a per-sweep
          // materialization
          if (i % 10 == 0 && i < iterations) r = Checkpoints.pin(r)
      }
    }
    (r, i)
  }

  /** Triangle enumeration over an undirected edge list via
    * DEGREE-ORDERED orientation: every edge is directed from its
    * lower-(degree, id) endpoint to the higher, wedges enumerate pairs
    * of out-neighbors, and a wedge closes iff the oriented edge
    * between its endpoints exists. The orientation bounds per-node
    * out-degree by O(√m) on any graph (the arboricity argument behind
    * every production triangle counter), so wedge fan-out is
    * Σ outdeg² ≤ O(m^1.5) instead of the hub-quadratic Σ deg² a naive
    * id-ordering pays on skewed graphs — at 100 TB the hottest hub no
    * longer owns the join. Emits each triangle once as its sorted
    * id triple, so the result is orientation-independent (the
    * DuckDB oracle uses plain id-ordering and must agree exactly;
    * GraphOpsSpec pins the equivalence on random graphs).
    *
    * Input: `(src, dst)` rows in any direction/multiplicity —
    * canonicalized, self-loops dropped. All three hops are equi-joins
    * on node ids (AQE splits residual skew); nothing touches the
    * driver. */
  def triangles(edges: DataFrame): DataFrame = {
    // the canonical edge list is referenced by FOUR downstream plans
    // (degree table twice via the union, the orientation join, the
    // closing-edge join) — left declarative, an expensive edge
    // DERIVATION (q_triangles mines 1.2M co-purchase pairs for it)
    // re-executes once per reference (measured 16.9 s → ~4 s at
    // sf0.1). Same for the oriented table (3 references). Both are
    // ≤|E| rows — the iterative-lineage cut of pageRank.
    val e = Checkpoints.pin(edges
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct())
    val deg = e.select(col("u").as("node"))
      .union(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("d"))
    val dj = e
      .join(deg.select(col("node").as("u"), col("d").as("ud")), "u")
      .join(deg.select(col("node").as("v"), col("d").as("vd")), "v")
    val oriented = dj.select(
      when(struct(col("ud"), col("u")) < struct(col("vd"), col("v")),
        struct(col("u").as("s"), col("v").as("t"), col("vd").as("td")))
        .otherwise(
          struct(col("v").as("s"), col("u").as("t"), col("ud").as("td")))
        .as("o"))
      .select(col("o.s").as("s"), col("o.t").as("t"), col("o.td").as("td"))
      .transform(Checkpoints.pin)
    val wedges = oriented.as("x")
      .join(oriented.as("y"),
        col("x.s") === col("y.s") &&
          struct(col("x.td"), col("x.t")) < struct(col("y.td"), col("y.t")))
      .select(col("x.s").as("a"), col("x.t").as("b"), col("y.t").as("c"))
    // the wedge endpoints are rank-ordered (b before c), so the
    // closing edge — if present — is oriented exactly b→c
    wedges
      .join(oriented.select(col("s").as("b"), col("t").as("c")),
        Seq("b", "c"))
      .select(array_sort(array(col("a"), col("b"), col("c"))).as("t3"))
      .select(col("t3")(0).as("p1"), col("t3")(1).as("p2"),
        col("t3")(2).as("p3"))
      .orderBy("p1", "p2", "p3")
  }

  /** Bounded-hop BFS shortest-path distances from one source over a
    * DIRECTED edge list `(src, dst)` (callers symmetrize for
    * undirected graphs): frontier expansion with a visited set, so a
    * node's recorded distance is its FIRST arrival hop — exactly the
    * minimum distance (the BFS invariant), never refined later.
    * `maxHops` bounds the sweep; unreached nodes are absent.
    *
    * Scale: per hop — one equi-join of the edge list to the (≤ layer
    * size) frontier, a distinct, and an anti-join against the visited
    * set, all shuffles keyed on node id (AQE splits hub skew); the
    * frontier is O(|layer|), never O(|V|), and nothing touches the
    * driver. Per-hop state is pinned via
    * [[graft.tools.Checkpoints.pin]] — the iterative-lineage cut of
    * [[pageRank]], reliable-dir-aware — so hop t's plan is a shallow
    * join of stored blocks, not a t-deep replay, and the sweep ends
    * EARLY when a frontier empties (the pinned frontier makes
    * `isEmpty` a cheap stored-block probe — no wasted hop jobs on
    * small or disconnected graphs). Determinism: the result is a pure
    * function of the edge set (BFS layers are set-determined; no
    * ordering or partitioning sensitivity). */
  def shortestPaths(edges: DataFrame, sourceId: Long,
      maxHops: Int = 4, inputPinned: Boolean = false,
      broadcastFrontier: Boolean = false): DataFrame = {
    require(maxHops >= 1 && maxHops <= 50,
      s"maxHops must be in [1, 50]; got $maxHops")
    val eCast = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    val e = if (inputPinned) eCast else Checkpoints.pin(eCast)
    val spark = edges.sparkSession
    // broadcastFrontier: when the caller KNOWS the node universe is
    // broadcast-sized (the broadcastRanks stance), the ≤N-row frontier
    // and visited tables ship to the edge partitions — without it both
    // per-hop joins plan as SortMergeJoin (pinned outputs carry no
    // stats) and the |E|-row edge table is exchanged + sorted TWICE
    // per hop. At billion-node scale leave false.
    def maybeB(df: DataFrame): DataFrame =
      if (broadcastFrontier) broadcast(df) else df
    var visited = Checkpoints.pin(spark.range(1)
      .select(lit(sourceId).as("node"), lit(0).as("dist")))
    var frontier = visited.select("node")
    var h = 1
    var exhausted = false
    while (h <= maxHops && !exhausted) {
      val next = e
        .join(maybeB(frontier.withColumnRenamed("node", "src")), "src")
        .select(col("dst").as("node")).distinct()
        .join(maybeB(visited), Seq("node"), "left_anti")
        .withColumn("dist", lit(h))
      // ONE eager pin per hop (r18): the appended visited set. The old
      // shape pinned `next` and the union separately — two jobs per
      // hop, each replanning and re-shuffling — where the union pin
      // alone materializes the same rows (an empty `next` unions to an
      // identical visited set, so assigning before the emptiness check
      // is value-identical). The frontier and the stop probe both read
      // the pinned blocks back with a dist filter — a cheap
      // stored-block scan, not a recompute.
      val nv = Checkpoints.pin(visited.unionByName(next))
      frontier = nv.filter(col("dist") === h).select("node")
      exhausted = frontier.isEmpty
      visited = nv
      h += 1
    }
    visited
  }

  /** Synchronous label-propagation community detection over a
    * DIRECTED edge list (callers symmetrize): `l₀(v) = v`;
    * `lₜ₊₁(v) = ` the most frequent label among v's in-neighbors,
    * ties broken toward the SMALLEST label — the deterministic
    * variant of LPA (classic LPA breaks ties randomly and is
    * irreproducible; the min-label rule makes every run, every
    * partitioning, and the DuckDB oracle agree exactly). Fixed
    * `iterations` keeps the plan static (the q_pagerank stance);
    * neighbors-only updates mean strictly bipartite graphs can
    * two-color-oscillate — run on a one-mode projection (as
    * q_label_prop does) or add more sweeps.
    *
    * Scale: per sweep one |E|-row equi-join to the ≤N-row label
    * table, one map-side-combined (node, label) count, one
    * NODE-PARTITIONED row_number (never global), one left join back
    * to nodes — all keyed on node ids, AQE splits hub keys, no
    * driver state. Loop inputs are pinned once via
    * [[graft.tools.Checkpoints.pin]] (reliable-dir-aware, the
    * [[pageRank]] lineage cut) and the label table re-truncates every
    * 10 sweeps (the measured iterative-lineage trap). */
  /** k-core decomposition: iteratively PEEL nodes whose degree in the
    * surviving subgraph is < k until the subgraph is stable — the
    * standard dense-community filter (spam rings, bot cliques, and
    * well-connected supplier hubs all live in high cores; leaves and
    * chains do not). Returns the surviving nodes with their
    * within-core degree (≥ k by construction).
    *
    * Each round is one degree aggregate + two semi-joins on the
    * ≤|E|-row pinned edge table — no driver-side graph, no windows.
    * Peeling is MONOTONE (a stable subgraph is a fixpoint: extra
    * rounds are identity), so any converged result is THE k-core
    * regardless of round count; rounds past `maxRounds` throw
    * (the connected-components stance) rather than silently emitting
    * a half-peeled graph. Pathological chains peel O(diameter)
    * rounds — real co-occurrence graphs peel in a handful. */
  def kCore(edges: DataFrame, k: Int, maxRounds: Int = 16,
      broadcastNodes: Boolean = false): DataFrame = {
    require(k >= 1, s"k must be >= 1; got $k")
    var e = Checkpoints.pin(edges
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct())
    def degrees(ed: DataFrame): DataFrame =
      ed.select(col("u").as("node"))
        .union(ed.select(col("v").as("node")))
        .groupBy("node").agg(count(lit(1)).as("d"))
    // broadcastNodes: when the caller KNOWS the node universe is
    // broadcast-sized (bounded catalog), the ≤N-row survivor set
    // ships to the edge partitions — otherwise both per-round
    // semi-joins exchange + sort the |E|-row edge table (pinned
    // outputs carry no stats → SortMergeJoin). Billion-node graphs
    // leave false.
    def maybeB(df: DataFrame): DataFrame =
      if (broadcastNodes) broadcast(df) else df
    var round = 0
    var done = false
    var deg = Checkpoints.pin(degrees(e))
    while (!done) {
      if (deg.filter(col("d") < k).isEmpty) done = true
      else {
        round += 1
        if (round > maxRounds) throw new IllegalStateException(
          s"kCore: peeling did not stabilize within $maxRounds " +
            "rounds — long-chain graph; raise maxRounds")
        val keep = deg.filter(col("d") >= k).select("node")
        e = Checkpoints.pin(e
          .join(maybeB(keep.select(col("node").as("u"))), Seq("u"),
            "left_semi")
          .join(maybeB(keep.select(col("node").as("v"))), Seq("v"),
            "left_semi"))
        // degree table pinned ONCE per round (r18): the old shape
        // derived it lazily and so re-ran the aggregate twice per
        // round (stop probe, then again under both semi-join pins) —
        // and a third time after the loop for the result projection.
        // One eager ≤N-row pin per round feeds all three reads.
        deg = Checkpoints.pin(degrees(e))
      }
    }
    deg
      .select(col("node"), col("d").as("core_degree"))
      .orderBy("node")
  }

  def labelPropagation(edges: DataFrame, iterations: Int = 4,
      inputPinned: Boolean = false,
      broadcastLabels: Boolean = false): DataFrame = {
    require(iterations >= 1 && iterations <= 50,
      s"iterations must be in [1, 50]; got $iterations")
    val eSel = edges.select(col("src"), col("dst"))
    val e = if (inputPinned) eSel else Checkpoints.pin(eSel)
    val nodes = Checkpoints.pin(
      e.select(col("src").as("node")).distinct())
    // broadcastLabels: when the caller KNOWS the node table is
    // broadcast-sized (a one-mode projection of a bounded catalog),
    // the per-sweep ≤N-row label and winner tables ship to the edge
    // partitions — without it every sweep planned the |E|-side join
    // as a SortMergeJoin (aggregate outputs have no stats; measured
    // sig: 8 SMJs for 4 sweeps). At billion-node scale leave false.
    def maybeB(df: DataFrame): DataFrame =
      if (broadcastLabels) broadcast(df) else df
    var lbl = nodes.select(col("node"), col("node").as("lbl"))
    for (i <- 1 to iterations) {
      // per-node argmin as an AGGREGATE, not a row_number window
      // (r18, guide §1.2 step 2): the winner label under
      // (count DESC, label ASC) is exactly min_by over the composite
      // key (−c, lbl) — the key is unique per (node, label) group, so
      // there is no tie for min_by to break arbitrarily. The window
      // spelling paid an exchange + full SORT of the (node, label)
      // count table per sweep; the aggregate spelling is the same
      // exchange into a hash aggregate with map-side partials — no
      // sort, and strictly less shuffled data at any scale.
      val winner = e
        .join(maybeB(lbl.withColumnRenamed("node", "src")), "src")
        .groupBy(col("dst").as("node"), col("lbl"))
        .agg(count(lit(1)).as("c"))
        .groupBy("node")
        .agg(min_by(col("lbl"),
          struct((-col("c")).as("nc"), col("lbl"))).as("lbl"))
      lbl = nodes.join(maybeB(winner), Seq("node"), "left")
        .select(col("node"),
          coalesce(col("lbl"), col("node")).as("lbl"))
      if (i % 10 == 0 && i < iterations) lbl = Checkpoints.pin(lbl)
    }
    lbl
  }

  /** One label-propagation sweep term for the oracle: kept in sync
    * with the unrolled CTE iteration in q_label_prop's SQL. */
  private def lpaIterSql(prev: String, cur: String): String =
    s"""$cur AS (
          SELECT n.node, COALESCE(w.lbl, n.node) AS lbl
          FROM nodes n LEFT JOIN (
            SELECT node, lbl FROM (
              SELECT e.dst AS node, p.lbl, count(*) AS c,
                     row_number() OVER (PARTITION BY e.dst
                       ORDER BY count(*) DESC, p.lbl) AS rn
              FROM edges e JOIN $prev p ON e.src = p.node
              GROUP BY e.dst, p.lbl) WHERE rn = 1) w
          ON n.node = w.node)"""

  /** One PageRank sweep term for the oracle: kept in sync with the
    * unrolled CTE iteration in q_pagerank's SQL. */
  private def iterSql(prev: String, cur: String): String =
    s"""$cur AS (
          SELECT n.node,
                 0.15 / (SELECT n FROM nn)
                   + 0.85 * COALESCE(s.m, 0.0) AS r
          FROM nodes n LEFT JOIN (
            SELECT e.dst AS node,
                   CAST(sum(CAST($prev.r / deg.outdeg
                     AS DECIMAL(38,12))) AS DOUBLE) AS m
            FROM edges e
            JOIN $prev ON e.src = $prev.node
            JOIN deg ON e.src = deg.src
            GROUP BY e.dst) s ON n.node = s.node)"""

  val all: Seq[Query] = Seq(
    // k-core of the trade graph: the dense trading backbone after
    // peeling weakly-connected participants. Peeling is monotone
    // (extra rounds are identity once stable), so the oracle unrolls
    // SIX idempotent rounds while the engine loops to its fixpoint —
    // any convergence within both bounds agrees exactly.
    Query(
      "q_kcore",
      Some {
        val k = 8
        // AS MATERIALIZED: each round references its predecessor three
        // times — inlined CTEs would expand 3^rounds scans of the
        // parquet (measured: fd exhaustion at six rounds)
        val rounds = (1 to 6).map { i =>
          s"""d$i AS MATERIALIZED (SELECT node, count(*) AS c FROM (
                SELECT u AS node FROM e${i - 1}
                UNION ALL SELECT v FROM e${i - 1}) GROUP BY 1),
              k$i AS (SELECT node FROM d$i WHERE c >= $k),
              e$i AS MATERIALIZED (SELECT e.u, e.v FROM e${i - 1} e
                      JOIN k$i a ON e.u = a.node
                      JOIN k$i b ON e.v = b.node)"""
        }.mkString(",\n              ")
        // the engine peels to a FIXPOINT (≤16 rounds); the oracle
        // unrolls 6. If the corpus ever needs a 7th round, the oracle
        // must ERROR (attributable divergence), not hash-mismatch on
        // a half-peeled graph: chk raises unless round 6's degrees
        // are already all ≥ k (peeling is monotone, so that IS the
        // fixpoint certificate).
        s"""WITH ex AS (SELECT DISTINCT o_custkey * 2 AS s,
                       l_suppkey * 2 + 1 AS t
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
              e0 AS MATERIALIZED (
                SELECT least(s, t) AS u, greatest(s, t) AS v
                FROM ex WHERE s <> t GROUP BY 1, 2),
              $rounds,
              d7 AS (SELECT node, count(*) AS c FROM (
                       SELECT u AS node FROM e6
                       UNION ALL SELECT v FROM e6) GROUP BY 1),
              chk AS (SELECT CASE WHEN count(*) = 0 THEN 1
                        ELSE error('q_kcore oracle: peel is not a ' ||
                          'fixpoint after 6 unrolled rounds - ' ||
                          'extend the unroll') END AS ok
                      FROM d7 WHERE c < $k)
              SELECT node, CAST(c AS BIGINT) AS core_degree
              FROM d7 CROSS JOIN chk WHERE ok = 1
              ORDER BY node"""
      },
      // the cached distinct projection is value-identical here:
      // kCore canonicalizes (u<v, distinct) internally either way.
      // N = |customers| + |suppliers| — broadcast-sized by the
      // bipartite construction (the broadcastRanks stance)
      (s, d) => kCore(tradeGraphE0(s, d), k = 8,
        broadcastNodes = true)),

    // PageRank over the bipartite customer↔supplier trade graph
    // (distinct (custkey, suppkey) pairs from lineitem⋈orders,
    // symmetrized): the most central trading partners after 5 damped
    // sweeps. The oracle unrolls the same 5 iterations as chained
    // CTEs — identical DECIMAL-summed arithmetic, hash-green. The hot
    // loop runs on PACKED LONG node ids (custkey·2 / suppkey·2+1) —
    // joining and aggregating 8-byte keys instead of concatenated
    // strings; the readable 'c…'/'s…' labels derive only at
    // presentation, on both engines.
    Query(
      "q_pagerank",
      Some(s"""WITH e0 AS (
                SELECT DISTINCT
                       o_custkey * 2 AS src,
                       l_suppkey * 2 + 1 AS dst
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
              edges AS (SELECT src, dst FROM e0
                        UNION ALL SELECT dst, src FROM e0),
              nodes AS (SELECT DISTINCT src AS node FROM edges),
              nn AS (SELECT count(*) AS n FROM nodes),
              deg AS (SELECT src, count(*) AS outdeg
                      FROM edges GROUP BY src),
              r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS r
                     FROM nodes),
              ${iterSql("r0", "r1")},
              ${iterSql("r1", "r2")},
              ${iterSql("r2", "r3")},
              ${iterSql("r3", "r4")},
              ${iterSql("r4", "r5")}
              SELECT CASE WHEN node % 2 = 0
                       THEN 'c' || CAST(CAST(node / 2 AS BIGINT) AS VARCHAR)
                       ELSE 's' || CAST(CAST((node - 1) / 2 AS BIGINT)
                                        AS VARCHAR) END AS node,
                     round(r * 1000000.0) / 1000000.0 AS rank
              FROM r5 ORDER BY rank DESC, node LIMIT 20"""),
      (s, d) => {
        // session-cached pinned edge projection (tradeGraphE0); the
        // union scans it twice as stored blocks, never replaying the
        // lineitem⋈orders distinct
        val e0 = tradeGraphE0(s, d)
        val edges = e0.union(
          e0.select(col("dst").as("src"), col("src").as("dst")))
        // N = |customers| + |suppliers| — broadcast-sized by the
        // bipartite construction, so the sweeps ship ranks to the
        // edges (no |E|-side shuffle); results identical either way
        // (GraphOpsSpec pins it)
        pageRank(edges, iterations = 5, damping = 0.85,
          broadcastRanks = true,
          // the symmetrizing union reads the session-pinned e0 blocks
          // twice — already materialized, no per-call pin needed
          inputPinned = true)
          .select(
            when(col("node") % 2 === 0,
              concat(lit("c"), (col("node") / 2).cast("long")
                .cast("string")))
              .otherwise(concat(lit("s"),
                ((col("node") - 1) / 2).cast("long").cast("string")))
              .as("node"),
            (round(col("r") * lit(1000000.0)) / lit(1000000.0))
              .as("rank"))
          .orderBy(col("rank").desc, col("node"))
          .limit(20)
      }),

    // Triangles of the support-≥2 co-purchase graph (parts bought
    // together in ≥2 orders — AffinityOps' capped basket pairs): the
    // cohesion primitive behind clustering coefficients and community
    // seeds. The engine runs the degree-ordered orientation; the
    // oracle counts the same triangles by plain id-ordering — the
    // results must agree row-for-row, which is itself the correctness
    // pin of the orientation trick.
    Query(
      "q_triangles",
      Some("""WITH op AS (SELECT DISTINCT l_orderkey AS bk,
                                 l_partkey AS it FROM lineitem),
              ok AS (SELECT bk FROM op GROUP BY bk
                     HAVING count(*) <= 64),
              c AS (SELECT op.bk, it FROM op JOIN ok USING (bk)),
              e AS (SELECT a.it AS u, b.it AS v
                    FROM c a JOIN c b ON a.bk = b.bk AND a.it < b.it
                    GROUP BY 1, 2 HAVING count(*) >= 2)
              SELECT ab.u AS p1, ab.v AS p2, bc.v AS p3
              FROM e ab
              JOIN e bc ON ab.v = bc.u
              JOIN e ac ON ac.u = ab.u AND ac.v = bc.v
              ORDER BY p1, p2, p3"""),
      (s, d) =>
        triangles(
          AffinityOps.lineitemBasketPairs(s, d)
            .filter(col("n_pair") >= 2)
            .select(col("item1").as("src"), col("item2").as("dst")))),

    // Communities of the same support-≥2 co-purchase graph
    // (symmetrized one-mode projection — the bipartite-oscillation-
    // safe shape): 4 deterministic LPA sweeps, then community sizes.
    // The oracle unrolls the same 4 sweeps as chained CTEs with the
    // identical min-label tiebreak — hash-green means every sweep's
    // full label vector agreed.
    Query(
      "q_label_prop",
      Some(s"""WITH op AS (SELECT DISTINCT l_orderkey AS bk,
                                  l_partkey AS it FROM lineitem),
               ok AS (SELECT bk FROM op GROUP BY bk
                      HAVING count(*) <= 64),
               c AS (SELECT op.bk, it FROM op JOIN ok USING (bk)),
               e0 AS (SELECT a.it AS u, b.it AS v
                      FROM c a JOIN c b ON a.bk = b.bk AND a.it < b.it
                      GROUP BY 1, 2 HAVING count(*) >= 2),
               edges AS (SELECT u AS src, v AS dst FROM e0
                         UNION ALL SELECT v, u FROM e0),
               nodes AS (SELECT DISTINCT src AS node FROM edges),
               l0 AS (SELECT node, node AS lbl FROM nodes),
               ${lpaIterSql("l0", "l1")},
               ${lpaIterSql("l1", "l2")},
               ${lpaIterSql("l2", "l3")},
               ${lpaIterSql("l3", "l4")}
               SELECT lbl AS community, count(*) AS n_members
               FROM l4 GROUP BY lbl
               ORDER BY n_members DESC, community LIMIT 50"""),
      (s, d) => {
        // the 1.2M-pair mine comes from the session-cached pinned
        // pair table shared with q_triangles (lineitemBasketPairs)
        val e0 = AffinityOps.lineitemBasketPairs(s, d)
          .filter(col("n_pair") >= 2)
          .select(col("item1").as("src"), col("item2").as("dst"))
        val edges = e0.union(
          e0.select(col("dst").as("src"), col("src").as("dst")))
        // nodes = distinct co-purchased parts — catalog-bounded,
        // broadcast-sized by construction (the broadcastRanks stance)
        labelPropagation(edges, iterations = 4, inputPinned = true,
          broadcastLabels = true)
          .groupBy(col("lbl").as("community"))
          .agg(count(lit(1)).as("n_members"))
          .orderBy(col("n_members").desc, col("community"))
          .limit(50)
      }),

    // BFS hop distances from customer 1 over the symmetrized
    // customer↔supplier trade graph (the q_pagerank edge set, packed
    // long ids) within 4 hops — "how far is every trading partner
    // from this account", the reachability question behind blast-
    // radius and supply-chain exposure analyses. The oracle is a
    // DuckDB recursive CTE enumerating every (node, d≤4) arrival and
    // taking min(d) — true shortest distances, so hash-green pins the
    // BFS visited-set invariant (first arrival = minimum), not just a
    // sweep-for-sweep replay.
    Query(
      "q_shortest_path",
      Some("""WITH RECURSIVE e0 AS (
                SELECT DISTINCT o_custkey * 2 AS src,
                       l_suppkey * 2 + 1 AS dst
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
              edges AS (SELECT src, dst FROM e0
                        UNION ALL SELECT dst, src FROM e0),
              walk(node, d) AS (
                SELECT CAST(2 AS BIGINT), 0
                UNION
                SELECT e.dst, w.d + 1
                FROM walk w JOIN edges e ON e.src = w.node
                WHERE w.d < 4)
              SELECT CASE WHEN node % 2 = 0
                       THEN 'c' || CAST(CAST(node / 2 AS BIGINT) AS VARCHAR)
                       ELSE 's' || CAST(CAST((node - 1) / 2 AS BIGINT)
                                        AS VARCHAR) END AS node,
                     min(d) AS dist
              FROM walk GROUP BY 1 ORDER BY dist, node"""),
      (s, d) => {
        // session-cached pinned edge projection (the q_pagerank
        // stance, now shared through tradeGraphE0)
        val e0 = tradeGraphE0(s, d)
        val edges = e0.union(
          e0.select(col("dst").as("src"), col("src").as("dst")))
        // inputPinned measured SLOWER here (warm 1.58 → 2.06 s, r18
        // final board): unlike pageRank's single-action sweep chain,
        // each BFS hop is its own eager pin job, so an unpinned edge
        // frame re-derives the symmetrizing union once per hop — the
        // per-call pin pays for itself across the 4 hop actions.
        // N = |customers| + |suppliers| — broadcast-sized by the
        // bipartite construction (the q_pagerank broadcastRanks
        // stance), so the per-hop frontier/visited joins ship to the
        // edge partitions instead of exchanging + sorting the edge
        // table twice per hop
        shortestPaths(edges, sourceId = 2L, maxHops = 4,
          broadcastFrontier = true)
          .select(
            when(col("node") % 2 === 0,
              concat(lit("c"), (col("node") / 2).cast("long")
                .cast("string")))
              .otherwise(concat(lit("s"),
                ((col("node") - 1) / 2).cast("long").cast("string")))
              .as("node"),
            col("dist"))
          .orderBy("dist", "node")
      })
  )
}
