package graft.operators

import graft.Query
import graft.sources.Tables
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
    * a broadcast 1-row aggregate, never a `.count()` on the driver. */
  def pageRank(edges: DataFrame, iterations: Int = 5,
      damping: Double = 0.85): DataFrame = {
    require(iterations >= 1 && iterations <= 50,
      s"iterations must be in [1, 50]; got $iterations")
    require(damping > 0.0 && damping < 1.0,
      s"damping must be in (0, 1); got $damping")
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct()
    val nn = nodes.agg(count(lit(1)).as("n_nodes"))
    val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    var r = nodes.crossJoin(broadcast(nn))
      .select(col("node"), (lit(1.0) / col("n_nodes")).as("r"))
    for (_ <- 1 to iterations) {
      val contrib = edges.join(r, edges("src") === r("node"))
        .join(deg, "src")
        .select(col("dst").as("node"),
          (col("r") / col("outdeg")).cast(DecimalType(38, 12)).as("c"))
        .groupBy("node")
        .agg(sum(col("c")).cast("double").as("m"))
      r = nodes.join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(nn))
        .select(col("node"),
          (lit(1.0 - damping) / col("n_nodes") +
            lit(damping) * coalesce(col("m"), lit(0.0))).as("r"))
    }
    r
  }

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
    // PageRank over the bipartite customer↔supplier trade graph
    // (distinct (custkey, suppkey) pairs from lineitem⋈orders,
    // symmetrized): the most central trading partners after 5 damped
    // sweeps. The oracle unrolls the same 5 iterations as chained
    // CTEs — identical DECIMAL-summed arithmetic, hash-green.
    Query(
      "q_pagerank",
      Some(s"""WITH e0 AS (
                SELECT DISTINCT
                       'c' || CAST(o_custkey AS VARCHAR) AS src,
                       's' || CAST(l_suppkey AS VARCHAR) AS dst
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
              SELECT node,
                     round(r * 1000000.0) / 1000000.0 AS rank
              FROM r5 ORDER BY rank DESC, node LIMIT 20"""),
      (s, d) => {
        val e0 = Tables.lineitem(s, d)
          .join(Tables.orders(s, d),
            col("l_orderkey") === col("o_orderkey"))
          .select(
            concat(lit("c"), col("o_custkey").cast("string")).as("src"),
            concat(lit("s"), col("l_suppkey").cast("string")).as("dst"))
          .distinct()
        val edges = e0.union(
          e0.select(col("dst").as("src"), col("src").as("dst")))
        pageRank(edges, iterations = 5, damping = 0.85)
          .select(col("node"),
            (round(col("r") * lit(1000000.0)) / lit(1000000.0))
              .as("rank"))
          .orderBy(col("rank").desc, col("node"))
          .limit(20)
      })
  )
}
