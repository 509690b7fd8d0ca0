package graft.operators

import graft.Query
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Geospatial tier: great-circle distance, fixed-radius spatial
  * joins, and grid-density rollups over plain (lat, lon) double
  * columns — the warehouse-native slice of geo analytics (no geometry
  * types, no external index), built so every pair space is BLOCKED by
  * a grid cell equi-key and the distance math is codegen'd builtin
  * trigonometry.
  *
  * The fixtures carry no coordinates, so the queries derive
  * deterministic synthetic positions from entity keys via the
  * engine's cross-engine md5 draw ([[CurationOps.hashDraw]]) — the
  * same derivation the DuckDB oracle spells nibble-for-nibble, making
  * the radius join exactly hash-gateable: the oracle brute-forces the
  * full cross product and must agree row-for-row with the engine's
  * blocked plan, which is precisely the blocking-completeness proof.
  *
  * Scale stance: [[radiusJoin]] shuffles each side once on its grid
  * cell (the left side ×9 for the neighbor fan-out — a constant, not
  * a data multiplier); candidate pairs are bounded by cell occupancy
  * (≈ area density × R², never n²), and the haversine verify is a
  * narrow codegen'd filter. [[gridDensity]] is one map-side-combined
  * hash aggregate. At 100 TB both are embarrassingly parallel; a hot
  * cell (a dense city) is an AQE skew-split case, same as any hot
  * join key.
  */
object GeoOps {

  /** Mean-earth-radius haversine distance in km between two
    * (lat, lon) degree pairs — one fixed IEEE op sequence (radians →
    * sin/cos → asin), identical on any engine up to ~1 ulp of libm
    * noise, which the callers' 3-dp roundings and threshold margins
    * absorb. All builtins: stays inside whole-stage codegen. */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column,
      lon2: Column): Column = {
    val dLat = radians(lat2 - lat1) / lit(2.0)
    val dLon = radians(lon2 - lon1) / lit(2.0)
    lit(2.0 * 6371.0088) * asin(sqrt(
      pow(sin(dLat), 2) +
        cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon), 2)))
  }

  /** Deterministic synthetic latitude in [-70, 70) from a key — two
    * independent 16-bit md5 draws stretched over the band (poles
    * excluded so east-west cell bounds stay finite). Exactly
    * reproducible in SQL via [[CurationOps.sqlDraw]]. */
  def syntheticLat(key: Column): Column =
    CurationOps.hashDraw(concat(key.cast("string"), lit("lat")))
      .cast("double") / lit(65536.0) * lit(140.0) - lit(70.0)

  /** Deterministic synthetic longitude in [-180, 180) from a key. */
  def syntheticLon(key: Column): Column =
    CurationOps.hashDraw(concat(key.cast("string"), lit("lon")))
      .cast("double") / lit(65536.0) * lit(360.0) - lit(180.0)

  // SQL spellings of the same derivations for the DuckDB oracles.
  private[operators] def sqlLat(key: String): String =
    s"(${CurationOps.sqlDraw(s"$key || 'lat'")} / 65536.0 * 140.0 - 70.0)"
  private[operators] def sqlLon(key: String): String =
    s"(${CurationOps.sqlDraw(s"$key || 'lon'")} / 65536.0 * 360.0 - 180.0)"

  /** Conservative per-axis cell bounds for a given radius, valid for
    * |lat| ≤ 70°, from the chord bounds d ≥ 2R·sin(Δφ/2) ≥ 2R·Δφ/π
    * and d ≥ 2R·cos70°·Δλ/π (sin x ≥ 2x/π on [0, π/2]): two points
    * within `radiusKm` differ by at most 90·d/R_⊕ < d/70 degrees of
    * latitude and 90·d/(R_⊕·cos70°) < d/24 degrees of longitude.
    * Latitude cells use d/70 directly (no wrap). Longitude divides
    * the full circle into `floor(360/(d/24))` EQUAL cells — the
    * resulting edge is ≥ d/24, and the integer cell count makes the
    * ±180° seam an ordinary modular neighbor instead of a missed
    * pair (the antimeridian case a naive `floor(lon/edge)` grid
    * drops). Oversized cells only add candidates (more haversine
    * verifies), never lose a true pair. */
  private[operators] def latEdgeDeg(radiusKm: Double): Double =
    radiusKm / 70.0
  private[operators] def lonCellCount(radiusKm: Double): Int =
    math.max(1, math.floor(360.0 / (radiusKm / 24.0)).toInt)

  /** Fixed-radius spatial join: all (left, right) pairs within
    * `radiusKm` great-circle km, with the 3-dp distance attached.
    * Blocking: both sides key by grid cells sized so no qualifying
    * pair can differ by a full cell in either axis ([[latEdgeDeg]] /
    * [[lonCellCount]] — longitude cells are modular, so the ±180°
    * seam blocks correctly); the left side fans out to its 3×3 cell
    * neighborhood (a constant ×9 explode — never a data-dependent
    * multiplier; duplicate modular lon offsets dedup when the circle
    * has ≤ 3 cells), the join is a plain equi-join on the cell pair,
    * and haversine verifies exactly. Requires |lat| ≤ 70 on both
    * sides (the synthetic band; real polar data wants a polar-cap
    * cell — out of scope).
    *
    * Both inputs must carry (`idCols`…, `lat`, `lon`). Output:
    * left idCols, right idCols, `dist_km` (3 dp). */
  def radiusJoin(left: DataFrame, right: DataFrame,
      radiusKm: Double): DataFrame =
    radiusJoinRaw(left, right, radiusKm)
      .withColumn("dist_km",
        round(col("dist_km") * lit(1000.0)) / lit(1000.0))

  /** [[radiusJoin]] with the UNROUNDED distance — the form argmin
    * consumers ([[nearestJoin]]) order by, so a 3-dp rounding tie can
    * never flip a nearest choice. */
  private[operators] def radiusJoinRaw(left: DataFrame,
      right: DataFrame, radiusKm: Double): DataFrame = {
    val latEdge = latEdgeDeg(radiusKm)
    val nLon = lonCellCount(radiusKm)
    val lonEdge = 360.0 / nLon
    def cellLat(c: Column) = floor(c / lit(latEdge)).cast("long")
    def cellLon(c: Column) =
      pmod(floor((c + lit(180.0)) / lit(lonEdge)).cast("long"),
        lit(nLon.toLong))
    val lonOffs = (-1 to 1).map(d => ((d % nLon) + nLon) % nLon).distinct
    val offsets = array((-1 to 1).flatMap(dy => lonOffs.map(dx =>
      struct(lit(dy.toLong).as("dy"), lit(dx.toLong).as("dx")))): _*)
    val l = left.columns.foldLeft(left)((df, c) =>
      df.withColumnRenamed(c, s"l_$c"))
      .withColumn("__o", explode(offsets))
      .withColumn("__clat", cellLat(col("l_lat")) + col("__o.dy"))
      .withColumn("__clon",
        pmod(cellLon(col("l_lon")) + col("__o.dx"), lit(nLon.toLong)))
      .drop("__o")
    val r = right.columns.foldLeft(right)((df, c) =>
      df.withColumnRenamed(c, s"r_$c"))
      .withColumn("__clat", cellLat(col("r_lat")))
      .withColumn("__clon", cellLon(col("r_lon")))
    val dist = haversineKm(col("l_lat"), col("l_lon"),
      col("r_lat"), col("r_lon"))
    l.join(r, Seq("__clat", "__clon"))
      .withColumn("dist_km", dist)
      .filter(col("dist_km") <= lit(radiusKm))
      .drop("__clat", "__clon")
  }

  /** Nearest-neighbor spatial join: for each left point, THE single
    * nearest right point (ties broken on the right key) with the 3-dp
    * distance. Escalating-radius search: stage k radius-joins the
    * still-unmatched lefts at `radii(k)` — any left with SOME match
    * within r has its TRUE global nearest inside the candidate set
    * (the radius join is complete at r and the nearest is ≤ r away),
    * so the per-left argmin is exact and the left retires; only lefts
    * whose nearest neighbor is beyond every radius reach the final
    * broadcast brute-force sweep (in any production-dense corpus, a
    * vanishing remainder — and each escalation only carries the
    * unmatched). Every stage is the blocked equi-join + a
    * left-key-partitioned row_number window; nothing global. */
  def nearestJoin(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String,
      radii: Seq[Double] = Seq(250.0, 1000.0, 4000.0)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(radii.nonEmpty && radii == radii.sorted,
      s"radii must be ascending; got $radii")
    val lk = s"l_$leftKey"
    val rk = s"r_$rightKey"
    def argmin(cand: DataFrame): DataFrame = {
      val w = Window.partitionBy(lk)
        .orderBy(col("dist_km"), col(rk))
      cand.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
    }
    var remaining = left
    var best: Option[DataFrame] = None
    radii.foreach { r =>
      // pin each stage: its result feeds BOTH the answer union and the
      // next stage's anti-join, and without the lineage cut stage k
      // re-derives every earlier stage's blocked join once per
      // consumer (the BFS recompute trap — measured 2× on the bench)
      val stage = graft.tools.Checkpoints.pin(
        argmin(radiusJoinRaw(remaining, right, r)))
      best = Some(best.map(_.unionByName(stage)).getOrElse(stage))
      remaining = remaining.join(
        stage.select(col(lk).as(leftKey)), Seq(leftKey), "left_anti")
    }
    // brute remainder: only lefts with NO right point within
    // radii.max — broadcast fan-out, bounded by that emptiness
    val rr = right.columns.foldLeft(right)((df, c) =>
      df.withColumnRenamed(c, s"r_$c"))
    val lr = remaining.columns.foldLeft(remaining)((df, c) =>
      df.withColumnRenamed(c, s"l_$c"))
    val far = argmin(lr.crossJoin(broadcast(rr))
      .withColumn("dist_km", haversineKm(col("l_lat"), col("l_lon"),
        col("r_lat"), col("r_lon"))))
    best.get.unionByName(far)
      .withColumn("dist_km",
        round(col("dist_km") * lit(1000.0)) / lit(1000.0))
  }

  /** Spatial proximity clusters: connected components of the
    * "within `radiusKm`" graph (DBSCAN with minPts=1 / single-linkage
    * at a distance cut) — region discovery without a preset grid. The
    * pair graph comes from the blocked [[radiusJoinRaw]] self-join
    * (cell-bounded, never n²) and the components run on
    * [[DedupOps.nearDupClusters]]'s checkpointed min-label
    * propagation — the identical machinery that clusters near-dup
    * documents, reused verbatim on spatial edges. Output:
    * (`keyCol`, cluster_id = component's min key, keeper). */
  def spatialClusters(pts: DataFrame, keyCol: String,
      radiusKm: Double): DataFrame = {
    val pairs = radiusJoinRaw(pts, pts, radiusKm)
      .filter(col(s"l_$keyCol") < col(s"r_$keyCol"))
      .select(col(s"l_$keyCol").as("a_id"),
        col(s"r_$keyCol").as("b_id"))
    DedupOps.nearDupClusters(pairs, pts.select(col(keyCol)), keyCol)
  }

  /** Spatial density rollup: point counts (plus a DECIMAL-exact
    * measure sum) per `edgeDeg`-degree grid cell — the heatmap /
    * hot-spot aggregate. One map-side-combined hash aggregate. */
  def gridDensity(df: DataFrame, latCol: String, lonCol: String,
      measureCol: String, edgeDeg: Double): DataFrame =
    df.groupBy(
        floor(col(latCol) / lit(edgeDeg)).cast("long").as("cell_lat"),
        floor(col(lonCol) / lit(edgeDeg)).cast("long").as("cell_lon"))
      .agg(count(lit(1)).as("n"),
        // DECIMAL-exact fold, DOUBLE render (§7.6 final-render rule)
        sum(col(measureCol).cast("decimal(18,2)")).cast("double")
          .as("measure_sum"))
      .orderBy("cell_lat", "cell_lon")

  val all: Seq[Query] = Seq(
    // Customers within 500 km of a supplier, from md5-derived
    // positions. The oracle BRUTE-FORCES the cross product (1.5k×100
    // at sf0.01 — fine for DuckDB, never run by the engine) and the
    // hash gate proves the grid-blocked plan returns EXACTLY the same
    // pairs — the blocking-completeness proof, priced at zero
    // cartesian work engine-side.
    Query(
      "q_geo_join",
      Some(s"""WITH c AS (
                 SELECT c_custkey, ${sqlLat("c_custkey")} AS lat,
                        ${sqlLon("c_custkey")} AS lon
                 FROM customer),
               s AS (
                 SELECT s_suppkey, ${sqlLat("s_suppkey")} AS lat,
                        ${sqlLon("s_suppkey")} AS lon
                 FROM supplier),
               p AS (
                 SELECT c.c_custkey, s.s_suppkey,
                        2.0 * 6371.0088 * asin(sqrt(
                          pow(sin(radians(s.lat - c.lat) / 2.0), 2) +
                          cos(radians(c.lat)) * cos(radians(s.lat)) *
                            pow(sin(radians(s.lon - c.lon) / 2.0), 2)))
                          AS d
                 FROM c CROSS JOIN s)
               SELECT c_custkey, s_suppkey,
                      round(d * 1000.0) / 1000.0 AS dist_km
               FROM p WHERE d <= 500.0
               ORDER BY c_custkey, s_suppkey"""),
      (s, d) => {
        val cust = Tables.customer(s, d).select(
          col("c_custkey"),
          syntheticLat(col("c_custkey")).as("lat"),
          syntheticLon(col("c_custkey")).as("lon"))
        val supp = Tables.supplier(s, d).select(
          col("s_suppkey"),
          syntheticLat(col("s_suppkey")).as("lat"),
          syntheticLon(col("s_suppkey")).as("lon"))
        radiusJoin(cust, supp, 500.0)
          .select(col("l_c_custkey").as("c_custkey"),
            col("r_s_suppkey").as("s_suppkey"), col("dist_km"))
          .orderBy("c_custkey", "s_suppkey")
      }),

    // Nearest supplier per customer via the escalating-radius search.
    // The oracle brute-forces all 150k pairs and takes each
    // customer's (distance, suppkey) argmin — hash-green proves the
    // escalation ladder returns the TRUE global nearest for every
    // customer, including the stragglers that fall through to the
    // final broadcast sweep.
    Query(
      "q_geo_nearest",
      Some(s"""WITH c AS (
                 SELECT c_custkey, ${sqlLat("c_custkey")} AS lat,
                        ${sqlLon("c_custkey")} AS lon
                 FROM customer),
               s AS (
                 SELECT s_suppkey, ${sqlLat("s_suppkey")} AS lat,
                        ${sqlLon("s_suppkey")} AS lon
                 FROM supplier),
               p AS (
                 SELECT c.c_custkey, s.s_suppkey,
                        2.0 * 6371.0088 * asin(sqrt(
                          pow(sin(radians(s.lat - c.lat) / 2.0), 2) +
                          cos(radians(c.lat)) * cos(radians(s.lat)) *
                            pow(sin(radians(s.lon - c.lon) / 2.0), 2)))
                          AS d
                 FROM c CROSS JOIN s)
               SELECT c_custkey, s_suppkey,
                      round(d * 1000.0) / 1000.0 AS dist_km
               FROM p
               QUALIFY row_number() OVER (PARTITION BY c_custkey
                 ORDER BY d, s_suppkey) = 1
               ORDER BY c_custkey"""),
      (s, d) => {
        val cust = Tables.customer(s, d).select(
          col("c_custkey"),
          syntheticLat(col("c_custkey")).as("lat"),
          syntheticLon(col("c_custkey")).as("lon"))
        val supp = Tables.supplier(s, d).select(
          col("s_suppkey"),
          syntheticLat(col("s_suppkey")).as("lat"),
          syntheticLon(col("s_suppkey")).as("lon"))
        nearestJoin(cust, supp, "c_custkey", "s_suppkey")
          .select(col("l_c_custkey").as("c_custkey"),
            col("r_s_suppkey").as("s_suppkey"), col("dist_km"))
          .orderBy("c_custkey")
      }),

    // Proximity clusters at a 150 km cut: connected components of the
    // radius graph (DBSCAN minPts=1), the near-dup cluster machinery
    // on spatial edges. The oracle's recursive CTE computes true
    // reachability over the brute-forced pair set — hash-green pins
    // both the blocked pair graph AND the label-propagation
    // convergence.
    Query(
      "q_geo_clusters",
      Some(s"""WITH RECURSIVE c AS (
                 SELECT c_custkey, ${sqlLat("c_custkey")} AS lat,
                        ${sqlLon("c_custkey")} AS lon
                 FROM customer),
               p AS (
                 SELECT a.c_custkey AS a, b.c_custkey AS b
                 FROM c a JOIN c b ON a.c_custkey < b.c_custkey
                 WHERE 2.0 * 6371.0088 * asin(sqrt(
                         pow(sin(radians(b.lat - a.lat) / 2.0), 2) +
                         cos(radians(a.lat)) * cos(radians(b.lat)) *
                           pow(sin(radians(b.lon - a.lon) / 2.0), 2)))
                       <= 150.0),
               e AS (SELECT a, b FROM p
                     UNION ALL SELECT b AS a, a AS b FROM p),
               reach(id, r) AS (
                 SELECT c_custkey, c_custkey FROM customer
                 UNION
                 SELECT e.b, reach.r FROM reach JOIN e ON e.a = reach.id)
               SELECT id AS c_custkey, min(r) AS cluster_id,
                      (id = min(r)) AS keeper
               FROM reach GROUP BY id ORDER BY c_custkey"""),
      (s, d) => {
        val cust = Tables.customer(s, d).select(
          col("c_custkey"),
          syntheticLat(col("c_custkey")).as("lat"),
          syntheticLon(col("c_custkey")).as("lon"))
        // the 150 km proximity edge set is a materialized spatial
        // graph projection — built + pinned once per (session,
        // corpus) (the tradeGraphE0 stance); the CC sweeps run per
        // call on the stored blocks
        val edges = graft.tools.PlanCache.shared
          .get(s, s"$d#geo:prox-edges:customer:150")(
            graft.tools.Checkpoints.pin(
              radiusJoinRaw(cust, cust, 150.0)
                .filter(col("l_c_custkey") < col("r_c_custkey"))
                .select(col("l_c_custkey").as("a_id"),
                  col("r_c_custkey").as("b_id"))))
        DedupOps.nearDupClusters(edges,
            cust.select(col("c_custkey")), "c_custkey")
          .orderBy("c_custkey")
      }),

    // Customer density + account-balance mass per 5° grid cell — the
    // heatmap aggregate, DECIMAL-exact on the measure.
    Query(
      "q_geo_density",
      Some(s"""WITH c AS (
                 SELECT c_custkey, c_acctbal,
                        ${sqlLat("c_custkey")} AS lat,
                        ${sqlLon("c_custkey")} AS lon
                 FROM customer)
               SELECT CAST(floor(lat / 5.0) AS BIGINT) AS cell_lat,
                      CAST(floor(lon / 5.0) AS BIGINT) AS cell_lon,
                      count(*) AS n,
                      CAST(sum(CAST(c_acctbal AS DECIMAL(18,2)))
                        AS DOUBLE) AS measure_sum
               FROM c GROUP BY 1, 2
               ORDER BY cell_lat, cell_lon"""),
      (s, d) => gridDensity(
        Tables.customer(s, d).select(
          col("c_custkey"), col("c_acctbal"),
          syntheticLat(col("c_custkey")).as("lat"),
          syntheticLon(col("c_custkey")).as("lon")),
        "lat", "lon", "c_acctbal", 5.0))
  )
}
