package graft

import graft.functions.Geohash
import graft.operators.GeoOps
import org.apache.spark.sql.functions._

/** Laws for the geo tier: geohash encode against the public test
  * vectors and the textbook bisection reference, the prefix-nesting
  * property that makes truncation a grid cell, and radius-join
  * completeness against brute force — including the antimeridian seam
  * the oracle gate caught on first contact. */
class GeoSpec extends SparkSpec {
  import spark.implicits._

  // -- geohash -------------------------------------------------------

  test("geohash matches the public reference vectors at several " +
    "precisions") {
    // (lat, lon, precision, expected) — the canonical vectors from the
    // original geohash.org service and the Wikipedia article.
    val vectors = Seq(
      (57.64911, 10.40744, 11, "u4pruydqqvj"),
      (42.605, -5.603, 5, "ezs42"),
      (37.8324, 112.5584, 9, "ww8p1r4t8"),
      (-25.382708, -49.265506, 8, "6gkzwgjz"),
      (0.0001, 0.0001, 7, "s000000"))
    vectors.foreach { case (lat, lon, p, want) =>
      // the engine spelling (Morton interleave over builtins)
      val got = Seq((lat, lon)).toDF("lat", "lon")
        .select(Geohash.geohash(col("lat"), col("lon"), p))
        .head().getString(0)
      assert(got === want, s"($lat, $lon) @ $p")
      // the independent bisection reference agrees too
      assert(Geohash.encodeRef(lat, lon, p) === want)
      // and decode lands inside the claimed cell (re-encode fixes it)
      val (dlat, dlon) = Geohash.decodeRef(want)
      assert(Geohash.encodeRef(dlat, dlon, p) === want)
    }
  }

  test("geohash agrees with the bisection reference on md5-derived " +
    "generic coordinates, nests by prefix, and the SQL spelling " +
    "matches the Column spelling") {
    val pts = spark.range(1, 301)
      .select(col("id"),
        GeoOps.syntheticLat(col("id")).as("lat"),
        GeoOps.syntheticLon(col("id")).as("lon"))
      .cache()
    val rows = pts
      .select(col("lat"), col("lon"),
        Geohash.geohash(col("lat"), col("lon"), 9).as("g9"),
        Geohash.geohash(col("lat"), col("lon"), 5).as("g5"),
        Geohash.geohash(col("lat"), col("lon"), 4).as("g4"))
      .collect()
    rows.foreach { r =>
      val (lat, lon) = (r.getDouble(0), r.getDouble(1))
      assert(r.getString(2) === Geohash.encodeRef(lat, lon, 9))
      // prefix nesting: truncating the key IS coarsening the grid
      assert(r.getString(2).startsWith(r.getString(3)))
      assert(r.getString(3).startsWith(r.getString(4)))
    }
    val viaSql = pts.selectExpr("geohash(lat, lon, 9) AS g")
      .collect().map(_.getString(0))
    assert(viaSql.toSeq === rows.map(_.getString(2)).toSeq)
  }

  // -- radius join ---------------------------------------------------

  test("radiusJoin returns exactly the brute-force pair set, " +
    "including pairs straddling the antimeridian") {
    val rnd = new scala.util.Random(7)
    // a generic scatter plus deliberate clusters hugging ±180°
    val ls = (1 to 150).map(i =>
      (i.toLong, rnd.nextDouble() * 140 - 70, rnd.nextDouble() * 360 - 180)) ++
      (151 to 170).map(i =>
        (i.toLong, rnd.nextDouble() * 20 - 10, 179.0 + rnd.nextDouble()))
    val rs = (1 to 60).map(i =>
      (i.toLong, rnd.nextDouble() * 140 - 70, rnd.nextDouble() * 360 - 180)) ++
      (61 to 75).map(i =>
        (i.toLong, rnd.nextDouble() * 20 - 10, -180.0 + rnd.nextDouble()))
    val left = ls.toDF("id", "lat", "lon")
    val right = rs.toDF("id", "lat", "lon")
    def hav(lat1: Double, lon1: Double, lat2: Double, lon2: Double) = {
      val dLat = math.toRadians(lat2 - lat1) / 2
      val dLon = math.toRadians(lon2 - lon1) / 2
      2 * 6371.0088 * math.asin(math.sqrt(
        math.pow(math.sin(dLat), 2) +
          math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
            math.pow(math.sin(dLon), 2)))
    }
    Seq(300.0, 800.0).foreach { radius =>
      val brute = (for {
        (li, la1, lo1) <- ls
        (ri, la2, lo2) <- rs
        if hav(la1, lo1, la2, lo2) <= radius
      } yield (li, ri)).toSet
      val got = GeoOps.radiusJoin(left, right, radius)
        .select("l_id", "r_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === brute, s"radius $radius")
      // the seam clusters MUST produce cross-seam matches for the test
      // to mean anything
      if (radius >= 300.0)
        assert(brute.exists { case (li, ri) => li > 150 && ri > 60 },
          "fixture failed to produce antimeridian pairs")
    }
  }

  test("nearestJoin returns each left point's TRUE global nearest — " +
    "matching brute force through every escalation stage including " +
    "the far-straggler broadcast sweep") {
    val rnd = new scala.util.Random(11)
    // a dense cluster (stage-1 matches), a mid ring (stage 2/3), and
    // isolated far points that must fall through to the brute sweep
    val ls = (1 to 80).map(i =>
      (i.toLong, rnd.nextDouble() * 10, rnd.nextDouble() * 10)) ++
      (81 to 100).map(i =>
        (i.toLong, rnd.nextDouble() * 140 - 70,
          rnd.nextDouble() * 360 - 180))
    val rs = (1 to 10).map(i =>
      (i.toLong, rnd.nextDouble() * 10, rnd.nextDouble() * 10))
    import spark.implicits._
    val left = ls.toDF("id", "lat", "lon")
    val right = rs.toDF("id", "lat", "lon")
    def hav(lat1: Double, lon1: Double, lat2: Double, lon2: Double) = {
      val dLat = math.toRadians(lat2 - lat1) / 2
      val dLon = math.toRadians(lon2 - lon1) / 2
      2 * 6371.0088 * math.asin(math.sqrt(
        math.pow(math.sin(dLat), 2) +
          math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
            math.pow(math.sin(dLon), 2)))
    }
    val brute = ls.map { case (li, la, lo) =>
      li -> rs.map { case (ri, rla, rlo) =>
        (hav(la, lo, rla, rlo), ri)
      }.min._2
    }.toMap
    val got = GeoOps.nearestJoin(left, right, "id", "id",
        radii = Seq(200.0, 1500.0))
      .select("l_id", "r_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet === ls.map(_._1).toSet,
      "every left point gets exactly one nearest")
    assert(got === brute)
  }

  test("radiusJoin carries no duplicate pairs when the radius is so " +
    "large the longitude circle has few cells") {
    val left = Seq((1L, 10.0, 179.5), (2L, -5.0, -179.5))
      .toDF("id", "lat", "lon")
    val right = Seq((10L, 11.0, -179.8), (11L, 60.0, 0.0))
      .toDF("id", "lat", "lon")
    // 4000 km → 360/(4000/24) = 2 lon cells; modular offsets dedup
    val got = GeoOps.radiusJoin(left, right, 4000.0)
      .select("l_id", "r_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.distinct.size === got.size)
    assert(got.toSet.contains((1L, 10L)))
  }
}
