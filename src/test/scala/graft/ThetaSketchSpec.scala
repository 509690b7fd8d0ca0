package graft

import graft.functions.ThetaSketch
import org.apache.spark.sql.functions._

/** Bounds for the theta-sketch set-operation tier — the
  * no-oracle-by-design gate for q_theta_overlap: exact below nominal
  * capacity, confidence-bounded above it, order-invariant always.
  */
class ThetaSketchSpec extends SparkSpec {
  import spark.implicits._

  private def events = graft.sources.Tables.events(spark, sfDir)

  test("exact regime: per-type estimates, pairwise overlap, A-not-B " +
    "and union all EQUAL the exact distinct counts when cardinality " +
    "is below nominal capacity") {
    val out = SparkEntry.queries("q_theta_overlap")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6))))
    assert(out.length === 10, "5 types -> 10 unordered pairs")
    val users = events.select("event_type", "user_id").distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).toSet }
    out.foreach { case (ta, tb, (ua, ub, ovl, onlyA, tog)) =>
      val (sa, sb) = (users(ta), users(tb))
      assert(ua === sa.size.toLong, s"$ta users")
      assert(ub === sb.size.toLong, s"$tb users")
      assert(ovl === sa.intersect(sb).size.toLong, s"$ta∩$tb")
      assert(onlyA === sa.diff(sb).size.toLong, s"$ta\\$tb")
      assert(tog === sa.union(sb).size.toLong, s"$ta∪$tb")
    }
  }

  test("inclusion-exclusion closes on sketches in the exact regime: " +
    "|A∪B| = |A| + |B| − |A∩B| for every pair") {
    val out = SparkEntry.queries("q_theta_overlap")(spark, sfDir).collect()
    out.foreach { r =>
      assert(r.getLong(6) === r.getLong(2) + r.getLong(3) - r.getLong(4),
        s"${r.getString(0)}/${r.getString(1)}")
    }
  }

  test("order invariance: the sketch is a pure function of the input " +
    "set — repartitioning cannot change a single output bit") {
    ThetaSketch.register(spark)
    def run(parts: Int) = events.repartition(parts)
      .groupBy("event_type")
      .agg(ThetaSketch.thetaSketchAgg(col("user_id"), 12).as("sk"))
      .select(col("event_type"), col("sk"))
      .collect().map(r => r.getString(0) ->
        r.getAs[Array[Byte]](1).toSeq).toMap
    assert(run(3) === run(13))
  }

  test("merge ≡ one-shot: unioning per-day shard sketches yields the " +
    "same sketch bytes as sketching the whole stream at once") {
    ThetaSketch.register(spark)
    val merged = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(ThetaSketch.thetaSketchAgg(col("user_id"), 12).as("sk"))
      .groupBy("event_type")
      .agg(ThetaSketch.thetaUnionAgg(col("sk"), 12).as("sk"))
      .select(col("event_type"),
        ThetaSketch.thetaEstimate(col("sk")).as("est"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val oneShot = events
      .groupBy("event_type")
      .agg(ThetaSketch.thetaSketchAgg(col("user_id"), 12).as("sk"))
      .select(col("event_type"),
        ThetaSketch.thetaEstimate(col("sk")).as("est"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(merged === oneShot)
  }

  test("approximate regime: on a 60k-distinct stream at lgK=10 the " +
    "estimate brackets the truth within the sketch's own 3-sigma " +
    "bounds and within 10% relative error, for base sets AND for an " +
    "intersection") {
    ThetaSketch.register(spark)
    // deterministic overlap structure: A = 0..39999, B = 20000..59999
    val a = (0 until 40000).toDF("id").withColumn("side", lit("a"))
    val b = (20000 until 60000).toDF("id").withColumn("side", lit("b"))
    val sk = a.union(b).repartition(7)
      .groupBy("side")
      .agg(ThetaSketch.thetaSketchAgg(col("id"), 10).as("sk"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    val row = Seq((sk("a"), sk("b"))).toDF("ska", "skb")
      .select(
        ThetaSketch.thetaEstimate(col("ska")).as("ea"),
        ThetaSketch.thetaLb(col("ska"), 3).as("lba"),
        ThetaSketch.thetaUb(col("ska"), 3).as("uba"),
        ThetaSketch.thetaEstimate(
          ThetaSketch.thetaIntersect(col("ska"), col("skb"))).as("eo"),
        ThetaSketch.thetaLb(
          ThetaSketch.thetaIntersect(col("ska"), col("skb")), 3).as("lbo"),
        ThetaSketch.thetaUb(
          ThetaSketch.thetaIntersect(col("ska"), col("skb")), 3).as("ubo"))
      .collect().head
    val (ea, lba, uba) = (row.getDouble(0), row.getDouble(1), row.getDouble(2))
    val (eo, lbo, ubo) = (row.getDouble(3), row.getDouble(4), row.getDouble(5))
    assert(lba <= 40000.0 && 40000.0 <= uba, s"A bounds [$lba,$uba]")
    assert(math.abs(ea - 40000.0) / 40000.0 < 0.10, s"A est $ea")
    assert(lbo <= 20000.0 && 20000.0 <= ubo, s"A∩B bounds [$lbo,$ubo]")
    assert(math.abs(eo - 20000.0) / 20000.0 < 0.10, s"A∩B est $eo")
  }

  test("SQL surface: the injected theta functions compose in pure SQL") {
    val est = spark.sql(
      s"""WITH s AS (
            SELECT event_type,
                   theta_sketch_agg(user_id, 12) AS sk
            FROM parquet.`$sfDir/events.parquet` GROUP BY event_type)
          SELECT CAST(round(theta_estimate(
                   theta_intersect(a.sk, b.sk))) AS BIGINT) AS ovl
          FROM s a JOIN s b ON a.event_type = 'click'
                           AND b.event_type = 'view'""")
      .collect().head.getLong(0)
    val exact = {
      val u = events.select("event_type", "user_id").distinct().collect()
        .map(r => r.getString(0) -> r.getLong(1)).groupBy(_._1)
        .map { case (t, xs) => t -> xs.map(_._2).toSet }
      u("click").intersect(u("view")).size.toLong
    }
    assert(est === exact)
  }

  test("lgK validation: out-of-range lgK is rejected with the rule " +
    "named") {
    val e = intercept[IllegalArgumentException] {
      ThetaSketch.thetaSketchAgg(col("x"), 2)
    }
    assert(e.getMessage.contains("lgK"))
  }
}
