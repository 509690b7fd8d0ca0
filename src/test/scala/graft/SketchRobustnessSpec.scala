package graft

import org.apache.spark.sql.functions._

/** Spill-path robustness for the TypedImperativeAggregate sketch tiers
  * (theta / frequent-items / KLL / reservoir): when ObjectHashAggregate
  * exceeds its in-memory key budget it falls back to SORT-BASED
  * aggregation, which exercises the serialize → sort → deserialize →
  * merge path that a clean in-memory run never touches — exactly what
  * happens on a real executor under memory pressure at 100 TB. A
  * session pinned to fallbackThreshold=2 forces that path on every
  * group and must produce the same answers as the default session. */
class SketchRobustnessSpec extends SparkSpec {

  private def fallbackSession() = {
    val s2 = spark.newSession()
    s2.conf.set(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "2")
    s2
  }

  test("theta / freq / kll / reservoir aggregates produce identical " +
    "exact-regime answers under forced sort-based fallback") {
    val sql =
      s"""SELECT event_type,
                 CAST(round(theta_estimate(theta_sketch_agg(user_id, 12)))
                   AS BIGINT) AS theta_users,
                 kll_n(kll_sketch_agg(CAST(value AS DOUBLE), 200))
                   AS kll_n,
                 reservoir_n(reservoir_agg(user_id, 20)) AS res_n,
                 freq_sketch_estimate(freq_sketch_agg(event_type, 64),
                   event_type) AS freq_self
          FROM parquet.`$sfDir/events.parquet`
          GROUP BY event_type ORDER BY event_type"""
    def run(s: org.apache.spark.sql.SparkSession) = {
      graft.functions.ThetaSketch.register(s)
      graft.functions.FreqSketch.register(s)
      graft.functions.Kll.register(s)
      graft.functions.ReservoirSketch.register(s)
      s.sql(sql).collect().map(_.toSeq).toSeq
    }
    val expected = run(spark)
    val s2 = fallbackSession()
    // sanity: the fallback conf actually engaged in the plan's session
    assert(s2.conf.get(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold") === "2")
    assert(run(s2) === expected)
    // and the exact-regime numbers are right, not just consistent
    val truth = spark.read.parquet(s"$sfDir/events.parquet")
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("d"), count(lit(1)).as("n"))
      .orderBy("event_type").collect()
    expected.zip(truth).foreach { case (got, t) =>
      assert(got(1) === t.getLong(1), s"${t.getString(0)} theta")
      assert(got(2) === t.getLong(2), s"${t.getString(0)} kll_n")
      assert(got(3) === t.getLong(2), s"${t.getString(0)} res_n")
      assert(got(4) === t.getLong(2), s"${t.getString(0)} freq self-count")
    }
  }
}
