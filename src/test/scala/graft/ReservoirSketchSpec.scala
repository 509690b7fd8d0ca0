package graft

import graft.functions.ReservoirSketch
import org.apache.spark.sql.functions._

/** Structural guarantees of the mergeable reservoir-sample tier — the
  * no-oracle gate for q_reservoir_sample. The sample is random; what
  * is NOT random and is pinned here: the exact stream length under any
  * merge shape, sample size = min(k, n), membership of every sampled
  * item in the input stream, and (loosely) uniformity of inclusion. */
class ReservoirSketchSpec extends SparkSpec {
  import spark.implicits._

  private def events = graft.sources.Tables.events(spark, sfDir)

  test("q_reservoir_sample: n_exact is the exact per-type row count " +
    "and every sample is full at min(k, n)") {
    val out = SparkEntry.queries("q_reservoir_sample")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getInt(2))).toMap
    val truth = events.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.keySet === truth.keySet)
    out.foreach { case (t, (n, samples)) =>
      assert(n === truth(t), s"$t n")
      assert(samples === math.min(20L, truth(t)).toInt, s"$t samples")
    }
  }

  test("membership: every sampled item is an element of its group's " +
    "stream, through the merge path and through pure SQL") {
    ReservoirSketch.register(spark)
    val rows = spark.sql(
      s"""SELECT event_type, reservoir_items(sk) AS items
          FROM (SELECT event_type, reservoir_union_agg(sk, 20) AS sk
                FROM (SELECT event_type, to_date(ts) AS day,
                             reservoir_agg(user_id, 20) AS sk
                      FROM parquet.`$sfDir/events.parquet`
                      GROUP BY event_type, to_date(ts))
                GROUP BY event_type)""").collect()
    val users = events.select("event_type", "user_id").collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2.toString).toSet }
    rows.foreach { r =>
      val t = r.getString(0)
      val items = r.getSeq[String](1)
      assert(items.nonEmpty && items.forall(users(t).contains),
        s"$t: sampled items must come from the stream")
    }
  }

  test("merge preserves n exactly: sharded rollup and one-shot " +
    "reservoir report the same stream length") {
    ReservoirSketch.register(spark)
    import ReservoirSketch._
    val oneShot = events.groupBy("event_type")
      .agg(reservoirN(reservoirAgg(col("user_id"), 20)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sharded = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(reservoirAgg(col("user_id"), 20).as("sk"))
      .groupBy("event_type")
      .agg(reservoirN(reservoirUnionAgg(col("sk"), 20)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(oneShot === sharded)
  }

  test("uniformity (loose): over repeated independent draws from a " +
    "1..200 stream, inclusion frequencies have no gross bias — " +
    "every item lands within a generous band of the expected rate") {
    ReservoirSketch.register(spark)
    import ReservoirSketch._
    val df = (1 to 200).toDF("v").repartition(4)
    val hits = scala.collection.mutable.Map.empty[String, Int]
      .withDefaultValue(0)
    val draws = 60
    (1 to draws).foreach { _ =>
      // each aggregation re-runs the randomized reservoir
      df.agg(reservoirItems(reservoirAgg(col("v"), 20)).as("it"))
        .head().getSeq[String](0)
        .foreach(i => hits(i) += 1)
    }
    // expected inclusion rate k/n = 0.1 → 6 of 60 draws; a fair
    // reservoir leaves no item at zero or near-certain inclusion
    assert(hits.values.sum === draws * 20)
    assert(hits.size > 150, s"only ${hits.size} distinct items sampled")
    assert(hits.values.max < draws / 2,
      s"an item was drawn ${hits.values.max}/$draws times")
  }

  test("empty groups serialize: a reservoir over zero rows reports " +
    "n=0 and no items") {
    ReservoirSketch.register(spark)
    import ReservoirSketch._
    val out = events.filter(lit(false))
      .agg(reservoirN(reservoirAgg(col("user_id"), 20)).as("n"),
        size(reservoirItems(reservoirAgg(col("user_id"), 20))).as("s"))
      .head()
    assert(out.getLong(0) === 0L && out.getInt(1) === 0)
  }

  test("k domain is validated") {
    val e = intercept[IllegalArgumentException] {
      ReservoirSketch.reservoirAgg(col("x"), 1)
    }
    assert(e.getMessage.contains("reservoir k"))
  }
}
