package graft

import graft.functions.VarOptSketch
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Structural + statistical guarantees of the VarOpt weighted-sample
  * tier — the no-oracle gate for q_varopt_sample. Pinned exactly:
  * stream length and TOTAL adjusted weight under any merge shape,
  * membership, exact-regime fidelity (n ≤ k keeps every item with its
  * raw weight). Pinned statistically: subset-weight estimates from
  * the sample track the true subset weight. */
class VarOptSketchSpec extends SparkSpec {
  import spark.implicits._

  private def events = graft.sources.Tables.events(spark, sfDir)
    .filter(col("value") > 0)

  test("q_varopt_sample: n_exact is the exact per-type positive-value " +
    "row count, samples are full at min(k, n), and w_total equals the " +
    "exact total event value per type") {
    val out = SparkEntry.queries("q_varopt_sample")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getInt(2), r.getDouble(3))).toMap
    val truth = events.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("w"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    assert(out.keySet === truth.keySet)
    out.foreach { case (t, (n, samples, w)) =>
      assert(n === truth(t)._1, s"$t n")
      assert(samples === math.min(20L, truth(t)._1).toInt, s"$t samples")
      // total adjusted weight telescopes to the exact input sum
      assert(math.abs(w - truth(t)._2) <= 0.05 + 1e-9 * truth(t)._2,
        s"$t w_total $w vs ${truth(t)._2}")
    }
  }

  test("exact regime: with k >= group size every item is retained " +
    "with its RAW weight, through the shard-union merge path") {
    VarOptSketch.register(spark)
    import VarOptSketch._
    val df = Seq(("g", "a", 1.0), ("g", "b", 2.5), ("g", "c", 4.0),
      ("h", "x", 10.0)).toDF("grp", "item", "w")
    val out = df.groupBy(col("grp"), col("item"))
      .agg(varoptAgg(col("item"), col("w"), 8).as("sk"))
      .groupBy("grp")
      .agg(varoptUnionAgg(col("sk"), 8).as("sk"))
      .select(col("grp"), explode(varoptSamples(col("sk"))).as("s"))
      .select(col("grp"), col("s.item"), col("s.weight"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(out === Map(("g", "a") -> 1.0, ("g", "b") -> 2.5,
      ("g", "c") -> 4.0, ("h", "x") -> 10.0))
  }

  test("subset estimation: over repeated draws the sampled weight of " +
    "a 10%-of-weight subset tracks its true share") {
    VarOptSketch.register(spark)
    import VarOptSketch._
    // 200 items; items 1..20 carry weight 10, the rest weight ~1.11 —
    // subset {1..20} holds 200/400 = 50% of total weight
    val df = (1 to 200).map(i =>
      (s"i$i", if (i <= 20) 10.0 else 200.0 / 180.0)).toDF("item", "w")
      .repartition(4)
    val draws = 40
    var est = 0.0
    (1 to draws).foreach { _ =>
      val rows = df.agg(varoptSamples(
        varoptAgg(col("item"), col("w"), 24)).as("s"))
        .select(explode(col("s")).as("x"))
        .select(col("x.item"), col("x.weight"))
        .collect()
      est += rows.filter(r => r.getString(0).stripPrefix("i").toInt <= 20)
        .map(_.getDouble(1)).sum
    }
    val mean = est / draws
    assert(math.abs(mean - 200.0) < 30.0,
      s"mean subset estimate $mean vs true 200.0")
  }

  test("non-positive weights are skipped and k is validated") {
    VarOptSketch.register(spark)
    import VarOptSketch._
    val df = Seq(("a", 1.0), ("b", -2.0), ("c", 0.0)).toDF("item", "w")
    val n = df.agg(varoptN(varoptAgg(col("item"), col("w"), 4)).as("n"))
      .head().getLong(0)
    assert(n === 1L, "only the positive-weight item enters")
    assert(intercept[IllegalArgumentException] {
      VarOptSketch.varoptAgg(col("x"), col("w"), 1)
    }.getMessage.contains("varopt k"))
  }
}
