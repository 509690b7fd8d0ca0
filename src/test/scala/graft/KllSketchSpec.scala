package graft

import graft.functions.Kll
import org.apache.spark.sql.functions._

/** Bounds for the mergeable KLL quantile tier — the
  * no-oracle-by-design gate for q_kll_merge. KLL compaction is
  * randomized, so the pins are the guarantees the sketch actually
  * makes: the stream length `n` is EXACT under any merge shape, and
  * every quantile estimate's true normalized rank lies within the
  * sketch's published rank error (gated at 3× for flake headroom —
  * the library's bound is already the 99%-confidence value).
  */
class KllSketchSpec extends SparkSpec {

  private def lineitem = graft.sources.Tables.lineitem(spark, sfDir)

  /** flag -> sorted extendedprice values (exact reference). */
  private lazy val exact: Map[String, Array[Double]] =
    lineitem.select("l_returnflag", "l_extendedprice").collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).map { case (f, xs) => f -> xs.map(_._2).sorted }

  /** Inclusive normalized rank of v in sorted xs (fraction ≤ v). */
  private def trueRank(xs: Array[Double], v: Double): Double = {
    var lo = 0; var hi = xs.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (xs(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo.toDouble / xs.length
  }

  test("q_kll_merge: one row per returnflag; n_exact is the EXACT " +
    "per-flag count (merge preserves stream length losslessly)") {
    val out = SparkEntry.queries("q_kll_merge")(spark, sfDir).collect()
    assert(out.map(_.getString(0)).toSet === exact.keySet)
    out.foreach { r =>
      assert(r.getLong(1) === exact(r.getString(0)).length.toLong,
        s"n_exact for ${r.getString(0)}")
    }
  }

  test("rank-error guarantee: each estimated quantile's true rank is " +
    "within 3x the sketch's published normalized rank error") {
    val out = SparkEntry.queries("q_kll_merge")(spark, sfDir).collect()
    out.foreach { r =>
      val xs = exact(r.getString(0))
      val tol = 3.0 * r.getDouble(5) + 1.0 / xs.length // + rounding slack
      Seq(0.50 -> r.getDouble(2), 0.95 -> r.getDouble(3),
        0.99 -> r.getDouble(4)).foreach { case (rank, est) =>
        val tr = trueRank(xs, est)
        assert(math.abs(tr - rank) <= tol,
          s"${r.getString(0)} p$rank: est $est has true rank $tr " +
            s"(tol $tol)")
      }
    }
  }

  test("merge ≡ one-shot within bounds: rolling up per-month shard " +
    "sketches answers the same quantiles (to within rank error) as " +
    "sketching each flag's whole stream at once, and n agrees exactly") {
    Kll.register(spark)
    import Kll._
    val oneShot = lineitem.groupBy("l_returnflag")
      .agg(kllSketchAgg(col("l_extendedprice"), 400).as("sk"))
      .select(col("l_returnflag"), kllN(col("sk")).as("n"),
        kllQuantile(col("sk"), lit(0.5)).as("p50"),
        kllError(col("sk")).as("err"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val merged = SparkEntry.queries("q_kll_merge")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    merged.foreach { case (f, (n, p50)) =>
      val (n1, p50one, err) = oneShot(f)
      assert(n === n1, s"$f n")
      val xs = exact(f)
      assert(math.abs(trueRank(xs, p50) - trueRank(xs, p50one)) <=
        2 * (3.0 * err) + 2.0 / xs.length, s"$f p50 merge vs one-shot")
    }
  }

  test("kll_rank inverts kll_quantile: the rank of the estimated " +
    "median is ~0.5, and the pure-SQL surface composes end to end") {
    Kll.register(spark)
    graft.sources.Tables.lineitem(spark, sfDir)
      .createOrReplaceTempView("li_kll")
    val rows = spark.sql(
      """SELECT l_returnflag,
                kll_n(sk) AS n,
                kll_rank(sk, kll_quantile(sk, 0.5d)) AS r50,
                kll_error(sk) AS err
         FROM (SELECT l_returnflag,
                      kll_sketch_agg(CAST(l_extendedprice AS DOUBLE), 400)
                        AS sk
               FROM li_kll GROUP BY l_returnflag)
         ORDER BY l_returnflag""").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) === exact(r.getString(0)).length.toLong)
      assert(math.abs(r.getDouble(2) - 0.5) <= 3.0 * r.getDouble(3) +
        1.0 / r.getLong(1), s"${r.getString(0)} rank(median)")
    }
  }

  test("k domain is validated at [8, 65535]") {
    Kll.register(spark)
    val e = intercept[IllegalArgumentException] {
      Kll.kllSketchAgg(col("x"), 4)
    }
    assert(e.getMessage.contains("KLL k"))
  }
}
