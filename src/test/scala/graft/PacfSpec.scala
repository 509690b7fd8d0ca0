package graft

import graft.operators.EventOps
import java.sql.Timestamp

/** PACF laws: Durbin–Levinson equality against a brute-force driver
  * recomputation from the raw series, the AR(1) cut-off property
  * (lag-1 spike, higher lags near zero), and white-noise flatness. */
class PacfSpec extends SparkSpec {
  import spark.implicits._

  private val hour = 3600000L

  private def toDf(series: Map[String, Seq[Double]]) =
    series.toSeq.flatMap { case (g, xs) =>
      xs.zipWithIndex.map { case (v, i) =>
        (g, new Timestamp(1700000000000L + i * hour), v)
      }
    }.toDF("g", "ts", "value")

  /** Brute-force: full-series-mean autocovariances + textbook D-L. */
  private def brute(xs: Seq[Double], maxLag: Int): Seq[Double] = {
    val n = xs.size
    val mu = xs.sum / n
    def c(k: Int): Double =
      (0 until n - k).map(t => (xs(t) - mu) * (xs(t + k) - mu)).sum
    val rho = (0 to maxLag).map(k => c(k) / c(0))
    val phi = Array.ofDim[Double](maxLag + 1, maxLag + 1)
    val out = Array.ofDim[Double](maxLag + 1)
    phi(1)(1) = rho(1); out(1) = rho(1)
    for (k <- 2 to maxLag) {
      val num = rho(k) -
        (1 until k).map(j => phi(k - 1)(j) * rho(k - j)).sum
      val den = 1.0 -
        (1 until k).map(j => phi(k - 1)(j) * rho(j)).sum
      phi(k)(k) = num / den
      for (j <- 1 until k)
        phi(k)(j) = phi(k - 1)(j) - phi(k)(k) * phi(k - 1)(k - j)
      out(k) = phi(k)(k)
    }
    (1 to maxLag).map(out)
  }

  test("pacf equals the brute-force Durbin-Levinson on a seeded " +
    "series (6-dp render)") {
    val rnd = new scala.util.Random(31)
    val xs = Seq.iterate(0.0, 400)(x =>
      0.6 * x + rnd.nextGaussian()).map(_ + 10.0)
    val got = EventOps.pacf(toDf(Map("a" -> xs)), "g", "ts", "value",
      maxLag = 6).collect()
    val exp = brute(xs, 6)
    assert(got.length === 6)
    got.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Int]("lag") === i + 1)
      assert(math.abs(r.getAs[Double]("pacf") - exp(i)) < 1e-6,
        s"lag ${i + 1}")
    }
  }

  test("AR(1) cuts off after lag 1; white noise is flat; two groups " +
    "are independent") {
    val rnd = new scala.util.Random(7)
    val ar1 = Seq.iterate(0.0, 3000)(x => 0.7 * x + rnd.nextGaussian())
    val wn = Seq.fill(3000)(rnd.nextGaussian())
    val out = EventOps.pacf(toDf(Map("ar" -> ar1, "wn" -> wn)),
      "g", "ts", "value", maxLag = 5).collect()
    val ar = out.filter(_.getString(0) == "ar")
    assert(math.abs(ar.find(_.getAs[Int]("lag") == 1).get
      .getAs[Double]("pacf") - 0.7) < 0.05)
    ar.filter(_.getAs[Int]("lag") >= 2).foreach(r =>
      assert(math.abs(r.getAs[Double]("pacf")) < 0.08, r.toString))
    out.filter(_.getString(0) == "wn").foreach(r =>
      assert(math.abs(r.getAs[Double]("pacf")) < 0.08, r.toString))
    // group isolation: the ar rows match a single-group run exactly
    val solo = EventOps.pacf(toDf(Map("ar" -> ar1)), "g", "ts",
      "value", maxLag = 5).collect()
    assert(ar.map(r => (r.getAs[Int]("lag"), r.getAs[Double]("pacf")))
      .toSeq === solo.map(r => (r.getAs[Int]("lag"),
        r.getAs[Double]("pacf"))).toSeq)
  }
}
