package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** Zipf-exponent MLE laws: recovery of a planted discrete power law,
  * and the fmin screen (sub-threshold singletons are counted in the
  * corpus totals but never in the fit). */
class ZipfSpec extends SparkSpec {
  import spark.implicits._

  private def corpusOf(freqs: Seq[Int]) =
    freqs.zipWithIndex
      .map { case (f, i) => Seq.fill(f)(s"t$i").mkString(" ") }
      .toDF("text")

  test("recovers a planted power-law exponent within tolerance") {
    // inverse-CDF Pareto-above-xmin sample of P(f) ∝ f^-2.5 with
    // xmin = fmin = 2: f_k = floor(2·(1-u_k)^(-1/1.5)) — every draw is
    // already ≥ fmin, so the clamp never distorts the tail and the
    // (fmin - 0.5) continuity correction absorbs the floor()
    val alpha = 2.5
    val freqs = (1 to 4000).map { k =>
      val u = (k - 0.5) / 4000.0
      math.floor(2.0 * math.pow(1.0 - u, -1.0 / (alpha - 1))).toInt
    }
    val got = TextOps.zipfAlpha(corpusOf(freqs), "text")
      .collect()(0).getAs[Double]("alpha")
    assert(math.abs(got - alpha) < 0.3, s"planted $alpha, got $got")
  }

  test("singletons below fmin inflate the corpus totals but leave the " +
    "fitted exponent untouched") {
    val base = (1 to 500).map(k => 2 + k % 30)
    val a1 = TextOps.zipfAlpha(corpusOf(base), "text").collect()(0)
    val withSingles = corpusOf(base)
      .union(corpusOf(Seq.fill(300)(1)).select(
        concat(lit("s_"), monotonically_increasing_id().cast("string"))
          .as("text")))
    val a2 = TextOps.zipfAlpha(withSingles, "text").collect()(0)
    assert(a1.getAs[Double]("alpha") === a2.getAs[Double]("alpha"))
    assert(a2.getAs[Long]("n_types") === a1.getAs[Long]("n_types") + 300)
    assert(a2.getAs[Long]("n_fit") === a1.getAs[Long]("n_fit"))
  }
}
