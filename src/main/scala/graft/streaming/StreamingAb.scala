package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming A/B guardrail: the running two-proportion readout of
  * [[graft.operators.StatsOps.abMetrics]] maintained continuously over
  * an assignment/conversion stream — per trigger, one row with both
  * arms' counts, rates, the pooled z, and an |z| ≥ threshold alert
  * flag. The experiment-health monitor that catches a broken
  * assignment path or a catastrophic variant within minutes instead
  * of at the end-of-week readout.
  *
  * Scale shape: ONE global streaming aggregation of conditional
  * sums — Spark's partial aggregation does the heavy lifting
  * map-side, every micro-batch shuffles exactly one partial row per
  * task, and the state store holds a single row of four longs
  * regardless of traffic (no per-key state, no hot-task funnel).
  * Update mode re-emits the row each trigger.
  *
  * Honesty note (scaladoc'd on purpose): the z is the FIXED-HORIZON
  * statistic recomputed continuously, so repeatedly acting on
  * |z| > 1.96 inflates false positives (peeking). The default alert
  * threshold is 3.0 — a guardrail against gross breakage, not a
  * sequential test; [[graft.operators.CurationOps.srmCheck]] and the
  * batch eval tier remain the decision tools.
  */
object StreamingAb {

  /** Per-trigger running readout over a stream with a variant column
    * and a 0/1 conversion column. `aVal`/`bVal` name the two arms
    * (rows outside them are ignored — the q_ab_metrics stance). */
  def monitor(ev: DataFrame, variantCol: String, convertedCol: String,
      aVal: String, bVal: String, zAlert: Double = 3.0): DataFrame = {
    require(zAlert > 0, s"zAlert must be positive; got $zAlert")
    val v = col(variantCol)
    val conv = col(convertedCol).cast("long")
    def armSum(arm: String, c: Column): Column =
      sum(when(v === arm, c).otherwise(lit(0L)))
    val agg = ev.filter(v.isin(aVal, bVal))
      .agg(
        armSum(aVal, lit(1L)).as("n_a"),
        armSum(aVal, conv).as("conv_a"),
        armSum(bVal, lit(1L)).as("n_b"),
        armSum(bVal, conv).as("conv_b"))
    val na = col("n_a").cast("double"); val nb = col("n_b").cast("double")
    val ra = col("conv_a").cast("double") / na
    val rb = col("conv_b").cast("double") / nb
    val p = (col("conv_a") + col("conv_b")).cast("double") /
      (col("n_a") + col("n_b")).cast("double")
    val z = (ra - rb) /
      sqrt(p * (lit(1.0) - p) * (lit(1.0) / na + lit(1.0) / nb))
    val ok = col("n_a") > 0 && col("n_b") > 0 &&
      p > 0.0 && p < 1.0
    agg.select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
      when(col("n_a") > 0, ra).as("rate_a"),
      when(col("n_b") > 0, rb).as("rate_b"),
      when(ok, z).as("z"),
      when(ok, abs(z) >= zAlert).otherwise(lit(false)).as("alert"))
  }
}
