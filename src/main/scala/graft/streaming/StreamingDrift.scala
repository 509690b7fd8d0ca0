package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming distribution-drift monitor: per event-time window, the
  * population stability index of a value column against a FIXED
  * reference profile (the batch q_psi's live twin — the thing a
  * training-data ingest runs so a upstream format change pages a human
  * before it poisons a shard).
  *
  * State shape: the per-window bin profile folds as `nBins` CONDITIONAL
  * SUM COLUMNS inside ONE windowed aggregation (the simhash stance) —
  * no second stateful operator, no per-bin state rows, so streaming
  * state is O(open windows), constant in both corpus and bin count's
  * row-space. Append mode + watermark: a window's PSI emits once, when
  * the watermark closes it.
  *
  * The reference is a tiny immutable array (bin proportions + bounds)
  * computed batch-side by [[referenceProfile]] and baked into the
  * plan as literals — no join, no broadcast table to refresh.
  */
object StreamingDrift {

  /** Laplace-smoothed proportions + [lo, hi] bounds of `valCol` on a
    * BATCH reference corpus — ≤ nBins+2 doubles to the driver (bounded
    * by construction). */
  def referenceProfile(ref: DataFrame, valCol: String, nBins: Int = 10)
      : (Seq[Double], Double, Double) = {
    val v = col(valCol).cast("double")
    val b = ref.agg(min(v).as("lo"), max(v).as("hi")).head()
    val (lo, hi) = (b.getDouble(0), b.getDouble(1))
    val bin = binOf(v, lo, hi, nBins)
    val counts = ref.groupBy(bin.as("bin")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val n = counts.values.sum.toDouble
    val props = (0 until nBins).map(i =>
      (counts.getOrElse(i, 0L) + 0.5) / (n + 0.5 * nBins))
    (props, lo, hi)
  }

  private def binOf(v: Column, lo: Double, hi: Double, nBins: Int): Column =
    least(lit(nBins - 1), greatest(lit(0),
      floor((v - lit(lo)) * nBins / lit(hi - lo + 1e-9)))).cast("int")

  /** Windowed PSI of the stream against the reference profile.
    * Returns (window_start, window_end, n, psi, alert) rows; `alert`
    * fires at the standard 0.25 "investigate" line. Append-mode-safe:
    * exactly one stateful aggregation. */
  def psiStream(events: DataFrame, tsCol: String, valCol: String,
      reference: (Seq[Double], Double, Double),
      windowDur: String = "10 minutes",
      watermark: String = "10 minutes",
      alertAt: Double = 0.25): DataFrame = {
    val (props, lo, hi) = reference
    val nBins = props.size
    val bin = binOf(col(valCol).cast("double"), lo, hi, nBins)
    val sums = (0 until nBins).map(i =>
      sum(when(bin === i, 1L).otherwise(0L)).as(s"__n$i"))
    val agg = events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur))
      .agg(sums.head, sums.tail: _*)
    val n = (0 until nBins).map(i => col(s"__n$i")).reduce(_ + _)
    val psi = (0 until nBins).map { i =>
      val q = (col(s"__n$i").cast("double") + lit(0.5)) /
        (n.cast("double") + lit(0.5 * nBins))
      (lit(props(i)) - q) * log(lit(props(i)) / q)
    }.reduce(_ + _)
    agg.select(
      col("window.start").as("window_start"),
      col("window.end").as("window_end"),
      n.as("n"),
      round(psi * lit(1000000.0)) / lit(1000000.0) as "psi",
      (psi > alertAt).as("alert"))
  }
}
