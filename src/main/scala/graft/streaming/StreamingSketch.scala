package graft.streaming

import graft.functions.FreqSketch
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming sketches — the live twins of the batch stored-sketch tier.
  *
  * A 100 TB ingest wants "top tokens so far" without keeping every
  * distinct token in streaming state: the exact streaming groupBy's
  * state grows with the vocabulary (unbounded on a Zipf tail), while a
  * frequent-items sketch aggregation keeps ONE ≤maxMapSize sketch as
  * the entire state row — constant bytes at any stream length, with
  * the sketch's NO_FALSE_NEGATIVES guarantee intact because Spark
  * merges partial sketches through the same TypedImperativeAggregate
  * merge path the batch tier uses (`q_topk_tokens_approx`).
  */
object StreamingSketch {

  /** Global frequent-items sketch over a streaming token column:
    * an update/complete-mode aggregation whose single state row is the
    * serialized ItemsSketch. Returns the one-row sketch frame; decode
    * with [[topkOf]] (downstream of the sink — complete-mode output is
    * the full refreshed sketch each micro-batch). */
  def sketchTokens(tokens: DataFrame, tokCol: String,
      maxMapSize: Int = 1024): DataFrame = {
    FreqSketch.register(tokens.sparkSession)
    tokens.groupBy()
      .agg(FreqSketch.freqSketchAgg(col(tokCol), maxMapSize).as("sk"))
  }

  /** Per-group variant: one bounded sketch per group key — state is
    * |groups| × maxMapSize, never |groups| × |vocabulary|. */
  def sketchTokensByGroup(tokens: DataFrame, groupCol: String,
      tokCol: String, maxMapSize: Int = 1024): DataFrame = {
    FreqSketch.register(tokens.sparkSession)
    tokens.groupBy(col(groupCol))
      .agg(FreqSketch.freqSketchAgg(col(tokCol), maxMapSize).as("sk"))
  }

  /** Decode a stored sketch column to (tok, est, lower, upper) rows —
    * batch-side, over a sink table or the complete-mode result. */
  def topkOf(sketches: DataFrame, k: Int): DataFrame = {
    FreqSketch.register(sketches.sparkSession)
    sketches
      .select(sketches.columns.filter(_ != "sk").map(col) :+
        explode(FreqSketch.freqSketchTopK(col("sk"), k)).as("hit"): _*)
      .select(sketches.columns.filter(_ != "sk").map(col) :+
        col("hit.item").as("tok") :+ col("hit.estimate").as("est") :+
        col("hit.lower").as("lower") :+ col("hit.upper").as("upper"): _*)
  }
}
