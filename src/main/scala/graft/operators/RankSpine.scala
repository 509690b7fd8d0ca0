package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Heavy-tail-safe cumulative counts over a distinct-value table — the
  * shared ECDF/rank spine behind q_ks_test / q_mann_whitney /
  * q_kruskal_wallis / q_qq / q_spearman (and the spearman matrix),
  * plus the model-eval folds (q_auc / q_pr_auc / q_threshold_sweep)
  * and the grouped consumers (q_rank_normalize, q_auc_by).
  *
  * The single-level fixed-width spine those queries shipped with in
  * round 13 buckets the distinct values into equal-width cells between
  * the GLOBAL min and max. That degrades exactly the way the engine
  * already measured on the Theil–Sen slope table (BASELINE.md
  * §weightedMedian-iterative: 725k of 2.89M values in ONE of 8192
  * cells): on a heavy-tailed column the range is set by outliers, the
  * mass concentrates, and the "bounded" within-bucket window is a
  * single-partition sort of the distinct set in disguise.
  *
  * The fix is the same move `weightedQuantile` made (StatsOps.scala),
  * adapted from "narrow to one crossing bucket" to "keep ALL buckets
  * bounded": iteratively RE-BUCKET any bucket whose distinct count
  * exceeds `cap`, equal-width over that bucket's OWN observed
  * [min, max]. The sub-bucket width is SPAN-RELATIVE
  * (span/Fanout + a span-scaled guard — see [[subBucket]]), so each
  * round multiplies resolution by `Fanout` relative to the values
  * actually present AT ANY MAGNITUDE: a bucket of adjacent distinct
  * doubles separates as soon as its span reaches ulp scale, because
  * the min and max of an oversized bucket always land ≥ Fanout/2
  * sub-buckets apart. (The r14 spine added an ABSOLUTE 1e-9 to the
  * denominator, which capped resolution at ~1e-13 and stalled — loud
  * throw, not wrong answers — on >cap distinct values packed below
  * that scale; VERDICT r14 item 1.) Convergence is checked, not
  * assumed: rounds past `maxRounds` THROW (the connected-components
  * stance) rather than silently shipping an unbounded sort.
  *
  * Bucket keys are PATHS (`array<int>`, one index per refinement
  * level). Array ordering in Spark is lexicographic and a bucket is
  * either fully re-bucketed or not at all, so path order ≡ value
  * order; the per-bucket offset window orders by the path and the
  * within-bucket window partitions by it. The cumulative sums are
  * bucket-assignment-INVARIANT — any refinement depth produces the
  * same output rows — so this is hash-safe by construction (verified:
  * the affected oracle hashes did not move when this replaced the
  * single-level spine, nor when the epsilon went relative).
  *
  * Scale shape: ONE pinned per-bucket aggregate per refinement round
  * over the assigned table (later rounds' oversized fraction shrinks
  * geometrically), with the convergence check AND the offset sums
  * riding the same aggregate — a round-0-clean spine pays exactly the
  * one per-bucket aggregate [[cumulative]]'s offset window needs
  * anyway, zero extra jobs (VERDICT r14 item 5; the r14 spine ran the
  * oversize check as its own full-scan job every round). Then the
  * usual bounded offset window (one row per bucket) + within-bucket
  * windows with a measured ≤cap partition bound. No sort of the
  * corpus at any step.
  */
object RankSpine {

  /** Within-bucket distinct-count bound. 65536 matches
    * weightedQuantile's final-scope bound: a ≤65536-row sort per
    * window partition is executor-trivial, and the bucket table the
    * offset window sorts stays ≤ distinct/65536 + fan-out rows. */
  val DefaultCap = 65536

  /** Per-level fan-out — weightedQuantile's measured sweet spot. */
  val Fanout = 8192

  /** Equal-width sub-bucket of `v` within [lo, hi]. The denominator
    * guard is RELATIVE to the span (span·1e-12, floored at the
    * smallest positive double so a zero-span constant bucket divides
    * cleanly to 0 instead of 0/0): per-round resolution stays
    * ~span/Fanout at any magnitude, including subnormal spans —
    * adjacent distinct doubles a < b give bucket(b) ≥ Fanout/2 while
    * bucket(a) = 0, so an oversized bucket's min and max ALWAYS
    * separate and refinement makes strict progress. */
  private def subBucket(v: Column, lo: Column, hi: Column): Column = {
    val span = hi - lo
    least(lit(Fanout - 1), greatest(lit(0),
      floor((v - lo) * Fanout /
        (span + greatest(span * lit(1e-12),
          lit(java.lang.Double.MIN_VALUE)))))).cast("int")
  }

  /** Assign every row of a distinct-value table `g` a bucket PATH
    * (`__bkt array<int>`) such that no path holds more than `cap`
    * rows. `g` must be distinct by `valCol` (within each group when
    * `partitionCols` is non-empty — grouped mode runs one independent
    * spine per group, sharing the refinement rounds). All of `g`'s
    * columns pass through. Exposed for the boundedness spec. */
  private[graft] def assignBuckets(g: DataFrame, valCol: String,
      cap: Int = DefaultCap, maxRounds: Int = 16,
      partitionCols: Seq[String] = Nil): DataFrame =
    assignWithSums(g, valCol, cap, maxRounds, partitionCols, Nil)._1

  /** The refinement loop shared by [[assignBuckets]] and
    * [[cumulative]]: returns the assigned rows AND the final pinned
    * per-(group, bucket) aggregate — `__cnt`, `__blo`, `__bhi`, plus
    * `__s_<c>` = sum(c) for each of `sumCols`. The oversize check
    * rides this aggregate (a filter over the pinned small table, not
    * a second scan of `assigned`), and [[cumulative]]'s offset window
    * consumes the same table, so a round-0-clean spine runs exactly
    * one aggregation job. */
  private def assignWithSums(g: DataFrame, valCol: String, cap: Int,
      maxRounds: Int, partitionCols: Seq[String],
      sumCols: Seq[String]): (DataFrame, DataFrame) = {
    val v = col(valCol)
    val pCols = partitionCols.map(col)
    var assigned =
      if (partitionCols.isEmpty) {
        val bounds = g.agg(min(v).as("__lo"), max(v).as("__hi"))
        g.crossJoin(broadcast(bounds))
          .withColumn("__bkt",
            array(subBucket(v, col("__lo"), col("__hi"))))
          .drop("__lo", "__hi")
      } else {
        // per-group [min,max]: #groups rows, broadcast back
        val bounds = g.groupBy(pCols: _*)
          .agg(min(v).as("__lo"), max(v).as("__hi"))
        g.join(broadcast(bounds), partitionCols)
          .withColumn("__bkt",
            array(subBucket(v, col("__lo"), col("__hi"))))
          .drop("__lo", "__hi")
      }
    val bktKey = pCols :+ col("__bkt")
    val aggCols = Seq(count(lit(1)).as("__cnt"), min(v).as("__blo"),
      max(v).as("__bhi")) ++
      sumCols.map(c => sum(col(c)).as(s"__s_$c"))
    var round = 0
    while (true) {
      // one row per (group,) bucket, pinned: the oversize filter and
      // (on the final round) the offset window both read the stored
      // blocks instead of re-scanning `assigned`
      val bkts = graft.tools.Checkpoints.pin(
        assigned.groupBy(bktKey: _*).agg(aggCols.head, aggCols.tail: _*))
      // an oversized bucket always has ≥2 distinct values (distinct
      // table ⇒ count>1 ⇔ min<max), so re-bucketing over its own
      // [min,max] strictly separates it
      // the oversized side RENAMES its group keys (__op_i): it shares
      // lineage with `assigned`, so same-named columns would resolve
      // to the same attribute and the group predicate would fold to
      // trivially-true — cross-group refinement leakage
      val oversized = bkts.filter(col("__cnt") > cap)
        .select(partitionCols.zipWithIndex.map { case (c, i) =>
          col(c).as(s"__op_$i") } ++
          Seq(col("__bkt").as("__obkt"), col("__blo"),
            col("__bhi")): _*)
      if (oversized.isEmpty) return (assigned, bkts)
      round += 1
      if (round > maxRounds) throw new IllegalStateException(
        s"RankSpine: bucket refinement did not converge to ≤$cap " +
          s"distinct values per bucket within $maxRounds rounds — " +
          "pathological value distribution; raise cap or maxRounds")
      assigned = graft.tools.Checkpoints.pin(
        assigned.join(broadcast(oversized),
            partitionCols.zipWithIndex
              .foldLeft(col("__bkt") === col("__obkt")) {
                case (cond, (pc, i)) =>
                  cond && col(pc) === col(s"__op_$i")
              }, "left")
          .withColumn("__bkt",
            when(col("__obkt").isNotNull,
              concat(col("__bkt"),
                array(subBucket(v, col("__blo"), col("__bhi")))))
              .otherwise(col("__bkt")))
          .drop("__obkt" +: "__blo" +: "__bhi" +:
            partitionCols.indices.map(i => s"__op_$i"): _*))
    }
    throw new IllegalStateException("unreachable")
  }


  /** `g` (distinct by `valCol`) + one INCLUSIVE cumulative-sum column
    * `cumNames(i)` per `countCols(i)`, cumulative in `valCol` order.
    * Two-level: per-bucket offsets via a bounded window over the
    * bucket table [[assignWithSums]] already pinned (one row per
    * bucket, BoundedWindow-declared), then within-bucket windows with
    * ≤cap rows per partition guaranteed by the refinement loop. */
  def cumulative(g: DataFrame, valCol: String, countCols: Seq[String],
      cumNames: Seq[String], cap: Int = DefaultCap,
      partitionCols: Seq[String] = Nil): DataFrame = {
    require(countCols.length == cumNames.length,
      "countCols and cumNames must align")
    val (assigned, bkts) = assignWithSums(g, valCol, cap,
      maxRounds = 16, partitionCols, countCols)
    val bktKey = partitionCols :+ "__bkt"
    // per-group offset window: one row per bucket, ordered by path.
    // Ungrouped mode keeps the declared-bounded constant key; grouped
    // mode partitions by the group itself (bounded at that group's
    // bucket count).
    val wOff = (if (partitionCols.isEmpty)
        Window.partitionBy(BoundedWindow.key(col("__bkt")))
      else Window.partitionBy(partitionCols.map(col): _*))
      .orderBy("__bkt").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bkts.select(bktKey.map(col) ++ countCols.map(c =>
      coalesce(sum(col(s"__s_$c")).over(wOff), lit(0L))
        .as(s"__off_$c")): _*)
    val wIn = Window.partitionBy(bktKey.map(col): _*).orderBy(valCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCums = countCols.zip(cumNames).foldLeft(
      assigned.join(broadcast(offsets), bktKey)) {
        case (d, (c, name)) =>
          d.withColumn(name, col(s"__off_$c") + sum(col(c)).over(wIn))
      }
    withCums.drop("__bkt" +: countCols.map(c => s"__off_$c"): _*)
  }
}
