package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Heavy-tail-safe cumulative counts over a distinct-value table — the
  * shared ECDF/rank spine behind q_ks_test / q_mann_whitney /
  * q_kruskal_wallis / q_qq / q_spearman (and the spearman matrix).
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
  * [min, max]. Each round multiplies resolution by `nBuckets` relative
  * to the spread of the values actually present, so k rounds resolve a
  * dynamic-range ratio of nBuckets^k — two rounds already cover a
  * 6.7e7× outlier stretch, and adjacent distinct doubles separate
  * within ~6 rounds (8192^6 ≈ 2^78 > the 2^64 ulp-range of any
  * practical double column). Convergence is checked, not assumed:
  * rounds past `maxRounds` THROW (the connected-components stance)
  * rather than silently shipping an unbounded sort.
  *
  * Bucket keys are PATHS (`array<int>`, one index per refinement
  * level). Array ordering in Spark is lexicographic and a bucket is
  * either fully re-bucketed or not at all, so path order ≡ value
  * order; the per-bucket offset window orders by the path and the
  * within-bucket window partitions by it. The cumulative sums are
  * bucket-assignment-INVARIANT — any refinement depth produces the
  * same output rows — so this is hash-safe by construction (verified:
  * the five affected oracle hashes did not move when this replaced the
  * single-level spine).
  *
  * Scale shape: one aggregate per refinement round over only the
  * still-oversized buckets' rows (first round scans the distinct
  * table, later rounds shrink geometrically), a broadcast of the
  * ≤(distinct/cap)-row oversized-bucket table, then the usual bounded
  * offset window (one row per bucket) + within-bucket windows with a
  * measured ≤cap partition bound. No sort of the corpus at any step.
  */
object RankSpine {

  /** Within-bucket distinct-count bound. 65536 matches
    * weightedQuantile's final-scope bound: a ≤65536-row sort per
    * window partition is executor-trivial, and the bucket table the
    * offset window sorts stays ≤ distinct/65536 + fan-out rows. */
  val DefaultCap = 65536

  /** Per-level fan-out — weightedQuantile's measured sweet spot. */
  val Fanout = 8192

  private def subBucket(v: Column, lo: Column, hi: Column): Column =
    least(lit(Fanout - 1), greatest(lit(0),
      floor((v - lo) * Fanout / (hi - lo + lit(1e-9))))).cast("int")

  /** Assign every row of a distinct-value table `g` a bucket PATH
    * (`__bkt array<int>`) such that no path holds more than `cap`
    * rows. `g` must be distinct by `valCol` (within each group when
    * `partitionCols` is non-empty — grouped mode runs one independent
    * spine per group, sharing the refinement rounds). All of `g`'s
    * columns pass through. Exposed for the boundedness spec. */
  private[graft] def assignBuckets(g: DataFrame, valCol: String,
      cap: Int = DefaultCap, maxRounds: Int = 16,
      partitionCols: Seq[String] = Nil): DataFrame = {
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
    var round = 0
    var done = false
    while (!done) {
      // one row per (group,) bucket; an oversized bucket always has ≥2
      // distinct values (distinct table ⇒ count>1 ⇔ min<max), so
      // re-bucketing over its own [min,max] strictly separates it
      // the oversized side RENAMES its group keys (__op_i): it shares
      // lineage with `assigned`, so same-named columns would resolve
      // to the same attribute and the group predicate would fold to
      // trivially-true — cross-group refinement leakage
      val oversized = assigned.groupBy(bktKey: _*)
        .agg(count(lit(1)).as("__cnt"), min(v).as("__blo"),
          max(v).as("__bhi"))
        .filter(col("__cnt") > cap)
        .select(partitionCols.zipWithIndex.map { case (c, i) =>
          col(c).as(s"__op_$i") } ++
          Seq(col("__bkt").as("__obkt"), col("__blo"),
            col("__bhi")): _*)
      if (oversized.isEmpty) done = true
      else {
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
    }
    assigned
  }


  /** `g` (distinct by `valCol`) + one INCLUSIVE cumulative-sum column
    * `cumNames(i)` per `countCols(i)`, cumulative in `valCol` order.
    * Two-level: per-bucket offsets via a bounded window over the
    * bucket table (one row per bucket, BoundedWindow-declared), then
    * within-bucket windows with ≤cap rows per partition guaranteed by
    * [[assignBuckets]]. */
  def cumulative(g: DataFrame, valCol: String, countCols: Seq[String],
      cumNames: Seq[String], cap: Int = DefaultCap,
      partitionCols: Seq[String] = Nil): DataFrame = {
    require(countCols.length == cumNames.length,
      "countCols and cumNames must align")
    val assigned = assignBuckets(g, valCol, cap,
      partitionCols = partitionCols)
    val bktKey = partitionCols :+ "__bkt"
    // per-group offset window: one row per bucket, ordered by path.
    // Ungrouped mode keeps the declared-bounded constant key; grouped
    // mode partitions by the group itself (bounded at that group's
    // bucket count).
    val wOff = (if (partitionCols.isEmpty)
        Window.partitionBy(BoundedWindow.key(col("__bkt")))
      else Window.partitionBy(partitionCols.map(col): _*))
      .orderBy("__bkt").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = assigned.groupBy(bktKey.map(col): _*)
      .agg(countCols.head -> "sum",
        countCols.tail.map(c => c -> "sum"): _*)
      .toDF(bktKey ++ countCols.map(c => s"__s_$c"): _*)
      .select(bktKey.map(col) ++ countCols.map(c =>
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
