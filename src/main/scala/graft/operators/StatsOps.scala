package graft.operators

import graft.Query
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Decision-analytics tier: multi-objective frontier extraction
  * (skyline), robust statistics (winsorized means), and experiment
  * readouts (two-proportion A/B z-test) — the "which rows matter and is
  * the difference real" questions a warehouse answers daily, each with
  * an exact DuckDB oracle.
  *
  * Everything here is declarative DataFrame code: Catalyst plans it,
  * the shuffles are keyed hash-aggregations, and the only global sorts
  * run over provably tiny inputs (a 256-row bucket table, the frontier
  * candidate set) declared via [[BoundedWindow.key]].
  */
object StatsOps {

  /** 2-D Pareto frontier (skyline) of distinct `(x, y)` points, both
    * dimensions maximized: a point survives iff no other point is ≥ in
    * both dimensions and > in at least one.
    *
    * Scale design — prune-then-verify, never all-pairs:
    *  1. PREFILTER: points bucket by `x` into 256 coarse ranges (the
    *     min/max ride along as a broadcast 1-row aggregate — no driver
    *     `.collect()`). For each bucket the running max of `y` over
    *     strictly-HIGHER buckets (a 256-row bounded window) dominates
    *     everything at or below it: any point with `y ≤` that max
    *     loses to some strictly-richer point and is dropped in one
    *     codegen'd pass. A within-bucket staircase window (partitioned
    *     by bucket — scales out) removes bucket-local dominated points
    *     too.
    *  2. VERIFY: the survivors — the union of 256 bucket staircases,
    *     already cross-bucket pruned — run the exact sort-scan: order
    *     by `(x DESC, y DESC)`, keep a point iff its `y` strictly
    *     exceeds the running max of all preceding rows. This stage is
    *     O(|candidates|), and |candidates| is output-bounded in the
    *     anti-correlated worst case (when the frontier itself is the
    *     answer, no algorithm returns less); on correlated real data
    *     it is a few rows per bucket. The window is global on purpose
    *     and declared via [[BoundedWindow.key]].
    *
    * The prefilter can never drop a frontier point (a strictly-higher-
    * bucket point with `y ≥` yours dominates you by definition), and a
    * skyline over any dominated-point-free superset of the frontier
    * equals the frontier — so the two phases compose exactly; the
    * DuckDB oracle runs the one-pass sort-scan over ALL points and
    * must agree row-for-row. */
  def skyline(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val pts = df.select(col(xCol).as("x"), col(yCol).as("y")).distinct()
    val bounds = pts.agg(min(col("x").cast("double")).as("xmin"),
      max(col("x").cast("double")).as("xmax"))
    val bucketed = pts.crossJoin(broadcast(bounds))
      .withColumn("bkt",
        least(lit(255), greatest(lit(0),
          floor((col("x").cast("double") - col("xmin")) * 256.0 /
            (col("xmax") - col("xmin") + lit(1e-9))))).cast("int"))
      .drop("xmin", "xmax")
    // per-bucket max y, then the max over strictly higher buckets —
    // a ≤256-row table, bounded by construction
    val bmax = bucketed.groupBy("bkt").agg(max("y").as("by"))
    val hmax = bmax.withColumn("hmax",
      max(col("by")).over(
        Window.partitionBy(BoundedWindow.key(col("bkt")))
          .orderBy(col("bkt").desc)
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("bkt"), col("hmax"))
    // cross-bucket prune + within-bucket staircase (partitioned window)
    val wb = Window.partitionBy("bkt")
      .orderBy(col("x").desc, col("y").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val survivors = bucketed
      .join(broadcast(hmax), "bkt")
      .filter(col("hmax").isNull || col("y") > col("hmax"))
      .withColumn("bmax", max(col("y")).over(wb))
      .filter(col("bmax").isNull || col("y") > col("bmax"))
      .select("x", "y")
    // exact pass over the candidate set — global window, bounded by
    // the prune (worst case = the frontier itself, i.e. the output)
    val wg = Window.partitionBy(BoundedWindow.key(col("x")))
      .orderBy(col("x").desc, col("y").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    survivors
      .withColumn("mx", max(col("y")).over(wg))
      .filter(col("mx").isNull || col("y") > col("mx"))
      .select("x", "y")
  }

  /** Per-group winsorized mean: clamp values at the group's discrete
    * p05/p95 (actual data values — `percentile_disc`, so no
    * interpolation arithmetic can drift cross-engine) and average the
    * clamped column. The robust-mean twin of plain `avg` — one
    * outlier-heavy supplier no longer owns the group statistic.
    *
    * Scale: one pass for the two discrete percentiles per group (≤
    * |groups| rows, broadcast back), one clamped-aggregate pass —
    * both map-side-combined hash aggregations; sums run in
    * DECIMAL(18,2)-exact cents so partial-agg order can't perturb the
    * 6-dp mean. */
  def winsorizedMean(df: DataFrame, groupCol: String, valCol: String,
      lo: Double = 0.05, hi: Double = 0.95): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi, s"bad bounds [$lo, $hi]")
    val cuts = df.groupBy(col(groupCol))
      .agg(
        expr(s"percentile_disc($lo) WITHIN GROUP (ORDER BY $valCol)")
          .as("p_lo"),
        expr(s"percentile_disc($hi) WITHIN GROUP (ORDER BY $valCol)")
          .as("p_hi"))
    df.join(broadcast(cuts), groupCol)
      .select(col(groupCol),
        least(greatest(col(valCol), col("p_lo")), col("p_hi")).as("w"),
        col(valCol).as("v"), col("p_lo"), col("p_hi"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        // DECIMAL-exact clamp bounds, DOUBLE render (§7.6)
        min("p_lo").cast("decimal(18,2)").cast("double").as("p_lo"),
        max("p_hi").cast("decimal(18,2)").cast("double").as("p_hi"),
        (round(sum(col("v").cast("decimal(18,2)")).cast("double")
          / count(lit(1)) * lit(1000000.0)) / lit(1000000.0))
          .as("mean_raw"),
        (round(sum(col("w").cast("decimal(18,2)")).cast("double")
          / count(lit(1)) * lit(1000000.0)) / lit(1000000.0))
          .as("mean_wins"))
  }

  /** Two-proportion A/B readout: deterministic 50/50 variant
    * assignment from the md5 hash draw (the q_split_assign
    * primitive — no RNG state, reproducible across engines and
    * retries), per-variant conversion counts, and the pooled
    * two-proportion z statistic `(p_A − p_B) / √(p̂(1−p̂)(1/n_A+1/n_B))`
    * repeated on both rows.
    *
    * Scale: conversion is a `max(flag)` grouped by unit — one shuffle
    * keyed on the unit id; the per-variant rollup is 2 rows, and the z
    * arithmetic runs on broadcast scalars. Everything up to the final
    * division is integer-exact, so the 6-dp rounding is the only float
    * step and both engines agree bit-for-bit. */
  def abMetrics(units: DataFrame, unitCol: String, converted: DataFrame,
      convUnitCol: String): DataFrame = {
    val v = units.select(col(unitCol).as("unit"),
      when(CurationOps.hashDraw(col(unitCol)) < 32768, "A")
        .otherwise("B").as("variant"))
    val conv = v.join(
        converted.select(col(convUnitCol).as("unit"),
          lit(1).as("flag")).distinct(),
        Seq("unit"), "left")
      .groupBy("unit", "variant")
      .agg(max(coalesce(col("flag"), lit(0))).as("converted"))
    val per = conv.groupBy("variant")
      .agg(count(lit(1)).as("n_units"), sum("converted").as("n_conv"))
    val tot = per.agg(
      sum(when(col("variant") === "A", col("n_units"))).as("na"),
      sum(when(col("variant") === "A", col("n_conv"))).as("ca"),
      sum(when(col("variant") === "B", col("n_units"))).as("nb"),
      sum(when(col("variant") === "B", col("n_conv"))).as("cb"))
    per.crossJoin(broadcast(tot))
      .withColumn("p", (col("ca") + col("cb")).cast("double") /
        (col("na") + col("nb")))
      .select(col("variant"), col("n_units"), col("n_conv"),
        (round(col("n_conv").cast("double") / col("n_units")
          * lit(1000000.0)) / lit(1000000.0)).as("rate"),
        (round((col("ca").cast("double") / col("na")
            - col("cb").cast("double") / col("nb"))
          / sqrt(col("p") * (lit(1.0) - col("p"))
            * (lit(1.0) / col("na") + lit(1.0) / col("nb")))
          * lit(1000000.0)) / lit(1000000.0)).as("z"))
  }

  /** CUPED variance-reduced A/B readout (Deng et al., WSDM'13): adjust
    * each unit's experiment-period metric by its PRE-period metric,
    * y′ = y − θ·(x − μₓ) with θ = Cov(x,y)/Var(x) pooled over all
    * units, and report per-arm raw vs adjusted means and variances
    * plus the variance-reduction factor — the standard way to make an
    * A/B test sensitive without more traffic (reduction ≈ ρ², often
    * 30–60% on revenue metrics). θ is POOLED (the production
    * convention: a per-arm θ would leak the treatment into the
    * adjustment).
    *
    * Scale: ONE map-side-combined groupBy(arm) moment aggregate (six
    * sums; squares/cross-products per-row in DECIMAL(38,12), identical
    * operand order in the oracle), pooled θ derived from the ≤|arms|
    * rows. No second pass, no per-unit adjusted column materialized. */
  def cuped(df: DataFrame, armCol: String, preCol: String,
      postCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec12 = DecimalType(38, 12)
    val x = col(preCol).cast("double"); val y = col(postCol).cast("double")
    val per = df.groupBy(col(armCol).as("arm")).agg(
      count(lit(1)).as("n"),
      sum(x.cast(dec12)).as("sx"), sum(y.cast(dec12)).as("sy"),
      sum((x * x).cast(dec12)).as("sxx"),
      sum((y * y).cast(dec12)).as("syy"),
      sum((x * y).cast(dec12)).as("sxy"))
    val tot = per.agg(sum("n").as("nt"), sum("sx").as("tsx"),
      sum("sy").as("tsy"), sum("sxx").as("tsxx"), sum("sxy").as("tsxy"))
    def d(c: Column): Column = c.cast("double")
    val nt = col("nt").cast("double")
    // pooled θ = Cov(x,y)/Var(x) and global pre-mean
    val varX = (d(col("tsxx")) - d(col("tsx")) * d(col("tsx")) / nt) /
      (nt - 1)
    val covXY = (d(col("tsxy")) - d(col("tsx")) * d(col("tsy")) / nt) /
      (nt - 1)
    val withT = per.crossJoin(broadcast(tot))
      .withColumn("theta", when(varX > 0, covXY / varX).otherwise(0.0))
      .withColumn("mu_x", d(col("tsx")) / nt)
    val n = col("n").cast("double")
    val meanY = d(col("sy")) / n
    val meanX = d(col("sx")) / n
    val varY = (d(col("syy")) - d(col("sy")) * d(col("sy")) / n) / (n - 1)
    val varXa = (d(col("sxx")) - d(col("sx")) * d(col("sx")) / n) / (n - 1)
    val covA = (d(col("sxy")) - d(col("sx")) * d(col("sy")) / n) / (n - 1)
    val varAdj = varY - col("theta") * covA * 2 +
      col("theta") * col("theta") * varXa
    val r6 = (c: Column) => round(c * lit(1000000.0)) / lit(1000000.0)
    val ok = col("n") > 1
    withT.select(col("arm"), col("n"),
      r6(meanY).as("mean_raw"),
      r6(meanY - col("theta") * (meanX - col("mu_x"))).as("mean_adj"),
      r6(col("theta")).as("theta"),
      when(ok, r6(varY)).as("var_raw"),
      when(ok, r6(varAdj)).as("var_adj"),
      when(ok && varY > 0, r6(lit(1.0) - varAdj / varY))
        .as("var_reduction"))
      .orderBy("arm")
  }

  /** Delta-method CI for a RATIO metric (revenue per order, CTR,
    * items per session): per arm, R = Σy/Σx with the first-order
    * variance Var(R) ≈ (s_y² − 2R·s_xy + R²·s_x²)/(n·μₓ²) — the
    * correct interval for the metric every naive per-unit average
    * gets wrong (a mean of per-unit ratios is NOT the ratio of
    * totals, and the totals' ratio has unit-level covariance).
    * Same ONE-aggregate moment fold as [[cuped]]. */
  def deltaMethod(df: DataFrame, armCol: String, numCol: String,
      denCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec12 = DecimalType(38, 12)
    val y = col(numCol).cast("double"); val x = col(denCol).cast("double")
    val per = df.groupBy(col(armCol).as("arm")).agg(
      count(lit(1)).as("n"),
      sum(y.cast(dec12)).as("sy"), sum(x.cast(dec12)).as("sx"),
      sum((y * y).cast(dec12)).as("syy"),
      sum((x * x).cast(dec12)).as("sxx"),
      sum((x * y).cast(dec12)).as("sxy"))
    def d(c: Column): Column = c.cast("double")
    val n = col("n").cast("double")
    val mx = d(col("sx")) / n
    val ratio = d(col("sy")) / d(col("sx"))
    val vy = (d(col("syy")) - d(col("sy")) * d(col("sy")) / n) / (n - 1)
    val vx = (d(col("sxx")) - d(col("sx")) * d(col("sx")) / n) / (n - 1)
    val cxy = (d(col("sxy")) - d(col("sx")) * d(col("sy")) / n) / (n - 1)
    val se = sqrt(greatest(
      (vy - ratio * cxy * 2 + ratio * ratio * vx) / (n * mx * mx),
      lit(0.0)))
    val r6 = (c: Column) => round(c * lit(1000000.0)) / lit(1000000.0)
    val ok = col("n") > 1 && d(col("sx")) > 0
    per.select(col("arm"), col("n"),
      when(d(col("sx")) =!= 0, r6(ratio)).as("ratio"),
      when(ok, r6(se)).as("se"),
      when(ok, r6(ratio - lit(1.959964) * se)).as("ci_lo"),
      when(ok, r6(ratio + lit(1.959964) * se)).as("ci_hi"))
      .orderBy("arm")
  }

  /** Difference-in-differences on a per-unit panel (arm, pre, post):
    * did = mean(Δ | treated) − mean(Δ | control) with Δ = post − pre
    * per unit, se = √(s²_T/n_T + s²_C/n_C) over the per-unit diffs,
    * z = did/se — the "parallel trends" causal readout when treatment
    * wasn't randomized but both arms were observed before and after.
    * ONE groupBy(arm) moment fold over the per-unit diffs
    * (DECIMAL(38,12) per-row squares), 2-row table at any scale. */
  def didEstimate(df: DataFrame, armCol: String, treatVal: String,
      preCol: String, postCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec12 = DecimalType(38, 12)
    val dlt = col(postCol).cast("double") - col(preCol).cast("double")
    val per = df.groupBy(
        (col(armCol) === treatVal).as("treated"))
      .agg(count(lit(1)).as("n"), sum(dlt.cast(dec12)).as("sd"),
        sum((dlt * dlt).cast(dec12)).as("sdd"))
    val one = per.agg(
      max(when(col("treated"), col("n"))).as("n_treat"),
      max(when(col("treated"), col("sd"))).as("sdt"),
      max(when(col("treated"), col("sdd"))).as("sddt"),
      max(when(!col("treated"), col("n"))).as("n_ctrl"),
      max(when(!col("treated"), col("sd"))).as("sdc"),
      max(when(!col("treated"), col("sdd"))).as("sddc"))
    def d(c: Column): Column = c.cast("double")
    val nt = col("n_treat").cast("double")
    val nc = col("n_ctrl").cast("double")
    val mt = d(col("sdt")) / nt; val mc = d(col("sdc")) / nc
    val vt = (d(col("sddt")) - d(col("sdt")) * d(col("sdt")) / nt) /
      (nt - 1)
    val vc = (d(col("sddc")) - d(col("sdc")) * d(col("sdc")) / nc) /
      (nc - 1)
    val se = sqrt(vt / nt + vc / nc)
    val r6 = (c: Column) => round(c * lit(1000000.0)) / lit(1000000.0)
    val ok = col("n_treat") > 1 && col("n_ctrl") > 1
    one.select(
      coalesce(col("n_treat"), lit(0L)).as("n_treat"),
      coalesce(col("n_ctrl"), lit(0L)).as("n_ctrl"),
      when(ok, r6(mt)).as("delta_treat"),
      when(ok, r6(mc)).as("delta_ctrl"),
      when(ok, r6(mt - mc)).as("did"),
      when(ok, r6(se)).as("se"),
      when(ok, when(se > 0, r6((mt - mc) / se))).as("z"))
  }

  /** Two-sample power analysis from OBSERVED moments: the minimum
    * detectable effect at 80% power / two-sided α = 5%
    * (mde = (z₀.₉₇₅ + z₀.₈)·√(s²_a/n_a + s²_b/n_b)) and the per-arm n
    * needed to detect the OBSERVED difference at that power
    * (n = (z₀.₉₇₅ + z₀.₈)²·(s²_a + s²_b)/Δ², ceiling) — the "is this
    * test even capable of seeing the effect we care about" readout
    * run before and after every experiment. Fixed standard constants
    * (1.959964, 0.841621), no inverse-CDF needed; one moment fold. */
  def powerAnalysis(df: DataFrame, groupCol: String, valCol: String,
      aVal: String, bVal: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec12 = DecimalType(38, 12)
    val x = col(valCol).cast("double")
    val per = df.filter(col(groupCol).isin(aVal, bVal))
      .groupBy((col(groupCol) === aVal).as("isa"))
      .agg(count(lit(1)).as("n"), sum(x.cast(dec12)).as("sx"),
        sum((x * x).cast(dec12)).as("sxx"))
    val one = per.agg(
      max(when(col("isa"), col("n"))).as("n_a"),
      max(when(col("isa"), col("sx"))).as("sxa"),
      max(when(col("isa"), col("sxx"))).as("sxxa"),
      max(when(!col("isa"), col("n"))).as("n_b"),
      max(when(!col("isa"), col("sx"))).as("sxb"),
      max(when(!col("isa"), col("sxx"))).as("sxxb"))
    def d(c: Column): Column = c.cast("double")
    val na = col("n_a").cast("double"); val nb = col("n_b").cast("double")
    val va = (d(col("sxxa")) - d(col("sxa")) * d(col("sxa")) / na) /
      (na - 1)
    val vb = (d(col("sxxb")) - d(col("sxb")) * d(col("sxb")) / nb) /
      (nb - 1)
    val delta = d(col("sxa")) / na - d(col("sxb")) / nb
    val zz = lit(1.959964) + lit(0.841621)
    val mde = zz * sqrt(va / na + vb / nb)
    val nNeeded = ceil(zz * zz * (va + vb) / (delta * delta))
    val r6 = (c: Column) => round(c * lit(1000000.0)) / lit(1000000.0)
    val ok = col("n_a") > 1 && col("n_b") > 1
    one.select(
      coalesce(col("n_a"), lit(0L)).as("n_a"),
      coalesce(col("n_b"), lit(0L)).as("n_b"),
      when(ok, r6(delta)).as("observed_delta"),
      when(ok, r6(mde)).as("mde"),
      when(ok, when(delta =!= 0.0, nNeeded.cast("bigint")))
        .as("n_per_arm_needed"))
  }

  /** Benford first-digit audit: the distribution of leading digits of
    * `valCol` (values ≥ 1) against Benford's law
    * `P(d) = log10(1 + 1/d)`, with per-digit χ² contributions — the
    * classic fraud/data-fabrication screen over financial columns.
    * A genuinely organic amount column tracks the curve; a fabricated
    * one (uniform leading digits) lights up the χ² column.
    *
    * Scale: one map-side-combined 9-key hash aggregate over a
    * codegen'd digit projection; the total rides back as a broadcast
    * 1-row aggregate. The only float steps are the final 6-dp
    * readouts (observed share, expected share, χ² term) — counts are
    * exact, and log10's cross-engine ulp noise sits ~10⁸ ulps from
    * every 6-dp rounding boundary for d = 1…9. */
  def benford(df: DataFrame, valCol: String): DataFrame = {
    val counts = df
      .filter(col(valCol) >= 1)
      .groupBy(substring(floor(col(valCol)).cast("bigint")
        .cast("string"), 1, 1).cast("int").as("digit"))
      .agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum("n").as("total"))
    counts.crossJoin(broadcast(tot))
      .withColumn("__ep", log10(lit(1.0) + lit(1.0) / col("digit")))
      .select(col("digit"), col("n"),
        (round(col("n").cast("double") / col("total")
          * lit(1000000.0)) / lit(1000000.0)).as("obs_p"),
        (round(col("__ep") * lit(1000000.0)) / lit(1000000.0))
          .as("exp_p"),
        (round(pow(col("n").cast("double")
            - col("total") * col("__ep"), 2)
          / (col("total") * col("__ep"))
          * lit(1000000.0)) / lit(1000000.0)).as("chi2"))
      .orderBy("digit")
  }

  /** Per-group weighted median: the smallest value v whose cumulative
    * weight reaches half the group's total — the volume-weighted
    * robust center ("the price at which half the QUANTITY trades",
    * not half the rows). Textbook lower weighted median; no
    * interpolation, so the answer is an actual stored value.
    *
    * Scale — ITERATIVE prune-then-verify: a single bucket pass
    * (the r12 shape) bounds the exact-window input only for benign
    * value distributions; on a heavy-tailed column the equal-width
    * buckets over [min, max] put nearly ALL mass in one bucket (the
    * Theil–Sen slope table measured 2.35M of 2.9M rows landing in the
    * crossing bucket — a single-partition sort in disguise). So the
    * bucket search RECURSES: each round re-buckets only the previous
    * crossing bucket (its weight-before rides along as an exact
    * DECIMAL offset), shrinking the candidate range nBuckets× per
    * round,
    * until the crossing bucket's row count is ≤ 65536 or a round cap
    * of 8 (the cap only stops refinement — the exact verify stage is
    * correct at ANY candidate size, its window just gets bigger; the
    * groupBy(v) below it collapses pathological all-equal buckets
    * anyway). Each round is ONE linear scan with a map-side-combined
    * nBuckets-cell fold plus a bucket-count-bounded window; the loop
    * state is a |groups|-row broadcast pinned via Checkpoints.pin.
    *
    * Bucket ids are UNCLAMPED floor((v−lo)·nB/(hi−lo+1e-9)) — a pure
    * function of (v, lo, hi) — and each round's scope filter replays
    * the PREVIOUS round's formula verbatim, so float boundary slop can
    * never double-count or drop weight: a row belongs to exactly the
    * bucket the fold counted it in. Weight sums run in DECIMAL(38,6)
    * (exact, order-independent) and the 2·cum ≥ total crossing test is
    * integer-exact decimal arithmetic on both engines, so the final
    * crossing value is engine-identical. */
  def weightedMedian(df: DataFrame, groupCol: String, valCol: String,
      weightCol: String, renderValue: Column => Column =
        c => {
          import org.apache.spark.sql.types.DecimalType
          c.cast(DecimalType(18, 2)).cast("double")
        }): DataFrame =
    weightedQuantile(df, groupCol, valCol, weightCol, 1, 2, renderValue)

  /** Per-group exact lower weighted QUANTILE at p = num/den: the
    * smallest value v whose cumulative weight w(≤v) satisfies
    * w·den ≥ num·total — [[weightedMedian]] is (num, den) = (1, 2).
    * The crossing test stays integer-exact decimal arithmetic at any
    * rational p; same iterative narrowing, same engine-identical
    * guarantee. */
  def weightedQuantile(df: DataFrame, groupCol: String, valCol: String,
      weightCol: String, num: Int, den: Int,
      renderValue: Column => Column): DataFrame = {
    require(num > 0 && den > 0 && num < den, s"p=num/den in (0,1); got $num/$den")
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 6)
    // 8192 cells: still a trivially bounded offset window / map-side
    // hash footprint, but one round shrinks the candidate range 8192×
    // — measured on the Theil–Sen slope table this cuts the rounds'
    // cost ~40% vs 1024 (2.89M → 725k → 104 in two rounds)
    val nBuckets = 8192
    val vD = col(valCol).cast("double")
    // unclamped on purpose: out-of-base values get ids <0 / ≥8192 that
    // sort and filter consistently (see scaladoc)
    def bucketIn(lo: Column, hi: Column): Column =
      floor((vD - lo) * nBuckets / (hi - lo + lit(1e-9)))
    // per-group loop state: bucketing base [__blo,__bhi] for the next
    // fold; scope triple (__flo,__fhi,__fcbkt) replaying the previous
    // fold's crossing-bucket membership (NULL cbkt = everything, round
    // 0); exact weight before the scope; total; scope row count.
    var state = graft.tools.Checkpoints.pin(df.groupBy(col(groupCol))
      .agg(min(vD).as("__blo"), max(vD).as("__bhi"),
        sum(col(weightCol).cast(dec)).as("total"),
        count(lit(1)).as("__nrows"))
      .withColumn("__flo", lit(null).cast("double"))
      .withColumn("__fhi", lit(null).cast("double"))
      .withColumn("__fcbkt", lit(null).cast("long"))
      .withColumn("__before", lit(0).cast(dec)))
    def inScope: Column = col("__fcbkt").isNull ||
      bucketIn(col("__flo"), col("__fhi")) === col("__fcbkt")
    def maxRowsOf(st: DataFrame): Long = {
      val r = st.agg(max("__nrows")).collect()(0)
      if (r.isNullAt(0)) 0L else r.getLong(0)
    }
    val wBkt = Window.partitionBy(groupCol).orderBy("__bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    var maxRows = maxRowsOf(state)
    var round = 0
    while (maxRows > 65536 && round < 8) {
      val width = (col("__phi") - col("__plo") + lit(1e-9)) / nBuckets
      state = graft.tools.Checkpoints.pin(
        df.join(broadcast(state), groupCol)
          .filter(inScope)
          .groupBy(col(groupCol),
            bucketIn(col("__blo"), col("__bhi")).as("__bkt"))
          .agg(sum(col(weightCol).cast(dec)).as("__bw"),
            count(lit(1)).as("__nrows"),
            min("__blo").as("__plo"), min("__bhi").as("__phi"),
            min("__before").as("__pbefore"), min("total").as("total"))
          .withColumn("__cum",
            coalesce(sum(col("__bw")).over(wBkt), lit(0).cast(dec)))
          .filter((col("__pbefore") + col("__cum")) * lit(den) <
              col("total") * lit(num) &&
            (col("__pbefore") + col("__cum") + col("__bw")) * lit(den) >=
              col("total") * lit(num))
          .select(col(groupCol),
            (col("__plo") + col("__bkt") * width).as("__blo"),
            (col("__plo") + (col("__bkt") + 1) * width).as("__bhi"),
            col("__plo").as("__flo"), col("__phi").as("__fhi"),
            col("__bkt").as("__fcbkt"),
            (col("__pbefore") + col("__cum")).as("__before"),
            col("total"), col("__nrows")))
      maxRows = maxRowsOf(state)
      round += 1
    }
    // VERIFY: exact crossing within the final scope (≤65536 rows per
    // group, or round-capped — correct at any size)
    val wCum = Window.partitionBy(groupCol).orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.join(broadcast(state), groupCol)
      .filter(inScope)
      .groupBy(col(groupCol), col(valCol).as("v"))
      .agg(sum(col(weightCol).cast(dec)).as("w"),
        min("__before").as("__before"), min("total").as("total"))
      .withColumn("cumw", col("__before") + sum("w").over(wCum))
      .filter(col("cumw") * lit(den) >= col("total") * lit(num))
      .groupBy(col(groupCol))
      // §7.6 final-render rule: DECIMAL stays internal (exact math),
      // outputs go out as DOUBLE so the gate's two read paths agree.
      .agg(
        renderValue(min("v")).as("wmedian"),
        min("total").cast("double").as("total_w"))
  }

  // Poisson(1) CDF thresholds on the 16-bit draw scale: a uniform
  // u ∈ [0, 65536) maps to weight w = #{k : u ≥ t_k} (max 8) — the
  // standard Poisson bootstrap resampling weight, derandomized. The
  // SQL oracle interpolates the SAME integers, so both engines draw
  // identical weights from identical md5 nibbles.
  private[graft] val PoissonCum: Seq[Double] = {
    val invE = math.exp(-1.0)
    Iterator.iterate((invE, invE, 0)) { case (term, cum, k) =>
      val t = term / (k + 1); (t, cum + t, k + 1)
    }.take(8).map(_._2).toSeq
  }
  private[graft] val PoissonT: Seq[Long] =
    PoissonCum.map(c => math.floor(c * 65536.0).toLong)

  /** Per-group mean with a 95% bootstrap confidence interval — in ONE
    * aggregation pass, no row resampling. The Poisson bootstrap
    * (Chamandy et al. 2012 — THE bootstrap for map-reduce): replicate
    * b reweights every row by an independent Poisson(1) draw, so all
    * `reps` replicate sums fold as extra aggregate columns exactly
    * like simhash's 64 bit sums — zero row inflation, zero extra
    * shuffle, and the CI costs one wide map-side-combined aggregate.
    *
    * Derandomized: row i's weight in replicate b comes from md5 of
    * `id#chunk` (8 sixteen-bit draws per hash → reps/8 hashes per
    * row), thresholded through the integer Poisson CDF — no RNG
    * state, reproducible across retries, partitionings, and ENGINES
    * (the oracle draws the identical weights nibble-for-nibble).
    * Replicate sums run in DECIMAL(38,6); the interval is the
    * percentile bootstrap on the `reps` replicate means (order
    * statistics ⌈0.025·reps⌉ and ⌈0.975·reps⌉ of the sorted array —
    * a `sort_array` over a reps-length array per GROUP, never a
    * window). */
  def bootstrapCi(df: DataFrame, groupCol: String, idCol: String,
      valCol: String, reps: Int = 64): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(reps % 8 == 0 && reps > 0, s"reps must be a multiple of 8")
    val dec = DecimalType(38, 6)
    val chunks = reps / 8
    val hashed = df.select(
      col(groupCol) +: col(valCol).cast("double").as("__x") +:
        (0 until chunks).map(c =>
          md5(concat(col(idCol).cast("string"), lit(s"#$c")))
            .as(s"__h$c")): _*)
    def weight(b: Int): Column = {
      val u = conv(substring(col(s"__h${b / 8}"), (b % 8) * 4 + 1, 4),
        16, 10).cast("long")
      PoissonT.map(t => (u >= lit(t)).cast("long")).reduce(_ + _)
    }
    val aggs =
      Seq(count(lit(1)).as("__n"), sum(col("__x").cast(dec)).as("__s")) ++
        (0 until reps).flatMap(b => Seq(
          sum((weight(b) * col("__x")).cast(dec)).as(s"__bs$b"),
          sum(weight(b)).as(s"__bn$b")))
    val r6 = (c: Column) => round(c * lit(1000000.0)) / lit(1000000.0)
    val loIdx = math.ceil(0.025 * reps).toInt
    val hiIdx = math.ceil(0.975 * reps).toInt
    // A replicate whose Poisson weights all drew 0 in a small group
    // has __bn = 0; its mean is then NULL/NaN, and Spark's sort_array
    // (NULL/NaN last-ish) and the oracle's ORDER BY (NULLS LAST)
    // disagree on where it lands — silently shifting the order
    // statistics. Degenerate replicates fall back to the UNROUNDED
    // group mean on both engines (identical DECIMAL-exact sum /
    // count), keeping the sorted array total and engine-identical.
    // P(draw) = e^-n per replicate, so only tiny groups ever hit it.
    val gmean = col("__s").cast("double") / col("__n")
    hashed.groupBy(col(groupCol))
      .agg(aggs.head, aggs.tail: _*)
      .select(col(groupCol), col("__n").as("n"),
        r6(col("__s").cast("double") / col("__n")).as("mean"),
        sort_array(array((0 until reps).map(b =>
          when(col(s"__bn$b") === 0, gmean)
            .otherwise(col(s"__bs$b").cast("double") /
              col(s"__bn$b"))): _*))
          .as("__ms"))
      .select(col(groupCol), col("n"), col("mean"),
        r6(element_at(col("__ms"), loIdx)).as("ci_lo"),
        r6(element_at(col("__ms"), hiIdx)).as("ci_hi"))
  }

  /** Contingency table with χ² independence terms: observed counts
    * for every `(a, b)` category pair, the expected count under
    * independence `rowTotal·colTotal/total`, and the per-cell χ²
    * contribution `(n−e)²/e` — the "are these two categoricals
    * related" screen (on a fully-populated table summing the chi2
    * column against the χ² distribution is the test itself; with
    * EMPTY cells, [[cramersV]] carries their (0−e)²/e mass — this
    * per-cell view reports observed pairs only).
    *
    * Scale: ONE map-side-combined hash aggregate over the raw table
    * (keyed on the pair); marginals re-aggregate the cell table —
    * ≤|A|·|B| rows — and ride back as broadcast joins. Counts are
    * exact integers; the only float steps are the two 6-dp readouts,
    * computed with the identical IEEE op sequence in the oracle. */
  def crosstabChi2(df: DataFrame, aCol: String,
      bCol: String): DataFrame = {
    val cells = df.groupBy(col(aCol), col(bCol))
      .agg(count(lit(1)).as("n"))
    val rowT = cells.groupBy(col(aCol)).agg(sum("n").as("rt"))
    val colT = cells.groupBy(col(bCol)).agg(sum("n").as("ct"))
    val tot = cells.agg(sum("n").as("total"))
    val r6 = (c: Column) => round(c * lit(1000000.0)) / lit(1000000.0)
    val e = col("rt").cast("double") * col("ct") / col("total")
    cells
      .join(broadcast(rowT), aCol)
      .join(broadcast(colT), bCol)
      .crossJoin(broadcast(tot))
      .select(col(aCol), col(bCol), col("n"),
        r6(e).as("expected"),
        r6((col("n") - e) * (col("n") - e) / e).as("chi2"))
      .orderBy(aCol, bCol)
  }

  /** Mutual information between two categorical columns, in bits:
    * per-cell contributions `p(a,b)·log₂(p(a,b)/(p(a)p(b)))` plus the
    * MI total repeated on every row — "how much does knowing A tell
    * you about B", the model-free dependence measure the χ² screen
    * ([[crosstabChi2]]) can't give you a magnitude for. The
    * feature-selection / leakage-detection primitive: MI(feature,
    * label) ≈ H(label) means the feature IS the label.
    *
    * Scale: one map-side-combined hash aggregate keyed on the pair;
    * marginals re-aggregate the ≤|A|·|B|-row cell table and ride back
    * as broadcast joins. Counts are exact; each cell's float term is
    * rounded into DECIMAL(38,12) before the total sums (the q_entropy
    * drift stance — order-independent), and the 6-dp readouts use the
    * identical IEEE op sequence in the oracle. */
  def mutualInfo(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val cells = df.groupBy(col(aCol), col(bCol))
      .agg(count(lit(1)).as("n"))
    val rowT = cells.groupBy(col(aCol)).agg(sum("n").as("rt"))
    val colT = cells.groupBy(col(bCol)).agg(sum("n").as("ct"))
    val tot = cells.agg(sum("n").as("total"))
    val r6 = (c: Column) => round(c * lit(1000000.0)) / lit(1000000.0)
    val term = col("n").cast("double") / col("total") *
      log(col("n").cast("double") * col("total") /
        (col("rt").cast("double") * col("ct"))) / log(lit(2.0))
    val terms = cells
      .join(broadcast(rowT), aCol)
      .join(broadcast(colT), bCol)
      .crossJoin(broadcast(tot))
      .select(col(aCol), col(bCol), col("n"),
        term.as("__term"))
    val mi = terms.agg(
      sum(col("__term").cast(DecimalType(38, 12))).as("__mi"))
    terms.crossJoin(broadcast(mi))
      .select(col(aCol), col(bCol), col("n"),
        r6(col("__term")).as("mi_term"),
        r6(col("__mi").cast("double")).as("mi_total"))
      .orderBy(aCol, bCol)
  }

  /** Cramér's V: the [0, 1] effect size of association between two
    * categorical columns — χ² normalized by table size and dimension,
    * `V = √(χ²/n / (min(r,c) − 1))` — the one-number answer to "HOW
    * related are these", comparable across tables of any shape (χ²
    * itself grows with n). One row out: n, cell count, dof, the χ²
    * total, V.
    *
    * Scale: the [[crosstabChi2]] aggregate shape (one pair-keyed
    * fold, broadcast marginals) collapsed to a single row; per-cell
    * χ² terms round into DECIMAL(38,12) before summing so the total
    * is partition-order-independent and engine-identical. */
  def cramersV(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val cells = df.groupBy(col(aCol), col(bCol))
      .agg(count(lit(1)).as("n"))
    val rowT = cells.groupBy(col(aCol)).agg(sum("n").as("rt"))
    val colT = cells.groupBy(col(bCol)).agg(sum("n").as("ct"))
    val tot = cells.agg(sum("n").as("total"))
    val dims = cells.agg(
      count_distinct(col(aCol)).as("ra"),
      count_distinct(col(bCol)).as("cb"))
    val r6 = (c: Column) => round(c * lit(1000000.0)) / lit(1000000.0)
    val e = col("rt").cast("double") * col("ct") / col("total")
    // the cell table holds OBSERVED pairs only; every absent (a, b)
    // cell still contributes (0 − e)²/e = e to χ². Σ over ALL cells
    // of e is exactly n, so the missing mass is n − Σ_observed e —
    // no dense cross join needed, sparse tables stay sparse.
    val chi2sum = cells
      .join(broadcast(rowT), aCol)
      .join(broadcast(colT), bCol)
      .crossJoin(broadcast(tot))
      .agg(sum(((col("n") - e) * (col("n") - e) / e)
          .cast(DecimalType(38, 12))).as("__chi2o"),
        sum(e.cast(DecimalType(38, 12))).as("__esum"),
        count(lit(1)).as("n_cells"), min("total").as("n"))
    val chi2raw = col("__chi2o").cast("double") +
      (col("n") - col("__esum").cast("double"))
    chi2sum.crossJoin(broadcast(dims))
      .select(col("n"), col("n_cells"),
        (least(col("ra"), col("cb")) - lit(1)).as("dof"),
        r6(chi2raw).as("chi2"),
        r6(sqrt(chi2raw / col("n") /
          (least(col("ra"), col("cb")) - lit(1)))).as("v"))
  }

  /** Pearson χ² test of independence between two categoricals — the
    * significance readout [[cramersV]]'s effect size deliberately
    * omits: χ² over the SPARSE observed-cell table (absent cells'
    * mass recovered as n − Σe, the cramersV identity), dof =
    * (r−1)(c−1), and an upper-tail p-value: EXACT closed forms at
    * dof 1 (2·(1−Φ(√χ²)), the χ²₁ ≡ z² identity) and dof 2
    * (exp(−χ²/2)), the Wilson–Hilferty cube-root normal mapping
    * z = ((χ²/k)^⅓ − 1 + 2/(9k))·√(9k/2) for k ≥ 3 (|ε| < 1e-3 in p
    * there — decision-grade at the 6-dp render; the general χ² CDF
    * has no closed form both engines state identically, and W–H is
    * one pow + the shared A&S polynomial).
    *
    * Scale: one hash-aggregate over observed pairs, two k-row margin
    * aggregates broadcast back — never a dense r×c materialization. */
  def chisqTest(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val cells = df.groupBy(col(aCol), col(bCol))
      .agg(count(lit(1)).as("n"))
    val rowT = cells.groupBy(col(aCol)).agg(sum("n").as("rt"))
    val colT = cells.groupBy(col(bCol)).agg(sum("n").as("ct"))
    val tot = cells.agg(sum("n").as("total"))
    val dims = cells.agg(
      count_distinct(col(aCol)).as("ra"),
      count_distinct(col(bCol)).as("cb"))
    val r6 = (c: Column) => round(c * lit(1000000.0)) / lit(1000000.0)
    val e = col("rt").cast("double") * col("ct") / col("total")
    val chi2sum = cells
      .join(broadcast(rowT), aCol)
      .join(broadcast(colT), bCol)
      .crossJoin(broadcast(tot))
      .agg(sum(((col("n") - e) * (col("n") - e) / e)
          .cast(DecimalType(38, 12))).as("__chi2o"),
        sum(e.cast(DecimalType(38, 12))).as("__esum"),
        min("total").as("n"))
    val chi2 = col("__chi2o").cast("double") +
      (col("n") - col("__esum").cast("double"))
    val kD = ((col("ra") - 1) * (col("cb") - 1)).cast("double")
    val z = (pow(chi2 / kD, lit(1.0) / lit(3.0)) - lit(1.0) +
      lit(2.0) / (lit(9.0) * kD)) * sqrt(lit(9.0) * kD / 2)
    val p = when(kD === 1, HypothesisOps.twoSidedNormalP(sqrt(chi2)))
      .when(kD === 2, exp(chi2 / -2))
      .otherwise(HypothesisOps.upperNormalP(z))
    chi2sum.crossJoin(broadcast(dims))
      .select(col("n"),
        ((col("ra") - 1) * (col("cb") - 1)).cast("bigint").as("dof"),
        when(kD > 0, r6(chi2)).as("chi2"),
        when(kD > 0, r6(p)).as("p_value"))
  }

  /** 2×2 odds ratio and risk ratio with Wald 95% CIs — the effect-size
    * readout for binary exposure × binary outcome that [[chisqTest]]'s
    * significance alone can't give (at corpus n everything is
    * significant; OR/RR say how MUCH). log-OR se = √(1/a+1/b+1/c+1/d)
    * (Woolf), log-RR se = √(1/a−1/(a+b)+1/c−1/(c+d)); p from the
    * log-OR z through the shared A&S polynomial. Zero cells → NULL
    * ratios (no 0.5 corrections smuggled in — a caller who wants
    * Haldane–Anscombe can pre-aggregate).
    *
    * Scale: ONE map-side-combined aggregate of four exact counts. */
  def oddsRatio(df: DataFrame, exposureCol: String, outcomeCol: String)
      : DataFrame = {
    val ex = col(exposureCol).cast("boolean")
    val oc = col(outcomeCol).cast("boolean")
    val one = df.agg(
      sum((ex && oc).cast("long")).as("a"),
      sum((ex && !oc).cast("long")).as("b"),
      sum((!ex && oc).cast("long")).as("c"),
      sum((!ex && !oc).cast("long")).as("d"))
    val r6 = (c: Column) => round(c * lit(1000000.0)) / lit(1000000.0)
    def dd(n: String): Column = col(n).cast("double")
    val ok = col("a") > 0 && col("b") > 0 && col("c") > 0 &&
      col("d") > 0
    val orr = dd("a") * dd("d") / (dd("b") * dd("c"))
    val seLo = sqrt(lit(1.0) / dd("a") + lit(1.0) / dd("b") +
      lit(1.0) / dd("c") + lit(1.0) / dd("d"))
    val rr = (dd("a") / (dd("a") + dd("b"))) /
      (dd("c") / (dd("c") + dd("d")))
    val seLr = sqrt(lit(1.0) / dd("a") - lit(1.0) / (dd("a") + dd("b")) +
      lit(1.0) / dd("c") - lit(1.0) / (dd("c") + dd("d")))
    val z = log(orr) / seLo
    one.select(col("a"), col("b"), col("c"), col("d"),
      when(ok, r6(orr)).as("odds_ratio"),
      when(ok, r6(exp(log(orr) - lit(1.96) * seLo))).as("or_lo"),
      when(ok, r6(exp(log(orr) + lit(1.96) * seLo))).as("or_hi"),
      when(ok, r6(rr)).as("risk_ratio"),
      when(ok, r6(exp(log(rr) - lit(1.96) * seLr))).as("rr_lo"),
      when(ok, r6(exp(log(rr) + lit(1.96) * seLr))).as("rr_hi"),
      when(ok, r6(HypothesisOps.twoSidedNormalP(z))).as("p_value"))
  }

  /** Mixture sequential probability ratio test (mSPRT, Johari et al.)
    * over daily looks at a two-arm mean difference — the ALWAYS-VALID
    * p-value that stays honest under continuous monitoring, where the
    * fixed-horizon z of [[abMetrics]] is guaranteed to cross 0.05
    * eventually on a true null. Per look n (cumulative), with
    * d̄ = x̄_A − x̄_B and its variance se², the normal-mixture
    * likelihood ratio has the closed form
    * Λ = √(se²/(se²+τ²))·exp(d̄²τ²/(2se²(se²+τ²))); the always-valid
    * p is the running min of 1/Λ, capped at 1. τ (the mixture scale)
    * defaults to the observed pooled sd over √1000 — the
    * practical-effect-size prior; it is a declared parameter, not a
    * fit.
    *
    * Scale: the corpus collapses to one row per (look day, arm) in a
    * map-side aggregate; cumulative sums and the running min run on
    * the date-bounded look table under [[BoundedWindow]]-declared
    * windows. */
  def msprt(df: DataFrame, tsCol: String, armCol: String,
      valCol: String, aVal: String, bVal: String,
      tau: Double = 0.0): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec6 = DecimalType(38, 6)
    // floor(x·1e6 + 0.5), NOT round(): mean_diff is a quotient of a
    // DECIMAL(38,6) sum by an integer count — the small-denominator
    // rational class where exact-.5-at-6dp boundaries occur and
    // Spark's round() (shortest-decimal-string) and DuckDB's
    // (exact-binary) disagree. floor(+0.5) is pure double arithmetic,
    // bit-identical on both engines (same fix as quantileNormalize).
    val r6 = (c: Column) =>
      floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    val looks = df.filter(col(armCol).isin(aVal, bVal))
      .groupBy(to_date(col(tsCol)).as("look"),
        (col(armCol) === aVal).as("isa"))
      .agg(count(lit(1)).as("n"),
        sum(col(valCol).cast(dec6)).as("sx"),
        sum((col(valCol) * col(valCol)).cast(dec6)).as("sxx"))
    val wCum = Window.partitionBy(col("isa"))
      .orderBy("look")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = looks.select(col("look"), col("isa"),
      sum("n").over(wCum).as("cn"),
      sum("sx").over(wCum).cast("double").as("csx"),
      sum("sxx").over(wCum).cast("double").as("csxx"))
    val byLook = cum.groupBy("look").agg(
      max(when(col("isa"), col("cn"))).as("n_a"),
      max(when(!col("isa"), col("cn"))).as("n_b"),
      max(when(col("isa"), col("csx"))).as("sxa"),
      max(when(!col("isa"), col("csx"))).as("sxb"),
      max(when(col("isa"), col("csxx"))).as("sxxa"),
      max(when(!col("isa"), col("csxx"))).as("sxxb"))
    val na = col("n_a").cast("double"); val nb = col("n_b").cast("double")
    val ma = col("sxa") / na; val mb = col("sxb") / nb
    val va = (col("sxxa") - col("sxa") * col("sxa") / na) / (na - 1)
    val vb = (col("sxxb") - col("sxb") * col("sxb") / nb) / (nb - 1)
    val se2 = va / na + vb / nb
    // default tau: pooled sd / sqrt(1000) — stated, deterministic
    val tauC = if (tau > 0) lit(tau * tau)
      else (va * (na - 1) + vb * (nb - 1)) / (na + nb - 2) / 1000
    val diff = ma - mb
    val lam = sqrt(se2 / (se2 + tauC)) *
      exp(diff * diff * tauC / (lit(2.0) * se2 * (se2 + tauC)))
    val ok = col("n_a") > 1 && col("n_b") > 1 && se2 > 0
    val withLam = byLook.select(col("look"), col("n_a"), col("n_b"),
      when(ok, r6(diff)).as("mean_diff"),
      when(ok, lam).as("__lam"))
    val wRun = Window.partitionBy(BoundedWindow.key(col("look")))
      .orderBy("look")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withLam
      .withColumn("__maxlam", max("__lam").over(wRun))
      .select(col("look"), col("n_a"), col("n_b"), col("mean_diff"),
        r6(col("__lam")).as("lambda"),
        r6(least(lit(1.0), lit(1.0) / col("__maxlam")))
          .as("p_always_valid"))
      .orderBy("look")
  }

  /** Empirical-Bayes (Beta-Binomial) shrinkage of per-entity rates —
    * the "don't trust 1-for-1 = 100%" estimator every leaderboard,
    * seller-score, and CTR table needs: fit Beta(α, β) to the
    * observed rate distribution by method of moments
    * (α+β = m(1−m)/v − 1 over entities, the classic MoM prior), then
    * shrink each entity to (x + α)/(n + α + β) — small-n entities
    * pull hard toward the global mean, large-n entities keep their
    * data. Entities below `minN` are EXCLUDED from the prior fit
    * (their noisy rates would inflate v and weaken shrinkage) but
    * still shrunk and emitted.
    *
    * Scale: one per-entity aggregate, one 1-row moment fold
    * broadcast back, a codegen'd projection. Degenerate prior
    * (v ≥ m(1−m) or v = 0) → NULL shrunk rates, raw rates intact. */
  def ebShrinkage(df: DataFrame, entityCol: String, hitCol: String,
      minN: Long = 5): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec12 = DecimalType(38, 12)
    val r6 = (c: Column) => round(c * lit(1000000.0)) / lit(1000000.0)
    val y = when(col(hitCol).cast("boolean"), 1L).otherwise(0L)
    val per = df.groupBy(col(entityCol).as("entity"))
      .agg(count(lit(1)).as("n"), sum(y).as("x"))
    val rate = col("x").cast("double") / col("n").cast("double")
    val mom = per.filter(col("n") >= minN)
      .agg(count(lit(1)).cast("double").as("k"),
        sum(rate.cast(dec12)).cast("double").as("sr"),
        sum((rate * rate).cast(dec12)).cast("double").as("srr"))
    val m = col("sr") / col("k")
    val v = (col("srr") - col("sr") * col("sr") / col("k")) /
      (col("k") - 1)
    val ab = m * (lit(1.0) - m) / v - 1
    val prior = mom.select(
      when(col("k") > 1 && v > 0 && ab > 0,
        struct((m * ab).as("alpha"),
          ((lit(1.0) - m) * ab).as("beta"))).as("p"))
      .select(col("p.alpha").as("__alpha"), col("p.beta").as("__beta"))
    per.crossJoin(broadcast(prior))
      .select(col("entity"), col("n"), col("x"),
        r6(rate).as("rate_raw"),
        r6((col("x").cast("double") + col("__alpha")) /
          (col("n").cast("double") + col("__alpha") + col("__beta")))
          .as("rate_shrunk"),
        r6(col("__alpha")).as("alpha"),
        r6(col("__beta")).as("beta"))
      .orderBy("entity")
  }

  /** Gumbel extreme-value fit on block maxima — "how bad does the
    * worst day get": daily maxima of `valCol`, Gumbel
    * method-of-moments (β = s·√6/π, μ = m − γβ with Euler's
    * γ = 0.5772156649015329), and the T-block return levels
    * μ − β·ln(−ln(1 − 1/T)) at T = 10 and 100 — the canonical EVT
    * readout for capacity planning and SLA tails, where [[distFit]]'s
    * body-of-distribution families are exactly wrong.
    *
    * Scale: the corpus collapses to one row per block (day) in a
    * map-side max aggregate; the moment fold runs on the
    * date-bounded maxima table. */
  def evtGumbel(df: DataFrame, tsCol: String, valCol: String)
      : DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec6 = DecimalType(38, 6)
    val r6 = (c: Column) => round(c * lit(1000000.0)) / lit(1000000.0)
    val blocks = df.groupBy(to_date(col(tsCol)).as("d"))
      .agg(max(col(valCol).cast("double")).as("mx"))
    val g = blocks.agg(count(lit(1)).as("n_blocks"),
      sum(col("mx").cast(dec6)).cast("double").as("sx"),
      sum((col("mx") * col("mx")).cast(dec6)).cast("double").as("sxx"))
    val n = col("n_blocks").cast("double")
    val m = col("sx") / n
    val vv = (col("sxx") - col("sx") * col("sx") / n) / (n - 1)
    val beta = sqrt(vv) * sqrt(lit(6.0)) / lit(math.Pi)
    val mu = m - lit(0.5772156649015329) * beta
    def retLevel(t: Double): Column =
      mu - beta * log(-log(lit(1.0) - lit(1.0) / lit(t)))
    val ok = col("n_blocks") > 1 && vv > 0
    g.select(col("n_blocks"),
      when(ok, r6(m)).as("mean_max"),
      when(ok, r6(sqrt(vv))).as("sd_max"),
      when(ok, r6(mu)).as("gumbel_mu"),
      when(ok, r6(beta)).as("gumbel_beta"),
      when(ok, r6(retLevel(10))).as("ret_level_10"),
      when(ok, r6(retLevel(100))).as("ret_level_100"))
  }

  /** Method-of-moments distribution fits per group — the "what family
    * does this column even follow" profile in front of any parametric
    * assumption: lognormal (μ, σ of ln x — exact MLE for lognormal)
    * and gamma (k = m²/v, θ = v/m) from ONE aggregate of four
    * DECIMAL-exact power sums over the POSITIVE values (zero/negative
    * rows are counted and excluded — stated, not silently dropped). */
  def distFit(df: DataFrame, valCol: String, groupCol: String)
      : DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec6 = DecimalType(38, 6)
    val r6 = (c: Column) => round(c * lit(1000000.0)) / lit(1000000.0)
    val v = col(valCol).cast("double")
    val pos = when(v > 0, v)
    val lx = when(v > 0, log(v))
    val g = df.groupBy(col(groupCol).cast("string").as("grp"))
      .agg(count(lit(1)).as("n_total"),
        count(pos).as("n"),
        sum(pos.cast(dec6)).cast("double").as("sx"),
        sum((pos * pos).cast(dec6)).cast("double").as("sxx"),
        sum(lx.cast(dec6)).cast("double").as("sl"),
        sum((lx * lx).cast(dec6)).cast("double").as("sll"))
    val n = col("n").cast("double")
    val m = col("sx") / n
    val vv = (col("sxx") - col("sx") * col("sx") / n) / (n - 1)
    val lmu = col("sl") / n
    val lvar = (col("sll") - col("sl") * col("sl") / n) / (n - 1)
    val ok = col("n") > 1
    // stddev, not variance: at price scale the variance (~1e9)
    // amplifies the engines' decimal→double ulp divergence past the
    // 6-dp render — sqrt brings it back into range (the q_profile /
    // anovaF stance)
    g.select(col("grp").as(groupCol), col("n_total"), col("n"),
        when(ok, r6(m)).as("mean"),
        when(ok, when(vv > 0, r6(sqrt(vv)))).as("stddev"),
        when(ok, r6(lmu)).as("lnorm_mu"),
        when(ok, when(lvar > 0, r6(sqrt(lvar)))).as("lnorm_sigma"),
        when(ok, when(vv > 0, r6(m * m / vv))).as("gamma_k"),
        when(ok, when(vv > 0, r6(vv / m))).as("gamma_theta"))
      .orderBy(groupCol)
  }

  /** McNemar's test for PAIRED binary judgments — "is screen B
    * actually better than screen A on the SAME rows", the question
    * [[cohenKappa]]'s agreement and two independent accuracy numbers
    * both dodge: only the discordant cells carry information,
    * χ² = (n₁₀ − n₀₁)²/(n₁₀ + n₀₁) with dof 1 (p via the exact
    * χ²₁ ≡ z² identity), plus the Edwards continuity-corrected
    * variant ((|n₁₀ − n₀₁| − 1)²/(n₁₀ + n₀₁), floored at 0) for
    * small discordant counts. The model-eval primitive for comparing
    * two classifiers on one eval set.
    *
    * Scale: ONE map-side-combined aggregate of four exact integer
    * counts; every readout is a closed-form fold. */
  def mcnemar(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val a = col(aCol).cast("boolean"); val b = col(bCol).cast("boolean")
    val one = df.agg(count(lit(1)).as("n"),
      sum((a && !b).cast("long")).as("n10"),
      sum((!a && b).cast("long")).as("n01"))
    val r6 = (c: Column) => round(c * lit(1000000.0)) / lit(1000000.0)
    val disc = (col("n10") + col("n01")).cast("double")
    val diff = (col("n10") - col("n01")).cast("double")
    val chi2 = diff * diff / disc
    val cc = greatest(lit(0.0), abs(diff) - 1)
    val ok = disc > 0
    one.select(col("n"), col("n10"), col("n01"),
      when(ok, r6(chi2)).as("chi2"),
      when(ok, r6(cc * cc / disc)).as("chi2_cc"),
      when(ok, r6(HypothesisOps.twoSidedNormalP(sqrt(chi2))))
        .as("p_value"))
  }

  /** Cohen's κ between two boolean judgments over the same rows: the
    * chance-corrected agreement `κ = (p_o − p_e)/(1 − p_e)` with the
    * full 2×2 confusion — the label-quality primitive for
    * training-data pipelines (are two labelers / two heuristic
    * quality screens agreeing beyond what their base rates force?).
    * κ = 1 perfect, 0 chance-level, < 0 systematic disagreement.
    *
    * Scale: ONE map-side-combined aggregate over the raw table — five
    * exact integer counts; every readout is a 6-dp division of exact
    * longs, stated with the identical op sequence in the oracle. */
  def cohenKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val a = col(aCol)
    val b = col(bCol)
    val r6 = (c: Column) => round(c * lit(1000000.0)) / lit(1000000.0)
    df.agg(
        count(lit(1)).as("n"),
        sum((a && b).cast("long")).as("n11"),
        sum((a && !b).cast("long")).as("n10"),
        sum((!a && b).cast("long")).as("n01"),
        sum((!a && !b).cast("long")).as("n00"))
      .withColumn("__po",
        (col("n11") + col("n00")).cast("double") / col("n"))
      .withColumn("__pe",
        (col("n11") + col("n10")).cast("double") / col("n") *
          ((col("n11") + col("n01")).cast("double") / col("n")) +
        (col("n01") + col("n00")).cast("double") / col("n") *
          ((col("n10") + col("n00")).cast("double") / col("n")))
      .select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
        r6(col("__po")).as("po"),
        r6(col("__pe")).as("pe"),
        r6((col("__po") - col("__pe")) / (lit(1.0) - col("__pe")))
          .as("kappa"))
  }

  /** Hot-key profiler: the `topN` heaviest values of a join/groupBy
    * key with each key's share of the table, cumulative share, and
    * skew ratio (count ÷ the mean per-key count) — the diagnostic
    * that tells you whether a shuffle on this key needs salting or
    * AQE skew handling BEFORE you run the join at 100 TB.
    *
    * Scale: one map-side-combined count aggregate keyed on the key,
    * then `TakeOrderedAndProject` (partial per-partition top-N before
    * the single-partition fold — never a global sort); the cumulative
    * window runs over the ≤topN survivors (declared via
    * [[BoundedWindow.key]]) and the table-level marginals are a
    * broadcast 1-row aggregate. Ties break on the key value, so the
    * cut is a total order on both engines. */
  def keySkew(df: DataFrame, keyCol: String, topN: Int = 10)
      : DataFrame = {
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("cnt"))
    val tot = counts.agg(count(lit(1)).as("nkeys"),
      sum("cnt").as("total"))
    val top = counts.orderBy(col("cnt").desc, col("key")).limit(topN)
    val wCum = Window
      .partitionBy(BoundedWindow.key(col("key")))
      .orderBy(col("cnt").desc, col("key"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val r6 = (c: Column) => round(c * lit(1000000.0)) / lit(1000000.0)
    top.crossJoin(broadcast(tot))
      .withColumn("cum", sum("cnt").over(wCum))
      .select(col("key"), col("cnt"),
        r6(col("cnt").cast("double") / col("total")).as("share"),
        r6(col("cum").cast("double") / col("total")).as("cum_share"),
        r6(col("cnt").cast("double") * col("nkeys") / col("total"))
          .as("skew"))
      .orderBy(col("cnt").desc, col("key"))
  }

  /** RFM segmentation: per-entity Recency (days since last activity,
    * against the table's own max date so the run is replayable) /
    * Frequency / Monetary rollup, each scored 1–5 by QUINTILE CUTS —
    * computed as five `percentile_disc` values over the per-entity
    * table and broadcast back, NEVER a global `ntile` (which would
    * total-sort all entities; at 10⁹ customers that is the single
    * worst window in marketing analytics). Discrete percentiles are
    * actual stored values and the bucket test is `>` on exact
    * integer/DECIMAL rollups, so scores are engine-identical.
    * Recency scores invert (fewer days = better = 5). */
  def rfm(df: DataFrame, entityCol: String, dateCol: String,
      amountCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val per = df
      .crossJoin(broadcast(df.agg(max(col(dateCol)).as("__maxd"))))
      .groupBy(col(entityCol))
      .agg(
        min(datediff(to_date(col("__maxd")), to_date(col(dateCol))))
          .cast("long").as("r_days"),
        count(lit(1)).as("f"),
        sum(col(amountCol).cast(DecimalType(18, 2)))
          .cast(DecimalType(18, 2)).as("m"))
    def cuts(c: String) = (1 to 4).map(i => expr(
      s"percentile_disc(0.${i * 2}) WITHIN GROUP (ORDER BY $c)")
      .as(s"__${c}_$i"))
    val cutRow = per.agg(cuts("r_days").head,
      (cuts("r_days").tail ++ cuts("f") ++ cuts("m")): _*)
    def score(c: String) = (1 to 4)
      .map(i => (col(c) > col(s"__${c}_$i")).cast("int"))
      .reduce(_ + _) + 1
    per.crossJoin(broadcast(cutRow))
      // cuts/scores run on the exact DECIMAL m; only the rendered
      // column goes out as DOUBLE (§7.6 final-render rule).
      .select(col(entityCol), col("r_days"), col("f"),
        col("m").cast("double").as("m"),
        (lit(6) - score("r_days")).as("r_score"),
        score("f").as("f_score"),
        score("m").as("m_score"))
      .withColumn("segment", concat(col("r_score").cast("string"),
        col("f_score").cast("string"), col("m_score").cast("string")))
      .orderBy(entityCol)
  }

  /** Join-size pre-flight: the EXACT output cardinality of an
    * equi-join on `keyCol` between `left` and `right`, computed from
    * the two per-key count tables (Σ cL(k)·cR(k)) — the "will this
    * shuffle explode" question answered from two cheap aggregates
    * BEFORE paying for the join itself. Also reports the hottest
    * key's contribution. One row out; pairs with [[keySkew]] for the
    * per-key breakdown.
    *
    * Scale: two map-side-combined count aggregates, one equi-join of
    * count tables (|keys| rows each — the small residue of the big
    * tables), one 1-row fold. Everything integer-exact except the
    * 6-dp expansion ratio. */
  def joinSizeEstimate(left: DataFrame, right: DataFrame,
      keyCol: String): DataFrame = {
    val lc = left.groupBy(col(keyCol).as("k")).agg(count(lit(1)).as("cl"))
    val rc = right.groupBy(col(keyCol).as("k")).agg(count(lit(1)).as("cr"))
    val r6 = (c: Column) => round(c * lit(1000000.0)) / lit(1000000.0)
    val joined = lc.join(rc, "k")
      .select(col("k"), (col("cl") * col("cr")).as("pairs"))
    val totals = left.agg(count(lit(1)).as("left_rows"))
      .crossJoin(right.agg(count(lit(1)).as("right_rows")))
    joined
      .agg(count(lit(1)).as("matched_keys"),
        sum("pairs").as("est_rows"),
        max(struct(col("pairs"), col("k"))).as("__hot"))
      .crossJoin(broadcast(totals))
      .select(col("left_rows"), col("right_rows"), col("matched_keys"),
        col("est_rows"), col("__hot.k").as("hottest_key"),
        col("__hot.pairs").as("hottest_pairs"),
        r6(col("est_rows").cast("double") /
          greatest(col("left_rows"), col("right_rows")))
          .as("expansion"))
  }

  /** Lorenz curve + Gini coefficient of `valCol` concentration across
    * entities: per-decile cumulative share of the total held by the
    * bottom d·10% of entities (ranked poorest-first), and the Gini
    * `G = 2·Σ i·xᵢ / (n·Σx) − (n+1)/n` — the concentration audit
    * behind "the top 1% of customers drive 40% of revenue" and the
    * corpus-curation question "how skewed is my source mix".
    *
    * Scale design — the global rank/prefix-sum is TWO-LEVEL (the
    * sampleTokenBudget stance), because `ROW_NUMBER() OVER (ORDER BY
    * m)` at 10⁹ entities is a one-task sort: per-entity sums bucket
    * into 1024 value ranges that are prefix-aligned with the global
    * order, per-bucket (count, sum) fold into a ≤1024-row broadcast
    * offset table, and each bucket ranks/prefix-sums independently
    * (bucket-partitioned windows). All moments are DECIMAL-exact
    * integer-cent arithmetic; the three float readouts divide with
    * the identical IEEE op sequence in the oracle. */
  def lorenzGini(df: DataFrame, entityCol: String,
      valCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(18, 2)
    val per = df.groupBy(col(entityCol).as("e"))
      .agg(sum(col(valCol).cast(dec)).cast(dec).as("m"))
    val bounds = per.agg(min(col("m").cast("double")).as("__lo"),
      max(col("m").cast("double")).as("__hi"))
    val nBuckets = 1024
    val bucketed = per.crossJoin(broadcast(bounds))
      .withColumn("bkt",
        least(lit(nBuckets - 1), greatest(lit(0),
          floor((col("m").cast("double") - col("__lo")) * nBuckets /
            (col("__hi") - col("__lo") + lit(1e-9))))).cast("int"))
      .drop("__lo", "__hi")
    // ≤1024-row cumulative offsets (count + value sum per bucket)
    val wOff = Window.partitionBy(BoundedWindow.key(col("bkt")))
      .orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy("bkt")
      .agg(count(lit(1)).as("nb"), sum("m").as("sb"))
      .select(col("bkt"),
        coalesce(sum(col("nb")).over(wOff), lit(0L)).as("off_n"),
        coalesce(sum(col("sb")).over(wOff), lit(0).cast(dec))
          .as("off_s"))
    val wIn = Window.partitionBy("bkt").orderBy(col("m"), col("e"))
    val ranked = bucketed.join(broadcast(offsets), "bkt")
      .withColumn("i", col("off_n") + row_number().over(wIn))
      .withColumn("cum", col("off_s") +
        sum("m").over(wIn.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
    val tot = ranked.agg(count(lit(1)).as("n"), sum("m").as("tot"),
      sum(col("i") * col("m")).as("s"))
    val r6 = (c: Column) => round(c * lit(1000000.0)) / lit(1000000.0)
    val deciles = df.sparkSession.range(1, 11)
      .select(col("id").cast("int").as("decile"))
    val nD = col("n").cast("double")
    ranked.crossJoin(broadcast(tot))
      .join(broadcast(deciles),
        col("i") === expr("n * decile div 10"))
      .select(col("decile"),
        r6(col("cum").cast("double") / col("tot").cast("double"))
          .as("cum_share"),
        r6(lit(2.0) * col("s").cast("double") /
            (nD * col("tot").cast("double")) -
          (nD + lit(1.0)) / nD).as("gini"))
      .orderBy("decile")
  }

  /** Per-group Tukey-fence outlier census: exact lower quartiles via
    * [[weightedQuantile]] (weight 1), IQR fences at 1.5·IQR, and the
    * row counts outside them — the box-plot numbers, exact at any
    * scale. Fences round to 6 dp BEFORE the comparison pass so both
    * engines classify every row against identical thresholds.
    *
    * Scale: two iterative quantile searches (each a handful of linear
    * scans with bucket folds) + one counting scan against the
    * broadcast |groups|-row fence table. */
  def iqrOutliers(df: DataFrame, groupCol: String, valCol: String)
      : DataFrame =
    iqrOutliersWith(df, groupCol, valCol,
      iqrFences(df, groupCol, valCol))

  /** The per-group quartile fence table behind [[iqrOutliers]] —
    * distribution statistics (the momentRow/ANALYZE stance), so the
    * registered query caches it per (session, corpus) and repeat
    * runs pay only the one counting pass. */
  private[graft] def iqrFences(df: DataFrame, groupCol: String,
      valCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val render = (c: Column) => c.cast(DecimalType(18, 2)).cast("double")
    val r6 = (c: Column) => round(c * lit(1000000.0)) / lit(1000000.0)
    val w = df.withColumn("__w", lit(1.0))
    val q1 = weightedQuantile(w, groupCol, valCol, "__w", 1, 4, render)
      .select(col(groupCol), col("wmedian").as("q1"))
    val q3 = weightedQuantile(w, groupCol, valCol, "__w", 3, 4, render)
      .select(col(groupCol), col("wmedian").as("q3"))
    q1.join(q3, groupCol)
      .select(col(groupCol), col("q1"), col("q3"),
        r6(col("q3") - col("q1")).as("iqr"),
        r6(col("q1") - lit(1.5) * (col("q3") - col("q1"))).as("lo_fence"),
        r6(col("q3") + lit(1.5) * (col("q3") - col("q1"))).as("hi_fence"))
  }

  /** [[iqrOutliers]]' counting half against a prebuilt (possibly
    * cached) fence table. */
  private[graft] def iqrOutliersWith(df: DataFrame, groupCol: String,
      valCol: String, fences: DataFrame): DataFrame = {
    df.join(broadcast(fences), groupCol)
      .groupBy(col(groupCol), col("q1"), col("q3"), col("iqr"),
        col("lo_fence"), col("hi_fence"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(valCol).cast("double") < col("lo_fence"), 1L)
          .otherwise(0L)).as("n_below"),
        sum(when(col(valCol).cast("double") > col("hi_fence"), 1L)
          .otherwise(0L)).as("n_above"))
      .select(col(groupCol), col("n"), col("q1"), col("q3"), col("iqr"),
        col("lo_fence"), col("hi_fence"), col("n_below"), col("n_above"))
      .orderBy(groupCol)
  }

  /** Herfindahl–Hirschman concentration index per group: the sum of
    * squared percentage shares (0..10000 scale; >2500 = "highly
    * concentrated" under the DOJ guideline) of each entity's value
    * within its group — [[lorenzGini]]'s antitrust-flavored sibling,
    * and the one that needs NO ranking at all.
    *
    * Scale: two keyed hash aggregates (entity rollup, group totals) +
    * a broadcast of the per-group totals; the share terms are IEEE-
    * identical doubles from DECIMAL-exact sums and the HHI total folds
    * in DECIMAL(38,12) (order-independent). */
  /** Derandomized Poisson-bootstrap confidence interval for the mean
    * of `valCol` — the distribution-free CI for any metric the
    * closed-form tier can't cover, computed in ONE pass over B
    * simultaneous resamples (Poisson bootstrap: each row enters
    * resample b with weight w ~ Poisson(1), Chamandy et al.'s
    * large-scale formulation — no per-resample data passes, no
    * sampling-with-replacement shuffle). The weights are
    * DERANDOMIZED: w = inverse-CDF ladder over the engine's 16-bit
    * md5 draw of (id, b) — the hashSplit/stratifiedSample stance —
    * with the seven cumulative thresholds fixed as integer literals,
    * so both engines (and any rerun/repartitioning) draw the
    * identical weights. Resample means percentile into the CI via
    * the integer-exact crossing rank·40 ≥ m / ≥ 39·m (2.5% / 97.5%).
    *
    * Scale: the explode is ×B per row but folds map-side into B
    * groups (each partition emits ≤B rows); the B-row mean table
    * sorts under a declared-bounded window. B trades cost for CI
    * resolution — the op is priced for metric-bearing tables, not
    * raw-corpus columns. */
  def bootstrapCiMean(df: DataFrame, idCol: String, valCol: String,
      b: Int = 200): DataFrame = {
    require(b >= 40 && b <= 10000, s"b must be in [40, 10000]; got $b")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val dec12 = DecimalType(38, 12)
    val r6 = (c: Column) => round(c * lit(1000000.0)) / lit(1000000.0)
    // Poisson(1) inverse CDF at 16-bit resolution: floor(65536·CDF(k))
    val cuts = Seq(24109, 48218, 60273, 64291, 65296, 65497, 65530)
    val draw = CurationOps.hashDraw(
      concat(col(idCol).cast("string"), lit(":"),
        col("rb").cast("string")))
    val w = cuts.zipWithIndex.foldLeft(when(lit(false), 0)) {
      case (acc, (cut, k)) => acc.when(draw < cut, k)
    }.otherwise(cuts.size)
    val resampled = df
      .select(col(idCol), col(valCol).cast("double").as("x"),
        explode(sequence(lit(0), lit(b - 1))).as("rb"))
      .select(col("rb"), w.as("w"), col("x"))
      .groupBy("rb")
      .agg(sum("w").as("ne"),
        sum((col("w") * col("x")).cast(dec12)).as("sx"))
      .filter(col("ne") > 0)
      .select(col("rb"),
        (col("sx").cast("double") / col("ne")).as("m"))
    val wRank = Window.partitionBy(BoundedWindow.key(col("rb")))
      .orderBy(col("m"), col("rb"))
    val ranked = resampled
      .select(col("m"), row_number().over(wRank).as("rn"))
    val boot = ranked.agg(
      count(lit(1)).as("m_valid"),
      sum(col("m").cast(dec12)).as("sm"),
      sum((col("m") * col("m")).cast(dec12)).as("smm"))
    val ci = ranked.crossJoin(broadcast(boot))
      .agg(
        min(when(col("rn") * 40 >= col("m_valid"), col("m")))
          .as("lo"),
        min(when(col("rn") * 40 >= col("m_valid") * 39, col("m")))
          .as("hi"),
        min("m_valid").as("m_valid"), min("sm").as("sm"),
        min("smm").as("smm"))
    val full = df.agg(count(lit(1)).as("n"),
      sum(col(valCol).cast(dec12)).as("sxf"))
    val mv = col("m_valid").cast("double")
    full.crossJoin(broadcast(ci))
      .select(col("n"),
        r6(col("sxf").cast("double") / col("n")).as("mean"),
        col("m_valid").cast("bigint").as("resamples"),
        r6(col("sm").cast("double") / mv).as("boot_mean"),
        r6(sqrt(greatest(
          (col("smm").cast("double") -
            col("sm").cast("double") * col("sm").cast("double") / mv) /
            (mv - 1), lit(0.0)))).as("boot_se"),
        r6(col("lo")).as("ci_lo"),
        r6(col("hi")).as("ci_hi"))
  }

  def hhi(df: DataFrame, groupCol: String, entityCol: String,
      valCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec2 = DecimalType(18, 2)
    val dec12 = DecimalType(38, 12)
    val per = df.groupBy(col(groupCol), col(entityCol))
      .agg(sum(col(valCol).cast(dec2)).cast(dec2).as("m"))
    val tot = per.groupBy(col(groupCol))
      .agg(sum("m").as("__t"), count(lit(1)).as("n_entities"))
    val r6 = (c: Column) => round(c * lit(1000000.0)) / lit(1000000.0)
    val share = lit(100.0) * (col("m").cast("double") /
      col("__t").cast("double"))
    per.join(broadcast(tot), groupCol)
      .groupBy(col(groupCol), col("n_entities"),
        col("__t").cast("double").as("total"))
      .agg(sum((share * share).cast(dec12)).as("__hhi"))
      .select(col(groupCol), col("n_entities"), col("total"),
        r6(col("__hhi").cast("double")).as("hhi"))
      .orderBy(groupCol)
  }

  /** Equal-frequency discretization (quantile binning) of a numeric
    * column — the generic feature-engineering primitive behind
    * [[rfm]]'s quintiles: `nBins−1` discrete quantile cuts computed
    * once and broadcast, rows assigned by exact `>` comparisons, and
    * the per-bin profile (count, min, max) returned. Equal-frequency
    * bins are what tree models and calibration tables want; the
    * equal-WIDTH twin is `q_histogram`.
    *
    * Scale: one percentile aggregate (cuts ride back as a broadcast
    * 1-row table — never a global ntile sort), one map-side-combined
    * per-bin fold. Cuts are stored values (percentile_disc) and the
    * rollups are exact DECIMAL/integer, so bins and profiles are
    * engine-identical. */
  def quantileBins(df: DataFrame, valCol: String,
      nBins: Int = 10): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(nBins >= 2 && nBins <= 1000, s"nBins in [2,1000]; got $nBins")
    val dec = DecimalType(18, 2)
    val v = col(valCol).cast(dec)
    // CUTS, distributed (the weightedMedian prune-then-verify
    // stance): Spark's own percentile_disc buffers the ENTIRE column
    // per aggregate — nine single-reducer sorted copies of the corpus
    // (measured 29 s on 6M rows; a 100 TB killer). And folding per
    // DISTINCT value first is itself a full shuffle on a near-unique
    // DOUBLE column (10⁸ distinct ⇒ 10⁸-row exchange). So bucket RAW
    // rows first: (1) one pass for bounds + total, (2) a map-side-
    // combined 1024-key bucket fold (the shuffle carries ≤1024 rows
    // per map partition regardless of value cardinality), (3) locate
    // each cut's crossing bucket through a ≤1024-row offset table,
    // (4) fold distinct values ONLY inside the ≤nBins−1 crossing
    // buckets (~nBins/1024 of the data) and read cut k as the
    // smallest value whose cumulative count reaches k·n/nBins — the
    // percentile_disc definition in EXACT integer arithmetic
    // (cm·nBins ≥ k·n), which the oracle states identically. Bucket
    // assignment is monotone in v, so the bucketed cumulative equals
    // the global one and the cuts are engine-identical.
    val nBuckets = 1024
    val bounds = df.agg(min(v.cast("double")).as("__lo"),
      max(v.cast("double")).as("__hi"), count(lit(1)).as("n"))
    def bucketOf(c: Column): Column =
      least(lit(nBuckets - 1), greatest(lit(0),
        floor((c.cast("double") - col("__lo")) * nBuckets /
          (col("__hi") - col("__lo") + lit(1e-9))))).cast("int")
    val wOff = Window.partitionBy(BoundedWindow.key(col("bkt")))
      .orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = df.crossJoin(broadcast(bounds))
      .groupBy(bucketOf(v).as("bkt"))
      .agg(count(lit(1)).as("bc"), min("n").as("n"))
      .select(col("bkt"), col("bc"), col("n"),
        coalesce(sum(col("bc")).over(wOff), lit(0L)).as("off"))
    val ks = df.sparkSession.range(1, nBins)
      .select(col("id").cast("long").as("k"))
    // bucket b is cut k's crossing bucket iff the count before b is
    // short of k·n/nBins and b's last value reaches it
    val crossing = offsets.join(broadcast(ks),
        col("off") * lit(nBins) < col("k") * col("n") &&
          (col("off") + col("bc")) * lit(nBins) >= col("k") * col("n"))
      .select(col("k"), col("bkt"), col("off"), col("n"))
    val wIn = Window.partitionBy("bkt").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = df.crossJoin(broadcast(bounds.select("__lo", "__hi")))
      .withColumn("bkt", bucketOf(v))
      .join(broadcast(crossing.select("bkt", "off", "n").distinct()),
        "bkt")
      .groupBy(col("bkt"), v.as("v"))
      .agg(count(lit(1)).as("c"), min("off").as("off"),
        min("n").as("n"))
      .withColumn("cm", col("off") + sum("c").over(wIn))
    val cuts = cum.join(broadcast(crossing.select("k", "bkt")), "bkt")
      .filter(col("cm") * lit(nBins) >= col("k") * col("n"))
      .groupBy("k").agg(min("v").as("cut"))
    val cutRow = cuts.agg(
      max(when(col("k") === 1, col("cut"))).as("__c1"),
      (2 until nBins).map(i =>
        max(when(col("k") === i, col("cut"))).as(s"__c$i")): _*)
    val bin = (1 until nBins)
      .map(i => (v > col(s"__c$i")).cast("int"))
      .reduce(_ + _) + 1
    df.crossJoin(broadcast(cutRow))
      .groupBy(bin.as("bin"))
      // bin assignment runs on the exact DECIMAL v; bounds render as
      // DOUBLE (§7.6 final-render rule).
      .agg(count(lit(1)).as("n"),
        min(v).cast("double").as("lo"),
        max(v).cast("double").as("hi"))
      .orderBy("bin")
  }

  val all: Seq[Query] = Seq(
    // Pareto frontier of orders over (totalprice ↑, orderdate ↑): the
    // orders no other order beats on both value and recency. The
    // oracle runs the textbook one-pass sort-scan over ALL distinct
    // points; hash-green therefore pins the engine's two-phase
    // bucket-prune + verify as EXACTLY frontier-preserving.
    Query(
      "q_skyline",
      Some("""WITH pts AS (
                SELECT DISTINCT CAST(o_totalprice AS DECIMAL(18,2)) AS price,
                       o_orderdate AS odate FROM orders),
              rk AS (SELECT price, odate,
                            max(odate) OVER (ORDER BY price DESC, odate DESC
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING) AS mx
                     FROM pts),
              fr AS (SELECT price, odate FROM rk
                     WHERE mx IS NULL OR odate > mx)
              SELECT o.o_orderkey,
                     CAST(CAST(o.o_totalprice AS DECIMAL(18,2))
                       AS DOUBLE) AS price,
                     o.o_orderdate AS odate
              FROM orders o
              JOIN fr ON CAST(o.o_totalprice AS DECIMAL(18,2)) = fr.price
                     AND o.o_orderdate = fr.odate
              ORDER BY price DESC, o.o_orderkey"""),
      (s, d) => {
        val ord = Tables.orders(s, d)
          .select(col("o_orderkey"),
            col("o_totalprice").cast("decimal(18,2)").as("price"),
            col("o_orderdate").as("odate"))
        ord.join(
            skyline(ord, "price", "odate")
              .select(col("x").as("price"), col("y").as("odate")),
            Seq("price", "odate"))
          // join/frontier math on the exact DECIMAL; DOUBLE render
          // (§7.6 final-render rule)
          .select(col("o_orderkey"),
            col("price").cast("double").as("price"), col("odate"))
          .orderBy(col("price").desc, col("o_orderkey"))
      }),

    // Winsorized per-flag mean of lineitem extendedprice, p05/p95
    // discrete clamps. percentile_disc picks ACTUAL stored doubles on
    // both engines — no interpolation drift — and the means sum exact
    // DECIMAL cents.
    Query(
      "q_winsorize",
      Some("""WITH cuts AS (
                SELECT l_returnflag,
                       quantile_disc(l_extendedprice, 0.05) AS p_lo,
                       quantile_disc(l_extendedprice, 0.95) AS p_hi
                FROM lineitem GROUP BY l_returnflag)
              SELECT l.l_returnflag, count(*) AS n,
                     CAST(CAST(min(c.p_lo) AS DECIMAL(18,2))
                       AS DOUBLE) AS p_lo,
                     CAST(CAST(max(c.p_hi) AS DECIMAL(18,2))
                       AS DOUBLE) AS p_hi,
                     round(CAST(sum(CAST(l.l_extendedprice
                         AS DECIMAL(18,2))) AS DOUBLE)
                       / count(*) * 1000000.0) / 1000000.0 AS mean_raw,
                     round(CAST(sum(CAST(least(greatest(l.l_extendedprice,
                           c.p_lo), c.p_hi) AS DECIMAL(18,2))) AS DOUBLE)
                       / count(*) * 1000000.0) / 1000000.0 AS mean_wins
              FROM lineitem l JOIN cuts c USING (l_returnflag)
              GROUP BY l.l_returnflag
              ORDER BY l.l_returnflag"""),
      (s, d) => winsorizedMean(Tables.lineitem(s, d), "l_returnflag",
          "l_extendedprice")
        .orderBy("l_returnflag")),

    // A/B readout: customers split 50/50 by hash draw; conversion =
    // placed at least one >$480k order. Integer-exact to the last
    // division; z repeated per row so the 2-row result carries the
    // whole readout.
    Query(
      "q_ab_metrics",
      Some(s"""WITH v AS (
                 SELECT c_custkey AS unit,
                        CASE WHEN ${CurationOps.sqlDraw("c_custkey")} < 32768
                          THEN 'A' ELSE 'B' END AS variant
                 FROM customer),
               conv AS (
                 SELECT v.unit, v.variant,
                        max(CASE WHEN o.o_totalprice > 480000
                            THEN 1 ELSE 0 END) AS converted
                 FROM v LEFT JOIN orders o ON v.unit = o.o_custkey
                 GROUP BY v.unit, v.variant),
               per AS (
                 SELECT variant, count(*) AS n_units,
                        CAST(sum(converted) AS BIGINT) AS n_conv
                 FROM conv GROUP BY variant),
               tot AS (
                 SELECT sum(CASE WHEN variant = 'A' THEN n_units END) AS na,
                        sum(CASE WHEN variant = 'A' THEN n_conv END) AS ca,
                        sum(CASE WHEN variant = 'B' THEN n_units END) AS nb,
                        sum(CASE WHEN variant = 'B' THEN n_conv END) AS cb
                 FROM per)
               SELECT variant, n_units, n_conv,
                      round(n_conv * 1.0 / n_units * 1000000.0)
                        / 1000000.0 AS rate,
                      round((ca * 1.0 / na - cb * 1.0 / nb)
                        / sqrt(((ca + cb) * 1.0 / (na + nb))
                          * (1.0 - (ca + cb) * 1.0 / (na + nb))
                          * (1.0 / na + 1.0 / nb))
                        * 1000000.0) / 1000000.0 AS z
               FROM per CROSS JOIN tot ORDER BY variant"""),
      (s, d) => abMetrics(Tables.customer(s, d), "c_custkey",
          Tables.orders(s, d).filter(col("o_totalprice") > 480000)
            .select("o_custkey"), "o_custkey")
        .orderBy("variant")),

    // CUPED over the hash-split customers: 1995 spend adjusted by
    // 1994 spend. Spend autocorrelates across years, so the variance
    // reduction is large and the hash pins it exactly.
    Query(
      "q_cuped",
      Some(s"""WITH per AS (
                 SELECT c.c_custkey,
                        CASE WHEN ${CurationOps.sqlDraw("c.c_custkey")}
                          < 32768 THEN 'A' ELSE 'B' END AS arm,
                        coalesce(sum(CASE WHEN year(o.o_orderdate) = 1994
                          THEN CAST(o.o_totalprice AS DECIMAL(18,2))
                          END), 0) AS pre,
                        coalesce(sum(CASE WHEN year(o.o_orderdate) = 1995
                          THEN CAST(o.o_totalprice AS DECIMAL(18,2))
                          END), 0) AS post
                 FROM customer c LEFT JOIN orders o
                   ON c.c_custkey = o.o_custkey
                 GROUP BY 1, 2),
               m AS (
                 SELECT arm, count(*) AS n,
                        sum(CAST(CAST(pre AS DOUBLE)
                          AS DECIMAL(38,12))) AS sx,
                        sum(CAST(CAST(post AS DOUBLE)
                          AS DECIMAL(38,12))) AS sy,
                        sum(CAST(CAST(pre AS DOUBLE)
                            * CAST(pre AS DOUBLE)
                          AS DECIMAL(38,12))) AS sxx,
                        sum(CAST(CAST(post AS DOUBLE)
                            * CAST(post AS DOUBLE)
                          AS DECIMAL(38,12))) AS syy,
                        sum(CAST(CAST(pre AS DOUBLE)
                            * CAST(post AS DOUBLE)
                          AS DECIMAL(38,12))) AS sxy
                 FROM per GROUP BY arm),
               t AS (
                 SELECT CAST(sum(n) AS DOUBLE) AS nt,
                        CAST(sum(sx) AS DOUBLE) AS tsx,
                        CAST(sum(sy) AS DOUBLE) AS tsy,
                        CAST(sum(sxx) AS DOUBLE) AS tsxx,
                        CAST(sum(sxy) AS DOUBLE) AS tsxy
                 FROM m),
               th AS (
                 SELECT nt, tsx / nt AS mu_x,
                        CASE WHEN (tsxx - tsx * tsx / nt) / (nt - 1) > 0
                          THEN ((tsxy - tsx * tsy / nt) / (nt - 1))
                            / ((tsxx - tsx * tsx / nt) / (nt - 1))
                          ELSE 0.0 END AS theta
                 FROM t),
               f AS (
                 SELECT arm, n, theta, mu_x,
                        CAST(sy AS DOUBLE) / n AS mean_y,
                        CAST(sx AS DOUBLE) / n AS mean_x,
                        (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
                          * CAST(sy AS DOUBLE) / n) / (n - 1) AS var_y,
                        (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                          * CAST(sx AS DOUBLE) / n) / (n - 1) AS var_x,
                        (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
                          * CAST(sy AS DOUBLE) / n) / (n - 1) AS cov_a
                 FROM m CROSS JOIN th)
               SELECT arm, CAST(n AS BIGINT) AS n,
                      round(mean_y * 1000000.0)/1000000.0 AS mean_raw,
                      round((mean_y - theta * (mean_x - mu_x))
                        * 1000000.0)/1000000.0 AS mean_adj,
                      round(theta * 1000000.0)/1000000.0 AS theta,
                      round(CASE WHEN n > 1 THEN var_y END
                        * 1000000.0)/1000000.0 AS var_raw,
                      round(CASE WHEN n > 1 THEN var_y
                          - theta * cov_a * 2
                          + theta * theta * var_x END
                        * 1000000.0)/1000000.0 AS var_adj,
                      round(CASE WHEN n > 1 AND var_y > 0 THEN
                          1.0 - (var_y - theta * cov_a * 2
                            + theta * theta * var_x) / var_y END
                        * 1000000.0)/1000000.0 AS var_reduction
               FROM f ORDER BY arm"""),
      (s, d) => {
        import org.apache.spark.sql.types.DecimalType
        val dec2 = DecimalType(18, 2)
        val per = Tables.customer(s, d).select(col("c_custkey"))
          .join(Tables.orders(s, d),
            col("c_custkey") === col("o_custkey"), "left")
          .groupBy("c_custkey")
          .agg(
            coalesce(sum(when(year(col("o_orderdate")) === 1994,
              col("o_totalprice").cast(dec2))), lit(0).cast(dec2))
              .as("pre"),
            coalesce(sum(when(year(col("o_orderdate")) === 1995,
              col("o_totalprice").cast(dec2))), lit(0).cast(dec2))
              .as("post"))
          .withColumn("arm",
            when(CurationOps.hashDraw(col("c_custkey")) < 32768, "A")
              .otherwise("B"))
        cuped(per, "arm", "pre", "post")
      }),

    // Revenue-per-order per arm with the delta-method interval — the
    // ratio metric a per-unit average would get wrong.
    Query(
      "q_delta_method",
      Some(s"""WITH per AS (
                 SELECT c.c_custkey,
                        CASE WHEN ${CurationOps.sqlDraw("c.c_custkey")}
                          < 32768 THEN 'A' ELSE 'B' END AS arm,
                        coalesce(sum(CAST(o.o_totalprice
                          AS DECIMAL(18,2))), 0) AS rev,
                        count(o.o_orderkey) AS n_ord
                 FROM customer c LEFT JOIN orders o
                   ON c.c_custkey = o.o_custkey
                 GROUP BY 1, 2),
               m AS (
                 SELECT arm, count(*) AS n,
                        sum(CAST(CAST(rev AS DOUBLE)
                          AS DECIMAL(38,12))) AS sy,
                        sum(CAST(CAST(n_ord AS DOUBLE)
                          AS DECIMAL(38,12))) AS sx,
                        sum(CAST(CAST(rev AS DOUBLE)
                            * CAST(rev AS DOUBLE)
                          AS DECIMAL(38,12))) AS syy,
                        sum(CAST(CAST(n_ord AS DOUBLE)
                            * CAST(n_ord AS DOUBLE)
                          AS DECIMAL(38,12))) AS sxx,
                        sum(CAST(CAST(n_ord AS DOUBLE)
                            * CAST(rev AS DOUBLE)
                          AS DECIMAL(38,12))) AS sxy
                 FROM per GROUP BY arm),
               f AS (
                 SELECT arm, n,
                        CAST(sx AS DOUBLE) / n AS mx,
                        CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE) AS r,
                        CAST(sx AS DOUBLE) AS sxd,
                        (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
                          * CAST(sy AS DOUBLE) / n) / (n - 1) AS vy,
                        (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                          * CAST(sx AS DOUBLE) / n) / (n - 1) AS vx,
                        (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
                          * CAST(sy AS DOUBLE) / n) / (n - 1) AS cxy
                 FROM m),
               g AS (
                 SELECT arm, n, sxd, r,
                        sqrt(greatest((vy - r * cxy * 2 + r * r * vx)
                          / (n * mx * mx), 0.0)) AS se
                 FROM f)
               SELECT arm, CAST(n AS BIGINT) AS n,
                      round(CASE WHEN sxd <> 0 THEN r END
                        * 1000000.0)/1000000.0 AS ratio,
                      round(CASE WHEN n > 1 AND sxd > 0 THEN se END
                        * 1000000.0)/1000000.0 AS se,
                      round(CASE WHEN n > 1 AND sxd > 0 THEN
                          r - 1.959964 * se END
                        * 1000000.0)/1000000.0 AS ci_lo,
                      round(CASE WHEN n > 1 AND sxd > 0 THEN
                          r + 1.959964 * se END
                        * 1000000.0)/1000000.0 AS ci_hi
               FROM g ORDER BY arm"""),
      (s, d) => {
        import org.apache.spark.sql.types.DecimalType
        val dec2 = DecimalType(18, 2)
        val per = Tables.customer(s, d).select(col("c_custkey"))
          .join(Tables.orders(s, d),
            col("c_custkey") === col("o_custkey"), "left")
          .groupBy("c_custkey")
          .agg(
            coalesce(sum(col("o_totalprice").cast(dec2)),
              lit(0).cast(dec2)).as("rev"),
            count(col("o_orderkey")).as("n_ord"))
          .withColumn("arm",
            when(CurationOps.hashDraw(col("c_custkey")) < 32768, "A")
              .otherwise("B"))
        deltaMethod(per, "arm", "rev", "n_ord")
      }),

    // Did arm A's customers grow their spend 1994→1995 more than arm
    // B's — the panel difference-in-differences on the CUPED fixture.
    Query(
      "q_did",
      Some(s"""WITH per AS (
                 SELECT c.c_custkey,
                        CASE WHEN ${CurationOps.sqlDraw("c.c_custkey")}
                          < 32768 THEN 'A' ELSE 'B' END AS arm,
                        coalesce(sum(CASE WHEN year(o.o_orderdate) = 1994
                          THEN CAST(o.o_totalprice AS DECIMAL(18,2))
                          END), 0) AS pre,
                        coalesce(sum(CASE WHEN year(o.o_orderdate) = 1995
                          THEN CAST(o.o_totalprice AS DECIMAL(18,2))
                          END), 0) AS post
                 FROM customer c LEFT JOIN orders o
                   ON c.c_custkey = o.o_custkey
                 GROUP BY 1, 2),
               m AS (
                 SELECT (arm = 'A') AS treated, count(*) AS n,
                        sum(CAST(CAST(post AS DOUBLE)
                            - CAST(pre AS DOUBLE)
                          AS DECIMAL(38,12))) AS sd,
                        sum(CAST((CAST(post AS DOUBLE)
                              - CAST(pre AS DOUBLE))
                            * (CAST(post AS DOUBLE)
                              - CAST(pre AS DOUBLE))
                          AS DECIMAL(38,12))) AS sdd
                 FROM per GROUP BY 1),
               one AS (
                 SELECT
                   max(CASE WHEN treated THEN n END) AS n_treat,
                   max(CASE WHEN treated THEN sd END) AS sdt,
                   max(CASE WHEN treated THEN sdd END) AS sddt,
                   max(CASE WHEN NOT treated THEN n END) AS n_ctrl,
                   max(CASE WHEN NOT treated THEN sd END) AS sdc,
                   max(CASE WHEN NOT treated THEN sdd END) AS sddc
                 FROM m),
               f AS (
                 SELECT CAST(n_treat AS BIGINT) AS n_treat,
                        CAST(n_ctrl AS BIGINT) AS n_ctrl,
                        CAST(sdt AS DOUBLE) / n_treat AS mt,
                        CAST(sdc AS DOUBLE) / n_ctrl AS mc,
                        sqrt(((CAST(sddt AS DOUBLE)
                            - CAST(sdt AS DOUBLE) * CAST(sdt AS DOUBLE)
                              / n_treat) / (n_treat - 1)) / n_treat
                          + ((CAST(sddc AS DOUBLE)
                            - CAST(sdc AS DOUBLE) * CAST(sdc AS DOUBLE)
                              / n_ctrl) / (n_ctrl - 1)) / n_ctrl) AS se
                 FROM one)
               SELECT n_treat, n_ctrl,
                      round(CASE WHEN n_treat > 1 AND n_ctrl > 1
                        THEN mt END * 1000000.0)/1000000.0
                        AS delta_treat,
                      round(CASE WHEN n_treat > 1 AND n_ctrl > 1
                        THEN mc END * 1000000.0)/1000000.0
                        AS delta_ctrl,
                      round(CASE WHEN n_treat > 1 AND n_ctrl > 1
                        THEN mt - mc END * 1000000.0)/1000000.0 AS did,
                      round(CASE WHEN n_treat > 1 AND n_ctrl > 1
                        THEN se END * 1000000.0)/1000000.0 AS se,
                      round(CASE WHEN n_treat > 1 AND n_ctrl > 1
                          AND se > 0
                        THEN (mt - mc) / se END * 1000000.0)/1000000.0
                        AS z
               FROM f"""),
      (s, d) => {
        import org.apache.spark.sql.types.DecimalType
        val dec2 = DecimalType(18, 2)
        val per = Tables.customer(s, d).select(col("c_custkey"))
          .join(Tables.orders(s, d),
            col("c_custkey") === col("o_custkey"), "left")
          .groupBy("c_custkey")
          .agg(
            coalesce(sum(when(year(col("o_orderdate")) === 1994,
              col("o_totalprice").cast(dec2))), lit(0).cast(dec2))
              .as("pre"),
            coalesce(sum(when(year(col("o_orderdate")) === 1995,
              col("o_totalprice").cast(dec2))), lit(0).cast(dec2))
              .as("post"))
          .withColumn("arm",
            when(CurationOps.hashDraw(col("c_custkey")) < 32768, "A")
              .otherwise("B"))
        didEstimate(per, "arm", "A", "pre", "post")
      }),

    // Could this test even see the effect we care about — the MDE at
    // 80% power and the n each arm would need for the observed gap.
    Query(
      "q_power",
      Some("""WITH per AS (
                SELECT (o_orderstatus = 'F') AS isa, count(*) AS n,
                       sum(CAST(CAST(o_totalprice AS DOUBLE)
                         AS DECIMAL(38,12))) AS sx,
                       sum(CAST(CAST(o_totalprice AS DOUBLE)
                           * CAST(o_totalprice AS DOUBLE)
                         AS DECIMAL(38,12))) AS sxx
                FROM orders WHERE o_orderstatus IN ('F', 'O')
                GROUP BY 1),
              one AS (
                SELECT max(CASE WHEN isa THEN n END) AS n_a,
                       max(CASE WHEN isa THEN sx END) AS sxa,
                       max(CASE WHEN isa THEN sxx END) AS sxxa,
                       max(CASE WHEN NOT isa THEN n END) AS n_b,
                       max(CASE WHEN NOT isa THEN sx END) AS sxb,
                       max(CASE WHEN NOT isa THEN sxx END) AS sxxb
                FROM per),
              f AS (
                SELECT CAST(n_a AS BIGINT) AS n_a,
                       CAST(n_b AS BIGINT) AS n_b,
                       (CAST(sxxa AS DOUBLE) - CAST(sxa AS DOUBLE)
                         * CAST(sxa AS DOUBLE) / n_a) / (n_a - 1) AS va,
                       (CAST(sxxb AS DOUBLE) - CAST(sxb AS DOUBLE)
                         * CAST(sxb AS DOUBLE) / n_b) / (n_b - 1) AS vb,
                       CAST(sxa AS DOUBLE) / n_a
                         - CAST(sxb AS DOUBLE) / n_b AS delta
                FROM one)
              SELECT n_a, n_b,
                     round(CASE WHEN n_a > 1 AND n_b > 1 THEN delta END
                       * 1000000.0)/1000000.0 AS observed_delta,
                     round(CASE WHEN n_a > 1 AND n_b > 1 THEN
                         (1.959964 + 0.841621)
                           * sqrt(va / n_a + vb / n_b) END
                       * 1000000.0)/1000000.0 AS mde,
                     CASE WHEN n_a > 1 AND n_b > 1 AND delta <> 0.0
                       THEN CAST(ceil((1.959964 + 0.841621)
                         * (1.959964 + 0.841621) * (va + vb)
                         / (delta * delta)) AS BIGINT) END
                       AS n_per_arm_needed
              FROM f"""),
      (s, d) => powerAnalysis(Tables.orders(s, d), "o_orderstatus",
        "o_totalprice", "F", "O")),

    // Benford screen over order totals. TPC-H prices are sums of many
    // uniform draws, NOT Benford-distributed — the χ² column is
    // enormous by construction, and the hash pins all 9 rows of it
    // digit-for-digit.
    Query(
      "q_benford",
      Some("""WITH c AS (
                SELECT CAST(substring(CAST(CAST(floor(o_totalprice)
                         AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit,
                       count(*) AS n
                FROM orders WHERE o_totalprice >= 1
                GROUP BY 1),
              t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c)
              SELECT digit, n,
                     round(n * 1.0 / total * 1000000.0) / 1000000.0
                       AS obs_p,
                     round(log10(1.0 + 1.0 / digit) * 1000000.0)
                       / 1000000.0 AS exp_p,
                     round(pow(n * 1.0 - total * log10(1.0 + 1.0 / digit),
                           2)
                         / (total * log10(1.0 + 1.0 / digit))
                       * 1000000.0) / 1000000.0 AS chi2
              FROM c CROSS JOIN t ORDER BY digit"""),
      (s, d) => benford(Tables.orders(s, d), "o_totalprice")),

    // Quantity-weighted median price per return flag: the robust
    // volume-center the plain median misses. The (group, value)
    // pre-aggregate, the DECIMAL cumulative window and the integer-
    // exact crossing test make the hash pin every digit.
    Query(
      "q_weighted_median",
      Some("""WITH bv AS (
                SELECT l_returnflag, l_extendedprice AS v,
                       sum(CAST(l_quantity AS DECIMAL(38,6))) AS w
                FROM lineitem GROUP BY 1, 2),
              cm AS (
                SELECT l_returnflag, v, w,
                       sum(w) OVER (PARTITION BY l_returnflag ORDER BY v
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS cumw,
                       sum(w) OVER (PARTITION BY l_returnflag) AS total
                FROM bv)
              SELECT l_returnflag,
                     CAST(CAST(min(v) AS DECIMAL(18,2)) AS DOUBLE)
                       AS wmedian,
                     CAST(min(total) AS DOUBLE) AS total_w
              FROM cm WHERE cumw * 2 >= total
              GROUP BY l_returnflag
              ORDER BY l_returnflag"""),
      (s, d) => weightedMedian(Tables.lineitem(s, d), "l_returnflag",
          "l_extendedprice", "l_quantity")
        .orderBy("l_returnflag")),

    // Derandomized Poisson-bootstrap 95% CI on the mean order total
    // per priority — one wide aggregate, no resampled rows. The
    // oracle rebuilds all 64 replicates from the same md5 nibbles and
    // the same integer CDF thresholds, so even the interval
    // endpoints hash-match to 6 dp.
    Query(
      "q_bootstrap_ci",
      Some {
        val wExpr = PoissonT.map(t => s"(u >= $t)::INT")
          .mkString("(", " + ", ")")
        s"""WITH base AS (
              SELECT o_orderpriority AS g, o_totalprice AS x,
                     [md5(CAST(o_orderkey AS VARCHAR) || '#' || c)
                       for c in range(8)] AS hs
              FROM orders),
            u AS (
              SELECT g, x, b,
                     (instr('0123456789abcdef',
                        substr(hs[(b // 8) + 1], (b % 8) * 4 + 1, 1)) - 1)
                       * 4096
                   + (instr('0123456789abcdef',
                        substr(hs[(b // 8) + 1], (b % 8) * 4 + 2, 1)) - 1)
                       * 256
                   + (instr('0123456789abcdef',
                        substr(hs[(b // 8) + 1], (b % 8) * 4 + 3, 1)) - 1)
                       * 16
                   + (instr('0123456789abcdef',
                        substr(hs[(b // 8) + 1], (b % 8) * 4 + 4, 1)) - 1)
                       AS u
              FROM base CROSS JOIN range(0, 64) t(b)),
            rep AS (
              SELECT g, b,
                     CASE WHEN sum($wExpr) = 0 THEN NULL
                       ELSE CAST(sum(CAST($wExpr * x AS DECIMAL(38,6)))
                         AS DOUBLE) / sum($wExpr) END AS m
              FROM u GROUP BY g, b),
            stats AS (
              SELECT g, count(*) AS n,
                     CAST(sum(CAST(x AS DECIMAL(38,6))) AS DOUBLE)
                       / count(*) AS mean_raw,
                     round(CAST(sum(CAST(x AS DECIMAL(38,6))) AS DOUBLE)
                       / count(*) * 1000000.0) / 1000000.0 AS mean
              FROM base GROUP BY g),
            ord AS (
              SELECT rep.g, coalesce(m, s0.mean_raw) AS m,
                     row_number() OVER (PARTITION BY rep.g
                       ORDER BY coalesce(m, s0.mean_raw)) AS rn
              FROM rep JOIN stats s0 ON rep.g = s0.g)
            SELECT s.g AS o_orderpriority, s.n, s.mean,
                   round(lo.m * 1000000.0) / 1000000.0 AS ci_lo,
                   round(hi.m * 1000000.0) / 1000000.0 AS ci_hi
            FROM stats s
            JOIN ord lo ON lo.g = s.g AND lo.rn = 2
            JOIN ord hi ON hi.g = s.g AND hi.rn = 63
            ORDER BY o_orderpriority"""
      },
      (s, d) => bootstrapCi(Tables.orders(s, d), "o_orderpriority",
          "o_orderkey", "o_totalprice")
        .orderBy("o_orderpriority")),

    // Contingency + chi-square independence terms over order status x
    // priority. Counts and marginals are exact integers; expected and
    // chi2 use the identical IEEE op sequence on both engines.
    Query(
      "q_crosstab",
      Some("""WITH c AS (
                SELECT o_orderstatus, o_orderpriority, count(*) AS n
                FROM orders GROUP BY 1, 2),
              r AS (SELECT o_orderstatus, sum(n) AS rt
                    FROM c GROUP BY 1),
              k AS (SELECT o_orderpriority, sum(n) AS ct
                    FROM c GROUP BY 1),
              t AS (SELECT sum(n) AS total FROM c)
              SELECT c.o_orderstatus, c.o_orderpriority,
                     CAST(n AS BIGINT) AS n,
                     round(rt * 1.0 * ct / total * 1000000.0)
                       / 1000000.0 AS expected,
                     round((n - rt * 1.0 * ct / total)
                         * (n - rt * 1.0 * ct / total)
                         / (rt * 1.0 * ct / total) * 1000000.0)
                       / 1000000.0 AS chi2
              FROM c
              JOIN r USING (o_orderstatus)
              JOIN k USING (o_orderpriority)
              CROSS JOIN t
              ORDER BY o_orderstatus, o_orderpriority"""),
      (s, d) => crosstabChi2(Tables.orders(s, d), "o_orderstatus",
        "o_orderpriority")),

    // Hot-key profiler on lineitem's part join key: top-10 keys with
    // share / cumulative share / skew ratio vs the mean key.
    Query(
      "q_key_skew",
      Some("""WITH c AS (
                SELECT l_partkey AS key, count(*) AS cnt
                FROM lineitem GROUP BY 1),
              t AS (SELECT count(*) AS nkeys, sum(cnt) AS total FROM c),
              top AS (SELECT key, cnt FROM c
                      ORDER BY cnt DESC, key LIMIT 10)
              SELECT key, CAST(cnt AS BIGINT) AS cnt,
                     round(cnt * 1.0 / total * 1000000.0)
                       / 1000000.0 AS share,
                     round(sum(cnt) OVER (ORDER BY cnt DESC, key
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) * 1.0 / total * 1000000.0)
                       / 1000000.0 AS cum_share,
                     round(cnt * 1.0 * nkeys / total * 1000000.0)
                       / 1000000.0 AS skew
              FROM top CROSS JOIN t
              ORDER BY cnt DESC, key"""),
      (s, d) => keySkew(Tables.lineitem(s, d), "l_partkey")),

    // RFM segmentation of customers over orders: quintile cuts via
    // percentile_disc broadcast back - never a global ntile sort.
    Query(
      "q_rfm",
      Some("""WITH mx AS (SELECT max(o_orderdate) AS maxd FROM orders),
              per AS (
                SELECT o_custkey,
                       CAST(min(date_diff('day',
                           CAST(o_orderdate AS DATE),
                           CAST(maxd AS DATE))) AS BIGINT) AS r_days,
                       count(*) AS f,
                       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                         AS DECIMAL(18,2)) AS m
                FROM orders CROSS JOIN mx GROUP BY 1),
              c AS (
                SELECT
                  percentile_disc(0.2) WITHIN GROUP (ORDER BY r_days) AS r1,
                  percentile_disc(0.4) WITHIN GROUP (ORDER BY r_days) AS r2,
                  percentile_disc(0.6) WITHIN GROUP (ORDER BY r_days) AS r3,
                  percentile_disc(0.8) WITHIN GROUP (ORDER BY r_days) AS r4,
                  percentile_disc(0.2) WITHIN GROUP (ORDER BY f) AS f1,
                  percentile_disc(0.4) WITHIN GROUP (ORDER BY f) AS f2,
                  percentile_disc(0.6) WITHIN GROUP (ORDER BY f) AS f3,
                  percentile_disc(0.8) WITHIN GROUP (ORDER BY f) AS f4,
                  percentile_disc(0.2) WITHIN GROUP (ORDER BY m) AS m1,
                  percentile_disc(0.4) WITHIN GROUP (ORDER BY m) AS m2,
                  percentile_disc(0.6) WITHIN GROUP (ORDER BY m) AS m3,
                  percentile_disc(0.8) WITHIN GROUP (ORDER BY m) AS m4
                FROM per),
              s AS (
                SELECT o_custkey, r_days, f, m,
                       6 - (1 + CAST(r_days > r1 AS INT)
                              + CAST(r_days > r2 AS INT)
                              + CAST(r_days > r3 AS INT)
                              + CAST(r_days > r4 AS INT)) AS r_score,
                       1 + CAST(f > f1 AS INT) + CAST(f > f2 AS INT)
                         + CAST(f > f3 AS INT) + CAST(f > f4 AS INT)
                         AS f_score,
                       1 + CAST(m > m1 AS INT) + CAST(m > m2 AS INT)
                         + CAST(m > m3 AS INT) + CAST(m > m4 AS INT)
                         AS m_score
                FROM per CROSS JOIN c)
              SELECT o_custkey, r_days, CAST(f AS BIGINT) AS f,
                     CAST(m AS DOUBLE) AS m,
                     r_score, f_score, m_score,
                     CAST(r_score AS VARCHAR) ||
                     CAST(f_score AS VARCHAR) ||
                     CAST(m_score AS VARCHAR) AS segment
              FROM s ORDER BY o_custkey"""),
      (s, d) => rfm(Tables.orders(s, d), "o_custkey", "o_orderdate",
        "o_totalprice")),

    // Join-size pre-flight: exact equi-join output cardinality from
    // the two per-key count tables - the lineitem self-join on
    // l_partkey (the dedup/similarity pair space).
    Query(
      "q_join_size",
      Some("""WITH lc AS (SELECT l_partkey AS k, count(*) AS cl
                          FROM lineitem GROUP BY 1),
              j AS (SELECT a.k, a.cl * b.cl AS pairs
                    FROM lc a JOIN lc b ON a.k = b.k),
              hot AS (SELECT k, pairs FROM j
                      ORDER BY pairs DESC, k DESC LIMIT 1),
              t AS (SELECT count(*) AS matched_keys,
                           CAST(sum(pairs) AS BIGINT) AS est_rows
                    FROM j),
              n AS (SELECT count(*) AS left_rows FROM lineitem)
              SELECT left_rows, left_rows AS right_rows, matched_keys,
                     est_rows, hot.k AS hottest_key,
                     hot.pairs AS hottest_pairs,
                     round(est_rows * 1.0 /
                       greatest(left_rows, left_rows) * 1000000.0)
                       / 1000000.0 AS expansion
              FROM t CROSS JOIN n CROSS JOIN hot"""),
      (s, d) => joinSizeEstimate(Tables.lineitem(s, d),
        Tables.lineitem(s, d), "l_partkey")),

    // Customer-spend concentration: Lorenz deciles + Gini over
    // per-customer order totals. The oracle ranks with ONE global
    // window (fine in DuckDB); the engine's two-level prefix sum must
    // reproduce every rank, cum, and readout bit-for-bit.
    Query(
      "q_gini",
      Some("""WITH per AS (
                SELECT o_custkey AS e,
                       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                         AS DECIMAL(18,2)) AS m
                FROM orders GROUP BY 1),
              r AS (
                SELECT e, m,
                       row_number() OVER (ORDER BY m, e) AS i,
                       sum(m) OVER (ORDER BY m, e
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS cum
                FROM per),
              t AS (SELECT count(*) AS n, sum(m) AS tot,
                           sum(i * m) AS s
                    FROM r)
              SELECT CAST(d.range AS INT) AS decile,
                     round(CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE)
                       * 1000000.0) / 1000000.0 AS cum_share,
                     round((2.0 * CAST(s AS DOUBLE)
                         / (CAST(n AS DOUBLE) * CAST(tot AS DOUBLE))
                       - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE))
                       * 1000000.0) / 1000000.0 AS gini
              FROM r CROSS JOIN t
              JOIN range(1, 11) d ON i = (n * d.range) // 10
              ORDER BY decile"""),
      (s, d) => lorenzGini(Tables.orders(s, d), "o_custkey",
        "o_totalprice")),

    // Equal-frequency decile bins of lineitem price. The oracle
    // states the cut rule in the same exact integer arithmetic the
    // engine uses (smallest v with cum*10 >= k*n == percentile_disc
    // at k/10), so there is no float percentile boundary to diverge.
    Query(
      "q_quantile_bins",
      Some {
        val cast = "CAST(l_extendedprice AS DECIMAL(18,2))"
        val pivot = (1 to 9).map(i =>
          s"max(CASE WHEN k = $i THEN cut END) AS c$i")
          .mkString(",\n                  ")
        val bin = (1 to 9).map(i => s"CAST($cast > c$i AS INT)")
          .mkString(" + ")
        s"""WITH vc AS (
                SELECT $cast AS v, count(*) AS c
                FROM lineitem GROUP BY 1),
              t AS (SELECT sum(c) AS n FROM vc),
              cum AS (
                SELECT v, sum(c) OVER (ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING
                  AND CURRENT ROW) AS cm
                FROM vc),
              cuts AS (
                SELECT k, min(v) AS cut
                FROM cum CROSS JOIN t
                JOIN range(1, 10) r(k) ON cm * 10 >= k * n
                GROUP BY k),
              c AS (
                SELECT
                  $pivot
                FROM cuts)
              SELECT 1 + $bin AS bin,
                     count(*) AS n,
                     CAST(min($cast) AS DOUBLE) AS lo,
                     CAST(max($cast) AS DOUBLE) AS hi
              FROM lineitem CROSS JOIN c
              GROUP BY 1 ORDER BY bin"""
      },
      (s, d) => quantileBins(Tables.lineitem(s, d), "l_extendedprice")),

    // Mutual information between order status and priority: per-cell
    // pointwise-MI contributions plus the DECIMAL(38,12)-summed total
    // repeated per row (the q_entropy drift stance).
    Query(
      "q_mutual_info",
      Some("""WITH c AS (
                SELECT o_orderstatus AS a, o_orderpriority AS b,
                       count(*) AS n
                FROM orders GROUP BY 1, 2),
              r AS (SELECT a, sum(n) AS rt FROM c GROUP BY 1),
              k AS (SELECT b, sum(n) AS ct FROM c GROUP BY 1),
              t AS (SELECT sum(n) AS total FROM c),
              terms AS (
                SELECT a, b, n,
                       CAST(n AS DOUBLE) / total
                         * ln(CAST(n AS DOUBLE) * total
                             / (CAST(rt AS DOUBLE) * ct)) / ln(2) AS term
                FROM c JOIN r USING (a) JOIN k USING (b) CROSS JOIN t),
              m AS (SELECT sum(CAST(term AS DECIMAL(38,12))) AS mi
                    FROM terms)
              SELECT a AS o_orderstatus, b AS o_orderpriority, n,
                     round(term * 1000000.0) / 1000000.0 AS mi_term,
                     round(CAST(mi AS DOUBLE) * 1000000.0) / 1000000.0
                       AS mi_total
              FROM terms CROSS JOIN m ORDER BY a, b"""),
      (s, d) => mutualInfo(Tables.orders(s, d), "o_orderstatus",
        "o_orderpriority")),

    // Cramér's V effect size for the same contingency — the
    // comparable-across-tables strength-of-association readout.
    Query(
      "q_cramers_v",
      Some("""WITH c AS (
                SELECT o_orderstatus AS a, o_orderpriority AS b,
                       count(*) AS n
                FROM orders GROUP BY 1, 2),
              r AS (SELECT a, sum(n) AS rt FROM c GROUP BY 1),
              k AS (SELECT b, sum(n) AS ct FROM c GROUP BY 1),
              t AS (SELECT sum(n) AS total FROM c),
              s AS (
                SELECT sum(CAST(
                         (n - CAST(rt AS DOUBLE) * ct / total)
                         * (n - CAST(rt AS DOUBLE) * ct / total)
                         / (CAST(rt AS DOUBLE) * ct / total)
                       AS DECIMAL(38,12))) AS chi2o,
                       sum(CAST(CAST(rt AS DOUBLE) * ct / total
                         AS DECIMAL(38,12))) AS esum,
                       count(*) AS n_cells,
                       CAST(min(total) AS BIGINT) AS n
                FROM c JOIN r USING (a) JOIN k USING (b) CROSS JOIN t),
              d AS (SELECT count(DISTINCT a) AS ra,
                           count(DISTINCT b) AS cb FROM c),
              f AS (SELECT n, n_cells,
                           CAST(chi2o AS DOUBLE)
                             + (n - CAST(esum AS DOUBLE)) AS chi2raw
                    FROM s)
              SELECT n, n_cells, least(ra, cb) - 1 AS dof,
                     round(chi2raw * 1000000.0) / 1000000.0 AS chi2,
                     round(sqrt(chi2raw / n / (least(ra, cb) - 1))
                       * 1000000.0) / 1000000.0 AS v
              FROM f CROSS JOIN d"""),
      (s, d) => cramersV(Tables.orders(s, d), "o_orderstatus",
        "o_orderpriority")),

    // Is return flag independent of line status — the significance
    // readout q_cramers_v's effect size omits: full (r−1)(c−1) dof
    // and an upper-tail Wilson–Hilferty p-value.
    Query(
      "q_chisq_test",
      Some(s"""WITH c AS (
                SELECT l_returnflag AS a, l_linestatus AS b,
                       count(*) AS n
                FROM lineitem GROUP BY 1, 2),
              r AS (SELECT a, sum(n) AS rt FROM c GROUP BY 1),
              k AS (SELECT b, sum(n) AS ct FROM c GROUP BY 1),
              t AS (SELECT sum(n) AS total FROM c),
              s AS (
                SELECT sum(CAST(
                         (n - CAST(rt AS DOUBLE) * ct / total)
                         * (n - CAST(rt AS DOUBLE) * ct / total)
                         / (CAST(rt AS DOUBLE) * ct / total)
                       AS DECIMAL(38,12))) AS chi2o,
                       sum(CAST(CAST(rt AS DOUBLE) * ct / total
                         AS DECIMAL(38,12))) AS esum,
                       CAST(min(total) AS BIGINT) AS n
                FROM c JOIN r USING (a) JOIN k USING (b) CROSS JOIN t),
              d AS (SELECT count(DISTINCT a) AS ra,
                           count(DISTINCT b) AS cb FROM c),
              f AS (SELECT n,
                           CAST(chi2o AS DOUBLE)
                             + (n - CAST(esum AS DOUBLE)) AS chi2raw,
                           CAST((ra - 1) * (cb - 1) AS DOUBLE) AS kd,
                           CAST((ra - 1) * (cb - 1) AS BIGINT) AS dof
                    FROM s CROSS JOIN d),
              z AS (SELECT n, dof, chi2raw, kd,
                           CASE WHEN kd > 0 THEN
                             (pow(chi2raw / kd, 1.0 / 3.0) - 1.0
                               + 2.0 / (9.0 * kd))
                               * sqrt(9.0 * kd / 2) END AS z
                    FROM f)
              SELECT n, dof,
                     round(CASE WHEN kd > 0 THEN chi2raw END
                       * 1000000.0)/1000000.0 AS chi2,
                     round(CASE
                         WHEN kd = 1 THEN ${graft.operators
                           .HypothesisOps
                           .sqlTwoSidedNormalP("sqrt(chi2raw)")}
                         WHEN kd = 2 THEN exp(chi2raw / -2)
                         WHEN kd > 2 THEN ${graft.operators
                           .HypothesisOps.sqlUpperNormalP("z")} END
                       * 1000000.0)/1000000.0 AS p_value
              FROM z"""),
      (s, d) => chisqTest(Tables.lineitem(s, d), "l_returnflag",
        "l_linestatus")),

    // Cohen's κ between two heuristic document quality screens
    // (length ≥ 30 tokens vs distinct-token ratio ≥ 0.5): the
    // label-agreement primitive — κ says whether two labelers agree
    // beyond their base rates, the question every weak-supervision
    // pipeline asks before trusting a vote.
    Query(
      "q_kappa",
      Some("""WITH s AS (
                SELECT (len(string_split(text, ' ')) >= 30) AS a,
                       (CAST(len(list_distinct(string_split(text, ' ')))
                          AS DOUBLE)
                        / len(string_split(text, ' ')) >= 0.5) AS b
                FROM documents),
              agg AS (
                SELECT count(*) AS n,
                       CAST(sum((a AND b)::INT) AS BIGINT) AS n11,
                       CAST(sum((a AND NOT b)::INT) AS BIGINT) AS n10,
                       CAST(sum((NOT a AND b)::INT) AS BIGINT) AS n01,
                       CAST(sum((NOT a AND NOT b)::INT) AS BIGINT) AS n00
                FROM s)
              SELECT n, n11, n10, n01, n00,
                     round(CAST(n11 + n00 AS DOUBLE) / n * 1000000.0)
                       / 1000000.0 AS po,
                     round((CAST(n11 + n10 AS DOUBLE) / n
                           * (CAST(n11 + n01 AS DOUBLE) / n)
                         + CAST(n01 + n00 AS DOUBLE) / n
                           * (CAST(n10 + n00 AS DOUBLE) / n))
                       * 1000000.0) / 1000000.0 AS pe,
                     round((CAST(n11 + n00 AS DOUBLE) / n
                         - (CAST(n11 + n10 AS DOUBLE) / n
                             * (CAST(n11 + n01 AS DOUBLE) / n)
                           + CAST(n01 + n00 AS DOUBLE) / n
                             * (CAST(n10 + n00 AS DOUBLE) / n)))
                       / (1.0 - (CAST(n11 + n10 AS DOUBLE) / n
                             * (CAST(n11 + n01 AS DOUBLE) / n)
                           + CAST(n01 + n00 AS DOUBLE) / n
                             * (CAST(n10 + n00 AS DOUBLE) / n)))
                       * 1000000.0) / 1000000.0 AS kappa
              FROM agg"""),
      (s, d) => {
        val t = TextOps.tokens(col("text"))
        cohenKappa(
          Tables.documents(s, d).select(
            (size(t) >= 30).as("len_ok"),
            (size(array_distinct(t)).cast("double") / size(t) >= 0.5)
              .as("div_ok")),
          "len_ok", "div_ok")
      }),

    // How much more likely is an urgent order to be finished — the
    // OR/RR effect sizes with Wald CIs that chi2's p alone can't give.
    Query(
      "q_odds_ratio",
      Some(s"""WITH s AS (
                SELECT (o_orderpriority = '1-URGENT') AS ex,
                       (o_orderstatus = 'F') AS oc
                FROM orders),
              agg AS (
                SELECT CAST(sum((ex AND oc)::INT) AS BIGINT) AS a,
                       CAST(sum((ex AND NOT oc)::INT) AS BIGINT) AS b,
                       CAST(sum((NOT ex AND oc)::INT) AS BIGINT) AS c,
                       CAST(sum((NOT ex AND NOT oc)::INT) AS BIGINT)
                         AS d
                FROM s),
              c0 AS (SELECT a, b, c, d,
                       CAST(a AS DOUBLE) AS ad, CAST(b AS DOUBLE) AS bd,
                       CAST(c AS DOUBLE) AS cd, CAST(d AS DOUBLE) AS dd
                     FROM agg),
              e AS (SELECT *,
                      ad * dd / (bd * cd) AS orr,
                      sqrt(1.0 / ad + 1.0 / bd + 1.0 / cd + 1.0 / dd)
                        AS selo,
                      (ad / (ad + bd)) / (cd / (cd + dd)) AS rr,
                      sqrt(1.0 / ad - 1.0 / (ad + bd) + 1.0 / cd
                        - 1.0 / (cd + dd)) AS selr
                    FROM c0
                    WHERE a > 0 AND b > 0 AND c > 0 AND d > 0),
              z AS (SELECT *, ln(orr) / selo AS z FROM e)
              SELECT a, b, c, d,
                     round(orr * 1000000.0)/1000000.0 AS odds_ratio,
                     round(exp(ln(orr) - 1.96 * selo)
                       * 1000000.0)/1000000.0 AS or_lo,
                     round(exp(ln(orr) + 1.96 * selo)
                       * 1000000.0)/1000000.0 AS or_hi,
                     round(rr * 1000000.0)/1000000.0 AS risk_ratio,
                     round(exp(ln(rr) - 1.96 * selr)
                       * 1000000.0)/1000000.0 AS rr_lo,
                     round(exp(ln(rr) + 1.96 * selr)
                       * 1000000.0)/1000000.0 AS rr_hi,
                     round(${graft.operators.HypothesisOps
                       .sqlTwoSidedNormalP("z")}
                       * 1000000.0)/1000000.0 AS p_value
              FROM z"""),
      (s, d) => oddsRatio(Tables.orders(s, d)
          .select((col("o_orderpriority") === "1-URGENT").as("ex"),
            (col("o_orderstatus") === "F").as("oc")),
        "ex", "oc")),

    // The always-valid p-value under daily peeking — mSPRT over the
    // cumulative two-arm mean difference, one row per look.
    Query(
      "q_msprt",
      Some("""WITH s AS (
                SELECT CAST(date_trunc('day', ts) AS DATE) AS look,
                       (user_id % 2 = 0) AS isa, value
                FROM events),
              looks AS (SELECT look, isa, count(*) AS n,
                          sum(CAST(value AS DECIMAL(38,6))) AS sx,
                          sum(CAST(value * value AS DECIMAL(38,6)))
                            AS sxx
                        FROM s GROUP BY 1, 2),
              cum AS (SELECT look, isa,
                        sum(n) OVER w AS cn,
                        CAST(sum(sx) OVER w AS DOUBLE) AS csx,
                        CAST(sum(sxx) OVER w AS DOUBLE) AS csxx
                      FROM looks WINDOW w AS (PARTITION BY isa
                        ORDER BY look ROWS UNBOUNDED PRECEDING)),
              bl AS (SELECT look,
                       max(CASE WHEN isa THEN cn END) AS n_a,
                       max(CASE WHEN NOT isa THEN cn END) AS n_b,
                       max(CASE WHEN isa THEN csx END) AS sxa,
                       max(CASE WHEN NOT isa THEN csx END) AS sxb,
                       max(CASE WHEN isa THEN csxx END) AS sxxa,
                       max(CASE WHEN NOT isa THEN csxx END) AS sxxb
                     FROM cum GROUP BY 1),
              m AS (SELECT look, n_a, n_b,
                      CAST(n_a AS DOUBLE) AS na,
                      CAST(n_b AS DOUBLE) AS nb,
                      sxa, sxb, sxxa, sxxb
                    FROM bl),
              v AS (SELECT look, n_a, n_b,
                      sxa / na - sxb / nb AS diff,
                      (sxxa - sxa * sxa / na) / (na - 1) AS va,
                      (sxxb - sxb * sxb / nb) / (nb - 1) AS vb,
                      na, nb
                    FROM m),
              w2 AS (SELECT look, n_a, n_b, diff,
                       va / na + vb / nb AS se2,
                       (va * (na - 1) + vb * (nb - 1))
                         / (na + nb - 2) / 1000 AS tauc
                     FROM v),
              lam AS (SELECT look, n_a, n_b,
                        CASE WHEN n_a > 1 AND n_b > 1 AND se2 > 0
                          THEN floor(diff * 1000000.0 + 0.5)/1000000.0
                          END AS mean_diff,
                        CASE WHEN n_a > 1 AND n_b > 1 AND se2 > 0
                          THEN sqrt(se2 / (se2 + tauc))
                            * exp(diff * diff * tauc
                              / (2.0 * se2 * (se2 + tauc))) END
                          AS lam
                      FROM w2),
              rn AS (SELECT look, n_a, n_b, mean_diff, lam,
                       max(lam) OVER (ORDER BY look
                         ROWS UNBOUNDED PRECEDING) AS maxlam
                     FROM lam)
              SELECT look,
                     -- BIGINT, not DuckDB's sum-of-BIGINT HUGEINT: the
                     -- r17 audit found q_msprt was the ONLY oracle (of
                     -- 233) emitting HUGEINT, and HUGEINT converts to
                     -- pandas float64 ("175.0" vs the parquet's int64
                     -- "175") — the one engine-vs-oracle difference a
                     -- fetchall()-based local diff can never see, and
                     -- the only cell class left after the boundary
                     -- audit showed every rounded double >=1.4e8 ulps
                     -- from its 6dp floor boundary.
                     CAST(n_a AS BIGINT) AS n_a,
                     CAST(n_b AS BIGINT) AS n_b, mean_diff,
                     floor(lam * 1000000.0 + 0.5)/1000000.0 AS lambda,
                     floor(least(1.0, 1.0 / maxlam)
                       * 1000000.0 + 0.5)/1000000.0 AS p_always_valid
              FROM rn ORDER BY look"""),
      (s, d) => msprt(Tables.events(s, d)
          .select(col("ts"),
            when(col("user_id") % 2 === 0, "A").otherwise("B")
              .as("arm"),
            col("value")),
        "ts", "arm", "value", "A", "B")),

    // Don't trust a 1-for-1 customer: per-customer completion rates
    // shrunk through a method-of-moments Beta prior.
    Query(
      "q_eb_shrinkage",
      Some("""WITH per AS (
                SELECT o_custkey AS entity, count(*) AS n,
                       sum(CASE WHEN o_orderstatus = 'F'
                         THEN 1 ELSE 0 END) AS x
                FROM orders GROUP BY 1),
              mom AS (SELECT CAST(count(*) AS DOUBLE) AS k,
                        CAST(sum(CAST(CAST(x AS DOUBLE)
                            / CAST(n AS DOUBLE) AS DECIMAL(38,12)))
                          AS DOUBLE) AS sr,
                        CAST(sum(CAST((CAST(x AS DOUBLE)
                              / CAST(n AS DOUBLE))
                            * (CAST(x AS DOUBLE) / CAST(n AS DOUBLE))
                            AS DECIMAL(38,12))) AS DOUBLE) AS srr
                      FROM per WHERE n >= 5),
              pr AS (SELECT k, sr / k AS m,
                       (srr - sr * sr / k) / (k - 1) AS v
                     FROM mom),
              pr2 AS (SELECT
                        CASE WHEN k > 1 AND v > 0
                            AND m * (1.0 - m) / v - 1 > 0
                          THEN m * (m * (1.0 - m) / v - 1) END
                          AS alpha,
                        CASE WHEN k > 1 AND v > 0
                            AND m * (1.0 - m) / v - 1 > 0
                          THEN (1.0 - m) * (m * (1.0 - m) / v - 1)
                          END AS beta
                      FROM pr)
              SELECT entity, CAST(n AS BIGINT) AS n,
                     CAST(x AS BIGINT) AS x,
                     round(CAST(x AS DOUBLE) / CAST(n AS DOUBLE)
                       * 1000000.0)/1000000.0 AS rate_raw,
                     round((CAST(x AS DOUBLE) + alpha)
                         / (CAST(n AS DOUBLE) + alpha + beta)
                       * 1000000.0)/1000000.0 AS rate_shrunk,
                     round(alpha * 1000000.0)/1000000.0 AS alpha,
                     round(beta * 1000000.0)/1000000.0 AS beta
              FROM per CROSS JOIN pr2 ORDER BY entity"""),
      (s, d) => ebShrinkage(Tables.orders(s, d)
          .select(col("o_custkey").as("cust"),
            (col("o_orderstatus") === "F").as("hit")),
        "cust", "hit")),

    // How bad does the worst day get — Gumbel fit on daily maxima
    // with 10- and 100-day return levels.
    Query(
      "q_evt_gumbel",
      Some("""WITH b AS (
                SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
                       max(CAST(value AS DOUBLE)) AS mx
                FROM events GROUP BY 1),
              g AS (SELECT count(*) AS n_blocks,
                      CAST(sum(CAST(mx AS DECIMAL(38,6)))
                        AS DOUBLE) AS sx,
                      CAST(sum(CAST(mx * mx AS DECIMAL(38,6)))
                        AS DOUBLE) AS sxx
                    FROM b),
              e AS (SELECT n_blocks,
                      CAST(n_blocks AS DOUBLE) AS n, sx, sxx
                    FROM g),
              m AS (SELECT n_blocks, sx / n AS m,
                      (sxx - sx * sx / n) / (n - 1) AS vv
                    FROM e),
              p AS (SELECT n_blocks, m, vv,
                      sqrt(vv) * sqrt(6.0) / pi() AS beta
                    FROM m WHERE n_blocks > 1 AND vv > 0),
              q AS (SELECT n_blocks, m, vv, beta,
                      m - 0.5772156649015329 * beta AS mu
                    FROM p)
              SELECT CAST(n_blocks AS BIGINT) AS n_blocks,
                     round(m * 1000000.0)/1000000.0 AS mean_max,
                     round(sqrt(vv) * 1000000.0)/1000000.0 AS sd_max,
                     round(mu * 1000000.0)/1000000.0 AS gumbel_mu,
                     round(beta * 1000000.0)/1000000.0 AS gumbel_beta,
                     round((mu - beta * ln(-ln(1.0 - 1.0 / 10.0)))
                       * 1000000.0)/1000000.0 AS ret_level_10,
                     round((mu - beta * ln(-ln(1.0 - 1.0 / 100.0)))
                       * 1000000.0)/1000000.0 AS ret_level_100
              FROM q"""),
      (s, d) => evtGumbel(Tables.events(s, d), "ts", "value")),

    // What family does price even follow per flag — lognormal and
    // gamma method-of-moments fits from one aggregate.
    Query(
      "q_dist_fit",
      Some("""WITH g AS (
                SELECT l_returnflag AS grp, count(*) AS n_total,
                       count(CASE WHEN CAST(l_extendedprice AS DOUBLE)
                         > 0 THEN 1 END) AS n,
                       CAST(sum(CAST(CASE WHEN
                           CAST(l_extendedprice AS DOUBLE) > 0 THEN
                           CAST(l_extendedprice AS DOUBLE) END
                         AS DECIMAL(38,6))) AS DOUBLE) AS sx,
                       CAST(sum(CAST(CASE WHEN
                           CAST(l_extendedprice AS DOUBLE) > 0 THEN
                           CAST(l_extendedprice AS DOUBLE)
                             * CAST(l_extendedprice AS DOUBLE) END
                         AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
                       CAST(sum(CAST(CASE WHEN
                           CAST(l_extendedprice AS DOUBLE) > 0 THEN
                           ln(CAST(l_extendedprice AS DOUBLE)) END
                         AS DECIMAL(38,6))) AS DOUBLE) AS sl,
                       CAST(sum(CAST(CASE WHEN
                           CAST(l_extendedprice AS DOUBLE) > 0 THEN
                           ln(CAST(l_extendedprice AS DOUBLE))
                             * ln(CAST(l_extendedprice AS DOUBLE)) END
                         AS DECIMAL(38,6))) AS DOUBLE) AS sll
                FROM lineitem GROUP BY 1),
              c AS (SELECT grp, n_total, n,
                      CAST(n AS DOUBLE) AS nd, sx, sxx, sl, sll
                    FROM g),
              e AS (SELECT grp, n_total, n,
                      sx / nd AS m,
                      (sxx - sx * sx / nd) / (nd - 1) AS vv,
                      sl / nd AS lmu,
                      (sll - sl * sl / nd) / (nd - 1) AS lvar
                    FROM c WHERE n > 1)
              SELECT grp AS l_returnflag,
                     CAST(n_total AS BIGINT) AS n_total,
                     CAST(n AS BIGINT) AS n,
                     round(m * 1000000.0)/1000000.0 AS mean,
                     round(CASE WHEN vv > 0 THEN sqrt(vv) END
                       * 1000000.0)/1000000.0 AS stddev,
                     round(lmu * 1000000.0)/1000000.0 AS lnorm_mu,
                     round(CASE WHEN lvar > 0 THEN sqrt(lvar) END
                       * 1000000.0)/1000000.0 AS lnorm_sigma,
                     round(CASE WHEN vv > 0 THEN m * m / vv END
                       * 1000000.0)/1000000.0 AS gamma_k,
                     round(CASE WHEN vv > 0 THEN vv / m END
                       * 1000000.0)/1000000.0 AS gamma_theta
              FROM e ORDER BY 1"""),
      (s, d) => distFit(Tables.lineitem(s, d), "l_extendedprice",
        "l_returnflag")),

    // Is the diversity screen actually stricter than the length
    // screen on the SAME documents — McNemar on the discordant cells.
    Query(
      "q_mcnemar",
      Some(s"""WITH s AS (
                SELECT (len(string_split(text, ' ')) >= 30) AS a,
                       (CAST(len(list_distinct(string_split(text, ' ')))
                          AS DOUBLE)
                        / len(string_split(text, ' ')) >= 0.5) AS b
                FROM documents),
              agg AS (
                SELECT count(*) AS n,
                       CAST(sum((a AND NOT b)::INT) AS BIGINT) AS n10,
                       CAST(sum((NOT a AND b)::INT) AS BIGINT) AS n01
                FROM s),
              c AS (SELECT n, n10, n01,
                      CAST(n10 + n01 AS DOUBLE) AS disc,
                      CAST(n10 - n01 AS DOUBLE) AS diff
                    FROM agg),
              e AS (SELECT n, n10, n01, disc,
                      diff * diff / disc AS chi2,
                      greatest(0.0, abs(diff) - 1) AS cc
                    FROM c WHERE disc > 0)
              SELECT n, n10, n01,
                     round(chi2 * 1000000.0)/1000000.0 AS chi2,
                     round(cc * cc / disc * 1000000.0)/1000000.0
                       AS chi2_cc,
                     round(${graft.operators.HypothesisOps
                       .sqlTwoSidedNormalP("sqrt(chi2)")}
                       * 1000000.0)/1000000.0 AS p_value
              FROM e"""),
      (s, d) => {
        val t = TextOps.tokens(col("text"))
        mcnemar(
          Tables.documents(s, d).select(
            (size(t) >= 30).as("len_ok"),
            (size(array_distinct(t)).cast("double") / size(t) >= 0.5)
              .as("div_ok")),
          "len_ok", "div_ok")
      }),

    // Market concentration per segment: HHI of customer order spend —
    // is revenue spread across many customers or owned by a few?
    // Distribution-free CI for the suppliers' mean account balance:
    // 200 simultaneous derandomized Poisson resamples in one pass
    // (the small-n table is exactly where a CI earns its keep).
    Query(
      "q_bootstrap_ci",
      Some {
        val draw = CurationOps.sqlDraw(
          "CAST(s_suppkey AS VARCHAR) || ':' || CAST(rb AS VARCHAR)")
        s"""WITH ex AS (
                SELECT s_suppkey, s_acctbal AS x, rb.range AS rb
                FROM supplier CROSS JOIN range(0, 200) rb),
              ww AS (SELECT rb,
                       CASE WHEN $draw < 24109 THEN 0
                            WHEN $draw < 48218 THEN 1
                            WHEN $draw < 60273 THEN 2
                            WHEN $draw < 64291 THEN 3
                            WHEN $draw < 65296 THEN 4
                            WHEN $draw < 65497 THEN 5
                            WHEN $draw < 65530 THEN 6
                            ELSE 7 END AS w,
                       x
                     FROM ex),
              rs AS (SELECT rb, sum(w) AS ne,
                       sum(CAST(w * x AS DECIMAL(38,12))) AS sx
                     FROM ww GROUP BY 1),
              ms AS (SELECT rb, CAST(sx AS DOUBLE) / ne AS m
                     FROM rs WHERE ne > 0),
              rk AS (SELECT m, row_number() OVER (ORDER BY m, rb)
                       AS rn
                     FROM ms),
              bt AS (SELECT count(*) AS m_valid,
                       sum(CAST(m AS DECIMAL(38,12))) AS sm,
                       sum(CAST(m * m AS DECIMAL(38,12))) AS smm
                     FROM rk),
              ci AS (SELECT
                       min(CASE WHEN rn * 40 >= m_valid THEN m END)
                         AS lo,
                       min(CASE WHEN rn * 40 >= m_valid * 39 THEN m
                         END) AS hi,
                       min(m_valid) AS m_valid, min(sm) AS sm,
                       min(smm) AS smm
                     FROM rk CROSS JOIN bt),
              fl AS (SELECT count(*) AS n,
                       sum(CAST(s_acctbal AS DECIMAL(38,12)))
                         AS sxf
                     FROM supplier)
              SELECT CAST(n AS BIGINT) AS n,
                     round(CAST(sxf AS DOUBLE) / n
                       * 1000000.0)/1000000.0 AS mean,
                     CAST(m_valid AS BIGINT) AS resamples,
                     round(CAST(sm AS DOUBLE)
                         / CAST(m_valid AS DOUBLE)
                       * 1000000.0)/1000000.0 AS boot_mean,
                     round(sqrt(greatest((CAST(smm AS DOUBLE)
                           - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE)
                             / CAST(m_valid AS DOUBLE))
                         / (CAST(m_valid AS DOUBLE) - 1), 0.0))
                       * 1000000.0)/1000000.0 AS boot_se,
                     round(lo * 1000000.0)/1000000.0 AS ci_lo,
                     round(hi * 1000000.0)/1000000.0 AS ci_hi
              FROM fl CROSS JOIN ci"""
      },
      (s, d) => bootstrapCiMean(Tables.supplier(s, d), "s_suppkey",
        "s_acctbal")),

    Query(
      "q_hhi",
      Some("""WITH per AS (
                SELECT c_mktsegment AS seg, o_custkey,
                       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                         AS DECIMAL(18,2)) AS m
                FROM orders JOIN customer ON o_custkey = c_custkey
                GROUP BY 1, 2),
              t AS (SELECT seg, sum(m) AS tt, count(*) AS n_entities
                    FROM per GROUP BY 1),
              terms AS (
                SELECT per.seg, n_entities, CAST(tt AS DOUBLE) AS total,
                       100.0 * (CAST(m AS DOUBLE) / CAST(tt AS DOUBLE))
                         AS sh
                FROM per JOIN t ON per.seg = t.seg)
              SELECT seg AS c_mktsegment,
                     CAST(n_entities AS BIGINT) AS n_entities, total,
                     round(CAST(sum(CAST(sh * sh AS DECIMAL(38,12)))
                         AS DOUBLE) * 1000000.0)/1000000.0 AS hhi
              FROM terms GROUP BY 1, 2, 3 ORDER BY 1"""),
      (s, d) => hhi(
        Tables.orders(s, d).join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey")),
        "c_mktsegment", "o_custkey", "o_totalprice"))
  )
}
