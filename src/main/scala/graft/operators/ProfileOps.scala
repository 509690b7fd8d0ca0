package graft.operators

import graft.Query
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Schema-profiling & drift tier: functional-dependency discovery,
  * candidate-key detection, and the population stability index — the
  * "what does this table's shape actually guarantee, and has the
  * distribution moved" questions that gate every ingest. All counts
  * are exact integers; ratios render per SURVEY §7.6.
  */
object ProfileOps {

  private def r6(c: Column): Column = round(c * lit(1000000.0)) / lit(1000000.0)

  /** Functional-dependency profile for candidate `lhs → rhs` pairs:
    * per pair, how many distinct LHS values exist, how many of them
    * map to MORE than one RHS value (violations), the worst fan-out,
    * and whether the FD holds exactly.
    *
    * Scale: each pair is two keyed hash aggregates over two pruned
    * columns (groupBy lhs with an exact distinct-rhs count, then one
    * global fold) — no windows, no joins; pairs union independently,
    * so the whole profile is one job of parallel two-stage aggregates. */
  def fdProfile(df: DataFrame, fds: Seq[(String, String)]): DataFrame =
    fds.map { case (lhs, rhs) =>
      df.groupBy(col(lhs))
        .agg(countDistinct(col(rhs)).as("nr"))
        .agg(
          count(lit(1)).as("n_lhs"),
          sum(when(col("nr") > 1, 1L).otherwise(0L)).as("n_violating"),
          max("nr").as("max_rhs"))
        .select(lit(s"$lhs->$rhs").as("fd"), col("n_lhs"),
          col("n_violating"), col("max_rhs"),
          when(col("n_violating") === 0, 1L).otherwise(0L).as("holds"))
    }.reduce(_.union(_)).orderBy("fd")

  /** Candidate-key profile: per column — exact distinct count, null
    * count, uniqueness ratio, and whether the column is a key (unique
    * and null-free). One pass over the table: all 2·|cols| measures
    * fold in a single wide aggregate (Catalyst plans the multi-
    * distinct via one expand), then unpivot to a row per column with
    * `stack` — no second scan, no join. */
  def candidateKeys(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = Seq(count(lit(1)).as("__n")) ++ cols.flatMap(c => Seq(
      countDistinct(col(c)).as(s"__d_$c"),
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__z_$c")))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols
      .map(c => s"'$c', __d_$c, __z_$c").mkString(", ")
    one.selectExpr("__n",
        s"stack(${cols.size}, $stackArgs) AS (col_name, n_distinct, n_null)")
      .select(col("col_name"), col("__n").as("n_rows"),
        col("n_distinct"), col("n_null"),
        r6(col("n_distinct").cast("double") / col("__n")).as("uniq_ratio"),
        when(col("n_distinct") === col("__n") && col("n_null") === 0, 1L)
          .otherwise(0L).as("is_key"))
      .orderBy("col_name")
  }

  /** Population stability index of a value column between the first
    * and second half of the corpus' time span: 10 equal-width bins
    * over the GLOBAL value range, Laplace-smoothed proportions
    * p=(n+0.5)/(N+5), PSI = Σ (p−q)·ln(p/q). Per-bin terms plus the
    * total repeated per row (the q_mutual_info drift stance: exact
    * DECIMAL(38,12) term sum, rendered once).
    *
    * Scale: the time/value bounds ride along as a broadcast 1-row
    * aggregate (no driver collect); binning is a pure narrow map, the
    * profile one 20-cell hash aggregate, and the bin spine is a
    * 10-row `spark.range` — constant-size everything except the one
    * linear scan. */
  def psi(df: DataFrame, tsCol: String, valCol: String,
      nBins: Int = 10): DataFrame = {
    val spark = df.sparkSession
    val dec12 = DecimalType(38, 12)
    val bounds = df.agg(
      min(col(tsCol).cast("long")).as("__t0"),
      max(col(tsCol).cast("long")).as("__t1"),
      min(col(valCol).cast("double")).as("__v0"),
      max(col(valCol).cast("double")).as("__v1"))
    val binned = df.crossJoin(broadcast(bounds))
      .select(
        when(col(tsCol).cast("long") * 2 < col("__t0") + col("__t1"), 0)
          .otherwise(1).as("half"),
        least(lit(nBins - 1), greatest(lit(0),
          floor((col(valCol).cast("double") - col("__v0")) * nBins /
            (col("__v1") - col("__v0") + lit(1e-9))))).cast("bigint")
          .as("bin"))
    val counts = binned.groupBy("bin")
      .agg(sum(when(col("half") === 0, 1L).otherwise(0L)).as("n_first"),
        sum(when(col("half") === 1, 1L).otherwise(0L)).as("n_second"))
    val spine = spark.range(nBins).select(col("id").as("bin"))
    val full = spine.join(counts, Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("n_first"), lit(0L)).as("n_first"),
        coalesce(col("n_second"), lit(0L)).as("n_second"))
    val tots = full.agg(sum("n_first").as("__na"),
      sum("n_second").as("__nb"))
    val terms = full.crossJoin(broadcast(tots))
      .withColumn("p", (col("n_first").cast("double") + lit(0.5)) /
        (col("__na").cast("double") + lit(0.5) * nBins))
      .withColumn("q", (col("n_second").cast("double") + lit(0.5)) /
        (col("__nb").cast("double") + lit(0.5) * nBins))
      .withColumn("term", (col("p") - col("q")) * log(col("p") / col("q")))
    val tot = terms.agg(sum(col("term").cast(dec12)).as("__psi"))
    terms.crossJoin(broadcast(tot))
      .select(col("bin"), col("n_first"), col("n_second"),
        r6(col("p")).as("p"), r6(col("q")).as("q"),
        r6(col("term")).as("psi_term"),
        r6(col("__psi").cast("double")).as("psi_total"))
      .orderBy("bin")
  }

  /** Jensen–Shannon divergence between the first and second time-half
    * value distributions — [[psi]]'s bounded, symmetric sibling:
    * JSD = ½·KL(p‖m) + ½·KL(q‖m) with m = (p+q)/2, always in
    * [0, ln 2], so the alert threshold ports across metrics where
    * PSI's unbounded terms don't. Same global equal-width bin spine,
    * same Laplace smoothing, same one-aggregation shape; per-bin
    * terms round into DECIMAL(38,12) before the total (the q_drift
    * stance). */
  def jsDivergence(df: DataFrame, tsCol: String, valCol: String,
      nBins: Int = 10): DataFrame = {
    val spark = df.sparkSession
    val dec12 = DecimalType(38, 12)
    val bounds = df.agg(
      min(col(tsCol).cast("long")).as("__t0"),
      max(col(tsCol).cast("long")).as("__t1"),
      min(col(valCol).cast("double")).as("__v0"),
      max(col(valCol).cast("double")).as("__v1"))
    val binned = df.crossJoin(broadcast(bounds))
      .select(
        when(col(tsCol).cast("long") * 2 < col("__t0") + col("__t1"), 0)
          .otherwise(1).as("half"),
        least(lit(nBins - 1), greatest(lit(0),
          floor((col(valCol).cast("double") - col("__v0")) * nBins /
            (col("__v1") - col("__v0") + lit(1e-9))))).cast("bigint")
          .as("bin"))
    val counts = binned.groupBy("bin")
      .agg(sum(when(col("half") === 0, 1L).otherwise(0L)).as("n_first"),
        sum(when(col("half") === 1, 1L).otherwise(0L)).as("n_second"))
    val spine = spark.range(nBins).select(col("id").as("bin"))
    val full = spine.join(counts, Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("n_first"), lit(0L)).as("n_first"),
        coalesce(col("n_second"), lit(0L)).as("n_second"))
    val tots = full.agg(sum("n_first").as("__na"),
      sum("n_second").as("__nb"))
    val terms = full.crossJoin(broadcast(tots))
      .withColumn("p", (col("n_first").cast("double") + lit(0.5)) /
        (col("__na").cast("double") + lit(0.5) * nBins))
      .withColumn("q", (col("n_second").cast("double") + lit(0.5)) /
        (col("__nb").cast("double") + lit(0.5) * nBins))
      .withColumn("m", (col("p") + col("q")) / 2)
      .withColumn("term",
        (col("p") * log(col("p") / col("m")) +
          col("q") * log(col("q") / col("m"))) / 2)
    val tot = terms.agg(sum(col("term").cast(dec12)).as("__jsd"))
    terms.crossJoin(broadcast(tot))
      .select(col("bin"), col("n_first"), col("n_second"),
        r6(col("p")).as("p"), r6(col("q")).as("q"),
        r6(col("term")).as("jsd_term"),
        r6(col("__jsd").cast("double")).as("jsd_total"))
      .orderBy("bin")
  }

  /** Partial Pearson correlation of x and y CONTROLLING for z —
    * "does the x–y relationship survive once z explains what it can":
    * ρ_xy·z = (r_xy − r_xz·r_yz) / √((1 − r_xz²)(1 − r_yz²)). All
    * three pairwise r's fold from ONE wide DECIMAL(38,6)-exact
    * aggregate (the corrMatrix shape at k = 3); both engines evaluate
    * the identical composition over identical decimal-exact doubles.
    * Degenerate inputs (constant columns, |r_xz| or |r_yz| = 1) yield
    * NULL, not a divide-by-zero. */
  def partialCorr(df: DataFrame, xCol: String, yCol: String,
      zCol: String): DataFrame = {
    val dec6 = DecimalType(38, 6)
    val cs = Seq(xCol, yCol, zCol)
    val aggs = Seq(count(lit(1)).as("n")) ++
      cs.zipWithIndex.map { case (c, i) =>
        sum(col(c).cast(dec6)).as(s"s$i") } ++
      (for (i <- 0 until 3; j <- i until 3) yield
        sum((col(cs(i)) * col(cs(j))).cast(dec6)).as(s"s${i}_$j"))
    val one = df.agg(aggs.head, aggs.tail: _*)
    def d(name: String): Column = col(name).cast("double")
    val n = d("n")
    def v(i: Int): Column = n * d(s"s${i}_$i") - d(s"s$i") * d(s"s$i")
    def r(i: Int, j: Int): Column =
      (n * d(s"s${i}_$j") - d(s"s$i") * d(s"s$j")) /
        sqrt(v(i) * v(j))
    val ok = v(0) > 0 && v(1) > 0 && v(2) > 0
    val rxy = r(0, 1); val rxz = r(0, 2); val ryz = r(1, 2)
    val den = (lit(1.0) - rxz * rxz) * (lit(1.0) - ryz * ryz)
    // the r() divisions must stay INSIDE the ok branch: ANSI mode
    // throws on the zero-variance divide even when it only feeds a
    // predicate, so the den guard nests rather than conjoins
    one.select(
      col("n").cast("bigint").as("n"),
      when(ok, r6(rxy)).as("r_xy"),
      when(ok, r6(rxz)).as("r_xz"),
      when(ok, r6(ryz)).as("r_yz"),
      when(ok, when(den > 0, r6((rxy - rxz * ryz) / sqrt(den))))
        .as("partial_corr"))
  }

  /** Calibration (reliability) table of a [0,1] probability column
    * against a binary outcome — does "p = 0.8" actually come true 80%
    * of the time? `nBins` fixed-width probability bins, each with its
    * count, mean predicted probability, observed positive rate, and
    * gap; shared across rows: the Brier score (mean squared error of
    * the probability) and ECE (expected calibration error —
    * count-weighted mean |gap|). Per-row/-bin terms fold in
    * DECIMAL(38,12) (the q_drift stance). One binned aggregate over
    * one scan + a |bins|-row fold; empty bins are emitted with NULL
    * rates so the spine is always complete. */
  /** Isotonic (PAV) calibration FIT over the binned reliability
    * table — the monotone probability remap [[calibration]]'s report
    * motivates: per bin, the pool-adjacent-violators solution
    * computed by the max-min identity
    * iso(i) = max_{j≤i} min_{l≥j} rate(j..l) — exactly the PAV fit,
    * stated as bounded relational algebra instead of a sequential
    * pooling loop. `calibrated` is non-decreasing in the bin by
    * construction and is what a serving layer looks up at score
    * time.
    *
    * Scale: one corpus bin-count aggregate, then EVERYTHING else runs
    * on the ≤nBins-row non-empty bin table: a declared-bounded prefix
    * window, one ≤nBins² broadcast range self-join for the (j, l)
    * pool rates (integer prefix differences, one exact division
    * each), two tiny folds. Pool rates divide identically in both
    * engines; min/max are comparisons — parity-safe. Empty bins have
    * nothing to calibrate and are omitted (a serving lookup
    * interpolates between neighbors). */
  def isotonicCalibration(df: DataFrame, probCol: String,
      labelCol: String, nBins: Int = 10): DataFrame = {
    require(nBins >= 2 && nBins <= 1000,
      s"nBins must be in [2, 1000]; got $nBins")
    val dec12 = DecimalType(38, 12)
    val p = col(probCol).cast("double")
    val y = when(col(labelCol).cast("boolean"), 1L).otherwise(0L)
    val rows = df.select(
      least(lit(nBins - 1), greatest(lit(0),
        floor(p * nBins))).cast("bigint").as("bin"),
      p.as("p"), y.as("y"))
    val byBin = rows.groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum(col("p").cast(dec12)).as("sp"),
        sum("y").as("npos"))
    // ≤nBins rows from here on; the prefix window is declared-bounded
    val wPre = Window.partitionBy(BoundedWindow.key(col("bin")))
      .orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pre = byBin.select(col("bin"), col("n"), col("sp"),
      col("npos"),
      sum(col("n")).over(wPre).as("cw"),
      sum(col("npos")).over(wPre).as("cp"))
    val jSide = pre.select(col("bin").as("jb"),
      (col("cw") - col("n")).as("w0"), (col("cp") - col("npos"))
        .as("p0"))
    val lSide = pre.select(col("bin").as("lb"), col("cw").as("wl"),
      col("cp").as("pl"))
    // pooled rate of bins j..l: exact integer prefix differences
    val pools = jSide.join(broadcast(lSide), col("jb") <= col("lb"))
      .select(col("jb"), col("lb"),
        ((col("pl") - col("p0")).cast("double") /
          (col("wl") - col("w0")).cast("double")).as("rate"))
    val minTail = pools.groupBy("jb").agg(min("rate").as("mrate"))
    val iso = pre.select(col("bin"))
      .join(broadcast(minTail), col("jb") <= col("bin"))
      .groupBy("bin").agg(max("mrate").as("iso"))
    pre.join(broadcast(iso), Seq("bin"))
      .select(col("bin"), col("n"),
        r6(col("sp").cast("double") / col("n")).as("mean_prob"),
        r6(col("npos").cast("double") / col("n")).as("pos_rate"),
        r6(col("iso")).as("calibrated"))
      .orderBy("bin")
  }

  def calibration(df: DataFrame, probCol: String, labelCol: String,
      nBins: Int = 10): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2; got $nBins")
    val spark = df.sparkSession
    val dec12 = DecimalType(38, 12)
    val p = col(probCol).cast("double")
    val y = when(col(labelCol).cast("boolean"), 1L).otherwise(0L)
    val rows = df.select(
      least(lit(nBins - 1), greatest(lit(0),
        floor(p * nBins))).cast("bigint").as("bin"),
      p.as("p"), y.as("y"))
    val byBin = rows.groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum(col("p").cast(dec12)).as("sp"),
        sum("y").as("npos"),
        sum(((col("p") - col("y")) * (col("p") - col("y")))
          .cast(dec12)).as("sq"))
    val spine = spark.range(nBins).select(col("id").as("bin"))
      .join(byBin, Seq("bin"), "left")
    val tot = byBin.agg(sum("n").as("nt"),
      sum("sq").cast("double").as("sqt"),
      // ECE numerator: Σ |n·p̄_b − npos_b| = Σ n_b·|p̄_b − rate_b|,
      // exact in DECIMAL before the one division
      sum(abs(col("sp") - col("npos").cast(dec12)).cast(dec12))
        .as("gapsum"))
    spine.crossJoin(broadcast(tot))
      .select(col("bin"),
        coalesce(col("n"), lit(0L)).as("n"),
        r6(col("sp").cast("double") / col("n")).as("mean_prob"),
        r6(col("npos").cast("double") / col("n")).as("pos_rate"),
        r6(col("sp").cast("double") / col("n") -
          col("npos").cast("double") / col("n")).as("gap"),
        r6(col("sqt") / col("nt")).as("brier"),
        r6(col("gapsum").cast("double") / col("nt")).as("ece"))
      .orderBy("bin")
  }

  /** Murphy decomposition of the Brier score — WHY is the Brier what
    * it is: brier_binned = RELIABILITY − RESOLUTION + UNCERTAINTY,
    * where reliability = Σ n_k(p̄_k − ō_k)²/N (miscalibration — the
    * part recalibration can remove), resolution = Σ n_k(ō_k − ō)²/N
    * (discrimination — how much the bins actually separate outcomes)
    * and uncertainty = ō(1−ō) (the base-rate floor no model beats).
    * The raw Brier additionally carries a within-bin residual
    * (raw − binned identity, reported as within_var): the within-bin
    * forecast variance MINUS twice the within-bin forecast–outcome
    * covariance — zero when forecasts only take the bin values, and
    * of EITHER sign for continuous forecasts (a positive within-bin
    * p–y association can make it slightly negative). Same binned
    * aggregate as [[calibration]], one ≤nBins-row second fold.
    * Reliability terms stay exact: n_k(p̄_k−ō_k)² = (Σp − npos)²/n_k
    * with the numerator an exact DECIMAL difference. */
  def brierDecomp(df: DataFrame, probCol: String, labelCol: String,
      nBins: Int = 10): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2; got $nBins")
    val dec12 = DecimalType(38, 12)
    val p = col(probCol).cast("double")
    val y = when(col(labelCol).cast("boolean"), 1L).otherwise(0L)
    val rows = df.select(
      least(lit(nBins - 1), greatest(lit(0),
        floor(p * nBins))).cast("bigint").as("bin"),
      p.as("p"), y.as("y"))
    val byBin = rows.groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum(col("p").cast(dec12)).as("sp"),
        sum("y").as("npos"),
        sum(((col("p") - col("y")) * (col("p") - col("y")))
          .cast(dec12)).as("sq"))
    val tot = byBin.agg(sum("n").as("nt"), sum("npos").as("post"),
      sum("sq").cast("double").as("sqt"))
    val nD = col("n").cast("double")
    val obar = col("post").cast("double") / col("nt").cast("double")
    val dRel = (col("sp") - col("npos").cast(dec12)).cast("double")
    val dRes = col("npos").cast("double") / nD - obar
    val m = byBin.crossJoin(broadcast(tot))
      .agg(
        sum((dRel * dRel / nD).cast(dec12)).as("rel"),
        sum((nD * (dRes * dRes)).cast(dec12)).as("res"),
        min("nt").as("n"), min("post").as("post"), min("sqt").as("sqt"))
    val nt = col("n").cast("double")
    val ob = col("post").cast("double") / nt
    val rel = col("rel").cast("double") / nt
    val res = col("res").cast("double") / nt
    val unc = ob * (lit(1.0) - ob)
    val brier = col("sqt") / nt
    val ok = col("n") > 0
    m.select(coalesce(col("n"), lit(0L)).as("n"),
      when(ok, r6(brier)).as("brier"),
      when(ok, r6(rel)).as("reliability"),
      when(ok, r6(res)).as("resolution"),
      when(ok, r6(unc)).as("uncertainty"),
      when(ok, r6(brier - (rel - res + unc))).as("within_var"))
  }

  /** Multivariate (Mahalanobis) outlier census over exactly three
    * numeric columns — the joint-distribution twin of the per-column
    * Tukey fences: a row can sit inside every marginal yet be wildly
    * improbable jointly (high price at low quantity), and only the
    * covariance-aware distance sees it. d²(x) = (x−μ)ᵀ Σ⁻¹ (x−μ) with
    * μ/Σ from ONE wide DECIMAL(38,6)-exact aggregate and Σ⁻¹ by the
    * closed-form 3×3 adjugate IN-PLAN — both engines evaluate the
    * identical cofactor arithmetic, so the query is oracle-gated like
    * every closed form here. The scoring pass is a pure codegen'd map
    * against the broadcast 1-row parameter table: two linear scans
    * total at any corpus size. Returns rows with d² > `threshold`
    * (χ²₃ quantile — 11.345 at 1%), plus the shared d² mean as a
    * health readout. Singular covariance → empty result, not a crash
    * (the partialCorr guard stance). */
  def mahalanobisOutliers(df: DataFrame, idCol: String,
      cols: Seq[String], threshold: Double = 11.345): DataFrame =
    mahalanobisFrom(df, idCol, cols, momentRow(df, cols), threshold)

  /** [[mahalanobisOutliers]] against a prebuilt (possibly superset,
    * possibly cached) [[momentRow]] — the per-row scoring pass still
    * runs on `df`; only the moment scan is shared. */
  private[graft] def mahalanobisFrom(df: DataFrame, idCol: String,
      cols: Seq[String], one: DataFrame,
      threshold: Double = 11.345): DataFrame = {
    require(cols.size == 3,
      s"mahalanobisOutliers is the closed-form k=3 variant; got $cols")
    require(threshold > 0, s"threshold must be positive; got $threshold")
    val n = col("__n")
    def mu(i: Int): Column = col(s"__s_${cols(i)}") / n
    // covariance entries from exact sums: (s_ij − s_i·s_j/n)/(n−1)
    def cv(i: Int, j: Int): Column = {
      val (a, b) = (math.min(i, j), math.max(i, j))
      val sij = if (a == b) col(s"__q_${cols(a)}")
        else col(s"__x_${cols(a)}_${cols(b)}")
      (sij - col(s"__s_${cols(i)}") * col(s"__s_${cols(j)}") / n) /
        (n - lit(1.0))
    }
    val (a00, a01, a02) = (cv(0, 0), cv(0, 1), cv(0, 2))
    val (a11, a12, a22) = (cv(1, 1), cv(1, 2), cv(2, 2))
    val det = a00 * (a11 * a22 - a12 * a12) -
      a01 * (a01 * a22 - a02 * a12) +
      a02 * (a01 * a12 - a02 * a11)
    // all divisions nest under the det guard (ANSI throws eagerly)
    val params = one.select(
      when(abs(det) > 0,
        struct(
          mu(0).as("m0"), mu(1).as("m1"), mu(2).as("m2"),
          ((a11 * a22 - a12 * a12) / det).as("i00"),
          ((a02 * a12 - a01 * a22) / det).as("i01"),
          ((a01 * a12 - a02 * a11) / det).as("i02"),
          ((a00 * a22 - a02 * a02) / det).as("i11"),
          ((a02 * a01 - a00 * a12) / det).as("i12"),
          ((a00 * a11 - a01 * a01) / det).as("i22"))).as("p"))
      .filter(col("p").isNotNull)
      .select(col("p.*"))
    def p(name: String): Column = col(name)
    val c0 = col(cols(0)).cast("double") - p("m0")
    val c1 = col(cols(1)).cast("double") - p("m1")
    val c2 = col(cols(2)).cast("double") - p("m2")
    val d2 = p("i00") * c0 * c0 + p("i11") * c1 * c1 +
      p("i22") * c2 * c2 +
      lit(2.0) * (p("i01") * c0 * c1 + p("i02") * c0 * c2 +
        p("i12") * c1 * c2)
    df.crossJoin(broadcast(params))
      .filter(d2 > threshold)
      .select(col(idCol) +: cols.map(col) :+ r6(d2).as("d2"): _*)
      // the id alone may repeat (lineitem order keys) — total order
      // over every output column keeps the hash row-order-proof
      .orderBy(col(idCol) +: cols.map(col): _*)
  }

  /** Full pairwise correlation matrix over a set of numeric columns in
    * ONE scan: a single wide aggregate computes n + per-column
    * DECIMAL(38,6) sums/sum-squares + all cross-products, then each
    * unordered pair's Pearson r folds from the one aggregated row and
    * unpivots via inline_outer — no per-pair scans, no builtin `corr`
    * (whose double partial-aggregation is partition-order-dependent).
    * Zero-variance columns yield NULL, not a divide-by-zero. */
  /** The ONE wide moment aggregate corrMatrix/vif fold from: n +
    * per-column DECIMAL(38,6) sums/sum-squares + all pairwise
    * cross-products, name-keyed so a SUPERSET moment row serves any
    * column subset (pair names follow the given column order). */
  private[graft] def momentRow(df: DataFrame, cols: Seq[String])
      : DataFrame = {
    val dec = DecimalType(38, 6)
    val aggs = Seq(count(lit(1)).cast("double").as("__n")) ++
      cols.flatMap(c => Seq(
        sum(col(c).cast(dec)).cast("double").as(s"__s_$c"),
        sum((col(c) * col(c)).cast(dec)).cast("double").as(s"__q_$c"))) ++
      cols.combinations(2).map { case Seq(a, b) =>
        sum((col(a) * col(b)).cast(dec)).cast("double").as(s"__x_${a}_$b")
      }.toSeq
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** The table-stats stance: the lineitem numeric moment row is a
    * profiling artifact (ANALYZE-style statistics) — computed and
    * pinned once per (session, corpus) over the four-column superset;
    * q_corr_matrix and q_vif both fold from it. */
  private[graft] val MomentCols =
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
  private[graft] def lineitemMoments(
      s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    graft.tools.PlanCache.shared
      .get(s, s"$d#profile:moments:lineitem:${MomentCols.mkString(",")}")(
        graft.tools.Checkpoints.pin(
          momentRow(Tables.lineitem(s, d), MomentCols)))

  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame =
    corrMatrixFrom(momentRow(df, cols), cols)

  /** [[corrMatrix]]'s fold half, against a prebuilt (possibly
    * superset, possibly cached) moment row. */
  private[graft] def corrMatrixFrom(one: DataFrame,
      cols: Seq[String]): DataFrame = {
    val n = col("__n")
    val pairRows = cols.combinations(2).map { case Seq(a, b) =>
      val sx = col(s"__s_$a"); val sy = col(s"__s_$b")
      val sxx = col(s"__q_$a"); val syy = col(s"__q_$b")
      val sxy = col(s"__x_${a}_$b")
      val vprod = (n * sxx - sx * sx) * (n * syy - sy * sy)
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        n.cast("bigint").as("n"),
        when(vprod > 0, r6((n * sxy - sx * sy) / sqrt(vprod)))
          .as("corr"))
    }.toSeq
    one.select(inline_outer(array(pairRows: _*)))
      .orderBy("col_a", "col_b")
  }

  /** Variance inflation factors over exactly three numeric columns —
    * the multicollinearity census to read BEFORE trusting any
    * multi-regressor fit ([[graft.operators.FitOps.olsMulti]],
    * logit): VIFᵢ = [R⁻¹]ᵢᵢ for the 3×3 correlation matrix R, with
    * R²ᵢ = 1 − 1/VIFᵢ the share of column i the other two already
    * explain. Closed-form adjugate inverse of R = [[1,a,b],[a,1,c],
    * [b,c,1]] (det = 1 + 2abc − a² − b² − c²; diag of the inverse is
    * (1−c²)/det etc.) — the [[mahalanobisOutliers]] k=3 stance, so
    * the query stays DuckDB-oracle-gated.
    *
    * Scale: the same ONE wide aggregate as [[corrMatrix]]; the
    * readout is a 1-row fold unpivoted to 3 rows in-plan. */
  def vif(df: DataFrame, cols: Seq[String]): DataFrame =
    vifFrom(momentRow(df, cols), cols)

  /** [[vif]]'s fold half, against a prebuilt (possibly superset,
    * possibly cached) moment row. */
  private[graft] def vifFrom(one: DataFrame, cols: Seq[String])
      : DataFrame = {
    require(cols.size == 3,
      s"vif is the closed-form k=3 variant; got $cols")
    val n = col("__n")
    def corrOf(a: String, b: String): Column = {
      val sx = col(s"__s_$a"); val sy = col(s"__s_$b")
      val sxx = col(s"__q_$a"); val syy = col(s"__q_$b")
      val sxy = col(s"__x_${a}_$b")
      val vprod = (n * sxx - sx * sx) * (n * syy - sy * sy)
      when(vprod > 0, (n * sxy - sx * sy) / sqrt(vprod))
    }
    // name a/b/c/det before the unpivot: the inline stage would
    // otherwise restate each corr expression 6x and push the
    // generated consume method past janino's size limit (observed
    // codegen fallback) — and the named steps mirror the oracle CTEs
    val named = one.select(n.cast("bigint").as("n"),
      corrOf(cols(0), cols(1)).as("__a"),
      corrOf(cols(0), cols(2)).as("__b"),
      corrOf(cols(1), cols(2)).as("__c"))
    val a = col("__a"); val b = col("__b"); val c = col("__c")
    val withDet = named.withColumn("__det",
      lit(1.0) + lit(2.0) * a * b * c - a * a - b * b - c * c)
    def row(name: String, diag: Column): Column = {
      val v = when(abs(col("__det")) > 0, diag / col("__det"))
      struct(lit(name).as("feature"), col("n"),
        r6(v).as("vif"),
        when(v > 0, r6(lit(1.0) - lit(1.0) / v)).as("r2_others"))
    }
    withDet.select(inline_outer(array(
        row(cols(0), lit(1.0) - c * c),
        row(cols(1), lit(1.0) - b * b),
        row(cols(2), lit(1.0) - a * a))))
      .orderBy("feature")
  }

  /** Weight-of-evidence / information-value screen of a categorical
    * feature against a binary label — the credit-scoring-lineage
    * feature ranking every tabular pipeline runs before encoding:
    * WoEₖ = ln((posₖ/pos)/(negₖ/neg)) per level, its IV term
    * (posₖ/pos − negₖ/neg)·WoEₖ, and the total IV repeated per row
    * (rule of thumb: < 0.02 useless, > 0.5 suspicious). Pure-level
    * cells (posₖ or negₖ = 0) have undefined WoE → NULL row, excluded
    * from the total rather than fabricated by smoothing — the
    * [[corrMatrix]] NULL stance; a caller who wants Laplace smoothing
    * can pre-aggregate.
    *
    * Scale: ONE hash aggregate per level + a k-row fold broadcast
    * back; exact integer counts, closed-form doubles both engines
    * state identically. */
  def woeIv(df: DataFrame, catCol: String, labelCol: String)
      : DataFrame = {
    val y = when(col(labelCol).cast("boolean"), 1L).otherwise(0L)
    val per = df.select(col(catCol).cast("string").as("level"),
        y.as("y"))
      .groupBy("level")
      .agg(count(lit(1)).as("n"), sum("y").as("n_pos"))
      .withColumn("n_neg", col("n") - col("n_pos"))
    val tot = per.agg(sum("n_pos").as("pt"), sum("n_neg").as("nt"))
    val ps = col("n_pos").cast("double") / col("pt").cast("double")
    val ns = col("n_neg").cast("double") / col("nt").cast("double")
    val ok = col("n_pos") > 0 && col("n_neg") > 0 &&
      col("pt") > 0 && col("nt") > 0
    val woed = per.crossJoin(broadcast(tot))
      .select(col("level"), col("n"), col("n_pos"), col("n_neg"),
        when(ok, log(ps / ns)).as("__woe"),
        when(ok, (ps - ns) * log(ps / ns)).as("__term"))
    val ivTot = woed.agg(
      sum(col("__term").cast(DecimalType(38, 12))).cast("double")
        .as("__iv"))
    woed.crossJoin(broadcast(ivTot))
      .select(col("level"), col("n"), col("n_pos"), col("n_neg"),
        r6(col("__woe")).as("woe"),
        r6(col("__term")).as("iv_term"),
        r6(col("__iv")).as("iv"))
      .orderBy("level")
  }

  /** Spearman rank correlation, EXACT under ties: each column's values
    * map to doubled average ranks 2·rank(v) = 2·C(<v) + c(v) + 1
    * (integers even when values repeat — the q_mann_whitney device),
    * rows join their two rank tables back, and Pearson folds over the
    * doubled ranks from DECIMAL(38,0)-exact sums (the ×2 scaling
    * cancels in the correlation). No sort of the data — each rank
    * table is a distinct-value aggregate + an 8192-bucket two-level
    * cumulative; the join back is two keyed hash joins.
    *
    * Capacity: Σ(2r)² ≤ 4n³ stays inside DECIMAL(38,0) to n ≈ 2.9e12
    * rows — past that, fold in DECIMAL(76,0)-style split sums. */
  /** Doubled-average-rank tables of k columns from ONE scan:
    * (cidx, v, r2) with 2·rank(v) = 2·C(<v) + c(v) + 1 per column —
    * integer even under ties. One posexplode widens the scan k-fold
    * (rows×k narrow pairs), one (cidx, v) hash aggregate builds every
    * column's distinct table together, and the GROUPED heavy-tail-safe
    * [[RankSpine]] runs all k cumulatives in the same pass — vs the
    * k-scans-k-spines shape this replaces (measured 4.3 → one shared
    * stage chain on the 3-column matrix). The cumulative sums are
    * bucket- AND batching-invariant, so the oracle hashes cannot move.
    * Shared by [[spearman]] and [[spearmanMatrix]]. */
  /** Single-column doubled-average-rank table (v, r2) — the
    * ungrouped spine; [[spearman]]'s two lazily-consumed tables cost
    * less than materializing the shared grouped spine. */
  private def rankTable(df: DataFrame, c: String): DataFrame = {
    val dec0 = DecimalType(38, 0)
    val g = df.groupBy(col(c).cast("double").as("v"))
      .agg(count(lit(1)).as("c"))
    RankSpine.cumulative(g, "v", Seq("c"), Seq("cum"))
      .select(col("v"),
        ((col("cum") - col("c")).cast(dec0) * 2 + col("c") + 1)
          .as("r2"))
  }

  /** The lineitem column set whose grouped rank spine q_spearman and
    * q_spearman_matrix share (cidx order is the contract: 0 =
    * quantity, 1 = extendedprice, 2 = discount). */
  private[graft] val SharedSpineCols =
    Seq("l_quantity", "l_extendedprice", "l_discount")

  /** The session-cached pinned grouped spine over [[SharedSpineCols]]
    * — built once per (session, corpus) via
    * [[graft.tools.PlanCache]]; both registered spearman queries read
    * cidx slices of it (identical doubled-rank values to the
    * per-column tables, so oracle hashes cannot move). */
  private[graft] def sharedLineitemSpine(
      s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    graft.tools.PlanCache.shared
      .get(s, s"$d#spine:lineitem:${SharedSpineCols.mkString(",")}")(
        graft.tools.Checkpoints.pin(
          rankTables(Tables.lineitem(s, d), SharedSpineCols)))

  private def rankTables(df: DataFrame, cols: Seq[String]): DataFrame = {
    val dec0 = DecimalType(38, 0)
    val long = df.select(posexplode(
      array(cols.map(c => col(c).cast("double")): _*))
      .as(Seq("cidx", "v")))
    val g = long.groupBy("cidx", "v").agg(count(lit(1)).as("c"))
    RankSpine.cumulative(g, "v", Seq("c"), Seq("cum"),
        partitionCols = Seq("cidx"))
      .select(col("cidx"), col("v"),
        ((col("cum") - col("c")).cast(dec0) * 2 + col("c") + 1)
          .as("r2"))
  }

  /** Full Spearman rank-correlation matrix over `cols` — the robust
    * (monotone-relationship) twin of [[corrMatrix]]. One rank table
    * per column (the [[spearman]] spine), k keyed hash joins back to
    * the rows, then ONE wide aggregate carrying all rank sums /
    * squares / pairwise cross-products in DECIMAL(38,0) (exact — the
    * doubled ranks are integers), folded per pair and unpivoted via
    * inline_outer exactly like corrMatrix. Constant columns → NULL. */
  def spearmanMatrix(df: DataFrame, cols: Seq[String]): DataFrame =
    // all k rank tables from one scan + one grouped spine; pinned so
    // the k join build-sides don't re-run the shared chain k times
    spearmanMatrixWith(df, cols,
      graft.tools.Checkpoints.pin(rankTables(df, cols)))

  /** [[spearmanMatrix]] against a prebuilt (cached) grouped rank
    * spine — the registered query shares one spine per (session,
    * corpus) with q_spearman through [[graft.tools.PlanCache]]. */
  private[graft] def spearmanMatrixWith(df: DataFrame,
      cols: Seq[String], rt: DataFrame): DataFrame = {
    require(cols.size >= 2, "spearmanMatrix needs at least two columns")
    require(cols.distinct.size == cols.size,
      s"spearmanMatrix columns must be distinct; got $cols")
    val idx = cols.indices
    var ranked = df.select(idx.map(i =>
      col(cols(i)).cast("double").as(s"__v$i")): _*)
    idx.foreach { i =>
      ranked = ranked.join(
        rt.filter(col("cidx") === i)
          .select(col("v").as(s"__v$i"), col("r2").as(s"__r$i")),
        s"__v$i")
    }
    val aggs = Seq(count(lit(1)).as("n")) ++
      idx.map(i => sum(col(s"__r$i")).as(s"sr$i")) ++
      (for (i <- idx; j <- i until cols.size) yield
        sum(col(s"__r$i") * col(s"__r$j")).as(s"sr${i}_$j"))
    val one = ranked.agg(aggs.head, aggs.tail: _*)
    val pairRows = (for (i <- idx; j <- i + 1 until cols.size) yield {
      val n = col("n").cast("double")
      val si = col(s"sr$i").cast("double")
      val sj = col(s"sr$j").cast("double")
      val sii = col(s"sr${i}_$i").cast("double")
      val sjj = col(s"sr${j}_$j").cast("double")
      val sij = col(s"sr${i}_$j").cast("double")
      val vprod = (n * sii - si * si) * (n * sjj - sj * sj)
      struct(lit(cols(i)).as("col_a"), lit(cols(j)).as("col_b"),
        col("n").cast("bigint").as("n"),
        when(vprod > 0, r6((n * sij - si * sj) / sqrt(vprod)))
          .as("spearman_rho"))
    }).toSeq
    one.select(inline_outer(array(pairRows: _*)))
      .orderBy("col_a", "col_b")
  }

  def spearman(df: DataFrame, xCol: String, yCol: String): DataFrame =
    // two consumers don't amortize the grouped-spine pin (measured
    // 2.8 → 6.6 s at sf0.1) — the STANDALONE pair op keeps per-column
    // spines; the registered query instead reuses the session-cached
    // grouped spine it shares with q_spearman_matrix (already paid)
    spearmanWith(df, xCol, yCol, rankTable(df, xCol),
      rankTable(df, yCol))

  /** [[spearman]] against prebuilt (v, r2) rank tables — identical
    * doubled-average-rank values whether the tables come from
    * [[rankTable]] or a cidx-slice of the grouped spine, so the
    * oracle hash cannot move. */
  private[graft] def spearmanWith(df: DataFrame, xCol: String,
      yCol: String, rx: DataFrame, ry: DataFrame): DataFrame = {
    val ranked = df
      .select(col(xCol).cast("double").as("__vx"),
        col(yCol).cast("double").as("__vy"))
      .join(rx.withColumnRenamed("v", "__vx")
        .withColumnRenamed("r2", "__rx"), "__vx")
      .join(ry.withColumnRenamed("v", "__vy")
        .withColumnRenamed("r2", "__ry"), "__vy")
    val m = ranked.agg(
      count(lit(1)).cast("double").as("n"),
      sum(col("__rx")).cast("double").as("sx"),
      sum(col("__ry")).cast("double").as("sy"),
      sum(col("__rx") * col("__ry")).cast("double").as("sxy"),
      sum(col("__rx") * col("__rx")).cast("double").as("sxx"),
      sum(col("__ry") * col("__ry")).cast("double").as("syy"))
    val n = col("n"); val sx = col("sx"); val sy = col("sy")
    val sxy = col("sxy"); val sxx = col("sxx"); val syy = col("syy")
    val vprod = (n * sxx - sx * sx) * (n * syy - sy * sy)
    m.select(n.cast("bigint").as("n"),
      when(vprod > 0, r6((n * sxy - sx * sy) / sqrt(vprod)))
        .as("spearman_rho"))
  }

  val all: Seq[Query] = Seq(
    // Rank correlation — the monotone-relationship readout Pearson
    // misses; exact under ties via integer doubled average ranks.
    Query(
      "q_spearman",
      Some("""WITH gx AS (SELECT l_quantity AS v, count(*) AS c
                          FROM lineitem GROUP BY 1),
              rx AS (SELECT v,
                       (sum(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                          PRECEDING AND CURRENT ROW) - c) * 2 + c + 1
                         AS r2
                     FROM gx),
              gy AS (SELECT l_extendedprice AS v, count(*) AS c
                     FROM lineitem GROUP BY 1),
              ry AS (SELECT v,
                       (sum(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                          PRECEDING AND CURRENT ROW) - c) * 2 + c + 1
                         AS r2
                     FROM gy),
              j AS (SELECT rx.r2 AS rxx, ry.r2 AS ryy
                    FROM lineitem
                    JOIN rx ON l_quantity = rx.v
                    JOIN ry ON l_extendedprice = ry.v),
              m AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                      CAST(sum(rxx) AS DOUBLE) AS sx,
                      CAST(sum(ryy) AS DOUBLE) AS sy,
                      CAST(sum(rxx * ryy) AS DOUBLE) AS sxy,
                      CAST(sum(rxx * rxx) AS DOUBLE) AS sxx,
                      CAST(sum(ryy * ryy) AS DOUBLE) AS syy
                    FROM j)
              SELECT CAST(n AS BIGINT) AS n,
                     CASE WHEN (n*sxx - sx*sx)*(n*syy - sy*sy) > 0
                       THEN round((n*sxy - sx*sy)
                         / sqrt((n*sxx - sx*sx)*(n*syy - sy*sy))
                         * 1000000.0)/1000000.0 END AS spearman_rho
              FROM m"""),
      (s, d) => {
        val rt = sharedLineitemSpine(s, d)
        spearmanWith(Tables.lineitem(s, d), "l_quantity",
          "l_extendedprice",
          rt.filter(col("cidx") === 0).select(col("v"), col("r2")),
          rt.filter(col("cidx") === 1).select(col("v"), col("r2")))
      }),

    // Every pairwise monotone relationship at once — the rank twin of
    // q_corr_matrix, immune to the outliers that bend Pearson.
    Query(
      "q_spearman_matrix",
      Some {
        val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
        val idx = cols.indices
        val rankCtes = cols.zipWithIndex.map { case (c, i) =>
          s"""g$i AS (SELECT $c AS v, count(*) AS c
                      FROM lineitem GROUP BY 1),
              r$i AS (SELECT v,
                        (sum(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                           PRECEDING AND CURRENT ROW) - c) * 2 + c + 1
                          AS r2
                      FROM g$i)"""
        }.mkString(",\n              ")
        val joins = cols.zipWithIndex
          .map { case (c, i) => s"JOIN r$i ON $c = r$i.v" }
          .mkString("\n                    ")
        val rankedSel = idx.map(i => s"r$i.r2 AS rr$i").mkString(", ")
        val sums = (Seq("CAST(count(*) AS DOUBLE) AS n") ++
          idx.map(i => s"CAST(sum(rr$i) AS DOUBLE) AS sr$i") ++
          (for (i <- idx; j <- i until cols.size) yield
            s"CAST(sum(rr$i * rr$j) AS DOUBLE) AS sr${i}_$j"))
          .mkString(",\n                      ")
        val branches = (for (i <- idx; j <- i + 1 until cols.size)
          yield
            s"""SELECT '${cols(i)}' AS col_a, '${cols(j)}' AS col_b,
                  CAST(n AS BIGINT) AS n,
                  CASE WHEN (n*sr${i}_$i - sr$i*sr$i)
                      *(n*sr${j}_$j - sr$j*sr$j) > 0
                    THEN round((n*sr${i}_$j - sr$i*sr$j)
                      / sqrt((n*sr${i}_$i - sr$i*sr$i)
                        *(n*sr${j}_$j - sr$j*sr$j))
                      * 1000000.0)/1000000.0 END AS spearman_rho
                FROM m""").mkString(" UNION ALL ")
        s"""WITH $rankCtes,
              j AS (SELECT $rankedSel FROM lineitem
                    $joins),
              m AS (SELECT $sums FROM j)
              SELECT * FROM ($branches) ORDER BY col_a, col_b"""
      },
      (s, d) => spearmanMatrixWith(Tables.lineitem(s, d),
        SharedSpineCols, sharedLineitemSpine(s, d))),

    // All pairwise correlations of lineitem's numerics in one scan —
    // the profiling matrix under every feature-redundancy screen.
    Query(
      "q_corr_matrix",
      Some {
        val cols = Seq("l_quantity", "l_extendedprice", "l_discount",
          "l_tax")
        val sums = (Seq("CAST(count(*) AS DOUBLE) AS n") ++
          cols.flatMap(c => Seq(
            s"CAST(sum(CAST($c AS DECIMAL(38,6))) AS DOUBLE) AS s_$c",
            s"CAST(sum(CAST($c*$c AS DECIMAL(38,6))) AS DOUBLE) AS q_$c"
          )) ++
          cols.combinations(2).map { case Seq(a, b) =>
            s"CAST(sum(CAST($a*$b AS DECIMAL(38,6))) AS DOUBLE) AS x_${a}_$b"
          }).mkString(",\n                 ")
        val branches = cols.combinations(2).map { case Seq(a, b) =>
          s"""SELECT '$a' AS col_a, '$b' AS col_b,
                CAST(n AS BIGINT) AS n,
                CASE WHEN (n*q_$a - s_$a*s_$a)*(n*q_$b - s_$b*s_$b) > 0
                  THEN round((n*x_${a}_$b - s_$a*s_$b)
                    / sqrt((n*q_$a - s_$a*s_$a)*(n*q_$b - s_$b*s_$b))
                    * 1000000.0)/1000000.0 END AS corr
              FROM m"""
        }.mkString(" UNION ALL ")
        s"""WITH m AS (SELECT $sums FROM lineitem)
            SELECT * FROM ($branches) ORDER BY col_a, col_b"""
      },
      (s, d) => corrMatrixFrom(lineitemMoments(s, d), MomentCols)),

    // Which part attributes determine which: brand→type fails, name→
    // brand holds, etc. — the dependency census schema inference needs.
    Query(
      "q_fd_profile",
      Some("""WITH pairs AS (
                SELECT 'p_brand->p_type' AS fd, p_brand AS lhs,
                       p_type AS rhs FROM part
                UNION ALL
                SELECT 'p_type->p_brand', p_type, p_brand FROM part
                UNION ALL
                SELECT 'p_name->p_brand', p_name, p_brand FROM part
                UNION ALL
                SELECT 'p_name->p_type', p_name, p_type FROM part),
              g AS (SELECT fd, lhs, count(DISTINCT rhs) AS nr
                    FROM pairs GROUP BY 1, 2)
              SELECT fd, CAST(count(*) AS BIGINT) AS n_lhs,
                     CAST(sum(CASE WHEN nr > 1 THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_violating,
                     CAST(max(nr) AS BIGINT) AS max_rhs,
                     CAST(CASE WHEN sum(CASE WHEN nr > 1 THEN 1 ELSE 0
                       END) = 0 THEN 1 ELSE 0 END AS BIGINT) AS holds
              FROM g GROUP BY fd ORDER BY fd"""),
      (s, d) => fdProfile(Tables.part(s, d), Seq(
        "p_brand" -> "p_type", "p_type" -> "p_brand",
        "p_name" -> "p_brand", "p_name" -> "p_type"))),

    // Which columns of orders could be a primary key — exact
    // distinct/null census per column in one pass.
    Query(
      "q_candidate_keys",
      Some {
        val cols = Seq("o_custkey", "o_orderdate", "o_orderkey",
          "o_orderpriority", "o_orderstatus", "o_totalprice")
        val branches = cols.map { c =>
          s"""SELECT '$c' AS col_name,
                CAST(count(*) AS BIGINT) AS n_rows,
                CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
                CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_null,
                round(CAST(count(DISTINCT $c) AS DOUBLE) / count(*)
                  * 1000000.0)/1000000.0 AS uniq_ratio,
                CAST(CASE WHEN count(DISTINCT $c) = count(*)
                  AND sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) = 0
                  THEN 1 ELSE 0 END AS BIGINT) AS is_key
              FROM orders"""
        }
        branches.mkString("", " UNION ALL ", " ORDER BY col_name")
      },
      (s, d) => candidateKeys(Tables.orders(s, d), Seq(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority"))),

    // Has the event-value distribution drifted between the first and
    // second half of the corpus' time span — the PSI gate (rule of
    // thumb: <0.1 stable, >0.25 investigate) model monitors run daily.
    Query(
      "q_psi",
      Some("""WITH b AS (
                SELECT CAST(min(floor(date_part('epoch', ts))) AS BIGINT)
                         AS t0,
                       CAST(max(floor(date_part('epoch', ts))) AS BIGINT)
                         AS t1,
                       min(value) AS v0, max(value) AS v1
                FROM events),
              binned AS (
                SELECT CASE WHEN CAST(floor(date_part('epoch', ts))
                         AS BIGINT) * 2 < t0 + t1 THEN 0 ELSE 1 END
                         AS half,
                       CAST(least(9, greatest(0,
                         floor((value - v0) * 10 / (v1 - v0 + 1e-9))))
                         AS BIGINT) AS bin
                FROM events CROSS JOIN b),
              counts AS (
                SELECT bin,
                       sum(CASE WHEN half = 0 THEN 1 ELSE 0 END)
                         AS n_first,
                       sum(CASE WHEN half = 1 THEN 1 ELSE 0 END)
                         AS n_second
                FROM binned GROUP BY 1),
              filled AS (
                SELECT r.range AS bin,
                       coalesce(n_first, 0) AS n_first,
                       coalesce(n_second, 0) AS n_second
                FROM range(10) r LEFT JOIN counts ON counts.bin = r.range),
              t AS (SELECT sum(n_first) AS na, sum(n_second) AS nb
                    FROM filled),
              terms AS (
                SELECT bin, n_first, n_second,
                       (CAST(n_first AS DOUBLE) + 0.5)
                         / (CAST(na AS DOUBLE) + 5.0) AS p,
                       (CAST(n_second AS DOUBLE) + 0.5)
                         / (CAST(nb AS DOUBLE) + 5.0) AS q
                FROM filled CROSS JOIN t),
              tt AS (SELECT bin, n_first, n_second, p, q,
                            (p - q) * ln(p / q) AS term FROM terms),
              s AS (SELECT sum(CAST(term AS DECIMAL(38,12))) AS psi
                    FROM tt)
              SELECT CAST(bin AS BIGINT) AS bin,
                     CAST(n_first AS BIGINT) AS n_first,
                     CAST(n_second AS BIGINT) AS n_second,
                     round(p * 1000000.0)/1000000.0 AS p,
                     round(q * 1000000.0)/1000000.0 AS q,
                     round(term * 1000000.0)/1000000.0 AS psi_term,
                     round(CAST(psi AS DOUBLE) * 1000000.0)/1000000.0
                       AS psi_total
              FROM tt CROSS JOIN s ORDER BY bin"""),
      (s, d) => psi(Tables.events(s, d), "ts", "value")),

    // PSI's bounded twin: Jensen–Shannon divergence of the same
    // first-half/second-half split — symmetric, capped at ln 2, so
    // one alert threshold ports across every monitored metric.
    Query(
      "q_js_divergence",
      Some("""WITH b AS (
                SELECT CAST(min(floor(date_part('epoch', ts))) AS BIGINT)
                         AS t0,
                       CAST(max(floor(date_part('epoch', ts))) AS BIGINT)
                         AS t1,
                       min(value) AS v0, max(value) AS v1
                FROM events),
              binned AS (
                SELECT CASE WHEN CAST(floor(date_part('epoch', ts))
                         AS BIGINT) * 2 < t0 + t1 THEN 0 ELSE 1 END
                         AS half,
                       CAST(least(9, greatest(0,
                         floor((value - v0) * 10 / (v1 - v0 + 1e-9))))
                         AS BIGINT) AS bin
                FROM events CROSS JOIN b),
              counts AS (
                SELECT bin,
                       sum(CASE WHEN half = 0 THEN 1 ELSE 0 END)
                         AS n_first,
                       sum(CASE WHEN half = 1 THEN 1 ELSE 0 END)
                         AS n_second
                FROM binned GROUP BY 1),
              filled AS (
                SELECT r.range AS bin,
                       coalesce(n_first, 0) AS n_first,
                       coalesce(n_second, 0) AS n_second
                FROM range(10) r LEFT JOIN counts ON counts.bin = r.range),
              t AS (SELECT sum(n_first) AS na, sum(n_second) AS nb
                    FROM filled),
              terms AS (
                SELECT bin, n_first, n_second,
                       (CAST(n_first AS DOUBLE) + 0.5)
                         / (CAST(na AS DOUBLE) + 5.0) AS p,
                       (CAST(n_second AS DOUBLE) + 0.5)
                         / (CAST(nb AS DOUBLE) + 5.0) AS q
                FROM filled CROSS JOIN t),
              mm AS (SELECT bin, n_first, n_second, p, q,
                            (p + q) / 2 AS m FROM terms),
              tt AS (SELECT bin, n_first, n_second, p, q,
                            (p * ln(p / m) + q * ln(q / m)) / 2 AS term
                     FROM mm),
              s AS (SELECT sum(CAST(term AS DECIMAL(38,12))) AS jsd
                    FROM tt)
              SELECT CAST(bin AS BIGINT) AS bin,
                     CAST(n_first AS BIGINT) AS n_first,
                     CAST(n_second AS BIGINT) AS n_second,
                     round(p * 1000000.0)/1000000.0 AS p,
                     round(q * 1000000.0)/1000000.0 AS q,
                     round(term * 1000000.0)/1000000.0 AS jsd_term,
                     round(CAST(jsd AS DOUBLE) * 1000000.0)/1000000.0
                       AS jsd_total
              FROM tt CROSS JOIN s ORDER BY bin"""),
      (s, d) => jsDivergence(Tables.events(s, d), "ts", "value")),

    // Does quantity still track price once the discount is held
    // fixed? Partial correlation — the three-variable question every
    // "correlation ≠ causation" review actually asks.
    Query(
      "q_partial_corr",
      Some("""WITH g AS (
                SELECT count(*) AS nn,
                       sum(CAST(l_quantity AS DECIMAL(38,6))) AS d0,
                       sum(CAST(l_extendedprice AS DECIMAL(38,6)))
                         AS d1,
                       sum(CAST(l_discount AS DECIMAL(38,6))) AS d2,
                       sum(CAST(l_quantity * l_quantity
                         AS DECIMAL(38,6))) AS d0_0,
                       sum(CAST(l_quantity * l_extendedprice
                         AS DECIMAL(38,6))) AS d0_1,
                       sum(CAST(l_quantity * l_discount
                         AS DECIMAL(38,6))) AS d0_2,
                       sum(CAST(l_extendedprice * l_extendedprice
                         AS DECIMAL(38,6))) AS d1_1,
                       sum(CAST(l_extendedprice * l_discount
                         AS DECIMAL(38,6))) AS d1_2,
                       sum(CAST(l_discount * l_discount
                         AS DECIMAL(38,6))) AS d2_2
                FROM lineitem),
              dd AS (SELECT CAST(nn AS BIGINT) AS n_rows,
                       CAST(nn AS DOUBLE) AS n,
                       CAST(d0 AS DOUBLE) AS s0,
                       CAST(d1 AS DOUBLE) AS s1,
                       CAST(d2 AS DOUBLE) AS s2,
                       CAST(d0_0 AS DOUBLE) AS s0_0,
                       CAST(d0_1 AS DOUBLE) AS s0_1,
                       CAST(d0_2 AS DOUBLE) AS s0_2,
                       CAST(d1_1 AS DOUBLE) AS s1_1,
                       CAST(d1_2 AS DOUBLE) AS s1_2,
                       CAST(d2_2 AS DOUBLE) AS s2_2
                     FROM g),
              vv AS (SELECT *,
                       n * s0_0 - s0 * s0 AS v0,
                       n * s1_1 - s1 * s1 AS v1,
                       n * s2_2 - s2 * s2 AS v2
                     FROM dd),
              rr AS (SELECT *,
                       (n * s0_1 - s0 * s1) / sqrt(v0 * v1) AS rxy,
                       (n * s0_2 - s0 * s2) / sqrt(v0 * v2) AS rxz,
                       (n * s1_2 - s1 * s2) / sqrt(v1 * v2) AS ryz
                     FROM vv),
              f AS (SELECT *,
                      (1.0 - rxz * rxz) * (1.0 - ryz * ryz) AS den,
                      v0 > 0 AND v1 > 0 AND v2 > 0 AS ok
                    FROM rr)
              SELECT n_rows AS n,
                     round(CASE WHEN ok THEN rxy END
                       * 1000000.0)/1000000.0 AS r_xy,
                     round(CASE WHEN ok THEN rxz END
                       * 1000000.0)/1000000.0 AS r_xz,
                     round(CASE WHEN ok THEN ryz END
                       * 1000000.0)/1000000.0 AS r_yz,
                     round(CASE WHEN ok AND den > 0
                         THEN (rxy - rxz * ryz) / sqrt(den) END
                       * 1000000.0)/1000000.0 AS partial_corr
              FROM f"""),
      (s, d) => partialCorr(Tables.lineitem(s, d), "l_quantity",
        "l_extendedprice", "l_discount")),

    // Does a normalized "score" come true at its stated rate — the
    // WHY is the Brier what it is — miscalibration you can fix vs
    // discrimination you can't fake vs the base-rate floor.
    Query(
      "q_brier_decomp",
      Some("""WITH b AS (SELECT min(o_totalprice) AS lo,
                       max(o_totalprice) AS hi FROM orders),
              r AS (SELECT (o_totalprice - lo) / (hi - lo) AS p,
                       CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END
                         AS y
                    FROM orders CROSS JOIN b),
              rws AS (SELECT CAST(least(9, greatest(0,
                        floor(p * 10))) AS BIGINT) AS bin, p, y
                      FROM r),
              bb AS (SELECT bin, count(*) AS n,
                       sum(CAST(p AS DECIMAL(38,12))) AS sp,
                       sum(y) AS npos,
                       sum(CAST((p - y) * (p - y) AS DECIMAL(38,12)))
                         AS sq
                     FROM rws GROUP BY 1),
              t AS (SELECT sum(n) AS nt, sum(npos) AS post,
                      CAST(sum(sq) AS DOUBLE) AS sqt
                    FROM bb),
              m AS (SELECT
                      sum(CAST(CAST(sp - CAST(npos AS DECIMAL(38,12))
                            AS DOUBLE)
                          * CAST(sp - CAST(npos AS DECIMAL(38,12))
                            AS DOUBLE)
                          / CAST(n AS DOUBLE)
                        AS DECIMAL(38,12))) AS rel,
                      sum(CAST(CAST(n AS DOUBLE)
                          * ((CAST(npos AS DOUBLE) / CAST(n AS DOUBLE)
                              - CAST(post AS DOUBLE)
                                / CAST(nt AS DOUBLE))
                            * (CAST(npos AS DOUBLE) / CAST(n AS DOUBLE)
                              - CAST(post AS DOUBLE)
                                / CAST(nt AS DOUBLE)))
                        AS DECIMAL(38,12))) AS res,
                      min(nt) AS n, min(post) AS post, min(sqt) AS sqt
                    FROM bb CROSS JOIN t),
              f AS (SELECT CAST(n AS BIGINT) AS n,
                      CAST(rel AS DOUBLE) / n AS rel,
                      CAST(res AS DOUBLE) / n AS res,
                      (CAST(post AS DOUBLE) / n)
                        * (1.0 - CAST(post AS DOUBLE) / n) AS unc,
                      sqt / n AS brier
                    FROM m)
              SELECT n,
                     round(CASE WHEN n > 0 THEN brier END
                       * 1000000.0)/1000000.0 AS brier,
                     round(CASE WHEN n > 0 THEN rel END
                       * 1000000.0)/1000000.0 AS reliability,
                     round(CASE WHEN n > 0 THEN res END
                       * 1000000.0)/1000000.0 AS resolution,
                     round(CASE WHEN n > 0 THEN unc END
                       * 1000000.0)/1000000.0 AS uncertainty,
                     round(CASE WHEN n > 0 THEN
                         brier - (rel - res + unc) END
                       * 1000000.0)/1000000.0 AS within_var
              FROM f"""),
      (s, d) => {
        val ord = Tables.orders(s, d)
        val b = ord.agg(min("o_totalprice").as("__lo"),
          max("o_totalprice").as("__hi"))
        brierDecomp(
          ord.crossJoin(broadcast(b))
            .select(((col("o_totalprice") - col("__lo")) /
              (col("__hi") - col("__lo"))).as("prob"),
              (col("o_orderstatus") === "F").as("label")),
          "prob", "label")
      }),

    // Are the three fit regressors collinear — the VIF census read
    // before trusting ols_multi / logit coefficients.
    Query(
      "q_vif",
      Some("""WITH g AS (
                SELECT CAST(count(*) AS DOUBLE) AS n,
                       CAST(sum(CAST(l_quantity AS DECIMAL(38,6)))
                         AS DOUBLE) AS s0,
                       CAST(sum(CAST(l_quantity * l_quantity
                         AS DECIMAL(38,6))) AS DOUBLE) AS q0,
                       CAST(sum(CAST(l_extendedprice
                         AS DECIMAL(38,6))) AS DOUBLE) AS s1,
                       CAST(sum(CAST(l_extendedprice * l_extendedprice
                         AS DECIMAL(38,6))) AS DOUBLE) AS q1,
                       CAST(sum(CAST(l_discount AS DECIMAL(38,6)))
                         AS DOUBLE) AS s2,
                       CAST(sum(CAST(l_discount * l_discount
                         AS DECIMAL(38,6))) AS DOUBLE) AS q2,
                       CAST(sum(CAST(l_quantity * l_extendedprice
                         AS DECIMAL(38,6))) AS DOUBLE) AS x01,
                       CAST(sum(CAST(l_quantity * l_discount
                         AS DECIMAL(38,6))) AS DOUBLE) AS x02,
                       CAST(sum(CAST(l_extendedprice * l_discount
                         AS DECIMAL(38,6))) AS DOUBLE) AS x12
                FROM lineitem),
              c AS (SELECT n,
                      CASE WHEN (n*q0 - s0*s0) * (n*q1 - s1*s1) > 0
                        THEN (n*x01 - s0*s1)
                          / sqrt((n*q0 - s0*s0) * (n*q1 - s1*s1)) END
                        AS a,
                      CASE WHEN (n*q0 - s0*s0) * (n*q2 - s2*s2) > 0
                        THEN (n*x02 - s0*s2)
                          / sqrt((n*q0 - s0*s0) * (n*q2 - s2*s2)) END
                        AS b,
                      CASE WHEN (n*q1 - s1*s1) * (n*q2 - s2*s2) > 0
                        THEN (n*x12 - s1*s2)
                          / sqrt((n*q1 - s1*s1) * (n*q2 - s2*s2)) END
                        AS c
                    FROM g),
              d AS (SELECT n, a, b, c,
                      1.0 + 2*a*b*c - a*a - b*b - c*c AS det
                    FROM c),
              rws AS (
                SELECT 'l_quantity' AS feature,
                       CAST(n AS BIGINT) AS n,
                       CASE WHEN abs(det) > 0
                         THEN (1.0 - c*c) / det END AS v
                FROM d
                UNION ALL
                SELECT 'l_extendedprice', CAST(n AS BIGINT),
                       CASE WHEN abs(det) > 0
                         THEN (1.0 - b*b) / det END
                FROM d
                UNION ALL
                SELECT 'l_discount', CAST(n AS BIGINT),
                       CASE WHEN abs(det) > 0
                         THEN (1.0 - a*a) / det END
                FROM d)
              SELECT feature, n,
                     round(v * 1000000.0)/1000000.0 AS vif,
                     round(CASE WHEN v > 0 THEN 1.0 - 1.0 / v END
                       * 1000000.0)/1000000.0 AS r2_others
              FROM rws ORDER BY 1"""),
      // folds from the cached superset moment row (MomentCols order
      // keeps the pair names aligned)
      (s, d) => vifFrom(lineitemMoments(s, d),
        Seq("l_quantity", "l_extendedprice", "l_discount"))),

    // Which priority levels separate finished from open orders — the
    // WoE/IV screen every tabular feature pipeline ranks with.
    Query(
      "q_woe_iv",
      Some("""WITH per AS (
                SELECT CAST(o_orderpriority AS VARCHAR) AS level,
                       count(*) AS n,
                       sum(CASE WHEN o_orderstatus = 'F'
                         THEN 1 ELSE 0 END) AS n_pos
                FROM orders GROUP BY 1),
              p2 AS (SELECT level, n, n_pos, n - n_pos AS n_neg
                     FROM per),
              t AS (SELECT sum(n_pos) AS pt, sum(n_neg) AS nt
                    FROM p2),
              w AS (SELECT level, n, n_pos, n_neg,
                      CASE WHEN n_pos > 0 AND n_neg > 0
                            AND pt > 0 AND nt > 0 THEN
                        ln((CAST(n_pos AS DOUBLE)
                             / CAST(pt AS DOUBLE))
                           / (CAST(n_neg AS DOUBLE)
                             / CAST(nt AS DOUBLE))) END AS woe_raw,
                      CASE WHEN n_pos > 0 AND n_neg > 0
                            AND pt > 0 AND nt > 0 THEN
                        (CAST(n_pos AS DOUBLE) / CAST(pt AS DOUBLE)
                          - CAST(n_neg AS DOUBLE)
                            / CAST(nt AS DOUBLE))
                        * ln((CAST(n_pos AS DOUBLE)
                              / CAST(pt AS DOUBLE))
                            / (CAST(n_neg AS DOUBLE)
                              / CAST(nt AS DOUBLE))) END AS term
                    FROM p2 CROSS JOIN t),
              iv AS (SELECT CAST(sum(CAST(term AS DECIMAL(38,12)))
                       AS DOUBLE) AS ivt FROM w)
              SELECT level, CAST(n AS BIGINT) AS n,
                     CAST(n_pos AS BIGINT) AS n_pos,
                     CAST(n_neg AS BIGINT) AS n_neg,
                     round(woe_raw * 1000000.0)/1000000.0 AS woe,
                     round(term * 1000000.0)/1000000.0 AS iv_term,
                     round(ivt * 1000000.0)/1000000.0 AS iv
              FROM w CROSS JOIN iv ORDER BY 1"""),
      (s, d) => woeIv(Tables.orders(s, d)
          .select(col("o_orderpriority").as("level"),
            (col("o_orderstatus") === "F").as("label")),
        "level", "label")),

    // reliability table + Brier/ECE every model eval should print.
    Query(
      "q_calibration",
      Some("""WITH b AS (SELECT min(o_totalprice) AS lo,
                       max(o_totalprice) AS hi FROM orders),
              r AS (SELECT (o_totalprice - lo) / (hi - lo) AS p,
                       CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END
                         AS y
                    FROM orders CROSS JOIN b),
              rws AS (SELECT CAST(least(9, greatest(0,
                        floor(p * 10))) AS BIGINT) AS bin, p, y
                      FROM r),
              bb AS (SELECT bin, count(*) AS n,
                       sum(CAST(p AS DECIMAL(38,12))) AS sp,
                       sum(y) AS npos,
                       sum(CAST((p - y) * (p - y) AS DECIMAL(38,12)))
                         AS sq
                     FROM rws GROUP BY 1),
              spn AS (SELECT range AS bin FROM range(10)),
              j AS (SELECT spn.bin, n, sp, npos, sq
                    FROM spn LEFT JOIN bb ON bb.bin = spn.bin),
              t AS (SELECT sum(n) AS nt,
                      CAST(sum(sq) AS DOUBLE) AS sqt,
                      sum(CAST(abs(sp - CAST(npos AS DECIMAL(38,12)))
                        AS DECIMAL(38,12))) AS gapsum
                    FROM bb)
              SELECT CAST(bin AS BIGINT) AS bin,
                     CAST(coalesce(n, 0) AS BIGINT) AS n,
                     round(CAST(sp AS DOUBLE) / n
                       * 1000000.0)/1000000.0 AS mean_prob,
                     round(CAST(npos AS DOUBLE) / n
                       * 1000000.0)/1000000.0 AS pos_rate,
                     round((CAST(sp AS DOUBLE) / n
                         - CAST(npos AS DOUBLE) / n)
                       * 1000000.0)/1000000.0 AS gap,
                     round(sqt / nt * 1000000.0)/1000000.0 AS brier,
                     round(CAST(gapsum AS DOUBLE) / nt
                       * 1000000.0)/1000000.0 AS ece
              FROM j CROSS JOIN t ORDER BY bin"""),
      (s, d) => {
        val ord = Tables.orders(s, d)
        val b = ord.agg(min("o_totalprice").as("__lo"),
          max("o_totalprice").as("__hi"))
        calibration(
          ord.crossJoin(broadcast(b))
            .select(((col("o_totalprice") - col("__lo")) /
              (col("__hi") - col("__lo"))).as("prob"),
              (col("o_orderstatus") === "F").as("label")),
          "prob", "label")
      }),

    // The monotone remap q_calibration's report motivates: isotonic
    // (PAV) fit over the same binned reliability table, stated as the
    // max-min identity — bounded relational algebra, no sequential
    // pooling loop.
    Query(
      "q_isotonic",
      Some("""WITH b AS (SELECT min(o_totalprice) AS lo,
                       max(o_totalprice) AS hi FROM orders),
              r AS (SELECT (o_totalprice - lo) / (hi - lo) AS p,
                       CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END
                         AS y
                    FROM orders CROSS JOIN b),
              rws AS (SELECT CAST(least(9, greatest(0,
                        floor(p * 10))) AS BIGINT) AS bin, p, y
                      FROM r),
              bb AS (SELECT bin, count(*) AS n,
                       sum(CAST(p AS DECIMAL(38,12))) AS sp,
                       sum(y) AS npos
                     FROM rws GROUP BY 1),
              pre AS (SELECT bin, n, sp, npos,
                        sum(n) OVER (ORDER BY bin ROWS BETWEEN
                          UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
                        sum(npos) OVER (ORDER BY bin ROWS BETWEEN
                          UNBOUNDED PRECEDING AND CURRENT ROW) AS cp
                      FROM bb),
              pools AS (SELECT j.bin AS jb, l.bin AS lb,
                          CAST(l.cp - (j.cp - j.npos) AS DOUBLE)
                            / CAST(l.cw - (j.cw - j.n) AS DOUBLE)
                            AS rate
                        FROM pre j JOIN pre l ON j.bin <= l.bin),
              mt AS (SELECT jb, min(rate) AS mrate
                     FROM pools GROUP BY 1),
              iso AS (SELECT pre.bin, max(mrate) AS iso
                      FROM pre JOIN mt ON mt.jb <= pre.bin
                      GROUP BY 1)
              SELECT CAST(pre.bin AS BIGINT) AS bin,
                     CAST(n AS BIGINT) AS n,
                     round(CAST(sp AS DOUBLE) / n
                       * 1000000.0)/1000000.0 AS mean_prob,
                     round(CAST(npos AS DOUBLE) / n
                       * 1000000.0)/1000000.0 AS pos_rate,
                     round(iso * 1000000.0)/1000000.0 AS calibrated
              FROM pre JOIN iso ON pre.bin = iso.bin
              ORDER BY bin"""),
      (s, d) => {
        val ord = Tables.orders(s, d)
        val b = ord.agg(min("o_totalprice").as("__lo"),
          max("o_totalprice").as("__hi"))
        isotonicCalibration(
          ord.crossJoin(broadcast(b))
            .select(((col("o_totalprice") - col("__lo")) /
              (col("__hi") - col("__lo"))).as("prob"),
              (col("o_orderstatus") === "F").as("label")),
          "prob", "label")
      }),

    // Rows improbable JOINTLY though plausible marginally — high price
    // at low quantity — via covariance-aware Mahalanobis distance at
    // the chi-square(3) 95% fence.
    Query(
      "q_mahalanobis",
      Some("""WITH g AS (
                SELECT count(*) AS nn,
                       sum(CAST(l_quantity AS DECIMAL(38,6))) AS e0,
                       sum(CAST(l_extendedprice AS DECIMAL(38,6)))
                         AS e1,
                       sum(CAST(l_discount AS DECIMAL(38,6))) AS e2,
                       sum(CAST(l_quantity * l_quantity
                         AS DECIMAL(38,6))) AS e0_0,
                       sum(CAST(l_quantity * l_extendedprice
                         AS DECIMAL(38,6))) AS e0_1,
                       sum(CAST(l_quantity * l_discount
                         AS DECIMAL(38,6))) AS e0_2,
                       sum(CAST(l_extendedprice * l_extendedprice
                         AS DECIMAL(38,6))) AS e1_1,
                       sum(CAST(l_extendedprice * l_discount
                         AS DECIMAL(38,6))) AS e1_2,
                       sum(CAST(l_discount * l_discount
                         AS DECIMAL(38,6))) AS e2_2
                FROM lineitem),
              dd AS (SELECT CAST(nn AS DOUBLE) AS n,
                       CAST(e0 AS DOUBLE) AS s0,
                       CAST(e1 AS DOUBLE) AS s1,
                       CAST(e2 AS DOUBLE) AS s2,
                       CAST(e0_0 AS DOUBLE) AS s0_0,
                       CAST(e0_1 AS DOUBLE) AS s0_1,
                       CAST(e0_2 AS DOUBLE) AS s0_2,
                       CAST(e1_1 AS DOUBLE) AS s1_1,
                       CAST(e1_2 AS DOUBLE) AS s1_2,
                       CAST(e2_2 AS DOUBLE) AS s2_2
                     FROM g),
              c AS (SELECT
                      s0 / n AS m0, s1 / n AS m1, s2 / n AS m2,
                      (s0_0 - s0 * s0 / n) / (n - 1.0) AS a00,
                      (s0_1 - s0 * s1 / n) / (n - 1.0) AS a01,
                      (s0_2 - s0 * s2 / n) / (n - 1.0) AS a02,
                      (s1_1 - s1 * s1 / n) / (n - 1.0) AS a11,
                      (s1_2 - s1 * s2 / n) / (n - 1.0) AS a12,
                      (s2_2 - s2 * s2 / n) / (n - 1.0) AS a22
                    FROM dd),
              pdet AS (SELECT *,
                         a00 * (a11 * a22 - a12 * a12)
                           - a01 * (a01 * a22 - a02 * a12)
                           + a02 * (a01 * a12 - a02 * a11) AS det
                       FROM c),
              params AS (SELECT m0, m1, m2,
                           (a11 * a22 - a12 * a12) / det AS i00,
                           (a02 * a12 - a01 * a22) / det AS i01,
                           (a01 * a12 - a02 * a11) / det AS i02,
                           (a00 * a22 - a02 * a02) / det AS i11,
                           (a02 * a01 - a00 * a12) / det AS i12,
                           (a00 * a11 - a01 * a01) / det AS i22
                         FROM pdet WHERE abs(det) > 0),
              scored AS (
                SELECT l_orderkey, l_quantity, l_extendedprice,
                       l_discount,
                       i00 * (l_quantity - m0) * (l_quantity - m0)
                         + i11 * (l_extendedprice - m1)
                           * (l_extendedprice - m1)
                         + i22 * (l_discount - m2) * (l_discount - m2)
                         + 2.0 * (i01 * (l_quantity - m0)
                             * (l_extendedprice - m1)
                           + i02 * (l_quantity - m0)
                             * (l_discount - m2)
                           + i12 * (l_extendedprice - m1)
                             * (l_discount - m2)) AS dsq
                FROM lineitem CROSS JOIN params)
              SELECT l_orderkey, l_quantity, l_extendedprice,
                     l_discount,
                     round(dsq * 1000000.0)/1000000.0 AS d2
              FROM scored WHERE dsq > 7.815
              ORDER BY 1, 2, 3, 4"""),
      // moment scan folds from the cached superset row; the per-row
      // scoring pass still reads the corpus
      (s, d) => mahalanobisFrom(Tables.lineitem(s, d),
        "l_orderkey",
        Seq("l_quantity", "l_extendedprice", "l_discount"),
        lineitemMoments(s, d), 7.815)))
}
