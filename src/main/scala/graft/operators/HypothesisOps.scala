package graft.operators

import graft.Query
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Nonparametric two-sample tests: Kolmogorov–Smirnov (largest ECDF
  * gap) and Mann–Whitney U (rank-sum with tie correction) — the "are
  * these two distributions actually different" questions that don't
  * assume normality, as q_ab_metrics' z-test does.
  *
  * Both reduce to exact integer arithmetic over the per-distinct-value
  * count table: the KS gap compares integer cross-products
  * |cumA·nB − cumB·nA| (never a float ECDF), and the U statistic folds
  * from doubled average ranks 2·rank = 2·C(<v) + c(v) + 1, which are
  * integers even under ties. The single global cumulative each needs
  * runs through [[RankSpine]] — heavy-tail-safe refining buckets with
  * a ≤65536-distinct bound per within-bucket window partition, never
  * a one-partition sort of the corpus on ANY value distribution.
  * Cross-products accumulate in DECIMAL(38,0) so the integers stay
  * exact far past BIGINT scale.
  */
object HypothesisOps {

  private def r6(c: Column): Column = round(c * lit(1000000.0)) / lit(1000000.0)
  private val dec0 = DecimalType(38, 0)

  /** Per-distinct-value table (v, na, nb) with inclusive cumulative
    * counts (ca, cb) for each group. Shared spine of both tests —
    * routed through [[RankSpine]] so the within-bucket window
    * partitions stay ≤65536 rows on ANY value distribution (the
    * round-13 single-level spine degenerated on heavy tails; see
    * RankSpine's scaladoc). The cumulative sums are bucket-invariant,
    * so the swap is hash-neutral. */
  private[graft] def cumCounts(df: DataFrame, valCol: String,
      groupCol: String, aVal: String, bVal: String): DataFrame = {
    val s = df.filter(col(groupCol).isin(aVal, bVal))
      .select(col(valCol).cast("double").as("v"),
        when(col(groupCol) === aVal, 1L).otherwise(0L).as("isa"))
    val g = s.groupBy("v")
      .agg(sum(col("isa")).as("na"), sum(lit(1L) - col("isa")).as("nb"))
    RankSpine.cumulative(g, "v", Seq("na", "nb"), Seq("ca", "cb"))
  }

  /** The (session, corpus)-cached orders-fixture spine: q_ks_test,
    * q_mann_whitney, q_qq, q_auc, q_pr_auc, and q_threshold_sweep all
    * fold off the IDENTICAL [[cumCounts]] table (o_totalprice ranked
    * over F-vs-O orders), so the spine builds once per session per
    * corpus and every consumer reads the persisted blocks — the
    * clusterKeepersForDir stance (VERDICT r14 item 4: q_auc +
    * q_pr_auc each paid the full spine). Evicts on [[IndexCache]]'s
    * session-end hook. Public df-based APIs below stay cache-free. */
  private val ordersSpineCache = new IndexCache[DataFrame](
    (spark, sfDir) => cumCounts(Tables.orders(spark, sfDir),
        "o_totalprice", "o_orderstatus", "F", "O")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK),
    _.unpersist(blocking = false))

  private def ordersSpine(s: SparkSession, d: String): DataFrame =
    ordersSpineCache.get(s, d)

  /** Two-sample Kolmogorov–Smirnov: D = max_v |F_a(v) − F_b(v)| over
    * the pooled distinct values (the ECDFs only step there, so the max
    * is exact), with the asymptotic two-sided p ≈ 2·exp(−2·m·D²),
    * m = nA·nB/(nA+nB). The max runs over the integer cross-product
    * gap |cumA·nB − cumB·nA|; one float division at the very end. */
  def ksTest(df: DataFrame, valCol: String, groupCol: String,
      aVal: String, bVal: String): DataFrame =
    ksFromCum(cumCounts(df, valCol, groupCol, aVal, bVal))

  private[graft] def ksFromCum(cum: DataFrame): DataFrame = {
    val tot = cum.agg(sum("na").as("nat"), sum("nb").as("nbt"))
    val m = cum.crossJoin(broadcast(tot))
      .agg(
        max(abs(col("ca").cast(dec0) * col("nbt") -
          col("cb").cast(dec0) * col("nat"))).as("dnum"),
        min("nat").as("n_a"), min("nbt").as("n_b"))
    val na = col("n_a").cast("double"); val nb = col("n_b").cast("double")
    val d = col("dnum").cast("double") / (na * nb)
    m.select(col("n_a"), col("n_b"), r6(d).as("d_stat"),
      r6(least(lit(1.0),
        lit(2.0) * exp(lit(-2.0) * d * d * na * nb / (na + nb))))
        .as("p_value"))
  }

  /** 1-D Wasserstein-1 (earth-mover's) distance between the two
    * groups' empirical distributions — the INTEGRAL companion to
    * [[ksTest]]'s supremum: W₁ = ∫|F_a − F_b| dt weighs how far apart
    * the distributions sit over their whole support, where KS only
    * sees the single worst gap (a small shift everywhere and a big
    * shift in one tail can share a D but differ 100× in W₁).
    *
    * No sort, no lead/lag, no global window: the piecewise-constant
    * integral Σᵢ gᵢ·(vᵢ₊₁ − vᵢ) telescopes to Σᵢ vᵢ·(gᵢ₋₁ − gᵢ)
    * because g₀ = g_last = 0 (ECDFs agree below the min and at the
    * max), and the PREVIOUS row's gap needs no lag — cumulative minus
    * own count: gᵢ₋₁ = |(ca−na)·n_b − (cb−nb)·n_a|. So W₁·n_a·n_b
    * folds in ONE aggregate over the [[cumCounts]] spine, per-row
    * products rounded into DECIMAL(38,12) (identical operand order in
    * the oracle), one float division at the end. */
  def wasserstein(df: DataFrame, valCol: String, groupCol: String,
      aVal: String, bVal: String): DataFrame =
    w1FromCum(cumCounts(df, valCol, groupCol, aVal, bVal))

  private[graft] def w1FromCum(cum: DataFrame): DataFrame = {
    val dec12 = DecimalType(38, 12)
    val tot = cum.agg(sum("na").as("nat"), sum("nb").as("nbt"))
    val g = abs(col("ca").cast(dec0) * col("nbt") -
      col("cb").cast(dec0) * col("nat"))
    val gPrev = abs((col("ca") - col("na")).cast(dec0) * col("nbt") -
      (col("cb") - col("nb")).cast(dec0) * col("nat"))
    val m = cum.crossJoin(broadcast(tot)).agg(
      sum((col("v") * (gPrev - g).cast("double")).cast(dec12)).as("s"),
      min("nat").as("n_a"), min("nbt").as("n_b"))
    val na = col("n_a").cast("double"); val nb = col("n_b").cast("double")
    val ok = col("n_a") > 0 && col("n_b") > 0
    m.select(coalesce(col("n_a"), lit(0L)).as("n_a"),
      coalesce(col("n_b"), lit(0L)).as("n_b"),
      when(ok, r6(col("s").cast("double") / (na * nb))).as("w1"))
  }

  /** Two-sample Cramér–von Mises statistic — the MEAN-squared ECDF
    * gap over every pooled observation: T = (n_a·n_b/N²)·Σ_z
    * (F_a(z) − F_b(z))², z ranging over all N pooled points with
    * multiplicity. Where [[ksTest]] keys on the worst gap and
    * [[wasserstein]] on gap × value-spacing, CvM weighs gaps by how
    * much DATA sits at them — sensitive to broad mid-distribution
    * drift that never produces one large D. Pure integers off the
    * same spine: Σ (na+nb)·gap² stays in DECIMAL(38,0) (gap ≤
    * n_a·n_b keeps the summand < 1e30 at any tested scale), one
    * division by n_a·n_b·N² at the end. */
  def cvmTest(df: DataFrame, valCol: String, groupCol: String,
      aVal: String, bVal: String): DataFrame =
    cvmFromCum(cumCounts(df, valCol, groupCol, aVal, bVal))

  private[graft] def cvmFromCum(cum: DataFrame): DataFrame = {
    val tot = cum.agg(sum("na").as("nat"), sum("nb").as("nbt"))
    val g = col("ca").cast(dec0) * col("nbt") -
      col("cb").cast(dec0) * col("nat")
    val m = cum.crossJoin(broadcast(tot)).agg(
      sum((col("na") + col("nb")).cast(dec0) * g * g).as("s"),
      min("nat").as("n_a"), min("nbt").as("n_b"))
    val na = col("n_a").cast("double"); val nb = col("n_b").cast("double")
    val n = na + nb
    val ok = col("n_a") > 0 && col("n_b") > 0
    m.select(coalesce(col("n_a"), lit(0L)).as("n_a"),
      coalesce(col("n_b"), lit(0L)).as("n_b"),
      when(ok, r6(col("s").cast("double") / (na * nb * n * n)))
        .as("t_cvm"))
  }

  /** Two-sample energy distance E = 2·E|X−Y| − E|X−X′| − E|Y−Y′| and
    * the Székely–Rizzo test statistic T = (n_a·n_b/N)·E — the
    * rotation-free distribution test that is zero iff the
    * distributions coincide, sensitive to ANY difference (location,
    * scale, shape) where [[ksTest]]/[[cvmTest]] weigh gaps by
    * position or mass. Each pairwise expectation is an ECDF integral
    * (E|X−Y| = ∫ F_a(1−F_b) + F_b(1−F_a) dt), so all three fold from
    * the SAME [[cumCounts]] spine by the [[wasserstein]] telescoping
    * move — Σ hᵢ·(vᵢ₊₁−vᵢ) = Σ vᵢ·(hᵢ₋₁−hᵢ) with the previous row's
    * h derived per-row (cumulative minus own count), h vanishing at
    * both ends. ONE aggregate, three DECIMAL(38,12) sums, no sort or
    * window; never the textbook O(n²) pairwise pass. */
  def energyDistance(df: DataFrame, valCol: String, groupCol: String,
      aVal: String, bVal: String): DataFrame =
    energyFromCum(cumCounts(df, valCol, groupCol, aVal, bVal))

  private[graft] def energyFromCum(cum: DataFrame): DataFrame = {
    val dec12 = DecimalType(38, 12)
    val tot = cum.agg(sum("na").as("nat"), sum("nb").as("nbt"))
    def term(h: Column, hPrev: Column): Column =
      sum((col("v") * (hPrev - h).cast("double")).cast(dec12))
    def hxy(ca: Column, cb: Column): Column =
      ca * (col("nbt") - cb) + cb * (col("nat") - ca)
    def hxx(ca: Column): Column = ca * (col("nat") - ca) * 2
    def hyy(cb: Column): Column = cb * (col("nbt") - cb) * 2
    val ca = col("ca").cast(dec0); val cb = col("cb").cast(dec0)
    val caP = (col("ca") - col("na")).cast(dec0)
    val cbP = (col("cb") - col("nb")).cast(dec0)
    val m = cum.crossJoin(broadcast(tot)).agg(
      term(hxy(ca, cb), hxy(caP, cbP)).as("sxy"),
      term(hxx(ca), hxx(caP)).as("sxx"),
      term(hyy(cb), hyy(cbP)).as("syy"),
      min("nat").as("n_a"), min("nbt").as("n_b"))
    val na = col("n_a").cast("double"); val nb = col("n_b").cast("double")
    val exy = col("sxy").cast("double") / (na * nb)
    val e = exy * 2 - col("sxx").cast("double") / (na * na) -
      col("syy").cast("double") / (nb * nb)
    val ok = col("n_a") > 0 && col("n_b") > 0
    m.select(coalesce(col("n_a"), lit(0L)).as("n_a"),
      coalesce(col("n_b"), lit(0L)).as("n_b"),
      when(ok, r6(exy)).as("e_xy"),
      when(ok, r6(e)).as("e_dist"),
      when(ok, r6(na * nb / (na + nb) * e)).as("t_stat"))
  }

  /** Decile lift / cumulative-gains table — the campaign-targeting
    * report next to [[thresholdSweep]]'s operating points: rank by
    * score DESCENDING, cut into `nD` equal-population bins, and per
    * bin report size, positives, response rate, lift vs the base
    * rate, and the cumulative gain ("the top 20% of scores capture
    * X% of all positives"). Bins come arithmetically off the
    * ascending [[cumCounts]] spine — a distinct value's bin is the
    * bin of its FIRST row in descending order,
    * floor(nD·(N − pooledCum)/N) + 1 in exact integer division — so
    * there is no sort, no ntile, and no row-level nondeterminism
    * under ties (a tied block spanning a boundary lands whole in its
    * top bin; a bin a giant tie swallows entirely emits no row —
    * both engines agree). One spine fold, one ≤nD-row group, one
    * bounded ≤nD-row cumulative window. */
  def liftTable(df: DataFrame, scoreCol: String, groupCol: String,
      posVal: String, negVal: String, nD: Int = 10): DataFrame =
    liftFromCum(cumCounts(df, scoreCol, groupCol, posVal, negVal), nD)

  private[graft] def liftFromCum(cum: DataFrame, nD: Int = 10)
      : DataFrame = {
    require(nD >= 2 && nD <= 1000, s"nD must be in [2, 1000]; got $nD")
    val tot = cum.agg(sum("na").as("npt"), sum("nb").as("nnt"))
    val per = cum.crossJoin(broadcast(tot))
      .withColumn("decile", expr(
        s"CAST((npt + nnt - ca - cb) * $nD DIV (npt + nnt) AS INT) + 1"))
      .groupBy("decile")
      .agg(sum(col("na") + col("nb")).as("n"), sum("na").as("n_pos"),
        min("npt").as("npt"), min(col("npt") + col("nnt")).as("nt"))
    val wCum = Window.partitionBy(BoundedWindow.key(col("decile")))
      .orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val overall = col("npt").cast("double") / col("nt").cast("double")
    val resp = col("n_pos").cast("double") / col("n").cast("double")
    per
      .withColumn("cum_n", sum("n").over(wCum))
      .withColumn("cum_pos", sum("n_pos").over(wCum))
      .select(col("decile"), col("n"), col("n_pos"),
        r6(resp).as("resp_rate"),
        r6(when(col("npt") > 0, resp / overall)).as("lift"),
        r6(when(col("npt") > 0,
          col("cum_pos").cast("double") / col("npt").cast("double")))
          .as("cum_gain"),
        r6(when(col("npt") > 0,
          col("cum_pos").cast("double") / col("cum_n").cast("double")
            / overall)).as("cum_lift"))
      .orderBy("decile")
  }

  /** Two-sided normal p-value 2·(1 − Φ(|z|)) via the Abramowitz &
    * Stegun 26.2.17 polynomial (|ε| < 7.5e-8 — four decimals beyond
    * the 6-dp render). Spelled with the IDENTICAL constant list and
    * operand order as [[sqlTwoSidedNormalP]], so both engines compute
    * the same doubles; the only transcendental is exp, the same
    * cross-engine dependency q_ks_test's p-value already carries. */
  private[graft] def twoSidedNormalP(z: Column): Column = {
    val ax = abs(z)
    val k = lit(1.0) / (lit(1.0) + lit(0.2316419) * ax)
    val poly = ((((lit(1.330274429) * k - lit(1.821255978)) * k +
      lit(1.781477937)) * k - lit(0.356563782)) * k +
      lit(0.319381530)) * k
    least(lit(1.0),
      exp(lit(-0.5) * ax * ax) / lit(2.5066282746310002) * poly * 2)
  }

  /** Upper-tail normal p-value 1 − Φ(z) off the same A&S 26.2.17
    * polynomial as [[twoSidedNormalP]] (for z of either sign): the
    * one-sided survival the χ² Wilson–Hilferty mapping and other
    * upper-tail tests need. Identical operand order as
    * [[sqlUpperNormalP]] so both engines compute the same doubles. */
  private[graft] def upperNormalP(z: Column): Column =
    when(z >= 0, twoSidedNormalP(z) / 2)
      .otherwise(lit(1.0) - twoSidedNormalP(z) / 2)

  /** The oracle's spelling of [[upperNormalP]] — `z` must be a SQL
    * column/expression cheap to restate (reference a named CTE column,
    * not a subexpression). */
  private[graft] def sqlUpperNormalP(z: String): String =
    s"""CASE WHEN $z >= 0 THEN ${sqlTwoSidedNormalP(z)} / 2
        ELSE 1.0 - ${sqlTwoSidedNormalP(z)} / 2 END"""

  /** The oracle's spelling of [[twoSidedNormalP]] — identical
    * constants and operand order over a SQL expression for z. */
  private[graft] def sqlTwoSidedNormalP(z: String): String =
    s"""least(1.0, exp(-0.5 * abs($z) * abs($z)) / 2.5066282746310002
        * (((((1.330274429 * (1.0 / (1.0 + 0.2316419 * abs($z)))
              - 1.821255978) * (1.0 / (1.0 + 0.2316419 * abs($z)))
              + 1.781477937) * (1.0 / (1.0 + 0.2316419 * abs($z)))
              - 0.356563782) * (1.0 / (1.0 + 0.2316419 * abs($z)))
              + 0.319381530) * (1.0 / (1.0 + 0.2316419 * abs($z))))
        * 2)"""

  /** Benjamini–Hochberg FDR adjustment over a (key, p-value) table —
    * the multiple-testing step every per-feature/per-slice screen
    * needs before anyone acts on "47 of my 2000 features are
    * significant at 0.05" (at α = 0.05, ~100 of 2000 TRUE NULLS pass
    * unadjusted). Step-up q-values: rank p ascending (ties broken by
    * key — deterministic both engines), qᵢ = min_{j≥i}(p_j·m/j)
    * capped at 1; reject where q ≤ α.
    *
    * Scale: the input is one row per HYPOTHESIS (features, slices,
    * experiment arms — thousands, not corpus rows), so the rank and
    * reverse running-min windows run on a declared-bounded table
    * (the thresholdSweep stance); the corpus-scale work happened
    * upstream in whatever produced the p-values. */
  def fdrBh(df: DataFrame, keyCol: String, pCol: String,
      alpha: Double = 0.05): DataFrame = {
    val m = df.agg(count(lit(1)).as("__m"))
    val wRank = Window.partitionBy(BoundedWindow.key(col("p_value")))
      .orderBy(col("p_value"), col(keyCol))
    val wMin = Window.partitionBy(BoundedWindow.key(col("p_value")))
      .orderBy(col("rank").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(keyCol), col(pCol).cast("double").as("p_value"))
      .crossJoin(broadcast(m))
      .withColumn("rank", row_number().over(wRank))
      .withColumn("q_value", least(lit(1.0),
        min(col("p_value") * col("__m") / col("rank")).over(wMin)))
      .select(col(keyCol), r6(col("p_value")).as("p_value"),
        col("rank"), r6(col("q_value")).as("q_value"),
        (col("q_value") <= alpha).as("rejected"))
      .orderBy("rank")
  }

  /** Mann–Whitney U (two-sided normal approximation, tie-corrected):
    * U = Ra − nA(nA+1)/2 where Ra sums group A's AVERAGE ranks;
    * doubled ranks 2·rank(v) = 2·C(<v) + c(v) + 1 keep everything
    * integer under ties. z = (U − nA·nB/2) / σ with
    * σ² = nA·nB/12 · ((n+1) − Σ(t³−t)/(n(n−1))). */
  def mannWhitney(df: DataFrame, valCol: String, groupCol: String,
      aVal: String, bVal: String): DataFrame =
    mwFromCum(cumCounts(df, valCol, groupCol, aVal, bVal))

  private[graft] def mwFromCum(cum: DataFrame): DataFrame = {
    val c = col("na") + col("nb")
    val cPrev = (col("ca") + col("cb")).cast(dec0) - c // pooled C(<v)
    val m = cum.agg(
      sum(col("na").cast(dec0) * (cPrev * 2 + c + 1)).as("ra2"),
      sum((c.cast(dec0) * c * c - c).cast(dec0)).as("ties"),
      sum("na").as("n_a"), sum("nb").as("n_b"))
    val na = col("n_a").cast("double"); val nb = col("n_b").cast("double")
    val n = na + nb
    val u = (col("ra2").cast("double") - na * (na + lit(1.0))) / lit(2.0)
    val sigma = sqrt(na * nb / lit(12.0) *
      ((n + lit(1.0)) - col("ties").cast("double") / (n * (n - lit(1.0)))))
    m.select(col("n_a"), col("n_b"), r6(u).as("u"),
      r6((u - na * nb / lit(2.0)) / sigma).as("z"))
  }

  /** Kruskal–Wallis H (k-sample rank test, tie-corrected): do ANY of
    * the groups draw from a shifted distribution? Doubled average
    * ranks 2·rank(v) = 2·C(<v) + c(v) + 1 stay integer under ties, so
    * each group's rank sum folds exactly in DECIMAL(38,0) off a pooled
    * two-level cumulative spine (the [[ksTest]] shape, generalized to
    * k groups). H = 12/(n(n+1))·Σ R_g²/n_g − 3(n+1), divided by the
    * tie factor 1 − Σ(t³−t)/(n³−n). Output: one row per group (n,
    * mean rank) with the shared H / corrected H / dof repeated — the
    * q_mutual_info drift stance. */
  def kruskalWallis(df: DataFrame, valCol: String, groupCol: String)
      : DataFrame = {
    val s = df.select(col(valCol).cast("double").as("v"),
      col(groupCol).cast("string").as("grp"))
    // pooled per-value spine with the doubled average rank — the
    // heavy-tail-safe RankSpine cumulative (bucket-invariant sums)
    val pooled = s.groupBy("v").agg(count(lit(1)).as("c"))
    val spine = RankSpine.cumulative(pooled, "v", Seq("c"), Seq("cum"))
      // doubled average rank of value v: 2·C(<v) + c + 1
      .select(col("v"), col("c"),
        ((col("cum") - col("c")).cast(dec0) * 2 + col("c") + 1)
          .as("r2"))
    val perGroupVal = s.groupBy("grp", "v").agg(count(lit(1)).as("ng"))
    val groups = perGroupVal.join(spine, "v")
      .groupBy("grp")
      .agg(sum("ng").as("n_g"),
        sum(col("ng").cast(dec0) * col("r2")).as("rg2"))
    val tot = spine.agg(sum("c").as("n"),
      sum((col("c").cast(dec0) * col("c") * col("c") - col("c")))
        .as("ties"))
    val k = groups.agg(count(lit(1)).as("k"))
    val nD = col("n").cast("double")
    // Σ R_g²/n_g folds in DECIMAL(38,6) from exact halved rank sums
    val dec6 = org.apache.spark.sql.types.DecimalType(38, 6)
    val hCore = groups.crossJoin(broadcast(tot))
      .agg(sum(((col("rg2").cast("double") / 2) *
          (col("rg2").cast("double") / 2) / col("n_g")).cast(dec6))
        .as("rsum"), min("n").as("n"), min("ties").as("ties"))
    val shared = hCore.crossJoin(broadcast(k))
      .select(col("k"),
        (lit(12.0) / (nD * (nD + 1)) * col("rsum").cast("double") -
          lit(3.0) * (nD + 1)).as("h_raw"),
        (lit(1.0) - col("ties").cast("double") / (nD * nD * nD - nD))
          .as("tie_f"))
      .select(col("k"),
        r6(col("h_raw")).as("h"),
        r6(col("h_raw") / col("tie_f")).as("h_corrected"),
        (col("k") - 1).as("dof"))
    groups.crossJoin(broadcast(shared))
      .select(col("grp").as(groupCol), col("n_g"),
        r6(col("rg2").cast("double") / 2 / col("n_g")).as("mean_rank"),
        col("h"), col("h_corrected"), col("dof").cast("bigint").as("dof"))
      .orderBy(groupCol)
  }

  /** One-way ANOVA F: between-group vs within-group variance of
    * `valCol` across `groupCol` levels, from the same five
    * DECIMAL-exact sums as q_corr — one map-side-combined aggregate
    * per group, a k-row fold for the F statistic. Output: one row per
    * group (n, mean, variance) with F / dof repeated. */
  def anovaF(df: DataFrame, valCol: String, groupCol: String)
      : DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec6 = DecimalType(38, 6)
    val v = col(valCol)
    val g = df.groupBy(col(groupCol).cast("string").as("grp"))
      .agg(count(lit(1)).as("n_g"),
        sum(v.cast(dec6)).as("sx"),
        sum((v * v).cast(dec6)).as("sxx"))
    val nG = col("n_g").cast("double")
    val mean = col("sx").cast("double") / nG
    // group-level exact-input doubles: SSW_g = sxx − sx²/n
    val per = g.select(col("grp"), col("n_g"), col("sx"), col("sxx"),
      (col("sxx").cast("double") - col("sx").cast("double") *
        col("sx").cast("double") / nG).as("ssw_g"))
    val tot = per.agg(sum("n_g").as("n"), count(lit(1)).as("k"),
      sum("sx").as("sxt"),
      sum(col("ssw_g").cast(dec6)).cast("double").as("ssw"),
      sum(((col("sx").cast("double") * col("sx").cast("double")) / nG)
        .cast(dec6)).cast("double").as("sq_over_n"))
    val nD = col("n").cast("double")
    val kD = col("k").cast("double")
    val ssb = col("sq_over_n") -
      col("sxt").cast("double") * col("sxt").cast("double") / nD
    val shared = tot.select(
      r6(ssb / (kD - 1) / (col("ssw") / (nD - kD))).as("f_stat"),
      (col("k") - 1).cast("bigint").as("dof_between"),
      (col("n") - col("k")).cast("bigint").as("dof_within"))
    per.crossJoin(broadcast(shared))
      .select(col("grp").as(groupCol), col("n_g"),
        r6(mean).as("mean"),
        // stddev, not variance: at price scale the variance (~2e10)
        // sits past round-to-6dp's 2^53 ceiling AND amplifies the
        // engines' decimal→double ulp divergence — sqrt brings both
        // back into range (the q_profile stance)
        r6(sqrt(greatest(col("ssw_g") / (nG - 1), lit(0.0))))
          .as("stddev"),
        col("f_stat"), col("dof_between"), col("dof_within"))
      .orderBy(groupCol)
  }

  /** Jarque–Bera normality test per group — the "is this column even
    * close to normal" gate in front of every z/t-based readout the
    * engine emits (q_ab_metrics, q_t_test, q_power assume it).
    * JB = n/6·(S² + (K−3)²/4) from sample skewness S = m₃/m₂^{3/2}
    * and kurtosis K = m₄/m₂²; under H₀ JB ~ χ²₂ whose survival is
    * exactly exp(−JB/2) — a closed-form p-value both engines state
    * identically (no approximation beyond the moment estimate
    * itself).
    *
    * Scale: ONE map-side-combined aggregate per group — five
    * DECIMAL(38,6)-exact power sums; every readout is a k-row fold.
    * The x⁴ pre-sum bounds the usable magnitude at ~1e8 per value
    * (38−6 digits over corpus counts) — the [[anovaF]] dec6 stance,
    * overflowing loudly under ANSI rather than quietly losing bits. */
  def jarqueBera(df: DataFrame, valCol: String, groupCol: String)
      : DataFrame = {
    val dec6 = DecimalType(38, 6)
    val v = col(valCol).cast("double")
    val g = df.groupBy(col(groupCol).cast("string").as("grp"))
      .agg(count(lit(1)).as("n"),
        sum(v.cast(dec6)).as("s1"),
        sum((v * v).cast(dec6)).as("s2"),
        sum((v * v * v).cast(dec6)).as("s3"),
        sum((v * v * v * v).cast(dec6)).as("s4"))
    val nD = col("n").cast("double")
    val m1 = col("s1").cast("double") / nD
    val r2 = col("s2").cast("double") / nD
    val r3 = col("s3").cast("double") / nD
    val r4 = col("s4").cast("double") / nD
    val m2 = r2 - m1 * m1
    val m3 = r3 - lit(3.0) * m1 * r2 + lit(2.0) * m1 * m1 * m1
    val m4 = r4 - lit(4.0) * m1 * r3 + lit(6.0) * m1 * m1 * r2 -
      lit(3.0) * m1 * m1 * m1 * m1
    val skew = m3 / sqrt(m2 * m2 * m2)
    val kurt = m4 / (m2 * m2)
    val jb = nD / 6 * (skew * skew +
      (kurt - 3) * (kurt - 3) / 4)
    // all m2-divisions nest under the m2>0 guard (ANSI throws eagerly)
    val ok = col("n") > 3 && m2 > 0
    g.select(col("grp").as(groupCol), col("n"),
        r6(m1).as("mean"),
        when(ok, r6(skew)).as("skewness"),
        when(ok, r6(kurt)).as("kurtosis"),
        when(ok, r6(jb)).as("jb"),
        when(ok, r6(exp(jb / -2))).as("p_value"))
      .orderBy(groupCol)
  }

  /** Brown–Forsythe (median-centered Levene) homogeneity-of-variance
    * test: one-way ANOVA F on the absolute deviations from each
    * group's LOWER median — the robust "are these groups' SPREADS
    * equal" companion to [[anovaF]]'s mean test, and the assumption
    * check in front of pooled-variance readouts ([[tukeyHsd]],
    * Cohen's d). Median-centering (Brown–Forsythe 1974) keeps the
    * test honest under skew where mean-centered Levene inflates.
    *
    * The lower median (smallest v with 2·cum ≥ n_g, the
    * weighted-median convention StatsOps already pins) is exact and
    * identical both engines — no interpolation to diverge on. Scale:
    * the per-group cumulative runs through the grouped [[RankSpine]]
    * (≤cap rows per window partition on ANY value distribution),
    * medians broadcast back (k rows), then [[anovaF]]'s one
    * aggregate. Output: one row per group (n_g, mean/stddev of the
    * absolute deviations) with shared F/dof. */
  def leveneBf(df: DataFrame, valCol: String, groupCol: String)
      : DataFrame = {
    val v = col(valCol).cast("double")
    val g = df.groupBy(col(groupCol).cast("string").as("grp"),
        v.as("v"))
      .agg(count(lit(1)).as("c"))
    val cum = RankSpine.cumulative(g, "v", Seq("c"), Seq("cum"),
      partitionCols = Seq("grp"))
    val ng = g.groupBy("grp").agg(sum("c").as("__n_g"))
    val med = cum.join(broadcast(ng), "grp")
      .filter(col("cum") * 2 >= col("__n_g"))
      .groupBy("grp").agg(min("v").as("__med"))
    val dev = df.select(col(groupCol).cast("string").as("grp"),
        v.as("__v"))
      .join(broadcast(med), "grp")
      .select(col("grp"),
        abs(col("__v") - col("__med")).as("absdev"))
    anovaF(dev, "absdev", "grp")
      .withColumnRenamed("grp", groupCol)
  }

  /** Tukey HSD pairwise comparisons after a significant [[anovaF]]:
    * for every unordered group pair, the mean difference, its
    * studentized-range standard error √(MSW/2·(1/nᵢ+1/nⱼ)) and the q
    * statistic |Δ|/se — WHICH groups differ, not just "some do". No
    * p-value column: the studentized-range CDF has no closed form
    * both engines state identically ([[tTest]]'s stance); q + the
    * within dof are the decision-complete pair against any published
    * critical table.
    *
    * Scale: the same ONE per-group aggregate as [[anovaF]], then a
    * k×k self-join of the k-row group table (k = group cardinality,
    * broadcast both sides — never corpus-squared). */
  def tukeyHsd(df: DataFrame, valCol: String, groupCol: String)
      : DataFrame = {
    val dec6 = DecimalType(38, 6)
    val v = col(valCol)
    val g = df.groupBy(col(groupCol).cast("string").as("grp"))
      .agg(count(lit(1)).as("n_g"),
        sum(v.cast(dec6)).as("sx"),
        sum((v * v).cast(dec6)).as("sxx"))
    val nG = col("n_g").cast("double")
    val per = g.select(col("grp"), col("n_g"),
      (col("sx").cast("double") / nG).as("mean"),
      (col("sxx").cast("double") - col("sx").cast("double") *
        col("sx").cast("double") / nG).as("ssw_g"))
    val tot = per.agg(sum("n_g").as("n"), count(lit(1)).as("k"),
      sum(col("ssw_g").cast(dec6)).cast("double").as("ssw"))
    val msw = col("ssw") /
      (col("n").cast("double") - col("k").cast("double"))
    val shared = tot.select(msw.as("__msw"),
      (col("n") - col("k")).cast("bigint").as("dof_within"))
    val a = per.select(col("grp").as("g_a"), col("n_g").as("n_a"),
      col("mean").as("__ma"))
    val b = per.select(col("grp").as("g_b"), col("n_g").as("n_b"),
      col("mean").as("__mb"))
    val se = sqrt(col("__msw") / 2 *
      (lit(1.0) / col("n_a").cast("double") +
        lit(1.0) / col("n_b").cast("double")))
    a.join(broadcast(b), col("g_a") < col("g_b"))
      .crossJoin(broadcast(shared))
      .select(col("g_a"), col("g_b"), col("n_a"), col("n_b"),
        r6(col("__ma") - col("__mb")).as("diff"),
        r6(se).as("se"),
        when(se > 0, r6(abs(col("__ma") - col("__mb")) / se))
          .as("q_stat"),
        col("dof_within"))
      .orderBy("g_a", "g_b")
  }

  /** Welch's two-sample t-test — the unequal-variance location test a
    * real user reaches for before KS/MWU. Closed form over the same
    * five DECIMAL(38,6)-exact per-group sums as [[anovaF]] (one
    * map-side-combined aggregate, then a 2-row fold): t = (m̄a − m̄b) /
    * √(s²a/nA + s²b/nB) with the Welch–Satterthwaite fractional dof
    * (s²a/nA + s²b/nB)² / ((s²a/nA)²/(nA−1) + (s²b/nB)²/(nB−1)).
    * No p-value column for the same reason [[mannWhitney]] emits z:
    * the Student-t CDF has no closed form both engines state
    * identically; t + dof are the decision-complete pair. */
  /** One row of DECIMAL(38,6)-exact two-group moments
    * (n_a/n_b/sums/sum-squares) — shared by [[tTest]] and
    * [[effectSize]]. */
  private def twoGroupMoments(df: DataFrame, valCol: String,
      groupCol: String, aVal: String, bVal: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec6 = DecimalType(38, 6)
    val v = col(valCol)
    df.filter(col(groupCol).isin(aVal, bVal))
      .groupBy((col(groupCol) === aVal).as("isa"))
      .agg(count(lit(1)).as("n"), sum(v.cast(dec6)).as("sx"),
        sum((v * v).cast(dec6)).as("sxx"))
      .agg(
        max(when(col("isa"), col("n"))).as("n_a"),
        max(when(!col("isa"), col("n"))).as("n_b"),
        max(when(col("isa"), col("sx"))).as("sxa"),
        max(when(!col("isa"), col("sx"))).as("sxb"),
        max(when(col("isa"), col("sxx"))).as("sxxa"),
        max(when(!col("isa"), col("sxx"))).as("sxxb"))
  }

  /** Standardized effect sizes for the two-group comparison — the
    * "how BIG is the difference" companion [[tTest]]'s significance
    * can't answer (at corpus n everything is significant): Cohen's d
    * on the pooled SD, the small-sample-corrected Hedges' g, and
    * Glass's Δ (control-group-B SD — right when the treatment also
    * moves the variance). Same one-aggregate moments, closed forms
    * both engines state identically. */
  def effectSize(df: DataFrame, valCol: String, groupCol: String,
      aVal: String, bVal: String): DataFrame = {
    val one = twoGroupMoments(df, valCol, groupCol, aVal, bVal)
    val na = col("n_a").cast("double"); val nb = col("n_b").cast("double")
    val ma = col("sxa").cast("double") / na
    val mb = col("sxb").cast("double") / nb
    val va = (col("sxxa").cast("double") -
      col("sxa").cast("double") * col("sxa").cast("double") / na) /
      (na - 1)
    val vb = (col("sxxb").cast("double") -
      col("sxb").cast("double") * col("sxb").cast("double") / nb) /
      (nb - 1)
    val sp2 = ((na - 1) * va + (nb - 1) * vb) / (na + nb - 2)
    // divisions nest under the n>1 guard (ANSI throws eagerly)
    val ok = col("n_a") > 1 && col("n_b") > 1
    one.select(col("n_a"), col("n_b"),
      when(ok, r6(ma - mb)).as("mean_diff"),
      when(ok, when(sp2 > 0, r6((ma - mb) / sqrt(sp2))))
        .as("cohen_d"),
      when(ok, when(sp2 > 0,
        r6((ma - mb) / sqrt(sp2) *
          (lit(1.0) - lit(3.0) / (lit(4.0) * (na + nb) - 9)))))
        .as("hedges_g"),
      when(ok, when(vb > 0, r6((ma - mb) / sqrt(vb))))
        .as("glass_delta"))
  }

  def tTest(df: DataFrame, valCol: String, groupCol: String,
      aVal: String, bVal: String): DataFrame = {
    val one = twoGroupMoments(df, valCol, groupCol, aVal, bVal)
    val na = col("n_a").cast("double"); val nb = col("n_b").cast("double")
    val ma = col("sxa").cast("double") / na
    val mb = col("sxb").cast("double") / nb
    val va = (col("sxxa").cast("double") -
      col("sxa").cast("double") * col("sxa").cast("double") / na) /
      (na - 1)
    val vb = (col("sxxb").cast("double") -
      col("sxb").cast("double") * col("sxb").cast("double") / nb) /
      (nb - 1)
    val ra = va / na; val rb = vb / nb
    val se2 = ra + rb
    one.select(col("n_a"), col("n_b"),
      r6(ma).as("mean_a"), r6(mb).as("mean_b"),
      r6(when(se2 > 0, (ma - mb) / sqrt(se2))).as("t_stat"),
      r6(when(se2 > 0,
        se2 * se2 / (ra * ra / (na - 1) + rb * rb / (nb - 1))))
        .as("dof"))
  }

  /** ROC AUC of a score that should separate two classes — THE
    * ranking metric every model eval reports, and exactly the
    * Mann–Whitney machinery wearing its other hat:
    * AUC = U/(n⁺·n⁻) = P(score⁺ > score⁻) + ½·P(tie), computed from
    * the same doubled-average-rank DECIMAL(38,0) fold over the
    * heavy-tail-safe [[RankSpine]] cumulative — exact under ties, no
    * sort of the corpus, one float division at the end. Also emits
    * the Gini coefficient 2·AUC − 1 (the credit-scoring rendering of
    * the same number). */
  def auc(df: DataFrame, scoreCol: String, groupCol: String,
      posVal: String, negVal: String): DataFrame =
    aucFromCum(cumCounts(df, scoreCol, groupCol, posVal, negVal))

  private[graft] def aucFromCum(cum: DataFrame): DataFrame = {
    val c = col("na") + col("nb")
    val cPrev = (col("ca") + col("cb")).cast(dec0) - c
    val m = cum.agg(
      sum(col("na").cast(dec0) * (cPrev * 2 + c + 1)).as("ra2"),
      sum("na").as("n_pos"), sum("nb").as("n_neg"))
    val np = col("n_pos").cast("double"); val nn = col("n_neg").cast("double")
    val u = (col("ra2").cast("double") - np * (np + lit(1.0))) / lit(2.0)
    val a = u / (np * nn)
    // degenerate single-class input → NULL, not 0/0's NaN (the
    // effectSize / partialCorr guard stance); divisions nest under
    // the guard so ANSI mode never evaluates them
    val ok = col("n_pos") > 0 && col("n_neg") > 0
    m.select(coalesce(col("n_pos"), lit(0L)).as("n_pos"),
      coalesce(col("n_neg"), lit(0L)).as("n_neg"),
      when(ok, r6(a)).as("auc"),
      when(ok, r6(lit(2.0) * a - lit(1.0))).as("gini"))
  }

  /** PR-AUC (average precision) — the ranking metric that matters
    * under class imbalance, where ROC AUC flatters (AUC counts true
    * negatives; precision doesn't). Step-wise AP over descending
    * score thresholds, ties entering block-wise:
    * AP = Σ_v (na_v/N⁺)·TP_v/(TP_v+FP_v), where TP/FP at a distinct
    * score v are DESCENDING cumulatives — derived by reflection from
    * the same ascending [[cumCounts]] spine, so the whole metric is
    * ONE fold over the distinct-value table with no extra window.
    * Per-term products round into DECIMAL(38,12) (the q_drift
    * stance). Also emits the no-skill baseline (prevalence). */
  def prAuc(df: DataFrame, scoreCol: String, groupCol: String,
      posVal: String, negVal: String): DataFrame =
    prAucFromCum(cumCounts(df, scoreCol, groupCol, posVal, negVal))

  private[graft] def prAucFromCum(cum: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec12 = DecimalType(38, 12)
    val tot = cum.agg(sum("na").as("npt"), sum("nb").as("nnt"))
    val m = cum.crossJoin(broadcast(tot))
      .select(col("na"), col("npt"), col("nnt"),
        (col("npt") - (col("ca") - col("na"))).as("tp"),
        (col("nnt") - (col("cb") - col("nb"))).as("fp"))
      .agg(
        sum(when(col("na") > 0,
          (col("na").cast("double") * col("tp") /
            (col("tp") + col("fp")) / col("npt")).cast(dec12))
          .otherwise(lit(0).cast(dec12))).as("ap"),
        min("npt").as("n_pos"), min("nnt").as("n_neg"))
    val np = col("n_pos").cast("double")
    val nn = col("n_neg").cast("double")
    m.select(col("n_pos"), col("n_neg"),
      r6(col("ap").cast("double")).as("pr_auc"),
      r6(np / (np + nn)).as("baseline"))
  }

  /** DeLong standard error + 95% CI for [[auc]] — the "is this AUC
    * actually different from 0.5 (or from last week's)" bar every
    * eval readout needs next to the point estimate. DeLong 1988:
    * SE² = S₁₀/n⁺ + S₀₁/n⁻ where S₁₀ is the sample variance of the
    * positives' placement values V₁₀(i) = F⁻(Xᵢ) (fraction of
    * negatives below, ties half) and S₀₁ symmetrically. Both
    * placements are integer-valued off the shared [[cumCounts]]
    * spine — u₁₀(v) = 2·C⁻(v) − n⁻(v) and u₀₁(v) = 2·(N⁺ − C⁺(v)) +
    * n⁺(v), i.e. 2·N∓·V — so the first moments fold exactly in
    * DECIMAL(38,0); the squared terms round per-value into
    * DECIMAL(38,12) (the q_drift stance — identical operand order
    * both engines). One fold, no corpus sort, NULL SE when either
    * class has <2 members. */
  def aucCi(df: DataFrame, scoreCol: String, groupCol: String,
      posVal: String, negVal: String): DataFrame =
    aucCiFromCum(cumCounts(df, scoreCol, groupCol, posVal, negVal))

  private[graft] def aucCiFromCum(cum: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec12 = DecimalType(38, 12)
    val tot = cum.agg(sum("na").as("npt"), sum("nb").as("nnt"))
    val t = cum.crossJoin(broadcast(tot))
    // integer placements (doubled, scaled by the class size): exact
    val u10 = (col("cb").cast(dec0) * 2 - col("nb"))
    val u01 = ((col("npt") - col("ca")).cast(dec0) * 2 + col("na"))
    val m = t.agg(
      sum(col("na").cast(dec0) * u10).as("m10"),
      sum((col("na").cast("double") * u10.cast("double") *
        u10.cast("double")).cast(dec12)).as("q10"),
      sum(col("nb").cast(dec0) * u01).as("m01"),
      sum((col("nb").cast("double") * u01.cast("double") *
        u01.cast("double")).cast(dec12)).as("q01"),
      min("npt").as("n_pos"), min("nnt").as("n_neg"))
    val np = col("n_pos").cast("double")
    val nn = col("n_neg").cast("double")
    // AUC = mean placement of the positives: Σ na·u10 / (n⁺·2n⁻)
    val a = col("m10").cast("double") / (np * nn * 2)
    // sample variances of the placements (u = 2n∓·V ⇒ ÷(2n∓)²)
    val s10 = (col("q10").cast("double") -
      col("m10").cast("double") * col("m10").cast("double") / np) /
      (np - 1) / (nn * nn * 4)
    val s01 = (col("q01").cast("double") -
      col("m01").cast("double") * col("m01").cast("double") / nn) /
      (nn - 1) / (np * np * 4)
    val se = sqrt(greatest(s10 / np + s01 / nn, lit(0.0)))
    val ok = col("n_pos") > 1 && col("n_neg") > 1
    m.select(coalesce(col("n_pos"), lit(0L)).as("n_pos"),
      coalesce(col("n_neg"), lit(0L)).as("n_neg"),
      when(ok, r6(a)).as("auc"),
      when(ok, r6(se)).as("se"),
      when(ok, r6(greatest(a - lit(1.96) * se, lit(0.0)))).as("ci_lo"),
      when(ok, r6(least(a + lit(1.96) * se, lit(1.0)))).as("ci_hi"))
  }

  /** Paired DeLong test: is score A's AUC actually better than score
    * B's ON THE SAME ROWS — the model-comparison question [[aucCi]]'s
    * single-model interval can't answer (the two AUCs are correlated
    * through the shared labels, so independent CIs overstate the
    * variance). DeLong 1988 §3: Var(AUC_A − AUC_B) =
    * (S₁₀ᴬᴬ + S₁₀ᴮᴮ − 2·S₁₀ᴬᴮ)/n⁺ + (S₀₁ᴬᴬ + S₀₁ᴮᴮ − 2·S₀₁ᴬᴮ)/n⁻,
    * with the covariance terms over PER-ROW placement pairs.
    *
    * Per-row placements come relationally: one [[cumCounts]] spine
    * per score, then a keyed equi-join of the rows back to their own
    * distinct-value rows — every row's value IS in the pooled table,
    * so the join is total. Placements are the integer
    * u₁₀ = 2C⁻(v) − n⁻(v) / u₀₁ = 2(N⁺ − C⁺(v)) + n⁺(v); first
    * moments fold exact in DECIMAL(38,0), squares/cross-products
    * round per-row into DECIMAL(38,12) (identical operand order both
    * engines — the [[aucCi]] stance). Two spines, two value joins,
    * ONE moment fold; all shuffles linear and keyed. NULL block when
    * either class has <2 members; z additionally NULL when the
    * variance degenerates to 0 (identical scores). */
  def aucCompare(df: DataFrame, scoreA: String, scoreB: String,
      groupCol: String, posVal: String, negVal: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec12 = DecimalType(38, 12)
    val base = df.filter(col(groupCol).isin(posVal, negVal))
      .select(col(scoreA).cast("double").as("va"),
        col(scoreB).cast("double").as("vb"),
        when(col(groupCol) === posVal, 1L).otherwise(0L).as("y"))
    def placements(valName: String, tag: String): DataFrame = {
      val g = base.groupBy(col(valName).as("v"))
        .agg(sum("y").as("na"), sum(lit(1L) - col("y")).as("nb"))
      RankSpine.cumulative(g, "v", Seq("na", "nb"), Seq("ca", "cb"))
        .select(col("v").as(valName),
          (col("cb").cast(dec0) * 2 - col("nb")).as(s"u10_$tag"),
          col("ca").as(s"__ca_$tag"), col("na").as(s"__na_$tag"))
    }
    val tot = base.agg(sum("y").as("npt"),
      sum(lit(1L) - col("y")).as("nnt"))
    val joined = base
      .join(placements("va", "a"), Seq("va"))
      .join(placements("vb", "b"), Seq("vb"))
      .crossJoin(broadcast(tot))
      .select(col("y"), col("npt"), col("nnt"),
        // positives carry u10 (fraction of negatives below, ×2n⁻);
        // negatives carry u01 (fraction of positives above, ×2n⁺)
        when(col("y") === 1, col("u10_a")).otherwise(
          (col("npt") - col("__ca_a")).cast(dec0) * 2 + col("__na_a"))
          .as("ua"),
        when(col("y") === 1, col("u10_b")).otherwise(
          (col("npt") - col("__ca_b")).cast(dec0) * 2 + col("__na_b"))
          .as("ub"))
    val m = joined.groupBy("y").agg(
      count(lit(1)).as("n"),
      sum(col("ua")).as("sa"), sum(col("ub")).as("sb"),
      sum((col("ua").cast("double") * col("ua").cast("double"))
        .cast(dec12)).as("qaa"),
      sum((col("ub").cast("double") * col("ub").cast("double"))
        .cast(dec12)).as("qbb"),
      sum((col("ua").cast("double") * col("ub").cast("double"))
        .cast(dec12)).as("qab"),
      min("npt").as("npt"), min("nnt").as("nnt"))
    val one = m.agg(
      max(when(col("y") === 1, col("sa"))).as("sa1"),
      max(when(col("y") === 1, col("sb"))).as("sb1"),
      max(when(col("y") === 1, col("qaa"))).as("qaa1"),
      max(when(col("y") === 1, col("qbb"))).as("qbb1"),
      max(when(col("y") === 1, col("qab"))).as("qab1"),
      max(when(col("y") === 0, col("sa"))).as("sa0"),
      max(when(col("y") === 0, col("sb"))).as("sb0"),
      max(when(col("y") === 0, col("qaa"))).as("qaa0"),
      max(when(col("y") === 0, col("qbb"))).as("qbb0"),
      max(when(col("y") === 0, col("qab"))).as("qab0"),
      min("npt").as("n_pos"), min("nnt").as("n_neg"))
    val np = col("n_pos").cast("double")
    val nn = col("n_neg").cast("double")
    def d(c: Column): Column = c.cast("double")
    val aucA = d(col("sa1")) / (np * nn * 2)
    val aucB = d(col("sb1")) / (np * nn * 2)
    // sample (co)variances of the placements; u = 2n∓·V ⇒ ÷(2n∓)²
    def cv(q: Column, s1: Column, s2: Column, n: Column,
        denom: Column): Column =
      (d(q) - d(s1) * d(s2) / n) / (n - 1) / (denom * denom * 4)
    val s10 = (cv(col("qaa1"), col("sa1"), col("sa1"), np, nn) +
      cv(col("qbb1"), col("sb1"), col("sb1"), np, nn) -
      cv(col("qab1"), col("sa1"), col("sb1"), np, nn) * 2) / np
    val s01 = (cv(col("qaa0"), col("sa0"), col("sa0"), nn, np) +
      cv(col("qbb0"), col("sb0"), col("sb0"), nn, np) -
      cv(col("qab0"), col("sa0"), col("sb0"), nn, np) * 2) / nn
    val se = sqrt(greatest(s10 + s01, lit(0.0)))
    val ok = col("n_pos") > 1 && col("n_neg") > 1
    one.select(coalesce(col("n_pos"), lit(0L)).as("n_pos"),
      coalesce(col("n_neg"), lit(0L)).as("n_neg"),
      when(ok, r6(aucA)).as("auc_a"),
      when(ok, r6(aucB)).as("auc_b"),
      when(ok, r6(aucA - aucB)).as("delta"),
      when(ok, r6(se)).as("se"),
      when(ok, when(se > 0, r6((aucA - aucB) / se))).as("z"))
  }

  /** Threshold-sweep classifier report — the operating-point table a
    * model deployment reads next to [[auc]]'s single number: TP / FP /
    * FN / TN and precision / recall / F1 / accuracy at each of the
    * nQ−1 POOLED-percentile score thresholds ("predict positive when
    * score ≥ t"). Thresholds are the exact lower-quantile crossings
    * of the pooled score ([[qqTable]]'s integer-exact rule), so the
    * output stays a bounded nQ−1 rows at ANY corpus size — the
    * per-distinct-score curve is unbounded at 100 TB — while every
    * count at a chosen threshold is EXACT: the confusion cells are
    * descending cumulatives read off the same ascending [[cumCounts]]
    * spine by reflection (TP(≥v) = N⁺ − C⁺(<v), the [[prAuc]] move),
    * then one broadcast join of the nQ−1 threshold rows back to the
    * spine. No sort, no extra window. */
  def thresholdSweep(df: DataFrame, scoreCol: String, groupCol: String,
      posVal: String, negVal: String, nQ: Int = 20): DataFrame =
    sweepFromCum(cumCounts(df, scoreCol, groupCol, posVal, negVal), nQ)

  private[graft] def sweepFromCum(cum: DataFrame, nQ: Int = 20)
      : DataFrame = {
    require(nQ >= 2 && nQ <= 10000, s"nQ must be in [2, 10000]; got $nQ")
    val render = (c: Column) =>
      c.cast(DecimalType(18, 2)).cast("double")
    val tot = cum.agg(sum("na").as("npt"), sum("nb").as("nnt"))
    val ks = cum.sparkSession.range(1, nQ).select(col("id").as("k"))
    // threshold t_k: the exact lower k/nQ-quantile of the POOLED score
    // (min v with pooled-cum·nQ ≥ k·n) — integer-exact crossing
    val thr = cum.crossJoin(broadcast(tot)).crossJoin(broadcast(ks))
      .groupBy("k")
      .agg(min(when(
        (col("ca") + col("cb")).cast(dec0) * nQ >=
          col("k") * (col("npt") + col("nnt")), col("v"))).as("v"))
    // confusion cells at each threshold: one broadcast join of the
    // nQ−1 threshold rows onto their spine rows (ties: several k may
    // share one v — each keeps its own output row)
    val joined = cum.join(broadcast(thr), Seq("v"))
      .crossJoin(broadcast(tot))
      .select(col("k"), col("v"), col("npt"), col("nnt"),
        (col("npt") - (col("ca") - col("na"))).as("tp"),
        (col("nnt") - (col("cb") - col("nb"))).as("fp"))
    val tp = col("tp").cast("double"); val fp = col("fp").cast("double")
    val prec = tp / (tp + fp)
    val rec = tp / col("npt").cast("double")
    joined.select(
      col("k").cast("bigint").as("k"),
      r6(col("k").cast("double") / nQ).as("p"),
      render(col("v")).as("threshold"),
      col("tp").cast("bigint").as("tp"),
      col("fp").cast("bigint").as("fp"),
      (col("npt") - col("tp")).cast("bigint").as("fn"),
      (col("nnt") - col("fp")).cast("bigint").as("tn"),
      // tp+fp ≥ 1 by construction (the threshold is a present score),
      // but precision/recall/f1 still guard their denominators — the
      // auc NULL stance on degenerate class counts
      when(col("tp") + col("fp") > 0, r6(prec)).as("precision"),
      when(col("npt") > 0, r6(rec)).as("recall"),
      when(col("tp") > 0,
        r6(lit(2.0) * prec * rec / (prec + rec))).as("f1"),
      r6((tp + (col("nnt") - col("fp"))) /
        (col("npt") + col("nnt")).cast("double")).as("accuracy"))
      .orderBy("k")
  }

  /** Per-segment ROC AUC — slice evals are where real model
    * regressions surface; a global [[auc]] averages them away. One
    * GROUPED [[RankSpine]] cumulative (an independent bounded spine
    * per segment, shared refinement rounds — the q_rank_normalize
    * machinery) and one per-segment DECIMAL(38,0) rank-sum fold.
    * Segments missing a class emit NULL auc/gini (the [[auc]] guard),
    * not NaN and not a dropped row. */
  def aucBy(df: DataFrame, scoreCol: String, groupCol: String,
      posVal: String, negVal: String, segCol: String): DataFrame = {
    val s = df.filter(col(groupCol).isin(posVal, negVal))
      .select(col(segCol).cast("string").as("seg"),
        col(scoreCol).cast("double").as("v"),
        when(col(groupCol) === posVal, 1L).otherwise(0L).as("isa"))
    val g = s.groupBy("seg", "v")
      .agg(sum(col("isa")).as("na"), sum(lit(1L) - col("isa")).as("nb"))
    val cum = RankSpine.cumulative(g, "v", Seq("na", "nb"),
      Seq("ca", "cb"), partitionCols = Seq("seg"))
    val c = col("na") + col("nb")
    val cPrev = (col("ca") + col("cb")).cast(dec0) - c
    val m = cum.groupBy("seg").agg(
      sum(col("na").cast(dec0) * (cPrev * 2 + c + 1)).as("ra2"),
      sum("na").as("n_pos"), sum("nb").as("n_neg"))
    val np = col("n_pos").cast("double")
    val nn = col("n_neg").cast("double")
    val u = (col("ra2").cast("double") - np * (np + lit(1.0))) / lit(2.0)
    val a = u / (np * nn)
    val ok = col("n_pos") > 0 && col("n_neg") > 0
    m.select(col("seg").as(segCol), col("n_pos"), col("n_neg"),
      when(ok, r6(a)).as("auc"),
      when(ok, r6(lit(2.0) * a - lit(1.0))).as("gini"))
      .orderBy(segCol)
  }

  /** Per-segment two-sample KS — the slice view of [[ksTest]], the
    * way distribution drift is actually FOUND (a global KS can stay
    * flat while one segment's distribution walks away). One GROUPED
    * [[RankSpine]] cumulative (the [[aucBy]] wiring: independent
    * spines per segment sharing the refinement rounds), one fold per
    * segment computing the integer cross-product gap and the
    * asymptotic p. Single-class segments emit NULL, not NaN, and are
    * not dropped. */
  def ksBy(df: DataFrame, valCol: String, groupCol: String,
      aVal: String, bVal: String, segCol: String): DataFrame = {
    val s = df.filter(col(groupCol).isin(aVal, bVal))
      .select(col(segCol).cast("string").as("seg"),
        col(valCol).cast("double").as("v"),
        when(col(groupCol) === aVal, 1L).otherwise(0L).as("isa"))
    val g = s.groupBy("seg", "v")
      .agg(sum(col("isa")).as("na"), sum(lit(1L) - col("isa")).as("nb"))
    val cum = RankSpine.cumulative(g, "v", Seq("na", "nb"),
      Seq("ca", "cb"), partitionCols = Seq("seg"))
    val tot = cum.groupBy("seg")
      .agg(sum("na").as("nat"), sum("nb").as("nbt"))
    val m = cum.join(broadcast(tot), "seg")
      .groupBy("seg")
      .agg(
        max(abs(col("ca").cast(dec0) * col("nbt") -
          col("cb").cast(dec0) * col("nat"))).as("dnum"),
        min("nat").as("n_a"), min("nbt").as("n_b"))
    val na = col("n_a").cast("double"); val nb = col("n_b").cast("double")
    val d = col("dnum").cast("double") / (na * nb)
    val ok = col("n_a") > 0 && col("n_b") > 0
    m.select(col("seg").as(segCol),
      coalesce(col("n_a"), lit(0L)).as("n_a"),
      coalesce(col("n_b"), lit(0L)).as("n_b"),
      when(ok, r6(d)).as("d_stat"),
      when(ok, r6(least(lit(1.0),
        lit(2.0) * exp(lit(-2.0) * d * d * na * nb / (na + nb)))))
        .as("p_value"))
      .orderBy(segCol)
  }

  /** Univariate feature screen — "which raw columns separate the
    * classes at all": per feature, ROC AUC and the KS gap of the
    * feature against a binary label, the first cut every feature-
    * selection pass runs before any model. One heavy-tail-safe
    * [[RankSpine]] cumulative per feature (k independent spines — the
    * spearman_matrix shape) and ONE fold each computing both
    * statistics; single-class degenerates emit NULL (the [[auc]]
    * stance). `labelCol` must be boolean-castable (0/1). */
  def featureScreen(df: DataFrame, labelCol: String,
      features: Seq[String]): DataFrame = {
    require(features.nonEmpty && features.size <= 16,
      s"featureScreen takes 1..16 features; got ${features.size}")
    require(features.distinct.size == features.size,
      s"featureScreen features must be distinct; got $features")
    // ONE unpivoted pass + ONE grouped spine (r18, guide §2.4): the
    // per-feature loop ran k independent full scans, k groupBy
    // shuffles and k spine builds over the same table. Unpivoting to
    // (feature, v, isa) runs the identical per-feature arithmetic —
    // same groupBy counts, same bucket-invariant cumulative sums
    // (RankSpine grouped mode = one independent spine per feature
    // sharing the refinement rounds), same per-feature fold — in one
    // scan, one (feature, v) aggregate and one spine. Value-identical
    // by construction: every aggregate below is per-feature over the
    // same row multiset the per-feature loop saw, and the decimal
    // sums are order-independent.
    val long = df.select(
        explode(array(features.map(f => struct(lit(f).as("feature"),
          col(f).cast("double").as("v"))): _*)).as("fv"),
        when(col(labelCol).cast("boolean"), 1L).otherwise(0L)
          .as("isa"))
      .select(col("fv.feature").as("feature"), col("fv.v").as("v"),
        col("isa"))
    val g = long.groupBy("feature", "v")
      .agg(sum("isa").as("na"), sum(lit(1L) - col("isa")).as("nb"))
    val cum = RankSpine.cumulative(g, "v", Seq("na", "nb"),
      Seq("ca", "cb"), partitionCols = Seq("feature"))
    val tot = g.groupBy("feature")
      .agg(sum("na").as("npt"), sum("nb").as("nnt"))
    val c = col("na") + col("nb")
    val cPrev = (col("ca") + col("cb")).cast(dec0) - c
    val m = cum.join(broadcast(tot), "feature").groupBy("feature").agg(
      sum(col("na").cast(dec0) * (cPrev * 2 + c + 1)).as("ra2"),
      max(abs(col("ca").cast(dec0) * col("nnt") -
        col("cb").cast(dec0) * col("npt"))).as("dnum"),
      min("npt").as("n_pos"), min("nnt").as("n_neg"))
    val np = col("n_pos").cast("double")
    val nn = col("n_neg").cast("double")
    val u = (col("ra2").cast("double") - np * (np + lit(1.0))) /
      lit(2.0)
    val a = u / (np * nn)
    val d = col("dnum").cast("double") / (np * nn)
    val ok = col("n_pos") > 0 && col("n_neg") > 0
    m.select(col("feature"),
      coalesce(col("n_pos"), lit(0L)).as("n_pos"),
      coalesce(col("n_neg"), lit(0L)).as("n_neg"),
      when(ok, r6(a)).as("auc"),
      when(ok, r6(d)).as("ks_d"))
      .orderBy("feature")
  }

  /** Offline retrieval/ranking evaluation — the metric block a search
    * or RAG pipeline reads after every index or reranker change:
    * corpus means of precision@k, recall@k, MRR@k and NDCG@k over
    * per-query candidate lists (`qCol` the query id, `relCol` a 0/1
    * relevance label, candidates ranked by `scoreCol` DESC with
    * `idCol` as the deterministic tiebreak). Binary-gain NDCG;
    * queries with NO relevant candidate contribute 0 to MRR and are
    * EXCLUDED from the recall/NDCG means (undefined there) — n_eval
    * reports how many queries the means cover.
    *
    * Scale: ONE window partitioned by query id (bounded by that
    * query's candidate-list length — candidate lists are top-N
    * retrievals by construction, never the corpus), one per-query
    * aggregate, a broadcast k-row ideal-DCG lookup, one 1-row fold.
    * Per-query doubles round into DECIMAL(38,12) before the corpus
    * mean (the q_drift stance). */
  def rankingEval(df: DataFrame, qCol: String, idCol: String,
      scoreCol: String, relCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 1000, s"k must be in [1, 1000]; got $k")
    import org.apache.spark.sql.types.DecimalType
    val dec12 = DecimalType(38, 12)
    val w = Window.partitionBy("q")
      .orderBy(col("s").desc, col("cid").asc)
    val ranked = df.select(col(qCol).as("q"), col(idCol).as("cid"),
        col(scoreCol).as("s"), col(relCol).cast("int").as("rel"))
      .withColumn("rn", row_number().over(w))
    val perQ = ranked.groupBy("q").agg(
      sum(when(col("rn") <= k, col("rel")).otherwise(0)).as("hits"),
      sum(col("rel")).as("r_total"),
      min(when(col("rel") === 1 && col("rn") <= k, col("rn")))
        .as("first_rel"),
      sum(when(col("rn") <= k && col("rel") === 1,
        (lit(1.0) / log2(col("rn").cast("double") + 1)).cast(dec12))
        .otherwise(lit(0).cast(dec12))).as("dcg"))
    // ideal DCG at m relevant: Σ_{i=1..min(m,k)} 1/log2(i+1) — a
    // k+1-row lookup computed with the SAME SQL log2 both engines run
    val s = df.sparkSession
    val idcgTab = s.range(0, k + 1).select(col("id").as("m"))
      .crossJoin(s.range(1, k + 1).select(col("id").as("i")))
      .filter(col("i") <= col("m"))
      .groupBy("m").agg(sum((lit(1.0) /
        log2(col("i").cast("double") + 1)).cast(dec12)).as("idcg"))
    val joined = perQ
      .join(broadcast(idcgTab),
        least(col("r_total"), lit(k.toLong)) === col("m"), "left")
    val evalQ = col("r_total") > 0
    val agg = joined.agg(
      count(lit(1)).as("n_queries"),
      sum(when(evalQ, 1L).otherwise(0L)).as("n_eval"),
      sum((col("hits").cast("double") / k).cast(dec12)).as("p_sum"),
      sum(when(evalQ, (col("hits").cast("double") / col("r_total"))
        .cast(dec12))).as("r_sum"),
      sum(coalesce((lit(1.0) / col("first_rel")).cast(dec12),
        lit(0).cast(dec12))).as("mrr_sum"),
      sum(when(evalQ, (col("dcg").cast("double") /
        col("idcg").cast("double")).cast(dec12))).as("ndcg_sum"))
    agg.select(col("n_queries"), col("n_eval"),
      r6(col("p_sum").cast("double") / col("n_queries"))
        .as("precision_at_k"),
      when(col("n_eval") > 0,
        r6(col("r_sum").cast("double") / col("n_eval")))
        .as("recall_at_k"),
      r6(col("mrr_sum").cast("double") / col("n_queries")).as("mrr"),
      when(col("n_eval") > 0,
        r6(col("ndcg_sum").cast("double") / col("n_eval"))).as("ndcg"))
  }

  /** Quantile–quantile table between two groups: for p = k/nQ,
    * k = 1..nQ−1, the exact lower p-quantile of each group off the
    * shared [[cumCounts]] spine — the distribution-shape comparison a
    * single KS number summarizes. Quantile = min v with
    * cum·nQ ≥ k·total, an integer-exact crossing; no extra window —
    * one nQ-fold fan-out of the distinct-value table with a map-side
    * min-fold per k. */
  def qqTable(df: DataFrame, valCol: String, groupCol: String,
      aVal: String, bVal: String, nQ: Int = 20): DataFrame =
    qqFromCum(cumCounts(df, valCol, groupCol, aVal, bVal), nQ)

  private[graft] def qqFromCum(cum: DataFrame, nQ: Int = 20)
      : DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val render = (c: Column) => c.cast(DecimalType(18, 2)).cast("double")
    val tot = cum.agg(sum("na").as("nat"), sum("nb").as("nbt"))
    val ks = cum.sparkSession.range(1, nQ).select(col("id").as("k"))
    cum.crossJoin(broadcast(tot)).crossJoin(broadcast(ks))
      .groupBy("k")
      .agg(
        min(when(col("ca").cast(dec0) * nQ >= col("k") * col("nat"),
          col("v"))).as("qa"),
        min(when(col("cb").cast(dec0) * nQ >= col("k") * col("nbt"),
          col("v"))).as("qb"))
      .select(col("k").cast("bigint").as("k"),
        r6(col("k").cast("double") / nQ).as("p"),
        render(col("qa")).as("q_a"), render(col("qb")).as("q_b"))
      .orderBy("k")
  }

  /** One feature's CTE chain + final select for the q_feature_screen
    * oracle — kept in sync with [[featureScreen]]'s fold. */
  private def screenCtes(f: String): String =
    s"""s_$f AS (SELECT $f AS v,
                CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS isa
              FROM lineitem),
              g_$f AS (SELECT v, sum(isa) AS na, sum(1 - isa) AS nb
                       FROM s_$f GROUP BY 1),
              c_$f AS (SELECT v, na, nb,
                         sum(na) OVER (ORDER BY v ROWS BETWEEN
                           UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
                         sum(nb) OVER (ORDER BY v ROWS BETWEEN
                           UNBOUNDED PRECEDING AND CURRENT ROW) AS cb
                       FROM g_$f),
              t_$f AS (SELECT sum(na) AS npt, sum(nb) AS nnt
                       FROM g_$f),
              m_$f AS (SELECT
                         sum(na * (2 * (ca + cb - na - nb)
                           + na + nb + 1)) AS ra2,
                         max(abs(ca * nnt - cb * npt)) AS dnum,
                         min(npt) AS n_pos, min(nnt) AS n_neg
                       FROM c_$f CROSS JOIN t_$f)"""

  private def screenSelect(f: String): String =
    s"""SELECT '$f' AS feature,
               CAST(n_pos AS BIGINT) AS n_pos,
               CAST(n_neg AS BIGINT) AS n_neg,
               round(CASE WHEN n_pos > 0 AND n_neg > 0 THEN
                   (CAST(ra2 AS DOUBLE)
                     - CAST(n_pos AS DOUBLE) * (n_pos + 1.0)) / 2.0
                     / (CAST(n_pos AS DOUBLE) * n_neg) END
                 * 1000000.0)/1000000.0 AS auc,
               round(CASE WHEN n_pos > 0 AND n_neg > 0 THEN
                   CAST(dnum AS DOUBLE)
                     / (CAST(n_pos AS DOUBLE) * n_neg) END
                 * 1000000.0)/1000000.0 AS ks_d
        FROM m_$f"""

  val all: Seq[Query] = Seq(
    // Which raw columns separate returned from kept lines at all —
    // the per-feature AUC/KS screen in front of any model.
    Query(
      "q_feature_screen",
      Some {
        val fs = Seq("l_discount", "l_extendedprice", "l_quantity")
        s"""WITH ${fs.map(screenCtes).mkString(",\n              ")}
            SELECT * FROM (
              ${fs.map(screenSelect).mkString("\n              UNION ALL\n              ")})
            ORDER BY feature"""
      },
      (s, d) => featureScreen(
        Tables.lineitem(s, d).withColumn("lbl",
          col("l_returnflag") === "R"),
        "lbl", Seq("l_discount", "l_extendedprice", "l_quantity"))),
    // Do finished ('F') and open ('O') orders draw their totals from
    // the same distribution? KS is the shape-sensitive answer — it
    // sees location AND spread AND tail differences.
    Query(
      "q_ks_test",
      Some("""WITH s AS (
                SELECT o_totalprice AS v,
                       CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END
                         AS isa
                FROM orders WHERE o_orderstatus IN ('F', 'O')),
              g AS (SELECT v, sum(isa) AS na, sum(1 - isa) AS nb
                    FROM s GROUP BY 1),
              c AS (SELECT v, na, nb,
                      sum(na) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                        PRECEDING AND CURRENT ROW) AS ca,
                      sum(nb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                        PRECEDING AND CURRENT ROW) AS cb
                    FROM g),
              t AS (SELECT sum(na) AS nat, sum(nb) AS nbt FROM g),
              d AS (SELECT max(abs(ca * nbt - cb * nat)) AS dnum,
                           min(nat) AS n_a, min(nbt) AS n_b
                    FROM c CROSS JOIN t),
              ds AS (SELECT n_a, n_b,
                            CAST(dnum AS DOUBLE)
                              / (CAST(n_a AS DOUBLE) * n_b) AS dd
                     FROM d)
              SELECT CAST(n_a AS BIGINT) AS n_a,
                     CAST(n_b AS BIGINT) AS n_b,
                     round(dd * 1000000.0)/1000000.0 AS d_stat,
                     round(least(1.0, 2.0 * exp(-2.0 * dd * dd
                         * n_a * n_b / (n_a + n_b)))
                       * 1000000.0)/1000000.0 AS p_value
              FROM ds"""),
      (s, d) => ksFromCum(ordersSpine(s, d))),

    // HOW FAR apart do finished and open orders' totals sit — the
    // earth-mover's distance KS's single worst gap can't express,
    // in the metric's own units (dollars of totalprice).
    Query(
      "q_wasserstein",
      Some("""WITH s AS (
                SELECT o_totalprice AS v,
                       CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END
                         AS isa
                FROM orders WHERE o_orderstatus IN ('F', 'O')),
              g AS (SELECT v, sum(isa) AS na, sum(1 - isa) AS nb
                    FROM s GROUP BY 1),
              c AS (SELECT v, na, nb,
                      sum(na) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                        PRECEDING AND CURRENT ROW) AS ca,
                      sum(nb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                        PRECEDING AND CURRENT ROW) AS cb
                    FROM g),
              t AS (SELECT sum(na) AS nat, sum(nb) AS nbt FROM g),
              m AS (SELECT
                      sum(CAST(CAST(v AS DOUBLE)
                        * CAST(abs((ca - na) * nbt - (cb - nb) * nat)
                            - abs(ca * nbt - cb * nat) AS DOUBLE)
                        AS DECIMAL(38,12))) AS s,
                      min(nat) AS n_a, min(nbt) AS n_b
                    FROM c CROSS JOIN t)
              SELECT CAST(n_a AS BIGINT) AS n_a,
                     CAST(n_b AS BIGINT) AS n_b,
                     round(CAST(s AS DOUBLE)
                         / (CAST(n_a AS DOUBLE) * n_b)
                       * 1000000.0)/1000000.0 AS w1
              FROM m"""),
      (s, d) => w1FromCum(ordersSpine(s, d))),

    // The mean-SQUARED ECDF gap weighted by where the data actually
    // sits — broad mid-distribution drift KS underweights.
    Query(
      "q_cvm",
      Some("""WITH s AS (
                SELECT o_totalprice AS v,
                       CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END
                         AS isa
                FROM orders WHERE o_orderstatus IN ('F', 'O')),
              g AS (SELECT v, sum(isa) AS na, sum(1 - isa) AS nb
                    FROM s GROUP BY 1),
              c AS (SELECT v, na, nb,
                      sum(na) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                        PRECEDING AND CURRENT ROW) AS ca,
                      sum(nb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                        PRECEDING AND CURRENT ROW) AS cb
                    FROM g),
              t AS (SELECT sum(na) AS nat, sum(nb) AS nbt FROM g),
              m AS (SELECT
                      sum((na + nb) * (ca * nbt - cb * nat)
                        * (ca * nbt - cb * nat)) AS s,
                      min(nat) AS n_a, min(nbt) AS n_b
                    FROM c CROSS JOIN t)
              SELECT CAST(n_a AS BIGINT) AS n_a,
                     CAST(n_b AS BIGINT) AS n_b,
                     round(CAST(s AS DOUBLE)
                         / (CAST(n_a AS DOUBLE) * n_b
                            * (CAST(n_a AS DOUBLE) + n_b)
                            * (CAST(n_a AS DOUBLE) + n_b))
                       * 1000000.0)/1000000.0 AS t_cvm
              FROM m"""),
      (s, d) => cvmFromCum(ordersSpine(s, d))),

    // Zero iff the two distributions coincide — the any-difference
    // energy test, all three pairwise expectations off one spine.
    Query(
      "q_energy_distance",
      Some("""WITH s AS (
                SELECT o_totalprice AS v,
                       CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END
                         AS isa
                FROM orders WHERE o_orderstatus IN ('F', 'O')),
              g AS (SELECT v, sum(isa) AS na, sum(1 - isa) AS nb
                    FROM s GROUP BY 1),
              c AS (SELECT v, na, nb,
                      sum(na) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                        PRECEDING AND CURRENT ROW) AS ca,
                      sum(nb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                        PRECEDING AND CURRENT ROW) AS cb
                    FROM g),
              t AS (SELECT sum(na) AS nat, sum(nb) AS nbt FROM g),
              m AS (SELECT
                      sum(CAST(CAST(v AS DOUBLE)
                        * CAST(((ca - na) * (nbt - (cb - nb))
                                + (cb - nb) * (nat - (ca - na)))
                             - (ca * (nbt - cb) + cb * (nat - ca))
                           AS DOUBLE)
                        AS DECIMAL(38,12))) AS sxy,
                      sum(CAST(CAST(v AS DOUBLE)
                        * CAST(((ca - na) * (nat - (ca - na))) * 2
                             - (ca * (nat - ca)) * 2 AS DOUBLE)
                        AS DECIMAL(38,12))) AS sxx,
                      sum(CAST(CAST(v AS DOUBLE)
                        * CAST(((cb - nb) * (nbt - (cb - nb))) * 2
                             - (cb * (nbt - cb)) * 2 AS DOUBLE)
                        AS DECIMAL(38,12))) AS syy,
                      min(nat) AS n_a, min(nbt) AS n_b
                    FROM c CROSS JOIN t),
              e AS (SELECT n_a, n_b,
                      CAST(sxy AS DOUBLE)
                        / (CAST(n_a AS DOUBLE) * n_b) AS exy,
                      CAST(sxy AS DOUBLE)
                          / (CAST(n_a AS DOUBLE) * n_b) * 2
                        - CAST(sxx AS DOUBLE)
                          / (CAST(n_a AS DOUBLE) * n_a)
                        - CAST(syy AS DOUBLE)
                          / (CAST(n_b AS DOUBLE) * n_b) AS ed
                    FROM m)
              SELECT CAST(n_a AS BIGINT) AS n_a,
                     CAST(n_b AS BIGINT) AS n_b,
                     round(exy * 1000000.0)/1000000.0 AS e_xy,
                     round(ed * 1000000.0)/1000000.0 AS e_dist,
                     round(CAST(n_a AS DOUBLE) * n_b
                         / (CAST(n_a AS DOUBLE) + n_b) * ed
                       * 1000000.0)/1000000.0 AS t_stat
              FROM e"""),
      (s, d) => energyFromCum(ordersSpine(s, d))),

    // Which slice of the score ranking actually captures the
    // positives — the decile gains table campaign targeting reads.
    Query(
      "q_lift_table",
      Some("""WITH s AS (
                SELECT o_totalprice AS v,
                       CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END
                         AS isa
                FROM orders WHERE o_orderstatus IN ('F', 'O')),
              g AS (SELECT v, sum(isa) AS na, sum(1 - isa) AS nb
                    FROM s GROUP BY 1),
              c AS (SELECT v, na, nb,
                      sum(na) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                        PRECEDING AND CURRENT ROW) AS ca,
                      sum(nb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                        PRECEDING AND CURRENT ROW) AS cb
                    FROM g),
              t AS (SELECT sum(na) AS npt, sum(nb) AS nnt FROM g),
              d AS (SELECT CAST((npt + nnt - ca - cb) * 10
                        // (npt + nnt) AS INT) + 1 AS decile,
                      na, nb, npt, npt + nnt AS nt
                    FROM c CROSS JOIN t),
              per AS (SELECT decile, sum(na + nb) AS n,
                        sum(na) AS n_pos, min(npt) AS npt,
                        min(nt) AS nt
                      FROM d GROUP BY 1),
              w AS (SELECT decile, n, n_pos, npt, nt,
                      sum(n) OVER (ORDER BY decile ROWS BETWEEN
                        UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n,
                      sum(n_pos) OVER (ORDER BY decile ROWS BETWEEN
                        UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_pos
                    FROM per)
              SELECT decile, CAST(n AS BIGINT) AS n,
                     CAST(n_pos AS BIGINT) AS n_pos,
                     round(CAST(n_pos AS DOUBLE) / n
                       * 1000000.0)/1000000.0 AS resp_rate,
                     round(CASE WHEN npt > 0 THEN
                         (CAST(n_pos AS DOUBLE) / n)
                           / (CAST(npt AS DOUBLE) / nt) END
                       * 1000000.0)/1000000.0 AS lift,
                     round(CASE WHEN npt > 0 THEN
                         CAST(cum_pos AS DOUBLE) / npt END
                       * 1000000.0)/1000000.0 AS cum_gain,
                     round(CASE WHEN npt > 0 THEN
                         CAST(cum_pos AS DOUBLE) / cum_n
                           / (CAST(npt AS DOUBLE) / nt) END
                       * 1000000.0)/1000000.0 AS cum_lift
              FROM w ORDER BY decile"""),
      (s, d) => liftFromCum(ordersSpine(s, d))),

    // 25 simultaneous nation-vs-rest balance tests: which nations
    // survive the multiple-testing correction, not just raw p < 0.05.
    Query(
      "q_fdr_bh",
      Some(s"""WITH per AS (
                 SELECT n.n_name AS nation, count(*) AS n,
                        sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS sx,
                        sum(CAST(CAST(c.c_acctbal AS DOUBLE)
                            * CAST(c.c_acctbal AS DOUBLE)
                          AS DECIMAL(38,12))) AS sxx
                 FROM customer c JOIN nation n
                   ON c.c_nationkey = n.n_nationkey
                 GROUP BY 1),
               t AS (SELECT sum(n) AS nt, sum(sx) AS tsx,
                            sum(sxx) AS tsxx
                     FROM per),
               zt AS (
                 SELECT nation,
                        (CAST(sx AS DOUBLE) / n
                          - CAST(tsx - sx AS DOUBLE) / (nt - n))
                        / sqrt(((CAST(sxx AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                              / n) / (n - 1)) / n
                          + ((CAST(tsxx - sxx AS DOUBLE)
                            - CAST(tsx - sx AS DOUBLE)
                              * CAST(tsx - sx AS DOUBLE) / (nt - n))
                            / (nt - n - 1)) / (nt - n)) AS z
                 FROM per CROSS JOIN t),
               pt AS (SELECT nation,
                        ${sqlTwoSidedNormalP("z")} AS p
                      FROM zt),
               mt AS (SELECT count(*) AS m FROM pt),
               rk AS (SELECT nation, p,
                        row_number() OVER (ORDER BY p, nation) AS rank
                      FROM pt),
               qv AS (SELECT nation, p, rank,
                        least(1.0, min(p * m / rank)
                          OVER (ORDER BY rank DESC ROWS BETWEEN
                            UNBOUNDED PRECEDING AND CURRENT ROW))
                          AS q
                      FROM rk CROSS JOIN mt)
               SELECT nation,
                      round(p * 1000000.0)/1000000.0 AS p_value,
                      rank,
                      round(q * 1000000.0)/1000000.0 AS q_value,
                      q <= 0.05 AS rejected
               FROM qv ORDER BY rank"""),
      (s, d) => {
        import org.apache.spark.sql.types.DecimalType
        val dec2 = DecimalType(18, 2)
        val dec12 = DecimalType(38, 12)
        val x = col("c_acctbal").cast("double")
        val per = Tables.customer(s, d).join(Tables.nation(s, d),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name").as("nation"))
          .agg(count(lit(1)).as("n"),
            sum(col("c_acctbal").cast(dec2)).as("sx"),
            sum((x * x).cast(dec12)).as("sxx"))
        val t = per.agg(sum("n").as("nt"), sum("sx").as("tsx"),
          sum("sxx").as("tsxx"))
        def dd(c: Column): Column = c.cast("double")
        val n1 = col("n").cast("double")
        val n2 = (col("nt") - col("n")).cast("double")
        val z = (dd(col("sx")) / n1 -
            dd(col("tsx") - col("sx")) / n2) /
          sqrt(((dd(col("sxx")) - dd(col("sx")) * dd(col("sx")) / n1)
              / (n1 - 1)) / n1 +
            ((dd(col("tsxx") - col("sxx")) -
              dd(col("tsx") - col("sx")) * dd(col("tsx") - col("sx"))
                / n2) / (n2 - 1)) / n2)
        val pt = per.crossJoin(broadcast(t))
          .select(col("nation"), twoSidedNormalP(z).as("p"))
        fdrBh(pt, "nation", "p")
      }),

    // Which priority tier's totals actually drifted between finished
    // and open orders — the per-slice KS that finds what the global
    // statistic averages away.
    Query(
      "q_ks_by",
      Some("""WITH s AS (
                SELECT o_orderpriority AS seg, o_totalprice AS v,
                       CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END
                         AS isa
                FROM orders WHERE o_orderstatus IN ('F', 'O')),
              g AS (SELECT seg, v, sum(isa) AS na, sum(1 - isa) AS nb
                    FROM s GROUP BY 1, 2),
              c AS (SELECT seg, v, na, nb,
                      sum(na) OVER (PARTITION BY seg ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT
                          ROW) AS ca,
                      sum(nb) OVER (PARTITION BY seg ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT
                          ROW) AS cb
                    FROM g),
              t AS (SELECT seg, sum(na) AS nat, sum(nb) AS nbt
                    FROM g GROUP BY 1),
              d AS (SELECT c.seg,
                      max(abs(ca * nbt - cb * nat)) AS dnum,
                      min(nat) AS n_a, min(nbt) AS n_b
                    FROM c JOIN t ON c.seg = t.seg
                    GROUP BY 1),
              f AS (SELECT seg, CAST(n_a AS BIGINT) AS n_a,
                      CAST(n_b AS BIGINT) AS n_b,
                      CAST(dnum AS DOUBLE)
                        / (CAST(n_a AS DOUBLE) * n_b) AS dd
                    FROM d)
              SELECT seg AS o_orderpriority, n_a, n_b,
                     round(CASE WHEN n_a > 0 AND n_b > 0 THEN dd END
                       * 1000000.0)/1000000.0 AS d_stat,
                     round(CASE WHEN n_a > 0 AND n_b > 0 THEN
                         least(1.0, 2.0 * exp(-2.0 * dd * dd
                           * n_a * n_b / (n_a + n_b))) END
                       * 1000000.0)/1000000.0 AS p_value
              FROM f ORDER BY o_orderpriority"""),
      (s, d) => ksBy(Tables.orders(s, d), "o_totalprice",
        "o_orderstatus", "F", "O", "o_orderpriority")),

    // The first test a real user runs on "did the metric move":
    // Welch's t on the two groups' totals, unequal variances assumed.
    Query(
      "q_t_test",
      Some("""WITH per AS (
                SELECT (o_orderstatus = 'F') AS isa, count(*) AS n,
                       sum(CAST(o_totalprice AS DECIMAL(38,6))) AS sx,
                       sum(CAST(o_totalprice * o_totalprice
                         AS DECIMAL(38,6))) AS sxx
                FROM orders WHERE o_orderstatus IN ('F', 'O')
                GROUP BY 1),
              one AS (SELECT
                       max(CASE WHEN isa THEN n END) AS n_a,
                       max(CASE WHEN NOT isa THEN n END) AS n_b,
                       max(CASE WHEN isa THEN sx END) AS sxa,
                       max(CASE WHEN NOT isa THEN sx END) AS sxb,
                       max(CASE WHEN isa THEN sxx END) AS sxxa,
                       max(CASE WHEN NOT isa THEN sxx END) AS sxxb
                     FROM per),
              m AS (SELECT
                      CAST(n_a AS BIGINT) AS n_a,
                      CAST(n_b AS BIGINT) AS n_b,
                      CAST(sxa AS DOUBLE) / n_a AS ma,
                      CAST(sxb AS DOUBLE) / n_b AS mb,
                      (CAST(sxxa AS DOUBLE) - CAST(sxa AS DOUBLE)
                        * CAST(sxa AS DOUBLE) / n_a)
                        / (CAST(n_a AS DOUBLE) - 1) / n_a AS ra,
                      (CAST(sxxb AS DOUBLE) - CAST(sxb AS DOUBLE)
                        * CAST(sxb AS DOUBLE) / n_b)
                        / (CAST(n_b AS DOUBLE) - 1) / n_b AS rb
                    FROM one)
              SELECT n_a, n_b,
                     round(ma * 1000000.0)/1000000.0 AS mean_a,
                     round(mb * 1000000.0)/1000000.0 AS mean_b,
                     round(CASE WHEN ra + rb > 0 THEN (ma - mb)
                         / sqrt(ra + rb) END
                       * 1000000.0)/1000000.0 AS t_stat,
                     round(CASE WHEN ra + rb > 0 THEN
                         (ra + rb) * (ra + rb)
                         / (ra * ra / (n_a - 1) + rb * rb / (n_b - 1))
                       END * 1000000.0)/1000000.0 AS dof
              FROM m"""),
      (s, d) => tTest(Tables.orders(s, d), "o_totalprice",
        "o_orderstatus", "F", "O")),

    // How BIG is the finished-vs-open difference — the effect sizes
    // the t-test's significance can't answer at corpus n.
    Query(
      "q_effect_size",
      Some("""WITH per AS (
                SELECT (o_orderstatus = 'F') AS isa, count(*) AS n,
                       sum(CAST(o_totalprice AS DECIMAL(38,6))) AS sx,
                       sum(CAST(o_totalprice * o_totalprice
                         AS DECIMAL(38,6))) AS sxx
                FROM orders WHERE o_orderstatus IN ('F', 'O')
                GROUP BY 1),
              one AS (SELECT
                       max(CASE WHEN isa THEN n END) AS n_a,
                       max(CASE WHEN NOT isa THEN n END) AS n_b,
                       max(CASE WHEN isa THEN sx END) AS sxa,
                       max(CASE WHEN NOT isa THEN sx END) AS sxb,
                       max(CASE WHEN isa THEN sxx END) AS sxxa,
                       max(CASE WHEN NOT isa THEN sxx END) AS sxxb
                     FROM per),
              m AS (SELECT
                      CAST(n_a AS BIGINT) AS n_a,
                      CAST(n_b AS BIGINT) AS n_b,
                      CAST(sxa AS DOUBLE) / n_a AS ma,
                      CAST(sxb AS DOUBLE) / n_b AS mb,
                      (CAST(sxxa AS DOUBLE) - CAST(sxa AS DOUBLE)
                        * CAST(sxa AS DOUBLE) / n_a)
                        / (CAST(n_a AS DOUBLE) - 1) AS va,
                      (CAST(sxxb AS DOUBLE) - CAST(sxb AS DOUBLE)
                        * CAST(sxb AS DOUBLE) / n_b)
                        / (CAST(n_b AS DOUBLE) - 1) AS vb
                    FROM one),
              f AS (SELECT *,
                      ((CAST(n_a AS DOUBLE) - 1) * va
                        + (CAST(n_b AS DOUBLE) - 1) * vb)
                        / (CAST(n_a AS DOUBLE) + n_b - 2) AS sp2
                    FROM m)
              SELECT n_a, n_b,
                     round(CASE WHEN n_a > 1 AND n_b > 1
                         THEN ma - mb END
                       * 1000000.0)/1000000.0 AS mean_diff,
                     round(CASE WHEN n_a > 1 AND n_b > 1 THEN
                         CASE WHEN sp2 > 0
                           THEN (ma - mb) / sqrt(sp2) END END
                       * 1000000.0)/1000000.0 AS cohen_d,
                     round(CASE WHEN n_a > 1 AND n_b > 1 THEN
                         CASE WHEN sp2 > 0 THEN (ma - mb) / sqrt(sp2)
                           * (1.0 - 3.0
                             / (4.0 * (n_a + n_b) - 9)) END END
                       * 1000000.0)/1000000.0 AS hedges_g,
                     round(CASE WHEN n_a > 1 AND n_b > 1 THEN
                         CASE WHEN vb > 0
                           THEN (ma - mb) / sqrt(vb) END END
                       * 1000000.0)/1000000.0 AS glass_delta
              FROM f"""),
      (s, d) => effectSize(Tables.orders(s, d), "o_totalprice",
        "o_orderstatus", "F", "O")),

    // Same question, rank-flavored: Mann–Whitney is the robust
    // "is one group stochastically larger" test — the nonparametric
    // twin of q_ab_metrics' two-proportion z.
    Query(
      "q_mann_whitney",
      Some("""WITH s AS (
                SELECT o_totalprice AS v,
                       CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END
                         AS isa
                FROM orders WHERE o_orderstatus IN ('F', 'O')),
              g AS (SELECT v, sum(isa) AS na, sum(1 - isa) AS nb
                    FROM s GROUP BY 1),
              c AS (SELECT v, na, nb, na + nb AS cnt,
                      coalesce(sum(na + nb) OVER (ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1
                        PRECEDING), 0) AS cprev
                    FROM g),
              m AS (SELECT sum(na * (2 * cprev + cnt + 1)) AS ra2,
                           sum(cnt * cnt * cnt - cnt) AS ties,
                           sum(na) AS n_a, sum(nb) AS n_b
                    FROM c)
              SELECT CAST(n_a AS BIGINT) AS n_a,
                     CAST(n_b AS BIGINT) AS n_b,
                     round((CAST(ra2 AS DOUBLE)
                         - CAST(n_a AS DOUBLE) * (n_a + 1.0)) / 2.0
                       * 1000000.0)/1000000.0 AS u,
                     round(((CAST(ra2 AS DOUBLE)
                           - CAST(n_a AS DOUBLE) * (n_a + 1.0)) / 2.0
                         - CAST(n_a AS DOUBLE) * n_b / 2.0)
                       / sqrt(CAST(n_a AS DOUBLE) * n_b / 12.0
                           * ((CAST(n_a AS DOUBLE) + n_b + 1.0)
                             - CAST(ties AS DOUBLE)
                               / ((CAST(n_a AS DOUBLE) + n_b)
                                 * (CAST(n_a AS DOUBLE) + n_b - 1.0))))
                       * 1000000.0)/1000000.0 AS z
              FROM m"""),
      (s, d) => mwFromCum(ordersSpine(s, d))),

    // How well does the order total RANK finished vs open orders —
    // the ROC AUC readout of the same comparison, exact under ties.
    Query(
      "q_auc",
      Some("""WITH s AS (
                SELECT o_totalprice AS v,
                       CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END
                         AS isa
                FROM orders WHERE o_orderstatus IN ('F', 'O')),
              g AS (SELECT v, sum(isa) AS na, sum(1 - isa) AS nb
                    FROM s GROUP BY 1),
              c AS (SELECT v, na, nb, na + nb AS cnt,
                      coalesce(sum(na + nb) OVER (ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1
                        PRECEDING), 0) AS cprev
                    FROM g),
              m AS (SELECT sum(na * (2 * cprev + cnt + 1)) AS ra2,
                           sum(na) AS n_a, sum(nb) AS n_b
                    FROM c),
              f AS (SELECT CAST(n_a AS BIGINT) AS n_pos,
                      CAST(n_b AS BIGINT) AS n_neg,
                      CASE WHEN n_a > 0 AND n_b > 0 THEN
                        (CAST(ra2 AS DOUBLE)
                          - CAST(n_a AS DOUBLE) * (n_a + 1.0)) / 2.0
                          / (CAST(n_a AS DOUBLE) * n_b) END AS a
                    FROM m)
              SELECT n_pos, n_neg,
                     round(a * 1000000.0)/1000000.0 AS auc,
                     round((2.0 * a - 1.0) * 1000000.0)/1000000.0
                       AS gini
              FROM f"""),
      (s, d) => aucFromCum(ordersSpine(s, d))),

    // The imbalance-honest twin: average precision of the same
    // ranking, with the no-skill prevalence baseline alongside.
    Query(
      "q_pr_auc",
      Some("""WITH s AS (
                SELECT o_totalprice AS v,
                       CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END
                         AS isa
                FROM orders WHERE o_orderstatus IN ('F', 'O')),
              g AS (SELECT v, sum(isa) AS na, sum(1 - isa) AS nb
                    FROM s GROUP BY 1),
              c AS (SELECT v, na, nb,
                      sum(na) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                        PRECEDING AND CURRENT ROW) AS ca,
                      sum(nb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                        PRECEDING AND CURRENT ROW) AS cb
                    FROM g),
              t AS (SELECT sum(na) AS npt, sum(nb) AS nnt FROM g),
              terms AS (
                SELECT na, npt, nnt,
                       npt - (ca - na) AS tp, nnt - (cb - nb) AS fp
                FROM c CROSS JOIN t),
              m AS (SELECT
                      sum(CASE WHEN na > 0 THEN
                        CAST(CAST(na AS DOUBLE) * tp / (tp + fp) / npt
                          AS DECIMAL(38,12))
                        ELSE CAST(0 AS DECIMAL(38,12)) END) AS ap,
                      min(npt) AS n_pos, min(nnt) AS n_neg
                    FROM terms)
              SELECT CAST(n_pos AS BIGINT) AS n_pos,
                     CAST(n_neg AS BIGINT) AS n_neg,
                     round(CAST(ap AS DOUBLE) * 1000000.0)/1000000.0
                       AS pr_auc,
                     round(CAST(n_pos AS DOUBLE)
                         / (CAST(n_pos AS DOUBLE) + n_neg)
                       * 1000000.0)/1000000.0 AS baseline
              FROM m"""),
      (s, d) => prAucFromCum(ordersSpine(s, d))),

    // The operating-point table next to the AUC single number:
    // confusion cells + precision/recall/F1/accuracy at each pooled
    // 5%-percentile threshold of the same score.
    Query(
      "q_threshold_sweep",
      Some("""WITH s AS (
                SELECT o_totalprice AS v,
                       CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END
                         AS isa
                FROM orders WHERE o_orderstatus IN ('F', 'O')),
              g AS (SELECT v, sum(isa) AS na, sum(1 - isa) AS nb
                    FROM s GROUP BY 1),
              c AS (SELECT v, na, nb,
                      sum(na) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                        PRECEDING AND CURRENT ROW) AS ca,
                      sum(nb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                        PRECEDING AND CURRENT ROW) AS cb
                    FROM g),
              t AS (SELECT sum(na) AS npt, sum(nb) AS nnt FROM g),
              ks AS (SELECT range AS k FROM range(1, 20)),
              thr AS (SELECT k,
                        min(CASE WHEN (ca + cb) * 20
                              >= k * (npt + nnt) THEN v END) AS v
                      FROM c CROSS JOIN t CROSS JOIN ks GROUP BY k),
              j AS (SELECT k, thr.v, npt, nnt,
                      npt - (ca - na) AS tp, nnt - (cb - nb) AS fp
                    FROM thr JOIN c ON thr.v = c.v CROSS JOIN t)
              SELECT CAST(k AS BIGINT) AS k,
                     round(CAST(k AS DOUBLE) / 20
                       * 1000000.0)/1000000.0 AS p,
                     CAST(CAST(v AS DECIMAL(18,2)) AS DOUBLE)
                       AS threshold,
                     CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
                     CAST(npt - tp AS BIGINT) AS fn,
                     CAST(nnt - fp AS BIGINT) AS tn,
                     round(CASE WHEN tp + fp > 0 THEN
                         CAST(tp AS DOUBLE) / (tp + fp) END
                       * 1000000.0)/1000000.0 AS "precision",
                     round(CASE WHEN npt > 0 THEN
                         CAST(tp AS DOUBLE) / npt END
                       * 1000000.0)/1000000.0 AS recall,
                     round(CASE WHEN tp > 0 THEN
                         2.0 * (CAST(tp AS DOUBLE) / (tp + fp))
                           * (CAST(tp AS DOUBLE) / npt)
                           / (CAST(tp AS DOUBLE) / (tp + fp)
                             + CAST(tp AS DOUBLE) / npt) END
                       * 1000000.0)/1000000.0 AS f1,
                     round((CAST(tp AS DOUBLE) + (nnt - fp))
                         / (npt + nnt)
                       * 1000000.0)/1000000.0 AS accuracy
              FROM j ORDER BY k"""),
      (s, d) => sweepFromCum(ordersSpine(s, d))),

    // Per-segment AUC: slice evals are where model regressions
    // actually surface — one grouped spine, one per-segment fold.
    Query(
      "q_auc_by",
      Some("""WITH s AS (
                SELECT o_orderpriority AS seg, o_totalprice AS v,
                       CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END
                         AS isa
                FROM orders WHERE o_orderstatus IN ('F', 'O')),
              g AS (SELECT seg, v, sum(isa) AS na, sum(1 - isa) AS nb
                    FROM s GROUP BY 1, 2),
              c AS (SELECT seg, v, na, nb, na + nb AS cnt,
                      coalesce(sum(na + nb) OVER (PARTITION BY seg
                        ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) AS cprev
                    FROM g),
              m AS (SELECT seg,
                      sum(na * (2 * cprev + cnt + 1)) AS ra2,
                      sum(na) AS n_pos, sum(nb) AS n_neg
                    FROM c GROUP BY 1),
              f AS (SELECT seg, CAST(n_pos AS BIGINT) AS n_pos,
                      CAST(n_neg AS BIGINT) AS n_neg,
                      CASE WHEN n_pos > 0 AND n_neg > 0 THEN
                        (CAST(ra2 AS DOUBLE)
                          - CAST(n_pos AS DOUBLE) * (n_pos + 1.0)) / 2.0
                          / (CAST(n_pos AS DOUBLE) * n_neg) END AS a
                    FROM m)
              SELECT seg AS o_orderpriority, n_pos, n_neg,
                     round(a * 1000000.0)/1000000.0 AS auc,
                     round((2.0 * a - 1.0) * 1000000.0)/1000000.0
                       AS gini
              FROM f ORDER BY 1"""),
      (s, d) => aucBy(Tables.orders(s, d), "o_totalprice",
        "o_orderstatus", "F", "O", "o_orderpriority")),

    // Is the AUC actually significant — DeLong standard error and
    // the 95% CI next to the point estimate, exact placements off
    // the same spine.
    Query(
      "q_auc_ci",
      Some("""WITH s AS (
                SELECT o_totalprice AS v,
                       CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END
                         AS isa
                FROM orders WHERE o_orderstatus IN ('F', 'O')),
              g AS (SELECT v, sum(isa) AS na, sum(1 - isa) AS nb
                    FROM s GROUP BY 1),
              c AS (SELECT v, na, nb,
                      sum(na) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                        PRECEDING AND CURRENT ROW) AS ca,
                      sum(nb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                        PRECEDING AND CURRENT ROW) AS cb
                    FROM g),
              t AS (SELECT sum(na) AS npt, sum(nb) AS nnt FROM g),
              m AS (SELECT
                      sum(na * (2 * cb - nb)) AS m10,
                      sum(CAST(CAST(na AS DOUBLE)
                        * CAST(2 * cb - nb AS DOUBLE)
                        * CAST(2 * cb - nb AS DOUBLE)
                        AS DECIMAL(38,12))) AS q10,
                      sum(nb * (2 * (npt - ca) + na)) AS m01,
                      sum(CAST(CAST(nb AS DOUBLE)
                        * CAST(2 * (npt - ca) + na AS DOUBLE)
                        * CAST(2 * (npt - ca) + na AS DOUBLE)
                        AS DECIMAL(38,12))) AS q01,
                      min(npt) AS n_pos, min(nnt) AS n_neg
                    FROM c CROSS JOIN t),
              f AS (SELECT CAST(n_pos AS BIGINT) AS n_pos,
                      CAST(n_neg AS BIGINT) AS n_neg,
                      CAST(n_pos AS DOUBLE) AS np,
                      CAST(n_neg AS DOUBLE) AS nn,
                      CAST(m10 AS DOUBLE) AS m10d,
                      CAST(q10 AS DOUBLE) AS q10d,
                      CAST(m01 AS DOUBLE) AS m01d,
                      CAST(q01 AS DOUBLE) AS q01d
                    FROM m),
              f2 AS (SELECT n_pos, n_neg,
                       m10d / (np * nn * 2) AS a,
                       sqrt(greatest(
                         (q10d - m10d * m10d / np) / (np - 1)
                           / (nn * nn * 4) / np
                         + (q01d - m01d * m01d / nn) / (nn - 1)
                           / (np * np * 4) / nn, 0.0)) AS se
                     FROM f)
              SELECT n_pos, n_neg,
                     round(CASE WHEN n_pos > 1 AND n_neg > 1 THEN a
                       END * 1000000.0)/1000000.0 AS auc,
                     round(CASE WHEN n_pos > 1 AND n_neg > 1 THEN se
                       END * 1000000.0)/1000000.0 AS se,
                     round(CASE WHEN n_pos > 1 AND n_neg > 1 THEN
                         greatest(a - 1.96 * se, 0.0)
                       END * 1000000.0)/1000000.0 AS ci_lo,
                     round(CASE WHEN n_pos > 1 AND n_neg > 1 THEN
                         least(a + 1.96 * se, 1.0)
                       END * 1000000.0)/1000000.0 AS ci_hi
              FROM f2"""),
      (s, d) => aucCiFromCum(ordersSpine(s, d))),

    // Which "model" ranks finished-vs-open better — order total or
    // order age? The paired DeLong test on the shared labels.
    Query(
      "q_auc_compare",
      Some("""WITH base AS (
                SELECT o_totalprice AS va,
                       date_diff('day', DATE '1992-01-01',
                         o_orderdate) AS vb,
                       CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END
                         AS y
                FROM orders WHERE o_orderstatus IN ('F', 'O')),
              ga AS (SELECT va AS v, sum(y) AS na, sum(1 - y) AS nb
                     FROM base GROUP BY 1),
              caa AS (SELECT v, na, nb,
                        sum(na) OVER (ORDER BY v ROWS BETWEEN
                          UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
                        sum(nb) OVER (ORDER BY v ROWS BETWEEN
                          UNBOUNDED PRECEDING AND CURRENT ROW) AS cb
                      FROM ga),
              pa AS (SELECT v AS va, 2 * cb - nb AS u10_a,
                       ca AS ca_a, na AS na_a FROM caa),
              gb AS (SELECT vb AS v, sum(y) AS na, sum(1 - y) AS nb
                     FROM base GROUP BY 1),
              cbb AS (SELECT v, na, nb,
                        sum(na) OVER (ORDER BY v ROWS BETWEEN
                          UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
                        sum(nb) OVER (ORDER BY v ROWS BETWEEN
                          UNBOUNDED PRECEDING AND CURRENT ROW) AS cb
                      FROM gb),
              pb AS (SELECT v AS vb, 2 * cb - nb AS u10_b,
                       ca AS ca_b, na AS na_b FROM cbb),
              t AS (SELECT sum(y) AS npt, sum(1 - y) AS nnt
                    FROM base),
              j AS (SELECT y, npt, nnt,
                      CASE WHEN y = 1 THEN u10_a
                        ELSE 2 * (npt - ca_a) + na_a END AS ua,
                      CASE WHEN y = 1 THEN u10_b
                        ELSE 2 * (npt - ca_b) + na_b END AS ub
                    FROM base JOIN pa USING (va) JOIN pb USING (vb)
                    CROSS JOIN t),
              m AS (SELECT y, count(*) AS n, sum(ua) AS sa,
                      sum(ub) AS sb,
                      sum(CAST(CAST(ua AS DOUBLE) * CAST(ua AS DOUBLE)
                        AS DECIMAL(38,12))) AS qaa,
                      sum(CAST(CAST(ub AS DOUBLE) * CAST(ub AS DOUBLE)
                        AS DECIMAL(38,12))) AS qbb,
                      sum(CAST(CAST(ua AS DOUBLE) * CAST(ub AS DOUBLE)
                        AS DECIMAL(38,12))) AS qab,
                      min(npt) AS npt, min(nnt) AS nnt
                    FROM j GROUP BY y),
              one AS (SELECT
                       max(CASE WHEN y = 1 THEN sa END) AS sa1,
                       max(CASE WHEN y = 1 THEN sb END) AS sb1,
                       max(CASE WHEN y = 1 THEN qaa END) AS qaa1,
                       max(CASE WHEN y = 1 THEN qbb END) AS qbb1,
                       max(CASE WHEN y = 1 THEN qab END) AS qab1,
                       max(CASE WHEN y = 0 THEN sa END) AS sa0,
                       max(CASE WHEN y = 0 THEN sb END) AS sb0,
                       max(CASE WHEN y = 0 THEN qaa END) AS qaa0,
                       max(CASE WHEN y = 0 THEN qbb END) AS qbb0,
                       max(CASE WHEN y = 0 THEN qab END) AS qab0,
                       min(npt) AS n_pos, min(nnt) AS n_neg
                     FROM m),
              f AS (SELECT CAST(n_pos AS BIGINT) AS n_pos,
                      CAST(n_neg AS BIGINT) AS n_neg,
                      CAST(n_pos AS DOUBLE) AS np,
                      CAST(n_neg AS DOUBLE) AS nn,
                      CAST(sa1 AS DOUBLE) AS sa1, CAST(sb1 AS DOUBLE)
                        AS sb1,
                      CAST(qaa1 AS DOUBLE) AS qaa1,
                      CAST(qbb1 AS DOUBLE) AS qbb1,
                      CAST(qab1 AS DOUBLE) AS qab1,
                      CAST(sa0 AS DOUBLE) AS sa0, CAST(sb0 AS DOUBLE)
                        AS sb0,
                      CAST(qaa0 AS DOUBLE) AS qaa0,
                      CAST(qbb0 AS DOUBLE) AS qbb0,
                      CAST(qab0 AS DOUBLE) AS qab0
                    FROM one),
              f2 AS (SELECT n_pos, n_neg,
                       sa1 / (np * nn * 2) AS auc_a,
                       sb1 / (np * nn * 2) AS auc_b,
                       ((qaa1 - sa1 * sa1 / np) / (np - 1)
                           / (nn * nn * 4)
                         + (qbb1 - sb1 * sb1 / np) / (np - 1)
                           / (nn * nn * 4)
                         - (qab1 - sa1 * sb1 / np) / (np - 1)
                           / (nn * nn * 4) * 2) / np
                       + ((qaa0 - sa0 * sa0 / nn) / (nn - 1)
                           / (np * np * 4)
                         + (qbb0 - sb0 * sb0 / nn) / (nn - 1)
                           / (np * np * 4)
                         - (qab0 - sa0 * sb0 / nn) / (nn - 1)
                           / (np * np * 4) * 2) / nn AS var0
                     FROM f),
              f3 AS (SELECT n_pos, n_neg, auc_a, auc_b,
                       sqrt(greatest(var0, 0.0)) AS se
                     FROM f2)
              SELECT n_pos, n_neg,
                     round(CASE WHEN n_pos > 1 AND n_neg > 1 THEN
                       auc_a END * 1000000.0)/1000000.0 AS auc_a,
                     round(CASE WHEN n_pos > 1 AND n_neg > 1 THEN
                       auc_b END * 1000000.0)/1000000.0 AS auc_b,
                     round(CASE WHEN n_pos > 1 AND n_neg > 1 THEN
                       auc_a - auc_b END * 1000000.0)/1000000.0
                       AS delta,
                     round(CASE WHEN n_pos > 1 AND n_neg > 1 THEN
                       se END * 1000000.0)/1000000.0 AS se,
                     round(CASE WHEN n_pos > 1 AND n_neg > 1 THEN
                         CASE WHEN se > 0 THEN (auc_a - auc_b) / se
                         END END * 1000000.0)/1000000.0 AS z
              FROM f3"""),
      (s, d) => aucCompare(
        Tables.orders(s, d).withColumn("score_date",
          datediff(col("o_orderdate"), lit("1992-01-01").cast("date"))),
        "o_totalprice", "score_date", "o_orderstatus", "F", "O")),

    // Offline retrieval eval: precision/recall/MRR/NDCG at k=3 over
    // per-order line rankings (score: extended price; relevant:
    // returned lines) — the metric block a search/RAG pipeline reads.
    Query(
      "q_ranking_eval",
      Some("""WITH ranked AS (
                SELECT l_orderkey AS q, l_linenumber AS cid,
                       CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END
                         AS rel,
                       row_number() OVER (PARTITION BY l_orderkey
                         ORDER BY l_extendedprice DESC,
                           l_linenumber ASC) AS rn
                FROM lineitem),
              perq AS (
                SELECT q,
                       sum(CASE WHEN rn <= 3 THEN rel ELSE 0 END)
                         AS hits,
                       sum(rel) AS r_total,
                       min(CASE WHEN rel = 1 AND rn <= 3 THEN rn END)
                         AS first_rel,
                       sum(CASE WHEN rn <= 3 AND rel = 1 THEN
                           CAST(CAST(1.0 AS DOUBLE)
                             / log2(CAST(rn AS DOUBLE) + 1)
                             AS DECIMAL(38,12))
                         ELSE CAST(0 AS DECIMAL(38,12)) END) AS dcg
                FROM ranked GROUP BY q),
              itab AS (
                SELECT m, sum(CAST(CAST(1.0 AS DOUBLE)
                         / log2(CAST(i AS DOUBLE) + 1)
                         AS DECIMAL(38,12))) AS idcg
                FROM (SELECT mm.range AS m, ii.range AS i
                      FROM range(0, 4) mm CROSS JOIN range(1, 4) ii)
                WHERE i <= m GROUP BY m),
              j AS (SELECT perq.*, itab.idcg
                    FROM perq LEFT JOIN itab
                      ON least(r_total, 3) = itab.m),
              agg AS (SELECT count(*) AS n_queries,
                        sum(CASE WHEN r_total > 0 THEN 1 ELSE 0 END)
                          AS n_eval,
                        sum(CAST(CAST(hits AS DOUBLE) / 3
                          AS DECIMAL(38,12))) AS p_sum,
                        sum(CASE WHEN r_total > 0 THEN
                          CAST(CAST(hits AS DOUBLE) / r_total
                            AS DECIMAL(38,12)) END) AS r_sum,
                        sum(coalesce(CAST(CAST(1.0 AS DOUBLE)
                            / first_rel AS DECIMAL(38,12)),
                          CAST(0 AS DECIMAL(38,12)))) AS mrr_sum,
                        sum(CASE WHEN r_total > 0 THEN
                          CAST(CAST(dcg AS DOUBLE)
                            / CAST(idcg AS DOUBLE)
                            AS DECIMAL(38,12)) END) AS ndcg_sum
                      FROM j)
              SELECT CAST(n_queries AS BIGINT) AS n_queries,
                     CAST(n_eval AS BIGINT) AS n_eval,
                     round(CAST(p_sum AS DOUBLE) / n_queries
                       * 1000000.0)/1000000.0 AS precision_at_k,
                     round(CASE WHEN n_eval > 0 THEN
                         CAST(r_sum AS DOUBLE) / n_eval END
                       * 1000000.0)/1000000.0 AS recall_at_k,
                     round(CAST(mrr_sum AS DOUBLE) / n_queries
                       * 1000000.0)/1000000.0 AS mrr,
                     round(CASE WHEN n_eval > 0 THEN
                         CAST(ndcg_sum AS DOUBLE) / n_eval END
                       * 1000000.0)/1000000.0 AS ndcg
              FROM agg"""),
      (s, d) => rankingEval(
        Tables.lineitem(s, d).withColumn("rel",
          (col("l_returnflag") === lit("R")).cast("int")),
        "l_orderkey", "l_linenumber", "l_extendedprice", "rel", 3)),

    // All three statuses at once: does ANY group shift the totals'
    // distribution — the k-sample generalization of q_mann_whitney.
    Query(
      "q_kruskal_wallis",
      Some("""WITH s AS (SELECT o_totalprice AS v, o_orderstatus AS grp
                         FROM orders),
              p AS (SELECT v, count(*) AS c FROM s GROUP BY 1),
              sp AS (SELECT v, c,
                       coalesce(sum(c) OVER (ORDER BY v ROWS BETWEEN
                         UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 2
                         + c + 1 AS r2
                     FROM p),
              pg AS (SELECT grp, v, count(*) AS ng FROM s GROUP BY 1, 2),
              gr AS (SELECT grp, sum(ng) AS n_g, sum(ng * r2) AS rg2
                     FROM pg JOIN sp USING (v) GROUP BY 1),
              t AS (SELECT sum(c) AS n, sum(c*c*c - c) AS ties FROM p),
              kk AS (SELECT count(*) AS k FROM gr),
              hc AS (SELECT sum(CAST((CAST(rg2 AS DOUBLE) / 2)
                         * (CAST(rg2 AS DOUBLE) / 2) / n_g
                         AS DECIMAL(38,6))) AS rsum,
                       min(n) AS n, min(ties) AS ties
                     FROM gr CROSS JOIN t),
              sh AS (SELECT k,
                       12.0 / (CAST(n AS DOUBLE)
                           * (CAST(n AS DOUBLE) + 1))
                         * CAST(rsum AS DOUBLE)
                         - 3.0 * (CAST(n AS DOUBLE) + 1) AS h_raw,
                       1.0 - CAST(ties AS DOUBLE)
                         / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                           * CAST(n AS DOUBLE) - CAST(n AS DOUBLE))
                         AS tie_f
                     FROM hc CROSS JOIN kk)
              SELECT grp AS o_orderstatus, CAST(n_g AS BIGINT) AS n_g,
                     round(CAST(rg2 AS DOUBLE) / 2 / n_g
                       * 1000000.0)/1000000.0 AS mean_rank,
                     round(h_raw * 1000000.0)/1000000.0 AS h,
                     round(h_raw / tie_f * 1000000.0)/1000000.0
                       AS h_corrected,
                     CAST(k - 1 AS BIGINT) AS dof
              FROM gr CROSS JOIN sh ORDER BY 1"""),
      (s, d) => kruskalWallis(Tables.orders(s, d), "o_totalprice",
        "o_orderstatus")),

    // The parametric twin: one-way ANOVA F across the same groups.
    Query(
      "q_anova",
      Some("""WITH g AS (
                SELECT o_orderstatus AS grp, count(*) AS n_g,
                       sum(CAST(o_totalprice AS DECIMAL(38,6))) AS sx,
                       sum(CAST(o_totalprice * o_totalprice
                         AS DECIMAL(38,6))) AS sxx
                FROM orders GROUP BY 1),
              per AS (SELECT grp, n_g, sx, sxx,
                        CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                          * CAST(sx AS DOUBLE) / CAST(n_g AS DOUBLE)
                          AS ssw_g
                      FROM g),
              t AS (SELECT sum(n_g) AS n, count(*) AS k,
                      sum(sx) AS sxt,
                      CAST(sum(CAST(ssw_g AS DECIMAL(38,6)))
                        AS DOUBLE) AS ssw,
                      CAST(sum(CAST(CAST(sx AS DOUBLE)
                          * CAST(sx AS DOUBLE) / CAST(n_g AS DOUBLE)
                          AS DECIMAL(38,6))) AS DOUBLE) AS sq_over_n
                    FROM per),
              sh AS (SELECT
                       round((sq_over_n - CAST(sxt AS DOUBLE)
                           * CAST(sxt AS DOUBLE) / CAST(n AS DOUBLE))
                         / (CAST(k AS DOUBLE) - 1)
                         / (ssw / (CAST(n AS DOUBLE)
                             - CAST(k AS DOUBLE)))
                         * 1000000.0)/1000000.0 AS f_stat,
                       CAST(k - 1 AS BIGINT) AS dof_between,
                       CAST(n - k AS BIGINT) AS dof_within
                     FROM t)
              SELECT grp AS o_orderstatus, CAST(n_g AS BIGINT) AS n_g,
                     round(CAST(sx AS DOUBLE) / CAST(n_g AS DOUBLE)
                       * 1000000.0)/1000000.0 AS mean,
                     round(sqrt(greatest(ssw_g
                         / (CAST(n_g AS DOUBLE) - 1), 0.0))
                       * 1000000.0)/1000000.0 AS stddev,
                     f_stat, dof_between, dof_within
              FROM per CROSS JOIN sh ORDER BY 1"""),
      (s, d) => anovaF(Tables.orders(s, d), "o_totalprice",
        "o_orderstatus")),

    // WHERE do finished and open orders' totals diverge — the
    // shape-by-quantile readout behind q_ks_test's single number.
    Query(
      "q_qq",
      Some("""WITH s AS (
                SELECT o_totalprice AS v,
                       CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END
                         AS isa
                FROM orders WHERE o_orderstatus IN ('F', 'O')),
              g AS (SELECT v, sum(isa) AS na, sum(1 - isa) AS nb
                    FROM s GROUP BY 1),
              c AS (SELECT v,
                      sum(na) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                        PRECEDING AND CURRENT ROW) AS ca,
                      sum(nb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                        PRECEDING AND CURRENT ROW) AS cb
                    FROM g),
              t AS (SELECT sum(na) AS nat, sum(nb) AS nbt FROM g),
              ks AS (SELECT range AS k FROM range(1, 20))
              SELECT CAST(k AS BIGINT) AS k,
                     round(CAST(k AS DOUBLE) / 20
                       * 1000000.0)/1000000.0 AS p,
                     CAST(CAST(min(CASE WHEN ca * 20 >= k * nat
                       THEN v END) AS DECIMAL(18,2)) AS DOUBLE) AS q_a,
                     CAST(CAST(min(CASE WHEN cb * 20 >= k * nbt
                       THEN v END) AS DECIMAL(18,2)) AS DOUBLE) AS q_b
              FROM c CROSS JOIN t CROSS JOIN ks
              GROUP BY k ORDER BY k"""),
      (s, d) => qqFromCum(ordersSpine(s, d))),

    // Box-plot outlier census per return flag: exact quartiles, Tukey
    // fences, and how many rows fall outside them.
    Query(
      "q_iqr_outliers",
      Some("""WITH bv AS (
                SELECT l_returnflag AS g, l_extendedprice AS v,
                       count(*) AS w
                FROM lineitem GROUP BY 1, 2),
              cm AS (SELECT g, v,
                       sum(w) OVER (PARTITION BY g ORDER BY v
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT
                         ROW) AS cumw,
                       sum(w) OVER (PARTITION BY g) AS total
                     FROM bv),
              q1 AS (SELECT g, CAST(CAST(min(v) AS DECIMAL(18,2))
                       AS DOUBLE) AS q1
                     FROM cm WHERE cumw * 4 >= total GROUP BY g),
              q3 AS (SELECT g, CAST(CAST(min(v) AS DECIMAL(18,2))
                       AS DOUBLE) AS q3
                     FROM cm WHERE cumw * 4 >= total * 3 GROUP BY g),
              f AS (SELECT g, q1, q3,
                      round((q3 - q1) * 1000000.0)/1000000.0 AS iqr,
                      round((q1 - 1.5 * (q3 - q1))
                        * 1000000.0)/1000000.0 AS lo_fence,
                      round((q3 + 1.5 * (q3 - q1))
                        * 1000000.0)/1000000.0 AS hi_fence
                    FROM q1 JOIN q3 USING (g)),
              cnt AS (SELECT l_returnflag AS g, count(*) AS n,
                        sum(CASE WHEN l_extendedprice < lo_fence
                          THEN 1 ELSE 0 END) AS n_below,
                        sum(CASE WHEN l_extendedprice > hi_fence
                          THEN 1 ELSE 0 END) AS n_above
                      FROM lineitem JOIN f ON l_returnflag = f.g
                      GROUP BY 1)
              SELECT g AS l_returnflag, CAST(n AS BIGINT) AS n,
                     q1, q3, iqr, lo_fence, hi_fence,
                     CAST(n_below AS BIGINT) AS n_below,
                     CAST(n_above AS BIGINT) AS n_above
              FROM cnt JOIN f USING (g) ORDER BY 1"""),
      // fences cached per (session, corpus) — distribution stats,
      // the momentRow stance; repeat runs pay only the counting pass
      (s, d) => StatsOps.iqrOutliersWith(Tables.lineitem(s, d),
        "l_returnflag", "l_extendedprice",
        graft.tools.PlanCache.shared
          .get(s, s"$d#stats:iqr-fences:lineitem:l_returnflag," +
            "l_extendedprice")(
            graft.tools.Checkpoints.pin(StatsOps.iqrFences(
              Tables.lineitem(s, d), "l_returnflag",
              "l_extendedprice"))))),

    // Is quantity even close to normal within each return flag — the
    // normality gate in front of every z/t readout. Uniform-ish
    // quantity should fail hard (platykurtic: K ≈ 1.8, JB huge).
    Query(
      "q_jarque_bera",
      Some("""WITH g AS (
                SELECT l_returnflag AS grp, count(*) AS n,
                       sum(CAST(l_quantity AS DECIMAL(38,6))) AS s1,
                       sum(CAST(l_quantity * l_quantity
                         AS DECIMAL(38,6))) AS s2,
                       sum(CAST(l_quantity * l_quantity * l_quantity
                         AS DECIMAL(38,6))) AS s3,
                       sum(CAST(l_quantity * l_quantity * l_quantity
                         * l_quantity AS DECIMAL(38,6))) AS s4
                FROM lineitem GROUP BY 1),
              m AS (SELECT grp, n,
                      CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m1,
                      CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
                      CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3,
                      CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS r4
                    FROM g),
              c AS (SELECT grp, n, m1, r2 - m1 * m1 AS m2,
                      r3 - 3.0 * m1 * r2 + 2.0 * m1 * m1 * m1 AS m3,
                      r4 - 4.0 * m1 * r3 + 6.0 * m1 * m1 * r2
                        - 3.0 * m1 * m1 * m1 * m1 AS m4
                    FROM m),
              f AS (SELECT grp, n, m1, m2,
                      CASE WHEN n > 3 AND m2 > 0 THEN
                        m3 / sqrt(m2 * m2 * m2) END AS skew,
                      CASE WHEN n > 3 AND m2 > 0 THEN
                        m4 / (m2 * m2) END AS kurt
                    FROM c),
              j AS (SELECT grp, n, m1, skew, kurt,
                      CAST(n AS DOUBLE) / 6 * (skew * skew
                        + (kurt - 3) * (kurt - 3) / 4) AS jb
                    FROM f)
              SELECT grp AS l_returnflag, CAST(n AS BIGINT) AS n,
                     round(m1 * 1000000.0)/1000000.0 AS mean,
                     round(skew * 1000000.0)/1000000.0 AS skewness,
                     round(kurt * 1000000.0)/1000000.0 AS kurtosis,
                     round(jb * 1000000.0)/1000000.0 AS jb,
                     round(exp(jb / -2) * 1000000.0)/1000000.0
                       AS p_value
              FROM j ORDER BY 1"""),
      (s, d) => jarqueBera(Tables.lineitem(s, d), "l_quantity",
        "l_returnflag")),

    // Do the return flags have the same quantity SPREAD — the
    // variance-homogeneity assumption check (Brown–Forsythe) in
    // front of pooled-variance readouts (anova, tukey_hsd, cohen_d).
    Query(
      "q_levene",
      Some("""WITH s AS (
                SELECT l_returnflag AS grp,
                       CAST(l_quantity AS DOUBLE) AS v
                FROM lineitem),
              g AS (SELECT grp, v, count(*) AS c FROM s GROUP BY 1, 2),
              ng AS (SELECT grp, sum(c) AS n_g FROM g GROUP BY 1),
              cm AS (SELECT grp, v, sum(c) OVER (PARTITION BY grp
                       ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum
                     FROM g),
              med AS (SELECT grp, min(v) AS med
                      FROM cm JOIN ng USING (grp)
                      WHERE cum * 2 >= n_g GROUP BY 1),
              dv AS (SELECT s.grp, abs(v - med) AS absdev
                     FROM s JOIN med USING (grp)),
              ag AS (SELECT grp, count(*) AS n_g,
                       sum(CAST(absdev AS DECIMAL(38,6))) AS sx,
                       sum(CAST(absdev * absdev AS DECIMAL(38,6)))
                         AS sxx
                     FROM dv GROUP BY 1),
              per AS (SELECT grp, n_g, sx, sxx,
                        CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                          * CAST(sx AS DOUBLE) / CAST(n_g AS DOUBLE)
                          AS ssw_g
                      FROM ag),
              t AS (SELECT sum(n_g) AS n, count(*) AS k,
                      sum(sx) AS sxt,
                      CAST(sum(CAST(ssw_g AS DECIMAL(38,6)))
                        AS DOUBLE) AS ssw,
                      CAST(sum(CAST(CAST(sx AS DOUBLE)
                          * CAST(sx AS DOUBLE) / CAST(n_g AS DOUBLE)
                          AS DECIMAL(38,6))) AS DOUBLE) AS sq_over_n
                    FROM per),
              sh AS (SELECT
                       round((sq_over_n - CAST(sxt AS DOUBLE)
                           * CAST(sxt AS DOUBLE) / CAST(n AS DOUBLE))
                         / (CAST(k AS DOUBLE) - 1)
                         / (ssw / (CAST(n AS DOUBLE)
                             - CAST(k AS DOUBLE)))
                         * 1000000.0)/1000000.0 AS f_stat,
                       CAST(k - 1 AS BIGINT) AS dof_between,
                       CAST(n - k AS BIGINT) AS dof_within
                     FROM t)
              SELECT grp AS l_returnflag, CAST(n_g AS BIGINT) AS n_g,
                     round(CAST(sx AS DOUBLE) / CAST(n_g AS DOUBLE)
                       * 1000000.0)/1000000.0 AS mean,
                     round(sqrt(greatest(ssw_g
                         / (CAST(n_g AS DOUBLE) - 1), 0.0))
                       * 1000000.0)/1000000.0 AS stddev,
                     f_stat, dof_between, dof_within
              FROM per CROSS JOIN sh ORDER BY 1"""),
      (s, d) => leveneBf(Tables.lineitem(s, d), "l_quantity",
        "l_returnflag")),

    // WHICH order-status pairs differ in mean price, not just "some
    // do" (q_anova): the post-hoc pairwise table with studentized-
    // range q statistics against the shared within-group MSW.
    Query(
      "q_tukey_hsd",
      Some("""WITH g AS (
                SELECT o_orderstatus AS grp, count(*) AS n_g,
                       sum(CAST(o_totalprice AS DECIMAL(38,6))) AS sx,
                       sum(CAST(o_totalprice * o_totalprice
                         AS DECIMAL(38,6))) AS sxx
                FROM orders GROUP BY 1),
              per AS (SELECT grp, n_g,
                        CAST(sx AS DOUBLE) / CAST(n_g AS DOUBLE)
                          AS mean,
                        CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                          * CAST(sx AS DOUBLE) / CAST(n_g AS DOUBLE)
                          AS ssw_g
                      FROM g),
              t AS (SELECT sum(n_g) AS n, count(*) AS k,
                      CAST(sum(CAST(ssw_g AS DECIMAL(38,6)))
                        AS DOUBLE) AS ssw
                    FROM per),
              sh AS (SELECT ssw / (CAST(n AS DOUBLE)
                         - CAST(k AS DOUBLE)) AS msw,
                       CAST(n - k AS BIGINT) AS dof_within
                     FROM t),
              pr AS (SELECT a.grp AS g_a, b.grp AS g_b,
                       a.n_g AS n_a, b.n_g AS n_b,
                       a.mean AS ma, b.mean AS mb,
                       sqrt(msw / 2 * (1.0 / CAST(a.n_g AS DOUBLE)
                         + 1.0 / CAST(b.n_g AS DOUBLE))) AS se,
                       dof_within
                     FROM per a JOIN per b ON a.grp < b.grp
                     CROSS JOIN sh)
              SELECT g_a, g_b, CAST(n_a AS BIGINT) AS n_a,
                     CAST(n_b AS BIGINT) AS n_b,
                     round((ma - mb) * 1000000.0)/1000000.0 AS diff,
                     round(se * 1000000.0)/1000000.0 AS se,
                     round(CASE WHEN se > 0 THEN abs(ma - mb) / se END
                       * 1000000.0)/1000000.0 AS q_stat,
                     dof_within
              FROM pr ORDER BY 1, 2"""),
      (s, d) => tukeyHsd(Tables.orders(s, d), "o_totalprice",
        "o_orderstatus")))
}
