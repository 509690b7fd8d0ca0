package graft.operators

import graft.Query
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Tier B′ — batch event analytics over the `events` table: the
  * product-analytics trio (outlier detection, cohort retention, funnel
  * conversion) every event warehouse runs daily. The streaming twins
  * of this table live in StreamingOps; these are the batch/backfill
  * shapes. Each operator is a reusable function (the TVF surface in
  * GraftExtensions shares them) with the registered query binding the
  * fixture columns.
  *
  * Scale stance: nothing here windows over the corpus. [[anomaly]]'s
  * stats table is one row per group (broadcast back over the scoring
  * scan); [[retention]] is two user-keyed hash aggregates and one
  * user-keyed equi-join (AQE handles a hot user); [[funnel]] folds to
  * one row per user, then one global row, before the per-stage
  * unpivot. All determinism-sensitive moments run in DECIMAL sums
  * (the q_profile stance) so partial-aggregation order cannot perturb
  * the fold.
  */
object EventOps {

  private def r6(x: Column): Column = round(x * lit(1000000.0)) / lit(1000000.0)

  /** Per-group z-score outliers: rows whose `valueCol` sits more than
    * `z` sample standard deviations from their group's mean. μ/σ fold
    * from DECIMAL(38,6) sums (order-independent, engine-identical);
    * the z expression is then the same IEEE ops in the same order on
    * any engine, so the strict cut and the 6-dp rounding agree
    * exactly. Two scans: a tiny per-group stats aggregate (≤|groups|
    * rows, broadcast), then a narrow scoring filter. */
  def anomaly(df: DataFrame, groupCol: String, idCol: String,
      valueCol: String, z: Double = 3.0): DataFrame =
    anomalyScore(df, anomalyStats(df, groupCol, valueCol), groupCol,
      idCol, valueCol, z)
      .orderBy(idCol)

  /** The per-group moment table behind [[anomaly]] — ≤|groups| rows of
    * DECIMAL-exact (n, Σx, Σx²). Computed batch; broadcastable. */
  def anomalyStats(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val dec = DecimalType(38, 6)
    df.groupBy(groupCol)
      .agg(
        count(lit(1)).cast("double").as("n"),
        sum(col(valueCol).cast(dec)).cast("double").as("s1"),
        sum((col(valueCol) * col(valueCol)).cast(dec)).cast("double")
          .as("s2"))
  }

  /** The scoring half of [[anomaly]], factored so a STREAM can run it
    * against batch-computed stats: one broadcast stream-static join +
    * a narrow filter — stateless, so the streaming plan stays
    * shuffle-free per micro-batch. No ORDER BY here (streams cannot
    * sort); the batch wrapper adds it. */
  def anomalyScore(df: DataFrame, stats: DataFrame, groupCol: String,
      idCol: String, valueCol: String, z: Double = 3.0): DataFrame = {
    val n = col("n"); val s1 = col("s1"); val s2 = col("s2")
    val zscore = (col(valueCol) - s1 / n) /
      sqrt((s2 - s1 * s1 / n) / (n - lit(1)))
    df.join(broadcast(stats), groupCol)
      .filter(abs(zscore) > z)
      .select(col(idCol), col(groupCol), col(valueCol), r6(zscore).as("z"))
  }

  /** Cohort retention: users grouped by first-seen day, counted on
    * each later active day (the day-offset triangle behind every
    * retention curve). First-seen and distinct-active-days are both
    * user-keyed hash aggregates; the join back is a user-keyed
    * equi-join; the final aggregate is days × offsets rows — tiny at
    * any corpus size. Day boundaries are the session zone's (UTC —
    * Tables.events pins it). */
  def retention(df: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val first = df.groupBy(userCol)
      .agg(min(to_date(col(tsCol))).as("cohort_day"))
    val active = df
      .select(col(userCol), to_date(col(tsCol)).as("day"))
      .distinct()
    active.join(first, userCol)
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("bigint")
          .as("day_offset"))
      .agg(count(lit(1)).as("users"))
      .orderBy("cohort_day", "day_offset")
  }

  /** Ordered funnel conversion through `stages` (first-touch, strict
    * timestamp ordering between stage minima): row i counts the users
    * whose earliest stage-1..i events are strictly increasing in time.
    * One conditional-min aggregate per user, then a single global fold
    * unpivoted to |stages| rows — the global aggregate sees one row
    * per user, map-side-combined, never the raw events. */
  def funnel(df: DataFrame, userCol: String, typeCol: String,
      tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.forall(_.matches("[A-Za-z0-9_.-]+")),
      s"funnel stage names must be simple identifiers; got $stages")
    val mins = stages.zipWithIndex.map { case (st, i) =>
      min(when(col(typeCol) === st, col(tsCol))).as(s"t$i")
    }
    val m = df.groupBy(userCol).agg(mins.head, mins.tail: _*)
    // reached(i): t0 < t1 < … < ti, with t0 merely present
    val reached = stages.indices.map { i =>
      (1 to i).foldLeft(col("t0").isNotNull: Column)((acc, j) =>
        acc && col(s"t$j") > col(s"t${j - 1}"))
    }
    val counters = reached.zipWithIndex.map { case (c, i) =>
      sum(when(c, 1L).otherwise(0L)).as(s"c$i")
    }
    val labels = stages.indices.map(i => stages.take(i + 1).mkString("_"))
    val stackArgs = stages.indices
      .map(i => s"${i + 1}, '${labels(i)}', c$i").mkString(", ")
    m.agg(counters.head, counters.tail: _*)
      .select(expr(s"stack(${stages.size}, $stackArgs) " +
        "AS (stage_idx, stage, users)"))
      .select(col("stage_idx").cast("int").as("stage_idx"),
        col("stage"), col("users"))
      .orderBy("stage_idx")
  }

  /** Robust (median/MAD) outlier detection — the heavy-tail-safe twin
    * of [[anomaly]]: the modified z-score 0.6745·(x − median)/MAD
    * (Iglewicz–Hoaglin; default cut 3.5) is immune to the outliers
    * themselves inflating σ, which mean/stddev scoring suffers on
    * contaminated feeds. Two grouped EXACT percentiles (the
    * quantile_cont interpolation both engines share — the q_percentile
    * stance) with ≤|groups|-row stat tables broadcast back over a
    * narrow scoring scan. Exactness costs per-group sorts of the
    * values; at 100 TB swap in approx_percentile for the same shape. */
  def anomalyMad(df: DataFrame, groupCol: String, idCol: String,
      valueCol: String, z: Double = 3.5): DataFrame = {
    val med = df.groupBy(groupCol)
      .agg(percentile(col(valueCol), lit(0.5)).as("med"))
    // Zero-MAD groups (any group where a majority of values equal the
    // median) are EXCLUDED: their score is 0/0 or ±∞, and engines
    // disagree on NaN ordering (Spark drops NaN from `> z`, DuckDB
    // sorts NaN greater) — a robust score is undefined when the
    // scale estimate degenerates, so the inner join below drops them.
    val mad = df.join(broadcast(med), groupCol)
      .groupBy(groupCol)
      .agg(percentile(abs(col(valueCol) - col("med")), lit(0.5)).as("mad"))
      .filter(col("mad") > 0)
    val rz = lit(0.6745) * (col(valueCol) - col("med")) / col("mad")
    df.join(broadcast(med), groupCol)
      .join(broadcast(mad), groupCol)
      .filter(abs(rz) > z)
      .select(col(idCol), col(groupCol), col(valueCol), r6(rz).as("rz"))
      .orderBy(idCol)
  }

  /** Population-stability-index drift between two populations of
    * `valueCol` per `groupCol`: fixed-width value buckets, +0.5
    * Laplace smoothing against empty cells, PSI = Σ (p_a−p_b)·ln(p_a/p_b)
    * (the standard monitoring statistic; >0.2 conventionally flags a
    * shift). `periodCol` must be 0 (baseline) / 1 (current) —
    * callers bind it from a date cutoff, an experiment arm, or a
    * deployment boundary.
    *
    * Scale + determinism: two map-side-combined aggregates (cells,
    * then per-group totals — the totals table is ≤|groups| rows,
    * broadcast back); the per-bucket PSI terms are deterministic IEEE
    * doubles and their ~|buckets|-term sum runs in DECIMAL(38,12) —
    * order-independent, and 12 places sits far above the
    * shortest-repr-vs-binary double→decimal divergence (the
    * profile cast-width lesson) while far below the 6-dp rounding. */
  def drift(df: DataFrame, groupCol: String, valueCol: String,
      periodCol: String, width: Double): DataFrame = {
    require(width > 0, s"drift width must be positive; got $width")
    val cells = df
      .select(col(groupCol),
        floor(col(valueCol) / lit(width)).cast("bigint").as("__bucket"),
        col(periodCol).as("__period"))
      .groupBy(groupCol, "__bucket")
      .agg(
        sum(when(col("__period") === 0, 1L).otherwise(0L)).as("na"),
        sum(when(col("__period") === 1, 1L).otherwise(0L)).as("nb"))
    val totals = cells.groupBy(groupCol)
      .agg(sum(col("na")).as("ta"), sum(col("nb")).as("tb"),
        count(lit(1)).as("nbuckets"))
    val pa = (col("na").cast("double") + lit(0.5)) /
      (col("ta").cast("double") + lit(0.5) * col("nbuckets"))
    val pb = (col("nb").cast("double") + lit(0.5)) /
      (col("tb").cast("double") + lit(0.5) * col("nbuckets"))
    cells.join(broadcast(totals), groupCol)
      .select(col(groupCol),
        ((pa - pb) * log(pa / pb)).cast(DecimalType(38, 12)).as("__term"))
      .groupBy(groupCol)
      .agg(r6(sum(col("__term")).cast("double")).as("psi"))
      .orderBy(groupCol)
  }

  /** Time-series resampling with gap fill: bucket `tsCol` to a fixed
    * `step` grid per group, materialize EVERY grid point between each
    * group's first and last observation (missing buckets appear with
    * n=0 and is_gap=true), and forward-fill the per-bucket mean from
    * the last observed bucket — the regularization step between raw
    * event feeds and anything that assumes an evenly spaced series
    * (drift monitors, forecasting, joins on aligned clocks).
    *
    * Scale: the dense grid is |groups| × |buckets| rows — generated
    * distributed (per-group `sequence` + explode, never a driver
    * loop) and tiny relative to the raw events it summarizes. The
    * forward fill is one running `last(ignoreNulls)` window
    * PARTITIONED by group (linear, no global window). Bucket means
    * fold in DECIMAL so partial-aggregation order can't perturb the
    * fill values. */
  def resample(df: DataFrame, groupCol: String, tsCol: String,
      valueCol: String, step: String = "1 hour"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bucketed = df
      .groupBy(col(groupCol), window(col(tsCol), step)("start").as("bucket"))
      .agg(count(lit(1)).as("n"),
        (sum(col(valueCol).cast(DecimalType(18, 2))).cast("double") /
          count(lit(1))).as("v"))
    val spine = bucketed.groupBy(groupCol)
      .agg(min(col("bucket")).as("b0"), max(col("bucket")).as("b1"))
      .select(col(groupCol),
        explode(sequence(col("b0"), col("b1"),
          expr(s"INTERVAL $step"))).as("bucket"))
    val w = Window.partitionBy(groupCol).orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(bucketed, Seq(groupCol, "bucket"), "left")
      .select(col(groupCol), col("bucket"),
        coalesce(col("n"), lit(0L)).as("n"),
        col("n").isNull.as("is_gap"),
        r6(last(col("v"), ignoreNulls = true).over(w)).as("v_fill"))
      .orderBy(groupCol, "bucket")
  }

  /** Session path analysis — the sequence-mining face of the event
    * tier next to [[funnel]]'s fixed-stage conversion: sessionize by
    * inactivity gap (gaps-and-islands — identical on any engine,
    * unlike `session_window`'s implementation-defined edge
    * semantics), take each session's first `steps` event types in
    * (ts, id) total order, and count sessions per path — "what do
    * users actually do first?" without pre-declaring the stages.
    *
    * Scale: two user-partitioned windows sharing one (user) shuffle
    * (lag + running sum — the q_window_session shape), one grouped
    * fold per session whose `array_sort(collect_list)` buffers only a
    * SESSION's events (bounded by the gap, never the corpus), and a
    * map-side-combined path count. Top-k via TakeOrdered. */
  def pathTopK(df: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String, gapSeconds: Long = 1800,
      steps: Int = 3, k: Int = 20): DataFrame = {
    require(gapSeconds > 0 && steps > 0 && k > 0,
      "pathTopK needs positive gapSeconds/steps/k")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val sess = df
      .withColumn("__prev", lag(col(tsCol), 1).over(w))
      .withColumn("__new",
        (col("__prev").isNull ||
          col(tsCol).cast("long") - col("__prev").cast("long") >
            gapSeconds).cast("long"))
      .withColumn("__sid", sum(col("__new")).over(w))
    sess.groupBy(col(userCol), col("__sid"))
      .agg(array_join(
        slice(transform(
          array_sort(collect_list(
            struct(col(tsCol), col(idCol), col(typeCol)))),
          x => x.getField(typeCol)), 1, steps), ">").as("path"))
      .groupBy("path")
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(k)
  }

  /** Autocorrelation function per series: Pearson correlation between
    * the `bucketSeconds`-bucketed mean series and its lag-`k`-shifted
    * self for `k = 1..maxLag` — the periodicity/memory diagnostic
    * (a daily cycle shows as an ACF peak at lag 24 on hourly buckets)
    * next to [[resample]]'s gap view and [[ewma]]'s smoothing. Missing
    * buckets simply contribute no pair (the irregular-series
    * convention); groups need ≥3 pairs and positive variance at a lag
    * or that (group, lag) row is dropped — identically on both
    * engines.
    *
    * Determinism: bucket means are one division of a DECIMAL-exact sum
    * by an exact count; the per-lag moment sums round each product
    * into DECIMAL(38,6) before summing (the q_corr stance), so
    * partial-aggregation order cannot perturb the 6-dp result.
    *
    * Scale: the bucket table is |groups|×|buckets| — aggregated
    * map-side from the raw feed, tiny next to it; the lag pairing is
    * maxLag bucket-shifted EQUI-joins of that small table against
    * itself (one `explode(sequence)` fan-out, join keyed on
    * (group, bucket), AQE handles a hot series), and the final
    * aggregate is |groups|×maxLag rows. The raw corpus is scanned
    * once. */
  def acf(df: DataFrame, groupCol: String, tsCol: String,
      valueCol: String, maxLag: Int = 24,
      bucketSeconds: Long = 3600): DataFrame = {
    require(maxLag >= 1 && maxLag <= 4096,
      s"maxLag must be in [1, 4096]; got $maxLag")
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val dec = DecimalType(38, 6)
    val buckets = df.groupBy(col(groupCol).as("g"),
        floor(unix_micros(col(tsCol)) / lit(bucketSeconds * 1000000L))
          .as("b"))
      .agg((sum(col(valueCol).cast(dec)).cast("double") /
        count(lit(1))).as("m"))
    val x = buckets.withColumn("lag",
      explode(sequence(lit(1), lit(maxLag))))
    val y = buckets.select(col("g").as("g2"), col("b").as("b2"),
      col("m").as("m2"))
    val joined = x.join(y,
      col("g") === col("g2") && col("b2") === col("b") + col("lag"))
    val agg = joined.groupBy(col("g"), col("lag"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("m").cast(dec)).cast("double").as("sx"),
        sum(col("m2").cast(dec)).cast("double").as("sy"),
        sum((col("m") * col("m2")).cast(dec)).cast("double").as("sxy"),
        sum((col("m") * col("m")).cast(dec)).cast("double").as("sxx"),
        sum((col("m2") * col("m2")).cast(dec)).cast("double").as("syy"))
    val vx = col("n") * col("sxx") - col("sx") * col("sx")
    val vy = col("n") * col("syy") - col("sy") * col("sy")
    agg.filter(col("n") >= 3 && vx > 0 && vy > 0)
      .select(col("g"), col("lag"), col("n").cast("bigint").as("n"),
        r6((col("n") * col("sxy") - col("sx") * col("sy")) /
          sqrt(vx * vy)).as("acf"))
      .orderBy("g", "lag")
  }

  /** Rolling Pearson correlation between two daily series over a
    * trailing `span`-day window — "are these two metrics still moving
    * together", the relationship MONITOR where [[xcorr]] is the
    * one-shot estimate: a correlation that decays over the window
    * stream is how coupling breakdowns (a broken event pipeline, a
    * cannibalizing feature) actually surface. Exact: windowed
    * DECIMAL sums fold per frame, Pearson closed form per row, NULL
    * until the frame is full or when either side is flat.
    *
    * Scale: corpus → one row per day; every window is a bounded ROWS
    * frame on the date-bounded series under a [[BoundedWindow]] key. */
  def rollingCorr(df: DataFrame, tsCol: String, xCol: String,
      yCol: String, span: Int = 14): DataFrame = {
    require(span >= 3 && span <= 365,
      s"span must be in [3, 365]; got $span")
    import org.apache.spark.sql.expressions.Window
    val dec6 = DecimalType(38, 6)
    val daily = df.groupBy(to_date(col(tsCol)).as("d"))
      .agg((sum(col(xCol).cast(dec6)).cast("double") /
          count(col(xCol)).cast("double")).as("x"),
        (sum(col(yCol).cast(dec6)).cast("double") /
          count(col(yCol)).cast("double")).as("y"))
    val w = Window.partitionBy(BoundedWindow.key(col("d")))
      .orderBy("d").rowsBetween(-(span - 1), Window.currentRow)
    // Pair-complete days only (r15 advice): a day with events on one
    // side but none on the other has a NULL x or y — the sums skip it
    // but a bare count(*) would still include it, silently mixing a
    // larger n with fewer summed points. Every moment is gated on
    // BOTH sides present, and rcorr emits only when the full span is
    // pair-complete; a one-sided day inside the frame yields NULL.
    val both = col("x").isNotNull && col("y").isNotNull
    val xb = when(both, col("x")); val yb = when(both, col("y"))
    val rolled = daily.select(col("d"), col("x"), col("y"),
      count(when(both, lit(1))).over(w).as("__n"),
      sum(xb.cast(dec6)).over(w).cast("double").as("__sx"),
      sum(yb.cast(dec6)).over(w).cast("double").as("__sy"),
      sum((xb * xb).cast(dec6)).over(w).cast("double")
        .as("__sxx"),
      sum((yb * yb).cast(dec6)).over(w).cast("double")
        .as("__syy"),
      sum((xb * yb).cast(dec6)).over(w).cast("double")
        .as("__sxy"))
    val n = col("__n").cast("double")
    val vx = n * col("__sxx") - col("__sx") * col("__sx")
    val vy = n * col("__syy") - col("__sy") * col("__sy")
    val corr = (n * col("__sxy") - col("__sx") * col("__sy")) /
      sqrt(vx * vy)
    rolled.select(col("d"), r6(col("x")).as("x"),
        r6(col("y")).as("y"),
        when(col("__n") === span && vx > 0 && vy > 0, r6(corr))
          .as("rcorr"))
      .orderBy("d")
  }

  /** Sequence predictability: the conditional entropy H(next | prev)
    * of per-user event-type transitions vs the marginal H(next) —
    * how much knowing the previous action actually narrows the next
    * one (info_gain = H_next − H_cond, in bits). The one-number
    * answer to "is user behavior sequence-structured or just a
    * biased coin", read before anyone builds a next-event model over
    * [[transitions]]' raw matrix.
    *
    * Scale: per-user lag over the partitioned stream, ONE (prev,
    * next) hash aggregate (k² cells for k event types), broadcast
    * margins, a 1-row DECIMAL-exact fold. */
  def seqEntropy(df: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec12 = DecimalType(38, 12)
    val w = Window.partitionBy(userCol)
      .orderBy(col(tsCol), col(idCol))
    val pairs = df
      .select(col(typeCol).cast("string").as("next"),
        lag(col(typeCol).cast("string"), 1).over(w).as("prev"))
      .filter(col("prev").isNotNull)
      .groupBy("prev", "next").agg(count(lit(1)).as("c"))
    val prevT = pairs.groupBy("prev").agg(sum("c").as("cp"))
    val nextT = pairs.groupBy("next").agg(sum("c").as("cn"))
    val tot = pairs.agg(sum("c").as("nt"))
    val nD = col("nt").cast("double")
    val hCond = pairs.join(broadcast(prevT), "prev")
      .crossJoin(broadcast(tot))
      .agg(min("nt").as("nt"),
        count(lit(1)).as("n_cells"),
        sum(((col("c").cast("double") / nD) *
          log2(col("c").cast("double") / col("cp").cast("double")))
          .cast(dec12)).cast("double").as("__hc"))
    val hNext = nextT.crossJoin(broadcast(tot))
      .agg(count(lit(1)).as("n_states"),
        sum(((col("cn").cast("double") / nD) *
          log2(col("cn").cast("double") / nD)).cast(dec12))
          .cast("double").as("__hn"))
    hCond.crossJoin(broadcast(hNext))
      .select(col("nt").cast("bigint").as("n_pairs"),
        col("n_states"), col("n_cells"),
        r6(-col("__hn")).as("h_next"),
        r6(-col("__hc")).as("h_cond"),
        r6(-col("__hn") - (-col("__hc"))).as("info_gain"))
  }

  /** Rolling-origin backtest of the three BASELINE forecasters every
    * serious forecast must beat — naive (carry yesterday),
    * seasonal-naive (carry last week's same weekday), drift (naive +
    * the average historical step): one-step-ahead MAE / RMSE / MAPE
    * per method over the daily mean series. The "is the fancy model
    * even better than persistence" gate in front of HoltForecast or
    * anything heavier; published baselines first is forecasting 101.
    *
    * Scale: corpus → one row per day in a map-side aggregate; lags
    * and the expanding first-value ride [[BoundedWindow]]-declared
    * windows on the date-bounded series; one 3-row fold. */
  def forecastBaseline(df: DataFrame, tsCol: String, valCol: String,
      period: Int = 7): DataFrame = {
    require(period >= 2 && period <= 366,
      s"period must be in [2, 366]; got $period")
    val dec6 = DecimalType(38, 6)
    val dec12 = DecimalType(38, 12)
    import org.apache.spark.sql.expressions.Window
    val daily = df.groupBy(to_date(col(tsCol)).as("d"))
      .agg(count(lit(1)).as("__n"),
        sum(col(valCol).cast(dec6)).as("__sv"))
      .select(col("d"),
        (col("__sv").cast("double") / col("__n").cast("double"))
          .as("v"))
    val w = Window.partitionBy(BoundedWindow.key(col("d")))
      .orderBy("d")
    val rn = row_number().over(w)
    val lagged = daily
      .withColumn("__t", rn)
      .withColumn("__l1", lag("v", 1).over(w))
      .withColumn("__lp", lag("v", period).over(w))
      .withColumn("__v1", first("v").over(w))
    // drift forecast at step t: y[t-1] + (y[t-1] - y[1])/(t - 2),
    // defined from t >= 3 (needs two past points to draw the line)
    val drift = col("__l1") + (col("__l1") - col("__v1")) /
      (col("__t").cast("double") - 2)
    val methods = Seq(
      ("naive", col("__l1")),
      ("seasonal_naive", col("__lp")),
      ("drift", when(col("__t") >= 3, drift)))
    val errRows = methods.map { case (name, fc) =>
      val e = col("v") - fc
      // MAPE terms skip days whose actual is exactly 0 (r15 advice:
      // |e|/|v| at v=0 is Infinity, and the ANSI DECIMAL cast then
      // fails the whole query) — NULL-and-exclude with its OWN count
      // (n_mape), stated here and mirrored in the oracle.
      lagged.filter(fc.isNotNull)
        .agg(count(lit(1)).as("n"),
          sum(abs(e).cast(dec12)).cast("double").as("__sae"),
          sum((e * e).cast(dec12)).cast("double").as("__sse"),
          sum(when(col("v") =!= 0, abs(e) / abs(col("v")))
            .cast(dec12)).cast("double").as("__sape"),
          count(when(col("v") =!= 0, lit(1))).as("__nape"))
        .select(lit(name).as("method"), col("n"), col("__sae"),
          col("__sse"), col("__sape"), col("__nape"))
    }.reduce(_ unionByName _)
    val n = col("n").cast("double")
    errRows.select(col("method"), col("n"),
        r6(col("__sae") / n).as("mae"),
        r6(sqrt(col("__sse") / n)).as("rmse"),
        when(col("__nape") > 0,
          r6(col("__sape") / col("__nape").cast("double") * 100))
          .as("mape"))
      .orderBy("method")
  }

  /** Partial autocorrelation (PACF) per group via Durbin–Levinson —
    * the AR-order-selection companion to [[acf]]: an AR(p) series'
    * PACF cuts off after lag p while its ACF decays forever, so PACF
    * is how a forecaster picks p. Autocovariances use the standard
    * full-series-mean estimator c_k = Σ(m_t−x̄)(m_{t+k}−x̄) (consistent
    * across lags — D-L needs one coherent sequence, not per-lag
    * Pearson), computed DISTRIBUTED from the same bucket-mean series
    * and lag join as [[acf]]; only the (group, lag, c_k) table —
    * groups × (maxLag+1) rows, never the series — collects to the
    * driver for the recursion (the olsSolveDriver bounded-driver-work
    * stance; the recursion's value reuse is inherently sequential).
    * Not SQL-expressible (the recursion) → spec-gated, no oracle. */
  def pacf(df: DataFrame, groupCol: String, tsCol: String,
      valueCol: String, maxLag: Int = 12,
      bucketSeconds: Long = 3600): DataFrame = {
    require(maxLag >= 1 && maxLag <= 256,
      s"maxLag must be in [1, 256]; got $maxLag")
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val dec = DecimalType(38, 6)
    val buckets = df.groupBy(col(groupCol).cast("string").as("g"),
        floor(unix_micros(col(tsCol)) / lit(bucketSeconds * 1000000L))
          .as("b"))
      .agg((sum(col(valueCol).cast(dec)).cast("double") /
        count(lit(1))).as("m"))
    val stats = buckets.groupBy("g")
      .agg(count(lit(1)).as("n0"),
        (sum(col("m").cast(dec)).cast("double") / count(lit(1)))
          .as("mu"))
    val x = buckets.withColumn("lag",
      explode(sequence(lit(0), lit(maxLag))))
    val y = buckets.select(col("g").as("g2"), col("b").as("b2"),
      col("m").as("m2"))
    val pairs = x.join(y,
        col("g") === col("g2") && col("b2") === col("b") + col("lag"))
      .groupBy(col("g"), col("lag"))
      .agg(count(lit(1)).cast("double").as("cnt"),
        sum(col("m").cast(dec)).cast("double").as("st"),
        sum(col("m2").cast(dec)).cast("double").as("stk"),
        sum((col("m") * col("m2")).cast(dec)).cast("double")
          .as("scross"))
    val cov = pairs.join(broadcast(stats), "g")
      .select(col("g"), col("lag"),
        (col("scross") - col("mu") * (col("st") + col("stk")) +
          col("cnt") * col("mu") * col("mu")).as("ck"),
        col("n0"))
    // bounded driver table: groups x (maxLag+1) covariances
    val rows = cov.collect()
    val spark = df.sparkSession
    import spark.implicits._
    val out = rows.groupBy(_.getString(0)).toSeq.flatMap {
      case (g, rs) =>
        val byLag = rs.map(r => r.getAs[Number]("lag").intValue() ->
          r.getAs[Double]("ck")).toMap
        val n0 = rs.head.getAs[Long]("n0")
        val kMax = math.min(maxLag, byLag.keys.max)
        if (!byLag.contains(0) || byLag(0) <= 0 || kMax < 1) Nil
        else {
          val rho = (0 to kMax).map(k =>
            byLag.getOrElse(k, 0.0) / byLag(0))
          // Durbin–Levinson: phi(k)(j); pacf(k) = phi(k)(k)
          val phi = Array.ofDim[Double](kMax + 1, kMax + 1)
          val pac = Array.ofDim[Double](kMax + 1)
          phi(1)(1) = rho(1); pac(1) = rho(1)
          for (k <- 2 to kMax) {
            val num = rho(k) -
              (1 until k).map(j => phi(k - 1)(j) * rho(k - j)).sum
            val den = 1.0 -
              (1 until k).map(j => phi(k - 1)(j) * rho(j)).sum
            phi(k)(k) = if (den != 0.0) num / den else Double.NaN
            for (j <- 1 until k)
              phi(k)(j) = phi(k - 1)(j) - phi(k)(k) * phi(k - 1)(k - j)
            pac(k) = phi(k)(k)
          }
          (1 to kMax).map(k => (g, k, n0,
            math.round(pac(k) * 1e6) / 1e6))
        }
    }.sortBy(t => (t._1, t._2))
    out.toDF("g", "lag", "n_buckets", "pacf")
  }

  /** Hampel filter: per-group rolling-median outlier detection AND
    * repair — flag a point when it sits more than `k` robust sigmas
    * (1.4826·MAD, the normal-consistency constant) from the trailing
    * window's median, and emit the cleaned series with flagged points
    * replaced by that median. The standard despiking pass in front of
    * any forecast/trend fit ([[ewma]], [[trend]], HoltForecast): a
    * sensor glitch should not become the trend.
    *
    * Exactness: median and MAD both read middles of the SORTED frame
    * list (mean of the two middles on even frames), so the DuckDB
    * list-indexing oracle agrees bit-for-bit; integer middle indices
    * use floor division on both engines. Scale: same stance as
    * [[rollingMedian]] — one partitioned ROWS window, per-row state
    * ≤ span doubles, the MAD transform is a codegen'd HOF over the
    * already-collected frame, no join. */
  def hampel(df: DataFrame, partCol: String, tsCol: String,
      idCol: String, valueCol: String, span: Int = 20,
      k: Double = 3.0): DataFrame = {
    require(span >= 2 && span <= 4096, s"span must be in [2, 4096]; got $span")
    require(k > 0, s"k must be positive; got $k")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(partCol).orderBy(col(tsCol), col(idCol))
      .rowsBetween(-(span - 1), Window.currentRow)
    def medOf(arr: Column): Column = {
      val n = size(arr)
      val mid = element_at(arr, ((n + lit(1)) / lit(2)).cast("int"))
      val mid2 = element_at(arr, (n / lit(2) + lit(1)).cast("int"))
      when(n % 2 === 1, mid).otherwise((mid + mid2) / lit(2.0))
    }
    val base = df.select(col(idCol), col(partCol), col(tsCol),
        col(valueCol),
        array_sort(collect_list(col(valueCol).cast("double")).over(w))
          .as("__s"))
      .withColumn("__med", medOf(col("__s")))
      .withColumn("__sigma", lit(1.4826) * medOf(array_sort(
        transform(col("__s"), e => abs(e - col("__med"))))))
    val out = col("__sigma") > 0 &&
      abs(col(valueCol).cast("double") - col("__med")) >
        lit(k) * col("__sigma")
    base.select(col(idCol), col(partCol), col(tsCol), col(valueCol),
        r6(col("__med")).as("rmed"),
        r6(col("__sigma")).as("sigma"),
        out.as("is_outlier"),
        r6(when(out, col("__med"))
          .otherwise(col(valueCol).cast("double"))).as("cleaned"))
      .orderBy(idCol)
  }

  /** Classical additive seasonal decomposition of the daily mean
    * series: v = trend + seasonal + remainder, with trend the
    * centered `period`-point moving average (NULL at the edges where
    * the window is partial — stated, not extrapolated), the seasonal
    * index the per-(day mod period) mean of the detrended series
    * re-centered to sum ~0, and the remainder what neither explains.
    * The "is this metric actually degrading or is it just Sunday"
    * readout in front of [[trend]]'s single slope. `period` must be
    * odd (the classical even-period double-MA variant is a different
    * estimator — refuse, don't approximate).
    *
    * Scale: the corpus collapses to ONE row per day in the first
    * map-side aggregate; every window after that runs on the
    * date-bounded series (a [[BoundedWindow]]-declared global window
    * over ≤ one row per calendar day), and the seasonal join is a
    * broadcast of `period` rows. Decimal pre-sums keep the window
    * and group folds partition-order-proof. */
  def seasonalDecompose(df: DataFrame, tsCol: String, valCol: String,
      period: Int = 7): DataFrame = {
    require(period >= 3 && period <= 365 && period % 2 == 1,
      s"period must be odd and in [3, 365]; got $period")
    import org.apache.spark.sql.expressions.Window
    val dec6 = DecimalType(38, 6)
    val dec12 = DecimalType(38, 12)
    val daily = df.groupBy(to_date(col(tsCol)).as("d"))
      .agg(count(lit(1)).as("__n"),
        sum(col(valCol).cast(dec6)).as("__sv"))
      .select(col("d"),
        pmod(datediff(col("d"), to_date(lit("1970-01-05"))),
          lit(period)).as("pidx"),
        (col("__sv").cast("double") / col("__n").cast("double"))
          .as("v"))
    val half = period / 2
    // global ON PURPOSE: one row per calendar day, bounded by the
    // data's date span
    val wMa = Window.partitionBy(BoundedWindow.key(col("d")))
      .orderBy("d").rowsBetween(-half, half)
    val tr = daily
      .withColumn("__cnt", count(lit(1)).over(wMa))
      .withColumn("__sv7",
        sum(col("v").cast(dec12)).over(wMa).cast("double"))
      .withColumn("trend",
        when(col("__cnt") === period, col("__sv7") / lit(period)))
    val si = tr.filter(col("trend").isNotNull)
      .groupBy("pidx")
      .agg((sum((col("v") - col("trend")).cast(dec12)).cast("double")
        / count(lit(1)).cast("double")).as("__s_raw"))
    val ctr = si.agg((sum(col("__s_raw").cast(dec12)).cast("double")
      / count(lit(1)).cast("double")).as("__mean_s"))
    val sea = si.crossJoin(broadcast(ctr))
      .select(col("pidx"),
        (col("__s_raw") - col("__mean_s")).as("__seasonal"))
    tr.join(broadcast(sea), Seq("pidx"), "left")
      .select(col("d"), col("pidx"), r6(col("v")).as("v"),
        r6(col("trend")).as("trend"),
        r6(col("__seasonal")).as("seasonal"),
        r6(col("v") - col("trend") - col("__seasonal"))
          .as("remainder"))
      .orderBy("d")
  }

  /** Per-group rolling median of `valueCol` over a bounded `span`-row
    * trailing window — the ROBUST smoothing twin of [[ewma]] (a single
    * spike moves an EWMA but not the median). Exact: the frame's
    * `collect_list` sorts and reads its middle (mean of the two
    * middles for even frames — `quantile_cont(0.5)` semantics, so the
    * DuckDB window-median oracle agrees bit-for-bit; the only
    * arithmetic is one IEEE add and halve). Same scale stance as ewma:
    * bounded frame, one partitioned ROWS window, per-row state ≤ span
    * doubles, no join. */
  def rollingMedian(df: DataFrame, partCol: String, tsCol: String,
      idCol: String, valueCol: String, span: Int = 20): DataFrame = {
    require(span >= 1 && span <= 4096, s"span must be in [1, 4096]; got $span")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(partCol).orderBy(col(tsCol), col(idCol))
      .rowsBetween(-(span - 1), Window.currentRow)
    val s = col("__s"); val n = size(s)
    val mid = element_at(s, ((n + lit(1)) / lit(2)).cast("int"))
    val mid2 = element_at(s, (n / lit(2) + lit(1)).cast("int"))
    df.select(col(idCol), col(partCol), col(tsCol), col(valueCol),
        array_sort(collect_list(col(valueCol)).over(w)).as("__s"))
      .select(col(idCol), col(partCol), col(tsCol), col(valueCol),
        when(n % 2 === 1, mid)
          .otherwise((mid + mid2) / lit(2.0)).as("rmed"))
      .orderBy(idCol)
  }

  /** Per-group rolling LOWER quantile over the trailing `span`-row
    * window — the tail twin of [[rollingMedian]]: a rolling p95/p99
    * is how latency/SLA series are actually monitored (the mean hides
    * the tail, the median ignores it). Exact: element at
    * ceil(p·frame-size) of the sorted frame (clamped to the frame),
    * the engine's lower-order-statistic convention — integer
    * indexing, so the DuckDB list oracle agrees bit-for-bit. Same
    * scale stance as rollingMedian: bounded frame, one partitioned
    * ROWS window, per-row state ≤ span doubles. */
  def rollingQuantile(df: DataFrame, partCol: String, tsCol: String,
      idCol: String, valueCol: String, p: Double,
      span: Int = 20): DataFrame = {
    require(span >= 1 && span <= 4096, s"span must be in [1, 4096]; got $span")
    require(p > 0.0 && p <= 1.0, s"p must be in (0, 1]; got $p")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(partCol).orderBy(col(tsCol), col(idCol))
      .rowsBetween(-(span - 1), Window.currentRow)
    val s = col("__s"); val n = size(s)
    val idx = greatest(lit(1),
      least(n, ceil(lit(p) * n).cast("int"))).cast("int")
    df.select(col(idCol), col(partCol), col(tsCol), col(valueCol),
        array_sort(collect_list(col(valueCol).cast("double")).over(w))
          .as("__s"))
      .select(col(idCol), col(partCol), col(tsCol), col(valueCol),
        element_at(s, idx).as("rq"))
      .orderBy(idCol)
  }

  /** Per-group least-squares trend over the `bucketSeconds`-bucketed
    * mean series: slope (units per bucket) and intercept (level at
    * the group's FIRST bucket, x=0) of `m ~ a + b·x` where `x` is the
    * bucket index relative to the group's first bucket — the
    * "is this metric drifting?" companion to [[acf]]'s periodicity
    * view. Groups need ≥3 buckets and x-variance > 0. Determinism:
    * the same DECIMAL-moment fold as [[acf]]/q_corr; x is an exact
    * small integer.
    *
    * Scale: identical to [[acf]] minus the lag fan-out — one map-side
    * bucket aggregate, one tiny per-group min-bucket join (broadcast
    * at any realistic group count), one |groups|-row result. */
  def trend(df: DataFrame, groupCol: String, tsCol: String,
      valueCol: String, bucketSeconds: Long = 3600): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val dec = DecimalType(38, 6)
    val buckets = df.groupBy(col(groupCol).as("g"),
        floor(unix_micros(col(tsCol)) / lit(bucketSeconds * 1000000L))
          .as("b"))
      .agg((sum(col(valueCol).cast(dec)).cast("double") /
        count(lit(1))).as("m"))
      .localCheckpoint()
    val b0 = buckets.groupBy(col("g").as("g0"))
      .agg(min(col("b")).as("bmin"))
    val xy = buckets.join(b0, col("g") === col("g0"))
      .select(col("g"), (col("b") - col("bmin")).cast("double").as("x"),
        col("m"))
    val agg = xy.groupBy("g")
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("x").cast(dec)).cast("double").as("sx"),
        sum(col("m").cast(dec)).cast("double").as("sy"),
        sum((col("x") * col("m")).cast(dec)).cast("double").as("sxy"),
        sum((col("x") * col("x")).cast(dec)).cast("double").as("sxx"))
    val vx = col("n") * col("sxx") - col("sx") * col("sx")
    agg.filter(col("n") >= 3 && vx > 0)
      .select(col("g"), col("n").cast("bigint").as("n"),
        r6((col("n") * col("sxy") - col("sx") * col("sy")) / vx)
          .as("slope"),
        r6((col("sy") - (col("n") * col("sxy") - col("sx") * col("sy"))
          / vx * col("sx")) / col("n")).as("intercept"))
      .orderBy("g")
  }

  /** Per-user session intervals by gaps-and-islands (`gapSeconds`
    * inactivity closes a session): `(user, sid, st, en)` with CLOSED
    * bounds at the first/last event. The same engine-identical
    * sessionization [[pathTopK]] uses (session_window's edge semantics
    * differ between engines); both windows share one user-keyed
    * shuffle, and the gap test runs on exact `unix_micros` longs. */
  def sessionIntervals(df: DataFrame, userCol: String, tsCol: String,
      idCol: String, gapSeconds: Long = 1800): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be positive; got $gapSeconds")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    df.withColumn("__prev", lag(col(tsCol), 1).over(w))
      .withColumn("__new",
        (col("__prev").isNull ||
          unix_micros(col(tsCol)) - unix_micros(col("__prev")) >
            gapSeconds * 1000000L).cast("long"))
      .withColumn("__sid", sum(col("__new")).over(w))
      .groupBy(col(userCol), col("__sid").as("sid"))
      .agg(min(col(tsCol)).as("st"), max(col(tsCol)).as("en"))
  }

  /** Per-group exponentially weighted moving average of `valueCol` in
    * `(tsCol, idCol)` order — the de-noised "current level" signal a
    * metrics pipeline smooths every series with. Normalized (bias-
    * corrected) form over a BOUNDED trailing window of `span` rows:
    * `ewma_t = Σ_{k<span} (1-α)^k·x_{t-k} / Σ_{k<span} (1-α)^k` — the
    * truncated tail carries < (1-α)^span ≈ 0.08% of the mass at the
    * defaults, and the bound is what keeps the operator scalable: the
    * window never grows with history, so no per-row state exceeds
    * `span` doubles and the frame is a plain partitioned ROWS window
    * (no global window, no driver state). The weighted fold runs over
    * the frame's `collect_list` with `transform`+`aggregate` HOFs in
    * list order on both engines, so the float summation order — and
    * therefore the 6-dp rounding — is engine-identical. */
  def ewma(df: DataFrame, partCol: String, tsCol: String, idCol: String,
      valueCol: String, alpha: Double = 0.3, span: Int = 20): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0,
      s"alpha must be in (0, 1); got $alpha")
    require(span >= 1 && span <= 4096, s"span must be in [1, 4096]; got $span")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(partCol).orderBy(col(tsCol), col(idCol))
      .rowsBetween(-(span - 1), Window.currentRow)
    val decay = lit(1.0 - alpha)
    def wsum(weighted: Column => Column): Column =
      aggregate(
        transform(col("__w"), (x, i) =>
          weighted(x) * pow(decay, (size(col("__w")) - 1 - i).cast("double"))),
        lit(0.0), (acc, x) => acc + x)
    df.select(col(idCol), col(partCol), col(tsCol), col(valueCol),
        collect_list(col(valueCol)).over(w).as("__w"))
      .select(col(idCol), col(partCol), col(tsCol), col(valueCol),
        r6(wsum(x => x) / wsum(_ => lit(1.0))).as("ewma"))
      .orderBy(idCol)
  }

  /** Gaps-and-islands: collapse each user's distinct activity days
    * into maximal runs of CONSECUTIVE days (islands) — the classic
    * streak/coverage shape ("how long do users stay active without a
    * break", "which date ranges have telemetry"). The island key is
    * the textbook `day − row_number()` trick: constant within a
    * consecutive run, strictly decreasing across a gap.
    *
    * Scale: the distinct-day projection is a map-side-combined
    * dedup on `(user, day)` (days per user are bounded by the
    * calendar, not the event volume); the window and the island
    * aggregate are both PARTITIONED BY user — per-key state only,
    * no global window. */
  def gapsIslands(df: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val days = df
      .select(col(userCol), to_date(col(tsCol)).as("day"))
      .distinct()
    val w = Window.partitionBy(userCol).orderBy("day")
    days
      .withColumn("__grp", date_sub(col("day"), row_number().over(w)))
      .groupBy(col(userCol), col("__grp"))
      .agg(min("day").as("start_day"), max("day").as("end_day"),
        count(lit(1)).as("n_days"))
      .drop("__grp")
      .orderBy(userCol, "start_day")
  }

  /** First-order Markov transition matrix over per-user event
    * sequences: for each ordered pair of consecutive events (by
    * `(ts, tie)` within a user) count `src → dst` and normalize to
    * P(dst | src) — the session-flow model behind "what do users do
    * after a click". `tieCol` makes the per-user order total, so both
    * engines pair identical neighbors.
    *
    * Scale: ONE user-partitioned lag window (per-key state), then a
    * hash aggregate whose key space is |types|² — the probability
    * normalization windows over that tiny pair table, partitioned by
    * `src`. Nothing global, nothing corpus-proportional after the
    * first aggregate. */
  def transitions(df: DataFrame, userCol: String, typeCol: String,
      tsCol: String, tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieCol))
    val pairs = df
      .withColumn("__next", lead(col(typeCol), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col(typeCol).as("src"), col("__next").as("dst"))
      .agg(count(lit(1)).as("n"))
    pairs
      .withColumn("p", r6(col("n").cast("double") /
        sum("n").over(Window.partitionBy("src"))))
      .orderBy("src", "dst")
  }

  /** First/last-touch conversion attribution: each `convType` event
    * credits the user's FIRST and LAST preceding non-conversion
    * event type (the marketing "which channel opened the journey /
    * which closed it" readout); conversions with no preceding touch
    * are unattributable and drop. One user-partitioned window pass
    * computes both carries (`ignoreNulls` first/last over the
    * preceding frame); the two credit kinds then unpivot map-side
    * into a single |channels|-row aggregate — no second scan, no
    * join. */
  def attribution(df: DataFrame, userCol: String, typeCol: String,
      tsCol: String, tieCol: String, convType: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col(typeCol) =!= convType, col(typeCol))
    df
      .withColumn("__ft", first(touch, ignoreNulls = true).over(w))
      .withColumn("__lt", last(touch, ignoreNulls = true).over(w))
      .filter(col(typeCol) === convType && col("__lt").isNotNull)
      .select(explode(array(
        struct(lit("first").as("kind"), col("__ft").as("channel")),
        struct(lit("last").as("kind"), col("__lt").as("channel"))))
        .as("t"))
      .groupBy(col("t.channel").as("channel"))
      .agg(
        sum(when(col("t.kind") === "first", 1L).otherwise(0L))
          .as("first_touch"),
        sum(when(col("t.kind") === "last", 1L).otherwise(0L))
          .as("last_touch"))
      .orderBy("channel")
  }

  /** Inactivity-gap sessionization (batch): split each user's
    * (ts, tie)-ordered events into sessions wherever the gap to the
    * previous event exceeds `gapMinutes`, and roll each session up to
    * (start, end, n_events, duration_s). The batch twin of the
    * streaming session window (q_window_session) — same semantics,
    * replayable over history. Both windows are user-partitioned
    * (lag + running gap count — per-key state only); the rollup is a
    * keyed hash aggregate. Gap comparison runs on integer epoch
    * seconds, engine-exact. */
  def sessionize(df: DataFrame, userCol: String, tsCol: String,
      tieCol: String, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieCol))
    def micros(c: Column) = unix_micros(c)
    val prev = lag(col(tsCol), 1).over(w)
    // integer MICROsecond arithmetic on both engines — second-level
    // casts truncate vs round differently across engines on
    // sub-second timestamps
    val isNew = when(prev.isNull ||
      micros(col(tsCol)) - micros(prev) >
        gapMinutes * 60L * 1000000L, 1L).otherwise(0L)
    df
      .withColumn("__new", isNew)
      .withColumn("session_idx", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("session_idx"))
      .agg(
        min(col(tsCol)).as("start_ts"),
        max(col(tsCol)).as("end_ts"),
        count(lit(1)).as("n_events"),
        floor((micros(max(col(tsCol))) - micros(min(col(tsCol))))
          / lit(1000000.0)).cast("long").as("duration_s"))
      .orderBy(userCol, "session_idx")
  }

  /** Single-changepoint detection per group: the hour at which the
    * series' level most plausibly shifts, via the classic CUSUM
    * deviation statistic `D_t = |S_t − t·S_n/n|` maximized over all
    * prefix lengths t < n (S_t = prefix event-count sum over the
    * group's hourly buckets). The comparison runs on the INTEGER
    * rescaling `n·S_t − t·S_n` — exact on both engines, so the argmax
    * (earliest hour on ties) is engine-identical; only the final
    * readouts (stat = D/n, the two segment means) divide.
    *
    * Scale: the corpus folds to ≤ |groups|·|hours| rows in one
    * map-side-combined hash aggregate before any window; the prefix
    * window and the argmax fold are group-partitioned (the argmax is
    * a `max(struct(...))` aggregate — no second shuffle, the window's
    * hash partitioning satisfies it). */
  def changepoint(df: DataFrame, groupCol: String,
      tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourly = df
      .groupBy(col(groupCol), date_trunc("hour", col(tsCol)).as("hr"))
      .agg(count(lit(1)).as("c"))
    val totals = hourly.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s"))
    val w = Window.partitionBy(groupCol).orderBy("hr")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = hourly
      .join(broadcast(totals), groupCol :: Nil)
      .withColumn("i", count(lit(1)).over(w))
      .withColumn("st", sum(col("c")).over(w))
      .filter(col("i") < col("n"))
      .withColumn("dd", abs(col("n") * col("st") - col("i") * col("s")))
    // argmax via lexicographic struct max: highest dd, earliest hour
    // on ties (-i ascending == i descending under max). Integer-exact.
    scored
      .groupBy(col(groupCol))
      .agg(max(struct(col("dd"), (-col("i")).as("ni"), col("hr"),
        col("st"), col("n"), col("s"))).as("m"))
      .select(col(groupCol),
        col("m.hr").as("cp_hour"),
        r6(col("m.dd").cast("double") / col("m.n")).as("stat"),
        r6(col("m.st").cast("double") / (-col("m.ni")))
          .as("mean_before"),
        r6((col("m.s") - col("m.st")).cast("double") /
          (col("m.n") + col("m.ni"))).as("mean_after"))
      .orderBy(groupCol)
  }

  /** Hour-of-day seasonal profile per group: event count per (group,
    * hour-of-day), the share of the group's total, and the seasonal
    * index `share · 24` (1.0 = perfectly flat; 2.0 = that hour runs
    * double the average load) — the capacity-planning/monitoring twin
    * of [[changepoint]]. Counts are exact; the two readouts divide
    * with the identical IEEE op sequence in the oracle.
    *
    * Scale: the corpus folds to ≤ |groups|·24 rows in one map-side-
    * combined aggregate; group totals re-aggregate that table and
    * broadcast back. */
  def seasonality(df: DataFrame, groupCol: String,
      tsCol: String): DataFrame = {
    val byHod = df
      .groupBy(col(groupCol), hour(col(tsCol)).as("hod"))
      .agg(count(lit(1)).as("n"))
    val tot = byHod.groupBy(col(groupCol)).agg(sum("n").as("total"))
    byHod.join(broadcast(tot), groupCol)
      .select(col(groupCol), col("hod"), col("n"),
        r6(col("n").cast("double") / col("total")).as("share"),
        r6(col("n").cast("double") * lit(24.0) / col("total"))
          .as("idx"))
      .orderBy(groupCol, "hod")
  }

  /** Point-in-time trailing-window features at each label event: for
    * every `labelValue` row, the count of the user's events in the
    * trailing 1-day and 7-day windows and the 7-day value sum — with
    * the label instant itself EXCLUDED (frame ends 1 µs before the
    * current row's event time), the leakage rule every training-data
    * pipeline must enforce. RANGE frames on integer epoch-micros make
    * tie handling (same-microsecond events) identical across engines;
    * the value sum folds in DECIMAL(38,6).
    *
    * Scale: one shuffle on the user key serves all three frames (one
    * Window node); state per partition is the 7-day row span of one
    * user, never the corpus. */
  def trailingFeatures(df: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String, valCol: String,
      labelValue: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = DecimalType(38, 6)
    // materialize the ordering key ONCE: each frame then orders by the
    // same attribute, so the three Window nodes share one exchange and
    // one physical sort (per-expression aliases would re-sort between
    // nodes)
    def trail(days: Int) = Window.partitionBy(userCol)
      .orderBy(col("__us"))
      .rangeBetween(-days * 86400000000L, -1L)
    df
      .withColumn("__us", unix_micros(col(tsCol)))
      .withColumn("n_1d", count(lit(1)).over(trail(1)))
      .withColumn("n_7d", count(lit(1)).over(trail(7)))
      .withColumn("v_7d", coalesce(
        sum(col(valCol).cast(dec)).over(trail(7)), lit(0).cast(dec)))
      .filter(col(typeCol) === labelValue)
      // DECIMAL(38,6)-exact fold, DOUBLE render (§7.6): both engines
      // cast the identical 6-dp decimal, so the doubles agree.
      .select(col(idCol), col(userCol), col(tsCol),
        col("n_1d"), col("n_7d"), col("v_7d").cast("double").as("v_7d"))
      .orderBy(idCol)
  }

  val all: Seq[Query] = Seq(
    Query(
      "q_anomaly",
      Some("""WITH s AS (
                SELECT event_type, CAST(count(*) AS DOUBLE) n,
                       CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) s1,
                       CAST(sum(CAST(value*value AS DECIMAL(38,6)))
                         AS DOUBLE) s2
                FROM events GROUP BY 1)
              SELECT event_id, event_type, value,
                     round((value - s1/n)
                           / sqrt((s2 - s1*s1/n)/(n-1))
                           * 1000000.0)/1000000.0 AS z
              FROM events JOIN s USING (event_type)
              WHERE abs((value - s1/n) / sqrt((s2 - s1*s1/n)/(n-1))) > 3.0
              ORDER BY event_id"""),
      (s, d) => anomaly(Tables.events(s, d),
        "event_type", "event_id", "value")),
    // The robust twin on the same feed: median/MAD scoring flags 392
    // rows where σ-scoring flags 188 — the long right tail inflates σ
    // and hides moderate outliers, exactly the contamination effect
    // the modified z-score exists to resist.
    Query(
      "q_anomaly_mad",
      Some("""WITH m AS (
                SELECT event_type, quantile_cont(value, 0.5) AS med
                FROM events GROUP BY 1),
              a AS (
                SELECT * FROM (
                  SELECT e.event_type,
                         quantile_cont(abs(e.value - m.med), 0.5) AS mad
                  FROM events e JOIN m USING (event_type) GROUP BY 1)
                WHERE mad > 0)
              SELECT event_id, e.event_type, value,
                     round(0.6745 * (value - med) / mad
                       * 1000000.0)/1000000.0 AS rz
              FROM events e JOIN m USING (event_type)
                JOIN a USING (event_type)
              WHERE abs(0.6745 * (value - med) / mad) > 3.5
              ORDER BY event_id"""),
      (s, d) => anomalyMad(Tables.events(s, d),
        "event_type", "event_id", "value")),
    Query(
      "q_retention",
      Some("""WITH f AS (
                SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
                FROM events GROUP BY 1),
              a AS (
                SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
                FROM events)
              SELECT cohort_day, CAST(day - cohort_day AS BIGINT)
                       AS day_offset,
                     count(*) AS users
              FROM a JOIN f USING (user_id)
              GROUP BY 1, 2 ORDER BY cohort_day, day_offset"""),
      (s, d) => retention(Tables.events(s, d), "user_id", "ts")),
    Query(
      "q_event_funnel",
      Some("""WITH m AS (
                SELECT user_id,
                       min(CASE WHEN event_type = 'view' THEN ts END) AS t1,
                       min(CASE WHEN event_type = 'click' THEN ts END) AS t2,
                       min(CASE WHEN event_type = 'purchase' THEN ts END)
                         AS t3
                FROM events GROUP BY 1)
              SELECT CAST(1 AS INT) AS stage_idx, 'view' AS stage,
                     count(*) AS users
              FROM m WHERE t1 IS NOT NULL
              UNION ALL
              SELECT CAST(2 AS INT), 'view_click', count(*)
              FROM m WHERE t1 IS NOT NULL AND t2 > t1
              UNION ALL
              SELECT CAST(3 AS INT), 'view_click_purchase', count(*)
              FROM m WHERE t1 IS NOT NULL AND t2 > t1 AND t3 > t2
              ORDER BY stage_idx"""),
      (s, d) => funnel(Tables.events(s, d), "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))),
    // Distribution drift per event type between the corpus's first and
    // second halves (cutoff at the span midpoint) — the monitoring
    // query a pipeline runs between ingest snapshots. The fixture's
    // synthetic generator is stationary, so all five PSIs sit near 0
    // (< 0.011) — and the oracle hash pins every 6-dp digit of them.
    Query(
      "q_drift",
      Some("""WITH b AS (
                SELECT event_type,
                       CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
                         THEN 0 ELSE 1 END AS period,
                       CAST(floor(value / CAST(50.0 AS DOUBLE))
                         AS BIGINT) AS bucket
                FROM events),
              c AS (
                SELECT event_type, bucket,
                       sum(CASE WHEN period = 0 THEN 1 ELSE 0 END) AS na,
                       sum(CASE WHEN period = 1 THEN 1 ELSE 0 END) AS nb
                FROM b GROUP BY 1, 2),
              t AS (
                SELECT event_type, sum(na) AS ta, sum(nb) AS tb,
                       count(*) AS nbuckets
                FROM c GROUP BY 1),
              p AS (
                SELECT c.event_type,
                       (CAST(na AS DOUBLE) + 0.5)
                         / (CAST(ta AS DOUBLE) + 0.5 * nbuckets) AS pa,
                       (CAST(nb AS DOUBLE) + 0.5)
                         / (CAST(tb AS DOUBLE) + 0.5 * nbuckets) AS pb
                FROM c JOIN t ON c.event_type = t.event_type)
              SELECT event_type,
                     round(CAST(sum(CAST((pa - pb) * ln(pa / pb)
                         AS DECIMAL(38,12))) AS DOUBLE)
                       * 1000000.0) / 1000000.0 AS psi
              FROM p GROUP BY 1 ORDER BY event_type"""),
      (s, d) =>
        drift(
          Tables.events(s, d).withColumn("period",
            when(col("ts") < lit("2024-01-16 00:00:00").cast("timestamp"),
              0).otherwise(1)),
          "event_type", "value", "period", 50.0)),
    // Gap-filled hourly resample per event type: every hour between a
    // type's first and last event, observed hours carrying their
    // DECIMAL-exact mean, missing hours flagged and forward-filled.
    // time_bucket ≡ window().start for hour-divisible steps (the
    // q_window_tumbling pin); generate_series and sequence() are both
    // end-inclusive.
    Query(
      "q_resample",
      Some("""WITH hourly AS (
                SELECT event_type,
                       time_bucket(INTERVAL 1 HOUR, ts) AS bucket,
                       count(*) AS n,
                       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                         / count(*) AS v
                FROM events GROUP BY 1, 2),
              spine AS (
                SELECT event_type,
                       unnest(generate_series(min(bucket), max(bucket),
                         INTERVAL 1 HOUR)) AS bucket
                FROM hourly GROUP BY event_type)
              SELECT s.event_type, s.bucket,
                     COALESCE(h.n, 0) AS n,
                     h.n IS NULL AS is_gap,
                     round(last_value(h.v IGNORE NULLS) OVER (
                         PARTITION BY s.event_type ORDER BY s.bucket
                         ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) * 1000000.0) / 1000000.0
                       AS v_fill
              FROM spine s LEFT JOIN hourly h
                ON s.event_type = h.event_type AND s.bucket = h.bucket
              ORDER BY s.event_type, s.bucket"""),
      (s, d) => resample(Tables.events(s, d),
        "event_type", "ts", "value", "1 hour")),
    // Top session paths: 30-minute-gap sessions, first 3 event types
    // per session in (ts, event_id) total order, top-20 paths. The
    // oracle builds the identical gaps-and-islands sessions and
    // ordered list slice.
    Query(
      "q_path_topk",
      Some("""WITH s AS (
                SELECT user_id, ts, event_id, event_type,
                       lag(ts) OVER (PARTITION BY user_id
                         ORDER BY ts, event_id) AS prev
                FROM events),
              g AS (
                SELECT user_id, ts, event_id, event_type,
                       sum(CASE WHEN prev IS NULL
                                OR epoch(ts) - epoch(prev) > 1800
                             THEN 1 ELSE 0 END)
                         OVER (PARTITION BY user_id
                               ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid
                FROM s),
              p AS (
                SELECT user_id, sid,
                       array_to_string(
                         list_slice(
                           list(event_type ORDER BY ts, event_id),
                           1, 3), '>') AS path
                FROM g GROUP BY user_id, sid)
              SELECT path, count(*) AS n_sessions
              FROM p GROUP BY path
              ORDER BY n_sessions DESC, path LIMIT 20"""),
      (s, d) => pathTopK(Tables.events(s, d),
        "user_id", "ts", "event_id", "event_type")),

    // Per-user EWMA of event values (α=0.3, 20-row trailing window):
    // the smoothed-level twin of q_window_frame's plain moving
    // average. DuckDB's indexed list lambdas are 1-based (len(w)-i)
    // vs Spark's 0-based (size-1-i) — the weight series is identical.
    Query(
      "q_ewma",
      Some("""WITH s AS (
                SELECT event_id, user_id, ts, value,
                       list(value) OVER (
                         PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS w
                FROM events)
              SELECT event_id, user_id, ts, value,
                     round(
                       list_sum(list_transform(w,
                         (x, i) -> x * power(0.7, len(w) - i))) /
                       list_sum(list_transform(w,
                         (x, i) -> power(0.7, len(w) - i)))
                       * 1000000.0) / 1000000.0 AS ewma
              FROM s ORDER BY event_id"""),
      (s, d) => ewma(Tables.events(s, d),
        "user_id", "ts", "event_id", "value")),

    // Concurrent-session analysis: which user pairs are active at the
    // same time, by total overlap. The overlap join runs BUCKETED
    // (JoinOps.intervalJoin: hour-bucket equi-join + first-shared-
    // bucket uniqueness + exact residual) — the oracle states the
    // textbook range predicate, so the hash gate pins the bucketed
    // rewrite against the naive spelling Spark could never scale.
    Query(
      "q_interval_join",
      Some("""WITH g AS (
                SELECT user_id, ts, event_id,
                       CASE WHEN lag(ts) OVER w IS NULL
                            OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                               > 1800000000 THEN 1 ELSE 0 END AS brk
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
              s AS (
                SELECT user_id, ts,
                       sum(brk) OVER (PARTITION BY user_id
                         ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) AS sid
                FROM g),
              iv AS (
                SELECT user_id, sid, min(ts) AS st, max(ts) AS en
                FROM s GROUP BY 1, 2)
              SELECT a.user_id AS user_a, b.user_id AS user_b,
                     count(*) AS n_overlaps,
                     CAST(sum(least(epoch_us(a.en), epoch_us(b.en))
                              - greatest(epoch_us(a.st), epoch_us(b.st)))
                          AS BIGINT) AS overlap_us
              FROM iv a JOIN iv b
                ON a.user_id < b.user_id
               AND epoch_us(a.st) <= epoch_us(b.en)
               AND epoch_us(b.st) <= epoch_us(a.en)
              GROUP BY 1, 2
              ORDER BY overlap_us DESC, user_a, user_b LIMIT 100"""),
      (s, d) => {
        val iv = sessionIntervals(Tables.events(s, d),
          "user_id", "ts", "event_id")
        val a = iv.select(col("user_id").as("user_a"),
          col("st").as("st_a"), col("en").as("en_a"))
        val b = iv.select(col("user_id").as("user_b"),
          col("st").as("st_b"), col("en").as("en_b"))
        JoinOps.intervalJoin(a, b, "st_a", "en_a", "st_b", "en_b",
            bucketSeconds = 3600,
            residual = col("user_a") < col("user_b"))
          .groupBy("user_a", "user_b")
          .agg(count(lit(1)).as("n_overlaps"),
            sum(least(unix_micros(col("en_a")), unix_micros(col("en_b")))
              - greatest(unix_micros(col("st_a")),
                unix_micros(col("st_b")))).as("overlap_us"))
          .orderBy(col("overlap_us").desc, col("user_a"), col("user_b"))
          .limit(100)
      }),

    // Hourly-bucket autocorrelogram per event type, lags 1..24: the
    // periodicity diagnostic (a daily cycle peaks at lag 24). Both
    // engines share the DECIMAL-moment corr fold and the same
    // degenerate-lag exclusions.
    Query(
      "q_acf",
      Some("""WITH bk AS (
                SELECT event_type AS g,
                       CAST(floor(epoch_us(ts) / 3600000000.0) AS BIGINT)
                         AS b,
                       CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
                         / count(*) AS m
                FROM events GROUP BY 1, 2),
              pr AS (
                SELECT x.g, l.lag, x.m AS mx, y.m AS my
                FROM bk x
                CROSS JOIN (SELECT unnest(generate_series(1, 24)) AS lag) l
                JOIN bk y ON y.g = x.g AND y.b = x.b + l.lag),
              ag AS (
                SELECT g, lag, CAST(count(*) AS DOUBLE) n,
                  CAST(sum(CAST(mx AS DECIMAL(38,6))) AS DOUBLE) sx,
                  CAST(sum(CAST(my AS DECIMAL(38,6))) AS DOUBLE) sy,
                  CAST(sum(CAST(mx*my AS DECIMAL(38,6))) AS DOUBLE) sxy,
                  CAST(sum(CAST(mx*mx AS DECIMAL(38,6))) AS DOUBLE) sxx,
                  CAST(sum(CAST(my*my AS DECIMAL(38,6))) AS DOUBLE) syy
                FROM pr GROUP BY 1, 2)
              SELECT g AS event_type, lag, CAST(n AS BIGINT) AS n,
                     round((n*sxy - sx*sy)
                           / sqrt((n*sxx - sx*sx)*(n*syy - sy*sy))
                           * 1000000.0)/1000000.0 AS acf
              FROM ag
              WHERE n >= 3 AND (n*sxx - sx*sx) > 0
                AND (n*syy - sy*sy) > 0
              ORDER BY event_type, lag"""),
      (s, d) => acf(Tables.events(s, d), "event_type", "ts", "value")
        .withColumnRenamed("g", "event_type")),

    // Robust smoothing twin of q_ewma on the same feed: the rolling
    // window median via sorted frame list, quantile_cont(0.5)
    // semantics on both engines.
    Query(
      "q_rolling_median",
      Some("""SELECT event_id, user_id, ts, value,
                     quantile_cont(value, 0.5) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
                       AS rmed
              FROM events ORDER BY event_id"""),
      (s, d) => rollingMedian(Tables.events(s, d),
        "user_id", "ts", "event_id", "value")),

    // Which AR order fits each event type's hourly series — PACF via
    // Durbin-Levinson; the recursion is not SQL-expressible, so the
    // gate is PacfSpec's brute-force D-L equality (no oracle).
    Query(
      "q_pacf",
      None,
      (s, d) => pacf(Tables.events(s, d), "event_type", "ts",
        "value", 8)),

    // Are clicks and purchases still moving together day to day —
    // the trailing-window correlation monitor.
    Query(
      "q_rolling_corr",
      Some("""WITH s AS (
                SELECT ts,
                       CASE WHEN event_type = 'click'
                         THEN value END AS xv,
                       CASE WHEN event_type = 'purchase'
                         THEN value END AS yv
                FROM events),
              daily AS (SELECT CAST(date_trunc('day', ts) AS DATE)
                          AS d,
                        CAST(sum(CAST(xv AS DECIMAL(38,6)))
                            AS DOUBLE)
                          / CAST(count(xv) AS DOUBLE) AS x,
                        CAST(sum(CAST(yv AS DECIMAL(38,6)))
                            AS DOUBLE)
                          / CAST(count(yv) AS DOUBLE) AS y
                        FROM s GROUP BY 1),
              db AS (SELECT d, x, y,
                       CASE WHEN x IS NOT NULL AND y IS NOT NULL
                         THEN x END AS xb,
                       CASE WHEN x IS NOT NULL AND y IS NOT NULL
                         THEN y END AS yb
                     FROM daily),
              r AS (SELECT d, x, y,
                      count(xb) OVER w AS n,
                      CAST(sum(CAST(xb AS DECIMAL(38,6))) OVER w
                        AS DOUBLE) AS sx,
                      CAST(sum(CAST(yb AS DECIMAL(38,6))) OVER w
                        AS DOUBLE) AS sy,
                      CAST(sum(CAST(xb * xb AS DECIMAL(38,6))) OVER w
                        AS DOUBLE) AS sxx,
                      CAST(sum(CAST(yb * yb AS DECIMAL(38,6))) OVER w
                        AS DOUBLE) AS syy,
                      CAST(sum(CAST(xb * yb AS DECIMAL(38,6))) OVER w
                        AS DOUBLE) AS sxy
                    FROM db WINDOW w AS (ORDER BY d
                      ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
              SELECT d, round(x * 1000000.0)/1000000.0 AS x,
                     round(y * 1000000.0)/1000000.0 AS y,
                     round(CASE WHEN n = 14
                         AND CAST(n AS DOUBLE) * sxx - sx * sx > 0
                         AND CAST(n AS DOUBLE) * syy - sy * sy > 0
                       THEN (CAST(n AS DOUBLE) * sxy - sx * sy)
                         / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
                           * (CAST(n AS DOUBLE) * syy - sy * sy))
                       END * 1000000.0)/1000000.0 AS rcorr
              FROM r ORDER BY d"""),
      (s, d) => rollingCorr(Tables.events(s, d)
          .select(col("ts"),
            when(col("event_type") === "click", col("value"))
              .as("xv"),
            when(col("event_type") === "purchase", col("value"))
              .as("yv")),
        "ts", "xv", "yv")),

    // Is user behavior sequence-structured or a biased coin — the
    // conditional-vs-marginal entropy of event-type transitions.
    Query(
      "q_seq_entropy",
      Some("""WITH s AS (
                SELECT CAST(event_type AS VARCHAR) AS next,
                       lag(CAST(event_type AS VARCHAR), 1) OVER (
                         PARTITION BY user_id
                         ORDER BY ts, event_id) AS prev
                FROM events),
              p AS (SELECT prev, next, count(*) AS c FROM s
                    WHERE prev IS NOT NULL GROUP BY 1, 2),
              pt AS (SELECT prev, sum(c) AS cp FROM p GROUP BY 1),
              nt2 AS (SELECT next, sum(c) AS cn FROM p GROUP BY 1),
              t AS (SELECT sum(c) AS nt FROM p),
              hc AS (SELECT min(nt) AS nt, count(*) AS n_cells,
                       CAST(sum(CAST(
                         (CAST(c AS DOUBLE) / CAST(nt AS DOUBLE))
                         * log2(CAST(c AS DOUBLE)
                             / CAST(cp AS DOUBLE))
                         AS DECIMAL(38,12))) AS DOUBLE) AS hcv
                     FROM p JOIN pt USING (prev) CROSS JOIN t),
              hn AS (SELECT count(*) AS n_states,
                       CAST(sum(CAST(
                         (CAST(cn AS DOUBLE) / CAST(nt AS DOUBLE))
                         * log2(CAST(cn AS DOUBLE)
                             / CAST(nt AS DOUBLE))
                         AS DECIMAL(38,12))) AS DOUBLE) AS hnv
                     FROM nt2 CROSS JOIN t)
              SELECT CAST(nt AS BIGINT) AS n_pairs,
                     CAST(n_states AS BIGINT) AS n_states,
                     CAST(n_cells AS BIGINT) AS n_cells,
                     round(-hnv * 1000000.0)/1000000.0 AS h_next,
                     round(-hcv * 1000000.0)/1000000.0 AS h_cond,
                     round((-hnv - (-hcv)) * 1000000.0)/1000000.0
                       AS info_gain
              FROM hc CROSS JOIN hn"""),
      (s, d) => seqEntropy(Tables.events(s, d), "user_id", "ts",
        "event_id", "event_type")),

    // Can anything beat persistence on the daily series — one-step
    // backtest of the naive / seasonal-naive / drift baselines.
    Query(
      "q_forecast_baseline",
      Some("""WITH daily AS (
                SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
                       count(*) AS n,
                       sum(CAST(value AS DECIMAL(38,6))) AS sv
                FROM events GROUP BY 1),
              ser AS (SELECT d,
                        CAST(sv AS DOUBLE) / CAST(n AS DOUBLE) AS v
                      FROM daily),
              lg AS (SELECT d, v,
                       row_number() OVER w AS t,
                       lag(v, 1) OVER w AS l1,
                       lag(v, 7) OVER w AS lp,
                       first_value(v) OVER w AS v1
                     FROM ser WINDOW w AS (ORDER BY d)),
              fc AS (SELECT v, l1 AS f_naive, lp AS f_snaive,
                       CASE WHEN t >= 3 THEN l1 + (l1 - v1)
                         / (CAST(t AS DOUBLE) - 2) END AS f_drift
                     FROM lg),
              e1 AS (SELECT 'naive' AS method, count(*) AS n,
                       CAST(sum(CAST(abs(v - f_naive)
                         AS DECIMAL(38,12))) AS DOUBLE) AS sae,
                       CAST(sum(CAST((v - f_naive) * (v - f_naive)
                         AS DECIMAL(38,12))) AS DOUBLE) AS sse,
                       CAST(sum(CAST(CASE WHEN v <> 0
                           THEN abs(v - f_naive) / abs(v) END
                         AS DECIMAL(38,12))) AS DOUBLE) AS sape,
                       count(CASE WHEN v <> 0 THEN 1 END) AS nape
                     FROM fc WHERE f_naive IS NOT NULL),
              e2 AS (SELECT 'seasonal_naive' AS method, count(*) AS n,
                       CAST(sum(CAST(abs(v - f_snaive)
                         AS DECIMAL(38,12))) AS DOUBLE) AS sae,
                       CAST(sum(CAST((v - f_snaive) * (v - f_snaive)
                         AS DECIMAL(38,12))) AS DOUBLE) AS sse,
                       CAST(sum(CAST(CASE WHEN v <> 0
                           THEN abs(v - f_snaive) / abs(v) END
                         AS DECIMAL(38,12))) AS DOUBLE) AS sape,
                       count(CASE WHEN v <> 0 THEN 1 END) AS nape
                     FROM fc WHERE f_snaive IS NOT NULL),
              e3 AS (SELECT 'drift' AS method, count(*) AS n,
                       CAST(sum(CAST(abs(v - f_drift)
                         AS DECIMAL(38,12))) AS DOUBLE) AS sae,
                       CAST(sum(CAST((v - f_drift) * (v - f_drift)
                         AS DECIMAL(38,12))) AS DOUBLE) AS sse,
                       CAST(sum(CAST(CASE WHEN v <> 0
                           THEN abs(v - f_drift) / abs(v) END
                         AS DECIMAL(38,12))) AS DOUBLE) AS sape,
                       count(CASE WHEN v <> 0 THEN 1 END) AS nape
                     FROM fc WHERE f_drift IS NOT NULL),
              u AS (SELECT * FROM e1 UNION ALL SELECT * FROM e2
                    UNION ALL SELECT * FROM e3)
              SELECT method, CAST(n AS BIGINT) AS n,
                     round(sae / CAST(n AS DOUBLE)
                       * 1000000.0)/1000000.0 AS mae,
                     round(sqrt(sse / CAST(n AS DOUBLE))
                       * 1000000.0)/1000000.0 AS rmse,
                     round(CASE WHEN nape > 0 THEN
                         sape / CAST(nape AS DOUBLE) * 100 END
                       * 1000000.0)/1000000.0 AS mape
              FROM u ORDER BY method"""),
      (s, d) => forecastBaseline(Tables.events(s, d), "ts", "value")),

    // Rolling p90 of the per-user value stream — the tail-latency
    // monitor the mean and median both miss.
    Query(
      "q_rolling_quantile",
      Some("""WITH b AS (
                SELECT event_id, user_id, ts, value,
                       list_sort(list(value) OVER (
                         PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
                         AS s
                FROM events)
              SELECT event_id, user_id, ts, value,
                     s[CAST(greatest(1, least(len(s),
                       CAST(ceil(0.9 * len(s)) AS BIGINT))) AS INT)]
                       AS rq
              FROM b ORDER BY event_id"""),
      (s, d) => rollingQuantile(Tables.events(s, d),
        "user_id", "ts", "event_id", "value", 0.9)),

    // Despike the per-user value stream: flag points 3 robust sigmas
    // off the rolling median and emit the repaired series.
    Query(
      "q_hampel",
      Some("""WITH b AS (
                SELECT event_id, user_id, ts, value,
                       list_sort(list(value) OVER (
                         PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
                         AS s
                FROM events),
              m AS (SELECT event_id, user_id, ts, value, s,
                      CASE WHEN len(s) % 2 = 1
                        THEN s[CAST((len(s) + 1) // 2 AS INT)]
                        ELSE (s[CAST((len(s) + 1) // 2 AS INT)]
                          + s[CAST(len(s) // 2 + 1 AS INT)]) / 2.0
                      END AS med
                    FROM b),
              e AS (SELECT event_id, user_id, ts, value, med,
                      list_sort(list_transform(s,
                        x -> abs(x - med))) AS dd
                    FROM m),
              q AS (SELECT event_id, user_id, ts, value, med,
                      1.4826 * (CASE WHEN len(dd) % 2 = 1
                        THEN dd[CAST((len(dd) + 1) // 2 AS INT)]
                        ELSE (dd[CAST((len(dd) + 1) // 2 AS INT)]
                          + dd[CAST(len(dd) // 2 + 1 AS INT)]) / 2.0
                      END) AS sigma
                    FROM e)
              SELECT event_id, user_id, ts, value,
                     round(med * 1000000.0)/1000000.0 AS rmed,
                     round(sigma * 1000000.0)/1000000.0 AS sigma,
                     (sigma > 0 AND abs(value - med) > 3.0 * sigma)
                       AS is_outlier,
                     round(CASE WHEN sigma > 0
                         AND abs(value - med) > 3.0 * sigma
                       THEN med ELSE value END
                       * 1000000.0)/1000000.0 AS cleaned
              FROM q ORDER BY event_id"""),
      (s, d) => hampel(Tables.events(s, d),
        "user_id", "ts", "event_id", "value")),

    // Is the daily value level trending or just weekly-seasonal —
    // classical additive decomposition of the daily mean series.
    Query(
      "q_seasonal_decompose",
      Some("""WITH daily AS (
                SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
                       count(*) AS n,
                       sum(CAST(value AS DECIMAL(38,6))) AS sv
                FROM events GROUP BY 1),
              ser AS (SELECT d,
                        CAST((d - DATE '1970-01-05') % 7 AS INT)
                          AS pidx,
                        CAST(sv AS DOUBLE) / CAST(n AS DOUBLE) AS v
                      FROM daily),
              ma AS (SELECT d, pidx, v,
                       count(*) OVER w AS cnt,
                       CAST(sum(CAST(v AS DECIMAL(38,12))) OVER w
                         AS DOUBLE) AS sv7
                     FROM ser WINDOW w AS (ORDER BY d
                       ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
              tr AS (SELECT d, pidx, v,
                       CASE WHEN cnt = 7 THEN sv7 / 7 END AS trend
                     FROM ma),
              si AS (SELECT pidx,
                       CAST(sum(CAST(v - trend AS DECIMAL(38,12)))
                         AS DOUBLE) / CAST(count(*) AS DOUBLE)
                         AS s_raw
                     FROM tr WHERE trend IS NOT NULL GROUP BY 1),
              ctr AS (SELECT
                        CAST(sum(CAST(s_raw AS DECIMAL(38,12)))
                          AS DOUBLE) / CAST(count(*) AS DOUBLE)
                          AS mean_s
                      FROM si),
              sea AS (SELECT pidx, s_raw - mean_s AS seasonal
                      FROM si CROSS JOIN ctr)
              SELECT d, pidx,
                     round(v * 1000000.0)/1000000.0 AS v,
                     round(trend * 1000000.0)/1000000.0 AS trend,
                     round(seasonal * 1000000.0)/1000000.0
                       AS seasonal,
                     round((v - trend - seasonal)
                       * 1000000.0)/1000000.0 AS remainder
              FROM tr LEFT JOIN sea USING (pidx) ORDER BY 1"""),
      (s, d) => seasonalDecompose(Tables.events(s, d), "ts",
        "value")),

    // Per-type hourly drift line: least-squares slope/intercept over
    // the bucketed mean series — the trend companion to q_acf.
    Query(
      "q_trend",
      Some("""WITH bk AS (
                SELECT event_type AS g,
                       CAST(floor(epoch_us(ts) / 3600000000.0) AS BIGINT)
                         AS b,
                       CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
                         / count(*) AS m
                FROM events GROUP BY 1, 2),
              b0 AS (SELECT g AS g0, min(b) AS bmin FROM bk GROUP BY 1),
              xy AS (SELECT g, CAST(b - bmin AS DOUBLE) AS x, m
                     FROM bk JOIN b0 ON g = g0),
              ag AS (
                SELECT g, CAST(count(*) AS DOUBLE) n,
                  CAST(sum(CAST(x AS DECIMAL(38,6))) AS DOUBLE) sx,
                  CAST(sum(CAST(m AS DECIMAL(38,6))) AS DOUBLE) sy,
                  CAST(sum(CAST(x*m AS DECIMAL(38,6))) AS DOUBLE) sxy,
                  CAST(sum(CAST(x*x AS DECIMAL(38,6))) AS DOUBLE) sxx
                FROM xy GROUP BY 1)
              SELECT g AS event_type, CAST(n AS BIGINT) AS n,
                     round((n*sxy - sx*sy) / (n*sxx - sx*sx)
                           * 1000000.0)/1000000.0 AS slope,
                     round((sy - (n*sxy - sx*sy) / (n*sxx - sx*sx) * sx)
                           / n * 1000000.0)/1000000.0 AS intercept
              FROM ag
              WHERE n >= 3 AND (n*sxx - sx*sx) > 0
              ORDER BY event_type"""),
      (s, d) => trend(Tables.events(s, d), "event_type", "ts", "value")
        .withColumnRenamed("g", "event_type")),

    // Activity streaks: each user's consecutive-day islands. The
    // day − row_number() island key is pure integer date arithmetic —
    // identical on both engines — so the hash pins every streak
    // boundary.
    Query(
      "q_gaps_islands",
      Some("""WITH days AS (
                SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
                FROM events),
              grp AS (
                SELECT user_id, day,
                       day - CAST(row_number() OVER (
                         PARTITION BY user_id ORDER BY day) AS INT)
                         AS g
                FROM days)
              SELECT user_id, min(day) AS start_day, max(day) AS end_day,
                     count(*) AS n_days
              FROM grp GROUP BY user_id, g
              ORDER BY user_id, start_day"""),
      (s, d) => gapsIslands(Tables.events(s, d), "user_id", "ts")),

    // Session-flow transition matrix: P(next type | type) over
    // (ts, event_id)-ordered per-user sequences. Counts are exact;
    // the only float step is the final 6-dp normalized probability.
    Query(
      "q_transitions",
      Some("""WITH nx AS (
                SELECT event_type AS src,
                       lead(event_type) OVER (PARTITION BY user_id
                         ORDER BY ts, event_id) AS dst
                FROM events),
              pairs AS (
                SELECT src, dst, count(*) AS n
                FROM nx WHERE dst IS NOT NULL GROUP BY src, dst)
              SELECT src, dst, n,
                     round(n * 1.0 / sum(n) OVER (PARTITION BY src)
                       * 1000000.0) / 1000000.0 AS p
              FROM pairs ORDER BY src, dst"""),
      (s, d) => transitions(Tables.events(s, d), "user_id",
        "event_type", "ts", "event_id")),

    // First/last-touch purchase attribution by preceding channel —
    // integer-exact end to end (counts only), with the ignoreNulls
    // window carries pinned against DuckDB's IGNORE NULLS spelling.
    Query(
      "q_attribution",
      Some("""WITH t AS (
                SELECT event_type,
                       first_value(CASE WHEN event_type <> 'purchase'
                           THEN event_type END IGNORE NULLS)
                         OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING) AS ft,
                       last_value(CASE WHEN event_type <> 'purchase'
                           THEN event_type END IGNORE NULLS)
                         OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING) AS lt
                FROM events),
              p AS (SELECT ft, lt FROM t
                    WHERE event_type = 'purchase' AND lt IS NOT NULL)
              SELECT channel,
                     CAST(sum(f) AS BIGINT) AS first_touch,
                     CAST(sum(l) AS BIGINT) AS last_touch
              FROM (
                SELECT ft AS channel, 1 AS f, 0 AS l FROM p
                UNION ALL
                SELECT lt, 0, 1 FROM p)
              GROUP BY channel ORDER BY channel"""),
      (s, d) => attribution(Tables.events(s, d), "user_id",
        "event_type", "ts", "event_id", "purchase")),

    // Batch sessionization at a 30-min gap: the replayable-history
    // twin of the streaming session window. Epoch-second integer gap
    // tests and counts make the hash pin every session boundary.
    Query(
      "q_sessionize",
      Some("""WITH g AS (
                SELECT user_id, ts,
                       CASE WHEN lag(ts) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER (
                              PARTITION BY user_id
                              ORDER BY ts, event_id)) > 1800000000
                         THEN 1 ELSE 0 END AS n,
                       event_id
                FROM events),
              s AS (
                SELECT user_id, ts,
                       sum(n) OVER (PARTITION BY user_id
                         ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS session_idx
                FROM g)
              SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
                     min(ts) AS start_ts, max(ts) AS end_ts,
                     count(*) AS n_events,
                     (epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000
                       AS duration_s
              FROM s GROUP BY user_id, session_idx
              ORDER BY user_id, session_idx"""),
      (s, d) => sessionize(Tables.events(s, d), "user_id", "ts",
        "event_id", gapMinutes = 30)),

    // CUSUM level-shift detection per event type over hourly counts:
    // the integer rescaling n*S_t - t*S_n keeps the argmax exact on
    // both engines; only the three readout divisions are float.
    Query(
      "q_changepoint",
      Some("""WITH h AS (
                SELECT event_type, date_trunc('hour', ts) AS hr,
                       count(*) AS c
                FROM events GROUP BY 1, 2),
              t AS (SELECT event_type, count(*) AS n, sum(c) AS s
                    FROM h GROUP BY 1),
              w AS (
                SELECT h.event_type, hr, n, s,
                       row_number() OVER (PARTITION BY h.event_type
                         ORDER BY hr) AS i,
                       sum(c) OVER (PARTITION BY h.event_type
                         ORDER BY hr
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS st
                FROM h JOIN t USING (event_type)),
              d AS (
                SELECT *, abs(n * st - i * s) AS dd,
                       row_number() OVER (PARTITION BY event_type
                         ORDER BY abs(n * st - i * s) DESC, i) AS rk
                FROM w WHERE i < n)
              SELECT event_type, hr AS cp_hour,
                     round(dd * 1.0 / n * 1000000.0) / 1000000.0
                       AS stat,
                     round(st * 1.0 / i * 1000000.0) / 1000000.0
                       AS mean_before,
                     round((s - st) * 1.0 / (n - i) * 1000000.0)
                       / 1000000.0 AS mean_after
              FROM d WHERE rk = 1 ORDER BY event_type"""),
      (s, d) => changepoint(Tables.events(s, d), "event_type", "ts")),

    // Point-in-time trailing features at each purchase: 1d/7d counts
    // and the 7d DECIMAL value sum, label instant excluded (the
    // leakage rule). RANGE frames on integer epoch-micros.
    Query(
      "q_trailing_features",
      Some("""WITH w AS (
                SELECT event_id, user_id, ts, event_type,
                       count(*) OVER (PARTITION BY user_id
                         ORDER BY epoch_us(ts)
                         RANGE BETWEEN 86400000000 PRECEDING
                         AND 1 PRECEDING) AS n_1d,
                       count(*) OVER (PARTITION BY user_id
                         ORDER BY epoch_us(ts)
                         RANGE BETWEEN 604800000000 PRECEDING
                         AND 1 PRECEDING) AS n_7d,
                       coalesce(sum(CAST(value AS DECIMAL(38,6)))
                         OVER (PARTITION BY user_id
                           ORDER BY epoch_us(ts)
                           RANGE BETWEEN 604800000000 PRECEDING
                           AND 1 PRECEDING),
                         CAST(0 AS DECIMAL(38,6))) AS v_7d
                FROM events)
              SELECT event_id, user_id, ts,
                     CAST(n_1d AS BIGINT) AS n_1d,
                     CAST(n_7d AS BIGINT) AS n_7d,
                     CAST(CAST(v_7d AS DECIMAL(38,6)) AS DOUBLE) AS v_7d
              FROM w WHERE event_type = 'purchase'
              ORDER BY event_id"""),
      (s, d) => trailingFeatures(Tables.events(s, d), "user_id", "ts",
        "event_id", "event_type", "value", "purchase")),

    // Hour-of-day load profile per event type: exact counts, 6-dp
    // share and seasonal index readouts.
    Query(
      "q_seasonality",
      Some("""WITH h AS (
                SELECT event_type, CAST(hour(ts) AS INT) AS hod,
                       count(*) AS n
                FROM events GROUP BY 1, 2),
              t AS (SELECT event_type, sum(n) AS total
                    FROM h GROUP BY 1)
              SELECT event_type, hod, CAST(n AS BIGINT) AS n,
                     round(n * 1.0 / total * 1000000.0) / 1000000.0
                       AS share,
                     round(n * 24.0 / total * 1000000.0) / 1000000.0
                       AS idx
              FROM h JOIN t USING (event_type)
              ORDER BY event_type, hod"""),
      (s, d) => seasonality(Tables.events(s, d), "event_type", "ts"))
  )
}
