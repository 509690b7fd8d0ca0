package graft

import graft.operators.FitOps
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Laws for the model-fitting & lifetime tier. The oracle gate
  * hash-compares each query against DuckDB at sf0.01; these pin the
  * algorithms: OLS closed form on exact lines, Theil–Sen's outlier
  * robustness vs brute-force pairwise medians, cross-correlation peak
  * location, the Kaplan–Meier product-limit identity on a hand-checked
  * table, and cohort-retention invariants. */
class FitOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, hour: Int = 12): Timestamp =
    Timestamp.valueOf(f"2024-01-${day}%02d $hour%02d:00:00")

  // -- groupOls ------------------------------------------------------

  test("groupOls recovers an exact line (slope/intercept exact, r2 = 1) " +
    "and a flat line (slope 0)") {
    val line = (1 to 50).map(i => ("a", i.toDouble, 2.0 * i + 1))
    val flat = (1 to 50).map(i => ("b", i.toDouble, 7.0))
    val got = FitOps.groupOls((line ++ flat).toDF("g", "x", "y"),
      "g", "x", "y").collect().map(r =>
        r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(got("a") === ((2.0, 1.0)))
    assert(got("b")._1 === 0.0)
    val r2 = FitOps.groupOls(line.toDF("g", "x", "y"), "g", "x", "y")
      .collect()(0).getDouble(4)
    assert(r2 === 1.0)
  }

  // -- theilSen ------------------------------------------------------

  private def bruteTheilSen(pts: Seq[(Int, Double)]): Double = {
    val slopes = (for {
      (a, i) <- pts.zipWithIndex; (b, j) <- pts.zipWithIndex if i < j
    } yield math.round((b._2 - a._2) / (b._1 - a._1) * 1e6) / 1e6).sorted
    // lower median: smallest s with 2·rank ≥ n
    slopes(math.ceil(slopes.size / 2.0).toInt - 1)
  }

  test("olsMulti recovers exact planted coefficients on both the " +
    "in-plan d=2 path and the driver-solve d=4 path; collinear " +
    "regressors yield NULL betas") {
    import spark.implicits._
    // d=2 (Cramér in-plan): y = 3 + 2·x1 − 0.5·x2, exact
    val d2 = (1 to 200).map { i =>
      val x1 = (i % 13).toDouble; val x2 = (i % 7).toDouble
      (x1, x2, 3.0 + 2.0 * x1 - 0.5 * x2)
    }.toDF("x1", "x2", "y")
    val r2rows = FitOps.olsMulti(d2, "y", Seq("x1", "x2")).collect()
    assert(r2rows.map(_.getAs[String]("term")).toSeq ===
      Seq("intercept", "x1", "x2"))
    assert(r2rows.map(_.getAs[Double]("beta")).toSeq ===
      Seq(3.0, 2.0, -0.5))
    assert(r2rows.forall(_.getAs[Double]("r2") === 1.0))
    assert(r2rows.forall(_.getAs[Long]("n") === 200L))
    // d=4 (driver Gaussian): y = 1 + x1 − 2·x2 + 0.25·x3 + 4·x4
    val d4 = (1 to 500).map { i =>
      val x1 = (i % 11).toDouble; val x2 = (i % 5).toDouble
      val x3 = (i % 17).toDouble; val x4 = ((i * 7) % 23).toDouble
      (x1, x2, x3, x4,
        1.0 + x1 - 2.0 * x2 + 0.25 * x3 + 4.0 * x4)
    }.toDF("x1", "x2", "x3", "x4", "y")
    val r4 = FitOps.olsMulti(d4, "y", Seq("x1", "x2", "x3", "x4"))
      .collect()
    assert(r4.map(_.getAs[String]("term")).toSeq ===
      Seq("intercept", "x1", "x2", "x3", "x4"))
    r4.map(_.getAs[Double]("beta")).toSeq
      .zip(Seq(1.0, 1.0, -2.0, 0.25, 4.0)).foreach { case (got, exp) =>
        assert(math.abs(got - exp) < 1e-5, s"beta $got vs $exp")
      }
    // collinear: x2 = 2·x1 → singular normal equations → NULL betas
    val coll = (1 to 100).map { i =>
      val x1 = (i % 9).toDouble; (x1, 2.0 * x1, 5.0 + x1)
    }.toDF("x1", "x2", "y")
    val rc = FitOps.olsMulti(coll, "y", Seq("x1", "x2")).collect()
    assert(rc.forall(_.isNullAt(2)), "singular system must NULL betas")
    val rc4 = FitOps.olsMulti(
      coll.withColumn("x3", col("x1") * 3).withColumn("x4", col("x1")),
      "y", Seq("x1", "x2", "x3", "x4")).collect()
    assert(rc4.forall(_.isNullAt(2)))
    // EMPTY input on the driver-solve path: the documented NULL-beta
    // degradation (n = 0), never an NPE off the null DECIMAL sums
    val e4 = FitOps.olsMulti(d4.filter(col("y") < -1e18), "y",
      Seq("x1", "x2", "x3", "x4")).collect()
    assert(e4.length === 5)
    assert(e4.forall(_.getAs[Long]("n") === 0L))
    assert(e4.forall(_.isNullAt(2)), "empty input must NULL betas")
    assert(e4.forall(_.isNullAt(4)), "empty input must NULL r2")
  }

  test("theilSen matches the brute-force lower median of pairwise " +
    "slopes, and 20% outliers cannot move it off the true trend") {
    val rnd = new scala.util.Random(11)
    // y = 3x + integer noise (sums stay IEEE-exact on both the decimal
    // and plain-double paths), every 5th point corrupted by +500
    val pts = (1 to 60).map { i =>
      val clean = 3.0 * i + rnd.nextInt(100)
      (i, if (i % 5 == 0) clean + 500.0 else clean)
    }
    val df = pts.map { case (i, y) => (ts(1 + (i - 1) % 28, i % 24), y) }
      .toDF("d", "v")
    // one row per (day,hour) but theilSen aggregates per DAY — rebuild
    // the expected daily series the same way
    val daily = pts.map { case (i, y) => (1 + (i - 1) % 28, i % 24, y) }
      .groupBy(_._1).map { case (d, rows) => (d, rows.map(_._3).sum) }
      .toSeq.sortBy(_._1)
    val expected = bruteTheilSen(daily)
    val got = FitOps.theilSen(df, "d", "v").collect()(0)
    assert(got.getAs[Double]("slope") === expected)
    assert(got.getAs[Long]("n_pairs") ===
      daily.size.toLong * (daily.size - 1) / 2)
    assert(got.getAs[Long]("n_days") === daily.size.toLong)
  }

  test("theilSenStrided recovers an exact line and tracks the exact " +
    "Theil-Sen slope on a noisy, outlier-contaminated series") {
    import spark.implicits._
    // exact line: every pairwise slope equals the true slope at any
    // stride, so strided == exact == truth
    val line = (0 until 240).map(i =>
      (Timestamp.valueOf(java.time.LocalDate.of(2020, 1, 1)
        .plusDays(i).atStartOfDay()), 100.0 + 2.5 * i))
      .toDF("d", "v")
    val rl = FitOps.theilSenStrided(line, "d", "v").collect()(0)
    assert(rl.getAs[Double]("slope") === 2.5)
    // x is epoch days, so the intercept is at day 0 (1970-01-01)
    val x0 = java.time.temporal.ChronoUnit.DAYS.between(
      java.time.LocalDate.of(1970, 1, 1),
      java.time.LocalDate.of(2020, 1, 1)).toDouble
    assert(rl.getAs[Double]("intercept") === 100.0 - 2.5 * x0)
    assert(rl.getAs[Long]("n_days") === 240L)
    // strided pair budget is LINEAR: ≤ n_days × |ladder|
    assert(rl.getAs[Long]("n_pairs") <= 240L * 15)
    // noisy series with 5% wild outliers: the strided median must
    // stay in the exact operator's neighborhood (both are robust)
    val rnd = new scala.util.Random(41)
    val noisy = (0 until 400).map { i =>
      val base = 50.0 + 1.75 * i + (rnd.nextDouble() - 0.5) * 8.0
      val v = if (rnd.nextDouble() < 0.05) base + 500.0 else base
      (Timestamp.valueOf(java.time.LocalDate.of(2020, 1, 1)
        .plusDays(i).atStartOfDay()), v)
    }.toDF("d", "v")
    val exact = FitOps.theilSen(noisy, "d", "v").collect()(0)
      .getAs[Double]("slope")
    val strided = FitOps.theilSenStrided(noisy, "d", "v").collect()(0)
      .getAs[Double]("slope")
    assert(math.abs(strided - exact) <= 0.05 * math.abs(exact),
      s"strided $strided drifted from exact $exact")
  }

  test("mannKendall matches the brute-force tie-corrected S/var/z and " +
    "labels increasing, decreasing, and trendless series correctly") {
    import spark.implicits._
    def mk(vals: Seq[Double]) = vals.zipWithIndex.map { case (v, i) =>
      (Timestamp.valueOf(java.time.LocalDate.of(2021, 1, 1)
        .plusDays(i).atStartOfDay()), v)
    }.toDF("d", "v")
    // noisy rising series with ties — brute-force the full statistic
    val rnd = new scala.util.Random(11)
    val vals = (0 until 120).map(i =>
      math.floor(i * 0.5 + rnd.nextInt(20)).toDouble)
    // signs on the 6dp-ROUNDED slopes (the operator's documented tie
    // stance); x = consecutive days so dx = j - i
    def r6d(x: Double) = math.round(x * 1e6) / 1e6
    val pairs = for (i <- vals.indices; j <- i + 1 until vals.size)
      yield r6d((vals(j) - vals(i)) / (j - i))
    val sBrute = pairs.map(s => if (s > 0) 1L else if (s < 0) -1L else 0L).sum
    val n = vals.size.toDouble
    val tieSum = vals.groupBy(identity).values
      .map(g => g.size.toLong).map(t => t * (t - 1) * (2 * t + 5)).sum
    val varBrute = (n * (n - 1) * (2 * n + 5) - tieSum) / 18.0
    val zBrute =
      if (sBrute > 0) (sBrute - 1.0) / math.sqrt(varBrute)
      else if (sBrute < 0) (sBrute + 1.0) / math.sqrt(varBrute)
      else 0.0
    val r = FitOps.mannKendall(mk(vals), "d", "v").collect()(0)
    assert(r.getAs[Long]("n_days") === vals.size.toLong)
    assert(r.getAs[Long]("s_stat") === sBrute)
    assert(r.getAs[Double]("var_s") === r6d(varBrute))
    assert(r.getAs[Double]("z") === r6d(zBrute))
    // verdicts
    val up = FitOps.mannKendall(mk((0 until 60).map(_ * 1.0)), "d", "v")
      .collect()(0)
    assert(up.getAs[String]("trend") === "increasing")
    assert(up.getAs[Long]("s_stat") === 60L * 59 / 2)
    val down = FitOps.mannKendall(mk((0 until 60).map(60.0 - _)),
      "d", "v").collect()(0)
    assert(down.getAs[String]("trend") === "decreasing")
    val rnd2 = new scala.util.Random(5)
    val flat = FitOps.mannKendall(
      mk((0 until 60).map(_ => rnd2.nextInt(7).toDouble)), "d", "v")
      .collect()(0)
    assert(flat.getAs[String]("trend") === "no_trend")
  }

  test("theilSen on an exact line returns the line's slope and intercept") {
    val df = (1 to 30).map(i => (ts(i % 28 + 1), 0.0)).toDF("d", "v")
    // value 0 per row; daily y = 0 → slope 0, intercept 0
    val r = FitOps.theilSen(df, "d", "v").collect()(0)
    assert(r.getAs[Double]("slope") === 0.0)
    assert(r.getAs[Double]("intercept") === 0.0)
  }

  // -- crossCorr -----------------------------------------------------

  test("crossCorr peaks at the true lag with xcorr 1 when series b is " +
    "an exact 3-day shift of series a") {
    val rnd = new scala.util.Random(5)
    val base = (1 to 25).map(i => (i, 100.0 + rnd.nextInt(500)))
    val a = base.map { case (d, v) => (ts(d), v) }.toDF("d", "v")
    val b = base.map { case (d, v) => (ts(d + 3), v) }.toDF("d", "v")
    val rows = FitOps.crossCorr(a, "d", "v", b, "d", "v", maxLag = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(rows(3L) === 1.0)
    assert(rows.filter(_._1 != 3L).values.forall(_ < 1.0))
  }

  // -- kaplanMeier ---------------------------------------------------

  test("kaplanMeier reproduces the hand-computed product-limit table " +
    "and survival is non-increasing") {
    // 5 subjects, activity spans (first day, last day), corpus max =
    // day 20, censorDays = 3 → spans ending ≥ day 18 are censored:
    //   u1: 1..3   (t=2,  death)        u2: 1..5  (t=4, death)
    //   u3: 2..4   (t=2,  death)        u4: 1..19 (t=18, censored)
    //   u5: 10..20 (t=10, censored)
    // KM: t=2: n=5,d=2 → S=0.6; t=4: n=3,d=1 → S=0.4;
    //     t=10: n=2,d=0,c=1 → S=0.4; t=18: n=1,d=0,c=1 → S=0.4
    val ev = Seq((1, 1), (1, 3), (2, 1), (2, 5), (3, 2), (3, 4),
      (4, 1), (4, 19), (5, 10), (5, 20))
      .map { case (u, d) => (u.toLong, ts(d)) }.toDF("u", "t")
    val got = FitOps.kaplanMeier(ev, "u", "t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got === Array(
      (2L, 5L, 2L, 0L, 0.6),
      (4L, 3L, 1L, 0L, 0.4),
      (10L, 2L, 0L, 1L, 0.4),
      (18L, 1L, 0L, 1L, 0.4)))
    assert(got.map(_._5).sliding(2).forall(p => p(0) >= p(1)))
  }

  test("nelsonAalen: cumulative hazard matches the brute-force sum on " +
    "the kaplanMeier fixture, is non-decreasing, and shares the KM " +
    "risk table exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(53)
    val ev = (1 to 120).flatMap { u =>
      val span = rnd.nextInt(10)
      Seq((u.toLong, Timestamp.valueOf(java.time.LocalDate
          .of(2022, 1, 1 + rnd.nextInt(5)).atStartOfDay())),
        (u.toLong, Timestamp.valueOf(java.time.LocalDate
          .of(2022, 1, 1 + rnd.nextInt(5) + span).atStartOfDay())))
    }.toDF("user_id", "ts")
    val km = FitOps.kaplanMeier(ev, "user_id", "ts").collect()
    val na = FitOps.nelsonAalen(ev, "user_id", "ts").collect()
    // identical risk-table columns (t, n_risk, d, c)
    assert(na.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSeq ===
      km.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq)
    // brute-force H(t) and monotonicity
    var h = 0.0
    na.foreach { r =>
      h += r.getLong(2).toDouble / r.getLong(1)
      assert(r.getAs[Double]("cum_hazard") ===
        math.round(h * 1e6) / 1e6, s"t=${r.getLong(0)}")
      assert(r.getAs[Double]("var_hazard") >= 0.0)
    }
    val hs = na.map(_.getAs[Double]("cum_hazard")).toSeq
    assert(hs === hs.sorted)
  }

  test("kaplanMeier accounts every subject exactly once and n_risk " +
    "is non-increasing in t") {
    val ev = (1 to 8).flatMap(u => Seq((u.toLong, ts(1)),
      (u.toLong, ts(1 + u)))).toDF("u", "t")
    // corpus max = day 9; spans ending days 7..9 (u = 6,7,8) fall
    // within 3 days of the edge → censored; u = 1..5 die
    val got = FitOps.kaplanMeier(ev, "u", "t").collect()
    assert(got.map(r => r.getLong(2) + r.getLong(3)).sum === 8L)
    val nRisk = got.map(_.getLong(1))
    assert(nRisk.head === 8L)
    assert(nRisk.toSeq === nRisk.sorted.reverse)
  }

  // -- cohortRetention -----------------------------------------------

  test("cohortRetention: k=0 retention is 1, counts match a " +
    "hand-built two-cohort fixture") {
    def d(m: Int, day: Int) = Timestamp.valueOf(f"2024-$m%02d-$day%02d 10:00:00")
    // cohort 2024-01: c1 orders in Jan+Feb, c2 Jan only, c3 Jan+Mar
    // cohort 2024-02: c4 orders in Feb
    val orders = Seq(
      (1L, d(1, 5)), (1L, d(2, 7)), (2L, d(1, 9)), (3L, d(1, 2)),
      (3L, d(3, 1)), (4L, d(2, 20)))
      .toDF("cust", "dt")
    val got = FitOps.cohortRetention(orders, "cust", "dt")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(got === Array(
      ("2024-01", 0L, 3L, 1.0),
      ("2024-01", 1L, 1L, 0.333333),
      ("2024-01", 2L, 1L, 0.333333),
      ("2024-02", 0L, 1L, 1.0)))
  }

  // -- interarrival ----------------------------------------------------

  test("interarrival: hand fixture — gaps attributed to the successor " +
    "event's type, exact integer-second medians and p90") {
    // user 1 events at minutes 0,1,3,7 (gaps 60,120,240 s); the gap
    // lands on the SUCCESSOR's type
    val ev = Seq(
      (1L, 1L, ts(1, 10), "a"), (1L, 2L, ts(1, 11), "b"),
      (1L, 3L, ts(1, 13), "b"), (1L, 4L, ts(1, 17), "b"),
      (2L, 5L, ts(2, 10), "a"), (2L, 6L, ts(2, 10), "b"))
      .map { case (u, id, t0, ty) =>
        (u, id, Timestamp.valueOf(t0.toLocalDateTime.plusMinutes(id)), ty)
      }
    // rebuild expected: per user ordered by ts: gaps in seconds
    val df = ev.toDF("u", "id", "t", "ty")
    val got = FitOps.interarrival(df, "u", "t", "id", "ty")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(3), r.getLong(4))).toMap
    // user1: events at +1,+2,+3,+4 min offsets applied per id — gaps
    // are exact multiples of 60; user2's two events give one gap
    got.values.foreach { case (n, p50, p90) =>
      assert(n > 0 && p50 % 60 == 0 && p90 % 60 == 0 && p50 <= p90)
    }
    assert(got.values.map(_._1).sum === 4L) // 3 gaps user1 + 1 user2
  }

  test("interarrival medians equal a brute-force recount on a random " +
    "fixture") {
    val rnd = new scala.util.Random(57)
    val ev = (1 to 300).map { i =>
      (i % 10L, i.toLong, ts(1 + rnd.nextInt(20), rnd.nextInt(24)),
        if (i % 3 == 0) "x" else "y")
    }
    val df = ev.toDF("u", "id", "t", "ty")
    val gaps = ev.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e._3.getTime, e._2))
      sorted.sliding(2).collect { case Seq(a, b) =>
        (b._4, b._3.getTime / 1000 - a._3.getTime / 1000)
      }
    }
    val expP50 = gaps.groupBy(_._1).map { case (ty, gs) =>
      val v = gs.map(_._2).sorted
      ty -> v(math.ceil(v.size / 2.0).toInt - 1)
    }
    val got = FitOps.interarrival(df, "u", "t", "id", "ty")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got === expP50)
  }

  // -- logitFit --------------------------------------------------------

  private def sigmoid(x: Double): Double = 1.0 / (1.0 + math.exp(-x))

  test("logitFit recovers a planted logistic model on a grid fixture, " +
    "fits the null model to logit(base rate), and is repartition-" +
    "deterministic") {
    // cells (x1, x2) on a grid; positives per cell = the planted
    // model's expected count, so the MLE sits at the planted betas up
    // to the rounding discretization
    val (b0t, b1t, b2t) = (-1.0, 2.0, -0.5)
    val perCell = 400
    val rows = for {
      i <- 0 to 4; j <- 0 to 4
      x1 = i / 4.0; x2 = j / 4.0
      nPos = math.round(perCell * sigmoid(b0t + b1t * x1 + b2t * x2))
        .toInt
      k <- 1 to perCell
    } yield (if (k <= nPos) 1.0 else 0.0, x1, x2)
    val df = rows.toDF("y", "x1", "x2")
    val fit = FitOps.logitFit(df, "y", Seq("x1", "x2")).collect()
    assert(fit.map(_.getAs[String]("term")).toSeq ===
      Seq("intercept", "x1", "x2"))
    val betas = fit.map(_.getAs[Double]("beta"))
    assert(math.abs(betas(0) - b0t) < 0.05, betas.mkString(","))
    assert(math.abs(betas(1) - b1t) < 0.08, betas.mkString(","))
    assert(math.abs(betas(2) - b2t) < 0.08, betas.mkString(","))
    assert(fit.forall(_.getAs[Double]("se") > 0))
    assert(fit.forall(_.getAs[Long]("n") == rows.size.toLong))
    // null model: 30% positives independent of x
    val nullRows = for (i <- 0 until 1000)
      yield (if (i % 10 < 3) 1.0 else 0.0, (i % 7).toDouble,
        (i % 11).toDouble)
    val nf = FitOps.logitFit(nullRows.toDF("y", "x1", "x2"),
      "y", Seq("x1", "x2")).collect()
    val nb = nf.map(_.getAs[Double]("beta"))
    assert(math.abs(nb(0) - math.log(0.3 / 0.7)) < 0.15)
    assert(math.abs(nb(1)) < 0.05 && math.abs(nb(2)) < 0.05)
    // mean deviance of the null fit ~ -2*(0.3 ln .3 + 0.7 ln .7)
    val expectedDev = -2.0 * (0.3 * math.log(0.3) + 0.7 * math.log(0.7))
    assert(math.abs(nf(0).getAs[Double]("mean_deviance") -
      expectedDev) < 0.01)
    // repartition determinism: decimal pre-sums make the fit exact
    val again = FitOps.logitFit(df.repartition(13), "y",
      Seq("x1", "x2")).collect().map(_.getAs[Double]("beta"))
    assert(again.toSeq === betas.toSeq)
  }

  test("ipwAte corrects a planted confounder the naive difference " +
    "gets wrong, matches the naive difference under randomized " +
    "treatment, and goes NULL when everyone is treated") {
    // confounded fixture: x1 drives BOTH treatment (80% vs 20%) and
    // outcome (+3); true treatment effect is exactly +2. Exact cell
    // counts make the logistic propensity fit exact.
    val rows = for {
      x1 <- Seq(0.0, 1.0)
      (t, cnt) <- Seq((1.0, if (x1 == 1.0) 80 else 20),
        (0.0, if (x1 == 1.0) 20 else 80))
      k <- 1 to cnt
    } yield (t, 10.0 + 3.0 * x1 + 2.0 * t, x1, (k % 2).toDouble)
    val df = rows.toDF("t", "y", "x1", "x2")
    val r = FitOps.ipwAte(df, "t", "y", Seq("x1", "x2")).collect()(0)
    assert(r.getAs[Long]("n") === 200L)
    assert(r.getAs[Long]("n_treated") === 100L)
    assert(math.abs(r.getAs[Double]("ate") - 2.0) < 0.01)
    // the naive difference on the same fixture is biased to 3.8
    val naive = rows.filter(_._1 == 1.0).map(_._2).sum / 100 -
      rows.filter(_._1 == 0.0).map(_._2).sum / 100
    assert(math.abs(naive - 3.8) < 1e-9)
    // randomized treatment: IPW ~ naive
    val rnd = new scala.util.Random(53)
    val rand = (1 to 400).map { i =>
      val t = (i % 2).toDouble
      (t, 10.0 + 5.0 * t + rnd.nextInt(3), rnd.nextInt(5).toDouble,
        rnd.nextInt(7).toDouble)
    }
    val rr = FitOps.ipwAte(rand.toDF("t", "y", "x1", "x2"),
      "t", "y", Seq("x1", "x2")).collect()(0)
    val nv = rand.filter(_._1 == 1.0).map(_._2).sum / 200 -
      rand.filter(_._1 == 0.0).map(_._2).sum / 200
    assert(math.abs(rr.getAs[Double]("ate") - nv) < 0.15)
    // all-treated: no control arm, NULL block
    val allT = (1 to 50).map(i =>
      (1.0, i.toDouble, (i % 3).toDouble, (i % 5).toDouble))
    val at = FitOps.ipwAte(allT.toDF("t", "y", "x1", "x2"),
      "t", "y", Seq("x1", "x2")).collect()(0)
    assert(at.isNullAt(at.fieldIndex("ate")))
    assert(at.getAs[Long]("n_treated") === 50L)
  }

  test("propensityMatch recovers the planted effect when every " +
    "treated cell has same-propensity controls (with replacement), " +
    "and NULL-blocks single-arm inputs") {
    // same confounded fixture as ipwAte but with 80 treated vs 20
    // controls in the hot cell: matching is with replacement, each
    // treated matches a control AT ITS OWN propensity, ATT exactly 2
    val rows = for {
      x1 <- Seq(0.0, 1.0)
      (t, cnt) <- Seq((1.0, if (x1 == 1.0) 80 else 20),
        (0.0, if (x1 == 1.0) 20 else 80))
      k <- 1 to cnt
    } yield (t, 10.0 + 3.0 * x1 + 2.0 * t, x1, (k % 2).toDouble,
      (x1 * 1000 + t * 500 + k).toLong)
    val df = rows.toDF("t", "y", "x1", "x2", "uid")
    val r = FitOps.propensityMatch(df, "t", "y", "uid",
      Seq("x1", "x2")).collect()(0)
    assert(r.getAs[Long]("n_treat") === 100L)
    assert(r.getAs[Long]("n_ctrl") === 100L)
    assert(math.abs(r.getAs[Double]("att") - 2.0) < 0.01)
    // all-treated: nothing to match against
    val allT = (1 to 40).map(i =>
      (1.0, i.toDouble, (i % 3).toDouble, (i % 5).toDouble, i.toLong))
    val at = FitOps.propensityMatch(
      allT.toDF("t", "y", "x1", "x2", "uid"), "t", "y", "uid",
      Seq("x1", "x2")).collect()(0)
    assert(at.isNullAt(at.fieldIndex("att")))
    assert(at.getAs[Long]("n_ctrl") === 0L)
  }

  test("quantileReg: recovers the heteroscedastic p90 slope OLS " +
    "misses; median regression shrugs at planted outliers; the fit " +
    "is locally pinball-optimal") {
    import spark.implicits._
    val rnd = new scala.util.Random(43)
    // y = 2 + 3x + x*eps: conditional q90 = 2 + (3 + z90)x, z90 = 1.2816
    val het = (1 to 20000).map { _ =>
      val x = 1.0 + rnd.nextDouble() * 9
      (x, 2.0 + 3.0 * x + x * rnd.nextGaussian())
    }.toDF("x", "y")
    val r9 = FitOps.quantileReg(het, "y", "x", 0.9, steps = 32)
      .collect()(0)
    assert(math.abs(r9.getAs[Double]("slope") - (3.0 + 1.2816)) < 0.15,
      s"p90 slope: ${r9.getAs[Double]("slope")}")
    // the 8-step default has moved decisively off the OLS slope
    // toward the p90 line (the fixed point; convergence is linear)
    val r8 = FitOps.quantileReg(het, "y", "x", 0.9).collect()(0)
    assert(r8.getAs[Double]("slope") > 3.4,
      s"8-step p90 slope: ${r8.getAs[Double]("slope")}")
    // median regression vs planted one-sided outliers: OLS slope is
    // dragged, the q=0.5 fit stays near 3
    val base = (1 to 5000).map { _ =>
      val x = 1.0 + rnd.nextDouble() * 9
      (x, 2.0 + 3.0 * x + 0.2 * rnd.nextGaussian())
    }
    val outliers = (1 to 250).map { _ =>
      val x = 1.0 + rnd.nextDouble() * 9
      (x, 2.0 + 3.0 * x + 200.0)
    }
    val dirty = (base ++ outliers).toDF("x", "y")
    val rm = FitOps.quantileReg(dirty, "y", "x", 0.5).collect()(0)
    assert(math.abs(rm.getAs[Double]("slope") - 3.0) < 0.1,
      s"median slope dragged: ${rm.getAs[Double]("slope")}")
    assert(math.abs(rm.getAs[Double]("intercept") - 2.0) < 0.3)
    // local pinball optimality of the returned fit
    def pinball(rows: Seq[(Double, Double)], a: Double, b: Double,
        q: Double): Double = rows.map { case (x, y) =>
      val r = y - a - b * x
      if (r >= 0) q * r else (q - 1) * r
    }.sum / rows.size
    val a0 = rm.getAs[Double]("intercept")
    val b0 = rm.getAs[Double]("slope")
    val rows = base ++ outliers
    val p0 = pinball(rows, a0, b0, 0.5)
    assert(math.abs(p0 - rm.getAs[Double]("mean_pinball")) < 1e-4)
    Seq((a0 + 0.5, b0), (a0 - 0.5, b0), (a0, b0 + 0.2),
      (a0, b0 - 0.2)).foreach { case (a, b) =>
      assert(pinball(rows, a, b, 0.5) >= p0 - 1e-9,
        s"perturbed ($a, $b) beats the fit")
    }
  }

  test("ltvCurve: hand-computed two-cohort fixture — cumulative " +
    "revenue per member, monotone in age, cohort label format") {
    import spark.implicits._
    import java.sql.Date
    // cohort 2024-01: custs 1,2; cohort 2024-02: cust 3
    val rows = Seq(
      (1L, Date.valueOf("2024-01-05"), 100.0),
      (2L, Date.valueOf("2024-01-20"), 50.0),
      (1L, Date.valueOf("2024-02-10"), 30.0),
      (3L, Date.valueOf("2024-02-15"), 80.0),
      (2L, Date.valueOf("2024-03-01"), 20.0))
      .toDF("cust", "dt", "rev")
    val out = FitOps.ltvCurve(rows, "cust", "dt", "rev").collect()
    val c1 = out.filter(_.getString(0) == "2024-01")
    assert(c1.map(r => (r.getAs[Long]("k"),
      r.getAs[Double]("revenue"), r.getAs[Double]("ltv"))).toSeq ===
      Seq((0L, 150.0, 75.0), (1L, 30.0, 90.0), (2L, 20.0, 100.0)))
    val c2 = out.filter(_.getString(0) == "2024-02")
    assert(c2.map(r => (r.getAs[Long]("k"),
      r.getAs[Long]("cohort_size"), r.getAs[Double]("ltv"))).toSeq ===
      Seq((0L, 1L, 80.0)))
    // ltv is non-decreasing in k within a cohort (revenue >= 0)
    val ltvs = c1.map(_.getAs[Double]("ltv")).toSeq
    assert(ltvs === ltvs.sorted)
  }

  test("logRank: identical survival gives chi2 near 0; a planted " +
    "hazard gap is flagged; hand-computed O/E on a tiny table") {
    import spark.implicits._
    // tiny hand table: group x dies at t=1,2; group y dies at t=3,4
    // (complete separation). Events only, no censoring.
    val tiny = Seq((1L, true, "x"), (2L, true, "x"),
      (3L, true, "y"), (4L, true, "y")).toDF("t", "e", "g")
    val r = FitOps.logRank(tiny, "t", "e", "g", "x", "y").collect()(0)
    // hand E1: t=1: d=1, n1=2, n=4 -> 0.5; t=2: d=1, n1=1, n=3 ->
    // 1/3; t=3: n1=0 -> 0; t=4: 0. E = 0.8333, O = 2
    assert(r.getAs[Long]("o1") === 2L)
    assert(math.abs(r.getAs[Double]("e1") - (0.5 + 1.0 / 3)) < 1e-6)
    assert(r.getAs[Long]("n_times") === 4L)
    // same distribution both groups: chi2 small
    val rnd = new scala.util.Random(19)
    val same = (1 to 2000).map { i =>
      val t = 1 + rnd.nextInt(30)
      (t.toLong, rnd.nextDouble() > 0.2, if (i % 2 == 0) "x" else "y")
    }.toDF("t", "e", "g")
    val rs = FitOps.logRank(same, "t", "e", "g", "x", "y").collect()(0)
    assert(rs.getAs[Double]("chi2") < 4.0, rs.toString)
    assert(rs.getAs[Double]("p_value") > 0.04)
    // planted gap: y survives ~2x longer
    val gap = (1 to 2000).map { i =>
      val base = 1 + rnd.nextInt(15)
      if (i % 2 == 0) (base.toLong, true, "x")
      else ((base * 2).toLong, true, "y")
    }.toDF("t", "e", "g")
    val rg = FitOps.logRank(gap, "t", "e", "g", "x", "y").collect()(0)
    assert(rg.getAs[Double]("chi2") > 30.0, rg.toString)
    assert(rg.getAs[Double]("p_value") < 1e-6)
  }

  test("dickeyFuller: strongly negative on a mean-reverting series, " +
    "near zero on a random walk; beta recovers phi-1") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val ar = Seq.iterate(0.0, 800)(x => 0.5 * x + rnd.nextGaussian())
    val arDf = ar.zipWithIndex.map { case (v, i) => (i, v) }
      .toDF("t", "y")
    val r1 = FitOps.dickeyFuller(arDf, "t", "y").collect()(0)
    // Delta-y on AR(1) phi=0.5: beta ~ phi - 1 = -0.5
    assert(math.abs(r1.getAs[Double]("beta") - (-0.5)) < 0.1)
    assert(r1.getAs[Double]("df_stat") < -3.43, "stationary series " +
      s"must reject the unit root: ${r1.getAs[Double]("df_stat")}")
    val walk = Seq.iterate(0.0, 800)(x => x + rnd.nextGaussian())
    val wDf = walk.zipWithIndex.map { case (v, i) => (i, v) }
      .toDF("t", "y")
    val r2 = FitOps.dickeyFuller(wDf, "t", "y").collect()(0)
    // a unit-root draw CAN cross the 5% line by construction (this
    // seed lands at -2.88); the 1% value separates it cleanly from
    // the stationary series' -15-ish
    assert(r2.getAs[Double]("df_stat") > -3.43,
      s"random walk must not reject at 1%: " +
        s"${r2.getAs[Double]("df_stat")}")
    assert(r2.getAs[Double]("df_stat") >
      r1.getAs[Double]("df_stat") + 5.0,
      "walk and mean-reverting series must separate decisively")
  }

  test("grangerLag1: x leading y by one step is flagged (large F), " +
    "the reverse direction is not; beta_xlag recovers the planted " +
    "coefficient; degenerate constant series yields NULLs") {
    val rnd = new scala.util.Random(13)
    // x white noise; y_t = 0.5 y_{t-1} + 0.8 x_{t-1} + small noise
    val n = 600
    val xs = Seq.fill(n)(rnd.nextGaussian())
    val ys = Array.ofDim[Double](n)
    for (t <- 1 until n) // y_t leans on yesterday's x, not today's
      ys(t) = 0.5 * ys(t - 1) + 0.8 * xs(t - 1) +
        0.05 * rnd.nextGaussian()
    val df = (0 until n).map(i => (i, xs(i), ys(i)))
      .toDF("t", "x", "y")
    val fwd = FitOps.grangerLag1(df, "t", "x", "y").collect()(0)
    assert(fwd.getAs[Double]("f_stat") > 100.0)
    assert(math.abs(fwd.getAs[Double]("beta_xlag") - 0.8) < 0.05)
    assert(fwd.getAs[Long]("n") === (n - 1).toLong)
    // y does not Granger-cause x (x is exogenous noise)
    val rev = FitOps.grangerLag1(df, "t", "y", "x").collect()(0)
    assert(rev.getAs[Double]("f_stat") < 8.0, rev.toString)
    // constant series: zero lag-variance -> NULL everything
    val const = (0 until 50).map(i => (i, 1.0, 2.0)).toDF("t", "x", "y")
    val rc = FitOps.grangerLag1(const, "t", "x", "y").collect()(0)
    assert(rc.isNullAt(rc.fieldIndex("f_stat")))
    assert(rc.isNullAt(rc.fieldIndex("beta_xlag")))
  }

  test("ivWald: on a planted z -> x -> y chain the IV slope recovers " +
    "the structural beta even under confounding OLS can't remove; " +
    "binary-z Wald identity holds; constant instrument gives NULLs") {
    // structural model: x = 2 + 3z + c, y = 5x + 10c (c = confounder)
    // OLS of y on x is biased by c; IV through z recovers beta = 5
    val rnd = new scala.util.Random(11)
    val rows = (1 to 4000).map { i =>
      val z = (i % 2).toDouble
      val c = rnd.nextGaussian()
      val x = 2.0 + 3.0 * z + c
      val y = 5.0 * x + 10.0 * c
      (z, x, y)
    }
    val df = rows.toDF("z", "x", "y")
    val r = FitOps.ivWald(df, "z", "x", "y").collect()(0)
    val beta = r.getAs[Double]("beta_iv")
    assert(math.abs(beta - 5.0) < 0.5, s"beta_iv=$beta")
    // Wald identity for binary z: beta = (mean y1 - y0)/(mean x1 - x0)
    val y1 = rows.filter(_._1 == 1.0).map(_._3)
    val y0 = rows.filter(_._1 == 0.0).map(_._3)
    val x1 = rows.filter(_._1 == 1.0).map(_._2)
    val x0 = rows.filter(_._1 == 0.0).map(_._2)
    val wald = (y1.sum / y1.size - y0.sum / y0.size) /
      (x1.sum / x1.size - x0.sum / x0.size)
    assert(math.abs(beta - wald) < 1e-4)
    // first stage should be near the planted 3
    assert(math.abs(r.getAs[Double]("first_stage") - 3.0) < 0.3)
    // degenerate: constant instrument → all NULL
    val cz = rows.map { case (_, x, y) => (1.0, x, y) }.toDF("z", "x", "y")
    val rc = FitOps.ivWald(cz, "z", "x", "y").collect()(0)
    assert(rc.isNullAt(rc.fieldIndex("beta_iv")))
    assert(rc.isNullAt(rc.fieldIndex("first_stage")))
  }

  test("rddEstimate recovers a planted jump at the cutoff; bandwidth " +
    "excludes far rows; boundary point belongs to the right side") {
    // y = 2 + 0.5u + 7·1[u >= 0], u on a grid; exact linear both
    // sides → closed-form fit is exact
    val pts = (-30 to 30).filter(_ != 0).flatMap { i =>
      val u = i / 2.0
      val run = 100.0 + u
      val y = 2.0 + 0.5 * u + (if (u >= 0) 7.0 else 0.0)
      Seq((run, y))
    } :+ ((100.0, 9.0)) // u = 0 exactly: right side owns it
    val df = pts.toDF("run", "y")
    val r = FitOps.rddEstimate(df, "run", "y", 100.0, 10.0)
      .collect()(0)
    assert(r.getAs[Double]("effect") === 7.0)
    assert(r.getAs[Double]("slope_left") === 0.5)
    assert(r.getAs[Double]("slope_right") === 0.5)
    assert(r.getAs[Double]("intercept_left") === 2.0)
    assert(r.getAs[Double]("intercept_right") === 9.0)
    // bandwidth 10 keeps u in [-10, 10]: 20 left grid points
    // (u = -10 .. -0.5), 20 right (u = 0.5 .. 10) + the u = 0 row
    assert(r.getAs[Long]("n_left") === 20L)
    assert(r.getAs[Long]("n_right") === 21L)
    // one-sided data: the empty side yields NULL fits and 0 count
    val oneSide = pts.filter(_._1 >= 100.0).toDF("run", "y")
    val ro = FitOps.rddEstimate(oneSide, "run", "y", 100.0, 10.0)
      .collect()(0)
    assert(ro.getAs[Long]("n_left") === 0L)
    assert(ro.isNullAt(ro.fieldIndex("effect")))
  }

  test("logitFit degrades to NULL betas on a constant regressor and " +
    "on empty input") {
    val const = (1 to 100).map(i =>
      ((i % 2).toDouble, 1.0, i.toDouble)).toDF("y", "x1", "x2")
    val cf = FitOps.logitFit(const, "y", Seq("x1", "x2")).collect()
    assert(cf.forall(r => r.isNullAt(r.fieldIndex("beta"))))
    val empty = Seq.empty[(Double, Double, Double)]
      .toDF("y", "x1", "x2")
    val ef = FitOps.logitFit(empty, "y", Seq("x1", "x2")).collect()
    assert(ef.length === 3)
    assert(ef.forall(r => r.isNullAt(r.fieldIndex("beta")) &&
      r.getAs[Long]("n") == 0L))
  }
}
