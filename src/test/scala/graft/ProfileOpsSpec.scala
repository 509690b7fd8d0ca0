package graft

import graft.operators.ProfileOps
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Laws for the schema-profiling & drift tier: FD verdicts on
  * constructed dependency fixtures, candidate-key flags under nulls and
  * duplicates, and PSI's zero-on-identical / large-on-shifted behavior. */
class ProfileOpsSpec extends SparkSpec {
  import spark.implicits._

  // -- fdProfile -----------------------------------------------------

  test("fdProfile: a→b holds, b→a counts its violators and worst fan-out") {
    // b determines nothing: b=1 maps to a ∈ {x, y, z}
    val df = Seq(("x", 1), ("x", 1), ("y", 1), ("z", 1), ("w", 2))
      .toDF("a", "b")
    val got = ProfileOps.fdProfile(df, Seq("a" -> "b", "b" -> "a"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got("a->b") === ((4L, 0L, 1L, 1L))) // 4 lhs, no violations
    assert(got("b->a") === ((2L, 1L, 3L, 0L))) // b=1 fans out to 3 a's
  }

  test("fdProfile treats duplicate rows as one evidence pair " +
    "(distinct rhs per lhs, not row counts)") {
    val df = Seq(("k", "v"), ("k", "v"), ("k", "v")).toDF("a", "b")
    val r = ProfileOps.fdProfile(df, Seq("a" -> "b")).collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(4)) === ((1L, 0L, 1L)))
  }

  // -- candidateKeys -------------------------------------------------

  test("candidateKeys flags unique null-free columns as keys and " +
    "rejects columns with duplicates or nulls") {
    val df = Seq(
      (1L, "a", Some("x")), (2L, "a", Some("y")), (3L, "b", None))
      .toDF("id", "dup", "hasnull")
    val got = ProfileOps.candidateKeys(df, Seq("id", "dup", "hasnull"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getLong(5))).toMap
    assert(got("id") === ((3L, 3L, 0L, 1.0, 1L)))
    assert(got("dup") === ((3L, 2L, 0L, 0.666667, 0L)))
    // unique among non-nulls but has a null → not a key
    assert(got("hasnull") === ((3L, 2L, 1L, 0.666667, 0L)))
  }

  // -- psi -----------------------------------------------------------

  private def ts(day: Int, hour: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")

  test("psi is ~0 when both halves draw the same distribution and " +
    "exceeds the 0.25 alert line under a hard shift") {
    val rnd = new scala.util.Random(3)
    // every day carries the identical value set 0..99 → the two time
    // halves have the exact same bin profile → every PSI term is 0
    val same = (for { day <- 1 to 20; j <- 0 until 100 }
      yield (ts(day, j % 24), j.toDouble)).toDF("t", "v")
    val psiSame = ProfileOps.psi(same, "t", "v")
      .collect()(0).getAs[Double]("psi_total")
    assert(math.abs(psiSame) < 0.001, s"identical halves → psi ≈ 0: $psiSame")
    // second half shifted into the top decile
    val shifted = (0 until 2000).map { i =>
      val day = 1 + i % 20
      val v = if (day <= 10) rnd.nextInt(50).toDouble
              else 90.0 + rnd.nextInt(10)
      (ts(day, i % 24), v)
    }.toDF("t", "v")
    val psiShift = ProfileOps.psi(shifted, "t", "v")
      .collect()(0).getAs[Double]("psi_total")
    assert(psiShift > 0.25, s"hard shift must alert: $psiShift")
  }

  test("psi emits the full 10-bin spine (empty bins included, " +
    "smoothed) and per-bin terms sum to the total") {
    // all values in one bin → 9 empty bins must still appear
    val df = (0 until 100).map(i => (ts(1 + i % 20, i % 24), 5.0))
      .toDF("t", "v")
    val rows = ProfileOps.psi(df, "t", "v").collect()
    assert(rows.length === 10)
    val termSum = rows.map(_.getAs[Double]("psi_term")).sum
    val total = rows.head.getAs[Double]("psi_total")
    assert(math.abs(termSum - total) < 1e-4)
  }

  // -- corrMatrix ------------------------------------------------------

  test("corrMatrix: exact +1/-1 on linear columns, brute-force Pearson " +
    "on noise, NULL on a constant column") {
    val rnd = new scala.util.Random(51)
    val rows = (1 to 300).map { i =>
      val x = i.toDouble
      (x, 2 * x + 1, -3 * x + 7, rnd.nextInt(100).toDouble, 5.0)
    }
    val df = rows.toDF("x", "up", "down", "noise", "const")
    val got = ProfileOps.corrMatrix(df,
      Seq("x", "up", "down", "noise", "const")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got(("x", "up")) === Some(1.0))
    assert(got(("x", "down")) === Some(-1.0))
    assert(got(("up", "down")) === Some(-1.0))
    got.filter(_._1._2 == "const").values.foreach(v => assert(v.isEmpty))
    // brute-force Pearson for the noise pair
    val xs = rows.map(_._1); val ns = rows.map(_._4)
    val n = xs.size.toDouble
    val brute = (n * xs.zip(ns).map { case (a, b) => a * b }.sum -
      xs.sum * ns.sum) /
      math.sqrt((n * xs.map(a => a * a).sum - xs.sum * xs.sum) *
        (n * ns.map(b => b * b).sum - ns.sum * ns.sum))
    val noiseCorr = got.getOrElse(("noise", "x"),
      got(("x", "noise"))).get
    assert(math.abs(noiseCorr - brute) < 1e-5)
    assert(got.size === 10) // C(5,2) unordered pairs
  }

  // -- jsDivergence ----------------------------------------------------

  test("jsDivergence: ~0 on identical halves, bounded by ln 2 under a " +
    "total shift, symmetric in the halves, and per-bin terms sum to " +
    "the total") {
    def mk(rows: Seq[(Long, Double)]) = rows.map { case (t, v) =>
      (new Timestamp(t * 1000L), v) }.toDF("ts", "value")
    // identical halves: value distribution independent of time half
    val same = mk((0 until 2000).map(i => (i.toLong, (i % 50).toDouble)))
    val jsdSame = ProfileOps.jsDivergence(same, "ts", "value")
      .collect()(0).getAs[Double]("jsd_total")
    assert(math.abs(jsdSame) < 0.01, s"identical halves: $jsdSame")
    // disjoint supports: JSD must approach (and never exceed) ln 2
    val shift = mk((0 until 1000).map(i => (i.toLong, 1.0)) ++
      (1000 until 2000).map(i => (i.toLong, 1000.0)))
    val rows = ProfileOps.jsDivergence(shift, "ts", "value").collect()
    val jsdShift = rows(0).getAs[Double]("jsd_total")
    assert(jsdShift > 0.5 && jsdShift <= math.log(2.0) + 1e-9,
      s"hard shift: $jsdShift")
    // terms sum to the total (6dp)
    val termSum = rows.map(_.getAs[Double]("jsd_term")).sum
    assert(math.abs(termSum - jsdShift) < 1e-4)
    // symmetry: swapping the halves preserves the total
    val swapped = mk((0 until 1000).map(i => (i.toLong, 1000.0)) ++
      (1000 until 2000).map(i => (i.toLong, 1.0)))
    val jsdSwap = ProfileOps.jsDivergence(swapped, "ts", "value")
      .collect()(0).getAs[Double]("jsd_total")
    assert(math.abs(jsdSwap - jsdShift) < 1e-6)
  }

  // -- partialCorr -----------------------------------------------------

  test("partialCorr: x-y correlation through a shared driver z " +
    "vanishes when z is controlled, matches the brute-force closed " +
    "form, and NULLs on constant columns") {
    val rnd = new scala.util.Random(97)
    // x and y only related THROUGH z: controlling z should collapse
    // the raw correlation toward 0
    val rows = (1 to 2000).map { _ =>
      val z = rnd.nextDouble() * 10
      (z + rnd.nextDouble() * 0.8, 2 * z + rnd.nextDouble() * 0.8, z)
    }
    val df = rows.toDF("x", "y", "z")
    val r = ProfileOps.partialCorr(df, "x", "y", "z").collect()(0)
    assert(r.getAs[Double]("r_xy") > 0.9, "raw x-y must look strong")
    assert(math.abs(r.getAs[Double]("partial_corr")) < 0.15,
      s"controlled x-y must collapse: ${r.getAs[Double]("partial_corr")}")
    // brute-force closed form
    def pearson(a: Seq[Double], b: Seq[Double]): Double = {
      val n = a.size.toDouble
      val (sa, sb) = (a.sum, b.sum)
      val saa = a.map(v => v * v).sum; val sbb = b.map(v => v * v).sum
      val sab = a.zip(b).map { case (u, v) => u * v }.sum
      (n * sab - sa * sb) /
        math.sqrt((n * saa - sa * sa) * (n * sbb - sb * sb))
    }
    val (xs, ys, zs) = (rows.map(_._1), rows.map(_._2), rows.map(_._3))
    val (rxy, rxz, ryz) =
      (pearson(xs, ys), pearson(xs, zs), pearson(ys, zs))
    val brute = (rxy - rxz * ryz) /
      math.sqrt((1 - rxz * rxz) * (1 - ryz * ryz))
    assert(math.abs(r.getAs[Double]("partial_corr") - brute) < 1e-4)
    // constant z → zero variance → NULL partial correlation
    val const = rows.map { case (x, y, _) => (x, y, 5.0) }
      .toDF("x", "y", "z")
    val rc = ProfileOps.partialCorr(const, "x", "y", "z").collect()(0)
    assert(rc.isNullAt(rc.fieldIndex("partial_corr")))
  }

  // -- calibration -------------------------------------------------------

  test("calibration: a perfectly calibrated score gets ~0 ECE and gap, " +
    "an anti-calibrated one pages, Brier matches the brute force, and " +
    "the 10-bin spine is always complete") {
    import spark.implicits._
    // perfectly calibrated: within each bin, positives occur at the
    // bin's probability (deterministic striping)
    val calib = (0 until 10).flatMap { b =>
      val p = b / 10.0 + 0.05
      (0 until 200).map(i => (p, i < (200 * p).round))
    }
    val dfC = calib.toDF("prob", "label")
    val rc = ProfileOps.calibration(dfC, "prob", "label").collect()
    assert(rc.length === 10)
    assert(rc.head.getAs[Double]("ece") < 0.01)
    rc.foreach(r => assert(math.abs(r.getAs[Double]("gap")) < 0.01,
      s"bin ${r.getLong(0)}"))
    // brute-force Brier
    val brierBrute = calib.map { case (p, y) =>
      val yd = if (y) 1.0 else 0.0; (p - yd) * (p - yd)
    }.sum / calib.size
    assert(math.abs(rc.head.getAs[Double]("brier") - brierBrute) < 1e-6)
    // anti-calibrated: high scores never come true
    val anti = (0 until 10).flatMap { b =>
      val p = b / 10.0 + 0.05
      (0 until 200).map(_ => (p, p < 0.5))
    }
    val ra = ProfileOps.calibration(anti.toDF("prob", "label"),
      "prob", "label").collect()
    assert(ra.head.getAs[Double]("ece") > 0.3)
    // sparse scores still emit the full spine with NULL rates
    val sparse = Seq((0.95, true), (0.92, false)).toDF("prob", "label")
    val rs = ProfileOps.calibration(sparse, "prob", "label").collect()
    assert(rs.length === 10)
    assert(rs.count(_.isNullAt(2)) === 9, "empty bins must be NULL")
  }

  // -- mahalanobisOutliers ---------------------------------------------

  test("mahalanobisOutliers flags the jointly-improbable planted row " +
    "that every marginal fence misses, matches the brute-force " +
    "distance, and returns empty on singular covariance") {
    val rnd = new scala.util.Random(31)
    // y tracks x tightly; the planted row has x and y each well inside
    // their own marginal ranges but in an impossible COMBINATION
    val base = (1 to 1000).map { i =>
      val x = 10.0 + rnd.nextInt(20)
      (i.toLong, x, 3 * x + rnd.nextDouble(), rnd.nextInt(5).toDouble)
    }
    val planted = (9999L, 12.0, 85.0, 2.0) // x low, y high: joint outlier
    val df = (base :+ planted).toDF("id", "x", "y", "z")
    val out = ProfileOps.mahalanobisOutliers(df, "id",
      Seq("x", "y", "z"), 16.27).collect()
    assert(out.map(_.getLong(0)).contains(9999L),
      "the planted joint outlier must be flagged")
    // brute-force d² for the planted row
    val rows = (base :+ planted).map(t => Array(t._2, t._3, t._4))
    val n = rows.size.toDouble
    val mu = Array.tabulate(3)(j => rows.map(_(j)).sum / n)
    def cov(a: Int, b: Int): Double =
      rows.map(r => (r(a) - mu(a)) * (r(b) - mu(b))).sum / (n - 1)
    val (a00, a01, a02) = (cov(0, 0), cov(0, 1), cov(0, 2))
    val (a11, a12, a22) = (cov(1, 1), cov(1, 2), cov(2, 2))
    val det = a00 * (a11 * a22 - a12 * a12) -
      a01 * (a01 * a22 - a02 * a12) + a02 * (a01 * a12 - a02 * a11)
    val inv = Array(
      Array((a11 * a22 - a12 * a12) / det, (a02 * a12 - a01 * a22) / det,
        (a01 * a12 - a02 * a11) / det),
      Array(0.0, (a00 * a22 - a02 * a02) / det,
        (a02 * a01 - a00 * a12) / det),
      Array(0.0, 0.0, (a00 * a11 - a01 * a01) / det))
    val c = Array(12.0 - mu(0), 85.0 - mu(1), 2.0 - mu(2))
    val d2 = inv(0)(0) * c(0) * c(0) + inv(1)(1) * c(1) * c(1) +
      inv(2)(2) * c(2) * c(2) +
      2.0 * (inv(0)(1) * c(0) * c(1) + inv(0)(2) * c(0) * c(2) +
        inv(1)(2) * c(1) * c(2))
    val got = out.find(_.getLong(0) == 9999L).get.getAs[Double]("d2")
    assert(math.abs(got - d2) < 1e-3, s"got $got brute $d2")
    // z constant AND z' = 2z collinear → singular covariance → empty
    val sing = base.map(t => (t._1, t._2, t._2 * 2.0, t._2 * 3.0))
      .toDF("id", "x", "y", "z")
    assert(ProfileOps.mahalanobisOutliers(sing, "id",
      Seq("x", "y", "z"), 1.0).isEmpty)
  }

  // -- spearman --------------------------------------------------------

  test("isotonicCalibration equals a brute-force sequential PAV on " +
    "random fixtures, is monotone, and passes monotone inputs " +
    "through unchanged") {
    import spark.implicits._
    // brute-force PAV: sequential pool-adjacent-violators over the
    // per-bin (weight, positives) sequence
    def brutePav(bins: Seq[(Long, Long)]): Seq[Double] = {
      case class Pool(var w: Long, var p: Long, var size: Int)
      val pools = scala.collection.mutable.ArrayBuffer[Pool]()
      bins.foreach { case (w, p) =>
        pools += Pool(w, p, 1)
        while (pools.size >= 2 &&
            pools(pools.size - 2).p.toDouble / pools(pools.size - 2).w >=
              pools.last.p.toDouble / pools.last.w) {
          val last = pools.remove(pools.size - 1)
          pools.last.w += last.w; pools.last.p += last.p
          pools.last.size += last.size
        }
      }
      pools.flatMap(pl =>
        Seq.fill(pl.size)(pl.p.toDouble / pl.w)).toSeq
    }
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    val rnd = new scala.util.Random(61)
    (1 to 4).foreach { trial =>
      // rows whose prob lands each in a known bin (bin b -> p in
      // [b/10, (b+1)/10)), random per-bin sizes and positive rates
      val rows = (0 until 10).flatMap { b =>
        val n = 5 + rnd.nextInt(40)
        val pos = rnd.nextInt(n + 1)
        (0 until n).map(i =>
          (b / 10.0 + 0.05, if (i < pos) 1 else 0))
      }
      val df = rows.toDF("prob", "label")
        .select(col("prob"), (col("label") === 1).as("label"))
      val got = ProfileOps.isotonicCalibration(df, "prob", "label")
        .collect()
      val byBin = rows.groupBy(r => math.floor(r._1 * 10).toLong)
        .toSeq.sortBy(_._1)
        .map { case (_, rs) =>
          (rs.size.toLong, rs.count(_._2 == 1).toLong) }
      val exp = brutePav(byBin).map(r6)
      assert(got.map(_.getAs[Double]("calibrated")).toSeq === exp,
        s"trial $trial")
      // monotone law
      val cal = got.map(_.getAs[Double]("calibrated"))
      assert(cal.zip(cal.tail).forall { case (a, b) => a <= b })
      // calibrated == pos_rate wherever the input was already monotone
      val rates = got.map(_.getAs[Double]("pos_rate"))
      if (rates.zip(rates.tail).forall { case (a, b) => a <= b })
        assert(cal.toSeq === rates.toSeq)
    }
    // anti-monotone input pools everything to the global rate
    val anti = (0 until 10).flatMap { b =>
      (0 until 10).map(i => (b / 10.0 + 0.05, if (i < 9 - b) 1 else 0))
    }.toDF("prob", "label")
      .select(col("prob"), (col("label") === 1).as("label"))
    val rAnti = ProfileOps.isotonicCalibration(anti, "prob", "label")
      .collect()
    val global = rAnti.map(_.getAs[Long]("n")).sum
    assert(rAnti.map(_.getAs[Double]("calibrated")).distinct.length
      === 1, "a strictly worsening score must pool to one rate")
  }

  test("spearman: exactly 1 on any monotone transform, -1 on an " +
    "anti-monotone one, and matches brute-force tie-averaged rho") {
    val rnd = new scala.util.Random(61)
    val xs = (1 to 400).map(_ => rnd.nextInt(50).toDouble)
    val mono = xs.map(x => (x, x * x * x + 5))  // monotone, nonlinear
    val anti = xs.map(x => (x, -math.exp(x / 10)))
    assert(ProfileOps.spearman(mono.toDF("x", "y"), "x", "y")
      .collect()(0).getAs[Double]("spearman_rho") === 1.0)
    assert(ProfileOps.spearman(anti.toDF("x", "y"), "x", "y")
      .collect()(0).getAs[Double]("spearman_rho") === -1.0)
    // brute force with average ranks under ties
    val ys = xs.map(_ => rnd.nextInt(30).toDouble)
    def avgRanks(v: Seq[Double]): Seq[Double] = {
      val sorted = v.sorted
      v.map { x =>
        val lo = sorted.count(_ < x); val c = sorted.count(_ == x)
        lo + (c + 1) / 2.0
      }
    }
    val rx = avgRanks(xs); val ry = avgRanks(ys)
    val n = xs.size.toDouble
    val brute = (n * rx.zip(ry).map { case (a, b) => a * b }.sum -
      rx.sum * ry.sum) /
      math.sqrt((n * rx.map(a => a * a).sum - rx.sum * rx.sum) *
        (n * ry.map(b => b * b).sum - ry.sum * ry.sum))
    val got = ProfileOps.spearman(xs.zip(ys).toDF("x", "y"), "x", "y")
      .collect()(0).getAs[Double]("spearman_rho")
    assert(math.abs(got - brute) < 1e-6, s"got $got brute $brute")
  }

  test("spearmanMatrix: every pair equals the pairwise spearman, " +
    "C(k,2) shape, NULL on a constant column") {
    val rnd = new scala.util.Random(73)
    val rows = (1 to 300).map { _ =>
      val a = rnd.nextInt(40).toDouble
      (a, a * a + rnd.nextInt(10), rnd.nextInt(25).toDouble, 7.0)
    }
    val df = rows.toDF("a", "b", "c", "konst")
    val m = ProfileOps.spearmanMatrix(df, Seq("a", "b", "c", "konst"))
      .collect()
    assert(m.length === 6) // C(4,2)
    val byPair = m.map(r => (r.getString(0), r.getString(1)) ->
      Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    // matrix entries ≡ the single-pair operator
    Seq(("a", "b"), ("a", "c"), ("b", "c")).foreach { case (x, y) =>
      val single = ProfileOps.spearman(df, x, y).collect()(0)
        .getAs[Double]("spearman_rho")
      assert(byPair((x, y)) === Some(single), s"pair ($x,$y)")
    }
    // constant column: zero rank variance → NULL, not a crash
    Seq("a", "b", "c").foreach { x =>
      assert(byPair((x, "konst")).isEmpty, s"($x, konst) must be NULL")
    }
    // all rows share the n of the input
    assert(m.forall(_.getAs[Long]("n") === 300L))
  }

  // -- brierDecomp ------------------------------------------------------

  test("brierDecomp: the Murphy identity holds, a perfect forecaster " +
    "scores brier 0 with resolution = uncertainty, and a constant " +
    "base-rate forecast has zero reliability and resolution") {
    import spark.implicits._
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    // mixed random forecasts: the identity brier = rel - res + unc +
    // within_var must hold to rounding
    val rnd = new scala.util.Random(71)
    val mixed = (1 to 500).map { _ =>
      val p = rnd.nextInt(100) / 100.0
      (p, rnd.nextDouble() < p * 0.8 + 0.1)
    }.toDF("prob", "label")
    val m = ProfileOps.brierDecomp(mixed, "prob", "label").collect()(0)
    val lhs = m.getAs[Double]("brier")
    val rhs = m.getAs[Double]("reliability") -
      m.getAs[Double]("resolution") + m.getAs[Double]("uncertainty") +
      m.getAs[Double]("within_var")
    assert(math.abs(lhs - rhs) < 5e-6)
    // the within-bin residual is small relative to the score (it is
    // variance minus twice the within-bin p-y covariance — either
    // sign, bounded by the bin width scale)
    assert(math.abs(m.getAs[Double]("within_var")) <
      m.getAs[Double]("brier"))
    // perfect forecaster: p = y exactly
    val perfect = ((1 to 30).map(_ => (1.0, true)) ++
      (1 to 70).map(_ => (0.0, false))).toDF("prob", "label")
    val pf = ProfileOps.brierDecomp(perfect, "prob", "label")
      .collect()(0)
    assert(pf.getAs[Double]("brier") === 0.0)
    assert(pf.getAs[Double]("reliability") === 0.0)
    assert(pf.getAs[Double]("resolution") ===
      pf.getAs[Double]("uncertainty"))
    assert(r6(pf.getAs[Double]("uncertainty")) === r6(0.3 * 0.7))
    // constant base-rate forecast: nothing to recalibrate, nothing
    // discriminated — brier = uncertainty exactly
    val const = ((1 to 30).map(_ => (0.3, true)) ++
      (1 to 70).map(_ => (0.3, false))).toDF("prob", "label")
    val cf = ProfileOps.brierDecomp(const, "prob", "label").collect()(0)
    assert(cf.getAs[Double]("reliability") === 0.0)
    assert(cf.getAs[Double]("resolution") === 0.0)
    assert(cf.getAs[Double]("brier") ===
      r6(cf.getAs[Double]("uncertainty")))
  }

  test("vif: independent columns give VIF 1; x3 = x1 + x2 blows all " +
    "three up; VIF matches the closed form at a planted correlation") {
    val rnd = new scala.util.Random(23)
    val ind = (1 to 3000).map(_ =>
      (rnd.nextGaussian(), rnd.nextGaussian(), rnd.nextGaussian()))
      .toDF("x1", "x2", "x3")
    val r0 = ProfileOps.vif(ind, Seq("x1", "x2", "x3")).collect()
    assert(r0.length === 3)
    r0.foreach(r => assert(math.abs(r.getAs[Double]("vif") - 1.0)
      < 0.05, r.toString))
    // near-exact collinearity: x3 = x1 + x2 + tiny noise
    val coll = (1 to 3000).map { _ =>
      val a = rnd.nextGaussian(); val b = rnd.nextGaussian()
      (a, b, a + b + rnd.nextGaussian() * 1e-3)
    }.toDF("x1", "x2", "x3")
    val r1 = ProfileOps.vif(coll, Seq("x1", "x2", "x3")).collect()
    assert(r1.forall(_.getAs[Double]("vif") > 100.0))
    // two-correlated-one-free: VIF(x1) = VIF(x2) = 1/(1-rho^2)
    val rho = 0.8
    val tc = (1 to 200000).map { _ =>
      val a = rnd.nextGaussian()
      val b = rho * a + math.sqrt(1 - rho * rho) * rnd.nextGaussian()
      (a, b, rnd.nextGaussian())
    }.toDF("x1", "x2", "x3")
    val r2 = ProfileOps.vif(tc, Seq("x1", "x2", "x3")).collect()
    val v1 = r2.find(_.getString(0) == "x1").get.getAs[Double]("vif")
    assert(math.abs(v1 - 1.0 / (1 - rho * rho)) < 0.1, s"vif=$v1")
    val v3 = r2.find(_.getString(0) == "x3").get.getAs[Double]("vif")
    assert(math.abs(v3 - 1.0) < 0.05)
  }

  test("woeIv: hand-computed WoE/IV on a 2-level fixture; pure cells " +
    "go NULL and drop from the total; iv equals the term sum") {
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    // level u: 30 pos / 10 neg; level w: 10 pos / 50 neg
    val rows = Seq.fill(30)(("u", true)) ++ Seq.fill(10)(("u", false)) ++
      Seq.fill(10)(("w", true)) ++ Seq.fill(50)(("w", false))
    val df = rows.toDF("lvl", "lbl")
    val out = ProfileOps.woeIv(df, "lvl", "lbl").collect()
    val u = out.find(_.getString(0) == "u").get
    val wU = math.log((30.0 / 40) / (10.0 / 60))
    assert(u.getAs[Double]("woe") === r6(wU))
    assert(u.getAs[Long]("n_pos") === 30L)
    val termU = (30.0 / 40 - 10.0 / 60) * wU
    assert(u.getAs[Double]("iv_term") === r6(termU))
    val wW = math.log((10.0 / 40) / (50.0 / 60))
    val termW = (10.0 / 40 - 50.0 / 60) * wW
    assert(u.getAs[Double]("iv") === r6(termU + termW))
    // a pure level (no negatives) has NULL woe and is excluded
    val withPure = (rows ++ Seq.fill(5)(("p", true))).toDF("lvl", "lbl")
    val out2 = ProfileOps.woeIv(withPure, "lvl", "lbl").collect()
    val p = out2.find(_.getString(0) == "p").get
    assert(p.isNullAt(p.fieldIndex("woe")))
    assert(out2.forall(r => !r.isNullAt(r.fieldIndex("iv"))))
  }
}
