package graft

import graft.operators.{HypothesisOps, StatsOps}
import org.apache.spark.sql.functions._

/** Laws for the nonparametric two-sample tier: KS against a
  * brute-force ECDF sweep, Mann–Whitney against a brute-force average-
  * rank computation (ties included), the U + U' = nA·nB symmetry, and
  * HHI's closed forms on monopoly / equal-share fixtures. */
class HypothesisOpsSpec extends SparkSpec {
  import spark.implicits._

  private def r6(x: Double): Double = math.round(x * 1e6) / 1e6

  // -- ksTest --------------------------------------------------------

  private def bruteKs(a: Seq[Double], b: Seq[Double]): Double = {
    val vs = (a ++ b).distinct.sorted
    vs.map { v =>
      math.abs(a.count(_ <= v).toDouble / a.size -
        b.count(_ <= v).toDouble / b.size)
    }.max
  }

  test("ksTest equals the brute-force ECDF max-gap on tied, shifted, " +
    "and identical samples") {
    val rnd = new scala.util.Random(19)
    val a = Seq.fill(300)(rnd.nextInt(40).toDouble)
    val shifted = Seq.fill(250)(10.0 + rnd.nextInt(40))
    val cases = Seq((a, shifted), (a, a.map(identity)))
    cases.foreach { case (xs, ys) =>
      val df = (xs.map(("A", _)) ++ ys.map(("B", _))).toDF("g", "v")
      val row = HypothesisOps.ksTest(df, "v", "g", "A", "B").collect()(0)
      assert(row.getAs[Long]("n_a") === xs.size.toLong)
      assert(row.getAs[Double]("d_stat") === r6(bruteKs(xs, ys)))
    }
    // identical samples: zero gap, p capped at 1
    val same = (a.map(("A", _)) ++ a.map(("B", _))).toDF("g", "v")
    val r = HypothesisOps.ksTest(same, "v", "g", "A", "B").collect()(0)
    assert(r.getAs[Double]("d_stat") === 0.0)
    assert(r.getAs[Double]("p_value") === 1.0)
  }

  test("ksTest detects a hard shift with a near-zero p-value") {
    val a = (1 to 200).map(i => ("A", i.toDouble))
    val b = (1 to 200).map(i => ("B", i + 1000.0))
    val r = HypothesisOps.ksTest((a ++ b).toDF("g", "v"), "v", "g",
      "A", "B").collect()(0)
    assert(r.getAs[Double]("d_stat") === 1.0)
    assert(r.getAs[Double]("p_value") === 0.0)
  }

  // -- wasserstein / cvmTest ------------------------------------------

  private def bruteW1(a: Seq[Double], b: Seq[Double]): Double = {
    val vs = (a ++ b).distinct.sorted
    vs.zip(vs.tail).map { case (v, vNext) =>
      math.abs(a.count(_ <= v).toDouble / a.size -
        b.count(_ <= v).toDouble / b.size) * (vNext - v)
    }.sum
  }

  private def bruteCvm(a: Seq[Double], b: Seq[Double]): Double = {
    val pooled = a ++ b
    val sq = pooled.map { z =>
      val d = a.count(_ <= z).toDouble / a.size -
        b.count(_ <= z).toDouble / b.size
      d * d
    }.sum
    a.size.toDouble * b.size / (pooled.size.toDouble * pooled.size) * sq
  }

  test("wasserstein equals the brute-force ECDF integral on tied " +
    "random samples, a pure shift, and identical samples") {
    val rnd = new scala.util.Random(23)
    val a = Seq.fill(300)(rnd.nextInt(40).toDouble)
    val b = Seq.fill(250)(7.0 + rnd.nextInt(40))
    val df = (a.map(("A", _)) ++ b.map(("B", _))).toDF("g", "v")
    val r = HypothesisOps.wasserstein(df, "v", "g", "A", "B").collect()(0)
    assert(r.getAs[Long]("n_a") === 300L)
    assert(r.getAs[Long]("n_b") === 250L)
    assert(math.abs(r.getAs[Double]("w1") - bruteW1(a, b)) < 1e-5)
    // pure shift by c: W1 is exactly c
    val shifted = (a.map(("A", _)) ++ a.map(x => ("B", x + 13.0)))
      .toDF("g", "v")
    val s = HypothesisOps.wasserstein(shifted, "v", "g", "A", "B")
      .collect()(0)
    assert(math.abs(s.getAs[Double]("w1") - 13.0) < 1e-6)
    val same = (a.map(("A", _)) ++ a.map(("B", _))).toDF("g", "v")
    val z = HypothesisOps.wasserstein(same, "v", "g", "A", "B")
      .collect()(0)
    assert(z.getAs[Double]("w1") === 0.0)
  }

  test("cvmTest equals the brute-force pooled mean-squared ECDF gap " +
    "and is zero on identical samples") {
    val rnd = new scala.util.Random(29)
    val a = Seq.fill(280)(rnd.nextInt(30).toDouble)
    val b = Seq.fill(320)(4.0 + rnd.nextInt(30))
    val df = (a.map(("A", _)) ++ b.map(("B", _))).toDF("g", "v")
    val r = HypothesisOps.cvmTest(df, "v", "g", "A", "B").collect()(0)
    assert(math.abs(r.getAs[Double]("t_cvm") - bruteCvm(a, b)) < 1e-5)
    val same = (a.map(("A", _)) ++ a.map(("B", _))).toDF("g", "v")
    val z = HypothesisOps.cvmTest(same, "v", "g", "A", "B").collect()(0)
    assert(z.getAs[Double]("t_cvm") === 0.0)
  }

  // -- energyDistance --------------------------------------------------

  private def bruteEnergy(a: Seq[Double], b: Seq[Double])
      : (Double, Double) = {
    def meanAbs(x: Seq[Double], y: Seq[Double]): Double =
      x.flatMap(u => y.map(v => math.abs(u - v))).sum /
        (x.size.toDouble * y.size)
    val exy = meanAbs(a, b)
    (exy, 2 * exy - meanAbs(a, a) - meanAbs(b, b))
  }

  test("energyDistance equals the brute-force pairwise expectations, " +
    "vanishes on identical samples, and hits 2c on point masses c " +
    "apart") {
    val rnd = new scala.util.Random(31)
    val a = Seq.fill(120)(rnd.nextInt(25).toDouble)
    val b = Seq.fill(150)(6.0 + rnd.nextInt(25))
    val df = (a.map(("A", _)) ++ b.map(("B", _))).toDF("g", "v")
    val r = HypothesisOps.energyDistance(df, "v", "g", "A", "B")
      .collect()(0)
    val (exy, e) = bruteEnergy(a, b)
    assert(math.abs(r.getAs[Double]("e_xy") - exy) < 1e-5)
    assert(math.abs(r.getAs[Double]("e_dist") - e) < 1e-5)
    assert(math.abs(r.getAs[Double]("t_stat") -
      120.0 * 150 / 270 * e) < 1e-3)
    val same = (a.map(("A", _)) ++ a.map(("B", _))).toDF("g", "v")
    val z = HypothesisOps.energyDistance(same, "v", "g", "A", "B")
      .collect()(0)
    assert(z.getAs[Double]("e_dist") === 0.0)
    // point masses at 0 and 7: E|X-Y| = 7, within-terms 0, E = 14
    val pm = (Seq.fill(5)(("A", 0.0)) ++ Seq.fill(3)(("B", 7.0)))
      .toDF("g", "v")
    val p = HypothesisOps.energyDistance(pm, "v", "g", "A", "B")
      .collect()(0)
    assert(p.getAs[Double]("e_xy") === 7.0)
    assert(p.getAs[Double]("e_dist") === 14.0)
  }

  // -- liftTable -------------------------------------------------------

  test("liftTable: perfect separation puts every positive in the top " +
    "bin at lift 1/rate, giant tie collapses to one bin, and a random " +
    "tied fixture matches the documented arithmetic binning") {
    // 100 positives score above 400 negatives; nD=5 => bins of 100
    val sep = ((1 to 100).map(i => ("P", 1000.0 + i)) ++
      (1 to 400).map(i => ("N", i.toDouble))).toDF("g", "v")
    val rows = HypothesisOps.liftTable(sep, "v", "g", "P", "N", 5)
      .collect()
    assert(rows.map(_.getAs[Int]("decile")).toSeq === Seq(1, 2, 3, 4, 5))
    assert(rows(0).getAs[Long]("n_pos") === 100L)
    assert(rows(0).getAs[Double]("resp_rate") === 1.0)
    assert(rows(0).getAs[Double]("lift") === 5.0)
    assert(rows(0).getAs[Double]("cum_gain") === 1.0)
    assert(rows.drop(1).forall(_.getAs[Long]("n_pos") == 0L))
    assert(rows(4).getAs[Double]("cum_lift") === 1.0)
    // one giant tie: a single bin holding everything
    val tie = ((1 to 30).map(_ => ("P", 5.0)) ++
      (1 to 70).map(_ => ("N", 5.0))).toDF("g", "v")
    val t = HypothesisOps.liftTable(tie, "v", "g", "P", "N", 10)
      .collect()
    assert(t.length === 1 && t(0).getAs[Int]("decile") === 1)
    assert(t(0).getAs[Long]("n") === 100L)
    assert(t(0).getAs[Double]("cum_gain") === 1.0)
    // random tied fixture vs brute-force arithmetic binning
    val rnd = new scala.util.Random(37)
    val xs = Seq.fill(500)(
      (if (rnd.nextBoolean()) "P" else "N", rnd.nextInt(40).toDouble))
    val n = xs.size
    val byV = xs.groupBy(_._2).toSeq.sortBy(_._1)
    val cums = byV.scanLeft(0)((acc, g) => acc + g._2.size).tail
    val brute = byV.zip(cums).groupBy { case ((_, _), cum) =>
      ((n - cum).toLong * 10 / n).toInt + 1
    }.map { case (d, gs) =>
      (d, gs.map(_._1._2.size).sum.toLong,
        gs.map(_._1._2.count(_._1 == "P")).sum.toLong)
    }.toSeq.sortBy(_._1)
    val got = HypothesisOps.liftTable(xs.toDF("g", "v"), "v", "g",
      "P", "N", 10).collect()
      .map(r => (r.getAs[Int]("decile"), r.getAs[Long]("n"),
        r.getAs[Long]("n_pos"))).toSeq
    assert(got === brute)
  }

  // -- ksBy --------------------------------------------------------------

  test("ksBy: each segment equals the ungrouped ksTest on that " +
    "segment's rows, and a single-class segment emits NULL without " +
    "being dropped") {
    val rnd = new scala.util.Random(67)
    val rows = (1 to 600).map { i =>
      val seg = s"s${i % 3}"
      val g = if (rnd.nextBoolean()) "A" else "B"
      val v = rnd.nextInt(30).toDouble +
        (if (g == "A" && seg == "s1") 8.0 else 0.0)
      (seg, g, v)
    } ++ (1 to 20).map(i => ("mono", "A", i.toDouble))
    val df = rows.toDF("seg", "g", "v")
    val got = HypothesisOps.ksBy(df, "v", "g", "A", "B", "seg")
      .collect().map(r => r.getAs[String]("seg") -> r).toMap
    assert(got.keySet === Set("s0", "s1", "s2", "mono"))
    Seq("s0", "s1", "s2").foreach { sg =>
      val sub = rows.filter(_._1 == sg).map(t => (t._2, t._3))
        .toDF("g", "v")
      val exp = HypothesisOps.ksTest(sub, "v", "g", "A", "B")
        .collect()(0)
      assert(got(sg).getAs[Double]("d_stat") ===
        exp.getAs[Double]("d_stat"), sg)
      assert(got(sg).getAs[Double]("p_value") ===
        exp.getAs[Double]("p_value"), sg)
    }
    assert(got("mono").isNullAt(got("mono").fieldIndex("d_stat")))
    assert(got("mono").getAs[Long]("n_b") === 0L)
  }

  // -- fdrBh / twoSidedNormalP ------------------------------------------

  test("fdrBh matches the brute-force step-up q-values, rejects " +
    "nothing on uniform-null p-values at tight alpha, everything on " +
    "all-tiny p-values, and caps q at 1") {
    def bruteQ(ps: Seq[Double]): Seq[Double] = {
      val m = ps.size
      val sorted = ps.sorted.zipWithIndex
        .map { case (p, i) => p * m / (i + 1) }
      // running min from the largest rank down, capped at 1
      sorted.scanRight(Double.MaxValue)(math.min).init.map(math.min(_, 1.0))
    }
    val rnd = new scala.util.Random(47)
    val ps = Seq.fill(40)(rnd.nextDouble())
    val df = ps.zipWithIndex.map { case (p, i) => (s"h$i", p) }
      .toDF("k", "p")
    val got = HypothesisOps.fdrBh(df, "k", "p", 0.1).collect()
    val expected = bruteQ(ps).map(q => math.round(q * 1e6) / 1e6)
    assert(got.map(_.getAs[Double]("q_value")).toSeq === expected)
    assert(got.map(_.getAs[Int]("rank")).toSeq === (1 to 40))
    // monotone non-decreasing in rank
    val qs = got.map(_.getAs[Double]("q_value"))
    assert(qs.zip(qs.tail).forall { case (a, b) => a <= b })
    // all-tiny: everything rejected; q capped at 1 on p = 1 rows
    val tiny = (1 to 10).map(i => (s"t$i", 1e-8)).toDF("k", "p")
    assert(HypothesisOps.fdrBh(tiny, "k", "p").collect()
      .forall(_.getAs[Boolean]("rejected")))
    val ones = (1 to 5).map(i => (s"o$i", 1.0)).toDF("k", "p")
    assert(HypothesisOps.fdrBh(ones, "k", "p").collect()
      .forall(r => r.getAs[Double]("q_value") == 1.0 &&
        !r.getAs[Boolean]("rejected")))
  }

  test("twoSidedNormalP tracks the exact two-sided normal p within " +
    "1e-6 across the z range and is symmetric in the sign of z") {
    import org.apache.spark.sql.functions.col
    def exactP(z: Double): Double = {
      // 2*(1-Phi(|z|)) via erfc with a high-precision series
      val x = math.abs(z) / math.sqrt(2.0)
      // Numerical Recipes erfc approximation (|eps| < 1.2e-7)
      val t = 1.0 / (1.0 + 0.5 * x)
      val e = t * math.exp(-x * x - 1.26551223 + t * (1.00002368 +
        t * (0.37409196 + t * (0.09678418 + t * (-0.18628806 +
        t * (0.27886807 + t * (-1.13520398 + t * (1.48851587 +
        t * (-0.82215223 + t * 0.17087277)))))))))
      e
    }
    val zs = Seq(-3.5, -2.0, -1.0, -0.5, 0.0, 0.1, 0.5, 1.0, 1.645,
      1.96, 2.0, 2.5, 3.0, 4.0)
    val got = zs.toDF("z")
      .select(col("z"), HypothesisOps.twoSidedNormalP(col("z")).as("p"))
      .collect().map(r => r.getAs[Double]("z") -> r.getAs[Double]("p"))
      .toMap
    zs.foreach { z =>
      assert(math.abs(got(z) - exactP(z)) < 1e-6, s"z=$z")
    }
    assert(got(-2.0) === got(2.0) || math.abs(got(-2.0) -
      exactP(2.0)) < 1e-9)
  }

  // -- mannWhitney ---------------------------------------------------

  private def bruteU(a: Seq[Double], b: Seq[Double]): Double = {
    val pooled = (a ++ b).sorted
    def avgRank(v: Double): Double = {
      val lo = pooled.count(_ < v); val c = pooled.count(_ == v)
      lo + (c + 1) / 2.0
    }
    a.map(avgRank).sum - a.size.toDouble * (a.size + 1) / 2
  }

  test("mannWhitney matches the brute-force tie-averaged rank sum and " +
    "swapping the groups mirrors U to nA·nB − U with z negated") {
    val rnd = new scala.util.Random(23)
    val a = Seq.fill(150)(rnd.nextInt(25).toDouble)   // heavy ties
    val b = Seq.fill(120)(5.0 + rnd.nextInt(25))
    val df = (a.map(("A", _)) ++ b.map(("B", _))).toDF("g", "v")
    val f = HypothesisOps.mannWhitney(df, "v", "g", "A", "B").collect()(0)
    assert(f.getAs[Double]("u") === r6(bruteU(a, b)))
    val g = HypothesisOps.mannWhitney(df, "v", "g", "B", "A").collect()(0)
    assert(f.getAs[Double]("u") + g.getAs[Double]("u") ===
      a.size.toDouble * b.size)
    assert(r6(f.getAs[Double]("z") + g.getAs[Double]("z")) === 0.0)
  }

  test("mannWhitney on identical distributions gives z near 0; on a " +
    "hard shift U saturates at nA·nB") {
    val a = (1 to 100).map(i => ("A", (i % 20).toDouble))
    val b = (1 to 100).map(i => ("B", (i % 20).toDouble))
    val same = HypothesisOps.mannWhitney((a ++ b).toDF("g", "v"),
      "v", "g", "A", "B").collect()(0)
    assert(math.abs(same.getAs[Double]("z")) < 0.01)
    val hi = (1 to 100).map(i => ("B", 1000.0 + i))
    val shift = HypothesisOps.mannWhitney((a ++ hi).toDF("g", "v"),
      "v", "g", "B", "A").collect()(0)
    assert(shift.getAs[Double]("u") === 100.0 * 100.0)
  }

  // -- hhi -----------------------------------------------------------

  // -- tTest -----------------------------------------------------------

  test("tTest: t = 0 on identical groups; hand-computed Welch t and " +
    "Satterthwaite dof on a fixed fixture") {
    val a = (1 to 200).map(i => ("A", (i % 17).toDouble))
    val same = a ++ a.map { case (_, v) => ("B", v) }
    val r0 = HypothesisOps.tTest(same.toDF("g", "v"), "v", "g",
      "A", "B").collect()(0)
    assert(r0.getAs[Double]("t_stat") === 0.0)
    assert(r0.getAs[Double]("mean_a") === r0.getAs[Double]("mean_b"))
    // hand fixture: unequal sizes AND variances (the Welch case)
    val xs = Seq(1.0, 2.0, 3.0, 4.0, 10.0)
    val ys = Seq(2.0, 2.5, 3.0)
    def meanVar(s: Seq[Double]): (Double, Double) = {
      val m = s.sum / s.size
      (m, s.map(x => (x - m) * (x - m)).sum / (s.size - 1))
    }
    val (ma, va) = meanVar(xs); val (mb, vb) = meanVar(ys)
    val ra = va / xs.size; val rb = vb / ys.size
    val t = (ma - mb) / math.sqrt(ra + rb)
    val dof = (ra + rb) * (ra + rb) /
      (ra * ra / (xs.size - 1) + rb * rb / (ys.size - 1))
    val df = (xs.map(("A", _)) ++ ys.map(("B", _))).toDF("g", "v")
    val r = HypothesisOps.tTest(df, "v", "g", "A", "B").collect()(0)
    assert(r.getAs[Long]("n_a") === xs.size.toLong)
    assert(r.getAs[Long]("n_b") === ys.size.toLong)
    assert(r.getAs[Double]("mean_a") === r6(ma))
    assert(r.getAs[Double]("t_stat") === r6(t))
    assert(r.getAs[Double]("dof") === r6(dof))
    // both groups constant → undefined standard error → NULL, not ±Inf
    val const = (Seq.fill(5)(("A", 7.0)) ++ Seq.fill(4)(("B", 3.0)))
      .toDF("g", "v")
    val rc = HypothesisOps.tTest(const, "v", "g", "A", "B").collect()(0)
    assert(rc.isNullAt(rc.fieldIndex("t_stat")))
  }

  test("auc: brute-force tie-credited rank AUC, 1.0 on perfect " +
    "separation, 0.5 on identical distributions, gini = 2*auc - 1") {
    val rnd = new scala.util.Random(29)
    val pos = Seq.fill(150)(rnd.nextInt(30).toDouble + 5)
    val neg = Seq.fill(200)(rnd.nextInt(30).toDouble)
    def bruteAuc(p: Seq[Double], n: Seq[Double]): Double = {
      val pairs = for (a <- p; b <- n) yield
        if (a > b) 1.0 else if (a == b) 0.5 else 0.0
      pairs.sum / (p.size * n.size)
    }
    val df = (pos.map(("P", _)) ++ neg.map(("N", _))).toDF("g", "v")
    val r = HypothesisOps.auc(df, "v", "g", "P", "N").collect()(0)
    assert(r.getAs[Long]("n_pos") === 150L)
    assert(r.getAs[Double]("auc") === r6(bruteAuc(pos, neg)))
    assert(math.abs(r.getAs[Double]("gini") -
      (2 * r.getAs[Double]("auc") - 1)) < 2e-6)
    // perfect separation and coin-flip
    val sep = (pos.map(x => ("P", x + 1000)) ++ neg.map(("N", _)))
      .toDF("g", "v")
    assert(HypothesisOps.auc(sep, "v", "g", "P", "N").collect()(0)
      .getAs[Double]("auc") === 1.0)
    val same = (pos.map(("P", _)) ++ pos.map(("N", _))).toDF("g", "v")
    assert(HypothesisOps.auc(same, "v", "g", "P", "N").collect()(0)
      .getAs[Double]("auc") === 0.5)
  }

  test("prAuc: brute-force block-wise average precision, 1.0 on " +
    "perfect separation, prevalence on a useless score") {
    val rnd = new scala.util.Random(37)
    val pos = Seq.fill(80)(rnd.nextInt(25).toDouble + 3)
    val neg = Seq.fill(220)(rnd.nextInt(25).toDouble)
    def bruteAp(p: Seq[Double], n: Seq[Double]): Double = {
      val blocks = (p.map((_, 1)) ++ n.map((_, 0)))
        .groupBy(_._1).toSeq.sortBy(-_._1)
        .map { case (_, xs) => (xs.count(_._2 == 1), xs.size) }
      var tp = 0; var seen = 0; var ap = 0.0
      blocks.foreach { case (bp, bn) =>
        tp += bp; seen += bn
        if (bp > 0) ap += bp.toDouble * tp / seen / p.size
      }
      ap
    }
    val df = (pos.map(("P", _)) ++ neg.map(("N", _))).toDF("g", "v")
    val r = HypothesisOps.prAuc(df, "v", "g", "P", "N").collect()(0)
    assert(math.abs(r.getAs[Double]("pr_auc") -
      bruteAp(pos, neg)) < 1e-5,
      s"got ${r.getAs[Double]("pr_auc")} brute ${bruteAp(pos, neg)}")
    assert(r.getAs[Double]("baseline") ===
      r6(80.0 / 300.0))
    // perfect separation → AP = 1
    val sep = (pos.map(x => ("P", x + 1000)) ++ neg.map(("N", _)))
      .toDF("g", "v")
    assert(HypothesisOps.prAuc(sep, "v", "g", "P", "N").collect()(0)
      .getAs[Double]("pr_auc") === 1.0)
    // a constant score ranks nothing: AP = prevalence exactly
    val flat = (pos.map(_ => ("P", 1.0)) ++ neg.map(_ => ("N", 1.0)))
      .toDF("g", "v")
    val rf = HypothesisOps.prAuc(flat, "v", "g", "P", "N").collect()(0)
    assert(rf.getAs[Double]("pr_auc") === rf.getAs[Double]("baseline"))
  }

  test("auc: a single-class input yields NULL auc/gini, not NaN") {
    val onlyPos = (1 to 40).map(i => ("P", i.toDouble)).toDF("g", "v")
    val r = HypothesisOps.auc(onlyPos, "v", "g", "P", "N").collect()(0)
    assert(r.getAs[Long]("n_pos") === 40L)
    assert(r.getAs[Long]("n_neg") === 0L)
    assert(r.isNullAt(r.fieldIndex("auc")), s"expected NULL auc: $r")
    assert(r.isNullAt(r.fieldIndex("gini")))
  }

  test("thresholdSweep: every cell matches the brute-force confusion " +
    "table at the pooled-percentile thresholds; perfect separation " +
    "and constant-score closed forms") {
    val rnd = new scala.util.Random(41)
    val pos = Seq.fill(120)(rnd.nextInt(40).toDouble + 8)
    val neg = Seq.fill(180)(rnd.nextInt(40).toDouble)
    val df = (pos.map(("P", _)) ++ neg.map(("N", _))).toDF("g", "v")
    val rows = HypothesisOps.thresholdSweep(df, "v", "g", "P", "N")
      .collect()
    assert(rows.length === 19)
    val pooled = (pos ++ neg).sorted
    val n = pooled.size
    rows.foreach { r =>
      val k = r.getAs[Long]("k").toInt
      val thr = pooled.distinct
        .find(v => pooled.count(_ <= v) * 20 >= k * n).get
      assert(r.getAs[Double]("threshold") === thr, s"k=$k")
      val tp = pos.count(_ >= thr); val fp = neg.count(_ >= thr)
      assert(r.getAs[Long]("tp") === tp.toLong, s"k=$k tp")
      assert(r.getAs[Long]("fp") === fp.toLong, s"k=$k fp")
      assert(r.getAs[Long]("fn") === (pos.size - tp).toLong)
      assert(r.getAs[Long]("tn") === (neg.size - fp).toLong)
      assert(r.getAs[Double]("precision") ===
        r6(tp.toDouble / (tp + fp)))
      assert(r.getAs[Double]("recall") === r6(tp.toDouble / pos.size))
      val p0 = tp.toDouble / (tp + fp); val r0 = tp.toDouble / pos.size
      if (tp > 0)
        assert(r.getAs[Double]("f1") === r6(2 * p0 * r0 / (p0 + r0)))
      assert(r.getAs[Double]("accuracy") ===
        r6((tp + neg.size - fp).toDouble / n))
    }
    // perfect separation: thresholds at/above the positive block give
    // a perfect operating point
    val sep = (pos.map(x => ("P", x + 1000)) ++ neg.map(("N", _)))
      .toDF("g", "v")
    val sepRows = HypothesisOps.thresholdSweep(sep, "v", "g", "P", "N")
      .collect()
    val atPos = sepRows.filter(_.getAs[Double]("threshold") > 1000)
    assert(atPos.nonEmpty)
    atPos.foreach { r =>
      assert(r.getAs[Double]("precision") === 1.0)
      assert(r.getAs[Long]("fp") === 0L)
    }
    // constant score: one distinct value, every threshold row is the
    // all-positive operating point (precision = prevalence, recall 1)
    val flat = (pos.map(_ => ("P", 7.0)) ++ neg.map(_ => ("N", 7.0)))
      .toDF("g", "v")
    val flatRows = HypothesisOps.thresholdSweep(flat, "v", "g", "P", "N")
      .collect()
    assert(flatRows.length === 19)
    flatRows.foreach { r =>
      assert(r.getAs[Double]("threshold") === 7.0)
      assert(r.getAs[Double]("precision") === r6(120.0 / 300.0))
      assert(r.getAs[Double]("recall") === 1.0)
      assert(r.getAs[Double]("accuracy") === r6(120.0 / 300.0))
    }
  }

  test("featureScreen: each feature's auc/ks equal the dedicated " +
    "operators on the same rows; degenerate labels go NULL") {
    val rnd = new scala.util.Random(59)
    val rows = (1 to 400).map { _ =>
      val lbl = rnd.nextBoolean()
      val f1 = rnd.nextInt(20).toDouble + (if (lbl) 6 else 0)
      val f2 = rnd.nextInt(40).toDouble // uninformative
      (lbl, f1, f2)
    }
    val df = rows.toDF("lbl", "f1", "f2")
    val screen = HypothesisOps.featureScreen(df, "lbl", Seq("f1", "f2"))
      .collect().map(r => r.getString(0) -> r).toMap
    Seq("f1", "f2").foreach { f =>
      val lab = df.select(col(f).as("v"),
        when(col("lbl"), "P").otherwise("N").as("g"))
      val a = HypothesisOps.auc(lab, "v", "g", "P", "N").collect()(0)
      val k = HypothesisOps.ksTest(lab, "v", "g", "P", "N").collect()(0)
      assert(screen(f).getAs[Double]("auc") === a.getAs[Double]("auc"),
        f)
      assert(screen(f).getAs[Double]("ks_d") ===
        k.getAs[Double]("d_stat"), f)
    }
    // the informative feature must separate, the noise one must not
    assert(screen("f1").getAs[Double]("auc") > 0.6)
    assert(math.abs(screen("f2").getAs[Double]("auc") - 0.5) < 0.1)
    // all-one-class label → NULL metrics, rows retained
    val one = df.withColumn("lbl", lit(true))
    val s1 = HypothesisOps.featureScreen(one, "lbl", Seq("f1"))
      .collect()(0)
    assert(s1.isNullAt(s1.fieldIndex("auc")))
    assert(s1.isNullAt(s1.fieldIndex("ks_d")))
  }

  test("aucCi: auc equals the point estimate, se matches brute-force " +
    "DeLong, and degenerate classes yield NULL") {
    val rnd = new scala.util.Random(47)
    val pos = Seq.fill(120)(rnd.nextInt(30).toDouble + 4)
    val neg = Seq.fill(200)(rnd.nextInt(30).toDouble)
    val df = (pos.map(("P", _)) ++ neg.map(("N", _))).toDF("g", "v")
    val r = HypothesisOps.aucCi(df, "v", "g", "P", "N").collect()(0)
    // brute-force DeLong: placements, sample variances, se
    def place(x: Double, other: Seq[Double]): Double =
      (other.count(_ < x) + 0.5 * other.count(_ == x)) / other.size
    val v10 = pos.map(place(_, neg)); val v01 = neg.map(x =>
      (pos.count(_ > x) + 0.5 * pos.count(_ == x)).toDouble / pos.size)
    def sVar(xs: Seq[Double]): Double = {
      val m = xs.sum / xs.size
      xs.map(x => (x - m) * (x - m)).sum / (xs.size - 1)
    }
    val bruteAuc = v10.sum / v10.size
    val bruteSe = math.sqrt(
      sVar(v10) / pos.size + sVar(v01) / neg.size)
    assert(math.abs(r.getAs[Double]("auc") - bruteAuc) < 1e-6)
    assert(math.abs(r.getAs[Double]("se") - bruteSe) < 1e-6,
      s"se ${r.getAs[Double]("se")} vs brute $bruteSe")
    assert(r.getAs[Double]("ci_lo") <= r.getAs[Double]("auc"))
    assert(r.getAs[Double]("ci_hi") >= r.getAs[Double]("auc"))
    // perfect separation: auc 1, ci_hi clamped at 1
    val sep = (pos.map(x => ("P", x + 1000)) ++ neg.map(("N", _)))
      .toDF("g", "v")
    val rs = HypothesisOps.aucCi(sep, "v", "g", "P", "N").collect()(0)
    assert(rs.getAs[Double]("auc") === 1.0)
    assert(rs.getAs[Double]("ci_hi") === 1.0)
    // a single-member class cannot carry a variance → NULL block
    val tiny = (Seq(("P", 5.0)) ++ neg.take(10).map(("N", _)))
      .toDF("g", "v")
    val rt = HypothesisOps.aucCi(tiny, "v", "g", "P", "N").collect()(0)
    assert(rt.isNullAt(rt.fieldIndex("se")))
    assert(rt.isNullAt(rt.fieldIndex("auc")))
  }

  test("aucCompare: aucs match the standalone operator, se matches " +
    "brute-force paired DeLong, identical scores give delta 0 with " +
    "NULL z, single-class goes NULL") {
    val rnd = new scala.util.Random(67)
    val rows = (1 to 300).map { _ =>
      val pos = rnd.nextBoolean()
      val a = rnd.nextInt(30).toDouble + (if (pos) 8 else 0)
      val b = rnd.nextInt(30).toDouble + (if (pos) 2 else 0)
      (if (pos) "P" else "N", a, b)
    }
    val df = rows.toDF("g", "a", "b")
    val r = HypothesisOps.aucCompare(df, "a", "b", "g", "P", "N")
      .collect()(0)
    // consistency with the standalone AUC
    val aA = HypothesisOps.auc(df.select(col("g"), col("a").as("v")),
      "v", "g", "P", "N").collect()(0).getAs[Double]("auc")
    val aB = HypothesisOps.auc(df.select(col("g"), col("b").as("v")),
      "v", "g", "P", "N").collect()(0).getAs[Double]("auc")
    assert(r.getAs[Double]("auc_a") === aA)
    assert(r.getAs[Double]("auc_b") === aB)
    // brute-force paired DeLong
    val pos = rows.filter(_._1 == "P"); val neg = rows.filter(_._1 == "N")
    def v10(x: Double, other: Seq[Double]): Double =
      (other.count(_ < x) + 0.5 * other.count(_ == x)) / other.size
    def v01(x: Double, other: Seq[Double]): Double =
      (other.count(_ > x) + 0.5 * other.count(_ == x)) / other.size
    val pA = pos.map(p => v10(p._2, neg.map(_._2)))
    val pB = pos.map(p => v10(p._3, neg.map(_._3)))
    val nA = neg.map(n => v01(n._2, pos.map(_._2)))
    val nB = neg.map(n => v01(n._3, pos.map(_._3)))
    def sCov(x: Seq[Double], y: Seq[Double]): Double = {
      val mx = x.sum / x.size; val my = y.sum / y.size
      x.zip(y).map { case (u, v) => (u - mx) * (v - my) }.sum /
        (x.size - 1)
    }
    val varD =
      (sCov(pA, pA) + sCov(pB, pB) - 2 * sCov(pA, pB)) / pos.size +
      (sCov(nA, nA) + sCov(nB, nB) - 2 * sCov(nA, nB)) / neg.size
    val bruteSe = math.sqrt(math.max(varD, 0.0))
    assert(math.abs(r.getAs[Double]("se") - bruteSe) < 1e-6,
      s"se ${r.getAs[Double]("se")} vs brute $bruteSe")
    assert(math.abs(r.getAs[Double]("delta") - (aA - aB)) < 2e-6)
    // identical scores: delta 0, se 0, z NULL (0/0 guarded)
    val same = HypothesisOps.aucCompare(df.withColumn("b", col("a")),
      "a", "b", "g", "P", "N").collect()(0)
    assert(same.getAs[Double]("delta") === 0.0)
    assert(same.getAs[Double]("se") === 0.0)
    assert(same.isNullAt(same.fieldIndex("z")))
    // single-class input: NULL block
    val onlyP = df.filter(col("g") === "P")
    val rp = HypothesisOps.aucCompare(onlyP, "a", "b", "g", "P", "N")
      .collect()(0)
    assert(rp.isNullAt(rp.fieldIndex("auc_a")))
    assert(rp.getAs[Long]("n_neg") === 0L)
  }

  test("rankingEval: per-metric brute-force equality on a random " +
    "candidate table; closed forms on perfect ranking; no-relevant " +
    "queries excluded from recall/ndcg, zero in mrr") {
    val rnd = new scala.util.Random(53)
    val k = 3
    val rows = (1 to 40).flatMap { q =>
      val n = 2 + rnd.nextInt(8)
      (1 to n).map(i =>
        (q.toLong, i.toLong, rnd.nextInt(50).toDouble,
          if (rnd.nextInt(4) == 0) 1 else 0))
    }
    val df = rows.toDF("q", "cid", "s", "rel")
    val r = HypothesisOps
      .rankingEval(df, "q", "cid", "s", "rel", k).collect()(0)
    // brute force per query
    def log2(x: Double) = math.log(x) / math.log(2.0)
    val byQ = rows.groupBy(_._1).values.map { g =>
      val ranked = g.sortBy(x => (-x._3, x._2)).map(_._4)
      val top = ranked.take(k)
      val rTotal = ranked.count(_ == 1)
      val hits = top.count(_ == 1)
      val mrr = top.indexOf(1) match {
        case -1 => 0.0; case i => 1.0 / (i + 1) }
      val dcg = top.zipWithIndex
        .collect { case (1, i) => 1.0 / log2(i + 2.0) }.sum
      val idcg = (1 to math.min(k, rTotal))
        .map(i => 1.0 / log2(i + 1.0)).sum
      (hits.toDouble / k, rTotal, if (rTotal > 0) hits.toDouble / rTotal
        else 0.0, mrr, if (rTotal > 0) dcg / idcg else 0.0)
    }.toSeq
    val nQ = byQ.size
    val nEval = byQ.count(_._2 > 0)
    def r6d(x: Double) = math.round(x * 1e6) / 1e6
    assert(r.getAs[Long]("n_queries") === nQ.toLong)
    assert(r.getAs[Long]("n_eval") === nEval.toLong)
    assert(math.abs(r.getAs[Double]("precision_at_k") -
      byQ.map(_._1).sum / nQ) < 2e-6)
    assert(math.abs(r.getAs[Double]("recall_at_k") -
      byQ.filter(_._2 > 0).map(_._3).sum / nEval) < 2e-6)
    assert(math.abs(r.getAs[Double]("mrr") -
      byQ.map(_._4).sum / nQ) < 2e-6)
    assert(math.abs(r.getAs[Double]("ndcg") -
      byQ.filter(_._2 > 0).map(_._5).sum / nEval) < 2e-6)
    // perfect ranking: all relevant first → every metric's ceiling
    val perfect = (1 to 10).flatMap { q =>
      Seq((q.toLong, 1L, 9.0, 1), (q.toLong, 2L, 8.0, 1),
        (q.toLong, 3L, 1.0, 0), (q.toLong, 4L, 0.5, 0))
    }.toDF("q", "cid", "s", "rel")
    val rp = HypothesisOps
      .rankingEval(perfect, "q", "cid", "s", "rel", k).collect()(0)
    assert(rp.getAs[Double]("recall_at_k") === 1.0)
    assert(rp.getAs[Double]("mrr") === 1.0)
    assert(rp.getAs[Double]("ndcg") === 1.0)
    assert(rp.getAs[Double]("precision_at_k") === r6d(2.0 / 3))
    // a query with zero relevant: excluded from recall/ndcg means,
    // contributes 0 to mrr and precision
    val withEmpty = perfect.union(
      Seq((99L, 1L, 5.0, 0), (99L, 2L, 4.0, 0)).toDF("q","cid","s","rel"))
    val re = HypothesisOps
      .rankingEval(withEmpty, "q", "cid", "s", "rel", k).collect()(0)
    assert(re.getAs[Long]("n_queries") === 11L)
    assert(re.getAs[Long]("n_eval") === 10L)
    assert(re.getAs[Double]("recall_at_k") === 1.0)
    assert(re.getAs[Double]("ndcg") === 1.0)
    assert(re.getAs[Double]("mrr") === r6d(10.0 / 11))
  }

  test("aucBy: each segment equals the ungrouped auc on that " +
    "segment's rows; a single-class segment emits NULL, not NaN, " +
    "and is not dropped") {
    val rnd = new scala.util.Random(43)
    val segs = Seq("s1", "s2", "s3")
    val data = segs.flatMap { seg =>
      val shift = seg.last.asDigit * 3
      Seq.fill(80)(("P", rnd.nextInt(25).toDouble + shift, seg)) ++
        Seq.fill(90)(("N", rnd.nextInt(25).toDouble, seg))
    } ++ Seq.fill(30)(("P", rnd.nextInt(25).toDouble, "only_pos"))
    val df = data.toDF("g", "v", "seg")
    val by = HypothesisOps.aucBy(df, "v", "g", "P", "N", "seg")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(by.keySet === (segs.toSet + "only_pos"))
    segs.foreach { seg =>
      val solo = HypothesisOps.auc(df.filter(col("seg") === seg),
        "v", "g", "P", "N").collect()(0)
      assert(by(seg).getAs[Double]("auc") ===
        solo.getAs[Double]("auc"), seg)
      assert(by(seg).getAs[Long]("n_pos") ===
        solo.getAs[Long]("n_pos"), seg)
    }
    val op = by("only_pos")
    assert(op.getAs[Long]("n_pos") === 30L)
    assert(op.getAs[Long]("n_neg") === 0L)
    assert(op.isNullAt(op.fieldIndex("auc")))
  }

  test("effectSize: hand-computed Cohen's d / Hedges' g / Glass delta, " +
    "zero on identical groups, NULL on singleton groups") {
    val xs = Seq(4.0, 5.0, 6.0, 7.0, 8.0)         // mean 6, var 2.5
    val ys = Seq(1.0, 2.0, 3.0)                   // mean 2, var 1
    def mv(s: Seq[Double]) = {
      val m = s.sum / s.size
      (m, s.map(x => (x - m) * (x - m)).sum / (s.size - 1))
    }
    val (ma, va) = mv(xs); val (mb, vb) = mv(ys)
    val sp2 = ((xs.size - 1) * va + (ys.size - 1) * vb) /
      (xs.size + ys.size - 2)
    val d = (ma - mb) / math.sqrt(sp2)
    val g = d * (1.0 - 3.0 / (4.0 * (xs.size + ys.size) - 9))
    val glass = (ma - mb) / math.sqrt(vb)
    val df = (xs.map(("A", _)) ++ ys.map(("B", _))).toDF("g", "v")
    val r = HypothesisOps.effectSize(df, "v", "g", "A", "B")
      .collect()(0)
    assert(r.getAs[Double]("mean_diff") === r6(ma - mb))
    assert(r.getAs[Double]("cohen_d") === r6(d))
    assert(r.getAs[Double]("hedges_g") === r6(g))
    assert(r.getAs[Double]("glass_delta") === r6(glass))
    // identical groups → every effect size is exactly 0
    val same = (xs.map(("A", _)) ++ xs.map(("B", _))).toDF("g", "v")
    val r0 = HypothesisOps.effectSize(same, "v", "g", "A", "B")
      .collect()(0)
    assert(r0.getAs[Double]("cohen_d") === 0.0)
    // a singleton group has no variance estimate → NULL, not a crash
    val single = (xs.map(("A", _)) :+ (("B", 3.0))).toDF("g", "v")
    val rs = HypothesisOps.effectSize(single, "v", "g", "A", "B")
      .collect()(0)
    assert(rs.isNullAt(rs.fieldIndex("cohen_d")))
  }

  test("hhi: monopoly scores 10000, k equal entities score 10000/k, " +
    "and entity fragmentation strictly lowers concentration") {
    val mono = Seq(("m", 1L, 50.0), ("m", 1L, 30.0)).toDF("g", "e", "v")
    val eq4 = (1 to 4).map(e => ("q", e.toLong, 25.0)).toDF("g", "e", "v")
    val skew = Seq(("s", 1L, 90.0), ("s", 2L, 5.0), ("s", 3L, 5.0))
      .toDF("g", "e", "v")
    val got = StatsOps.hhi(mono.union(eq4).union(skew), "g", "e", "v")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(3))).toMap
    assert(got("m") === ((1L, 10000.0)))
    assert(got("q") === ((4L, 2500.0)))
    assert(got("s")._2 === r6(8100.0 + 25.0 + 25.0))
    assert(got("s")._2 < 10000.0 && got("s")._2 > 2500.0)
  }

  // -- kruskalWallis / anovaF -----------------------------------------

  private def bruteKw(groups: Seq[Seq[Double]]): (Double, Double) = {
    val pooled = groups.flatten.sorted
    val n = pooled.size.toDouble
    def avgRank(v: Double): Double = {
      val lo = pooled.count(_ < v); val c = pooled.count(_ == v)
      lo + (c + 1) / 2.0
    }
    val rsum = groups.map(g => { val r = g.map(avgRank).sum; r * r / g.size }).sum
    val h = 12.0 / (n * (n + 1)) * rsum - 3.0 * (n + 1)
    val ties = pooled.distinct.map { v =>
      val t = pooled.count(_ == v).toDouble; t * t * t - t
    }.sum
    (h, h / (1.0 - ties / (n * n * n - n)))
  }

  test("kruskalWallis matches the brute-force tie-corrected H, and for " +
    "two groups H_corrected equals the Mann-Whitney z squared") {
    val rnd = new scala.util.Random(31)
    val ga = Seq.fill(80)(rnd.nextInt(15).toDouble)
    val gb = Seq.fill(70)(3.0 + rnd.nextInt(15))
    val gc = Seq.fill(60)(6.0 + rnd.nextInt(15))
    val df = (ga.map(("a", _)) ++ gb.map(("b", _)) ++ gc.map(("c", _)))
      .toDF("g", "v")
    val row = HypothesisOps.kruskalWallis(df, "v", "g").collect()(0)
    val (h, hc) = bruteKw(Seq(ga, gb, gc))
    assert(row.getAs[Double]("h") === r6(h))
    assert(row.getAs[Double]("h_corrected") === r6(hc))
    assert(row.getAs[Long]("dof") === 2L)
    // k = 2 identity: H_corrected = z² (both tie-corrected)
    val df2 = (ga.map(("a", _)) ++ gb.map(("b", _))).toDF("g", "v")
    val h2 = HypothesisOps.kruskalWallis(df2, "v", "g").collect()(0)
      .getAs[Double]("h_corrected")
    val z = HypothesisOps.mannWhitney(df2, "v", "g", "a", "b")
      .collect()(0).getAs[Double]("z")
    assert(math.abs(h2 - z * z) < 1e-3, s"H=$h2 z²=${z * z}")
  }

  test("anovaF: F near 0 for identical groups, large for separated " +
    "groups, per-group means and stddev exact on a hand fixture") {
    val same = (1 to 60).flatMap(i =>
      Seq(("a", (i % 10).toDouble), ("b", (i % 10).toDouble)))
    val fSame = HypothesisOps.anovaF(same.toDF("g", "v"), "v", "g")
      .collect()(0).getAs[Double]("f_stat")
    assert(math.abs(fSame) < 1e-6)
    val apart = (1 to 60).map(i => ("a", (i % 10).toDouble)) ++
      (1 to 60).map(i => ("b", 100.0 + i % 10))
    val row = HypothesisOps.anovaF(apart.toDF("g", "v"), "v", "g")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(row("a").getAs[Double]("f_stat") > 1000.0)
    assert(row("a").getAs[Double]("mean") === 4.5)
    assert(row("b").getAs[Double]("mean") === 104.5)
    assert(row("a").getAs[Long]("dof_between") === 1L)
    assert(row("a").getAs[Long]("dof_within") === 118L)
    // stddev of 6x{0..9}: sqrt(sum((x-4.5)^2)*6/119)... per-group:
    // sample stddev of {0..9} repeated 6 times, n=60
    val exp = math.sqrt((0 to 9).map(x => (x - 4.5) * (x - 4.5)).sum * 6 / 59.0)
    assert(row("a").getAs[Double]("stddev") === r6(exp))
  }

  // -- weightedQuantile / qqTable / iqrOutliers ------------------------

  test("weightedQuantile at k/20 equals the brute-force lower order " +
    "statistic for every k, including under heavy ties") {
    val rnd = new scala.util.Random(41)
    val vals = Seq.fill(500)(rnd.nextInt(60).toDouble)
    val df = vals.map(("g", _)).toDF("g", "v").withColumn("w", lit(1.0))
    val sorted = vals.sorted
    (1 until 20).foreach { k =>
      val got = StatsOps.weightedQuantile(df, "g", "v", "w", k, 20,
        _.cast("double")).collect()(0).getAs[Double]("wmedian")
      // lower quantile: smallest v with 20·rank ≥ k·n
      val expected = sorted(math.ceil(sorted.size.toDouble * k / 20).toInt - 1)
      assert(got === expected, s"k=$k")
    }
  }

  test("qqTable quantiles are non-decreasing in p, match identical " +
    "groups exactly, and expose a constant shift") {
    val rnd = new scala.util.Random(43)
    val base = Seq.fill(400)(rnd.nextInt(300).toDouble)
    val same = (base.map(("A", _)) ++ base.map(("B", _))).toDF("g", "v")
    val rows = HypothesisOps.qqTable(same, "v", "g", "A", "B").collect()
    assert(rows.length === 19)
    rows.foreach(r => assert(r.getAs[Double]("q_a") === r.getAs[Double]("q_b")))
    val qas = rows.map(_.getAs[Double]("q_a"))
    assert(qas.toSeq === qas.sorted.toSeq)
    val shifted = (base.map(("A", _)) ++ base.map(x => ("B", x + 50.0)))
      .toDF("g", "v")
    HypothesisOps.qqTable(shifted, "v", "g", "A", "B").collect()
      .foreach(r => assert(
        r.getAs[Double]("q_b") - r.getAs[Double]("q_a") === 50.0))
  }

  test("iqrOutliers: hand fixture with two planted outliers per side") {
    // 1..100 plus outliers: q1 = 26, q3 = 76 (lower quantiles of 104
    // values), iqr = 50, fences at -49 / 151
    val vals = (1 to 100).map(_.toDouble) ++ Seq(-500.0, -200.0, 500.0, 800.0)
    val df = vals.map(("g", _)).toDF("g", "v")
    val r = StatsOps.iqrOutliers(df, "g", "v").collect()(0)
    assert(r.getAs[Long]("n") === 104L)
    val q1 = r.getAs[Double]("q1"); val q3 = r.getAs[Double]("q3")
    val lo = r.getAs[Double]("lo_fence"); val hi = r.getAs[Double]("hi_fence")
    assert(q1 === vals.sorted.apply(math.ceil(104.0 / 4).toInt - 1))
    assert(q3 === vals.sorted.apply(math.ceil(104.0 * 3 / 4).toInt - 1))
    assert(r.getAs[Long]("n_below") === vals.count(_ < lo).toLong)
    assert(r.getAs[Long]("n_above") === vals.count(_ > hi).toLong)
    assert(r.getAs[Long]("n_below") === 2L && r.getAs[Long]("n_above") === 2L)
  }

  // -- jarqueBera ----------------------------------------------------

  test("jarqueBera: brute-force moments on a skewed fixture; symmetric " +
    "two-point fixture has zero skew and kurtosis 1 (JB = n/6)") {
    // symmetric ±1: m2 = 1, m3 = 0, m4 = 1 → S = 0, K = 1,
    // JB = n/6·(0 + (1−3)²/4) = n/6
    val n = 60
    val sym = Seq.fill(n / 2)(1.0) ++ Seq.fill(n / 2)(-1.0)
    val df = sym.map(("g", _)).toDF("g", "v")
    val r = HypothesisOps.jarqueBera(df, "v", "g").collect()(0)
    assert(r.getAs[Double]("skewness") === 0.0)
    assert(r.getAs[Double]("kurtosis") === 1.0)
    assert(r.getAs[Double]("jb") === r6(n / 6.0))
    assert(r.getAs[Double]("p_value") === r6(math.exp(-n / 12.0)))
    // brute force on an asymmetric fixture
    val xs = Seq(1.0, 1.0, 2.0, 2.0, 2.0, 3.0, 8.0, 13.0, 21.0, 40.0)
    val mu = xs.sum / xs.size
    def m(k: Int) = xs.map(x => math.pow(x - mu, k)).sum / xs.size
    val s = m(3) / math.pow(m(2), 1.5)
    val k4 = m(4) / (m(2) * m(2))
    val jb = xs.size / 6.0 * (s * s + (k4 - 3) * (k4 - 3) / 4)
    val r2 = HypothesisOps.jarqueBera(xs.map(("g", _)).toDF("g", "v"),
      "v", "g").collect()(0)
    assert(math.abs(r2.getAs[Double]("skewness") - s) < 1e-5)
    assert(math.abs(r2.getAs[Double]("kurtosis") - k4) < 1e-5)
    assert(math.abs(r2.getAs[Double]("jb") - jb) < 1e-4)
    // constant column: degenerate m2 = 0 → NULL stats, not a throw
    val const = Seq.fill(10)(5.0).map(("g", _)).toDF("g", "v")
    val rc = HypothesisOps.jarqueBera(const, "v", "g").collect()(0)
    assert(rc.isNullAt(rc.fieldIndex("jb")))
  }

  // -- leveneBf ------------------------------------------------------

  test("leveneBf: equal-spread groups give F near 0; a 10x-spread " +
    "group is flagged; absdev means match the hand computation") {
    val rnd = new scala.util.Random(7)
    val a = Seq.fill(200)(rnd.nextGaussian())
    val b = Seq.fill(200)(rnd.nextGaussian() * 10)
    val same = (a.map(("A", _)) ++ a.map(x => ("B", x + 100)))
      .toDF("g", "v") // pure location shift: spreads identical
    val f0 = HypothesisOps.leveneBf(same, "v", "g")
      .collect()(0).getAs[Double]("f_stat")
    assert(math.abs(f0) < 1e-6)
    val diff = (a.map(("A", _)) ++ b.map(("B", _))).toDF("g", "v")
    val rows = HypothesisOps.leveneBf(diff, "v", "g").collect()
    assert(rows(0).getAs[Double]("f_stat") > 50.0)
    // absdev mean per group matches the brute lower-median deviation
    def lowerMed(xs: Seq[Double]) = {
      val s = xs.sorted; s((xs.size - 1) / 2)
    }
    val expA = a.map(x => math.abs(x - lowerMed(a))).sum / a.size
    val got = rows.find(_.getString(0) == "A").get.getAs[Double]("mean")
    assert(math.abs(got - expA) < 1e-5)
  }

  // -- tukeyHsd ------------------------------------------------------

  test("tukeyHsd: hand-computed pairwise q on a 3-group fixture; " +
    "pair count is k(k-1)/2 and g_a < g_b throughout") {
    val g1 = Seq(1.0, 2.0, 3.0, 4.0, 5.0)
    val g2 = Seq(3.0, 4.0, 5.0, 6.0, 7.0)
    val g3 = Seq(10.0, 11.0, 12.0, 13.0, 14.0)
    val df = (g1.map(("a", _)) ++ g2.map(("b", _)) ++ g3.map(("c", _)))
      .toDF("g", "v")
    val rows = HypothesisOps.tukeyHsd(df, "v", "g").collect()
    assert(rows.length === 3)
    assert(rows.forall(r => r.getString(0) < r.getString(1)))
    // each group has variance 2.5 → SSW = 3·4·2.5 = 30, MSW = 30/12
    val msw = 30.0 / 12
    val se = math.sqrt(msw / 2 * (1.0 / 5 + 1.0 / 5))
    val ab = rows.find(r => r.getString(0) == "a" && r.getString(1) == "b").get
    assert(ab.getAs[Double]("diff") === r6(3.0 - 5.0))
    assert(ab.getAs[Double]("se") === r6(se))
    assert(ab.getAs[Double]("q_stat") === r6(2.0 / se))
    assert(ab.getAs[Long]("dof_within") === 12L)
    val ac = rows.find(r => r.getString(0) == "a" && r.getString(1) == "c").get
    assert(ac.getAs[Double]("q_stat") === r6(9.0 / se))
  }

  // -- mcnemar -------------------------------------------------------

  test("mcnemar: closed form on planted discordant counts; symmetric " +
    "discordance gives chi2 0 / p 1; no discordance gives NULLs") {
    // 30 a-only, 10 b-only, 50 agree-true, 10 agree-false
    val rows = Seq.fill(30)((true, false)) ++ Seq.fill(10)((false, true)) ++
      Seq.fill(50)((true, true)) ++ Seq.fill(10)((false, false))
    val r = StatsOps.mcnemar(rows.toDF("a", "b"), "a", "b").collect()(0)
    assert(r.getAs[Long]("n10") === 30L)
    assert(r.getAs[Long]("n01") === 10L)
    assert(r.getAs[Double]("chi2") === r6(400.0 / 40))
    assert(r.getAs[Double]("chi2_cc") === r6(19.0 * 19 / 40))
    assert(r.getAs[Double]("p_value") < 0.002)
    // symmetric discordance: no evidence either way
    val sym = (Seq.fill(20)((true, false)) ++ Seq.fill(20)((false, true)))
      .toDF("a", "b")
    val rsym = StatsOps.mcnemar(sym, "a", "b").collect()(0)
    assert(rsym.getAs[Double]("chi2") === 0.0)
    assert(rsym.getAs[Double]("p_value") === 1.0)
    // perfect agreement: undefined -> NULL not a throw
    val agree = Seq.fill(30)((true, true)).toDF("a", "b")
    val ra = StatsOps.mcnemar(agree, "a", "b").collect()(0)
    assert(ra.isNullAt(ra.fieldIndex("chi2")))
  }

  // -- chisqTest -----------------------------------------------------

  test("chisqTest: independent margins give chi2 near 0 / p near 1; " +
    "a deterministic association is flagged; dof = (r-1)(c-1)") {
    // perfectly independent 2x2: counts proportional to margins
    val ind = (Seq.fill(40)(("x", "u")) ++ Seq.fill(60)(("x", "w")) ++
      Seq.fill(20)(("y", "u")) ++ Seq.fill(30)(("y", "w")))
      .toDF("a", "b")
    val r0 = StatsOps.chisqTest(ind, "a", "b").collect()(0)
    assert(r0.getAs[Long]("dof") === 1L)
    assert(math.abs(r0.getAs[Double]("chi2")) < 1e-9)
    assert(r0.getAs[Double]("p_value") > 0.999) // dof=1 exact form
    // deterministic association over 3 levels: chi2 = n·(r-1)... full
    // dependence gives chi2 = n·(min(r,c)-1) = 300·2
    val dep = (Seq.fill(100)(("p", "1")) ++ Seq.fill(100)(("q", "2")) ++
      Seq.fill(100)(("r", "3"))).toDF("a", "b")
    val r1 = StatsOps.chisqTest(dep, "a", "b").collect()(0)
    assert(r1.getAs[Long]("dof") === 4L)
    assert(r1.getAs[Double]("chi2") === 600.0)
    assert(r1.getAs[Double]("p_value") < 1e-6)
  }
}
