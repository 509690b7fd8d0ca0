package graft

import graft.operators.{StatsOps, TextOps}
import org.apache.spark.sql.functions._

/** Laws for the decision-analytics tier (StatsOps) plus the entropy /
  * n-gram text additions. The oracle gate hash-compares each query
  * against DuckDB at sf0.01; these pin the algorithms themselves —
  * skyline vs brute-force dominance on random point sets, winsorize
  * clamp laws, the z-statistic's closed form, entropy edge cases. */
class StatsOpsSpec extends SparkSpec {
  import spark.implicits._

  // -- skyline -------------------------------------------------------

  private def bruteSkyline(pts: Seq[(Double, Double)]): Set[(Double, Double)] = {
    val d = pts.distinct
    d.filter { case (x, y) =>
      !d.exists { case (a, b) =>
        a >= x && b >= y && (a > x || b > y)
      }
    }.toSet
  }

  test("skyline equals brute-force dominance on random point sets " +
    "(correlated, anti-correlated, and duplicate-heavy)") {
    val rnd = new scala.util.Random(42)
    val shapes: Seq[Seq[(Double, Double)]] = Seq(
      // independent uniform
      Seq.fill(400)((rnd.nextDouble() * 100, rnd.nextDouble() * 100)),
      // anti-correlated: the frontier is most of the data
      (0 until 200).map(i => (i.toDouble, (200 - i).toDouble)),
      // correlated + duplicates: tiny frontier, repeated points
      Seq.fill(300) {
        val v = rnd.nextInt(50).toDouble
        (v, v + rnd.nextInt(3))
      })
    shapes.foreach { pts =>
      val got = StatsOps.skyline(pts.toDF("x", "y"), "x", "y")
        .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet
      assert(got === bruteSkyline(pts))
    }
  }

  test("skyline is deterministic under repartitioning and contains " +
    "the global maxima of each dimension") {
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(500)((rnd.nextDouble() * 10, rnd.nextDouble() * 10))
    val df = pts.toDF("x", "y")
    val a = StatsOps.skyline(df, "x", "y").collect().toSet
    val b = StatsOps.skyline(df.repartition(13), "x", "y").collect().toSet
    assert(a === b)
    val got = a.map(r => (r.getDouble(0), r.getDouble(1)))
    val maxX = pts.maxBy(p => (p._1, p._2))
    val maxY = pts.maxBy(p => (p._2, p._1))
    assert(got.contains(maxX) && got.contains(maxY))
  }

  // -- winsorized mean ----------------------------------------------

  test("winsorizedMean: clamped mean sits within [p_lo, p_hi], raw " +
    "mean matches avg, and an injected outlier moves only mean_raw") {
    val base = (1 to 100).map(i => ("g", i * 100.0))
    val withOutlier = base :+ ("g", 1e9)
    val r = StatsOps.winsorizedMean(withOutlier.toDF("k", "v"), "k", "v")
      .collect().head
    val lo = r.getAs[Double]("p_lo")
    val hi = r.getAs[Double]("p_hi")
    val raw = r.getAs[Double]("mean_raw")
    val wins = r.getAs[Double]("mean_wins")
    assert(lo < hi && wins >= lo && wins <= hi)
    // the 1e9 outlier dominates the raw mean but is clamped to p_hi
    assert(raw > 1e6 && wins < 20000)
    // p_lo / p_hi are actual data values (percentile_disc)
    val vals = withOutlier.map(_._2).toSet
    assert(vals.contains(lo) && vals.contains(hi))
  }

  test("winsorizedMean with degenerate bounds (lo=0, hi=1) reduces to " +
    "the plain mean") {
    val df = Seq(("a", 10.0), ("a", 20.0), ("a", 60.0)).toDF("k", "v")
    val r = StatsOps.winsorizedMean(df, "k", "v", lo = 0.0, hi = 1.0)
      .collect().head
    assert(r.getAs[Double]("mean_raw") === 30.0)
    assert(r.getAs[Double]("mean_wins") === 30.0)
  }

  // -- A/B metrics ---------------------------------------------------

  test("abMetrics: counts partition the population, rates are " +
    "n_conv/n_units, and z matches the closed form computed by hand") {
    val units = (1L to 400L).toDF("id")
    // convert exactly the multiples of 3
    val conv = (1L to 400L).filter(_ % 3 == 0).toDF("id")
    val rows = StatsOps.abMetrics(units, "id", conv, "id")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val (na, ca, rateA, zA) = rows("A")
    val (nb, cb, rateB, zB) = rows("B")
    assert(na + nb === 400 && ca + cb === 133)
    assert(math.abs(rateA - ca.toDouble / na) < 1e-6)
    assert(math.abs(rateB - cb.toDouble / nb) < 1e-6)
    val p = (ca + cb).toDouble / (na + nb)
    val z = (ca.toDouble / na - cb.toDouble / nb) /
      math.sqrt(p * (1 - p) * (1.0 / na + 1.0 / nb))
    assert(math.abs(zA - z) < 1e-6 && zA === zB)
  }

  // -- token entropy -------------------------------------------------

  test("tokenEntropy: uniform distribution scores log2(n), a single " +
    "repeated token scores 0, and counts are exact") {
    val docs = Seq(
      ("u", "a b c d"),      // 4 distinct, uniform → log2(4) = 2
      ("m", "x x x x"))      // 1 token repeated → 0
      .toDF("source", "text")
    val r = TextOps.tokenEntropy(docs, "source", "text")
      .collect().map(row => row.getString(0) ->
        (row.getLong(1), row.getLong(2), row.getDouble(3))).toMap
    assert(r("u") === ((4L, 4L, 2.0)))
    assert(r("m") === ((4L, 1L, 0.0)))
  }

  // -- n-gram top-k --------------------------------------------------

  test("ngramTopK: bigram counts match a hand count, short docs emit " +
    "nothing, ties break lexicographically, and trigrams generalize") {
    val docs = Seq("a b a b", "a b", "z").toDF("text")
    val bi = TextOps.ngramTopK(docs, "text", n = 2, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // "a b a b" → [a b, b a, a b]; "a b" → [a b]; "z" → nothing
    assert(bi === Seq(("a b", 3L), ("b a", 1L)))
    val tri = TextOps.ngramTopK(docs, "text", n = 3, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(tri === Seq(("a b a", 1L), ("b a b", 1L)))
  }

  // -- weighted median -----------------------------------------------

  test("weightedMedian: hand-computed crossings — duplicate values " +
    "pool their weights, a heavy tail value wins over many light " +
    "rows, and equal-weight rows reduce to the lower median") {
    val df = Seq(
      // group a: values 1..4 weight 1 each → 2*cum(2)=4 ≥ 4 → 2
      ("a", 1.0, 1.0), ("a", 2.0, 1.0), ("a", 3.0, 1.0), ("a", 4.0, 1.0),
      // group b: one heavy value outweighs three light ones
      ("b", 1.0, 1.0), ("b", 2.0, 1.0), ("b", 3.0, 1.0), ("b", 9.0, 10.0),
      // group c: duplicate values pool — 5.0 carries 2+3=5 of total 6
      ("c", 5.0, 2.0), ("c", 5.0, 3.0), ("c", 7.0, 1.0)
    ).toDF("g", "v", "w")
    val got = StatsOps.weightedMedian(df, "g", "v", "w")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2))))
      .toMap
    assert(got("a") === ((2.0, 4.0)))
    assert(got("b") === ((9.0, 13.0)))
    assert(got("c") === ((5.0, 6.0)))
  }

  test("weightedMedian with unit weights equals the discrete lower " +
    "median and is repartition-deterministic") {
    val vals = Seq(3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0)
    val df = vals.map(("g", _, 1.0)).toDF("g", "v", "w")
    val m1 = StatsOps.weightedMedian(df, "g", "v", "w")
      .head().getDouble(1)
    // lower median of [1,1,2,3,4,5,6,9]: cum hits half (4 of 8) at 3
    assert(m1 === 3.0)
    val m2 = StatsOps.weightedMedian(df.repartition(7), "g", "v", "w")
      .head().getDouble(1)
    assert(m2 === m1)
  }

  // -- mutual information / Cramér's V / Cohen's κ -------------------

  test("mutualInfo: identical columns recover the entropy, independent " +
    "columns score ~0, and a hand-computed 2x2 checks out") {
    // identical: MI(A, A) = H(A); two equiprobable values → 1 bit
    val ident = (1 to 100).map(i => (i % 2, i % 2)).toDF("a", "b")
    val mIdent = StatsOps.mutualInfo(ident, "a", "b")
      .select("mi_total").head().getDouble(0)
    assert(mIdent === 1.0)
    // independent uniform 2x2: every cell 25 → MI exactly 0
    val indep = (0 until 100).map(i => (i % 2, (i / 2) % 2)).toDF("a", "b")
    val mIndep = StatsOps.mutualInfo(indep, "a", "b")
      .select("mi_total").head().getDouble(0)
    assert(math.abs(mIndep) < 1e-9)
    // hand-computed: cells (0,0)=50, (0,1)=25, (1,1)=25
    val hand = ((1 to 50).map(_ => (0, 0)) ++ (1 to 25).map(_ => (0, 1))
      ++ (1 to 25).map(_ => (1, 1))).toDF("a", "b")
    val expected = {
      def t(p: Double, pa: Double, pb: Double) =
        p * math.log(p / (pa * pb)) / math.log(2.0)
      t(0.5, 0.75, 0.5) + t(0.25, 0.75, 0.5) + t(0.25, 0.25, 0.5)
    }
    val mHand = StatsOps.mutualInfo(hand, "a", "b")
      .select("mi_total").head().getDouble(0)
    assert(math.abs(mHand - expected) < 1e-6)
  }

  test("cramersV: perfect association scores 1, independence ~0, and " +
    "dof is min(r,c)-1") {
    val perfect = (1 to 90).map(i => (i % 3, i % 3)).toDF("a", "b")
    val rp = StatsOps.cramersV(perfect, "a", "b").head()
    assert(rp.getAs[Double]("v") === 1.0)
    assert(rp.getAs[Long]("dof") === 2L)
    val indep = (0 until 600).map(i => (i % 3, (i / 3) % 2)).toDF("a", "b")
    val ri = StatsOps.cramersV(indep, "a", "b").head()
    assert(math.abs(ri.getAs[Double]("v")) < 1e-9)
    assert(ri.getAs[Long]("dof") === 1L)
    assert(ri.getAs[Long]("n") === 600L)
  }

  test("cohenKappa: perfect agreement is 1, complementary judgments " +
    "land at the hand-computed negative, and the confusion reconciles") {
    val agree = (1 to 40).map(i => (i % 2 == 0, i % 2 == 0)).toDF("a", "b")
    assert(StatsOps.cohenKappa(agree, "a", "b").head()
      .getAs[Double]("kappa") === 1.0)
    // a = first 30 true of 40; b = NOT a → po = 0, pe by hand
    val opp = (1 to 40).map(i => (i <= 30, i > 30)).toDF("a", "b")
    val r = StatsOps.cohenKappa(opp, "a", "b").head()
    assert(r.getAs[Long]("n11") === 0L && r.getAs[Long]("n00") === 0L)
    assert(r.getAs[Long]("n10") === 30L && r.getAs[Long]("n01") === 10L)
    val pe = 0.75 * 0.25 + 0.25 * 0.75
    val expected = math.round((0.0 - pe) / (1.0 - pe) * 1e6) / 1e6
    assert(r.getAs[Double]("kappa") === expected)
  }

  // -- bootstrap CI --------------------------------------------------

  test("cuped: constant pre leaves the readout unadjusted, a perfect " +
    "linear pre-post link drives var_adj to ~0, and a random fixture " +
    "matches the brute-force pooled-theta computation") {
    def r6(x: Double): Double = math.round(x * 1e6) / 1e6
    // constant pre: var_x = 0 => theta = 0, adjusted == raw
    val const = (1 to 100).map(i =>
      (if (i % 2 == 0) "A" else "B", 5.0, 10.0 + i)).toDF("arm", "pre", "post")
    StatsOps.cuped(const, "arm", "pre", "post").collect().foreach { r =>
      assert(r.getAs[Double]("theta") === 0.0)
      assert(r.getAs[Double]("mean_adj") === r.getAs[Double]("mean_raw"))
      assert(r.getAs[Double]("var_adj") === r.getAs[Double]("var_raw"))
      assert(r.getAs[Double]("var_reduction") === 0.0)
    }
    // post = 2*pre exactly: pooled theta = 2, residual variance 0
    val rnd = new scala.util.Random(41)
    val lin = (1 to 200).map { i =>
      val p = rnd.nextInt(50).toDouble
      (if (i % 2 == 0) "A" else "B", p, 2.0 * p)
    }.toDF("arm", "pre", "post")
    StatsOps.cuped(lin, "arm", "pre", "post").collect().foreach { r =>
      assert(r.getAs[Double]("theta") === 2.0)
      assert(math.abs(r.getAs[Double]("var_adj")) < 1e-6)
      assert(r.getAs[Double]("var_reduction") === 1.0)
    }
    // random fixture vs brute force
    val xs = (1 to 300).map { i =>
      val p = rnd.nextInt(40).toDouble
      (if (rnd.nextBoolean()) "A" else "B", p,
        p * 1.5 + rnd.nextInt(20))
    }
    val n = xs.size.toDouble
    val (sx, sy) = (xs.map(_._2).sum, xs.map(_._3).sum)
    val sxx = xs.map(v => v._2 * v._2).sum
    val sxy = xs.map(v => v._2 * v._3).sum
    val theta = ((sxy - sx * sy / n) / (n - 1)) /
      ((sxx - sx * sx / n) / (n - 1))
    val muX = sx / n
    val got = StatsOps.cuped(xs.toDF("arm", "pre", "post"),
      "arm", "pre", "post").collect()
    got.foreach { r =>
      val arm = r.getAs[String]("arm")
      val g = xs.filter(_._1 == arm)
      val gn = g.size.toDouble
      val mY = g.map(_._3).sum / gn; val mX = g.map(_._2).sum / gn
      assert(math.abs(r.getAs[Double]("theta") - theta) < 1e-5)
      assert(math.abs(r.getAs[Double]("mean_adj") -
        (mY - theta * (mX - muX))) < 1e-4)
      val vy = g.map(v => math.pow(v._3 - mY, 2)).sum / (gn - 1)
      val vx = g.map(v => math.pow(v._2 - mX, 2)).sum / (gn - 1)
      val cv = g.map(v => (v._2 - mX) * (v._3 - mY)).sum / (gn - 1)
      val vAdj = vy - 2 * theta * cv + theta * theta * vx
      assert(math.abs(r.getAs[Double]("var_adj") - vAdj) < 1e-3)
    }
  }

  test("deltaMethod: an exactly-proportional num/den gives se = 0 at " +
    "the exact ratio, and a random fixture matches the brute-force " +
    "delta variance") {
    // num = 3*den per unit: ratio 3, delta variance exactly 0
    val rnd = new scala.util.Random(43)
    val prop = (1 to 150).map { i =>
      val d = 1.0 + rnd.nextInt(9)
      (if (i % 2 == 0) "A" else "B", 3.0 * d, d)
    }.toDF("arm", "num", "den")
    StatsOps.deltaMethod(prop, "arm", "num", "den").collect()
      .foreach { r =>
        assert(r.getAs[Double]("ratio") === 3.0)
        assert(r.getAs[Double]("se") === 0.0)
        assert(r.getAs[Double]("ci_lo") === 3.0)
        assert(r.getAs[Double]("ci_hi") === 3.0)
      }
    // random fixture vs brute force
    val xs = (1 to 400).map { _ =>
      (if (rnd.nextBoolean()) "A" else "B",
        rnd.nextInt(100).toDouble, 1.0 + rnd.nextInt(9))
    }
    val got = StatsOps.deltaMethod(xs.toDF("arm", "num", "den"),
      "arm", "num", "den").collect()
    got.foreach { r =>
      val g = xs.filter(_._1 == r.getAs[String]("arm"))
      val n = g.size.toDouble
      val (sy, sx) = (g.map(_._2).sum, g.map(_._3).sum)
      val ratio = sy / sx; val mx = sx / n
      val my = sy / n
      val vy = g.map(v => math.pow(v._2 - my, 2)).sum / (n - 1)
      val vx = g.map(v => math.pow(v._3 - mx, 2)).sum / (n - 1)
      val cxy = g.map(v => (v._3 - mx) * (v._2 - my)).sum / (n - 1)
      val se = math.sqrt(
        (vy - 2 * ratio * cxy + ratio * ratio * vx) / (n * mx * mx))
      assert(math.abs(r.getAs[Double]("ratio") - ratio) < 1e-6)
      assert(math.abs(r.getAs[Double]("se") - se) < 1e-5)
    }
  }

  test("didEstimate recovers a planted noise-free effect with se = 0, " +
    "matches the brute-force moments under noise, and NULL-blocks " +
    "singleton arms") {
    val rnd = new scala.util.Random(59)
    // noise-free: treated diff +5, control diff +1 => did exactly 4
    val clean = (1 to 100).map { i =>
      val pre = rnd.nextInt(50).toDouble
      if (i % 2 == 0) ("T", pre, pre + 5.0) else ("C", pre, pre + 1.0)
    }.toDF("arm", "pre", "post")
    val c = StatsOps.didEstimate(clean, "arm", "T", "pre", "post")
      .collect()(0)
    assert(c.getAs[Double]("did") === 4.0)
    assert(c.getAs[Double]("se") === 0.0)
    assert(c.isNullAt(c.fieldIndex("z")))
    // noisy: brute-force equality
    val noisy = (1 to 300).map { i =>
      val pre = rnd.nextInt(50).toDouble
      val arm = if (rnd.nextBoolean()) "T" else "C"
      val post = pre + (if (arm == "T") 5.0 else 1.0) + rnd.nextInt(7)
      (arm, pre, post)
    }
    val got = StatsOps.didEstimate(noisy.toDF("arm", "pre", "post"),
      "arm", "T", "pre", "post").collect()(0)
    def stats(a: String) = {
      val ds = noisy.filter(_._1 == a).map(v => v._3 - v._2)
      val m = ds.sum / ds.size
      (ds.size, m,
        ds.map(x => (x - m) * (x - m)).sum / (ds.size - 1))
    }
    val (ntr, mt, vt) = stats("T"); val (ncl, mc, vc) = stats("C")
    assert(got.getAs[Long]("n_treat") === ntr.toLong)
    assert(math.abs(got.getAs[Double]("did") - (mt - mc)) < 1e-6)
    assert(math.abs(got.getAs[Double]("se") -
      math.sqrt(vt / ntr + vc / ncl)) < 1e-6)
    // singleton arm
    val single = Seq(("T", 1.0, 2.0), ("C", 1.0, 3.0),
      ("C", 2.0, 4.0)).toDF("arm", "pre", "post")
    val s = StatsOps.didEstimate(single, "arm", "T", "pre", "post")
      .collect()(0)
    assert(s.isNullAt(s.fieldIndex("did")))
  }

  test("powerAnalysis matches brute-force moments, halves nothing " +
    "for free (mde shrinks ~sqrt(2) when n doubles), and NULL-blocks " +
    "n_per_arm_needed on identical means") {
    val rnd = new scala.util.Random(61)
    val xs = (1 to 200).map { i =>
      (if (i % 2 == 0) "A" else "B",
        (if (i % 2 == 0) 10.0 else 12.0) + rnd.nextInt(9))
    }
    val df = xs.toDF("g", "v")
    val r = StatsOps.powerAnalysis(df, "g", "v", "A", "B").collect()(0)
    def stats(a: String) = {
      val vs = xs.filter(_._1 == a).map(_._2)
      val m = vs.sum / vs.size
      (vs.size, m, vs.map(x => (x - m) * (x - m)).sum / (vs.size - 1))
    }
    val (na, ma, va) = stats("A"); val (nb, mb, vb) = stats("B")
    val zz = 1.959964 + 0.841621
    assert(math.abs(r.getAs[Double]("observed_delta") - (ma - mb))
      < 1e-6)
    assert(math.abs(r.getAs[Double]("mde") -
      zz * math.sqrt(va / na + vb / nb)) < 1e-6)
    assert(r.getAs[Long]("n_per_arm_needed") ===
      math.ceil(zz * zz * (va + vb) /
        ((ma - mb) * (ma - mb))).toLong)
    // doubled corpus: mde shrinks by ~sqrt(2)
    val r2 = StatsOps.powerAnalysis(df.union(df), "g", "v", "A", "B")
      .collect()(0)
    val ratio = r.getAs[Double]("mde") / r2.getAs[Double]("mde")
    assert(math.abs(ratio - math.sqrt(2.0)) < 0.01)
    // identical means: delta 0, required-n NULL
    val same = ((1 to 50).map(i => ("A", i.toDouble)) ++
      (1 to 50).map(i => ("B", i.toDouble))).toDF("g", "v")
    val z = StatsOps.powerAnalysis(same, "g", "v", "A", "B")
      .collect()(0)
    assert(z.getAs[Double]("observed_delta") === 0.0)
    assert(z.isNullAt(z.fieldIndex("n_per_arm_needed")))
  }

  test("bootstrapCi: the interval brackets the sample mean, narrows " +
    "roughly as 1/sqrt(n), and is repartition-deterministic") {
    import org.apache.spark.sql.DataFrame
    def gen(n: Int, g: String): DataFrame =
      spark.range(1, n + 1)
        .selectExpr(s"'$g' AS g", "id",
          // a deterministic skewed positive variable
          "CAST(1.0 + pmod(id * 37, 100) + " +
            "CASE WHEN id % 17 = 0 THEN 500.0 ELSE 0.0 END AS DOUBLE)" +
            " AS x")
    val df = gen(400, "small").unionByName(gen(40000, "large"))
    val out = StatsOps.bootstrapCi(df, "g", "id", "x")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4)))).toMap
    out.foreach { case (g, (n, mean, lo, hi)) =>
      assert(lo < mean && mean < hi, s"$g: [$lo, $hi] vs mean $mean")
      assert(n === (if (g == "small") 400L else 40000L))
    }
    val (_, _, sl, sh) = out("small")
    val (_, _, ll, lh) = out("large")
    // 100× the data → ~10× narrower; allow generous slack
    assert((lh - ll) < (sh - sl) / 3.0,
      s"large CI ${lh - ll} vs small CI ${sh - sl}")
    val again = StatsOps.bootstrapCi(df.repartition(13), "g", "id", "x")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4)))).toMap
    assert(again === out)
  }

  test("bootstrapCi: degenerate replicates (total Poisson weight 0 in " +
    "a tiny group) fall back to the group mean — no NULL/NaN entering " +
    "the order statistics") {
    import spark.implicits._
    // a 1-row group: ~37% of its 64 replicates draw weight 0 (e^-1
    // each), so without the fallback the sorted replicate array holds
    // NULL/NaN and the endpoints shift engine-dependently
    val df = Seq(("solo", 1L, 42.0), ("big", 2L, 1.0), ("big", 3L, 2.0),
      ("big", 4L, 3.0)).toDF("g", "id", "x")
    val out = StatsOps.bootstrapCi(df, "g", "id", "x").collect()
      .map(r => r.getString(0) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    val (m, lo, hi) = out("solo")
    assert(m === 42.0)
    // every replicate mean is either 42 (weight>0) or the fallback 42
    assert(lo === 42.0 && hi === 42.0)
    assert(!out("big")._2.isNaN && !out("big")._3.isNaN)
  }

  test("the Poisson thresholds integrate to the CDF of Poisson(1): " +
    "weight frequencies over the full 16-bit range match the pmf") {
    val t = StatsOps.PoissonT
    assert(t.length === 8 && t === t.sorted)
    // P(w = 0) = t0/65536 ≈ e^-1; successive gaps match the pmf terms
    val pmf = (0 until 8).map { k =>
      val lo = if (k == 0) 0L else t(k - 1)
      val hi = t(k)
      (hi - lo).toDouble / 65536.0
    }
    var term = math.exp(-1.0)
    pmf.zipWithIndex.foreach { case (p, k) =>
      assert(math.abs(p - term) < 1e-4, s"k=$k: $p vs $term")
      term = term / (k + 1)
    }
  }

  // -- crosstab chi2 ---------------------------------------------------

  test("crosstab chi2 is exactly 0 on an exact product distribution " +
    "and positive on a diagonal one") {
    // independence by construction: n(a,b) = wa(a) * wb(b), so the
    // expected count rt*ct/total collapses to n and every chi2 term
    // is 0 before rounding
    val wa = Map("x" -> 2, "y" -> 3, "z" -> 5)
    val wb = Map("p" -> 4, "q" -> 6)
    val indep = (for {
      (a, na) <- wa.toSeq; (b, nb) <- wb.toSeq
      _ <- 0 until na * nb
    } yield (a, b)).toDF("a", "b")
    val got = StatsOps.crosstabChi2(indep, "a", "b").collect()
    assert(got.length === 6)
    got.foreach { r =>
      assert(r.getAs[Double]("chi2") === 0.0, r.toString)
      assert(r.getAs[Double]("expected") ===
        r.getAs[Long]("n").toDouble, r.toString)
    }
    // perfectly dependent: mass only on the diagonal
    val dep = (for {
      k <- Seq("x", "y"); _ <- 0 until 10
    } yield (k, k)).toDF("a", "b")
    val chi2 = StatsOps.crosstabChi2(dep, "a", "b")
      .agg(sum("chi2")).head.getDouble(0)
    // 2x2 all-diagonal: each observed cell contributes (10-5)^2/5 = 5
    // (the table emits OBSERVED cells; the two structural zeros would
    // add another 10 to the full statistic)
    assert(math.abs(chi2 - 10.0) < 1e-6)
  }

  test("crosstab expected counts preserve the grand total") {
    val rnd = new scala.util.Random(11)
    val df = Seq.fill(500)((s"a${rnd.nextInt(4)}", s"b${rnd.nextInt(3)}"))
      .toDF("a", "b")
    val out = StatsOps.crosstabChi2(df, "a", "b").collect()
    assert(out.map(_.getAs[Long]("n")).sum === 500L)
    // expected counts also sum to n (up to the 6-dp readout rounding)
    val expSum = out.map(_.getAs[Double]("expected")).sum
    assert(math.abs(expSum - 500.0) < 1e-3)
  }

  // -- key skew --------------------------------------------------------

  test("keySkew on a uniform key reports share 1/nkeys and skew 1") {
    val df = (for { k <- 0 until 20; _ <- 0 until 5 } yield k)
      .toDF("k")
    val out = StatsOps.keySkew(df, "k", topN = 10).collect()
    assert(out.length === 10)
    out.foreach { r =>
      assert(r.getAs[Long]("cnt") === 5L)
      assert(r.getAs[Double]("share") === 0.05)
      assert(r.getAs[Double]("skew") === 1.0)
    }
    // uniform ties break on the key value: lowest 10 keys surface
    assert(out.map(_.getAs[Int]("key")).toSeq === (0 until 10))
    // cumulative share climbs by exactly one share per row (compare
    // through the same double-op sequence the engine rounds through)
    assert(out.map(_.getAs[Double]("cum_share")).toSeq ===
      (1 to 10).map(i =>
        math.round((i * 5L).toDouble / 100 * 1e6) / 1e6))
  }

  test("keySkew surfaces the hot key first with the exact skew ratio " +
    "and is deterministic under repartitioning") {
    // 1 key with 100 rows + 9 keys with 1 row: total 109, nkeys 10
    val df = (Seq.fill(100)(7) ++ (1 to 9).map(_ + 100)).toDF("k")
    val out = StatsOps.keySkew(df, "k", topN = 10).collect()
    assert(out.head.getAs[Int]("key") === 7)
    assert(out.head.getAs[Long]("cnt") === 100L)
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    assert(out.head.getAs[Double]("share") === r6(100.0 / 109))
    assert(out.head.getAs[Double]("skew") === r6(100.0 * 10 / 109))
    assert(out.last.getAs[Double]("cum_share") === 1.0)
    val again = StatsOps.keySkew(df.repartition(7), "k", topN = 10)
      .collect()
    assert(again.toSeq === out.toSeq)
  }

  // -- rfm ---------------------------------------------------------------

  test("rfm scores land in 1..5, extremes score 5, and the segment " +
    "concatenates the three scores") {
    // 10 entities: entity i places i+1 orders of amount 100*(i+1),
    // most recent order i days before the table max ⇒ entity 9 is
    // best on all three dimensions, entity 0 worst on F/M
    val rows = (0 until 10).flatMap { i =>
      (0 to i).map(j => (i.toLong,
        java.sql.Date.valueOf(java.time.LocalDate.of(2026, 1, 28)
          .minusDays(i + j)).toString,
        100.0 * (i + 1)))
    }
    val df = rows.toDF("cust", "d", "amt")
      .select(col("cust"), to_timestamp(col("d")).as("d"), col("amt"))
    val out = StatsOps.rfm(df, "cust", "d", "amt").collect()
    assert(out.length === 10)
    out.foreach { r =>
      Seq("r_score", "f_score", "m_score").foreach { c =>
        val v = r.getAs[Int](c)
        assert(v >= 1 && v <= 5, s"$c=$v out of range: $r")
      }
      assert(r.getAs[String]("segment") ===
        s"${r.getAs[Int]("r_score")}${r.getAs[Int]("f_score")}" +
          s"${r.getAs[Int]("m_score")}")
    }
    val best = out.find(_.getAs[Long]("cust") == 9L).get
    assert(best.getAs[Int]("f_score") === 5)
    assert(best.getAs[Int]("m_score") === 5)
    assert(best.getAs[Long]("r_days") === 9L)
    // entity 0 ordered once at the table max date: r_days 0 ⇒ best
    // recency, worst frequency/monetary
    val worst = out.find(_.getAs[Long]("cust") == 0L).get
    assert(worst.getAs[Int]("r_score") === 5)
    assert(worst.getAs[Int]("f_score") === 1)
    assert(worst.getAs[Int]("m_score") === 1)
    val again = StatsOps.rfm(df.repartition(7), "cust", "d", "amt")
      .collect()
    assert(again.toSeq === out.toSeq)
  }

  // -- join size ---------------------------------------------------------

  test("joinSizeEstimate predicts the exact self-join and cross-join " +
    "cardinality with the hottest key") {
    val left = (Seq.fill(2)("a") ++ Seq.fill(3)("b")).toDF("k")
    val self = StatsOps.joinSizeEstimate(left, left, "k").collect().head
    assert(self.getAs[Long]("left_rows") === 5L)
    assert(self.getAs[Long]("matched_keys") === 2L)
    assert(self.getAs[Long]("est_rows") === 13L)   // 2^2 + 3^2
    assert(self.getAs[String]("hottest_key") === "b")
    assert(self.getAs[Long]("hottest_pairs") === 9L)
    assert(self.getAs[Double]("expansion") === 2.6)
    // the prediction equals the materialized join size
    assert(left.as("l").join(left.as("r"), "k").count() === 13L)
    val right = (Seq.fill(4)("b") ++ Seq.fill(1)("c")).toDF("k")
    val cross = StatsOps.joinSizeEstimate(left, right, "k")
      .collect().head
    assert(cross.getAs[Long]("est_rows") === 12L)  // only b matches: 3*4
    assert(cross.getAs[Long]("matched_keys") === 1L)
    assert(left.join(right, "k").count() === 12L)
  }

  // -- lorenz / gini -------------------------------------------------------

  test("lorenzGini: perfect equality scores 0, total concentration " +
    "scores (n-1)/n, and deciles read the Lorenz curve") {
    // 20 entities, one value row each, all equal
    val eq = (1 to 20).map(e => (e.toLong, 50.0)).toDF("e", "v")
    val eqOut = StatsOps.lorenzGini(eq, "e", "v").collect()
    assert(eqOut.length === 10)
    eqOut.foreach(r => assert(r.getAs[Double]("gini") === 0.0))
    assert(eqOut.map(r => (r.getAs[Int]("decile"),
      r.getAs[Double]("cum_share"))).toSeq ===
      (1 to 10).map(d => (d, d / 10.0)))
    // one entity holds everything (others contribute epsilon-free 0)
    val conc = ((1 to 19).map(e => (e.toLong, 0.0)) :+ (20L, 1000.0))
      .toDF("e", "v")
    val cOut = StatsOps.lorenzGini(conc, "e", "v").collect()
    val expectGini = math.round((2.0 * 20 * 1000.0 /
      (20.0 * 1000.0) - 21.0 / 20.0) * 1e6) / 1e6 // = (n-1)/n = 0.95
    cOut.foreach(r => assert(r.getAs[Double]("gini") === expectGini))
    assert(cOut.filter(_.getAs[Int]("decile") < 10)
      .forall(_.getAs[Double]("cum_share") === 0.0))
    assert(cOut.find(_.getAs[Int]("decile") == 10).get
      .getAs[Double]("cum_share") === 1.0)
  }

  test("lorenzGini matches the brute-force global-sort computation on " +
    "random data and is deterministic under repartitioning") {
    val rnd = new scala.util.Random(23)
    val rows = (1 to 500).map(e =>
      (e.toLong, math.round(rnd.nextDouble() * 10000) / 100.0))
    val df = rows.toDF("e", "v")
    val out = StatsOps.lorenzGini(df, "e", "v").collect()
    // brute force in exact cents
    val sorted = rows.map { case (e, v) =>
      (e, BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP))
    }.sortBy { case (e, m) => (m, e) }
    val n = sorted.length
    val tot = sorted.map(_._2).sum
    val s = sorted.zipWithIndex
      .map { case ((_, m), i0) => m * (i0 + 1) }.sum
    val gini = math.round((2.0 * s.toDouble / (n.toDouble * tot.toDouble)
      - (n + 1.0) / n) * 1e6) / 1e6
    out.foreach(r => assert(r.getAs[Double]("gini") === gini))
    (1 to 10).foreach { d =>
      val iD = n * d / 10
      val cum = sorted.take(iD).map(_._2).sum
      assert(out.find(_.getAs[Int]("decile") == d).get
          .getAs[Double]("cum_share") ===
        math.round(cum.toDouble / tot.toDouble * 1e6) / 1e6, s"d=$d")
    }
    val again = StatsOps.lorenzGini(df.repartition(7), "e", "v")
      .collect()
    assert(again.toSeq === out.toSeq)
  }

  // -- quantile bins -------------------------------------------------------

  test("quantileBins: equal-frequency bins on distinct values, bins " +
    "tile the range, and counts sum to the input") {
    val df = (1 to 1000).map(_.toDouble).toDF("v")
    val out = StatsOps.quantileBins(df, "v", nBins = 10).collect()
    assert(out.length === 10)
    assert(out.map(_.getAs[Long]("n")).sum === 1000L)
    // distinct uniform values: every decile bin holds exactly 100
    out.foreach(r => assert(r.getAs[Long]("n") === 100L, r.toString))
    // bins are ordered and non-overlapping: each hi < next lo
    val sorted = out.sortBy(_.getAs[Int]("bin"))
    sorted.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Double]("hi") < b.getAs[Double]("lo"))
      case _ =>
    }
    val again = StatsOps.quantileBins(df.repartition(7), "v", 10)
      .collect()
    assert(again.toSeq === out.toSeq)
    // heavy ties collapse into the tied value's bin, counts still sum
    val skewed = (Seq.fill(500)(1.0) ++ (1 to 500).map(_ + 1.0))
      .toDF("v")
    val sk = StatsOps.quantileBins(skewed, "v", nBins = 4).collect()
    assert(sk.map(_.getAs[Long]("n")).sum === 1000L)
  }

  test("bootstrapCiMean: CI brackets the true mean, boot_se tracks " +
    "the CLT width, resample weights average ~1, and the whole " +
    "readout is repartition-deterministic") {
    import spark.implicits._
    val rnd = new scala.util.Random(73)
    val xs = (1 to 4000).map(i => (i.toLong, 50.0 + rnd.nextGaussian() * 10))
    val df = xs.toDF("id", "x")
    val r = StatsOps.bootstrapCiMean(df, "id", "x").collect()(0)
    val mean = xs.map(_._2).sum / xs.size
    val sd = math.sqrt(xs.map(v => (v._2 - mean) * (v._2 - mean)).sum /
      (xs.size - 1))
    val cltSe = sd / math.sqrt(xs.size)
    assert(math.abs(r.getAs[Double]("mean") -
      math.round(mean * 1e6) / 1e6) < 1e-9)
    assert(r.getAs[Long]("resamples") === 200L)
    // bootstrap se within 35% of the CLT se (200 resamples of n=4000)
    val se = r.getAs[Double]("boot_se")
    assert(se > cltSe * 0.65 && se < cltSe * 1.35,
      s"boot_se $se vs CLT $cltSe")
    // the 95% CI brackets the sample mean and spans ~2*1.96*se
    assert(r.getAs[Double]("ci_lo") <= r.getAs[Double]("mean"))
    assert(r.getAs[Double]("ci_hi") >= r.getAs[Double]("mean"))
    val span = r.getAs[Double]("ci_hi") - r.getAs[Double]("ci_lo")
    assert(span > 2.6 * se && span < 5.2 * se, s"span $span se $se")
    // determinism: identical row on a 7-way repartition
    val r2 = StatsOps.bootstrapCiMean(df.repartition(7), "id", "x")
      .collect()(0)
    assert(r.toSeq === r2.toSeq)
    // the discretized Poisson(1) ladder keeps total resample weight
    // within 2% of n on average (mean weight ~ 1)
    assert(math.abs(r.getAs[Double]("boot_mean") -
      r.getAs[Double]("mean")) < 3 * se)
  }

  test("oddsRatio: hand-computed 2x2 closed forms; OR = 1 inside the " +
    "CI on independent margins; zero cell gives NULLs") {
    import spark.implicits._
    import graft.operators.StatsOps
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    // a=40 b=60 c=20 d=80: OR = 40*80/(60*20) = 2.6667
    val rows = Seq.fill(40)((true, true)) ++ Seq.fill(60)((true, false)) ++
      Seq.fill(20)((false, true)) ++ Seq.fill(80)((false, false))
    val r = StatsOps.oddsRatio(rows.toDF("ex", "oc"), "ex", "oc")
      .collect()(0)
    assert(r.getAs[Double]("odds_ratio") === r6(40.0 * 80 / (60 * 20)))
    assert(r.getAs[Double]("risk_ratio") === r6((40.0 / 100) / (20.0 / 100)))
    val seLo = math.sqrt(1.0 / 40 + 1.0 / 60 + 1.0 / 20 + 1.0 / 80)
    assert(r.getAs[Double]("or_lo") ===
      r6(math.exp(math.log(40.0 * 80 / (60 * 20)) - 1.96 * seLo)))
    assert(r.getAs[Double]("p_value") < 0.05) // real association
    assert(r.getAs[Double]("or_lo") > 1.0)
    // zero cell -> NULL ratios, row still emitted
    val z = (Seq.fill(30)((true, true)) ++ Seq.fill(30)((false, false)))
      .toDF("ex", "oc")
    val rz = StatsOps.oddsRatio(z, "ex", "oc").collect()(0)
    assert(rz.isNullAt(rz.fieldIndex("odds_ratio")))
  }

  test("msprt: always-valid p is non-increasing, stays high on a " +
    "true null, and crosses 0.05 on a planted effect") {
    import spark.implicits._
    import java.sql.Timestamp
    import graft.operators.StatsOps
    val rnd = new scala.util.Random(37)
    def mk(shift: Double) = (0 until 20).flatMap { day =>
      (0 until 200).map { i =>
        val arm = if (i % 2 == 0) "A" else "B"
        val v = rnd.nextGaussian() + (if (arm == "A") shift else 0.0)
        (new Timestamp(1700000000000L + day * 86400000L + i * 1000L),
          arm, v)
      }
    }
    val eff = StatsOps.msprt(mk(0.5).toDF("ts", "arm", "value"),
      "ts", "arm", "value", "A", "B").collect()
    val ps = eff.map(_.getAs[Double]("p_always_valid")).toSeq
    assert(ps === ps.sorted.reverse, "always-valid p must be " +
      "non-increasing over looks")
    assert(ps.last < 0.05, s"planted effect not detected: ${ps.last}")
    val nul = StatsOps.msprt(mk(0.0).toDF("ts", "arm", "value"),
      "ts", "arm", "value", "A", "B").collect()
    assert(nul.last.getAs[Double]("p_always_valid") > 0.05,
      s"false detection on a true null: ${nul.last}")
  }

  test("ebShrinkage: small-n entities pull toward the prior mean, " +
    "large-n keep their data, ordering by evidence holds, and a " +
    "degenerate prior yields NULL shrunk rates") {
    import spark.implicits._
    import graft.operators.StatsOps
    val rnd = new scala.util.Random(97)
    // entities with true rates ~ Beta(4, 6) (mean 0.4), varying n
    val rows = (1 to 400).flatMap { e =>
      val p = {
        // crude Beta(4,6) via order statistics of 9 uniforms
        val u = Seq.fill(9)(rnd.nextDouble()).sorted; u(3)
      }
      val n = if (e % 10 == 0) 2 else 20 + rnd.nextInt(180)
      (1 to n).map(_ => (e.toLong, rnd.nextDouble() < p))
    }
    val df = rows.toDF("ent", "hit")
    val out = StatsOps.ebShrinkage(df, "ent", "hit").collect()
    val alpha = out.head.getAs[Double]("alpha")
    val beta = out.head.getAs[Double]("beta")
    assert(alpha > 0 && beta > 0)
    val priorMean = alpha / (alpha + beta)
    out.foreach { r =>
      val raw = r.getAs[Double]("rate_raw")
      val shr = r.getAs[Double]("rate_shrunk")
      val n = r.getAs[Long]("n")
      // shrinkage moves every estimate TOWARD the prior mean
      assert((shr - raw).abs <= (priorMean - raw).abs + 1e-9,
        s"overshot the prior: $r")
      if (n <= 2 && (raw - priorMean).abs > 0.05)
        assert((shr - priorMean).abs < (raw - priorMean).abs,
          s"tiny-n entity not shrunk: $r")
      if (n >= 150)
        assert((shr - raw).abs < 0.1, s"big-n entity over-shrunk: $r")
    }
    // degenerate: all entities identical rates -> v = 0 -> NULL shrunk
    val const = (1 to 50).flatMap(e =>
      (1 to 10).map(i => (e.toLong, i % 2 == 0))).toDF("ent", "hit")
    val oc = StatsOps.ebShrinkage(const, "ent", "hit").collect()
    assert(oc.forall(_.isNullAt(oc.head.fieldIndex("rate_shrunk"))))
    assert(oc.forall(r => !r.isNullAt(r.fieldIndex("rate_raw"))))
  }

  test("evtGumbel: MoM identities hold and return levels are ordered " +
    "on a planted Gumbel sample; degenerate constant maxima give NULLs") {
    import spark.implicits._
    import java.sql.Timestamp
    import graft.operators.StatsOps
    val rnd = new scala.util.Random(61)
    // one value per day whose daily max IS a Gumbel(mu=5, beta=2) draw
    val mu = 5.0; val beta = 2.0
    val rows = (0 until 2000).map { day =>
      val u = rnd.nextDouble()
      val g = mu - beta * math.log(-math.log(u))
      (new Timestamp(1500000000000L + day * 86400000L), g)
    }
    val r = StatsOps.evtGumbel(rows.toDF("ts", "v"), "ts", "v")
      .collect()(0)
    assert(r.getAs[Long]("n_blocks") === 2000L)
    assert(math.abs(r.getAs[Double]("gumbel_mu") - mu) < 0.25)
    assert(math.abs(r.getAs[Double]("gumbel_beta") - beta) < 0.2)
    // MoM identities: mu = mean - gamma*beta, beta = sd*sqrt(6)/pi
    val m = r.getAs[Double]("mean_max"); val sd = r.getAs[Double]("sd_max")
    val b = r.getAs[Double]("gumbel_beta")
    assert(math.abs(b - sd * math.sqrt(6.0) / math.Pi) < 1e-5)
    assert(math.abs(r.getAs[Double]("gumbel_mu") -
      (m - 0.5772156649015329 * b)) < 1e-5)
    assert(r.getAs[Double]("ret_level_100") >
      r.getAs[Double]("ret_level_10"))
    assert(r.getAs[Double]("ret_level_10") > m)
    val const = (0 until 10).map(day =>
      (new Timestamp(1500000000000L + day * 86400000L), 7.0))
      .toDF("ts", "v")
    val rc = StatsOps.evtGumbel(const, "ts", "v").collect()(0)
    assert(rc.isNullAt(rc.fieldIndex("gumbel_mu")))
  }

  test("distFit recovers lognormal parameters on an exact-lognormal " +
    "sample and gamma MoM on a constant-free fixture; nonpositive " +
    "rows excluded but counted") {
    import spark.implicits._
    import graft.operators.StatsOps
    val rnd = new scala.util.Random(53)
    val mu = 1.5; val sigma = 0.4
    val xs = Seq.fill(20000)(math.exp(mu + sigma * rnd.nextGaussian()))
    val df = (xs.map(("g", _)) ++ Seq(("g", 0.0), ("g", -1.0)))
      .toDF("grp", "v")
    val r = StatsOps.distFit(df, "v", "grp").collect()(0)
    assert(r.getAs[Long]("n_total") === 20002L)
    assert(r.getAs[Long]("n") === 20000L)
    assert(math.abs(r.getAs[Double]("lnorm_mu") - mu) < 0.02)
    assert(math.abs(r.getAs[Double]("lnorm_sigma") - sigma) < 0.02)
    // gamma MoM identities: k*theta = mean, k*theta^2 = variance
    val k = r.getAs[Double]("gamma_k")
    val th = r.getAs[Double]("gamma_theta")
    assert(math.abs(k * th - r.getAs[Double]("mean")) < 1e-3)
    val sd = r.getAs[Double]("stddev")
    assert(math.abs(k * th * th - sd * sd) < sd * sd * 1e-3)
  }
}
