package graft

import graft.operators.{HypothesisOps, RankSpine}
import org.apache.spark.sql.functions._

/** Laws for the heavy-tail-safe rank spine (VERDICT r13 item 1): on
  * the adversarial shape that degenerated the single-level spine —
  * range set by outliers, mass concentrated in one fixed-width cell,
  * the Theil–Sen slope-table shape — every bucket the within-bucket
  * window partitions by must stay ≤ cap rows; the cumulative sums must
  * be bucket-assignment-invariant (same answer at any cap); and
  * non-convergence must THROW, never silently ship an unbounded sort.
  */
class RankSpineSpec extends SparkSpec {
  import spark.implicits._

  /** The degenerate fixture: 20k distinct values packed into [0, 1e-3]
    * (all land in ONE of 8192 fixed-width cells once the range is
    * stretched), plus outliers at 1e6 and 1e12 setting the range. */
  private def heavyTail = (
    (1 to 20000).map(i => i / 2.0e7) ++ Seq(1.0e6, 1.0e12)
  ).toDF("v").groupBy("v").agg(count(lit(1)).as("c"))

  test("assignBuckets bounds every bucket at cap on the outlier-" +
    "stretched fixture, refining past level 1") {
    val assigned = RankSpine.assignBuckets(heavyTail, "v", cap = 256)
    val sizes = assigned.groupBy("__bkt").agg(count(lit(1)).as("n"))
    val maxSize = sizes.agg(max("n")).head.getLong(0)
    assert(maxSize <= 256,
      s"within-bucket partition of $maxSize rows exceeds the 256 cap")
    // the single-level spine would have put all 20k values in one
    // cell; bounded buckets here REQUIRE multi-level paths
    val maxDepth = assigned.agg(max(size(col("__bkt")))).head.getInt(0)
    assert(maxDepth >= 2, "fixture must force at least one refinement")
    // refinement must not lose or duplicate rows
    assert(assigned.count() === heavyTail.count())
  }

  test("nested heavy tail (three dynamic-range decades) refines " +
    "recursively and still bounds every bucket") {
    // mass at 1e-8 scale, a mid outlier at 1e-4, a far outlier at 1.0:
    // round 0 and round 1 each leave one cell holding all the mass
    val g = ((1 to 2000).map(i => i / 2.0e11) ++ Seq(1.0e-4, 1.0))
      .toDF("v").groupBy("v").agg(count(lit(1)).as("c"))
    val assigned = RankSpine.assignBuckets(g, "v", cap = 256)
    val maxSize = assigned.groupBy("__bkt").agg(count(lit(1)).as("n"))
      .agg(max("n")).head.getLong(0)
    assert(maxSize <= 256)
    val maxDepth = assigned.agg(max(size(col("__bkt")))).head.getInt(0)
    assert(maxDepth >= 3, s"expected ≥3 refinement levels, got $maxDepth")
  }

  test("cumulative sums are bucket-assignment-invariant: tight cap and " +
    "default cap agree with the brute-force cumulative") {
    val rows = heavyTail.collect().map(r => (r.getDouble(0), r.getLong(1)))
      .sortBy(_._1)
    val brute = rows.scanLeft(0L)(_ + _._2).tail
    val expected = rows.map(_._1).zip(brute).toMap
    Seq(256, RankSpine.DefaultCap).foreach { cap =>
      val got = RankSpine
        .cumulative(heavyTail, "v", Seq("c"), Seq("cum"), cap)
        .select("v", "cum").collect()
        .map(r => r.getDouble(0) -> r.getLong(1)).toMap
      assert(got === expected, s"cap=$cap cumulative diverged")
    }
  }

  test("ksTest and mannWhitney on the heavy-tail fixture match the " +
    "brute-force statistics end-to-end") {
    // group A: the concentrated mass; group B: shifted mass + both
    // outliers — exercises cumCounts through the refined spine
    val a = (1 to 4000).map(i => i / 2.0e7)
    val b = (1 to 4000).map(i => (i + 1500) / 2.0e7) ++
      Seq(1.0e6, 1.0e12)
    val df = (a.map(("A", _)) ++ b.map(("B", _))).toDF("g", "v")
    val vs = (a ++ b).distinct.sorted
    val bruteD = vs.map { v =>
      math.abs(a.count(_ <= v).toDouble / a.size -
        b.count(_ <= v).toDouble / b.size)
    }.max
    val ks = HypothesisOps.ksTest(df, "v", "g", "A", "B").collect()(0)
    assert(ks.getAs[Double]("d_stat") ===
      math.round(bruteD * 1e6) / 1e6)
    val pooled = a ++ b
    def avgRank(v: Double): Double =
      pooled.count(_ < v) + (pooled.count(_ == v) + 1) / 2.0
    val bruteU = a.map(avgRank).sum - a.size * (a.size + 1) / 2.0
    val mw = HypothesisOps.mannWhitney(df, "v", "g", "A", "B")
      .collect()(0)
    assert(mw.getAs[Double]("u") === math.round(bruteU * 1e6) / 1e6)
  }

  test("grouped mode: per-group heavy tails refine independently, " +
    "buckets stay bounded per (group, path), and the cumulative " +
    "equals the per-group brute force") {
    // group A: the outlier-stretched mass; group B: a benign uniform
    // on a DIFFERENT range — per-group bounds must not cross-talk
    val g = (
      (1 to 5000).map(i => ("A", i / 2.0e7)) ++ Seq(("A", 1.0e12)) ++
      (1 to 3000).map(i => ("B", 100.0 + i))
    ).toDF("grp", "v").groupBy("grp", "v").agg(count(lit(1)).as("c"))
    val assigned = RankSpine.assignBuckets(g, "v", cap = 256,
      partitionCols = Seq("grp"))
    val maxSize = assigned.groupBy("grp", "__bkt")
      .agg(count(lit(1)).as("n")).agg(max("n")).head.getLong(0)
    assert(maxSize <= 256)
    // A's tail forces refinement; B converges at level 1
    val depths = assigned.groupBy("grp")
      .agg(max(size(col("__bkt"))).as("d")).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(depths("A") >= 2 && depths("B") === 1, depths.toString)
    // grouped cumulative ≡ per-group brute force
    val cum = RankSpine.cumulative(g, "v", Seq("c"), Seq("cum"),
      cap = 256, partitionCols = Seq("grp"))
      .select("grp", "v", "cum").collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getLong(2)).toMap
    val rows = g.collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    rows.groupBy(_._1).foreach { case (grp, rs) =>
      val sorted = rs.sortBy(_._2)
      val brute = sorted.scanLeft(0L)(_ + _._3).tail
      sorted.map(_._2).zip(brute).foreach { case (v, exp) =>
        assert(cum((grp, v)) === exp, s"($grp, $v)")
      }
    }
  }

  test("micro-magnitude column (20k distincts inside a 2e-13 span, " +
    "outlier-stretched) converges within the round budget — the " +
    "span-relative epsilon regression fixture") {
    // the r14 ABSOLUTE 1e-9 epsilon capped sub-bucket resolution at
    // ~1e-13: these values (spacing 1e-17, span 2e-13, range set by
    // the 1e6 outlier) never separated and assignBuckets threw after
    // maxRounds. Span-relative refinement must bound every bucket.
    val g = ((1 to 20000).map(i => i * 1.0e-17) ++ Seq(1.0e6))
      .toDF("v").groupBy("v").agg(count(lit(1)).as("c"))
    val assigned = RankSpine.assignBuckets(g, "v", cap = 256)
    val maxSize = assigned.groupBy("__bkt").agg(count(lit(1)).as("n"))
      .agg(max("n")).head.getLong(0)
    assert(maxSize <= 256,
      s"within-bucket partition of $maxSize rows exceeds the 256 cap")
    assert(assigned.count() === g.count())
    // and the cumulative over the refined spine stays exact
    val rows = g.collect().map(r => (r.getDouble(0), r.getLong(1)))
      .sortBy(_._1)
    val brute = rows.scanLeft(0L)(_ + _._2).tail
    val expected = rows.map(_._1).zip(brute).toMap
    val got = RankSpine
      .cumulative(g, "v", Seq("c"), Seq("cum"), cap = 256)
      .select("v", "cum").collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }

  test("non-convergence throws instead of shipping an unbounded sort") {
    // the fixture's level-0 assignment leaves one oversized bucket;
    // forbidding refinement rounds must throw, not proceed unbounded
    val e = intercept[IllegalStateException] {
      RankSpine.assignBuckets(heavyTail, "v", cap = 256, maxRounds = 0)
    }
    assert(e.getMessage.contains("did not converge"))
  }
}
