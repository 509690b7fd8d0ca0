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
}
