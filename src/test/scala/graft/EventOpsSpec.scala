package graft

import org.apache.spark.sql.functions._

/** Batch event-analytics tier (EventOps) + the round-11 relational
  * additions (q_corr / q_histogram / q_merge_upsert): each query's law
  * checked against an independent in-memory computation at sf0.001,
  * plus repartition determinism for every DECIMAL-sum fold. */
class EventOpsSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  // ---- q_anomaly ----

  test("anomaly: flagged set matches a brute-force per-type z-score") {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select("event_id", "event_type", "value")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val byType = ev.groupBy(_._2)
    val want = ev.filter { case (_, t, v) =>
      val vs = byType(t).map(_._3)
      val n = vs.length.toDouble
      val m = vs.sum / n
      val sd = math.sqrt(vs.map(x => (x - m) * (x - m)).sum / (n - 1))
      math.abs((v - m) / sd) > 3.0
    }.map(_._1).toSet
    val got = run("q_anomaly").select("event_id").collect()
      .map(_.getLong(0)).toSet
    // DECIMAL-sum moments vs naive double moments can disagree only in
    // the last bits — far from the 3.0 cut for any real row — so the
    // flagged SETS must match even though the z values differ in noise.
    assert(got === want)
    assert(got.nonEmpty, "fixture must flag at least one outlier")
  }

  test("anomaly_mad: flagged set matches a brute-force median/MAD " +
    "scoring and is larger than the sigma-based set on this tail") {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select("event_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    def medianOf(xs: Seq[Double]): Double = {
      val s = xs.sorted; val n = s.length
      val pos = 0.5 * (n - 1); val lo = s(pos.toInt)
      val hi = s(math.min(pos.toInt + 1, n - 1))
      lo + (hi - lo) * (pos - pos.toInt)
    }
    val byType = ev.groupBy(_._2)
    val want = ev.filter { case (_, t, v) =>
      val vs = byType(t).map(_._3).toSeq
      val med = medianOf(vs)
      val mad = medianOf(vs.map(x => math.abs(x - med)))
      math.abs(0.6745 * (v - med) / mad) > 3.5
    }.map(_._1).toSet
    val got = run("q_anomaly_mad").select("event_id").collect()
      .map(_.getLong(0)).toSet
    assert(got === want)
    val sigma = run("q_anomaly").count()
    assert(got.size > sigma,
      s"robust scoring must out-flag sigma on this tail: ${got.size} vs $sigma")
  }

  test("anomalyMad excludes zero-MAD groups: a group where a " +
    "majority of values equal the median scores 0/0 — undefined, " +
    "dropped — while healthy groups still flag") {
    import spark.implicits._
    val df = (
      // degenerate group: 9 of 10 values identical → MAD = 0
      (1L to 9L).map(i => (i, "flat", 5.0)) :+ ((10L, "flat", 500.0))
    ) ++ (
      // healthy group: tight cluster + one wild outlier
      (11L to 20L).map(i => (i, "ok", i.toDouble % 3)) :+ ((21L, "ok", 1e6))
    )
    val out = graft.operators.EventOps
      .anomalyMad(df.toDF("event_id", "event_type", "value"),
        "event_type", "event_id", "value")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(!out.exists(_._2 == "flat"),
      s"zero-MAD group must be excluded, got ${out.mkString(",")}")
    assert(out.contains((21L, "ok")), out.mkString(","))
  }

  test("anomaly: deterministic under repartitioning") {
    val a = run("q_anomaly").collect().toSeq
    val b = SparkEntry.queries("q_anomaly")(spark, sfDir) // fresh plan
    assert(b.repartition(7).orderBy("event_id").collect().toSeq === a)
  }

  // ---- q_retention ----

  test("retention: offset-0 row counts every cohort's full size and " +
    "offsets never exceed the cohort size") {
    val rows = run("q_retention").collect()
      .map(r => (r.getDate(0), r.getLong(1), r.getLong(2)))
    val cohortSize = rows.filter(_._2 == 0L).map(t => t._1 -> t._3).toMap
    // every user is active on their own first-seen day
    val users = spark.read.parquet(s"$sfDir/events.parquet")
      .select("user_id").distinct().count()
    assert(cohortSize.values.sum === users)
    rows.foreach { case (day, off, n) =>
      assert(off >= 0L)
      assert(n <= cohortSize(day),
        s"cohort $day offset $off: $n > cohort size ${cohortSize(day)}")
    }
  }

  // ---- q_event_funnel ----

  test("funnel: stage counts are non-increasing and match brute force") {
    val got = run("q_event_funnel").collect()
      .map(r => (r.getInt(0), r.getLong(2)))
    assert(got.map(_._1).toSeq === Seq(1, 2, 3))
    val Seq(c1, c2, c3) = got.map(_._2).toSeq
    assert(c1 >= c2 && c2 >= c3)
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val perUser = ev.groupBy(_._1).values.map { rs =>
      def t(k: String) =
        rs.filter(_._2 == k).map(_._3) match {
          case e if e.isEmpty => None; case e => Some(e.min)
        }
      (t("view"), t("click"), t("purchase"))
    }
    val w1 = perUser.count(_._1.isDefined)
    val w2 = perUser.count { case (a, b, _) =>
      a.isDefined && b.exists(_ > a.get) }
    val w3 = perUser.count { case (a, b, c) =>
      a.isDefined && b.exists(_ > a.get) && c.exists(x => b.exists(x > _)) }
    assert((c1, c2, c3) === (w1, w2, w3))
  }

  // ---- q_corr ----

  test("corr: coefficients in [-1,1], covariance matches brute force " +
    "to 1e-6, deterministic under repartitioning") {
    val rows = run("q_corr").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_returnflag", "l_quantity", "l_extendedprice").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    rows.foreach { case (flag, n, cov, corr) =>
      assert(corr >= -1.0 && corr <= 1.0)
      val g = li.filter(_._1 == flag)
      assert(n === g.length)
      val mx = g.map(_._2).sum / n
      val my = g.map(_._3).sum / n
      val want = g.map(t => (t._2 - mx) * (t._3 - my)).sum / (n - 1)
      assert(math.abs(cov - want) < 1e-4 * math.max(1.0, math.abs(want)),
        s"$flag: cov $cov vs brute $want")
    }
    val again = SparkEntry.queries("q_corr")(spark, sfDir)
      .repartition(5).orderBy("l_returnflag").collect()
    assert(again.toSeq === run("q_corr").collect().toSeq)
  }

  // ---- q_histogram ----

  test("histogram: bucket counts partition the table; edges consistent") {
    val rows = run("q_histogram").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val total = spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    assert(rows.map(_._3).sum === total)
    rows.foreach { case (b, lo, n) =>
      assert(lo === b * 5000.0)
      assert(n > 0L) // empty buckets are absent, not zero rows
    }
    assert(rows.map(_._1).toSeq === rows.map(_._1).sorted.toSeq)
  }

  // ---- q_merge_upsert ----

  test("merge upsert: action partition reconciles with base and change " +
    "set; updated prices are the exact DECIMAL 1.1x") {
    val base = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    val out = run("q_merge_upsert").collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getString(3)))
    val byAction = out.groupBy(_._3).view.mapValues(_.length).toMap
    val updKeys = base.keySet.filter(_ % 7 == 0)
    val insKeys = base.keySet.filter(_ % 97 == 0)
    assert(byAction("update") === updKeys.size)
    assert(byAction("insert") === insKeys.size)
    assert(byAction("keep") === base.size - updKeys.size)
    assert(out.length === base.size + insKeys.size)
    // updated rows carry the exact decimal bump
    out.filter(_._3 == "update").foreach { case (k, p, _) =>
      val want = (BigDecimal(base(k)).setScale(2, BigDecimal.RoundingMode.HALF_UP)
        * BigDecimal("1.1")).toDouble
      assert(p === want, s"key $k")
    }
    // inserts surface under the shifted key with the original price
    out.filter(_._3 == "insert").foreach { case (k, p, _) =>
      assert(p === base(k - 10000000L))
    }
  }

  test("merge takes the update's values INCLUDING NULLs — a change " +
    "that clears a field lands, not silently keeps the stale value") {
    import spark.implicits._
    val b = Seq((1L, Option("a")), (2L, Option("b")))
      .toDF("id", "name")
    val u = Seq((1L, Option.empty[String])).toDF("id", "name")
    val m = graft.operators.RelationalOps.mergeUpsert(b, u, "id")
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getString(1)), r.getString(2)))).toMap
    assert(m(1L) === ((None, "update")), m.toString)
    assert(m(2L) === ((Some("b"), "keep")), m.toString)
  }

  test("merge with NULL keys: a NULL-key update inserts WITH its " +
    "payload and a NULL-key base row keeps — presence markers, not " +
    "key nullability, decide match status") {
    import spark.implicits._
    val b = Seq((Option(1L), Option("a")), (Option.empty[Long], Option("orphan")))
      .toDF("id", "name")
    val u = Seq((Option(1L), Option("a2")), (Option.empty[Long], Option("new")))
      .toDF("id", "name")
    val rows = graft.operators.RelationalOps.mergeRows(b, u, "id")
      .collect()
      .map(r => (Option(r.get(0)).map(_.asInstanceOf[Long]),
        r.getString(1), r.getString(2)))
      .toSet
    assert(rows === Set(
      (Some(1L), "a2", "update"),     // matched on the real key
      (None, "orphan", "keep"),       // NULL-key base row carries through
      (None, "new", "insert")))       // NULL-key update keeps its payload
  }

  // ---- q_argmax ----

  test("argmax: the aggregate champion equals the window-rank top-1 " +
    "per customer on both ends of the ordering") {
    val agg = run("q_argmax").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3)))).toMap
    import org.apache.spark.sql.expressions.Window
    val ord = spark.read.parquet(s"$sfDir/orders.parquet")
    def top(desc: Boolean) = {
      val w = Window.partitionBy("o_custkey").orderBy(
        if (desc) col("o_totalprice").desc else col("o_totalprice").asc,
        if (desc) col("o_orderkey").desc else col("o_orderkey").asc)
      ord.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
    }
    val (best, cheapest) = (top(desc = true), top(desc = false))
    agg.foreach { case (cust, (b, c)) =>
      assert(b === best(cust), s"cust $cust best")
      assert(c === cheapest(cust), s"cust $cust cheapest")
    }
  }

  // ---- q_window_range ----

  test("window_range: every event counts itself and a brute-force " +
    "trailing-hour recount agrees on a sampled user") {
    val rows = run("q_window_range").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.forall(_._3 >= 1L), "each event is in its own window")
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val u = ev.head._2
    val mine = ev.filter(_._2 == u)
    val want = mine.map { case (id, _, us) =>
      id -> mine.count(e => e._3 >= us - 3600000000L && e._3 <= us).toLong
    }.toMap
    rows.filter(_._2 == u).foreach { case (id, _, n) =>
      assert(n === want(id), s"event $id")
    }
  }

  // ---- q_drift ----

  test("drift: PSI is zero for identical populations, positive and " +
    "large for a planted shift, and non-negative everywhere") {
    import spark.implicits._
    val same = (1 to 500).flatMap(i =>
      Seq(("g", i.toDouble % 100, 0), ("g", i.toDouble % 100, 1)))
      .toDF("grp", "v", "period")
    val zero = graft.operators.EventOps.drift(same, "grp", "v",
      "period", 10.0).collect()
    assert(zero.map(_.getDouble(1)).toSeq === Seq(0.0))
    // baseline uniform in [0,100); current shifted to [200,300)
    val shifted = ((1 to 500).map(i => ("g", i.toDouble % 100, 0)) ++
      (1 to 500).map(i => ("g", 200.0 + i % 100, 1)))
      .toDF("grp", "v", "period")
    val psi = graft.operators.EventOps.drift(shifted, "grp", "v",
      "period", 10.0).collect().head.getDouble(1)
    assert(psi > 0.2, s"disjoint supports must flag hard, got $psi")
    val fixture = SparkEntry.queries("q_drift")(spark, sfDir).collect()
    assert(fixture.length === 5)
    fixture.foreach(r => assert(r.getDouble(1) >= 0.0, r.toString))
  }

  // ---- q_scd2 ----

  test("scd2: per-key intervals chain gaplessly, exactly one current " +
    "version per key, and consecutive versions always change value") {
    def ms(v: Any): Long = v match {
      case t: java.sql.Timestamp => t.getTime
      case l: java.time.LocalDateTime => // NTZ layouts surface as LDT
        l.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
      case other => fail(s"unexpected temporal $other")
    }
    val rows = run("q_scd2").collect().map(r =>
      (r.getLong(0), r.getString(1), ms(r.get(2)),
        Option(r.get(3)).map(ms), r.getBoolean(5), r.getLong(4)))
    assert(rows.nonEmpty)
    val keys = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_custkey").distinct().count()
    assert(rows.count(_._5) === keys, "one open interval per key")
    rows.groupBy(_._1).foreach { case (k, vs) =>
      // duplicate change dates are real: total-order by (from, src_key),
      // the same tiebreak the operator's window uses
      val seq = vs.sortBy(v => (v._3, v._6))
      // intervals chain: each valid_to equals the next valid_from
      seq.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4.contains(b._3), s"key $k: gap/overlap in chain")
          assert(a._2 !== b._2, s"key $k: consecutive versions equal")
        case _ => ()
      }
      assert(seq.last._4.isEmpty && seq.last._5,
        s"key $k: last version must be open and current")
      assert(seq.init.forall(!_._5), s"key $k: only the last is current")
    }
  }

  // ---- q_path_topk ----

  test("pathTopK: synthetic sessions produce the hand-derived paths " +
    "— gap split, first-N truncation, in-session total order") {
    import spark.implicits._
    val df = Seq(
      // user 1, session 1: view > click > purchase > view (truncates to 3)
      (1L, "2024-01-01 10:00:00", 1L, "view"),
      (1L, "2024-01-01 10:05:00", 2L, "click"),
      (1L, "2024-01-01 10:10:00", 3L, "purchase"),
      (1L, "2024-01-01 10:15:00", 4L, "view"),
      // user 1, session 2 (gap > 30 min): view > click
      (1L, "2024-01-01 11:00:00", 5L, "view"),
      (1L, "2024-01-01 11:20:00", 6L, "click"),
      // user 2: same-ts pair ordered by event_id, then a lone session
      (2L, "2024-01-01 10:00:00", 8L, "click"),
      (2L, "2024-01-01 10:00:00", 7L, "view"),
      (2L, "2024-01-01 12:00:00", 9L, "error")
    ).toDF("user_id", "ts", "event_id", "event_type")
      .withColumn("ts", col("ts").cast("timestamp"))
    val out = graft.operators.EventOps
      .pathTopK(df, "user_id", "ts", "event_id", "event_type")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("view>click>purchase" -> 1L, "view>click" -> 2L,
      "error" -> 1L))
  }

  test("q_path_topk: session count reconciles — the paths partition " +
    "the gaps-and-islands session set") {
    val out = run("q_path_topk").collect()
    assert(out.length === 20)
    assert(out.map(_.getLong(1)).toSeq ===
      out.map(_.getLong(1)).sortBy(-_).toSeq, "descending counts")
    // independent session count via the same gap rule
    val sessions = graft.sources.Tables.events(spark, sfDir)
      .selectExpr("user_id", "ts", "event_id")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime))
      .groupBy(_._1).map { case (_, xs) =>
        val ts = xs.map(_._2).sorted
        1 + ts.sliding(2).count {
          case Array(a, b) => b - a > 1800 * 1000L
          case _ => false
        }
      }.sum
    assert(out.map(_.getLong(1)).sum <= sessions)
  }

  // ---- q_scd2_lookup ----

  test("scd2_lookup: every fact matches exactly one version or NONE, " +
    "and a brute-force interval scan agrees on every customer") {
    val buckets = run("q_scd2_lookup").collect()
    val nFacts = spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    assert(buckets.map(_.getLong(1)).sum === nFacts,
      "bucket counts must partition the fact table")
    // brute force: collect the history and replay the interval match
    // (temporal columns surface as Date or LocalDateTime depending on
    // the parquet layout — normalize to epoch millis)
    def ms(v: Any): Long = v match {
      case d: java.sql.Date => d.getTime
      case t: java.sql.Timestamp => t.getTime
      case l: java.time.LocalDateTime =>
        l.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
      case other => fail(s"unexpected temporal $other")
    }
    val hist = run("q_scd2").collect().map(r => (r.getLong(0),
      r.getString(1), ms(r.get(2)),
      Option(r.get(3)).map(ms))).groupBy(_._1)
    val facts = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .join(spark.read.parquet(s"$sfDir/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .select("o_custkey", "l_shipdate").collect()
      .map(r => (r.getLong(0), ms(r.get(1))))
    val expected = facts.groupBy { case (ck, ship) =>
      hist.getOrElse(ck, Array.empty).find { case (_, _, from, to) =>
        ship >= from && to.forall(ship < _)
      }.map(_._2).getOrElse("NONE")
    }.map { case (p, xs) => p -> xs.length.toLong }
    assert(buckets.map(r => r.getString(0) -> r.getLong(1)).toMap
      === expected)
  }

  // ---- q_table_checksum ----

  test("table_checksum: deterministic under repartitioning, counts " +
    "reconcile, and any single-row change flips the group checksum") {
    import graft.operators.RelationalOps.tableChecksum
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val cols = Seq(col("l_orderkey"), col("l_linenumber"),
      col("l_quantity").cast("decimal(18,2)"),
      col("l_extendedprice").cast("decimal(18,2)"), col("l_shipdate"))
    def sums(df: org.apache.spark.sql.DataFrame) =
      tableChecksum(df, cols, Seq("l_returnflag")).collect()
        .map(r => r.getString(0) ->
          (r.getLong(1), r.getDecimal(2))).toMap
    val base = sums(li)
    assert(base.values.map(_._1).sum === li.count())
    assert(sums(li.repartition(13)) === base, "order independence")
    // perturb exactly one existing row's quantity; only its group moves
    val probe = li.select("l_orderkey", "l_linenumber")
      .orderBy("l_orderkey", "l_linenumber").head()
    val perturbed = sums(li.withColumn("l_quantity",
      when(col("l_orderkey") === probe.get(0)
        && col("l_linenumber") === probe.get(1),
        col("l_quantity") + 1)
        .otherwise(col("l_quantity"))))
    val changed = base.keySet.filter(k => base(k)._2 != perturbed(k)._2)
    assert(changed.size === 1, "exactly one group checksum must move")
    assert(base.view.mapValues(_._1).toMap ===
      perturbed.view.mapValues(_._1).toMap, "counts unchanged")
  }

  // ---- q_resample ----

  test("resample: each group's grid is contiguous hourly from first " +
    "to last observation; observed buckets carry exact counts; gaps " +
    "have n=0 and forward-fill the last observed mean") {
    val rows = run("q_resample").collect().map(r =>
      (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2),
        r.getBoolean(3), Option(r.get(4)).map(_.asInstanceOf[Double])))
    assert(rows.nonEmpty)
    val hourMs = 3600 * 1000L
    rows.groupBy(_._1).foreach { case (g, vs) =>
      val seq = vs.sortBy(_._2)
      seq.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._2 - a._2 === hourMs, s"$g: grid not contiguous")
        case _ => ()
      }
      assert(!seq.head._4 && !seq.last._4,
        s"$g: endpoints must be observed buckets")
      // forward fill: a gap row's v_fill equals the previous row's
      seq.sliding(2).foreach {
        case Array(a, b) if b._4 => assert(b._5 === a._5, s"$g fill")
        case _ => ()
      }
      seq.foreach { v => assert(v._4 === (v._3 == 0L), s"$g gap flag") }
    }
    // observed buckets reconcile with an independent recount
    val expected = graft.sources.Tables.events(spark, sfDir)
      .groupBy(col("event_type"),
        date_trunc("hour", col("ts")).as("h"))
      .count().collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime) -> r.getLong(2))
      .toMap
    val observed = rows.filter(!_._4)
      .map(v => (v._1, v._2) -> v._3).toMap
    assert(observed === expected)
  }

  test("resample: synthetic gaps fill with the last mean and flag " +
    "every missing grid point") {
    import spark.implicits._
    val df = Seq(
      ("a", "2024-01-01 00:10:00", 10.0),
      ("a", "2024-01-01 00:40:00", 20.0), // hour 0 mean 15.0
      ("a", "2024-01-01 03:05:00", 40.0), // hours 1,2 are gaps
      ("b", "2024-01-01 05:00:00", 7.0)
    ).toDF("g", "ts", "v")
      .withColumn("ts", col("ts").cast("timestamp"))
    val out = graft.operators.EventOps.resample(df, "g", "ts", "v")
      .collect().map(r => (r.getString(0), r.getTimestamp(1).toString,
        r.getLong(2), r.getBoolean(3), r.getDouble(4)))
    assert(out.toSeq === Seq(
      ("a", "2024-01-01 00:00:00.0", 2L, false, 15.0),
      ("a", "2024-01-01 01:00:00.0", 0L, true, 15.0),
      ("a", "2024-01-01 02:00:00.0", 0L, true, 15.0),
      ("a", "2024-01-01 03:00:00.0", 1L, false, 40.0),
      ("b", "2024-01-01 05:00:00.0", 1L, false, 7.0)))
  }

  test("ewma: hand-computed normalized weights, per-group isolation, " +
    "and span truncation") {
    import spark.implicits._
    val df = Seq(
      (1L, "u", "2024-01-01 00:00:00", 1.0),
      (2L, "u", "2024-01-01 00:01:00", 2.0),
      (3L, "u", "2024-01-01 00:02:00", 4.0),
      (4L, "w", "2024-01-01 00:00:00", 9.0)
    ).toDF("id", "g", "ts", "v")
      .withColumn("ts", col("ts").cast("timestamp"))
    val out = graft.operators.EventOps
      .ewma(df, "g", "ts", "id", "v", alpha = 0.3, span = 20)
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    // row 1: [1]            → 1.0
    // row 2: [1,2]          → (0.7·1 + 2)/1.7              = 1.588235
    // row 3: [1,2,4]        → (0.49·1 + 0.7·2 + 4)/2.19    = 2.689498
    // row 4: fresh group    → 9.0
    assert(out(1L) === 1.0 && out(4L) === 9.0)
    assert(math.abs(out(2L) - 2.7 / 1.7) < 1e-6)
    assert(math.abs(out(3L) - 5.89 / 2.19) < 1e-6)
    // span=1 degenerates to the raw series
    val raw = graft.operators.EventOps
      .ewma(df, "g", "ts", "id", "v", alpha = 0.3, span = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(raw === Map(1L -> 1.0, 2L -> 2.0, 3L -> 4.0, 4L -> 9.0))
    // span=2 drops the oldest term of row 3: (0.7·2 + 4)/1.7
    val s2 = graft.operators.EventOps
      .ewma(df, "g", "ts", "id", "v", alpha = 0.3, span = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(math.abs(s2(3L) - 5.4 / 1.7) < 1e-6)
    assert(intercept[IllegalArgumentException] {
      graft.operators.EventOps.ewma(df, "g", "ts", "id", "v", alpha = 1.0)
    }.getMessage.contains("alpha"))
  }

  test("acf: an alternating series has acf(-1) at lag 1 and acf(+1) at " +
    "lag 2; constant series drop on the zero-variance guard") {
    import spark.implicits._
    val rows = (0 until 12).flatMap { h =>
      val ts = s"2024-01-01 ${"%02d".format(h)}:30:00"
      Seq(("alt", ts, if (h % 2 == 0) 1.0 else -1.0),
        ("flat", ts, 7.0))
    }
    val df = rows.toDF("g", "ts", "v")
      .withColumn("ts", col("ts").cast("timestamp"))
    val out = graft.operators.EventOps.acf(df, "g", "ts", "v", maxLag = 3)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(3))
      .toMap
    assert(out.keySet.forall(_._1 == "alt")) // flat: zero variance, dropped
    assert(math.abs(out(("alt", 1)) + 1.0) < 1e-6)
    assert(math.abs(out(("alt", 2)) - 1.0) < 1e-6)
    assert(math.abs(out(("alt", 3)) + 1.0) < 1e-6)
    // sparse series: buckets with no events contribute no pair — a
    // 3-point series at hours 0, 1, 5 has 2 pairs at lag 1 → below
    // the n>=3 floor, so no row survives
    val sparse = Seq(("s", "2024-01-01 00:00:00", 1.0),
      ("s", "2024-01-01 01:00:00", 2.0),
      ("s", "2024-01-01 05:00:00", 3.0)).toDF("g", "ts", "v")
      .withColumn("ts", col("ts").cast("timestamp"))
    assert(graft.operators.EventOps.acf(sparse, "g", "ts", "v", 2)
      .count() === 0L)
  }

  test("rollingMedian: hand-computed middles (odd and even frames) and " +
    "robustness — a spike moves the EWMA but not the median") {
    import spark.implicits._
    val df = Seq(
      (1L, "u", "2024-01-01 00:00:00", 1.0),
      (2L, "u", "2024-01-01 00:01:00", 100.0), // spike
      (3L, "u", "2024-01-01 00:02:00", 2.0),
      (4L, "u", "2024-01-01 00:03:00", 3.0)
    ).toDF("id", "g", "ts", "v")
      .withColumn("ts", col("ts").cast("timestamp"))
    val med = graft.operators.EventOps
      .rollingMedian(df, "g", "ts", "id", "v", span = 20)
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    // frames: [1] → 1; [1,100] → 50.5; [1,2,100] → 2; [1,2,3,100] → 2.5
    assert(med === Map(1L -> 1.0, 2L -> 50.5, 3L -> 2.0, 4L -> 2.5))
    val ew = graft.operators.EventOps
      .ewma(df, "g", "ts", "id", "v").collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    // after the spike decays two steps, EWMA still carries it far
    // above the data's 1-3 band; the median has fully rejected it
    assert(ew(4L) > 20.0 && med(4L) < 3.0)
  }

  test("trend: an exact hourly line recovers slope and intercept " +
    "exactly; constant series fit slope 0; short series drop") {
    import spark.implicits._
    val rows = (0 until 10).map { h =>
      ("line", s"2024-01-01 ${"%02d".format(h)}:15:00", 3.0 + 2.0 * h)
    } ++ (0 until 10).map { h =>
      ("flat", s"2024-01-01 ${"%02d".format(h)}:15:00", 7.0)
    } ++ Seq(("short", "2024-01-01 00:00:00", 1.0),
      ("short", "2024-01-01 01:00:00", 2.0))
    val df = rows.toDF("g", "ts", "v")
      .withColumn("ts", col("ts").cast("timestamp"))
    val out = graft.operators.EventOps.trend(df, "g", "ts", "v")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out.keySet === Set("line", "flat")) // 'short' dropped (n<3)
    assert(out("line")._1 === 10L)
    assert(math.abs(out("line")._2 - 2.0) < 1e-9)
    assert(math.abs(out("line")._3 - 3.0) < 1e-9)
    assert(math.abs(out("flat")._2) < 1e-9)
    assert(math.abs(out("flat")._3 - 7.0) < 1e-9)
  }

  // ---- q_gaps_islands ----

  test("gapsIslands: hand-built streaks split exactly at day gaps, " +
    "multiple events per day collapse, users stay isolated") {
    import spark.implicits._
    val rows = Seq(
      // user 1: a 3-day streak (with a duplicated day), a gap, a 1-day
      (1L, "2024-01-01 08:00:00"), (1L, "2024-01-01 21:00:00"),
      (1L, "2024-01-02 09:00:00"), (1L, "2024-01-03 01:00:00"),
      (1L, "2024-01-05 12:00:00"),
      // user 2: two singletons
      (2L, "2024-02-01 00:30:00"), (2L, "2024-02-03 23:59:00"))
    val df = rows.toDF("user_id", "ts")
      .withColumn("ts", col("ts").cast("timestamp"))
    val got = graft.operators.EventOps.gapsIslands(df, "user_id", "ts")
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toString,
        r.getDate(2).toString, r.getLong(3)))
    assert(got.toSeq === Seq(
      (1L, "2024-01-01", "2024-01-03", 3L),
      (1L, "2024-01-05", "2024-01-05", 1L),
      (2L, "2024-02-01", "2024-02-01", 1L),
      (2L, "2024-02-03", "2024-02-03", 1L)))
  }

  // ---- q_transitions ----

  test("transitions: counts match a brute-force per-user pairing and " +
    "each source's probabilities sum to 1") {
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"),
        col("ts").cast("long").as("tsl"), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    val brute = ev.groupBy(_._1).values.toSeq.flatMap { rows =>
      rows.toSeq.sortBy(r => (r._3, r._4)).sliding(2).collect {
        case Seq(a, b) => (a._2, b._2)
      }
    }.groupBy(p => p).map { case (k, v) => k -> v.size.toLong }
    val got = run("q_transitions").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got.view.mapValues(_._1).toMap === brute)
    got.keys.map(_._1).toSeq.distinct.foreach { src =>
      val ps = got.collect { case ((s, _), (_, p)) if s == src => p }
      assert(math.abs(ps.sum - 1.0) < 1e-4, s"src $src sums ${ps.sum}")
    }
  }

  // ---- q_attribution ----

  test("attribution: hand-built journeys credit the first and last " +
    "preceding channel; unattributable conversions drop") {
    import spark.implicits._
    val rows = Seq(
      // user 1: view → click → purchase (first=view, last=click)
      (1L, "view", 1L), (1L, "click", 2L), (1L, "purchase", 3L),
      // user 2: click → purchase → view → purchase (second purchase
      // first=click, last=view)
      (2L, "click", 1L), (2L, "purchase", 2L), (2L, "view", 3L),
      (2L, "purchase", 4L),
      // user 3: purchase with no preceding touch — dropped
      (3L, "purchase", 1L))
    val df = rows.map { case (u, t, i) =>
      (u, t, new java.sql.Timestamp(i * 1000), i)
    }.toDF("user_id", "event_type", "ts", "event_id")
    val got = graft.operators.EventOps.attribution(
        df, "user_id", "event_type", "ts", "event_id", "purchase")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // purchases attributed: u1 (first view / last click), u2#1
    // (click/click), u2#2 (click/view) → first: click 2, view 1;
    // last: click 2, view 1
    assert(got.toSeq === Seq(
      ("click", 2L, 2L), ("view", 1L, 1L)))
  }

  // ---- q_table_diff ----

  test("tableDiff: identical rows vanish; added/removed/changed tag " +
    "correctly; NULL-value flips count as changes and NULL==NULL " +
    "does not") {
    import spark.implicits._
    val prev = Seq(
      (1L, Some("a"), Some(1.0)), // unchanged
      (2L, Some("b"), Some(2.0)), // value change
      (3L, None, Some(3.0)),      // NULL → value change
      (4L, Some("d"), None),      // NULL == NULL on the double col
      (5L, Some("e"), Some(5.0))  // removed
    ).toDF("k", "s", "v")
    val next = Seq(
      (1L, Some("a"), Some(1.0)),
      (2L, Some("B"), Some(2.0)),
      (3L, Some("c"), Some(3.0)),
      (4L, Some("d"), None),
      (6L, Some("f"), Some(6.0))  // added
    ).toDF("k", "s", "v")
    val got = graft.operators.RelationalOps.tableDiff(prev, next, "k")
      .orderBy("k")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2))))
    assert(got.toSeq === Seq(
      (2L, "changed", Some("s")),
      (3L, "changed", Some("s")),
      (5L, "removed", None),
      (6L, "added", None)))
  }

  test("tableDiff is symmetric-consistent: swapping snapshots swaps " +
    "added and removed and keeps the changed set") {
    import spark.implicits._
    val a = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("k", "s")
    val b = Seq((2L, "y"), (3L, "w"), (4L, "u")).toDF("k", "s")
    def statuses(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val fwd = statuses(graft.operators.RelationalOps.tableDiff(a, b, "k"))
    val bwd = statuses(graft.operators.RelationalOps.tableDiff(b, a, "k"))
    assert(fwd === Map(1L -> "removed", 3L -> "changed", 4L -> "added"))
    assert(bwd === Map(1L -> "added", 3L -> "changed", 4L -> "removed"))
  }

  // ---- q_benford ----

  test("benford: digit shares sum to 1, expected shares follow " +
    "log10(1+1/d), and a perfect Benford sample scores chi2 ~ 0") {
    import spark.implicits._
    val out = run("q_benford").collect()
    assert(out.map(_.getInt(0)).toSeq === (1 to 9))
    assert(math.abs(out.map(_.getDouble(2)).sum - 1.0) < 1e-4)
    out.foreach { r =>
      val d = r.getInt(0)
      assert(math.abs(r.getDouble(3) - math.log10(1.0 + 1.0 / d)) < 1e-6)
      assert(r.getDouble(4) >= 0.0)
    }
    // a synthetic exactly-Benford distribution: counts proportional to
    // the law → every chi2 term collapses toward 0
    val n = 100000
    val rows = (1 to 9).flatMap { d =>
      val c = math.round(n * math.log10(1.0 + 1.0 / d)).toInt
      Seq.fill(c)(d * 10.0 + 1.0)
    }
    val chi = graft.operators.StatsOps.benford(rows.toDF("v"), "v")
      .agg(sum("chi2")).head().getDouble(0)
    assert(chi < 1.0, s"chi2 on an exact Benford sample was $chi")
  }

  // ---- q_changepoint ----

  test("changepoint finds a constructed level shift at the exact " +
    "boundary hour with the two segment means") {
    import spark.implicits._
    // hours 0-4 at 5 events/hour, hours 5-9 at 50: the CUSUM argmax
    // lands on the last pre-shift hour (prefix t=5)
    val rows = (0 until 10).flatMap { h =>
      val c = if (h < 5) 5 else 50
      Seq.fill(c)(("a", h * 3600L))
    } ++ (0 until 8).flatMap(h => Seq.fill(3)(("flat", h * 3600L)))
    val df = rows.toDF("g", "sec")
      .select(col("g"), timestamp_seconds(col("sec")).as("ts"))
    val out = graft.operators.EventOps.changepoint(df, "g", "ts")
      .collect()
    assert(out.length === 2)
    val a = out.find(_.getString(0) == "a").get
    assert(a.getAs[java.sql.Timestamp]("cp_hour").getTime === 4 * 3600000L)
    assert(a.getAs[Double]("mean_before") === 5.0)
    assert(a.getAs[Double]("mean_after") === 50.0)
    // the flat series' best split still reports, with equal means
    val f = out.find(_.getString(0) == "flat").get
    assert(f.getAs[Double]("mean_before") === f.getAs[Double]("mean_after"))
    assert(f.getAs[Double]("stat") === 0.0)
    // deterministic under repartitioning
    val again = graft.operators.EventOps
      .changepoint(df.repartition(7), "g", "ts").collect()
    assert(again.toSeq === out.toSeq)
  }

  test("changepoint statistic matches the brute-force CUSUM max on " +
    "a random series and breaks ties on the earliest hour") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val counts = Seq.fill(24)(1 + rnd.nextInt(6))
    val df = counts.zipWithIndex
      .flatMap { case (c, h) => Seq.fill(c)(("g", h * 3600L)) }
      .toDF("g", "sec")
      .select(col("g"), timestamp_seconds(col("sec")).as("ts"))
    val out = graft.operators.EventOps.changepoint(df, "g", "ts")
      .collect().head
    val n = counts.length.toLong
    val s = counts.map(_.toLong).sum
    val dd = counts.scanLeft(0L)(_ + _).tail.zipWithIndex.init
      .map { case (st, i0) => (math.abs(n * st - (i0 + 1) * s), i0 + 1) }
    val best = dd.maxBy { case (d, t) => (d, -t) }
    assert(out.getAs[java.sql.Timestamp]("cp_hour").getTime ===
      (best._2 - 1) * 3600000L)
    assert(out.getAs[Double]("stat") ===
      math.round(best._1.toDouble / n * 1e6) / 1e6)
  }

  // ---- q_trailing_features ----

  test("trailingFeatures matches brute force and excludes the label " +
    "instant (no leakage, same-microsecond peers excluded)") {
    import spark.implicits._
    val day = 86400L
    // (id, user, sec, type, value)
    val ev = Seq(
      (1L, 1L, 0L, "view", 1.0),
      (2L, 1L, day / 2, "view", 2.0),            // 12h before label
      (3L, 1L, day, "purchase", 10.0),           // label: sees 1,2
      (4L, 1L, day, "view", 4.0),                // same-instant peer
      (5L, 1L, 8 * day, "purchase", 5.0),        // 7d window: 3,4 (ts=day
                                                 // is exactly 7d before —
                                                 // in range), not 1,2
      (6L, 2L, day, "purchase", 9.0))            // other user: empty
    val df = ev.toDF("event_id", "user_id", "sec", "event_type", "value")
      .select(col("event_id"), col("user_id"),
        timestamp_seconds(col("sec")).as("ts"),
        col("event_type"), col("value"))
    val out = graft.operators.EventOps.trailingFeatures(df, "user_id",
        "ts", "event_id", "event_type", "value", "purchase")
      .collect().map(r => (r.getLong(0),
        r.getAs[Long]("n_1d"), r.getAs[Long]("n_7d"),
        r.getAs[Double]("v_7d")))
    assert(out.toSeq === Seq(
      (3L, 2L, 2L, 3.0),   // events 1,2 in both windows; 4 excluded
      (5L, 0L, 2L, 14.0),  // events 3,4 at exactly -7d; nothing in 1d
      (6L, 0L, 0L, 0.0)))  // other user isolated
  }

  // ---- q_seasonality ----

  test("seasonality: a single-hour group indexes at 24, a flat group " +
    "at 1, and shares sum to 1 per group") {
    import spark.implicits._
    val rows =
      Seq.fill(50)(("spike", 3L * 3600)) ++
        (0 until 24).flatMap(h => Seq.fill(2)(("flat", h * 3600L)))
    val df = rows.toDF("g", "sec")
      .select(col("g"), timestamp_seconds(col("sec")).as("ts"))
    val out = graft.operators.EventOps.seasonality(df, "g", "ts")
      .collect()
    val spike = out.filter(_.getString(0) == "spike")
    assert(spike.length === 1)
    assert(spike.head.getAs[Int]("hod") === 3)
    assert(spike.head.getAs[Double]("idx") === 24.0)
    assert(spike.head.getAs[Double]("share") === 1.0)
    val flat = out.filter(_.getString(0) == "flat")
    assert(flat.length === 24)
    flat.foreach(r => assert(r.getAs[Double]("idx") === 1.0))
    // shares are 6-dp rounded (2/48 → 0.041667), so the sum carries
    // up to 24 half-ulp rounding residues
    assert(math.abs(flat.map(_.getAs[Double]("share")).sum - 1.0) < 2e-5)
  }

  test("hampel flags a planted spike, repairs it to the window " +
    "median, and leaves a constant series untouched (sigma 0)") {
    import spark.implicits._
    import java.sql.Timestamp
    // steady 10.0 stream with one spike at t=25
    val rows = (1 to 50).map { i =>
      val v = if (i == 25) 500.0 else 10.0 + (i % 3) * 0.1
      ("u1", new Timestamp(1700000000000L + i * 60000L), i.toLong, v)
    }
    val df = rows.toDF("user_id", "ts", "event_id", "value")
    val out = graft.operators.EventOps.hampel(df, "user_id", "ts",
      "event_id", "value").collect()
    val spike = out.find(_.getAs[Long]("event_id") == 25L).get
    assert(spike.getAs[Boolean]("is_outlier"))
    assert(spike.getAs[Double]("cleaned") ===
      spike.getAs[Double]("rmed"))
    assert(spike.getAs[Double]("cleaned") < 11.0)
    // only the spike row is flagged: later windows containing the
    // spike still median ~10, and 500 inflates their MAD, while each
    // in-window value stays near the median
    assert(out.count(_.getAs[Boolean]("is_outlier")) === 1)
    // constant series: sigma = 0 everywhere, nothing flagged
    val const = (1 to 30).map(i => ("u2",
      new Timestamp(1700000000000L + i * 60000L), i.toLong, 7.0))
      .toDF("user_id", "ts", "event_id", "value")
    val oc = graft.operators.EventOps.hampel(const, "user_id", "ts",
      "event_id", "value").collect()
    assert(oc.forall(!_.getAs[Boolean]("is_outlier")))
    assert(oc.forall(_.getAs[Double]("sigma") == 0.0))
    assert(oc.forall(_.getAs[Double]("cleaned") == 7.0))
  }

  test("rollingCorr: +1 on perfectly coupled series, -1 on inverted, " +
    "decays when the coupling breaks mid-stream; NULL until the " +
    "frame fills") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(day: Int) = new Timestamp(1700000000000L + day * 86400000L)
    val rnd = new scala.util.Random(89)
    // x random walk; y = 2x + 1 for 30 days, then y decouples
    val xs = Seq.iterate(10.0, 60)(v => v + rnd.nextGaussian())
    val rows = xs.zipWithIndex.map { case (x, d) =>
      val y = if (d < 30) 2 * x + 1 else rnd.nextGaussian() * 5
      (ts(d), x, y)
    }
    val out = graft.operators.EventOps.rollingCorr(
      rows.toDF("ts", "xv", "yv"), "ts", "xv", "yv", span = 10)
      .collect().sortBy(_.getDate(0).getTime)
    (0 until 9).foreach(i => assert(out(i).isNullAt(
      out(i).fieldIndex("rcorr")), s"day $i should be NULL"))
    (9 until 30).foreach(i =>
      assert(math.abs(out(i).getAs[Double]("rcorr") - 1.0) < 1e-6,
        s"coupled day $i"))
    // once the frame is fully post-break, correlation is near 0
    val tail = out.drop(45).map(_.getAs[Double]("rcorr"))
    assert(tail.forall(c => math.abs(c) < 0.75), tail.mkString(","))
    // inverted coupling
    val inv = xs.zipWithIndex.map { case (x, d) =>
      (ts(d), x, -3 * x + 7) }
    val oi = graft.operators.EventOps.rollingCorr(
      inv.toDF("ts", "xv", "yv"), "ts", "xv", "yv", span = 10)
      .collect().sortBy(_.getDate(0).getTime)
    oi.drop(9).foreach(r =>
      assert(math.abs(r.getAs[Double]("rcorr") + 1.0) < 1e-6))
  }

  test("forecastBaseline: naive is exact on a constant series, " +
    "seasonal-naive wins on a pure weekly pattern, drift wins on a " +
    "pure trend") {
    import spark.implicits._
    import java.sql.Timestamp
    def mk(f: Int => Double) = (0 until 42).map(day =>
      (new Timestamp(1700000000000L + day * 86400000L), f(day)))
      .toDF("ts", "v")
    def res(df: org.apache.spark.sql.DataFrame) =
      graft.operators.EventOps.forecastBaseline(df, "ts", "v")
        .collect().map(r => r.getString(0) ->
          r.getAs[Double]("mae")).toMap
    val const = res(mk(_ => 5.0))
    assert(const("naive") === 0.0)
    assert(const("seasonal_naive") === 0.0)
    val weekly = res(mk(d => Array(1.0, 9, 2, 8, 3, 7, 4)(d % 7)))
    assert(weekly("seasonal_naive") === 0.0)
    assert(weekly("naive") > 1.0)
    val trend = res(mk(d => 10.0 + 2.0 * d))
    assert(trend("drift") === 0.0) // the drift line IS the series
    assert(trend("naive") === 2.0) // persistent one-step error
    assert(trend("seasonal_naive") === 14.0) // 7-day-old value
  }

  test("seqEntropy: deterministic cycle has zero conditional " +
    "entropy with positive marginal; iid uniform transitions have " +
    "info_gain near 0; identities hold") {
    import spark.implicits._
    import java.sql.Timestamp
    // one user cycling a->b->c->a... : next is fully determined
    val cyc = (0 until 300).map(i => (1L, i.toLong,
      new Timestamp(1700000000000L + i * 1000L),
      Seq("a", "b", "c")(i % 3))).toDF("user_id", "event_id", "ts",
      "event_type")
    val rc = graft.operators.EventOps.seqEntropy(cyc, "user_id",
      "ts", "event_id", "event_type").collect()(0)
    assert(rc.getAs[Double]("h_cond") === 0.0)
    assert(math.abs(rc.getAs[Double]("h_next") - math.log(3.0) /
      math.log(2.0)) < 0.01)
    assert(rc.getAs[Double]("info_gain") ===
      rc.getAs[Double]("h_next") - rc.getAs[Double]("h_cond"))
    // iid: knowing prev tells nothing
    val rnd = new scala.util.Random(83)
    val iid = (0 until 6000).map(i => (1L + i % 4, i.toLong,
      new Timestamp(1700000000000L + i * 1000L),
      Seq("a", "b", "c", "d")(rnd.nextInt(4))))
      .toDF("user_id", "event_id", "ts", "event_type")
    val ri = graft.operators.EventOps.seqEntropy(iid, "user_id",
      "ts", "event_id", "event_type").collect()(0)
    assert(math.abs(ri.getAs[Double]("info_gain")) < 0.01,
      ri.toString)
    assert(ri.getAs[Long]("n_states") === 4L)
  }

  test("rollingQuantile equals the brute-force lower order statistic " +
    "of each trailing window; p=1.0 is the rolling max") {
    import spark.implicits._
    import java.sql.Timestamp
    val rnd = new scala.util.Random(3)
    val rows = (1 to 80).map(i => ("u",
      new Timestamp(1700000000000L + i * 1000L), i.toLong,
      math.round(rnd.nextDouble() * 1e3) / 1e3))
    val df = rows.toDF("user_id", "ts", "event_id", "value")
    val span = 10; val p = 0.9
    val got = graft.operators.EventOps.rollingQuantile(df, "user_id",
      "ts", "event_id", "value", p, span).collect()
    rows.zipWithIndex.foreach { case ((_, _, id, _), i) =>
      val win = rows.slice(math.max(0, i - span + 1), i + 1)
        .map(_._4).sorted
      val exp = win(math.max(1,
        math.min(win.size, math.ceil(p * win.size).toInt)) - 1)
      val g = got.find(_.getAs[Long]("event_id") == id).get
        .getAs[Double]("rq")
      assert(g === exp, s"row $id")
    }
    val mx = graft.operators.EventOps.rollingQuantile(df, "user_id",
      "ts", "event_id", "value", 1.0, span).collect()
    rows.zipWithIndex.foreach { case ((_, _, id, _), i) =>
      val exp = rows.slice(math.max(0, i - span + 1), i + 1)
        .map(_._4).max
      assert(mx.find(_.getAs[Long]("event_id") == id).get
        .getAs[Double]("rq") === exp)
    }
  }

  test("seasonalDecompose recovers a planted weekly pattern on a " +
    "linear-trend series: seasonal matches the plant, remainder ~0, " +
    "edges have NULL trend") {
    import spark.implicits._
    import java.sql.Timestamp
    // daily value = 100 + 2*t + plant(dow), 35 days, several events
    // per day so the daily mean is exercised too
    val plant = Array(5.0, -3.0, 0.0, 2.0, -1.0, 4.0, -7.0)
    val base = 1704067200000L // 2024-01-01 UTC (a Monday)
    val rows = (0 until 35).flatMap { t =>
      val v = 100.0 + 2.0 * t + plant(t % 7)
      (1 to 3).map(j => (new Timestamp(base + t * 86400000L +
        j * 3600000L), v))
    }
    val df = rows.toDF("ts", "value")
    val out = graft.operators.EventOps.seasonalDecompose(df, "ts",
      "value", 7).collect().sortBy(_.getDate(0).getTime)
    assert(out.length === 35)
    // first and last 3 days: partial MA window → NULL trend
    (0 to 2).foreach(i => assert(out(i).isNullAt(
      out(i).fieldIndex("trend"))))
    (32 to 34).foreach(i => assert(out(i).isNullAt(
      out(i).fieldIndex("trend"))))
    // interior: centered MA of a linear+balanced-seasonal series is
    // the linear part exactly; remainder 0; seasonal = centered plant
    val plantMean = plant.sum / 7
    (3 to 31).foreach { i =>
      assert(math.abs(out(i).getAs[Double]("trend") -
        (100.0 + 2.0 * i)) < 1e-6, s"day $i")
      assert(math.abs(out(i).getAs[Double]("remainder")) < 1e-6)
      assert(math.abs(out(i).getAs[Double]("seasonal") -
        (plant(i % 7) - plantMean)) < 1e-6)
    }
  }
}
