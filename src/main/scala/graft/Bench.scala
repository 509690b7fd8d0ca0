package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, one JSON line on stdout.
  *
  * Methodology (r01 verdict items 2 & 8): the r01 driver run landed 2.5×
  * over the recorded baseline with two 35 s outliers on a 0.6 MB table —
  * per-query cold-plan/codegen and co-tenant bursts dominated sf0.1 wall
  * time. So: (a) the untimed warmup touches EVERY table and caches it
  * through the session cache manager (later logically-identical scans
  * serve from the InMemoryRelation — sameResult matching — so timed runs
  * measure operator cost, not repeated single-file parquet I/O); (b) each
  * query runs five times in interleaved whole-set rounds and the
  * reported number is the per-query MEDIAN-OF-5 (r11 verdict item 7:
  * several r11 medians sat next to one burst sample — with five rounds
  * minutes apart, at least three must be bursts before a burst can be
  * the median); (c) first-run times and per-query errors are
  * reported alongside (`cold`, `errors`) — a failed query shows up as
  * value -1 plus an error entry, never as a silently fast pass.
  *
  * Self-preservation (r02 verdict item 4): the JSON line is ALSO written
  * to BENCH_local.json (override with SPARK_GRAFT_BENCH_OUT), so a
  * truncated stdout capture can never lose the headline number.
  * Accounting (r02 advice): rounds are recorded per-round as
  * success-or-error, so `cold` is genuinely round 1 (-1 when round 1
  * errored), `samples` holds null in an errored round's slot, and
  * `included` counts the queries whose medians the total sums — two
  * rounds with different error sets can no longer produce silently
  * incomparable totals.
  */
object Bench {
  /** Requested rounds (median-of-RUNS when all complete). Overridable
    * for local iteration; the effective count can be LOWER under the
    * wall budget below. */
  private val RUNS =
    sys.env.get("SPARK_GRAFT_BENCH_RUNS").map(_.toInt).getOrElse(5)
  /** Wall budget in seconds (r15 verdict item 7/1): the r15 driver run
    * hit its harness timeout (rc 124) under 2.6x co-tenant load and the
    * round shipped NO bench artifact. Two defenses: (a) a partial
    * artifact (file + compact stdout line) is emitted after EVERY
    * completed round, so even a SIGKILL leaves the last completed
    * round's medians parseable in the stdout tail; (b) once elapsed
    * wall exceeds this budget, no further queries start (round 1 is
    * never cut — every query keeps >=1 sample) and the run exits rc 0
    * with runs_done < RUNS recorded. 1800 s holds 5 quiet rounds
    * (~264 s each at sf0.1) and degrades to median-of-2 at the
    * measured 2.6x load instead of timing out with nothing. */
  private val BudgetSec = sys.env.get("SPARK_GRAFT_BENCH_BUDGET_SEC")
    .map(_.toDouble).getOrElse(1800.0)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // typed top-k aggregation (knnJoin) must stay hash-based: the
      // default 128-key fallback degrades the partial trim to a full
      // in-partition sort of the O(n^2) edge stream (measured 5x wall)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "65536")
      // Whole-stage-codegen class cache (static conf, default 100
      // entries): a 262-query round generates far more codegen units
      // than 100, so every interleaved round evicted everything and
      // re-ran janino on the full board — pure fixed overhead per
      // round at ANY scale factor, and the long-suspected "codegen
      // cache churn across 262 plans" board-regime cost. Sized to
      // hold the whole library (units are small generated classes;
      // metaspace, not heap). A production session running a query
      // library this size wants the same setting — not a local-mode
      // trick.
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "8192"))
      // AQE coalescing keeps its parallelism-first default. Bytes-first
      // coalescing (parallelismFirst=false, the Spark docs' general
      // recommendation) was MEASURED and REJECTED here
      // (bench/BENCH_local_r18_aqe32.json): this library's reduce
      // stages are CPU-dense per byte (rank spines, quantile
      // refinement, index builds), so sizing them by bytes collapses
      // them to 1 task — cold 215→385 s (+79%), warm 109.5→122 s.
      // Same lesson as the loader's two-regime split (change 1,
      // OPTIMIZATION_r18.md).
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.tools.Diagnostics.startupBanner(spark)

    // Untimed warmup: session/codegen infra, then every table cached
    // (documents/embeddings arrive post-repartition from Tables, so the
    // cached relation is the distributed form), then one vec_dot pass so
    // the native expression's codegen is warm.
    try {
      spark.range(1000).selectExpr("sum(id) s").count()
      graft.sources.Tables.names.foreach { n =>
        try graft.sources.Tables(spark, sfDir, n).persist().count()
        catch { case _: Throwable => () }
      }
      graft.sources.Tables.embeddings(spark, sfDir)
        .selectExpr(
          "sum(vec_dot(CAST(embedding AS ARRAY<DOUBLE>), CAST(embedding AS ARRAY<DOUBLE>))) s")
        .count()
    } catch { case _: Throwable => () }

    // Rounds are INTERLEAVED (full pass over all queries per round, not
    // three back-to-back runs per query): the co-tenant bursts observed
    // on this machine last tens of seconds, so consecutive repeats of
    // one query all land inside the same burst and a per-query median
    // filters nothing. With whole-set rounds, a query's five samples
    // are minutes apart and the median drops up to two bursts.
    final case class R(cold: Double, median: Double, err: Option[String])
    val names = SparkEntry.queries.keys.toSeq
    // Per-round outcome per query, in round order: Some(seconds) on
    // success, None on error — never collapsed, so round-1 identity and
    // error placement survive into the report.
    val rounds = collection.mutable.Map.empty[String, List[Option[Double]]]
    val errors = collection.mutable.Map.empty[String, String]
    val wall0 = System.nanoTime()
    def elapsedSec = (System.nanoTime() - wall0) / 1e9

    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    def jmap(m: Iterable[(String, String)]): String =
      m.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")

    // Medians over however many samples exist SO FAR — called after
    // every completed round so a killed run still has the previous
    // round's full artifact on disk and a compact line in the stdout
    // tail (the r15 failure mode left neither).
    def emit(runsDone: Int, finished: Boolean,
        partialRound: Option[Int] = None): (String, Int) = {
      val results = names.map { name =>
        val times = rounds.getOrElse(name, Nil).flatten
        val median =
          if (times.isEmpty) -1.0 else times.sorted.apply(times.length / 2)
        val cold = rounds.getOrElse(name, Nil).headOption.flatten.getOrElse(-1.0)
        name -> R(cold, median, errors.get(name))
      }.toMap
      val included = results.values.count(_.median >= 0)
      val total =
        results.values.collect { case r if r.median >= 0 => r.median }.sum
      // Cold board = sum of round-1 samples. The session caches
      // legitimately move cost into round 1 (r16 verdict item 4), so
      // the median alone can no longer catch a cold-path regression —
      // the cold total is a first-class second baseline.
      val coldTotal =
        results.values.collect { case r if r.cold >= 0 => r.cold }.sum
      val qs = jmap(results.map { case (k, r) => k -> r.median.toString })
      val cold = jmap(results.map { case (k, r) => k -> r.cold.toString })
      val errs = jmap(results.collect { case (k, r) if r.err.isDefined =>
        k -> jstr(r.err.get) })
      val samp = jmap(names.map { n =>
        n -> rounds.getOrElse(n, Nil)
          .map(_.map(_.toString).getOrElse("null")).mkString("[", ",", "]") })
      // partial_round: the round whose samples are incomplete when the
      // budget cut mid-round (r16 advice: runs_done alone no longer
      // described ragged sample lists) — null for clean boundaries.
      val partial = partialRound.map(_.toString).getOrElse("null")
      val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","runs":$RUNS,"runs_done":$runsDone,"included":$included,"cold_total":$coldTotal,"partial_round":$partial,"cold":$cold,"samples":$samp,"errors":$errs}"""
      // Full record (per-query medians, cold, samples, errors) goes to a
      // file only: at 262 queries x 5 samples it is ~20 KB, and the
      // driver keeps just a ~2 KB stdout tail — printing it cost rounds
      // 6-8 their headline metric ("parsed": null). Override path with
      // SPARK_GRAFT_BENCH_OUT.
      val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_local.json")
      try java.nio.file.Files.write(java.nio.file.Paths.get(out),
        (line + "\n").getBytes("UTF-8"))
      catch { case e: Throwable =>
        // the file was the only copy of the full record — preserve it on
        // stderr rather than lose a full run's per-query data
        System.err.println(s"[bench] could not write $out: $e")
        System.err.println(line) }
      // top-25 medians ride the compact line (r17 verdict item 3: the
      // driver keeps only the stdout tail, so PERF's per-query and
      // scaling tables were empty every round — 25 entries ≈ 0.8 KB
      // fits the tail and names the heavy lines for round-over-round
      // and c8/c32 comparisons; the full 262-query map stays in the
      // detail file)
      val top25 = jmap(results.toSeq.filter(_._2.median >= 0)
        .sortBy(-_._2.median).take(25)
        .map { case (k, r) => k -> f"${r.median}%.3f" })
      // Stdout gets ONE compact (~200 byte) JSON line after EVERY
      // completed round, INCLUDING round 1 (r16: the driver's loaded
      // machine spent its whole budget on round 1, and the old
      // round-2+ policy printed nothing — rc 0, parsed: null, second
      // consecutive round with no driver bench number). Round 1's line
      // carries "cold":true so consumers know its value is a cold
      // board, not a median; tail parsers take the LAST line, so a
      // cold first line can never shadow later medians. A kill
      // mid-round N still leaves round N-1's totals in the tail.
      val compact = s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","runs":$RUNS,"runs_done":$runsDone,"finished":$finished,"cold":${runsDone <= 1},"cold_total":$coldTotal,"partial_round":$partial,"included":$included,"errors_count":${errors.size},"wall_sec":${math.round(elapsedSec)},"top25":$top25,"detail":"$out"}"""
      println(compact)
      (compact, included)
    }

    var round = 1
    var cut = false
    var sinceEmit = 0
    while (round <= RUNS && !cut) {
      val roundStart = elapsedSec
      val it = names.iterator
      while (it.hasNext && !cut) {
        val name = it.next()
        // Budget check BEFORE each query, never inside round 1: every
        // query keeps at least one sample; rounds 2+ may be cut
        // mid-round (per-query sample counts then differ by one — the
        // median handles ragged lists).
        if (round > 1 && elapsedSec > BudgetSec) {
          System.err.println(f"[bench] wall budget $BudgetSec%.0f s " +
            f"exceeded at $elapsedSec%.0f s — stopping after " +
            s"${round - 1} full rounds")
          cut = true
        } else {
          val fn = SparkEntry.queries(name)
          val t0 = System.nanoTime()
          val outcome =
            try {
              fn(spark, sfDir).count()
              Some((System.nanoTime() - t0) / 1e9)
            } catch { case e: Throwable =>
              errors(name) = s"${e.getClass.getSimpleName}: " +
                Option(e.getMessage).getOrElse("")
                  .replaceAll("\\s+", " ").take(160)
              None
            }
          rounds(name) = rounds.getOrElse(name, Nil) :+ outcome
          sinceEmit += 1
        }
      }
      if (!cut) {
        emit(round, finished = round == RUNS)
        sinceEmit = 0
        // Predictive boundary stop: if another round of the size just
        // measured cannot fit in the remaining budget, stop NOW with a
        // clean full-round artifact instead of getting cut mid-round —
        // full-round medians beat ragged ones, and on the r16 driver's
        // 9.6x-loaded machine this turns "budget-cut mid-round 2" into
        // "clean stop after round 1 with a cold-flagged parsed line".
        val lastRoundSec = elapsedSec - roundStart
        if (round < RUNS && elapsedSec + lastRoundSec > BudgetSec) {
          System.err.println(f"[bench] predictive stop after round " +
            f"$round: $elapsedSec%.0f s elapsed + ~$lastRoundSec%.0f s " +
            f"per round exceeds the $BudgetSec%.0f s budget")
          cut = true; sinceEmit = -1 // round-boundary cut: emit done
        }
        round += 1
        // Post-round storage hygiene: pinned intermediates
        // (Checkpoints.pin -> localCheckpoint) are freed by the
        // ContextCleaner only after the driver GCs the RDD handle, so
        // a 262-query round strands hundreds of MB of orphaned blocks
        // until an incidental full GC. Accumulated block pressure is
        // the prime suspect for the r15 late-round slow samples
        // (q_setsim_join 4.5 <-> 21 s flips in rounds 4-5 while the
        // same query is flat in an isolated session — PlanDump
        // --repeat/--warmcache, r16). One explicit GC per round keeps
        // rounds storage-comparable.
        System.gc()
      }
    }
    // A mid-round cut leaves samples the last emitted line doesn't
    // describe — emit unconditionally (r16 advice: the old sinceEmit>0
    // guard could skip the only line of a boundary-cut run) with
    // partial_round naming the ragged round. A predictive boundary
    // stop (sinceEmit == -1) already emitted its identical line.
    if (cut && sinceEmit >= 0)
      emit(round - 1, finished = false,
        partialRound = if (sinceEmit > 0) Some(round) else None)
    spark.stop()
    // A run with analysis failures must not read as healthy: the r9 driver
    // artifact carried rc=0 with 18 queries errored (-1.0, excluded from the
    // total) and the regression slipped past. Any per-query error is a
    // nonzero exit so the round gates on it.
    if (errors.nonEmpty) sys.exit(2)
  }
}
