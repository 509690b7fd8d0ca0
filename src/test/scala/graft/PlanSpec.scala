package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-plan assertions — the properties that decide whether a plan
  * survives a 100×–1000× scale-up: filters reaching the parquet scan,
  * column pruning, broadcast joins for small dims, top-k without a total
  * sort, and map-side partial aggregation. Guarded here so a refactor
  * that silently de-optimizes a plan fails CI, not a cluster run. */
class PlanSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def q(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sfDir)

  test("q_filter_project pushes the date-range filter into the parquet scan") {
    val p = plan(q("q_filter_project"))
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("GreaterThanOrEqual(l_shipdate") ||
      p.contains("GreaterThan(l_shipdate"), p)
  }

  test("q_filter_project prunes the lineitem scan to referenced columns") {
    val scanSchema = q("q_filter_project").queryExecution.executedPlan
      .collectLeaves().map(_.toString).mkString("\n")
    // lineitem has 16 columns; the query needs only a handful
    assert(!scanSchema.contains("l_comment"),
      "unreferenced wide column must not be read:\n" + scanSchema)
  }

  test("q_join_broadcast broadcasts the small dimension side") {
    assert(plan(q("q_join_broadcast")).contains("BroadcastHashJoin"))
  }

  test("q_simhash is join-free: one aggregation, no 64-way bit expansion") {
    // regression pin for the r01 defect: bit sums must come from a
    // single aggregate over the token stream, not a join against a
    // 64-row bit table (64× row inflation)
    val p = plan(q("q_simhash"))
    assert(!p.contains("Join"), p.take(2000))
  }

  test("corpus tables arrive data-sized from the loader") {
    // r01 pinned the loader rebalance (single-file scans must not run
    // the whole pipeline one-task at corpus scale); r18 made the count
    // DATA-SIZED — ceil(bytes / 4 MiB) clamped to [1,
    // defaultParallelism] — after the c8-beats-c32 inversion traced to
    // core-count-sized partitions of tiny tables (one fixed per-task
    // overhead × cores per stage). Pin the rule, not a constant.
    def expected(path: String): Int = {
      val bytes = new java.io.File(path).length()
      math.max(1L, math.min(
        spark.sparkContext.defaultParallelism.toLong,
        (bytes + (4L << 20) - 1) / (4L << 20))).toInt
    }
    // documents are CPU-dense: parallelism-first (the r01 rule)
    val docs = graft.sources.Tables.documents(spark, sfDir)
    assert(docs.rdd.getNumPartitions ===
      spark.sparkContext.defaultParallelism)
    // lineitem is bandwidth-dense: data-sized (the r18 rule)
    val li = graft.sources.Tables.lineitem(spark, sfDir)
    assert(li.rdd.getNumPartitions ===
      expected(s"$sfDir/lineitem.parquet"))
  }

  test("q_stream_join is an equi hash join with residual time bound") {
    // the interval condition must ride as a residual on the user_id
    // equi key — a nested-loop over events would be a 100 TB killer
    val p = plan(q("q_stream_join"))
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("q_join_multi keeps small dims (nation, region) broadcast") {
    val p = plan(q("q_join_multi"))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("q_topk uses TakeOrderedAndProject, not a total sort") {
    val p = plan(q("q_topk"))
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("q_pricing_summary aggregates map-side (partial + final)") {
    val p = plan(q("q_pricing_summary"))
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(2000))
  }

  test("flagship alert pipeline is narrow — no shuffle before the sort") {
    val p = plan(SparkEntry.entry(spark))
    val exchanges = "Exchange".r.findAllIn(p).size
    // allowed: the final presentation sort's range partitioning (plus
    // its AQE wrapper) and the events loader's one-time rebalance
    // (r18 — single-file fixtures distribute at the loader, the
    // documents/embeddings stance); joins/aggs would add more
    assert(exchanges <= 3, s"unexpected shuffles ($exchanges):\n" + p.take(2000))
  }

  test("q_sim_topk scans embeddings once with a broadcast probe") {
    val p = plan(q("q_sim_topk"))
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    assert(p.contains("Broadcast"), p.take(2000))
  }

  test("as-of join window dedup reuses the join shuffle — no 2nd exchange") {
    // the window partitions by (leftKey, leftId); the join output is
    // hash-partitioned on leftKey, which satisfies that clustering — an
    // exchange keyed (user_id, purchase_id) in the plan would mean the
    // window re-shuffled the join output
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = plan(q("q_join_asof"))
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        p.take(2000))
      assert(!"hashpartitioning\\(user_id[^)]*purchase_id".r
          .findFirstIn(p).isDefined,
        "window added its own exchange on (user_id, purchase_id):\n" +
          p.take(3000))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
  }

  test("minhash signature stage is one narrow codegen'd projection") {
    import graft.functions.TextHashOps
    import graft.sources.Tables
    // the whole 32-permutation signature must be a map over the corpus:
    // no Generate (explode), no Aggregate, no Exchange beyond the
    // loader's repartition — the shape that is embarrassingly parallel
    // at any corpus size
    val sig = Tables.documents(spark, sfDir)
      .select(col("doc_id"), TextHashOps.minhashSig(col("text")).as("sig"))
    sig.collect() // finalize THIS plan (AQE) so codegen spans are visible
    // final-plan section only (the adaptive dump repeats the initial plan)
    val p = plan(sig).split("== Initial Plan ==").head
    assert(!p.contains("Generate"), p.take(2000))
    assert(!p.contains("Aggregate"), p.take(2000))
    // `*(n)` prefixes mark whole-stage-codegen'd operators
    assert("\\*\\(\\d+\\) Project".r.findFirstIn(p).isDefined, p.take(2000))
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 1, s"loader repartition only, got $exchanges:\n$p")
  }

  test("pairwise Jaccard verify is codegen'd — no HOF barrier") {
    import graft.functions.TextHashOps
    import graft.sources.Tables
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), TextHashOps.shingleHashes(col("text")).as("sh"))
    val pairs = docs.select(col("doc_id").as("a"), col("sh").as("sha"))
      .crossJoin(docs.select(col("doc_id").as("b"), col("sh").as("shb")))
      .select(TextHashOps.jaccardSorted(col("sha"), col("shb")).as("j"))
    pairs.collect() // finalize THIS plan (AQE)
    val p = plan(pairs).split("== Initial Plan ==").head
    // jaccard_sorted must sit inside a codegen stage (`*(n)` prefix),
    // not fall back to an interpreted higher-order-function projection
    assert("\\*\\(\\d+\\) Project \\[jaccard_sorted".r.findFirstIn(p).isDefined,
      p.take(2000))
    assert(!p.contains("ArrayIntersect"), p.take(2000))
  }

  test("q_source_scan reads all columns (full-scan contract)") {
    val df = q("q_source_scan")
    assert(df.columns.length >=
      graft.sources.Tables.events(spark, sfDir).columns.length)
  }

  test("q_knn_join trims to k per source BEFORE the shuffle — no n² " +
      "exchange, no checkpoint scan") {
    val df = q("q_knn_join")
    df.collect() // finalize THIS plan (AQE)
    val p = plan(df).split("== Initial Plan ==").head
    // the r03 shape localCheckpointed the n² pair set (an ExistingRDD
    // scan) and ranked it through one window — both must stay gone
    assert(!p.contains("ExistingRDD"), p.take(2000))
    assert(!p.contains("Window"), p.take(2000))
    // TopKAggregator runs as a typed imperative aggregate in partial
    // then final mode: the partial pass is the pre-shuffle k-trim
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2 ||
      "SortAggregate".r.findAllIn(p).size >= 2, p.take(3000))
  }

  test("substring family: no cartesian pair space, gram count is " +
      "map-side combined (partial + final)") {
    // the ExactSubstr translation must stay linear: a cartesian (or
    // nested-loop) anywhere in the gram pipeline would be the O(n²)
    // suffix-comparison shape the k-gram position table exists to avoid
    for (name <- Seq("q_substring_dedup", "q_substring_scrub",
        "q_substring_keepfirst")) {
      val p = plan(q(name))
      assert(!p.contains("CartesianProduct"), s"$name:\n" + p.take(2000))
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$name:\n" + p.take(2000))
      // duplicated-gram count: partial aggregate before the gh exchange
      // (a million-copy boilerplate gram is one row per partition
      // pre-shuffle), final after
      assert("HashAggregate".r.findAllIn(p).size >= 2, s"$name:\n" + p.take(3000))
    }
  }

  test("q_setsim_join: prefix-token equi-join only — no cartesian, " +
      "no nested loop, candidates distinct before the verify joins") {
    // the AllPairs shape: a cartesian (or nested-loop) anywhere would
    // be the O(n²) pair space the prefix filter exists to avoid; every
    // join in the plan must be keyed (token/part candidates + the two
    // id-keyed verify joins)
    val p = plan(q("q_setsim_join"))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    // candidate dedup runs BEFORE the array-carrying verify joins
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(3000))
    // r16 variance-closure pin: the EXECUTED (AQE-final) plan keeps
    // every join broadcast at this scale — the measured fast mode
    // (PlanDump --repeat: stable all-BroadcastHashJoin signature);
    // a SortMergeJoin appearing here would be the plan regression the
    // r15 bimodality was first suspected to be
    val df = q("q_setsim_join")
    df.collect() // finalize THIS plan (AQE)
    val fin = plan(df).split("== Initial Plan ==").head
    assert(!fin.contains("SortMergeJoin"), fin.take(3000))
  }

  test("q_curation_funnel keeper flag is collapse-first — no Window " +
      "over the corpus") {
    // the exact-keeper flag must ride a groupBy-digest aggregate joined
    // back (skew-safe: hot digests combine map-side), not a corpus-wide
    // min-over-window that funnels every copy of a hot digest into one
    // window partition
    val p = plan(q("q_curation_funnel"))
    assert(!p.contains("Window"), p.take(3000))
  }

  test("q_hard_negatives: no cartesian — the IVF probe shape plus one " +
      "keyed anti-join, positives never a nested-loop side") {
    val df = q("q_hard_negatives")
    df.collect() // finalize THIS plan (AQE)
    val p = plan(df).split("== Initial Plan ==").head
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // the only tolerated nested-loop node is the IVF centroid fan-out
    // (the q_knn_ivf pin); the positive-exclusion join must be a
    // KEYED anti-join, never a nested loop
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1,
      p.take(2000))
    assert(p.contains("LeftAnti"), "positive exclusion must be an " +
      "anti-join:\n" + p.take(2000))
  }

  test("q_knn_ivf / q_knn_ivfpq: cell-key equi-joins only, pre-shuffle " +
      "partial top-k in both stages, relational centroid fan-out") {
    for (name <- Seq("q_knn_ivf", "q_knn_ivfpq")) {
      val df = q(name)
      df.collect() // finalize THIS plan (AQE)
      val p = plan(df).split("== Initial Plan ==").head
      assert(!p.contains("CartesianProduct"), s"$name:\n" + p.take(2000))
      // the r6 shape ranked a typedLit of the FULL centroid set in-row
      // (plan size O(k), a multi-MB literal into every task at the
      // k ≈ √n cell counts 100 TB needs). Now the only nested-loop
      // node is the k-row centroid fan-out — queries × the BROADCAST
      // centroid table, ranked through the partial top-k aggregator —
      // and every corpus-side join is an equi-join. Exactly ONE such
      // node, and no literal centroid array anywhere: the plan string
      // stays O(1) in the cell count (pinned below by size).
      val probeSide = "BroadcastNestedLoopJoin".r.findAllIn(p).size
      assert(probeSide <= 1, s"$name: $probeSide nested-loop joins\n" +
        p.take(2000))
      assert(p.length < 120000,
        s"$name: plan string ${p.length} chars — a centroid literal " +
          "re-entered the probe plan?")
      // the typed top-k aggregator runs partial then final in the cell
      // fan-out, the compact-code shortlist, and the exact-rescore
      // reduction
      assert("ObjectHashAggregate".r.findAllIn(p).size >= 6 ||
        "SortAggregate".r.findAllIn(p).size >= 6, s"$name:\n" + p.take(3000))
    }
  }

  test("IVF batch-probe plan size is O(1) in the cell count") {
    // the r6 weak in one assertion: quadrupling the cell count must not
    // grow the probe plan (the centroid set rides a broadcast relation,
    // never an in-plan literal)
    val vecs = graft.sources.Tables.embeddings(spark, sfDir)
    val probes = vecs.limit(20)
    val small = graft.operators.IvfIndex.build(vecs, "vec_id", "embedding",
      k = 8, persist = false)
    val big = graft.operators.IvfIndex.build(vecs, "vec_id", "embedding",
      k = 32, persist = false)
    def planLen(idx: graft.operators.IvfIndex) =
      idx.knnJoinWith(probes, "vec_id", "embedding", k = 5)
        .queryExecution.optimizedPlan.toString.length
    val (ls, lb) = (planLen(small), planLen(big))
    assert(lb < ls * 1.2 + 2000,
      s"plan grew with cell count: k=8 -> $ls chars, k=32 -> $lb chars")
  }

  test("hot-cell skew: AQE splits the stage-1 cell join when the " +
      "inverted file cannot broadcast (the 100 TB shuffle-join regime)") {
    // Natural corpora have hot clusters; an identical-duplicate
    // cluster is the one shape no quantizer can split (Lloyd's
    // density-proportional seeding self-balances clusters with
    // internal spread — ScaleProbe --skew-only measures hot_frac
    // 0.009 for a tight-but-distinct cluster vs 0.300 here). Locally
    // AQE broadcasts the cells side and skew cannot exist, so the
    // probe FORCES the shuffle join and scales the skew detector's
    // byte thresholds down to local partition sizes — the same AQE
    // rule a production 256 MB-partition run would hit.
    import org.apache.spark.sql.functions.{col, lit, pmod, transform, when}
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.shuffle.partitions")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4k")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2k")
      // at the suite's 4 shuffle partitions the hot-cell partition is
      // only ~2x the median (each partition holds ~45 of the ~180
      // cells) — the skew must be visible at the PARTITION level for
      // the rule to see it, exactly as on a real cluster
      conf.set("spark.sql.shuffle.partitions", "32")
      val base = graft.sources.Tables.embeddings(spark, sfDir)
        .select("vec_id", "embedding")
      val raw = (0 until 4)
        .map(i => base.select(
          (col("vec_id") + lit(i.toLong * 1000000L)).as("vec_id"),
          col("embedding")))
        .reduce(_ unionByName _)
      val vecs = raw.select(col("vec_id"),
          when(pmod(col("vec_id"), lit(10)) < 3,
            transform(col("embedding").cast("array<double>"),
              (_, i) => when(i === 0, lit(100.0)).otherwise(lit(0.01))))
            .otherwise(col("embedding").cast("array<double>"))
            .as("embedding"))
        .localCheckpoint()
      val n = vecs.count()
      val idx = graft.operators.IvfIndex.build(vecs, "vec_id", "embedding",
        persist = false)
      val hotFrac = idx.cells.groupBy("cell").count()
        .agg(org.apache.spark.sql.functions.max("count"))
        .head().getLong(0).toDouble / n
      assert(hotFrac > 0.25, f"cluster did not concentrate: $hotFrac%.3f")
      val joined = idx.knnJoinWith(
        vecs.filter(col("vec_id") % 10 === 0), "vec_id", "embedding", k = 5)
      joined.collect() // finalize THIS adaptive plan
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        "AQE did not split the hot-cell join partition:\n" + p.take(3000))
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _)) }
  }

  test("q_knn_ann: occupancy cap is a separate aggregate — no Window " +
      "over the embedding-carrying signature table, no checkpoint scan") {
    val df = q("q_knn_ann")
    df.collect() // finalize THIS plan (AQE)
    val p = plan(df).split("== Initial Plan ==").head
    // the r4 shape computed bucket occupancy with count(*) OVER
    // (PARTITION BY t, sig) — n·T embedding-carrying rows through a
    // window exchange, then localCheckpointed (an ExistingRDD scan at
    // T× the corpus vector bytes). Both must stay gone: occupancy now
    // rides a (t, sig)-only aggregate joined back as the cap filter.
    assert(!p.contains("Window"), p.take(2000))
    assert(!p.contains("ExistingRDD"), p.take(2000))
    // the candidate self-join must stay SORT-MERGE (hinted): the fused
    // broadcast-hash probe measured ~25× more per match on the fat
    // embedding rows (r5 regression — 66 s vs 2.6 s at sf0.1 bench)
    assert(p.contains("SortMergeJoin"), p.take(3000))
    // pre-shuffle partial top-k still in place (partial + final)
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2 ||
      "SortAggregate".r.findAllIn(p).size >= 2, p.take(3000))
  }

  test("q_text_normalize: nfc_normalize runs inside whole-stage codegen") {
    val df = q("q_text_normalize")
    df.collect()
    val p = plan(df).split("== Initial Plan ==").head
    // the NFC expression must not break the codegen stage — a fallback
    // to interpreted projection would serialize the whole cleanup pass
    assert("\\*\\(\\d+\\) Project \\[".r.findFirstIn(p).isDefined &&
      p.contains("nfc_normalize"), p.take(2000))
  }

  test("q_corpus_shuffle: the only wide op is the per-shard window — " +
      "partitioned, never a single-partition global sort") {
    val df = q("q_corpus_shuffle")
    df.collect()
    val p = plan(df).split("== Initial Plan ==").head
    // the window must partition by shard (a global row_number would
    // move the corpus to ONE task — the warned-about killer shape)
    assert("Window \\[.*partitionBy".r.findFirstIn(p).isDefined ||
      p.contains("hashpartitioning(shard"), p.take(3000))
    assert(!p.contains("SinglePartition"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("q_dedup_semantic: within-cell pairs ride a cell equi-join — no " +
      "cartesian, exactly the quantizer's one nested-loop fan-out") {
    val df = q("q_dedup_semantic")
    df.collect()
    val p = plan(df).split("== Initial Plan ==").head
    assert(!p.contains("CartesianProduct"), p.take(3000))
    // the packed-centroid assignment is the family's single allowed
    // nested-loop (1-row build side); the PAIR join must be hash/merge
    // on the cell key
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 2, p.take(3000))
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      "BroadcastHashJoin.*cell".r.findFirstIn(p).isDefined, p.take(3000))
  }

  test("no registered query carries an undeclared GLOBAL window: every " +
      "logical Window keeps a partition spec post-optimizer " +
      "(BoundedWindow audit — VERDICT r10 watch item 1)") {
    // The four windows that are global ON PURPOSE run over bounded
    // inputs and declare it via BoundedWindow.key (non-foldable, so
    // EliminateWindowPartitions cannot strip it). Anything surfacing
    // here is an ACCIDENTAL all-rows-to-one-task window — the shape the
    // WindowExec warning exists to flag, now a test failure instead of
    // log noise.
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow,
      WindowGroupLimit}
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val lp = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.optimizedPlan
      lp.collect {
        case w: LWindow if w.partitionSpec.isEmpty =>
          s"$name: ${w.simpleString(120)}"
        case w: WindowGroupLimit if w.partitionSpec.isEmpty =>
          s"$name: ${w.simpleString(120)}"
      }
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("q_anomaly: per-type stats broadcast back over the scoring scan") {
    // the stats side is ≤|event types| rows — a shuffle join here would
    // re-shuffle the corpus for a 5-row lookup
    val p = plan(q("q_anomaly"))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("q_merge_upsert: the merge is one equi-join, no nested loop") {
    val p = plan(q("q_merge_upsert"))
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("q_event_funnel and q_histogram aggregate map-side — partial+final " +
    "HashAggregate pairs, no window, no join") {
    for (name <- Seq("q_event_funnel", "q_histogram")) {
      val p = plan(q(name))
      assert(p.contains("HashAggregate"), s"$name:\n" + p.take(1500))
      assert(!p.contains("Join"), s"$name:\n" + p.take(1500))
      assert(!p.contains("WindowExec"), s"$name:\n" + p.take(1500))
    }
  }

  test("q_mutual_info / q_cramers_v: marginals ride back as broadcasts " +
    "over the tiny cell table — no shuffle join, no cartesian blowup") {
    for (name <- Seq("q_mutual_info", "q_cramers_v")) {
      val p = plan(q(name))
      assert(!p.contains("SortMergeJoin") &&
        !p.contains("ShuffledHashJoin"), s"$name:\n" + p.take(2000))
      assert(!p.contains("CartesianProduct"), s"$name:\n" + p.take(2000))
      assert(p.contains("HashAggregate"), s"$name:\n" + p.take(2000))
    }
  }

  test("q_kappa folds to five counts in ONE map-side-combined " +
    "aggregate: no join, no window, no shuffle beyond the 1-row final") {
    val p = plan(q("q_kappa"))
    assert(!p.contains("Join"), p.take(2000))
    assert(!p.contains("WindowExec"), p.take(2000))
    assert(p.contains("HashAggregate"), p.take(2000))
  }

  test("q_argmax is window-free: one map-side-combinable aggregate, " +
    "no per-key sort") {
    val p = plan(q("q_argmax"))
    assert(!p.contains("WindowExec") && !p.contains("WindowGroupLimit"),
      p.take(1500))
    assert(p.contains("Aggregate"), p.take(1500))
  }

  test("q_scd2: both per-key windows share ONE shuffle (same " +
    "partitioning and ordering)") {
    val p = plan(q("q_scd2"))
    // exchanges: one hash(key) feeding both Window nodes + the final
    // presentation range sort — a third would mean the second window
    // re-shuffled
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 2, s"got $exchanges exchanges:\n" + p.take(2500))
    assert("Window".r.findAllIn(p).length >= 2, p.take(2500))
  }

  test("q_drift: the totals table broadcasts — no corpus re-shuffle " +
    "for a ≤|groups|-row lookup") {
    val p = plan(q("q_drift"))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("q_perplexity: the bounded vocabulary BROADCASTS to the scoring " +
    "join — the Zipf-tailed token table never shuffles against the " +
    "corpus") {
    val p = plan(q("q_perplexity"))
    assert(p.contains("BroadcastHashJoin"), p.take(2500))
    assert(!p.contains("SortMergeJoin"), p.take(2500))
    assert(!p.contains("CartesianProduct"), p.take(2500))
  }

  test("q_scd2_lookup: the interval lookup is an equi-join on the " +
    "dimension key with the interval test as residual — never a " +
    "nested loop over facts × versions") {
    val p = plan(q("q_scd2_lookup"))
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p.take(2500))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(2500))
  }

  test("q_table_checksum: one map-side-combined aggregate — no join, " +
    "no window, no sort before the final presentation order") {
    val p = plan(q("q_table_checksum"))
    assert(p.contains("HashAggregate"), p.take(2000))
    assert(!p.contains("Join"), p.take(2000))
    assert(!p.contains("WindowExec"), p.take(2000))
  }

  test("q_pagerank: iterative lineage is TRUNCATED — the presented " +
    "plan reads the checkpointed final sweep (constant depth), and " +
    "each sweep's own plan is equi-joins over checkpointed leaves, " +
    "never a re-derivation of the edge list") {
    // final plan: TakeOrdered over the checkpointed rank table — the
    // 5-sweep join chain must NOT be re-planned (re-executing it cost
    // 17.5 s/run at sf0.1; truncated it is ~1.3 s, BASELINE.md §r12)
    val p = plan(q("q_pagerank"))
    assert(p.contains("ExistingRDD") || p.contains("Scan ExistingRDD"),
      p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // one sweep over checkpointed inputs: equi-join + grouped sum,
    // 1-row count broadcasts as the only nested loops
    import org.apache.spark.sql.functions._
    val e0 = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .join(spark.read.parquet(s"$sfDir/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .select(concat(lit("c"), col("o_custkey").cast("string")).as("src"),
        concat(lit("s"), col("l_suppkey").cast("string")).as("dst"))
      .distinct()
    val edges = e0.union(e0.select(col("dst").as("src"),
      col("src").as("dst")))
    val sweep = graft.operators.GraphOps.pageRank(edges, iterations = 1)
    val ps = sweep.queryExecution.executedPlan.toString
    assert(ps.contains("ExistingRDD"), ps.take(2000))
    assert(!ps.contains("CartesianProduct"), ps.take(2000))
  }

  test("q_kll_merge and q_resample stay shuffle-disciplined: sketch " +
    "aggregates run as object-hash partial+final; the resample " +
    "spine join is an equi-join") {
    val pk = plan(q("q_kll_merge"))
    assert(pk.contains("ObjectHashAggregate"), pk.take(2000))
    assert(!pk.contains("SortAggregate"), pk.take(2000))
    val pr = plan(q("q_resample"))
    assert(!pr.contains("CartesianProduct") &&
      !pr.contains("BroadcastNestedLoopJoin"), pr.take(2500))
  }

  test("affinity tier shuffle discipline: PMI pairs are generated " +
    "map-side (no positions self-join), basket/triangle joins are all " +
    "equi, and q_ewma needs no join at all") {
    // q_cooccur_pmi: the ONLY nested-loop nodes are the two broadcast
    // 1-row total fan-outs; pair generation itself is Generate over
    // HOFs — a positions self-join would surface as an extra join
    val pp = plan(q("q_cooccur_pmi"))
    assert(!pp.contains("CartesianProduct"), pp.take(2500))
    assert("BroadcastNestedLoopJoin".r.findAllIn(pp).size === 2,
      pp.take(2500))
    // q_basket_rules: basket self-join + two item-count joins + one
    // 1-row N fan-out; nothing non-equi beyond that single fan-out
    val pb = plan(q("q_basket_rules"))
    assert(!pb.contains("CartesianProduct"), pb.take(2500))
    assert("BroadcastNestedLoopJoin".r.findAllIn(pb).size === 1,
      pb.take(2500))
    // q_triangles: three equi hops, zero nested-loop anything
    val pt = plan(q("q_triangles"))
    assert(!pt.contains("CartesianProduct") &&
      !pt.contains("BroadcastNestedLoopJoin"), pt.take(2500))
    // q_ewma: one partitioned window, no join of any kind
    val pe = plan(q("q_ewma"))
    assert(!pe.contains("Join"), pe.take(2500))
    assert(pe.contains("Window"), pe.take(2500))
  }

  test("q_acf, q_fuzzy_join, q_label_prop: equi-joins only — the lag " +
    "pairing, the blocked name join, and every LPA sweep avoid " +
    "nested loops") {
    Seq("q_acf", "q_fuzzy_join", "q_label_prop").foreach { name =>
      val p = plan(q(name))
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), s"$name: ${p.take(2500)}")
    }
  }

  test("q_interval_join runs as a bucket EQUI-join — the naive range " +
    "spelling would be a nested loop over sessions × sessions") {
    val p = plan(q("q_interval_join"))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(2500))
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p.take(2500))
  }

  test("q_skyline: no cartesian pair space — the only nested-loop " +
    "joins ship broadcast 1-row/256-row bounded sides, and every " +
    "window carries a partition spec") {
    val df = q("q_skyline")
    val p = plan(df)
    assert(!p.contains("CartesianProduct"), p.take(2500))
    // the exact stage and the bucket staircase both run as WindowExec
    // with NON-EMPTY partition specs (BoundedWindow.key / bkt) — an
    // accidentally-global window would print an empty partition list
    assert(p.contains("windowspecdefinition("), p.take(2500))
    assert(!p.contains("windowspecdefinition(,") &&
      !p.contains("windowspecdefinition( ,"), p.take(2500))
  }

  test("q_shortest_path: every BFS hop is an equi-join keyed on node " +
    "id — no nested loop anywhere in the 4-hop chain") {
    val p = plan(q("q_shortest_path"))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(2500))
  }

  test("q_ngram_topk takes its top-50 with TakeOrderedAndProject — " +
    "partial per-partition top-k, never a total sort of the n-gram " +
    "table") {
    val p = plan(q("q_ngram_topk"))
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    assert(p.contains("HashAggregate"), p.take(2000))
  }

  test("q_entropy and q_winsorize aggregate map-side with no " +
    "cartesian: entropy is two chained hash-aggs; winsorize " +
    "broadcasts its per-group cut table back to the scan") {
    val pe = plan(q("q_entropy"))
    assert(pe.contains("HashAggregate") &&
      !pe.contains("CartesianProduct"), pe.take(2000))
    val pw = plan(q("q_winsorize"))
    assert(!pw.contains("CartesianProduct") &&
      !pw.contains("BroadcastNestedLoopJoin"), pw.take(2500))
    assert(pw.contains("BroadcastHashJoin"), pw.take(2500))
  }

  test("q_geo_join blocks on grid-cell EQUI-keys — the 150k-pair " +
    "cross product the oracle brute-forces never appears in the " +
    "engine plan") {
    val p = plan(q("q_geo_join"))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(2500))
    assert(p.contains("BroadcastHashJoin") ||
      p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
      p.take(2500))
  }

  test("q_table_diff runs as ONE full-outer equi-join (the mergeRows " +
    "exchange discipline) with the column compares as a codegen'd " +
    "projection") {
    val p = plan(q("q_table_diff"))
    assert(!p.contains("CartesianProduct"), p.take(2500))
    assert("SortMergeJoin|ShuffledHashJoin".r
      .findAllMatchIn(p).size === 1, p.take(2500))
  }

  test("q_geo_nearest: the escalation ladder is blocked equi-joins " +
    "end to end — the ONLY nested-loop join is the declared " +
    "broadcast brute sweep over the straggler remainder") {
    val p = plan(q("q_geo_nearest"))
    assert(!p.contains("CartesianProduct"), p.take(2500))
    assert("BroadcastNestedLoopJoin".r.findAllMatchIn(p).size <= 1,
      p.take(2500))
  }

  test("q_weighted_median: the exact window runs only inside the " +
    "crossing bucket — the value-ordered windows are group-" +
    "partitioned and the bucket tables broadcast back") {
    val p = plan(q("q_weighted_median"))
    assert(!p.contains("CartesianProduct"), p.take(2500))
    assert(p.contains("BroadcastHashJoin"), p.take(2500))
    assert(p.contains("windowspecdefinition("), p.take(2500))
    assert(!p.contains("windowspecdefinition(,") &&
      !p.contains("windowspecdefinition( ,"),
      s"global window leaked: ${p.take(2500)}")
  }

  test("q_geo_clusters: the spatial pair graph is a blocked " +
    "equi-self-join (never n²) and the presented component plan is " +
    "checkpoint-truncated like every iterative operator") {
    val p = plan(q("q_geo_clusters"))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(2500))
  }

  test("q_gaps_islands, q_transitions, q_attribution: every window " +
    "carries a user partition — per-key state, nothing global") {
    Seq("q_gaps_islands", "q_transitions", "q_attribution").foreach {
      name =>
        val p = plan(q(name))
        assert(!p.contains("CartesianProduct"), s"$name: ${p.take(1500)}")
        assert(p.contains("windowspecdefinition("), name)
        assert(!p.contains("windowspecdefinition(,") &&
          !p.contains("windowspecdefinition( ,"),
          s"$name has a global window: ${p.take(2000)}")
    }
  }

  test("q_key_skew takes its top-10 with TakeOrderedAndProject — " +
    "partial per-partition top-k, never a global sort of the key table") {
    val p = plan(q("q_key_skew"))
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    // marginals ride back as broadcasts; no shuffle join of the counts
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      p.take(2000))
  }

  test("q_crosstab: one aggregate over the raw table, marginals " +
    "broadcast back — no shuffle join, no cartesian") {
    val p = plan(q("q_crosstab"))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      p.take(2000))
    assert(p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("q_changepoint and q_trailing_features: windows are " +
    "group/user-partitioned and the argmax fold adds no exchange " +
    "after the prefix window") {
    Seq("q_changepoint", "q_trailing_features").foreach { name =>
      val p = plan(q(name))
      assert(!p.contains("windowspecdefinition(,") &&
        !p.contains("windowspecdefinition( ,"),
        s"$name has a global window: ${p.take(2000)}")
      assert(!p.contains("CartesianProduct"), s"$name: ${p.take(1500)}")
    }
    // the three trailing frames stack as Window nodes over ONE
    // user-keyed exchange and ONE physical sort — the ordering key is
    // materialized once, so EnsureRequirements elides the re-sorts
    // (node lines counted in plan text — AQE hides children from
    // executedPlan.collect before execution)
    val tf = plan(q("q_trailing_features"))
    val hashEx = "Exchange hashpartitioning".r.findAllIn(tf).length
    assert(hashEx === 1,
      s"expected one user-keyed exchange, got $hashEx:\n${tf.take(2500)}")
    val localSorts = "(?m)^[\\s+:*-]*Sort .*, false,".r
      .findAllIn(tf).length
    assert(localSorts === 1,
      s"expected one window sort, got $localSorts:\n${tf.take(2500)}")
  }

  test("q_gini: the global rank/prefix-sum is two-level — every " +
    "window carries a partition key, no cartesian pair space") {
    val p = plan(q("q_gini"))
    assert(!p.contains("windowspecdefinition(,") &&
      !p.contains("windowspecdefinition( ,"),
      s"global window leaked into the Lorenz rank: ${p.take(2500)}")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // the per-entity table ranks inside bucket-partitioned windows
    assert(p.contains("windowspecdefinition(bkt"), p.take(2500))
  }

  test("q_theil_sen: the pairwise-slope space materializes through the " +
    "block-pair EQUI-join — no CartesianProduct anywhere; nested-loop " +
    "joins are only the declared 1-row broadcasts") {
    // the pair stage itself (pinned inside theilSen, so it runs as an
    // earlier eager job and is invisible in the final query's plan):
    // must be a hash/merge equi-join on the packed block-pair key
    import spark.implicits._
    val pp = plan(graft.operators.FitOps.slopePairs(
      Seq((1.0, 2.0), (2.0, 5.0), (3.0, 9.0)).toDF("x", "y")))
    assert(!pp.contains("CartesianProduct") &&
      !pp.contains("BroadcastNestedLoopJoin"), pp.take(2500))
    assert(pp.contains("[bp"), s"block-pair equi key missing:\n${pp.take(2500)}")
    // the assembled query: 1-row-aggregate broadcasts only, windows
    // all partitioned
    val p = plan(q("q_theil_sen"))
    assert(!p.contains("CartesianProduct"), p.take(2500))
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 8, p.take(3000))
    assert(!p.contains("windowspecdefinition(,") &&
      !p.contains("windowspecdefinition( ,"),
      s"weightedMedian lost its partition spec: ${p.take(2500)}")
  }

  test("q_group_ols and q_xcorr: pure keyed hash-aggregations — no " +
    "nested-loop joins, aggregates fold map-side") {
    Seq("q_group_ols", "q_xcorr").foreach { name =>
      val p = plan(q(name))
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), s"$name: ${p.take(2000)}")
      assert(p.contains("partial_"), // map-side combine before exchange
        s"$name: no partial aggregation:\n${p.take(2000)}")
    }
  }

  test("q_candidate_keys profiles all columns in ONE scan (the " +
    "multi-distinct plans via a single expand, not per-column jobs)") {
    val p = plan(q("q_candidate_keys"))
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans === 1, s"expected one orders scan, got $scans:\n${p.take(2500)}")
    assert(p.contains("Expand"), s"multi-distinct should expand:\n${p.take(2000)}")
  }

  test("q_kaplan_meier and q_psi: bounds/totals ride as broadcast " +
    "1-row aggregates and every window is partitioned") {
    Seq("q_kaplan_meier", "q_psi").foreach { name =>
      val p = plan(q(name))
      assert(!p.contains("CartesianProduct"), s"$name: ${p.take(2000)}")
      assert(!p.contains("windowspecdefinition(,") &&
        !p.contains("windowspecdefinition( ,"),
        s"$name has a global window: ${p.take(2500)}")
    }
  }

  test("q_ols_multi and q_t_test: ONE wide map-side-combined " +
    "aggregate over the raw scan — the Gram/moment sums never shuffle " +
    "rows") {
    Seq("q_ols_multi", "q_t_test").foreach { name =>
      val p = plan(q(name))
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), s"$name: ${p.take(2000)}")
      assert(p.contains("partial_"),
        s"$name: no partial aggregation:\n${p.take(2000)}")
      val scans = "Scan parquet".r.findAllIn(p).size
      assert(scans === 1, s"$name: expected one scan, got $scans")
    }
  }

  test("q_theil_sen_strided: the ladder pairs ride a hash equi-join " +
    "on the shifted day key — no cartesian, no nested loop beyond the " +
    "declared 1-row broadcasts") {
    import spark.implicits._
    val pp = plan(graft.operators.FitOps.stridedSlopePairs(
      Seq((1.0, 2.0), (2.0, 5.0), (3.0, 9.0)).toDF("x", "y"),
      Seq(1, 2)))
    assert(!pp.contains("CartesianProduct") &&
      !pp.contains("BroadcastNestedLoopJoin"), pp.take(2500))
    assert(pp.contains("[xb"), s"shifted-day equi key missing:\n${pp.take(2500)}")
    val p = plan(q("q_theil_sen_strided"))
    assert(!p.contains("CartesianProduct"), p.take(2500))
    // mann_kendall folds off the same block-pair slope table
    val pm = plan(q("q_mann_kendall"))
    assert(!pm.contains("CartesianProduct"), pm.take(2500))
  }

  test("q_spearman_matrix: rank tables join back as keyed hash joins " +
    "and the pair fold is ONE wide aggregate — no cartesian, no " +
    "global window") {
    val p = plan(q("q_spearman_matrix"))
    assert(!p.contains("CartesianProduct"), p.take(2500))
    assert(p.contains("partial_"), s"no map-side fold:\n${p.take(2000)}")
    assert(!p.contains("windowspecdefinition(,") &&
      !p.contains("windowspecdefinition( ,"),
      s"global window leaked: ${p.take(2500)}")
  }

  test("q_perplexity_bigram: vocab/bigram/total tables all broadcast " +
    "back over the token stream — the corpus is never the build side") {
    val p = plan(q("q_perplexity_bigram"))
    assert(!p.contains("CartesianProduct"), p.take(2500))
    val bhj = "BroadcastHashJoin".r.findAllIn(p).size
    assert(bhj >= 3, s"expected ≥3 broadcast joins, got $bhj:\n${p.take(2500)}")
    assert(!p.contains("SortMergeJoin"),
      s"corpus-wide merge join leaked:\n${p.take(2500)}")
  }

  test("r15c one-aggregate closed forms (jarque_bera, iv_wald, rdd, " +
    "chisq_test, granger, vif, woe_iv): no cartesian, partial " +
    "aggregation, moment sums never shuffle rows") {
    Seq("q_jarque_bera", "q_iv_wald", "q_rdd", "q_chisq_test",
      "q_granger", "q_vif", "q_woe_iv").foreach { name =>
      val p = plan(q(name))
      assert(!p.contains("CartesianProduct"), s"$name: ${p.take(2000)}")
      // q_vif consumes the session-cached pinned moment row (shared
      // with corr_matrix/mahalanobis since r16), so when another
      // suite warmed the shared session's cache first, its plan is a
      // 1-row ExistingRDD scan with NO aggregate at all — which
      // satisfies "moment sums never shuffle rows" even more
      // strongly than a partial aggregate does (the suites share one
      // session, so cache state is test-order-dependent).
      assert(p.contains("partial_") || p.contains("Scan ExistingRDD"),
        s"$name: no partial aggregation and no pinned moment scan:\n" +
          p.take(2000))
    }
    // rdd additionally pushes the bandwidth filter into the scan
    val pr = plan(q("q_rdd"))
    assert(pr.contains("PushedFilters: ["),
      s"q_rdd: no pushed filters:\n${pr.take(2000)}")
  }

  test("r15c windowed ops (hampel, rolling_quantile, " +
    "seasonal_decompose): every window carries a partition key and " +
    "nothing shuffles the corpus twice") {
    Seq("q_hampel", "q_rolling_quantile").foreach { name =>
      val p = plan(q(name))
      assert(!p.contains("CartesianProduct"), s"$name: ${p.take(2000)}")
      // the frame window is partitioned by user_id, never global
      assert("Window \\[[^\\n]*\\], \\[user_id#\\d+L?\\]".r
        .findFirstIn(p).isDefined,
        s"$name: window lost its partition key:\n${p.take(2500)}")
    }
    val ps = plan(q("q_seasonal_decompose"))
    assert(!ps.contains("CartesianProduct"), ps.take(2000))
    // the daily collapse happens BEFORE any window: the scan feeds a
    // partial aggregate, and windows run on the bounded daily series
    assert(ps.contains("partial_"), ps.take(2500))
  }

  test("q_levene and q_tukey_hsd: grouped spine / k-row self-join " +
    "shapes — no cartesian pair space, group tables broadcast") {
    Seq("q_levene", "q_tukey_hsd").foreach { name =>
      val p = plan(q(name))
      assert(!p.contains("CartesianProduct"), s"$name: ${p.take(2000)}")
    }
    val pt = plan(q("q_tukey_hsd"))
    assert(pt.contains("BroadcastHashJoin") ||
      pt.contains("BroadcastNestedLoopJoin"),
      s"q_tukey_hsd: pair join must broadcast the k-row side:\n" +
        pt.take(2500))
  }
}
