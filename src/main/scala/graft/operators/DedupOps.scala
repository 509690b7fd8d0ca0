package graft.operators

import graft.Query
import graft.sources.Tables
import graft.tools.ObservedMetrics
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tier D (dedup) — the deduplication family for training-data curation
  * (BASELINE.json north_star): exact hash dedup, MinHash+LSH near-dup,
  * SimHash fingerprints, and embedding-cosine near-dup.
  *
  * Scale design: the LSH pipeline is the 100 TB path — signatures are a
  * narrow map, banding turns the O(n²) pair space into a hash-shuffle on
  * band keys (only same-bucket docs meet), and the exact-Jaccard verify
  * touches candidate pairs only. The DuckDB oracle recomputes the answer
  * by brute force, proving the scalable plan returns the exact result.
  * Hash functions are deterministic salted hashes (xxhash64 for minhash
  * permutations — codegen'd, never surfaced in results; md5 where the
  * digest itself is oracle-compared), so every stage is
  * engine-reproducible — no RNG anywhere.
  */
object DedupOps {

  /** 3-gram shingle set (distinct) of a single-space-tokenized text. */
  def shingles(text: Column, k: Int = 3): Column = {
    val toks = split(text, " ")
    array_distinct(transform(
      sequence(lit(0), greatest(size(toks) - k, lit(0))),
      i => concat_ws(" ", slice(toks, i + lit(1), lit(k)))))
  }

  /** MinHash permutation family: for permutation p, min over shingles of
    * xxhash64(p, shingle) — salted 64-bit hashes. This explode → min
    * aggregate spelling is the REFERENCE semantics of the signature; the
    * pipeline itself computes the identical values in one pass with the
    * native [[graft.functions.MinHashSig]] expression (bit-equality
    * pinned in TextHashSpec). */
  def minhashCols(shingle: Column, perms: Int): Seq[Column] =
    (0 until perms).map(p => min(xxhash64(lit(p), shingle)).as(s"m$p"))

  /** Exact Jaccard between two distinct-element shingle arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - inter)
  }

  // 16 bands × 2 rows = 32 permutations: for the j ≥ 0.9 near-dup pairs
  // this corpus plants, per-pair miss probability is (1 - 0.9²)¹⁶ ≈ 2e-14
  // — recall is effectively certain, which is what lets the brute-force
  // oracle gate the LSH plan by hash equality.
  private val PERMS = 32
  private val ROWS_PER_BAND = 2

  /** Default band-bucket cap. After the exact-duplicate pre-collapse a
    * bucket holds only DISTINCT texts whose band signatures collide, so
    * buckets above this size signal a pathological boilerplate cluster
    * (or an adversarial corpus); such buckets are dropped from LSH
    * candidacy with a logged count — never silently, never exploded into
    * a single m² task. */
  val DefaultMaxBucket = 1024

  /** The LSH near-duplicate pipeline: shingle → minhash → band →
    * bucket-join → exact-Jaccard verify, over the driver corpus. */
  def minhashPairs(spark: SparkSession, sfDir: String): DataFrame =
    minhashPairs(spark, sfDir, 0.5)

  /** As [[minhashPairs(spark:SparkSession,sfDir:String)*]] at a chosen
    * threshold. (Scala allows default arguments on only one overload —
    * the library form below keeps them.) */
  def minhashPairs(spark: SparkSession, sfDir: String,
      threshold: Double): DataFrame =
    // Tables.documents arrives hash-distributed on doc_id (the loader
    // repartitions the single-file corpus), so the narrow shingle/minhash
    // pipeline uses every core and the doc_id groupBy needs no second
    // shuffle.
    minhashPairs(Tables.documents(spark, sfDir), "doc_id", "text", threshold)

  /** Library form: near-duplicate pairs of any corpus DataFrame.
    * `idCol` must be a unique orderable document id; `textCol` the
    * single-space-tokenized text. Returns (a_id, b_id, jacc) with
    * a_id < b_id and exact Jaccard ≥ threshold.
    *
    * Skew design (the web-scale degenerate case): corpora at 100 TB are
    * dominated by EXACT duplicates — millions of identical boilerplate
    * pages share one signature, which would put one m-element bucket
    * (m² pairs) in a single collect_list row and one task. So the
    * pipeline
    *   1. collapses exact duplicates first (md5 digest → one
    *      representative per group; one shuffle, hot groups handled by
    *      Spark's spilling sort, never buffered in user code),
    *   2. runs LSH over the representatives only, with band buckets
    *      capped at `maxBucket` (oversized buckets are dropped and the
    *      drop is logged through an observed metric — recall loss is
    *      explicit, not an OOM),
    *   3. re-attaches the collapsed members to the pair output:
    *      identical docs pair at jacc 1.0 within their group, and every
    *      rep-level pair expands to all member combinations (identical
    *      text ⇒ identical Jaccard). The expansion is plain hash joins —
    *      output size is inherent to the pairs contract, but no single
    *      task ever sees a whole group crossed with itself in one row. */
  def minhashPairs(corpus: DataFrame, idCol: String, textCol: String,
      threshold: Double, maxBucket: Int = DefaultMaxBucket): DataFrame =
    minhashPairsUnordered(corpus, idCol, textCol, threshold, maxBucket)
      .orderBy("a_id", "b_id")

  /** [[minhashPairs]] without the presentation sort — for consumers
    * like [[nearDupClusters]] that treat the pairs as an edge set (the
    * final orderBy is a range exchange + sort they would pay for
    * nothing). */
  def minhashPairsUnordered(corpus: DataFrame, idCol: String,
      textCol: String, threshold: Double,
      maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val (members, repPairs) = collapsedRepPairs(corpus, idCol, textCol,
      threshold, maxBucket)
    // Intra-group pairs: identical text ⇒ Jaccard exactly 1.0. The self
    // equi-join on rep_id streams a hot group through the sort-merge
    // join's spillable buffer instead of one collect_list row.
    val intra = members.select(col("rep_id"), col("doc_id").as("x_id"))
      .join(members.select(col("rep_id"), col("doc_id").as("y_id")), "rep_id")
      .filter(col("x_id") < col("y_id"))
      .select(col("x_id").as("a_id"), col("y_id").as("b_id"),
        lit(1.0).as("jacc"))
    // Cross-group expansion: each representative pair fans out to all
    // member combinations; least/greatest restores canonical id order
    // (member ids of the lower-rep group need not all be lower).
    val cross = repPairs
      .join(members.select(col("rep_id").as("a_id"), col("doc_id").as("a_m")),
        "a_id")
      .join(members.select(col("rep_id").as("b_id"), col("doc_id").as("b_m")),
        "b_id")
      .select(least(col("a_m"), col("b_m")).as("a_id"),
        greatest(col("a_m"), col("b_m")).as("b_id"), col("jacc"))
    intra.unionByName(cross)
  }

  /** SPANNING near-duplicate edge set — connected-component-equivalent
    * to [[minhashPairsUnordered]] but with |group|−1 star edges per
    * exact-duplicate group instead of C(|group|,2) pairs, and rep-level
    * LSH pairs left UNexpanded. At web scale (million-copy boilerplate
    * groups) this is the difference between a linear and a quadratic
    * edge list; [[nearDupClusters]] consumes this form. */
  def nearDupEdges(corpus: DataFrame, idCol: String, textCol: String,
      threshold: Double, maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val (members, repPairs) = collapsedRepPairs(corpus, idCol, textCol,
      threshold, maxBucket)
    members.filter(col("doc_id") =!= col("rep_id"))
      .select(col("rep_id").as("a_id"), col("doc_id").as("b_id"))
      .unionByName(repPairs.select("a_id", "b_id"))
  }

  /** Shared stage 0+1 of the LSH family: exact-duplicate collapse, then
    * rep-level capped-bucket LSH pairs. Returns (members = (rep_id,
    * doc_id) for every doc, repPairs = (a_id, b_id, jacc) between
    * representatives). */
  private def collapsedRepPairs(corpus: DataFrame, idCol: String,
      textCol: String, threshold: Double, maxBucket: Int)
      : (DataFrame, DataFrame) = {
    ObservedMetrics.register(corpus.sparkSession)
    val raw = corpus.select(col(idCol).as("doc_id"), col(textCol).as("text"))
    // Exact-duplicate pre-collapse. min-over-window instead of
    // groupBy+join: one shuffle on the digest, text rides along, and a
    // hot digest group external-sorts inside its partition (spill-safe).
    // The member map is consumed by several downstream branches (intra
    // pairs ×2, cross expansion ×2, representative derivation), each of
    // which would re-run the digest window — so the tiny (rep_id,
    // doc_id) projection is pinned with an eager checkpoint
    // (Checkpoints.pin: executor-local blocks, ~16 bytes/doc — 160
    // MB/executor at 10^10 docs on a 1000-node cluster — or the
    // session's reliable checkpoint dir when one is configured), freed
    // by the ContextCleaner when the result DataFrame is dropped.
    val members = graft.tools.Checkpoints.pin(
      raw.withColumn("dig", md5(col("text")))
        .withColumn("rep_id", min(col("doc_id")).over(Window.partitionBy("dig")))
        .select(col("rep_id"), col("doc_id")))
    // Representatives re-acquire their text by joining the corpus on
    // doc_id (a broadcast or id-aligned join — the loader's doc_id hash
    // distribution means no corpus exchange) instead of filtering the
    // window output, which would evaluate the digest shuffle a second
    // time with the full text riding along.
    val reps = raw.join(
        members.filter(col("doc_id") === col("rep_id")).select("doc_id"),
        "doc_id")
      .select(col("doc_id"), col("text"))
    (members, lshBucketPairs(reps, threshold, maxBucket))
  }

  /** LSH bucket-join over an exact-dup-free corpus: shingle → minhash →
    * band → capped bucket explosion → exact-Jaccard verify. Expects
    * (doc_id, text); returns unordered canonical pairs (a_id, b_id,
    * jacc ≥ threshold). */
  private def lshBucketPairs(raw: DataFrame, threshold: Double,
      maxBucket: Int): DataFrame = {
    import graft.functions.TextHashOps
    // Signatures via the native MinHashSig expression: the entire
    // 32-permutation signature computes in ONE codegen'd pass over the
    // text bytes — a narrow projection with no shingle materialization,
    // no explode, no aggregate and no shuffle (hash-compatible with the
    // explode → min(xxhash64(p, shingle)) spelling, which it replaced at
    // ~10× the stage cost; equivalence pinned in TextHashSpec). At any
    // scale this stage is embarrassingly parallel.
    val sigs = raw.select(col("doc_id"),
      TextHashOps.minhashSig(col("text"), 3, PERMS).as("sig"))
    val nBands = PERMS / ROWS_PER_BAND
    val bands = sigs.select(col("doc_id"), posexplode(
      array((0 until nBands).map(b => concat_ws("\u0000",
        (0 until ROWS_PER_BAND).map(r =>
          element_at(col("sig"), b * ROWS_PER_BAND + r + 1)): _*)): _*))
      .as(Seq("band", "bval")))
    // Bucket sizes via a window count on the band key: one exchange on
    // (band, bval) that the following groupBy reuses (no second
    // shuffle), and oversized buckets are filtered out BEFORE any
    // collect_list row materializes — the cap bounds both the explosion
    // (≤ maxBucket² pairs per bucket) and the row size. The drop count
    // surfaces through an observed metric that ObservedMetrics logs at
    // WARN on query completion: recall loss is explicit, never silent.
    val counted = bands
      .withColumn("n", count(lit(1)).over(Window.partitionBy("band", "bval")))
      .observe(ObservedMetrics.nextName("graft_lsh_overflow"),
        sum(when(col("n") > maxBucket, lit(1L)).otherwise(lit(0L)))
          .as("dropped_rows"),
        max(col("n")).as("max_bucket"))
    // Same-bucket pairs via one groupBy + pair explosion instead of a
    // band self-join: the signature pipeline is computed once, not twice
    // (a self-join materializes both sides), and the shuffle key is the
    // band value — the standard LSH bucket-join at any scale; the cap
    // bounds the within-bucket quadratic explosion.
    // The candidate set is referenced three times by the verify stage
    // (pair list, both id sides); an eager checkpoint pins it so
    // the signature/banding pipeline runs exactly once. Candidates are
    // a capped, verified-later subset — O(pairs) ids, far smaller than
    // the corpus. The checkpoint action also materializes the observe
    // node above, so overflow logging fires here (checkpoint runs
    // through withAction → QueryExecutionListener).
    val cand = graft.tools.Checkpoints.pin(counted
      .filter(col("n").between(2, maxBucket))
      .groupBy("band", "bval")
      .agg(collect_list(col("doc_id")).as("ids"))
      .select(explode(col("ids")).as("a_id"), col("ids"))
      .select(col("a_id"), explode(col("ids")).as("b_id"))
      .filter(col("a_id") < col("b_id"))
      .distinct())
    // Verify stage: shingle sets are materialized ONLY for docs that
    // appear in some candidate pair (a small semi-joined subset), never
    // for the whole corpus; candidate ids broadcast, so the verify adds
    // no shuffle of document data. Sets are sorted xxhash64 longs and
    // the exact Jaccard is an allocation-free merge count — 8-byte
    // compares instead of shingle strings (collision stance: Scaladoc of
    // [[graft.functions.ShingleHashVec]]; the string-intersecting oracle
    // gates equality).
    val candIds = cand
      .select(explode(array(col("a_id"), col("b_id"))).as("doc_id"))
      .distinct()
    val candSh = raw
      .join(broadcast(candIds), "doc_id")
      .select(col("doc_id"), TextHashOps.shingleHashes(col("text"), 3).as("sh"))
    candSh.select(col("doc_id").as("a_id"), col("sh").as("sh_a"))
      .join(broadcast(cand), "a_id")
      .join(candSh.select(col("doc_id").as("b_id"), col("sh").as("sh_b")), "b_id")
      .select(col("a_id"), col("b_id"),
        round(TextHashOps.jaccardSorted(col("sh_a"), col("sh_b")), 6).as("jacc"))
      .filter(col("jacc") >= threshold)
  }

  /** Connected components over a near-duplicate pair set → the keeper
    * table training-data curation actually consumes: one row per
    * document with its cluster id (the component's minimum doc id) and
    * a keeper flag (true exactly for that minimum).
    *
    * Algorithm: alternating large-star/small-star contraction (Kiveris
    * et al., "Connected Components in MapReduce and Beyond", SoCC'14)
    * as plain DataFrame aggregates and joins. Each round rewires every
    * edge toward its neighborhood minimum — large-star re-points
    * larger neighbors at the local min, small-star collapses smaller
    * neighbors onto it — and both operations preserve connectivity
    * exactly, so the edge set contracts to a star forest rooted at
    * each component's minimum id in O(log n) ROUNDS, not O(component
    * diameter) sweeps. That distinction is the 100 TB story: the
    * previous min-label propagation needed diameter-many sweeps and
    * hit its iteration cap on the deep LSH chains of a large corpus
    * (r12 bench tail); a path graph of 10k nodes converges here in a
    * handful of rounds (DedupOpsSpec pins ≤ 2·log₂(n)).
    *
    * Convergence is exact, not heuristic: each star operation counts
    * its re-pointed edges in an `observe` metric that rides the
    * checkpoint materialization job, and the loop ends on the first
    * round where neither operation changed an edge — a fixpoint of
    * both stars is a star forest. If `maxIters` rounds pass without
    * that fixpoint the call FAILS (IllegalStateException) instead of
    * shipping unconverged clusters; at O(log n) rounds the default cap
    * covers any graph that fits in storage.
    *
    * All data stays distributed: per-round state is the current edge
    * set (monotonically shrinking under dedup, never larger than the
    * input), eagerly checkpointed via [[graft.tools.Checkpoints.pin]]
    * so round plans stay shallow and, with a reliable checkpoint dir
    * configured, survive executor loss. The only driver-side values
    * are the per-round changed-edge counts (scalars).
    *
    * `pairs` must carry (a_id, b_id) unordered unique pairs (the output
    * contract of [[minhashPairs]] / [[ngramJaccardPairs]] /
    * [[embeddingPairs]]); `ids` the full universe of document ids so
    * singletons appear as their own cluster. */
  def nearDupClusters(pairs: DataFrame, ids: DataFrame, idCol: String,
      maxIters: Int = 64): DataFrame =
    nearDupClustersWithRounds(pairs, ids, idCol, maxIters)._1

  /** [[nearDupClusters]] plus the number of large/small-star rounds it
    * took — the O(log n) convergence bound is a tested contract
    * (DedupOpsSpec's deep-path fixture), not a comment. */
  private[graft] def nearDupClustersWithRounds(pairs: DataFrame,
      ids: DataFrame, idCol: String,
      maxIters: Int = 64): (DataFrame, Int) = {
    import org.apache.spark.storage.StorageLevel
    val spark = pairs.sparkSession
    // Materialize the pair pipeline ONCE before canonicalizing: the
    // LSH pipeline upstream is expensive and must not re-evaluate.
    val base = pairs.select(col("a_id").as("u"), col("b_id").as("v"))
      .filter(col("u") =!= col("v"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val edgeCount = base.count()
    // Scale-adaptive layout: a tiny active graph iterates in single-task
    // jobs (per-iteration cost is pure scheduling otherwise); a
    // web-scale graph spreads over the cluster's parallelism.
    val p = math.max(1L, math.min(
      spark.sparkContext.defaultParallelism.toLong,
      edgeCount / 500000L + 1L)).toInt
    // Data-adaptive join strategy for the per-round star joins (r18,
    // guide §3.1): each star joins the edge set to its per-node min
    // table `m` (≤ 2·|E| rows of two ids) — after the aggregate the
    // planner has no stats and plans a SortMergeJoin per star (two
    // exchanges + two sorts × 2 stars × rounds). The edge count is
    // already measured above, so declare the broadcast exactly when
    // the min table provably fits (≤2M edges → ≤4M (long, long) rows,
    // tens of MB). A web-scale graph keeps the shuffle joins — the
    // same AQE-style measured-size decision, not a local-mode tune.
    val bcastMins = edgeCount <= 2000000L
    def maybeBcast(df: DataFrame): DataFrame =
      if (bcastMins) broadcast(df) else df
    // Pin each round's edge set and read its changed-edge count from an
    // `observe` metric — the metric fires during the checkpoint's own
    // materialization (pin runs through withAction), so convergence
    // costs ONE Spark job per star, no separate aggregate job. The
    // repartition keys the dedup aggregate AND sets the round's
    // partition count in one exchange.
    def pinStar(df: DataFrame): (DataFrame, Long) = {
      val obs = org.apache.spark.sql.Observation(
        graft.tools.ObservedMetrics.nextName("graft_cc_chg"))
      val ckpt = graft.tools.Checkpoints.pin(df
        .observe(obs,
          coalesce(sum(col("__chg").cast("long")), lit(0L)).as("c"))
        .repartition(p, col("x"), col("y"))
        .dropDuplicates("x", "y")
        .select("x", "y"))
      (ckpt, obs.get("c").asInstanceOf[Long])
    }
    // Large-star: every node u re-points its LARGER neighbors at
    // m(u) = min(neighborhood ∪ {u}). Emitted edges stay canonical
    // (m ≤ u < v ⇒ x = m, y = v); an edge changed iff m < u.
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.select(col("x").as("nu"), col("y").as("nv"))
        .unionByName(e.select(col("y").as("nu"), col("x").as("nv")))
      val m = sym.groupBy("nu").agg(min("nv").as("mn"))
        .select(col("nu"), least(col("nu"), col("mn")).as("m"))
      sym.join(maybeBcast(m), "nu")
        .filter(col("nv") > col("nu"))
        .select(col("m").as("x"), col("nv").as("y"),
          (col("m") < col("nu")).cast("int").as("__chg"))
    }
    // Small-star: every node u collapses its SMALLER neighbors onto
    // m(u) = min of them; u itself re-points at m(u). Canonical form
    // (x, y) with x < y orients each edge big→small for free (u = y).
    // Changed iff the neighbor wasn't already m. Fixpoint ⇔ every node
    // has at most one smaller neighbor ⇔ the edges form a forest of
    // stars rooted at component minima.
    def smallStar(e: DataFrame): DataFrame = {
      val m = e.groupBy(col("y").as("nu")).agg(min("x").as("m"))
      e.select(col("y").as("nu"), col("x").as("nv"))
        .join(maybeBcast(m), "nu")
        .select(col("m").as("x"),
          when(col("nv") === col("m"), col("nu")).otherwise(col("nv"))
            .as("y"),
          (col("nv") =!= col("m")).cast("int").as("__chg"))
    }
    var edges = graft.tools.Checkpoints.pin(base
      .select(least(col("u"), col("v")).as("x"),
        greatest(col("u"), col("v")).as("y"))
      .repartition(p, col("x"), col("y"))
      .dropDuplicates("x", "y"))
    base.unpersist(blocking = false)
    var iter = 0
    var converged = edgeCount == 0L
    while (iter < maxIters && !converged) {
      val (afterLarge, chgL) = pinStar(largeStar(edges))
      val (afterSmall, chgS) = pinStar(smallStar(afterLarge))
      edges = afterSmall
      converged = chgL == 0L && chgS == 0L
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"nearDupClusters did not reach the star-forest fixpoint in " +
          s"$maxIters large/small-star rounds — at O(log n) rounds " +
          "this indicates ids outside a total order or a bug, not a " +
          "deep graph; refusing to ship unconverged clusters")
    // At the fixpoint the edges are (root = component min, member):
    // each non-root appears exactly once as y. Re-attach the full
    // universe: singletons cluster as themselves. The id column keeps
    // the CALLER's name (`idCol`), so downstream joins (funnelReport's
    // clusterKeepers contract) need no rename.
    val out = ids.select(col(idCol).as("graft_cc_id"))
      .join(maybeBcast(
          edges.select(col("y").as("graft_cc_id"), col("x").as("lbl"))),
        Seq("graft_cc_id"), "left")
      .select(col("graft_cc_id").as(idCol),
        coalesce(col("lbl"), col("graft_cc_id")).as("cluster_id"))
      .withColumn("keeper", col(idCol) === col("cluster_id"))
      .orderBy(idCol)
    (out, iter)
  }

  /** The near-dup cluster-keeper table of a test-corpus dir (Jaccard
    * threshold 0.5), cached per (session, corpus) like the ANN indexes:
    * the LSH + connected-components chain is the heaviest plan in the
    * engine, and both `q_dedup_clusters` and `q_curation_funnel`
    * consume exactly this table — the cache pays the chain once per
    * session instead of once per consumer. Evicts on [[IndexCache]]'s
    * session-end hook; executor storage is released then. */
  def clusterKeepersForDir(spark: SparkSession, sfDir: String): DataFrame =
    keeperCache.get(spark, sfDir)

  private val keeperCache = new IndexCache[DataFrame](
    (spark, sfDir) => {
      val docs = Tables.documents(spark, sfDir)
      nearDupClusters(nearDupEdges(docs, "doc_id", "text", 0.5),
        docs.select("doc_id"), "doc_id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    },
    _.unpersist(blocking = false))

  /** 64-bit SimHash (two int32 halves packed in BIGINTs, cross-engine
    * bit-op-safe): per distinct token, bits come from the first 16 hex
    * chars of md5(token); each bit accumulates ±term-frequency; the
    * fingerprint sets bits with positive sums. */
  def simhash(spark: SparkSession, sfDir: String): DataFrame =
    simhash(Tables.documents(spark, sfDir), "doc_id", "text")

  /** Library form: SimHash fingerprints of any corpus DataFrame.
    *
    * Plan shape (the r01 verdict's fix): ONE aggregation with 64
    * conditional sums. The previous spelling joined every (doc, token)
    * row against broadcast(range(64)) — a 64× row/shuffle inflation that
    * cost 35.9 s in the driver bench. Here the token stream stays narrow:
    * md5's first 16 hex chars parse into two 32-bit words, and a single
    * codegen'd hash-aggregate accumulates all 64 per-bit ±1 sums
    * (±1 per token occurrence ≡ ±term-frequency per distinct token, so
    * the oracle's per-distinct-token ±w sums agree exactly). Map-side
    * partial aggregation collapses each partition to one 64-long row per
    * doc before any exchange; with the loader's doc_id hash distribution
    * the exchange vanishes entirely.
    */
  def simhash(corpus: DataFrame, idCol: String, textCol: String): DataFrame = {
    // bit b of the 64-bit big-endian integer parsed from md5 hex chars
    // 1..16: chars 1-8 → bits 32..63 ("hi"), chars 9-16 → bits 0..31
    // ("lo") — same bit numbering as the oracle's nibble arithmetic.
    val tok = corpus
      .select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("tok"))
      .withColumn("h", md5(col("tok")))
      .withColumn("hi", conv(substring(col("h"), 1, 8), 16, 10).cast("long"))
      .withColumn("lo", conv(substring(col("h"), 9, 8), 16, 10).cast("long"))
    val bitSums = (0 until 64).map { b =>
      val word = if (b < 32) col("lo") else col("hi")
      val bit = if (b < 32) b else b - 32
      sum(when(shiftright(word, bit).bitwiseAND(lit(1L)) === lit(1L), 1L)
        .otherwise(-1L)).as(s"v$b")
    }
    def pack(range: Range, shiftBase: Int): Column =
      range.map(b => when(col(s"v$b") > 0,
        lit(1L << (b - shiftBase))).otherwise(lit(0L))).reduce(_ + _)
    tok.groupBy("doc_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        pack(32 until 64, 32).as("sh_hi"),
        pack(0 until 32, 0).as("sh_lo"))
      .orderBy("doc_id")
  }

  /** Cosine of two float-array embeddings, computed in double with
    * left-to-right accumulation (same order both engines) by the
    * codegen'd [[graft.functions.VectorDot]] expression. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorOps.cosine(a, b)

  // Block-grid side for the exact pair join: B(B+1)/2 block-pair tasks
  // should cover the cluster's parallelism without inflating replication
  // (each vector ships B+1 copies), so B ≈ √(2·parallelism), floored at
  // 8 (local[32] → 8 → 36 tasks, 9× replication; a 1000-executor
  // cluster derives a proportionally larger grid).
  private def pairBlocks(spark: SparkSession): Int =
    math.max(8, math.ceil(math.sqrt(
      2.0 * spark.sparkContext.defaultParallelism)).toInt)

  /** Library form: embedding-cosine near-duplicate pairs of any
    * DataFrame with a numeric-array embedding column. Exact.
    *
    * Plan shape: a distributed block-matrix product, not a nested-loop
    * all-pairs join. Vectors hash into B blocks; each vector is
    * replicated to every block-pair key it participates in (B+1 copies),
    * and the pair space materializes through a hash EQUI-join on the
    * (bi, bj) key — O(n²) dot products are unavoidable for exact dense
    * similarity (no sub-quadratic exact method exists at these
    * dimensions), but they distribute evenly over B(B+1)/2 independent
    * tasks with no BroadcastNestedLoopJoin/CartesianProduct anywhere in
    * the plan, which is what survives a 1000-executor scale-out.
    *
    * Why not LSH-bucket-then-verify: measured on this corpus the
    * qualifying pairs sit at cos 0.45–0.60 against a ~0.35 background —
    * hyperplane-LSH parameters reaching recall 1 (b=2 bits, T=16 tables)
    * admit 98.6% of ALL pairs as candidates, i.e. all-pairs with extra
    * shuffles. Recall-lossy search belongs to [[SimilarityOps.annTopK]];
    * an exact threshold join on dense vectors is honestly quadratic and
    * the job is to distribute it, which this shape does. */
  def embeddingPairs(vectors: DataFrame, idCol: String, embCol: String,
      threshold: Double): DataFrame =
    embeddingPairsUnordered(vectors, idCol, embCol, threshold)
      .orderBy("a_id", "b_id")

  /** [[embeddingPairs]] without the presentation sort — for consumers
    * like [[SimilarityOps.knnJoin]] that post-process the pair set. */
  def embeddingPairsUnordered(vectors: DataFrame, idCol: String,
      embCol: String, threshold: Double): DataFrame = {
    import graft.functions.VectorOps
    val B = pairBlocks(vectors.sparkSession)
    val e = vectors.select(col(idCol).as("vec_id"),
        col(embCol).cast("array<double>").as("e"))
      .withColumn("nrm", VectorOps.norm(col("e")))
      .withColumn("blk", pmod(hash(col("vec_id")), lit(B)))
    // Left role: block b serves block-pair keys (b, j) for j ≥ b.
    // Right role: block b serves keys (i, b) for i ≤ b. Key encoded as
    // bi*B+bj. The diagonal key (b,b) yields within-block pairs (both
    // orders; a_id<b_id keeps one); off-diagonal pairs appear exactly
    // once, normalized to id order below.
    val lhs = e.select(col("vec_id").as("x_id"), col("e").as("ex"),
        col("nrm").as("nx"), col("blk"),
        explode(sequence(col("blk"), lit(B - 1))).as("j"))
      .select(col("x_id"), col("ex"), col("nx"),
        (col("blk") * B + col("j")).as("bp"))
    val rhs = e.select(col("vec_id").as("y_id"), col("e").as("ey"),
        col("nrm").as("ny"), col("blk"),
        explode(sequence(lit(0), col("blk"))).as("i"))
      .select(col("y_id"), col("ey"), col("ny"),
        (col("i") * B + col("blk")).as("bp"))
    lhs.join(rhs, "bp")
      // Diagonal keys (bi == bj ⇔ bp is a multiple of B+1) match both
      // orders of a within-block pair — keep id order there so each
      // unordered pair survives exactly once and no distinct() shuffle
      // (or double dot product) is needed. Off-diagonal keys match each
      // pair once already, in arbitrary id order.
      .filter(pmod(col("bp"), lit(B + 1)) =!= 0 || col("x_id") < col("y_id"))
      // Zero-norm guard: cos of a zero vector is 0/0 = NaN, which
      // Spark's nan-safe ordering would pass through >= threshold while
      // SQL engines (and the DuckDB oracle) exclude it — a zero
      // embedding must pair with nothing, in both engines.
      .filter(col("nx") > 0 && col("ny") > 0)
      .withColumn("cos",
        VectorOps.dot(col("ex"), col("ey")) / (col("nx") * col("ny")))
      .filter(col("cos") >= threshold)
      .select(least(col("x_id"), col("y_id")).as("a_id"),
        greatest(col("x_id"), col("y_id")).as("b_id"),
        round(col("cos"), 6).as("cos_sim"))
  }

  /** Semantic dedup, SemDeDup-style (cluster-then-verify; Abbas et al.
    * 2023, PAPERS.md): cluster the embedding space with the engine's
    * deterministic Lloyd quantizer ([[IvfIndex.build]] — hash-seeded
    * starts, DECIMAL-exact means, bit-reproducible), then mine exact
    * cosine-≥threshold pairs WITHIN clusters only and drop every vector
    * with a smaller-id in-cluster neighbor (the family's keep-lowest-id
    * stance). Returns `(vec_id, cell, keeper)` over the full input.
    *
    * The trade vs [[embeddingPairs]] (exact, block-matrix, honestly
    * quadratic): pair work drops from n²/2 to Σ_c n_c²/2 ≈ n²/(2k) —
    * at the SemDeDup operating point (k ∝ √n, near-identical
    * thresholds) that is an O(√n)-fold cut, the difference between
    * infeasible and routine at 10⁹ vectors — in exchange for missing
    * cross-cluster pairs. Recall is highest where semantic dedup is
    * actually run (near-identical pairs co-cluster almost surely;
    * DedupOpsSpec measures the corpus's recall vs the exact pair set
    * and pins precision exact-by-construction). The within-cell join
    * is a cell-key equi-join — no cartesian, AQE splits hot cells the
    * same way the kNN stage-1 join does (PlanSpec "hot-cell skew").
    *
    * `nClusters = 0` → the quantizer's auto policy (4·√n). Smaller k
    * raises recall and cost together; k = 1 degenerates to the exact
    * all-pairs semantics.
    *
    * Caching: the corpus assignment persists (MEMORY_AND_DISK) so its
    * three plan references share one computation; Spark's cache manager
    * dedupes identical calls onto one entry (the clusterKeepersForDir
    * stance). For a SCOPED lifecycle — amortize the quantizer across
    * many probes, then release without a session-wide `clearCache()` —
    * use [[semanticIndex]]/[[SemanticIndex.close]] (the r10 ADVICE
    * release path); the per-corpus cached form is
    * [[semanticKeepersForDir]]. */
  def semanticDedup(vectors: DataFrame, idCol: String, embCol: String,
      threshold: Double = 0.45, nClusters: Int = 0): DataFrame =
    semanticIndex(vectors, idCol, embCol, nClusters).keepers(threshold)

  /** The amortizable half of [[semanticDedup]]: the deterministic Lloyd
    * quantizer build plus the corpus cell assignment, materialized and
    * persisted ONCE. [[SemanticIndex.keepers]] then prices only the
    * within-cell pair mining — the production shape when one corpus is
    * deduped at several thresholds, or re-probed across a session
    * (mirrors how q_sim_ivf amortizes via `IvfIndex.forDir`).
    *
    * Resource scope: the assignment is persisted eagerly (one
    * materializing pass); the build-time centroid table is unpersisted
    * here — only the assignment is referenced downstream (r10 ADVICE).
    * Release with [[SemanticIndex.close]], or let the per-corpus cache
    * ([[semanticKeepersForDir]]) evict on session end. */
  def semanticIndex(vectors: DataFrame, idCol: String, embCol: String,
      nClusters: Int = 0): SemanticIndex = {
    import graft.functions.VectorOps
    val idx = IvfIndex.build(vectors, idCol, embCol, k = nClusters,
      persist = false, sketch = false)
    // The assignment (scan + O(k·d) BestCell argmax per row) feeds THREE
    // plan references (both pair-join sides and the keeper join) —
    // persist it so one pass serves all three, the nearDupClusters
    // stance for double-referenced inputs.
    val assigned = idx.cells
      .select(col("vec_id"), col("embedding"), col("cell"))
      .withColumn("nrm", VectorOps.norm(col("embedding")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    assigned.count()
    // only `assigned` is referenced from here on; dropping the centroid
    // table's storage now (instead of at clearCache) is the scoped
    // release of the build working set. A later assigned-partition
    // eviction recomputes through the (unpersisted) centroid lineage —
    // slower, never wrong.
    idx.centroids.unpersist(blocking = false)
    SemanticIndex(assigned)
  }

  /** A materialized semantic-dedup corpus assignment (vec_id, embedding,
    * cell, nrm) — build once, probe at any threshold, release scoped. */
  final case class SemanticIndex(assigned: DataFrame) {
    /** (vec_id, cell, keeper) at `threshold` — [[semanticDedup]]'s
      * result, priced WITHOUT the quantizer build. */
    def keepers(threshold: Double): DataFrame =
      semanticKeepers(assigned, threshold)
    /** Unpersist the assignment (the scoped alternative to
      * `spark.catalog.clearCache()`). */
    def close(): Unit = assigned.unpersist(blocking = false)
  }

  // Evicts on invalidate() and on session end (see IndexCache). Keyed by
  // corpus dir; builds over the PLANTED corpus (the q_dedup_semantic
  // fixture) so warm probes hash-match the cold query exactly.
  private val semCache = new IndexCache[SemanticIndex](
    (spark, sfDir) => semanticIndex(
      plantedEmbeddings(spark, sfDir), "vec_id", "embedding"),
    _.close())

  /** Cached [[semanticIndex]] keepers over a test-data corpus dir's
    * planted fixture — the warm twin of q_dedup_semantic. */
  def semanticKeepersForDir(spark: org.apache.spark.sql.SparkSession,
      sfDir: String, threshold: Double): DataFrame =
    semCache.get(spark, sfDir).keepers(threshold)

  /** The q_dedup_semantic fixture: the embeddings corpus plus a
    * 0.5-scaled copy of every 20th vector (cos 1.0 with its original —
    * the scaling is a power of two, so BestCell scores scale exactly and
    * each copy provably co-clusters with its original). */
  private def plantedEmbeddings(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): DataFrame = {
    val vecs = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val planted = vecs.filter(col("vec_id") % 20 === 0)
      .select((col("vec_id") + 100000000L).as("vec_id"),
        transform(col("embedding"), x => x * lit(0.5f)).as("embedding"))
    vecs.unionByName(planted)
  }

  private def semanticKeepers(assigned: DataFrame,
      threshold: Double): DataFrame = {
    import graft.functions.VectorOps
    val lhs = assigned.select(col("cell"), col("vec_id").as("a_id"),
      col("embedding").as("ea"), col("nrm").as("na"))
    val rhs = assigned.select(col("cell"), col("vec_id").as("b_id"),
      col("embedding").as("eb"), col("nrm").as("nb"))
    val dropped = lhs.join(rhs, Seq("cell"))
      .filter(col("a_id") < col("b_id"))
      // Zero-norm guard: a zero embedding yields cos = 0/0 = NaN, and
      // Spark's nan-safe ordering ranks NaN ABOVE every threshold — one
      // zero vector would silently mark its whole cell as duplicates.
      // SQL engines (and the oracle) exclude NaN from >=; do the same.
      .filter(col("na") > 0 && col("nb") > 0)
      .filter(VectorOps.dot(col("ea"), col("eb")) /
        (col("na") * col("nb")) >= threshold)
      .select(col("b_id").as("vec_id")).distinct()
    assigned.join(dropped.withColumn("__gs_d", lit(true)),
        Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"), col("__gs_d").isNull.as("keeper"))
  }

  /** Library form: EXACT n-gram (shingle) Jaccard near-duplicate pairs
    * via the same distributed block-matrix shape as [[embeddingPairs]].
    * Complements [[minhashPairs]]: LSH recall is probabilistic and
    * degrades at low thresholds (a j=0.3 pair has a 22% miss chance at
    * 16×2 banding), while this path is exact at ANY threshold — the
    * trade is quadratic (but evenly distributed, equi-join, no
    * nested-loop) pair compute.
    *
    * Cost controls: shingle sets are computed once per doc and carried
    * as xxhash64 LONGS, so the per-pair intersection compares 8-byte
    * values instead of strings (64-bit collisions among a corpus's
    * distinct shingles are ~1e-9 probable and deterministic — the
    * DuckDB oracle, which intersects the raw strings, hash-gates that
    * the values agree). `withinCol` restricts pairing to equal values
    * of a partition column (e.g. language) — the natural blocking for
    * near-dup mining, and a |parts|-fold pair-count cut. */
  /** EXACT word-set similarity self-join by PREFIX FILTERING (Bayardo
    * et al. WWW'07 "Scaling Up All Pairs" / PPJoin's prefix
    * principle): all pairs with token-set Jaccard ≥ `threshold`,
    * without either the O(n²) nested loop OR [[ngramJaccardPairs]]'s
    * B-blocked pair space. Every doc's distinct tokens are ordered by
    * a GLOBAL rarest-first key (document frequency asc, token asc —
    * any shared total order preserves the guarantee); if
    * J(x,y) ≥ t, the sets must share a token within each one's first
    * |x| − ⌈t·|x|⌉ + 1 tokens, so candidates come from an equi-join
    * on PREFIX tokens only and the filter is LOSSLESS — exactness is
    * restored by verifying every candidate's true Jaccard.
    *
    * Scale shape: one explode + one token-keyed df count, one
    * per-doc bounded window (docs have bounded token counts — the
    * bm25 stance) to rank tokens rarest-first, a prefix-token
    * equi-join whose buckets are df(token)²-sized for PREFIX (rare)
    * tokens only, a distinct on candidate id-pairs, then two keyed
    * joins back to the token arrays for the exact verify. No
    * cartesian, no block replication; the candidate count collapses
    * toward the true-pair count as t rises. `withinCol` blocks
    * pairing (language), cutting both the df table and the pair
    * space. */
  def setSimJoin(corpus: DataFrame, idCol: String, textCol: String,
      threshold: Double,
      withinCol: Option[String] = None): DataFrame = {
    import graft.functions.TextHashOps
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0, 1]; got $threshold")
    // tokens ride as SORTED xxhash64 longs (`th`): the exact verify
    // below is then a native merge count over 8-byte values instead of
    // a per-pair UTF8String hash set (the ngramJaccardPairs stance —
    // a PAIR of distinct tokens collides with ~1e-19 probability, and
    // across a whole corpus vocabulary the birthday bound is
    // ~v²/2⁶⁵ — a few percent chance of ONE merged token pair
    // somewhere at v≈10⁹ distinct tokens, deterministic either way;
    // the DuckDB oracle, which intersects the raw strings, hash-gates
    // that the values agree at test scale). Pin REJECTED by
    // measurement: the token table feeds three plan references (the
    // exploded prefix derivation and both verify sides), but
    // localCheckpoint materialization measured slower than the
    // duplicated split+distinct subtrees at this size
    // (OPTIMIZATION_r17.md change 2) — left declarative.
    TextHashOps.register(corpus.sparkSession)
    val toks = (
      corpus.select(col(idCol).as("doc_id"),
        array_distinct(split(col(textCol), " ")).as("tk"),
        withinCol.map(col).getOrElse(lit(0)).as("part"))
      .withColumn("th", array_sort(array_distinct(
        transform(col("tk"), t => xxhash64(t)))))
      // set size measured in the SAME (hash) domain the prefix ranks,
      // the length/positional filters, and the verify all use — one
      // consistent universe end to end
      .withColumn("sz", size(col("th")))
      .drop("tk"))
    val ex = toks.select(col("doc_id"), col("part"), col("sz"),
      explode(col("th")).as("token"))
    val dfTab = ex.groupBy("part", "token")
      .agg(count(lit(1)).as("df"))
    // rank each doc's tokens rarest-first; keep the lossless prefix
    // (rn rides along for the positional filter below). Any shared
    // total order preserves the prefix guarantee — (df, hash) here.
    // Pin REJECTED by measurement: the prefix table feeds both sides
    // of the candidate self-join, but pinning it measured slower than
    // running the explode+df-join+window pipeline twice
    // (OPTIMIZATION_r17.md change 2) — left declarative.
    val wDoc = Window.partitionBy("doc_id").orderBy("df", "token")
    val prefix = (
      ex.join(dfTab, Seq("part", "token"))
      .withColumn("rn", row_number().over(wDoc))
      .filter(col("rn") <=
        col("sz") - ceil(lit(threshold) * col("sz")) + 1)
      .select(col("doc_id"), col("part"), col("token"), col("sz"),
        col("rn")))
    // PPJoin length filter: J ≥ t ⇒ |∩| ≥ t·|∪| ≥ t·max ⇒ the
    // shorter set is ≥ t·(the longer) — prunes candidates BEFORE the
    // distinct and the array-carrying verify joins, losslessly.
    // PPJoin POSITIONAL filter (Xiao et al. WWW'08): a token matched
    // at ranks (rnx, rny) bounds the overlap by
    // 1 + min(szx − rnx, szy − rny) (every later shared token sits
    // after it in BOTH rarest-first orders — the order is one global
    // key), while J ≥ t needs |∩| ≥ ⌈t/(1+t)·(szx+szy)⌉. Lossless for
    // candidate generation: a qualifying pair's FIRST shared token is
    // provably inside both prefixes (else too few shared slots remain)
    // and passes the bound — so dropping the failing occurrences keeps
    // ≥1 row per true pair. This prunes the raw matched-token stream
    // BEFORE the distinct, the join's dominant intermediate (measured
    // sf0.1: 19.9M raw rows → 2.5M distinct pairs without it).
    // spelled multiplied-out (u·(1+t) ≥ t·(szx+szy) − 1e-9) so a float
    // knife-edge can only WEAKEN the prune, never drop a true pair
    val ubound = (lit(1) + least(col("szx") - col("rnx"),
      col("szy") - col("rny"))).cast("double")
    val cand = prefix.select(col("doc_id").as("x_id"), col("part"),
        col("token"), col("sz").as("szx"), col("rn").as("rnx"))
      .join(prefix.select(col("doc_id").as("y_id"), col("part"),
        col("token"), col("sz").as("szy"), col("rn").as("rny")),
        Seq("part", "token"))
      .filter(col("x_id") < col("y_id") &&
        greatest(col("szx"), col("szy")).cast("double") * threshold <=
          least(col("szx"), col("szy")).cast("double") &&
        ubound * lit(1.0 + threshold) >=
          lit(threshold) * (col("szx") + col("szy")).cast("double") -
            lit(1e-9))
      .select("x_id", "y_id").distinct()
    // exact verify: native merge count over the sorted hash arrays
    // (SortedIntersectCount) — same |∩| as the string-set intersect,
    // computed in ~n 8-byte compares per pair instead of a per-pair
    // UTF8String hash set build
    val a = toks.select(col("doc_id").as("x_id"), col("th").as("tha"),
      col("sz").as("sza"))
    val b = toks.select(col("doc_id").as("y_id"), col("th").as("thb"),
      col("sz").as("szb"))
    val inter = TextHashOps.sortedIntersectCount(col("tha"), col("thb"))
      .cast("double")
    val jacc = round(inter / (col("sza") + col("szb") - inter), 6)
    cand.join(a, "x_id").join(b, "y_id")
      .withColumn("jacc", jacc)
      .filter(col("jacc") >= threshold)
      .select(col("x_id").as("a_id"), col("y_id").as("b_id"),
        col("jacc"))
      .orderBy("a_id", "b_id")
  }

  def ngramJaccardPairs(corpus: DataFrame, idCol: String, textCol: String,
      threshold: Double, k: Int = 3,
      withinCol: Option[String] = None): DataFrame = {
    import graft.functions.TextHashOps
    val B = pairBlocks(corpus.sparkSession)
    val e = corpus.select(col(idCol).as("doc_id"),
        TextHashOps.shingleHashes(col(textCol), k).as("sh"),
        withinCol.map(col).getOrElse(lit(0)).as("part"))
      .withColumn("blk", pmod(hash(col("doc_id")), lit(B)))
    val lhs = e.select(col("doc_id").as("x_id"), col("sh").as("shx"),
        col("part"), col("blk"),
        explode(sequence(col("blk"), lit(B - 1))).as("j"))
      .select(col("x_id"), col("shx"), col("part"),
        (col("blk") * B + col("j")).as("bp"))
    val rhs = e.select(col("doc_id").as("y_id"), col("sh").as("shy"),
        col("part"), col("blk"),
        explode(sequence(lit(0), col("blk"))).as("i"))
      .select(col("y_id"), col("shy"), col("part"),
        (col("i") * B + col("blk")).as("bp"))
    lhs.join(rhs, Seq("part", "bp"))
      .filter(pmod(col("bp"), lit(B + 1)) =!= 0 || col("x_id") < col("y_id"))
      .withColumn("jacc",
        round(TextHashOps.jaccardSorted(col("shx"), col("shy")), 6))
      .filter(col("jacc") >= threshold)
      .select(least(col("x_id"), col("y_id")).as("a_id"),
        greatest(col("x_id"), col("y_id")).as("b_id"), col("jacc"))
      .orderBy("a_id", "b_id")
  }

  /** Asymmetric shingle CONTAINMENT pairs: |A∩B| / |A| ≥ threshold —
    * the quote/subset detector Jaccard misses (a short document fully
    * embedded in a long one has containment 1.0 but Jaccard near the
    * length ratio). Same distributed block-matrix equi-join shape as
    * [[ngramJaccardPairs]]; each unordered block pair is intersected
    * ONCE (native merge count), pre-pruned by `inter ≥ t·min(|A|,|B|)`
    * (necessary for either direction to pass), then exploded into its
    * two directed rows. Output (src_id, dst_id, containment): fraction
    * of src's shingles that dst also contains. */
  def containmentPairs(corpus: DataFrame, idCol: String, textCol: String,
      threshold: Double, k: Int = 3,
      withinCol: Option[String] = None): DataFrame = {
    import graft.functions.TextHashOps
    val B = pairBlocks(corpus.sparkSession)
    val e = corpus.select(col(idCol).as("doc_id"),
        TextHashOps.shingleHashes(col(textCol), k).as("sh"),
        withinCol.map(col).getOrElse(lit(0)).as("part"))
      .withColumn("blk", pmod(hash(col("doc_id")), lit(B)))
    val lhs = e.select(col("doc_id").as("x_id"), col("sh").as("shx"),
        col("part"), col("blk"),
        explode(sequence(col("blk"), lit(B - 1))).as("j"))
      .select(col("x_id"), col("shx"), col("part"),
        (col("blk") * B + col("j")).as("bp"))
    val rhs = e.select(col("doc_id").as("y_id"), col("sh").as("shy"),
        col("part"), col("blk"),
        explode(sequence(lit(0), col("blk"))).as("i"))
      .select(col("y_id"), col("shy"), col("part"),
        (col("i") * B + col("blk")).as("bp"))
    val nx = size(col("shx")).cast("double")
    val ny = size(col("shy")).cast("double")
    lhs.join(rhs, Seq("part", "bp"))
      .filter(pmod(col("bp"), lit(B + 1)) =!= 0 || col("x_id") < col("y_id"))
      .withColumn("inter",
        TextHashOps.sortedIntersectCount(col("shx"), col("shy"))
          .cast("double"))
      // margin: the final filter compares the 6-dp ROUNDED ratio, so a
      // raw value up to 5e-7 under the threshold can still round in
      .filter(col("inter") >= lit(threshold - 1e-6) * least(nx, ny))
      .select(explode(array(
        struct(col("x_id").as("src_id"), col("y_id").as("dst_id"),
          round(col("inter") / nx, 6).as("containment")),
        struct(col("y_id").as("src_id"), col("x_id").as("dst_id"),
          round(col("inter") / ny, 6).as("containment")))).as("r"))
      .select(col("r.src_id"), col("r.dst_id"), col("r.containment"))
      .filter(col("containment") >= threshold)
      .orderBy("src_id", "dst_id")
  }

  /** Substring-level EXACT dedup — repeated ≥`k`-token passages across
    * (and within) otherwise-distinct documents: the second half of the
    * Lee et al. dedup recipe (PAPERS.md), which whole-document MinHash
    * ([[minhashPairs]]) cannot see. Their ExactSubstr pass builds a
    * suffix array over the concatenated corpus; the distributed
    * equivalent here is a sorted k-gram POSITION table:
    *
    *   1. every document emits its (pos, xxhash64(k-token gram)) rows —
    *      one narrow pass, no shuffle;
    *   2. one hash aggregation counts each gram's occurrences
    *      corpus-wide (map-side partial combine, the classic
    *      wordcount shape — a million-copy boilerplate gram is still
    *      one row per partition before the exchange); grams at
    *      ≥ `minOccurrences` locations are DUPLICATED;
    *   3. the position table equi-joins the duplicated-gram keys (the
    *      gram shuffle is reused across the two branches) and each
    *      document's duplicated positions merge into MAXIMAL passages
    *      with one gaps-and-islands window per doc (pos − row_number
    *      is constant exactly on consecutive runs).
    *
    * Every exchange carries O(corpus tokens) rows of a few longs —
    * growth is linear in corpus size (measured in ScaleProbe), never
    * pair-quadratic; the suffix array's global sort becomes the gram
    * hash shuffle, which is how the pass survives 100 TB.
    *
    * Semantics note (the standard k-gram approximation): a reported
    * passage is a maximal token span ALL of whose k-grams occur
    * elsewhere; distinct overlapping partners can chain into one span,
    * so a passage is a union of repeats, not necessarily one
    * contiguous repeat — conservative in the right direction for
    * scrubbing (Lee et al. cut every such span). Gram identity rides
    * xxhash64 (8-byte keys, ~1e-9 collision stance as everywhere);
    * the string-grouping DuckDB oracle gates exactness.
    *
    * Returns (doc_id, start_pos, end_pos, n_tokens, passage), token
    * positions 0-based inclusive, ordered (doc_id, start_pos). */
  def duplicatePassages(corpus: DataFrame, idCol: String, textCol: String,
      k: Int = 8, minOccurrences: Int = 2): DataFrame = {
    val (base, dupPos) = dupGramPositions(corpus, idCol, textCol, k,
      minOccurrences)
    // gaps-and-islands per document: consecutive duplicated positions
    // share (pos - row_number), so one window + one aggregate yields
    // the maximal passages.
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val passages = dupPos
      .withColumn("isl", col("pos") - row_number().over(w))
      .groupBy("doc_id", "isl")
      .agg(min(col("pos")).as("start_pos"),
        (max(col("pos")) + lit(k - 1)).as("end_pos"))
    passages.join(base, "doc_id")
      .select(col("doc_id"), col("start_pos"), col("end_pos"),
        (col("end_pos") - col("start_pos") + 1).as("n_tokens"),
        concat_ws(" ", slice(col("toks"), col("start_pos") + 1,
          col("end_pos") - col("start_pos") + 1)).as("passage"))
      .orderBy("doc_id", "start_pos")
  }

  /** Scrub the [[duplicatePassages]] spans OUT of the corpus — the
    * apply side of the ExactSubstr pass. Default (`keepFirst = false`,
    * the Lee et al. conservative trade): tokens covered by any
    * duplicated ≥`k`-gram are removed from EVERY occurrence; documents
    * left with zero tokens (fully duplicated) drop from the output
    * entirely. `keepFirst = true` is the production-mix variant
    * (keeping one copy is the documented open problem in Lee et al.):
    * each duplicated gram is OWNED by its minimal (doc_id, pos)
    * occurrence — a deterministic owner needing only a min-struct in
    * the same gram aggregate — and only non-owner occurrences are
    * scrubbed, so exactly one copy of a duplicated passage survives
    * (the one in the lowest doc id, earliest position).
    *
    * Same linear shape as the mining pass plus one anti-join of token
    * positions against covered positions and one per-doc aggregate
    * (order restored by sorting the (pos, token) structs — no
    * collect_list ordering assumption).
    *
    * Returns (doc_id, n_kept, scrubbed), ordered by doc_id. */
  def scrubDuplicatePassages(corpus: DataFrame, idCol: String,
      textCol: String, k: Int = 8, minOccurrences: Int = 2,
      keepFirst: Boolean = false): DataFrame = {
    val (base, dupPos) = dupGramPositions(corpus, idCol, textCol, k,
      minOccurrences, excludeOwners = keepFirst)
    val covered = dupPos
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit(k - 1))).as("tp"))
      .distinct()
    val toks = base.select(col("doc_id"),
      posexplode(col("toks")).as(Seq("tp", "tok")))
    toks.join(covered, Seq("doc_id", "tp"), "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("tp"), col("tok")))),
          s => s.getField("tok"))).as("scrubbed"))
      .orderBy("doc_id")
  }

  /** Shared stage of the substring-dedup family: the k-gram position
    * table and its duplicated positions. Returns (base = (doc_id,
    * toks), dupPos = (doc_id, pos) of grams at ≥ minOccurrences
    * corpus-wide locations). The HOF keeps the token array inside one
    * row while hashing (no fat explode); only (doc_id, pos, 8-byte gh)
    * rows leave the stage, and the duplicated-gram count aggregate is
    * map-side combined. `excludeOwners` additionally computes each
    * gram's owner — the lexicographic-minimal (doc_id, pos) occurrence,
    * a min-struct riding the SAME map-side-combined aggregate — and
    * filters owner occurrences out of dupPos (the keep-first scrub). */
  private def dupGramPositions(corpus: DataFrame, idCol: String,
      textCol: String, k: Int, minOccurrences: Int,
      excludeOwners: Boolean = false): (DataFrame, DataFrame) = {
    val base = corpus.select(col(idCol).as("doc_id"),
      split(col(textCol), " ").as("toks"))
    val grams = base
      .filter(size(col("toks")) >= k)
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(0), size(col("toks")) - k),
        i => xxhash64(concat_ws(" ", slice(col("toks"), i + 1, lit(k))))))
        .as(Seq("pos", "gh")))
    val dupPos = if (!excludeOwners) {
      val dup = grams.groupBy("gh").agg(count(lit(1)).as("n"))
        .filter(col("n") >= minOccurrences)
        .select("gh")
      grams.join(dup, "gh").select("doc_id", "pos")
    } else {
      val dup = grams.groupBy("gh")
        .agg(count(lit(1)).as("n"),
          min(struct(col("doc_id"), col("pos"))).as("own"))
        .filter(col("n") >= minOccurrences)
        .select("gh", "own")
      grams.join(dup, "gh")
        .filter(col("doc_id") =!= col("own.doc_id") ||
          col("pos") =!= col("own.pos"))
        .select("doc_id", "pos")
    }
    (base, dupPos)
  }

  val all: Seq[Query] = Seq(
    // Exact dedup: hash-groupBy on normalized text. One shuffle on the
    // 32-char digest regardless of document size.
    Query(
      "q_doc_dedup",
      Some("""SELECT md5(lower(trim(text))) AS h, count(*) AS n_dups,
                     min(doc_id) AS keeper
              FROM documents GROUP BY h ORDER BY h"""),
      (s, d) =>
        Tables.documents(s, d)
          .groupBy(md5(lower(trim(col("text")))).as("h"))
          .agg(count(lit(1)).as("n_dups"), min(col("doc_id")).as("keeper"))
          .orderBy("h")),

    // Substring-level exact dedup: maximal repeated ≥8-token passages
    // (Lee et al. ExactSubstr, distributed as a sorted k-gram position
    // table). The oracle groups the raw gram strings by brute force.
    Query(
      "q_substring_dedup",
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                         FROM documents),
              g AS (SELECT doc_id,
                           CAST(unnest(range(0, greatest(len(toks) - 7, 0)))
                             AS INT) AS pos,
                           unnest(list_transform(
                             range(0, greatest(len(toks) - 7, 0)),
                             i -> array_to_string(toks[i+1:i+8], ' ')))
                             AS gram
                    FROM t),
              dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
              m AS (SELECT g.doc_id, g.pos,
                           g.pos - CAST(row_number() OVER (
                             PARTITION BY g.doc_id ORDER BY g.pos) AS INT)
                             AS isl
                    FROM g JOIN dup USING (gram)),
              p AS (SELECT doc_id, min(pos) AS start_pos,
                           max(pos) + 7 AS end_pos
                    FROM m GROUP BY doc_id, isl)
              SELECT p.doc_id, p.start_pos, p.end_pos,
                     p.end_pos - p.start_pos + 1 AS n_tokens,
                     array_to_string(
                       t.toks[p.start_pos + 1 : p.end_pos + 1], ' ')
                       AS passage
              FROM p JOIN t ON p.doc_id = t.doc_id
              ORDER BY p.doc_id, p.start_pos"""),
      (s, d) => duplicatePassages(Tables.documents(s, d), "doc_id", "text")),

    // The apply side of the substring pass: cut every duplicated
    // >=8-token span from every occurrence (fully-duplicated documents
    // drop), returning the scrubbed corpus a pretraining mix ingests.
    Query(
      "q_substring_scrub",
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                         FROM documents),
              g AS (SELECT doc_id,
                           CAST(unnest(range(0, greatest(len(toks) - 7, 0)))
                             AS INT) AS pos,
                           unnest(list_transform(
                             range(0, greatest(len(toks) - 7, 0)),
                             i -> array_to_string(toks[i+1:i+8], ' ')))
                             AS gram
                    FROM t),
              dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
              m AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (gram)),
              cov AS (SELECT DISTINCT m.doc_id, CAST(m.pos + r.u AS INT) AS tp
                      FROM m, range(0, 8) r(u)),
              tok AS (SELECT doc_id,
                             CAST(unnest(range(0, len(toks))) AS INT) AS tp,
                             unnest(toks) AS tok
                      FROM t),
              kept AS (SELECT tok.doc_id, tok.tp, tok.tok
                       FROM tok ANTI JOIN cov USING (doc_id, tp))
              SELECT doc_id, count(*) AS n_kept,
                     array_to_string(list(tok ORDER BY tp), ' ') AS scrubbed
              FROM kept GROUP BY doc_id ORDER BY doc_id"""),
      (s, d) => scrubDuplicatePassages(Tables.documents(s, d),
        "doc_id", "text")),

    // Keep-FIRST substring scrub: each duplicated >=8-token gram is
    // owned by its minimal (doc_id, pos) occurrence and survives there;
    // only the other occurrences are cut — the production-mix variant
    // (one copy of every duplicated passage remains in the corpus).
    Query(
      "q_substring_keepfirst",
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                         FROM documents),
              g AS (SELECT doc_id,
                           CAST(unnest(range(0, greatest(len(toks) - 7, 0)))
                             AS INT) AS pos,
                           unnest(list_transform(
                             range(0, greatest(len(toks) - 7, 0)),
                             i -> array_to_string(toks[i+1:i+8], ' ')))
                             AS gram
                    FROM t),
              dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
              m AS (SELECT g.doc_id, g.pos
                    FROM g JOIN dup USING (gram)
                    QUALIFY row_number() OVER (PARTITION BY gram
                      ORDER BY g.doc_id, g.pos) > 1),
              cov AS (SELECT DISTINCT m.doc_id, CAST(m.pos + r.u AS INT) AS tp
                      FROM m, range(0, 8) r(u)),
              tok AS (SELECT doc_id,
                             CAST(unnest(range(0, len(toks))) AS INT) AS tp,
                             unnest(toks) AS tok
                      FROM t),
              kept AS (SELECT tok.doc_id, tok.tp, tok.tok
                       FROM tok ANTI JOIN cov USING (doc_id, tp))
              SELECT doc_id, count(*) AS n_kept,
                     array_to_string(list(tok ORDER BY tp), ' ') AS scrubbed
              FROM kept GROUP BY doc_id ORDER BY doc_id"""),
      (s, d) => scrubDuplicatePassages(Tables.documents(s, d),
        "doc_id", "text", keepFirst = true)),

    // MinHash+LSH near-dup pairs, gated by a brute-force O(n²) oracle.
    Query(
      "q_dedup_minhash",
      Some("""WITH d AS (
                SELECT doc_id,
                       list_distinct(list_transform(
                         range(0, greatest(len(string_split(text,' ')) - 2, 1)),
                         i -> array_to_string(
                                string_split(text,' ')[i+1:i+3], ' '))) AS sh
                FROM documents)
              SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                     round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
                       (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))),
                       6) AS jacc
              FROM d a JOIN d b ON a.doc_id < b.doc_id
              WHERE round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
                      (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))),
                      6) >= 0.5
              ORDER BY a_id, b_id"""),
      (s, d) => minhashPairs(s, d)),

    // Near-dup CLUSTERS: connected components over the LSH pair graph →
    // (doc_id, cluster_id, keeper). The oracle recomputes components by
    // brute force with a recursive CTE over the same ≥0.5 Jaccard edges.
    Query(
      "q_dedup_clusters",
      Some("""WITH RECURSIVE d AS (
                SELECT doc_id,
                       list_distinct(list_transform(
                         range(0, greatest(len(string_split(text,' ')) - 2, 1)),
                         i -> array_to_string(
                                string_split(text,' ')[i+1:i+3], ' '))) AS sh
                FROM documents),
              p AS (
                SELECT a.doc_id AS a, b.doc_id AS b
                FROM d a JOIN d b ON a.doc_id < b.doc_id
                WHERE round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
                        (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))),
                        6) >= 0.5),
              e AS (SELECT a, b FROM p UNION ALL SELECT b AS a, a AS b FROM p),
              reach(id, r) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT e.b, reach.r FROM reach JOIN e ON e.a = reach.id)
              SELECT id AS doc_id, min(r) AS cluster_id,
                     (id = min(r)) AS keeper
              FROM reach GROUP BY id ORDER BY doc_id"""),
      (s, d) => clusterKeepersForDir(s, d)),

    // Exact n-gram Jaccard pairs at a LOW threshold (0.3) — below
    // where the banded-LSH recall guarantee holds, which is exactly the
    // regime this block-exact path exists for. Blocked within language
    // (cross-language near-dups are meaningless for curation, and the
    // block cuts the pair space |langs|-fold).
    Query(
      "q_ngram_jaccard",
      Some("""WITH d AS (
                SELECT doc_id, lang,
                       list_distinct(list_transform(
                         range(0, greatest(len(string_split(text,' ')) - 2, 1)),
                         i -> array_to_string(
                                string_split(text,' ')[i+1:i+3], ' '))) AS sh
                FROM documents)
              SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                     round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
                       (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))),
                       6) AS jacc
              FROM d a JOIN d b ON a.doc_id < b.doc_id AND a.lang = b.lang
              WHERE round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
                      (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))),
                      6) >= 0.3
              ORDER BY a_id, b_id"""),
      (s, d) => ngramJaccardPairs(Tables.documents(s, d),
        "doc_id", "text", threshold = 0.3, withinCol = Some("lang"))),

    // Same question as q_ngram_jaccard on word SETS, answered by the
    // lossless prefix filter instead of the B-blocked pair space —
    // the AllPairs/PPJoin shape that stays linear-ish as t rises.
    Query(
      "q_setsim_join",
      Some("""WITH d AS (
                SELECT doc_id, lang,
                       list_distinct(string_split(text, ' ')) AS tk
                FROM documents)
              SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                     round(CAST(len(list_intersect(a.tk, b.tk))
                         AS DOUBLE) /
                       (len(a.tk) + len(b.tk)
                         - len(list_intersect(a.tk, b.tk))),
                       6) AS jacc
              FROM d a JOIN d b
                ON a.doc_id < b.doc_id AND a.lang = b.lang
              WHERE round(CAST(len(list_intersect(a.tk, b.tk))
                        AS DOUBLE) /
                      (len(a.tk) + len(b.tk)
                        - len(list_intersect(a.tk, b.tk))),
                      6) >= 0.6
              ORDER BY a_id, b_id"""),
      (s, d) => setSimJoin(Tables.documents(s, d), "doc_id", "text",
        threshold = 0.6, withinCol = Some("lang"))),

    // Asymmetric containment pairs at 0.8, language-blocked — catches
    // the short-doc-inside-long-doc shape Jaccard scores low.
    Query(
      "q_containment",
      Some("""WITH d AS (
                SELECT doc_id, lang,
                       list_distinct(list_transform(
                         range(0, greatest(len(string_split(text,' ')) - 2, 1)),
                         i -> array_to_string(
                                string_split(text,' ')[i+1:i+3], ' '))) AS sh
                FROM documents)
              SELECT a.doc_id AS src_id, b.doc_id AS dst_id,
                     round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                           / len(a.sh), 6) AS containment
              FROM d a JOIN d b
                ON a.doc_id <> b.doc_id AND a.lang = b.lang
              WHERE round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                          / len(a.sh), 6) >= 0.8
              ORDER BY src_id, dst_id"""),
      (s, d) => containmentPairs(Tables.documents(s, d), "doc_id", "text",
        threshold = 0.8, withinCol = Some("lang"))),

    // SimHash fingerprints — the values are oracle-gated (deterministic
    // salted-md5 bits); banded hamming candidate join is exercised in
    // DedupOpsSpec (this corpus's uniform vocabulary gives no clean
    // hamming separation to gate pairs on).
    Query(
      "q_simhash",
      Some("""WITH tok AS (
                SELECT doc_id, tok, count(*) AS w
                FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                      FROM documents)
                GROUP BY doc_id, tok),
              bits AS (
                SELECT doc_id, b.b AS bit,
                       SUM(CASE WHEN
                         ((instr('0123456789abcdef',
                             substr(md5(tok), CAST(16 - b.b // 4 AS INT), 1)) - 1)
                          // (1 << CAST(b.b % 4 AS INT))) % 2 = 1
                         THEN w ELSE -w END) AS v
                FROM tok CROSS JOIN range(0, 64) b(b)
                GROUP BY doc_id, b.b)
              SELECT doc_id,
                     CAST(SUM(CASE WHEN bit >= 32 AND v > 0
                       THEN (CAST(1 AS BIGINT) << CAST(bit - 32 AS INT))
                       ELSE 0 END) AS BIGINT) AS sh_hi,
                     CAST(SUM(CASE WHEN bit < 32 AND v > 0
                       THEN (CAST(1 AS BIGINT) << CAST(bit AS INT))
                       ELSE 0 END) AS BIGINT) AS sh_lo
              FROM bits GROUP BY doc_id ORDER BY doc_id"""),
      (s, d) => simhash(s, d)),

    // Embedding-cosine near-dup pairs (threshold 0.45; the corpus margin
    // around it is ≥1e-3, far above any FP drift). Brute-force here is
    // the exactness spec; the bucketed ANN path (SimilarityOps.annTopK)
    // is the 100 TB variant.
    Query(
      "q_dedup_embedding",
      Some("""SELECT a.vec_id AS a_id, b.vec_id AS b_id,
                     round(list_inner_product(a.e, b.e) /
                       (sqrt(list_inner_product(a.e, a.e)) *
                        sqrt(list_inner_product(b.e, b.e))), 6) AS cos_sim
              FROM (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings) a
              JOIN (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings) b
                ON a.vec_id < b.vec_id
              WHERE list_inner_product(a.e, b.e) /
                      (sqrt(list_inner_product(a.e, a.e)) *
                       sqrt(list_inner_product(b.e, b.e))) >= 0.45
              ORDER BY a_id, b_id"""),
      (s, d) => embeddingPairs(Tables.embeddings(s, d),
        "vec_id", "embedding", threshold = 0.45)),

    // Semantic dedup at its real operating point (near-identical pairs).
    // The corpus's max pair cosine is ~0.5, so the query PLANTS
    // 0.5-scaled copies of every 20th vector: exactly parallel
    // (cos 1.0 — scaling is a power of two, so BestCell scores scale
    // exactly and each copy provably co-clusters with its original).
    // At threshold 0.95 the result is fully determined — every copy
    // drops, everything else keeps — so unlike the recall-gated ANN
    // family this clustered path is ORACLE-gated: a cross-cluster miss
    // or an invented drop is a hash mismatch, not a soft metric.
    Query(
      "q_dedup_semantic",
      Some("""SELECT vec_id, keeper FROM (
                SELECT vec_id, true AS keeper FROM embeddings
                UNION ALL
                SELECT vec_id + 100000000 AS vec_id, false AS keeper
                FROM embeddings WHERE vec_id % 20 = 0)
              ORDER BY vec_id"""),
      (s, d) => semanticDedup(plantedEmbeddings(s, d), "vec_id", "embedding",
          threshold = 0.95)
        .select("vec_id", "keeper")
        .orderBy("vec_id")),

    // The warm twin (VERDICT r10 item 2): identical fixture, identical
    // oracle, but the quantizer+assignment come from the per-corpus
    // SemanticIndex cache — so the bench median prices the within-cell
    // pair mining alone, the production steady state (cold build cost
    // stays visible on q_dedup_semantic above).
    Query(
      "q_dedup_semantic_warm",
      Some("""SELECT vec_id, keeper FROM (
                SELECT vec_id, true AS keeper FROM embeddings
                UNION ALL
                SELECT vec_id + 100000000 AS vec_id, false AS keeper
                FROM embeddings WHERE vec_id % 20 = 0)
              ORDER BY vec_id"""),
      (s, d) => semanticKeepersForDir(s, d, threshold = 0.95)
        .select("vec_id", "keeper")
        .orderBy("vec_id")),

    // Entity resolution: probable typo/variant families among part
    // names, blocked on (first char) with the |len diff| ≤ maxD
    // necessary condition — collapse-first (64 distinct names at any
    // corpus size), so the pair space never sees row multiplicity.
    Query(
      "q_fuzzy_join",
      Some("""WITH nm AS (SELECT p_name AS name, count(*) AS n
                          FROM part GROUP BY 1)
              SELECT a.name AS name_a, b.name AS name_b,
                     levenshtein(a.name, b.name) AS d,
                     a.n AS n_a, b.n AS n_b
              FROM nm a JOIN nm b
                ON substr(a.name, 1, 1) = substr(b.name, 1, 1)
               AND abs(length(a.name) - length(b.name)) <= 3
               AND a.name < b.name
              WHERE levenshtein(a.name, b.name) <= 3
              ORDER BY d, name_a, name_b"""),
      (s, d) => fuzzyNamePairs(Tables.part(s, d), "p_name",
        substring(col("name"), 1, 1), maxDistance = 3))
  )

  /** Entity-resolution fuzzy self-join on a name column: pairs of
    * DISTINCT names within `maxDistance` Levenshtein edits, candidates
    * limited to equal `blockKey` (an expression over the collapsed
    * `name` column) plus the |length difference| ≤ maxDistance filter
    * — which is a NECESSARY condition for the distance bound, so it
    * costs no recall; the block key is the standard ER recall/cost
    * trade (a pair whose edits change the key is missed — run
    * multiple passes with different keys and union when that matters).
    *
    * Scale: collapse-first — names dedup to the distinct-name table
    * (vocabulary-sized, with multiplicities carried as `n_a`/`n_b`)
    * BEFORE any pairing, so row multiplicity never enters the
    * quadratic stage; the self-join is an equi-join on the block key
    * and the Levenshtein evaluation (codegen'd builtin, identical
    * definition in DuckDB) touches only same-block candidates. */
  def fuzzyNamePairs(df: DataFrame, nameCol: String, blockKey: Column,
      maxDistance: Int): DataFrame = {
    require(maxDistance >= 1, s"maxDistance must be >= 1; got $maxDistance")
    val nm = df.groupBy(col(nameCol).as("name"))
      .agg(count(lit(1)).as("n"))
      .withColumn("__blk", blockKey)
    val a = nm.select(col("name").as("name_a"), col("n").as("n_a"),
      col("__blk").as("__blk_a"))
    val b = nm.select(col("name").as("name_b"), col("n").as("n_b"),
      col("__blk").as("__blk_b"))
    a.join(b,
        col("__blk_a") === col("__blk_b") &&
        abs(length(col("name_a")) - length(col("name_b"))) <=
          lit(maxDistance) &&
        col("name_a") < col("name_b") &&
        levenshtein(col("name_a"), col("name_b")) <= lit(maxDistance))
      .select(col("name_a"), col("name_b"),
        levenshtein(col("name_a"), col("name_b")).as("d"),
        col("n_a"), col("n_b"))
      .orderBy(col("d"), col("name_a"), col("name_b"))
  }
}
