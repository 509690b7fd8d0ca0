package graft

import graft.operators.{CurationOps, DedupOps, SimilarityOps, TextOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Public library surface: `import graft.api._` makes every engine
  * operator available as a DataFrame extension, column-parametric —
  * nothing is tied to the driver test tables. The same implementations
  * back the verified `SparkEntry.queries` registry, so each method here
  * is covered by the DuckDB oracle gate and/or a ScalaTest suite.
  *
  * {{{
  * import graft.api._
  * docs.nearDupPairs("doc_id", "text", threshold = 0.8)   // MinHash+LSH
  * docs.withLangId("text").withQuality("text")            // text analysis
  * vecs.cosineTopK("vec_id", "embedding", probeId = 7, k = 10)
  * }}}
  */
package object api {

  implicit class GraftTextOps(private val df: DataFrame) {

    /** Exact-duplicate groups by normalized text hash:
      * (h, n_dups, keeper = min id). One shuffle on the digest. */
    def exactDupGroups(idCol: String, textCol: String): DataFrame =
      df.groupBy(md5(lower(trim(col(textCol)))).as("h"))
        .agg(count(lit(1)).as("n_dups"), min(col(idCol)).as("keeper"))

    /** MinHash+LSH near-duplicate pairs with exact-Jaccard verify:
      * (a_id, b_id, jacc), a_id < b_id, jacc >= threshold. */
    def nearDupPairs(idCol: String, textCol: String,
        threshold: Double = 0.5): DataFrame =
      DedupOps.minhashPairs(df, idCol, textCol, threshold)

    /** 64-bit SimHash fingerprints: (doc_id, sh_hi, sh_lo). */
    def simhashFingerprints(idCol: String, textCol: String): DataFrame =
      DedupOps.simhash(df, idCol, textCol)

    /** Append a language-ID prediction column (n-gram heuristic). */
    def withLangId(textCol: String, outCol: String = "pred_lang"): DataFrame =
      TextOps.withLangId(df, textCol, outCol)

    /** Append quality-filter columns: n_tokens, avg_tok_len,
      * stop_ratio, len_bucket. */
    def withQuality(textCol: String): DataFrame =
      TextOps.withQuality(df, textCol)

    /** Append token-budget estimates: ws_tokens, re_tokens. */
    def withTokenCounts(textCol: String): DataFrame =
      TextOps.withTokenCounts(df, textCol)

    /** Append Gopher-style repetition signals: dup_token_ratio,
      * dup_3gram_ratio. */
    def withRepetition(textCol: String): DataFrame =
      TextOps.withRepetition(df, textCol)

    /** Top-k TF-IDF terms per document (rational variant — IEEE-exact
      * divisions only, engine-reproducible): (doc_id, tok, score, rk). */
    def tfidfTopK(idCol: String, textCol: String, k: Int = 3): DataFrame =
      TextOps.tfidfTopK(df, idCol, textCol, k)

    /** Append a MinHash document fingerprint column. */
    def withFingerprint(textCol: String, outCol: String = "fp"): DataFrame =
      TextOps.withFingerprint(df, textCol, outCol)

    /** Near-duplicate CLUSTERS: connected components over the MinHash
      * LSH pair graph → (doc_id, cluster_id = component min id, keeper).
      * Iterative min-label propagation, fully distributed. */
    def nearDupClusters(idCol: String, textCol: String,
        threshold: Double = 0.5): DataFrame =
      DedupOps.nearDupClusters(
        DedupOps.nearDupEdges(df, idCol, textCol, threshold),
        df.select(col(idCol)), idCol)

    /** Connected components over an arbitrary (a_id, b_id) pair set —
      * compose with [[GraftVectorOps.embeddingNearDups]] or
      * [[ngramJaccardPairs]] output. */
    def clusterPairs(pairs: DataFrame, idCol: String): DataFrame =
      DedupOps.nearDupClusters(pairs, df.select(col(idCol)), idCol)

    /** EXACT n-gram Jaccard near-duplicate pairs (block-matrix
      * equi-join; no LSH recall loss — use below j≈0.5 where banded
      * LSH misses). `withinCol` blocks pairs to equal values of a
      * column (e.g. language). */
    def ngramJaccardPairs(idCol: String, textCol: String,
        threshold: Double, withinCol: Option[String] = None): DataFrame =
      DedupOps.ngramJaccardPairs(df, idCol, textCol, threshold,
        withinCol = withinCol)

    /** Asymmetric shingle containment pairs |A∩B|/|A| ≥ threshold —
      * the quote/subset detector (src fully inside dst ⇒ 1.0). */
    def containmentPairs(idCol: String, textCol: String,
        threshold: Double, withinCol: Option[String] = None): DataFrame =
      DedupOps.containmentPairs(df, idCol, textCol, threshold,
        withinCol = withinCol)

    /** Substring-level EXACT dedup (Lee et al. ExactSubstr): maximal
      * repeated ≥k-token passages across and within documents —
      * (doc_id, start_pos, end_pos, n_tokens, passage). */
    def duplicatePassages(idCol: String, textCol: String, k: Int = 8,
        minOccurrences: Int = 2): DataFrame =
      DedupOps.duplicatePassages(df, idCol, textCol, k, minOccurrences)

    /** foreachBatch filter deduplicating a STREAM against this corpus
      * by exact normalized-text digest — the history-backed twin of
      * the watermark-bounded [[streaming.StreamingDedup.exactDupFilter]]
      * (novel fingerprints accumulate, so cross-batch copies drop
      * too; see [[streaming.FingerprintDedupFilter]]). */
    def historyDedupFilter(textCol: String)
        : streaming.FingerprintDedupFilter =
      streaming.StreamingDedup.exactAgainstCorpus(df, textCol)

    /** MinHash-signature near-dup variant of [[historyDedupFilter]]
      * (j^perms sensitivity; probabilistic by design). */
    def historyNearDupFilter(textCol: String, k: Int = 3,
        perms: Int = 32): streaming.FingerprintDedupFilter =
      streaming.StreamingDedup.nearAgainstCorpus(df, textCol, k, perms)

    /** Scrub the duplicated passages OUT of the corpus —
      * (doc_id, n_kept, scrubbed). Default cuts EVERY occurrence
      * (fully-duplicated documents drop); `keepFirst = true` keeps the
      * copy at each gram's minimal (doc_id, pos) — the production-mix
      * variant where one occurrence of every passage survives. */
    def scrubDuplicatePassages(idCol: String, textCol: String, k: Int = 8,
        minOccurrences: Int = 2, keepFirst: Boolean = false): DataFrame =
      DedupOps.scrubDuplicatePassages(df, idCol, textCol, k,
        minOccurrences, keepFirst)
  }

  implicit class GraftCurationOps(private val df: DataFrame) {

    /** Deterministic per-stratum sampling (md5 draw — reproducible
      * across engines, runs, and partitionings). */
    def stratifiedSample(idCol: String, strataCol: String,
        rates: Map[String, Double], defaultRate: Double): DataFrame =
      CurationOps.stratifiedSample(df, idCol, strataCol, rates, defaultRate)

    /** Deterministic train/val/test assignment in a `split` column
      * (16-bit md5 draw against integer cut points). */
    def hashSplit(idCol: String, trainCut: Int = 52429,
        valCut: Int = 58982): DataFrame =
      CurationOps.hashSplit(df, idCol, trainCut, valCut)

    /** Drop documents sharing any k-gram with a benchmark set
      * (broadcast semi-join; returns the clean remainder). */
    def decontaminate(idCol: String, textCol: String,
        benchmark: DataFrame, benchTextCol: String,
        k: Int = 3): DataFrame =
      CurationOps.decontaminate(df, idCol, textCol, benchmark,
        benchTextCol, k)

    /** Memory-bounded Bloom-filter decontamination (the 100 TB path;
      * false positives only drop extra clean docs). */
    def decontaminateBloom(idCol: String, textCol: String,
        benchmark: DataFrame, benchTextCol: String, k: Int = 3,
        fpp: Double = 1e-6): DataFrame =
      CurationOps.decontaminateBloom(df, idCol, textCol, benchmark,
        benchTextCol, k, fpp)

    /** Curation funnel report: per-stratum stage-survival counts
      * (total → quality → exact keeper → final; pass `clusterKeepers` —
      * a nearDupClusters keeper table — to also report the near-dup
      * stage as n_nd_keepers / n_final_nd). */
    def funnelReport(idCol: String, textCol: String,
        strataCols: Seq[String],
        clusterKeepers: Option[DataFrame] = None): DataFrame =
      CurationOps.funnelReport(df, idCol, textCol, strataCols,
        clusterKeepers = clusterKeepers)

    /** Fixed-window chunking with overlap: split documents longer than
      * the training context into maxTokens-token chunks sharing
      * `overlap` tokens of left context — (idCol, chunk_id, n_tokens,
      * chunk). Narrow map, no shuffle. */
    def chunkDocuments(idCol: String, textCol: String,
        maxTokens: Int = 32, overlap: Int = 4): DataFrame =
      CurationOps.chunkDocuments(df, idCol, textCol, maxTokens, overlap)

    /** Greedy fixed-token sequence packing per stratum: appends
      * (n_tokens, pack_id). */
    def packSequences(idCol: String, textCol: String, strataCol: String,
        packTokens: Int = 2048): DataFrame =
      CurationOps.packSequences(df, idCol, textCol, strataCol, packTokens)

    /** Append a PII-scrubbed copy of a text column (emails and long
      * digit runs redacted; narrow codegen'd regex passes). */
    def withPiiScrubbed(textCol: String,
        outCol: String = "scrubbed"): DataFrame =
      df.withColumn(outCol, CurationOps.scrubPii(col(textCol)))

    /** Composite Gopher-style quality filter over withQuality metrics. */
    def qualityFilter(textCol: String, minTokens: Int = 20,
        maxTokens: Int = 80, minStopRatio: Double = 0.02,
        maxAvgTokLen: Double = 5.0): DataFrame =
      CurationOps.qualityFilter(df, textCol, minTokens, maxTokens,
        minStopRatio, maxAvgTokLen)

    /** Canonical text cleanup (NFC + control/whitespace collapse + trim)
      * appended as `outCol`. One codegen'd narrow pass. */
    def withNormalizedText(textCol: String,
        outCol: String = "clean"): DataFrame =
      df.withColumn(outCol, TextOps.normalizeText(col(textCol)))

    /** Deterministic global shuffle + shard assignment for training
      * export: appends `shard` and `pos` (dense 1-based rank within
      * shard). At warehouse scale size nShards ≈ corpus/1 GB. */
    def corpusShuffle(idCol: String, nShards: Int = 8): DataFrame =
      CurationOps.corpusShuffle(df, idCol, nShards)

    /** Token-budget sampling: the budget-length prefix of the
      * derandomized shuffle, via a two-level distributed prefix sum.
      * Returns `(doc_id, n_tokens, cum_tokens)`. */
    def sampleTokenBudget(idCol: String, textCol: String,
        budgetTokens: Long): DataFrame =
      CurationOps.sampleTokenBudget(df, idCol, textCol, budgetTokens)
  }

  implicit class GraftVectorOps(private val df: DataFrame) {

    /** Exact cosine top-k neighbors of `probeId` (brute-force scan,
      * broadcast probe, TakeOrderedAndProject). */
    def cosineTopK(idCol: String, embCol: String, probeId: Long,
        k: Int = 10): DataFrame =
      SimilarityOps.bruteForceTopK(df, idCol, embCol, probeId, k)

    /** Approximate cosine top-k via multi-table hyperplane LSH —
      * the 100 TB path (bucketed candidates, then exact rescoring). */
    def cosineTopKApprox(idCol: String, embCol: String, probeId: Long,
        k: Int = 10): DataFrame =
      SimilarityOps.annTopK(df, idCol, embCol, probeId, k)

    /** Exact embedding-cosine near-duplicate pairs at `threshold`
      * (distributed block-matrix equi-join — no nested loop). */
    def embeddingNearDups(idCol: String, embCol: String,
        threshold: Double): DataFrame =
      DedupOps.embeddingPairs(df, idCol, embCol, threshold)

    /** SemDeDup-style clustered semantic dedup: deterministic Lloyd
      * clusters, exact cosine pairs WITHIN clusters, keep-lowest-id.
      * Returns `(vec_id, cell, keeper)`; `nClusters` 0 = auto (4·√n). */
    def semanticDedup(idCol: String, embCol: String,
        threshold: Double = 0.45, nClusters: Int = 0): DataFrame =
      DedupOps.semanticDedup(df, idCol, embCol, threshold, nClusters)

    /** Exact k-NN join: every vector's top-k cosine neighbors
      * (src_id, dst_id, cos_sim, rn). O(n²) exact — the kNN-graph
      * exactness spec; approximate graphs via lshIndex/ivfIndex. */
    def knnJoin(idCol: String, embCol: String, k: Int = 10): DataFrame =
      SimilarityOps.knnJoin(df, idCol, embCol, k)

    /** Approximate k-NN join through a batch-probed LSH index: one
      * hash equi-join on the signature buckets, exact rescore, partial
      * top-k — the scale path for kNN graphs (recall rides the LSH
      * budget; see [[operators.SimilarityOps.knnJoinAnn]]). */
    def knnJoinAnn(idCol: String, embCol: String, k: Int = 10,
        tables: Int = 16, planesPerTable: Int = 4): DataFrame =
      SimilarityOps.knnJoinAnn(df, idCol, embCol, k, tables, planesPerTable)

    /** Build a materialized multi-table LSH signature index (persisted;
      * probe with `.topK(id)` / `.topKVec(vector)`; batch-probe an
      * external query set with `.knnJoinWith(queries, …)`; grow it
      * with `.append(newVectors, …)` / `.appendTable`; persist
      * bucketed with `.writeTable`). */
    def lshIndex(idCol: String, embCol: String): operators.AnnIndex =
      operators.AnnIndex.build(df, idCol, embCol)

    /** Build a deterministic IVF (inverted-file) index: hash-seeded
      * centroids, DECIMAL-exact Lloyd refinement, a 256-bit sketch
      * column, and three probe modes — single-stage `.topK(id, k,
      * nprobe)`, the two-stage reranked `.topKAuto(id, k)` (wide
      * sketch sweep + saturated-cap exact rescore; the
      * measured-frontier default, BASELINE.md §IVF rerank), and the
      * batch-serving `.knnJoinWith(queries, …)` kNN join.
      * `k = 0` (the default) auto-sizes the quantizer as 4·√n
      * ([[operators.IvfIndex.build]]'s cell-count policy). */
    def ivfIndex(idCol: String, embCol: String, k: Int = 0,
        iters: Int = 2): operators.IvfIndex =
      operators.IvfIndex.build(df, idCol, embCol, k, iters)

    /** Build a deterministic product-quantization index (per-subspace
      * hash-seeded Lloyd codebook, one small code per subspace): ADC
      * probes rank the CODE column only — an order of magnitude fewer
      * scan bytes than the embedding — then exact-rescore the best
      * `rescoreCap` rows (`.topK(id)` / `.topKVec(vector)`). */
    def pqIndex(idCol: String, embCol: String, subspaces: Int = 8,
        centroidsPerSub: Int = 16): operators.PqIndex =
      operators.PqIndex.build(df, idCol, embCol, subspaces, centroidsPerSub)

    /** Build the two-level IVF-PQ index (coarse cells + residual PQ
      * codes — the canonical billion-scale layout): probes prune to
      * their nprobe cells AND rank only the 8-code column inside
      * them, then exact-rescore an absolute cap
      * (`.topK(id)` / `.topKVec(vector)`); batch-serve an external
      * query set with `.knnJoinWith(queries, …)`. `kCells = 0` (the
      * default) auto-sizes the coarse quantizer as 4·√n. */
    def ivfPqIndex(idCol: String, embCol: String, kCells: Int = 0,
        subspaces: Int = 8, centroidsPerSub: Int = 16)
        : operators.IvfPqIndex =
      operators.IvfPqIndex.build(df, idCol, embCol, kCells, subspaces,
        centroidsPerSub)

    /** Streaming dedup against a growing HISTORICAL index: wrap an
      * [[operators.AnnIndex]] of the existing corpus and hand
      * `.foreachBatch(onNovel)` to `writeStream.foreachBatch` — each
      * micro-batch is one index-probing kNN equi-join, novel vectors
      * are appended so later batches dedup against earlier arrivals
      * too (see [[streaming.IndexDedupFilter]]). */
    def indexDedupFilter(idCol: String, embCol: String,
        threshold: Double): streaming.IndexDedupFilter =
      // the historical signature table IS the per-batch probe target —
      // persisted, or every micro-batch recomputes all of history;
      // release via filter.close() when the stream ends
      streaming.StreamingDedup.againstIndex(
        operators.AnnIndex.build(df, idCol, embCol, tables = 16),
        idCol, embCol, threshold)
  }

  implicit class GraftJoinOps(private val facts: DataFrame) {

    /** Skew-resistant equi-join: salt this (skewed) side `buckets` ways
      * against a replicated `dim`. Result equals the plain inner join. */
    def saltedJoin(dim: DataFrame, key: String,
        saltSource: org.apache.spark.sql.Column, buckets: Int): DataFrame =
      operators.JoinOps.saltedJoin(facts, dim, key, saltSource, buckets)

    /** Backward as-of join: latest `right` row with rightTime <=
      * leftTime per equi key (column names must be disjoint; `leftId`
      * unique; ties break to largest `rightId`). */
    def asOfJoin(right: DataFrame, leftKey: String, rightKey: String,
        leftTime: String, rightTime: String, leftId: String,
        rightId: String): DataFrame =
      operators.JoinOps.asOfJoin(facts, right, leftKey, rightKey,
        leftTime, rightTime, leftId, rightId)
  }

  /** Warehouse + observability tier (round 11): merge, dimension
    * history, profiling, constraints, drift, and event analytics as
    * DataFrame extensions — the batch toolkit around the LLM-pipeline
    * operators above. */
  implicit class GraftWarehouseOps(private val df: DataFrame) {

    /** SCD-1 merge: apply `updates` on `key` — one full-outer
      * equi-join; result carries an `action` tag (update/insert/keep).
      * Schemas must match. */
    def mergeUpsert(updates: DataFrame, key: String): DataFrame =
      operators.RelationalOps.mergeUpsert(df, updates, key)

    /** SCD-2 history build: collapse this change stream into validity
      * intervals (`valid_from`/`valid_to`/`is_current`), change-
      * detected and totally ordered per key by (ts, tie). */
    def scd2(key: String, value: String, ts: String,
        tie: String): DataFrame =
      operators.RelationalOps.scd2Build(df, key, value, ts, tie)

    /** One-pass-per-kind column profile: counts, nulls, exact
      * distinct, range, DECIMAL-exact mean/stddev per column. */
    def profileColumns(cols: Seq[String]): DataFrame =
      operators.RelationalOps.profile(df, cols)

    /** Fixed-width histogram of a numeric column: (bucket, bin_lo, n). */
    def histogram(column: String, width: Double): DataFrame =
      operators.RelationalOps.histogram(df, column, width)

    /** Declarative data-quality report: one violation-count row per
      * [[operators.ConstraintOps.Check]]; scalar checks share one scan. */
    def dqReport(checks: Seq[operators.ConstraintOps.Check]): DataFrame =
      operators.ConstraintOps.dqReport(df, checks)

    /** PSI drift between the `periodCol`=0 and =1 populations of
      * `valueCol` per `groupCol` (fixed-width buckets, smoothed). */
    def drift(groupCol: String, valueCol: String, periodCol: String,
        width: Double): DataFrame =
      operators.EventOps.drift(df, groupCol, valueCol, periodCol, width)

    /** Per-group z-score outliers of `valueCol` (|z| > z). */
    def anomalies(groupCol: String, idCol: String, valueCol: String,
        z: Double = 3.0): DataFrame =
      operators.EventOps.anomaly(df, groupCol, idCol, valueCol, z)

    /** Cohort retention triangle (cohort_day, day_offset, users). */
    def retention(userCol: String, tsCol: String): DataFrame =
      operators.EventOps.retention(df, userCol, tsCol)

    /** Strict-ordered first-touch funnel counts through `stages`. */
    def eventFunnel(userCol: String, typeCol: String, tsCol: String,
        stages: Seq[String]): DataFrame =
      operators.EventOps.funnel(df, userCol, typeCol, tsCol, stages)

    /** Per-group CUSUM level-shift detection over hourly counts:
      * (group, cp_hour, stat, mean_before, mean_after). */
    def changepoints(groupCol: String, tsCol: String): DataFrame =
      operators.EventOps.changepoint(df, groupCol, tsCol)

    /** Leakage-safe point-in-time trailing features at each
      * `labelValue` row (1d/7d counts + 7d DECIMAL value sum; the
      * label instant itself is excluded from every frame). */
    def trailingFeatures(userCol: String, tsCol: String, idCol: String,
        typeCol: String, valCol: String, labelValue: String): DataFrame =
      operators.EventOps.trailingFeatures(df, userCol, tsCol, idCol,
        typeCol, valCol, labelValue)

    /** Contingency table with per-cell χ² independence terms:
      * (a, b, n, expected, chi2). */
    def crosstabChi2(aCol: String, bCol: String): DataFrame =
      operators.StatsOps.crosstabChi2(df, aCol, bCol)

    /** Hot-key profiler: topN heaviest `keyCol` values with share /
      * cumulative share / skew ratio — run it on a join key BEFORE
      * the 100 TB shuffle to decide on salting / AQE skew handling. */
    def keySkew(keyCol: String, topN: Int = 10): DataFrame =
      operators.StatsOps.keySkew(df, keyCol, topN)

    /** Export Z-ORDERED on two bucket expressions: 2-D-tiled files
      * whose row-group stats stay narrow on both columns
      * ([[sources.Warehouse.writeZOrdered]]). */
    def writeZOrdered(path: String, xBucket: org.apache.spark.sql.Column,
        yBucket: org.apache.spark.sql.Column, files: Int): Unit =
      sources.Warehouse.writeZOrdered(df, path, xBucket, yBucket, files)
  }
}
