package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{JaccardSorted, MinHashSig, NfcNormalize, PlaneProject, PlaneSigs, PlaneSketch, ShingleHashVec, SketchDot, SortedIntersectCount, VectorDot, VectorOps}

/** Session-extension entry point: registers the engine's native
  * expressions as session functions at SparkSession build time, so any
  * session configured with
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * (or `builder.withExtensions(new GraftExtensions)`) can call
  * `vec_dot`, `minhash_sig`, `shingle_hashes` and `jaccard_sorted` from
  * PURE SQL — no library import, no chokepoint call. This is the
  * Spark-native registration mechanism for engine extensions (the same
  * hook an optimizer `Rule` or a `SparkStrategy` would use); the
  * [[graft.sources.Tables]] chokepoint registration remains for sessions
  * built without the config, and both paths bind identical builders.
  *
  * Extension-injected functions live in the session's base registry, so
  * they survive `SparkSession.newSession()` and appear in every derived
  * session — unlike temp functions (GraftExtensionsSpec pins this).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def litInt(e: Expression): Int =
    e.eval().asInstanceOf[Number].intValue()

  override def apply(ext: SparkSessionExtensions): Unit = {
    // opt-in approximate mode: COUNT(DISTINCT x) → HLL sketch when
    // spark.graft.approx.countDistinct=true (no-op otherwise)
    ext.injectOptimizerRule(_ => new graft.plans.ApproxDistinctRewrite)
    ext.injectFunction((FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vec_dot"),
      (exprs: Seq[Expression]) => VectorDot(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (exprs: Seq[Expression]) =>
        MinHashSig(exprs(0), litInt(exprs(1)), litInt(exprs(2)))))
    ext.injectFunction((FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashVec].getName, "shingle_hashes"),
      (exprs: Seq[Expression]) => ShingleHashVec(exprs(0), litInt(exprs(1)))))
    ext.injectFunction((FunctionIdentifier("jaccard_sorted"),
      new ExpressionInfo(classOf[JaccardSorted].getName, "jaccard_sorted"),
      (exprs: Seq[Expression]) => JaccardSorted(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName,
        "sorted_intersect_count"),
      (exprs: Seq[Expression]) => SortedIntersectCount(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (exprs: Seq[Expression]) => NfcNormalize(exprs(0))))
    ext.injectFunction((FunctionIdentifier("zorder_key"),
      new ExpressionInfo(graft.functions.ZOrder.getClass.getName,
        "zorder_key"),
      (exprs: Seq[Expression]) => {
        if (exprs.length < 2 || exprs.length > 4)
          throw new IllegalArgumentException(
            s"zorder_key(c1, ..., cN) takes 2 to 4 columns — got " +
              s"${exprs.length} arguments")
        graft.functions.ZOrder.zorderKeyExpr(exprs)
      }))
    ext.injectFunction((FunctionIdentifier("geohash"),
      new ExpressionInfo(graft.functions.Geohash.getClass.getName,
        "geohash"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 3)
          throw new IllegalArgumentException(
            "geohash(lat, lon, precision) takes exactly 3 arguments — " +
              s"got ${exprs.length}")
        graft.functions.Geohash.geohashExpr(exprs(0), exprs(1),
          VectorOps.intArg("geohash", "precision", exprs(2)))
      }))
    // The hyperplane-sketch family (the ANN/IVF compact-code surface);
    // int parameters are validated foldable literals (clear analysis
    // errors instead of cast failures — VectorOps.intArg)
    ext.injectFunction((FunctionIdentifier("plane_sketch"),
      new ExpressionInfo(classOf[PlaneSketch].getName, "plane_sketch"),
      (exprs: Seq[Expression]) => PlaneSketch(exprs(0),
        VectorOps.intArg("plane_sketch", "base", exprs(1)),
        VectorOps.intArg("plane_sketch", "words", exprs(2)))))
    ext.injectFunction((FunctionIdentifier("plane_sigs"),
      new ExpressionInfo(classOf[PlaneSigs].getName, "plane_sigs"),
      (exprs: Seq[Expression]) => PlaneSigs(exprs(0),
        VectorOps.intArg("plane_sigs", "base", exprs(1)),
        VectorOps.intArg("plane_sigs", "tables", exprs(2)),
        VectorOps.intArg("plane_sigs", "planes", exprs(3)))))
    ext.injectFunction((FunctionIdentifier("plane_project"),
      new ExpressionInfo(classOf[PlaneProject].getName, "plane_project"),
      (exprs: Seq[Expression]) => PlaneProject(exprs(0),
        VectorOps.intArg("plane_project", "base", exprs(1)),
        VectorOps.intArg("plane_project", "count", exprs(2)))))
    ext.injectFunction((FunctionIdentifier("sketch_dot"),
      new ExpressionInfo(classOf[SketchDot].getName, "sketch_dot"),
      (exprs: Seq[Expression]) => SketchDot(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("pq_encode"),
      new ExpressionInfo(
        classOf[graft.functions.PqEncode].getName, "pq_encode"),
      (exprs: Seq[Expression]) => graft.functions.PqEncode(exprs(0),
        VectorOps.codebookOf("pq_encode", exprs(1)))))
    ext.injectFunction((FunctionIdentifier("pq_adc"),
      new ExpressionInfo(classOf[graft.functions.PqAdc].getName, "pq_adc"),
      (exprs: Seq[Expression]) => graft.functions.PqAdc(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("pq_lut"),
      new ExpressionInfo(classOf[graft.functions.PqLut].getName, "pq_lut"),
      (exprs: Seq[Expression]) => graft.functions.PqLut(exprs(0),
        VectorOps.codebookOf("pq_lut", exprs(1)))))
    // Spark's runtime-filter probe expression, not in the public SQL
    // registry — surfaced for declarative Bloom set-membership pruning
    // (pairs with the registered `bloom_filter_agg`).
    ext.injectFunction((FunctionIdentifier("might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "might_contain"),
      (exprs: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("bloom_filter_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "bloom_filter_agg"),
      (exprs: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(exprs(0), exprs(1), exprs(2))))
    // Frequent-items (heavy-hitter) sketch tier — mergeable
    // Datasketches ItemsSketch aggregates + decoders
    // (graft.functions.FreqSketch; the approximate twin of the exact
    // token groupBy).
    ext.injectFunction((FunctionIdentifier("freq_sketch_agg"),
      new ExpressionInfo(classOf[graft.functions.FreqItemsAgg].getName,
        "freq_sketch_agg"),
      (exprs: Seq[Expression]) =>
        graft.functions.FreqItemsAgg(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("freq_union_agg"),
      new ExpressionInfo(classOf[graft.functions.FreqUnionAgg].getName,
        "freq_union_agg"),
      (exprs: Seq[Expression]) =>
        graft.functions.FreqUnionAgg(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("freq_sketch_topk"),
      new ExpressionInfo(classOf[graft.functions.FreqSketchTopK].getName,
        "freq_sketch_topk"),
      (exprs: Seq[Expression]) => graft.functions.FreqSketchTopK(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((FunctionIdentifier("freq_sketch_error"),
      new ExpressionInfo(classOf[graft.functions.FreqSketchError].getName,
        "freq_sketch_error"),
      (exprs: Seq[Expression]) => graft.functions.FreqSketchError(exprs(0))))
    ext.injectFunction((FunctionIdentifier("freq_sketch_estimate"),
      new ExpressionInfo(
        classOf[graft.functions.FreqSketchEstimate].getName,
        "freq_sketch_estimate"),
      (exprs: Seq[Expression]) =>
        graft.functions.FreqSketchEstimate(exprs(0), exprs(1))))
    // Theta sketches — distinct counts closed under set algebra
    // (graft.functions.ThetaSketch): the audience-overlap tier HLL
    // unions cannot answer.
    ext.injectFunction((FunctionIdentifier("theta_sketch_agg"),
      new ExpressionInfo(classOf[graft.functions.ThetaSketchAgg].getName,
        "theta_sketch_agg"),
      (exprs: Seq[Expression]) =>
        graft.functions.ThetaSketchAgg(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("theta_union_agg"),
      new ExpressionInfo(classOf[graft.functions.ThetaUnionAgg].getName,
        "theta_union_agg"),
      (exprs: Seq[Expression]) =>
        graft.functions.ThetaUnionAgg(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("theta_estimate"),
      new ExpressionInfo(classOf[graft.functions.ThetaEstimate].getName,
        "theta_estimate"),
      (exprs: Seq[Expression]) => graft.functions.ThetaEstimate(exprs(0))))
    ext.injectFunction((FunctionIdentifier("theta_lb"),
      new ExpressionInfo(classOf[graft.functions.ThetaBound].getName,
        "theta_lb"),
      (exprs: Seq[Expression]) => graft.functions.ThetaBound(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue(), upper = false)))
    ext.injectFunction((FunctionIdentifier("theta_ub"),
      new ExpressionInfo(classOf[graft.functions.ThetaBound].getName,
        "theta_ub"),
      (exprs: Seq[Expression]) => graft.functions.ThetaBound(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue(), upper = true)))
    ext.injectFunction((FunctionIdentifier("theta_intersect"),
      new ExpressionInfo(classOf[graft.functions.ThetaSetOp].getName,
        "theta_intersect"),
      (exprs: Seq[Expression]) => graft.functions.ThetaSetOp(exprs(0),
        exprs(1), graft.functions.ThetaSetOp.Intersect)))
    ext.injectFunction((FunctionIdentifier("theta_anotb"),
      new ExpressionInfo(classOf[graft.functions.ThetaSetOp].getName,
        "theta_anotb"),
      (exprs: Seq[Expression]) => graft.functions.ThetaSetOp(exprs(0),
        exprs(1), graft.functions.ThetaSetOp.ANotB)))
    ext.injectFunction((FunctionIdentifier("theta_union_pair"),
      new ExpressionInfo(classOf[graft.functions.ThetaSetOp].getName,
        "theta_union_pair"),
      (exprs: Seq[Expression]) => graft.functions.ThetaSetOp(exprs(0),
        exprs(1), graft.functions.ThetaSetOp.UnionPair)))
    // KLL quantile sketches — the mergeable quantile tier
    // (graft.functions.Kll): store per-shard sketches, answer any
    // coarser quantile rollup by merging, never re-scan raw values.
    ext.injectFunction((FunctionIdentifier("kll_sketch_agg"),
      new ExpressionInfo(classOf[graft.functions.KllSketchAgg].getName,
        "kll_sketch_agg"),
      (exprs: Seq[Expression]) =>
        graft.functions.KllSketchAgg(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("kll_union_agg"),
      new ExpressionInfo(classOf[graft.functions.KllUnionAgg].getName,
        "kll_union_agg"),
      (exprs: Seq[Expression]) =>
        graft.functions.KllUnionAgg(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("kll_quantile"),
      new ExpressionInfo(classOf[graft.functions.KllQuantile].getName,
        "kll_quantile"),
      (exprs: Seq[Expression]) =>
        graft.functions.KllQuantile(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("kll_rank"),
      new ExpressionInfo(classOf[graft.functions.KllRank].getName,
        "kll_rank"),
      (exprs: Seq[Expression]) =>
        graft.functions.KllRank(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("kll_n"),
      new ExpressionInfo(classOf[graft.functions.KllN].getName, "kll_n"),
      (exprs: Seq[Expression]) => graft.functions.KllN(exprs(0))))
    ext.injectFunction((FunctionIdentifier("kll_error"),
      new ExpressionInfo(classOf[graft.functions.KllError].getName,
        "kll_error"),
      (exprs: Seq[Expression]) => graft.functions.KllError(exprs(0))))
    // Reservoir sampling sketches — mergeable uniform per-group
    // samples (graft.functions.ReservoirSketch).
    ext.injectFunction((FunctionIdentifier("reservoir_agg"),
      new ExpressionInfo(classOf[graft.functions.ReservoirAgg].getName,
        "reservoir_agg"),
      (exprs: Seq[Expression]) =>
        graft.functions.ReservoirAgg(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("reservoir_union_agg"),
      new ExpressionInfo(
        classOf[graft.functions.ReservoirUnionAgg].getName,
        "reservoir_union_agg"),
      (exprs: Seq[Expression]) =>
        graft.functions.ReservoirUnionAgg(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("reservoir_items"),
      new ExpressionInfo(classOf[graft.functions.ReservoirItems].getName,
        "reservoir_items"),
      (exprs: Seq[Expression]) =>
        graft.functions.ReservoirItems(exprs(0))))
    ext.injectFunction((FunctionIdentifier("reservoir_n"),
      new ExpressionInfo(classOf[graft.functions.ReservoirN].getName,
        "reservoir_n"),
      (exprs: Seq[Expression]) => graft.functions.ReservoirN(exprs(0))))
    // VarOpt weighted sampling sketches — the weighted half of the
    // sampling tier (graft.functions.VarOptSketch).
    ext.injectFunction((FunctionIdentifier("varopt_agg"),
      new ExpressionInfo(classOf[graft.functions.VarOptAgg].getName,
        "varopt_agg"),
      (exprs: Seq[Expression]) =>
        graft.functions.VarOptAgg(exprs(0), exprs(1), exprs(2))))
    ext.injectFunction((FunctionIdentifier("varopt_union_agg"),
      new ExpressionInfo(classOf[graft.functions.VarOptUnionAgg].getName,
        "varopt_union_agg"),
      (exprs: Seq[Expression]) =>
        graft.functions.VarOptUnionAgg(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("varopt_samples"),
      new ExpressionInfo(classOf[graft.functions.VarOptSamples].getName,
        "varopt_samples"),
      (exprs: Seq[Expression]) =>
        graft.functions.VarOptSamples(exprs(0))))
    ext.injectFunction((FunctionIdentifier("varopt_n"),
      new ExpressionInfo(classOf[graft.functions.VarOptN].getName,
        "varopt_n"),
      (exprs: Seq[Expression]) => graft.functions.VarOptN(exprs(0))))
    // TABLE-level surface: the flagship LLM-pipeline operators as
    // table-valued functions, so a SQL-first user reaches the batch ANN
    // serving shape, the dedup family, and the curation funnel without
    // the Scala API (builders in the companion object below). Document
    // TVFs share the engine's documents contract: the named table must
    // carry (doc_id, text).
    ext.injectTableFunction((FunctionIdentifier("knn_join"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "knn_join"),
      (exprs: Seq[Expression]) => GraftExtensions.knnJoinPlan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("knn_probe"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "knn_probe"),
      (exprs: Seq[Expression]) => GraftExtensions.knnProbePlan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("dedup_embedding"),
      new ExpressionInfo(GraftExtensions.getClass.getName,
        "dedup_embedding"),
      (exprs: Seq[Expression]) => GraftExtensions.dedupEmbeddingPlan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("dedup_semantic"),
      new ExpressionInfo(GraftExtensions.getClass.getName,
        "dedup_semantic"),
      (exprs: Seq[Expression]) => GraftExtensions.dedupSemanticPlan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("dedup_pairs"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "dedup_pairs"),
      (exprs: Seq[Expression]) => GraftExtensions.dedupPairsPlan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("dedup_clusters"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "dedup_clusters"),
      (exprs: Seq[Expression]) => GraftExtensions.dedupClustersPlan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("substring_scrub"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "substring_scrub"),
      (exprs: Seq[Expression]) => GraftExtensions.substringScrubPlan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("chunk_docs"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "chunk_docs"),
      (exprs: Seq[Expression]) => GraftExtensions.chunkDocsPlan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("curation_funnel"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "curation_funnel"),
      (exprs: Seq[Expression]) => GraftExtensions.curationFunnelPlan(exprs)))
    // the curation STAGES, so a SQL-first user reaches every step of
    // the funnel (not just the composite report)
    ext.injectTableFunction((FunctionIdentifier("pii_scrub"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "pii_scrub"),
      (exprs: Seq[Expression]) => GraftExtensions.piiScrubPlan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("quality_filter"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "quality_filter"),
      (exprs: Seq[Expression]) => GraftExtensions.qualityFilterPlan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("split_assign"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "split_assign"),
      (exprs: Seq[Expression]) => GraftExtensions.splitAssignPlan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("decontaminate"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "decontaminate"),
      (exprs: Seq[Expression]) => GraftExtensions.decontaminatePlan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("pack_sequences"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "pack_sequences"),
      (exprs: Seq[Expression]) => GraftExtensions.packSequencesPlan(exprs)))
    // the TEXT-ANALYSIS tier, completing SQL reach over every document
    // operator family: language-ID, quality signals, token budgets,
    // repetition ratios, fingerprints, top-k TF-IDF terms
    ext.injectTableFunction((FunctionIdentifier("lang_id"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "lang_id"),
      (exprs: Seq[Expression]) => GraftExtensions.langIdPlan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("text_quality"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "text_quality"),
      (exprs: Seq[Expression]) => GraftExtensions.textQualityPlan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("token_count"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "token_count"),
      (exprs: Seq[Expression]) => GraftExtensions.tokenCountPlan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("repetition_stats"),
      new ExpressionInfo(GraftExtensions.getClass.getName,
        "repetition_stats"),
      (exprs: Seq[Expression]) => GraftExtensions.repetitionStatsPlan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("doc_fingerprint"),
      new ExpressionInfo(GraftExtensions.getClass.getName,
        "doc_fingerprint"),
      (exprs: Seq[Expression]) => GraftExtensions.docFingerprintPlan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("tfidf_topk"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "tfidf_topk"),
      (exprs: Seq[Expression]) => GraftExtensions.tfidfTopKPlan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("bm25"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "bm25"),
      (exprs: Seq[Expression]) => GraftExtensions.bm25Plan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("topk_tokens"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "topk_tokens"),
      (exprs: Seq[Expression]) => GraftExtensions.topkTokensPlan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("rrf"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "rrf"),
      (exprs: Seq[Expression]) => GraftExtensions.rrfPlan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("sample_budget"),
      new ExpressionInfo(GraftExtensions.getClass.getName,
        "sample_budget"),
      (exprs: Seq[Expression]) => GraftExtensions.sampleBudgetPlan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("normalize_text"),
      new ExpressionInfo(GraftExtensions.getClass.getName,
        "normalize_text"),
      (exprs: Seq[Expression]) => GraftExtensions.normalizeTextPlan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("corpus_shuffle"),
      new ExpressionInfo(GraftExtensions.getClass.getName,
        "corpus_shuffle"),
      (exprs: Seq[Expression]) => GraftExtensions.corpusShufflePlan(exprs)))
    // round-11 event-analytics + descriptive-statistics tier: every
    // operator family stays SQL-reachable
    ext.injectTableFunction((FunctionIdentifier("anomaly"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "anomaly"),
      (exprs: Seq[Expression]) => GraftExtensions.anomalyPlan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("retention"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "retention"),
      (exprs: Seq[Expression]) => GraftExtensions.retentionPlan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("event_funnel"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "event_funnel"),
      (exprs: Seq[Expression]) => GraftExtensions.eventFunnelPlan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("histogram"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "histogram"),
      (exprs: Seq[Expression]) => GraftExtensions.histogramPlan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("merge_upsert"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "merge_upsert"),
      (exprs: Seq[Expression]) => GraftExtensions.mergeUpsertPlan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("profile"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "profile"),
      (exprs: Seq[Expression]) => GraftExtensions.profilePlan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("scd2"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "scd2"),
      (exprs: Seq[Expression]) => GraftExtensions.scd2Plan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("dq_checks"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "dq_checks"),
      (exprs: Seq[Expression]) => GraftExtensions.dqChecksPlan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("drift"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "drift"),
      (exprs: Seq[Expression]) => GraftExtensions.driftPlan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("anomaly_mad"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "anomaly_mad"),
      (exprs: Seq[Expression]) => GraftExtensions.anomalyMadPlan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("sample_weighted"),
      new ExpressionInfo(GraftExtensions.getClass.getName,
        "sample_weighted"),
      (exprs: Seq[Expression]) => GraftExtensions.sampleWeightedPlan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("resample"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "resample"),
      (exprs: Seq[Expression]) => GraftExtensions.resamplePlan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("perplexity"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "perplexity"),
      (exprs: Seq[Expression]) => GraftExtensions.perplexityPlan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("pagerank"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "pagerank"),
      (exprs: Seq[Expression]) => GraftExtensions.pageRankPlan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("table_checksum"),
      new ExpressionInfo(GraftExtensions.getClass.getName,
        "table_checksum"),
      (exprs: Seq[Expression]) => GraftExtensions.tableChecksumPlan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("cooccur_pmi"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "cooccur_pmi"),
      (exprs: Seq[Expression]) => GraftExtensions.cooccurPmiPlan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("basket_rules"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "basket_rules"),
      (exprs: Seq[Expression]) => GraftExtensions.basketRulesPlan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("triangles"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "triangles"),
      (exprs: Seq[Expression]) => GraftExtensions.trianglesPlan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("ewma"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "ewma"),
      (exprs: Seq[Expression]) => GraftExtensions.ewmaPlan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("session_intervals"),
      new ExpressionInfo(GraftExtensions.getClass.getName,
        "session_intervals"),
      (exprs: Seq[Expression]) => GraftExtensions.sessionIntervalsPlan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("interval_join"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "interval_join"),
      (exprs: Seq[Expression]) => GraftExtensions.intervalJoinPlan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("label_prop"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "label_prop"),
      (exprs: Seq[Expression]) => GraftExtensions.labelPropPlan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("acf"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "acf"),
      (exprs: Seq[Expression]) => GraftExtensions.acfPlan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("fuzzy_join"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "fuzzy_join"),
      (exprs: Seq[Expression]) => GraftExtensions.fuzzyJoinPlan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("rolling_median"),
      new ExpressionInfo(GraftExtensions.getClass.getName,
        "rolling_median"),
      (exprs: Seq[Expression]) => GraftExtensions.rollingMedianPlan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("trend"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "trend"),
      (exprs: Seq[Expression]) => GraftExtensions.trendPlan(exprs)))
    // the decision-analytics tier (StatsOps) + BFS + text diversity
    ext.injectTableFunction((FunctionIdentifier("skyline"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "skyline"),
      (exprs: Seq[Expression]) => GraftExtensions.skylinePlan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("winsorize"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "winsorize"),
      (exprs: Seq[Expression]) => GraftExtensions.winsorizePlan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("ab_metrics"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "ab_metrics"),
      (exprs: Seq[Expression]) => GraftExtensions.abMetricsPlan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("shortest_path"),
      new ExpressionInfo(GraftExtensions.getClass.getName,
        "shortest_path"),
      (exprs: Seq[Expression]) => GraftExtensions.shortestPathPlan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("token_entropy"),
      new ExpressionInfo(GraftExtensions.getClass.getName,
        "token_entropy"),
      (exprs: Seq[Expression]) => GraftExtensions.tokenEntropyPlan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("ngram_topk"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "ngram_topk"),
      (exprs: Seq[Expression]) => GraftExtensions.ngramTopKPlan(exprs)))
    // the reconciliation / sequence-analytics / geo additions
    ext.injectTableFunction((FunctionIdentifier("table_diff"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "table_diff"),
      (exprs: Seq[Expression]) => GraftExtensions.tableDiffPlan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("gaps_islands"),
      new ExpressionInfo(GraftExtensions.getClass.getName,
        "gaps_islands"),
      (exprs: Seq[Expression]) => GraftExtensions.gapsIslandsPlan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("transitions"),
      new ExpressionInfo(GraftExtensions.getClass.getName,
        "transitions"),
      (exprs: Seq[Expression]) => GraftExtensions.transitionsPlan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("attribution"),
      new ExpressionInfo(GraftExtensions.getClass.getName,
        "attribution"),
      (exprs: Seq[Expression]) => GraftExtensions.attributionPlan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("benford"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "benford"),
      (exprs: Seq[Expression]) => GraftExtensions.benfordPlan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("geo_radius_join"),
      new ExpressionInfo(GraftExtensions.getClass.getName,
        "geo_radius_join"),
      (exprs: Seq[Expression]) =>
        GraftExtensions.geoRadiusJoinPlan(exprs)))
    // round-12 diagnostics / feature-engineering additions
    ext.injectTableFunction((FunctionIdentifier("crosstab_chi2"),
      new ExpressionInfo(GraftExtensions.getClass.getName,
        "crosstab_chi2"),
      (exprs: Seq[Expression]) =>
        GraftExtensions.crosstabChi2Plan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("key_skew"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "key_skew"),
      (exprs: Seq[Expression]) => GraftExtensions.keySkewPlan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("changepoint"),
      new ExpressionInfo(GraftExtensions.getClass.getName,
        "changepoint"),
      (exprs: Seq[Expression]) =>
        GraftExtensions.changepointPlan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("trailing_features"),
      new ExpressionInfo(GraftExtensions.getClass.getName,
        "trailing_features"),
      (exprs: Seq[Expression]) =>
        GraftExtensions.trailingFeaturesPlan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("rfm"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "rfm"),
      (exprs: Seq[Expression]) => GraftExtensions.rfmPlan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("join_size"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "join_size"),
      (exprs: Seq[Expression]) => GraftExtensions.joinSizePlan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("seasonality"),
      new ExpressionInfo(GraftExtensions.getClass.getName,
        "seasonality"),
      (exprs: Seq[Expression]) =>
        GraftExtensions.seasonalityPlan(exprs)))
    ext.injectTableFunction((FunctionIdentifier("lorenz_gini"),
      new ExpressionInfo(GraftExtensions.getClass.getName,
        "lorenz_gini"),
      (exprs: Seq[Expression]) => GraftExtensions.lorenzGiniPlan(exprs)))
    // round-13 tiers (hypothesis / fit / profile / stats / curation /
    // text additions) — every query family stays SQL-reachable
    val r13Tvfs: Seq[(String,
        Seq[Expression] =>
          org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)] = Seq(
      "ks_test" -> GraftExtensions.ksTestPlan _,
      "mann_whitney" -> GraftExtensions.mannWhitneyPlan _,
      "kruskal_wallis" -> GraftExtensions.kruskalWallisPlan _,
      "anova" -> GraftExtensions.anovaPlan _,
      "qq" -> GraftExtensions.qqPlan _,
      "mutual_info" -> GraftExtensions.mutualInfoPlan _,
      "cramers_v" -> GraftExtensions.cramersVPlan _,
      "kappa" -> GraftExtensions.kappaPlan _,
      "spearman" -> GraftExtensions.spearmanPlan _,
      "corr_matrix" -> GraftExtensions.corrMatrixPlan _,
      "group_ols" -> GraftExtensions.groupOlsPlan _,
      "theil_sen" -> GraftExtensions.theilSenPlan _,
      "xcorr" -> GraftExtensions.xcorrPlan _,
      "kaplan_meier" -> GraftExtensions.kaplanMeierPlan _,
      "cohort" -> GraftExtensions.cohortPlan _,
      "interarrival" -> GraftExtensions.interarrivalPlan _,
      "fd_profile" -> GraftExtensions.fdProfilePlan _,
      "candidate_keys" -> GraftExtensions.candidateKeysPlan _,
      "psi" -> GraftExtensions.psiPlan _,
      "hhi" -> GraftExtensions.hhiPlan _,
      "iqr_outliers" -> GraftExtensions.iqrOutliersPlan _,
      "mixture_alloc" -> GraftExtensions.mixtureAllocPlan _,
      "feature_scale" -> GraftExtensions.featureScalePlan _,
      "target_encode" -> GraftExtensions.targetEncodePlan _,
      "zipf_alpha" -> GraftExtensions.zipfAlphaPlan _,
      "t_test" -> GraftExtensions.tTestPlan _,
      "ols_multi" -> GraftExtensions.olsMultiPlan _,
      "theil_sen_strided" -> GraftExtensions.theilSenStridedPlan _,
      "spearman_matrix" -> GraftExtensions.spearmanMatrixPlan _,
      "perplexity_bigram" -> GraftExtensions.perplexityBigramPlan _,
      "js_divergence" -> GraftExtensions.jsDivergencePlan _,
      "partial_corr" -> GraftExtensions.partialCorrPlan _,
      "mann_kendall" -> GraftExtensions.mannKendallPlan _,
      "mahalanobis" -> GraftExtensions.mahalanobisPlan _,
      "embed_quant" -> GraftExtensions.embedQuantPlan _,
      "rank_normalize" -> GraftExtensions.rankNormalizePlan _,
      "kcore" -> GraftExtensions.kcorePlan _,
      "effect_size" -> GraftExtensions.effectSizePlan _,
      "nelson_aalen" -> GraftExtensions.nelsonAalenPlan _,
      "srm_check" -> GraftExtensions.srmCheckPlan _,
      "auc" -> GraftExtensions.aucPlan _,
      "calibration" -> GraftExtensions.calibrationPlan _,
      "pr_auc" -> GraftExtensions.prAucPlan _,
      // round-15 eval additions
      "threshold_sweep" -> GraftExtensions.thresholdSweepPlan _,
      "auc_by" -> GraftExtensions.aucByPlan _,
      "auc_ci" -> GraftExtensions.aucCiPlan _,
      "ranking_eval" -> GraftExtensions.rankingEvalPlan _,
      "feature_screen" -> GraftExtensions.featureScreenPlan _,
      "isotonic" -> GraftExtensions.isotonicPlan _,
      "embed_pca" -> GraftExtensions.embedPcaPlan _,
      "auc_compare" -> GraftExtensions.aucComparePlan _,
      "bootstrap_ci" -> GraftExtensions.bootstrapCiPlan _,
      "wasserstein" -> GraftExtensions.wassersteinPlan _,
      "cvm_test" -> GraftExtensions.cvmTestPlan _,
      "ks_by" -> GraftExtensions.ksByPlan _,
      "energy_distance" -> GraftExtensions.energyDistancePlan _,
      "lift_table" -> GraftExtensions.liftTablePlan _,
      "cuped" -> GraftExtensions.cupedPlan _,
      "delta_method" -> GraftExtensions.deltaMethodPlan _,
      "fdr_bh" -> GraftExtensions.fdrBhPlan _,
      "setsim_join" -> GraftExtensions.setSimJoinPlan _,
      "logit_fit" -> GraftExtensions.logitFitPlan _,
      "ipw_ate" -> GraftExtensions.ipwAtePlan _,
      "did_estimate" -> GraftExtensions.didEstimatePlan _,
      "propensity_match" -> GraftExtensions.propensityMatchPlan _,
      "power_analysis" -> GraftExtensions.powerAnalysisPlan _,
      "brier_decomp" -> GraftExtensions.brierDecompPlan _,
      "jarque_bera" -> GraftExtensions.jarqueBeraPlan _,
      "levene" -> GraftExtensions.levenePlan _,
      "tukey_hsd" -> GraftExtensions.tukeyHsdPlan _,
      "chisq_test" -> GraftExtensions.chisqTestPlan _,
      "iv_wald" -> GraftExtensions.ivWaldPlan _,
      "rdd_estimate" -> GraftExtensions.rddEstimatePlan _,
      "vif" -> GraftExtensions.vifPlan _,
      "woe_iv" -> GraftExtensions.woeIvPlan _,
      "hampel" -> GraftExtensions.hampelPlan _,
      "seasonal_decompose" -> GraftExtensions.seasonalDecomposePlan _,
      "readability" -> GraftExtensions.readabilityPlan _,
      "feature_hash" -> GraftExtensions.featureHashPlan _,
      "granger" -> GraftExtensions.grangerPlan _,
      "pacf" -> GraftExtensions.pacfPlan _,
      "mmr" -> GraftExtensions.mmrPlan _,
      "rolling_quantile" -> GraftExtensions.rollingQuantilePlan _,
      "logrank" -> GraftExtensions.logRankPlan _,
      "dickey_fuller" -> GraftExtensions.dickeyFullerPlan _,
      "mcnemar" -> GraftExtensions.mcnemarPlan _,
      "odds_ratio" -> GraftExtensions.oddsRatioPlan _,
      "msprt" -> GraftExtensions.msprtPlan _,
      "dist_fit" -> GraftExtensions.distFitPlan _,
      "ltv_curve" -> GraftExtensions.ltvCurvePlan _,
      "evt_gumbel" -> GraftExtensions.evtGumbelPlan _,
      "quantile_reg" -> GraftExtensions.quantileRegPlan _,
      "quantile_normalize" -> GraftExtensions.quantileNormalizePlan _,
      "forecast_baseline" -> GraftExtensions.forecastBaselinePlan _,
      "seq_entropy" -> GraftExtensions.seqEntropyPlan _,
      "eb_shrinkage" -> GraftExtensions.ebShrinkagePlan _,
      "rolling_corr" -> GraftExtensions.rollingCorrPlan _)
    r13Tvfs.foreach { case (name, builder) =>
      ext.injectTableFunction((FunctionIdentifier(name),
        new ExpressionInfo(GraftExtensions.getClass.getName, name),
        builder))
    }
  }
}

object GraftExtensions {

  import org.apache.spark.sql.{DataFrame, SparkSession}
  import org.apache.spark.sql.functions.{col, row_number}
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  import graft.operators.{AnnIndex, CurationOps, DedupOps, IvfIndex, IvfPqIndex, TextOps, VectorIndex}

  private def litVal(fn: String, name: String, e: Expression): Any = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"$fn expects a literal for '$name'; got ${e.sql}")
    val v = e.eval()
    if (v == null) throw new IllegalArgumentException(
      s"$fn expects a literal for '$name'; got NULL")
    v
  }

  private def litStr(fn: String, name: String, e: Expression): String =
    litVal(fn, name, e).toString

  private def litDouble(fn: String, name: String, e: Expression): Double =
    litVal(fn, name, e) match {
      case n: Number => n.doubleValue()
      // SQL fractional literals eval to Spark's internal Decimal
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case other => throw new IllegalArgumentException(
        s"$fn expects a numeric literal for '$name'; got $other")
    }

  private def litBool(fn: String, name: String, e: Expression): Boolean =
    litVal(fn, name, e) match {
      case b: java.lang.Boolean => b.booleanValue()
      case other => throw new IllegalArgumentException(
        s"$fn expects a BOOLEAN literal for '$name'; got $other")
    }

  private def arity(usage: String, exprs: Seq[Expression], min: Int,
      max: Int): Unit =
    if (exprs.length < min || exprs.length > max)
      throw new IllegalArgumentException(
        s"$usage — got ${exprs.length} arguments")

  /** Resolve a documents-contract table: must carry (doc_id, text). The
    * check runs at TVF-plan-build time so a misnamed/misshaped table
    * fails with the contract spelled out, not a downstream unresolved-
    * column error deep in the operator's plan. */
  private def docTable(fn: String, table: String): DataFrame = {
    val df = SparkSession.active.table(table)
    require(df.columns.contains("doc_id") && df.columns.contains("text"),
      s"$fn expects table '$table' to carry (doc_id, text) — the " +
        s"documents contract; found ${df.columns.mkString("(", ", ", ")")}")
    df
  }

  /** `knn_join(corpus, queries, k [, kind])` — the approximate kNN join
    * ([[graft.operators.VectorIndex.knnJoinWith]]) from PURE SQL:
    *
    * {{{
    *   SELECT * FROM knn_join('corpus_tbl', 'query_tbl', 5, 'ivfpq')
    * }}}
    *
    * Both tables must carry `(vec_id, embedding)`. `corpus` is either a
    * raw vector table — the index is built ONE-SHOT at the family's
    * defaults (`kind` ∈ ann | ivf | ivfpq, default ann) — or a DURABLE
    * index table written by the family's `writeTable`, detected (and
    * its family inferred, `kind` ignored) via the `_meta` sidecar: the
    * production path, where probes prune the bucketed layout and no
    * per-query build happens. Returns `(src_id, dst_id, cos_sim, rn)`
    * exactly as the Scala API does. */
  /** Shared corpus resolution of the ANN TVF family ([[knnJoinPlan]],
    * [[knnProbePlan]]): durable index tables dispatch on their `_meta`
    * sidecar ([[VectorIndex.detect]] — the sidecar schema names the
    * family). A COINCIDENTAL `<corpus>_meta` no family wrote does not
    * poison a valid raw vector table: detect returns None and the
    * one-shot build runs as if the decoy did not exist. The fallback
    * REFUSES a table that carries index-backing columns (sig/cell/
    * sketch/pqcode): that shape means a REAL durable index whose
    * sidecar is corrupted or version-skewed, and silently
    * one-shot-building over e.g. an LSH signature table (vec_ids
    * duplicated once per hash table) would return wrong top-k lists
    * with no error. */
  private def resolveIndex(fn: String, corpus: String,
      kind: String): VectorIndex = {
    val spark = SparkSession.active
    def oneShot(): VectorIndex = kind match {
      case "ann" => AnnIndex.build(spark.table(corpus),
        "vec_id", "embedding", persist = false)
      case "ivf" => IvfIndex.build(spark.table(corpus),
        "vec_id", "embedding", persist = false)
      case "ivfpq" => IvfPqIndex.build(spark.table(corpus),
        "vec_id", "embedding", persist = false)
      case other => throw new IllegalArgumentException(
        s"$fn kind '$other' — one of ann, ivf, ivfpq")
    }
    VectorIndex.detect(spark, corpus).getOrElse {
      val raw = spark.table(corpus).columns
      val indexCols = raw.filter(Set("sig", "cell", "sketch", "pqcode"))
      if (indexCols.nonEmpty) throw new IllegalArgumentException(
        s"table $corpus looks like a durable index backing (columns " +
          s"${indexCols.mkString(", ")}) but its ${corpus}_meta sidecar " +
          "is missing or of unrecognized shape — refusing to rebuild " +
          s"over index rows; restore the sidecar (the family's " +
          s"writeTable writes it) or point $fn at the raw vectors")
      else if (raw.contains("vec_id") && raw.contains("embedding"))
        oneShot()
      else throw new IllegalArgumentException(
        s"table $corpus is neither a durable index table (no recognized " +
          s"${corpus}_meta sidecar) nor a raw (vec_id, embedding) vector " +
          s"table — $fn serves AnnIndex, IvfIndex, and IvfPqIndex " +
          "durable tables, or builds one-shot from a raw vector table")
    }
  }

  private[graft] def knnJoinPlan(exprs: Seq[Expression]): LogicalPlan = {
    arity("knn_join(corpus_table, queries_table, k [, kind])", exprs, 3, 4)
    val spark = SparkSession.active
    val corpus = litStr("knn_join", "corpus_table", exprs(0))
    val queries = litStr("knn_join", "queries_table", exprs(1))
    val k = VectorOps.intArg("knn_join", "k", exprs(2))
    val kind = if (exprs.length > 3)
      litStr("knn_join", "kind", exprs(3)).toLowerCase else "ann"
    resolveIndex("knn_join", corpus, kind)
      .knnJoinWith(spark.table(queries), "vec_id", "embedding", k)
      .queryExecution.analyzed
  }

  /** `knn_probe(corpus_table, probe_id, k [, kind])` — the POINT-query
    * twin of [[knnJoinPlan]]: top-k neighbors of one INDEXED vector
    * from pure SQL.
    *
    * {{{
    *   SELECT * FROM knn_probe('corpus_tbl', 42, 10, 'ivfpq')
    * }}}
    *
    * Corpus resolution is [[resolveIndex]] exactly as `knn_join`
    * (durable sidecar detection, decoy fallback, index-shape refusal).
    * The probe runs through the family's [[VectorIndex.knnJoinWith]]
    * with the one-row query set `vec_id = probe_id` — the same
    * equi-join serving shape, bucket-prunable on a durable layout —
    * and the probe's cos=1 self-match is removed. Returns
    * `(vec_id, cos_sim, rn)`. */
  private[graft] def knnProbePlan(exprs: Seq[Expression]): LogicalPlan = {
    arity("knn_probe(corpus_table, probe_id, k [, kind])", exprs, 3, 4)
    val spark = SparkSession.active
    val corpus = litStr("knn_probe", "corpus_table", exprs(0))
    val probeId = litVal("knn_probe", "probe_id", exprs(1)) match {
      case n: Number => n.longValue()
      case other => throw new IllegalArgumentException(
        s"knn_probe expects an integral literal for 'probe_id'; got $other")
    }
    val k = VectorOps.intArg("knn_probe", "k", exprs(2))
    val kind = if (exprs.length > 3)
      litStr("knn_probe", "kind", exprs(3)).toLowerCase else "ann"
    val idx = resolveIndex("knn_probe", corpus, kind)
    // the probe row comes off the INDEX's own backing (works for both
    // durable tables and raw builds; knnJoinWith rescores exactly, so
    // the self-match is a clean cos=1 row to drop)
    val probe = idx.backing
      .filter(col("vec_id") === probeId)
      .select("vec_id", "embedding").limit(1)
    idx.knnJoinWith(probe, "vec_id", "embedding", k + 1)
      .filter(col("dst_id") =!= probeId)
      .orderBy(col("cos_sim").desc, col("dst_id"))
      .limit(k)
      .select(col("dst_id").as("vec_id"), col("cos_sim"),
        // global on purpose over the k probe-result rows (BoundedWindow)
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(graft.operators.BoundedWindow.key(col("dst_id")))
          .orderBy(col("cos_sim").desc, col("dst_id"))).as("rn"))
      .queryExecution.analyzed
  }

  /** `dedup_embedding(vec_table [, threshold])` — EXACT embedding-
    * cosine near-duplicate pairs ([[DedupOps.embeddingPairs]]) from
    * pure SQL: all pairs with cosine ≥ `threshold` (default 0.45),
    * `a_id < b_id`, computed through the distributed block-matrix
    * pair space (hash equi-join on block keys — no cartesian, no
    * nested-loop; the honest exact-quadratic distributed shape).
    * The table must carry `(vec_id, embedding)`. Returns
    * `(a_id, b_id, cos_sim)`. */
  private[graft] def dedupEmbeddingPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("dedup_embedding(vec_table [, threshold])", exprs, 1, 2)
    val name = litStr("dedup_embedding", "vec_table", exprs(0))
    val df = SparkSession.active.table(name)
    require(df.columns.contains("vec_id") &&
        df.columns.contains("embedding"),
      s"dedup_embedding expects table '$name' to carry " +
        s"(vec_id, embedding); found " +
        df.columns.mkString("(", ", ", ")"))
    val thr = if (exprs.length > 1)
      litDouble("dedup_embedding", "threshold", exprs(1)) else 0.45
    DedupOps.embeddingPairs(df, "vec_id", "embedding", thr)
      .queryExecution.analyzed
  }

  /** `dedup_semantic(vec_table [, threshold [, n_clusters]])` —
    * SemDeDup-style clustered semantic dedup
    * ([[DedupOps.semanticDedup]]): deterministic Lloyd clustering, then
    * exact cosine pairs WITHIN clusters only, keep-lowest-id. Returns
    * `(vec_id, cell, keeper)`. `n_clusters` 0 = the quantizer's auto
    * policy (4·√n). */
  private[graft] def dedupSemanticPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("dedup_semantic(vec_table [, threshold [, n_clusters]])",
      exprs, 1, 3)
    val name = litStr("dedup_semantic", "vec_table", exprs(0))
    val df = SparkSession.active.table(name)
    require(df.columns.contains("vec_id") &&
        df.columns.contains("embedding"),
      s"dedup_semantic expects table '$name' to carry " +
        s"(vec_id, embedding); found " +
        df.columns.mkString("(", ", ", ")"))
    val thr = if (exprs.length > 1)
      litDouble("dedup_semantic", "threshold", exprs(1)) else 0.45
    val k = if (exprs.length > 2)
      VectorOps.intArg("dedup_semantic", "n_clusters", exprs(2)) else 0
    require(k >= 0,
      s"dedup_semantic n_clusters must be >= 0 (0 = auto), got $k")
    DedupOps.semanticDedup(df, "vec_id", "embedding", thr, k)
      .queryExecution.analyzed
  }

  /** `dedup_pairs(doc_table [, threshold])` — MinHash+LSH near-duplicate
    * pairs ([[DedupOps.minhashPairs]]) from pure SQL:
    *
    * {{{
    *   SELECT * FROM dedup_pairs('documents', 0.5)
    * }}}
    *
    * Returns `(a_id, b_id, jacc)` with a_id < b_id and exact Jaccard ≥
    * `threshold` (default 0.5) — the collapse-first capped-bucket
    * pipeline, not an all-pairs join. */
  private[graft] def dedupPairsPlan(exprs: Seq[Expression]): LogicalPlan = {
    arity("dedup_pairs(doc_table [, threshold])", exprs, 1, 2)
    val df = docTable("dedup_pairs", litStr("dedup_pairs", "doc_table",
      exprs(0)))
    val thr = if (exprs.length > 1)
      litDouble("dedup_pairs", "threshold", exprs(1)) else 0.5
    DedupOps.minhashPairs(df, "doc_id", "text", thr)
      .queryExecution.analyzed
  }

  /** `dedup_clusters(doc_table [, threshold])` — near-duplicate
    * connected components over the LSH edge set
    * ([[DedupOps.nearDupClusters]]): every document labeled with its
    * cluster's minimal id and a `keeper` flag (the dedup survivor).
    * Returns `(doc_id, cluster_id, keeper)`; singletons cluster as
    * themselves. */
  private[graft] def dedupClustersPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("dedup_clusters(doc_table [, threshold])", exprs, 1, 2)
    val df = docTable("dedup_clusters", litStr("dedup_clusters",
      "doc_table", exprs(0)))
    val thr = if (exprs.length > 1)
      litDouble("dedup_clusters", "threshold", exprs(1)) else 0.5
    DedupOps.nearDupClusters(
      DedupOps.nearDupEdges(df, "doc_id", "text", thr),
      df.select("doc_id"), "doc_id").queryExecution.analyzed
  }

  /** `substring_scrub(doc_table [, k [, keep_first]])` — the ExactSubstr
    * scrub ([[DedupOps.scrubDuplicatePassages]]): tokens covered by any
    * corpus-duplicated ≥`k`-gram (default 8) are removed; with
    * `keep_first` (default false) the minimal (doc_id, pos) occurrence
    * of each duplicated gram survives. Returns
    * `(doc_id, n_kept, scrubbed)`. */
  private[graft] def substringScrubPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("substring_scrub(doc_table [, k [, keep_first]])", exprs, 1, 3)
    val df = docTable("substring_scrub", litStr("substring_scrub",
      "doc_table", exprs(0)))
    val k = if (exprs.length > 1)
      VectorOps.intArg("substring_scrub", "k", exprs(1)) else 8
    val keepFirst = if (exprs.length > 2)
      litBool("substring_scrub", "keep_first", exprs(2)) else false
    DedupOps.scrubDuplicatePassages(df, "doc_id", "text", k,
      keepFirst = keepFirst).queryExecution.analyzed
  }

  /** `chunk_docs(doc_table [, max_tokens [, overlap]])` — fixed-window
    * pretraining chunking ([[CurationOps.chunkDocuments]]): chunks of at
    * most `max_tokens` (default 32) whitespace tokens, consecutive
    * chunks sharing `overlap` (default 4) tokens of left context.
    * Returns `(doc_id, chunk_id, n_tokens, chunk)`. */
  private[graft] def chunkDocsPlan(exprs: Seq[Expression]): LogicalPlan = {
    arity("chunk_docs(doc_table [, max_tokens [, overlap]])", exprs, 1, 3)
    val df = docTable("chunk_docs", litStr("chunk_docs", "doc_table",
      exprs(0)))
    val maxTokens = if (exprs.length > 1)
      VectorOps.intArg("chunk_docs", "max_tokens", exprs(1)) else 32
    val overlap = if (exprs.length > 2)
      VectorOps.intArg("chunk_docs", "overlap", exprs(2)) else 4
    CurationOps.chunkDocuments(df, "doc_id", "text", maxTokens, overlap)
      .queryExecution.analyzed
  }

  /** `curation_funnel(doc_table [, with_clusters])` — the per-stratum
    * curation survival report ([[CurationOps.funnelReport]]) over the
    * engine's documents contract (strata = source, lang; the synthetic
    * corpus layout). `with_clusters = true` additionally runs the
    * LSH + connected-components chain over the table and reports
    * near-dup-keeper survival (`n_nd_keepers`, `n_final_nd`) — the
    * heavy production mix; default false reports exact-dedup × quality
    * survival only. */
  private[graft] def curationFunnelPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("curation_funnel(doc_table [, with_clusters])", exprs, 1, 2)
    val df = docTable("curation_funnel", litStr("curation_funnel",
      "doc_table", exprs(0)))
    require(df.columns.contains("source") && df.columns.contains("lang"),
      "curation_funnel strata are (source, lang) — the documents " +
        s"contract; found ${df.columns.mkString("(", ", ", ")")}")
    val withClusters = if (exprs.length > 1)
      litBool("curation_funnel", "with_clusters", exprs(1)) else false
    val ck = if (withClusters) Some(DedupOps.nearDupClusters(
      DedupOps.nearDupEdges(df, "doc_id", "text", 0.5),
      df.select("doc_id"), "doc_id")) else None
    CurationOps.funnelReport(df, "doc_id", "text", Seq("source", "lang"),
      clusterKeepers = ck).queryExecution.analyzed
  }

  /** `pii_scrub(doc_table)` — PII redaction
    * ([[CurationOps.scrubPii]]): email addresses and ≥6-digit runs in
    * `text` replaced with `<EMAIL>` / `<ID>`. A pure narrow codegen'd
    * map — the shape a 100 TB scrub wants. Returns
    * `(doc_id, scrubbed)`. */
  private[graft] def piiScrubPlan(exprs: Seq[Expression]): LogicalPlan = {
    arity("pii_scrub(doc_table)", exprs, 1, 1)
    val df = docTable("pii_scrub", litStr("pii_scrub", "doc_table",
      exprs(0)))
    df.select(col("doc_id"),
        CurationOps.scrubPii(col("text")).as("scrubbed"))
      .queryExecution.analyzed
  }

  /** `quality_filter(doc_table [, min_tokens [, max_tokens [,
    * min_stop_ratio [, max_avg_tok_len]]]])` — the Gopher-style
    * composite quality filter ([[CurationOps.qualityFilter]]):
    * survivors are rows inside the token-count band with at least the
    * stopword ratio and at most the average token length. Returns the
    * input columns plus the computed quality metrics
    * (`n_tokens`, `avg_tok_len`, `stop_ratio`). */
  private[graft] def qualityFilterPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("quality_filter(doc_table [, min_tokens [, max_tokens [, " +
      "min_stop_ratio [, max_avg_tok_len]]]])", exprs, 1, 5)
    val df = docTable("quality_filter", litStr("quality_filter",
      "doc_table", exprs(0)))
    val minTokens = if (exprs.length > 1)
      VectorOps.intArg("quality_filter", "min_tokens", exprs(1)) else 20
    val maxTokens = if (exprs.length > 2)
      VectorOps.intArg("quality_filter", "max_tokens", exprs(2)) else 80
    val minStop = if (exprs.length > 3)
      litDouble("quality_filter", "min_stop_ratio", exprs(3)) else 0.02
    val maxAvg = if (exprs.length > 4)
      litDouble("quality_filter", "max_avg_tok_len", exprs(4)) else 5.0
    CurationOps.qualityFilter(df, "text", minTokens, maxTokens, minStop,
      maxAvg).queryExecution.analyzed
  }

  /** `split_assign(doc_table [, train_cut [, val_cut]])` —
    * deterministic train/val/test assignment
    * ([[CurationOps.hashSplit]]) from the 16-bit md5 draw of `doc_id`:
    * draws under `train_cut` (default 52429 ≈ 80%) are `train`, under
    * `val_cut` (default 58982 ≈ +10%) `val`, the rest `test`. Returns
    * the input columns plus `split`. */
  private[graft] def splitAssignPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("split_assign(doc_table [, train_cut [, val_cut]])", exprs, 1, 3)
    val df = docTable("split_assign", litStr("split_assign", "doc_table",
      exprs(0)))
    val trainCut = if (exprs.length > 1)
      VectorOps.intArg("split_assign", "train_cut", exprs(1)) else 52429
    val valCut = if (exprs.length > 2)
      VectorOps.intArg("split_assign", "val_cut", exprs(2)) else 58982
    CurationOps.hashSplit(df, "doc_id", trainCut, valCut)
      .queryExecution.analyzed
  }

  /** `decontaminate(corpus_table, benchmark_table [, k])` — benchmark
    * decontamination ([[CurationOps.decontaminate]]): corpus documents
    * sharing any `k`-gram (default 3) shingle with any benchmark
    * document drop; the benchmark's shingle set broadcasts, so the
    * corpus side is one shuffle-free probe pass at any scale. Both
    * tables carry the documents contract. Returns the CLEAN corpus
    * remainder. */
  private[graft] def decontaminatePlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("decontaminate(corpus_table, benchmark_table [, k])", exprs,
      2, 3)
    val corpus = docTable("decontaminate", litStr("decontaminate",
      "corpus_table", exprs(0)))
    // the benchmark side only contributes its shingle set — `text` is
    // the whole contract (a (prompt_id, text) eval table qualifies;
    // requiring doc_id here would reject tables the Scala API accepts)
    val benchName = litStr("decontaminate", "benchmark_table", exprs(1))
    val bench = SparkSession.active.table(benchName)
    require(bench.columns.contains("text"),
      s"decontaminate expects benchmark table '$benchName' to carry a " +
        s"text column; found ${bench.columns.mkString("(", ", ", ")")}")
    val k = if (exprs.length > 2)
      VectorOps.intArg("decontaminate", "k", exprs(2)) else 3
    CurationOps.decontaminate(corpus, "doc_id", "text", bench, "text", k)
      .queryExecution.analyzed
  }

  /** `pack_sequences(doc_table, strata_col [, pack_tokens])` — greedy
    * fixed-context sequence packing ([[CurationOps.packSequences]]):
    * within each stratum (ordered by `doc_id`) documents land in the
    * `floor(running_tokens / pack_tokens)` pack (default 2048). The
    * stratum column must exist on the table — it is the packing
    * parallelism unit. Returns
    * `(doc_id, <strata_col>, n_tokens, pack_id)`. */
  private[graft] def packSequencesPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("pack_sequences(doc_table, strata_col [, pack_tokens])", exprs,
      2, 3)
    val df = docTable("pack_sequences", litStr("pack_sequences",
      "doc_table", exprs(0)))
    val strata = litStr("pack_sequences", "strata_col", exprs(1))
    require(df.columns.contains(strata),
      s"pack_sequences strata_col '$strata' is not a column of the " +
        s"table; found ${df.columns.mkString("(", ", ", ")")}")
    val packTokens = if (exprs.length > 2)
      VectorOps.intArg("pack_sequences", "pack_tokens", exprs(2)) else 2048
    CurationOps.packSequences(df, "doc_id", "text", strata, packTokens)
      .queryExecution.analyzed
  }

  /** `sample_budget(doc_table, budget_tokens)` — token-budget sampling
    * ([[CurationOps.sampleTokenBudget]]): the budget-length prefix of
    * the derandomized corpus shuffle, via a two-level distributed
    * prefix sum. Returns `(doc_id, n_tokens, cum_tokens)`. */
  private[graft] def sampleBudgetPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("sample_budget(doc_table, budget_tokens)", exprs, 2, 2)
    val df = docTable("sample_budget", litStr("sample_budget",
      "doc_table", exprs(0)))
    val budget = litVal("sample_budget", "budget_tokens", exprs(1)) match {
      case n: Number => n.longValue()
      case v => throw new IllegalArgumentException(
        s"sample_budget budget_tokens must be a number, got $v")
    }
    require(budget > 0,
      s"sample_budget budget_tokens must be > 0, got $budget")
    CurationOps.sampleTokenBudget(df, "doc_id", "text", budget)
      .queryExecution.analyzed
  }

  /** `lang_id(doc_table)` — the stopword-marker language-ID heuristic
    * ([[TextOps.withLangId]]) from pure SQL: a codegen'd narrow map, no
    * shuffle. Returns `(doc_id, pred_lang)` with pred_lang ∈
    * en | de | fr | es (fixed tie order). */
  private[graft] def langIdPlan(exprs: Seq[Expression]): LogicalPlan = {
    arity("lang_id(doc_table)", exprs, 1, 1)
    val df = docTable("lang_id", litStr("lang_id", "doc_table", exprs(0)))
    TextOps.withLangId(df, "text")
      .select("doc_id", "pred_lang").queryExecution.analyzed
  }

  /** `text_quality(doc_table)` — pretraining-filter quality signals
    * ([[TextOps.withQuality]]): token count, mean token length,
    * stopword ratio, length bucket. Narrow map. Returns
    * `(doc_id, n_tokens, avg_tok_len, stop_ratio, len_bucket)`. */
  private[graft] def textQualityPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("text_quality(doc_table)", exprs, 1, 1)
    val df = docTable("text_quality", litStr("text_quality", "doc_table",
      exprs(0)))
    TextOps.withQuality(df, "text")
      .select("doc_id", "n_tokens", "avg_tok_len", "stop_ratio",
        "len_bucket").queryExecution.analyzed
  }

  /** `token_count(doc_table)` — the token-budget estimators
    * ([[TextOps.withTokenCounts]]): whitespace tokens and a BPE-ish
    * regex count. Narrow map. Returns
    * `(doc_id, ws_tokens, re_tokens)`. */
  private[graft] def tokenCountPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("token_count(doc_table)", exprs, 1, 1)
    val df = docTable("token_count", litStr("token_count", "doc_table",
      exprs(0)))
    TextOps.withTokenCounts(df, "text")
      .select("doc_id", "ws_tokens", "re_tokens").queryExecution.analyzed
  }

  /** `repetition_stats(doc_table)` — Gopher-style repetition signals
    * ([[TextOps.withRepetition]]): duplicate-token and duplicate-3-gram
    * fractions per document, both in [0,1]. Single-pass codegen'd
    * narrow map (the shingle set rides the native ShingleHashVec
    * expression — no explode, no aggregate). Returns
    * `(doc_id, dup_token_ratio, dup_3gram_ratio)`. */
  private[graft] def repetitionStatsPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("repetition_stats(doc_table)", exprs, 1, 1)
    val df = docTable("repetition_stats", litStr("repetition_stats",
      "doc_table", exprs(0)))
    TextOps.withRepetition(df, "text")
      .select("doc_id", "dup_token_ratio", "dup_3gram_ratio")
      .queryExecution.analyzed
  }

  /** `normalize_text(doc_table)` — canonical cleanup
    * ([[TextOps.normalizeText]]): Unicode NFC, control/whitespace runs
    * collapsed to one space, trimmed. Codegen'd narrow map. Returns
    * `(doc_id, clean)`. */
  private[graft] def normalizeTextPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("normalize_text(doc_table)", exprs, 1, 1)
    val df = docTable("normalize_text", litStr("normalize_text",
      "doc_table", exprs(0)))
    df.select(col("doc_id"),
        TextOps.normalizeText(col("text")).as("clean"))
      .queryExecution.analyzed
  }

  /** `corpus_shuffle(doc_table [, n_shards])` — deterministic global
    * shuffle + shard assignment for training export
    * ([[CurationOps.corpusShuffle]]): md5-ordered within md5-assigned
    * shards, reproducible across runs and engines. One narrow map plus
    * one per-shard window. Returns `(doc_id, shard, pos)`. */
  private[graft] def corpusShufflePlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("corpus_shuffle(doc_table [, n_shards])", exprs, 1, 2)
    val df = docTable("corpus_shuffle", litStr("corpus_shuffle",
      "doc_table", exprs(0)))
    val nShards = if (exprs.length > 1)
      VectorOps.intArg("corpus_shuffle", "n_shards", exprs(1)) else 8
    require(nShards > 0, s"corpus_shuffle n_shards must be > 0, got $nShards")
    CurationOps.corpusShuffle(df, "doc_id", nShards)
      .select("doc_id", "shard", "pos").queryExecution.analyzed
  }

  /** `doc_fingerprint(doc_table)` — 1-permutation MinHash document
    * fingerprint ([[TextOps.withFingerprint]]): min over 5-gram shingle
    * md5s, the rolling-hash primitive exact-dedup groups on. Narrow
    * map. Returns `(doc_id, fp)`. */
  private[graft] def docFingerprintPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("doc_fingerprint(doc_table)", exprs, 1, 1)
    val df = docTable("doc_fingerprint", litStr("doc_fingerprint",
      "doc_table", exprs(0)))
    TextOps.withFingerprint(df, "text")
      .select("doc_id", "fp").queryExecution.analyzed
  }

  /** `tfidf_topk(doc_table [, k])` — top-`k` (default 3) TF-IDF terms
    * per document ([[TextOps.tfidfTopK]], the rational variant:
    * (tf/len)·(N/df), no libm log). One token explode feeding map-side-
    * combined aggregates + a per-doc window top-k. Returns
    * `(doc_id, tok, score, rk)` ordered by (doc_id, rk). */
  private[graft] def tfidfTopKPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("tfidf_topk(doc_table [, k])", exprs, 1, 2)
    val df = docTable("tfidf_topk", litStr("tfidf_topk", "doc_table",
      exprs(0)))
    val k = if (exprs.length > 1)
      VectorOps.intArg("tfidf_topk", "k", exprs(1)) else 3
    require(k > 0, s"tfidf_topk k must be positive; got $k")
    TextOps.tfidfTopK(df, "doc_id", "text", k).queryExecution.analyzed
  }

  /** `topk_tokens(doc_table [, k [, max_map_size]])` — approximate
    * top-`k` (default 20) corpus tokens via one mergeable
    * frequent-items sketch ([[TextOps.topkTokensApprox]]):
    *
    * {{{
    *   SELECT * FROM topk_tokens('documents', 50)
    * }}}
    *
    * Returns `(tok, est, lower, upper)` best-first; every token whose
    * true count exceeds the sketch's max error is guaranteed present
    * (NO_FALSE_NEGATIVES), and `lower ≤ true ≤ upper` per row. The
    * shuffle carries one ≤`max_map_size` sketch per partition — the
    * 100 TB-safe shape of the exact token groupBy. */
  private[graft] def topkTokensPlan(exprs: Seq[Expression]): LogicalPlan = {
    arity("topk_tokens(doc_table [, k [, max_map_size]])", exprs, 1, 3)
    val df = docTable("topk_tokens", litStr("topk_tokens", "doc_table",
      exprs(0)))
    val k = if (exprs.length > 1)
      VectorOps.intArg("topk_tokens", "k", exprs(1)) else 20
    require(k > 0, s"topk_tokens k must be positive; got $k")
    val m = if (exprs.length > 2)
      VectorOps.intArg("topk_tokens", "max_map_size", exprs(2)) else 1024
    TextOps.topkTokensApprox(df, "text", k, m).queryExecution.analyzed
  }

  /** `bm25(doc_table, terms)` — Okapi BM25 relevance of every document
    * against a space-separated query-term string
    * ([[graft.operators.TextOps.bm25]]):
    *
    * {{{
    *   SELECT * FROM bm25('documents', 'join filter scan')
    * }}}
    *
    * Returns `(doc_id, bm25)` for documents matching ≥1 term, best
    * first. Standard k1=1.2 / b=0.75. */
  private[graft] def bm25Plan(exprs: Seq[Expression]): LogicalPlan = {
    arity("bm25(doc_table, terms)", exprs, 2, 2)
    val df = docTable("bm25", litStr("bm25", "doc_table", exprs(0)))
    val terms = litStr("bm25", "terms", exprs(1)).trim.split("\\s+").toSeq
    require(terms.nonEmpty && terms.head.nonEmpty,
      "bm25 terms must contain at least one token")
    TextOps.bm25(df, "doc_id", "text", terms).queryExecution.analyzed
  }

  /** `rrf(doc_table, vec_table, terms, probe_id [, k])` — hybrid
    * retrieval: reciprocal-rank fusion of the BM25 top-k against
    * `terms` with the exact cosine top-k around `probe_id`
    * ([[graft.operators.SimilarityOps.hybridRrf]]):
    *
    * {{{
    *   SELECT * FROM rrf('documents', 'embeddings', 'join filter scan', 0)
    * }}}
    *
    * Returns `(doc_id, rrf, n_lists)`, fused-best first. */
  private[graft] def rrfPlan(exprs: Seq[Expression]): LogicalPlan = {
    arity("rrf(doc_table, vec_table, terms, probe_id [, k])", exprs, 4, 5)
    val docs = docTable("rrf", litStr("rrf", "doc_table", exprs(0)))
    val vecs = namedTable("rrf", litStr("rrf", "vec_table", exprs(1)),
      Seq("vec_id", "embedding"))
    val terms = litStr("rrf", "terms", exprs(2)).trim.split("\\s+").toSeq
    require(terms.nonEmpty && terms.head.nonEmpty,
      "rrf terms must contain at least one token")
    val probeId = VectorOps.intArg("rrf", "probe_id", exprs(3)).toLong
    val k = if (exprs.length > 4) VectorOps.intArg("rrf", "k", exprs(4))
      else 50
    require(k > 0, s"rrf k must be positive; got $k")
    graft.operators.SimilarityOps.hybridRrf(docs, vecs, terms, probeId, k)
      .queryExecution.analyzed
  }

  /** Resolve a table and verify it carries `cols`, failing at TVF
    * plan-build time with the expectation spelled out. */
  private def namedTable(fn: String, table: String,
      cols: Seq[String]): DataFrame = {
    val df = SparkSession.active.table(table)
    cols.foreach(c => require(df.columns.contains(c),
      s"$fn expects table '$table' to carry " +
        cols.mkString("(", ", ", ")") +
        s"; found ${df.columns.mkString("(", ", ", ")")}"))
    df
  }

  /** `anomaly(table, group_col, id_col, value_col [, z])` — per-group
    * z-score outlier rows ([[graft.operators.EventOps.anomaly]]):
    * DECIMAL-exact group moments broadcast back over a narrow scoring
    * scan. Returns `(id, group, value, z)` ordered by id. */
  private[graft] def anomalyPlan(exprs: Seq[Expression]): LogicalPlan = {
    arity("anomaly(table, group_col, id_col, value_col [, z])",
      exprs, 4, 5)
    val Seq(g, id, v) = (1 to 3).map(i =>
      litStr("anomaly", Seq("group_col", "id_col", "value_col")(i - 1),
        exprs(i)))
    val df = namedTable("anomaly", litStr("anomaly", "table", exprs(0)),
      Seq(g, id, v))
    val z = if (exprs.length > 4) litDouble("anomaly", "z", exprs(4))
      else 3.0
    require(z > 0, s"anomaly z must be positive; got $z")
    graft.operators.EventOps.anomaly(df, g, id, v, z)
      .queryExecution.analyzed
  }

  /** `retention(table, user_col, ts_col)` — cohort retention triangle
    * ([[graft.operators.EventOps.retention]]). Returns
    * `(cohort_day, day_offset, users)`. */
  private[graft] def retentionPlan(exprs: Seq[Expression]): LogicalPlan = {
    arity("retention(table, user_col, ts_col)", exprs, 3, 3)
    val u = litStr("retention", "user_col", exprs(1))
    val t = litStr("retention", "ts_col", exprs(2))
    val df = namedTable("retention",
      litStr("retention", "table", exprs(0)), Seq(u, t))
    graft.operators.EventOps.retention(df, u, t).queryExecution.analyzed
  }

  /** `event_funnel(table, user_col, type_col, ts_col, stages)` —
    * strict-ordered first-touch funnel counts through the
    * space-separated `stages` ([[graft.operators.EventOps.funnel]]).
    * Returns `(stage_idx, stage, users)`. */
  private[graft] def eventFunnelPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("event_funnel(table, user_col, type_col, ts_col, stages)",
      exprs, 5, 5)
    val u = litStr("event_funnel", "user_col", exprs(1))
    val ty = litStr("event_funnel", "type_col", exprs(2))
    val t = litStr("event_funnel", "ts_col", exprs(3))
    val df = namedTable("event_funnel",
      litStr("event_funnel", "table", exprs(0)), Seq(u, ty, t))
    val stages = litStr("event_funnel", "stages", exprs(4)).trim
      .split("\\s+").toSeq
    require(stages.nonEmpty && stages.head.nonEmpty,
      "event_funnel stages must contain at least one stage name")
    graft.operators.EventOps.funnel(df, u, ty, t, stages)
      .queryExecution.analyzed
  }

  /** `histogram(table, column, width)` — fixed-width histogram of a
    * numeric column ([[graft.operators.RelationalOps.histogram]]).
    * Returns `(bucket, bin_lo, n)` ordered by bucket. */
  private[graft] def histogramPlan(exprs: Seq[Expression]): LogicalPlan = {
    arity("histogram(table, column, width)", exprs, 3, 3)
    val c = litStr("histogram", "column", exprs(1))
    val df = namedTable("histogram",
      litStr("histogram", "table", exprs(0)), Seq(c))
    val w = litDouble("histogram", "width", exprs(2))
    require(w > 0, s"histogram width must be positive; got $w")
    graft.operators.RelationalOps.histogram(df, c, w)
      .queryExecution.analyzed
  }

  /** `merge_upsert(base_table, updates_table, key)` — SCD-1 merge
    * ([[graft.operators.RelationalOps.mergeUpsert]]): one full-outer
    * equi-join on `key`; identical schemas required. Returns the base
    * schema plus an `action` tag (update / insert / keep). */
  private[graft] def mergeUpsertPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("merge_upsert(base_table, updates_table, key)", exprs, 3, 3)
    val key = litStr("merge_upsert", "key", exprs(2))
    val base = namedTable("merge_upsert",
      litStr("merge_upsert", "base_table", exprs(0)), Seq(key))
    val updates = namedTable("merge_upsert",
      litStr("merge_upsert", "updates_table", exprs(1)), Seq(key))
    graft.operators.RelationalOps.mergeUpsert(base, updates, key)
      .queryExecution.analyzed
  }

  /** `profile(table, cols)` — one-scan per-column profiling
    * ([[graft.operators.RelationalOps.profile]]); `cols` is a
    * space-separated numeric-column list. Returns one row per column:
    * `(col_name, n_values, n_nulls, n_distinct, min_v, max_v, mean_v,
    * stddev_v)`. */
  private[graft] def profilePlan(exprs: Seq[Expression]): LogicalPlan = {
    arity("profile(table, cols)", exprs, 2, 2)
    val cols = litStr("profile", "cols", exprs(1)).trim.split("\\s+").toSeq
    require(cols.nonEmpty && cols.head.nonEmpty,
      "profile cols must contain at least one column name")
    val df = namedTable("profile",
      litStr("profile", "table", exprs(0)), cols)
    graft.operators.RelationalOps.profile(df, cols)
      .queryExecution.analyzed
  }

  /** `scd2(table, key, value, ts, tie)` — SCD-2 dimension build
    * ([[graft.operators.RelationalOps.scd2Build]]): change detection
    * plus validity-interval assembly via per-key windows; `tie` totals
    * the per-key order under duplicate timestamps and rides along as
    * `src_key`. Returns `(key, value, valid_from, valid_to, src_key,
    * is_current)`. */
  private[graft] def scd2Plan(exprs: Seq[Expression]): LogicalPlan = {
    arity("scd2(table, key, value, ts, tie)", exprs, 5, 5)
    val Seq(k, v, t, tie) = (1 to 4).map(i =>
      litStr("scd2", Seq("key", "value", "ts", "tie")(i - 1), exprs(i)))
    val df = namedTable("scd2", litStr("scd2", "table", exprs(0)),
      Seq(k, v, t, tie))
    graft.operators.RelationalOps.scd2Build(df, k, v, t, tie)
      .queryExecution.analyzed
  }

  /** `dq_checks(table, spec)` — declarative data-quality report
    * ([[graft.operators.ConstraintOps.dqReport]]). `spec` is a
    * space-separated check list:
    *
    * {{{
    *   not_null:<col>  range:<col>:<lo>:<hi>  unique:<col>
    *   ref:<fk_col>:<dim_table>:<pk_col>
    * }}}
    *
    * e.g. `SELECT * FROM dq_checks('lineitem',
    * 'not_null:l_orderkey range:l_discount:0:1
    * ref:l_orderkey:orders:o_orderkey')`. Returns `(check_name,
    * violations)` ordered by name; scalar checks fuse into one scan. */
  private[graft] def dqChecksPlan(exprs: Seq[Expression]): LogicalPlan = {
    import graft.operators.ConstraintOps
    arity("dq_checks(table, spec)", exprs, 2, 2)
    val df = SparkSession.active.table(
      litStr("dq_checks", "table", exprs(0)))
    val items = litStr("dq_checks", "spec", exprs(1)).trim.split("\\s+")
      .toSeq.filter(_.nonEmpty)
    require(items.nonEmpty, "dq_checks spec must contain at least one check")
    val checks = items.map { item =>
      item.split(":").toSeq match {
        case Seq("not_null", c) => ConstraintOps.NotNull(c)
        case Seq("range", c, lo, hi) =>
          ConstraintOps.InRange(c, lo.toDouble, hi.toDouble)
        case Seq("unique", c) => ConstraintOps.UniqueKey(c)
        case Seq("ref", fk, dimTable, pk) =>
          ConstraintOps.RefIntegrity(fk,
            namedTable("dq_checks", dimTable, Seq(pk)), dimTable, pk)
        case _ => throw new IllegalArgumentException(
          s"dq_checks: unrecognized check '$item' — expected " +
            "not_null:<col>, range:<col>:<lo>:<hi>, unique:<col>, or " +
            "ref:<fk_col>:<dim_table>:<pk_col>")
      }
    }
    checks.collect {
      case c: ConstraintOps.NotNull => c.col
      case c: ConstraintOps.InRange => c.col
      case c: ConstraintOps.UniqueKey => c.col
      case c: ConstraintOps.RefIntegrity => c.fkCol
    }.foreach(c => require(df.columns.contains(c),
      s"dq_checks: column '$c' not found in " +
        df.columns.mkString("(", ", ", ")")))
    ConstraintOps.dqReport(df, checks).queryExecution.analyzed
  }

  /** `drift(table, group_col, value_col, period_col, width)` —
    * population-stability-index drift between the `period_col`=0
    * baseline and =1 current populations per group
    * ([[graft.operators.EventOps.drift]]). Returns `(group, psi)`. */
  private[graft] def driftPlan(exprs: Seq[Expression]): LogicalPlan = {
    arity("drift(table, group_col, value_col, period_col, width)",
      exprs, 5, 5)
    val Seq(g, v, per) = (1 to 3).map(i => litStr("drift",
      Seq("group_col", "value_col", "period_col")(i - 1), exprs(i)))
    val df = namedTable("drift", litStr("drift", "table", exprs(0)),
      Seq(g, v, per))
    val w = litDouble("drift", "width", exprs(4))
    require(w > 0, s"drift width must be positive; got $w")
    graft.operators.EventOps.drift(df, g, v, per, w)
      .queryExecution.analyzed
  }

  /** `anomaly_mad(table, group_col, id_col, value_col [, z])` — robust
    * median/MAD outliers (modified z-score, default cut 3.5;
    * [[graft.operators.EventOps.anomalyMad]]). */
  private[graft] def anomalyMadPlan(exprs: Seq[Expression]): LogicalPlan = {
    arity("anomaly_mad(table, group_col, id_col, value_col [, z])",
      exprs, 4, 5)
    val Seq(g, id, v) = (1 to 3).map(i => litStr("anomaly_mad",
      Seq("group_col", "id_col", "value_col")(i - 1), exprs(i)))
    val df = namedTable("anomaly_mad",
      litStr("anomaly_mad", "table", exprs(0)), Seq(g, id, v))
    val z = if (exprs.length > 4) litDouble("anomaly_mad", "z", exprs(4))
      else 3.5
    require(z > 0, s"anomaly_mad z must be positive; got $z")
    graft.operators.EventOps.anomalyMad(df, g, id, v, z)
      .queryExecution.analyzed
  }

  /** `sample_weighted(table, id_col, weight_col, n)` — derandomized
    * A-ES weighted sampling without replacement
    * ([[graft.operators.CurationOps.weightedSample]]). */
  private[graft] def sampleWeightedPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("sample_weighted(table, id_col, weight_col, n)", exprs, 4, 4)
    val id = litStr("sample_weighted", "id_col", exprs(1))
    val w = litStr("sample_weighted", "weight_col", exprs(2))
    val df = namedTable("sample_weighted",
      litStr("sample_weighted", "table", exprs(0)), Seq(id, w))
    val n = VectorOps.intArg("sample_weighted", "n", exprs(3))
    require(n > 0, s"sample_weighted n must be positive; got $n")
    graft.operators.CurationOps.weightedSample(df, id, w, n)
      .queryExecution.analyzed
  }

  /** `resample(table, group_col, ts_col, value_col [, step])` —
    * gap-filled fixed-grid resampling with forward fill
    * ([[graft.operators.EventOps.resample]]). `step` is a whitelisted
    * interval phrase (it lands inside an INTERVAL literal — the
    * pattern gate keeps arbitrary SQL out of the plan). */
  private[graft] def resamplePlan(exprs: Seq[Expression]): LogicalPlan = {
    arity("resample(table, group_col, ts_col, value_col [, step])",
      exprs, 4, 5)
    val Seq(g, ts, v) = (1 to 3).map(i => litStr("resample",
      Seq("group_col", "ts_col", "value_col")(i - 1), exprs(i)))
    val df = namedTable("resample", litStr("resample", "table", exprs(0)),
      Seq(g, ts, v))
    val step = if (exprs.length > 4) litStr("resample", "step", exprs(4))
      else "1 hour"
    require(step.matches("\\d+ (second|minute|hour|day|week)s?"),
      s"resample step must look like '15 minutes' / '1 hour'; got '$step'")
    graft.operators.EventOps.resample(df, g, ts, v, step)
      .queryExecution.analyzed
  }

  /** `perplexity(table [, vocab_size])` — self-fit unigram-LM
    * cross-entropy/perplexity per document over the documents contract
    * ([[graft.operators.TextOps.unigramPerplexity]]). */
  private[graft] def perplexityPlan(exprs: Seq[Expression]): LogicalPlan = {
    arity("perplexity(table [, vocab_size])", exprs, 1, 2)
    val df = docTable("perplexity",
      litStr("perplexity", "table", exprs(0)))
    val v = if (exprs.length > 1)
      VectorOps.intArg("perplexity", "vocab_size", exprs(1)) else 32768
    require(v > 0, s"perplexity vocab_size must be positive; got $v")
    graft.operators.TextOps.unigramPerplexity(df, "doc_id", "text", v)
      .queryExecution.analyzed
  }

  /** `pagerank(table, src_col, dst_col [, iterations, damping])` —
    * fixed-iteration PageRank over a directed edge table
    * ([[graft.operators.GraphOps.pageRank]]); rows ordered rank DESC
    * with a node tiebreak. */
  private[graft] def pageRankPlan(exprs: Seq[Expression]): LogicalPlan = {
    arity("pagerank(table, src_col, dst_col [, iterations, damping])",
      exprs, 3, 5)
    val src = litStr("pagerank", "src_col", exprs(1))
    val dst = litStr("pagerank", "dst_col", exprs(2))
    val df = namedTable("pagerank",
      litStr("pagerank", "table", exprs(0)), Seq(src, dst))
    val iters = if (exprs.length > 3)
      VectorOps.intArg("pagerank", "iterations", exprs(3)) else 5
    val damping = if (exprs.length > 4)
      litDouble("pagerank", "damping", exprs(4)) else 0.85
    import org.apache.spark.sql.functions.col
    graft.operators.GraphOps.pageRank(
        df.select(col(src).as("src"), col(dst).as("dst")),
        iters, damping)
      .orderBy(col("r").desc, col("node"))
      .queryExecution.analyzed
  }

  /** `kcore(table, src_col, dst_col, k)` — k-core node table of the
    * undirected simple graph ([[graft.operators.GraphOps.kCore]]). */
  private[graft] def kcorePlan(exprs: Seq[Expression]): LogicalPlan = {
    arity("kcore(table, src_col, dst_col, k)", exprs, 4, 4)
    val src = litStr("kcore", "src_col", exprs(1))
    val dst = litStr("kcore", "dst_col", exprs(2))
    val df = namedTable("kcore",
      litStr("kcore", "table", exprs(0)), Seq(src, dst))
    val k = litDouble("kcore", "k", exprs(3)).toInt
    require(k >= 1, s"kcore k must be >= 1; got $k")
    import org.apache.spark.sql.functions.col
    graft.operators.GraphOps.kCore(
        df.select(col(src).as("src"), col(dst).as("dst")), k)
      .queryExecution.analyzed
  }

  /** `table_checksum(table, group_col)` — order-independent content
    * checksum of every non-group column (name order) per group
    * ([[graft.operators.RelationalOps.tableChecksum]]). Engine-side
    * fingerprint: double columns render via this engine's string
    * formatting, so compare checksums produced by THIS function, not
    * hand-built ones from another engine. */
  private[graft] def tableChecksumPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("table_checksum(table, group_col)", exprs, 2, 2)
    val g = litStr("table_checksum", "group_col", exprs(1))
    val df = namedTable("table_checksum",
      litStr("table_checksum", "table", exprs(0)), Seq(g))
    import org.apache.spark.sql.functions.col
    val cols = df.columns.filterNot(_ == g).sorted.map(col(_))
    graft.operators.RelationalOps.tableChecksum(df, cols.toSeq, Seq(g))
      .queryExecution.analyzed
  }

  /** `cooccur_pmi(table, text_col [, window, min_count, k])` — top-k
    * within-window token pairs by pointwise mutual information
    * ([[graft.operators.AffinityOps.cooccurPmi]]): shift-zip pair
    * generation, no positions self-join. Returns
    * `(tok1, tok2, n_pair, pmi)` by descending pmi. */
  private[graft] def cooccurPmiPlan(exprs: Seq[Expression]): LogicalPlan = {
    arity("cooccur_pmi(table, text_col [, window, min_count, k])",
      exprs, 2, 5)
    val t = litStr("cooccur_pmi", "text_col", exprs(1))
    val df = namedTable("cooccur_pmi",
      litStr("cooccur_pmi", "table", exprs(0)), Seq(t))
    val w = if (exprs.length > 2)
      VectorOps.intArg("cooccur_pmi", "window", exprs(2)) else 4
    val mc = if (exprs.length > 3)
      VectorOps.intArg("cooccur_pmi", "min_count", exprs(3)) else 5
    val k = if (exprs.length > 4)
      VectorOps.intArg("cooccur_pmi", "k", exprs(4)) else 100
    graft.operators.AffinityOps.cooccurPmi(df, t, w, mc, k)
      .queryExecution.analyzed
  }

  /** `basket_rules(table, basket_col, item_col [, min_support,
    * max_basket, k])` — association rules by lift over distinct
    * within-basket item pairs
    * ([[graft.operators.AffinityOps.basketRules]]). Returns
    * `(antecedent, consequent, n_pair, support, confidence, lift)`. */
  private[graft] def basketRulesPlan(exprs: Seq[Expression]): LogicalPlan = {
    arity("basket_rules(table, basket_col, item_col [, min_support, " +
      "max_basket, k])", exprs, 3, 6)
    val b = litStr("basket_rules", "basket_col", exprs(1))
    val i = litStr("basket_rules", "item_col", exprs(2))
    val df = namedTable("basket_rules",
      litStr("basket_rules", "table", exprs(0)), Seq(b, i))
    val ms = if (exprs.length > 3)
      VectorOps.intArg("basket_rules", "min_support", exprs(3)) else 2
    val mb = if (exprs.length > 4)
      VectorOps.intArg("basket_rules", "max_basket", exprs(4)) else 64
    val k = if (exprs.length > 5)
      VectorOps.intArg("basket_rules", "k", exprs(5)) else 100
    graft.operators.AffinityOps.basketRules(df, b, i, ms, mb, k)
      .queryExecution.analyzed
  }

  /** `triangles(table, src_col, dst_col)` — every triangle of the
    * undirected graph, one sorted `(p1, p2, p3)` row each, via
    * degree-ordered orientation
    * ([[graft.operators.GraphOps.triangles]]). */
  private[graft] def trianglesPlan(exprs: Seq[Expression]): LogicalPlan = {
    arity("triangles(table, src_col, dst_col)", exprs, 3, 3)
    val src = litStr("triangles", "src_col", exprs(1))
    val dst = litStr("triangles", "dst_col", exprs(2))
    val df = namedTable("triangles",
      litStr("triangles", "table", exprs(0)), Seq(src, dst))
    graft.operators.GraphOps.triangles(
        df.select(col(src).as("src"), col(dst).as("dst")))
      .queryExecution.analyzed
  }

  /** `ewma(table, part_col, ts_col, id_col, value_col [, alpha,
    * span])` — per-group bias-corrected EWMA over a bounded trailing
    * row window ([[graft.operators.EventOps.ewma]]). Returns the id,
    * group, ts and value columns plus `ewma`, ordered by id. */
  private[graft] def ewmaPlan(exprs: Seq[Expression]): LogicalPlan = {
    arity("ewma(table, part_col, ts_col, id_col, value_col [, alpha, " +
      "span])", exprs, 5, 7)
    val names = Seq("part_col", "ts_col", "id_col", "value_col")
    val Seq(p, t, id, v) = (1 to 4).map(i =>
      litStr("ewma", names(i - 1), exprs(i)))
    val df = namedTable("ewma", litStr("ewma", "table", exprs(0)),
      Seq(p, t, id, v))
    val alpha = if (exprs.length > 5) litDouble("ewma", "alpha", exprs(5))
      else 0.3
    val span = if (exprs.length > 6)
      VectorOps.intArg("ewma", "span", exprs(6)) else 20
    graft.operators.EventOps.ewma(df, p, t, id, v, alpha, span)
      .queryExecution.analyzed
  }

  /** `session_intervals(table, user_col, ts_col, id_col [,
    * gap_seconds])` — gaps-and-islands sessionization to closed
    * `(user, sid, st, en)` intervals
    * ([[graft.operators.EventOps.sessionIntervals]]). */
  private[graft] def sessionIntervalsPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("session_intervals(table, user_col, ts_col, id_col " +
      "[, gap_seconds])", exprs, 4, 5)
    val names = Seq("user_col", "ts_col", "id_col")
    val Seq(u, t, id) = (1 to 3).map(i =>
      litStr("session_intervals", names(i - 1), exprs(i)))
    val df = namedTable("session_intervals",
      litStr("session_intervals", "table", exprs(0)), Seq(u, t, id))
    val gap = if (exprs.length > 4)
      litVal("session_intervals", "gap_seconds", exprs(4)) match {
        case n: Number => n.longValue()
        case other => throw new IllegalArgumentException(
          "session_intervals expects a numeric literal for " +
            s"'gap_seconds'; got $other")
      }
      else 1800L
    graft.operators.EventOps.sessionIntervals(df, u, t, id, gap)
      .queryExecution.analyzed
  }

  /** `interval_join(left_table, right_table, l_start, l_end, r_start,
    * r_end, bucket_seconds [, max_buckets])` — bucketed overlap join of
    * two interval tables ([[graft.operators.JoinOps.intervalJoin]]):
    * equi-join on time buckets with the exact closed-interval predicate
    * as residual; never a nested loop. Column names of the two tables
    * must be disjoint. */
  private[graft] def intervalJoinPlan(exprs: Seq[Expression]): LogicalPlan = {
    arity("interval_join(left_table, right_table, l_start, l_end, " +
      "r_start, r_end, bucket_seconds [, max_buckets])", exprs, 7, 8)
    val names = Seq("l_start", "l_end", "r_start", "r_end")
    val Seq(ls, le, rs, re) = (2 to 5).map(i =>
      litStr("interval_join", names(i - 2), exprs(i)))
    val l = namedTable("interval_join",
      litStr("interval_join", "left_table", exprs(0)), Seq(ls, le))
    val r = namedTable("interval_join",
      litStr("interval_join", "right_table", exprs(1)), Seq(rs, re))
    val overlap = l.columns.toSet.intersect(r.columns.toSet)
    require(overlap.isEmpty, "interval_join requires disjoint column " +
      s"names; both tables carry ${overlap.mkString("(", ", ", ")")}")
    val bs = litVal("interval_join", "bucket_seconds", exprs(6)) match {
      case n: Number => n.longValue()
      case other => throw new IllegalArgumentException(
        s"interval_join expects a numeric literal for 'bucket_seconds'; " +
          s"got $other")
    }
    val mb = if (exprs.length > 7)
      VectorOps.intArg("interval_join", "max_buckets", exprs(7)) else 1024
    graft.operators.JoinOps.intervalJoin(l, r, ls, le, rs, re, bs,
        maxBucketsPerInterval = mb)
      .queryExecution.analyzed
  }

  /** `label_prop(table, src_col, dst_col [, iterations])` —
    * deterministic synchronous label-propagation communities over a
    * directed edge table (symmetrize for undirected graphs;
    * [[graft.operators.GraphOps.labelPropagation]]). Returns
    * `(node, lbl)` ordered by node. */
  private[graft] def labelPropPlan(exprs: Seq[Expression]): LogicalPlan = {
    arity("label_prop(table, src_col, dst_col [, iterations])",
      exprs, 3, 4)
    val src = litStr("label_prop", "src_col", exprs(1))
    val dst = litStr("label_prop", "dst_col", exprs(2))
    val df = namedTable("label_prop",
      litStr("label_prop", "table", exprs(0)), Seq(src, dst))
    val iters = if (exprs.length > 3)
      VectorOps.intArg("label_prop", "iterations", exprs(3)) else 4
    graft.operators.GraphOps.labelPropagation(
        df.select(col(src).as("src"), col(dst).as("dst")), iters)
      .orderBy("node")
      .queryExecution.analyzed
  }

  /** `acf(table, group_col, ts_col, value_col [, max_lag,
    * bucket_seconds])` — per-group autocorrelogram over the bucketed
    * mean series ([[graft.operators.EventOps.acf]]). Returns
    * `(g, lag, n, acf)` ordered by group and lag. */
  private[graft] def acfPlan(exprs: Seq[Expression]): LogicalPlan = {
    arity("acf(table, group_col, ts_col, value_col [, max_lag, " +
      "bucket_seconds])", exprs, 4, 6)
    val names = Seq("group_col", "ts_col", "value_col")
    val Seq(g, t, v) = (1 to 3).map(i =>
      litStr("acf", names(i - 1), exprs(i)))
    val df = namedTable("acf", litStr("acf", "table", exprs(0)),
      Seq(g, t, v))
    val maxLag = if (exprs.length > 4)
      VectorOps.intArg("acf", "max_lag", exprs(4)) else 24
    val bs = if (exprs.length > 5)
      litVal("acf", "bucket_seconds", exprs(5)) match {
        case n: Number => n.longValue()
        case other => throw new IllegalArgumentException(
          s"acf expects a numeric literal for 'bucket_seconds'; got $other")
      }
      else 3600L
    graft.operators.EventOps.acf(df, g, t, v, maxLag, bs)
      .queryExecution.analyzed
  }

  /** `fuzzy_join(table, name_col [, max_distance, block_prefix])` —
    * entity-resolution pairs of distinct names within `max_distance`
    * Levenshtein edits, blocked on the first `block_prefix` characters
    * ([[graft.operators.DedupOps.fuzzyNamePairs]]). Returns
    * `(name_a, name_b, d, n_a, n_b)`. */
  private[graft] def fuzzyJoinPlan(exprs: Seq[Expression]): LogicalPlan = {
    arity("fuzzy_join(table, name_col [, max_distance, block_prefix])",
      exprs, 2, 4)
    val n = litStr("fuzzy_join", "name_col", exprs(1))
    val df = namedTable("fuzzy_join",
      litStr("fuzzy_join", "table", exprs(0)), Seq(n))
    val maxD = if (exprs.length > 2)
      VectorOps.intArg("fuzzy_join", "max_distance", exprs(2)) else 3
    val prefix = if (exprs.length > 3)
      VectorOps.intArg("fuzzy_join", "block_prefix", exprs(3)) else 1
    require(prefix >= 1, s"fuzzy_join block_prefix must be >= 1; got $prefix")
    import org.apache.spark.sql.functions.substring
    graft.operators.DedupOps.fuzzyNamePairs(df, n,
        substring(col("name"), 1, prefix), maxD)
      .queryExecution.analyzed
  }

  /** `rolling_median(table, part_col, ts_col, id_col, value_col
    * [, span])` — per-group bounded-window rolling median
    * ([[graft.operators.EventOps.rollingMedian]]), the robust twin of
    * `ewma`. Returns the id, group, ts and value columns plus `rmed`,
    * ordered by id. */
  private[graft] def rollingMedianPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("rolling_median(table, part_col, ts_col, id_col, value_col " +
      "[, span])", exprs, 5, 6)
    val names = Seq("part_col", "ts_col", "id_col", "value_col")
    val Seq(p, t, id, v) = (1 to 4).map(i =>
      litStr("rolling_median", names(i - 1), exprs(i)))
    val df = namedTable("rolling_median",
      litStr("rolling_median", "table", exprs(0)), Seq(p, t, id, v))
    val span = if (exprs.length > 5)
      VectorOps.intArg("rolling_median", "span", exprs(5)) else 20
    graft.operators.EventOps.rollingMedian(df, p, t, id, v, span)
      .queryExecution.analyzed
  }

  /** `trend(table, group_col, ts_col, value_col [, bucket_seconds])` —
    * per-group least-squares slope/intercept over the bucketed mean
    * series ([[graft.operators.EventOps.trend]]). Returns
    * `(g, n, slope, intercept)` ordered by group. */
  private[graft] def trendPlan(exprs: Seq[Expression]): LogicalPlan = {
    arity("trend(table, group_col, ts_col, value_col " +
      "[, bucket_seconds])", exprs, 4, 5)
    val names = Seq("group_col", "ts_col", "value_col")
    val Seq(g, t, v) = (1 to 3).map(i =>
      litStr("trend", names(i - 1), exprs(i)))
    val df = namedTable("trend", litStr("trend", "table", exprs(0)),
      Seq(g, t, v))
    val bs = if (exprs.length > 4)
      litVal("trend", "bucket_seconds", exprs(4)) match {
        case n: Number => n.longValue()
        case other => throw new IllegalArgumentException(
          s"trend expects a numeric literal for 'bucket_seconds'; " +
            s"got $other")
      }
      else 3600L
    graft.operators.EventOps.trend(df, g, t, v, bs)
      .queryExecution.analyzed
  }

  /** `skyline(table, x_col, y_col)` — 2-D Pareto frontier, both
    * dimensions maximized ([[graft.operators.StatsOps.skyline]]):
    * bucket-pruned then exact. Returns distinct frontier `(x, y)`
    * ordered by x descending. */
  private[graft] def skylinePlan(exprs: Seq[Expression]): LogicalPlan = {
    arity("skyline(table, x_col, y_col)", exprs, 3, 3)
    val x = litStr("skyline", "x_col", exprs(1))
    val y = litStr("skyline", "y_col", exprs(2))
    val df = namedTable("skyline",
      litStr("skyline", "table", exprs(0)), Seq(x, y))
    import org.apache.spark.sql.functions.col
    graft.operators.StatsOps.skyline(df, x, y)
      .orderBy(col("x").desc, col("y").desc)
      .queryExecution.analyzed
  }

  /** `winsorize(table, group_col, value_col [, lo, hi])` — per-group
    * winsorized mean at discrete percentile clamps
    * ([[graft.operators.StatsOps.winsorizedMean]]). Returns
    * `(group, n, p_lo, p_hi, mean_raw, mean_wins)` ordered by group. */
  private[graft] def winsorizePlan(exprs: Seq[Expression]): LogicalPlan = {
    arity("winsorize(table, group_col, value_col [, lo, hi])",
      exprs, 3, 5)
    val g = litStr("winsorize", "group_col", exprs(1))
    val v = litStr("winsorize", "value_col", exprs(2))
    val df = namedTable("winsorize",
      litStr("winsorize", "table", exprs(0)), Seq(g, v))
    val lo = if (exprs.length > 3)
      litDouble("winsorize", "lo", exprs(3)) else 0.05
    val hi = if (exprs.length > 4)
      litDouble("winsorize", "hi", exprs(4)) else 0.95
    import org.apache.spark.sql.functions.col
    graft.operators.StatsOps.winsorizedMean(df, g, v, lo, hi)
      .orderBy(col(g))
      .queryExecution.analyzed
  }

  /** `ab_metrics(units_table, unit_col, conv_table, conv_unit_col)` —
    * two-proportion A/B readout over the deterministic hash split
    * ([[graft.operators.StatsOps.abMetrics]]). Returns
    * `(variant, n_units, n_conv, rate, z)` ordered by variant. */
  private[graft] def abMetricsPlan(exprs: Seq[Expression]): LogicalPlan = {
    arity("ab_metrics(units_table, unit_col, conv_table, conv_unit_col)",
      exprs, 4, 4)
    val uc = litStr("ab_metrics", "unit_col", exprs(1))
    val cc = litStr("ab_metrics", "conv_unit_col", exprs(3))
    val units = namedTable("ab_metrics",
      litStr("ab_metrics", "units_table", exprs(0)), Seq(uc))
    val conv = namedTable("ab_metrics",
      litStr("ab_metrics", "conv_table", exprs(2)), Seq(cc))
    import org.apache.spark.sql.functions.col
    graft.operators.StatsOps.abMetrics(units, uc, conv, cc)
      .orderBy(col("variant"))
      .queryExecution.analyzed
  }

  /** `shortest_path(table, src_col, dst_col, source_id [, max_hops])`
    * — bounded-hop BFS distances from `source_id`
    * ([[graft.operators.GraphOps.shortestPaths]]). Returns
    * `(node, dist)` ordered by (dist, node); unreached nodes absent. */
  private[graft] def shortestPathPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("shortest_path(table, src_col, dst_col, source_id " +
      "[, max_hops])", exprs, 4, 5)
    val src = litStr("shortest_path", "src_col", exprs(1))
    val dst = litStr("shortest_path", "dst_col", exprs(2))
    val df = namedTable("shortest_path",
      litStr("shortest_path", "table", exprs(0)), Seq(src, dst))
    val source = litVal("shortest_path", "source_id", exprs(3)) match {
      case n: Number => n.longValue()
      case other => throw new IllegalArgumentException(
        s"shortest_path expects a numeric literal for 'source_id'; " +
          s"got $other")
    }
    val hops = if (exprs.length > 4)
      VectorOps.intArg("shortest_path", "max_hops", exprs(4)) else 4
    import org.apache.spark.sql.functions.col
    graft.operators.GraphOps.shortestPaths(
        df.select(col(src).as("src"), col(dst).as("dst")), source, hops)
      .orderBy(col("dist"), col("node"))
      .queryExecution.analyzed
  }

  /** `token_entropy(table, group_col, text_col)` — per-group Shannon
    * entropy of the token distribution
    * ([[graft.operators.TextOps.tokenEntropy]]). Returns
    * `(group, n_tokens, n_distinct, entropy)` ordered by group. */
  private[graft] def tokenEntropyPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("token_entropy(table, group_col, text_col)", exprs, 3, 3)
    val g = litStr("token_entropy", "group_col", exprs(1))
    val t = litStr("token_entropy", "text_col", exprs(2))
    val df = namedTable("token_entropy",
      litStr("token_entropy", "table", exprs(0)), Seq(g, t))
    import org.apache.spark.sql.functions.col
    graft.operators.TextOps.tokenEntropy(df, g, t)
      .orderBy(col(g))
      .queryExecution.analyzed
  }

  /** `ngram_topk(table, text_col [, n, k])` — exact top-k word
    * n-grams ([[graft.operators.TextOps.ngramTopK]]). Returns
    * `(ngram, n)` by descending count. */
  private[graft] def ngramTopKPlan(exprs: Seq[Expression]): LogicalPlan = {
    arity("ngram_topk(table, text_col [, n, k])", exprs, 2, 4)
    val t = litStr("ngram_topk", "text_col", exprs(1))
    val df = namedTable("ngram_topk",
      litStr("ngram_topk", "table", exprs(0)), Seq(t))
    val n = if (exprs.length > 2)
      VectorOps.intArg("ngram_topk", "n", exprs(2)) else 2
    val k = if (exprs.length > 3)
      VectorOps.intArg("ngram_topk", "k", exprs(3)) else 50
    graft.operators.TextOps.ngramTopK(df, t, n, k)
      .queryExecution.analyzed
  }

  /** `table_diff(prev_table, next_table, key_col)` — row-level
    * snapshot reconciliation
    * ([[graft.operators.RelationalOps.tableDiff]]): only differing
    * rows, tagged added/removed/changed with the changed column
    * list. Both tables must share a schema. Ordered by the key. */
  private[graft] def tableDiffPlan(exprs: Seq[Expression]): LogicalPlan = {
    arity("table_diff(prev_table, next_table, key_col)", exprs, 3, 3)
    val key = litStr("table_diff", "key_col", exprs(2))
    val prev = namedTable("table_diff",
      litStr("table_diff", "prev_table", exprs(0)), Seq(key))
    val next = namedTable("table_diff",
      litStr("table_diff", "next_table", exprs(1)), Seq(key))
    graft.operators.RelationalOps.tableDiff(prev, next, key)
      .orderBy(key)
      .queryExecution.analyzed
  }

  /** `gaps_islands(table, user_col, ts_col)` — consecutive-day
    * activity islands per user
    * ([[graft.operators.EventOps.gapsIslands]]). Returns
    * `(user, start_day, end_day, n_days)`. */
  private[graft] def gapsIslandsPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("gaps_islands(table, user_col, ts_col)", exprs, 3, 3)
    val u = litStr("gaps_islands", "user_col", exprs(1))
    val t = litStr("gaps_islands", "ts_col", exprs(2))
    val df = namedTable("gaps_islands",
      litStr("gaps_islands", "table", exprs(0)), Seq(u, t))
    graft.operators.EventOps.gapsIslands(df, u, t)
      .queryExecution.analyzed
  }

  /** `transitions(table, user_col, type_col, ts_col, tie_col)` —
    * first-order Markov transition matrix over per-user sequences
    * ([[graft.operators.EventOps.transitions]]). Returns
    * `(src, dst, n, p)`. */
  private[graft] def transitionsPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("transitions(table, user_col, type_col, ts_col, tie_col)",
      exprs, 5, 5)
    val Seq(u, ty, ts, tie) = (1 to 4).map(i =>
      litStr("transitions",
        Seq("user_col", "type_col", "ts_col", "tie_col")(i - 1),
        exprs(i)))
    val df = namedTable("transitions",
      litStr("transitions", "table", exprs(0)), Seq(u, ty, ts, tie))
    graft.operators.EventOps.transitions(df, u, ty, ts, tie)
      .queryExecution.analyzed
  }

  /** `attribution(table, user_col, type_col, ts_col, tie_col,
    * conv_type)` — first/last-touch conversion attribution
    * ([[graft.operators.EventOps.attribution]]). Returns
    * `(channel, first_touch, last_touch)`. */
  private[graft] def attributionPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("attribution(table, user_col, type_col, ts_col, tie_col, " +
      "conv_type)", exprs, 6, 6)
    val Seq(u, ty, ts, tie, conv) = (1 to 5).map(i =>
      litStr("attribution",
        Seq("user_col", "type_col", "ts_col", "tie_col",
          "conv_type")(i - 1), exprs(i)))
    val df = namedTable("attribution",
      litStr("attribution", "table", exprs(0)), Seq(u, ty, ts, tie))
    graft.operators.EventOps.attribution(df, u, ty, ts, tie, conv)
      .queryExecution.analyzed
  }

  /** `benford(table, value_col)` — first-digit Benford audit
    * ([[graft.operators.StatsOps.benford]]). Returns
    * `(digit, n, obs_p, exp_p, chi2)`. */
  private[graft] def benfordPlan(exprs: Seq[Expression]): LogicalPlan = {
    arity("benford(table, value_col)", exprs, 2, 2)
    val v = litStr("benford", "value_col", exprs(1))
    val df = namedTable("benford",
      litStr("benford", "table", exprs(0)), Seq(v))
    graft.operators.StatsOps.benford(df, v)
      .queryExecution.analyzed
  }

  /** `geo_radius_join(left_table, right_table, radius_km)` — all
    * cross-table point pairs within the great-circle radius
    * ([[graft.operators.GeoOps.radiusJoin]]); both tables must carry
    * (lat, lon) double columns, |lat| ≤ 70. Grid-cell blocked — never
    * a cross product. */
  private[graft] def geoRadiusJoinPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("geo_radius_join(left_table, right_table, radius_km)",
      exprs, 3, 3)
    val radius = litDouble("geo_radius_join", "radius_km", exprs(2))
    require(radius > 0 && radius <= 5000,
      s"geo_radius_join radius_km must be in (0, 5000]; got $radius")
    val left = namedTable("geo_radius_join",
      litStr("geo_radius_join", "left_table", exprs(0)),
      Seq("lat", "lon"))
    val right = namedTable("geo_radius_join",
      litStr("geo_radius_join", "right_table", exprs(1)),
      Seq("lat", "lon"))
    graft.operators.GeoOps.radiusJoin(left, right, radius)
      .queryExecution.analyzed
  }

  /** `crosstab_chi2(table, a_col, b_col)` — contingency table with
    * per-cell χ² independence terms
    * ([[graft.operators.StatsOps.crosstabChi2]]). Returns
    * `(a, b, n, expected, chi2)` ordered by the pair. */
  private[graft] def crosstabChi2Plan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("crosstab_chi2(table, a_col, b_col)", exprs, 3, 3)
    val a = litStr("crosstab_chi2", "a_col", exprs(1))
    val b = litStr("crosstab_chi2", "b_col", exprs(2))
    val df = namedTable("crosstab_chi2",
      litStr("crosstab_chi2", "table", exprs(0)), Seq(a, b))
    graft.operators.StatsOps.crosstabChi2(df, a, b)
      .queryExecution.analyzed
  }

  /** `key_skew(table, key_col [, topn])` — hot-key profiler
    * ([[graft.operators.StatsOps.keySkew]]): the topn heaviest key
    * values with share / cumulative share / skew ratio. Returns
    * `(key, cnt, share, cum_share, skew)` heaviest-first. */
  private[graft] def keySkewPlan(exprs: Seq[Expression]): LogicalPlan = {
    arity("key_skew(table, key_col [, topn])", exprs, 2, 3)
    val k = litStr("key_skew", "key_col", exprs(1))
    val topn = if (exprs.length > 2)
      VectorOps.intArg("key_skew", "topn", exprs(2)) else 10
    require(topn > 0 && topn <= 10000,
      s"key_skew topn must be in [1, 10000]; got $topn")
    val df = namedTable("key_skew",
      litStr("key_skew", "table", exprs(0)), Seq(k))
    graft.operators.StatsOps.keySkew(df, k, topn)
      .queryExecution.analyzed
  }

  /** `changepoint(table, group_col, ts_col)` — per-group CUSUM
    * level-shift detection over hourly counts
    * ([[graft.operators.EventOps.changepoint]]). Returns
    * `(group, cp_hour, stat, mean_before, mean_after)`. */
  private[graft] def changepointPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("changepoint(table, group_col, ts_col)", exprs, 3, 3)
    val g = litStr("changepoint", "group_col", exprs(1))
    val t = litStr("changepoint", "ts_col", exprs(2))
    val df = namedTable("changepoint",
      litStr("changepoint", "table", exprs(0)), Seq(g, t))
    graft.operators.EventOps.changepoint(df, g, t)
      .queryExecution.analyzed
  }

  /** `trailing_features(table, user_col, ts_col, id_col, type_col,
    * val_col, label)` — leakage-safe point-in-time trailing features
    * ([[graft.operators.EventOps.trailingFeatures]]). Returns
    * `(id, user, ts, n_1d, n_7d, v_7d)` for each label row. */
  private[graft] def trailingFeaturesPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("trailing_features(table, user_col, ts_col, id_col, " +
      "type_col, val_col, label)", exprs, 7, 7)
    val Seq(u, ts, id, ty, v, label) = (1 to 6).map(i =>
      litStr("trailing_features",
        Seq("user_col", "ts_col", "id_col", "type_col", "val_col",
          "label")(i - 1), exprs(i)))
    val df = namedTable("trailing_features",
      litStr("trailing_features", "table", exprs(0)),
      Seq(u, ts, id, ty, v))
    graft.operators.EventOps.trailingFeatures(df, u, ts, id, ty, v,
      label).queryExecution.analyzed
  }

  /** `rfm(table, entity_col, date_col, amount_col)` — RFM
    * segmentation ([[graft.operators.StatsOps.rfm]]). Returns
    * `(entity, r_days, f, m, r_score, f_score, m_score, segment)`. */
  private[graft] def rfmPlan(exprs: Seq[Expression]): LogicalPlan = {
    arity("rfm(table, entity_col, date_col, amount_col)", exprs, 4, 4)
    val Seq(e, d, a) = (1 to 3).map(i => litStr("rfm",
      Seq("entity_col", "date_col", "amount_col")(i - 1), exprs(i)))
    val df = namedTable("rfm", litStr("rfm", "table", exprs(0)),
      Seq(e, d, a))
    graft.operators.StatsOps.rfm(df, e, d, a)
      .queryExecution.analyzed
  }

  /** `join_size(left_table, right_table, key_col)` — exact equi-join
    * output cardinality from per-key count tables
    * ([[graft.operators.StatsOps.joinSizeEstimate]]). */
  private[graft] def joinSizePlan(exprs: Seq[Expression]): LogicalPlan = {
    arity("join_size(left_table, right_table, key_col)", exprs, 3, 3)
    val key = litStr("join_size", "key_col", exprs(2))
    val left = namedTable("join_size",
      litStr("join_size", "left_table", exprs(0)), Seq(key))
    val right = namedTable("join_size",
      litStr("join_size", "right_table", exprs(1)), Seq(key))
    graft.operators.StatsOps.joinSizeEstimate(left, right, key)
      .queryExecution.analyzed
  }

  /** `seasonality(table, group_col, ts_col)` — hour-of-day load
    * profile ([[graft.operators.EventOps.seasonality]]). Returns
    * `(group, hod, n, share, idx)`. */
  private[graft] def seasonalityPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("seasonality(table, group_col, ts_col)", exprs, 3, 3)
    val g = litStr("seasonality", "group_col", exprs(1))
    val t = litStr("seasonality", "ts_col", exprs(2))
    val df = namedTable("seasonality",
      litStr("seasonality", "table", exprs(0)), Seq(g, t))
    graft.operators.EventOps.seasonality(df, g, t)
      .queryExecution.analyzed
  }

  /** `lorenz_gini(table, entity_col, value_col)` — Lorenz deciles +
    * Gini concentration ([[graft.operators.StatsOps.lorenzGini]]).
    * Returns `(decile, cum_share, gini)`. */
  private[graft] def lorenzGiniPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("lorenz_gini(table, entity_col, value_col)", exprs, 3, 3)
    val e = litStr("lorenz_gini", "entity_col", exprs(1))
    val v = litStr("lorenz_gini", "value_col", exprs(2))
    val df = namedTable("lorenz_gini",
      litStr("lorenz_gini", "table", exprs(0)), Seq(e, v))
    graft.operators.StatsOps.lorenzGini(df, e, v)
      .queryExecution.analyzed
  }

  // ---- round-14: SQL surface for the round-13 tiers (hypothesis,
  // fit, profile, stats, curation, text additions), restoring the
  // every-family-SQL-reachable invariant (VERDICT r13 item 2). Same
  // contract stance as every TVF above: literal args validated at
  // plan-build time, named tables resolved with their required
  // columns spelled out. ----

  /** `ks_test(table, value_col, group_col, a, b)` — two-sample
    * Kolmogorov–Smirnov ([[graft.operators.HypothesisOps.ksTest]]).
    * Returns `(n_a, n_b, d_stat, p_value)`. */
  private[graft] def ksTestPlan(exprs: Seq[Expression]): LogicalPlan = {
    arity("ks_test(table, value_col, group_col, a, b)", exprs, 5, 5)
    val v = litStr("ks_test", "value_col", exprs(1))
    val g = litStr("ks_test", "group_col", exprs(2))
    val df = namedTable("ks_test",
      litStr("ks_test", "table", exprs(0)), Seq(v, g))
    graft.operators.HypothesisOps.ksTest(df, v, g,
      litStr("ks_test", "a", exprs(3)), litStr("ks_test", "b", exprs(4)))
      .queryExecution.analyzed
  }

  /** `t_test(table, value_col, group_col, a, b)` — Welch's two-sample
    * t ([[graft.operators.HypothesisOps.tTest]]). Returns
    * `(n_a, n_b, mean_a, mean_b, t_stat, dof)`. */
  private[graft] def tTestPlan(exprs: Seq[Expression]): LogicalPlan = {
    arity("t_test(table, value_col, group_col, a, b)", exprs, 5, 5)
    val v = litStr("t_test", "value_col", exprs(1))
    val g = litStr("t_test", "group_col", exprs(2))
    val df = namedTable("t_test",
      litStr("t_test", "table", exprs(0)), Seq(v, g))
    graft.operators.HypothesisOps.tTest(df, v, g,
      litStr("t_test", "a", exprs(3)), litStr("t_test", "b", exprs(4)))
      .queryExecution.analyzed
  }

  /** `auc(table, score_col, group_col, pos, neg)` — ROC AUC + Gini,
    * exact under ties ([[graft.operators.HypothesisOps.auc]]). */
  private[graft] def aucPlan(exprs: Seq[Expression]): LogicalPlan = {
    arity("auc(table, score_col, group_col, pos, neg)", exprs, 5, 5)
    val v = litStr("auc", "score_col", exprs(1))
    val g = litStr("auc", "group_col", exprs(2))
    val df = namedTable("auc", litStr("auc", "table", exprs(0)),
      Seq(v, g))
    graft.operators.HypothesisOps.auc(df, v, g,
      litStr("auc", "pos", exprs(3)), litStr("auc", "neg", exprs(4)))
      .queryExecution.analyzed
  }

  /** `pr_auc(table, score_col, group_col, pos, neg)` — average
    * precision + prevalence baseline
    * ([[graft.operators.HypothesisOps.prAuc]]). */
  private[graft] def prAucPlan(exprs: Seq[Expression]): LogicalPlan = {
    arity("pr_auc(table, score_col, group_col, pos, neg)", exprs, 5, 5)
    val v = litStr("pr_auc", "score_col", exprs(1))
    val g = litStr("pr_auc", "group_col", exprs(2))
    val df = namedTable("pr_auc", litStr("pr_auc", "table", exprs(0)),
      Seq(v, g))
    graft.operators.HypothesisOps.prAuc(df, v, g,
      litStr("pr_auc", "pos", exprs(3)),
      litStr("pr_auc", "neg", exprs(4)))
      .queryExecution.analyzed
  }

  /** `threshold_sweep(table, score_col, group_col, pos, neg [, n_q])`
    * — operating-point table (confusion cells + precision / recall /
    * F1 / accuracy) at the pooled-percentile thresholds
    * ([[graft.operators.HypothesisOps.thresholdSweep]]). */
  private[graft] def thresholdSweepPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("threshold_sweep(table, score_col, group_col, pos, neg " +
      "[, n_q])", exprs, 5, 6)
    val v = litStr("threshold_sweep", "score_col", exprs(1))
    val g = litStr("threshold_sweep", "group_col", exprs(2))
    val df = namedTable("threshold_sweep",
      litStr("threshold_sweep", "table", exprs(0)), Seq(v, g))
    val nQ = if (exprs.length > 5)
      litDouble("threshold_sweep", "n_q", exprs(5)).toInt else 20
    graft.operators.HypothesisOps.thresholdSweep(df, v, g,
      litStr("threshold_sweep", "pos", exprs(3)),
      litStr("threshold_sweep", "neg", exprs(4)), nQ)
      .queryExecution.analyzed
  }

  /** `auc_by(table, score_col, group_col, pos, neg, seg_col)` —
    * per-segment ROC AUC + Gini
    * ([[graft.operators.HypothesisOps.aucBy]]). */
  private[graft] def aucByPlan(exprs: Seq[Expression]): LogicalPlan = {
    arity("auc_by(table, score_col, group_col, pos, neg, seg_col)",
      exprs, 6, 6)
    val v = litStr("auc_by", "score_col", exprs(1))
    val g = litStr("auc_by", "group_col", exprs(2))
    val seg = litStr("auc_by", "seg_col", exprs(5))
    val df = namedTable("auc_by", litStr("auc_by", "table", exprs(0)),
      Seq(v, g, seg))
    graft.operators.HypothesisOps.aucBy(df, v, g,
      litStr("auc_by", "pos", exprs(3)),
      litStr("auc_by", "neg", exprs(4)), seg)
      .queryExecution.analyzed
  }

  /** `feature_screen(table, label_col, features)` — per-feature
    * AUC/KS univariate screen against a boolean label; `features` is
    * a space-separated column list
    * ([[graft.operators.HypothesisOps.featureScreen]]). */
  private[graft] def featureScreenPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("feature_screen(table, label_col, features)", exprs, 3, 3)
    val l = litStr("feature_screen", "label_col", exprs(1))
    val fs = litStr("feature_screen", "features", exprs(2)).trim
      .split("\\s+").toSeq
    val df = namedTable("feature_screen",
      litStr("feature_screen", "table", exprs(0)), l +: fs)
    graft.operators.HypothesisOps.featureScreen(df, l, fs)
      .queryExecution.analyzed
  }

  /** `isotonic(table, prob_col, label_col [, n_bins])` — isotonic
    * (PAV) calibration fit over the binned reliability table
    * ([[graft.operators.ProfileOps.isotonicCalibration]]). */
  private[graft] def isotonicPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("isotonic(table, prob_col, label_col [, n_bins])",
      exprs, 3, 4)
    val p = litStr("isotonic", "prob_col", exprs(1))
    val l = litStr("isotonic", "label_col", exprs(2))
    val df = namedTable("isotonic",
      litStr("isotonic", "table", exprs(0)), Seq(p, l))
    val nBins = if (exprs.length > 3)
      litDouble("isotonic", "n_bins", exprs(3)).toInt else 10
    graft.operators.ProfileOps.isotonicCalibration(df, p, l, nBins)
      .queryExecution.analyzed
  }

  /** `embed_pca(table, emb_col [, k])` — PCA variance ledger of an
    * embedding column ([[graft.operators.PcaOps.pcaSummary]]). NOTE
    * the olsSolveDriver contract deviation: the moment pass + Jacobi
    * fit run EAGERLY at plan-build time (the model is plan-carried). */
  private[graft] def embedPcaPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("embed_pca(table, emb_col [, k])", exprs, 2, 3)
    val e = litStr("embed_pca", "emb_col", exprs(1))
    val df = namedTable("embed_pca",
      litStr("embed_pca", "table", exprs(0)), Seq(e))
    val k = if (exprs.length > 2)
      litDouble("embed_pca", "k", exprs(2)).toInt else 16
    val model = graft.operators.PcaOps.pcaFit(df, e, k)
    graft.operators.PcaOps.pcaSummary(df, e, model)
      .queryExecution.analyzed
  }

  /** `bootstrap_ci(table, id_col, value_col [, b])` — derandomized
    * Poisson-bootstrap 95% CI for the mean
    * ([[graft.operators.StatsOps.bootstrapCiMean]]). */
  private[graft] def bootstrapCiPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("bootstrap_ci(table, id_col, value_col [, b])", exprs, 3, 4)
    val id = litStr("bootstrap_ci", "id_col", exprs(1))
    val v = litStr("bootstrap_ci", "value_col", exprs(2))
    val df = namedTable("bootstrap_ci",
      litStr("bootstrap_ci", "table", exprs(0)), Seq(id, v))
    val b = if (exprs.length > 3)
      litDouble("bootstrap_ci", "b", exprs(3)).toInt else 200
    graft.operators.StatsOps.bootstrapCiMean(df, id, v, b)
      .queryExecution.analyzed
  }

  /** `auc_compare(table, score_a, score_b, group_col, pos, neg)` —
    * paired DeLong comparison of two scores' AUCs on the same rows
    * ([[graft.operators.HypothesisOps.aucCompare]]). */
  private[graft] def aucComparePlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("auc_compare(table, score_a, score_b, group_col, pos, neg)",
      exprs, 6, 6)
    val a = litStr("auc_compare", "score_a", exprs(1))
    val b = litStr("auc_compare", "score_b", exprs(2))
    val g = litStr("auc_compare", "group_col", exprs(3))
    val df = namedTable("auc_compare",
      litStr("auc_compare", "table", exprs(0)), Seq(a, b, g))
    graft.operators.HypothesisOps.aucCompare(df, a, b, g,
      litStr("auc_compare", "pos", exprs(4)),
      litStr("auc_compare", "neg", exprs(5)))
      .queryExecution.analyzed
  }

  /** `wasserstein(table, value_col, group_col, a, b)` — 1-D
    * earth-mover's distance between the two groups' distributions
    * ([[graft.operators.HypothesisOps.wasserstein]]). Returns
    * `(n_a, n_b, w1)`. */
  private[graft] def wassersteinPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("wasserstein(table, value_col, group_col, a, b)", exprs, 5, 5)
    val v = litStr("wasserstein", "value_col", exprs(1))
    val g = litStr("wasserstein", "group_col", exprs(2))
    val df = namedTable("wasserstein",
      litStr("wasserstein", "table", exprs(0)), Seq(v, g))
    graft.operators.HypothesisOps.wasserstein(df, v, g,
      litStr("wasserstein", "a", exprs(3)),
      litStr("wasserstein", "b", exprs(4)))
      .queryExecution.analyzed
  }

  /** `cvm_test(table, value_col, group_col, a, b)` — two-sample
    * Cramér–von Mises statistic
    * ([[graft.operators.HypothesisOps.cvmTest]]). Returns
    * `(n_a, n_b, t_cvm)`. */
  private[graft] def cvmTestPlan(exprs: Seq[Expression]): LogicalPlan = {
    arity("cvm_test(table, value_col, group_col, a, b)", exprs, 5, 5)
    val v = litStr("cvm_test", "value_col", exprs(1))
    val g = litStr("cvm_test", "group_col", exprs(2))
    val df = namedTable("cvm_test",
      litStr("cvm_test", "table", exprs(0)), Seq(v, g))
    graft.operators.HypothesisOps.cvmTest(df, v, g,
      litStr("cvm_test", "a", exprs(3)),
      litStr("cvm_test", "b", exprs(4)))
      .queryExecution.analyzed
  }

  /** `ks_by(table, value_col, group_col, a, b, seg_col)` —
    * per-segment two-sample KS on the grouped spine
    * ([[graft.operators.HypothesisOps.ksBy]]). Returns
    * `(<seg_col>, n_a, n_b, d_stat, p_value)`. */
  private[graft] def ksByPlan(exprs: Seq[Expression]): LogicalPlan = {
    arity("ks_by(table, value_col, group_col, a, b, seg_col)",
      exprs, 6, 6)
    val v = litStr("ks_by", "value_col", exprs(1))
    val g = litStr("ks_by", "group_col", exprs(2))
    val seg = litStr("ks_by", "seg_col", exprs(5))
    val df = namedTable("ks_by", litStr("ks_by", "table", exprs(0)),
      Seq(v, g, seg))
    graft.operators.HypothesisOps.ksBy(df, v, g,
      litStr("ks_by", "a", exprs(3)), litStr("ks_by", "b", exprs(4)),
      seg).queryExecution.analyzed
  }

  /** `energy_distance(table, value_col, group_col, a, b)` —
    * two-sample energy distance + Székely–Rizzo statistic
    * ([[graft.operators.HypothesisOps.energyDistance]]). Returns
    * `(n_a, n_b, e_xy, e_dist, t_stat)`. */
  private[graft] def energyDistancePlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("energy_distance(table, value_col, group_col, a, b)",
      exprs, 5, 5)
    val v = litStr("energy_distance", "value_col", exprs(1))
    val g = litStr("energy_distance", "group_col", exprs(2))
    val df = namedTable("energy_distance",
      litStr("energy_distance", "table", exprs(0)), Seq(v, g))
    graft.operators.HypothesisOps.energyDistance(df, v, g,
      litStr("energy_distance", "a", exprs(3)),
      litStr("energy_distance", "b", exprs(4)))
      .queryExecution.analyzed
  }

  /** `lift_table(table, score_col, group_col, pos, neg [, n])` —
    * descending-score decile lift / cumulative-gains report
    * ([[graft.operators.HypothesisOps.liftTable]]). Returns
    * `(decile, n, n_pos, resp_rate, lift, cum_gain, cum_lift)`. */
  private[graft] def liftTablePlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("lift_table(table, score_col, group_col, pos, neg [, n])",
      exprs, 5, 6)
    val v = litStr("lift_table", "score_col", exprs(1))
    val g = litStr("lift_table", "group_col", exprs(2))
    val df = namedTable("lift_table",
      litStr("lift_table", "table", exprs(0)), Seq(v, g))
    val nD = if (exprs.length > 5)
      litDouble("lift_table", "n", exprs(5)).toInt else 10
    graft.operators.HypothesisOps.liftTable(df, v, g,
      litStr("lift_table", "pos", exprs(3)),
      litStr("lift_table", "neg", exprs(4)), nD)
      .queryExecution.analyzed
  }

  /** `cuped(table, arm_col, pre_col, post_col)` — CUPED variance-
    * reduced A/B readout over a per-unit (arm, pre, post) table
    * ([[graft.operators.StatsOps.cuped]]). Returns `(arm, n,
    * mean_raw, mean_adj, theta, var_raw, var_adj, var_reduction)`. */
  private[graft] def cupedPlan(exprs: Seq[Expression]): LogicalPlan = {
    arity("cuped(table, arm_col, pre_col, post_col)", exprs, 4, 4)
    val a = litStr("cuped", "arm_col", exprs(1))
    val x = litStr("cuped", "pre_col", exprs(2))
    val y = litStr("cuped", "post_col", exprs(3))
    val df = namedTable("cuped", litStr("cuped", "table", exprs(0)),
      Seq(a, x, y))
    graft.operators.StatsOps.cuped(df, a, x, y)
      .queryExecution.analyzed
  }

  /** `delta_method(table, arm_col, num_col, den_col)` — ratio-metric
    * delta-method CI over a per-unit (arm, num, den) table
    * ([[graft.operators.StatsOps.deltaMethod]]). Returns
    * `(arm, n, ratio, se, ci_lo, ci_hi)`. */
  private[graft] def deltaMethodPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("delta_method(table, arm_col, num_col, den_col)", exprs, 4, 4)
    val a = litStr("delta_method", "arm_col", exprs(1))
    val y = litStr("delta_method", "num_col", exprs(2))
    val x = litStr("delta_method", "den_col", exprs(3))
    val df = namedTable("delta_method",
      litStr("delta_method", "table", exprs(0)), Seq(a, y, x))
    graft.operators.StatsOps.deltaMethod(df, a, y, x)
      .queryExecution.analyzed
  }

  /** `fdr_bh(table, key_col, p_col [, alpha])` — Benjamini–Hochberg
    * step-up FDR adjustment over a (key, p-value) table
    * ([[graft.operators.HypothesisOps.fdrBh]]). Returns
    * `(key, p_value, rank, q_value, rejected)`. */
  private[graft] def fdrBhPlan(exprs: Seq[Expression]): LogicalPlan = {
    arity("fdr_bh(table, key_col, p_col [, alpha])", exprs, 3, 4)
    val k = litStr("fdr_bh", "key_col", exprs(1))
    val p = litStr("fdr_bh", "p_col", exprs(2))
    val df = namedTable("fdr_bh", litStr("fdr_bh", "table", exprs(0)),
      Seq(k, p))
    val alpha = if (exprs.length > 3)
      litDouble("fdr_bh", "alpha", exprs(3)) else 0.05
    graft.operators.HypothesisOps.fdrBh(df, k, p, alpha)
      .queryExecution.analyzed
  }

  /** `setsim_join(table, id_col, text_col, threshold [, within_col])`
    * — exact word-set Jaccard self-join by lossless prefix filtering
    * ([[graft.operators.DedupOps.setSimJoin]]). Returns
    * `(a_id, b_id, jacc)`. */
  private[graft] def setSimJoinPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("setsim_join(table, id_col, text_col, threshold " +
      "[, within_col])", exprs, 4, 5)
    val id = litStr("setsim_join", "id_col", exprs(1))
    val tx = litStr("setsim_join", "text_col", exprs(2))
    val within = if (exprs.length > 4)
      Some(litStr("setsim_join", "within_col", exprs(4))) else None
    val df = namedTable("setsim_join",
      litStr("setsim_join", "table", exprs(0)),
      Seq(id, tx) ++ within)
    graft.operators.DedupOps.setSimJoin(df, id, tx,
      litDouble("setsim_join", "threshold", exprs(3)), within)
      .queryExecution.analyzed
  }

  /** `logit_fit(table, label_col, x1, x2 [, steps])` — fixed-step
    * IRLS logistic regression with Wald SEs and mean deviance
    * ([[graft.operators.FitOps.logitFit]]). Returns
    * `(term_idx, term, beta, se, n, mean_deviance)`. */
  private[graft] def logitFitPlan(exprs: Seq[Expression]): LogicalPlan = {
    arity("logit_fit(table, label_col, x1, x2 [, steps])", exprs, 4, 5)
    val y = litStr("logit_fit", "label_col", exprs(1))
    val x1 = litStr("logit_fit", "x1", exprs(2))
    val x2 = litStr("logit_fit", "x2", exprs(3))
    val df = namedTable("logit_fit",
      litStr("logit_fit", "table", exprs(0)), Seq(y, x1, x2))
    val steps = if (exprs.length > 4)
      litDouble("logit_fit", "steps", exprs(4)).toInt else 8
    graft.operators.FitOps.logitFit(df, y, Seq(x1, x2), steps)
      .queryExecution.analyzed
  }

  /** `ipw_ate(table, treat_col, outcome_col, x1, x2 [, steps])` —
    * Hájek inverse-propensity-weighted ATE with an IRLS propensity
    * ([[graft.operators.FitOps.ipwAte]]). Returns
    * `(n, n_treated, mean_treated, mean_control, ate)`. */
  private[graft] def ipwAtePlan(exprs: Seq[Expression]): LogicalPlan = {
    arity("ipw_ate(table, treat_col, outcome_col, x1, x2 [, steps])",
      exprs, 5, 6)
    val t = litStr("ipw_ate", "treat_col", exprs(1))
    val y = litStr("ipw_ate", "outcome_col", exprs(2))
    val x1 = litStr("ipw_ate", "x1", exprs(3))
    val x2 = litStr("ipw_ate", "x2", exprs(4))
    val df = namedTable("ipw_ate",
      litStr("ipw_ate", "table", exprs(0)), Seq(t, y, x1, x2))
    val steps = if (exprs.length > 5)
      litDouble("ipw_ate", "steps", exprs(5)).toInt else 8
    graft.operators.FitOps.ipwAte(df, t, y, Seq(x1, x2), steps)
      .queryExecution.analyzed
  }

  /** `did_estimate(table, arm_col, treat_val, pre_col, post_col)` —
    * panel difference-in-differences
    * ([[graft.operators.StatsOps.didEstimate]]). Returns
    * `(n_treat, n_ctrl, delta_treat, delta_ctrl, did, se, z)`. */
  private[graft] def didEstimatePlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("did_estimate(table, arm_col, treat_val, pre_col, post_col)",
      exprs, 5, 5)
    val a = litStr("did_estimate", "arm_col", exprs(1))
    val pre = litStr("did_estimate", "pre_col", exprs(3))
    val post = litStr("did_estimate", "post_col", exprs(4))
    val df = namedTable("did_estimate",
      litStr("did_estimate", "table", exprs(0)), Seq(a, pre, post))
    graft.operators.StatsOps.didEstimate(df, a,
      litStr("did_estimate", "treat_val", exprs(2)), pre, post)
      .queryExecution.analyzed
  }

  /** `propensity_match(table, treat_col, outcome_col, id_col, x1, x2
    * [, steps])` — nearest-propensity matching ATT
    * ([[graft.operators.FitOps.propensityMatch]]). Returns
    * `(n_treat, n_ctrl, mean_treated, mean_matched, att)`. */
  private[graft] def propensityMatchPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("propensity_match(table, treat_col, outcome_col, id_col, " +
      "x1, x2 [, steps])", exprs, 6, 7)
    val t = litStr("propensity_match", "treat_col", exprs(1))
    val y = litStr("propensity_match", "outcome_col", exprs(2))
    val id = litStr("propensity_match", "id_col", exprs(3))
    val x1 = litStr("propensity_match", "x1", exprs(4))
    val x2 = litStr("propensity_match", "x2", exprs(5))
    val df = namedTable("propensity_match",
      litStr("propensity_match", "table", exprs(0)),
      Seq(t, y, id, x1, x2))
    val steps = if (exprs.length > 6)
      litDouble("propensity_match", "steps", exprs(6)).toInt else 8
    graft.operators.FitOps.propensityMatch(df, t, y, id,
      Seq(x1, x2), steps).queryExecution.analyzed
  }

  /** `brier_decomp(table, prob_col, label_col [, bins])` — Murphy
    * decomposition of the Brier score
    * ([[graft.operators.ProfileOps.brierDecomp]]). Returns `(n,
    * brier, reliability, resolution, uncertainty, within_var)`. */
  private[graft] def brierDecompPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("brier_decomp(table, prob_col, label_col [, bins])",
      exprs, 3, 4)
    val p = litStr("brier_decomp", "prob_col", exprs(1))
    val l = litStr("brier_decomp", "label_col", exprs(2))
    val df = namedTable("brier_decomp",
      litStr("brier_decomp", "table", exprs(0)), Seq(p, l))
    val bins = if (exprs.length > 3)
      litDouble("brier_decomp", "bins", exprs(3)).toInt else 10
    graft.operators.ProfileOps.brierDecomp(df, p, l, bins)
      .queryExecution.analyzed
  }

  /** `power_analysis(table, value_col, group_col, a, b)` — two-sample
    * MDE at 80% power / α = 5% and the per-arm n needed for the
    * observed gap ([[graft.operators.StatsOps.powerAnalysis]]).
    * Returns `(n_a, n_b, observed_delta, mde, n_per_arm_needed)`. */
  private[graft] def powerAnalysisPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("power_analysis(table, value_col, group_col, a, b)",
      exprs, 5, 5)
    val v = litStr("power_analysis", "value_col", exprs(1))
    val g = litStr("power_analysis", "group_col", exprs(2))
    val df = namedTable("power_analysis",
      litStr("power_analysis", "table", exprs(0)), Seq(v, g))
    graft.operators.StatsOps.powerAnalysis(df, g, v,
      litStr("power_analysis", "a", exprs(3)),
      litStr("power_analysis", "b", exprs(4)))
      .queryExecution.analyzed
  }

  /** `auc_ci(table, score_col, group_col, pos, neg)` — ROC AUC with
    * DeLong standard error + 95% CI
    * ([[graft.operators.HypothesisOps.aucCi]]). */
  private[graft] def aucCiPlan(exprs: Seq[Expression]): LogicalPlan = {
    arity("auc_ci(table, score_col, group_col, pos, neg)", exprs, 5, 5)
    val v = litStr("auc_ci", "score_col", exprs(1))
    val g = litStr("auc_ci", "group_col", exprs(2))
    val df = namedTable("auc_ci", litStr("auc_ci", "table", exprs(0)),
      Seq(v, g))
    graft.operators.HypothesisOps.aucCi(df, v, g,
      litStr("auc_ci", "pos", exprs(3)),
      litStr("auc_ci", "neg", exprs(4)))
      .queryExecution.analyzed
  }

  /** `ranking_eval(table, q_col, id_col, score_col, rel_col [, k])` —
    * corpus precision/recall/MRR/NDCG at k over per-query candidate
    * rankings ([[graft.operators.HypothesisOps.rankingEval]]). */
  private[graft] def rankingEvalPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("ranking_eval(table, q_col, id_col, score_col, rel_col " +
      "[, k])", exprs, 5, 6)
    val qc = litStr("ranking_eval", "q_col", exprs(1))
    val ic = litStr("ranking_eval", "id_col", exprs(2))
    val sc = litStr("ranking_eval", "score_col", exprs(3))
    val rc = litStr("ranking_eval", "rel_col", exprs(4))
    val df = namedTable("ranking_eval",
      litStr("ranking_eval", "table", exprs(0)), Seq(qc, ic, sc, rc))
    val k = if (exprs.length > 5)
      litDouble("ranking_eval", "k", exprs(5)).toInt else 10
    graft.operators.HypothesisOps.rankingEval(df, qc, ic, sc, rc, k)
      .queryExecution.analyzed
  }

  /** `calibration(table, prob_col, label_col [, n_bins])` —
    * reliability table + Brier/ECE
    * ([[graft.operators.ProfileOps.calibration]]). */
  private[graft] def calibrationPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("calibration(table, prob_col, label_col [, n_bins])",
      exprs, 3, 4)
    val p = litStr("calibration", "prob_col", exprs(1))
    val l = litStr("calibration", "label_col", exprs(2))
    val df = namedTable("calibration",
      litStr("calibration", "table", exprs(0)), Seq(p, l))
    val nBins = if (exprs.length > 3)
      litDouble("calibration", "n_bins", exprs(3)).toInt else 10
    require(nBins >= 2, s"calibration n_bins must be >= 2; got $nBins")
    graft.operators.ProfileOps.calibration(df, p, l, nBins)
      .queryExecution.analyzed
  }

  /** `effect_size(table, value_col, group_col, a, b)` — Cohen's d /
    * Hedges' g / Glass's Δ
    * ([[graft.operators.HypothesisOps.effectSize]]). */
  private[graft] def effectSizePlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("effect_size(table, value_col, group_col, a, b)", exprs, 5, 5)
    val v = litStr("effect_size", "value_col", exprs(1))
    val g = litStr("effect_size", "group_col", exprs(2))
    val df = namedTable("effect_size",
      litStr("effect_size", "table", exprs(0)), Seq(v, g))
    graft.operators.HypothesisOps.effectSize(df, v, g,
      litStr("effect_size", "a", exprs(3)),
      litStr("effect_size", "b", exprs(4)))
      .queryExecution.analyzed
  }

  /** `nelson_aalen(table, subject_col, ts_col [, censor_days])` —
    * cumulative-hazard table
    * ([[graft.operators.FitOps.nelsonAalen]]). */
  private[graft] def nelsonAalenPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("nelson_aalen(table, subject_col, ts_col [, censor_days])",
      exprs, 3, 4)
    val s = litStr("nelson_aalen", "subject_col", exprs(1))
    val t = litStr("nelson_aalen", "ts_col", exprs(2))
    val df = namedTable("nelson_aalen",
      litStr("nelson_aalen", "table", exprs(0)), Seq(s, t))
    val censor = if (exprs.length > 3)
      litDouble("nelson_aalen", "censor_days", exprs(3)).toInt else 3
    require(censor > 0,
      s"nelson_aalen censor_days must be positive; got $censor")
    graft.operators.FitOps.nelsonAalen(df, s, t, censor)
      .queryExecution.analyzed
  }

  /** `mann_whitney(table, value_col, group_col, a, b)` — tie-corrected
    * Mann–Whitney U ([[graft.operators.HypothesisOps.mannWhitney]]).
    * Returns `(n_a, n_b, u, z)`. */
  private[graft] def mannWhitneyPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("mann_whitney(table, value_col, group_col, a, b)", exprs, 5, 5)
    val v = litStr("mann_whitney", "value_col", exprs(1))
    val g = litStr("mann_whitney", "group_col", exprs(2))
    val df = namedTable("mann_whitney",
      litStr("mann_whitney", "table", exprs(0)), Seq(v, g))
    graft.operators.HypothesisOps.mannWhitney(df, v, g,
      litStr("mann_whitney", "a", exprs(3)),
      litStr("mann_whitney", "b", exprs(4)))
      .queryExecution.analyzed
  }

  /** `mmr(table, qid_col, cid_col, rel_col, emb_col, k [, lambda])` —
    * maximal-marginal-relevance diversified rerank
    * ([[graft.operators.SimilarityOps.mmrRerank]]). Returns
    * `(qid, cid, rank, rel, score)`. NOTE: eager (k pinned greedy
    * sweeps). */
  private[graft] def mmrPlan(exprs: Seq[Expression]): LogicalPlan = {
    arity("mmr(table, qid_col, cid_col, rel_col, emb_col, k " +
      "[, lambda])", exprs, 6, 7)
    val q = litStr("mmr", "qid_col", exprs(1))
    val c = litStr("mmr", "cid_col", exprs(2))
    val r = litStr("mmr", "rel_col", exprs(3))
    val e = litStr("mmr", "emb_col", exprs(4))
    val k = litDouble("mmr", "k", exprs(5)).toInt
    val lam = if (exprs.length > 6)
      litDouble("mmr", "lambda", exprs(6)) else 0.7
    val df = namedTable("mmr", litStr("mmr", "table", exprs(0)),
      Seq(q, c, r, e))
    graft.operators.SimilarityOps.mmrRerank(df, q, c, r, e, k, lam)
      .queryExecution.analyzed
  }

  /** `eb_shrinkage(table, entity_col, hit_col [, min_n])` —
    * Beta-Binomial empirical-Bayes rate shrinkage
    * ([[graft.operators.StatsOps.ebShrinkage]]). Returns one row per
    * entity `(entity, n, x, rate_raw, rate_shrunk, alpha, beta)`. */
  private[graft] def ebShrinkagePlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("eb_shrinkage(table, entity_col, hit_col [, min_n])",
      exprs, 3, 4)
    val e = litStr("eb_shrinkage", "entity_col", exprs(1))
    val h = litStr("eb_shrinkage", "hit_col", exprs(2))
    val minN = if (exprs.length > 3)
      litDouble("eb_shrinkage", "min_n", exprs(3)).toLong else 5L
    val df = namedTable("eb_shrinkage",
      litStr("eb_shrinkage", "table", exprs(0)), Seq(e, h))
    graft.operators.StatsOps.ebShrinkage(df, e, h, minN)
      .queryExecution.analyzed
  }

  /** `rolling_corr(table, ts_col, x_col, y_col [, span])` — trailing
    * correlation of two daily series
    * ([[graft.operators.EventOps.rollingCorr]]). Returns
    * `(d, x, y, rcorr)`. */
  private[graft] def rollingCorrPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("rolling_corr(table, ts_col, x_col, y_col [, span])",
      exprs, 4, 5)
    val t = litStr("rolling_corr", "ts_col", exprs(1))
    val x = litStr("rolling_corr", "x_col", exprs(2))
    val y = litStr("rolling_corr", "y_col", exprs(3))
    val span = if (exprs.length > 4)
      litDouble("rolling_corr", "span", exprs(4)).toInt else 14
    val df = namedTable("rolling_corr",
      litStr("rolling_corr", "table", exprs(0)), Seq(t, x, y))
    graft.operators.EventOps.rollingCorr(df, t, x, y, span)
      .queryExecution.analyzed
  }

  /** `forecast_baseline(table, ts_col, value_col [, period])` —
    * one-step backtest of naive / seasonal-naive / drift
    * ([[graft.operators.EventOps.forecastBaseline]]). Returns one
    * row per method `(method, n, mae, rmse, mape)`. */
  private[graft] def forecastBaselinePlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("forecast_baseline(table, ts_col, value_col [, period])",
      exprs, 3, 4)
    val t = litStr("forecast_baseline", "ts_col", exprs(1))
    val v = litStr("forecast_baseline", "value_col", exprs(2))
    val period = if (exprs.length > 3)
      litDouble("forecast_baseline", "period", exprs(3)).toInt else 7
    val df = namedTable("forecast_baseline",
      litStr("forecast_baseline", "table", exprs(0)), Seq(t, v))
    graft.operators.EventOps.forecastBaseline(df, t, v, period)
      .queryExecution.analyzed
  }

  /** `seq_entropy(table, user_col, ts_col, id_col, type_col)` —
    * conditional vs marginal transition entropy
    * ([[graft.operators.EventOps.seqEntropy]]). Returns `(n_pairs,
    * n_states, n_cells, h_next, h_cond, info_gain)`. */
  private[graft] def seqEntropyPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("seq_entropy(table, user_col, ts_col, id_col, type_col)",
      exprs, 5, 5)
    val u = litStr("seq_entropy", "user_col", exprs(1))
    val t = litStr("seq_entropy", "ts_col", exprs(2))
    val i = litStr("seq_entropy", "id_col", exprs(3))
    val ty = litStr("seq_entropy", "type_col", exprs(4))
    val df = namedTable("seq_entropy",
      litStr("seq_entropy", "table", exprs(0)), Seq(u, t, i, ty))
    graft.operators.EventOps.seqEntropy(df, u, t, i, ty)
      .queryExecution.analyzed
  }

  /** `quantile_normalize(table, id_col, cols)` — cross-column
    * quantile normalization over the space-separated `cols`
    * ([[graft.operators.CurationOps.quantileNormalize]]). Returns
    * the id plus one `qn_<col>` per input column. */
  private[graft] def quantileNormalizePlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("quantile_normalize(table, id_col, cols)", exprs, 3, 3)
    val id = litStr("quantile_normalize", "id_col", exprs(1))
    val cols = litStr("quantile_normalize", "cols", exprs(2)).trim
      .split("\\s+").toSeq
    val df = namedTable("quantile_normalize",
      litStr("quantile_normalize", "table", exprs(0)), id +: cols)
    graft.operators.CurationOps.quantileNormalize(df, id, cols)
      .queryExecution.analyzed
  }

  /** `quantile_reg(table, y_col, x_col, q [, steps, eps])` —
    * fixed-step IRLS quantile regression
    * ([[graft.operators.FitOps.quantileReg]]). Returns `(n, q,
    * intercept, slope, mean_pinball)`. NOTE: eager (steps+2 driver
    * passes). */
  private[graft] def quantileRegPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("quantile_reg(table, y_col, x_col, q [, steps, eps])",
      exprs, 4, 6)
    val y = litStr("quantile_reg", "y_col", exprs(1))
    val x = litStr("quantile_reg", "x_col", exprs(2))
    val q = litDouble("quantile_reg", "q", exprs(3))
    val steps = if (exprs.length > 4)
      litDouble("quantile_reg", "steps", exprs(4)).toInt else 8
    val eps = if (exprs.length > 5)
      litDouble("quantile_reg", "eps", exprs(5)) else 1e-3
    val df = namedTable("quantile_reg",
      litStr("quantile_reg", "table", exprs(0)), Seq(y, x))
    graft.operators.FitOps.quantileReg(df, y, x, q, steps, eps)
      .queryExecution.analyzed
  }

  /** `ltv_curve(table, cust_col, date_col, revenue_col [, max_age])`
    * — observed cumulative revenue per cohort member by age
    * ([[graft.operators.FitOps.ltvCurve]]). Returns `(cohort, k,
    * cohort_size, revenue, cum_revenue, ltv)`. */
  private[graft] def ltvCurvePlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("ltv_curve(table, cust_col, date_col, revenue_col " +
      "[, max_age])", exprs, 4, 5)
    val c = litStr("ltv_curve", "cust_col", exprs(1))
    val d = litStr("ltv_curve", "date_col", exprs(2))
    val r = litStr("ltv_curve", "revenue_col", exprs(3))
    val maxAge = if (exprs.length > 4)
      litDouble("ltv_curve", "max_age", exprs(4)).toInt else 11
    val df = namedTable("ltv_curve",
      litStr("ltv_curve", "table", exprs(0)), Seq(c, d, r))
    graft.operators.FitOps.ltvCurve(df, c, d, r, maxAge)
      .queryExecution.analyzed
  }

  /** `evt_gumbel(table, ts_col, value_col)` — Gumbel block-maxima fit
    * with return levels ([[graft.operators.StatsOps.evtGumbel]]).
    * Returns `(n_blocks, mean_max, sd_max, gumbel_mu, gumbel_beta,
    * ret_level_10, ret_level_100)`. */
  private[graft] def evtGumbelPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("evt_gumbel(table, ts_col, value_col)", exprs, 3, 3)
    val t = litStr("evt_gumbel", "ts_col", exprs(1))
    val v = litStr("evt_gumbel", "value_col", exprs(2))
    val df = namedTable("evt_gumbel",
      litStr("evt_gumbel", "table", exprs(0)), Seq(t, v))
    graft.operators.StatsOps.evtGumbel(df, t, v)
      .queryExecution.analyzed
  }

  /** `odds_ratio(table, exposure_col, outcome_col)` — 2×2 OR/RR with
    * Wald CIs ([[graft.operators.StatsOps.oddsRatio]]). Returns
    * `(a, b, c, d, odds_ratio, or_lo, or_hi, risk_ratio, rr_lo,
    * rr_hi, p_value)`. */
  private[graft] def oddsRatioPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("odds_ratio(table, exposure_col, outcome_col)", exprs, 3, 3)
    val e = litStr("odds_ratio", "exposure_col", exprs(1))
    val o = litStr("odds_ratio", "outcome_col", exprs(2))
    val df = namedTable("odds_ratio",
      litStr("odds_ratio", "table", exprs(0)), Seq(e, o))
    graft.operators.StatsOps.oddsRatio(df, e, o)
      .queryExecution.analyzed
  }

  /** `msprt(table, ts_col, arm_col, value_col, a, b [, tau])` —
    * always-valid sequential p over daily looks
    * ([[graft.operators.StatsOps.msprt]]). Returns one row per look
    * `(look, n_a, n_b, mean_diff, lambda, p_always_valid)`. */
  private[graft] def msprtPlan(exprs: Seq[Expression]): LogicalPlan = {
    arity("msprt(table, ts_col, arm_col, value_col, a, b [, tau])",
      exprs, 6, 7)
    val t = litStr("msprt", "ts_col", exprs(1))
    val a = litStr("msprt", "arm_col", exprs(2))
    val v = litStr("msprt", "value_col", exprs(3))
    val tau = if (exprs.length > 6)
      litDouble("msprt", "tau", exprs(6)) else 0.0
    val df = namedTable("msprt",
      litStr("msprt", "table", exprs(0)), Seq(t, a, v))
    graft.operators.StatsOps.msprt(df, t, a, v,
      litStr("msprt", "a", exprs(4)), litStr("msprt", "b", exprs(5)),
      tau).queryExecution.analyzed
  }

  /** `dist_fit(table, value_col, group_col)` — lognormal + gamma
    * method-of-moments fits per group
    * ([[graft.operators.StatsOps.distFit]]). Returns `(group,
    * n_total, n, mean, stddev, lnorm_mu, lnorm_sigma, gamma_k,
    * gamma_theta)`. */
  private[graft] def distFitPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("dist_fit(table, value_col, group_col)", exprs, 3, 3)
    val v = litStr("dist_fit", "value_col", exprs(1))
    val g = litStr("dist_fit", "group_col", exprs(2))
    val df = namedTable("dist_fit",
      litStr("dist_fit", "table", exprs(0)), Seq(v, g))
    graft.operators.StatsOps.distFit(df, v, g)
      .queryExecution.analyzed
  }

  /** `logrank(table, t_col, event_col, group_col, a, b)` — two-group
    * log-rank survival test ([[graft.operators.FitOps.logRank]]).
    * Returns `(n_a, n_b, n_times, o1, e1, chi2, p_value)`. */
  private[graft] def logRankPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("logrank(table, t_col, event_col, group_col, a, b)",
      exprs, 6, 6)
    val t = litStr("logrank", "t_col", exprs(1))
    val e = litStr("logrank", "event_col", exprs(2))
    val g = litStr("logrank", "group_col", exprs(3))
    val df = namedTable("logrank",
      litStr("logrank", "table", exprs(0)), Seq(t, e, g))
    graft.operators.FitOps.logRank(df, t, e, g,
      litStr("logrank", "a", exprs(4)),
      litStr("logrank", "b", exprs(5)))
      .queryExecution.analyzed
  }

  /** `dickey_fuller(table, t_col, y_col)` — unit-root check on a
    * one-row-per-step series
    * ([[graft.operators.FitOps.dickeyFuller]]). Returns
    * `(n, beta, alpha, df_stat)`. */
  private[graft] def dickeyFullerPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("dickey_fuller(table, t_col, y_col)", exprs, 3, 3)
    val t = litStr("dickey_fuller", "t_col", exprs(1))
    val y = litStr("dickey_fuller", "y_col", exprs(2))
    val df = namedTable("dickey_fuller",
      litStr("dickey_fuller", "table", exprs(0)), Seq(t, y))
    graft.operators.FitOps.dickeyFuller(df, t, y)
      .queryExecution.analyzed
  }

  /** `mcnemar(table, a_col, b_col)` — paired-binary McNemar test
    * ([[graft.operators.StatsOps.mcnemar]]). Returns
    * `(n, n10, n01, chi2, chi2_cc, p_value)`. */
  private[graft] def mcnemarPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("mcnemar(table, a_col, b_col)", exprs, 3, 3)
    val a = litStr("mcnemar", "a_col", exprs(1))
    val b = litStr("mcnemar", "b_col", exprs(2))
    val df = namedTable("mcnemar",
      litStr("mcnemar", "table", exprs(0)), Seq(a, b))
    graft.operators.StatsOps.mcnemar(df, a, b)
      .queryExecution.analyzed
  }

  /** `rolling_quantile(table, part_col, ts_col, id_col, value_col,
    * p [, span])` — per-group rolling lower quantile
    * ([[graft.operators.EventOps.rollingQuantile]]). */
  private[graft] def rollingQuantilePlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("rolling_quantile(table, part_col, ts_col, id_col, " +
      "value_col, p [, span])", exprs, 6, 7)
    val pc = litStr("rolling_quantile", "part_col", exprs(1))
    val tc = litStr("rolling_quantile", "ts_col", exprs(2))
    val ic = litStr("rolling_quantile", "id_col", exprs(3))
    val vc = litStr("rolling_quantile", "value_col", exprs(4))
    val p = litDouble("rolling_quantile", "p", exprs(5))
    val span = if (exprs.length > 6)
      litDouble("rolling_quantile", "span", exprs(6)).toInt else 20
    val df = namedTable("rolling_quantile",
      litStr("rolling_quantile", "table", exprs(0)),
      Seq(pc, tc, ic, vc))
    graft.operators.EventOps.rollingQuantile(df, pc, tc, ic, vc, p,
      span).queryExecution.analyzed
  }

  /** `granger(table, t_col, x_col, y_col)` — lag-1 Granger causality
    * F-test on a one-row-per-step series
    * ([[graft.operators.FitOps.grangerLag1]]). Returns
    * `(n, beta_xlag, sse_r, sse_u, f_stat, dof_den)`. */
  private[graft] def grangerPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("granger(table, t_col, x_col, y_col)", exprs, 4, 4)
    val t = litStr("granger", "t_col", exprs(1))
    val x = litStr("granger", "x_col", exprs(2))
    val y = litStr("granger", "y_col", exprs(3))
    val df = namedTable("granger",
      litStr("granger", "table", exprs(0)), Seq(t, x, y))
    graft.operators.FitOps.grangerLag1(df, t, x, y)
      .queryExecution.analyzed
  }

  /** `pacf(table, group_col, ts_col, value_col [, max_lag,
    * bucket_seconds])` — partial autocorrelation via Durbin–Levinson
    * ([[graft.operators.EventOps.pacf]]). Returns
    * `(g, lag, n_buckets, pacf)`. NOTE: eager (driver recursion over
    * the bounded covariance table). */
  private[graft] def pacfPlan(exprs: Seq[Expression]): LogicalPlan = {
    arity("pacf(table, group_col, ts_col, value_col [, max_lag, " +
      "bucket_seconds])", exprs, 4, 6)
    val g = litStr("pacf", "group_col", exprs(1))
    val t = litStr("pacf", "ts_col", exprs(2))
    val v = litStr("pacf", "value_col", exprs(3))
    val maxLag = if (exprs.length > 4)
      litDouble("pacf", "max_lag", exprs(4)).toInt else 12
    val bs = if (exprs.length > 5)
      litDouble("pacf", "bucket_seconds", exprs(5)).toLong else 3600L
    val df = namedTable("pacf",
      litStr("pacf", "table", exprs(0)), Seq(g, t, v))
    graft.operators.EventOps.pacf(df, g, t, v, maxLag, bs)
      .queryExecution.analyzed
  }

  /** `readability(table, id_col, text_col)` — Flesch / FK grade per
    * document ([[graft.operators.TextOps.readability]]). Returns
    * `(id, words, sentences, syllables, flesch, fk_grade)`. */
  private[graft] def readabilityPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("readability(table, id_col, text_col)", exprs, 3, 3)
    val i = litStr("readability", "id_col", exprs(1))
    val t = litStr("readability", "text_col", exprs(2))
    val df = namedTable("readability",
      litStr("readability", "table", exprs(0)), Seq(i, t))
    graft.operators.TextOps.readability(df, i, t)
      .queryExecution.analyzed
  }

  /** `feature_hash(table, key_col, cols [, n_buckets])` — hashing-
    * trick encoder over the space-separated `cols`
    * ([[graft.operators.CurationOps.featureHash]]). Returns the key
    * plus `(h_<col>, s_<col>)` per input column. */
  private[graft] def featureHashPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("feature_hash(table, key_col, cols [, n_buckets])",
      exprs, 3, 4)
    val k = litStr("feature_hash", "key_col", exprs(1))
    val cols = litStr("feature_hash", "cols", exprs(2)).trim
      .split("\\s+").toSeq
    val nB = if (exprs.length > 3)
      litDouble("feature_hash", "n_buckets", exprs(3)).toInt else 64
    val df = namedTable("feature_hash",
      litStr("feature_hash", "table", exprs(0)), k +: cols)
    graft.operators.CurationOps.featureHash(df, k, cols, nB)
      .queryExecution.analyzed
  }

  /** `hampel(table, part_col, ts_col, id_col, value_col [, span, k])`
    * — rolling-median outlier flag + repaired series
    * ([[graft.operators.EventOps.hampel]]). Returns the id/part/ts/
    * value columns plus `(rmed, sigma, is_outlier, cleaned)`. */
  private[graft] def hampelPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("hampel(table, part_col, ts_col, id_col, value_col " +
      "[, span, k])", exprs, 5, 7)
    val p = litStr("hampel", "part_col", exprs(1))
    val t = litStr("hampel", "ts_col", exprs(2))
    val i = litStr("hampel", "id_col", exprs(3))
    val v = litStr("hampel", "value_col", exprs(4))
    val span = if (exprs.length > 5)
      litDouble("hampel", "span", exprs(5)).toInt else 20
    val k = if (exprs.length > 6)
      litDouble("hampel", "k", exprs(6)) else 3.0
    val df = namedTable("hampel",
      litStr("hampel", "table", exprs(0)), Seq(p, t, i, v))
    graft.operators.EventOps.hampel(df, p, t, i, v, span, k)
      .queryExecution.analyzed
  }

  /** `seasonal_decompose(table, ts_col, value_col [, period])` —
    * additive trend/seasonal/remainder split of the daily mean series
    * ([[graft.operators.EventOps.seasonalDecompose]]). Returns
    * `(d, pidx, v, trend, seasonal, remainder)`. */
  private[graft] def seasonalDecomposePlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("seasonal_decompose(table, ts_col, value_col [, period])",
      exprs, 3, 4)
    val t = litStr("seasonal_decompose", "ts_col", exprs(1))
    val v = litStr("seasonal_decompose", "value_col", exprs(2))
    val period = if (exprs.length > 3)
      litDouble("seasonal_decompose", "period", exprs(3)).toInt else 7
    val df = namedTable("seasonal_decompose",
      litStr("seasonal_decompose", "table", exprs(0)), Seq(t, v))
    graft.operators.EventOps.seasonalDecompose(df, t, v, period)
      .queryExecution.analyzed
  }

  /** `vif(table, cols)` — variance inflation factors over the THREE
    * space-separated `cols` ([[graft.operators.ProfileOps.vif]]).
    * Returns `(feature, n, vif, r2_others)`. */
  private[graft] def vifPlan(exprs: Seq[Expression]): LogicalPlan = {
    arity("vif(table, cols)", exprs, 2, 2)
    val cols = litStr("vif", "cols", exprs(1)).trim
      .split("\\s+").toSeq
    val df = namedTable("vif", litStr("vif", "table", exprs(0)), cols)
    graft.operators.ProfileOps.vif(df, cols)
      .queryExecution.analyzed
  }

  /** `woe_iv(table, cat_col, label_col)` — weight-of-evidence /
    * information-value screen
    * ([[graft.operators.ProfileOps.woeIv]]). Returns
    * `(level, n, n_pos, n_neg, woe, iv_term, iv)`. */
  private[graft] def woeIvPlan(exprs: Seq[Expression]): LogicalPlan = {
    arity("woe_iv(table, cat_col, label_col)", exprs, 3, 3)
    val c = litStr("woe_iv", "cat_col", exprs(1))
    val l = litStr("woe_iv", "label_col", exprs(2))
    val df = namedTable("woe_iv",
      litStr("woe_iv", "table", exprs(0)), Seq(c, l))
    graft.operators.ProfileOps.woeIv(df, c, l)
      .queryExecution.analyzed
  }

  /** `iv_wald(table, z_col, x_col, y_col)` — just-identified 2SLS /
    * Wald IV estimator ([[graft.operators.FitOps.ivWald]]). Returns
    * `(n, first_stage, reduced_form, beta_iv)`. */
  private[graft] def ivWaldPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("iv_wald(table, z_col, x_col, y_col)", exprs, 4, 4)
    val z = litStr("iv_wald", "z_col", exprs(1))
    val x = litStr("iv_wald", "x_col", exprs(2))
    val y = litStr("iv_wald", "y_col", exprs(3))
    val df = namedTable("iv_wald",
      litStr("iv_wald", "table", exprs(0)), Seq(z, x, y))
    graft.operators.FitOps.ivWald(df, z, x, y)
      .queryExecution.analyzed
  }

  /** `rdd_estimate(table, run_col, y_col, cutoff, bandwidth)` — sharp
    * regression-discontinuity local linear fits
    * ([[graft.operators.FitOps.rddEstimate]]). Returns `(n_left,
    * n_right, intercept_left, intercept_right, slope_left,
    * slope_right, effect)`. */
  private[graft] def rddEstimatePlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("rdd_estimate(table, run_col, y_col, cutoff, bandwidth)",
      exprs, 5, 5)
    val r = litStr("rdd_estimate", "run_col", exprs(1))
    val y = litStr("rdd_estimate", "y_col", exprs(2))
    val df = namedTable("rdd_estimate",
      litStr("rdd_estimate", "table", exprs(0)), Seq(r, y))
    graft.operators.FitOps.rddEstimate(df, r, y,
      litDouble("rdd_estimate", "cutoff", exprs(3)),
      litDouble("rdd_estimate", "bandwidth", exprs(4)))
      .queryExecution.analyzed
  }

  /** `jarque_bera(table, value_col, group_col)` — per-group JB
    * normality test ([[graft.operators.HypothesisOps.jarqueBera]]).
    * Returns `(group, n, mean, skewness, kurtosis, jb, p_value)`. */
  private[graft] def jarqueBeraPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("jarque_bera(table, value_col, group_col)", exprs, 3, 3)
    val v = litStr("jarque_bera", "value_col", exprs(1))
    val g = litStr("jarque_bera", "group_col", exprs(2))
    val df = namedTable("jarque_bera",
      litStr("jarque_bera", "table", exprs(0)), Seq(v, g))
    graft.operators.HypothesisOps.jarqueBera(df, v, g)
      .queryExecution.analyzed
  }

  /** `levene(table, value_col, group_col)` — Brown–Forsythe
    * homogeneity-of-variance test
    * ([[graft.operators.HypothesisOps.leveneBf]]). Returns one row
    * per group with shared `(f_stat, dof_between, dof_within)`. */
  private[graft] def levenePlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("levene(table, value_col, group_col)", exprs, 3, 3)
    val v = litStr("levene", "value_col", exprs(1))
    val g = litStr("levene", "group_col", exprs(2))
    val df = namedTable("levene",
      litStr("levene", "table", exprs(0)), Seq(v, g))
    graft.operators.HypothesisOps.leveneBf(df, v, g)
      .queryExecution.analyzed
  }

  /** `tukey_hsd(table, value_col, group_col)` — post-hoc pairwise
    * mean comparisons ([[graft.operators.HypothesisOps.tukeyHsd]]).
    * Returns `(g_a, g_b, n_a, n_b, diff, se, q_stat, dof_within)`. */
  private[graft] def tukeyHsdPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("tukey_hsd(table, value_col, group_col)", exprs, 3, 3)
    val v = litStr("tukey_hsd", "value_col", exprs(1))
    val g = litStr("tukey_hsd", "group_col", exprs(2))
    val df = namedTable("tukey_hsd",
      litStr("tukey_hsd", "table", exprs(0)), Seq(v, g))
    graft.operators.HypothesisOps.tukeyHsd(df, v, g)
      .queryExecution.analyzed
  }

  /** `chisq_test(table, a_col, b_col)` — χ² independence test with
    * Wilson–Hilferty p-value
    * ([[graft.operators.StatsOps.chisqTest]]). Returns
    * `(n, dof, chi2, p_value)`. */
  private[graft] def chisqTestPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("chisq_test(table, a_col, b_col)", exprs, 3, 3)
    val a = litStr("chisq_test", "a_col", exprs(1))
    val b = litStr("chisq_test", "b_col", exprs(2))
    val df = namedTable("chisq_test",
      litStr("chisq_test", "table", exprs(0)), Seq(a, b))
    graft.operators.StatsOps.chisqTest(df, a, b)
      .queryExecution.analyzed
  }

  /** `kruskal_wallis(table, value_col, group_col)` — k-sample rank
    * test ([[graft.operators.HypothesisOps.kruskalWallis]]). Returns
    * one row per group with shared `(h, h_corrected, dof)`. */
  private[graft] def kruskalWallisPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("kruskal_wallis(table, value_col, group_col)", exprs, 3, 3)
    val v = litStr("kruskal_wallis", "value_col", exprs(1))
    val g = litStr("kruskal_wallis", "group_col", exprs(2))
    val df = namedTable("kruskal_wallis",
      litStr("kruskal_wallis", "table", exprs(0)), Seq(v, g))
    graft.operators.HypothesisOps.kruskalWallis(df, v, g)
      .queryExecution.analyzed
  }

  /** `anova(table, value_col, group_col)` — one-way ANOVA F
    * ([[graft.operators.HypothesisOps.anovaF]]). Returns one row per
    * group with shared `(f_stat, dof_between, dof_within)`. */
  private[graft] def anovaPlan(exprs: Seq[Expression]): LogicalPlan = {
    arity("anova(table, value_col, group_col)", exprs, 3, 3)
    val v = litStr("anova", "value_col", exprs(1))
    val g = litStr("anova", "group_col", exprs(2))
    val df = namedTable("anova",
      litStr("anova", "table", exprs(0)), Seq(v, g))
    graft.operators.HypothesisOps.anovaF(df, v, g)
      .queryExecution.analyzed
  }

  /** `qq(table, value_col, group_col, a, b [, n_q])` — per-p exact
    * lower quantiles of both groups
    * ([[graft.operators.HypothesisOps.qqTable]]). Returns
    * `(k, p, q_a, q_b)`. */
  private[graft] def qqPlan(exprs: Seq[Expression]): LogicalPlan = {
    arity("qq(table, value_col, group_col, a, b [, n_q])", exprs, 5, 6)
    val v = litStr("qq", "value_col", exprs(1))
    val g = litStr("qq", "group_col", exprs(2))
    val df = namedTable("qq", litStr("qq", "table", exprs(0)), Seq(v, g))
    val nQ = if (exprs.length > 5)
      litDouble("qq", "n_q", exprs(5)).toInt else 20
    require(nQ > 1, s"qq n_q must be > 1; got $nQ")
    graft.operators.HypothesisOps.qqTable(df, v, g,
      litStr("qq", "a", exprs(3)), litStr("qq", "b", exprs(4)), nQ)
      .queryExecution.analyzed
  }

  /** `mutual_info(table, a_col, b_col)` — mutual information between
    * two categorical columns ([[graft.operators.StatsOps.mutualInfo]]). */
  private[graft] def mutualInfoPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("mutual_info(table, a_col, b_col)", exprs, 3, 3)
    val a = litStr("mutual_info", "a_col", exprs(1))
    val b = litStr("mutual_info", "b_col", exprs(2))
    val df = namedTable("mutual_info",
      litStr("mutual_info", "table", exprs(0)), Seq(a, b))
    graft.operators.StatsOps.mutualInfo(df, a, b)
      .queryExecution.analyzed
  }

  /** `cramers_v(table, a_col, b_col)` — Cramér's V association
    * ([[graft.operators.StatsOps.cramersV]]). */
  private[graft] def cramersVPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("cramers_v(table, a_col, b_col)", exprs, 3, 3)
    val a = litStr("cramers_v", "a_col", exprs(1))
    val b = litStr("cramers_v", "b_col", exprs(2))
    val df = namedTable("cramers_v",
      litStr("cramers_v", "table", exprs(0)), Seq(a, b))
    graft.operators.StatsOps.cramersV(df, a, b)
      .queryExecution.analyzed
  }

  /** `kappa(table, a_col, b_col)` — Cohen's kappa inter-rater
    * agreement ([[graft.operators.StatsOps.cohenKappa]]). */
  private[graft] def kappaPlan(exprs: Seq[Expression]): LogicalPlan = {
    arity("kappa(table, a_col, b_col)", exprs, 3, 3)
    val a = litStr("kappa", "a_col", exprs(1))
    val b = litStr("kappa", "b_col", exprs(2))
    val df = namedTable("kappa",
      litStr("kappa", "table", exprs(0)), Seq(a, b))
    graft.operators.StatsOps.cohenKappa(df, a, b)
      .queryExecution.analyzed
  }

  /** `spearman(table, x_col, y_col)` — rank correlation, exact under
    * ties ([[graft.operators.ProfileOps.spearman]]). */
  private[graft] def spearmanPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("spearman(table, x_col, y_col)", exprs, 3, 3)
    val x = litStr("spearman", "x_col", exprs(1))
    val y = litStr("spearman", "y_col", exprs(2))
    val df = namedTable("spearman",
      litStr("spearman", "table", exprs(0)), Seq(x, y))
    graft.operators.ProfileOps.spearman(df, x, y)
      .queryExecution.analyzed
  }

  /** `corr_matrix(table, cols)` — Pearson matrix over the space-
    * separated `cols` ([[graft.operators.ProfileOps.corrMatrix]]). */
  private[graft] def corrMatrixPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("corr_matrix(table, cols)", exprs, 2, 2)
    val cols = litStr("corr_matrix", "cols", exprs(1)).trim
      .split("\\s+").toSeq
    require(cols.length >= 2,
      "corr_matrix needs at least two space-separated column names")
    val df = namedTable("corr_matrix",
      litStr("corr_matrix", "table", exprs(0)), cols)
    graft.operators.ProfileOps.corrMatrix(df, cols)
      .queryExecution.analyzed
  }

  /** `spearman_matrix(table, cols)` — full rank-correlation matrix
    * over the space-separated `cols`
    * ([[graft.operators.ProfileOps.spearmanMatrix]]). */
  private[graft] def spearmanMatrixPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("spearman_matrix(table, cols)", exprs, 2, 2)
    val cols = litStr("spearman_matrix", "cols", exprs(1)).trim
      .split("\\s+").toSeq
    require(cols.length >= 2,
      "spearman_matrix needs at least two space-separated column names")
    val df = namedTable("spearman_matrix",
      litStr("spearman_matrix", "table", exprs(0)), cols)
    graft.operators.ProfileOps.spearmanMatrix(df, cols)
      .queryExecution.analyzed
  }

  /** `group_ols(table, group_col, x_col, y_col)` — per-group OLS fit
    * ([[graft.operators.FitOps.groupOls]]). */
  private[graft] def groupOlsPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("group_ols(table, group_col, x_col, y_col)", exprs, 4, 4)
    val g = litStr("group_ols", "group_col", exprs(1))
    val x = litStr("group_ols", "x_col", exprs(2))
    val y = litStr("group_ols", "y_col", exprs(3))
    val df = namedTable("group_ols",
      litStr("group_ols", "table", exprs(0)), Seq(g, x, y))
    graft.operators.FitOps.groupOls(df, g, x, y)
      .queryExecution.analyzed
  }

  /** `ols_multi(table, y_col, x_cols)` — multiple OLS on the space-
    * separated regressors `x_cols` (2..8 of them)
    * ([[graft.operators.FitOps.olsMulti]]). Returns one row per term
    * `(term_idx, term, beta, n, r2)`. */
  private[graft] def olsMultiPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("ols_multi(table, y_col, x_cols)", exprs, 3, 3)
    val y = litStr("ols_multi", "y_col", exprs(1))
    val xs = litStr("ols_multi", "x_cols", exprs(2)).trim
      .split("\\s+").toSeq
    require(xs.size >= 2 && xs.size <= 8,
      s"ols_multi x_cols must name 2..8 columns; got ${xs.size}")
    val df = namedTable("ols_multi",
      litStr("ols_multi", "table", exprs(0)), y +: xs)
    graft.operators.FitOps.olsMulti(df, y, xs)
      .queryExecution.analyzed
  }

  /** `theil_sen(table, date_col, value_col)` — robust median-slope
    * trend ([[graft.operators.FitOps.theilSen]]). */
  private[graft] def theilSenPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("theil_sen(table, date_col, value_col)", exprs, 3, 3)
    val d = litStr("theil_sen", "date_col", exprs(1))
    val v = litStr("theil_sen", "value_col", exprs(2))
    val df = namedTable("theil_sen",
      litStr("theil_sen", "table", exprs(0)), Seq(d, v))
    graft.operators.FitOps.theilSen(df, d, v)
      .queryExecution.analyzed
  }

  /** `mann_kendall(table, date_col, value_col)` — Mann–Kendall trend
    * significance on the daily series
    * ([[graft.operators.FitOps.mannKendall]]). */
  private[graft] def mannKendallPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("mann_kendall(table, date_col, value_col)", exprs, 3, 3)
    val d = litStr("mann_kendall", "date_col", exprs(1))
    val v = litStr("mann_kendall", "value_col", exprs(2))
    val df = namedTable("mann_kendall",
      litStr("mann_kendall", "table", exprs(0)), Seq(d, v))
    graft.operators.FitOps.mannKendall(df, d, v)
      .queryExecution.analyzed
  }

  /** `theil_sen_strided(table, date_col, value_col)` — the linear-
    * pair-budget Theil–Sen variant (Fibonacci baseline ladder)
    * ([[graft.operators.FitOps.theilSenStrided]]). */
  private[graft] def theilSenStridedPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("theil_sen_strided(table, date_col, value_col)", exprs, 3, 3)
    val d = litStr("theil_sen_strided", "date_col", exprs(1))
    val v = litStr("theil_sen_strided", "value_col", exprs(2))
    val df = namedTable("theil_sen_strided",
      litStr("theil_sen_strided", "table", exprs(0)), Seq(d, v))
    graft.operators.FitOps.theilSenStrided(df, d, v)
      .queryExecution.analyzed
  }

  /** `xcorr(a_table, a_date, a_val, b_table, b_date, b_val
    * [, max_lag])` — lagged cross-correlation of two daily series
    * ([[graft.operators.FitOps.crossCorr]]). */
  private[graft] def xcorrPlan(exprs: Seq[Expression]): LogicalPlan = {
    arity("xcorr(a_table, a_date, a_val, b_table, b_date, b_val " +
      "[, max_lag])", exprs, 6, 7)
    val ad = litStr("xcorr", "a_date", exprs(1))
    val av = litStr("xcorr", "a_val", exprs(2))
    val bd = litStr("xcorr", "b_date", exprs(4))
    val bv = litStr("xcorr", "b_val", exprs(5))
    val a = namedTable("xcorr", litStr("xcorr", "a_table", exprs(0)),
      Seq(ad, av))
    val b = namedTable("xcorr", litStr("xcorr", "b_table", exprs(3)),
      Seq(bd, bv))
    val maxLag = if (exprs.length > 6)
      litDouble("xcorr", "max_lag", exprs(6)).toInt else 7
    require(maxLag >= 0, s"xcorr max_lag must be >= 0; got $maxLag")
    graft.operators.FitOps.crossCorr(a, ad, av, b, bd, bv, maxLag)
      .queryExecution.analyzed
  }

  /** `kaplan_meier(table, subject_col, ts_col [, censor_days])` —
    * right-censored survival curve
    * ([[graft.operators.FitOps.kaplanMeier]]). */
  private[graft] def kaplanMeierPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("kaplan_meier(table, subject_col, ts_col [, censor_days])",
      exprs, 3, 4)
    val s = litStr("kaplan_meier", "subject_col", exprs(1))
    val t = litStr("kaplan_meier", "ts_col", exprs(2))
    val df = namedTable("kaplan_meier",
      litStr("kaplan_meier", "table", exprs(0)), Seq(s, t))
    val censor = if (exprs.length > 3)
      litDouble("kaplan_meier", "censor_days", exprs(3)).toInt else 3
    require(censor > 0,
      s"kaplan_meier censor_days must be positive; got $censor")
    graft.operators.FitOps.kaplanMeier(df, s, t, censor)
      .queryExecution.analyzed
  }

  /** `cohort(table, cust_col, date_col [, max_k])` — monthly cohort
    * retention matrix ([[graft.operators.FitOps.cohortRetention]]). */
  private[graft] def cohortPlan(exprs: Seq[Expression]): LogicalPlan = {
    arity("cohort(table, cust_col, date_col [, max_k])", exprs, 3, 4)
    val c = litStr("cohort", "cust_col", exprs(1))
    val d = litStr("cohort", "date_col", exprs(2))
    val df = namedTable("cohort",
      litStr("cohort", "table", exprs(0)), Seq(c, d))
    val maxK = if (exprs.length > 3)
      litDouble("cohort", "max_k", exprs(3)).toInt else 11
    require(maxK >= 1, s"cohort max_k must be >= 1; got $maxK")
    graft.operators.FitOps.cohortRetention(df, c, d, maxK)
      .queryExecution.analyzed
  }

  /** `interarrival(table, user_col, ts_col, order_col, type_col)` —
    * per-event-type inter-arrival gap profile
    * ([[graft.operators.FitOps.interarrival]]). */
  private[graft] def interarrivalPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("interarrival(table, user_col, ts_col, order_col, type_col)",
      exprs, 5, 5)
    val u = litStr("interarrival", "user_col", exprs(1))
    val t = litStr("interarrival", "ts_col", exprs(2))
    val o = litStr("interarrival", "order_col", exprs(3))
    val ty = litStr("interarrival", "type_col", exprs(4))
    val df = namedTable("interarrival",
      litStr("interarrival", "table", exprs(0)), Seq(u, t, o, ty))
    graft.operators.FitOps.interarrival(df, u, t, o, ty)
      .queryExecution.analyzed
  }

  /** `fd_profile(table, fds)` — functional-dependency audit; `fds` is
    * space-separated `lhs->rhs` pairs
    * ([[graft.operators.ProfileOps.fdProfile]]). */
  private[graft] def fdProfilePlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("fd_profile(table, fds)", exprs, 2, 2)
    val fds = litStr("fd_profile", "fds", exprs(1)).trim.split("\\s+")
      .toSeq.map { s =>
        val parts = s.split("->")
        require(parts.length == 2 && parts.forall(_.nonEmpty),
          s"fd_profile fds entries must be 'lhs->rhs'; got '$s'")
        (parts(0), parts(1))
      }
    require(fds.nonEmpty, "fd_profile needs at least one lhs->rhs pair")
    val df = namedTable("fd_profile",
      litStr("fd_profile", "table", exprs(0)),
      fds.flatMap(p => Seq(p._1, p._2)).distinct)
    graft.operators.ProfileOps.fdProfile(df, fds)
      .queryExecution.analyzed
  }

  /** `candidate_keys(table, cols)` — uniqueness/null audit over the
    * space-separated `cols`
    * ([[graft.operators.ProfileOps.candidateKeys]]). */
  private[graft] def candidateKeysPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("candidate_keys(table, cols)", exprs, 2, 2)
    val cols = litStr("candidate_keys", "cols", exprs(1)).trim
      .split("\\s+").toSeq
    require(cols.nonEmpty && cols.head.nonEmpty,
      "candidate_keys needs at least one column name")
    val df = namedTable("candidate_keys",
      litStr("candidate_keys", "table", exprs(0)), cols)
    graft.operators.ProfileOps.candidateKeys(df, cols)
      .queryExecution.analyzed
  }

  /** `psi(table, ts_col, value_col [, n_bins])` — population
    * stability index, first half vs second half
    * ([[graft.operators.ProfileOps.psi]]). */
  private[graft] def psiPlan(exprs: Seq[Expression]): LogicalPlan = {
    arity("psi(table, ts_col, value_col [, n_bins])", exprs, 3, 4)
    val t = litStr("psi", "ts_col", exprs(1))
    val v = litStr("psi", "value_col", exprs(2))
    val df = namedTable("psi", litStr("psi", "table", exprs(0)),
      Seq(t, v))
    val nBins = if (exprs.length > 3)
      litDouble("psi", "n_bins", exprs(3)).toInt else 10
    require(nBins >= 2, s"psi n_bins must be >= 2; got $nBins")
    graft.operators.ProfileOps.psi(df, t, v, nBins)
      .queryExecution.analyzed
  }

  /** `mahalanobis(table, id_col, cols, threshold)` — joint-
    * distribution outlier rows over exactly three space-separated
    * numeric columns
    * ([[graft.operators.ProfileOps.mahalanobisOutliers]]). */
  private[graft] def mahalanobisPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("mahalanobis(table, id_col, cols, threshold)", exprs, 4, 4)
    val id = litStr("mahalanobis", "id_col", exprs(1))
    val cols = litStr("mahalanobis", "cols", exprs(2)).trim
      .split("\\s+").toSeq
    require(cols.size == 3,
      s"mahalanobis cols must name exactly three columns; got $cols")
    val thr = litDouble("mahalanobis", "threshold", exprs(3))
    require(thr > 0, s"mahalanobis threshold must be positive; got $thr")
    val df = namedTable("mahalanobis",
      litStr("mahalanobis", "table", exprs(0)), id +: cols)
    graft.operators.ProfileOps.mahalanobisOutliers(df, id, cols, thr)
      .queryExecution.analyzed
  }

  /** `embed_quant(table, id_col, emb_col)` — int8 storage-
    * quantization round-trip fidelity report
    * ([[graft.operators.SimilarityOps.quantReport]]). */
  private[graft] def embedQuantPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("embed_quant(table, id_col, emb_col)", exprs, 3, 3)
    val id = litStr("embed_quant", "id_col", exprs(1))
    val emb = litStr("embed_quant", "emb_col", exprs(2))
    val df = namedTable("embed_quant",
      litStr("embed_quant", "table", exprs(0)), Seq(id, emb))
    graft.operators.SimilarityOps.quantReport(df, id, emb)
      .queryExecution.analyzed
  }

  /** `js_divergence(table, ts_col, value_col [, n_bins])` — bounded
    * symmetric drift between the first and second time halves
    * ([[graft.operators.ProfileOps.jsDivergence]]). */
  private[graft] def jsDivergencePlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("js_divergence(table, ts_col, value_col [, n_bins])",
      exprs, 3, 4)
    val t = litStr("js_divergence", "ts_col", exprs(1))
    val v = litStr("js_divergence", "value_col", exprs(2))
    val df = namedTable("js_divergence",
      litStr("js_divergence", "table", exprs(0)), Seq(t, v))
    val nBins = if (exprs.length > 3)
      litDouble("js_divergence", "n_bins", exprs(3)).toInt else 10
    require(nBins >= 2, s"js_divergence n_bins must be >= 2; got $nBins")
    graft.operators.ProfileOps.jsDivergence(df, t, v, nBins)
      .queryExecution.analyzed
  }

  /** `partial_corr(table, x_col, y_col, z_col)` — partial Pearson
    * correlation of x and y controlling for z
    * ([[graft.operators.ProfileOps.partialCorr]]). */
  private[graft] def partialCorrPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("partial_corr(table, x_col, y_col, z_col)", exprs, 4, 4)
    val x = litStr("partial_corr", "x_col", exprs(1))
    val y = litStr("partial_corr", "y_col", exprs(2))
    val z = litStr("partial_corr", "z_col", exprs(3))
    val df = namedTable("partial_corr",
      litStr("partial_corr", "table", exprs(0)), Seq(x, y, z))
    graft.operators.ProfileOps.partialCorr(df, x, y, z)
      .queryExecution.analyzed
  }

  /** `hhi(table, group_col, entity_col, value_col)` —
    * Herfindahl–Hirschman concentration per group
    * ([[graft.operators.StatsOps.hhi]]). */
  private[graft] def hhiPlan(exprs: Seq[Expression]): LogicalPlan = {
    arity("hhi(table, group_col, entity_col, value_col)", exprs, 4, 4)
    val g = litStr("hhi", "group_col", exprs(1))
    val e = litStr("hhi", "entity_col", exprs(2))
    val v = litStr("hhi", "value_col", exprs(3))
    val df = namedTable("hhi", litStr("hhi", "table", exprs(0)),
      Seq(g, e, v))
    graft.operators.StatsOps.hhi(df, g, e, v)
      .queryExecution.analyzed
  }

  /** `iqr_outliers(table, group_col, value_col)` — per-group Tukey-
    * fence outlier census ([[graft.operators.StatsOps.iqrOutliers]]). */
  private[graft] def iqrOutliersPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("iqr_outliers(table, group_col, value_col)", exprs, 3, 3)
    val g = litStr("iqr_outliers", "group_col", exprs(1))
    val v = litStr("iqr_outliers", "value_col", exprs(2))
    val df = namedTable("iqr_outliers",
      litStr("iqr_outliers", "table", exprs(0)), Seq(g, v))
    graft.operators.StatsOps.iqrOutliers(df, g, v)
      .queryExecution.analyzed
  }

  /** `mixture_alloc(table, source_col, text_col [, budget])` —
    * token-budget allocation across sources
    * ([[graft.operators.CurationOps.mixtureAllocation]]). */
  private[graft] def mixtureAllocPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("mixture_alloc(table, source_col, text_col [, budget])",
      exprs, 3, 4)
    val s = litStr("mixture_alloc", "source_col", exprs(1))
    val t = litStr("mixture_alloc", "text_col", exprs(2))
    val df = namedTable("mixture_alloc",
      litStr("mixture_alloc", "table", exprs(0)), Seq(s, t))
    val budget = if (exprs.length > 3)
      litDouble("mixture_alloc", "budget", exprs(3)).toLong else 100000L
    require(budget > 0,
      s"mixture_alloc budget must be positive; got $budget")
    graft.operators.CurationOps.mixtureAllocation(df, s, t, budget)
      .queryExecution.analyzed
  }

  /** `srm_check(table, assign_col, expectations)` — sample-ratio-
    * mismatch chi-square; `expectations` is space-separated
    * `label:proportion` pairs
    * ([[graft.operators.CurationOps.srmCheck]]). */
  private[graft] def srmCheckPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("srm_check(table, assign_col, expectations)", exprs, 3, 3)
    val a = litStr("srm_check", "assign_col", exprs(1))
    val expected = litStr("srm_check", "expectations", exprs(2)).trim
      .split("\\s+").toSeq.map { s =>
        val parts = s.split(":")
        require(parts.length == 2 && parts(0).nonEmpty,
          s"srm_check expectations entries must be 'label:p'; got '$s'")
        (parts(0), parts(1).toDouble)
      }
    val df = namedTable("srm_check",
      litStr("srm_check", "table", exprs(0)), Seq(a))
    graft.operators.CurationOps.srmCheck(df, a, expected)
      .queryExecution.analyzed
  }

  /** `rank_normalize(table, group_col, id_col, value_col)` — per-group
    * inclusive-ECDF rank normalization
    * ([[graft.operators.CurationOps.rankNormalize]]). */
  private[graft] def rankNormalizePlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("rank_normalize(table, group_col, id_col, value_col)",
      exprs, 4, 4)
    val g = litStr("rank_normalize", "group_col", exprs(1))
    val id = litStr("rank_normalize", "id_col", exprs(2))
    val v = litStr("rank_normalize", "value_col", exprs(3))
    val df = namedTable("rank_normalize",
      litStr("rank_normalize", "table", exprs(0)), Seq(g, id, v))
    graft.operators.CurationOps.rankNormalize(df, g, id, v)
      .queryExecution.analyzed
  }

  /** `feature_scale(table, key_col, value_col)` — min-max and z-score
    * scaling from one global-moments pass
    * ([[graft.operators.CurationOps.featureScale]]). */
  private[graft] def featureScalePlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("feature_scale(table, key_col, value_col)", exprs, 3, 3)
    val k = litStr("feature_scale", "key_col", exprs(1))
    val v = litStr("feature_scale", "value_col", exprs(2))
    val df = namedTable("feature_scale",
      litStr("feature_scale", "table", exprs(0)), Seq(k, v))
    graft.operators.CurationOps.featureScale(df, k, v)
      .queryExecution.analyzed
  }

  /** `target_encode(table, cat_col, target_col [, m])` — m-smoothed
    * target encoding ([[graft.operators.CurationOps.targetEncode]]). */
  private[graft] def targetEncodePlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("target_encode(table, cat_col, target_col [, m])", exprs, 3, 4)
    val c = litStr("target_encode", "cat_col", exprs(1))
    val t = litStr("target_encode", "target_col", exprs(2))
    val df = namedTable("target_encode",
      litStr("target_encode", "table", exprs(0)), Seq(c, t))
    val m = if (exprs.length > 3)
      litDouble("target_encode", "m", exprs(3)) else 100.0
    require(m >= 0, s"target_encode m must be >= 0; got $m")
    graft.operators.CurationOps.targetEncode(df, c, t, m)
      .queryExecution.analyzed
  }

  /** `perplexity_bigram(table [, vocab_size [, bigram_top
    * [, lambda]]])` — interpolated bigram-LM perplexity per document
    * ([[graft.operators.TextOps.bigramPerplexity]]); documents
    * contract (doc_id, text). */
  private[graft] def perplexityBigramPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("perplexity_bigram(table [, vocab_size [, bigram_top " +
      "[, lambda]]])", exprs, 1, 4)
    val df = docTable("perplexity_bigram",
      litStr("perplexity_bigram", "table", exprs(0)))
    val vs = if (exprs.length > 1)
      litDouble("perplexity_bigram", "vocab_size", exprs(1)).toInt
      else 32768
    val bt = if (exprs.length > 2)
      litDouble("perplexity_bigram", "bigram_top", exprs(2)).toInt
      else 65536
    val lam = if (exprs.length > 3)
      litDouble("perplexity_bigram", "lambda", exprs(3)) else 0.75
    graft.operators.TextOps.bigramPerplexity(df, "doc_id", "text",
      vs, bt, lam).queryExecution.analyzed
  }

  /** `zipf_alpha(table, text_col [, fmin])` — Zipf exponent of the
    * corpus token-frequency table
    * ([[graft.operators.TextOps.zipfAlpha]]). */
  private[graft] def zipfAlphaPlan(exprs: Seq[Expression])
      : LogicalPlan = {
    arity("zipf_alpha(table, text_col [, fmin])", exprs, 2, 3)
    val t = litStr("zipf_alpha", "text_col", exprs(1))
    val df = namedTable("zipf_alpha",
      litStr("zipf_alpha", "table", exprs(0)), Seq(t))
    val fmin = if (exprs.length > 2)
      litDouble("zipf_alpha", "fmin", exprs(2)).toInt else 2
    require(fmin >= 1, s"zipf_alpha fmin must be >= 1; got $fmin")
    graft.operators.TextOps.zipfAlpha(df, t, fmin)
      .queryExecution.analyzed
  }
}
