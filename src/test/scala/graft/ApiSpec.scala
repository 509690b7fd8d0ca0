package graft

import graft.api._
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** The public facade must return exactly what the oracle-gated registry
  * queries return — same implementations, column-parametric surface. */
class ApiSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sfDir)
  private lazy val vecs = Tables.embeddings(spark, sfDir)

  test("nearDupPairs == q_dedup_minhash") {
    val lib = docs.nearDupPairs("doc_id", "text").collect().toSeq
    val reg = SparkEntry.queries("q_dedup_minhash")(spark, sfDir)
      .collect().toSeq
    assert(lib.map(_.toSeq) === reg.map(_.toSeq))
  }

  test("exactDupGroups matches q_doc_dedup") {
    val lib = docs.exactDupGroups("doc_id", "text")
      .orderBy("h").collect().toSeq
    val reg = SparkEntry.queries("q_doc_dedup")(spark, sfDir)
      .collect().toSeq
    assert(lib.map(_.toSeq) === reg.map(_.toSeq))
  }

  test("cosineTopK == q_sim_topk") {
    val lib = vecs.cosineTopK("vec_id", "embedding", probeId = 0L)
      .collect().toSeq
    val reg = SparkEntry.queries("q_sim_topk")(spark, sfDir)
      .collect().toSeq
    assert(lib.map(_.toSeq) === reg.map(_.toSeq))
  }

  test("withRepetition: known fixtures hit exact duplicate fractions") {
    import spark.implicits._
    val fx = Seq(
      (1L, "a b c d e f"),        // all tokens + shingles distinct
      (2L, "x x x x x x"),        // 1 distinct token of 6, 1 shingle of 4
      (3L, "a b c a b c a b c")   // 3 distinct of 9; shingles cycle in 3
    ).toDF("doc_id", "text").withRepetition("text").orderBy("doc_id")
      .select("dup_token_ratio", "dup_3gram_ratio")
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    def r6(d: Double): Double = BigDecimal(d)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(fx(0) === ((0.0, 0.0)))
    assert(fx(1) === ((r6(1 - 1.0 / 6), r6(1 - 1.0 / 4))))
    // 9 tokens → 7 shingles, 3 distinct ("a b c","b c a","c a b")
    assert(fx(2) === ((r6(1 - 3.0 / 9), r6(1 - 3.0 / 7))))
  }

  test("renamed columns work: the facade is column-parametric") {
    val renamed = docs.select(col("doc_id").as("id"), col("text").as("body"))
    val pairs = renamed.nearDupPairs("id", "body").collect()
    val orig = docs.nearDupPairs("doc_id", "text").collect()
    assert(pairs.map(_.toSeq).toSeq === orig.map(_.toSeq).toSeq)
    val lang = renamed.withLangId("body").columns
    assert(lang.contains("pred_lang") && lang.contains("id"))
  }

  test("with* appenders preserve existing columns and row count") {
    val out = docs.withLangId("text").withQuality("text")
      .withTokenCounts("text").withFingerprint("text")
    assert(out.count() === docs.count())
    docs.columns.foreach(c => assert(out.columns.contains(c)))
    Seq("pred_lang", "n_tokens", "avg_tok_len", "stop_ratio", "len_bucket",
      "ws_tokens", "re_tokens", "fp")
      .foreach(c => assert(out.columns.contains(c), s"missing $c"))
  }

  test("embeddingNearDups == q_dedup_embedding") {
    val lib = vecs.embeddingNearDups("vec_id", "embedding", 0.45)
      .collect().toSeq
    val reg = SparkEntry.queries("q_dedup_embedding")(spark, sfDir)
      .collect().toSeq
    assert(lib.map(_.toSeq) === reg.map(_.toSeq))
  }

  test("ngramJaccardPairs == q_ngram_jaccard (lang-blocked)") {
    val lib = docs.ngramJaccardPairs("doc_id", "text", 0.3,
      withinCol = Some("lang")).collect().toSeq
    val reg = SparkEntry.queries("q_ngram_jaccard")(spark, sfDir)
      .collect().toSeq
    assert(lib.map(_.toSeq) === reg.map(_.toSeq))
  }

  test("index builders: lshIndex and ivfIndex probe from the facade") {
    val lsh = vecs.lshIndex("vec_id", "embedding")
    assert(lsh.topK(0L, 10).count() === 10)
    val probe = vecs.filter(col("vec_id") === 0L)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0)
    // an external-vector probe finds the probe itself first (cos = 1)
    val first = lsh.topKVec(probe, 1).head()
    assert(first.getLong(0) === 0L && first.getDouble(1) >= 0.999999)
    val ivf = vecs.ivfIndex("vec_id", "embedding")
    assert(ivf.topK(0L, 10).count() === 10)
    assert(ivf.topKAuto(0L, 10).count() === 10)
    lsh.sigs.unpersist(); ivf.cells.unpersist()
  }

  test("duplicatePassages / scrubDuplicatePassages == registry queries") {
    val mineLib = docs.duplicatePassages("doc_id", "text").collect().toSeq
    val mineReg = SparkEntry.queries("q_substring_dedup")(spark, sfDir)
      .collect().toSeq
    assert(mineLib.map(_.toSeq) === mineReg.map(_.toSeq))
    val scrubLib = docs.scrubDuplicatePassages("doc_id", "text")
      .collect().toSeq
    val scrubReg = SparkEntry.queries("q_substring_scrub")(spark, sfDir)
      .collect().toSeq
    assert(scrubLib.map(_.toSeq) === scrubReg.map(_.toSeq))
  }

  test("funnelReport with clusterKeepers == q_curation_funnel") {
    val ck = docs.nearDupClusters("doc_id", "text", threshold = 0.5)
    val lib = docs.funnelReport("doc_id", "text", Seq("source", "lang"),
      clusterKeepers = Some(ck)).collect().toSeq
    val reg = SparkEntry.queries("q_curation_funnel")(spark, sfDir)
      .collect().toSeq
    assert(lib.map(_.toSeq) === reg.map(_.toSeq))
  }

  test("round-10 facade wrappers delegate to their operators") {
    import org.apache.spark.sql.functions.col
    // withNormalizedText / corpusShuffle / sampleTokenBudget /
    // semanticDedup — result-equal to the operator calls they wrap
    assert(docs.withNormalizedText("text").select("doc_id", "clean")
        .collect().map(_.toSeq).toSet ===
      docs.select(col("doc_id"),
        graft.operators.TextOps.normalizeText(col("text")).as("clean"))
        .collect().map(_.toSeq).toSet)
    assert(docs.corpusShuffle("doc_id", 4).select("doc_id", "shard", "pos")
        .collect().map(_.toSeq).toSet ===
      graft.operators.CurationOps.corpusShuffle(docs, "doc_id", 4)
        .select("doc_id", "shard", "pos").collect().map(_.toSeq).toSet)
    assert(docs.sampleTokenBudget("doc_id", "text", 8000L)
        .collect().map(_.toSeq).toSet ===
      graft.operators.CurationOps.sampleTokenBudget(docs, "doc_id",
        "text", 8000L).collect().map(_.toSeq).toSet)
    assert(vecs.semanticDedup("vec_id", "embedding", 0.45, 16)
        .collect().map(_.toSeq).toSet ===
      graft.operators.DedupOps.semanticDedup(vecs, "vec_id", "embedding",
        0.45, 16).collect().map(_.toSeq).toSet)
  }

  test("warehouse tier extensions delegate to the gated operators") {
    val ev = Tables.events(spark, sfDir)
    assert(ev.anomalies("event_type", "event_id", "value")
        .collect().map(_.toSeq).toSeq ===
      SparkEntry.queries("q_anomaly")(spark, sfDir)
        .collect().map(_.toSeq).toSeq)
    assert(ev.retention("user_id", "ts").collect().map(_.toSeq).toSeq ===
      SparkEntry.queries("q_retention")(spark, sfDir)
        .collect().map(_.toSeq).toSeq)
    assert(ev.eventFunnel("user_id", "event_type", "ts",
        Seq("view", "click", "purchase")).collect().map(_.toSeq).toSeq ===
      SparkEntry.queries("q_event_funnel")(spark, sfDir)
        .collect().map(_.toSeq).toSeq)
    val li = Tables.lineitem(spark, sfDir)
    assert(li.histogram("l_extendedprice", 5000.0).count() > 0)
    assert(li.profileColumns(Seq("l_quantity")).count() === 1)
    val ord = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_totalprice")
    val merged = ord.mergeUpsert(
      ord.filter(col("o_orderkey") % 7 === 0), "o_orderkey")
    assert(merged.filter(col("action") === "update").count() ===
      ord.filter(col("o_orderkey") % 7 === 0).count())
    assert(Tables.orders(spark, sfDir)
      .scd2("o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey")
      .filter(col("is_current")).count() ===
      Tables.orders(spark, sfDir).select("o_custkey").distinct().count())
    import graft.operators.ConstraintOps.{NotNull, UniqueKey}
    val dq = li.dqReport(Seq(NotNull("l_orderkey"),
        UniqueKey("l_orderkey")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dq("not_null l_orderkey") === 0L)
  }

  test("diagnostics facade: changepoints / trailingFeatures / " +
    "crosstabChi2 / keySkew delegate to the registry operators") {
    val ev = Tables.events(spark, sfDir)
    assert(ev.changepoints("event_type", "ts").collect().toSeq ===
      SparkEntry.queries("q_changepoint")(spark, sfDir)
        .collect().toSeq)
    assert(ev.trailingFeatures("user_id", "ts", "event_id",
        "event_type", "value", "purchase").collect().toSeq ===
      SparkEntry.queries("q_trailing_features")(spark, sfDir)
        .collect().toSeq)
    val ord = Tables.orders(spark, sfDir)
    assert(ord.crosstabChi2("o_orderstatus", "o_orderpriority")
        .collect().toSeq ===
      SparkEntry.queries("q_crosstab")(spark, sfDir).collect().toSeq)
    assert(Tables.lineitem(spark, sfDir).keySkew("l_partkey")
        .collect().toSeq ===
      SparkEntry.queries("q_key_skew")(spark, sfDir).collect().toSeq)
  }
}
