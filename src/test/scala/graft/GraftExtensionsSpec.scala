package graft

/** The extension entry point must make every native function callable
  * from pure SQL in sessions that never touched the library — including
  * `newSession()` derivatives, where temp-function registrations (the
  * Tables chokepoint path) do not exist. */
class GraftExtensionsSpec extends SparkSpec {

  test("native functions resolve from pure SQL in a fresh newSession") {
    // fresh sessionState: no temp functions, only extension-injected ones
    val s2 = spark.newSession()
    val row = s2.sql(
      """SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
               size(minhash_sig('a b c d e', 3, 8)) AS np,
               size(shingle_hashes('a b c d e', 3)) AS ns,
               jaccard_sorted(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j
      """).head()
    assert(row.getDouble(0) === 11.0)
    assert(row.getInt(1) === 8)
    assert(row.getInt(2) === 3)
    assert(row.getDouble(3) === 0.5)
  }

  test("sketch family resolves from pure SQL; bad literal args raise a " +
      "clear error naming the function") {
    val s2 = spark.newSession()
    val row = s2.sql(
      """SELECT size(plane_sketch(array(1.0d, -2.0d), 1048576, 4)) AS w,
               size(plane_sigs(array(1.0d, -2.0d), 0, 8, 4)) AS t,
               size(plane_project(array(1.0d, -2.0d), 1048576, 16)) AS p,
               sketch_dot(array(3L), array(1.0d, 2.0d)) AS s
      """).head()
    assert(row.getInt(0) === 4) // BIGINT literal accepted (fits int)
    assert(row.getInt(1) === 8)
    assert(row.getInt(2) === 16)
    assert(row.getDouble(3) === 3.0) // bits 0+1 set → 1.0 + 2.0
    // PQ family on the extension surface; out-of-range codes (wrong
    // codebook / corrupted input) contribute nothing instead of
    // reading out of bounds
    val pq = s2.sql(
      """SELECT size(pq_lut(array(1.0d, 2.0d),
               array(array(array(1.0d), array(2.0d))))) AS nl,
               pq_adc(array(1), array(1.0d, 2.0d)) AS ok,
               pq_adc(array(-1), array(1.0d, 2.0d)) AS neg,
               pq_adc(array(9), array(1.0d, 2.0d)) AS oob
      """).head()
    assert(pq.getInt(0) === 2)
    assert(pq.getDouble(1) === 2.0) // one subspace, cps=2: code 1 → lut(1)
    assert(pq.getDouble(2) === 0.0) // negative code → ignored, not OOB read
    assert(pq.getDouble(3) === 0.0) // code 9 >= cps → ignored, no aliasing
    // a non-foldable int parameter fails with the function's name, not
    // an opaque ClassCastException/NPE
    val err = intercept[Exception] {
      s2.sql("SELECT plane_sketch(array(1.0d), cast(rand()*4 as int), 4)")
        .head()
    }
    assert(err.getMessage.contains("plane_sketch"), err.getMessage)
  }

  test("knn_join table-valued function runs the batch ANN join from " +
      "pure SQL — one-shot build and durable sidecar table") {
    import org.apache.spark.sql.functions.col
    val s2 = spark.newSession()
    val vecs = graft.sources.Tables.embeddings(s2, sfDir)
    vecs.createOrReplaceTempView("knn_corpus_sql")
    val queries = vecs.filter(col("vec_id") % 50 === 0)
    queries.createOrReplaceTempView("knn_queries_sql")
    // one-shot path: the index is built at the family defaults
    val got = s2.sql(
      "SELECT * FROM knn_join('knn_corpus_sql', 'knn_queries_sql', 5)")
    assert(got.columns.toSeq === Seq("src_id", "dst_id", "cos_sim", "rn"))
    val gotRows = got.collect()
    val want = graft.operators.AnnIndex
      .build(vecs, "vec_id", "embedding", persist = false)
      .knnJoinWith(queries, "vec_id", "embedding", 5).collect()
    assert(gotRows.map(_.toSeq).toSet === want.map(_.toSeq).toSet)
    assert(gotRows.nonEmpty)
    // durable path: a bucketed IVF index table is detected (family
    // inferred from the _meta sidecar schema) and reopened, not rebuilt
    val ivf = graft.operators.IvfIndex.build(vecs, "vec_id", "embedding",
      persist = false)
    ivf.writeTable("knn_ivf_sql", buckets = 8)
    val viaSql = s2.sql(
      "SELECT * FROM knn_join('knn_ivf_sql', 'knn_queries_sql', 3)")
      .collect()
    val viaApi = graft.operators.IvfIndex.fromTable(s2, "knn_ivf_sql")
      .knnJoinWith(queries, "vec_id", "embedding", 3).collect()
    assert(viaSql.map(_.toSeq).toSet === viaApi.map(_.toSeq).toSet)
    assert(viaSql.nonEmpty)
    // misuse fails with guidance, not an opaque resolution error
    val err = intercept[Exception] {
      s2.sql("SELECT * FROM knn_join('knn_corpus_sql', " +
        "'knn_queries_sql', 5, 'hnsw')").collect()
    }
    assert(err.getMessage.contains("ann, ivf, ivfpq"), err.getMessage)
    // DECOY sidecar: a coincidental `<corpus>_meta` no index family
    // wrote must not poison a valid raw vector table — detection falls
    // back to the one-shot build as if the decoy did not exist
    import s2.implicits._
    Seq(("unrelated", 1)).toDF("note", "version")
      .write.mode("overwrite").format("parquet")
      .saveAsTable("knn_decoy_sql_meta")
    vecs.write.mode("overwrite").format("parquet")
      .saveAsTable("knn_decoy_sql")
    val viaDecoy = s2.sql(
      "SELECT * FROM knn_join('knn_decoy_sql', 'knn_queries_sql', 5)")
      .collect()
    assert(viaDecoy.map(_.toSeq).toSet === want.map(_.toSeq).toSet)
    // ...while a decoy sidecar next to a NON-vector table still names
    // both contracts in its error
    Seq((1L, "x")).toDF("some_id", "payload")
      .write.mode("overwrite").format("parquet")
      .saveAsTable("knn_notvec_sql")
    Seq(("unrelated", 1)).toDF("note", "version")
      .write.mode("overwrite").format("parquet")
      .saveAsTable("knn_notvec_sql_meta")
    val err2 = intercept[Exception] {
      s2.sql("SELECT * FROM knn_join('knn_notvec_sql', " +
        "'knn_queries_sql', 5)").collect()
    }
    assert(err2.getMessage.contains("vec_id, embedding"), err2.getMessage)
    // ...and a table that LOOKS like an index backing (sig/cell/
    // sketch/pqcode columns) with a broken sidecar is REFUSED, never
    // silently rebuilt: one-shot-building over an LSH signature table
    // (vec_ids duplicated once per hash table) would return wrong
    // top-k lists with no error
    s2.sql("DROP TABLE IF EXISTS knn_ivf_sql_meta")
    val err3 = intercept[Exception] {
      s2.sql("SELECT * FROM knn_join('knn_ivf_sql', " +
        "'knn_queries_sql', 3)").collect()
    }
    assert(err3.getMessage.contains("refusing to rebuild"),
      err3.getMessage)
    Seq("knn_ivf_sql", "knn_ivf_sql_meta", "knn_decoy_sql",
      "knn_decoy_sql_meta", "knn_notvec_sql", "knn_notvec_sql_meta")
      .foreach(t => s2.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("knn_probe and dedup_embedding TVFs agree with the library " +
      "point probe and the exact pair miner") {
    import org.apache.spark.sql.functions.col
    val s2 = spark.newSession()
    val vecs = graft.sources.Tables.embeddings(s2, sfDir)
    vecs.createOrReplaceTempView("probe_corpus_sql")
    // knn_probe ≡ a one-row knnJoinWith through the same one-shot
    // index, self-match removed, re-ranked
    val probeId = vecs.select("vec_id").orderBy("vec_id")
      .head().getLong(0)
    val got = s2.sql(
      s"SELECT * FROM knn_probe('probe_corpus_sql', $probeId, 5)")
    assert(got.columns.toSeq === Seq("vec_id", "cos_sim", "rn"))
    val gotRows = got.collect()
    assert(gotRows.length === 5)
    assert(gotRows.map(_.getInt(2)).toSeq === (1 to 5))
    assert(!gotRows.exists(_.getLong(0) == probeId))
    val want = graft.operators.AnnIndex
      .build(vecs, "vec_id", "embedding", persist = false)
      .knnJoinWith(vecs.filter(col("vec_id") === probeId),
        "vec_id", "embedding", 6)
      .filter(col("dst_id") =!= probeId)
      .orderBy(col("cos_sim").desc, col("dst_id"))
      .limit(5).collect()
      .map(r => (r.getLong(1), r.getDouble(2)))
    assert(gotRows.map(r => (r.getLong(0), r.getDouble(1))).toSeq ===
      want.toSeq)
    // dedup_embedding ≡ the exact block-matrix pair miner
    val pairsSql = s2.sql(
      "SELECT * FROM dedup_embedding('probe_corpus_sql', 0.45)")
    assert(pairsSql.columns.toSeq === Seq("a_id", "b_id", "cos_sim"))
    assert(pairsSql.collect().map(_.toSeq).toSet ===
      graft.operators.DedupOps
        .embeddingPairs(vecs, "vec_id", "embedding", 0.45)
        .collect().map(_.toSeq).toSet)
  }

  test("document TVF family runs the table-level LLM operators from " +
      "pure SQL and agrees with the Scala API") {
    import org.apache.spark.sql.functions.col
    val s2 = spark.newSession()
    val docs = graft.sources.Tables.documents(s2, sfDir)
    docs.createOrReplaceTempView("docs_sql")
    // dedup_pairs ≡ minhashPairs at the same threshold
    val pairsSql = s2.sql("SELECT * FROM dedup_pairs('docs_sql', 0.5)")
    assert(pairsSql.columns.toSeq === Seq("a_id", "b_id", "jacc"))
    assert(pairsSql.collect().map(_.toSeq).toSet ===
      graft.operators.DedupOps.minhashPairs(docs, "doc_id", "text", 0.5)
        .collect().map(_.toSeq).toSet)
    // setsim_join ≡ setSimJoin at the same threshold and blocking
    val ssSql = s2.sql(
      "SELECT * FROM setsim_join('docs_sql', 'doc_id', 'text', 0.7, " +
        "'lang')")
    assert(ssSql.columns.toSeq === Seq("a_id", "b_id", "jacc"))
    assert(ssSql.collect().map(_.toSeq).toSet ===
      graft.operators.DedupOps.setSimJoin(docs, "doc_id", "text", 0.7,
        Some("lang")).collect().map(_.toSeq).toSet)
    // dedup_clusters ≡ nearDupClusters over the LSH edge set
    val clSql = s2.sql("SELECT * FROM dedup_clusters('docs_sql')")
    assert(clSql.columns.toSeq === Seq("doc_id", "cluster_id", "keeper"))
    val clRows = clSql.collect()
    assert(clRows.length === docs.count())
    assert(clRows.exists(r => !r.getBoolean(2))) // some non-keepers exist
    // substring_scrub ≡ scrubDuplicatePassages (keep-first variant)
    val scrubSql = s2.sql(
      "SELECT * FROM substring_scrub('docs_sql', 8, true)")
    assert(scrubSql.columns.toSeq === Seq("doc_id", "n_kept", "scrubbed"))
    assert(scrubSql.collect().map(_.toSeq).toSet ===
      graft.operators.DedupOps.scrubDuplicatePassages(docs, "doc_id",
        "text", 8, keepFirst = true).collect().map(_.toSeq).toSet)
    // chunk_docs ≡ chunkDocuments at the same window
    val chunkSql = s2.sql("SELECT * FROM chunk_docs('docs_sql', 16, 2)")
    assert(chunkSql.collect().map(_.toSeq).toSet ===
      graft.operators.CurationOps.chunkDocuments(docs, "doc_id", "text",
        16, 2).collect().map(_.toSeq).toSet)
    // curation_funnel base variant ≡ funnelReport without clusters
    val funSql = s2.sql("SELECT * FROM curation_funnel('docs_sql')")
    assert(funSql.collect().map(_.toSeq).toSet ===
      graft.operators.CurationOps.funnelReport(docs, "doc_id", "text",
        Seq("source", "lang")).collect().map(_.toSeq).toSet)
    // contract violations fail at plan-build time with the contract
    // spelled out, not a downstream unresolved-column error
    docs.select(col("doc_id"), col("text").as("body"))
      .createOrReplaceTempView("docs_bad_sql")
    val err = intercept[Exception] {
      s2.sql("SELECT * FROM dedup_pairs('docs_bad_sql')").collect()
    }
    assert(err.getMessage.contains("(doc_id, text)"), err.getMessage)
  }

  test("curation-stage TVFs (pii_scrub, quality_filter, split_assign, " +
      "decontaminate, pack_sequences) agree with the Scala API") {
    import org.apache.spark.sql.functions.col
    val s2 = spark.newSession()
    val docs = graft.sources.Tables.documents(s2, sfDir)
    docs.createOrReplaceTempView("cur_docs_sql")
    // pii_scrub ≡ scrubPii over the text column
    val piiSql = s2.sql("SELECT * FROM pii_scrub('cur_docs_sql')")
    assert(piiSql.columns.toSeq === Seq("doc_id", "scrubbed"))
    assert(piiSql.collect().map(_.toSeq).toSet ===
      docs.select(col("doc_id"),
        graft.operators.CurationOps.scrubPii(col("text")).as("scrubbed"))
        .collect().map(_.toSeq).toSet)
    // quality_filter ≡ qualityFilter at explicit and default thresholds
    val qfSql = s2.sql(
      "SELECT * FROM quality_filter('cur_docs_sql', 20, 80, 0.02, 5.0)")
    val qfApi = graft.operators.CurationOps.qualityFilter(docs, "text")
    assert(qfSql.columns.toSeq === qfApi.columns.toSeq)
    assert(qfSql.collect().map(_.toSeq).toSet ===
      qfApi.collect().map(_.toSeq).toSet)
    assert(s2.sql("SELECT * FROM quality_filter('cur_docs_sql')").count()
      === qfApi.count())
    // split_assign ≡ hashSplit at the 80/10/10 default cuts
    val spSql = s2.sql("SELECT * FROM split_assign('cur_docs_sql')")
    assert(spSql.columns.contains("split"))
    assert(spSql.collect().map(_.toSeq).toSet ===
      graft.operators.CurationOps.hashSplit(docs, "doc_id")
        .collect().map(_.toSeq).toSet)
    // decontaminate ≡ the Scala operator over a corpus/benchmark split
    docs.filter(col("doc_id") % 50 =!= 0)
      .createOrReplaceTempView("cur_corpus_sql")
    docs.filter(col("doc_id") % 50 === 0)
      .createOrReplaceTempView("cur_bench_sql")
    val deSql = s2.sql(
      "SELECT * FROM decontaminate('cur_corpus_sql', 'cur_bench_sql', 3)")
    val deApi = graft.operators.CurationOps.decontaminate(
      docs.filter(col("doc_id") % 50 =!= 0), "doc_id", "text",
      docs.filter(col("doc_id") % 50 === 0), "text")
    assert(deSql.collect().map(_.toSeq).toSet ===
      deApi.collect().map(_.toSeq).toSet)
    assert(deSql.count() > 0 && deSql.count() < docs.count())
    // the benchmark side's contract is text-only — an eval table
    // without doc_id (e.g. (prompt_id, text)) must be accepted, as
    // the Scala API accepts it
    docs.filter(col("doc_id") % 50 === 0)
      .select(col("doc_id").as("prompt_id"), col("text"))
      .createOrReplaceTempView("cur_bench_noid_sql")
    assert(s2.sql("SELECT * FROM decontaminate('cur_corpus_sql', " +
        "'cur_bench_noid_sql', 3)").collect().map(_.toSeq).toSet ===
      deApi.collect().map(_.toSeq).toSet)
    // pack_sequences ≡ packSequences per language stratum
    val pkSql = s2.sql(
      "SELECT * FROM pack_sequences('cur_docs_sql', 'lang', 512)")
    assert(pkSql.columns.toSeq ===
      Seq("doc_id", "lang", "n_tokens", "pack_id"))
    assert(pkSql.collect().map(_.toSeq).toSet ===
      graft.operators.CurationOps.packSequences(docs, "doc_id", "text",
        "lang", 512).collect().map(_.toSeq).toSet)
    // a missing stratum column names the contract, not an unresolved
    // column deep in the window plan
    val err = intercept[Exception] {
      s2.sql(
        "SELECT * FROM pack_sequences('cur_docs_sql', 'no_such')").collect()
    }
    assert(err.getMessage.contains("strata_col"), err.getMessage)
  }

  test("text-analysis TVFs (lang_id, text_quality, token_count, " +
      "repetition_stats, doc_fingerprint, tfidf_topk) agree with the " +
      "Scala API") {
    import org.apache.spark.sql.functions.col
    val s2 = spark.newSession()
    val docs = graft.sources.Tables.documents(s2, sfDir)
    docs.createOrReplaceTempView("txt_docs_sql")
    // lang_id ≡ withLangId projected to the prediction
    val liSql = s2.sql("SELECT * FROM lang_id('txt_docs_sql')")
    assert(liSql.columns.toSeq === Seq("doc_id", "pred_lang"))
    assert(liSql.collect().map(_.toSeq).toSet ===
      graft.operators.TextOps.withLangId(docs, "text")
        .select("doc_id", "pred_lang").collect().map(_.toSeq).toSet)
    // text_quality ≡ withQuality's four signals
    val tqSql = s2.sql("SELECT * FROM text_quality('txt_docs_sql')")
    assert(tqSql.columns.toSeq ===
      Seq("doc_id", "n_tokens", "avg_tok_len", "stop_ratio", "len_bucket"))
    assert(tqSql.collect().map(_.toSeq).toSet ===
      graft.operators.TextOps.withQuality(docs, "text")
        .select("doc_id", "n_tokens", "avg_tok_len", "stop_ratio",
          "len_bucket").collect().map(_.toSeq).toSet)
    // token_count ≡ withTokenCounts
    val tcSql = s2.sql("SELECT * FROM token_count('txt_docs_sql')")
    assert(tcSql.collect().map(_.toSeq).toSet ===
      graft.operators.TextOps.withTokenCounts(docs, "text")
        .select("doc_id", "ws_tokens", "re_tokens")
        .collect().map(_.toSeq).toSet)
    // repetition_stats ≡ withRepetition
    val rpSql = s2.sql("SELECT * FROM repetition_stats('txt_docs_sql')")
    assert(rpSql.collect().map(_.toSeq).toSet ===
      graft.operators.TextOps.withRepetition(docs, "text")
        .select("doc_id", "dup_token_ratio", "dup_3gram_ratio")
        .collect().map(_.toSeq).toSet)
    // doc_fingerprint ≡ withFingerprint
    val fpSql = s2.sql("SELECT * FROM doc_fingerprint('txt_docs_sql')")
    assert(fpSql.collect().map(_.toSeq).toSet ===
      graft.operators.TextOps.withFingerprint(docs, "text")
        .select("doc_id", "fp").collect().map(_.toSeq).toSet)
    // tfidf_topk at a non-default k ≡ tfidfTopK; default k = 3
    val tfSql = s2.sql("SELECT * FROM tfidf_topk('txt_docs_sql', 2)")
    assert(tfSql.columns.toSeq === Seq("doc_id", "tok", "score", "rk"))
    assert(tfSql.collect().map(_.toSeq).toSet ===
      graft.operators.TextOps.tfidfTopK(docs, "doc_id", "text", 2)
        .collect().map(_.toSeq).toSet)
    assert(s2.sql("SELECT * FROM tfidf_topk('txt_docs_sql')")
      .groupBy("doc_id").count().select("count").distinct()
      .collect().map(_.getLong(0)).forall(_ <= 3))
    // contract violation fails at plan-build time naming the contract
    docs.select(col("doc_id"), col("text").as("body"))
      .createOrReplaceTempView("txt_docs_bad_sql")
    val err = intercept[Exception] {
      s2.sql("SELECT * FROM lang_id('txt_docs_bad_sql')").collect()
    }
    assert(err.getMessage.contains("(doc_id, text)"), err.getMessage)
    // a non-positive k names the argument instead of planning an
    // empty-window query
    val errK = intercept[Exception] {
      s2.sql("SELECT * FROM tfidf_topk('txt_docs_sql', 0)").collect()
    }
    assert(errK.getMessage.contains("k must be positive"), errK.getMessage)
  }

  test("normalize_text and corpus_shuffle TVFs agree with the Scala API") {
    import org.apache.spark.sql.functions.col
    val s2 = spark.newSession()
    val docs = graft.sources.Tables.documents(s2, sfDir)
    docs.createOrReplaceTempView("norm_docs_sql")
    val ntSql = s2.sql("SELECT * FROM normalize_text('norm_docs_sql')")
    assert(ntSql.columns.toSeq === Seq("doc_id", "clean"))
    assert(ntSql.collect().map(_.toSeq).toSet ===
      docs.select(col("doc_id"),
          graft.operators.TextOps.normalizeText(col("text")).as("clean"))
        .collect().map(_.toSeq).toSet)
    // corpus_shuffle at a non-default shard count ≡ corpusShuffle
    val csSql = s2.sql("SELECT * FROM corpus_shuffle('norm_docs_sql', 4)")
    assert(csSql.columns.toSeq === Seq("doc_id", "shard", "pos"))
    assert(csSql.collect().map(_.toSeq).toSet ===
      graft.operators.CurationOps.corpusShuffle(docs, "doc_id", 4)
        .select("doc_id", "shard", "pos").collect().map(_.toSeq).toSet)
    val errN = intercept[Exception] {
      s2.sql("SELECT * FROM corpus_shuffle('norm_docs_sql', 0)").collect()
    }
    assert(errN.getMessage.contains("n_shards"), errN.getMessage)
  }

  test("sample_budget TVF agrees with the Scala API") {
    val s2 = spark.newSession()
    val docs = graft.sources.Tables.documents(s2, sfDir)
    docs.createOrReplaceTempView("budget_docs_sql")
    val sql = s2.sql("SELECT * FROM sample_budget('budget_docs_sql', 8000)")
    assert(sql.columns.toSeq === Seq("doc_id", "n_tokens", "cum_tokens"))
    assert(sql.collect().map(_.toSeq).toSet ===
      graft.operators.CurationOps.sampleTokenBudget(docs, "doc_id",
        "text", 8000L).collect().map(_.toSeq).toSet)
    val err = intercept[Exception] {
      s2.sql("SELECT * FROM sample_budget('budget_docs_sql', 0)").collect()
    }
    assert(err.getMessage.contains("budget_tokens"), err.getMessage)
  }

  test("dedup_semantic TVF agrees with the Scala API") {
    val s2 = spark.newSession()
    val vecs = graft.sources.Tables.embeddings(s2, sfDir)
      .select("vec_id", "embedding")
    vecs.createOrReplaceTempView("sem_vecs_sql")
    val sql = s2.sql(
      "SELECT * FROM dedup_semantic('sem_vecs_sql', 0.45, 16)")
    assert(sql.columns.toSeq === Seq("vec_id", "cell", "keeper"))
    assert(sql.collect().map(_.toSeq).toSet ===
      graft.operators.DedupOps.semanticDedup(vecs, "vec_id", "embedding",
        0.45, 16).collect().map(_.toSeq).toSet)
    vecs.withColumnRenamed("embedding", "emb")
      .createOrReplaceTempView("sem_vecs_bad_sql")
    val err = intercept[Exception] {
      s2.sql("SELECT * FROM dedup_semantic('sem_vecs_bad_sql')").collect()
    }
    assert(err.getMessage.contains("(vec_id, embedding)"), err.getMessage)
  }

  test("SQL minhash_sig agrees with the library column API") {
    import org.apache.spark.sql.functions._
    val s2 = spark.newSession()
    import s2.implicits._
    val df = Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    df.createOrReplaceTempView("t")
    val viaSql = s2.sql("SELECT minhash_sig(text, 3, 32) AS sig FROM t")
      .head().getSeq[Long](0)
    val viaApi = df.select(
        graft.functions.TextHashOps.minhashSig(col("text"), 3, 32).as("sig"))
      .head().getSeq[Long](0)
    assert(viaSql === viaApi)
  }

  test("retrieval TVFs (bm25, rrf) agree with the Scala API and reject " +
      "bad arguments") {
    import org.apache.spark.sql.functions.col
    val s2 = spark.newSession()
    val docs = graft.sources.Tables.documents(s2, sfDir)
    val vecs = graft.sources.Tables.embeddings(s2, sfDir)
    docs.createOrReplaceTempView("ret_docs_sql")
    vecs.createOrReplaceTempView("ret_vecs_sql")
    // bm25 ≡ TextOps.bm25 (terms as a space-separated literal)
    val bmSql = s2.sql("SELECT * FROM bm25('ret_docs_sql', 'join filter scan')")
    assert(bmSql.columns.toSeq === Seq("doc_id", "bm25"))
    assert(bmSql.collect().map(_.toSeq).toSeq ===
      graft.operators.TextOps.bm25(docs, "doc_id", "text",
        Seq("join", "filter", "scan")).collect().map(_.toSeq).toSeq)
    // rrf ≡ SimilarityOps.hybridRrf at the q_rrf operating point
    val rrfSql = s2.sql(
      "SELECT * FROM rrf('ret_docs_sql', 'ret_vecs_sql', 'join filter scan', 0)")
    assert(rrfSql.columns.toSeq === Seq("doc_id", "rrf", "n_lists"))
    assert(rrfSql.collect().map(_.toSeq).toSeq ===
      graft.operators.SimilarityOps.hybridRrf(docs, vecs,
        Seq("join", "filter", "scan"), probeId = 0L)
        .collect().map(_.toSeq).toSeq)
    // argument validation fails at ANALYSIS with a named-parameter error
    val e1 = intercept[Exception](
      s2.sql("SELECT * FROM bm25('ret_docs_sql', '   ')").collect())
    assert(e1.getMessage.contains("at least one token"))
    val e2 = intercept[Exception](
      s2.sql("SELECT * FROM rrf('ret_docs_sql', 'ret_docs_sql', 'x', 0)")
        .collect())
    assert(e2.getMessage.contains("vec_id"))
  }

  test("event-analytics TVFs (anomaly, retention, event_funnel) agree " +
      "with the Scala API and validate their column contracts") {
    val s2 = spark.newSession()
    val ev = graft.sources.Tables.events(s2, sfDir)
    ev.createOrReplaceTempView("ev_sql")
    val aSql = s2.sql(
      "SELECT * FROM anomaly('ev_sql', 'event_type', 'event_id', 'value')")
    assert(aSql.columns.toSeq === Seq("event_id", "event_type", "value", "z"))
    assert(aSql.collect().map(_.toSeq).toSeq ===
      graft.operators.EventOps.anomaly(ev, "event_type", "event_id",
        "value").collect().map(_.toSeq).toSeq)
    val rSql = s2.sql("SELECT * FROM retention('ev_sql', 'user_id', 'ts')")
    assert(rSql.collect().map(_.toSeq).toSeq ===
      graft.operators.EventOps.retention(ev, "user_id", "ts")
        .collect().map(_.toSeq).toSeq)
    val fSql = s2.sql("SELECT * FROM event_funnel('ev_sql', 'user_id', " +
      "'event_type', 'ts', 'view click purchase')")
    assert(fSql.collect().map(_.toSeq).toSeq ===
      graft.operators.EventOps.funnel(ev, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase")).collect().map(_.toSeq).toSeq)
    // contract violations fail at plan-build with the columns named
    val e = intercept[Exception](
      s2.sql("SELECT * FROM retention('ev_sql', 'no_such', 'ts')")
        .collect())
    assert(e.getMessage.contains("no_such"), e.getMessage)
  }

  test("statistics TVFs (histogram, profile, merge_upsert) agree with " +
      "the Scala API") {
    val s2 = spark.newSession()
    val li = graft.sources.Tables.lineitem(s2, sfDir)
    li.createOrReplaceTempView("li_sql")
    val hSql = s2.sql("SELECT * FROM histogram('li_sql', " +
      "'l_extendedprice', 5000.0)")
    assert(hSql.columns.toSeq === Seq("bucket", "bin_lo", "n"))
    assert(hSql.collect().map(_.toSeq).toSeq ===
      graft.operators.RelationalOps.histogram(li, "l_extendedprice",
        5000.0).collect().map(_.toSeq).toSeq)
    val pSql = s2.sql(
      "SELECT * FROM profile('li_sql', 'l_quantity l_discount')")
    assert(pSql.collect().map(_.toSeq).toSeq ===
      graft.operators.RelationalOps.profile(li,
        Seq("l_quantity", "l_discount")).collect().map(_.toSeq).toSeq)
    val ord = graft.sources.Tables.orders(s2, sfDir)
      .select("o_orderkey", "o_totalprice")
    ord.createOrReplaceTempView("mu_base_sql")
    import org.apache.spark.sql.functions.col
    ord.filter(col("o_orderkey") % 7 === 0)
      .createOrReplaceTempView("mu_upd_sql")
    val mSql = s2.sql("SELECT * FROM merge_upsert('mu_base_sql', " +
      "'mu_upd_sql', 'o_orderkey')")
    assert(mSql.columns.toSeq ===
      Seq("o_orderkey", "o_totalprice", "action"))
    assert(mSql.collect().map(_.toSeq).toSeq ===
      graft.operators.RelationalOps.mergeUpsert(ord,
        ord.filter(col("o_orderkey") % 7 === 0), "o_orderkey")
        .collect().map(_.toSeq).toSeq)
    // mismatched schemas refuse with both schemas spelled out
    ord.select("o_orderkey").createOrReplaceTempView("mu_bad_sql")
    val e = intercept[Exception](
      s2.sql("SELECT * FROM merge_upsert('mu_base_sql', 'mu_bad_sql', " +
        "'o_orderkey')").collect())
    assert(e.getMessage.contains("identical schemas"), e.getMessage)
    // scd2 ≡ RelationalOps.scd2Build
    val orders = graft.sources.Tables.orders(s2, sfDir)
    orders.createOrReplaceTempView("scd2_sql")
    val sSql = s2.sql("SELECT * FROM scd2('scd2_sql', 'o_custkey', " +
      "'o_orderpriority', 'o_orderdate', 'o_orderkey')")
    assert(sSql.columns.toSeq === Seq("o_custkey", "o_orderpriority",
      "valid_from", "valid_to", "src_key", "is_current"))
    assert(sSql.collect().map(_.toSeq).toSeq ===
      graft.operators.RelationalOps.scd2Build(orders, "o_custkey",
        "o_orderpriority", "o_orderdate", "o_orderkey")
        .collect().map(_.toSeq).toSeq)
  }

  test("dq_checks TVF agrees with the Scala API and rejects malformed " +
      "specs") {
    import graft.operators.ConstraintOps
    val s2 = spark.newSession()
    val li = graft.sources.Tables.lineitem(s2, sfDir)
    li.createOrReplaceTempView("dq_li_sql")
    graft.sources.Tables.orders(s2, sfDir)
      .createOrReplaceTempView("dq_ord_sql")
    val got = s2.sql("SELECT * FROM dq_checks('dq_li_sql', " +
      "'not_null:l_orderkey range:l_discount:0:1 unique:l_orderkey " +
      "ref:l_orderkey:dq_ord_sql:o_orderkey')")
    assert(got.columns.toSeq === Seq("check_name", "violations"))
    assert(got.collect().map(_.toSeq).toSeq ===
      ConstraintOps.dqReport(li, Seq(
        ConstraintOps.NotNull("l_orderkey"),
        ConstraintOps.InRange("l_discount", 0.0, 1.0),
        ConstraintOps.UniqueKey("l_orderkey"),
        ConstraintOps.RefIntegrity("l_orderkey",
          graft.sources.Tables.orders(s2, sfDir), "dq_ord_sql",
          "o_orderkey"))).collect().map(_.toSeq).toSeq)
    val e = intercept[Exception](
      s2.sql("SELECT * FROM dq_checks('dq_li_sql', 'bogus:x')").collect())
    assert(e.getMessage.contains("unrecognized check"), e.getMessage)
  }

  test("zorder_key SQL function agrees with the Column API and the " +
      "reference interleave") {
    val s2 = spark.newSession()
    val row = s2.sql(
      "SELECT zorder_key(5L, 3L) AS a, zorder_key(48L, 12L) AS b").head()
    assert(row.getLong(0) ===
      graft.functions.ZOrder.interleaveRef(5L, 3L))
    assert(row.getLong(1) ===
      graft.functions.ZOrder.interleaveRef(48L, 12L))
  }

  test("anomaly_mad and sample_weighted TVFs agree with the Scala API") {
    val s2 = spark.newSession()
    graft.sources.Tables.events(s2, sfDir)
      .createOrReplaceTempView("mad_sql")
    val m = s2.sql("SELECT * FROM anomaly_mad('mad_sql', 'event_type', " +
      "'event_id', 'value')")
    assert(m.collect().map(_.toSeq).toSeq ===
      graft.operators.EventOps.anomalyMad(
        graft.sources.Tables.events(s2, sfDir), "event_type",
        "event_id", "value").collect().map(_.toSeq).toSeq)
    graft.sources.Tables.documents(s2, sfDir)
      .createOrReplaceTempView("wsamp_sql")
    val w = s2.sql(
      "SELECT * FROM sample_weighted('wsamp_sql', 'doc_id', 'n_chars', 50)")
    assert(w.collect().map(_.toSeq).toSeq ===
      graft.operators.CurationOps.weightedSample(
        graft.sources.Tables.documents(s2, sfDir), "doc_id", "n_chars",
        50).collect().map(_.toSeq).toSeq)
  }

  test("drift TVF agrees with the Scala API") {
    import org.apache.spark.sql.functions.{col, lit, when}
    val s2 = spark.newSession()
    val ev = graft.sources.Tables.events(s2, sfDir)
      .withColumn("period",
        when(col("ts") < lit("2024-01-16 00:00:00").cast("timestamp"), 0)
          .otherwise(1))
    ev.createOrReplaceTempView("drift_sql")
    val got = s2.sql("SELECT * FROM drift('drift_sql', 'event_type', " +
      "'value', 'period', 50.0)")
    assert(got.columns.toSeq === Seq("event_type", "psi"))
    assert(got.collect().map(_.toSeq).toSeq ===
      graft.operators.EventOps.drift(ev, "event_type", "value",
        "period", 50.0).collect().map(_.toSeq).toSeq)
  }

  test("round-12 TVFs (resample, perplexity, pagerank, table_checksum) " +
    "agree with the Scala API and validate their domains") {
    import org.apache.spark.sql.functions.col
    val s2 = spark.newSession()
    val ev = graft.sources.Tables.events(s2, sfDir)
    ev.createOrReplaceTempView("ev_r12")
    val rs = s2.sql(
      "SELECT * FROM resample('ev_r12', 'event_type', 'ts', 'value')")
    assert(rs.columns.toSeq ===
      Seq("event_type", "bucket", "n", "is_gap", "v_fill"))
    assert(rs.collect().map(_.toSeq).toSeq ===
      graft.operators.EventOps.resample(ev, "event_type", "ts", "value")
        .collect().map(_.toSeq).toSeq)
    // the step phrase is whitelisted — it lands in an INTERVAL literal
    assert(intercept[Exception] {
      s2.sql("SELECT * FROM resample('ev_r12', 'event_type', 'ts', " +
        "'value', '1 hour) SELECT 1 --')").collect()
    }.getMessage.contains("step"))

    val docs = graft.sources.Tables.documents(s2, sfDir)
    docs.createOrReplaceTempView("docs_r12")
    assert(s2.sql("SELECT * FROM perplexity('docs_r12')")
      .collect().map(_.toSeq).toSeq ===
      graft.operators.TextOps.unigramPerplexity(docs, "doc_id", "text")
        .collect().map(_.toSeq).toSeq)

    import s2.implicits._
    val edges = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"))
      .toDF("u", "v")
    edges.createOrReplaceTempView("edges_r12")
    val pr = s2.sql("SELECT * FROM pagerank('edges_r12', 'u', 'v', 3)")
    assert(pr.columns.toSeq === Seq("node", "r"))
    assert(pr.collect().map(_.toSeq).toSeq ===
      graft.operators.GraphOps.pageRank(
        edges.select(col("u").as("src"), col("v").as("dst")), 3)
        .orderBy(col("r").desc, col("node"))
        .collect().map(_.toSeq).toSeq)

    val cs = s2.sql("SELECT * FROM table_checksum('ev_r12', 'event_type')")
    assert(cs.columns.toSeq === Seq("event_type", "n_rows", "checksum"))
    assert(cs.collect().map(_.toSeq).toSeq ===
      graft.operators.RelationalOps.tableChecksum(ev,
        ev.columns.filterNot(_ == "event_type").sorted.toSeq.map(col),
        Seq("event_type")).collect().map(_.toSeq).toSeq)
  }

  test("affinity TVFs (cooccur_pmi, basket_rules, triangles, ewma) " +
    "agree with the Scala API and validate their domains") {
    import org.apache.spark.sql.functions.col
    val s2 = spark.newSession()
    val docs = graft.sources.Tables.documents(s2, sfDir)
    docs.createOrReplaceTempView("docs_aff")
    val pmi = s2.sql(
      "SELECT * FROM cooccur_pmi('docs_aff', 'text', 3, 2, 25)")
    assert(pmi.columns.toSeq === Seq("tok1", "tok2", "n_pair", "pmi"))
    assert(pmi.collect().map(_.toSeq).toSeq ===
      graft.operators.AffinityOps.cooccurPmi(docs, "text", 3, 2, 25)
        .collect().map(_.toSeq).toSeq)

    val li = graft.sources.Tables.lineitem(s2, sfDir)
    li.createOrReplaceTempView("li_aff")
    val br = s2.sql(
      "SELECT * FROM basket_rules('li_aff', 'l_orderkey', 'l_partkey')")
    assert(br.columns.toSeq === Seq("antecedent", "consequent", "n_pair",
      "support", "confidence", "lift"))
    assert(br.collect().map(_.toSeq).toSeq ===
      graft.operators.AffinityOps.basketRules(li,
        "l_orderkey", "l_partkey").collect().map(_.toSeq).toSeq)

    import s2.implicits._
    val k4 = Seq((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4))
      .toDF("a", "b")
    k4.createOrReplaceTempView("k4_aff")
    assert(s2.sql("SELECT * FROM triangles('k4_aff', 'a', 'b')")
      .collect().map(_.toSeq).toSeq ===
      Seq(Seq(1, 2, 3), Seq(1, 2, 4), Seq(1, 3, 4), Seq(2, 3, 4)))

    val ev = graft.sources.Tables.events(s2, sfDir)
    ev.createOrReplaceTempView("ev_aff")
    val ew = s2.sql("SELECT * FROM ewma('ev_aff', 'user_id', 'ts', " +
      "'event_id', 'value', 0.5, 10)")
    assert(ew.columns.toSeq ===
      Seq("event_id", "user_id", "ts", "value", "ewma"))
    assert(ew.collect().map(_.toSeq).toSeq ===
      graft.operators.EventOps.ewma(ev, "user_id", "ts", "event_id",
        "value", 0.5, 10).collect().map(_.toSeq).toSeq)
    assert(intercept[Exception] {
      s2.sql("SELECT * FROM ewma('ev_aff', 'user_id', 'ts', " +
        "'event_id', 'value', 2.0)").collect()
    }.getMessage.contains("alpha"))
    assert(intercept[Exception] {
      s2.sql("SELECT * FROM cooccur_pmi('docs_aff', 'no_such_col')")
        .collect()
    }.getMessage.contains("no_such_col"))
  }

  test("session_intervals and interval_join TVFs compose from pure SQL " +
    "and agree with the Scala API") {
    import org.apache.spark.sql.functions.col
    val s2 = spark.newSession()
    val ev = graft.sources.Tables.events(s2, sfDir)
    ev.createOrReplaceTempView("ev_ij")
    val si = s2.sql(
      "SELECT * FROM session_intervals('ev_ij', 'user_id', 'ts', " +
        "'event_id', 900)")
    assert(si.columns.toSeq === Seq("user_id", "sid", "st", "en"))
    assert(si.orderBy("user_id", "sid").collect().map(_.toSeq).toSeq ===
      graft.operators.EventOps.sessionIntervals(ev, "user_id", "ts",
        "event_id", 900).orderBy("user_id", "sid")
        .collect().map(_.toSeq).toSeq)
    // compose: overlap-join the session table with itself (aliased)
    s2.sql("CREATE OR REPLACE TEMP VIEW iv_a AS SELECT user_id AS ua, " +
      "st AS st_a, en AS en_a FROM session_intervals('ev_ij', " +
      "'user_id', 'ts', 'event_id')")
    s2.sql("CREATE OR REPLACE TEMP VIEW iv_b AS SELECT user_id AS ub, " +
      "st AS st_b, en AS en_b FROM session_intervals('ev_ij', " +
      "'user_id', 'ts', 'event_id')")
    val ij = s2.sql("SELECT * FROM interval_join('iv_a', 'iv_b', " +
      "'st_a', 'en_a', 'st_b', 'en_b', 3600) WHERE ua < ub")
    val api = {
      val iv = graft.operators.EventOps.sessionIntervals(ev, "user_id",
        "ts", "event_id")
      graft.operators.JoinOps.intervalJoin(
        iv.select(col("user_id").as("ua"), col("st").as("st_a"),
          col("en").as("en_a")),
        iv.select(col("user_id").as("ub"), col("st").as("st_b"),
          col("en").as("en_b")),
        "st_a", "en_a", "st_b", "en_b", 3600,
        residual = col("ua") < col("ub"))
    }
    assert(ij.count() === api.count() && ij.count() > 0)
    assert(intercept[Exception] {
      s2.sql("SELECT * FROM interval_join('iv_a', 'iv_a', 'st_a', " +
        "'en_a', 'st_a', 'en_a', 3600)").collect()
    }.getMessage.contains("disjoint"))
  }

  test("acf and fuzzy_join TVFs agree with the Scala API") {
    import org.apache.spark.sql.functions.{col, substring}
    val s2 = spark.newSession()
    val ev = graft.sources.Tables.events(s2, sfDir)
    ev.createOrReplaceTempView("ev_acf")
    val a = s2.sql("SELECT * FROM acf('ev_acf', 'event_type', 'ts', " +
      "'value', 6)")
    assert(a.columns.toSeq === Seq("g", "lag", "n", "acf"))
    assert(a.collect().map(_.toSeq).toSeq ===
      graft.operators.EventOps.acf(ev, "event_type", "ts", "value", 6)
        .collect().map(_.toSeq).toSeq)
    val pt = graft.sources.Tables.part(s2, sfDir)
    pt.createOrReplaceTempView("pt_fz")
    val f = s2.sql("SELECT * FROM fuzzy_join('pt_fz', 'p_name', 3, 1)")
    assert(f.columns.toSeq === Seq("name_a", "name_b", "d", "n_a", "n_b"))
    assert(f.collect().map(_.toSeq).toSeq ===
      graft.operators.DedupOps.fuzzyNamePairs(pt, "p_name",
        substring(col("name"), 1, 1), 3).collect().map(_.toSeq).toSeq)
  }

  test("readability and feature_hash TVFs agree with the Scala API") {
    val s2 = spark.newSession()
    val docs = graft.sources.Tables.documents(s2, sfDir)
    val ord = graft.sources.Tables.orders(s2, sfDir)
    docs.createOrReplaceTempView("rd_docs")
    ord.createOrReplaceTempView("rd_orders")
    assertParity(s2, "SELECT * FROM readability('rd_docs', " +
      "'doc_id', 'text')",
      graft.operators.TextOps.readability(docs, "doc_id", "text"))
    assertParity(s2, "SELECT * FROM feature_hash('rd_orders', " +
      "'o_orderkey', 'o_orderpriority o_orderstatus', 32)",
      graft.operators.CurationOps.featureHash(ord, "o_orderkey",
        Seq("o_orderpriority", "o_orderstatus"), 32))
    assertParity(s2, "SELECT * FROM quantile_normalize('rd_orders', " +
      "'o_orderkey', 'o_totalprice o_custkey')",
      graft.operators.CurationOps.quantileNormalize(ord,
        "o_orderkey", Seq("o_totalprice", "o_custkey")))
  }

  test("mmr TVF agrees with the Scala API") {
    import org.apache.spark.sql.functions.{broadcast, col, round => rnd}
    val s2 = spark.newSession()
    val e = graft.sources.Tables.embeddings(s2, sfDir)
    val probes = broadcast(e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("pe")))
    val cands = e.join(probes, col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("cid"),
        rnd(graft.operators.SimilarityOps.cosine(col("embedding"),
          col("pe")), 6).as("rel"),
        col("embedding"))
    cands.createOrReplaceTempView("mm_cands")
    assertParity(s2, "SELECT * FROM mmr('mm_cands', 'qid', 'cid', " +
      "'rel', 'embedding', 5, 0.6)",
      graft.operators.SimilarityOps.mmrRerank(cands, "qid", "cid",
        "rel", "embedding", 5, 0.6))
  }

  test("hampel and seasonal_decompose TVFs agree with the Scala API") {
    val s2 = spark.newSession()
    val ev = graft.sources.Tables.events(s2, sfDir)
    ev.createOrReplaceTempView("ev_hs")
    assertParity(s2, "SELECT * FROM hampel('ev_hs', 'user_id', " +
      "'ts', 'event_id', 'value', 10, 2.5)",
      graft.operators.EventOps.hampel(ev, "user_id", "ts",
        "event_id", "value", 10, 2.5))
    assertParity(s2, "SELECT * FROM rolling_quantile('ev_hs', " +
      "'user_id', 'ts', 'event_id', 'value', 0.95, 10)",
      graft.operators.EventOps.rollingQuantile(ev, "user_id", "ts",
        "event_id", "value", 0.95, 10))
    assertParity(s2, "SELECT * FROM forecast_baseline('ev_hs', " +
      "'ts', 'value', 7)",
      graft.operators.EventOps.forecastBaseline(ev, "ts", "value", 7))
    assertParity(s2, "SELECT * FROM seq_entropy('ev_hs', " +
      "'user_id', 'ts', 'event_id', 'event_type')",
      graft.operators.EventOps.seqEntropy(ev, "user_id", "ts",
        "event_id", "event_type"))
    val rcEv = {
      import org.apache.spark.sql.functions.{col, when}
      ev.select(col("ts"),
        when(col("event_type") === "view", col("value")).as("xv"),
        when(col("event_type") === "error", col("value")).as("yv"))
    }
    rcEv.createOrReplaceTempView("ev_rc")
    assertParity(s2, "SELECT * FROM rolling_corr('ev_rc', 'ts', " +
      "'xv', 'yv', 7)",
      graft.operators.EventOps.rollingCorr(rcEv, "ts", "xv", "yv", 7))
    assertParity(s2, "SELECT * FROM seasonal_decompose('ev_hs', " +
      "'ts', 'value', 7)",
      graft.operators.EventOps.seasonalDecompose(ev, "ts", "value", 7))
  }

  test("rolling_median and trend TVFs agree with the Scala API") {
    val s2 = spark.newSession()
    val ev = graft.sources.Tables.events(s2, sfDir)
    ev.createOrReplaceTempView("ev_rt")
    val rm = s2.sql("SELECT * FROM rolling_median('ev_rt', 'user_id', " +
      "'ts', 'event_id', 'value', 10)")
    assert(rm.columns.toSeq ===
      Seq("event_id", "user_id", "ts", "value", "rmed"))
    assert(rm.collect().map(_.toSeq).toSeq ===
      graft.operators.EventOps.rollingMedian(ev, "user_id", "ts",
        "event_id", "value", 10).collect().map(_.toSeq).toSeq)
    val tr = s2.sql("SELECT * FROM trend('ev_rt', 'event_type', 'ts', " +
      "'value')")
    assert(tr.columns.toSeq === Seq("g", "n", "slope", "intercept"))
    assert(tr.collect().map(_.toSeq).toSeq ===
      graft.operators.EventOps.trend(ev, "event_type", "ts", "value")
        .collect().map(_.toSeq).toSeq)
  }

  test("label_prop TVF agrees with the Scala API") {
    import org.apache.spark.sql.functions.col
    val s2 = spark.newSession()
    import s2.implicits._
    val e0 = Seq((1, 2), (2, 3), (1, 3), (10, 11)).toDF("a", "b")
    val edges = e0.union(e0.select(col("b").as("a"), col("a").as("b")))
    edges.createOrReplaceTempView("lp_edges")
    val got = s2.sql("SELECT * FROM label_prop('lp_edges', 'a', 'b', 4)")
    assert(got.columns.toSeq === Seq("node", "lbl"))
    assert(got.collect().map(_.toSeq).toSeq ===
      graft.operators.GraphOps.labelPropagation(
        edges.select(col("a").as("src"), col("b").as("dst")), 4)
        .orderBy("node").collect().map(_.toSeq).toSeq)
  }

  test("kcore TVF agrees with the Scala API") {
    import org.apache.spark.sql.functions.col
    val s2 = spark.newSession()
    import s2.implicits._
    val edges = (Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)) ++
      (for (i <- 10L to 14L; j <- i + 1 to 14L) yield (i, j)))
      .toDF("a", "b")
    edges.createOrReplaceTempView("kc_edges")
    val got = s2.sql("SELECT * FROM kcore('kc_edges', 'a', 'b', 3)")
    assert(got.columns.toSeq === Seq("node", "core_degree"))
    assert(got.collect().map(_.toSeq).toSeq ===
      graft.operators.GraphOps.kCore(
        edges.select(col("a").as("src"), col("b").as("dst")), 3)
        .collect().map(_.toSeq).toSeq)
  }

  test("stats TVFs (skyline, winsorize, ab_metrics) agree with the " +
    "Scala API") {
    import org.apache.spark.sql.functions.col
    val s2 = spark.newSession()
    val ord = graft.sources.Tables.orders(s2, sfDir)
      .select(col("o_custkey"),
        col("o_totalprice").cast("decimal(18,2)").as("price"),
        col("o_orderdate").as("odate"))
    ord.createOrReplaceTempView("st_ord")
    val sky = s2.sql("SELECT * FROM skyline('st_ord', 'price', 'odate')")
    assert(sky.columns.toSeq === Seq("x", "y"))
    assert(sky.collect().map(_.toSeq).toSet ===
      graft.operators.StatsOps.skyline(ord, "price", "odate")
        .collect().map(_.toSeq).toSet)
    val wz = s2.sql(
      "SELECT * FROM winsorize('st_ord', 'o_custkey', 'price', 0.1, 0.9)")
    assert(wz.columns.toSeq ===
      Seq("o_custkey", "n", "p_lo", "p_hi", "mean_raw", "mean_wins"))
    assert(wz.collect().map(_.toSeq).toSeq ===
      graft.operators.StatsOps.winsorizedMean(ord, "o_custkey", "price",
        0.1, 0.9).orderBy("o_custkey").collect().map(_.toSeq).toSeq)
    graft.sources.Tables.customer(s2, sfDir)
      .createOrReplaceTempView("st_cust")
    ord.filter(col("price") > 400000).createOrReplaceTempView("st_conv")
    val ab = s2.sql("SELECT * FROM ab_metrics('st_cust', 'c_custkey', " +
      "'st_conv', 'o_custkey')")
    assert(ab.columns.toSeq ===
      Seq("variant", "n_units", "n_conv", "rate", "z"))
    assert(ab.collect().map(_.toSeq).toSeq ===
      graft.operators.StatsOps.abMetrics(
        graft.sources.Tables.customer(s2, sfDir), "c_custkey",
        ord.filter(col("price") > 400000).select("o_custkey"),
        "o_custkey").orderBy("variant").collect().map(_.toSeq).toSeq)
  }

  test("shortest_path, token_entropy, and ngram_topk TVFs agree with " +
    "the Scala API") {
    import org.apache.spark.sql.functions.col
    val s2 = spark.newSession()
    import s2.implicits._
    val e0 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("a", "b")
    val edges = e0.union(e0.select(col("b").as("a"), col("a").as("b")))
    edges.createOrReplaceTempView("sp_edges")
    val sp = s2.sql(
      "SELECT * FROM shortest_path('sp_edges', 'a', 'b', 1, 3)")
    assert(sp.columns.toSeq === Seq("node", "dist"))
    assert(sp.collect().map(_.toSeq).toSeq ===
      graft.operators.GraphOps.shortestPaths(
        edges.select(col("a").as("src"), col("b").as("dst")), 1L, 3)
        .orderBy("dist", "node").collect().map(_.toSeq).toSeq)
    val docs = graft.sources.Tables.documents(s2, sfDir)
    docs.createOrReplaceTempView("te_docs")
    val te = s2.sql(
      "SELECT * FROM token_entropy('te_docs', 'lang', 'text')")
    assert(te.columns.toSeq ===
      Seq("lang", "n_tokens", "n_distinct", "entropy"))
    assert(te.collect().map(_.toSeq).toSeq ===
      graft.operators.TextOps.tokenEntropy(docs, "lang", "text")
        .orderBy("lang").collect().map(_.toSeq).toSeq)
    val ng = s2.sql("SELECT * FROM ngram_topk('te_docs', 'text', 3, 15)")
    assert(ng.columns.toSeq === Seq("ngram", "n"))
    assert(ng.collect().map(_.toSeq).toSeq ===
      graft.operators.TextOps.ngramTopK(docs, "text", 3, 15)
        .collect().map(_.toSeq).toSeq)
  }

  test("reconciliation/sequence TVFs (table_diff, gaps_islands, " +
    "transitions, attribution, benford) agree with the Scala API") {
    import org.apache.spark.sql.functions.col
    val s2 = spark.newSession()
    val ord = graft.sources.Tables.orders(s2, sfDir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    ord.filter(col("o_orderkey") % 100 =!= 7)
      .createOrReplaceTempView("td_prev")
    ord.filter(col("o_orderkey") % 100 =!= 13)
      .createOrReplaceTempView("td_next")
    val diff = s2.sql(
      "SELECT * FROM table_diff('td_prev', 'td_next', 'o_orderkey')")
    assert(diff.columns.take(3).toSeq ===
      Seq("o_orderkey", "status", "changed_cols"))
    assert(diff.collect().map(_.toSeq).toSeq ===
      graft.operators.RelationalOps.tableDiff(
          ord.filter(col("o_orderkey") % 100 =!= 7),
          ord.filter(col("o_orderkey") % 100 =!= 13), "o_orderkey")
        .orderBy("o_orderkey").collect().map(_.toSeq).toSeq)
    val ev = graft.sources.Tables.events(s2, sfDir)
    ev.createOrReplaceTempView("sq_events")
    val gi = s2.sql(
      "SELECT * FROM gaps_islands('sq_events', 'user_id', 'ts')")
    assert(gi.columns.toSeq ===
      Seq("user_id", "start_day", "end_day", "n_days"))
    assert(gi.collect().map(_.toSeq).toSeq ===
      graft.operators.EventOps.gapsIslands(ev, "user_id", "ts")
        .collect().map(_.toSeq).toSeq)
    val tr = s2.sql("SELECT * FROM transitions('sq_events', " +
      "'user_id', 'event_type', 'ts', 'event_id')")
    assert(tr.columns.toSeq === Seq("src", "dst", "n", "p"))
    assert(tr.collect().map(_.toSeq).toSeq ===
      graft.operators.EventOps.transitions(ev, "user_id", "event_type",
        "ts", "event_id").collect().map(_.toSeq).toSeq)
    val at = s2.sql("SELECT * FROM attribution('sq_events', " +
      "'user_id', 'event_type', 'ts', 'event_id', 'purchase')")
    assert(at.columns.toSeq ===
      Seq("channel", "first_touch", "last_touch"))
    assert(at.collect().map(_.toSeq).toSeq ===
      graft.operators.EventOps.attribution(ev, "user_id", "event_type",
        "ts", "event_id", "purchase").collect().map(_.toSeq).toSeq)
    graft.sources.Tables.orders(s2, sfDir)
      .createOrReplaceTempView("bf_orders")
    val bf = s2.sql("SELECT * FROM benford('bf_orders', 'o_totalprice')")
    assert(bf.columns.toSeq === Seq("digit", "n", "obs_p", "exp_p",
      "chi2"))
    assert(bf.collect().map(_.toSeq).toSeq ===
      graft.operators.StatsOps.benford(
          graft.sources.Tables.orders(s2, sfDir), "o_totalprice")
        .collect().map(_.toSeq).toSeq)
  }

  test("geo_radius_join TVF agrees with the Scala API and rejects a " +
    "coordinate-free table at plan time") {
    import org.apache.spark.sql.functions.col
    val s2 = spark.newSession()
    val cust = graft.sources.Tables.customer(s2, sfDir).select(
      col("c_custkey"),
      graft.operators.GeoOps.syntheticLat(col("c_custkey")).as("lat"),
      graft.operators.GeoOps.syntheticLon(col("c_custkey")).as("lon"))
    val supp = graft.sources.Tables.supplier(s2, sfDir).select(
      col("s_suppkey"),
      graft.operators.GeoOps.syntheticLat(col("s_suppkey")).as("lat"),
      graft.operators.GeoOps.syntheticLon(col("s_suppkey")).as("lon"))
    cust.createOrReplaceTempView("geo_c")
    supp.createOrReplaceTempView("geo_s")
    val got = s2.sql(
        "SELECT * FROM geo_radius_join('geo_c', 'geo_s', 700.0)")
      .orderBy("l_c_custkey", "r_s_suppkey")
    assert(got.collect().map(_.toSeq).toSeq ===
      graft.operators.GeoOps.radiusJoin(cust, supp, 700.0)
        .orderBy("l_c_custkey", "r_s_suppkey")
        .collect().map(_.toSeq).toSeq)
    graft.sources.Tables.orders(s2, sfDir)
      .createOrReplaceTempView("geo_bad")
    val err = intercept[Exception] {
      s2.sql("SELECT * FROM geo_radius_join('geo_bad', 'geo_s', 100.0)")
    }
    assert(err.getMessage.contains("lat"))
  }

  test("diagnostics/feature TVFs (crosstab_chi2, key_skew, " +
    "changepoint, trailing_features) agree with the Scala API") {
    val s2 = spark.newSession()
    val ord = graft.sources.Tables.orders(s2, sfDir)
    ord.createOrReplaceTempView("dg_orders")
    val ct = s2.sql("SELECT * FROM crosstab_chi2('dg_orders', " +
      "'o_orderstatus', 'o_orderpriority')")
    assert(ct.columns.toSeq === Seq("o_orderstatus", "o_orderpriority",
      "n", "expected", "chi2"))
    assert(ct.collect().map(_.toSeq).toSeq ===
      graft.operators.StatsOps.crosstabChi2(ord, "o_orderstatus",
        "o_orderpriority").collect().map(_.toSeq).toSeq)
    val li = graft.sources.Tables.lineitem(s2, sfDir)
    li.createOrReplaceTempView("dg_lineitem")
    val ks = s2.sql(
      "SELECT * FROM key_skew('dg_lineitem', 'l_partkey', 5)")
    assert(ks.columns.toSeq ===
      Seq("key", "cnt", "share", "cum_share", "skew"))
    assert(ks.collect().map(_.toSeq).toSeq ===
      graft.operators.StatsOps.keySkew(li, "l_partkey", 5)
        .collect().map(_.toSeq).toSeq)
    val ev = graft.sources.Tables.events(s2, sfDir)
    ev.createOrReplaceTempView("dg_events")
    val cp = s2.sql(
      "SELECT * FROM changepoint('dg_events', 'event_type', 'ts')")
    assert(cp.columns.toSeq === Seq("event_type", "cp_hour", "stat",
      "mean_before", "mean_after"))
    assert(cp.collect().map(_.toSeq).toSeq ===
      graft.operators.EventOps.changepoint(ev, "event_type", "ts")
        .collect().map(_.toSeq).toSeq)
    val tf = s2.sql("SELECT * FROM trailing_features('dg_events', " +
      "'user_id', 'ts', 'event_id', 'event_type', 'value', 'purchase')")
    assert(tf.columns.toSeq ===
      Seq("event_id", "user_id", "ts", "n_1d", "n_7d", "v_7d"))
    assert(tf.collect().map(_.toSeq).toSeq ===
      graft.operators.EventOps.trailingFeatures(ev, "user_id", "ts",
          "event_id", "event_type", "value", "purchase")
        .collect().map(_.toSeq).toSeq)
    // literal-contract errors fire at plan time with the usage string
    val bad = intercept[Exception] {
      s2.sql("SELECT * FROM key_skew('dg_lineitem', 'no_such_key')")
    }
    assert(bad.getMessage.contains("no_such_key"))
  }

  test("warehouse-analytics TVFs (rfm, join_size, seasonality, " +
    "lorenz_gini) agree with the Scala API") {
    val s2 = spark.newSession()
    val ord = graft.sources.Tables.orders(s2, sfDir)
    ord.createOrReplaceTempView("wa_orders")
    val rf = s2.sql("SELECT * FROM rfm('wa_orders', 'o_custkey', " +
      "'o_orderdate', 'o_totalprice')")
    assert(rf.columns.toSeq === Seq("o_custkey", "r_days", "f", "m",
      "r_score", "f_score", "m_score", "segment"))
    assert(rf.collect().map(_.toSeq).toSeq ===
      graft.operators.StatsOps.rfm(ord, "o_custkey", "o_orderdate",
        "o_totalprice").collect().map(_.toSeq).toSeq)
    val li = graft.sources.Tables.lineitem(s2, sfDir)
    li.createOrReplaceTempView("wa_lineitem")
    val js = s2.sql("SELECT * FROM join_size('wa_lineitem', " +
      "'wa_lineitem', 'l_partkey')")
    assert(js.columns.toSeq === Seq("left_rows", "right_rows",
      "matched_keys", "est_rows", "hottest_key", "hottest_pairs",
      "expansion"))
    assert(js.collect().map(_.toSeq).toSeq ===
      graft.operators.StatsOps.joinSizeEstimate(li, li, "l_partkey")
        .collect().map(_.toSeq).toSeq)
    val ev = graft.sources.Tables.events(s2, sfDir)
    ev.createOrReplaceTempView("wa_events")
    val se = s2.sql(
      "SELECT * FROM seasonality('wa_events', 'event_type', 'ts')")
    assert(se.columns.toSeq === Seq("event_type", "hod", "n", "share",
      "idx"))
    assert(se.collect().map(_.toSeq).toSeq ===
      graft.operators.EventOps.seasonality(ev, "event_type", "ts")
        .collect().map(_.toSeq).toSeq)
    val lg = s2.sql("SELECT * FROM lorenz_gini('wa_orders', " +
      "'o_custkey', 'o_totalprice')")
    assert(lg.columns.toSeq === Seq("decile", "cum_share", "gini"))
    assert(lg.collect().map(_.toSeq).toSeq ===
      graft.operators.StatsOps.lorenzGini(ord, "o_custkey",
        "o_totalprice").collect().map(_.toSeq).toSeq)
  }

  /** SQL ≡ Scala parity over the named views, the every-family-SQL-
    * reachable invariant's enforcement shape (one assert per TVF). */
  private def assertParity(s2: org.apache.spark.sql.SparkSession,
      sql: String, scala: org.apache.spark.sql.DataFrame): Unit = {
    val viaSql = s2.sql(sql)
    assert(viaSql.columns.toSeq === scala.columns.toSeq, sql)
    assert(viaSql.collect().map(_.toSeq).toSeq ===
      scala.collect().map(_.toSeq).toSeq, sql)
  }

  test("hypothesis/profile/stats TVFs (ks_test, mann_whitney, " +
    "kruskal_wallis, anova, qq, mutual_info, cramers_v, kappa, " +
    "spearman, corr_matrix, fd_profile, candidate_keys, psi, hhi, " +
    "iqr_outliers) agree with the Scala API") {
    import graft.operators.{HypothesisOps, ProfileOps, StatsOps}
    import org.apache.spark.sql.functions.{col, dayofmonth, expr, when}
    val s2 = spark.newSession()
    val ord = graft.sources.Tables.orders(s2, sfDir)
    val li = graft.sources.Tables.lineitem(s2, sfDir)
    val ev = graft.sources.Tables.events(s2, sfDir)
    val part = graft.sources.Tables.part(s2, sfDir)
    ord.createOrReplaceTempView("ht_orders")
    li.createOrReplaceTempView("ht_lineitem")
    ev.createOrReplaceTempView("ht_events")
    part.createOrReplaceTempView("ht_part")
    assertParity(s2, "SELECT * FROM ks_test('ht_orders', " +
      "'o_totalprice', 'o_orderstatus', 'F', 'O')",
      HypothesisOps.ksTest(ord, "o_totalprice", "o_orderstatus",
        "F", "O"))
    assertParity(s2, "SELECT * FROM t_test('ht_orders', " +
      "'o_totalprice', 'o_orderstatus', 'F', 'O')",
      HypothesisOps.tTest(ord, "o_totalprice", "o_orderstatus",
        "F", "O"))
    assertParity(s2, "SELECT * FROM wasserstein('ht_orders', " +
      "'o_totalprice', 'o_orderstatus', 'F', 'O')",
      HypothesisOps.wasserstein(ord, "o_totalprice", "o_orderstatus",
        "F", "O"))
    assertParity(s2, "SELECT * FROM cvm_test('ht_orders', " +
      "'o_totalprice', 'o_orderstatus', 'F', 'O')",
      HypothesisOps.cvmTest(ord, "o_totalprice", "o_orderstatus",
        "F", "O"))
    assertParity(s2, "SELECT * FROM ks_by('ht_orders', " +
      "'o_totalprice', 'o_orderstatus', 'F', 'O', 'o_orderpriority')",
      HypothesisOps.ksBy(ord, "o_totalprice", "o_orderstatus",
        "F", "O", "o_orderpriority"))
    assertParity(s2, "SELECT * FROM energy_distance('ht_orders', " +
      "'o_totalprice', 'o_orderstatus', 'F', 'O')",
      HypothesisOps.energyDistance(ord, "o_totalprice",
        "o_orderstatus", "F", "O"))
    assertParity(s2, "SELECT * FROM lift_table('ht_orders', " +
      "'o_totalprice', 'o_orderstatus', 'F', 'O', 5)",
      HypothesisOps.liftTable(ord, "o_totalprice", "o_orderstatus",
        "F", "O", 5))
    val abOrd = graft.sources.Tables.orders(s2, sfDir)
      .select(col("o_orderpriority").as("arm"),
        col("o_totalprice").as("post"),
        dayofmonth(col("o_orderdate")).as("pre"))
    abOrd.createOrReplaceTempView("ht_ab")
    assertParity(s2, "SELECT * FROM cuped('ht_ab', 'arm', 'pre', " +
      "'post')", StatsOps.cuped(abOrd, "arm", "pre", "post"))
    assertParity(s2, "SELECT * FROM delta_method('ht_ab', 'arm', " +
      "'post', 'pre')", StatsOps.deltaMethod(abOrd, "arm", "post",
        "pre"))
    assertParity(s2, "SELECT * FROM did_estimate('ht_ab', 'arm', " +
      "'1-URGENT', 'pre', 'post')",
      StatsOps.didEstimate(abOrd, "arm", "1-URGENT", "pre", "post"))
    assertParity(s2, "SELECT * FROM power_analysis('ht_orders', " +
      "'o_totalprice', 'o_orderstatus', 'F', 'O')",
      StatsOps.powerAnalysis(ord, "o_orderstatus", "o_totalprice",
        "F", "O"))
    val lgLi = graft.sources.Tables.lineitem(s2, sfDir)
      .select(when(col("l_returnflag") === "R", 1.0).otherwise(0.0)
          .as("lbl"),
        col("l_discount"), col("l_quantity"))
    lgLi.createOrReplaceTempView("ht_logit")
    assertParity(s2, "SELECT * FROM logit_fit('ht_logit', 'lbl', " +
      "'l_discount', 'l_quantity', 4)",
      graft.operators.FitOps.logitFit(lgLi, "lbl",
        Seq("l_discount", "l_quantity"), 4))
    val ipwLi = graft.sources.Tables.lineitem(s2, sfDir)
      .select(when(col("l_discount") >= 0.05, 1.0).otherwise(0.0)
          .as("treat"),
        col("l_extendedprice"), col("l_quantity"), col("l_tax"))
    ipwLi.createOrReplaceTempView("ht_ipw")
    assertParity(s2, "SELECT * FROM ipw_ate('ht_ipw', 'treat', " +
      "'l_extendedprice', 'l_quantity', 'l_tax', 4)",
      graft.operators.FitOps.ipwAte(ipwLi, "treat",
        "l_extendedprice", Seq("l_quantity", "l_tax"), 4))
    val pmLi = graft.sources.Tables.lineitem(s2, sfDir)
      .select(when(col("l_discount") >= 0.05, 1.0).otherwise(0.0)
          .as("treat"),
        col("l_extendedprice"), col("l_quantity"), col("l_tax"),
        (col("l_orderkey") * 8 + col("l_linenumber")).as("uid"))
    pmLi.createOrReplaceTempView("ht_pm")
    assertParity(s2, "SELECT * FROM propensity_match('ht_pm', " +
      "'treat', 'l_extendedprice', 'uid', 'l_quantity', 'l_tax', 4)",
      graft.operators.FitOps.propensityMatch(pmLi, "treat",
        "l_extendedprice", "uid", Seq("l_quantity", "l_tax"), 4))
    val pTab = graft.sources.Tables.nation(s2, sfDir)
      .select(col("n_name").as("k"),
        ((col("n_nationkey") + 1).cast("double") / 50.0).as("p"))
    pTab.createOrReplaceTempView("ht_pvals")
    assertParity(s2, "SELECT * FROM fdr_bh('ht_pvals', 'k', 'p', " +
      "0.2)", HypothesisOps.fdrBh(pTab, "k", "p", 0.2))
    assertParity(s2, "SELECT * FROM auc('ht_orders', " +
      "'o_totalprice', 'o_orderstatus', 'F', 'O')",
      HypothesisOps.auc(ord, "o_totalprice", "o_orderstatus",
        "F", "O"))
    assertParity(s2, "SELECT * FROM pr_auc('ht_orders', " +
      "'o_totalprice', 'o_orderstatus', 'F', 'O')",
      HypothesisOps.prAuc(ord, "o_totalprice", "o_orderstatus",
        "F", "O"))
    assertParity(s2, "SELECT * FROM threshold_sweep('ht_orders', " +
      "'o_totalprice', 'o_orderstatus', 'F', 'O')",
      HypothesisOps.thresholdSweep(ord, "o_totalprice",
        "o_orderstatus", "F", "O"))
    assertParity(s2, "SELECT * FROM auc_by('ht_orders', " +
      "'o_totalprice', 'o_orderstatus', 'F', 'O', 'o_orderpriority')",
      HypothesisOps.aucBy(ord, "o_totalprice", "o_orderstatus",
        "F", "O", "o_orderpriority"))
    assertParity(s2, "SELECT * FROM auc_ci('ht_orders', " +
      "'o_totalprice', 'o_orderstatus', 'F', 'O')",
      HypothesisOps.aucCi(ord, "o_totalprice", "o_orderstatus",
        "F", "O"))
    val rkLi = graft.sources.Tables.lineitem(s2, sfDir)
      .withColumn("rel", (col("l_returnflag") === "R").cast("int"))
    rkLi.createOrReplaceTempView("ht_rank_li")
    assertParity(s2, "SELECT * FROM ranking_eval('ht_rank_li', " +
      "'l_orderkey', 'l_linenumber', 'l_extendedprice', 'rel', 3)",
      HypothesisOps.rankingEval(rkLi, "l_orderkey", "l_linenumber",
        "l_extendedprice", "rel", 3))
    assertParity(s2, "SELECT * FROM bootstrap_ci('ht_orders', " +
      "'o_orderkey', 'o_totalprice', 80)",
      StatsOps.bootstrapCiMean(ord, "o_orderkey", "o_totalprice", 80))
    val cmpOrd = graft.sources.Tables.orders(s2, sfDir)
      .withColumn("score_date",
        expr("datediff(o_orderdate, DATE '1992-01-01')"))
    cmpOrd.createOrReplaceTempView("ht_cmp")
    assertParity(s2, "SELECT * FROM auc_compare('ht_cmp', " +
      "'o_totalprice', 'score_date', 'o_orderstatus', 'F', 'O')",
      HypothesisOps.aucCompare(cmpOrd, "o_totalprice", "score_date",
        "o_orderstatus", "F", "O"))
    val fsLi = graft.sources.Tables.lineitem(s2, sfDir)
      .withColumn("lbl", col("l_returnflag") === "R")
    fsLi.createOrReplaceTempView("ht_fs_li")
    assertParity(s2, "SELECT * FROM feature_screen('ht_fs_li', " +
      "'lbl', 'l_discount l_quantity')",
      HypothesisOps.featureScreen(fsLi, "lbl",
        Seq("l_discount", "l_quantity")))
    val isoOrd = graft.sources.Tables.orders(s2, sfDir)
      .select((col("o_totalprice") / 600000.0).as("prob"),
        (col("o_orderstatus") === "F").as("label"))
      .filter(col("prob") <= 1.0)
    isoOrd.createOrReplaceTempView("ht_iso")
    assertParity(s2, "SELECT * FROM isotonic('ht_iso', 'prob', " +
      "'label')",
      graft.operators.ProfileOps.isotonicCalibration(isoOrd, "prob",
        "label"))
    val pcaEmb = graft.sources.Tables.embeddings(s2, sfDir)
    pcaEmb.createOrReplaceTempView("ht_emb")
    assertParity(s2, "SELECT * FROM embed_pca('ht_emb', " +
      "'embedding', 4)",
      graft.operators.PcaOps.pcaSummary(pcaEmb, "embedding",
        graft.operators.PcaOps.pcaFit(pcaEmb, "embedding", 4)))
    val probs = ord.select(
      (col("o_totalprice") / 600000.0).as("prob"),
      (col("o_orderstatus") === "F").as("label"))
      .filter(col("prob") <= 1.0)
    probs.createOrReplaceTempView("ht_probs")
    assertParity(s2,
      "SELECT * FROM calibration('ht_probs', 'prob', 'label', 10)",
      ProfileOps.calibration(probs, "prob", "label", 10))
    assertParity(s2,
      "SELECT * FROM brier_decomp('ht_probs', 'prob', 'label', 10)",
      ProfileOps.brierDecomp(probs, "prob", "label", 10))
    assertParity(s2, "SELECT * FROM effect_size('ht_orders', " +
      "'o_totalprice', 'o_orderstatus', 'F', 'O')",
      HypothesisOps.effectSize(ord, "o_totalprice", "o_orderstatus",
        "F", "O"))
    assertParity(s2, "SELECT * FROM nelson_aalen('ht_events', " +
      "'user_id', 'ts')",
      graft.operators.FitOps.nelsonAalen(ev, "user_id", "ts"))
    assertParity(s2, "SELECT * FROM mann_whitney('ht_orders', " +
      "'o_totalprice', 'o_orderstatus', 'F', 'O')",
      HypothesisOps.mannWhitney(ord, "o_totalprice", "o_orderstatus",
        "F", "O"))
    assertParity(s2, "SELECT * FROM kruskal_wallis('ht_orders', " +
      "'o_totalprice', 'o_orderstatus')",
      HypothesisOps.kruskalWallis(ord, "o_totalprice", "o_orderstatus"))
    assertParity(s2, "SELECT * FROM vif('ht_lineitem', " +
      "'l_quantity l_extendedprice l_discount')",
      ProfileOps.vif(li,
        Seq("l_quantity", "l_extendedprice", "l_discount")))
    val woeOrd = ord.select(col("o_orderpriority").as("lvl"),
      (col("o_orderstatus") === "F").as("lbl"))
    woeOrd.createOrReplaceTempView("ht_woe")
    assertParity(s2, "SELECT * FROM woe_iv('ht_woe', 'lvl', 'lbl')",
      ProfileOps.woeIv(woeOrd, "lvl", "lbl"))
    assertParity(s2, "SELECT * FROM jarque_bera('ht_lineitem', " +
      "'l_quantity', 'l_returnflag')",
      HypothesisOps.jarqueBera(li, "l_quantity", "l_returnflag"))
    assertParity(s2, "SELECT * FROM levene('ht_lineitem', " +
      "'l_quantity', 'l_returnflag')",
      HypothesisOps.leveneBf(li, "l_quantity", "l_returnflag"))
    assertParity(s2, "SELECT * FROM tukey_hsd('ht_orders', " +
      "'o_totalprice', 'o_orderstatus')",
      HypothesisOps.tukeyHsd(ord, "o_totalprice", "o_orderstatus"))
    assertParity(s2, "SELECT * FROM chisq_test('ht_lineitem', " +
      "'l_returnflag', 'l_linestatus')",
      StatsOps.chisqTest(li, "l_returnflag", "l_linestatus"))
    val mcOrd = ord.select((col("o_orderstatus") === "F").as("a"),
      (col("o_orderpriority") === "1-URGENT").as("b"))
    mcOrd.createOrReplaceTempView("ht_mc")
    assertParity(s2, "SELECT * FROM mcnemar('ht_mc', 'a', 'b')",
      StatsOps.mcnemar(mcOrd, "a", "b"))
    assertParity(s2, "SELECT * FROM odds_ratio('ht_mc', 'b', 'a')",
      StatsOps.oddsRatio(mcOrd, "b", "a"))
    assertParity(s2, "SELECT * FROM dist_fit('ht_lineitem', " +
      "'l_extendedprice', 'l_returnflag')",
      StatsOps.distFit(li, "l_extendedprice", "l_returnflag"))
    val msEv = ev.select(col("ts"),
      when(col("user_id") % 2 === 0, "A").otherwise("B").as("arm"),
      col("value"))
    msEv.createOrReplaceTempView("ht_ms")
    assertParity(s2, "SELECT * FROM msprt('ht_ms', 'ts', 'arm', " +
      "'value', 'A', 'B')",
      StatsOps.msprt(msEv, "ts", "arm", "value", "A", "B"))
    assertParity(s2, "SELECT * FROM evt_gumbel('ht_events', 'ts', " +
      "'value')", StatsOps.evtGumbel(ev, "ts", "value"))
    val ebOrd = ord.select(col("o_custkey").as("cust"),
      (col("o_orderstatus") === "F").as("hit"))
    ebOrd.createOrReplaceTempView("ht_eb")
    assertParity(s2, "SELECT * FROM eb_shrinkage('ht_eb', 'cust', " +
      "'hit', 3)", StatsOps.ebShrinkage(ebOrd, "cust", "hit", 3))
    assertParity(s2, "SELECT * FROM ltv_curve('ht_orders', " +
      "'o_custkey', 'o_orderdate', 'o_totalprice', 6)",
      graft.operators.FitOps.ltvCurve(ord, "o_custkey",
        "o_orderdate", "o_totalprice", 6))
    assertParity(s2, "SELECT * FROM quantile_reg('ht_lineitem', " +
      "'l_extendedprice', 'l_quantity', 0.5, 4)",
      graft.operators.FitOps.quantileReg(li, "l_extendedprice",
        "l_quantity", 0.5, 4))
    assertParity(s2, "SELECT * FROM anova('ht_orders', " +
      "'o_totalprice', 'o_orderstatus')",
      HypothesisOps.anovaF(ord, "o_totalprice", "o_orderstatus"))
    assertParity(s2, "SELECT * FROM qq('ht_orders', 'o_totalprice', " +
      "'o_orderstatus', 'F', 'O', 10)",
      HypothesisOps.qqTable(ord, "o_totalprice", "o_orderstatus",
        "F", "O", 10))
    assertParity(s2, "SELECT * FROM mutual_info('ht_orders', " +
      "'o_orderstatus', 'o_orderpriority')",
      StatsOps.mutualInfo(ord, "o_orderstatus", "o_orderpriority"))
    assertParity(s2, "SELECT * FROM cramers_v('ht_orders', " +
      "'o_orderstatus', 'o_orderpriority')",
      StatsOps.cramersV(ord, "o_orderstatus", "o_orderpriority"))
    val screens = ord.select((col("o_totalprice") > 100000.0)
      .as("big"), (col("o_orderstatus") === "F").as("done"))
    screens.createOrReplaceTempView("ht_screens")
    assertParity(s2, "SELECT * FROM kappa('ht_screens', 'big', 'done')",
      StatsOps.cohenKappa(screens, "big", "done"))
    assertParity(s2, "SELECT * FROM spearman('ht_lineitem', " +
      "'l_quantity', 'l_extendedprice')",
      ProfileOps.spearman(li, "l_quantity", "l_extendedprice"))
    assertParity(s2, "SELECT * FROM corr_matrix('ht_lineitem', " +
      "'l_quantity l_extendedprice l_discount')",
      ProfileOps.corrMatrix(li,
        Seq("l_quantity", "l_extendedprice", "l_discount")))
    assertParity(s2, "SELECT * FROM mahalanobis('ht_lineitem', " +
      "'l_orderkey', 'l_quantity l_extendedprice l_discount', 7.815)",
      ProfileOps.mahalanobisOutliers(li, "l_orderkey",
        Seq("l_quantity", "l_extendedprice", "l_discount"), 7.815))
    assertParity(s2, "SELECT * FROM spearman_matrix('ht_lineitem', " +
      "'l_quantity l_extendedprice l_discount')",
      ProfileOps.spearmanMatrix(li,
        Seq("l_quantity", "l_extendedprice", "l_discount")))
    assertParity(s2, "SELECT * FROM fd_profile('ht_part', " +
      "'p_brand->p_type p_name->p_brand')",
      ProfileOps.fdProfile(part,
        Seq("p_brand" -> "p_type", "p_name" -> "p_brand")))
    assertParity(s2, "SELECT * FROM candidate_keys('ht_orders', " +
      "'o_orderkey o_custkey o_orderstatus')",
      ProfileOps.candidateKeys(ord,
        Seq("o_orderkey", "o_custkey", "o_orderstatus")))
    assertParity(s2,
      "SELECT * FROM psi('ht_events', 'ts', 'value', 10)",
      ProfileOps.psi(ev, "ts", "value", 10))
    assertParity(s2,
      "SELECT * FROM js_divergence('ht_events', 'ts', 'value')",
      ProfileOps.jsDivergence(ev, "ts", "value"))
    assertParity(s2, "SELECT * FROM partial_corr('ht_lineitem', " +
      "'l_quantity', 'l_extendedprice', 'l_discount')",
      ProfileOps.partialCorr(li, "l_quantity", "l_extendedprice",
        "l_discount"))
    val cust = graft.sources.Tables.customer(s2, sfDir)
    val seg = ord.join(cust, col("o_custkey") === col("c_custkey"))
    seg.createOrReplaceTempView("ht_seg")
    assertParity(s2, "SELECT * FROM hhi('ht_seg', 'c_mktsegment', " +
      "'o_custkey', 'o_totalprice')",
      StatsOps.hhi(seg, "c_mktsegment", "o_custkey", "o_totalprice"))
    assertParity(s2, "SELECT * FROM iqr_outliers('ht_lineitem', " +
      "'l_returnflag', 'l_extendedprice')",
      StatsOps.iqrOutliers(li, "l_returnflag", "l_extendedprice"))
    // contract validation fires at plan-build time with the function
    // named, not as a downstream unresolved-column error
    val e = intercept[Exception] {
      s2.sql("SELECT * FROM ks_test('ht_orders', 'nope', " +
        "'o_orderstatus', 'F', 'O')").collect()
    }
    assert(e.getMessage.contains("ks_test"))
  }

  test("fit/curation/text TVFs (group_ols, theil_sen, xcorr, " +
    "kaplan_meier, cohort, interarrival, mixture_alloc, " +
    "feature_scale, target_encode, zipf_alpha) agree with the " +
    "Scala API") {
    import graft.operators.{CurationOps, FitOps, TextOps}
    val s2 = spark.newSession()
    val ord = graft.sources.Tables.orders(s2, sfDir)
    val li = graft.sources.Tables.lineitem(s2, sfDir)
    val ev = graft.sources.Tables.events(s2, sfDir)
    val docs = graft.sources.Tables.documents(s2, sfDir)
    ord.createOrReplaceTempView("fc_orders")
    li.createOrReplaceTempView("fc_lineitem")
    ev.createOrReplaceTempView("fc_events")
    docs.createOrReplaceTempView("fc_docs")
    assertParity(s2, "SELECT * FROM group_ols('fc_lineitem', " +
      "'l_returnflag', 'l_quantity', 'l_extendedprice')",
      FitOps.groupOls(li, "l_returnflag", "l_quantity",
        "l_extendedprice"))
    assertParity(s2, "SELECT * FROM ols_multi('fc_lineitem', " +
      "'l_extendedprice', 'l_quantity l_discount')",
      FitOps.olsMulti(li, "l_extendedprice",
        Seq("l_quantity", "l_discount")))
    assertParity(s2, "SELECT * FROM theil_sen('fc_orders', " +
      "'o_orderdate', 'o_totalprice')",
      FitOps.theilSen(ord, "o_orderdate", "o_totalprice"))
    assertParity(s2, "SELECT * FROM iv_wald('fc_lineitem', " +
      "'l_linenumber', 'l_quantity', 'l_extendedprice')",
      FitOps.ivWald(li, "l_linenumber", "l_quantity",
        "l_extendedprice"))
    assertParity(s2, "SELECT * FROM rdd_estimate('fc_lineitem', " +
      "'l_quantity', 'l_extendedprice', 25.0, 15.0)",
      FitOps.rddEstimate(li, "l_quantity", "l_extendedprice",
        25.0, 15.0))
    val serG = {
      import org.apache.spark.sql.functions.{avg, col, stddev_pop, to_date}
      ev.groupBy(to_date(col("ts")).as("d"))
        .agg(avg("value").as("vx"), stddev_pop("value").as("vy"))
    }
    serG.createOrReplaceTempView("fc_ser")
    assertParity(s2, "SELECT * FROM granger('fc_ser', 'd', 'vx', " +
      "'vy')", FitOps.grangerLag1(serG, "d", "vx", "vy"))
    assertParity(s2, "SELECT * FROM pacf('fc_events', 'event_type', " +
      "'ts', 'value', 4, 86400)",
      graft.operators.EventOps.pacf(ev, "event_type", "ts", "value",
        4, 86400L))
    assertParity(s2, "SELECT * FROM dickey_fuller('fc_ser', 'd', " +
      "'vx')", FitOps.dickeyFuller(serG, "d", "vx"))
    val lrT = {
      import org.apache.spark.sql.functions.{col, to_date, when => w2}
      val subj = ev.groupBy("user_id")
        .agg(org.apache.spark.sql.functions.min(to_date(col("ts")))
            .as("d0"),
          org.apache.spark.sql.functions.max(to_date(col("ts")))
            .as("d1"))
      subj.select(
        org.apache.spark.sql.functions.datediff(col("d1"), col("d0"))
          .cast("bigint").as("t"),
        (col("user_id") % 3 === 0).as("e"),
        w2(col("user_id") % 2 === 0, "x").otherwise("y").as("g"))
    }
    lrT.createOrReplaceTempView("fc_lr")
    assertParity(s2, "SELECT * FROM logrank('fc_lr', 't', 'e', " +
      "'g', 'x', 'y')", FitOps.logRank(lrT, "t", "e", "g", "x", "y"))
    assertParity(s2, "SELECT * FROM mann_kendall('fc_orders', " +
      "'o_orderdate', 'o_totalprice')",
      FitOps.mannKendall(ord, "o_orderdate", "o_totalprice"))
    assertParity(s2, "SELECT * FROM theil_sen_strided('fc_orders', " +
      "'o_orderdate', 'o_totalprice')",
      FitOps.theilSenStrided(ord, "o_orderdate", "o_totalprice"))
    assertParity(s2, "SELECT * FROM xcorr('fc_orders', " +
      "'o_orderdate', 'o_totalprice', 'fc_lineitem', 'l_shipdate', " +
      "'l_extendedprice', 5)",
      FitOps.crossCorr(ord, "o_orderdate", "o_totalprice",
        li, "l_shipdate", "l_extendedprice", 5))
    assertParity(s2, "SELECT * FROM kaplan_meier('fc_events', " +
      "'user_id', 'ts')",
      FitOps.kaplanMeier(ev, "user_id", "ts"))
    assertParity(s2, "SELECT * FROM cohort('fc_orders', " +
      "'o_custkey', 'o_orderdate')",
      FitOps.cohortRetention(ord, "o_custkey", "o_orderdate"))
    assertParity(s2, "SELECT * FROM interarrival('fc_events', " +
      "'user_id', 'ts', 'event_id', 'event_type')",
      FitOps.interarrival(ev, "user_id", "ts", "event_id",
        "event_type"))
    assertParity(s2, "SELECT * FROM mixture_alloc('fc_docs', " +
      "'source', 'text', 50000)",
      CurationOps.mixtureAllocation(docs, "source", "text", 50000L))
    assertParity(s2, "SELECT * FROM feature_scale('fc_orders', " +
      "'o_orderkey', 'o_totalprice')",
      CurationOps.featureScale(ord, "o_orderkey", "o_totalprice"))
    val splitDocs = CurationOps.hashSplit(docs, "doc_id")
    splitDocs.createOrReplaceTempView("fc_split")
    assertParity(s2, "SELECT * FROM srm_check('fc_split', 'split', " +
      s"'train:${52429.0 / 65536} val:${6553.0 / 65536} " +
      s"test:${6554.0 / 65536}')",
      CurationOps.srmCheck(splitDocs, "split",
        Seq("train" -> 52429.0 / 65536, "val" -> 6553.0 / 65536,
          "test" -> 6554.0 / 65536)))
    assertParity(s2, "SELECT * FROM rank_normalize('fc_orders', " +
      "'o_orderpriority', 'o_orderkey', 'o_totalprice')",
      CurationOps.rankNormalize(ord, "o_orderpriority", "o_orderkey",
        "o_totalprice"))
    assertParity(s2, "SELECT * FROM target_encode('fc_lineitem', " +
      "'l_returnflag', 'l_extendedprice')",
      CurationOps.targetEncode(li, "l_returnflag", "l_extendedprice"))
    assertParity(s2, "SELECT * FROM zipf_alpha('fc_docs', 'text')",
      TextOps.zipfAlpha(docs, "text"))
    assertParity(s2, "SELECT * FROM perplexity_bigram('fc_docs')",
      TextOps.bigramPerplexity(docs, "doc_id", "text"))
    val emb = graft.sources.Tables.embeddings(s2, sfDir)
    emb.createOrReplaceTempView("fc_embeddings")
    assertParity(s2, "SELECT * FROM embed_quant('fc_embeddings', " +
      "'vec_id', 'embedding')",
      graft.operators.SimilarityOps.quantReport(emb, "vec_id",
        "embedding"))
    // literal-arg validation names the function
    val e = intercept[Exception] {
      s2.sql("SELECT * FROM cohort('fc_orders', 'o_custkey', " +
        "'o_orderdate', 0)").collect()
    }
    assert(e.getMessage.contains("cohort"))
  }
}
