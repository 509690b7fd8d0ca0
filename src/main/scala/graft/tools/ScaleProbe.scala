package graft.tools

import graft.operators.DedupOps
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev scaling probe: replicate the sf0.1 corpus N× (shifted ids →
  * every document gains N−1 exact duplicates, the web-scale degenerate
  * shape the LSH pipeline is skew-proofed for) and time the dedup
  * family at each multiplier. Near-linear wall times across 1×/4×/16×
  * are the evidence that the collapse → capped-bucket → verify shape
  * holds as the corpus grows; super-linear growth would flag a stage
  * whose cost rides pair counts instead of corpus size.
  *
  *   runMain graft.tools.ScaleProbe [sfDir] [multipliers...]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val skewOnly = args.contains("--skew-only")
    val fxOnly = args.contains("--fx-only")
    val qbOnly = args.contains("--qb-only")
    val fitOnly = args.contains("--fit-only")
    val spineOnly = args.contains("--spine-only")
    val r15Only = args.contains("--r15-only")
    val r15bOnly = args.contains("--r15b-only")
    val r15cOnly = args.contains("--r15c-only")
    val pcaOnly = args.contains("--pca-only")
    val posArgs = args.toSeq.filterNot(_.startsWith("--"))
    val sfDir = posArgs.headOption.getOrElse("/root/testdata/sf0.1")
    val mults = if (posArgs.length > 1) posArgs.drop(1).map(_.toInt)
      else Seq(1, 4, 16)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "65536")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = Tables.documents(spark, sfDir).select("doc_id", "text")
    val n0 = base.count() // also warms the scan

    def corpusTimes(mult: Int): (Long, Double, Double, Double) = {
      val corpus = (0 until mult)
        .map(i => base.select((col("doc_id") + lit(i.toLong * 1000000L))
          .as("doc_id"), col("text")))
        .reduce(_ unionByName _)
        .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
        .localCheckpoint()
      val rows = corpus.count()
      def time(f: => Long): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val tPairs = time(DedupOps
        .minhashPairsUnordered(corpus, "doc_id", "text", 0.5).count())
      val tClusters = time(DedupOps.nearDupClusters(
        DedupOps.nearDupEdges(corpus, "doc_id", "text", 0.5),
        corpus.select("doc_id"), "doc_id").count())
      val tSimhash = time(DedupOps.simhash(corpus, "doc_id", "text").count())
      (rows, tPairs, tClusters, tSimhash)
    }

    println(f"[scale] base corpus: $n0 docs ($sfDir)")
    if (!skewOnly && !fxOnly && !qbOnly && !fitOnly && !spineOnly && !r15Only && !r15bOnly && !r15cOnly && !pcaOnly) {
    println("[scale] mult    docs   pairs_s  clusters_s  simhash_s")
    mults.foreach { m =>
      val (rows, tp, tc, tsh) = corpusTimes(m)
      println(f"[scale] ${m}%4d  ${rows}%6d  $tp%7.2f  $tc%9.2f  $tsh%8.2f")
    }

    }

    // kNN-join shuffle-bytes probe: the dot-product work is inherently
    // O(n²), but with the pre-shuffle TopKAggregator trim the EXCHANGE
    // must grow ~linearly in n (k·B rows per source + the B-fold block
    // replication), not quadratically — the r03 window shape shuffled
    // the full pair set. Sub-quadratic byte growth at 2×/4× is the
    // evidence the trim holds.
    val listener = new ShuffleBytesListener
    spark.sparkContext.addSparkListener(listener)
    val embBase = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding")
    if (!skewOnly && !fxOnly && !qbOnly && !fitOnly && !spineOnly && !r15Only && !r15bOnly && !r15cOnly && !pcaOnly) {
    println("[scale] knn:  mult    vecs   wall_s   shuffle_mb")
    Seq(1, 2, 4).foreach { m =>
      val vecs = (0 until m)
        .map(i => embBase.select(
          (col("vec_id") + lit(i.toLong * 1000000L)).as("vec_id"),
          col("embedding")))
        .reduce(_ unionByName _)
        .repartition(spark.sparkContext.defaultParallelism, col("vec_id"))
        .localCheckpoint()
      val n = vecs.count()
      listener.reset()
      val t0 = System.nanoTime()
      graft.operators.SimilarityOps
        .knnJoin(vecs, "vec_id", "embedding", k = 5).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(2000) // listener bus drains asynchronously
      println(f"[scale] knn:  $m%4d  $n%6d  $wall%7.2f  ${listener.bytes / 1e6}%10.1f")
    }

    // IVF batch-join probe: a 10% query split joins the inverted file
    // of the replicated corpus. Stage 1 touches only the 48-byte
    // (vec_id, cell, sketch) projection and stage 2 rescores a CONSTANT
    // rescorePerQuery rows per probe, so shuffle bytes must grow with
    // (queries × nprobe + corpus sketch rows) — linear — never with the
    // query×corpus product.
    println("[scale] ivfknn: mult   vecs   wall_s   shuffle_mb")
    Seq(1, 2, 4).foreach { m =>
      val vecs = (0 until m)
        .map(i => embBase.select(
          (col("vec_id") + lit(i.toLong * 1000000L)).as("vec_id"),
          col("embedding")))
        .reduce(_ unionByName _)
        .repartition(spark.sparkContext.defaultParallelism, col("vec_id"))
        .localCheckpoint()
      val n = vecs.count()
      val idx = graft.operators.IvfIndex.build(vecs, "vec_id", "embedding")
      idx.cells.count() // build outside the timed window
      val queries = vecs.filter(col("vec_id") % 10 === 0)
      listener.reset()
      val t0 = System.nanoTime()
      idx.knnJoinWith(queries, "vec_id", "embedding", k = 5).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(2000)
      println(f"[scale] ivfknn: $m%4d  $n%6d  $wall%7.2f  ${listener.bytes / 1e6}%10.1f")
      idx.close()
    }

    // Substring-dedup shuffle probe: the k-gram position table is the
    // only wide data — its count aggregate and dup-join shuffles must
    // grow linearly with corpus tokens (the suffix-array sort becomes a
    // hash shuffle), never with the pair count. Replication makes EVERY
    // gram duplicated (worst-case dup-join fanout), so linear bytes at
    // 2×/4× is the adversarial evidence.
    println("[scale] substr: mult   docs   mine_s  mine_mb   scrub_s  scrub_mb")
    Seq(1, 2, 4).foreach { m =>
      val corpus = (0 until m)
        .map(i => base.select((col("doc_id") + lit(i.toLong * 1000000L))
          .as("doc_id"), col("text")))
        .reduce(_ unionByName _)
        .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
        .localCheckpoint()
      val n = corpus.count()
      listener.reset()
      var t0 = System.nanoTime()
      DedupOps.duplicatePassages(corpus, "doc_id", "text").count()
      val wallMine = (System.nanoTime() - t0) / 1e9
      Thread.sleep(2000) // listener bus drains asynchronously
      val mbMine = listener.bytes / 1e6
      // the scrub adds a token-position anti-join + per-doc reassembly
      // on top of the mining shape — its shuffle must stay linear too
      listener.reset()
      t0 = System.nanoTime()
      DedupOps.scrubDuplicatePassages(corpus, "doc_id", "text").count()
      val wallScrub = (System.nanoTime() - t0) / 1e9
      Thread.sleep(2000)
      val mbScrub = listener.bytes / 1e6
      println(f"[scale] substr: $m%4d  $n%6d  $wallMine%6.2f  $mbMine%7.1f" +
        f"  $wallScrub%7.2f  $mbScrub%8.1f")
    }

    // Round-10 curation probe: corpus shuffle (one md5 map + per-shard
    // windows), token-budget sampling (two-level prefix sum — the
    // 256-row offset table is constant-size, so bytes must track corpus
    // rows), and semantic dedup (Lloyd build + within-cell pair join —
    // wall may grow super-linearly with REPLICATED corpora because
    // every vector gains m−1 exact duplicates that co-cluster by
    // construction, the adversarial worst case for any clustered
    // pair-miner; shuffle bytes must still track corpus size, never the
    // full pair count).
    println("[scale] cur10: mult   docs  shuf_s  shuf_mb  budget_s  budget_mb  sem_s  sem_mb")
    Seq(1, 2, 4).foreach { m =>
      val corpus = (0 until m)
        .map(i => base.select((col("doc_id") + lit(i.toLong * 1000000L))
          .as("doc_id"), col("text")))
        .reduce(_ unionByName _)
        .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
        .localCheckpoint()
      val n = corpus.count()
      val vecs = (0 until m)
        .map(i => embBase.select(
          (col("vec_id") + lit(i.toLong * 1000000L)).as("vec_id"),
          col("embedding")))
        .reduce(_ unionByName _)
        .repartition(spark.sparkContext.defaultParallelism, col("vec_id"))
        .localCheckpoint()
      vecs.count()
      listener.reset()
      var t0 = System.nanoTime()
      // consume `pos` (not a bare count) so Catalyst cannot prune the
      // window — a count() of the unreferenced window column measured a
      // windowless plan (0 shuffle bytes)
      graft.operators.CurationOps.corpusShuffle(corpus, "doc_id", 64)
        .agg(sum(col("pos"))).head()
      val wallShuf = (System.nanoTime() - t0) / 1e9
      Thread.sleep(2000)
      val mbShuf = listener.bytes / 1e6
      listener.reset()
      t0 = System.nanoTime()
      graft.operators.CurationOps.sampleTokenBudget(corpus, "doc_id",
        "text", Long.MaxValue / 4).count()
      val wallBud = (System.nanoTime() - t0) / 1e9
      Thread.sleep(2000)
      val mbBud = listener.bytes / 1e6
      listener.reset()
      t0 = System.nanoTime()
      DedupOps.semanticDedup(vecs, "vec_id", "embedding", 0.45).count()
      val wallSem = (System.nanoTime() - t0) / 1e9
      Thread.sleep(2000)
      val mbSem = listener.bytes / 1e6
      println(f"[scale] cur10: $m%4d  $n%5d  $wallShuf%6.2f  $mbShuf%7.1f" +
        f"  $wallBud%8.2f  $mbBud%9.1f  $wallSem%5.2f  $mbSem%6.1f")
    }

    // Round-11 retrieval probe: BM25's explode is filtered to the query
    // terms BEFORE the tf aggregate, so shuffle bytes must track the
    // number of matching docs (≤|terms| rows per doc), never token
    // counts; RRF fuses two BOUNDED top-50 lists, so its extra bytes
    // over the underlying retrievers must stay ~flat as the corpus
    // replicates (only the retriever scans grow).
    println("[scale] ret11: mult   docs  bm25_s  bm25_mb  rrf_s  rrf_mb")
    Seq(1, 2, 4).foreach { m =>
      val corpus = (0 until m)
        .map(i => base.select((col("doc_id") + lit(i.toLong * 1000000L))
          .as("doc_id"), col("text")))
        .reduce(_ unionByName _)
        .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
        .localCheckpoint()
      val n = corpus.count()
      val vecs = (0 until m)
        .map(i => embBase.select(
          (col("vec_id") + lit(i.toLong * 1000000L)).as("vec_id"),
          col("embedding")))
        .reduce(_ unionByName _)
        .repartition(spark.sparkContext.defaultParallelism, col("vec_id"))
        .localCheckpoint()
      vecs.count()
      val terms = Seq("join", "filter", "scan")
      listener.reset()
      var t0 = System.nanoTime()
      graft.operators.TextOps.bm25(corpus, "doc_id", "text", terms).count()
      val wallBm = (System.nanoTime() - t0) / 1e9
      Thread.sleep(2000)
      val mbBm = listener.bytes / 1e6
      listener.reset()
      t0 = System.nanoTime()
      locally {
        import org.apache.spark.sql.expressions.Window
        import graft.operators.{BoundedWindow, SimilarityOps, TextOps}
        def rank(df: DataFrame, idCol: String, order: Seq[org.apache.spark.sql.Column]) =
          df.select(col(idCol), row_number().over(Window
            .partitionBy(BoundedWindow.key(col(idCol)))
            .orderBy(order: _*)).as("rn"))
        val bm = rank(TextOps.bm25(corpus, "doc_id", "text", terms).limit(50),
          "doc_id", Seq(col("bm25").desc, col("doc_id")))
        val cs = rank(SimilarityOps.bruteForceTopK(vecs, "vec_id",
            "embedding", probeId = 0L, k = 50)
            .withColumnRenamed("vec_id", "doc_id"),
          "doc_id", Seq(col("cos_sim").desc, col("doc_id")))
        SimilarityOps.rrfFuse(Seq(bm, cs), "doc_id").count()
      }
      val wallRrf = (System.nanoTime() - t0) / 1e9
      Thread.sleep(2000)
      val mbRrf = listener.bytes / 1e6
      println(f"[scale] ret11: $m%4d  $n%5d  $wallBm%6.2f  $mbBm%7.1f" +
        f"  $wallRrf%5.2f  $mbRrf%6.1f")
    }

    // Round-11 event/warehouse probe: anomaly's only exchanges are the
    // |types|-row stats aggregate; retention shuffles user-keyed
    // aggregates; scd2 shuffles once per key partition; merge is one
    // full-outer equi-join. All four must grow shuffle bytes ~linearly
    // in the corpus — replication shifts user/cust keys so key
    // cardinality scales with the data, the adversarial direction for
    // the grouped shapes.
    println("[scale] evt11: mult  events  anom_s/mb  ret_s/mb  " +
      "scd2_s/mb  merge_s/mb")
    locally {
      val evBase = Tables.events(spark, sfDir)
        .select("event_id", "user_id", "event_type", "ts", "value")
      val ordBase = Tables.orders(spark, sfDir)
        .select("o_orderkey", "o_custkey", "o_orderdate",
          "o_orderpriority", "o_totalprice")
      Seq(1, 2, 4).foreach { m =>
        val ev = (0 until m)
          .map(i => evBase.select(
            (col("event_id") + lit(i.toLong * 10000000L)).as("event_id"),
            (col("user_id") + lit(i.toLong * 1000000L)).as("user_id"),
            col("event_type"), col("ts"), col("value")))
          .reduce(_ unionByName _)
          .repartition(spark.sparkContext.defaultParallelism,
            col("event_id"))
          .localCheckpoint()
        val n = ev.count()
        val ord = (0 until m)
          .map(i => ordBase.select(
            (col("o_orderkey") + lit(i.toLong * 10000000L))
              .as("o_orderkey"),
            (col("o_custkey") + lit(i.toLong * 1000000L)).as("o_custkey"),
            col("o_orderdate"), col("o_orderpriority"),
            col("o_totalprice")))
          .reduce(_ unionByName _)
          .repartition(spark.sparkContext.defaultParallelism,
            col("o_orderkey"))
          .localCheckpoint()
        ord.count()
        def measure(f: => Long): (Double, Double) = {
          listener.reset()
          val t0 = System.nanoTime()
          f
          val w = (System.nanoTime() - t0) / 1e9
          Thread.sleep(2000)
          (w, listener.bytes / 1e6)
        }
        val (wA, bA) = measure(graft.operators.EventOps
          .anomaly(ev, "event_type", "event_id", "value").count())
        val (wR, bR) = measure(graft.operators.EventOps
          .retention(ev, "user_id", "ts").count())
        val (wS, bS) = measure(graft.operators.RelationalOps
          .scd2Build(ord, "o_custkey", "o_orderpriority", "o_orderdate",
            "o_orderkey").count())
        val (wM, bM) = measure {
          val b = ord.select("o_orderkey", "o_totalprice")
          graft.operators.RelationalOps.mergeUpsert(
            b, b.filter(col("o_orderkey") % 7 === 0), "o_orderkey").count()
        }
        println(f"[scale] evt11: $m%4d  $n%6d  $wA%4.2f/$bA%5.1f" +
          f"  $wR%4.2f/$bR%5.1f  $wS%4.2f/$bS%5.1f  $wM%4.2f/$bM%5.1f")
      }
    }

    // Round-12 probe: the new operator families' shuffle discipline
    // under replication. resample's exchanges are the per-(group,
    // bucket) aggregate + the spine join (grid rows ≪ events);
    // perplexity shuffles the token counts ONCE and broadcasts the
    // bounded vocab (bytes track token volume, never vocab × corpus);
    // pagerank shuffles each sweep's contributions (≈ iterations ×
    // |E|-linear); table_checksum is one map-side-combined aggregate
    // (bytes ≈ |groups|-tiny). Replication shifts keys, so group/node
    // cardinality scales adversarially with the data.
    println("[scale] r12: mult  rows  resamp_s/mb  perp_s/mb  " +
      "pr_s/mb  cksum_s/mb")
    locally {
      val evBase = Tables.events(spark, sfDir)
        .select("event_id", "user_id", "event_type", "ts", "value")
      val docBase = Tables.documents(spark, sfDir)
        .select("doc_id", "text")
      Seq(1, 2, 4).foreach { m =>
        val ev = (0 until m)
          .map(i => evBase.select(
            (col("event_id") + lit(i.toLong * 10000000L)).as("event_id"),
            col("user_id"),
            concat(col("event_type"), lit("_" + i)).as("event_type"),
            col("ts"), col("value")))
          .reduce(_ unionByName _)
          .repartition(spark.sparkContext.defaultParallelism,
            col("event_id"))
          .localCheckpoint()
        val n = ev.count()
        val docs = (0 until m)
          .map(i => docBase.select(
            (col("doc_id") + lit(i.toLong * 1000000L)).as("doc_id"),
            col("text")))
          .reduce(_ unionByName _)
          .repartition(spark.sparkContext.defaultParallelism,
            col("doc_id"))
          .localCheckpoint()
        docs.count()
        def measure(f: => Long): (Double, Double) = {
          listener.reset()
          val t0 = System.nanoTime()
          f
          val w = (System.nanoTime() - t0) / 1e9
          Thread.sleep(2000)
          (w, listener.bytes / 1e6)
        }
        val (wRs, bRs) = measure(graft.operators.EventOps
          .resample(ev, "event_type", "ts", "value").count())
        val (wP, bP) = measure(graft.operators.TextOps
          .unigramPerplexity(docs, "doc_id", "text").count())
        val (wPr, bPr) = measure {
          val e0 = ev.select(
            concat(lit("u"), col("user_id").cast("string")).as("src"),
            col("event_type").as("dst")).distinct()
          val edges = e0.union(
            e0.select(col("dst").as("src"), col("src").as("dst")))
          graft.operators.GraphOps.pageRank(edges, 3).count()
        }
        val (wC, bC) = measure(graft.operators.RelationalOps
          .tableChecksum(ev,
            Seq(col("event_id"), col("user_id"),
              col("value").cast("decimal(18,2)")),
            Seq("event_type")).count())
        println(f"[scale] r12: $m%4d  $n%6d  $wRs%4.2f/$bRs%5.1f" +
          f"  $wP%4.2f/$bP%5.1f  $wPr%4.2f/$bPr%5.1f  $wC%4.2f/$bC%5.1f")
      }
    }

    // Affinity-tier probe (round 12): cooccur's pair stream is
    // map-side-combined into a vocab-bounded pair table, so shuffle
    // bytes should stay ~FLAT as the corpus replicates (fixed vocab =
    // fixed distinct-pair cardinality); basket rules shuffle the
    // capped per-basket pair stream (linear in baskets); ewma shuffles
    // each series once for its partitioned window (linear); triangles
    // ride the support-filtered edge set, which DENSIFIES under
    // replication (counts multiply, more pairs clear the floor) — its
    // growth is data densification, not an algorithmic blowup, and
    // the wedge fan-out stays degree-orientation-bounded.
    println("[scale] aff12: mult  docs  pmi_s/mb  rules_s/mb  " +
      "tri_s/mb(edges)  ewma_s/mb")
    locally {
      val docBase = Tables.documents(spark, sfDir)
        .select("doc_id", "text")
      val liBase = Tables.lineitem(spark, sfDir)
        .select("l_orderkey", "l_partkey")
      val evBase = Tables.events(spark, sfDir)
        .select("event_id", "user_id", "ts", "value")
      Seq(1, 2, 4).foreach { m =>
        val docs = (0 until m)
          .map(i => docBase.select(
            (col("doc_id") + lit(i.toLong * 1000000L)).as("doc_id"),
            col("text")))
          .reduce(_ unionByName _)
          .repartition(spark.sparkContext.defaultParallelism,
            col("doc_id"))
          .localCheckpoint()
        val nd = docs.count()
        // orderkeys shift, partkeys stay: the hot-item adversarial
        // case — every item's basket membership grows m×
        val li = (0 until m)
          .map(i => liBase.select(
            (col("l_orderkey") + lit(i.toLong * 10000000L))
              .as("l_orderkey"), col("l_partkey")))
          .reduce(_ unionByName _)
          .repartition(spark.sparkContext.defaultParallelism,
            col("l_orderkey"))
          .localCheckpoint()
        li.count()
        val ev = (0 until m)
          .map(i => evBase.select(
            (col("event_id") + lit(i.toLong * 10000000L)).as("event_id"),
            col("user_id"), col("ts"), col("value")))
          .reduce(_ unionByName _)
          .repartition(spark.sparkContext.defaultParallelism,
            col("event_id"))
          .localCheckpoint()
        ev.count()
        def measure(f: => Long): (Double, Double) = {
          listener.reset()
          val t0 = System.nanoTime()
          f
          val w = (System.nanoTime() - t0) / 1e9
          Thread.sleep(2000)
          (w, listener.bytes / 1e6)
        }
        val (wPm, bPm) = measure(graft.operators.AffinityOps
          .cooccurPmi(docs, "text").count())
        val (wBr, bBr) = measure(graft.operators.AffinityOps
          .basketRules(li, "l_orderkey", "l_partkey").count())
        var nEdges = 0L
        val (wTr, bTr) = measure {
          val e = graft.operators.AffinityOps
            .basketPairs(li, "l_orderkey", "l_partkey")
            .filter(col("n_pair") >= 2)
            .select(col("item1").as("src"), col("item2").as("dst"))
            .localCheckpoint()
          nEdges = e.count()
          graft.operators.GraphOps.triangles(e).count()
        }
        val (wEw, bEw) = measure(graft.operators.EventOps
          .ewma(ev, "user_id", "ts", "event_id", "value").count())
        println(f"[scale] aff12: $m%4d  $nd%6d  $wPm%4.2f/$bPm%5.1f" +
          f"  $wBr%4.2f/$bBr%5.1f  $wTr%4.2f/$bTr%6.1f($nEdges)" +
          f"  $wEw%4.2f/$bEw%5.1f")
      }
    }

    // Geo / reconciliation / tokenizer probe (round 12 additions):
    // radiusJoin's left side replicates m× against a FIXED right side,
    // so candidate pairs, output and shuffle must all grow ~linearly
    // (the 3×3 cell fan-out is a constant ×9, never data-dependent);
    // tableDiff is one full-outer equi-join — linear; wordpiece encode
    // is a narrow codegen'd map whose piece-count aggregate is
    // VOCAB-bounded after map-side combine, so its shuffle should stay
    // ~FLAT as the corpus replicates (the cooccurPmi story).
    println("[scale] geo12: mult  rows  radius_s/mb(pairs)  " +
      "diff_s/mb  wp_s/mb")
    locally {
      val custBase = Tables.customer(spark, sfDir)
        .select(col("c_custkey"),
          graft.operators.GeoOps.syntheticLat(col("c_custkey"))
            .as("lat"),
          graft.operators.GeoOps.syntheticLon(col("c_custkey"))
            .as("lon"))
      val supp = Tables.supplier(spark, sfDir)
        .select(col("s_suppkey"),
          graft.operators.GeoOps.syntheticLat(col("s_suppkey"))
            .as("lat"),
          graft.operators.GeoOps.syntheticLon(col("s_suppkey"))
            .as("lon"))
        .localCheckpoint()
      supp.count()
      val ordBase = Tables.orders(spark, sfDir)
        .select("o_orderkey", "o_custkey", "o_orderstatus",
          "o_totalprice")
      val docBase = Tables.documents(spark, sfDir)
        .select("doc_id", "text")
      val wpVocab = graft.functions.WordpieceOps.trainVocab(
        docBase, "text", vocabSize = 2048)
      Seq(1, 2, 4).foreach { m =>
        val cust = (0 until m)
          .map(i => custBase.select(
            (col("c_custkey") + lit(i.toLong * 10000000L))
              .as("c_custkey"),
            // jitter replicas so cell occupancy, not dedup, grows
            (col("lat") + lit(i * 0.01)).as("lat"), col("lon")))
          .reduce(_ unionByName _)
          .repartition(spark.sparkContext.defaultParallelism,
            col("c_custkey"))
          .localCheckpoint()
        val nc = cust.count()
        val ord = (0 until m)
          .map(i => ordBase.select(
            (col("o_orderkey") + lit(i.toLong * 10000000L))
              .as("o_orderkey"), col("o_custkey"),
            col("o_orderstatus"), col("o_totalprice")))
          .reduce(_ unionByName _)
          .repartition(spark.sparkContext.defaultParallelism,
            col("o_orderkey"))
          .localCheckpoint()
        ord.count()
        val docs = (0 until m)
          .map(i => docBase.select(
            (col("doc_id") + lit(i.toLong * 1000000L)).as("doc_id"),
            col("text")))
          .reduce(_ unionByName _)
          .repartition(spark.sparkContext.defaultParallelism,
            col("doc_id"))
          .localCheckpoint()
        docs.count()
        def measure(f: => Long): (Double, Double) = {
          listener.reset()
          val t0 = System.nanoTime()
          f
          val w = (System.nanoTime() - t0) / 1e9
          Thread.sleep(2000)
          (w, listener.bytes / 1e6)
        }
        var nPairs = 0L
        val (wGj, bGj) = measure {
          nPairs = graft.operators.GeoOps.radiusJoin(cust, supp, 500.0)
            .count()
          nPairs
        }
        val (wDf, bDf) = measure {
          val next = ord.filter(col("o_orderkey") % 1000 =!= 7)
            .withColumn("o_totalprice",
              when(col("o_orderkey") % 100 === 5,
                col("o_totalprice") + 1.0)
                .otherwise(col("o_totalprice")))
          graft.operators.RelationalOps.tableDiff(
            ord.filter(col("o_orderkey") % 1000 =!= 13), next,
            "o_orderkey").count()
        }
        val (wWp, bWp) = measure {
          docs.select(explode(
              graft.functions.WordpieceOps.wordpieceEncode(
                spark, lower(col("text")), wpVocab)).as("piece"))
            .groupBy("piece").agg(count(lit(1)).as("n"))
            .count()
        }
        println(f"[scale] geo12: $m%4d  $nc%6d" +
          f"  $wGj%4.2f/$bGj%5.1f($nPairs)" +
          f"  $wDf%4.2f/$bDf%5.1f  $wWp%4.2f/$bWp%5.1f")
      }
    }
    }

    if (!skewOnly && !qbOnly && !fitOnly && !spineOnly && !r15Only && !r15bOnly && !r15cOnly && !pcaOnly) {
    // Round-12 diagnostics/feature probe: trailingFeatures' only
    // exchange is the user-keyed window shuffle (linear in events —
    // key cardinality scales with the replication); sessionize is the
    // same user-keyed shape plus the session rollup; changepoint and
    // seasonality fold to |types|·|hours| / |types|·24 rows map-side,
    // so their exchanges must stay FLAT as events grow; keySkew and
    // joinSizeEstimate shuffle only per-key count tables.
    println("[scale] fx12: mult  events  trail_s/mb  sess_s/mb  " +
      "cp_s/mb  seas_s/mb  skew_s/mb  jsz_s/mb")
    locally {
      val evBase = Tables.events(spark, sfDir)
        .select("event_id", "user_id", "event_type", "ts", "value")
      val liBase = Tables.lineitem(spark, sfDir)
        .select("l_orderkey", "l_partkey")
      Seq(1, 2, 4).foreach { m =>
        val ev = (0 until m)
          .map(i => evBase.select(
            (col("event_id") + lit(i.toLong * 10000000L)).as("event_id"),
            (col("user_id") + lit(i.toLong * 1000000L)).as("user_id"),
            col("event_type"), col("ts"), col("value")))
          .reduce(_ unionByName _)
          .repartition(spark.sparkContext.defaultParallelism,
            col("event_id"))
          .localCheckpoint()
        val n = ev.count()
        val li = (0 until m)
          .map(i => liBase.select(
            (col("l_orderkey") + lit(i.toLong * 10000000L))
              .as("l_orderkey"),
            col("l_partkey")))
          .reduce(_ unionByName _)
          .repartition(spark.sparkContext.defaultParallelism,
            col("l_orderkey"))
          .localCheckpoint()
        li.count()
        def measure(f: => Long): (Double, Double) = {
          listener.reset()
          val t0 = System.nanoTime()
          f
          val w = (System.nanoTime() - t0) / 1e9
          Thread.sleep(2000)
          (w, listener.bytes / 1e6)
        }
        // aggregate OVER a feature column — a bare count() lets
        // ColumnPruning drop the unused window expressions and the
        // whole user-keyed exchange with them (measured 0.0 MB)
        val (wT, bT) = measure(graft.operators.EventOps
          .trailingFeatures(ev, "user_id", "ts", "event_id",
            "event_type", "value", "purchase")
          .agg(sum("n_7d")).head.getLong(0))
        val (wSe, bSe) = measure(graft.operators.EventOps
          .sessionize(ev, "user_id", "ts", "event_id").count())
        val (wC, bC) = measure(graft.operators.EventOps
          .changepoint(ev, "event_type", "ts").count())
        val (wSn, bSn) = measure(graft.operators.EventOps
          .seasonality(ev, "event_type", "ts").count())
        val (wK, bK) = measure(graft.operators.StatsOps
          .keySkew(li, "l_partkey").count())
        val (wJ, bJ) = measure(graft.operators.StatsOps
          .joinSizeEstimate(li, li, "l_partkey").count())
        println(f"[scale] fx12: $m%4d  $n%6d  $wT%4.2f/$bT%5.1f" +
          f"  $wSe%4.2f/$bSe%5.1f  $wC%4.2f/$bC%5.1f" +
          f"  $wSn%4.2f/$bSn%5.1f  $wK%4.2f/$bK%5.1f  $wJ%4.2f/$bJ%5.1f")
      }
    }
    }

    // Round-13 probe: quantileBins cut cost under VALUE-CARDINALITY
    // scaling at fixed row count. The r12 shape folded per distinct
    // value first — a full shuffle that grows with cardinality (the
    // residual BASELINE.md priced); the r13 shape buckets raw rows
    // into a 1024-key map-side-combined fold and only folds distinct
    // values inside the ≤9 crossing buckets, so cut-stage shuffle
    // bytes and wall must stay ~FLAT from 10³ distinct to
    // near-unique while the answer stays integer-exact.
    if (qbOnly || (!skewOnly && !fxOnly && !fitOnly && !spineOnly && !r15Only && !r15bOnly && !r15cOnly && !pcaOnly)) {
      println("[scale] qb13: card  rows  bins_s/mb")
      val n = 6000000L
      // absorb codegen/JIT/AQE compile outside the timed rows — a
      // small warmup leaves ~5 s of first-run overhead (size-dependent
      // plan variants), so warm at full size
      graft.operators.StatsOps.quantileBins(
        spark.range(n).select((col("id").cast("double") / 3.0)
          .as("v")), "v").count()
      Seq(1000L, 100000L, 0L).foreach { card =>
        val v = if (card == 0L) col("id").cast("double") / 100.0
          else pmod(xxhash64(col("id")), lit(card)).cast("double") / 7.0
        val df = spark.range(n).select(v.as("v"))
          .repartition(spark.sparkContext.defaultParallelism)
          .localCheckpoint()
        df.count()
        listener.reset()
        val t0 = System.nanoTime()
        val out = graft.operators.StatsOps.quantileBins(df, "v")
          .agg(sum("n")).head.getLong(0)
        val w = (System.nanoTime() - t0) / 1e9
        Thread.sleep(2000)
        require(out == n, s"bins must tile all $n rows; got $out")
        val label = if (card == 0L) "unique" else card.toString
        println(f"[scale] qb13: $label%7s  $n%8d  $w%5.2f/" +
          f"${listener.bytes / 1e6}%7.1f")
      }
    }

    // ft13: the hypothesis tier's two-level ECDF spine under ROW
    // scaling (duplicated values -> the distinct-value table, and so
    // the windows and the shuffle beyond the map-side fold, stay
    // FIXED while rows grow), and Theil-Sen under SERIES-LENGTH
    // scaling (the pair space is quadratic in days by design -- the
    // probe prices it so the growth is a recorded fact, not a
    // surprise).
    if (fitOnly || (!skewOnly && !fxOnly && !qbOnly && !spineOnly && !r15Only && !r15bOnly && !r15cOnly && !pcaOnly)) {
      import graft.operators.{FitOps, HypothesisOps}
      val ordBase = Tables.orders(spark, sfDir)
        .select("o_orderstatus", "o_totalprice")
      HypothesisOps.ksTest(ordBase, "o_totalprice", "o_orderstatus",
        "F", "O").collect() // warm
      println("[scale] ft13: mult    rows    ks_s/mb    mwu_s/mb")
      Seq(1, 2, 4).foreach { m =>
        val df = (0 until m).map(_ => ordBase).reduce(_ unionByName _)
          .repartition(spark.sparkContext.defaultParallelism)
          .localCheckpoint()
        val rows = df.count()
        listener.reset()
        var t0 = System.nanoTime()
        HypothesisOps.ksTest(df, "o_totalprice", "o_orderstatus",
          "F", "O").collect()
        val wKs = (System.nanoTime() - t0) / 1e9
        Thread.sleep(1500)
        val bKs = listener.bytes / 1e6
        listener.reset()
        t0 = System.nanoTime()
        HypothesisOps.mannWhitney(df, "o_totalprice", "o_orderstatus",
          "F", "O").collect()
        val wMw = (System.nanoTime() - t0) / 1e9
        Thread.sleep(1500)
        println(f"[scale] ft13: ${m}%4d  ${rows}%7d  $wKs%5.2f/" +
          f"$bKs%5.1f  $wMw%5.2f/${listener.bytes / 1e6}%5.1f")
      }
      println("[scale] ft13: days   wall_s  shuffle_mb  (theil_sen)")
      Seq(2400, 4800, 9600).foreach { days =>
        val series = spark.range(days).select(
          date_add(to_date(lit("1970-01-01")), col("id").cast("int"))
            .as("d"),
          (pmod(xxhash64(col("id")), lit(1000)).cast("double")
            + lit(100.0)).as("v"))
          .localCheckpoint()
        series.count()
        listener.reset()
        val t0 = System.nanoTime()
        FitOps.theilSen(series, "d", "v").collect()
        val w = (System.nanoTime() - t0) / 1e9
        Thread.sleep(1500)
        println(f"[scale] ft13: $days%5d  $w%6.2f  " +
          f"${listener.bytes / 1e6}%9.1f")
      }
      // sp14b: the strided variant under the SAME series-length sweep
      // must grow ~linearly (pair budget n·15), where the exact
      // operator above grows quadratically by design
      println("[scale] sp14b: days   wall_s  shuffle_mb  (theil_sen_strided)")
      Seq(2400, 4800, 9600).foreach { days =>
        val series = spark.range(days).select(
          date_add(to_date(lit("1970-01-01")), col("id").cast("int"))
            .as("d"),
          (pmod(xxhash64(col("id")), lit(1000)).cast("double")
            + lit(100.0)).as("v"))
          .localCheckpoint()
        series.count()
        listener.reset()
        val t0 = System.nanoTime()
        FitOps.theilSenStrided(series, "d", "v").collect()
        val w = (System.nanoTime() - t0) / 1e9
        Thread.sleep(1500)
        println(f"[scale] sp14b: $days%5d  $w%6.2f  " +
          f"${listener.bytes / 1e6}%9.1f")
      }
    }

    // sp14c: the round-14 wide-aggregate ops under ROW scaling.
    // ols_multi / t_test / partial_corr are single map-side-combined
    // aggregates — shuffle bytes must stay ~FLAT as rows grow;
    // spearman_matrix shuffles the distinct-value rank tables and the
    // rank joins — bytes may grow with distinct values but never with
    // rows² (duplicated values keep the rank tables FIXED here).
    if (spineOnly || (!skewOnly && !fxOnly && !qbOnly && !fitOnly && !r15Only && !r15bOnly && !r15cOnly && !pcaOnly)) {
      import graft.operators.{FitOps, HypothesisOps, ProfileOps}
      val liBase = Tables.lineitem(spark, sfDir)
        .select("l_orderkey", "l_quantity", "l_extendedprice",
          "l_discount")
      println("[scale] sp14c: mult    rows   ols_s/mb   spm_s/mb   pc_s/mb")
      Seq(1, 2, 4).foreach { m =>
        val li = (0 until m)
          .map(i => liBase.select(
            (col("l_orderkey") + lit(i.toLong * 100000000L))
              .as("l_orderkey"),
            col("l_quantity"), col("l_extendedprice"),
            col("l_discount")))
          .reduce(_ unionByName _)
          .repartition(spark.sparkContext.defaultParallelism)
          .localCheckpoint()
        val rows = li.count()
        def measure(f: => Long): (Double, Double) = {
          listener.reset()
          val t0 = System.nanoTime()
          f
          val w = (System.nanoTime() - t0) / 1e9
          Thread.sleep(1500)
          (w, listener.bytes / 1e6)
        }
        val (wO, bO) = measure(FitOps.olsMulti(li, "l_extendedprice",
          Seq("l_quantity", "l_discount")).count())
        val (wS, bS) = measure(ProfileOps.spearmanMatrix(li,
          Seq("l_quantity", "l_extendedprice", "l_discount")).count())
        val (wP, bP) = measure(ProfileOps.partialCorr(li, "l_quantity",
          "l_extendedprice", "l_discount").count())
        println(f"[scale] sp14c: $m%4d  $rows%7d  $wO%5.2f/$bO%5.1f" +
          f"  $wS%5.2f/$bS%5.1f  $wP%5.2f/$bP%5.1f")
      }
    }

    // sp14: the rank spine under the ADVERSARIAL value distribution —
    // outlier-stretched range with the mass concentrated in one
    // fixed-width cell (the Theil–Sen slope-table shape that
    // degenerated the r13 single-level spine into a one-partition sort
    // of the distinct set). RankSpine re-buckets oversized cells over
    // their own [min,max], so wall must grow ~linearly in the DISTINCT
    // count and stay in the same band as the benign uniform shape at
    // equal distinct count — a blown-up heavy/uniform ratio would flag
    // the degeneracy back.
    if (spineOnly || (!skewOnly && !fxOnly && !qbOnly && !fitOnly && !r15Only && !r15bOnly && !r15cOnly && !pcaOnly)) {
      import graft.operators.HypothesisOps
      println("[scale] sp14: shape    distinct    ks_s/mb")
      Seq(500000L, 2000000L).foreach { nd =>
        Seq("uniform", "heavy").foreach { shape =>
          // every id a distinct value; heavy packs them into [0,1e-3]
          // of a range stretched to 1e12 by two outliers
          val base = spark.range(nd).select(
            (col("id").cast("double") /
              (if (shape == "heavy") lit(nd.toDouble * 1e3)
               else lit(1.0))).as("v"),
            when(pmod(col("id"), lit(2)) === 0, lit("A"))
              .otherwise(lit("B")).as("g"))
          val outliers = spark.range(2).select(
            (lit(1e6) * pow(lit(1e6), col("id").cast("double")))
              .as("v"),
            lit("B").as("g"))
          val df = (if (shape == "heavy") base.unionByName(outliers)
            else base)
            .repartition(spark.sparkContext.defaultParallelism)
            .localCheckpoint()
          df.count()
          listener.reset()
          val t0 = System.nanoTime()
          HypothesisOps.ksTest(df, "v", "g", "A", "B").collect()
          val w = (System.nanoTime() - t0) / 1e9
          Thread.sleep(1500)
          println(f"[scale] sp14: $shape%7s  $nd%9d  $w%5.2f/" +
            f"${listener.bytes / 1e6}%7.1f")
        }
      }
    }

    // sp15: the round-15 eval ops under ROW duplication. Duplicating
    // rows with UNCHANGED values grows the counts but keeps the
    // distinct-value spine FIXED — threshold_sweep / auc_by walls must
    // stay scan-bound (near-flat), never grow with the spine.
    // ranking_eval duplicates with SHIFTED query ids (more queries,
    // same bounded candidate lists) — linear. BPE training's merge
    // loop runs on the fixed distinct-word table, so only its one
    // word-count scan grows — train wall must grow far slower than
    // the corpus multiplier.
    if (r15Only || (!skewOnly && !fxOnly && !qbOnly && !fitOnly &&
        !spineOnly && !r15bOnly && !r15cOnly && !pcaOnly)) {
      import graft.operators.HypothesisOps
      val ordBase = Tables.orders(spark, sfDir)
        .select("o_orderkey", "o_totalprice", "o_orderstatus",
          "o_orderpriority")
      val liBase = Tables.lineitem(spark, sfDir)
        .select("l_orderkey", "l_linenumber", "l_extendedprice",
          "l_returnflag")
      val docsBase = Tables.documents(spark, sfDir)
        .select("doc_id", "text")
      println("[scale] sp15: mult    rows   sweep_s/mb  aucby_s/mb" +
        "  rank_s/mb  bpe_s")
      Seq(1, 2, 4).foreach { m =>
        val par = spark.sparkContext.defaultParallelism
        val ord = (0 until m).map(_ => ordBase)
          .reduce(_ unionByName _).repartition(par).localCheckpoint()
        val li = (0 until m).map(i => liBase.select(
            (col("l_orderkey") + lit(i.toLong * 100000000L))
              .as("l_orderkey"),
            col("l_linenumber"), col("l_extendedprice"),
            col("l_returnflag")))
          .reduce(_ unionByName _).repartition(par).localCheckpoint()
        val docs = (0 until m).map(_ => docsBase)
          .reduce(_ unionByName _).repartition(par).localCheckpoint()
        val rows = ord.count(); li.count(); docs.count()
        def measure(f: => Long): (Double, Double) = {
          listener.reset()
          val t0 = System.nanoTime()
          f
          val w = (System.nanoTime() - t0) / 1e9
          Thread.sleep(1500)
          (w, listener.bytes / 1e6)
        }
        val (wT, bT) = measure(HypothesisOps.thresholdSweep(ord,
          "o_totalprice", "o_orderstatus", "F", "O").count())
        val (wA, bA) = measure(HypothesisOps.aucBy(ord,
          "o_totalprice", "o_orderstatus", "F", "O",
          "o_orderpriority").count())
        val (wR, bR) = measure(HypothesisOps.rankingEval(
          li.withColumn("rel",
            (col("l_returnflag") === "R").cast("int")),
          "l_orderkey", "l_linenumber", "l_extendedprice", "rel", 3)
          .count())
        val t0 = System.nanoTime()
        graft.functions.BpeOps.trainMerges(docs, "text", nMerges = 512)
        val wB = (System.nanoTime() - t0) / 1e9
        println(f"[scale] sp15: $m%4d  $rows%7d  $wT%5.2f/$bT%5.1f" +
          f"  $wA%5.2f/$bA%5.1f  $wR%5.2f/$bR%5.1f  $wB%5.2f")
      }
    }

    // sp15b: the round-15 second wave. setsim_join grows the corpus
    // with DISJOINT copies (every word prefixed by the copy index, so
    // no cross-copy pair qualifies): true pairs grow ×m, and the
    // prefix-filter candidate work must follow the output (near-
    // linear wall/shuffle), never the m² pair space. logit/ipw
    // duplicate rows verbatim: each IRLS pass is a map-side combine,
    // so walls grow ~linearly with the scan and shuffle bytes stay
    // flat (1-row combines).
    if (r15bOnly || (!skewOnly && !fxOnly && !qbOnly && !fitOnly &&
        !spineOnly && !r15Only && !r15bOnly && !r15cOnly && !pcaOnly)) {
      import graft.operators.{DedupOps, FitOps}
      val docsBase = Tables.documents(spark, sfDir)
        .select("doc_id", "lang", "text")
      val liBase = Tables.lineitem(spark, sfDir)
        .filter(col("l_orderkey") % 8 === 0)
        .select("l_returnflag", "l_discount", "l_quantity")
      println("[scale] sp15b: mult    docs  setsim_s/mb/pairs" +
        "   li_rows  logit_s/mb")
      Seq(1, 2, 4).foreach { m =>
        val par = spark.sparkContext.defaultParallelism
        val docs = (0 until m).map(i => docsBase.select(
            (col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
            col("lang"),
            regexp_replace(col("text"), "(^| )", s"$$1c${i}_")
              .as("text")))
          .reduce(_ unionByName _).repartition(par).localCheckpoint()
        val li = (0 until m).map(_ => liBase)
          .reduce(_ unionByName _).repartition(par).localCheckpoint()
        val nDocs = docs.count(); val nLi = li.count()
        listener.reset()
        var t0 = System.nanoTime()
        val nPairs = DedupOps.setSimJoin(docs, "doc_id", "text", 0.6,
          Some("lang")).count()
        val wS = (System.nanoTime() - t0) / 1e9
        Thread.sleep(1500)
        val bS = listener.bytes / 1e6
        listener.reset()
        t0 = System.nanoTime()
        FitOps.logitFit(li.withColumn("lbl",
            when(col("l_returnflag") === "R", 1.0).otherwise(0.0)),
          "lbl", Seq("l_discount", "l_quantity")).count()
        val wL = (System.nanoTime() - t0) / 1e9
        Thread.sleep(1500)
        val bL = listener.bytes / 1e6
        println(f"[scale] sp15b: $m%4d  $nDocs%6d  " +
          f"$wS%5.2f/${bS}%7.1f/$nPairs%6d   $nLi%7d  " +
          f"$wL%5.2f/${bL}%5.1f")
      }
    }

    // sp15c: the round-15 late-session ops under growth. levene and
    // logrank duplicate rows with UNCHANGED values: the grouped
    // median spine / per-time risk table stay FIXED while counts
    // grow, so walls must stay scan-bound (near-flat slope vs the
    // multiplier). hampel duplicates with SHIFTED user ids (more
    // users, same bounded per-user frames) — linear. mmr duplicates
    // with shifted query ids (more queries, same bounded candidate
    // lists per query) — linear in queries, never pairwise.
    if (r15cOnly || (!skewOnly && !fxOnly && !qbOnly && !fitOnly &&
        !spineOnly && !r15Only && !r15bOnly && !pcaOnly)) {
      import graft.operators.{EventOps, FitOps, HypothesisOps,
        SimilarityOps}
      val liBase = Tables.lineitem(spark, sfDir)
        .select("l_quantity", "l_returnflag")
      val evBase = Tables.events(spark, sfDir)
        .select("user_id", "event_id", "ts", "value")
      val embBase = Tables.embeddings(spark, sfDir)
        .select("vec_id", "embedding")
      println("[scale] sp15c: mult  li_rows  levene_s/mb" +
        "  ev_rows  hampel_s/mb  logrank_s  nq  mmr_s")
      Seq(1, 2, 4).foreach { m =>
        val par = spark.sparkContext.defaultParallelism
        val li = (0 until m).map(_ => liBase)
          .reduce(_ unionByName _).repartition(par).localCheckpoint()
        val ev = (0 until m).map(i => evBase.select(
            (col("user_id") + lit(i.toLong * 10000000L))
              .as("user_id"),
            (col("event_id") + lit(i.toLong * 1000000000L))
              .as("event_id"),
            col("ts"), col("value")))
          .reduce(_ unionByName _).repartition(par).localCheckpoint()
        val nLi = li.count(); val nEv = ev.count()
        def measure(f: => Long): (Double, Double) = {
          listener.reset()
          val t0 = System.nanoTime()
          f
          val w = (System.nanoTime() - t0) / 1e9
          Thread.sleep(1500)
          (w, listener.bytes / 1e6)
        }
        val (wL, bL) = measure(HypothesisOps.leveneBf(li,
          "l_quantity", "l_returnflag").count())
        val (wH, bH) = measure(EventOps.hampel(ev, "user_id", "ts",
          "event_id", "value").count())
        // logrank over duplicated subject rows: distinct-time risk
        // table fixed, counts scale
        val subj = ev.groupBy("user_id")
          .agg(min(to_date(col("ts"))).as("d0"),
            max(to_date(col("ts"))).as("d1"))
        val mx = ev.agg(max(to_date(col("ts"))).as("dmax"))
        val st = subj.crossJoin(broadcast(mx)).select(
          datediff(col("d1"), col("d0")).cast("bigint").as("t"),
          (datediff(col("dmax"), col("d1")) >= 3).as("e"),
          when(col("user_id") % 2 === 0, "x").otherwise("y").as("g"))
        val (wK, _) = measure(FitOps.logRank(st, "t", "e", "g",
          "x", "y").count())
        // mmr: m x 5 probes against the fixed 500-vector corpus,
        // top-30 candidates each — queries scale, candidates bounded
        val probes = broadcast(embBase
          .filter(col("vec_id") < 5)
          .withColumn("cp", explode(sequence(lit(0), lit(m - 1))))
          .select((col("vec_id") + col("cp") * 5).as("qid"),
            col("embedding").as("pe")))
        val wq = org.apache.spark.sql.expressions.Window
          .partitionBy("qid").orderBy(col("rel").desc, col("cid"))
        val cands = embBase
          .join(probes, col("vec_id") =!= pmod(col("qid"), lit(5)))
          .select(col("qid"), col("vec_id").as("cid"),
            round(SimilarityOps.cosine(col("embedding"), col("pe")),
              6).as("rel"),
            col("embedding"))
          .withColumn("__rn", row_number().over(wq))
          .filter(col("__rn") <= 30).drop("__rn")
          .localCheckpoint()
        val nq = m * 5
        val t0 = System.nanoTime()
        SimilarityOps.mmrRerank(cands, "qid", "cid", "rel",
          "embedding", 10).count()
        val wM = (System.nanoTime() - t0) / 1e9
        println(f"[scale] sp15c: $m%4d  $nLi%7d  $wL%5.2f/$bL%5.1f" +
          f"  $nEv%7d  $wH%5.2f/$bH%5.1f  $wK%5.2f  $nq%3d  $wM%5.2f")
      }
    }

    // Cell-skew probe: natural corpora have hot clusters, and a hot
    // CELL concentrates the IVF stage-1 equi-join's work in one task
    // once the inverted file is too big to broadcast (the 100 TB
    // regime — locally AQE broadcasts the cells side and no skew can
    // exist, so the probe FORCES the shuffle join). A corpus where one
    // cluster holds ~30% of all vectors probes the index; the evidence
    // that the shape survives is (a) AQE's skew-join splitting the hot
    // partition ("skew=true" in the executed plan) and (b) wall time
    // in the same band as the balanced corpus at equal size.
    if (!fxOnly && !qbOnly && !fitOnly && !spineOnly && !r15Only && !r15bOnly && !r15cOnly && !pcaOnly) {
      val conf = spark.conf
      val saved = Seq(
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes")
        .map(k => k -> conf.getOption(k)).toMap
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // local partitions are KBs, not the 256 MB production default —
      // scale the skew detector down so the same AQE rule can engage
      conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16k")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8k")
      println("[scale] skew:  shape      vecs  hot_frac  wall_s  skew_split")
      Seq(false, true).foreach { skewed =>
        // 4x the corpus; in the skewed variant 30% of vectors collapse
        // into ONE IDENTICAL vector — the one cluster shape no
        // quantizer can split (Lloyd's density-proportional seeding
        // self-balances any cluster with internal spread, measured:
        // a tight-but-distinct cluster lands hot_frac ~0.009), so
        // every duplicate assigns to the same cell
        val m = 4
        val raw = (0 until m)
          .map(i => embBase.select(
            (col("vec_id") + lit(i.toLong * 1000000L)).as("vec_id"),
            col("embedding")))
          .reduce(_ unionByName _)
        val vecs = (if (!skewed) raw else raw.select(col("vec_id"),
            when(pmod(col("vec_id"), lit(10)) < 3,
              transform(col("embedding").cast("array<double>"),
                (v, i) => when(i === 0, lit(100.0)).otherwise(lit(0.01))))
              .otherwise(col("embedding").cast("array<double>"))
              .as("embedding")))
          .repartition(spark.sparkContext.defaultParallelism, col("vec_id"))
          .localCheckpoint()
        val n = vecs.count()
        val idx = graft.operators.IvfIndex.build(vecs, "vec_id", "embedding")
        idx.cells.count() // build outside the timed window
        val hotFrac = idx.cells.groupBy("cell").count()
          .agg(max("count")).head().getLong(0).toDouble / n
        val queries = vecs.filter(col("vec_id") % 10 === 0)
        val t0 = System.nanoTime()
        val joined = idx.knnJoinWith(queries, "vec_id", "embedding", k = 5)
        // collect through the SAME QueryExecution the plan is read
        // from — count() would wrap a fresh one whose adaptive plan
        // never finalizes
        joined.collect()
        val wall = (System.nanoTime() - t0) / 1e9
        val split = joined.queryExecution.executedPlan.toString
          .contains("skew=true")
        println(f"[scale] skew:  ${if (skewed) "clustered" else "balanced "}" +
          f"  $n%6d  $hotFrac%8.3f  $wall%6.2f  $split%s")
        idx.close()
      }
      saved.foreach { case (k, v) =>
        v.fold(conf.unset(k))(conf.set(k, _)) }
    }

    // pcaFit moment-pass probe (r16): the per-partition Gram fold must
    // shuffle partitions·d² rows regardless of corpus size — at ×2/×4
    // the corpus, shuffle MB stays FLAT and wall grows ~linearly. The
    // r15 HOF-explosion shape shuffled n·(d²/2+d) struct rows (would
    // read as shuffle MB doubling with the corpus here).
    if (pcaOnly || (!skewOnly && !fxOnly && !qbOnly && !fitOnly &&
        !spineOnly && !r15Only && !r15bOnly && !r15cOnly)) {
      val pcaListener = new ShuffleBytesListener
      spark.sparkContext.addSparkListener(pcaListener)
      println("[scale] pca:  mult    vecs   wall_s   shuffle_mb")
      Seq(1, 2, 4).foreach { m =>
        val vecs = (0 until m)
          .map(i => embBase.select(
            (col("vec_id") + lit(i.toLong * 1000000L)).as("vec_id"),
            col("embedding")))
          .reduce(_ unionByName _)
          .repartition(spark.sparkContext.defaultParallelism,
            col("vec_id"))
          .localCheckpoint()
        val n = vecs.count()
        pcaListener.reset()
        val t0 = System.nanoTime()
        graft.operators.PcaOps.pcaFit(vecs, "embedding", 16)
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(2000) // listener bus drains asynchronously
        println(f"[scale] pca:  $m%4d  $n%6d  $wall%7.2f  " +
          f"${pcaListener.bytes / 1e6}%10.1f")
      }
    }
    spark.stop()
  }

  private final class ShuffleBytesListener
    extends org.apache.spark.scheduler.SparkListener {
    @volatile var bytes: Long = 0L
    def reset(): Unit = bytes = 0L
    override def onStageCompleted(
        sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
      bytes += sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
  }
}
