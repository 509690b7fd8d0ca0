package graft

import graft.operators.SimilarityOps
import org.apache.spark.sql.functions._

/** Similarity search: the ANN path is approximate by design (no SQL
  * oracle) — it is gated here against the exact brute-force path. */
class SimilaritySpec extends SparkSpec {

  test("brute-force top-k is ordered, sized, and excludes the probe") {
    val rows = SimilarityOps.bruteForceTopK(spark, sfDir).collect()
    assert(rows.length === 10)
    assert(!rows.exists(_.getLong(0) === 0L), "probe excluded")
    val sims = rows.map(_.getDouble(1)).toSeq
    assert(sims === sims.sorted.reverse, "descending similarity")
  }

  test("ANN cos values are exact for the ids it returns") {
    val ann = SimilarityOps.annTopK(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // brute-force similarity of ALL vectors to the probe
    val exact = SimilarityOps.bruteForceTopK(spark, sfDir, k = Int.MaxValue)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ann.foreach { case (id, cos) =>
      assert(exact(id) === cos,
        s"ANN similarity for $id must equal the exact value")
    }
  }

  test("ANN candidates share at least one LSH table bucket with the probe") {
    val sigCols = SimilarityOps.lshTableSigs(col("embedding"))
    val e = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id") +: sigCols.zipWithIndex.map {
        case (c, t) => c.as(s"s$t") }: _*)
    val sigs = e.collect()
      .map(r => r.getLong(0) -> (1 until r.length).map(r.getInt)).toMap
    val probeSig = sigs(0L)
    SimilarityOps.annTopK(spark, sfDir).collect().foreach { r =>
      val shared = sigs(r.getLong(0)).zip(probeSig).exists(p => p._1 == p._2)
      assert(shared, s"vec ${r.getLong(0)} shares no bucket with probe")
    }
  }

  test("ANN probe is a hash equi-join against the materialized index") {
    val p = SimilarityOps.annTopK(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("point-query literal-bucket probe agrees with the indexed equi-probe") {
    val probeVec = graft.sources.Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") === 0L)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0)
    val idx = graft.operators.AnnIndex.forDir(spark, sfDir)
    // an external-vector query sees the probe itself as its own nearest
    // neighbor; the remainder must equal the by-id probe exactly
    val vecRows = idx.topKVec(probeVec, 11).collect()
    assert(vecRows.head.getLong(0) === 0L)
    assert(vecRows.head.getDouble(1) >= 0.999999)
    val viaVec = vecRows.tail.map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    val viaId = idx.topK(0L, 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    assert(viaVec === viaId)
  }

  test("IVF build is deterministic and its probe plan is join-free") {
    val a = graft.operators.IvfIndex.build(
      graft.sources.Tables.embeddings(spark, sfDir), "vec_id", "embedding")
    val b = graft.operators.IvfIndex.build(
      graft.sources.Tables.embeddings(spark, sfDir), "vec_id", "embedding")
    assert(a.centroidArrays === b.centroidArrays,
      "decimal-exact means must reproduce")
    val cellsA = a.cells.select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val cellsB = b.cells.select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(cellsA === cellsB)
    // the PROBE plan above the cached inverted file is join-free; the
    // cache node prints its own build lineage (the broadcast-matrix
    // assignment), so truncate at the cache boundary before asserting
    val p = a.topK(0L).queryExecution.executedPlan.toString
      .split("InMemory")(0)
    assert(!p.contains("Join"), p.take(2000))
    a.cells.unpersist(); b.cells.unpersist()
  }

  test("IVF cos values are exact and recall meets the design bound") {
    val exact = SimilarityOps.bruteForceTopK(spark, sfDir, k = Int.MaxValue)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ivf = SparkEntry.queries("q_sim_ivf")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    ivf.foreach { case (id, cos) =>
      assert(exact(id) === cos, s"IVF similarity for $id must be exact")
    }
    // recall gate over the MEAN of 10 probes — a single probe's recall
    // is one Bernoulli draw per neighbor, too noisy to bound. The
    // two-stage reranked probe (wide sketch sweep + exact rescore cap,
    // the q_sim_ivf default) is gated at 0.8; the measured frontier
    // point is 0.86 recall at ~13% byte-scan (BASELINE.md §IVF rerank;
    // the r3 single-stage probe managed 0.68 scanning 25%).
    val idx = graft.operators.IvfIndex.forDir(spark, sfDir)
    val recalls = (0L until 10L).map { p =>
      val bfP = SimilarityOps.bruteForceTopK(spark, sfDir, probeId = p)
        .collect().map(_.getLong(0)).toSet
      val got = idx.topKAuto(p, 10).collect().map(_.getLong(0)).toSet
      (bfP & got).size.toDouble / bfP.size
    }
    val recall = recalls.sum / recalls.size
    info(f"IVF reranked mean recall@10 = $recall%.2f " +
      "(nprobe=3/4 cells, cap=8%)")
    // floor = measured 0.90 minus a 0.05 regeneration margin (the run
    // is hash-deterministic per corpus; the only drift source is the
    // driver regenerating testdata, ~binomial noise on a 10-probe mean)
    assert(recall >= 0.85, s"recall $recall below design bound")
    // single-stage floor: measured 0.79 minus margin
    val single = (0L until 10L).map { p =>
      val bfP = SimilarityOps.bruteForceTopK(spark, sfDir, probeId = p)
        .collect().map(_.getLong(0)).toSet
      val got = idx.topK(p, 10).collect().map(_.getLong(0)).toSet
      (bfP & got).size.toDouble / bfP.size
    }
    val singleMean = single.sum / single.size
    info(f"IVF single-stage mean recall@10 = $singleMean%.2f (nprobe=8)")
    assert(singleMean >= 0.72, s"recall $singleMean below design bound")
  }

  test("PQ index: codebook is bit-reproducible, rescored values are " +
      "exact, and mean recall@10 meets the design bound") {
    import graft.operators.PqIndex
    val vecs = graft.sources.Tables.embeddings(spark, sfDir)
    val a = PqIndex.build(vecs, "vec_id", "embedding")
    val b = PqIndex.build(vecs, "vec_id", "embedding")
    assert(a.codebook === b.codebook,
      "hash-seeded starts + DECIMAL-exact means must reproduce")
    a.close(); b.close()
    val idx = PqIndex.forDir(spark, sfDir)
    // exactness: every returned cos_sim equals the brute-force value
    val exact = SimilarityOps.bruteForceTopK(spark, sfDir, k = Int.MaxValue)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    SparkEntry.queries("q_sim_pq")(spark, sfDir).collect().foreach { r =>
      assert(exact(r.getLong(0)) === r.getDouble(1),
        s"PQ similarity for ${r.getLong(0)} must be exact")
    }
    // recall over the 10-probe mean (single probes are too noisy)
    val recalls = (0L until 10L).map { p =>
      val bfP = SimilarityOps.bruteForceTopK(spark, sfDir, probeId = p)
        .collect().map(_.getLong(0)).toSet
      val got = idx.topK(p, 10).collect().map(_.getLong(0)).toSet
      (bfP & got).size.toDouble / bfP.size
    }
    val recall = recalls.sum / recalls.size
    info(f"PQ ADC mean recall@10 = $recall%.2f " +
      "(8 subspaces x 16 centroids, rescoreCap=100)")
    // measured 0.88 minus a 0.06 regeneration margin (r10 ADVICE: a
    // regression to 0.81 used to pass the old 0.8 gate)
    assert(recall >= 0.82, s"recall $recall below design bound")
  }

  test("IVF-PQ: both quantizer levels reproduce, rescored values are " +
      "exact, probe plan is join-free before the rescore, and mean " +
      "recall@10 meets the design bound") {
    import graft.operators.IvfPqIndex
    val vecs = graft.sources.Tables.embeddings(spark, sfDir)
    val a = IvfPqIndex.build(vecs, "vec_id", "embedding")
    val b = IvfPqIndex.build(vecs, "vec_id", "embedding")
    assert(a.centroidArrays === b.centroidArrays)
    assert(a.codebook === b.codebook)
    a.close(); b.close()
    val idx = IvfPqIndex.forDir(spark, sfDir)
    // stage 1 is a literal cell filter + narrow scan: no join above
    // the candidate set (the rescore join input is rescoreCap rows)
    val exact = SimilarityOps.bruteForceTopK(spark, sfDir, k = Int.MaxValue)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    SparkEntry.queries("q_sim_ivfpq")(spark, sfDir).collect().foreach { r =>
      assert(exact(r.getLong(0)) === r.getDouble(1),
        s"IVF-PQ similarity for ${r.getLong(0)} must be exact")
    }
    val recalls = (0L until 10L).map { p =>
      val bfP = SimilarityOps.bruteForceTopK(spark, sfDir, probeId = p)
        .collect().map(_.getLong(0)).toSet
      val got = idx.topK(p, 10).collect().map(_.getLong(0)).toSet
      (bfP & got).size.toDouble / bfP.size
    }
    val recall = recalls.sum / recalls.size
    info(f"IVF-PQ mean recall@10 = $recall%.2f " +
      "(nprobe=16/32 cells, residual PQ 8x16, cap=192)")
    // measured 0.95 minus a 0.07 regeneration margin
    assert(recall >= 0.88, s"recall $recall below design bound")
  }

  test("bucketed index tables round-trip and probe identically") {
    val vecs = graft.sources.Tables.embeddings(spark, sfDir)
    val lsh = graft.operators.AnnIndex.build(vecs, "vec_id", "embedding")
    lsh.writeTable("ann_sigs_rt", buckets = 8)
    val lshBack = graft.operators.AnnIndex.fromTable(spark, "ann_sigs_rt")
    assert(lshBack.topK(0L).collect().map(_.toSeq).toSeq ===
      lsh.topK(0L).collect().map(_.toSeq).toSeq)
    val ivf = graft.operators.IvfIndex.build(vecs, "vec_id", "embedding")
    ivf.writeTable("ivf_cells_rt", buckets = 8)
    // the _meta sidecar makes the table self-describing: fromTable
    // restores centroids AND the stamped size with no in-memory state
    val ivfBack = graft.operators.IvfIndex.fromTable(spark, "ivf_cells_rt")
    assert(ivfBack.centroidArrays === ivf.centroidArrays)
    assert(ivfBack.size === ivf.size)
    assert(ivfBack.topK(0L).collect().map(_.toSeq).toSeq ===
      ivf.topK(0L).collect().map(_.toSeq).toSeq)
    // PQ and IVF-PQ: codebooks (and both quantizer levels) ride the
    // sidecar; the reopened index must probe identically
    val pq = graft.operators.PqIndex.build(vecs, "vec_id", "embedding")
    pq.writeTable("pq_codes_rt", buckets = 8)
    val pqBack = graft.operators.PqIndex.fromTable(spark, "pq_codes_rt")
    assert(pqBack.codebook === pq.codebook)
    assert(pqBack.size === pq.size)
    assert(pqBack.topK(0L).collect().map(_.toSeq).toSeq ===
      pq.topK(0L).collect().map(_.toSeq).toSeq)
    val ivfpq = graft.operators.IvfPqIndex.build(vecs, "vec_id", "embedding")
    ivfpq.writeTable("ivfpq_cells_rt", buckets = 8)
    val ivfpqBack = graft.operators.IvfPqIndex.fromTable(spark,
      "ivfpq_cells_rt")
    assert(ivfpqBack.centroidArrays === ivfpq.centroidArrays)
    assert(ivfpqBack.codebook === ivfpq.codebook)
    assert(ivfpqBack.topK(0L).collect().map(_.toSeq).toSeq ===
      ivfpq.topK(0L).collect().map(_.toSeq).toSeq)
    // a FRESH session (no temp functions, no build() chokepoint run)
    // must reopen and probe every index kind — fromTable registers the
    // vector functions itself, and AnnIndex's budget rides its sidecar
    val s2 = spark.newSession()
    assert(graft.operators.AnnIndex.fromTable(s2, "ann_sigs_rt")
      .topK(0L).collect().map(_.toSeq).toSeq ===
      lsh.topK(0L).collect().map(_.toSeq).toSeq)
    assert(graft.operators.IvfIndex.fromTable(s2, "ivf_cells_rt")
      .topK(0L).collect().map(_.toSeq).toSeq ===
      ivf.topK(0L).collect().map(_.toSeq).toSeq)
    assert(graft.operators.PqIndex.fromTable(s2, "pq_codes_rt")
      .topK(0L).collect().map(_.toSeq).toSeq ===
      pq.topK(0L).collect().map(_.toSeq).toSeq)
    assert(graft.operators.IvfPqIndex.fromTable(s2, "ivfpq_cells_rt")
      .topK(0L).collect().map(_.toSeq).toSeq ===
      ivfpq.topK(0L).collect().map(_.toSeq).toSeq)
    lsh.sigs.unpersist(); ivf.cells.unpersist(); pq.close(); ivfpq.close()
    spark.sql("DROP TABLE IF EXISTS ann_sigs_rt")
    spark.sql("DROP TABLE IF EXISTS ann_sigs_rt_meta")
    spark.sql("DROP TABLE IF EXISTS ivf_cells_rt")
    spark.sql("DROP TABLE IF EXISTS ivf_cells_rt_meta")
    spark.sql("DROP TABLE IF EXISTS pq_codes_rt")
    spark.sql("DROP TABLE IF EXISTS pq_codes_rt_meta")
    spark.sql("DROP TABLE IF EXISTS ivfpq_cells_rt")
    spark.sql("DROP TABLE IF EXISTS ivfpq_cells_rt_meta")
  }

  test("IVF append assigns arrivals to the existing cells — a full-" +
      "nprobe probe of the grown index equals exact brute force") {
    import graft.operators.IvfIndex
    val vecs = graft.sources.Tables.embeddings(spark, sfDir)
    val half = vecs.filter(col("vec_id") < 250)
    val rest = vecs.filter(col("vec_id") >= 250)
    val idx = IvfIndex.build(half, "vec_id", "embedding")
    // in-memory ingest: size grows, centroids stay put
    val grown = idx.append(rest, "vec_id", "embedding")
    assert(grown.size === vecs.count())
    assert(grown.centroidArrays === idx.centroidArrays)
    // scanning ALL cells exact-rescores everything → must equal the
    // brute-force ranking over the full union (old + appended rows)
    val got = grown.topK(0L, 10, nprobe = grown.nCells)
      .collect().map(_.toSeq).toSeq
    val exact = graft.operators.SimilarityOps
      .bruteForceTopK(vecs, "vec_id", "embedding", 0L, 10)
      .collect().map(_.toSeq).toSeq
    assert(got === exact)
    // durable ingest: TWO appends through the same handle must
    // accumulate the sidecar size (the stamp comes off the sidecar,
    // not the handle's stale field)
    idx.writeTable("ivf_cells_app", buckets = 8)
    idx.appendTable("ivf_cells_app",
      rest.filter(col("vec_id") < 375), "vec_id", "embedding", buckets = 8)
    // the second append runs through a REOPENED handle — the exact path
    // the require() message recommends; its centroid frame READS the
    // sidecar being restamped (the staged-overwrite fix, r7 review)
    IvfIndex.fromTable(spark, "ivf_cells_app").appendTable("ivf_cells_app",
      rest.filter(col("vec_id") >= 375), "vec_id", "embedding", buckets = 8)
    val back = IvfIndex.fromTable(spark, "ivf_cells_app")
    assert(back.size === vecs.count())
    assert(back.topK(0L, 10, nprobe = back.nCells)
      .collect().map(_.toSeq).toSeq === exact)
    idx.close()
    spark.sql("DROP TABLE IF EXISTS ivf_cells_app")
    spark.sql("DROP TABLE IF EXISTS ivf_cells_app_meta")
  }

  test("PQ and IVF-PQ append encode arrivals under the EXISTING " +
      "quantizers — a full-budget probe of the grown index equals " +
      "exact brute force over the union") {
    import graft.operators.{IvfPqIndex, PqIndex}
    val vecs = graft.sources.Tables.embeddings(spark, sfDir)
    val half = vecs.filter(col("vec_id") < 250)
    val rest = vecs.filter(col("vec_id") >= 250)
    val n = vecs.count().toInt
    val exact = graft.operators.SimilarityOps
      .bruteForceTopK(vecs, "vec_id", "embedding", 0L, 10)
      .collect().map(_.toSeq).toSeq
    // PQ: rescoring EVERYTHING makes the probe exact regardless of the
    // codebook, so the grown index must reproduce brute force
    val pq = PqIndex.build(half, "vec_id", "embedding")
    val pqGrown = pq.append(rest, "vec_id", "embedding")
    assert(pqGrown.size === n.toLong)
    assert(pqGrown.topK(0L, 10, rescoreCap = n).collect()
      .map(_.toSeq).toSeq === exact)
    // IVF-PQ: all cells + full rescore likewise
    val ivfpq = IvfPqIndex.build(half, "vec_id", "embedding")
    val ipGrown = ivfpq.append(rest, "vec_id", "embedding")
    assert(ipGrown.size === n.toLong)
    assert(ipGrown.nCells === ivfpq.nCells)
    assert(ipGrown.topK(0L, 10, nprobe = ipGrown.nCells,
      rescoreCap = n).collect().map(_.toSeq).toSeq === exact)
    // durable twin: two appendTable calls accumulate the sidecar size
    // and the reopened indexes probe the union exactly
    pq.writeTable("pq_codes_app", buckets = 8)
    pq.appendTable("pq_codes_app",
      rest.filter(col("vec_id") < 375), "vec_id", "embedding", buckets = 8)
    pq.appendTable("pq_codes_app",
      rest.filter(col("vec_id") >= 375), "vec_id", "embedding", buckets = 8)
    val pqBack = PqIndex.fromTable(spark, "pq_codes_app")
    assert(pqBack.size === n.toLong)
    assert(pqBack.topK(0L, 10, rescoreCap = n).collect()
      .map(_.toSeq).toSeq === exact)
    ivfpq.writeTable("ivfpq_cells_app", buckets = 8)
    // reopened-handle append (the sidecar self-read path, r7 review)
    IvfPqIndex.fromTable(spark, "ivfpq_cells_app")
      .appendTable("ivfpq_cells_app", rest, "vec_id", "embedding",
        buckets = 8)
    val ipBack = IvfPqIndex.fromTable(spark, "ivfpq_cells_app")
    assert(ipBack.size === n.toLong)
    assert(ipBack.topK(0L, 10, nprobe = ipBack.nCells,
      rescoreCap = n).collect().map(_.toSeq).toSeq === exact)
    // a handle with DIFFERENT quantizers must refuse the durable append
    // (silently mixed encodings would corrupt every future probe)
    val other = PqIndex.build(vecs, "vec_id", "embedding",
      centroidsPerSub = 8)
    val err = intercept[IllegalArgumentException] {
      other.appendTable("pq_codes_app", rest, "vec_id", "embedding",
        buckets = 8)
    }
    assert(err.getMessage.contains("does not match"))
    other.close(); pq.close(); ivfpq.close()
    spark.sql("DROP TABLE IF EXISTS pq_codes_app")
    spark.sql("DROP TABLE IF EXISTS pq_codes_app_meta")
    spark.sql("DROP TABLE IF EXISTS ivfpq_cells_app")
    spark.sql("DROP TABLE IF EXISTS ivfpq_cells_app_meta")
  }

  test("appendTable grows a bucketed index table — probes equal a " +
      "from-scratch build over the union") {
    val vecs = graft.sources.Tables.embeddings(spark, sfDir)
    val half = vecs.filter(col("vec_id") < 250)
    val rest = vecs.filter(col("vec_id") >= 250)
    val idx = graft.operators.AnnIndex.build(half, "vec_id", "embedding",
      persist = false)
    idx.writeTable("ann_sigs_app", buckets = 8)
    idx.appendTable("ann_sigs_app", rest, "vec_id", "embedding", buckets = 8)
    val back = graft.operators.AnnIndex.fromTable(spark, "ann_sigs_app")
    val full = graft.operators.AnnIndex.build(vecs, "vec_id", "embedding",
      persist = false)
    // signatures are deterministic per vector, so append ∪ base must
    // probe exactly like an index built over the whole corpus
    assert(back.topK(0L).collect().map(_.toSeq).toSeq ===
      full.topK(0L).collect().map(_.toSeq).toSeq)
    spark.sql("DROP TABLE IF EXISTS ann_sigs_app")
  }

  test("AnnIndex.appendTable refuses a handle whose hyperplane budget " +
      "differs from the table's sidecar") {
    val vecs = graft.sources.Tables.embeddings(spark, sfDir)
    val idx16 = graft.operators.AnnIndex.build(vecs, "vec_id", "embedding",
      tables = 16, persist = false)
    idx16.writeTable("ann_sigs_guard", buckets = 8)
    // an 8-table handle signing rows into a 16-table index would land
    // them in buckets future probes never match — must refuse
    val idx8 = graft.operators.AnnIndex.build(vecs, "vec_id", "embedding",
      tables = 8, persist = false)
    val err = intercept[IllegalArgumentException] {
      idx8.appendTable("ann_sigs_guard", vecs, "vec_id", "embedding",
        buckets = 8)
    }
    assert(err.getMessage.contains("does not match"))
    spark.sql("DROP TABLE IF EXISTS ann_sigs_guard")
    spark.sql("DROP TABLE IF EXISTS ann_sigs_guard_meta")
  }

  test("index invalidate releases executor storage and rebuild re-caches") {
    import org.apache.spark.storage.StorageLevel
    // start from a clean slate: Spark keys cached data by plan equality,
    // so an earlier test's unpersist of an equivalent plan may already
    // have dropped a cached entry's storage
    graft.operators.AnnIndex.invalidate(spark, sfDir)
    val ann = graft.operators.AnnIndex.forDir(spark, sfDir)
    ann.sigs.count()
    assert(ann.sigs.storageLevel !== StorageLevel.NONE, "index persisted")
    graft.operators.AnnIndex.invalidate(spark, sfDir)
    assert(ann.sigs.storageLevel === StorageLevel.NONE,
      "invalidate must unpersist the signature table")
    // a fresh forDir builds (not the stale entry) and persists again
    val ann2 = graft.operators.AnnIndex.forDir(spark, sfDir)
    assert(ann2 ne ann)
    assert(ann2.sigs.storageLevel !== StorageLevel.NONE)
    graft.operators.AnnIndex.invalidate(spark, sfDir)

    graft.operators.IvfIndex.invalidate(spark, sfDir)
    val ivf = graft.operators.IvfIndex.forDir(spark, sfDir)
    ivf.cells.count()
    assert(ivf.cells.storageLevel !== StorageLevel.NONE)
    graft.operators.IvfIndex.invalidateAll(spark)
    assert(ivf.cells.storageLevel === StorageLevel.NONE,
      "invalidateAll must unpersist the inverted file")
  }

  test("ANN recall against brute-force top-10 meets the design bound") {
    val bf = SimilarityOps.bruteForceTopK(spark, sfDir).collect()
      .map(_.getLong(0)).toSet
    val ann = SimilarityOps.annTopK(spark, sfDir).collect()
      .map(_.getLong(0)).toSet
    val recall = (bf & ann).size.toDouble / bf.size
    info(f"ANN recall@10 = $recall%.2f (8 tables x 4 planes)")
    // deterministic hyperplanes → stable value; expected ≈ 1-(1-p^4)^8
    // ≈ 0.7 at this corpus's neighbor similarities (cos ≈ 0.3).
    // Floor = measured 0.70 minus a 0.10 margin (single-probe recall is
    // one 10-draw binomial — the widest-variance gate in the family)
    assert(recall >= 0.6, s"recall $recall below design bound")
  }

  test("knnJoinWith: held-out probe set — exact scores, mean recall@5 " +
      ">= 0.8 vs brute force") {
    import graft.sources.Tables
    import graft.operators.{AnnIndex, IvfIndex}
    val vecs = Tables.embeddings(spark, sfDir)
    // every 10th vector becomes an external query; the rest is indexed
    val queries = vecs.filter(col("vec_id") % 10 === 0)
    val corpus = vecs.filter(col("vec_id") % 10 =!= 0)
    val idx = AnnIndex.build(corpus, "vec_id", "embedding",
      tables = 16, persist = false)
    val got = idx.knnJoinWith(queries, "vec_id", "embedding", k = 5)
      .collect()
    // driver-side brute force over the small gate corpus, same ranking
    // contract (6-dp rounded cosine desc, dst_id tiebreak)
    def embMap(df: org.apache.spark.sql.DataFrame) = df
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toMap
    val qm = embMap(queries); val cm = embMap(corpus)
    val exact = qm.map { case (qid, qv) =>
      qid -> cm.toSeq
        .map { case (cid, cv) =>
          (cid, BigDecimal(IvfIndex.cosineOf(qv, cv))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
        .sortBy { case (cid, cos) => (-cos, cid) }
        .take(5)
    }
    val gotBySrc = got.groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = exact.map { case (qid, nbrs) =>
      (gotBySrc.getOrElse(qid, Set.empty) &
        nbrs.map(_._1).toSet).size.toDouble / nbrs.size
    }
    val mean = recalls.sum / recalls.size
    info(f"knnJoinWith held-out mean recall@5 = $mean%.3f " +
      f"(${qm.size} queries over ${cm.size} indexed)")
    // measured 0.920 minus a 0.07 regeneration margin (50-query mean)
    assert(mean >= 0.85, f"mean recall@5 $mean%.3f below the 0.85 gate")
    // rescore exactness: every returned score equals the brute-force
    // 6-dp cosine for that (query, neighbor) pair
    got.foreach { r =>
      val expect = BigDecimal(IvfIndex.cosineOf(
        qm(r.getLong(0)), cm(r.getLong(1))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(2) === expect)
    }
  }

  test("IVF knnJoinWith: held-out probe set — exact scores, mean " +
      "recall@5 >= 0.8 vs brute force") {
    import graft.sources.Tables
    import graft.operators.IvfIndex
    val vecs = Tables.embeddings(spark, sfDir)
    val queries = vecs.filter(col("vec_id") % 10 === 0)
    val corpus = vecs.filter(col("vec_id") % 10 =!= 0)
    val idx = IvfIndex.build(corpus, "vec_id", "embedding")
    val got = idx.knnJoinWith(queries, "vec_id", "embedding", k = 5)
      .collect()
    def embMap(df: org.apache.spark.sql.DataFrame) = df
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toMap
    val qm = embMap(queries); val cm = embMap(corpus)
    val exact = qm.map { case (qid, qv) =>
      qid -> cm.toSeq
        .map { case (cid, cv) =>
          (cid, BigDecimal(IvfIndex.cosineOf(qv, cv))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
        .sortBy { case (cid, cos) => (-cos, cid) }
        .take(5)
    }
    val gotBySrc = got.groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = exact.map { case (qid, nbrs) =>
      (gotBySrc.getOrElse(qid, Set.empty) &
        nbrs.map(_._1).toSet).size.toDouble / nbrs.size
    }
    val mean = recalls.sum / recalls.size
    info(f"IVF knnJoinWith held-out mean recall@5 = $mean%.3f " +
      f"(${qm.size} queries over ${cm.size} indexed, nprobe=16, cap=160)")
    // measured 0.828 — the old 0.8 floor IS measured-minus-margin here
    assert(mean >= 0.8, f"mean recall@5 $mean%.3f below the 0.8 gate")
    // rescore exactness on every returned pair
    got.foreach { r =>
      val expect = BigDecimal(IvfIndex.cosineOf(
        qm(r.getLong(0)), cm(r.getLong(1))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(2) === expect)
    }
    idx.close()
  }

  test("IVF-PQ knnJoinWith: held-out probe set — exact scores, mean " +
      "recall@5 >= 0.8 vs brute force") {
    import graft.sources.Tables
    import graft.operators.{IvfIndex, IvfPqIndex}
    val vecs = Tables.embeddings(spark, sfDir)
    val queries = vecs.filter(col("vec_id") % 10 === 0)
    val corpus = vecs.filter(col("vec_id") % 10 =!= 0)
    val idx = IvfPqIndex.build(corpus, "vec_id", "embedding")
    val got = idx.knnJoinWith(queries, "vec_id", "embedding", k = 5)
      .collect()
    def embMap(df: org.apache.spark.sql.DataFrame) = df
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toMap
    val qm = embMap(queries); val cm = embMap(corpus)
    val exact = qm.map { case (qid, qv) =>
      qid -> cm.toSeq
        .map { case (cid, cv) =>
          (cid, BigDecimal(IvfIndex.cosineOf(qv, cv))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
        .sortBy { case (cid, cos) => (-cos, cid) }
        .take(5)
    }
    val gotBySrc = got.groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = exact.map { case (qid, nbrs) =>
      (gotBySrc.getOrElse(qid, Set.empty) &
        nbrs.map(_._1).toSet).size.toDouble / nbrs.size
    }
    val mean = recalls.sum / recalls.size
    info(f"IVF-PQ knnJoinWith held-out mean recall@5 = $mean%.3f " +
      f"(${qm.size} queries over ${cm.size} indexed, nprobe=16, cap=192)")
    // measured 0.828 — the old 0.8 floor IS measured-minus-margin here
    assert(mean >= 0.8, f"mean recall@5 $mean%.3f below the 0.8 gate")
    got.foreach { r =>
      val expect = BigDecimal(IvfIndex.cosineOf(
        qm(r.getLong(0)), cm(r.getLong(1))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(2) === expect)
    }
    idx.close()
  }

  test("index-probed kNN join: exact scores, mean recall@5 >= 0.8 vs " +
      "the exact join") {
    import graft.sources.Tables
    val vecs = Tables.embeddings(spark, sfDir)
    val exactRows = SimilarityOps.knnJoin(vecs, "vec_id", "embedding", k = 5)
      .collect()
    val exact = exactRows.groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val ann = SimilarityOps.knnJoinAnn(vecs, "vec_id", "embedding", k = 5)
      .collect()
    val annBySrc = ann.groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = exact.map { case (src, nbrs) =>
      (annBySrc.getOrElse(src, Set.empty) & nbrs).size.toDouble / nbrs.size
    }
    val mean = recalls.sum / recalls.size
    info(f"index-probed kNN join mean recall@5 = $mean%.3f " +
      f"(16 tables x 4 planes, ${exact.size} sources)")
    // measured 0.888 minus a 0.05 regeneration margin (500-source mean
    // — the tightest-variance gate in the family)
    assert(mean >= 0.84, f"mean recall@5 $mean%.3f below the 0.84 gate")
    // rescore is exact, only the candidate SET is approximate: every
    // (src, dst) pair both joins return must carry the IDENTICAL
    // 6-dp-rounded cosine
    val exactScore = exactRows
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val overlap = ann.filter(r =>
      exactScore.contains((r.getLong(0), r.getLong(1))))
    assert(overlap.nonEmpty, "no overlapping pairs to score-check")
    overlap.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(r.getDouble(2) === exactScore(key),
        s"ann cos_sim for $key must equal the exact join's rounding")
    }
    // ranks are dense 1..|found| per source
    val bySrc = ann.filter(_.getLong(0) == ann.head.getLong(0))
      .sortBy(_.getInt(3))
    assert(bySrc.map(_.getInt(3)).toSeq === (1 to bySrc.length))
  }

  test("hardNegatives: never a positive or self, exact rescore, mean " +
      "recall@5 >= 0.8 vs the exact-kNN negatives") {
    import graft.sources.Tables
    val vecs = Tables.embeddings(spark, sfDir)
    val probeIds = (0L until 100L by 10L).toSeq
    val probes = vecs.filter(col("vec_id").isin(probeIds: _*))
    val positives = probes.select(col("vec_id").as("q"),
      (col("vec_id") + 1).as("p"))
    val got = SimilarityOps.hardNegatives(
      graft.operators.IvfIndex.forDir(spark, sfDir), probes,
      "vec_id", "embedding", positives, "q", "p", k = 5)
      .collect()
    val bySrc = got.groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(3))).toMap
    assert(bySrc.keySet === probeIds.toSet)
    val recalls = probeIds.map { q =>
      // exact reference: full cosine ranking minus self and the
      // declared positive — the mined set must mostly agree
      val exact = SimilarityOps.bruteForceTopK(spark, sfDir,
          probeId = q, k = 7).collect()
        .map(_.getLong(0)).filter(_ != q + 1).take(5).toSet
      val mined = bySrc(q).map(_.getLong(1)).toSet
      assert(!mined.contains(q), s"self leaked for $q")
      assert(!mined.contains(q + 1), s"declared positive leaked for $q")
      assert(mined.size === 5, s"short row for $q: $mined")
      (exact & mined).size.toDouble / exact.size
    }
    val mean = recalls.sum / recalls.size
    info(f"hard-negative mean recall@5 = $mean%.3f (10 probes)")
    assert(mean >= 0.8, f"mean recall@5 $mean%.3f below the 0.8 gate")
    // scores are exact rescored cosines: spot-check against the
    // brute-force scores of the same pairs
    val q0 = probeIds.head
    val exactScores = SimilarityOps.bruteForceTopK(spark, sfDir,
        probeId = q0, k = 50).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    bySrc(q0).foreach { r =>
      assert(exactScores.get(r.getLong(1)).forall(_ === r.getDouble(2)),
        s"rescore drift for ($q0, ${r.getLong(1)})")
    }
  }

  test("IVF auto cell-count policy: FAISS band in the middle, n/4 floor " +
      "clamp at tiny corpora, hard ceiling at extreme ones") {
    import graft.operators.IvfIndex.{autoCellCount, AutoCellCeiling}
    // tiny corpora: n/4 dominates (the band would over-segment)
    assert(autoCellCount(16) === 4)
    assert(autoCellCount(100) === 25)
    // the 4·√n band, within [8, n/4]
    assert(autoCellCount(10000) === 400)
    assert(autoCellCount(1000000) === 4000)
    // the ceiling binds from n ≈ 1.07×10⁹ (where 4·√n = 2¹⁷) upward:
    // the packed centroid-matrix row stays k·d·8 B = 64 MB at d = 64,
    // and BestCell's per-row argmax stays O(2¹⁷·d) — see the two-level
    // coarse-quantizer note on IvfIndex.build for the beyond-ceiling
    // design
    assert(autoCellCount(2000000000L) === AutoCellCeiling)
    assert(autoCellCount(100000000000L) === AutoCellCeiling)
    // monotone non-decreasing across the clamp joints
    val ns = Seq(8L, 32L, 1000L, 250000L, 1000000000L, 4000000000L)
    val ks = ns.map(autoCellCount)
    assert(ks === ks.sorted, s"policy must be monotone: $ns -> $ks")
    // a built index at gate scale actually uses the policy
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val n = emb.count()
    val ivf = graft.operators.IvfIndex.forDir(spark, sfDir)
    assert(ivf.nCells === autoCellCount(n))
    assert(ivf.nCells <= AutoCellCeiling)
  }

  test("two-level coarse assignment: deterministic, drop-free, and in " +
      "high agreement with the exact argmax (the beyond-ceiling path)") {
    import graft.operators.IvfIndex
    val e = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>")
        .as("embedding"))
    val n = e.count()
    val ivf = IvfIndex.forDir(spark, sfDir)
    val cdf = ivf.centroids
    def cellsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Int] =
      df.select("vec_id", "cell").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val two = cellsOf(IvfIndex.assignTwoLevel(e, cdf, ivf.nCells))
    // no vector may vanish at the member join (the empty-super-cell
    // trap: a super-centroid nearest to zero CELLS can still be some
    // VECTOR's best super-cell — ranking only non-empty super-cells
    // keeps the join total)
    assert(two.size === n)
    // deterministic end-to-end (hash seeds, decimal-exact means,
    // sorted packing)
    assert(cellsOf(IvfIndex.assignTwoLevel(e, cdf, ivf.nCells)) === two)
    // every assigned cell is a real cell
    val valid = cdf.select("cell").collect().map(_.getInt(0)).toSet
    assert(two.values.forall(valid))
    // agreement with the exact single-level argmax: two-level is
    // approximate BY DESIGN (a vector whose nearest cell sits in a
    // different super-cell lands in its own super-cell's best member),
    // but at √k super-cells the disagreement is the IMI-style tail,
    // not the norm
    val one = cellsOf(IvfIndex.assign(e, cdf, ivf.nCells))
    val agree = two.count { case (id, c) => one(id) == c }.toDouble / n
    info(f"two-level vs exact argmax agreement = $agree%.3f " +
      f"($n vectors, ${ivf.nCells} cells)")
    // measured 0.652 minus a 0.07 regeneration margin
    assert(agree >= 0.58, f"two-level agreement $agree%.3f — the " +
      "super-quantizer is mis-routing most vectors")
    // the assign() switch takes the two-level path past the threshold
    // and the packed single-row path below it
    val switched = cellsOf(IvfIndex.assign(e, cdf, ivf.nCells,
      twoLevelAbove = 1))
    assert(switched === two)
  }

  test("int8 quantization round-trip: per-dimension error bounded by " +
    "scale/2, corpus cosine fidelity >= 0.999, constant vectors exact, " +
    "and top-10 cosine neighbors survive the round trip") {
    import spark.implicits._
    val vecs = graft.sources.Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding")
    val rt = graft.operators.SimilarityOps.dequantizeEmbeddings(
      graft.operators.SimilarityOps.quantizeEmbeddings(vecs, "embedding"))
    // per-dimension reconstruction error ≤ scale/2 + float slop
    val bad = rt.select(col("vec_id"), col("q8_scale"),
        explode(zip_with(col("embedding"), col("dq"),
          (a, b) => abs(a - b))).as("err"))
      .filter(col("err") > col("q8_scale") / 2 + lit(1e-9)).count()
    assert(bad === 0L, s"$bad dimensions exceed the scale/2 bound")
    // corpus-level report: fidelity + the advertised compression
    val rep = graft.operators.SimilarityOps
      .quantReport(vecs, "vec_id", "embedding").collect()(0)
    assert(rep.getAs[Double]("mean_cosine") >= 0.999,
      s"mean round-trip cosine ${rep.getAs[Double]("mean_cosine")}")
    assert(rep.getAs[Double]("min_cosine") >= 0.99,
      s"min round-trip cosine ${rep.getAs[Double]("min_cosine")}")
    assert(rep.getAs[Double]("compression_x") >= 6.0)
    // constant vector decodes EXACTLY (scale = 0 path)
    val const = Seq((1L, Seq.fill(8)(0.25))).toDF("vec_id", "embedding")
    val cdq = graft.operators.SimilarityOps.dequantizeEmbeddings(
      graft.operators.SimilarityOps.quantizeEmbeddings(const,
        "embedding"))
      .select(explode(col("dq"))).collect().map(_.getDouble(0))
    assert(cdq.forall(_ === 0.25))
    // retrieval survives: top-10 of a probe under original vs
    // round-tripped vectors overlaps >= 8/10
    val probe = vecs.filter(col("vec_id") === 0L)
      .select(col("embedding").as("pe"))
    def top10(d: org.apache.spark.sql.DataFrame, emb: String) =
      d.crossJoin(broadcast(probe))
        .filter(col("vec_id") =!= 0L)
        .select(col("vec_id"),
          graft.operators.SimilarityOps.cosine(col(emb), col("pe"))
            .as("c"))
        .orderBy(col("c").desc, col("vec_id")).limit(10)
        .collect().map(_.getLong(0)).toSet
    val orig = top10(vecs, "embedding")
    // probe vector itself also round-trips through the quantizer
    val rtProbe = rt.select(col("vec_id"), col("dq").as("embedding"))
    val quant = top10(rtProbe, "embedding")
    assert((orig & quant).size >= 8,
      s"quantized top-10 lost too much: ${(orig & quant).size}/10")
  }

  test("mmrRerank edges (r17 single-pass internals): short candidate " +
    "lists stop early, null-rel candidates rank last with null score, " +
    "and exact score ties break toward the smaller cid") {
    import spark.implicits._
    // fewer candidates than k: emit exactly n rows, ranks 1..n
    val short = Seq((1L, 10L, 0.9, Seq(1.0, 0.0)))
      .toDF("qid", "cid", "rel", "emb")
    val s = SimilarityOps.mmrRerank(short, "qid", "cid", "rel", "emb",
      k = 3, lambda = 0.7).collect()
    assert(s.length === 1 && s.head.getLong(1) === 10L &&
      s.head.getAs[Int]("rank") === 1)
    // null rel: score is null, ranked after every scored candidate
    // (desc-nulls-last), still emitted when it is all that remains
    val withNull = Seq(
      (1L, 10L, Some(0.9), Seq(1.0, 0.0)),
      (1L, 11L, None: Option[Double], Seq(0.0, 1.0)))
      .toDF("qid", "cid", "rel", "emb")
    val n = SimilarityOps.mmrRerank(withNull, "qid", "cid", "rel",
      "emb", k = 2, lambda = 0.7).collect()
    assert(n.map(_.getLong(1)).toSeq === Seq(10L, 11L))
    assert(!n(0).isNullAt(4) && n(1).isNullAt(4),
      "null rel must carry a null score, ranked last")
    // exact tie (identical rel, orthogonal embeddings): smaller cid
    // first — the r16 window's (score desc, cid asc) order
    val tie = Seq(
      (1L, 21L, 0.5, Seq(1.0, 0.0)),
      (1L, 20L, 0.5, Seq(0.0, 1.0)))
      .toDF("qid", "cid", "rel", "emb")
    val t = SimilarityOps.mmrRerank(tie, "qid", "cid", "rel", "emb",
      k = 2, lambda = 0.7).collect()
    assert(t.map(_.getLong(1)).toSeq === Seq(20L, 21L))
  }

  test("mmrRerank equals the brute-force greedy on a seeded fixture " +
    "and prefers a diverse candidate over a near-duplicate") {
    import spark.implicits._
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum))
    }
    // hand fixture: A and B near-identical high-rel, C diverse mid-rel
    val eA = Seq(1.0, 0.0, 0.0)
    val eB = Seq(0.999, 0.04, 0.0)
    val eC = Seq(0.0, 1.0, 0.0)
    val hand = Seq((1L, 10L, 0.95, eA), (1L, 11L, 0.94, eB),
      (1L, 12L, 0.60, eC)).toDF("qid", "cid", "rel", "emb")
    val got = SimilarityOps.mmrRerank(hand, "qid", "cid", "rel",
      "emb", 3, 0.7).collect()
    assert(got.map(_.getLong(1)).toSeq === Seq(10L, 12L, 11L),
      "rank 1 = top rel, rank 2 = the diverse C, near-dup B last")
    assert(got.map(_.getAs[Int]("rank")).toSeq === Seq(1, 2, 3))
    // brute-force greedy equality on a seeded 2-query fixture
    val rnd = new scala.util.Random(41)
    val cands = (1 to 2).flatMap { q =>
      (0 until 20).map { c =>
        (q.toLong, c.toLong, math.round(rnd.nextDouble() * 1e6) / 1e6,
          Seq.fill(4)(rnd.nextGaussian()))
      }
    }
    val df = cands.toDF("qid", "cid", "rel", "emb")
    val k = 6; val lam = 0.7
    val got2 = SimilarityOps.mmrRerank(df, "qid", "cid", "rel",
      "emb", k, lam).collect()
    cands.groupBy(_._1).foreach { case (q, rows) =>
      var rem = rows.toList
      var sel = List.empty[(Long, Seq[Double])]
      val exp = (1 to k).map { _ =>
        val scored = rem.map { case (_, cid, rel, e) =>
          val ms = if (sel.isEmpty) 0.0
            else sel.map(s => cos(e, s._2)).max
          val sc = math.round((lam * rel - (1 - lam) * ms) * 1e6) / 1e6
          (cid, sc, e)
        }
        val best = scored.minBy { case (cid, sc, _) => (-sc, cid) }
        sel = sel :+ (best._1, best._3)
        rem = rem.filterNot(_._2 == best._1)
        best._1
      }
      val gotQ = got2.filter(_.getLong(0) == q)
        .sortBy(_.getAs[Int]("rank")).map(_.getLong(1)).toSeq
      assert(gotQ === exp, s"query $q greedy mismatch")
    }
  }

  test("q_mmr (registered query): equals the driver brute-force " +
    "greedy on the real corpus — candidates, ranks, and scores") {
    // r15 verdict item 8: the registered board entry itself gets an
    // exact floor, not just the unit fixture. Mirrors the
    // registration exactly: probes vec_id < 5, per-probe cosine
    // top-30 by (rel desc, cid), k = 10, lambda 0.7, with Spark's
    // round-6 (HALF_UP on the double's shortest decimal string)
    // reproduced via BigDecimal.valueOf.
    def r6(x: Double): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val vecs = graft.sources.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("e"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val lam = 0.7; val k = 10
    val expected = vecs.filter(_._1 < 5).sortBy(_._1).flatMap {
      case (qid, pe) =>
        val cands = vecs.filter(_._1 != qid)
          .map { case (cid, e) => (cid, r6(cos(e, pe)), e) }
          .sortBy { case (cid, rel, _) => (-rel, cid) }
          .take(30)
        var rem = cands.toList
        var sel = List.empty[Array[Double]]
        (1 to k).map { rank =>
          val best = rem.map { case (cid, rel, e) =>
            val ms = if (sel.isEmpty) 0.0 else sel.map(cos(e, _)).max
            (cid, r6(lam * rel - (1 - lam) * ms), rel, e)
          }.minBy { case (cid, sc, _, _) => (-sc, cid) }
          sel = sel :+ best._4
          rem = rem.filterNot(_._1 == best._1)
          (qid, best._1, rank, r6(best._3), best._2)
        }
    }.toSeq
    val got = SparkEntry.queries("q_mmr")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(got === expected,
      "registered q_mmr diverges from driver greedy")
  }
}
