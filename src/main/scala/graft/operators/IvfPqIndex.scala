package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** IVF-PQ — the coarse quantizer ([[IvfIndex]] cells) composed with
  * product-quantized RESIDUALS ([[PqIndex]] codes): the canonical
  * billion-scale ANN layout (FAISS's IVFPQ; PAPERS.md
  * similarity-search family). Every vector stores its cell id and the
  * PQ codes of `embedding − centroid(cell)`; a probe prunes to its
  * `nprobe` nearest cells and ranks ONLY the 8-code column inside
  * them — cell pruning cuts the rows scanned, PQ cuts the bytes per
  * row, and the two multiply.
  *
  * Scoring uses the inner-product decomposition
  * `IP(q, x) ≈ IP(q, c) + IP(q, r̂)`: the residual-codebook lookup
  * table is CELL-INDEPENDENT (one table per probe, laid out exactly
  * as [[PqIndex]]'s), and the per-cell term is a constant added
  * through a literal map on the cell id — so the probe plan stays a
  * literal IN-filter (prunable on a cell-bucketed layout) + one
  * narrow scan + TakeOrderedAndProject, no join before the rescore.
  * The best `rescoreCap` candidates are exactly rescored by cosine
  * (the cap is ABSOLUTE — the [[IvfIndex.topKAuto]] scale stance).
  *
  * Deterministic end to end: hash-seeded IVF centroids, hash-seeded
  * residual codebook, DECIMAL-exact means everywhere — both levels
  * bit-reproducible with no stored RNG state. Approximate by design:
  * recall-gated in SimilaritySpec, no SQL oracle.
  */
final case class IvfPqIndex(cells: DataFrame, centroids: Seq[Seq[Double]],
    codebook: Seq[Seq[Seq[Double]]], size: Long) {

  import graft.functions.VectorOps

  private def nearestCells(v: Seq[Double], nprobe: Int): Seq[Int] =
    centroids.zipWithIndex
      .map { case (c, i) => i -> IvfIndex.cosineOf(v, c) }
      .sortBy { case (i, cos) => (-cos, i) }
      .take(nprobe).map(_._1)

  /** The probe's residual-codebook lookup table — the shared
    * [[PqIndex.lutOf]] layout over the residual codebook. */
  private def lutOf(probe: Seq[Double]): Seq[Double] =
    PqIndex.lutOf(probe, codebook)

  /** Top-k neighbors of an external query vector. */
  def topKVec(probe: Seq[Double], k: Int = 10, nprobe: Int = 16,
      rescoreCap: Int = 192): DataFrame =
    rankScan(cells, probe, k, nprobe, rescoreCap)

  /** Top-k neighbors of an indexed vector (excludes the probe). */
  def topK(probeId: Long, k: Int = 10, nprobe: Int = 16,
      rescoreCap: Int = 192): DataFrame = {
    val probe = cells.filter(col("vec_id") === probeId)
      .select("embedding").head().getSeq[Double](0)
    rankScan(cells.filter(col("vec_id") =!= probeId), probe, k, nprobe,
      rescoreCap)
  }

  private def rankScan(from: DataFrame, probe: Seq[Double], k: Int,
      nprobe: Int, rescoreCap: Int): DataFrame = {
    val pc = nearestCells(probe, math.min(math.max(1, nprobe),
      centroids.size))
    // per-cell constant IP(q, centroid) rides a literal map; the
    // residual table is one literal shared by every probed cell
    val consts: Map[Int, Double] =
      pc.map(c => c -> probe.iterator.zip(centroids(c).iterator)
        .map { case (a, b) => a * b }.sum).toMap
    val scanned = from.filter(col("cell").isin(pc: _*))
    val cand = scanned
      .select(col("vec_id"),
        (VectorOps.pqAdc(col("pqcode"), lutOf(probe)) +
          element_at(typedLit(consts), col("cell"))).as("adc"))
      .orderBy(col("adc").desc, col("vec_id"))
      .limit(rescoreCap)
      .select("vec_id")
    scanned.join(cand, "vec_id") // rescoreCap rows — broadcast-sized
      .select(col("vec_id"),
        round(VectorOps.cosine(col("embedding"),
          typedLit(probe)), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Approximate kNN JOIN of an EXTERNAL query set through the IVF-PQ
    * layout — the batch-serving shape on the strongest index (the twin
    * of [[IvfIndex.knnJoinWith]], with PQ codes replacing the sketch):
    * each query ranks the literal centroids in-row, fans out to its
    * `nprobe` cells carrying its per-row ADC table (one
    * [[graft.functions.PqLut]] pass — subspaces×centroids dots ONCE
    * per query, not per candidate), stage 1 equi-joins on the cell key
    * touching only (vec_id, cell, pqcode) and scores `PqAdc(code,
    * lut) + IP(q, centroid)` (the residual decomposition — the cell
    * term rides the fan-out row), [[SimilarityOps.topKPerSrc]] trims
    * to `rescorePerQuery` before the shuffle, and stage 2
    * exact-rescores the shortlist. No cartesian; candidate bytes are
    * nprobe/k_cells of the corpus per query in CODE bytes. Ids must be
    * integral; indexed queries return themselves at cos 1. Recall
    * gated held-out in SimilaritySpec, no SQL oracle. */
  def knnJoinWith(queries: DataFrame, idCol: String, embCol: String,
      k: Int, nprobe: Int = 16, rescorePerQuery: Int = 192): DataFrame = {
    import graft.functions.{VectorOps => V}
    V.register(cells.sparkSession)
    val qe = queries.select(col(idCol).as("src_id"),
      col(embCol).cast("array<double>").as("se"))
    val scoredCells = array(centroids.zipWithIndex.map { case (c, i) =>
      struct((-round(V.cosine(col("se"), typedLit(c)), 9)).as("negCos"),
        lit(i).as("cell"))
    }: _*)
    val fanout = qe
      .withColumn("qlut", V.pqLut(col("se"), codebook))
      .select(col("src_id"), col("qlut"), col("se"),
        explode(slice(array_sort(scoredCells), 1,
          math.min(math.max(1, nprobe), centroids.size)).getField("cell"))
          .as("cell"))
      .withColumn("cconst", V.dot(col("se"),
        element_at(typedLit(centroids: Seq[Seq[Double]]), col("cell") + 1)))
      .select("src_id", "qlut", "cconst", "cell")
    val cand = fanout
      .join(cells.select(col("cell"), col("vec_id").as("dst_id"),
        col("pqcode")), Seq("cell"))
      .select(col("src_id"), col("dst_id"),
        (V.pqAdcCol(col("pqcode"), col("qlut")) + col("cconst")).as("s1"))
    val shortlist = SimilarityOps.topKPerSrc(cand, "s1", rescorePerQuery)
      .select("src_id", "dst_id")
    val edges = shortlist
      .join(cells.select(col("vec_id").as("dst_id"),
        col("embedding").as("de")), "dst_id")
      .join(qe, "src_id")
      .select(col("src_id"), col("dst_id"),
        round(V.cosine(col("se"), col("de")), 6).as("cos_sim"))
    SimilarityOps.topKPerSrc(edges, "cos_sim", k)
  }

  /** Persist the index bucketed by cell (a probe's IN-filter reads
    * only its nprobe buckets) plus a `_meta` sidecar holding BOTH
    * quantizer levels — coarse centroids (`kind = 'cell'`) and the
    * residual codebook (`kind = 'pq'`) — and the stamped size, so
    * [[IvfPqIndex.fromTable]] reopens the pair with no out-of-band
    * state. */
  def writeTable(table: String, buckets: Int = 32): Unit = {
    graft.sources.Warehouse.writeBucketed(cells, table, "cell", buckets)
    val spark = cells.sparkSession
    import spark.implicits._
    val cellRows = centroids.zipWithIndex.map { case (c, i) =>
      ("cell", i, 0, c, size)
    }
    val pqRows = codebook.zipWithIndex.flatMap { case (cents, s) =>
      cents.zipWithIndex.map { case (c, j) => ("pq", s, j, c, size) }
    }
    (cellRows ++ pqRows).toDF("kind", "i", "j", "centroid", "n")
      .write.mode("overwrite").format("parquet").saveAsTable(table + "_meta")
  }

  /** Release the index's executor storage. */
  def close(): Unit = cells.unpersist(blocking = false)
}

object IvfPqIndex {

  /** Two-level deterministic build: the [[IvfIndex]] coarse quantizer
    * first, then a [[PqIndex.trainCodebook]] residual codebook over
    * `embedding − centroid(cell)` and the residual codes stored next
    * to each row's cell id. The cell-count caveat of
    * [[IvfIndex.build]] applies unchanged (k ≈ √n beyond test
    * scale). */
  def build(vectors: DataFrame, idCol: String, embCol: String,
      kCells: Int = 32, subspaces: Int = 8, centroidsPerSub: Int = 16,
      iters: Int = 2): IvfPqIndex = {
    graft.functions.VectorOps.register(vectors.sparkSession)
    // persist = false: the inner inverted file is a build-time
    // intermediate here. Persisting it would either leak a
    // corpus-sized cache entry per build, or — since Spark's cache
    // manager keys storage by PLAN EQUALITY — share an entry with a
    // session-cached IvfIndex of the same corpus that a cleanup here
    // would then evict (the measured 15× q_sim_ivf probe trap). The
    // residual frame below (a plan unique to this build) carries the
    // working set instead.
    val ivf = IvfIndex.build(vectors, idCol, embCol, kCells, iters,
      persist = false)
    val resid = ivf.cells.withColumn("graft_resid",
      zip_with(col("embedding"),
        element_at(typedLit(ivf.centroids), col("cell") + 1),
        (a, b) => a - b))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val cb = PqIndex.trainCodebook(resid, "graft_resid", subspaces,
      centroidsPerSub, iters)
    val cells = resid
      .withColumn("pqcode",
        graft.functions.VectorOps.pqEncode(col("graft_resid"), cb))
      .drop("graft_resid", "sketch")
      .persist(StorageLevel.MEMORY_AND_DISK)
    cells.count() // materialize before releasing the training frame
    resid.unpersist(blocking = false)
    IvfPqIndex(cells, ivf.centroids, cb, ivf.size)
  }

  /** Reopen a bucketed index table + `_meta` sidecar written by
    * [[IvfPqIndex.writeTable]]. */
  def fromTable(spark: SparkSession, table: String): IvfPqIndex = {
    // fresh sessions must be able to probe the reopened index
    graft.functions.VectorOps.register(spark)
    val meta = spark.table(table + "_meta").collect()
    require(meta.nonEmpty, s"missing sidecar table ${table}_meta — was " +
      "the index written by IvfPqIndex.writeTable?")
    val byKind = meta.groupBy(_.getString(0))
    val cents = byKind.getOrElse("cell", Array.empty)
      .sortBy(_.getInt(1)).map(_.getSeq[Double](3).toSeq).toSeq
    val cb = byKind.getOrElse("pq", Array.empty)
      .groupBy(_.getInt(1)).toSeq.sortBy(_._1).map { case (_, rows) =>
        rows.sortBy(_.getInt(2)).map(_.getSeq[Double](3).toSeq).toSeq
      }
    IvfPqIndex(spark.table(table), cents, cb, meta.head.getLong(4))
  }

  // Evicts on invalidate() and on session end (see IndexCache).
  private val cache = new IndexCache[IvfPqIndex](
    (spark, sfDir) => build(graft.sources.Tables.embeddings(spark, sfDir),
      "vec_id", "embedding"),
    _.close())

  /** The cached IVF-PQ index of a test-data corpus dir. */
  def forDir(spark: SparkSession, sfDir: String): IvfPqIndex =
    cache.get(spark, sfDir)

  /** Drop and unpersist the cached index of one corpus dir. */
  def invalidate(spark: SparkSession, sfDir: String): Unit =
    cache.invalidate(spark, sfDir)

  /** Drop and unpersist every cached index of a session. */
  def invalidateAll(spark: SparkSession): Unit = cache.invalidateAll(spark)
}
