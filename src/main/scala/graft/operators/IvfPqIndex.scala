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
  * The COARSE quantizer is a k-row `(cell, centroid)` DataFrame shared
  * with [[IvfIndex]] (r7): assignment and the batch fan-out reach it
  * relationally (broadcast matrix + [[graft.functions.BestCell]],
  * broadcast join + partial top-nprobe), so plan size and driver
  * memory stay O(1) as the k ≈ √n sizing grows cells with the corpus.
  * The RESIDUAL codebook stays a driver-side literal by design: its
  * size is a fixed constant (subspaces × centroidsPerSub subvectors,
  * 8×16 by default) independent of corpus and cell count.
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
final case class IvfPqIndex(cells: DataFrame, centroids: DataFrame,
    nCells: Int, codebook: Seq[Seq[Seq[Double]]], size: Long)
    extends VectorIndex {

  private[graft] override def backing: DataFrame = cells

  /** [[VectorIndex]] probe at the default cell/rescore budget. */
  override def knnJoinWith(queries: DataFrame, idCol: String,
      embCol: String, k: Int): DataFrame =
    knnJoinWith(queries, idCol, embCol, k, nprobe = 0)

  import graft.functions.VectorOps

  /** Driver copy of the coarse quantizer — tests/tooling only (see
    * [[IvfIndex.centroidArrays]]). */
  def centroidArrays: Seq[Seq[Double]] =
    centroids.orderBy("cell").collect()
      .map(_.getSeq[Double](1).toSeq).toSeq

  // Point-probe cell ranking + the per-cell IP(q, centroid) constants,
  // in ONE tiny job over the k-row centroid table (the probe vector is
  // the only literal).
  private def probeCells(v: Seq[Double], nprobe: Int): Seq[(Int, Double)] = {
    VectorOps.register(centroids.sparkSession)
    val cd = col("centroid").cast("array<double>")
    centroids
      .select(col("cell"), VectorOps.cosine(cd, typedLit(v)).as("c"),
        VectorOps.dot(cd, typedLit(v)).as("d"))
      .orderBy(col("c").desc, col("cell"))
      .limit(nprobe).select("cell", "d")
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toSeq
  }

  // nprobe <= 0 defaults: nCells/2 for the point probe (the measured
  // §PQ/IVFPQ frontier), nCells/4 for the batch join (finer auto-sized
  // cells hold the recall gate at a 25% scan — §IVF cells).
  private def effNprobe(nprobe: Int, den: Int): Int =
    math.min(math.max(1, if (nprobe > 0) nprobe else nCells / den), nCells)

  /** The probe's residual-codebook lookup table — the shared
    * [[PqIndex.lutOf]] layout over the residual codebook. */
  private def lutOf(probe: Seq[Double]): Seq[Double] =
    PqIndex.lutOf(probe, codebook)

  /** Top-k neighbors of an external query vector. `nprobe <= 0` =
    * nCells/2 (the measured-frontier default). */
  def topKVec(probe: Seq[Double], k: Int = 10, nprobe: Int = 0,
      rescoreCap: Int = 192): DataFrame =
    rankScan(cells, probe, k, effNprobe(nprobe, 2), rescoreCap)

  /** Top-k neighbors of an indexed vector (excludes the probe). */
  def topK(probeId: Long, k: Int = 10, nprobe: Int = 0,
      rescoreCap: Int = 192): DataFrame = {
    val probe = cells.filter(col("vec_id") === probeId)
      .select("embedding").head().getSeq[Double](0)
    rankScan(cells.filter(col("vec_id") =!= probeId), probe, k,
      effNprobe(nprobe, 2), rescoreCap)
  }

  private def rankScan(from: DataFrame, probe: Seq[Double], k: Int,
      nprobe: Int, rescoreCap: Int): DataFrame = {
    val pc = probeCells(probe, nprobe)
    // per-cell constant IP(q, centroid) rides a literal map over the
    // nprobe PROBED cells only; the residual table is one literal
    // shared by every probed cell
    val consts: Map[Int, Double] = pc.toMap
    val scanned = from.filter(col("cell").isin(pc.map(_._1): _*))
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
    * each query ranks the cells RELATIONALLY (broadcast join against
    * the k-row centroid table + [[SimilarityOps.topKPerSrc]] partial
    * top-nprobe — no literal centroid array, no per-row sort, plan
    * size O(1) in the cell count), fans out to its `nprobe` cells
    * carrying its per-row ADC table (one [[graft.functions.PqLut]]
    * pass — subspaces×centroids dots ONCE per query, not per
    * candidate) and the per-cell constant IP(q, centroid) (computed on
    * the fan-out row from the broadcast-joined centroid), stage 1
    * equi-joins on the cell key touching only (vec_id, cell, pqcode)
    * and scores `PqAdc(code, lut) + IP(q, centroid)` (the residual
    * decomposition), [[SimilarityOps.topKPerSrc]] trims to
    * `rescorePerQuery` before the shuffle, and stage 2 exact-rescores
    * the shortlist. No cartesian over the corpus (the only
    * nested-loop node is the k-row centroid fan-out); candidate bytes
    * are nprobe/k_cells of the corpus per query in CODE bytes. Ids
    * must be integral; indexed queries return themselves at cos 1.
    * `nprobe <= 0` = nCells/4 (the finer
    * auto-sized cells hold the gate at a 25% scan). Recall gated
    * held-out in SimilaritySpec, no SQL oracle. */
  def knnJoinWith(queries: DataFrame, idCol: String, embCol: String,
      k: Int, nprobe: Int = 0, rescorePerQuery: Int = 192): DataFrame = {
    import graft.functions.{VectorOps => V}
    IvfIndex.cellFanoutKnn(cells, centroids, queries, idCol, embCol,
      k, effNprobe(nprobe, 4), rescorePerQuery,
      codeCols = Seq("pqcode"),
      // the ADC table is computed ONCE PER QUERY on the query side of
      // the fan-out join (post-join it would rerun the
      // subspaces×centroids pass once per fan-out ROW); only the
      // per-(query, cell) centroid dot legitimately rides the fan-out
      perQuery = qe => qe.select(col("src_id"), col("se"),
        V.pqLut(col("se"), codebook).as("qlut")),
      fanout = (fan, qp) => fan.join(qp, "src_id")
        .join(broadcast(centroids), "cell")
        .withColumn("cconst",
          V.dot(col("se"), col("centroid").cast("array<double>")))
        .select("src_id", "qlut", "cconst", "cell"),
      stage1 = V.pqAdcCol(col("pqcode"), col("qlut")) + col("cconst"))
  }

  /** Grow the index with a new vector batch WITHOUT retraining either
    * quantizer level — the standard IVF-PQ ingest (the
    * [[IvfIndex.append]] fixed-quantizer stance): arrivals are
    * assigned to the EXISTING cells, their residuals encoded under the
    * EXISTING codebook, and the rows unioned onto the index; the
    * stamped size grows. Quantizer drift accumulates as the corpus
    * shifts — re-run [[IvfPqIndex.build]] to retrain when recall
    * sags. */
  override def append(newVectors: DataFrame, idCol: String,
      embCol: String): IvfPqIndex = {
    val e = newVectors.select(col(idCol).as("vec_id"),
      col(embCol).cast("array<double>").as("embedding"))
    val n = e.count()
    IvfPqIndex(cells.unionByName(IvfPqIndex.encode(e, centroids, nCells, codebook)),
      centroids, nCells, codebook, size + n)
  }

  /** Persist the index bucketed by cell (a probe's IN-filter reads
    * only its nprobe buckets) plus a `_meta` sidecar holding BOTH
    * quantizer levels — coarse centroids (`kind = 'cell'`) and the
    * residual codebook (`kind = 'pq'`) — and the stamped size, so
    * [[IvfPqIndex.fromTable]] reopens the pair with no out-of-band
    * state. */
  def writeTable(table: String, buckets: Int = 32): Unit = {
    graft.sources.Warehouse.writeBucketed(cells, table, "cell", buckets)
    graft.sources.Warehouse.overwriteSelfRead(metaRows(size),
      table + "_meta")
  }

  /** Append a new batch to a bucketed index table written by
    * [[writeTable]] — encoding under THIS handle's quantizers, same
    * bucket spec, sidecar size updated. Refuses a handle whose
    * quantizers do not match the table's sidecar (rows encoded under
    * different centroids/codebooks would corrupt every future
    * probe). */
  def appendTable(table: String, newVectors: DataFrame, idCol: String,
      embCol: String, buckets: Int = 32): Unit = {
    val spark = cells.sparkSession
    val e = newVectors.select(col(idCol).as("vec_id"),
      col(embCol).cast("array<double>").as("embedding"))
    val n = e.count()
    val side = spark.table(table + "_meta").select("kind", "i", "j", "centroid")
    val ours = metaRows(size).select("kind", "i", "j", "centroid")
    require(side.exceptAll(ours).isEmpty && ours.exceptAll(side).isEmpty,
      s"this handle's quantizers do not match ${table}_meta — appendTable " +
        "must run through a handle of the index that wrote the table " +
        "(IvfPqIndex.fromTable reopens one)")
    val durable = spark.table(table + "_meta")
      .agg(max(col("n"))).head().getLong(0)
    IvfPqIndex.encode(e, centroids, nCells, codebook)
      .write.mode("append").format("parquet")
      .bucketBy(buckets, "cell").sortBy("cell").saveAsTable(table)
    // staged: a fromTable handle's centroid frame READS the sidecar it
    // restamps here — a direct overwrite throws (Warehouse doc)
    graft.sources.Warehouse.overwriteSelfRead(metaRows(durable + n),
      table + "_meta")
  }

  // Sidecar rows at a given stamped size: k-row 'cell' kind from the
  // centroid table, constant-sized 'pq' kind from the codebook literal.
  private def metaRows(n: Long): DataFrame = {
    val spark = cells.sparkSession
    import spark.implicits._
    val cellRows = centroids.select(lit("cell").as("kind"),
      col("cell").as("i"), lit(0).as("j"), col("centroid"), lit(n).as("n"))
    val pqRows = codebook.zipWithIndex.flatMap { case (cents, s) =>
      cents.zipWithIndex.map { case (c, j) => ("pq", s, j, c, n) }
    }.toDF("kind", "i", "j", "centroid", "n")
    cellRows.unionByName(pqRows)
  }

  /** Release the index's executor storage. The k-row centroid table is
    * deliberately left cached (see [[IvfIndex.close]] — plan-equal
    * siblings may share the entry). */
  def close(): Unit = cells.unpersist(blocking = false)
}

object IvfPqIndex {

  // Residual-encode a (vec_id, embedding) frame under an existing
  // coarse quantizer + residual codebook: relational assignment
  // (broadcast matrix + BestCell), residual via the broadcast-joined
  // centroid, PQ codes via the native generated loop. Shared by build,
  // append, and appendTable so the encoding cannot drift between them.
  private[operators] def encode(e: DataFrame, cdf: DataFrame,
      k: Int, cb: Seq[Seq[Seq[Double]]]): DataFrame = {
    graft.functions.VectorOps.register(e.sparkSession)
    IvfIndex.assign(e, cdf, k)
      .join(broadcast(cdf), "cell")
      .withColumn("pqcode", graft.functions.VectorOps.pqEncode(
        zip_with(col("embedding"), col("centroid").cast("array<double>"),
          (a, b) => a - b), cb))
      .select("vec_id", "embedding", "cell", "pqcode")
  }

  /** Two-level deterministic build: the [[IvfIndex]] coarse quantizer
    * first (its k ≈ √n cell-count policy applies unchanged — see
    * [[IvfIndex.build]]), then a [[PqIndex.trainCodebook]] residual
    * codebook over `embedding − centroid(cell)` and the residual codes
    * stored next to each row's cell id. */
  def build(vectors: DataFrame, idCol: String, embCol: String,
      kCells: Int = 0, subspaces: Int = 8, centroidsPerSub: Int = 16,
      iters: Int = 2, persist: Boolean = true): IvfPqIndex = {
    graft.functions.VectorOps.register(vectors.sparkSession)
    // persist = false: the inner inverted file is a build-time
    // intermediate here. Persisting it would either leak a
    // corpus-sized cache entry per build, or — since Spark's cache
    // manager keys storage by PLAN EQUALITY — share an entry with a
    // session-cached IvfIndex of the same corpus that a cleanup here
    // would then evict (the measured 15× q_sim_ivf probe trap). The
    // residual frame below (a plan unique to this build) carries the
    // working set instead.
    // sketch = false: this index stores PQ codes where IvfIndex stores
    // its 256-bit sketch — computing a sketch column only to drop it
    // would double the build's per-row CPU
    val ivf = IvfIndex.build(vectors, idCol, embCol, kCells, iters,
      persist = false, sketch = false)
    val resid = ivf.cells
      .join(broadcast(ivf.centroids), "cell")
      .withColumn("graft_resid",
        zip_with(col("embedding"), col("centroid").cast("array<double>"),
          (a, b) => a - b))
      .drop("centroid")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val cb = PqIndex.trainCodebook(resid, "graft_resid", subspaces,
      centroidsPerSub, iters)
    val raw = resid
      .withColumn("pqcode",
        graft.functions.VectorOps.pqEncode(col("graft_resid"), cb))
      .select("vec_id", "embedding", "cell", "pqcode")
    // `persist = false` for one-shot consumers (the SQL knn_join's
    // ad-hoc build) — a handle nobody closes must not pin a
    // corpus-sized cache entry for the session lifetime
    val cells = if (persist) raw.persist(StorageLevel.MEMORY_AND_DISK)
      else raw
    if (persist)
      cells.count() // materialize before releasing the training frame
    resid.unpersist(blocking = false)
    IvfPqIndex(cells, ivf.centroids, ivf.nCells, cb, ivf.size)
  }

  /** Reopen a bucketed index table + `_meta` sidecar written by
    * [[IvfPqIndex.writeTable]]. */
  def fromTable(spark: SparkSession, table: String): IvfPqIndex = {
    // fresh sessions must be able to probe the reopened index
    graft.functions.VectorOps.register(spark)
    require(spark.catalog.tableExists(table + "_meta"),
      s"missing sidecar table ${table}_meta — was the index written by " +
        "IvfPqIndex.writeTable?")
    val meta = spark.table(table + "_meta")
    val cellMeta = meta.filter(col("kind") === "cell")
    val stats = cellMeta.agg(count(lit(1)), max(col("n"))).head()
    require(stats.getLong(0) > 0,
      s"sidecar table ${table}_meta has no 'cell' rows — was the index " +
        "written by IvfPqIndex.writeTable?")
    val pqRows = meta.filter(col("kind") === "pq")
      .select("i", "j", "centroid").collect()
    require(pqRows.nonEmpty,
      s"sidecar table ${table}_meta has no 'pq' rows — was the index " +
        "written by IvfPqIndex.writeTable?")
    val cb = pqRows.groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map { case (_, rows) =>
        rows.sortBy(_.getInt(1)).map(_.getSeq[Double](2).toSeq).toSeq
      }
    IvfPqIndex(spark.table(table),
      cellMeta.select(col("i").as("cell"), col("centroid")),
      stats.getLong(0).toInt, cb, stats.getLong(1))
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
