package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** IVF (inverted-file) ANN index — the coarse-quantizer alternative to
  * the hyperplane-LSH [[AnnIndex]] (the north-star names both; IVF is
  * the shape FAISS-style systems use at scale).
  *
  * Build: k centroids are seeded DETERMINISTICALLY (the k vectors with
  * the smallest `xxhash64(vec_id)` — a salted hash stands in for an RNG,
  * as everywhere in this engine) and refined with a fixed number of
  * Lloyd iterations. Every distributed reduction in the refinement sums
  * in DECIMAL(38,18), which is associative-exact — so centroids are
  * bit-reproducible regardless of partitioning or merge order, and the
  * index build is deterministic end to end (no RNG state to store, same
  * property as [[AnnIndex]]'s md5 hyperplanes). Assignment is one narrow
  * pass per iteration against ≤k literal centroids (k is small by
  * design; the centroid set IS the index metadata). The inverted file
  * also stores a 256-bit hyperplane SKETCH per vector (4 BIGINTs,
  * 32 bytes vs the 512-byte embedding) — the compact-code column the
  * two-stage probe ranks on, the IVF-ADC shape (coarse quantizer +
  * binary code + exact rerank; PAPERS.md similarity-search family).
  *
  * Search, single-stage ([[topKVec]] with `rescoreCap = 0`): rank
  * centroids driver-side (k tiny), scan ONLY the `nprobe` nearest
  * cells — on a cell-bucketed layout a pruned read of nprobe/k of the
  * data — and exactly rescore with the codegen'd cosine. No join in
  * the probe plan.
  *
  * Search, two-stage reranked (`rescoreCap > 0`): sweep a WIDE nprobe
  * over the SKETCH column only, ranked by the ASYMMETRIC sketch score
  * (stored sign bits × the query's real plane projections — ADC; the
  * query side is never quantized), keep the best `rescoreCap`
  * candidates (TakeOrderedAndProject — no shuffle), and exactly
  * rescore only those embeddings. The wide sweep restores the recall
  * a narrow cell set forfeits while paying sketch bytes, not
  * embedding bytes, for the width: on a column-pruned cell-bucketed
  * layout stage 1 reads (vec_id, sketch) of the probed cells and
  * stage 2 fetches `rescoreCap` full rows — the byte-scan frontier is
  * measured in BASELINE.md §IVF and gated in SimilaritySpec.
  */
final case class IvfIndex(cells: DataFrame, centroids: Seq[Seq[Double]],
    size: Long) {

  import graft.functions.VectorOps

  /** The nprobe cells a probe scans (exposed for recall/cost tooling). */
  private[graft] def nearestCellsOf(v: Seq[Double], nprobe: Int): Seq[Int] =
    nearestCells(v, nprobe)

  private def nearestCells(v: Seq[Double], nprobe: Int): Seq[Int] =
    centroids.zipWithIndex
      .map { case (c, i) => i -> IvfIndex.cosineOf(v, c) }
      .sortBy { case (i, cos) => (-cos, i) }
      .take(nprobe).map(_._1)

  /** Top-k neighbors of an external query vector. `rescoreCap = 0`:
    * literal cell filter (prunable scan), exact rescore of everything
    * scanned, TakeOrderedAndProject (the r3 single-stage probe;
    * recall@10 ≈ 0.68 scanning ≈ 25% at k=32/nprobe=8, BASELINE.md
    * §IVF). `rescoreCap > 0`: two-stage — the asymmetric sketch score
    * ([[IvfIndex.asymScore]]) on the 32-byte sketch column across the
    * (wide) nprobe cells, top `rescoreCap` by (score, vec_id), exact
    * cosine on those rows only. */
  def topKVec(probe: Seq[Double], k: Int = 10, nprobe: Int = 8,
      rescoreCap: Int = 0): DataFrame =
    rankScan(cells, probe, k, nprobe, rescoreCap)

  /** Top-k neighbors of an indexed vector (point lookup of the probe's
    * embedding, then the literal-cell scan; excludes the probe). */
  def topK(probeId: Long, k: Int = 10, nprobe: Int = 8,
      rescoreCap: Int = 0): DataFrame = {
    val probe = cells.filter(col("vec_id") === probeId)
      .select("embedding").head().getSeq[Double](0)
    rankScan(cells.filter(col("vec_id") =!= probeId), probe, k, nprobe,
      rescoreCap)
  }

  /** Reranked probe with the measured-frontier policy (BASELINE.md
    * §IVF rerank): wide nprobe = 3/4 of the cells, rescore cap
    * SATURATED at an absolute ceiling — max(4k, min(8% of the
    * inverted file, [[IvfIndex.AutoRescoreCeiling]])). The fractional
    * term sizes small corpora onto the measured frontier; the absolute
    * ceiling is what survives 100× — without it stage 1's global limit
    * funnels O(0.08·n) rows through one partition and stage 2 rescores
    * a corpus fraction per point probe. `size` is build-time index
    * metadata, so a probe launches no count job. */
  def topKAuto(probeId: Long, k: Int = 10): DataFrame =
    topK(probeId, k, nprobe = math.max(1, centroids.size * 3 / 4),
      rescoreCap = math.max(4 * k,
        math.min((size * 0.08).toLong, IvfIndex.AutoRescoreCeiling).toInt))

  private def rankScan(from: DataFrame, probe: Seq[Double], k: Int,
      nprobe: Int, rescoreCap: Int): DataFrame = {
    val scanned = from.filter(
      col("cell").isin(nearestCells(probe, nprobe): _*))
    val source = if (rescoreCap <= 0) scanned else {
      // stage 1 touches only (vec_id, sketch), ranked by the ASYMMETRIC
      // sketch score (stored sign bits × the query's real projections —
      // the query side is never quantized, the ADC refinement over
      // symmetric hamming); ties break by vec_id so the candidate set
      // is deterministic
      val cand = scanned
        .select(col("vec_id"),
          IvfIndex.asymScore(col("sketch"), probe).as("s1"))
        .orderBy(col("s1").desc, col("vec_id"))
        .limit(rescoreCap)
        .select("vec_id")
      scanned.join(cand, "vec_id") // rescoreCap rows — broadcast-sized
    }
    source.select(col("vec_id"),
        round(VectorOps.cosine(col("embedding"),
          typedLit(probe)), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Approximate kNN JOIN of an EXTERNAL query set through the
    * inverted file — the batch-serving shape on the coarse-quantizer
    * index (the twin of [[AnnIndex.knnJoinWith]]):
    *
    *   1. each query ranks the ≤k literal centroids IN-ROW (a tiny
    *      struct-array sort — no driver loop, no collect) and fans out
    *      to its `nprobe` nearest cells;
    *   2. stage 1 equi-joins the query fan-out against the inverted
    *      file ON THE CELL KEY, touching only (vec_id, cell, sketch) —
    *      the 32-byte code column, never the 512-byte embedding — and
    *      ranks candidates by the asymmetric sketch score (stored sign
    *      bits × the query's [[graft.functions.PlaneProject]]
    *      projections, computed once per query as a narrow map);
    *      [[SimilarityOps.topKPerSrc]] trims to `rescorePerQuery`
    *      candidates per query BEFORE the shuffle;
    *   3. stage 2 joins the shortlist back to the embeddings of its
    *      O(rescorePerQuery) rows per query, exactly rescores with the
    *      codegen'd cosine, and reduces through the same partial
    *      top-k.
    *
    * No cartesian anywhere; every join is a hash/merge equi-join; the
    * candidate volume is nprobe/k_cells of the corpus per query in
    * SKETCH bytes and rescorePerQuery rows per query in embedding
    * bytes — the IVF-ADC serving shape at any scale. Ids must be
    * integral (the typed top-k aggregator, see [[SimilarityOps
    * .topKPerSrc]]). Indexed queries return themselves at cos 1 —
    * callers re-probing corpus vectors filter `src_id =!= dst_id`.
    * Probabilistic by design (a neighbor outside the probed cells or
    * the sketch shortlist is missed): held-out recall is gated in
    * SimilaritySpec, no SQL oracle. */
  def knnJoinWith(queries: DataFrame, idCol: String, embCol: String,
      k: Int, nprobe: Int = 16, rescorePerQuery: Int = 160): DataFrame = {
    import graft.functions.{VectorOps => V}
    V.register(cells.sparkSession)
    val qe = queries.select(col(idCol).as("src_id"),
      col(embCol).cast("array<double>").as("se"))
    // in-row centroid ranking: struct(negCos, cell) sorts ascending =
    // best cosine first, lowest cell id on ties (the point probe's
    // nearestCells ordering, spelled as a codegen'd expression)
    val scoredCells = array(centroids.zipWithIndex.map { case (c, i) =>
      struct((-round(V.cosine(col("se"), typedLit(c)), 9)).as("negCos"),
        lit(i).as("cell"))
    }: _*)
    val fanout = qe
      .withColumn("qprojs", IvfIndex.projCol(col("se")))
      .select(col("src_id"), col("qprojs"),
        explode(slice(array_sort(scoredCells), 1,
          math.min(math.max(1, nprobe), centroids.size)).getField("cell"))
          .as("cell"))
    val cand = fanout
      .join(cells.select(col("cell"), col("vec_id").as("dst_id"),
        col("sketch")), Seq("cell"))
      .select(col("src_id"), col("dst_id"),
        V.sketchDotCol(col("sketch"), col("qprojs")).as("s1"))
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

  /** Grow the index with a new vector batch WITHOUT re-clustering —
    * the standard IVF ingest: arrivals are assigned to the EXISTING
    * centroids (one narrow codegen'd pass; cell boundaries stay
    * exactly where every stored vector was assigned, so probes remain
    * consistent), sketched, and unioned onto the inverted file. The
    * stamped size grows too, keeping [[topKAuto]]'s cap policy honest.
    * Centroid drift accumulates as the corpus shifts — re-run
    * [[IvfIndex.build]] to re-cluster when cell occupancy skews. */
  def append(newVectors: DataFrame, idCol: String, embCol: String): IvfIndex = {
    val e = newVectors.select(col(idCol).as("vec_id"),
      col(embCol).cast("array<double>").as("embedding"))
    val n = e.count()
    val add = IvfIndex.assign(e, centroids)
      .withColumn("sketch", IvfIndex.sketchCol(col("embedding")))
    IvfIndex(cells.unionByName(add), centroids, size + n)
  }

  /** Persist the inverted file bucketed by cell: a probe's IN-filter on
    * the bucket column reads only its nprobe buckets. A tiny sidecar
    * table (`<table>_meta`: one row per centroid + the stamped size)
    * makes the pair self-describing — [[IvfIndex.fromTable]] reopens
    * the index with no out-of-band state. */
  def writeTable(table: String, buckets: Int = 32): Unit = {
    graft.sources.Warehouse.writeBucketed(cells, table, "cell", buckets)
    val spark = cells.sparkSession
    import spark.implicits._
    centroids.zipWithIndex.map { case (c, i) => (i, c, size) }
      .toDF("cell", "centroid", "n")
      .write.mode("overwrite").format("parquet").saveAsTable(table + "_meta")
  }

  /** Append a new batch to a bucketed index table written by
    * [[writeTable]] — assignment against THIS index's centroids, same
    * bucket spec (probes keep pruning), sidecar size updated. */
  def appendTable(table: String, newVectors: DataFrame, idCol: String,
      embCol: String, buckets: Int = 32): Unit = {
    val e = newVectors.select(col(idCol).as("vec_id"),
      col(embCol).cast("array<double>").as("embedding"))
    val n = e.count()
    val spark = cells.sparkSession
    // the CURRENT durable size comes off the sidecar, not this handle's
    // stamp — repeated appends through one in-memory handle must
    // accumulate, not overwrite each other's counts
    val durable = spark.table(table + "_meta")
      .select("n").head().getLong(0)
    IvfIndex.assign(e, centroids)
      .withColumn("sketch", IvfIndex.sketchCol(col("embedding")))
      .write.mode("append").format("parquet")
      .bucketBy(buckets, "cell").sortBy("cell").saveAsTable(table)
    import spark.implicits._
    centroids.zipWithIndex.map { case (c, i) => (i, c, durable + n) }
      .toDF("cell", "centroid", "n")
      .write.mode("overwrite").format("parquet").saveAsTable(table + "_meta")
  }

  /** Release the inverted file's executor storage (lineage stays
    * valid — later probes recompute instead of reading cached blocks). */
  def close(): Unit = cells.unpersist(blocking = false)
}

object IvfIndex {

  /** Absolute ceiling on [[IvfIndex.topKAuto]]'s rescore cap. Picked
    * from the RecallScan ABSCAP frontier (BASELINE.md §IVF rerank):
    * at sf0.1 (n=5000, nprobe=3/4 cells) absolute caps 128/256/512
    * measure recall@10 = 0.91/0.94/0.94 — the curve saturates by the
    * mid-hundreds at these dimensions, so 512 buys full saturated
    * recall with headroom for larger candidate pools. A constant, not
    * a corpus fraction, is the policy that survives 100×: stage 2
    * rescores O(C) rows per probe regardless of corpus size, and
    * stage 1's global limit never funnels a corpus fraction through
    * one partition. */
  val AutoRescoreCeiling = 512

  // 256-bit hyperplane sketch: 4 BIGINT words, planes drawn from the
  // same deterministic md5 family as the LSH tables but offset far
  // past any table budget so the two index kinds never share a plane.
  private val SketchWords = 4
  private val SketchBase = 1 << 20

  /** Sketch column of an embedding column: 4 packed sign words over
    * 256 deterministic hyperplanes — ONE native expression with a
    * generated plane loop ([[graft.functions.PlaneSketch]]; the
    * unrolled spelling broke janino's 64 KB method limit). */
  private[graft] def sketchCol(emb: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    graft.functions.VectorOps.planeSketch(emb, SketchBase, SketchWords)

  /** Per-row projections of a query embedding onto the sketch planes —
    * the query-side half of the asymmetric score in batch form. */
  private[graft] def projCol(emb: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    graft.functions.VectorOps.planeProject(emb, SketchBase, SketchWords * 64)

  /** Asymmetric sketch score of a stored sketch against a REAL-valued
    * query: Σ bit_j · (query ⋅ plane_j), rank-equivalent to
    * Σ sign_j · (query ⋅ plane_j) — the asymmetric-distance refinement
    * of binary sketches (the query side is never quantized). The
    * projections are computed driver-side; the row side is one native
    * bit-loop expression ([[graft.functions.SketchDot]]). */
  private[graft] def asymScore(sketch: org.apache.spark.sql.Column,
      v: Seq[Double]): org.apache.spark.sql.Column = {
    val projs = (0 until SketchWords * 64).map { p =>
      val plane = SimilarityOps.hyperplane(SketchBase + p)
      v.iterator.zip(plane.iterator).map { case (a, b) => a * b }.sum
    }
    graft.functions.VectorOps.sketchDot(sketch, projs)
  }

  private[graft] def cosineOf(a: Seq[Double], b: Seq[Double]): Double = {
    val dot = a.iterator.zip(b.iterator).map { case (x, y) => x * y }.sum
    val na = math.sqrt(a.iterator.map(x => x * x).sum)
    val nb = math.sqrt(b.iterator.map(x => x * x).sum)
    dot / (na * nb)
  }

  /** Assign every vector its nearest centroid by cosine (ties → lowest
    * cell id), as one narrow codegen'd pass over literal centroids. */
  private def assign(e: DataFrame, centroids: Seq[Seq[Double]]): DataFrame = {
    import graft.functions.VectorOps
    // greatest(struct(cos, -cell)) picks max cos, lowest cell on ties
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      struct(
        round(VectorOps.cosine(col("embedding"), typedLit(c)), 9).as("cos"),
        lit(-i).as("negCell"))
    }
    e.withColumn("cell", (-greatest(scored: _*).getField("negCell")).cast("int"))
  }

  /** Deterministic k-cell IVF build: hash-seeded centroids + `iters`
    * Lloyd refinements with DECIMAL-exact (order-independent) means.
    * Default k=32 comes from the measured frontier (BASELINE.md §IVF):
    * more, smaller cells dominate fewer, larger ones at equal scanned
    * fraction. k is clamped to corpusSize/4 so tiny corpora keep
    * meaningfully-sized cells. SCALE NOTE: per-probe cost rides
    * nprobe·(n/k), so k must GROW with the corpus — the classic
    * k ≈ √n sizing keeps cells bounded; pass it explicitly when
    * indexing beyond test scale (the default suits the gate corpora). */
  def build(vectors: DataFrame, idCol: String, embCol: String,
      k: Int = 32, iters: Int = 2, persist: Boolean = true): IvfIndex = {
    graft.functions.VectorOps.register(vectors.sparkSession)
    val e = vectors.select(col(idCol).as("vec_id"),
      col(embCol).cast("array<double>").as("embedding"))
    // one count at build time — stamped on the index as metadata so
    // probes (topKAuto's cap policy) never launch their own count job
    val nVecs = e.count()
    val kEff = math.max(1, math.min(k, (nVecs / 4).toInt))
    var centroids: Seq[Seq[Double]] =
      e.orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(kEff)
        .select("embedding").collect().map(_.getSeq[Double](0).toSeq).toSeq
    for (_ <- 1 to iters) {
      val means = assign(e, centroids)
        .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy("cell", "pos")
        .agg((sum(col("v").cast("decimal(38,18)")) /
          count(lit(1))).cast("double").as("m"))
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
      centroids = centroids.zipWithIndex.map { case (old, cell) =>
        // empty cells keep their previous centroid
        if (means.contains((cell, 0)))
          old.indices.map(p => means((cell, p)))
        else old
      }
    }
    val raw = assign(e, centroids)
      .withColumn("sketch", sketchCol(col("embedding")))
    // `persist = false` for one-shot consumers (IvfPqIndex.build keeps
    // its own working set; an unwanted persist here would either leak
    // or — worse — share a cache entry with IvfIndex.forDir that the
    // consumer's cleanup then evicts, the measured 15× probe trap)
    val cells = if (persist) raw.persist(StorageLevel.MEMORY_AND_DISK)
      else raw
    IvfIndex(cells, centroids, nVecs)
  }

  /** Reopen a bucketed index table + its `_meta` sidecar written by
    * [[IvfIndex.writeTable]]: centroids and the stamped size come off
    * the sidecar, so the reopened index probes identically (including
    * [[IvfIndex.topKAuto]]'s cap policy) with no out-of-band state. */
  def fromTable(spark: SparkSession, table: String): IvfIndex = {
    // a fresh session has no temp functions — the reopened index must
    // probe without the build() chokepoint having run
    graft.functions.VectorOps.register(spark)
    val meta = spark.table(table + "_meta").collect()
    require(meta.nonEmpty, s"missing sidecar table ${table}_meta — was " +
      "the index written by IvfIndex.writeTable?")
    val centroids = meta.sortBy(_.getInt(0))
      .map(_.getSeq[Double](1).toSeq).toSeq
    IvfIndex(spark.table(table), centroids, meta.head.getLong(2))
  }

  // Evicts on invalidate() and on session end (see IndexCache).
  private val cache = new IndexCache[IvfIndex](
    (spark, sfDir) => build(graft.sources.Tables.embeddings(spark, sfDir),
      "vec_id", "embedding"),
    _.close())

  /** The cached IVF index of a test-data corpus dir. */
  def forDir(spark: SparkSession, sfDir: String): IvfIndex =
    cache.get(spark, sfDir)

  /** Drop and unpersist the cached index of one corpus dir. */
  def invalidate(spark: SparkSession, sfDir: String): Unit =
    cache.invalidate(spark, sfDir)

  /** Drop and unpersist every cached index of a session. */
  def invalidateAll(spark: SparkSession): Unit = cache.invalidateAll(spark)
}
