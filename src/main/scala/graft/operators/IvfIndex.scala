package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
  * property as [[AnnIndex]]'s md5 hyperplanes).
  *
  * THE CENTROID SET IS A DATAFRAME, NOT DRIVER STATE (r7; clears the
  * r6 `weak`): the coarse quantizer lives as a k-row `(cell, centroid)`
  * table that every consumer reaches RELATIONALLY —
  *
  *  - corpus/batch assignment broadcast-joins ONE packed centroid-matrix
  *    row onto the vectors and picks the argmax-cosine cell with the
  *    codegen'd [[graft.functions.BestCell]] loop: zero shuffle, no
  *    per-row sort, and plan size O(1) in k (the r6 shape serialized a
  *    `typedLit` of the full centroid set into every task and broke
  *    down at the k ≈ √n cell counts a 100 TB corpus needs);
  *  - the Lloyd refinement keeps the per-iteration means DISTRIBUTED
  *    (partial DECIMAL sums → a k×dims-row aggregate folded back to a
  *    k-row table) — the driver never holds a k×dims collect;
  *  - batch probes ([[knnJoinWith]]) rank cells per query via a
  *    broadcast join + pre-shuffle partial top-nprobe
  *    ([[SimilarityOps.topKPerSrc]]);
  *  - point probes rank the k-row table in one tiny Spark job and push
  *    the nprobe winners as literal cell predicates (prunable on a
  *    cell-bucketed layout) — only the QUERY vector is ever a literal.
  *
  * The inverted file also stores a 256-bit hyperplane SKETCH per vector
  * (4 BIGINTs, 32 bytes vs the 512-byte embedding) — the compact-code
  * column the two-stage probe ranks on, the IVF-ADC shape (coarse
  * quantizer + binary code + exact rerank; PAPERS.md similarity-search
  * family).
  *
  * Search, single-stage ([[topKVec]] with `rescoreCap = 0`): scan ONLY
  * the `nprobe` nearest cells — on a cell-bucketed layout a pruned read
  * of nprobe/k of the data — and exactly rescore with the codegen'd
  * cosine. No join in the probe plan.
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
final case class IvfIndex(cells: DataFrame, centroids: DataFrame,
    nCells: Int, size: Long) extends VectorIndex {

  private[graft] override def backing: DataFrame = cells

  /** [[VectorIndex]] probe at the default cell/rescore budget. */
  override def knnJoinWith(queries: DataFrame, idCol: String,
      embCol: String, k: Int): DataFrame =
    knnJoinWith(queries, idCol, embCol, k, nprobe = 0)

  import graft.functions.VectorOps

  /** Driver copy of the coarse quantizer (k×dims doubles, ordered by
    * cell) — for tests and tooling that compare quantizers. Probes,
    * builds, and appends never materialize it. */
  def centroidArrays: Seq[Seq[Double]] =
    centroids.orderBy("cell").collect()
      .map(_.getSeq[Double](1).toSeq).toSeq

  /** The nprobe cells a probe scans (exposed for recall/cost tooling). */
  private[graft] def nearestCellsOf(v: Seq[Double], nprobe: Int): Seq[Int] =
    nearestCells(v, nprobe)

  // Point-probe cell ranking: ONE tiny job over the k-row centroid
  // table (codegen'd cosine against the literal QUERY vector — the only
  // literal a probe plan ever carries), returning nprobe ints. The
  // k-row table stays distributed at any cell count.
  private def nearestCells(v: Seq[Double], nprobe: Int): Seq[Int] =
    IvfIndex.cosineRankedCells(centroids, v, nprobe)

  // nprobe <= 0 selects the default FRACTION of the cell count, so the
  // scan fraction stays put as the k ≈ √n sizing grows cells with the
  // corpus: 1/4 for single-stage point probes (the measured BASELINE.md
  // §IVF point) and for the batch join (the finer auto-sized cells
  // hold the held-out recall gate at a 25% scan — §IVF cells).
  private def effNprobe(nprobe: Int, num: Int, den: Int): Int =
    math.min(math.max(1, if (nprobe > 0) nprobe else nCells * num / den),
      nCells)

  /** Top-k neighbors of an external query vector. `rescoreCap = 0`:
    * literal cell filter (prunable scan), exact rescore of everything
    * scanned, TakeOrderedAndProject (the r3 single-stage probe;
    * recall@10 ≈ 0.68 scanning ≈ 25%, BASELINE.md §IVF).
    * `rescoreCap > 0`: two-stage — the asymmetric sketch score
    * ([[IvfIndex.asymScore]]) on the 32-byte sketch column across the
    * (wide) nprobe cells, top `rescoreCap` by (score, vec_id), exact
    * cosine on those rows only. `nprobe <= 0` = nCells/4. */
  def topKVec(probe: Seq[Double], k: Int = 10, nprobe: Int = 0,
      rescoreCap: Int = 0): DataFrame =
    rankScan(cells, probe, k, effNprobe(nprobe, 1, 4), rescoreCap)

  /** Top-k neighbors of an indexed vector (point lookup of the probe's
    * embedding, then the literal-cell scan; excludes the probe). */
  def topK(probeId: Long, k: Int = 10, nprobe: Int = 0,
      rescoreCap: Int = 0): DataFrame = {
    val probe = cells.filter(col("vec_id") === probeId)
      .select("embedding").head().getSeq[Double](0)
    rankScan(cells.filter(col("vec_id") =!= probeId), probe, k,
      effNprobe(nprobe, 1, 4), rescoreCap)
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
    topK(probeId, k, nprobe = math.max(1, nCells * 3 / 4),
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
    *   1. each query ranks the cells RELATIONALLY — a broadcast join
    *      against the k-row centroid table scores every (query, cell)
    *      pair with the codegen'd cosine, and [[SimilarityOps
    *      .topKPerSrc]] trims to the `nprobe` best cells per query
    *      BEFORE the shuffle (no literal centroid array in the plan,
    *      no per-row sort — plan size O(1) in the cell count);
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
    * No cartesian over the corpus anywhere; the only nested-loop node
    * is the k-row centroid fan-out (every query × every cell IS the
    * coarse-quantizer contract, and the build side is the k-row
    * centroid table); every embedding-carrying join is a hash/merge
    * equi-join. Candidate volume is nprobe/k_cells of the corpus per
    * query in SKETCH bytes and rescorePerQuery rows per query in
    * embedding bytes — the IVF-ADC serving shape at any scale. Ids
    * must be integral (the typed top-k aggregator, see
    * [[SimilarityOps.topKPerSrc]]). Indexed queries return themselves
    * at cos 1 — callers re-probing corpus vectors filter
    * `src_id =!= dst_id`. `nprobe <= 0` = nCells/4 — the
    * auto-sized quantizer's cells are fine enough that a 25% scan
    * holds the recall gate (BASELINE.md §IVF cells), at HALF the r6
    * candidate volume. Probabilistic by
    * design (a neighbor outside the probed cells or the sketch
    * shortlist is missed): held-out recall is gated in SimilaritySpec,
    * no SQL oracle. */
  def knnJoinWith(queries: DataFrame, idCol: String, embCol: String,
      k: Int, nprobe: Int = 0, rescorePerQuery: Int = 160): DataFrame = {
    import graft.functions.{VectorOps => V}
    IvfIndex.cellFanoutKnn(cells, centroids, queries, idCol, embCol,
      k, effNprobe(nprobe, 1, 4), rescorePerQuery,
      codeCols = Seq("sketch"),
      // the plane projections are computed ONCE PER QUERY on the query
      // side of the fan-out join — projecting after it would redo the
      // 256-plane×dims pass once per fan-out ROW (nprobe× the work,
      // the measured r7 3.9 s q_knn_ivf trap)
      perQuery = qe => qe.select(col("src_id"),
        IvfIndex.projCol(col("se")).as("qprojs")),
      fanout = (fan, qp) => fan.join(qp, "src_id")
        .select(col("src_id"), col("qprojs"), col("cell")),
      stage1 = V.sketchDotCol(col("sketch"), col("qprojs")))
  }

  /** Grow the index with a new vector batch WITHOUT re-clustering —
    * the standard IVF ingest: arrivals are assigned to the EXISTING
    * centroids (the broadcast-matrix [[graft.functions.BestCell]]
    * pass; cell boundaries stay exactly where every stored vector was
    * assigned, so probes remain consistent), sketched, and unioned
    * onto the inverted file. The stamped size grows too, keeping
    * [[topKAuto]]'s cap policy honest. Centroid drift accumulates as
    * the corpus shifts — re-run [[IvfIndex.build]] to re-cluster when
    * cell occupancy skews. */
  override def append(newVectors: DataFrame, idCol: String,
      embCol: String): IvfIndex = {
    graft.functions.VectorOps.register(cells.sparkSession)
    val e = newVectors.select(col(idCol).as("vec_id"),
      col(embCol).cast("array<double>").as("embedding"))
    val n = e.count()
    val add = IvfIndex.assign(e, centroids, nCells)
      .withColumn("sketch", IvfIndex.sketchCol(col("embedding")))
    IvfIndex(cells.unionByName(add), centroids, nCells, size + n)
  }

  /** Persist the inverted file bucketed by cell: a probe's IN-filter on
    * the bucket column reads only its nprobe buckets. A tiny sidecar
    * table (`<table>_meta`: one row per centroid + the stamped size)
    * makes the pair self-describing — [[IvfIndex.fromTable]] reopens
    * the index with no out-of-band state. */
  def writeTable(table: String, buckets: Int = 32): Unit = {
    graft.sources.Warehouse.writeBucketed(cells, table, "cell", buckets)
    graft.sources.Warehouse.overwriteSelfRead(
      centroids.select(col("cell"), col("centroid"), lit(size).as("n")),
      table + "_meta")
  }

  /** Append a new batch to a bucketed index table written by
    * [[writeTable]] — assignment against THIS index's centroids, same
    * bucket spec (probes keep pruning), sidecar size updated. Refuses
    * a handle whose quantizer does not match the table's sidecar:
    * appending rows assigned under DIFFERENT centroids would silently
    * corrupt every future probe of the table. */
  def appendTable(table: String, newVectors: DataFrame, idCol: String,
      embCol: String, buckets: Int = 32): Unit = {
    graft.functions.VectorOps.register(cells.sparkSession)
    val e = newVectors.select(col(idCol).as("vec_id"),
      col(embCol).cast("array<double>").as("embedding"))
    val n = e.count()
    val spark = cells.sparkSession
    val side = spark.table(table + "_meta")
    val ours = centroids.select(col("cell"), col("centroid"))
    require(side.select("cell", "centroid").exceptAll(ours).isEmpty &&
        ours.exceptAll(side.select("cell", "centroid")).isEmpty,
      s"this handle's centroids do not match ${table}_meta — appendTable " +
        "must run through a handle of the index that wrote the table " +
        "(IvfIndex.fromTable reopens one)")
    // the CURRENT durable size comes off the sidecar, not this handle's
    // stamp — repeated appends through one in-memory handle must
    // accumulate, not overwrite each other's counts
    val durable = side.agg(max(col("n"))).head().getLong(0)
    IvfIndex.assign(e, centroids, nCells)
      .withColumn("sketch", IvfIndex.sketchCol(col("embedding")))
      .write.mode("append").format("parquet")
      .bucketBy(buckets, "cell").sortBy("cell").saveAsTable(table)
    // staged: a fromTable handle's centroid frame READS the sidecar it
    // restamps here — a direct overwrite throws (Warehouse doc)
    graft.sources.Warehouse.overwriteSelfRead(
      centroids.select(col("cell"), col("centroid"),
        lit(durable + n).as("n")), table + "_meta")
  }

  /** Release the inverted file's executor storage (lineage stays
    * valid — later probes recompute instead of reading cached blocks).
    * The k-row centroid table is deliberately NOT unpersisted: Spark
    * keys cached storage by plan equality, so a same-corpus sibling
    * (IvfIndex.forDir, an IvfPqIndex.build's inner quantizer) may
    * share the entry — evicting it re-runs the full Lloyd lineage on
    * the sibling's next probe (the measured 15× q_sim_ivf trap, r6).
    * The leak is k rows, LRU-evictable, and recompute-correct. */
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

  /** Ceiling on the AUTO cell-count policy (explicit k is never
    * clamped). 2¹⁷ cells keeps the single packed centroid-matrix row
    * at k·d·8 B = 64 MB for d = 64 — broadcast-sized, far from Spark's
    * 2 GB single-row limit — and bounds [[graft.functions.BestCell]]'s
    * per-row argmax at O(2¹⁷·d). The 4·√n auto policy hits this only
    * at n ≳ 10⁹; beyond it, see the two-level coarse-quantizer note on
    * [[IvfIndex.build]]. */
  val AutoCellCeiling = 1 << 17

  /** The auto cell-count policy as a pure function of corpus size:
    * 4·ceil(√n) clamped to [8, n/4] and capped at
    * [[AutoCellCeiling]]. Factored out of [[build]] so the ceiling is
    * testable without a 10⁹-row build (SimilaritySpec pins it). */
  def autoCellCount(nVecs: Long): Int = {
    val wanted = math.min(AutoCellCeiling.toLong,
      math.max(8L, 4L * math.ceil(math.sqrt(nVecs.toDouble)).toLong))
    math.max(1L, math.min(wanted, nVecs / 4)).toInt
  }

  // 256-bit hyperplane sketch: 4 BIGINT words, planes drawn from the
  // same deterministic md5 family as the LSH tables but offset far
  // past any table budget so the two index kinds never share a plane.
  private val SketchWords = 4
  private val SketchBase = 1 << 20

  /** Sketch column of an embedding column: 4 packed sign words over
    * 256 deterministic hyperplanes — ONE native expression with a
    * generated plane loop ([[graft.functions.PlaneSketch]]; the
    * unrolled spelling broke janino's 64 KB method limit). */
  private[graft] def sketchCol(emb: Column): Column =
    graft.functions.VectorOps.planeSketch(emb, SketchBase, SketchWords)

  /** Per-row projections of a query embedding onto the sketch planes —
    * the query-side half of the asymmetric score in batch form. */
  private[graft] def projCol(emb: Column): Column =
    graft.functions.VectorOps.planeProject(emb, SketchBase, SketchWords * 64)

  /** Asymmetric sketch score of a stored sketch against a REAL-valued
    * query: Σ bit_j · (query ⋅ plane_j), rank-equivalent to
    * Σ sign_j · (query ⋅ plane_j) — the asymmetric-distance refinement
    * of binary sketches (the query side is never quantized). The
    * projections are computed driver-side; the row side is one native
    * bit-loop expression ([[graft.functions.SketchDot]]). */
  private[graft] def asymScore(sketch: Column, v: Seq[Double]): Column = {
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

  /** The nprobe best cells of a `(cell, centroid)` table for a point
    * query, by codegen'd cosine (desc, cell asc ties) — one tiny k-row
    * job; the query vector is the only literal. Shared by the point
    * probes of [[IvfIndex]] and [[IvfPqIndex]] and the recall
    * tooling. */
  private[graft] def cosineRankedCells(cdf: DataFrame, v: Seq[Double],
      nprobe: Int): Seq[Int] = {
    graft.functions.VectorOps.register(cdf.sparkSession)
    cdf.orderBy(graft.functions.VectorOps
        .cosine(col("centroid"), typedLit(v)).desc, col("cell"))
      .limit(nprobe).select("cell")
      .collect().map(_.getInt(0)).toSeq
  }

  /** The shared three-stage batch-kNN skeleton of the IVF family —
    * [[IvfIndex.knnJoinWith]] and [[IvfPqIndex.knnJoinWith]] are this
    * pipeline with different stage-1 compact-code scoring (asymmetric
    * sketch dot vs residual ADC + centroid constant); keeping one
    * skeleton stops the twins drifting:
    *
    *   1. relational cell ranking: queries × the BROADCAST k-row
    *      centroid table (the only nested-loop node — every query ×
    *      every cell IS the coarse-quantizer contract), codegen'd
    *      cosine, partial top-`np` per query before the shuffle;
    *   2. `fanout` attaches the per-query payload (computed ONCE per
    *      query by `perQuery` — never per fan-out row) and equi-joins
    *      the inverted file ON THE CELL KEY touching only `codeCols`;
    *      `stage1` scores each candidate and partial top-k trims to
    *      `rescorePerQuery` pre-shuffle;
    *   3. the shortlist joins back to its embeddings, exact cosine,
    *      final partial top-k. */
  private[operators] def cellFanoutKnn(cells: DataFrame,
      centroids: DataFrame, queries: DataFrame, idCol: String,
      embCol: String, k: Int, np: Int, rescorePerQuery: Int,
      codeCols: Seq[String],
      perQuery: DataFrame => DataFrame,
      fanout: (DataFrame, DataFrame) => DataFrame,
      stage1: Column): DataFrame = {
    import graft.functions.{VectorOps => V}
    V.register(cells.sparkSession)
    val qe = queries.select(col(idCol).as("src_id"),
      col(embCol).cast("array<double>").as("se"))
    val scoredCells = qe.crossJoin(broadcast(centroids))
      .select(col("src_id"), col("cell").as("dst_id"),
        round(V.cosine(col("se"), col("centroid")), 9).as("qcos"))
    val fan = SimilarityOps.topKPerSrc(scoredCells, "qcos", np)
      .select(col("src_id"), col("dst_id").cast("int").as("cell"))
    val fo = fanout(fan, perQuery(qe))
    val cand = fo
      .join(cells.select(col("cell") +: col("vec_id").as("dst_id") +:
        codeCols.map(col): _*), Seq("cell"))
      .select(col("src_id"), col("dst_id"), stage1.as("s1"))
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

  /** One packed centroid-MATRIX row of a `(cell, centroid)` table:
    * `array<array<double>>` with element c = cell c's centroid (cells
    * are contiguous 0..k-1 by construction). Broadcast-joined onto a
    * vector frame it feeds [[graft.functions.BestCell]] — the matrix
    * ships once per executor instead of riding every task as a plan
    * literal. */
  private def packed(cdf: DataFrame): DataFrame =
    cdf.groupBy().agg(
      transform(
        array_sort(collect_list(struct(col("cell"), col("centroid")))),
        x => x.getField("centroid")).as("graft_cents"))

  /** Assign every vector its nearest centroid by cosine (ties → lowest
    * cell id): one broadcast of the packed centroid matrix + the
    * codegen'd [[graft.functions.BestCell]] argmax loop. Zero shuffle,
    * plan size O(1) in the cell count. Past `twoLevelAbove` cells
    * (default [[AutoCellCeiling]] — reachable only through an EXPLICIT
    * k, the auto policy clamps first) the single packed row would
    * approach Spark's 2 GB row limit and the per-row argmax O(k·d), so
    * assignment switches to [[assignTwoLevel]]. */
  private[graft] def assign(e: DataFrame, cdf: DataFrame, k: Int,
      twoLevelAbove: Int = AutoCellCeiling): DataFrame =
    if (k <= twoLevelAbove)
      e.crossJoin(broadcast(packed(cdf)))
        .withColumn("cell", graft.functions.VectorOps.bestCell(
          col("embedding"), col("graft_cents")))
        .drop("graft_cents")
    else assignTwoLevel(e, cdf, k)

  /** TWO-LEVEL coarse assignment — the beyond-[[AutoCellCeiling]] path
    * the ceiling scaladoc records: cluster the k cell centroids into
    * k₂ = ceil(√k) SUPER-cells (hash-seeded Lloyd over the k-row
    * centroid table — a tiny, fully relational job), then assign each
    * vector in two O(√k·d) argmax passes — best super-cell against the
    * packed k₂-row matrix, then best member cell against that
    * super-cell's packed member matrix, equi-joined in. Representation
    * costs fall from one k·d·8 B row + O(k·d) per row to k₂ rows of
    * ~√k·d·8 B each + two O(√k·d) passes: at k = 10⁶, d = 64 that is
    * ~1000 rows of ~0.5 MB instead of one 512 MB row.
    *
    * Assignment is APPROXIMATE exactly as every two-level quantizer
    * (IMI / hierarchical IVF) is: a vector whose true nearest cell
    * lives in a DIFFERENT super-cell lands in the best cell of its own
    * super-cell instead. Cells are an index structure — this trades a
    * little probe recall past the ceiling, never result correctness
    * (probes rescore exactly). Vectors rank only NON-EMPTY super-cells
    * (a super-centroid can end up nearest to zero cells while still
    * being some vector's best super-cell — ranking it would drop the
    * vector at the member join). Deterministic end-to-end: hash-seeded
    * super-seeds, DECIMAL-exact means, ties to the lowest id at both
    * levels. Measured end-to-end (tools.TwoLevelProbe, BASELINE.md
    * §Round-9): probe recall degrades far less than assignment
    * agreement — mis-routes land in adjacent, still-probed cells —
    * and doubling nprobe recovers the single-level recall band. */
  private[graft] def assignTwoLevel(e: DataFrame, cdf: DataFrame,
      k: Int): DataFrame = {
    import graft.functions.{VectorOps => V}
    val k2 = math.max(1, math.ceil(math.sqrt(k.toDouble)).toInt)
    val seedOrder = Seq(xxhash64(col("cell")).asc, col("cell").asc)
    var sdf = cdf.orderBy(seedOrder: _*).limit(k2)
      .withColumn("scell",
        // global on purpose over ≤√k centroid rows (BoundedWindow)
        row_number().over(Window
          .partitionBy(BoundedWindow.key(col("cell")))
          .orderBy(seedOrder: _*)) - 1)
      .select(col("scell"), col("centroid").as("scentroid"))
    def packedSuper(s: DataFrame) = packed(
      s.select(col("scell").as("cell"), col("scentroid").as("centroid")))
    // Lloyd over the CENTROID table (k rows — every step is a tiny
    // relational job; empty super-cells keep their previous centroid)
    for (_ <- 1 to 2) {
      val means = cdf.crossJoin(broadcast(packedSuper(sdf)))
        .withColumn("scell",
          V.bestCell(col("centroid"), col("graft_cents")))
        .select(col("scell"),
          posexplode(col("centroid")).as(Seq("pos", "v")))
        .groupBy("scell", "pos")
        .agg((sum(col("v").cast("decimal(38,18)")) /
          count(lit(1))).cast("double").as("m"))
        .groupBy("scell")
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("m")))),
          x => x.getField("m")).as("graft_next"))
      sdf = sdf.join(broadcast(means), Seq("scell"), "left")
        .select(col("scell"),
          coalesce(col("graft_next"), col("scentroid")).as("scentroid"))
    }
    // member table: each NON-EMPTY super-cell's cells, packed (matrix
    // + parallel cell-id array, both sorted by cell id so BestCell's
    // lowest-index tie-break stays lowest-cell-id)
    val members = cdf.crossJoin(broadcast(packedSuper(sdf)))
      .withColumn("scell", V.bestCell(col("centroid"), col("graft_cents")))
      .groupBy("scell")
      .agg(
        transform(
          array_sort(collect_list(struct(col("cell"), col("centroid")))),
          x => x.getField("centroid")).as("graft_mcents"),
        transform(
          array_sort(collect_list(struct(col("cell"), col("centroid")))),
          x => x.getField("cell")).as("graft_mcells"))
    // level-1 ranking restricted to non-empty super-cells: pack their
    // centroids WITH their ids (scells may be non-contiguous here, so
    // BestCell's position must translate through the id array)
    val sTab = sdf.join(members, "scell")
    val packedS = sTab.groupBy().agg(
      transform(
        array_sort(collect_list(struct(col("scell"), col("scentroid")))),
        x => x.getField("scentroid")).as("graft_scents"),
      transform(
        array_sort(collect_list(struct(col("scell"), col("scentroid")))),
        x => x.getField("scell")).as("graft_sids"))
    e.crossJoin(broadcast(packedS))
      .withColumn("graft_scell", element_at(col("graft_sids"),
        V.bestCell(col("embedding"), col("graft_scents")) + 1))
      .drop("graft_scents", "graft_sids")
      .join(broadcast(sTab.select(col("scell").as("graft_scell"),
        col("graft_mcents"), col("graft_mcells"))), "graft_scell")
      .withColumn("cell", element_at(col("graft_mcells"),
        V.bestCell(col("embedding"), col("graft_mcents")) + 1))
      .drop("graft_scell", "graft_mcents", "graft_mcells")
  }

  /** Deterministic k-cell IVF build: hash-seeded centroids + `iters`
    * Lloyd refinements with DECIMAL-exact (order-independent) means,
    * every step distributed (seeding is a top-k, assignment a
    * broadcast-matrix map, means a partial-aggregated fold back to a
    * k-row table — the driver never holds the quantizer).
    *
    * CELL-COUNT POLICY: `k <= 0` (the default) sizes the quantizer as
    * 4·ceil(√n) clamped to [8, n/4] — the FAISS sizing band (4√n to
    * 16√n): per-probe cost rides nprobe·(n/k) with nprobe a fraction
    * of k, so k must GROW with the corpus, and the measured frontier
    * (BASELINE.md §IVF cells) shows recall RISING with k at a fixed
    * scanned fraction — more, finer cells dominate. At n = 10⁹
    * vectors this is ~1.3×10⁵ cells: a ~64 MB packed matrix (one
    * broadcast per executor, never a task literal) and k-row
    * relational ranking everywhere else.
    *
    * AUTO-K CEILING: the auto policy additionally clamps to
    * [[IvfIndex.AutoCellCeiling]] = 2¹⁷ cells. Two representation
    * costs grow linearly in k: (a) the packed matrix is ONE
    * `array<array<double>>` row of k·d·8 bytes — at d = 64 that is
    * 2¹⁷·64·8 = 64 MB, comfortably under Spark's 2 GB single-row hard
    * limit but already the broadcast size you want per executor; at
    * the unclamped 4·√n policy, n = 10¹¹ would yield k ≈ 1.3×10⁶ and
    * a ~640 MB row at d = 64 (multi-GB at larger d) — past the
    * broadcast sweet spot and within sight of the row limit; (b)
    * [[graft.functions.BestCell]] pays O(k·d) per assigned row. Past
    * the ceiling the right structure is a TWO-LEVEL coarse quantizer —
    * cluster the k cell centroids into √k super-cells, assign each
    * vector to a super-cell (O(√k·d)) then argmax only that
    * super-cell's member cells (O(√k·d) again), turning both costs
    * into O(√k·d) with a √k-row packed matrix per level. Not built:
    * the ceiling binds only beyond n ≈ 10⁹ (where 4·√n > 2¹⁷), two
    * orders of magnitude past the gate corpora; above it the clamp
    * degrades GRACEFULLY (cells average n/2¹⁷ vectors — probe cost
    * grows linearly in n but answers stay correct), not loudly.
    * Pass k explicitly to pin a measured frontier point — explicit k
    * is intentionally NOT subject to the ceiling (the caller owns the
    * trade; the [1, n/4] sanity clamp still applies). */
  def build(vectors: DataFrame, idCol: String, embCol: String,
      k: Int = 0, iters: Int = 2, persist: Boolean = true,
      sketch: Boolean = true): IvfIndex = {
    graft.functions.VectorOps.register(vectors.sparkSession)
    val e = vectors.select(col(idCol).as("vec_id"),
      col(embCol).cast("array<double>").as("embedding"))
    // one count at build time — stamped on the index as metadata so
    // probes (topKAuto's cap policy) never launch their own count job
    val nVecs = e.count()
    val kEff = if (k > 0) math.max(1, math.min(k.toLong, nVecs / 4).toInt)
      else autoCellCount(nVecs)
    // hash-seeded start, as a k-row (cell, centroid) TABLE: cell c =
    // the c-th lowest (xxhash64(vec_id), vec_id) vector
    val seedOrder = Seq(xxhash64(col("vec_id")).asc, col("vec_id").asc)
    var cdf: DataFrame = e.orderBy(seedOrder: _*).limit(kEff)
      .select(col("vec_id"), col("embedding"))
      .withColumn("cell",
        // global on purpose over the limit(kEff) seed rows — ≤2^17 by
        // AutoCellCeiling (BoundedWindow)
        (row_number().over(Window
          .partitionBy(BoundedWindow.key(col("vec_id")))
          .orderBy(seedOrder: _*)) - 1))
      .select(col("cell"), col("embedding").as("centroid"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    cdf.count()
    for (_ <- 1 to iters) {
      // per-(cell, dim) DECIMAL-exact means: the corpus pass partial-
      // aggregates map-side (the exchange carries k×dims partial sums
      // per partition, never corpus rows), and the k×dims mean rows
      // fold back into a k-row centroid table — all distributed
      val means = assign(e, cdf, kEff)
        .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy("cell", "pos")
        .agg((sum(col("v").cast("decimal(38,18)")) /
          count(lit(1))).cast("double").as("m"))
      val next = means.groupBy("cell")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          x => x.getField("m")).as("graft_next"))
      // empty cells keep their previous centroid
      val refreshed = cdf
        .join(broadcast(next), Seq("cell"), "left")
        .select(col("cell"),
          coalesce(col("graft_next"), col("centroid")).as("centroid"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      refreshed.count()
      cdf.unpersist(blocking = false)
      cdf = refreshed
    }
    // `sketch = false` builds a coarse-quantizer-only inverted file —
    // for consumers that replace the sketch with their own code column
    // (IvfPqIndex.build): the 256-plane pass costs as much as the
    // assignment itself and would be dropped on the floor. Such an
    // index supports single-stage probes and assignment only.
    val raw0 = assign(e, cdf, kEff)
    val raw = if (sketch) raw0.withColumn("sketch", sketchCol(col("embedding")))
      else raw0
    // `persist = false` for one-shot consumers (IvfPqIndex.build keeps
    // its own working set; an unwanted persist here would either leak
    // or — worse — share a cache entry with IvfIndex.forDir that the
    // consumer's cleanup then evicts, the measured 15× probe trap)
    val cells = if (persist) raw.persist(StorageLevel.MEMORY_AND_DISK)
      else raw
    IvfIndex(cells, cdf, kEff, nVecs)
  }

  /** Reopen a bucketed index table + its `_meta` sidecar written by
    * [[IvfIndex.writeTable]]: the centroid table and the stamped size
    * come off the sidecar, so the reopened index probes identically
    * (including [[IvfIndex.topKAuto]]'s cap policy) with no
    * out-of-band state. */
  def fromTable(spark: SparkSession, table: String): IvfIndex = {
    // a fresh session has no temp functions — the reopened index must
    // probe without the build() chokepoint having run
    graft.functions.VectorOps.register(spark)
    require(spark.catalog.tableExists(table + "_meta"),
      s"missing sidecar table ${table}_meta — was the index written by " +
        "IvfIndex.writeTable?")
    val meta = spark.table(table + "_meta")
    val stats = meta.agg(count(lit(1)), max(col("n"))).head()
    require(stats.getLong(0) > 0, s"sidecar table ${table}_meta is " +
      "empty — was the index written by IvfIndex.writeTable?")
    IvfIndex(spark.table(table), meta.select("cell", "centroid"),
      stats.getLong(0).toInt, stats.getLong(1))
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
