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
  * design; the centroid set IS the index metadata).
  *
  * Search: the probe ranks centroids driver-side (k tiny), takes its
  * `nprobe` nearest cells, and scans ONLY those cells — on a cell-
  * bucketed or cell-partitioned layout that is a pruned read of
  * nprobe/k of the data — then exactly rescores with the codegen'd
  * cosine. No join anywhere in the probe plan.
  */
final case class IvfIndex(cells: DataFrame, centroids: Seq[Seq[Double]]) {

  import graft.functions.VectorOps

  /** The nprobe cells a probe scans (exposed for recall/cost tooling). */
  private[graft] def nearestCellsOf(v: Seq[Double], nprobe: Int): Seq[Int] =
    nearestCells(v, nprobe)

  private def nearestCells(v: Seq[Double], nprobe: Int): Seq[Int] =
    centroids.zipWithIndex
      .map { case (c, i) => i -> IvfIndex.cosineOf(v, c) }
      .sortBy { case (i, cos) => (-cos, i) }
      .take(nprobe).map(_._1)

  /** Top-k neighbors of an external query vector: literal cell filter
    * (prunable scan), exact rescore, TakeOrderedAndProject. Default
    * nprobe=8 sits on the measured recall/cost frontier (BASELINE.md
    * §IVF: recall@10 ≈ 0.68 scanning ≈ 25% at k=32). */
  def topKVec(probe: Seq[Double], k: Int = 10, nprobe: Int = 8): DataFrame =
    cells.filter(col("cell").isin(nearestCells(probe, nprobe): _*))
      .select(col("vec_id"),
        round(VectorOps.cosine(col("embedding"),
          typedLit(probe)), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)

  /** Top-k neighbors of an indexed vector (point lookup of the probe's
    * embedding, then the literal-cell scan; excludes the probe). */
  def topK(probeId: Long, k: Int = 10, nprobe: Int = 8): DataFrame = {
    val probe = cells.filter(col("vec_id") === probeId)
      .select("embedding").head().getSeq[Double](0)
    cells.filter(col("vec_id") =!= probeId)
      .filter(col("cell").isin(nearestCells(probe, nprobe): _*))
      .select(col("vec_id"),
        round(VectorOps.cosine(col("embedding"),
          typedLit(probe)), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Persist the inverted file bucketed by cell: a probe's IN-filter on
    * the bucket column reads only its nprobe buckets. */
  def writeTable(table: String, buckets: Int = 32): Unit =
    graft.sources.Warehouse.writeBucketed(cells, table, "cell", buckets)

  /** Release the inverted file's executor storage (lineage stays
    * valid — later probes recompute instead of reading cached blocks). */
  def close(): Unit = cells.unpersist(blocking = false)
}

object IvfIndex {

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
    * meaningfully-sized cells. */
  def build(vectors: DataFrame, idCol: String, embCol: String,
      k: Int = 32, iters: Int = 2): IvfIndex = {
    val e = vectors.select(col(idCol).as("vec_id"),
      col(embCol).cast("array<double>").as("embedding"))
    val kEff = math.max(1, math.min(k, (e.count() / 4).toInt))
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
    val cells = assign(e, centroids)
      .persist(StorageLevel.MEMORY_AND_DISK)
    IvfIndex(cells, centroids)
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
