package graft.tools

import graft.operators.{IvfIndex, SimilarityOps}
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the beyond-ceiling TWO-LEVEL coarse-assignment path
  * (IvfIndex.assignTwoLevel) end-to-end at gate scale: for rising cell
  * counts, (a) the fraction of vectors the two-level argmax routes to
  * the same cell as the exact single-level argmax, and (b) the held-out
  * mean recall@5 of `knnJoinWith` through an index whose CORPUS cells
  * came from each path, at the same probed-cell fraction.
  *
  * The point being proven: two-level disagreement is mostly a vector
  * landing in an ADJACENT cell its probes still reach inside nprobe —
  * so probe recall degrades far less than (1 − agreement), and the
  * production ceiling (AutoCellCeiling, where k₂ ≈ 362 super-cells
  * partition far finer than any local corpus can) extrapolates from a
  * measured trend, not an assertion.
  *
  *   runMain graft.tools.TwoLevelProbe [sfDir]
  */
object TwoLevelProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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

    val vecs = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").persist()
    val n = vecs.count()
    val probes = vecs.filter(col("vec_id") % 10 === 0)

    // ground truth: the exact kNN join, self-matches removed (the
    // KnnFrontier methodology, shared verbatim so the numbers compare)
    val truth = SimilarityOps.knnJoin(vecs, "vec_id", "embedding", k = 6)
      .filter(col("src_id") =!= col("dst_id") && col("src_id") % 10 === 0)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(3)).take(5).map(_.getLong(1)).toSet)
      .toMap
    def recallOf(rows: Array[org.apache.spark.sql.Row]): Double = {
      val bySrc = rows.groupBy(_.getLong(0))
        .view.mapValues(_.map(_.getLong(1)).toSet).toMap
      val rs = truth.collect { case (q, nbrs) if nbrs.nonEmpty =>
        (bySrc.getOrElse(q, Set.empty) & nbrs).size.toDouble / nbrs.size }
      rs.sum / rs.size
    }
    def recallThrough(idx: IvfIndex, nprobe: Int = 0): Double = recallOf(
      SimilarityOps.topKPerSrc(
        idx.knnJoinWith(probes, "vec_id", "embedding", k = 6,
            nprobe = nprobe)
          .filter(col("src_id") =!= col("dst_id"))
          .select("src_id", "dst_id", "cos_sim"), "cos_sim", 5)
        .collect())

    println(s"[twolevel] n=$n  (k2 = ceil(sqrt(k)) super-cells; " +
      "recall columns at the default nprobe = k/4 except the last — " +
      "the two-level index probed at k/2, the compensation lever)")
    println("[twolevel]    k   k2  agreement  recall_1lvl  recall_2lvl" +
      "  recall_2lvl_np2")
    val auto = IvfIndex.autoCellCount(n)
    for (k <- Seq(auto, (n / 8).toInt, (n / 4).toInt).distinct) {
      val ivf = IvfIndex.build(vecs, "vec_id", "embedding", k = k,
        persist = false)
      val e = vecs.select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
      val one = IvfIndex.assign(e, ivf.centroids, ivf.nCells)
      val two = IvfIndex.assignTwoLevel(e, ivf.centroids, ivf.nCells)
      val agree = one.select(col("vec_id"), col("cell").as("c1"))
        .join(two.select(col("vec_id"), col("cell").as("c2")), "vec_id")
        .agg(avg(when(col("c1") === col("c2"), 1.0).otherwise(0.0)))
        .head().getDouble(0)
      // splice the two-level corpus assignment into an index that is
      // otherwise identical (same centroids, same sketch column, same
      // probe path) — isolating the assignment as the only variable
      val idx2 = IvfIndex(
        two.withColumn("sketch", IvfIndex.sketchCol(col("embedding"))),
        ivf.centroids, ivf.nCells, n)
      val k2 = math.ceil(math.sqrt(ivf.nCells.toDouble)).toInt
      println(f"[twolevel] ${ivf.nCells}%4d  $k2%3d  $agree%9.3f" +
        f"  ${recallThrough(ivf)}%11.3f  ${recallThrough(idx2)}%11.3f" +
        f"  ${recallThrough(idx2, math.max(1, ivf.nCells / 2))}%15.3f")
    }
    spark.stop()
  }
}
