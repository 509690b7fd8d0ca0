package graft.tools

import graft.operators.{IvfIndex, IvfPqIndex, SimilarityOps}
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Batch-kNN frontier sweep: wall time and held-out mean recall@5 of
  * the IVF-PQ (and IVF) `knnJoinWith` at decreasing probed-cell
  * fractions — the measurement behind the default `nprobe = nCells/4`.
  * Stage-1 candidate volume rides queries × nprobe × (n/k), so halving
  * the probed fraction halves the dominant stage; the sweep shows what
  * that buys and what recall it costs at gate scale.
  *
  *   runMain graft.tools.KnnFrontier [sfDir]
  */
object KnnFrontier {
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

    // ground truth: the exact kNN join, self-matches removed
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

    val ivfpq = IvfPqIndex.forDir(spark, sfDir)
    val ivf = IvfIndex.forDir(spark, sfDir)
    println(f"[frontier] n=$n kCells=${ivfpq.nCells} " +
      f"(default nprobe: ivfpq=${ivfpq.nCells / 4} ivf=${ivf.nCells / 4})")
    println("[frontier] family  den  nprobe  wall1_s  wall2_s  recall@5")
    // one sweep body for both families, so a methodology change (runs,
    // k, filters) cannot skew the ivf-vs-ivfpq comparison
    def sweep(label: String,
        probe: (org.apache.spark.sql.DataFrame, Int) =>
          org.apache.spark.sql.DataFrame,
        nCells: Int, dens: Seq[Int]): Unit =
      for (den <- dens) {
        val np = math.max(1, nCells / den)
        def run() = {
          val t0 = System.nanoTime()
          val rows = SimilarityOps.topKPerSrc(
            probe(probes, np)
              .filter(col("src_id") =!= col("dst_id"))
              .select("src_id", "dst_id", "cos_sim"), "cos_sim", 5)
            .collect()
          ((System.nanoTime() - t0) / 1e9, rows)
        }
        val (w1, _) = run(); val (w2, rows) = run()
        println(f"[frontier] $label%-6s  $den%3d  $np%6d  $w1%7.2f" +
          f"  $w2%7.2f  ${recallOf(rows)}%.3f")
      }
    sweep("ivfpq",
      (q, np) => ivfpq.knnJoinWith(q, "vec_id", "embedding", k = 6,
        nprobe = np),
      ivfpq.nCells, Seq(4, 6, 8, 12, 16))
    sweep("ivf",
      (q, np) => ivf.knnJoinWith(q, "vec_id", "embedding", k = 6,
        nprobe = np),
      ivf.nCells, Seq(2, 4, 6, 8))
    spark.stop()
  }
}
