package graft.tools

import graft.operators.{IvfIndex, SimilarityOps}
import org.apache.spark.sql.SparkSession

/** Dev tool: measure the IVF recall/cost frontier deterministically.
  *
  * Recall@10 is averaged over the first 10 probe ids (a single probe is
  * one Bernoulli draw per neighbor — too noisy to set spec bounds from),
  * swept over (k cells, Lloyd iters, nprobe). `scan` is the probe's cost
  * proxy: the fraction of the corpus the nprobe cells actually hold.
  * Results are recorded in BASELINE.md §IVF; SimilaritySpec's bound is
  * set from the frontier at the default (k=32, iters=2, nprobe=8).
  */
object RecallScan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfs = if (args.nonEmpty) args.toSeq else Seq("0.01")
    val probes = (0L until 10L).toSeq
    for (sf <- sfs) {
      val dir = s"/root/testdata/sf$sf"
      val n = graft.sources.Tables.embeddings(spark, dir).count().toDouble
      val bf = probes.map { p =>
        p -> SimilarityOps.bruteForceTopK(spark, dir, probeId = p).collect()
          .map(_.getLong(0)).toSet
      }.toMap
      for (k <- Seq(8, 16, 32); iters <- Seq(1, 2, 4)) {
        val idx = IvfIndex.build(
          graft.sources.Tables.embeddings(spark, dir),
          "vec_id", "embedding", k = k, iters = iters)
        val cellSizes = idx.cells.groupBy("cell").count().collect()
          .map(r => r.getInt(0) -> r.getLong(1)).toMap
        for (nprobe <- Seq(2, 4, 6, 8, 12) if nprobe <= k) {
          val (recall, scan) = probes.map { p =>
            val got = idx.topK(p, 10, nprobe).collect()
              .map(_.getLong(0)).toSet
            val r = (bf(p) & got).size.toDouble / bf(p).size
            val probeVec = idx.cells
              .filter(org.apache.spark.sql.functions.col("vec_id") === p)
              .select("embedding").head().getSeq[Double](0)
            val cells = idx.nearestCellsOf(probeVec, nprobe)
            val s = cells.map(c => cellSizes.getOrElse(c, 0L)).sum / n
            (r, s)
          }.reduce((a, b) => (a._1 + b._1, a._2 + b._2)) match {
            case (r, s) => (r / probes.size, s / probes.size)
          }
          println(f"[recall] sf$sf k=$k%-3d iters=$iters nprobe=$nprobe%-2d " +
            f"recall@10=$recall%.3f scan=$scan%.2f")
        }
        idx.close()
      }
    }
    spark.stop()
  }
}
