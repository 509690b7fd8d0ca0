package graft.tools

import graft.operators.{IvfIndex, SimilarityOps}
import org.apache.spark.sql.SparkSession

/** Dev tool: measure IVF/ANN recall across corpora and parameters. */
object RecallScan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("0.001", "0.01", "0.1")) {
      val dir = s"/root/testdata/sf$sf"
      val bf = SimilarityOps.bruteForceTopK(spark, dir).collect()
        .map(_.getLong(0)).toSet
      for (k <- Seq(8, 16, 32); nprobe <- Seq(2, 4, 6, 8)) {
        if (nprobe <= k) {
          val idx = IvfIndex.build(
            graft.sources.Tables.embeddings(spark, dir), "vec_id", "embedding", k = k)
          val got = idx.topK(0L, 10, nprobe).collect().map(_.getLong(0)).toSet
          val recall = (bf & got).size.toDouble / bf.size
          println(f"[recall] sf$sf k=$k%-3d nprobe=$nprobe%-2d ivf=$recall%.2f")
          idx.cells.unpersist()
        }
      }
    }
    spark.stop()
  }
}
