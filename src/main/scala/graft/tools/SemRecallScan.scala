package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.DedupOps

/** Dev tool: price the semantic-dedup k-vs-recall trade at NATURAL
  * thresholds (VERDICT r10 item 4) the way RecallScan prices IVF.
  *
  * The corpus's own max pair cosine is ~0.5, so pairs at τ∈{0.6,0.8}
  * are PLANTED: every 5th vector gains a deterministically
  * noise-perturbed copy `v' = v + α·rms(v)·u` (u a unit-RMS hash-noise
  * vector), with α chosen so cos(v,v') bands around the target —
  * α=0.62 → ~0.85, α=1.17 → ~0.65. Unlike q_dedup_semantic's exactly
  * parallel copies (which co-cluster provably), a perturbed copy can
  * land in a NEIGHBORING Lloyd cell — exactly the cross-cluster miss
  * this scan measures.
  *
  * Ground truth per τ is the exact block-matrix pair set
  * ([[DedupOps.embeddingPairs]]); the clustered path's recall is the
  * fraction of exactly-droppable ids (larger id of some exact pair) it
  * drops. Precision is exact by construction (within-cell pairs are
  * exact cosine — the subset property DedupOpsSpec pins), so recall is
  * the only free axis. Swept over nClusters; k=0 is the auto policy
  * (4·√n). Results → BASELINE.md §semantic-recall; the spec floor in
  * DedupOpsSpec is set from the auto-policy row minus margin.
  */
object SemRecallScan {

  /** Deterministic unit-RMS-ish noise component for (vec_id, dim). */
  private def noise(id: org.apache.spark.sql.Column,
      i: org.apache.spark.sql.Column) =
    (pmod(xxhash64(concat_ws("_", id, i)), lit(2001)) - lit(1000)) / lit(1000.0)

  /** Corpus + perturbed copies of every 5th vector at strength alpha. */
  def perturbed(vecs: DataFrame, alpha: Double): DataFrame = {
    val rms = sqrt(aggregate(col("embedding"), lit(0.0d),
      (acc, x) => acc + x * x) / size(col("embedding")))
    val copies = vecs.filter(col("vec_id") % 5 === 0)
      .withColumn("rms", rms)
      .select((col("vec_id") + 100000000L).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          x + lit(alpha) * col("rms") * noise(col("vec_id"), i))
          .as("embedding"))
    vecs.unionByName(copies)
  }

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val vecs = graft.sources.Tables.embeddings(spark, s"/root/testdata/sf$sf")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
    for ((alpha, tau) <- Seq((0.62, 0.8), (1.17, 0.6))) {
      val corpus = perturbed(vecs, alpha)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = corpus.count()
      val exactDrops = DedupOps.embeddingPairs(corpus, "vec_id", "embedding",
          tau).select("b_id").distinct()
        .collect().map(_.getLong(0)).toSet
      // planted-pair cosine band, for the record
      val band = DedupOps.embeddingPairs(corpus, "vec_id", "embedding", 0.5)
        .agg(min("cos_sim"), expr("percentile(cos_sim, 0.5)"), max("cos_sim"))
        .head()
      for (k <- Seq(0, 8, 16, 32, 64, 128)) {
        // the scoped-release lifecycle (r10 ADVICE): one index per
        // (corpus, k) point, closed before the next — no cache growth
        val si = DedupOps.semanticIndex(corpus, "vec_id", "embedding", k)
        val semDrops = si.keepers(tau).filter(!col("keeper"))
          .select("vec_id").collect().map(_.getLong(0)).toSet
        si.close()
        val invented = semDrops.diff(exactDrops)
        require(invented.isEmpty, s"invented drops: $invented")
        val recall =
          if (exactDrops.isEmpty) 1.0
          else (semDrops & exactDrops).size.toDouble / exactDrops.size
        println(f"[semrecall] sf$sf tau=$tau alpha=$alpha n=$n k=$k%-3d " +
          f"exact_drops=${exactDrops.size}%-4d recall=$recall%.3f " +
          f"band=[${band.getDouble(0)}%.2f,${band.getDouble(1)}%.2f," +
          f"${band.getDouble(2)}%.2f]")
      }
      corpus.unpersist()
    }
    spark.stop()
  }
}
