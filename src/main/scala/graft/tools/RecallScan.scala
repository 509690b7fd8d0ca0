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
    val rerankOnly = args.contains("--rerank-only")
    val sfArgs = args.toSeq.filterNot(_ == "--rerank-only")
    val sfs = if (sfArgs.nonEmpty) sfArgs else Seq("0.01")
    val probes = (0L until 10L).toSeq
    for (sf <- sfs) {
      val dir = s"/root/testdata/sf$sf"
      val n = graft.sources.Tables.embeddings(spark, dir).count().toDouble
      val bf = probes.map { p =>
        p -> SimilarityOps.bruteForceTopK(spark, dir, probeId = p).collect()
          .map(_.getLong(0)).toSet
      }.toMap
      // --rerank-only skips the (slow) single-stage build sweep while
      // iterating on the reranked frontier below
      for (k <- Seq(8, 16, 32) if !rerankOnly; iters <- Seq(1, 2, 4)) {
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

      // Two-stage reranked probe frontier (k=32, iters=2 — the build
      // default): wide-nprobe sketch sweep + exact rescore of the best
      // `cap` candidates. `rows` is the fraction of corpus rows whose
      // sketch is read; `bytes` the byte-weighted scan fraction on a
      // column-pruned cell-bucketed layout — (rows·(8B id + 32B sketch)
      // + cap·(540B full row)) / (n·540B).
      val idx = IvfIndex.build(graft.sources.Tables.embeddings(spark, dir),
        "vec_id", "embedding")
      val cellSizes = idx.cells.groupBy("cell").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      val kCells = idx.nCells
      val fullRow = 8.0 + 32.0 + 512.0 // id + sketch + 64-dim double vec
      def rerankRow(nprobe: Int, cap: Int, tag: String): Unit = {
        val (recall, rows) = probes.map { p =>
          val got = idx.topK(p, 10, nprobe, rescoreCap = cap).collect()
            .map(_.getLong(0)).toSet
          val r = (bf(p) & got).size.toDouble / bf(p).size
          val probeVec = idx.cells
            .filter(org.apache.spark.sql.functions.col("vec_id") === p)
            .select("embedding").head().getSeq[Double](0)
          val s = idx.nearestCellsOf(probeVec, nprobe)
            .map(c => cellSizes.getOrElse(c, 0L)).sum / n
          (r, s)
        }.reduce((a, b) => (a._1 + b._1, a._2 + b._2)) match {
          case (r, s) => (r / probes.size, s / probes.size)
        }
        val bytes = (rows * n * 40.0 + cap * fullRow) / (n * fullRow)
        println(f"[recall] sf$sf $tag nprobe=$nprobe%-2d cap=$cap%-5d " +
          f"recall@10=$recall%.3f rows=$rows%.2f bytes=$bytes%.3f")
      }
      for (nprobe <- Seq(8, 12, 16, 24, 32) if nprobe <= kCells;
           capFrac <- Seq(0.02, 0.05, 0.10))
        rerankRow(nprobe, math.max(40, (n * capFrac).toInt), "RERANK")
      // ABSOLUTE caps at the topKAuto nprobe (3/4 of cells): the rows
      // that justify IvfIndex.AutoRescoreCeiling — a CONSTANT rescore
      // budget must hold the recall floor, because at 100× the corpus
      // only an absolute cap keeps stage 2 O(C) per probe
      for (cap <- Seq(64, 128, 256, 512))
        rerankRow(math.max(1, kCells * 3 / 4), cap, "ABSCAP")
      idx.close()

      // CELL-COUNT frontier (the k ≈ √n policy's evidence): sweep the
      // cell count at FIXED nprobe fractions — the scanned fraction per
      // probe is nprobe/k, so it must FALL as k grows at held recall.
      // Uses the single-point topKVec probe path (external vector) with
      // the two-stage rerank at the topKAuto cap policy.
      for (kc <- Seq(16, 32, 64, 128, 256)
           if kc <= n / 4) {
        val kidx = IvfIndex.build(
          graft.sources.Tables.embeddings(spark, dir),
          "vec_id", "embedding", k = kc)
        val sizes = kidx.cells.groupBy("cell").count().collect()
          .map(r => r.getInt(0) -> r.getLong(1)).toMap
        for (frac <- Seq(4, 2)) { // nprobe = k/4, k/2
          val nprobe = math.max(1, kc / frac)
          val cap = math.max(40, math.min((n * 0.08).toLong,
            IvfIndex.AutoRescoreCeiling).toInt)
          val (recall, rows) = probes.map { p =>
            val got = kidx.topK(p, 10, nprobe, rescoreCap = cap).collect()
              .map(_.getLong(0)).toSet
            val r = (bf(p) & got).size.toDouble / bf(p).size
            val probeVec = kidx.cells
              .filter(org.apache.spark.sql.functions.col("vec_id") === p)
              .select("embedding").head().getSeq[Double](0)
            val s = kidx.nearestCellsOf(probeVec, nprobe)
              .map(c => sizes.getOrElse(c, 0L)).sum / n
            (r, s)
          }.reduce((a, b) => (a._1 + b._1, a._2 + b._2)) match {
            case (r, s) => (r / probes.size, s / probes.size)
          }
          println(f"[recall] sf$sf KFRONT k=$kc%-4d nprobe=$nprobe%-3d " +
            f"cap=$cap%-4d recall@10=$recall%.3f scan=$rows%.2f")
        }
        kidx.close()
      }

      // IVF-PQ frontier: cells × nprobe-fraction × rescore cap. The
      // byte proxy: stage 1 reads (8B id + 4B cell + 8×0.5B codes) of
      // the probed cells' rows + cap full rows.
      for (kc <- Seq(16, 32, 64) if kc <= n / 4) {
        val pidx = graft.operators.IvfPqIndex.build(
          graft.sources.Tables.embeddings(spark, dir),
          "vec_id", "embedding", kCells = kc)
        val sizes = pidx.cells.groupBy("cell").count().collect()
          .map(r => r.getInt(0) -> r.getLong(1)).toMap
        val cellsOf = (p: Long, nprobe: Int) => {
          val v = pidx.cells
            .filter(org.apache.spark.sql.functions.col("vec_id") === p)
            .select("embedding").head().getSeq[Double](0)
          graft.operators.IvfIndex
            .cosineRankedCells(pidx.centroids, v, nprobe)
        }
        for (frac <- Seq(4, 2); cap <- Seq(128, 192, 256)) {
          val nprobe = math.max(1, kc / frac)
          val (recall, rows) = probes.map { p =>
            val got = pidx.topK(p, 10, nprobe, rescoreCap = cap).collect()
              .map(_.getLong(0)).toSet
            val r = (bf(p) & got).size.toDouble / bf(p).size
            val s = cellsOf(p, nprobe)
              .map(c => sizes.getOrElse(c, 0L)).sum / n
            (r, s)
          }.reduce((a, b) => (a._1 + b._1, a._2 + b._2)) match {
            case (r, s) => (r / probes.size, s / probes.size)
          }
          val bytes = (rows * n * 16.0 + cap * fullRow) / (n * fullRow)
          println(f"[recall] sf$sf IVFPQ k=$kc%-4d nprobe=$nprobe%-3d " +
            f"cap=$cap%-4d recall@10=$recall%.3f rows=$rows%.2f " +
            f"bytes=$bytes%.3f")
        }
        pidx.close()
      }
    }
    spark.stop()
  }
}
