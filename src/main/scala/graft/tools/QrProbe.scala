package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: per-step IRLS trajectory of quantileReg's (a, b) on the
  * REGISTERED gate fixture (lineitem 1/8 stride, q=0.9) — the
  * measurement behind the `steps` parameter's value. Prints each
  * step's solved (a, b) and the 6dp-rendered deltas so "converged at
  * the render boundary" is read off directly.
  * Usage: runMain graft.tools.QrProbe <sfDir> [steps]
  */
object QrProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val logitMode = args.contains("--logit")
    val steps = args.drop(1).filterNot(_.startsWith("--"))
      .headOption.map(_.toInt).getOrElse(20)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // --logit: per-step β of the REGISTERED q_logit fixture (1/8
    // stride, returnflag label, discount+quantity covariates). β is
    // 10-dp rounded inside the loop, so two consecutive IDENTICAL βs
    // mean the Newton fixpoint is reached and every further step is a
    // no-op the board still pays — the measurement behind `steps`.
    if (logitMode) {
      val ipw = args.contains("--ipw")
      val base = graft.sources.Tables.lineitem(spark, sfDir)
        .filter(col("l_orderkey") % 8 === 0)
      val (fx, lbl, xs) =
        if (ipw) (base.withColumn("treat",
            when(col("l_discount") >= 0.05, 1.0).otherwise(0.0)),
          "treat", Seq("l_quantity", "l_tax"))
        else (base.withColumn("lbl",
            when(col("l_returnflag") === "R", 1.0).otherwise(0.0)),
          "lbl", Seq("l_discount", "l_quantity"))
      val pinned = graft.tools.Checkpoints.pin(fx)
      var prev: Seq[Double] = Nil
      for (k <- 1 to steps) {
        val (b, n, degen) =
          graft.operators.FitOps.irlsLoop(pinned, lbl, xs, k)
        val same = prev == b.toSeq
        println(s"[logit] steps=$k n=$n degen=$degen " +
          s"b=${b.mkString(",")} fixpoint=$same")
        prev = b.toSeq
      }
      spark.stop(); return
    }
    val dec = org.apache.spark.sql.types.DecimalType(38, 6)
    // --eps=X: weight-floor sweep (r17 advice: diagnose whether the
    // non-convergence is the floor oscillating, not slow-linear IRLS).
    // --pinball: also price each step's solution by its mean check
    // loss, the quantity IRLS is actually minimizing — "which step
    // count changes the published fit materially" is read off the
    // loss, not the raw coefficient motion.
    val qq = 0.9
    val eps = args.find(_.startsWith("--eps="))
      .map(_.stripPrefix("--eps=").toDouble).getOrElse(1e-3)
    val pinball = args.contains("--pinball")
    val data = graft.tools.Checkpoints.pin(
      graft.sources.Tables.lineitem(spark, sfDir)
        .filter(col("l_orderkey") % 8 === 0)
        .select(col("l_quantity").cast("double").as("x"),
          (col("l_extendedprice").cast("double") / 1000.0).as("y")))
    // --warmstart: step 0 = (exact unconditional p90 of y, slope 0)
    // instead of the OLS solve. The OLS start is the conditional MEAN
    // (a≈52 on this fixture) while the q=0.9 target sits at the p90
    // (a≈95) — the measured slow-linear crawl is the chain covering
    // that gap ~1/step, so starting at the right altitude should leave
    // IRLS only the (small) conditional slope to fit.
    val warm = args.contains("--warmstart")
    var a = 0.0; var b = 0.0
    if (warm) {
      a = data.agg(expr("percentile(y, 0.9)").as("p")).head().getDouble(0)
      println(f"[qr] warm start a=$a%14.8f b=0 " +
        s"hex=${java.lang.Double.toHexString(a)}")
    }
    for (k <- (if (warm) 1 else 0) to steps) {
      val r = col("y") - lit(a) - lit(b) * col("x")
      val w = if (k == 0) lit(1.0)
        else (when(r < 0, lit(1.0 - qq)).otherwise(lit(qq)) /
          greatest(lit(eps), abs(r)))
      val g = data.agg(
        sum(w.cast(dec)).cast("double").as("sw"),
        sum((w * col("x")).cast(dec)).cast("double").as("swx"),
        sum((w * col("y")).cast(dec)).cast("double").as("swy"),
        sum((w * col("x") * col("x")).cast(dec)).cast("double").as("swxx"),
        sum((w * col("x") * col("y")).cast(dec)).cast("double").as("swxy"))
        .head()
      val (sw, swx, swy, swxx, swxy) =
        (g.getDouble(0), g.getDouble(1), g.getDouble(2),
          g.getDouble(3), g.getDouble(4))
      val b1 = (sw * swxy - swx * swy) / (sw * swxx - swx * swx)
      val a1 = (swy - b1 * swx) / sw
      def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
      val loss = if (!pinball) "" else {
        val rr = col("y") - lit(a1) - lit(b1) * col("x")
        val pin = when(rr >= 0, lit(qq) * rr).otherwise(lit(qq - 1.0) * rr)
        val l = data.agg(
          (sum(pin.cast(org.apache.spark.sql.types.DecimalType(38, 12)))
            .cast("double") / count(lit(1)).cast("double")).as("mp"))
          .head().getDouble(0)
        f" pinball=$l%16.10f"
      }
      println(f"[qr] step=$k%2d a=$a1%14.8f b=$b1%14.8f " +
        f"da6=${r6(a1) - r6(a)}%12.3e db6=${r6(b1) - r6(b)}%12.3e" + loss)
      a = a1; b = b1
    }
    spark.stop()
  }
}
