package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: write each named query's `.explain("formatted")` physical
  * plan to `<outDir>/<query>.txt` — the committed plan evidence for
  * optimization rounds (plans/rNN/<query>_{before,after}.txt). The
  * plan is captured AFTER one execution so AQE-final shapes and
  * session-cache state (pinned artifacts, cached relations) match what
  * the bench actually runs. Usage:
  *   runMain graft.tools.PlanExplain <sfDir> <outDir> <q1,q2,...> [suffix]
  */
object PlanExplain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    val names = args(2).split(',').toSeq.filter(_.nonEmpty)
    val suffix = if (args.length > 3) args(3) else ""
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
    java.nio.file.Files.createDirectories(outDir)
    names.foreach { name =>
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val rows = df.count()
      val secs = (System.nanoTime() - t0) / 1e9
      val header = f"-- $name | rows=$rows | wall=$secs%.2fs (this " +
        "session, construction+count) | " +
        s"sf=$sfDir | captured after execution\n"
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(outDir.resolve(s"$name$suffix.txt"),
        (header + plan).getBytes("UTF-8"))
      println(f"[planexplain] $name rows=$rows wall=$secs%.2fs")
    }
    spark.stop()
  }
}
