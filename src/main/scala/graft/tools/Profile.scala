package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev profiler: run named queries (default: all) twice each against a
  * scale dir and print cold/warm wall times, separating JVM/codegen
  * warmup from steady-state cost. Usage:
  *   runMain graft.tools.Profile <sfDir> [query ...]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_CACHE=1 reproduces Bench's cached-tables regime
    if (sys.env.get("SPARK_GRAFT_CACHE").contains("1"))
      graft.sources.Tables.names.foreach { n =>
        try graft.sources.Tables(spark, sfDir, n).persist().count()
        catch { case _: Throwable => () }
      }
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val cold = once(); val warm = once()
      println(f"[profile] $name%-24s cold $cold%7.2fs  warm $warm%7.2fs")
    }
    spark.stop()
  }
}
