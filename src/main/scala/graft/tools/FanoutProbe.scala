package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the r17-verdict c8-beats-c32 inversion: at a fixed
  * core count, how does the CACHED-table partition count move the
  * warm medians of the query shapes that anti-scaled (document/text
  * pipelines, iterative sweeps)? Isolates "32 tiny tasks per stage"
  * (fixed per-task overhead) from "32 concurrent tasks on one heap"
  * (GC) — the former moves with the partition count at a fixed
  * master, the latter does not.
  *
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.tools.FanoutProbe <sfDir> [parts...]
  */
object FanoutProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val partsList =
      if (args.length > 1) args.drop(1).map(_.toInt).toSeq
      else Seq(32, 8, 2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "65536")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "8192")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    partsList.foreach { p =>
      spark.sharedState.cacheManager.clearCache()
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .repartition(p, col("doc_id")).persist()
      docs.count()
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .repartition(p, col("l_orderkey")).persist()
      li.count()
      // warm one round, then median-of-3
      def tokenize() = docs
        .select(explode(split(lower(col("text")), " ")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("n"))
        .orderBy(desc("n")).limit(50).count()
      def gram() = li.agg(
        sum(col("l_quantity").cast("decimal(38,6)")).as("s1"),
        sum((col("l_quantity") * col("l_quantity")).cast("decimal(38,6)"))
          .as("s11"),
        sum((col("l_quantity") * col("l_extendedprice"))
          .cast("decimal(38,6)")).as("s1y"),
        sum((col("l_extendedprice") * col("l_extendedprice"))
          .cast("decimal(38,6)")).as("syy")).count()
      def sweeps() = {
        // 4 chained groupBy/join rounds over a small derived table —
        // the label-prop/CC shape (many tiny stages)
        var t = docs.select(col("doc_id").as("n"),
          (col("doc_id") % 97).as("l"))
        for (_ <- 1 to 4) {
          val m = t.groupBy("l").agg(min("n").as("mn"))
          t = t.join(m, "l").select(col("n"), (col("mn") % 89).as("l"))
        }
        t.groupBy("l").count().orderBy("l").count()
      }
      Seq(("tokenize", tokenize _), ("gram", gram _),
        ("sweeps", sweeps _)).foreach { case (name, f) =>
        f() // warm (codegen, cache)
        val ts = (1 to 3).map(_ => time(f())).sorted
        println(f"[fanout] parts=$p%2d $name%-9s median=${ts(1)}%6.3f s " +
          f"(min=${ts.head}%6.3f max=${ts.last}%6.3f)")
      }
      docs.unpersist(); li.unpersist()
    }
    spark.stop()
  }
}
