package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measured row-group skip of Z-ordered layouts vs a single-sorted
  * baseline (the source of BASELINE.md §zorder): writes lineitem at
  * the given sf dir in (a) price-sorted and (b) 2-D / 3-D Z-ordered
  * layouts, then reports scanned rows for secondary-dimension filters.
  *
  * Usage: runMain graft.tools.ZOrderProbe /root/testdata/sf0.01
  */
object ZOrderProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def scanRows(df: DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collectLeaves()
        .map(_.metrics("numOutputRows").value).sum
    }

    val dir = java.nio.file.Files.createTempDirectory("zorder-probe-")
      .toString
    val li = graft.sources.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_quantity", "l_extendedprice", "l_discount")
    val total = li.count()

    li.repartitionByRange(64, col("l_extendedprice"))
      .sortWithinPartitions("l_extendedprice")
      .write.parquet(s"$dir/sorted")
    graft.sources.Warehouse.writeZOrdered(li, s"$dir/z2",
      Seq(floor(col("l_extendedprice") / lit(2000.0)), col("l_quantity")),
      files = 64)
    graft.sources.Warehouse.writeZOrdered(li, s"$dir/z3",
      Seq(floor(col("l_extendedprice") / lit(8192.0)),
        floor(col("l_quantity") / lit(4.0)),
        floor(col("l_discount") * lit(100.0))),
      files = 64)

    def q(path: String, f: DataFrame => DataFrame): Long =
      scanRows(f(spark.read.parquet(path)))
    val qty = (d: DataFrame) =>
      d.filter(col("l_quantity") >= 10.0 && col("l_quantity") <= 12.0)
    val disc = (d: DataFrame) => d.filter(col("l_discount") === 0.04)
    val price = (d: DataFrame) =>
      d.filter(col("l_extendedprice") < 10000.0)

    println(s"""{"rows":$total,"filters":{""" +
      s""""qty_10_12":{"sorted":${q(s"$dir/sorted", qty)},""" +
      s""""z2":${q(s"$dir/z2", qty)},"z3":${q(s"$dir/z3", qty)}},""" +
      s""""disc_004":{"sorted":${q(s"$dir/sorted", disc)},""" +
      s""""z2":${q(s"$dir/z2", disc)},"z3":${q(s"$dir/z3", disc)}},""" +
      s""""price_lt_10k":{"sorted":${q(s"$dir/sorted", price)},""" +
      s""""z2":${q(s"$dir/z2", price)},"z3":${q(s"$dir/z3", price)}}}}""")
    spark.stop()
  }
}
