package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's parquet star schema (TESTDATA.md).
  *
  * All reads go through here so scale-sensitive read tuning (vectorized
  * parquet reader, partition sizing) has one home. On a real cluster these
  * would be catalog tables; `sfDir` stands in for the warehouse root.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // Session chokepoint: make the engine's native expressions callable.
    graft.functions.VectorOps.register(spark)
    name match {
      case "events" => events(spark, sfDir)
      case n        => spark.read.parquet(s"$sfDir/$n.parquet")
    }
  }

  /** `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS), which Spark
    * 4.x rejects outright. We read the raw int64 nanos
    * (`spark.sql.legacy.parquet.nanosAsLong`) and truncate ns→µs — exactly
    * the truncation DuckDB applies natively, so oracle timestamps agree
    * (SURVEY.md §1.2).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read
      .parquet(s"$sfDir/events.parquet")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  def lineitem(spark: SparkSession, sfDir: String): DataFrame =
    apply(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame =
    apply(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame =
    apply(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame =
    apply(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame =
    apply(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame =
    apply(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame =
    apply(spark, sfDir, "region")
  def documents(spark: SparkSession, sfDir: String): DataFrame =
    apply(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    apply(spark, sfDir, "embeddings")
}
