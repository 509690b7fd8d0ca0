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
    graft.functions.TextHashOps.register(spark)
    name match {
      case "events"     => events(spark, sfDir)
      // The driver lays each corpus table out as ONE parquet file = one
      // input split, so without an explicit repartition every downstream
      // pipeline — however narrow — runs single-task (q_doc_dedup spent
      // 34 s single-threaded in the r01 driver bench). Hash-distribute on
      // the id at the loader so no query can forget; the id is also the
      // groupBy/join key of the heavy document pipelines, so that shuffle
      // is reused (hashpartitioning(doc_id) satisfies the aggregate's
      // required distribution — no second exchange). On a warehouse-scale
      // scan the file arrives already split and this repartition is a
      // cheap rebalance of an input that needed distributing anyway.
      case "documents"  => spark.read.parquet(s"$sfDir/documents.parquet")
        .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      case "embeddings" => spark.read.parquet(s"$sfDir/embeddings.parquet")
        .repartition(spark.sparkContext.defaultParallelism, col("vec_id"))
      case n            => spark.read.parquet(s"$sfDir/$n.parquet")
    }
  }

  /** The driver has shipped `events.parquet` with two `ts` layouts: parquet
    * TIMESTAMP(NANOS) (which Spark 4.x rejects outright, so we read the raw
    * int64 nanos via `spark.sql.legacy.parquet.nanosAsLong` and truncate
    * ns→µs — the truncation DuckDB applies natively, SURVEY.md §1.2) and,
    * since round 9, plain TIMESTAMP(MICROS) which Spark reads directly.
    * Adapt on the inferred type rather than assuming either layout: only a
    * LongType `ts` (the nanos-as-long read) needs the conversion.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // Micros-without-zone infers as NTZ; downstream code (and the old
        // nanos path's timestamp_micros) expects TimestampType. The cast
        // is wall-clock-identical to DuckDB's naive read of the same file
        // ONLY under a UTC session zone — under any other zone it would
        // silently shift every instant, so the invariant fails loudly
        // here instead (r10 ADVICE; every entrypoint in this engine sets
        // UTC, this guards ad-hoc sessions).
        require(spark.conf.get("spark.sql.session.timeZone") == "UTC",
          "Tables.events requires spark.sql.session.timeZone=UTC: the " +
            "NTZ→Timestamp cast of events.ts is zone-sensitive and the " +
            s"session zone is '${spark.conf.get("spark.sql.session.timeZone")}'")
        raw.withColumn("ts", col("ts").cast(
          org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
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
