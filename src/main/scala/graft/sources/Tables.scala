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
      // input split (single row group), so without an explicit
      // repartition every downstream pipeline — however narrow — runs
      // its whole MAP side single-task (q_doc_dedup spent 34 s
      // single-threaded in the r01 driver bench; r18 found the same
      // serialization on every lineitem/orders aggregate: the scan
      // stage of each heavy decimal fold ran on ONE core at any CPU
      // count — the measured 8-core≈32-core anti-scaling). Hash-
      // distribute on each table's primary join key at the loader so
      // no query can forget; the key is also the join/groupBy key of
      // the heavy pipelines, so that shuffle is REUSED
      // (hashpartitioning(key) satisfies the join's required
      // distribution — no second exchange). [[distributeIfUnsplit]]
      // makes the rebalance scale-adaptive: it fires only when the
      // source arrives in fewer splits than the session's parallelism
      // (a one-file fixture, a tiny dimension), and is a no-op on a
      // warehouse-scale scan that already arrives split.
      // documents/embeddings are CPU-DENSE per byte — shingling,
      // minhash permutations, 64-d vector products: their pair/verify
      // pipelines do seconds of work per source KB, so a bytes-sized
      // partition count under-parallelizes them by orders of magnitude
      // (measured r18: data-sized documents collapsed to 1 partition
      // and q_setsim_join went 1.8 → 9.6 s, q_knn_join 0.8 → 3.9 s).
      // They stay PARALLELISM-FIRST (the r01 rule): spread to the
      // cores, because the work unit is rows × per-row CPU, not bytes.
      case "documents"  => distributeIfUnsplit(spark,
        s"$sfDir/documents.parquet", col("doc_id"),
        bytesSized = false)
      case "embeddings" => distributeIfUnsplit(spark,
        s"$sfDir/embeddings.parquet", col("vec_id"),
        bytesSized = false)
      // the relational tables are BANDWIDTH-dense (narrow scans,
      // decimal folds): bytes ≈ work, so they take the data-sized
      // count — the r18 inversion fix
      case "lineitem"   => distributeIfUnsplit(spark,
        s"$sfDir/lineitem.parquet", col("l_orderkey"))
      case "orders"     => distributeIfUnsplit(spark,
        s"$sfDir/orders.parquet", col("o_orderkey"))
      case n            => spark.read.parquet(s"$sfDir/$n.parquet")
    }
  }

  /** Target bytes per cached partition for the loader rebalance —
    * overridable per session via `graft.loader.partitionTargetBytes`.
    * 4 MiB measured (FanoutProbe, r18): on the local fixtures every
    * stage over a table cached at `defaultParallelism` partitions paid
    * ~10-15 ms of pure per-task overhead × cores PER STAGE (the
    * r17-verdict 8-core-beats-32-core inversion: 32 tiny tasks lose to
    * 8 on the same data at the same master — sweeps-shape probe 4.5 s
    * at 32 parts vs 0.53 s at 1). Partition counts must derive from
    * DATA SIZE (guide §2.2/§6), not the core count. */
  private def partitionTarget(spark: SparkSession): Long =
    spark.conf.get("graft.loader.partitionTargetBytes", null) match {
      case null => 4L << 20
      case s    => org.apache.spark.network.util.JavaUtils
        .byteStringAsBytes(s)
    }

  /** Read `path` and hash-distribute it on `key` over a DATA-SIZED
    * partition count — ceil(bytes / [[partitionTarget]]), clamped to
    * [1, defaultParallelism] — but ONLY when the source cannot split
    * to that count on its own (estimated splits = bytes /
    * `spark.sql.files.maxPartitionBytes`). At warehouse scale the
    * estimate exceeds the cap and the read passes through untouched
    * (no extra shuffle); on the single-file local fixtures it
    * distributes once — and since the loader output is what sessions
    * cache, every downstream scan inherits the parallel,
    * key-partitioned layout. */
  private def distributeIfUnsplit(spark: SparkSession, path: String,
      key: org.apache.spark.sql.Column,
      bytesSized: Boolean): DataFrame =
    distributeIfUnsplit(spark, path, spark.read.parquet(path), key,
      bytesSized)

  private def distributeIfUnsplit(spark: SparkSession, path: String,
      key: org.apache.spark.sql.Column): DataFrame =
    distributeIfUnsplit(spark, path, spark.read.parquet(path), key,
      bytesSized = true)

  /** [[distributeIfUnsplit]] over an already-adapted frame (`events`,
    * whose `ts` layout fix must run before the rebalance).
    * `bytesSized = false` is the CPU-dense regime: partition count =
    * defaultParallelism regardless of bytes (work unit is per-row CPU,
    * not bandwidth). */
  private def distributeIfUnsplit(spark: SparkSession, path: String,
      df: DataFrame, key: org.apache.spark.sql.Column,
      bytesSized: Boolean = true): DataFrame = {
    val f = new java.io.File(path)
    val bytes =
      if (f.isDirectory)
        Option(f.listFiles()).map(_.map(_.length).sum).getOrElse(0L)
      else f.length()
    val target = partitionTarget(spark)
    val n =
      if (bytesSized) math.max(1L, math.min(
        spark.sparkContext.defaultParallelism.toLong,
        (bytes + target - 1) / target)).toInt
      else spark.sparkContext.defaultParallelism
    val maxSplit = org.apache.spark.network.util.JavaUtils
      .byteStringAsBytes(spark.conf
        .get("spark.sql.files.maxPartitionBytes", "128m"))
    val splits = math.max(1L, (bytes + maxSplit - 1) / maxSplit)
    if (splits < n) df.repartition(n, key) else df
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
    val adapted = raw.schema("ts").dataType match {
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
    // distribute like the other single-file fixtures — user_id is the
    // dominant window/groupBy key of the event pipelines, so the
    // loader's hash layout is reused by the per-user windows
    distributeIfUnsplit(spark, s"$sfDir/events.parquet", adapted,
      col("user_id"))
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
