package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table utilities (SURVEY.md §4.2; prompt checklist:
  * "co-locate joins via bucketing or pre-partitioning").
  *
  * Writing both sides of a recurring join bucketed (and sorted) by the
  * join key makes every future join between them shuffle-free: each
  * bucket pair joins locally. On a 1000-executor cluster this converts
  * the nightly fact⋈dim shuffle — the dominant network cost at 100 TB —
  * into a narrow co-located merge. The cost is paid once at write time
  * (the bucketing write itself hash-distributes rows).
  */
object Warehouse {

  /** Write `df` as a bucketed+sorted managed parquet table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — planner emits
    * a shuffle-free sort-merge join (no Exchange on either side). */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** Write `df` to `path` Z-ORDERED on two bucket expressions: the
    * Morton key range-partitions the data into `files` tight 2-D
    * tiles and each file sorts by it, so parquet row-group min/max
    * stay narrow on BOTH underlying columns and a pushed filter on
    * either one skips row groups at read time
    * ([[graft.functions.ZOrder.zorderKey]]; StorageLayoutSpec measures
    * the skip). One range exchange at write time — the same cost as
    * any sorted export. */
  def writeZOrdered(df: DataFrame, path: String,
      xBucket: org.apache.spark.sql.Column,
      yBucket: org.apache.spark.sql.Column, files: Int): Unit = {
    import org.apache.spark.sql.functions.col
    df.withColumn("__z", graft.functions.ZOrder.zorderKey(xBucket, yBucket))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Compact a parquet directory's small files into
    * ~`targetBytes`-sized ones — the hygiene pass every streaming
    * sink needs (micro-batches bleed one-file-per-trigger; at 100 TB
    * the resulting millions of tiny files dominate scan planning and
    * NameNode/listing cost long before data volume does). Content is
    * preserved row-for-row; file count becomes
    * ⌈input_bytes / targetBytes⌉. Staged write + atomic-ish swap (the
    * overwriteSelfRead pattern): the new layout lands beside the old
    * under `<path>__compact`, then replaces it, so a reader never sees
    * a half-written directory. Returns the new file count. */
  def compactPath(spark: SparkSession, path: String,
      targetBytes: Long): Int = {
    require(targetBytes > 0, s"targetBytes must be positive; got $targetBytes")
    val hadoopPath = new org.apache.hadoop.fs.Path(path)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val inputBytes = fs.getContentSummary(hadoopPath).getLength
    val files = math.max(1, math.ceil(inputBytes.toDouble / targetBytes).toInt)
    val stage = new org.apache.hadoop.fs.Path(path + "__compact")
    spark.read.parquet(path)
      .repartition(files)
      .write.mode("overwrite").parquet(stage.toString)
    fs.delete(hadoopPath, true)
    require(fs.rename(stage, hadoopPath),
      s"compactPath: rename $stage -> $hadoopPath failed")
    files
  }

  /** Overwrite `table` with `df` even when df's PLAN READS `table` —
    * Spark (correctly) refuses a direct self-overwrite ("Cannot
    * overwrite a table that is also being read from"), which breaks
    * exactly the reopened-handle ingest path: an index handle from
    * `fromTable` derives its metadata frame from the sidecar it must
    * restamp. Staging through `<table>_stage` (write the new content,
    * re-read it free of the dependency, overwrite, drop the stage)
    * keeps the operation fully relational — no driver collect of the
    * content — at the cost of writing the small frame twice. */
  def overwriteSelfRead(df: DataFrame, table: String): Unit = {
    val spark = df.sparkSession
    val stage = table + "_stage"
    df.write.mode("overwrite").format("parquet").saveAsTable(stage)
    spark.table(stage).write.mode("overwrite").format("parquet")
      .saveAsTable(table)
    spark.sql(s"DROP TABLE IF EXISTS $stage")
  }
}
