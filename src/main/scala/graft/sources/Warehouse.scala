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
      yBucket: org.apache.spark.sql.Column, files: Int): Unit =
    writeZOrdered(df, path, Seq(xBucket, yBucket), files)

  /** N-dimensional form (2–4 bucket expressions): the same one-range-
    * exchange write, tiling every keyed dimension at once. Capacity
    * per dim falls with N (2³² / 2²¹ / 2¹⁶ tiles) — see
    * [[graft.functions.ZOrder]]. */
  def writeZOrdered(df: DataFrame, path: String,
      buckets: Seq[org.apache.spark.sql.Column], files: Int): Unit = {
    import org.apache.spark.sql.functions.col
    df.withColumn("__z", graft.functions.ZOrder.zorderKey(buckets))
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
    * preserved row-for-row; the file count targets
    * ⌈input_bytes / targetBytes⌉ (the ACTUAL on-disk count is
    * returned — empty partitions write no file). Staged write +
    * checked three-step swap: the new layout lands beside the old at
    * `<path>__compact`, the old moves aside to `<path>__old`, the
    * stage renames in, the old drops — the data is reachable at the
    * canonical or __old path at every step, and a failed rename
    * restores the original instead of losing it. Not safe against a
    * CONCURRENT writer; readers racing the two renames can observe a
    * brief not-found, never a half-written directory. */
  def compactPath(spark: SparkSession, path: String,
      targetBytes: Long): Int = {
    require(targetBytes > 0, s"targetBytes must be positive; got $targetBytes")
    // Path-normalize FIRST and derive siblings via the parent — string
    // concatenation on a trailing-slash path would put the stage INSIDE
    // the directory being replaced (deleting it would destroy both)
    val target = new org.apache.hadoop.fs.Path(path)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stage = new org.apache.hadoop.fs.Path(target.getParent,
      target.getName + "__compact")
    val retired = new org.apache.hadoop.fs.Path(target.getParent,
      target.getName + "__old")
    // leftovers from a crashed prior run must not poison the swap
    fs.delete(stage, true)
    fs.delete(retired, true)
    val inputBytes = fs.getContentSummary(target).getLength
    val files = math.max(1, math.ceil(inputBytes.toDouble / targetBytes).toInt)
    spark.read.parquet(target.toString)
      .repartition(files)
      .write.mode("overwrite").parquet(stage.toString)
    // rename-aside → rename-in → delete: the data is reachable at
    // EITHER the canonical or the __old path at every step, and each
    // rename's result is checked — a failed swap leaves the original
    // intact instead of silently nesting the stage inside it
    require(fs.rename(target, retired),
      s"compactPath: rename $target -> $retired failed; nothing changed")
    if (!fs.rename(stage, target)) {
      // restore and fail loudly — the original is still whole
      fs.rename(retired, target)
      throw new IllegalStateException(
        s"compactPath: rename $stage -> $target failed; original restored")
    }
    fs.delete(retired, true)
    // actual on-disk count: empty partitions write no file, so the
    // requested count can exceed reality on few-row inputs
    fs.listStatus(target)
      .count(_.getPath.getName.endsWith(".parquet"))
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
