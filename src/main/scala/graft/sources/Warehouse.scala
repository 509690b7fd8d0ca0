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
}
