package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The registry is assembled from the per-tier operator packages; each
  * `Query` carries its own DuckDB oracle when SQL-expressible.
  */
object SparkEntry {

  private def registry: Seq[Query] =
    ReferenceOps.all ++ RelationalOps.all ++ EventOps.all ++
      ConstraintOps.all ++ FunctionOps.all ++ StreamingOps.all ++
      TextOps.all ++ DedupOps.all ++ CurationOps.all ++
      SimilarityOps.all ++ MultimodalOps.all ++ GraphOps.all ++
      AffinityOps.all ++ StatsOps.all ++ GeoOps.all ++
      FitOps.all ++ ProfileOps.all ++ HypothesisOps.all ++ PcaOps.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ReferenceOps.alertPipeline(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(sql => q.name -> sql.trim)).toMap
}
