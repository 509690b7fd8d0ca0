package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine operator (SURVEY.md §2.3): a Spark implementation
  * plus — when SQL-expressible — a DuckDB oracle for the driver's
  * hash-compare. `oracle` column names MUST match the Spark result's.
  */
final case class Query(
    name: String,
    oracle: Option[String],
    run: (SparkSession, String) => DataFrame)
