package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source-format interop: the engine's operators are format-agnostic
  * DataFrame transforms, so every batch source Spark ships (parquet,
  * ORC, CSV, JSON lines) must feed them identically. Each case
  * round-trips the events fixture through a format and pins exact
  * row-level equality back against the parquet original — plus the
  * format-specific contract that makes the round-trip safe (explicit
  * schema for the text formats; timestamps via epoch micros, since
  * CSV/JSON string-format timestamps lose the sub-second contract
  * across locales). */
class SourceFormatsSpec extends SparkSpec {

  private def withFixtureDir[T](prefix: String)(body: String => T): T = {
    val dir = java.nio.file.Files.createTempDirectory(prefix).toFile
    try body(dir.toString)
    finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir)
    }
  }

  // normalize to a format-portable projection: timestamps as micros
  private def canonical = graft.sources.Tables.events(spark, sfDir)
    .select(col("event_id"), col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("ts_us"), col("value"))

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.select("event_id", "user_id", "event_type", "ts_us", "value")
      .collect().map(_.toSeq).toSet

  private lazy val want = rows(canonical)

  test("ORC round-trip is exact with no schema declaration (self-" +
    "describing, like parquet)") {
    withFixtureDir("graft-orc-") { dir =>
      canonical.write.orc(s"$dir/events_orc")
      assert(rows(spark.read.orc(s"$dir/events_orc")) === want)
    }
  }

  test("CSV round-trip is exact under an explicit schema (headers " +
    "carry names; types MUST be declared — inference re-guesses)") {
    withFixtureDir("graft-csv-") { dir =>
      canonical.write.option("header", "true").csv(s"$dir/events_csv")
      val schema = StructType(Seq(
        StructField("event_id", LongType), StructField("user_id", LongType),
        StructField("event_type", StringType),
        StructField("ts_us", LongType), StructField("value", DoubleType)))
      val back = spark.read.option("header", "true").schema(schema)
        .csv(s"$dir/events_csv")
      assert(rows(back) === want)
    }
  }

  test("JSON-lines round-trip is exact under an explicit schema, and " +
    "the operators run identically on it") {
    withFixtureDir("graft-json-") { dir =>
      canonical.write.json(s"$dir/events_json")
      val schema = StructType(Seq(
        StructField("event_id", LongType), StructField("user_id", LongType),
        StructField("event_type", StringType),
        StructField("ts_us", LongType), StructField("value", DoubleType)))
      val back = spark.read.schema(schema).json(s"$dir/events_json")
      assert(rows(back) === want)
      // operator-level equivalence: the anomaly scorer neither knows
      // nor cares which source format fed it
      val viaJson = graft.operators.EventOps
        .anomaly(back, "event_type", "event_id", "value")
        .collect().map(_.toSeq).toSeq
      val viaParquet = graft.operators.EventOps
        .anomaly(canonical, "event_type", "event_id", "value")
        .collect().map(_.toSeq).toSeq
      assert(viaJson === viaParquet)
    }
  }
}
