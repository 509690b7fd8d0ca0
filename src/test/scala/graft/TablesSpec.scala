package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Pins the `events.ts` loader adaptation (Tables.events).
  *
  * The driver has regenerated `events.parquet` with different physical `ts`
  * layouts across rounds: TIMESTAMP(NANOS) (read as raw int64 via
  * nanosAsLong), and since round 9 TIMESTAMP(MICROS) (which Spark infers as
  * TIMESTAMP_NTZ). Round 9 lost all 18 events-backed queries to a loader
  * that assumed the nanos layout — this suite makes any future layout change
  * fail HERE, in `sbt test`, instead of silently at driver time.
  */
class TablesSpec extends SparkSpec {
  import graft.sources.Tables

  test("driver testdata events.ts resolves to TimestampType and queries run") {
    val ev = Tables.events(spark, sfDir)
    assert(ev.schema("ts").dataType == TimestampType,
      s"ts inferred as ${ev.schema("ts").dataType}")
    // unix_micros is the canary: it rejects both LongType and TIMESTAMP_NTZ,
    // the two raw layouts the loader must normalize away.
    val n = ev.select(expr("unix_micros(ts)")).count()
    assert(n > 0)
  }

  test("driver testdata carries the columns and types the engine assumes") {
    import org.apache.spark.sql.types._
    // The canary for the NEXT silent regeneration: every column the query
    // surface depends on, with its loader-normalized type. A driver-side
    // layout change fails here, in `sbt test`, naming the drifted column.
    val expected = Map(
      "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
        "lang" -> StringType, "source" -> StringType,
        "n_chars" -> LongType),
      "embeddings" -> Seq("vec_id" -> LongType,
        "embedding" -> ArrayType(FloatType), "label" -> IntegerType),
      "events" -> Seq("event_id" -> LongType, "ts" -> TimestampType,
        "user_id" -> LongType, "event_type" -> StringType,
        "value" -> DoubleType, "props" -> StringType))
    expected.foreach { case (table, cols) =>
      val schema = Tables(spark, sfDir, table).schema
      cols.foreach { case (name, tpe) =>
        assert(schema.fieldNames.contains(name), s"$table lost column $name")
        assert(schema(name).dataType == tpe,
          s"$table.$name drifted to ${schema(name).dataType}, engine " +
            s"assumes $tpe")
      }
    }
    // the TPC-H-ish star: key columns only (join keys + the measures the
    // pricing/window queries aggregate)
    val li = Tables.lineitem(spark, sfDir).schema
    Seq("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
      "l_extendedprice", "l_discount", "l_returnflag", "l_shipdate")
      .foreach(c => assert(li.fieldNames.contains(c), s"lineitem lost $c"))
    val ord = Tables.orders(spark, sfDir).schema
    Seq("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .foreach(c => assert(ord.fieldNames.contains(c), s"orders lost $c"))
  }

  // fixture dirs are java.nio temp dirs removed in a finally — repeated
  // runs must not accumulate /tmp garbage (r10 ADVICE)
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

  test("legacy int64-nanos layout still converts (ts div 1000 branch)") {
    withFixtureDir("graft-events-nanos-") { dir =>
      // 2020-01-01T00:00:00.123456789Z in nanos; truncation keeps micros
      val nanos = 1577836800L * 1000000000L + 123456789L
      spark.range(1).select(lit(nanos).as("ts"), lit("d1").as("device"))
        .write.parquet(s"$dir/events.parquet")
      val ev = Tables.events(spark, dir)
      assert(ev.schema("ts").dataType == TimestampType)
      val micros = ev.select(expr("unix_micros(ts)")).head.getLong(0)
      assert(micros == 1577836800L * 1000000L + 123456L)
    }
  }

  test("micros-NTZ layout passes through as wall-clock-identical TIMESTAMP") {
    withFixtureDir("graft-events-ntz-") { dir =>
      spark.range(1)
        .select(expr("CAST(TIMESTAMP_NTZ'2020-01-01 00:00:00.123456' AS " +
          "TIMESTAMP_NTZ)").as("ts"), lit("d1").as("device"))
        .write.parquet(s"$dir/events.parquet")
      // Confirm the fixture really round-trips as NTZ before testing the loader
      assert(spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
        != LongType)
      val ev = Tables.events(spark, dir)
      assert(ev.schema("ts").dataType == TimestampType)
      // Session TZ is UTC, so the cast must preserve the wall-clock instant
      val micros = ev.select(expr("unix_micros(ts)")).head.getLong(0)
      assert(micros == 1577836800L * 1000000L + 123456L)
    }
  }

  test("NTZ loader path fails loudly under a non-UTC session zone " +
      "(r10 ADVICE: never silently shift events.ts)") {
    withFixtureDir("graft-events-tz-") { dir =>
      spark.range(1)
        .select(expr("CAST(TIMESTAMP_NTZ'2020-01-01 00:00:00' AS " +
          "TIMESTAMP_NTZ)").as("ts"), lit("d1").as("device"))
        .write.parquet(s"$dir/events.parquet")
      val prev = spark.conf.get("spark.sql.session.timeZone")
      try {
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        val e = intercept[IllegalArgumentException] {
          Tables.events(spark, dir)
        }
        assert(e.getMessage.contains("UTC"))
      } finally spark.conf.set("spark.sql.session.timeZone", prev)
    }
  }
}
