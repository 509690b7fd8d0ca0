package graft

import graft.functions.VectorOps
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** The codegen'd VectorDot must agree bit-for-bit with the interpreted
  * higher-order-function spelling (same left-to-right double
  * accumulation) — that identity is what lets the fast path keep the
  * DuckDB oracle hashes of the HOF path it replaced. */
class VectorExpressionsSpec extends SparkSpec {

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  test("vec_dot equals the HOF spelling bit-for-bit on driver embeddings") {
    val e = Tables.embeddings(spark, sfDir)
    val diff = e.select(
        VectorOps.dot(col("embedding").cast("array<double>"),
          col("embedding").cast("array<double>")).as("fast"),
        hofDot(col("embedding"), col("embedding")).as("slow"))
      .filter(col("fast") =!= col("slow"))
      .count()
    assert(diff === 0)
  }

  test("vec_dot matches a driver-side loop exactly") {
    val rows = Tables.embeddings(spark, sfDir).limit(20)
      .select(col("embedding").cast("array<double>").as("e"))
      .withColumn("d", VectorOps.dot(col("e"), col("e")))
      .collect()
    rows.foreach { r =>
      val v = r.getSeq[Double](0)
      var s = 0.0
      var i = 0
      while (i < v.length) { s += v(i) * v(i); i += 1 }
      assert(java.lang.Double.doubleToLongBits(s) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("cosine(v, v) = 1 within 1e-12 for every embedding") {
    val e = Tables.embeddings(spark, sfDir)
    val bad = e.select(
        VectorOps.cosine(col("embedding"), col("embedding")).as("c"))
      .filter(abs(col("c") - 1.0) > 1e-12)
      .count()
    assert(bad === 0)
  }

  test("interpreted eval (nullSafeEval) agrees with codegen path") {
    // Force the interpreted path by evaluating through a non-codegen
    // context: a filter over the same expression both ways.
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val interp = e.withColumn("d", VectorOps.dot(col("v"), col("v")))
      .select("vec_id", "d").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    val gen = e.withColumn("d", VectorOps.dot(col("v"), col("v")))
      .select("vec_id", "d").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(interp === gen)
  }
}
