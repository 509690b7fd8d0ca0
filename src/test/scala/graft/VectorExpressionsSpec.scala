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

  test("plane_sigs is bit-equal to the unrolled lshTableSigs spelling") {
    import graft.operators.SimilarityOps
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val viaNative = e.select(col("vec_id"),
        VectorOps.planeSigs(col("v"), 0, 16, 4).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val unrolled = SimilarityOps.lshTableSigs(col("v"), 16, 4)
    val viaUnrolled = e.select(col("vec_id") +: unrolled.zipWithIndex
        .map { case (c, t) => c.as(s"t$t") }: _*)
      .collect()
      .map(r => r.getLong(0) -> (1 to 16).map(r.getInt)).toMap
    assert(viaNative.view.mapValues(_.toSeq).toMap ===
      viaUnrolled.view.mapValues(_.toSeq).toMap)
  }

  test("plane_project matches driver-side projections bit-for-bit, and " +
      "sketch_dot over it equals the literal-projection spelling") {
    import graft.operators.SimilarityOps
    val base = 1 << 20
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .limit(25)
    val rows = e.select(col("vec_id"), col("v"),
        VectorOps.planeProject(col("v"), base, 256).as("pr"),
        VectorOps.sketchDotCol(VectorOps.planeSketch(col("v"), base, 4),
          VectorOps.planeProject(col("v"), base, 256)).as("score"),
        VectorOps.planeSketch(col("v"), base, 4).as("sk"))
      .collect()
    rows.foreach { r =>
      val v = r.getSeq[Double](1)
      val pr = r.getSeq[Double](2)
      // projections = left-to-right double dots against the md5 planes
      (0 until 256).foreach { p =>
        val plane = SimilarityOps.hyperplane(base + p)
        var s = 0.0
        var i = 0
        while (i < v.length) { s += v(i) * plane(i); i += 1 }
        assert(java.lang.Double.doubleToLongBits(s) ===
          java.lang.Double.doubleToLongBits(pr(p)),
          s"plane_project bit-mismatch at plane $p for ${r.getLong(0)}")
      }
      // the column-projection score equals the driver-side sum
      val sk = r.getSeq[Long](4)
      var s = 0.0
      for (w <- 0 until 4; j <- 0 until 64)
        if (((sk(w) >>> j) & 1L) == 1L) s += pr(w * 64 + j)
      assert(r.getDouble(3) === s)
    }
  }

  test("best_cell matches a driver-side argmax-cosine loop (ties to " +
      "the lowest cell) on both eval paths") {
    val e = Tables.embeddings(spark, sfDir).limit(50)
      .select(col("embedding").cast("array<double>").as("e"))
    // a deterministic 7-cell matrix drawn from the corpus itself, plus
    // a duplicated cell (index 5 = index 2) to force a cosine tie that
    // must resolve to the LOWER cell id
    val cents = Tables.embeddings(spark, sfDir)
      .orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(6)
      .select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toSeq).toSeq
    val matrix = cents.take(5) ++ Seq(cents(2), cents(5))
    val got = e
      .withColumn("cell", VectorOps.bestCell(col("e"), typedLit(matrix)))
      .collect()
    def cosOf(a: Seq[Double], b: Seq[Double]): Double = {
      var dot = 0.0; var n2 = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { dot += a(i) * b(i); n2 += b(i) * b(i); i += 1 }
      dot / math.sqrt(n2)
    }
    got.foreach { r =>
      val v = r.getSeq[Double](0)
      var best = 0; var bestScore = Double.NegativeInfinity
      matrix.zipWithIndex.foreach { case (c, i) =>
        val s = cosOf(v, c)
        if (s > bestScore) { bestScore = s; best = i }
      }
      assert(r.getInt(1) === best)
      assert(r.getInt(1) != 5, "duplicated cell 5 must lose its tie to 2")
    }
    // interpreted path (whole-stage codegen off) agrees
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interp = e
        .withColumn("cell", VectorOps.bestCell(col("e"), typedLit(matrix)))
        .collect().map(r => r.getSeq[Double](0) -> r.getInt(1)).toMap
      got.foreach { r =>
        assert(interp(r.getSeq[Double](0)) === r.getInt(1))
      }
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("sketch_dot equals a driver-side bit-weighted sum") {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .limit(50)
    val base = 1 << 20
    val projs = (0 until 256).map(_ * 0.01 - 1.0) // arbitrary weights
    val rows = e.select(col("vec_id"),
        VectorOps.planeSketch(col("v"), base, 4).as("sk"),
        VectorOps.sketchDot(
          VectorOps.planeSketch(col("v"), base, 4), projs).as("score"))
      .collect()
    rows.foreach { r =>
      val sk = r.getSeq[Long](1)
      var s = 0.0
      for (w <- 0 until 4; j <- 0 until 64)
        if (((sk(w) >>> j) & 1L) == 1L) s += projs(w * 64 + j)
      assert(r.getDouble(2) === s, s"sketch_dot mismatch for ${r.getLong(0)}")
    }
  }
}
