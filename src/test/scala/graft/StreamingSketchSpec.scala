package graft

import graft.streaming.StreamingSketch
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming heavy hitters: the sketch aggregation's single-row state
  * replaces the exact streaming groupBy's vocabulary-sized state. Pins
  * exactness below capacity across micro-batches, the
  * NO_FALSE_NEGATIVES bracket above capacity, per-group state shape,
  * and the RocksDB provider path. */
class StreamingSketchSpec extends SparkSpec {
  import spark.implicits._

  private def runStream(batches: Seq[Seq[String]], maxMapSize: Int,
      conf: Map[String, String] = Map.empty): Array[Byte] = {
    val in = MemoryStream[String](spark)
    val toks = in.toDF().select(explode(split(col("value"), " ")).as("tok"))
    val name = s"sksink_${System.nanoTime()}"
    var w = StreamingSketch.sketchTokens(toks, "tok", maxMapSize)
      .writeStream.outputMode("complete").format("memory").queryName(name)
      .option("checkpointLocation",
        Files.createTempDirectory("graft_sk_").toString)
    val q = w.start()
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      spark.table(name).head().getAs[Array[Byte]]("sk")
    } finally q.stop()
  }

  test("below capacity the streaming sketch is EXACT across " +
    "micro-batches: decoded counts equal a driver-side recount no " +
    "matter how the stream was batched") {
    val batches = Seq(Seq("a a b", "a c"), Seq("b b b d"), Seq("a d d"))
    val sk = runStream(batches, maxMapSize = 64)
    val decoded = StreamingSketch.topkOf(
      Seq(sk).toDF("sk"), k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val truth = batches.flatten.flatMap(_.split(" "))
      .groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    assert(decoded === truth)
  }

  test("above capacity NO_FALSE_NEGATIVES holds: every frequent token " +
    "is present and its true count sits inside [lower, upper]") {
    // 40 distinct filler tokens vs map size 8 forces evictions; the
    // heavy tokens dominate and must survive
    val filler = (1 to 40).map(i => s"f$i")
    val batches = Seq(
      Seq((Seq.fill(30)("hot") ++ filler.take(20)).mkString(" ")),
      Seq((Seq.fill(25)("warm") ++ filler.drop(20)).mkString(" ")),
      Seq(Seq.fill(20)("hot").mkString(" ")))
    val sk = runStream(batches, maxMapSize = 8)
    val rows = StreamingSketch.topkOf(Seq(sk).toDF("sk"), k = 4)
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3)))
    val toks = rows.map(_._1)
    assert(toks.contains("hot") && toks.contains("warm"))
    val truth = Map("hot" -> 50L, "warm" -> 25L)
    rows.filter(r => truth.contains(r._1)).foreach {
      case (t, _, lo, hi) =>
        assert(truth(t) >= lo && truth(t) <= hi, s"$t bracket [$lo,$hi]")
    }
  }

  test("per-group sketches: one bounded state row per group, exact " +
    "below capacity, and the decode carries the group key") {
    val in = MemoryStream[(String, String)](spark)
    val toks = in.toDF().toDF("lang", "text")
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
    val name = s"skgrp_${System.nanoTime()}"
    val q = StreamingSketch.sketchTokensByGroup(toks, "lang", "tok", 64)
      .writeStream.outputMode("complete").format("memory").queryName(name)
      .option("checkpointLocation",
        Files.createTempDirectory("graft_skg_").toString)
      .start()
    try {
      in.addData(("en", "a a b"), ("de", "x y"))
      q.processAllAvailable()
      in.addData(("en", "b c"), ("de", "x x"))
      q.processAllAvailable()
      val sketches = spark.table(name)
      assert(sketches.count() === 2, "one state row per group")
      val decoded = StreamingSketch.topkOf(sketches, 10)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap
      assert(decoded === Map(
        ("en", "a") -> 2L, ("en", "b") -> 2L, ("en", "c") -> 1L,
        ("de", "x") -> 3L, ("de", "y") -> 1L))
    } finally q.stop()
  }

  test("streaming quantiles with bounded state: a KLL sketch " +
    "aggregation carries exact n across micro-batches and answers " +
    "rank queries within its published error") {
    graft.functions.Kll.register(spark)
    import graft.functions.Kll._
    val in = MemoryStream[Double](spark)
    val name = s"skkll_${System.nanoTime()}"
    val q = in.toDF().groupBy()
      .agg(kllSketchAgg(col("value"), 200).as("sk"))
      .writeStream.outputMode("complete").format("memory").queryName(name)
      .option("checkpointLocation",
        Files.createTempDirectory("graft_kll_").toString)
      .start()
    try {
      val fed = scala.collection.mutable.ArrayBuffer.empty[Double]
      Seq((1 to 400), (401 to 900), (901 to 1000)).foreach { batch =>
        val vs = batch.map(_.toDouble)
        fed ++= vs; in.addData(vs: _*); q.processAllAvailable()
      }
      val row = spark.table(name)
        .select(kllN(col("sk")).as("n"),
          kllQuantile(col("sk"), lit(0.5)).as("p50"),
          kllError(col("sk")).as("err")).head()
      assert(row.getLong(0) === fed.length.toLong, "exact stream length")
      val sorted = fed.sorted
      val trueRank = sorted.count(_ <= row.getDouble(1)).toDouble / sorted.size
      assert(math.abs(trueRank - 0.5) <= 3 * row.getDouble(2) + 0.001,
        s"p50 rank $trueRank")
    } finally q.stop()
  }

  test("the sketch aggregation runs under the RocksDB state-store " +
    "provider with identical decoded counts") {
    val s2 = graft.streaming.StateStores.rocksDBSession(spark)
    import s2.implicits._
    val in = MemoryStream[String](s2)
    val toks = in.toDF().select(explode(split(col("value"), " ")).as("tok"))
    val name = s"skrocks_${System.nanoTime()}"
    val q = StreamingSketch.sketchTokens(toks, "tok", 64)
      .writeStream.outputMode("complete").format("memory").queryName(name)
      .option("checkpointLocation",
        Files.createTempDirectory("graft_skr_").toString)
      .start()
    try {
      in.addData("a a b"); q.processAllAvailable()
      in.addData("b c");   q.processAllAvailable()
      val decoded = StreamingSketch.topkOf(s2.table(name), 10)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(decoded === Map("a" -> 2L, "b" -> 2L, "c" -> 1L))
    } finally q.stop()
  }
}
