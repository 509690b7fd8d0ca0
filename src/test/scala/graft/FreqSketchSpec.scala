package graft

import graft.functions.FreqSketch
import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** Bounds for the frequent-items (heavy-hitter) sketch tier — the
  * no-oracle-by-design gate for q_topk_tokens_approx and the
  * topk_tokens TVF, mirroring the q_hll_merge stance: approximate
  * answers are acceptable only with their documented guarantees
  * pinned against exact counts.
  */
class FreqSketchSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")

  /** Exact per-token counts of the whole corpus. */
  private lazy val exact: Map[String, Long] = docs
    .select(explode(split(col("text"), " ")).as("tok"))
    .groupBy("tok").count()
    .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  /** Deterministic Zipf-shaped stream: 5 heavy tokens (2,000 hits
    * each) over a 1,000-token uniform tail (25 hits each) — skewed
    * enough that a 64-entry map is deep in the approximate regime yet
    * the heavies tower above its error bound. */
  private def skewed = {
    val tail = (1 to 25000).map(i => "t" + (i % 1000))
    val heavy = (1 to 10000).map(i => "h" + (i % 5))
    (tail ++ heavy).toDF("tok").repartition(5)
  }
  private lazy val skewedExact: Map[String, Long] =
    ((1 to 999).map(i => ("t" + i) -> 25L) ++ Seq("t0" -> 25L) ++
      (0 to 4).map(i => ("h" + i) -> 2000L)).toMap

  private def sketchOf(maxMap: Int) = {
    FreqSketch.register(spark)
    skewed
      .agg(FreqSketch.freqSketchAgg(col("tok"), maxMap).as("sk"))
      .select(
        FreqSketch.freqSketchError(col("sk")).as("err"),
        FreqSketch.freqSketchTopK(col("sk"), Int.MaxValue).as("hits"))
      .collect().head
  }

  test("no false negatives: every token with true count above the " +
    "sketch's max error is present in the decoded result") {
    val row = sketchOf(64)
    val err = row.getLong(0)
    val got = row.getSeq[org.apache.spark.sql.Row](1)
      .map(_.getString(0)).toSet
    assert(err > 0, "64-entry map must be in the approximate regime " +
      "on a 1005-distinct stream")
    val mustHave = skewedExact.filter(_._2 > err).keySet
    assert(mustHave.size >= 5, s"heavies must clear err=$err")
    val missed = mustHave -- got
    assert(missed.isEmpty,
      s"NO_FALSE_NEGATIVES violated: missing ${missed.take(5)} (err=$err)")
  }

  test("bracket guarantee: lower <= true <= upper for every decoded " +
    "row, and estimate is within max error of the true count") {
    val row = sketchOf(64)
    val err = row.getLong(0)
    row.getSeq[org.apache.spark.sql.Row](1).foreach { h =>
      val (tok, est, lo, hi) =
        (h.getString(0), h.getLong(1), h.getLong(2), h.getLong(3))
      val truth = skewedExact.getOrElse(tok, 0L)
      assert(lo <= truth && truth <= hi,
        s"$tok: true $truth outside [$lo, $hi]")
      assert(math.abs(est - truth) <= err,
        s"$tok: |est $est - true $truth| > maxError $err")
    }
  }

  test("merge preserves the guarantees: per-(lang,source) shard " +
    "sketches unioned per lang bracket the exact per-lang counts " +
    "with no false negatives (the q_topk_tokens_approx shape)") {
    val exactLang = docs
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("lang", "tok").count()
      .collect()
      .groupBy(_.getString(0))
      .map { case (l, rs) =>
        l -> rs.map(r => r.getString(1) -> r.getLong(2)).toMap }
    FreqSketch.register(spark)
    val merged = docs
      .select(col("lang"), col("source"),
        explode(split(col("text"), " ")).as("tok"))
      .groupBy("lang", "source")
      .agg(FreqSketch.freqSketchAgg(col("tok"), 8).as("sk"))
      .groupBy("lang")
      .agg(FreqSketch.freqUnionAgg(col("sk"), 8).as("sk"))
      .select(col("lang"),
        FreqSketch.freqSketchError(col("sk")).as("err"),
        FreqSketch.freqSketchTopK(col("sk"), Int.MaxValue).as("hits"))
      .collect()
    assert(merged.nonEmpty)
    merged.foreach { r =>
      val lang = r.getString(0)
      val err = r.getLong(1)
      val hits = r.getSeq[org.apache.spark.sql.Row](2)
        .map(h => h.getString(0) ->
          ((h.getLong(1), h.getLong(2), h.getLong(3)))).toMap
      val truthAll = exactLang(lang)
      // no miss above the merged error
      val missed = truthAll.filter(_._2 > err).keySet -- hits.keySet
      assert(missed.isEmpty, s"$lang: missed ${missed.take(5)} err=$err")
      // every decoded row brackets the truth
      hits.foreach { case (tok, (est, lo, hi)) =>
        val truth = truthAll.getOrElse(tok, 0L)
        assert(lo <= truth && truth <= hi,
          s"$lang/$tok: true $truth outside [$lo, $hi]")
        assert(math.abs(est - truth) <= err,
          s"$lang/$tok: |est $est - true $truth| > $err")
      }
    }
  }

  test("exact regime: a map larger than the distinct-token count " +
    "purges nothing, so estimates equal true counts exactly and are " +
    "partitioning-invariant") {
    FreqSketch.register(spark)
    // next power of two above the distinct count
    val m = Integer.highestOneBit(exact.size * 4)
    def run(parts: Int) = docs.repartition(parts)
      .select(explode(split(col("text"), " ")).as("tok"))
      .agg(FreqSketch.freqSketchAgg(col("tok"), m).as("sk"))
      .select(explode(FreqSketch.freqSketchTopK(col("sk"), 50)).as("h"))
      .select(col("h.item"), col("h.estimate"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val a = run(3)
    assert(run(11) === a, "exact-regime sketch must be order-invariant")
    a.foreach { case (tok, est) => assert(est === exact(tok), tok) }
  }

  test("q_topk_tokens_approx: every reported token is a true top " +
    "token of its lang (est within merged error of exact), rows " +
    "grouped 10-per-lang") {
    val out = SparkEntry.queries("q_topk_tokens_approx")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val perLang = out.groupBy(_._1)
    assert(perLang.nonEmpty)
    perLang.foreach { case (_, rs) => assert(rs.length === 10) }
    // QUALITY floor vs exact (r15 verdict item 8): the structural
    // 10-per-lang check alone would pass a garbage board. Recompute
    // the exact per-(lang, token) counts with the SAME tokenizer the
    // registered query uses, and the per-lang merged sketch error,
    // then assert the Space-Saving guarantees on the real corpus:
    // every reported estimate brackets its true count within the
    // merged error, and every true heavy hitter that clears the
    // 10th-largest true count by more than the error is on the board.
    FreqSketch.register(spark)
    val src = graft.sources.Tables(spark, sfDir, "documents")
    val exactLang = src
      .select(col("lang"),
        explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy("lang", "tok").count()
      .collect()
      .groupBy(_.getString(0))
      .map { case (l, rs) =>
        l -> rs.map(r => r.getString(1) -> r.getLong(2)).toMap }
    val errLang = src
      .select(col("lang"), col("source"),
        explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy("lang", "source")
      .agg(FreqSketch.freqSketchAgg(col("tok"), 1024).as("sk"))
      .groupBy("lang")
      .agg(FreqSketch.freqUnionAgg(col("sk"), 1024).as("sk"))
      .select(col("lang"), FreqSketch.freqSketchError(col("sk")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    perLang.foreach { case (lang, rs) =>
      val truth = exactLang(lang)
      val err = errLang(lang)
      rs.foreach { case (_, tok, est) =>
        val t = truth.getOrElse(tok, 0L)
        assert(est >= t && est - err <= t,
          s"$lang/$tok: est $est not in [true $t, true + err $err]")
      }
      val boardTokens = rs.map(_._2).toSet
      val tenth = truth.values.toSeq.sorted.reverse
        .take(10).lastOption.getOrElse(0L)
      val mustHave = truth.filter(_._2 > tenth + err).keys.toSet
      val missed = mustHave -- boardTokens
      assert(missed.isEmpty,
        s"$lang: clear heavy hitters missing ${missed.take(5)} " +
          s"(10th=$tenth err=$err)")
    }
  }

  test("topk_tokens TVF: SQL surface returns best-first rows that " +
    "bracket the exact counts") {
    docs.createOrReplaceTempView("freq_docs_sql")
    val rows = spark.sql(
      "SELECT * FROM topk_tokens('freq_docs_sql', 5)").collect()
    assert(rows.length === 5)
    val ests = rows.map(_.getLong(1)).toSeq
    assert(ests === ests.sorted.reverse, "best-first order")
    rows.foreach { r =>
      val truth = exact.getOrElse(r.getString(0), 0L)
      assert(r.getLong(2) <= truth && truth <= r.getLong(3),
        s"${r.getString(0)}: $truth outside bracket")
    }
  }

  test("maxMapSize validation: non-power-of-2 and tiny sizes are " +
    "rejected with the rule named") {
    val e = intercept[IllegalArgumentException] {
      FreqSketch.freqSketchAgg(col("x"), 100)
    }
    assert(e.getMessage.contains("power of 2"))
    intercept[IllegalArgumentException] {
      FreqSketch.freqSketchAgg(col("x"), 4)
    }
  }

  test("plan shape: the sketch aggregate is a two-phase " +
    "ObjectHashAggregate — partial sketches merge, raw tokens never " +
    "cross the exchange") {
    FreqSketch.register(spark)
    val plan = TextOps.topkTokensApprox(docs, "text", 10, 256)
      .queryExecution.executedPlan.toString
    val body = plan.split("== Initial Plan ==").head
    assert(body.contains("ObjectHashAggregate"), body.take(2000))
    assert(body.toLowerCase.contains("partial_freq_sketch_agg")
      || body.contains("freq_sketch_agg"), body.take(2000))
  }
}
