package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** Laws for the unigram-LM perplexity scorer (q_perplexity). The
  * oracle gate hash-compares against DuckDB at sf0.01; these pin the
  * MODEL's semantics — the self-fit probabilities, the OOV floor, and
  * the exact uniform-corpus closed form — plus determinism. */
class PerplexitySpec extends SparkSpec {
  import spark.implicits._

  test("uniform corpus closed form: when every token occurs exactly " +
    "once, every doc's cross-entropy is ln(total) and perplexity is " +
    "the total token count") {
    val docs = Seq((0L, "a b c"), (1L, "d e"), (2L, "f")).toDF("doc_id", "text")
    val out = TextOps.unigramPerplexity(docs, "doc_id", "text").collect()
    val total = 6.0
    out.foreach { r =>
      assert(math.abs(r.getDouble(2) - math.log(total)) < 1e-5,
        s"doc ${r.getLong(0)} xent")
      assert(math.abs(r.getDouble(3) - total) < 1e-3,
        s"doc ${r.getLong(0)} ppl")
    }
  }

  test("matches a brute-force unigram model on the documents fixture " +
    "(per-doc mean of -ln(cnt/total)) to rounding precision") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val toks = docs.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[String]("text").split(" ", -1))
    val counts = toks.flatMap(_._2).groupBy(identity).map {
      case (t, xs) => t -> xs.length.toDouble }
    val total = toks.map(_._2.length).sum.toDouble
    val expected = toks.map { case (id, ts) =>
      id -> ts.map(t => -math.log(counts(t) / total)).sum / ts.length
    }.toMap
    val out = TextOps.unigramPerplexity(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
    assert(out.length === expected.size)
    out.foreach { case (id, (nTok, xent)) =>
      assert(nTok === toks.find(_._1 == id).get._2.length.toLong)
      assert(math.abs(xent - expected(id)) < 1e-5, s"doc $id")
    }
  }

  test("OOV floor: with vocabSize=1 every non-top token scores at the " +
    "1/total floor, so rare-token docs carry strictly higher entropy") {
    val docs = Seq(
      (0L, "the the the the"),   // all in-vocab (top token)
      (1L, "rare words only here") // all OOV at the floor
    ).toDF("doc_id", "text")
    val out = TextOps.unigramPerplexity(docs, "doc_id", "text", vocabSize = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val total = 8.0
    assert(math.abs(out(0L) - (-math.log(4.0 / total))) < 1e-5)
    assert(math.abs(out(1L) - (-math.log(1.0 / total))) < 1e-5)
    assert(out(1L) > out(0L))
  }

  test("deterministic under repartitioning (DECIMAL term sums)") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    def run(parts: Int) =
      TextOps.unigramPerplexity(docs.repartition(parts), "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getDouble(2), r.getDouble(3))).toSeq
    assert(run(3) === run(13))
  }

  test("bigramPerplexity matches a brute-force interpolated bigram " +
    "model on a small fixture") {
    val docs = Seq((0L, "a b a b a b"), (1L, "a b c a b c"),
      (2L, "c c c"), (3L, "x")).toDF("doc_id", "text")
    val all = docs.collect().map(r =>
      r.getLong(0) -> r.getString(1).split(" ", -1)).toSeq
    val uni = all.flatMap(_._2).groupBy(identity)
      .map { case (t, xs) => t -> xs.length.toDouble }
    val total = all.map(_._2.length).sum.toDouble
    val bi = all.flatMap { case (_, ts) => ts.sliding(2).filter(_.length == 2)
      .map(p => (p(0), p(1))) }.groupBy(identity)
      .map { case (p, xs) => p -> xs.length.toDouble }
    val lam = 0.75
    val expected = all.map { case (id, ts) =>
      val nlls = ts.zipWithIndex.map { case (t, i) =>
        val pBi = if (i == 0) 0.0
          else bi.getOrElse((ts(i - 1), t), 0.0) / uni(ts(i - 1))
        -math.log(lam * pBi + (1 - lam) * uni(t) / total)
      }
      id -> nlls.sum / ts.length
    }.toMap
    val out = TextOps.bigramPerplexity(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
    out.foreach { case (id, (nTok, xent)) =>
      assert(nTok === all.find(_._1 == id).get._2.length.toLong)
      assert(math.abs(xent - expected(id)) < 1e-5, s"doc $id")
    }
  }

  test("bigramPerplexity scores a repetitive (predictable) corpus " +
    "below the unigram model, and a bigram-free shuffle above its own " +
    "repetitive twin") {
    // same unigram profile, different bigram predictability
    val repet = (0 until 20).map(i =>
      (i.toLong, Seq.fill(15)("p q").mkString(" ")))
    val docsR = repet.toDF("doc_id", "text")
    val uniX = TextOps.unigramPerplexity(docsR, "doc_id", "text")
      .agg(avg("xent")).head.getDouble(0)
    val biX = TextOps.bigramPerplexity(docsR, "doc_id", "text")
      .agg(avg("xent")).head.getDouble(0)
    assert(biX < uniX,
      s"bigram model must exploit repetition: bi $biX vs uni $uniX")
    // OOV/unseen-bigram stream backs off to the unigram floor — xent
    // must stay finite and larger than the predictable corpus'
    val rnd = new scala.util.Random(7)
    val shuffled = (0 until 20).map(i => (i.toLong,
      rnd.shuffle((0 until 30).map(j => s"t${rnd.nextInt(40)}"))
        .mkString(" ")))
    val biShuf = TextOps.bigramPerplexity(shuffled.toDF("doc_id", "text"),
      "doc_id", "text").agg(avg("xent")).head.getDouble(0)
    assert(biShuf > biX && !biShuf.isInfinite)
  }
}
