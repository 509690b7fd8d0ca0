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
}
