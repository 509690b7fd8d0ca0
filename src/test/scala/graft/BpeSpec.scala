package graft

import graft.functions.{BpeOps, BpeTable}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Laws for the BPE tier: the incremental trainer equals an
  * independent brute-force recount-per-round trainer on random word
  * tables, hand-computed canonical merges, TOTAL encoding (no UNK —
  * unseen words decompose to characters), exact round-trip
  * reconstruction through the `</w>` markers, repartition
  * determinism, and the SQL spelling. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def enc(merges: Seq[String], text: String): Seq[String] = {
    val t = new BpeTable(merges.toArray)
    val arr = t.encodeText(UTF8String.fromString(text))
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  /** Independent reference trainer: full pair recount every round,
    * per-position counts (overlaps included), left-to-right rewrite,
    * (count DESC, pair ASC) tiebreak, stop below count 2 — the
    * published Sennrich trainer, written the slow obvious way. */
  private def bruteTrain(wc: Seq[(String, Long)], nMerges: Int)
      : Seq[String] = {
    def split(w: String): List[String] = {
      val cs = w.map(_.toString).toList
      cs.init :+ (cs.last + "</w>")
    }
    var words: Seq[(List[String], Long)] =
      wc.map { case (w, c) => (split(w), c) }
    val merges = scala.collection.mutable.ArrayBuffer[String]()
    var go = true
    while (merges.size < nMerges && go) {
      val counts = scala.collection.mutable.Map[String, Long]()
      words.foreach { case (s, c) =>
        s.zip(s.drop(1)).foreach { case (a, b) =>
          val k = a + " " + b
          counts(k) = counts.getOrElse(k, 0L) + c
        }
      }
      val eligible = counts.filter(_._2 >= 2L)
      if (eligible.isEmpty) go = false
      else {
        val bp = eligible.toSeq.minBy { case (p, c) => (-c, p) }._1
        merges += bp
        val Array(a, b) = bp.split(" ", 2)
        words = words.map { case (s, c) =>
          val out = scala.collection.mutable.ListBuffer[String]()
          var rest = s
          while (rest.nonEmpty) {
            rest match {
              case x :: y :: tail if x == a && y == b =>
                out += (a + b); rest = tail
              case x :: tail => out += x; rest = tail
              case Nil =>
            }
          }
          (out.toList, c)
        }
      }
    }
    merges.toSeq
  }

  test("trainFromCounts equals the brute-force recount trainer on " +
    "random word tables (counts, tiebreaks, stop rule)") {
    val rnd = new scala.util.Random(17)
    (1 to 5).foreach { trial =>
      val alphabet = "abcde"
      val wc = (1 to 60).map { _ =>
        val len = 1 + rnd.nextInt(8)
        val w = Seq.fill(len)(alphabet(rnd.nextInt(alphabet.length)))
          .mkString
        w
      }.groupBy(identity).map { case (w, xs) =>
        (w, xs.size.toLong * (1 + rnd.nextInt(5))) }.toSeq
        .sortBy(_._1)
      val got = BpeOps.trainFromCounts(wc.toArray, 40).toSeq
      val exp = bruteTrain(wc, 40)
      assert(got === exp, s"trial $trial diverged on $wc")
    }
  }

  test("canonical hand-computed merges and total encoding") {
    // corpus: aa ×3, ab ×1 → the only pair seen twice is (a, a</w>)
    val merges = BpeOps.trainFromCounts(
      Array(("aa", 3L), ("ab", 1L)), 10)
    assert(merges.toSeq === Seq("a a</w>"))
    assert(enc(merges.toSeq, "aa") === Seq("aa</w>"))
    // totality: unseen words decompose, never UNK
    assert(enc(merges.toSeq, "ab") === Seq("a", "b</w>"))
    assert(enc(merges.toSeq, "aaa") === Seq("a", "aa</w>"))
    assert(enc(merges.toSeq, "zzz") === Seq("z", "z", "z</w>"))
    // the classic shape: word-final merges stay distinct from
    // interior ones via the </w> marker
    val m2 = BpeOps.trainFromCounts(
      Array(("low", 5L), ("lower", 2L), ("newest", 6L),
        ("widest", 3L)), 12)
    // "est</w>" must assemble from e/s/t pieces ending in </w>
    // before "low" fuses fully (9 vs 7 weight on the e-s pair)
    assert(m2.head === "e s", m2.toSeq.toString)
    val encNewest = enc(m2.toSeq, "newest")
    assert(encNewest.last.endsWith("</w>"))
    assert(encNewest.mkString === "newest</w>")
  }

  test("encode replays training exactly: every training word's " +
    "pieces concatenate back, and lowest-rank-first ordering is " +
    "respected") {
    val wc = Array(("banana", 4L), ("bandana", 3L), ("cabana", 2L),
      ("anagram", 5L), ("grammar", 2L))
    val merges = BpeOps.trainFromCounts(wc, 30).toSeq
    wc.foreach { case (w, _) =>
      val pieces = enc(merges, w)
      assert(pieces.mkString === w + "</w>", s"$w -> $pieces")
    }
    // multi-word text: per-word markers partition the stream
    val pieces = enc(merges, "banana grammar")
    assert(pieces.count(_.endsWith("</w>")) === 2)
    assert(pieces.mkString.replace("</w>", " ").trim ===
      "banana grammar")
  }

  test("trainMerges is deterministic under repartitioning and " +
    "reports full coverage when the cap does not bite") {
    val docs = (1 to 50).map(i =>
      s"the quick brown fox jumps over the lazy dog number $i")
      .toDF("text")
    val m1 = BpeOps.trainMerges(docs, "text", nMerges = 50)
    val cov1 = BpeOps.lastTrainCoverage
    val m2 = BpeOps.trainMerges(docs.repartition(7), "text",
      nMerges = 50)
    assert(m1.toSeq === m2.toSeq)
    assert(cov1 === 1.0)
    // a biting cap reports partial coverage instead of hiding it
    BpeOps.trainMerges(docs, "text", nMerges = 5, maxWords = 16)
    assert(BpeOps.lastTrainCoverage > 0.0 &&
      BpeOps.lastTrainCoverage < 1.0)
  }

  test("bpe_encode resolves from SQL with a foldable merge literal " +
    "and matches the Column API") {
    BpeOps.register(spark)
    val df = Seq("aa ab", "aaa").toDF("t")
    df.createOrReplaceTempView("bpe_t")
    val viaSql = spark.sql(
      "SELECT bpe_encode(t, array('a a</w>')) AS p FROM bpe_t")
      .collect().map(_.getSeq[String](0).toList).toList
    val viaCol = df.select(
      BpeOps.bpeEncode(spark, col("t"), Array("a a</w>")).as("p"))
      .collect().map(_.getSeq[String](0).toList).toList
    assert(viaSql === viaCol)
    assert(viaSql.head === List("aa</w>", "a", "b</w>"))
  }
}
