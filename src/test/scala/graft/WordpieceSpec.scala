package graft

import graft.functions.{WordpieceEncode, WordpieceOps, WordpieceTable}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Laws for the WordPiece tier: the greedy longest-match-first
  * reference behavior on hand vocabularies (the public algorithm's
  * canonical cases), `[UNK]` semantics, round-trip reconstruction,
  * trainer coverage (zero UNK on its own corpus), determinism, and
  * the SQL spelling. */
class WordpieceSpec extends SparkSpec {
  import spark.implicits._

  private def enc(vocab: Seq[String], word: String): Seq[String] = {
    val t = new WordpieceTable(vocab.toArray)
    val arr = t.encodeText(UTF8String.fromString(word))
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  test("greedy longest-match-first: the canonical WordPiece cases") {
    val v = Seq("un", "##able", "##b", "a", "b", "l", "e", "u", "n",
      "##a", "##l", "##e", "##n")
    // longest continuation wins over char-by-char
    assert(enc(v, "unable") === Seq("un", "##able"))
    // a whole-word entry beats any decomposition
    assert(enc(v :+ "unable", "unable") === Seq("unable"))
    // multiple words, mixed coverage
    assert(enc(v, "a unable") === Seq("a", "un", "##able"))
    // greedy is NOT optimal: with pieces {ab, ##c, a, ##bc} the word
    // "abc" greedily takes "ab" then "##c" — never backtracks to
    // a + ##bc; pin the documented greedy choice
    assert(enc(Seq("ab", "##c", "a", "##bc"), "abc") ===
      Seq("ab", "##c"))
  }

  test("[UNK] marks exactly the undecomposable words: no start " +
    "piece, a mid-word dead end, or an out-of-vocab char") {
    val v = Seq("he", "##llo", "h", "##e")
    assert(enc(v, "hello") === Seq("he", "##llo"))
    // 'x' has no start piece → whole word is one UNK
    assert(enc(v, "xhe") === Seq("[UNK]"))
    // dead end mid-word: 'he' then no continuation for 'y'
    assert(enc(v, "hey") === Seq("[UNK]"))
    // empty text → no pieces, surrounding whitespace ignored
    assert(enc(v, "  ") === Seq())
    assert(enc(v, " he  he ") === Seq("he", "he"))
  }

  test("trainVocab covers its own corpus: zero [UNK] and exact " +
    "round-trip reconstruction at sf0.001") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val vocab = WordpieceOps.trainVocab(docs, "text", vocabSize = 1024)
    assert(vocab.length <= 1024)
    assert(vocab.distinct.length === vocab.length)
    val joined = docs.select(
        lower(col("text")).as("t"),
        WordpieceOps.wordpieceEncode(spark, lower(col("text")), vocab)
          .as("pieces"))
      .collect()
    joined.foreach { r =>
      val words = r.getString(0).split("\\s+").filter(_.nonEmpty).toSeq
      val pieces = r.getSeq[String](1)
      assert(!pieces.contains("[UNK]"),
        s"UNK on training corpus: ${pieces.take(20)}")
      // stitch continuations back onto their word starts
      val rebuilt = pieces.foldLeft(Vector.empty[String]) { (acc, p) =>
        if (p.startsWith("##")) acc.init :+ (acc.last + p.drop(2))
        else acc :+ p
      }
      assert(rebuilt === words)
    }
  }

  test("trainVocab is deterministic and its encode fertility is " +
    "bounded by word length") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val v1 = WordpieceOps.trainVocab(docs, "text", vocabSize = 512)
    val v2 = WordpieceOps.trainVocab(
      docs.repartition(7), "text", vocabSize = 512)
    assert(v1.toSeq === v2.toSeq)
    val stats = docs.select(
        size(split(trim(lower(col("text"))), "\\s+")).as("n_words"),
        size(WordpieceOps.wordpieceEncode(spark, lower(col("text")), v1))
          .as("n_pieces"),
        length(col("text")).as("n_chars"))
      .agg(sum("n_words"), sum("n_pieces"), sum("n_chars"))
      .head()
    val (nw, np, nc) = (stats.getLong(0), stats.getLong(1),
      stats.getLong(2))
    assert(np >= nw, "fertility below 1 is impossible")
    assert(np <= nc, "more pieces than characters is impossible")
  }

  test("the SQL spelling matches the Column spelling and the " +
    "expression survives both eval paths") {
    val vocab = Array("he", "##llo", "h", "##e", "##l", "##o", "e",
      "l", "o")
    WordpieceOps.register(spark)
    val df = Seq("hello he", "eo").toDF("t")
    df.createOrReplaceTempView("wp_in")
    val viaSql = spark.sql(
      "SELECT wordpiece_encode(t, array('he','##llo','h','##e','##l'," +
        "'##o','e','l','o')) AS p FROM wp_in")
      .collect().map(_.getSeq[String](0))
    val viaCol = df.select(
        WordpieceOps.wordpieceEncode(spark, col("t"), vocab).as("p"))
      .collect().map(_.getSeq[String](0))
    assert(viaSql.toSeq === viaCol.toSeq)
    assert(viaCol(0) === Seq("he", "##llo", "he"))
    // interpreted path (no codegen) agrees
    val expr = WordpieceEncode(
      org.apache.spark.sql.catalyst.expressions.Literal(
        UTF8String.fromString("hello he"),
        org.apache.spark.sql.types.StringType), vocab)
    val arr = expr.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert((0 until arr.numElements())
      .map(i => arr.getUTF8String(i).toString) ===
      Seq("he", "##llo", "he"))
  }

  test("q_wordpiece returns a stable top-40 with positive counts") {
    val out = SparkEntry.queries("q_wordpiece")(spark, sfDir).collect()
    assert(out.length >= 10 && out.length <= 40,
      s"${out.length} pieces") // sf0.001's tiny corpus tops out < 40
    assert(out.forall(_.getLong(1) > 0))
    // descending counts with a deterministic tiebreak
    val ns = out.map(_.getLong(1)).toSeq
    assert(ns === ns.sorted.reverse)
  }
}
