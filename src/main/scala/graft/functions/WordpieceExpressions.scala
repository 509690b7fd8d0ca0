package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Subword (WordPiece-style) tokenization — the encode step every
  * LLM training pipeline runs over its whole corpus, as a native
  * Catalyst expression against a broadcast-with-the-plan vocabulary.
  *
  * The algorithm is the public WordPiece greedy longest-match-first
  * scheme (Wu et al. 2016; the HuggingFace `tokenizers` reference
  * behavior): each whitespace word is consumed left to right, at each
  * position taking the LONGEST vocabulary piece that matches — plain
  * pieces at word start, `##`-prefixed continuation pieces inside —
  * and a word with no decomposition collapses to `[UNK]`. A trained
  * vocabulary rides in the expression exactly like [[PqEncode]]'s
  * codebook: a bounded array serialized with the plan (never driver
  * state at eval time), hash-indexed once per task.
  *
  * [[WordpieceOps.trainVocab]] is the distributed trainer twin: whole
  * words, prefix and continuation character n-grams counted corpus-
  * wide (two map-side-combined aggregates), single characters for
  * guaranteed coverage, top-`vocabSize` taken with a deterministic
  * (count DESC, piece ASC) tiebreak. Training data the corpus itself
  * cannot decompose does not exist by construction: every character
  * of the training corpus enters the vocabulary in both start and
  * continuation form, so `[UNK]` only ever marks genuinely
  * out-of-corpus characters at encode time.
  *
  * Scale: training is two grouped counts over exploded grams (linear,
  * map-side combined, TakeOrdered top-k — never a global sort of the
  * gram table); encoding is a narrow codegen'd projection, no shuffle,
  * no state beyond the O(vocab) hash table per task.
  */
final class WordpieceTable(val vocab: Array[String]) extends Serializable {

  @transient private lazy val starts: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    vocab.foreach(p => if (!p.startsWith("##")) s.add(p))
    s
  }
  @transient private lazy val conts: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    vocab.foreach(p => if (p.startsWith("##")) s.add(p.substring(2)))
    s
  }
  @transient private lazy val maxStart: Int =
    vocab.foldLeft(1)((m, p) =>
      if (!p.startsWith("##")) math.max(m, p.length) else m)
  @transient private lazy val maxCont: Int =
    vocab.foldLeft(1)((m, p) =>
      if (p.startsWith("##")) math.max(m, p.length - 2) else m)

  /** Greedy longest-match pieces of one word into `out`; false (and
    * nothing appended) if the word has no decomposition. */
  private def encodeWord(word: String,
      out: java.util.ArrayList[UTF8String]): Boolean = {
    val n = word.length
    val mark = out.size()
    var start = 0
    while (start < n) {
      val isCont = start > 0
      val table = if (isCont) conts else starts
      val maxLen = math.min(n - start, if (isCont) maxCont else maxStart)
      var len = maxLen
      var matched = -1
      while (len >= 1 && matched < 0) {
        if (table.contains(word.substring(start, start + len)))
          matched = len
        len -= 1
      }
      if (matched < 0) {
        while (out.size() > mark) out.remove(out.size() - 1)
        return false
      }
      val piece = if (isCont) "##" + word.substring(start, start + matched)
        else word.substring(start, start + matched)
      out.add(UTF8String.fromString(piece))
      start += matched
    }
    true
  }

  /** Encode whitespace-split `text` to its piece sequence (words with
    * no decomposition become one `[UNK]`). Invoked per row from both
    * the interpreted and generated paths. */
  def encodeText(text: UTF8String): ArrayData = {
    val out = new java.util.ArrayList[UTF8String]()
    val s = text.toString
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
      val start = i
      while (i < n && !Character.isWhitespace(s.charAt(i))) i += 1
      if (i > start) {
        if (!encodeWord(s.substring(start, i), out))
          out.add(WordpieceTable.Unk)
      }
    }
    new GenericArrayData(out.toArray)
  }
}

object WordpieceTable {
  private[functions] val Unk: UTF8String = UTF8String.fromString("[UNK]")
}

/** `wordpiece_encode(text)` with a plan-carried vocabulary: greedy
  * longest-match subword pieces as `array<string>`. Codegen'd (one
  * table call per row, fused into the surrounding stage). */
case class WordpieceEncode(child: Expression, vocab: Array[String])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "wordpiece_encode"

  @transient private lazy val table = new WordpieceTable(vocab)

  override def nullSafeEval(input: Any): Any =
    table.encodeText(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, e => {
      val tbl = ctx.addReferenceObj("wpTable", table,
        classOf[WordpieceTable].getName)
      s"${ev.value} = $tbl.encodeText($e);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): WordpieceEncode = copy(child = newChild)
}

/** Trainer + Column API for the WordPiece tier. */
object WordpieceOps {

  private val registered = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]())

  /** Idempotently register `wordpiece_encode(text, vocab_array)` with
    * a session (the vocab argument must be foldable — typically the
    * `lit` of a trained array). */
  def register(spark: SparkSession): Unit =
    if (registered.add(spark)) {
      val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.functionRegistry
      reg.createOrReplaceTempFunction("wordpiece_encode",
        exprs => {
          require(exprs.length == 2,
            "wordpiece_encode(text, vocab_array) takes 2 arguments")
          require(exprs(1).foldable,
            "wordpiece_encode vocab must be a foldable array literal")
          val arr = exprs(1).eval().asInstanceOf[ArrayData]
          WordpieceEncode(exprs(0),
            (0 until arr.numElements()).map(i =>
              arr.getUTF8String(i).toString).toArray)
        },
        "built-in")
    }

  /** Encode `text` with a trained vocabulary. */
  def wordpieceEncode(spark: SparkSession, text: Column,
      vocab: Array[String]): Column = {
    register(spark)
    call_function("wordpiece_encode", text, lit(vocab))
  }

  /** Distributed WordPiece-style vocabulary trainer over a lowercased
    * whitespace corpus: scores whole words, prefix n-grams (plain) and
    * interior n-grams (`##`) of length 2–`maxGram` by corpus
    * frequency, keeps the top `vocabSize` AFTER unconditionally
    * including every single character in both start and continuation
    * form (coverage floor: the training corpus itself can always be
    * encoded without `[UNK]`). Deterministic: ties break on the piece
    * string; the returned array is the (score DESC, piece ASC) order.
    *
    * Scale: one word-count aggregate, one gram-count aggregate over
    * per-word gram explosion (gram count per word ≤ len·(maxGram−1) —
    * linear in corpus bytes), both map-side combined; top-k is
    * TakeOrdered (partial per-partition heaps), and only the
    * ≤`vocabSize` winners ever reach the driver — the [[PqEncode]]
    * codebook stance. */
  def trainVocab(df: DataFrame, textCol: String, vocabSize: Int = 4096,
      maxGram: Int = 4): Array[String] = {
    require(vocabSize >= 64, s"vocabSize $vocabSize too small")
    val words = df
      .select(explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
    // every character, in start and continuation form — the coverage
    // floor (bounded by the corpus alphabet, not its volume)
    val chars = words
      .select(explode(split(col("w"), "")).as("c"))
      .filter(length(col("c")) > 0)
      .distinct()
      .select(explode(array(col("c"), concat(lit("##"), col("c"))))
        .as("piece"))
      .collect().map(_.getString(0))
    // candidate pieces: the whole word (plain), length-2..maxGram
    // prefixes (plain — greedy's first bite) and suffixes (##ed,
    // ##ing, … — greedy's last bite); interiors fall back to the
    // ##-char floor. sequence() stays ascending because only words of
    // length ≥ 2 generate grams.
    val grams = words.filter(length(col("w")) >= 2)
      .select(col("n"), explode(concat(
        array(col("w")),
        flatten(transform(
          sequence(lit(2), least(lit(maxGram), length(col("w"))),
            lit(1)),
          k => array(
            col("w").substr(lit(1), k),
            concat(lit("##"),
              col("w").substr(length(col("w")) - k + lit(1), k)))))))
        .as("piece"))
      .groupBy("piece").agg(sum("n").as("score"))
    val top = grams
      .filter(!col("piece").isin(chars.toSeq: _*))
      .orderBy(desc("score"), asc("piece"))
      .limit(math.max(0, vocabSize - chars.length))
      .collect().map(_.getString(0))
    chars.sorted ++ top
  }
}
