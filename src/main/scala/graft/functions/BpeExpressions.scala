package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenization — the GPT-family subword scheme
  * next to [[WordpieceEncode]]'s greedy longest-match, as a native
  * Catalyst expression against a plan-carried ordered merge list.
  *
  * The algorithm is the public BPE scheme (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units"; the
  * HuggingFace `tokenizers` reference behavior): TRAINING repeatedly
  * takes the most frequent adjacent symbol pair in the (word,
  * frequency) table and fuses it into a new symbol, recording the
  * merge; ENCODING replays the merges on a word in recorded order —
  * at each step fusing every occurrence of the applicable pair with
  * the LOWEST training rank — until none applies. Words carry the
  * standard `</w>` end-of-word marker on their final symbol, so
  * word-final merges ("est</w>") stay distinct from interior ones
  * ("est" in "establish") and token concatenation reconstructs the
  * text exactly.
  *
  * Unlike WordPiece there is no `[UNK]`: every character of the input
  * is itself a base symbol, so encoding is TOTAL — unseen words
  * simply decompose into smaller (worst-case single-character)
  * pieces. Determinism: pair-count ties break on the lexicographically
  * smallest pair, making the trained merge list a pure function of
  * the word-frequency table.
  *
  * Scale shape (the [[WordpieceOps.trainVocab]] stance): the ONLY
  * corpus-scale work is one map-side-combined word-count aggregate;
  * the table is capped to the top-`maxWords` words (TakeOrdered — a
  * partial per-partition heap, never a global sort) and the capped
  * tail's dropped mass is REPORTED via [[BpeOps.lastTrainCoverage]]
  * rather than silently ignored. The merge loop then runs on those
  * ≤maxWords driver rows with INCREMENTAL pair counting (only words
  * containing the fused pair are rewritten and only their
  * neighbor-pair counts adjusted — the published trainer shape), so
  * training cost is independent of corpus volume past the one scan.
  * Encoding is a narrow codegen'd projection: no shuffle, no state
  * beyond the O(merges) rank table per task.
  */
final class BpeTable(val merges: Array[String]) extends Serializable {

  /** rank of "a b" (space-joined pair) → merge priority. */
  @transient private lazy val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    var i = 0
    while (i < merges.length) {
      m.put(merges(i), Integer.valueOf(i))
      i += 1
    }
    m
  }

  /** BPE pieces of one word (with `</w>` on its final symbol)
    * appended to `out`. Total: every character is a base symbol. */
  private def encodeWord(word: String,
      out: java.util.ArrayList[UTF8String]): Unit = {
    val n = word.length
    if (n == 0) return
    var syms = new java.util.ArrayList[String](n)
    var i = 0
    while (i < n) {
      val cp = word.codePointAt(i)
      val len = Character.charCount(cp)
      syms.add(word.substring(i, i + len))
      i += len
    }
    syms.set(syms.size - 1, syms.get(syms.size - 1) + "</w>")
    var done = syms.size < 2
    while (!done) {
      // lowest-rank applicable pair
      var best = Integer.MAX_VALUE
      var j = 0
      while (j < syms.size - 1) {
        val r = rank.get(syms.get(j) + " " + syms.get(j + 1))
        if (r != null && r.intValue() < best) best = r.intValue()
        j += 1
      }
      if (best == Integer.MAX_VALUE) done = true
      else {
        // fuse every left-to-right occurrence of the best pair
        val parts = merges(best).split(" ", 2)
        val a = parts(0); val b = parts(1)
        val next = new java.util.ArrayList[String](syms.size)
        var k = 0
        while (k < syms.size) {
          if (k < syms.size - 1 && syms.get(k) == a &&
              syms.get(k + 1) == b) {
            next.add(a + b); k += 2
          } else { next.add(syms.get(k)); k += 1 }
        }
        syms = next
        if (syms.size < 2) done = true
      }
    }
    var m = 0
    while (m < syms.size) {
      out.add(UTF8String.fromString(syms.get(m)))
      m += 1
    }
  }

  /** Encode whitespace-split `text` to its BPE piece sequence.
    * Invoked per row from both the interpreted and generated paths. */
  def encodeText(text: UTF8String): ArrayData = {
    val out = new java.util.ArrayList[UTF8String]()
    val s = text.toString
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
      val start = i
      while (i < n && !Character.isWhitespace(s.charAt(i))) i += 1
      if (i > start) encodeWord(s.substring(start, i), out)
    }
    new GenericArrayData(out.toArray)
  }
}

/** `bpe_encode(text)` with a plan-carried ordered merge list: BPE
  * subword pieces as `array<string>`. Codegen'd (one table call per
  * row, fused into the surrounding stage). */
case class BpeEncode(child: Expression, merges: Array[String])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  @transient private lazy val table = new BpeTable(merges)

  override def nullSafeEval(input: Any): Any =
    table.encodeText(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, e => {
      val tbl = ctx.addReferenceObj("bpeTable", table,
        classOf[BpeTable].getName)
      s"${ev.value} = $tbl.encodeText($e);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): BpeEncode = copy(child = newChild)
}

/** Trainer + Column API for the BPE tier. */
object BpeOps {

  private val registered = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]())

  /** Idempotently register `bpe_encode(text, merges_array)` with a
    * session (the merges argument must be foldable — typically the
    * `lit` of a trained merge list). */
  def register(spark: SparkSession): Unit =
    if (registered.add(spark)) {
      val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.functionRegistry
      reg.createOrReplaceTempFunction("bpe_encode",
        exprs => {
          require(exprs.length == 2,
            "bpe_encode(text, merges_array) takes 2 arguments")
          require(exprs(1).foldable,
            "bpe_encode merges must be a foldable array literal")
          val arr = exprs(1).eval().asInstanceOf[ArrayData]
          BpeEncode(exprs(0),
            (0 until arr.numElements()).map(i =>
              arr.getUTF8String(i).toString).toArray)
        },
        "built-in")
    }

  /** Encode `text` with a trained merge list. */
  def bpeEncode(spark: SparkSession, text: Column,
      merges: Array[String]): Column = {
    register(spark)
    call_function("bpe_encode", text, lit(merges))
  }

  /** Fraction of the corpus word OCCURRENCES the last [[trainMerges]]
    * call's capped word table covered (1.0 = nothing dropped). The
    * no-silent-caps stance: a cap that bites is visible. */
  @volatile var lastTrainCoverage: Double = 1.0

  /** Distributed-scan BPE merge trainer over a lowercased whitespace
    * corpus: ONE map-side-combined word-count aggregate (the only
    * corpus-scale pass), capped to the top-`maxWords` distinct words
    * by (count DESC, word ASC) TakeOrdered, then the standard
    * incremental merge loop on those ≤maxWords driver rows —
    * `nMerges` rounds, each fusing the most frequent adjacent symbol
    * pair (ties to the lexicographically smallest pair), updating
    * only the pair counts the rewrite touches. Stops early when no
    * pair occurs twice. Returns the ordered merge list
    * ("a b" space-joined, rank = index). */
  def trainMerges(df: DataFrame, textCol: String, nMerges: Int = 1024,
      maxWords: Int = 65536): Array[String] = {
    require(nMerges >= 1 && nMerges <= 65536,
      s"nMerges must be in [1, 65536]; got $nMerges")
    require(maxWords >= 16, s"maxWords $maxWords too small")
    val words = df
      .select(explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
    val totals = words.agg(
      count(lit(1)).as("nw"), sum("n").as("occ")).head
    val kept = words
      .orderBy(desc("n"), asc("w")).limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    lastTrainCoverage =
      if (totals.isNullAt(1) || totals.getLong(1) == 0L) 1.0
      else kept.map(_._2).sum.toDouble / totals.getLong(1)
    trainFromCounts(kept, nMerges)
  }

  /** The driver-side merge loop, exposed for the spec's brute-force
    * cross-check. `wordCounts` must already be deterministic. */
  private[graft] def trainFromCounts(wordCounts: Array[(String, Long)],
      nMerges: Int): Array[String] = {
    // symbol sequences with the </w> marker on the final character
    val syms: Array[Array[String]] = wordCounts.map { case (w, _) =>
      val cs = new scala.collection.mutable.ArrayBuffer[String](w.length)
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        val len = Character.charCount(cp)
        cs += w.substring(i, i + len)
        i += len
      }
      cs(cs.length - 1) = cs(cs.length - 1) + "</w>"
      cs.toArray
    }
    val freq = wordCounts.map(_._2)
    val seqs: Array[Array[String]] = syms.clone()
    // pair -> total count, and pair -> word indices that contain it
    // (the index set may hold stale entries after rewrites; counts
    // are exact and stale indices are skipped at rewrite time)
    val pairCount = new java.util.HashMap[String, Long]()
    val pairWords =
      new java.util.HashMap[String, java.util.HashSet[Integer]]()
    def addPair(p: String, wi: Int, c: Long): Unit = {
      pairCount.merge(p, c, (a, b) => a + b)
      pairWords.computeIfAbsent(p, _ => new java.util.HashSet[Integer]())
        .add(Integer.valueOf(wi))
    }
    def subPair(p: String, c: Long): Unit = {
      val left = pairCount.merge(p, -c, (a, b) => a + b)
      if (left <= 0L) { pairCount.remove(p); pairWords.remove(p) }
    }
    var wi = 0
    while (wi < seqs.length) {
      val s = seqs(wi)
      var j = 0
      while (j < s.length - 1) {
        addPair(s(j) + " " + s(j + 1), wi, freq(wi)); j += 1
      }
      wi += 1
    }
    val merges = new scala.collection.mutable.ArrayBuffer[String]()
    var round = 0
    var exhausted = false
    while (round < nMerges && !exhausted) {
      // most frequent pair, ties to the lexicographically smallest
      var bestPair: String = null
      var bestCount = 1L // a merge must occur at least twice
      val it = pairCount.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue > bestCount ||
            (e.getValue == bestCount && bestPair != null &&
              e.getKey.compareTo(bestPair) < 0))
          { bestPair = e.getKey; bestCount = e.getValue }
      }
      if (bestPair == null) exhausted = true
      else {
        merges += bestPair
        val parts = bestPair.split(" ", 2)
        val a = parts(0); val b = parts(1)
        val owners = pairWords.remove(bestPair)
        pairCount.remove(bestPair)
        if (owners != null) {
          val oit = owners.iterator()
          while (oit.hasNext) {
            val w = oit.next().intValue()
            val s = seqs(w)
            // skip stale ownership (pair already rewritten away)
            var has = false
            var j = 0
            while (j < s.length - 1 && !has) {
              if (s(j) == a && s(j + 1) == b) has = true
              j += 1
            }
            if (has) {
              val c = freq(w)
              // retract ALL old adjacent pairs of this word, rewrite,
              // then re-add — simpler than neighborhood surgery and
              // still O(word length) per affected word
              j = 0
              while (j < s.length - 1) {
                if (s(j) + " " + s(j + 1) != bestPair)
                  subPair(s(j) + " " + s(j + 1), c)
                j += 1
              }
              val next =
                new scala.collection.mutable.ArrayBuffer[String](s.length)
              j = 0
              while (j < s.length) {
                if (j < s.length - 1 && s(j) == a && s(j + 1) == b) {
                  next += a + b; j += 2
                } else { next += s(j); j += 1 }
              }
              seqs(w) = next.toArray
              val ns = seqs(w)
              j = 0
              while (j < ns.length - 1) {
                addPair(ns(j) + " " + ns(j + 1), w, c); j += 1
              }
            }
          }
        }
        round += 1
      }
    }
    merges.toArray
  }
}
