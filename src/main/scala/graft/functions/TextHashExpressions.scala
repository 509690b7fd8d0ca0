package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text-dedup hot path.
  *
  * The built-in spelling of a k-gram shingle set —
  * `array_distinct(transform(sequence(...), i => concat_ws(" ",
  * slice(split(text, " "), i+1, k))))` — is a stack of higher-order
  * functions: interpreted per element, allocating a token array, k-slice
  * and concatenated string per shingle per row, and a whole-stage-codegen
  * barrier. Computing a 32-permutation MinHash signature on top of it
  * costs another explode (one row per shingle) and a 32-column min
  * aggregate. Measured at bench scale (sf0.1, 5k docs) the signature
  * stage alone was ~2 s warm and dominated every LSH-family query.
  *
  * These expressions exploit a structural identity instead: when tokens
  * are split on every single space, the k-token shingle starting at token
  * i is EXACTLY the byte substring of the original text from the start of
  * token i to the end of token i+k-1 (whatever lies between consecutive
  * single-space separators is preserved verbatim, including empty tokens
  * from doubled spaces — and multi-byte UTF-8 sequences never contain the
  * 0x20 byte, so a byte scan for spaces is character-correct). So one
  * pass over the text bytes finds token starts, and each shingle is
  * hashed in place with zero string allocation:
  *
  *  - [[MinHashSig]]: per-permutation mins in one narrow projection —
  *    the whole signature stage becomes a map with NO explode, NO
  *    aggregate and NO shuffle (duplicate shingles cannot change a min,
  *    so the distinct step drops out too). Hash-compatible with
  *    `min(xxhash64(lit(p), shingle))`: seed chain
  *    `hashInt(p, 42)` → bytes, verified by TextHashSpec.
  *  - [[ShingleHashVec]]: the distinct shingle set as SORTED xxhash64
  *    longs (seed 42, ≡ `xxhash64(shingle)`), for exact-Jaccard stages —
  *    8-byte comparisons instead of strings, and sortedness enables
  *    merge intersection.
  *  - [[JaccardSorted]]: exact Jaccard of two sorted distinct long
  *    arrays by allocation-free merge count — the pairwise verify in
  *    block-exact n-gram mining evaluates this millions of times, where
  *    `array_intersect` would build a hash set and a result array per
  *    pair only to take its size.
  *
  * 64-bit hash collisions among a corpus's distinct shingles are ~1e-9
  * probable and deterministic; the DuckDB oracles intersect the raw
  * shingle strings, so the hash-gated agreement proves the hashed path
  * exact on every gated corpus (same stance as the embedding block
  * join). All three generate a single method call inside whole-stage
  * codegen, keeping the surrounding pipeline fused.
  */
object ShingleScan {
  /** Byte-start offsets of the single-space-separated tokens of `s`,
    * with a sentinel: returns `starts` of length nTok+1 where
    * `starts(nTok) = numBytes + 1`, so token j spans
    * `[starts(j), starts(j+1) - 1)`. Matches `split(text, " ", -1)`
    * (every single space separates; empty tokens preserved). */
  def tokenStarts(s: UTF8String): Array[Int] = {
    val n = s.numBytes()
    var count = 1
    var i = 0
    while (i < n) {
      if (s.getByte(i) == 0x20) count += 1
      i += 1
    }
    val starts = new Array[Int](count + 1)
    starts(0) = 0
    var t = 1
    i = 0
    while (i < n) {
      if (s.getByte(i) == 0x20) { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(count) = n + 1
    starts
  }
}

/** MinHash signature of a text: for each permutation p in [0, perms),
  * the min over k-gram shingles of `xxhash64(p, shingle)` — one pass,
  * no shingle materialization. Output `array<long>` of length `perms`. */
case class MinHashSig(child: Expression, k: Int, perms: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  // xxhash64(lit(p), shingle) chains child hashes: the int literal hashes
  // with the default seed 42, and that result seeds the string hash.
  @transient private lazy val seeds: Array[Long] =
    Array.tabulate(perms)(p => XXH64.hashInt(p, 42L))

  def computeFor(input: UTF8String): ArrayData = {
    val base = input.getBaseObject
    val off = input.getBaseOffset
    val starts = ShingleScan.tokenStarts(input)
    val nTok = starts.length - 1
    val nSh = math.max(nTok - k, 0) + 1
    val mins = Array.fill(perms)(Long.MaxValue)
    var i = 0
    while (i < nSh) {
      val s0 = starts(i)
      val last = math.min(i + k - 1, nTok - 1)
      val len = starts(last + 1) - 1 - s0
      var p = 0
      while (p < perms) {
        val h = XXH64.hashUnsafeBytes(base, off + s0, len, seeds(p))
        if (h < mins(p)) mins(p) = h
        p += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override def nullSafeEval(input: Any): Any =
    computeFor(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashSig", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.computeFor($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Distinct k-gram shingle set of a text as SORTED xxhash64 longs
  * (seed 42 — element-equal to `xxhash64(shingle)` of each distinct
  * shingle string). */
case class ShingleHashVec(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  def computeFor(input: UTF8String): ArrayData = {
    val base = input.getBaseObject
    val off = input.getBaseOffset
    val starts = ShingleScan.tokenStarts(input)
    val nTok = starts.length - 1
    val nSh = math.max(nTok - k, 0) + 1
    val hs = new Array[Long](nSh)
    var i = 0
    while (i < nSh) {
      val s0 = starts(i)
      val last = math.min(i + k - 1, nTok - 1)
      val len = starts(last + 1) - 1 - s0
      hs(i) = XXH64.hashUnsafeBytes(base, off + s0, len, 42L)
      i += 1
    }
    java.util.Arrays.sort(hs)
    var out = 0
    i = 0
    while (i < nSh) {
      if (i == 0 || hs(i) != hs(i - 1)) { hs(out) = hs(i); out += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, out))
  }

  override def nullSafeEval(input: Any): Any =
    computeFor(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleHashes", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.computeFor($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashVec =
    copy(child = newChild)
}

/** Exact Jaccard similarity |A∩B| / |A∪B| of two SORTED distinct long
  * arrays by merge count — no hash set, no intermediate array. */
case class JaccardSorted(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sorted"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    JaccardSorted.compute(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = JaccardSorted.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $cls.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSorted =
    copy(left = newLeft, right = newRight)
}

/** |A∩B| of two SORTED distinct long arrays by merge count — the raw
  * overlap behind asymmetric measures (containment |A∩B|/|A|) that
  * [[JaccardSorted]]'s symmetric ratio can't express. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCount.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = SortedIntersectCount.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $cls.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  def compute(x: ArrayData, y: ArrayData): Long = {
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var inter = 0L
    while (i < nx && j < ny) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { inter += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    inter
  }
}

object JaccardSorted {
  def compute(x: ArrayData, y: ArrayData): Double = {
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < nx && j < ny) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { inter += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    val union = nx + ny - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }
}

/** Unicode NFC normalization (UAX #15 canonical composition) — the text
  * cleanup step Spark has no builtin for. Name and semantics match
  * DuckDB's `nfc_normalize`, so the oracle computes it natively. ASCII
  * input (the overwhelming case in a web corpus) short-circuits on a
  * byte scan without materializing a java String. */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  def computeFor(input: UTF8String): UTF8String = {
    val n = input.numBytes()
    val base = input.getBaseObject
    val off = input.getBaseOffset
    var i = 0
    var ascii = true
    while (ascii && i < n) {
      if ((org.apache.spark.unsafe.Platform.getByte(base, off + i) & 0x80) != 0)
        ascii = false
      i += 1
    }
    if (ascii) input
    else {
      val s = input.toString
      if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC))
        input
      else UTF8String.fromString(
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    }
  }

  override def nullSafeEval(input: Any): Any =
    computeFor(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nfcNormalize", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.computeFor($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** Deflate compression ratio of a string (compressed bytes ÷ raw
  * bytes, 6-dp): the classic corpus-curation quality signal — highly
  * compressible text (boilerplate, repeated spans, template spam)
  * scores low, natural prose ~0.4–0.7, random bytes ≳1. Complements
  * the exact repetition fractions (`q_repetition`) with a single
  * scale-free score. Computed with the JVM's raw-deflate at the
  * default level; per-row work is linear in the string and no row
  * state escapes — each executor THREAD reuses one native `Deflater`
  * (reset between rows) instead of paying native stream setup +
  * teardown per row, the dominant cost on wide scans; `reset()` fully
  * re-initializes the stream, so rows are independent. The dictionary
  * is process-lifetime by design (one per task thread, ended with the
  * JVM); a mid-compress exception leaves the instance reset-able, so
  * nothing native leaks per row. The expression codegens into the
  * scan like the hash expressions above. No DuckDB oracle (no SQL
  * zlib) — spec-bounded. */
case class DeflateRatio(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "deflate_ratio"

  def computeFor(input: UTF8String): Double = {
    val bytes = input.getBytes
    if (bytes.length == 0) 1.0
    else {
      val d = DeflateRatio.local.get()
      try {
        d.setInput(bytes)
        d.finish()
        val buf = DeflateRatio.buffer.get()
        var total = 0L
        while (!d.finished()) total += d.deflate(buf)
        math.round(total.toDouble / bytes.length * 1e6) / 1e6
      } finally d.reset()
    }
  }

  override def nullSafeEval(input: Any): Any =
    computeFor(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("deflateRatio", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.computeFor($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): DeflateRatio =
    copy(child = newChild)
}

object DeflateRatio {
  // per-thread native deflater + scratch buffer, reset between rows —
  // allocation-free row path, no per-row native setup/teardown
  private val local =
    ThreadLocal.withInitial[java.util.zip.Deflater](() =>
      new java.util.zip.Deflater(
        java.util.zip.Deflater.DEFAULT_COMPRESSION, true))
  private val buffer =
    ThreadLocal.withInitial[Array[Byte]](() => new Array[Byte](8192))
}

/** Column-level API for the text-hash expressions, registered through the
  * session `FunctionRegistry` and invoked via `call_function` (Spark 4
  * removed the public Column-from-Expression constructor — same pattern
  * as [[VectorOps]]). */
object TextHashOps {

  private val registered = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]())

  private def litInt(e: Expression): Int =
    e.eval().asInstanceOf[Number].intValue()

  /** Idempotently register the text-hash functions with a session. */
  def register(spark: SparkSession): Unit =
    if (registered.add(spark)) {
      val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.functionRegistry
      reg.createOrReplaceTempFunction("minhash_sig",
        exprs => MinHashSig(exprs(0), litInt(exprs(1)), litInt(exprs(2))),
        "built-in")
      reg.createOrReplaceTempFunction("shingle_hashes",
        exprs => ShingleHashVec(exprs(0), litInt(exprs(1))), "built-in")
      reg.createOrReplaceTempFunction("jaccard_sorted",
        exprs => JaccardSorted(exprs(0), exprs(1)), "built-in")
      reg.createOrReplaceTempFunction("sorted_intersect_count",
        exprs => SortedIntersectCount(exprs(0), exprs(1)), "built-in")
      reg.createOrReplaceTempFunction("nfc_normalize",
        exprs => NfcNormalize(exprs(0)), "built-in")
      reg.createOrReplaceTempFunction("deflate_ratio",
        exprs => DeflateRatio(exprs(0)), "built-in")
      reg.createOrReplaceTempFunction("might_contain",
        exprs => new org.apache.spark.sql.catalyst.expressions
          .BloomFilterMightContain(exprs(0), exprs(1)), "built-in")
      // Spark ships this aggregate for its runtime join filters but does
      // not expose it in the public registry; surfacing it makes the
      // build side of Bloom membership pruning declarative too.
      reg.createOrReplaceTempFunction("bloom_filter_agg",
        exprs => new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(exprs(0), exprs(1), exprs(2)), "built-in")
    }

  /** `perms`-permutation MinHash signature of `text` over k-gram
    * shingles, as `array<long>` (codegen'd single pass). */
  def minhashSig(text: Column, k: Int = 3, perms: Int = 32): Column =
    call_function("minhash_sig", text, lit(k), lit(perms))

  /** Distinct k-gram shingle set of `text` as sorted xxhash64 longs. */
  def shingleHashes(text: Column, k: Int = 3): Column =
    call_function("shingle_hashes", text, lit(k))

  /** Exact Jaccard of two sorted distinct `array<long>` columns. */
  def jaccardSorted(a: Column, b: Column): Column =
    call_function("jaccard_sorted", a, b)

  /** |A∩B| of two sorted distinct `array<long>` columns. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    call_function("sorted_intersect_count", a, b)

  /** Unicode NFC normalization of a string column (codegen'd; ASCII
    * fast path). Matches DuckDB's `nfc_normalize`. */
  def nfcNormalize(text: Column): Column =
    call_function("nfc_normalize", text)

  /** Bloom-filter membership probe: `bloom` is a serialized filter (the
    * binary produced by Spark's `bloom_filter_agg`, as a literal or
    * scalar subquery), `value` a LONG. Spark's own runtime-filter
    * expression, surfaced for declarative set-membership pruning. */
  def mightContain(bloom: Column, value: Column): Column =
    call_function("might_contain", bloom, value)
}
