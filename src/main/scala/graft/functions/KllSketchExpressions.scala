package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._

/** KLL quantile sketches — the MERGEABLE quantile tier (Datasketches
  * KllDoublesSketch). `q_approx_quantile` already sketches quantiles in
  * one pass, but `percentile_approx` cannot CONSUME a stored sketch:
  * re-answering a coarser rollup means re-scanning raw values. KLL
  * closes that gap the same way q_hll_merge does for distinct counts —
  * build one small sketch per (group, shard) once, STORE the binary
  * sketches, and answer any coarser quantile question later by merging
  * them; merge cost is proportional to sketch count and the rank-error
  * guarantee (~1.65/k^0.9 at 99% confidence, exposed via `kll_error`)
  * survives merging. Completes the stored-sketch family: HLL (distinct),
  * theta (set algebra), frequent-items (heavy hitters), Bloom
  * (membership), KLL (quantiles).
  *
  * Determinism caveat (unlike theta): KLL compaction draws random
  * offsets, so two runs over the same data may produce different — but
  * equally valid — sketches. Exact invariants that DO hold and are
  * spec-pinned: `kll_n` is the exact stream length under any merge
  * shape, and every quantile estimate's true rank lies within the
  * sketch's published normalized rank error. Estimates are therefore
  * gated by rank-error bounds (KllSketchSpec), never by hashes — the
  * query is no-oracle by design.
  */
object Kll {
  private[functions] def checkK(k: Int): Unit =
    require(k >= 8 && k <= 65535, s"KLL k must be in [8, 65535]; got $k")

  private[functions] def newSketch(k: Int): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  private[functions] def fromBytes(b: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(b))

  private def litInt(e: Expression): Int =
    e.eval().asInstanceOf[Number].intValue()

  private val registered = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]())

  /** Idempotently register the KLL functions with a session (specs;
    * `GraftExtensions` injects the same builders session-wide). */
  def register(spark: SparkSession): Unit =
    if (registered.add(spark)) {
      val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.functionRegistry
      reg.createOrReplaceTempFunction("kll_sketch_agg",
        exprs => KllSketchAgg(exprs(0), exprs(1)), "built-in")
      reg.createOrReplaceTempFunction("kll_union_agg",
        exprs => KllUnionAgg(exprs(0), exprs(1)), "built-in")
      reg.createOrReplaceTempFunction("kll_quantile",
        exprs => KllQuantile(exprs(0), exprs(1)), "built-in")
      reg.createOrReplaceTempFunction("kll_rank",
        exprs => KllRank(exprs(0), exprs(1)), "built-in")
      reg.createOrReplaceTempFunction("kll_n",
        exprs => KllN(exprs(0)), "built-in")
      reg.createOrReplaceTempFunction("kll_error",
        exprs => KllError(exprs(0)), "built-in")
    }

  /** Per-group KLL sketch of a numeric column (binary). */
  def kllSketchAgg(value: Column, k: Int = 200): Column = {
    checkK(k)
    call_function("kll_sketch_agg", value.cast("double"), lit(k))
  }

  /** Merge of stored sketches — the rollup aggregate. */
  def kllUnionAgg(sketch: Column, k: Int = 200): Column = {
    checkK(k)
    call_function("kll_union_agg", sketch, lit(k))
  }

  /** Quantile estimate at normalized rank ∈ [0, 1] (inclusive). */
  def kllQuantile(sketch: Column, rank: Column): Column =
    call_function("kll_quantile", sketch, rank.cast("double"))

  /** Normalized rank ∈ [0, 1] of a value in the sketched stream. */
  def kllRank(sketch: Column, value: Column): Column =
    call_function("kll_rank", sketch, value.cast("double"))

  /** EXACT stream length behind a sketch — survives any merge shape. */
  def kllN(sketch: Column): Column = call_function("kll_n", sketch)

  /** The sketch's own single-sided normalized rank error (99% conf). */
  def kllError(sketch: Column): Column = call_function("kll_error", sketch)
}

/** `kll_sketch_agg(value, k)` — build one KLL sketch per group. The
  * buffer is a live heap sketch (object-hash aggregation; serialized
  * compact only at spill/shuffle). */
case class KllSketchAgg(
    left: Expression,
    right: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with BinaryLike[Expression] {

  private lazy val k: Int = {
    val v = right.eval().asInstanceOf[Number].intValue()
    Kll.checkK(v)
    v
  }

  override def prettyName: String = "kll_sketch_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KllDoublesSketch = Kll.newSketch(k)

  override def update(buffer: KllDoublesSketch,
      input: InternalRow): KllDoublesSketch = {
    val v = left.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Number].doubleValue())
    buffer
  }

  override def merge(buffer: KllDoublesSketch,
      other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] =
    buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    Kll.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllSketchAgg =
    copy(left = newLeft, right = newRight)
}

/** `kll_union_agg(sketch, k)` — merge stored sketches into a coarser
  * rollup (the q_hll_merge pattern, quantile-flavored). */
case class KllUnionAgg(
    left: Expression,
    right: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with BinaryLike[Expression] {

  private lazy val k: Int = {
    val v = right.eval().asInstanceOf[Number].intValue()
    Kll.checkK(v)
    v
  }

  override def prettyName: String = "kll_union_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KllDoublesSketch = Kll.newSketch(k)

  override def update(buffer: KllDoublesSketch,
      input: InternalRow): KllDoublesSketch = {
    val v = left.eval(input)
    if (v != null) buffer.merge(Kll.fromBytes(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(buffer: KllDoublesSketch,
      other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] =
    buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    Kll.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): KllUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllUnionAgg =
    copy(left = newLeft, right = newRight)
}

/** `kll_quantile(sketch, rank)` — quantile estimate at a normalized
  * rank (INCLUSIVE search criterion, the Datasketches default). NULL on
  * an empty sketch rather than the library's exception. */
case class KllQuantile(left: Expression, right: Expression)
  extends Expression with BinaryLike[Expression] with CodegenFallback {

  override def prettyName: String = "kll_quantile"
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  override def eval(input: InternalRow): Any = {
    val s = left.eval(input)
    val r = right.eval(input)
    if (s == null || r == null) return null
    val rank = r.asInstanceOf[Number].doubleValue()
    require(rank >= 0.0 && rank <= 1.0,
      s"kll_quantile rank must be in [0, 1]; got $rank")
    val sk = Kll.fromBytes(s.asInstanceOf[Array[Byte]])
    if (sk.isEmpty) null else sk.getQuantile(rank)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantile =
    copy(left = newLeft, right = newRight)
}

/** `kll_rank(sketch, value)` — normalized rank of a value. */
case class KllRank(left: Expression, right: Expression)
  extends Expression with BinaryLike[Expression] with CodegenFallback {

  override def prettyName: String = "kll_rank"
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  override def eval(input: InternalRow): Any = {
    val s = left.eval(input)
    val v = right.eval(input)
    if (s == null || v == null) return null
    val sk = Kll.fromBytes(s.asInstanceOf[Array[Byte]])
    if (sk.isEmpty) null
    else sk.getRank(v.asInstanceOf[Number].doubleValue())
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllRank =
    copy(left = newLeft, right = newRight)
}

/** `kll_n(sketch)` — EXACT count of sketched values (mergers sum it
  * losslessly, so this doubles as a merge-integrity check). */
case class KllN(child: Expression)
  extends Expression with UnaryLike[Expression] with CodegenFallback {

  override def prettyName: String = "kll_n"
  override def nullable: Boolean = child.nullable
  override def dataType: DataType = LongType

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else Kll.fromBytes(v.asInstanceOf[Array[Byte]]).getN
  }

  override protected def withNewChildInternal(newChild: Expression): KllN =
    copy(child = newChild)
}

/** `kll_error(sketch)` — the sketch's single-sided normalized rank
  * error at 99% confidence (a function of k; merging never widens it
  * beyond the weakest input sketch's bound). */
case class KllError(child: Expression)
  extends Expression with UnaryLike[Expression] with CodegenFallback {

  override def prettyName: String = "kll_error"
  override def nullable: Boolean = child.nullable
  override def dataType: DataType = DoubleType

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else Kll.fromBytes(v.asInstanceOf[Array[Byte]])
      .getNormalizedRankError(false)
  }

  override protected def withNewChildInternal(newChild: Expression): KllError =
    copy(child = newChild)
}
