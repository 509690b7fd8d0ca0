package graft.functions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable frequent-items (heavy-hitter) sketches — Datasketches
  * `ItemsSketch[String]` (Misra–Gries / space-saving family) surfaced
  * as Catalyst aggregates, completing the engine's sketch tier (HLL
  * distinct counts, KLL quantiles, Bloom membership) with approximate
  * top-k.
  *
  * Why this exists: the exact answer to "top tokens per group" is a
  * full shuffle GROUP BY over the single most skewed key distribution
  * a text pipeline has (Zipf token counts) — at 100 TB that shuffle IS
  * the job. The sketch path aggregates each partition into one
  * `maxMapSize`-bounded sketch, shuffles ONE small binary per
  * (group, partition), and merges associatively — the same
  * store-small-sketches / answer-any-rollup contract as `q_hll_merge`.
  *
  * Guarantees (Datasketches frequent-items, maxMapSize = M):
  *  - epsilon ≤ 3.5/M of the stream length n: every estimate satisfies
  *    `est − maxError ≤ true ≤ est` (upper bound IS the estimate for a
  *    single un-merged sketch; after merging, bounds still bracket).
  *  - `NO_FALSE_NEGATIVES`: every item with true count >
  *    `getMaximumError` is returned (supersets allowed — the price is
  *    possible false positives near the threshold, never misses).
  *  - merge is associative and the error of a merged sketch is bounded
  *    by the same epsilon on the combined stream — partition order
  *    cannot change the guarantee, which is what makes the aggregate
  *    safe under Spark's partial/final plan.
  *
  * All three guarantee clauses are pinned by `FreqSketchSpec` against
  * exact counts; the query surface is `q_topk_tokens_approx` plus the
  * `topk_tokens` TVF.
  */
object FreqSketch {
  private[functions] def serde = new ArrayOfStringsSerDe

  private[functions] def fromBytes(b: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(b), serde)

  private[functions] def checkMapSize(m: Int): Unit =
    require(m >= 8 && Integer.bitCount(m) == 1,
      s"freq sketch maxMapSize must be a power of 2 >= 8; got $m")

  private def litInt(e: Expression): Int =
    e.eval().asInstanceOf[Number].intValue()

  private val registered = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]())

  /** Idempotently register the sketch functions with a session (the
    * extension-free path used by specs; `GraftExtensions` injects the
    * same builders session-wide). */
  def register(spark: SparkSession): Unit =
    if (registered.add(spark)) {
      val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.functionRegistry
      reg.createOrReplaceTempFunction("freq_sketch_agg",
        exprs => FreqItemsAgg(exprs(0), exprs(1)), "built-in")
      reg.createOrReplaceTempFunction("freq_union_agg",
        exprs => FreqUnionAgg(exprs(0), exprs(1)), "built-in")
      reg.createOrReplaceTempFunction("freq_sketch_topk",
        exprs => FreqSketchTopK(exprs(0), litInt(exprs(1))), "built-in")
      reg.createOrReplaceTempFunction("freq_sketch_error",
        exprs => FreqSketchError(exprs(0)), "built-in")
      reg.createOrReplaceTempFunction("freq_sketch_estimate",
        exprs => FreqSketchEstimate(exprs(0), exprs(1)), "built-in")
    }

  /** Per-group heavy-hitter sketch of a string column (binary). */
  def freqSketchAgg(item: Column, maxMapSize: Int = 1024): Column = {
    checkMapSize(maxMapSize)
    call_function("freq_sketch_agg", item, lit(maxMapSize))
  }

  /** Union of stored sketches — the rollup aggregate. */
  def freqUnionAgg(sketch: Column, maxMapSize: Int = 1024): Column = {
    checkMapSize(maxMapSize)
    call_function("freq_union_agg", sketch, lit(maxMapSize))
  }

  /** Top-`k` heavy hitters of a sketch as
    * `array<struct<item, estimate, lower, upper>>`, deterministic
    * (estimate DESC, item ASC) order. */
  def freqSketchTopK(sketch: Column, k: Int): Column =
    call_function("freq_sketch_topk", sketch, lit(k))

  /** The sketch's a-posteriori maximum count error (0 = exact). */
  def freqSketchError(sketch: Column): Column =
    call_function("freq_sketch_error", sketch)

  /** Estimated count of one item. */
  def freqSketchEstimate(sketch: Column, item: Column): Column =
    call_function("freq_sketch_estimate", sketch, item)
}

/** `freq_sketch_agg(item, maxMapSize)` — build one bounded
  * `ItemsSketch[String]` per group. The buffer lives as a Java object
  * (ObjectHashAggregate), serialized only at spill/shuffle; per-row
  * cost is one hash-map update against ≤ maxMapSize entries. */
case class FreqItemsAgg(
    left: Expression,
    right: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]]
  with BinaryLike[Expression] {

  private lazy val maxMapSize: Int = {
    val m = right.eval().asInstanceOf[Number].intValue()
    FreqSketch.checkMapSize(m)
    m
  }

  override def prettyName: String = "freq_sketch_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(buffer: ItemsSketch[String],
      input: InternalRow): ItemsSketch[String] = {
    val v = left.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: ItemsSketch[String],
      other: ItemsSketch[String]): ItemsSketch[String] =
    buffer.merge(other)

  override def eval(buffer: ItemsSketch[String]): Any =
    buffer.toByteArray(FreqSketch.serde)

  override def serialize(buffer: ItemsSketch[String]): Array[Byte] =
    buffer.toByteArray(FreqSketch.serde)
  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    FreqSketch.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FreqItemsAgg =
    copy(left = newLeft, right = newRight)
}

/** `freq_union_agg(sketch, maxMapSize)` — union stored sketches into a
  * coarser rollup without touching the raw stream (the q_hll_merge
  * pattern: build daily, store, answer monthly by merging). */
case class FreqUnionAgg(
    left: Expression,
    right: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]]
  with BinaryLike[Expression] {

  private lazy val maxMapSize: Int = {
    val m = right.eval().asInstanceOf[Number].intValue()
    FreqSketch.checkMapSize(m)
    m
  }

  override def prettyName: String = "freq_union_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(buffer: ItemsSketch[String],
      input: InternalRow): ItemsSketch[String] = {
    val v = left.eval(input)
    if (v != null)
      buffer.merge(FreqSketch.fromBytes(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(buffer: ItemsSketch[String],
      other: ItemsSketch[String]): ItemsSketch[String] =
    buffer.merge(other)

  override def eval(buffer: ItemsSketch[String]): Any =
    buffer.toByteArray(FreqSketch.serde)

  override def serialize(buffer: ItemsSketch[String]): Array[Byte] =
    buffer.toByteArray(FreqSketch.serde)
  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    FreqSketch.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): FreqUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FreqUnionAgg =
    copy(left = newLeft, right = newRight)
}

/** `freq_sketch_topk(sketch, k)` — decode a sketch into its top-`k`
  * heavy hitters (`NO_FALSE_NEGATIVES`: a superset of every true
  * heavy hitter above the sketch's max error, before the k cut).
  * Deterministic (estimate DESC, item ASC) order regardless of the
  * sketch's internal hash layout. Runs on ≤|groups| aggregated rows —
  * never the raw stream — so CodegenFallback costs nothing. */
case class FreqSketchTopK(child: Expression, k: Int)
  extends Expression with UnaryLike[Expression] with CodegenFallback {

  require(k > 0, s"freq_sketch_topk k must be positive; got $k")

  override def prettyName: String = "freq_sketch_topk"
  override def nullable: Boolean = child.nullable
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("estimate", LongType, nullable = false),
    StructField("lower", LongType, nullable = false),
    StructField("upper", LongType, nullable = false))),
    containsNull = false)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val sk = FreqSketch.fromBytes(v.asInstanceOf[Array[Byte]])
    val rows = sk.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
      .sortBy(r => (-r.getEstimate, r.getItem))
      .take(k)
      .map(r => InternalRow(UTF8String.fromString(r.getItem),
        r.getEstimate, r.getLowerBound, r.getUpperBound))
    new GenericArrayData(rows.asInstanceOf[Array[Any]]): ArrayData
  }

  override protected def withNewChildInternal(
      newChild: Expression): FreqSketchTopK = copy(child = newChild)
}

/** `freq_sketch_error(sketch)` — the sketch's a-posteriori maximum
  * count error: every estimate is within this of the true count, and
  * every item whose true count exceeds it is guaranteed present. */
case class FreqSketchError(child: Expression)
  extends Expression with UnaryLike[Expression] with CodegenFallback {

  override def prettyName: String = "freq_sketch_error"
  override def nullable: Boolean = child.nullable
  override def dataType: DataType = LongType

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else FreqSketch.fromBytes(v.asInstanceOf[Array[Byte]]).getMaximumError
  }

  override protected def withNewChildInternal(
      newChild: Expression): FreqSketchError = copy(child = newChild)
}

/** `freq_sketch_estimate(sketch, item)` — estimated count of one item
  * (0 when absent; true count never exceeds estimate + maxError). */
case class FreqSketchEstimate(left: Expression, right: Expression)
  extends Expression with BinaryLike[Expression] with CodegenFallback {

  override def prettyName: String = "freq_sketch_estimate"
  override def nullable: Boolean = left.nullable || right.nullable
  override def dataType: DataType = LongType

  override def eval(input: InternalRow): Any = {
    val s = left.eval(input)
    val i = right.eval(input)
    if (s == null || i == null) null
    else FreqSketch.fromBytes(s.asInstanceOf[Array[Byte]])
      .getEstimate(i.asInstanceOf[UTF8String].toString)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FreqSketchEstimate =
    copy(left = newLeft, right = newRight)
}
