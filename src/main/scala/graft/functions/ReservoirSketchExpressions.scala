package graft.functions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.sampling.{ReservoirItemsSketch, ReservoirItemsUnion}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Reservoir sampling sketches — MERGEABLE uniform samples
  * (Datasketches ReservoirItemsSketch over string renderings). The
  * exploration primitive the stored-sketch tier was missing: "show me
  * 20 uniformly random example values per group, kept fresh as shards
  * roll up" — without ever re-scanning raw data or keeping more than k
  * items per group in state. Merging preserves uniformity (the union
  * reweighs by each input's true n), so per-shard reservoirs roll up
  * to an unbiased corpus-level sample, the same stored-rollup shape as
  * q_hll_merge.
  *
  * Randomized by nature (the reservoir draws from an RNG): estimates
  * of nothing — the GUARANTEES are structural and spec-pinned: exact
  * stream length `n` under any merge shape, sample size = min(k, n),
  * and every sampled item is an element of the input stream. No
  * oracle; ReservoirSketchSpec gates the tier.
  */
object ReservoirSketch {
  private[functions] val serde = new ArrayOfStringsSerDe()

  private[functions] def checkK(k: Int): Unit =
    require(k >= 2 && k <= (1 << 20),
      s"reservoir k must be in [2, 2^20]; got $k")

  private[functions] def newUnion(k: Int): ReservoirItemsUnion[String] =
    ReservoirItemsUnion.newInstance[String](k)

  /** A fresh union's result is null until first update — normalize to
    * an empty sketch so empty groups still serialize. */
  private[functions] def resultOf(u: ReservoirItemsUnion[String],
      k: Int): ReservoirItemsSketch[String] =
    Option(u.getResult).getOrElse(ReservoirItemsSketch.newInstance[String](k))

  private[functions] def fromBytes(
      b: Array[Byte]): ReservoirItemsSketch[String] =
    ReservoirItemsSketch.heapify(Memory.wrap(b), serde)

  private[functions] def render(v: Any): String = v match {
    case s: UTF8String => s.toString
    case other => String.valueOf(other)
  }

  private val registered = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]())

  /** Idempotently register the reservoir functions with a session. */
  def register(spark: SparkSession): Unit =
    if (registered.add(spark)) {
      val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.functionRegistry
      reg.createOrReplaceTempFunction("reservoir_agg",
        exprs => ReservoirAgg(exprs(0), exprs(1)), "built-in")
      reg.createOrReplaceTempFunction("reservoir_union_agg",
        exprs => ReservoirUnionAgg(exprs(0), exprs(1)), "built-in")
      reg.createOrReplaceTempFunction("reservoir_items",
        exprs => ReservoirItems(exprs(0)), "built-in")
      reg.createOrReplaceTempFunction("reservoir_n",
        exprs => ReservoirN(exprs(0)), "built-in")
    }

  /** Per-group uniform sample of ≤k item renderings (binary sketch). */
  def reservoirAgg(item: Column, k: Int = 20): Column = {
    checkK(k)
    call_function("reservoir_agg", item, lit(k))
  }

  /** Merge stored reservoirs — unbiased at any merge shape. */
  def reservoirUnionAgg(sketch: Column, k: Int = 20): Column = {
    checkK(k)
    call_function("reservoir_union_agg", sketch, lit(k))
  }

  /** The sampled items (array<string>, unordered). */
  def reservoirItems(sketch: Column): Column =
    call_function("reservoir_items", sketch)

  /** EXACT stream length behind the reservoir. */
  def reservoirN(sketch: Column): Column =
    call_function("reservoir_n", sketch)
}

/** `reservoir_agg(item, k)` — build one reservoir per group. */
case class ReservoirAgg(
    left: Expression,
    right: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ReservoirItemsUnion[String]]
  with BinaryLike[Expression] {

  private lazy val k: Int = {
    val v = right.eval().asInstanceOf[Number].intValue()
    ReservoirSketch.checkK(v)
    v
  }

  override def prettyName: String = "reservoir_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): ReservoirItemsUnion[String] =
    ReservoirSketch.newUnion(k)

  override def update(buffer: ReservoirItemsUnion[String],
      input: InternalRow): ReservoirItemsUnion[String] = {
    val v = left.eval(input)
    if (v != null) buffer.update(ReservoirSketch.render(v))
    buffer
  }

  override def merge(buffer: ReservoirItemsUnion[String],
      other: ReservoirItemsUnion[String]): ReservoirItemsUnion[String] = {
    val r = other.getResult // null until the other side saw data
    if (r != null) buffer.update(r)
    buffer
  }

  override def eval(buffer: ReservoirItemsUnion[String]): Any =
    ReservoirSketch.resultOf(buffer, k).toByteArray(ReservoirSketch.serde)

  override def serialize(buffer: ReservoirItemsUnion[String]): Array[Byte] =
    ReservoirSketch.resultOf(buffer, k).toByteArray(ReservoirSketch.serde)
  override def deserialize(bytes: Array[Byte]): ReservoirItemsUnion[String] = {
    val u = ReservoirSketch.newUnion(k)
    u.update(ReservoirSketch.fromBytes(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(o: Int): ReservoirAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ReservoirAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ReservoirAgg =
    copy(left = newLeft, right = newRight)
}

/** `reservoir_union_agg(sketch, k)` — roll stored reservoirs up. */
case class ReservoirUnionAgg(
    left: Expression,
    right: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ReservoirItemsUnion[String]]
  with BinaryLike[Expression] {

  private lazy val k: Int = {
    val v = right.eval().asInstanceOf[Number].intValue()
    ReservoirSketch.checkK(v)
    v
  }

  override def prettyName: String = "reservoir_union_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): ReservoirItemsUnion[String] =
    ReservoirSketch.newUnion(k)

  override def update(buffer: ReservoirItemsUnion[String],
      input: InternalRow): ReservoirItemsUnion[String] = {
    val v = left.eval(input)
    if (v != null)
      buffer.update(ReservoirSketch.fromBytes(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(buffer: ReservoirItemsUnion[String],
      other: ReservoirItemsUnion[String]): ReservoirItemsUnion[String] = {
    val r = other.getResult // null until the other side saw data
    if (r != null) buffer.update(r)
    buffer
  }

  override def eval(buffer: ReservoirItemsUnion[String]): Any =
    ReservoirSketch.resultOf(buffer, k).toByteArray(ReservoirSketch.serde)

  override def serialize(buffer: ReservoirItemsUnion[String]): Array[Byte] =
    ReservoirSketch.resultOf(buffer, k).toByteArray(ReservoirSketch.serde)
  override def deserialize(bytes: Array[Byte]): ReservoirItemsUnion[String] = {
    val u = ReservoirSketch.newUnion(k)
    u.update(ReservoirSketch.fromBytes(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(o: Int): ReservoirUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ReservoirUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ReservoirUnionAgg =
    copy(left = newLeft, right = newRight)
}

/** `reservoir_items(sketch)` — the sampled items as array<string>. */
case class ReservoirItems(child: Expression)
  extends Expression with UnaryLike[Expression] with CodegenFallback {

  override def prettyName: String = "reservoir_items"
  override def nullable: Boolean = child.nullable
  override def dataType: DataType = ArrayType(StringType, false)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else {
      val sk = ReservoirSketch.fromBytes(v.asInstanceOf[Array[Byte]])
      val items =
        if (sk.getNumSamples == 0) Array.empty[String]
        else sk.getSamples(classOf[String])
      new GenericArrayData(items.map(UTF8String.fromString(_)))
    }
  }

  override protected def withNewChildInternal(
      newChild: Expression): ReservoirItems = copy(child = newChild)
}

/** `reservoir_n(sketch)` — EXACT stream length (merge-lossless). */
case class ReservoirN(child: Expression)
  extends Expression with UnaryLike[Expression] with CodegenFallback {

  override def prettyName: String = "reservoir_n"
  override def nullable: Boolean = child.nullable
  override def dataType: DataType = LongType

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else ReservoirSketch.fromBytes(v.asInstanceOf[Array[Byte]]).getN
  }

  override protected def withNewChildInternal(
      newChild: Expression): ReservoirN = copy(child = newChild)
}
