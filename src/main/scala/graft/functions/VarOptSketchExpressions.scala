package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.sampling.{VarOptItemsSketch, VarOptItemsUnion}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{TernaryLike, BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** VarOpt (variance-optimal) weighted sampling sketches — the WEIGHTED
  * half of the sampling tier next to [[ReservoirSketch]]'s uniform
  * samples: keep ≤k items per group where heavy items are
  * preferentially retained and every retained item carries an ADJUSTED
  * WEIGHT such that, for ANY subset predicate evaluated over the
  * sample, the sum of matching adjusted weights is an unbiased
  * estimate of the true subset weight — the "how much of my token
  * budget is license-tainted?" estimator, answerable from a k-row
  * sample per group. Two exact invariants survive any merge shape and
  * are spec-pinned: the stream length `n`, and the TOTAL adjusted
  * weight (it telescopes to the exact input weight sum by
  * construction). Randomized → no oracle; VarOptSketchSpec gates the
  * tier.
  */
object VarOptSketch {
  private[functions] def checkK(k: Int): Unit =
    require(k >= 2 && k <= (1 << 20),
      s"varopt k must be in [2, 2^20]; got $k")

  private[functions] def newSketch(k: Int): VarOptItemsSketch[String] =
    VarOptItemsSketch.newInstance[String](k)

  private[functions] def newUnion(k: Int): VarOptItemsUnion[String] =
    VarOptItemsUnion.newInstance[String](k)

  private[functions] def fromBytes(
      b: Array[Byte]): VarOptItemsSketch[String] =
    VarOptItemsSketch.heapify(Memory.wrap(b), ReservoirSketch.serde)

  private[functions] def toBytes(sk: VarOptItemsSketch[String]): Array[Byte] =
    sk.toByteArray(ReservoirSketch.serde)

  /** An empty union's result may be null — normalize so empty groups
    * still serialize. */
  private[functions] def resultOf(u: VarOptItemsUnion[String],
      k: Int): VarOptItemsSketch[String] =
    Option(u.getResult).getOrElse(newSketch(k))

  private val registered = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]())

  /** Idempotently register the varopt functions with a session. */
  def register(spark: SparkSession): Unit =
    if (registered.add(spark)) {
      val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.functionRegistry
      reg.createOrReplaceTempFunction("varopt_agg",
        exprs => VarOptAgg(exprs(0), exprs(1), exprs(2)), "built-in")
      reg.createOrReplaceTempFunction("varopt_union_agg",
        exprs => VarOptUnionAgg(exprs(0), exprs(1)), "built-in")
      reg.createOrReplaceTempFunction("varopt_samples",
        exprs => VarOptSamples(exprs(0)), "built-in")
      reg.createOrReplaceTempFunction("varopt_n",
        exprs => VarOptN(exprs(0)), "built-in")
    }

  /** Per-group weighted sample of ≤k items (binary sketch). */
  def varoptAgg(item: Column, weight: Column, k: Int = 20): Column = {
    checkK(k)
    call_function("varopt_agg", item, weight.cast("double"), lit(k))
  }

  /** Merge stored varopt sketches — estimates stay unbiased. */
  def varoptUnionAgg(sketch: Column, k: Int = 20): Column = {
    checkK(k)
    call_function("varopt_union_agg", sketch, lit(k))
  }

  /** Retained items with adjusted weights:
    * array<struct<item:string, weight:double>>. Summing `weight` over
    * any predicate estimates that subset's true weight; summing over
    * all rows returns the EXACT stream total. */
  def varoptSamples(sketch: Column): Column =
    call_function("varopt_samples", sketch)

  /** EXACT stream length behind the sketch. */
  def varoptN(sketch: Column): Column = call_function("varopt_n", sketch)
}

/** `varopt_agg(item, weight, k)` — build one varopt sketch per group.
  * Non-positive and null weights are skipped (A-ES/VarOpt domain). */
case class VarOptAgg(
    first: Expression,
    second: Expression,
    third: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VarOptItemsSketch[String]]
  with TernaryLike[Expression] {

  private lazy val k: Int = {
    val v = third.eval().asInstanceOf[Number].intValue()
    VarOptSketch.checkK(v)
    v
  }

  override def prettyName: String = "varopt_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): VarOptItemsSketch[String] =
    VarOptSketch.newSketch(k)

  override def update(buffer: VarOptItemsSketch[String],
      input: InternalRow): VarOptItemsSketch[String] = {
    val v = first.eval(input)
    val w = second.eval(input)
    if (v != null && w != null) {
      val wd = w.asInstanceOf[Number].doubleValue()
      if (wd > 0.0) buffer.update(ReservoirSketch.render(v), wd)
    }
    buffer
  }

  override def merge(buffer: VarOptItemsSketch[String],
      other: VarOptItemsSketch[String]): VarOptItemsSketch[String] = {
    val u = VarOptSketch.newUnion(k)
    u.update(buffer)
    u.update(other)
    VarOptSketch.resultOf(u, k)
  }

  override def eval(buffer: VarOptItemsSketch[String]): Any =
    VarOptSketch.toBytes(buffer)

  override def serialize(buffer: VarOptItemsSketch[String]): Array[Byte] =
    VarOptSketch.toBytes(buffer)
  override def deserialize(bytes: Array[Byte]): VarOptItemsSketch[String] =
    VarOptSketch.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): VarOptAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VarOptAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): VarOptAgg =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** `varopt_union_agg(sketch, k)` — roll stored varopt sketches up. */
case class VarOptUnionAgg(
    left: Expression,
    right: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VarOptItemsUnion[String]]
  with BinaryLike[Expression] {

  private lazy val k: Int = {
    val v = right.eval().asInstanceOf[Number].intValue()
    VarOptSketch.checkK(v)
    v
  }

  override def prettyName: String = "varopt_union_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): VarOptItemsUnion[String] =
    VarOptSketch.newUnion(k)

  override def update(buffer: VarOptItemsUnion[String],
      input: InternalRow): VarOptItemsUnion[String] = {
    val v = left.eval(input)
    if (v != null)
      buffer.update(VarOptSketch.fromBytes(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(buffer: VarOptItemsUnion[String],
      other: VarOptItemsUnion[String]): VarOptItemsUnion[String] = {
    val r = other.getResult // null until the other side saw data
    if (r != null) buffer.update(r)
    buffer
  }

  override def eval(buffer: VarOptItemsUnion[String]): Any =
    VarOptSketch.toBytes(VarOptSketch.resultOf(buffer, k))

  override def serialize(buffer: VarOptItemsUnion[String]): Array[Byte] =
    VarOptSketch.toBytes(VarOptSketch.resultOf(buffer, k))
  override def deserialize(bytes: Array[Byte]): VarOptItemsUnion[String] = {
    val u = VarOptSketch.newUnion(k)
    u.update(VarOptSketch.fromBytes(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(o: Int): VarOptUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VarOptUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VarOptUnionAgg =
    copy(left = newLeft, right = newRight)
}

/** `varopt_samples(sketch)` — retained (item, adjusted-weight) rows. */
case class VarOptSamples(child: Expression)
  extends Expression with UnaryLike[Expression] with CodegenFallback {

  override def prettyName: String = "varopt_samples"
  override def nullable: Boolean = child.nullable
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", StringType, false),
      StructField("weight", DoubleType, false))), false)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val sk = VarOptSketch.fromBytes(v.asInstanceOf[Array[Byte]])
    if (sk.getNumSamples == 0) return new GenericArrayData(Array.empty[Any])
    val s = sk.getSketchSamples
    val items = s.items()
    val weights = s.weights()
    val rows: Array[Any] = items.indices.map { i =>
      InternalRow(UTF8String.fromString(items(i)), weights(i))
    }.toArray
    new GenericArrayData(rows)
  }

  override protected def withNewChildInternal(
      newChild: Expression): VarOptSamples = copy(child = newChild)
}

/** `varopt_n(sketch)` — EXACT stream length (merge-lossless). */
case class VarOptN(child: Expression)
  extends Expression with UnaryLike[Expression] with CodegenFallback {

  override def prettyName: String = "varopt_n"
  override def nullable: Boolean = child.nullable
  override def dataType: DataType = LongType

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else VarOptSketch.fromBytes(v.asInstanceOf[Array[Byte]]).getN
  }

  override protected def withNewChildInternal(
      newChild: Expression): VarOptN = copy(child = newChild)
}
