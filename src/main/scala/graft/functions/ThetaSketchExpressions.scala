package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketches, Union}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Theta sketches — distinct-count sketches CLOSED UNDER SET ALGEBRA
  * (Datasketches theta family). HLL (`q_hll_merge`) unions only; the
  * audience-overlap questions a 100 TB event store actually gets —
  * "distinct users who did A AND B", "users who did A but never B" —
  * need intersections and differences, which is exactly what theta
  * adds: a KMV-style sample of the k smallest item hashes that
  * supports union / intersect / A-not-B with known error, all on the
  * stored sketches, never re-scanning the raw stream.
  *
  * Determinism: a theta sketch is a pure function of the input SET
  * (the k smallest hashes under a fixed seed) — partition order,
  * duplicate arrival order, and merge order cannot change it, so the
  * aggregates below are safe under Spark's partial/final plans AND
  * produce bit-stable results run to run (unlike Misra–Gries counts).
  * Below nominal-entries capacity the sketch is EXACT.
  *
  * Error: at nominal entries k, each estimate carries a relative
  * standard error of ~1/√k; `theta_lb`/`theta_ub` expose the sketch's
  * own confidence bounds, which `ThetaSketchSpec` pins against exact
  * counts in both regimes.
  */
object ThetaSketch {
  private[functions] def checkLgK(lgK: Int): Unit =
    require(lgK >= 4 && lgK <= 26,
      s"theta sketch lgK must be in [4, 26]; got $lgK")

  private[functions] def fromBytes(b: Array[Byte]): CompactSketch =
    Sketches.heapifyCompactSketch(Memory.wrap(b))

  private[functions] def newUnion(lgK: Int): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  /** Route an input value to the typed update overloads (the hash of
    * a long and of its string form differ — keep types stable across
    * a sketch's lifetime). */
  private[functions] def updateWith(u: Union, v: Any): Unit = v match {
    case s: UTF8String => u.update(s.toString)
    case l: java.lang.Long => u.update(l.longValue())
    case i: java.lang.Integer => u.update(i.longValue())
    case d: java.lang.Double => u.update(d.doubleValue())
    case other => u.update(String.valueOf(other))
  }

  private def litInt(e: Expression): Int =
    e.eval().asInstanceOf[Number].intValue()

  private val registered = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]())

  /** Idempotently register the theta functions with a session (specs;
    * `GraftExtensions` injects the same builders session-wide). */
  def register(spark: SparkSession): Unit =
    if (registered.add(spark)) {
      val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.functionRegistry
      reg.createOrReplaceTempFunction("theta_sketch_agg",
        exprs => ThetaSketchAgg(exprs(0), exprs(1)), "built-in")
      reg.createOrReplaceTempFunction("theta_union_agg",
        exprs => ThetaUnionAgg(exprs(0), exprs(1)), "built-in")
      reg.createOrReplaceTempFunction("theta_estimate",
        exprs => ThetaEstimate(exprs(0)), "built-in")
      reg.createOrReplaceTempFunction("theta_lb",
        exprs => ThetaBound(exprs(0), litInt(exprs(1)), upper = false),
        "built-in")
      reg.createOrReplaceTempFunction("theta_ub",
        exprs => ThetaBound(exprs(0), litInt(exprs(1)), upper = true),
        "built-in")
      reg.createOrReplaceTempFunction("theta_intersect",
        exprs => ThetaSetOp(exprs(0), exprs(1), ThetaSetOp.Intersect),
        "built-in")
      reg.createOrReplaceTempFunction("theta_anotb",
        exprs => ThetaSetOp(exprs(0), exprs(1), ThetaSetOp.ANotB),
        "built-in")
      reg.createOrReplaceTempFunction("theta_union_pair",
        exprs => ThetaSetOp(exprs(0), exprs(1), ThetaSetOp.UnionPair),
        "built-in")
    }

  /** Per-group theta sketch of a column's distinct values (binary). */
  def thetaSketchAgg(item: Column, lgK: Int = 12): Column = {
    checkLgK(lgK)
    call_function("theta_sketch_agg", item, lit(lgK))
  }

  /** Union of stored sketches — the rollup aggregate. */
  def thetaUnionAgg(sketch: Column, lgK: Int = 12): Column = {
    checkLgK(lgK)
    call_function("theta_union_agg", sketch, lit(lgK))
  }

  /** Distinct-count estimate of a sketch. */
  def thetaEstimate(sketch: Column): Column =
    call_function("theta_estimate", sketch)

  /** Lower / upper confidence bound at `numStdDev` ∈ {1,2,3}. */
  def thetaLb(sketch: Column, numStdDev: Int = 2): Column =
    call_function("theta_lb", sketch, lit(numStdDev))
  def thetaUb(sketch: Column, numStdDev: Int = 2): Column =
    call_function("theta_ub", sketch, lit(numStdDev))

  /** A ∩ B as a sketch (compose freely before estimating). */
  def thetaIntersect(a: Column, b: Column): Column =
    call_function("theta_intersect", a, b)

  /** A \ B as a sketch. */
  def thetaANotB(a: Column, b: Column): Column =
    call_function("theta_anotb", a, b)

  /** A ∪ B as a sketch. */
  def thetaUnionPair(a: Column, b: Column): Column =
    call_function("theta_union_pair", a, b)
}

/** `theta_sketch_agg(item, lgK)` — build one theta sketch per group.
  * The buffer is a live Union (object-hash aggregation; serialized
  * compact only at spill/shuffle). */
case class ThetaSketchAgg(
    left: Expression,
    right: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with BinaryLike[Expression] {

  private lazy val lgK: Int = {
    val k = right.eval().asInstanceOf[Number].intValue()
    ThetaSketch.checkLgK(k)
    k
  }

  override def prettyName: String = "theta_sketch_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Union = ThetaSketch.newUnion(lgK)

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = left.eval(input)
    if (v != null) ThetaSketch.updateWith(buffer, v)
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any =
    buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = ThetaSketch.newUnion(lgK)
    u.union(ThetaSketch.fromBytes(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaSketchAgg =
    copy(left = newLeft, right = newRight)
}

/** `theta_union_agg(sketch, lgK)` — union stored sketches into a
  * coarser rollup (the q_hll_merge pattern, theta-flavored). */
case class ThetaUnionAgg(
    left: Expression,
    right: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with BinaryLike[Expression] {

  private lazy val lgK: Int = {
    val k = right.eval().asInstanceOf[Number].intValue()
    ThetaSketch.checkLgK(k)
    k
  }

  override def prettyName: String = "theta_union_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Union = ThetaSketch.newUnion(lgK)

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = left.eval(input)
    if (v != null)
      buffer.union(ThetaSketch.fromBytes(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any =
    buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = ThetaSketch.newUnion(lgK)
    u.union(ThetaSketch.fromBytes(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaUnionAgg =
    copy(left = newLeft, right = newRight)
}

/** `theta_estimate(sketch)` — distinct-count estimate (exact below
  * the sketch's nominal capacity). Runs on aggregated rows only. */
case class ThetaEstimate(child: Expression)
  extends Expression with UnaryLike[Expression] with CodegenFallback {

  override def prettyName: String = "theta_estimate"
  override def nullable: Boolean = child.nullable
  override def dataType: DataType = DoubleType

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else ThetaSketch.fromBytes(v.asInstanceOf[Array[Byte]]).getEstimate
  }

  override protected def withNewChildInternal(
      newChild: Expression): ThetaEstimate = copy(child = newChild)
}

/** `theta_lb/theta_ub(sketch, numStdDev)` — the sketch's own
  * confidence bounds on the distinct count. */
case class ThetaBound(child: Expression, numStdDev: Int, upper: Boolean)
  extends Expression with UnaryLike[Expression] with CodegenFallback {

  require(numStdDev >= 1 && numStdDev <= 3,
    s"theta bound numStdDev must be 1..3; got $numStdDev")

  override def prettyName: String = if (upper) "theta_ub" else "theta_lb"
  override def nullable: Boolean = child.nullable
  override def dataType: DataType = DoubleType

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else {
      val sk = ThetaSketch.fromBytes(v.asInstanceOf[Array[Byte]])
      if (upper) sk.getUpperBound(numStdDev) else sk.getLowerBound(numStdDev)
    }
  }

  override protected def withNewChildInternal(
      newChild: Expression): ThetaBound = copy(child = newChild)
}

object ThetaSetOp {
  sealed trait Op { def name: String }
  case object Intersect extends Op { val name = "theta_intersect" }
  case object ANotB extends Op { val name = "theta_anotb" }
  case object UnionPair extends Op { val name = "theta_union_pair" }
}

/** Binary set algebra over two stored sketches → a new sketch, so
  * expressions compose (`estimate(intersect(a, union(b, c)))`). */
case class ThetaSetOp(left: Expression, right: Expression,
    op: ThetaSetOp.Op)
  extends Expression with BinaryLike[Expression] with CodegenFallback {

  override def prettyName: String = op.name
  override def nullable: Boolean = left.nullable || right.nullable
  override def dataType: DataType = BinaryType

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null || b == null) return null
    val sa = ThetaSketch.fromBytes(a.asInstanceOf[Array[Byte]])
    val sb = ThetaSketch.fromBytes(b.asInstanceOf[Array[Byte]])
    val builder = SetOperation.builder()
    val res: CompactSketch = op match {
      case ThetaSetOp.Intersect => builder.buildIntersection()
        .intersect(sa, sb)
      case ThetaSetOp.ANotB => builder.buildANotB().aNotB(sa, sb)
      case ThetaSetOp.UnionPair => builder.buildUnion().union(sa, sb)
    }
    res.toByteArray
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaSetOp =
    copy(left = newLeft, right = newRight)
}
