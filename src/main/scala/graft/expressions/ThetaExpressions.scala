package graft.expressions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketches, Union}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable Theta sketch aggregates (Apache DataSketches) — distinct
  * counting WITH set algebra. HLL sketches ([[graft.operators.Sketches]]
  * C8c) union losslessly but cannot intersect: "distinct users who did
  * A AND B" needs Theta's retained-hash-set representation, where
  * intersection and difference are defined operations with bounded
  * error. Same state pattern as C8c/C8d: per-partition sketches update
  * locally, compact serialized sketches cross the shuffle, persisted
  * (group, bucket) sketches answer set-algebra questions later without
  * rescanning raw data.
  *
  * Below the nominal entry count (2^lgK, default 4096) a Theta sketch
  * is in EXACT mode — estimates are true distinct counts; above it,
  * sampling starts and the standard bounds apply.
  */
abstract class ThetaAggBase
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  def lgK: Int

  protected final def newUnion(): Union =
    SetOperation.builder().setNominalEntries(1 << lgK).buildUnion()

  final override def dataType: DataType = BinaryType
  final override def nullable: Boolean = true
  final override def createAggregationBuffer(): Union = newUnion()
  final override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }
  final override def eval(buffer: Union): Any = {
    val r = buffer.getResult
    if (r.isEmpty) null else r.toByteArray
  }
  final override def serialize(buffer: Union): Array[Byte] = buffer.getResult.toByteArray
  final override def deserialize(bytes: Array[Byte]): Union = {
    val u = newUnion()
    u.union(Sketches.wrapSketch(Memory.wrap(bytes)))
    u
  }
}

/** Sketch raw values (string or long — each hashed in its NATIVE
  * domain, so sketches only intersect meaningfully when built from the
  * same input type). */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends ThetaAggBase {

  require(lgK >= 4 && lgK <= 26, s"lgK must be in [4, 26], got $lgK")

  override def prettyName: String = "graft_theta_sketch_agg"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string or long input, got ${t.simpleString}")
  }
  override def update(buffer: Union, input: InternalRow): Union = {
    child.eval(input) match {
      case null => ()
      case s: UTF8String => buffer.update(s.toString)
      case l: java.lang.Long => buffer.update(l.longValue())
      // strings and longs hash into disjoint domains; silently
      // stringifying an unexpected type would make intersections
      // against typed sketches return 0 instead of failing loudly
      case other => throw new IllegalStateException(
        s"$prettyName: unexpected input ${other.getClass.getName} (type check admits string|long)")
    }
    buffer
  }
  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaSketchAgg =
    copy(child = newChild)
}

/** Union of serialized Theta sketches (binary column → merged sketch). */
case class ThetaUnionAgg(
    child: Expression,
    lgK: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends ThetaAggBase {

  require(lgK >= 4 && lgK <= 26, s"lgK must be in [4, 26], got $lgK")

  override def prettyName: String = "graft_theta_union_agg"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary Theta sketch input, got ${t.simpleString}")
  }
  override def update(buffer: Union, input: InternalRow): Union = {
    child.eval(input) match {
      case null => ()
      case b: Array[Byte] => buffer.union(Sketches.wrapSketch(Memory.wrap(b)))
    }
    buffer
  }
  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaUnionAgg =
    copy(child = newChild)
}

/** Set-operation estimate over two serialized Theta sketches:
  * `op` ∈ {union, intersect, diff} (diff = left \ right), rounded to a
  * long. `lgK` bounds the union's retained entries and must be ≥ the
  * input sketches' lgK to preserve their accuracy (intersection and
  * difference inherit precision from their inputs and ignore it).
  * CodegenFallback is deliberate — this evaluates once per (usually
  * single) result row after aggregation, never per scan row. */
case class ThetaSetEstimate(left: Expression, right: Expression, op: String, lgK: Int)
  extends BinaryExpression with CodegenFallback with BinaryLike[Expression] {

  require(ThetaSetEstimate.Ops.contains(op), s"op must be one of ${ThetaSetEstimate.Ops}, got $op")
  require(lgK >= 4 && lgK <= 26, s"lgK must be in [4, 26], got $lgK")

  override def prettyName: String = s"graft_theta_$op"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two binary Theta sketches, got (${l.simpleString}, ${r.simpleString})")
  }
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val sa = Sketches.wrapSketch(Memory.wrap(a.asInstanceOf[Array[Byte]]))
    val sb = Sketches.wrapSketch(Memory.wrap(b.asInstanceOf[Array[Byte]]))
    val est = op match {
      case "union" =>
        val u = SetOperation.builder().setNominalEntries(1 << lgK).buildUnion()
        u.union(sa); u.union(sb); u.getResult.getEstimate
      case "intersect" =>
        val i = SetOperation.builder().buildIntersection()
        i.intersect(sa); i.intersect(sb); i.getResult.getEstimate
      case "diff" =>
        SetOperation.builder().buildANotB().aNotB(sa, sb).getEstimate
    }
    math.round(est)
  }
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ThetaSetEstimate =
    copy(left = newLeft, right = newRight)
}

object ThetaSetEstimate {
  val Ops: Set[String] = Set("union", "intersect", "diff")
}

object ThetaExpressions {
  /** Default log2 nominal entries: 4096 retained hashes ≈ 1.6% RSE in
    * estimation mode; exact below 4096 distinct values. */
  val DefaultLgK = 12

  def thetaSketchAgg(value: Column, lgK: Int = DefaultLgK): Column =
    ColumnBridge.column(
      ThetaSketchAgg(ColumnBridge.expression(value), lgK).toAggregateExpression())

  def thetaUnionAgg(sketch: Column, lgK: Int = DefaultLgK): Column =
    ColumnBridge.column(
      ThetaUnionAgg(ColumnBridge.expression(sketch), lgK).toAggregateExpression())

  def thetaEstimate(op: String, a: Column, b: Column, lgK: Int = DefaultLgK): Column =
    ColumnBridge.column(
      ThetaSetEstimate(ColumnBridge.expression(a), ColumnBridge.expression(b), op, lgK))
}
