package graft.expressions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** Mergeable QUANTILE sketch aggregates (Apache DataSketches KLL) —
  * the percentile analogue of Spark's built-in `hll_sketch_agg`
  * family, which Spark does not expose for quantiles
  * (`percentile_approx`'s internal summary is not persistable state).
  *
  * A `TypedImperativeAggregate` carries the KLL sketch object through
  * the standard partial-aggregation protocol: per-partition sketches
  * update locally, serialized sketches cross the shuffle (a few KB
  * each, never raw rows), and merges happen on the reduce side — so a
  * sketch TABLE persisted per (group, bucket) answers any coarser
  * percentile rollup later without rescanning raw data. KLL merges are
  * order-dependent in their internal compaction (unlike HLL unions),
  * but every estimate — built in one pass or unioned from parts —
  * carries the same normalized rank-error bound for the same `k`.
  */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  require(k >= 8 && k <= 65535, s"KLL k must be in [8, 65535], got $k")

  override def prettyName: String = "graft_kll_sketch_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true // empty group → null, like built-in sketch aggs
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a double input (cast first), got ${t.simpleString}")
  }
  override def createAggregationBuffer(): KllDoublesSketch = KllDoublesSketch.newHeapInstance(k)
  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Double])
    buffer
  }
  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }
  override def eval(buffer: KllDoublesSketch): Any =
    if (buffer.isEmpty) null else buffer.toByteArray
  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))
  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
    copy(child = newChild)
}

/** Union of serialized KLL sketches (binary column → merged sketch).
  * All inputs should share `k`; merging a smaller-k sketch silently
  * degrades the result to that k (DataSketches semantics), same as
  * mixing lgK in HLL unions. */
case class KllUnionAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  require(k >= 8 && k <= 65535, s"KLL k must be in [8, 65535], got $k")

  override def prettyName: String = "graft_kll_union_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary KLL sketch input, got ${t.simpleString}")
  }
  override def createAggregationBuffer(): KllDoublesSketch = KllDoublesSketch.newHeapInstance(k)
  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      buffer.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buffer
  }
  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }
  override def eval(buffer: KllDoublesSketch): Any =
    if (buffer.isEmpty) null else buffer.toByteArray
  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))
  override def withNewMutableAggBufferOffset(newOffset: Int): KllUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllUnionAgg =
    copy(child = newChild)
}

/** Scalar quantile extraction from a serialized KLL sketch at rank
  * `right` ∈ [0,1]. CodegenFallback is deliberate: this evaluates once
  * per GROUP after aggregation, never inside a scan's hot loop, so the
  * one-row-at-a-time heapify costs nothing measurable (the staging
  * rule for interpreted expressions in hot paths does not apply). */
case class KllQuantile(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback with BinaryLike[Expression] {

  override def prettyName: String = "graft_kll_quantile"
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, DoubleType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (binary sketch, double rank), got (${l.simpleString}, ${r.simpleString})")
  }
  override protected def nullSafeEval(sk: Any, q: Any): Any =
    KllDoublesSketch.heapify(Memory.wrap(sk.asInstanceOf[Array[Byte]]))
      .getQuantile(q.asInstanceOf[Double])
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): KllQuantile =
    copy(left = newLeft, right = newRight)
}

object SketchExpressions {
  /** Default KLL k: normalized rank error ≈ 1.65% at 99% confidence,
    * sketches a few KB. */
  val DefaultK = 200

  /** Aggregate a double column into a serialized KLL quantile sketch. */
  def kllSketchAgg(value: Column, k: Int = DefaultK): Column =
    ColumnBridge.column(
      KllSketchAgg(ColumnBridge.expression(value), k).toAggregateExpression())

  /** Union serialized KLL sketches into one. */
  def kllUnionAgg(sketch: Column, k: Int = DefaultK): Column =
    ColumnBridge.column(
      KllUnionAgg(ColumnBridge.expression(sketch), k).toAggregateExpression())

  /** Quantile at rank `q` from a serialized sketch. */
  def kllQuantile(sketch: Column, q: Double): Column = {
    require(q >= 0.0 && q <= 1.0, s"rank must be in [0,1], got $q")
    ColumnBridge.column(
      KllQuantile(ColumnBridge.expression(sketch), Literal(q)))
  }
}
