package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Mergeable POINT-FREQUENCY sketch aggregates (Spark's own
  * `spark-sketch` CountMinSketch) — the "how often did THIS item occur"
  * member of the sketch family next to HLL (how many distinct), KLL
  * (quantiles), Theta (set algebra), frequent-items (which items are
  * hot), and Bloom (was it seen at all).
  *
  * The training-data use: per-slice token/URL/domain frequency state at
  * depth×width×8 bytes a slice (5×2048 ≈ 80 KB) instead of a
  * vocabulary-sized table; slices merge by elementwise counter ADD
  * (exact, order-independent), so fleet-scale state builds as
  * independent jobs and any probe answers from merged state without
  * rescanning — the C8c discipline for frequencies. Estimates
  * overcount only: exact ≤ estimate ≤ exact + ε·N with probability
  * 1−δ, ε = e/width, δ = e^−depth.
  */
case class CountMinAgg(
    child: Expression,
    depth: Int,
    width: Int,
    seed: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountMinSketch] with UnaryLike[Expression] {

  require(depth > 0 && width > 0, s"depth/width must be positive, got $depth x $width")

  override def prettyName: String = "graft_cm_agg"
  override def dataType: DataType = BinaryType
  // an empty group's sketch is meaningful state (all counters zero)
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string, long, or binary input, got ${t.simpleString}")
  }
  override def createAggregationBuffer(): CountMinSketch =
    CountMinSketch.create(depth, width, seed)
  override def update(buffer: CountMinSketch, input: InternalRow): CountMinSketch = {
    val v = child.eval(input)
    if (v != null) v match {
      case s: UTF8String => buffer.addBinary(s.getBytes)
      case l: java.lang.Long => buffer.addLong(l.longValue())
      case b: Array[Byte] => buffer.addBinary(b)
    }
    buffer
  }
  override def merge(buffer: CountMinSketch, other: CountMinSketch): CountMinSketch = {
    buffer.mergeInPlace(other)
    buffer
  }
  override def eval(buffer: CountMinSketch): Any = CountMin.toBytes(buffer)
  override def serialize(buffer: CountMinSketch): Array[Byte] = CountMin.toBytes(buffer)
  override def deserialize(bytes: Array[Byte]): CountMinSketch = CountMin.fromBytes(bytes)
  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountMinAgg =
    copy(child = newChild)
}

/** Merge of serialized count-min sketches (binary column → summed
  * counters). All inputs MUST share (depth, width, seed) — elementwise
  * addition requires identical geometry; `mergeInPlace` throws on
  * mismatch rather than degrade silently. */
case class CountMinUnionAgg(
    child: Expression,
    depth: Int,
    width: Int,
    seed: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountMinSketch] with UnaryLike[Expression] {

  require(depth > 0 && width > 0, s"depth/width must be positive, got $depth x $width")

  override def prettyName: String = "graft_cm_union_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary count-min input, got ${t.simpleString}")
  }
  override def createAggregationBuffer(): CountMinSketch =
    CountMinSketch.create(depth, width, seed)
  override def update(buffer: CountMinSketch, input: InternalRow): CountMinSketch = {
    val v = child.eval(input)
    if (v != null) buffer.mergeInPlace(CountMin.fromBytes(v.asInstanceOf[Array[Byte]]))
    buffer
  }
  override def merge(buffer: CountMinSketch, other: CountMinSketch): CountMinSketch = {
    buffer.mergeInPlace(other)
    buffer
  }
  override def eval(buffer: CountMinSketch): Any = CountMin.toBytes(buffer)
  override def serialize(buffer: CountMinSketch): Array[Byte] = CountMin.toBytes(buffer)
  override def deserialize(bytes: Array[Byte]): CountMinSketch = CountMin.fromBytes(bytes)
  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountMinUnionAgg =
    copy(child = newChild)
}

/** Frequency probe against FIXED sketch bytes (the bytes ride the plan
  * like a literal model — the Bloom-probe discipline; a CM sketch is
  * depth×width×8 B, ~80 KB at the defaults, so task serialization is
  * fine). Deserialized once per task; each row costs `depth` hash
  * probes, zero joins. Null input → null. */
case class CountMinEstimate(child: Expression, cmBytes: Array[Byte])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def prettyName: String = "graft_cm_estimate"
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string, long, or binary input, got ${t.simpleString}")
  }
  override def stringArgs: Iterator[Any] = Iterator(child, cmBytes.length)

  @transient private lazy val cm: CountMinSketch = CountMin.fromBytes(cmBytes)

  /** Public for the generated code path. */
  def probe(v: Any): Long = v match {
    case s: UTF8String => cm.estimateCount(s.getBytes)
    case l: java.lang.Long => cm.estimateCount(l)
    case b: Array[Byte] => cm.estimateCount(b)
  }

  override def nullSafeEval(v: Any): Any = probe(v)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ref = ctx.addReferenceObj("cmProbe", this, classOf[CountMinEstimate].getName)
      s"${ev.value} = $ref.probe($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CountMin {

  /** 5 rows ⇒ δ = e^−5 < 0.7% per probe. */
  val DefaultDepth = 5
  /** 2048 counters/row ⇒ ε = e/2048 ≈ 0.13% of total insertions. */
  val DefaultWidth = 2048
  val DefaultSeed = 42

  private[expressions] def toBytes(cm: CountMinSketch): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    cm.writeTo(out)
    out.toByteArray
  }
  private[expressions] def fromBytes(bytes: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(bytes))

  /** Mergeable count-min state of a column: binary, per group. Strings
    * are inserted as their UTF-8 bytes (probe with the same type). */
  def cmAgg(value: Column, depth: Int = DefaultDepth, width: Int = DefaultWidth,
            seed: Int = DefaultSeed): Column =
    ColumnBridge.column(
      CountMinAgg(ColumnBridge.expression(value), depth, width, seed)
        .toAggregateExpression())

  /** Merge of serialized count-min states (same (depth, width, seed)). */
  def cmUnionAgg(sketch: Column, depth: Int = DefaultDepth, width: Int = DefaultWidth,
                 seed: Int = DefaultSeed): Column =
    ColumnBridge.column(
      CountMinUnionAgg(ColumnBridge.expression(sketch), depth, width, seed)
        .toAggregateExpression())

  /** Frequency estimate against fixed sketch bytes — zero-join narrow
    * map; exact ≤ estimate always, ≤ exact + ε·N with prob 1−δ. */
  def estimate(cmBytes: Array[Byte], value: Column): Column =
    ColumnBridge.column(CountMinEstimate(ColumnBridge.expression(value), cmBytes))

  /** Build sketch bytes over a whole column (one aggregate, one row
    * collected — bounded driver state like the bloom build). */
  def build(df: org.apache.spark.sql.DataFrame, value: Column,
            depth: Int = DefaultDepth, width: Int = DefaultWidth,
            seed: Int = DefaultSeed): Array[Byte] =
    df.agg(cmAgg(value, depth, width, seed).as("cm"))
      .head().getAs[Array[Byte]](0)

  /** Total insertions recorded by serialized sketch bytes — the N in
    * the ε·N error bound, with no extra job. */
  def totalCount(cmBytes: Array[Byte]): Long = fromBytes(cmBytes).totalCount()
}
