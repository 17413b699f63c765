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
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Mergeable MEMBERSHIP sketch aggregates (Spark's own `spark-sketch`
  * BloomFilter) — the set-membership member of the sketch family next
  * to HLL (distinct counts), KLL (quantiles), and Theta (set algebra).
  *
  * The day-2 dedup use: a 100 TB corpus's fingerprint index compresses
  * to a few hundred MB of bloom state (vs TBs of parquet digests);
  * membership against it is then a ZERO-JOIN narrow map over the new
  * batch, and the precise anti-join only has to verify the bloom
  * POSITIVES (no false negatives ⇒ bloom-negative rows are
  * definitely novel). Per-slice filters union exactly
  * (`mergeInPlace` is a bitwise OR), so fleet-scale state builds as
  * independent slice jobs — the D40 mergeable-card discipline for
  * membership.
  */
case class BloomFilterAgg(
    child: Expression,
    expectedItems: Long,
    fpp: Double,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] with UnaryLike[Expression] {

  require(expectedItems > 0, s"expectedItems must be positive, got $expectedItems")
  require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0, 1), got $fpp")

  override def prettyName: String = "graft_bloom_agg"
  override def dataType: DataType = BinaryType
  // an empty group's filter is meaningful state (contains nothing), so
  // unlike the estimate sketches this aggregate never returns null
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string, long, or binary input, got ${t.simpleString}")
  }
  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)
  override def update(buffer: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) v match {
      case s: UTF8String => buffer.putBinary(s.getBytes)
      case l: java.lang.Long => buffer.putLong(l.longValue())
      case b: Array[Byte] => buffer.putBinary(b)
    }
    buffer
  }
  override def merge(buffer: BloomFilter, other: BloomFilter): BloomFilter = {
    buffer.mergeInPlace(other)
    buffer
  }
  override def eval(buffer: BloomFilter): Any = BloomSketch.toBytes(buffer)
  override def serialize(buffer: BloomFilter): Array[Byte] = BloomSketch.toBytes(buffer)
  override def deserialize(bytes: Array[Byte]): BloomFilter = BloomSketch.fromBytes(bytes)
  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomFilterAgg =
    copy(child = newChild)
}

/** Union of serialized bloom filters (binary column → merged filter).
  * All inputs MUST share (expectedItems, fpp) — bitwise OR requires
  * identical bit geometry; `mergeInPlace` throws on mismatch rather
  * than degrade silently. */
case class BloomUnionAgg(
    child: Expression,
    expectedItems: Long,
    fpp: Double,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] with UnaryLike[Expression] {

  require(expectedItems > 0, s"expectedItems must be positive, got $expectedItems")
  require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0, 1), got $fpp")

  override def prettyName: String = "graft_bloom_union_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary bloom-filter input, got ${t.simpleString}")
  }
  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)
  override def update(buffer: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) buffer.mergeInPlace(BloomSketch.fromBytes(v.asInstanceOf[Array[Byte]]))
    buffer
  }
  override def merge(buffer: BloomFilter, other: BloomFilter): BloomFilter = {
    buffer.mergeInPlace(other)
    buffer
  }
  override def eval(buffer: BloomFilter): Any = BloomSketch.toBytes(buffer)
  override def serialize(buffer: BloomFilter): Array[Byte] = BloomSketch.toBytes(buffer)
  override def deserialize(bytes: Array[Byte]): BloomFilter = BloomSketch.fromBytes(bytes)
  override def withNewMutableAggBufferOffset(newOffset: Int): BloomUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomUnionAgg =
    copy(child = newChild)
}

/** Membership probe against a FIXED serialized filter (the bytes ride
  * the plan like a literal model — the d32 classifier-weights
  * discipline): deserialized once per task, each row costs the
  * filter's k hash probes, zero joins. No false negatives; false
  * positives at the filter's fpp. Null input → null (membership of
  * nothing is unknown, matching SQL three-valued logic). */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def prettyName: String = "graft_bloom_might_contain"
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string, long, or binary input, got ${t.simpleString}")
  }
  // filter state can be hundreds of MB at corpus scale — never in plan strings
  override def stringArgs: Iterator[Any] = Iterator(child, bloomBytes.length)

  @transient private lazy val bloom: BloomFilter = BloomSketch.fromBytes(bloomBytes)

  /** Public for the generated code path. */
  def probe(v: Any): Boolean = v match {
    case s: UTF8String => bloom.mightContainBinary(s.getBytes)
    case l: java.lang.Long => bloom.mightContainLong(l.longValue())
    case b: Array[Byte] => bloom.mightContainBinary(b)
  }

  override def nullSafeEval(v: Any): Any = probe(v)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ref = ctx.addReferenceObj("bloomProbe", this, classOf[BloomMightContain].getName)
      s"${ev.value} = $ref.probe($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** [[BloomMightContain]] with the filter behind a Spark broadcast:
  * the expression serializes as a thin handle and each EXECUTOR fetches
  * the bytes once — the carrier for corpus-scale filters (a 10^9-digest
  * index at 1% fpp is ~1.2 GB; task-serialized bytes would ship per
  * task). Same probe semantics. */
case class BloomMightContainBc(
    child: Expression,
    bc: org.apache.spark.broadcast.Broadcast[Array[Byte]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def prettyName: String = "graft_bloom_might_contain_bc"
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string, long, or binary input, got ${t.simpleString}")
  }
  override def stringArgs: Iterator[Any] = Iterator(child, bc.id)

  @transient private lazy val bloom: BloomFilter = BloomSketch.fromBytes(bc.value)

  /** Public for the generated code path. */
  def probe(v: Any): Boolean = v match {
    case s: UTF8String => bloom.mightContainBinary(s.getBytes)
    case l: java.lang.Long => bloom.mightContainLong(l.longValue())
    case b: Array[Byte] => bloom.mightContainBinary(b)
  }

  override def nullSafeEval(v: Any): Any = probe(v)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ref = ctx.addReferenceObj("bloomProbeBc", this, classOf[BloomMightContainBc].getName)
      s"${ev.value} = $ref.probe($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomSketch {
  private[expressions] def toBytes(bf: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }
  private[expressions] def fromBytes(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  /** Mergeable bloom state of a column: binary, per group. Strings are
    * inserted as their UTF-8 bytes (probe with the same type). */
  def bloomAgg(value: Column, expectedItems: Long, fpp: Double): Column =
    ColumnBridge.column(
      BloomFilterAgg(ColumnBridge.expression(value), expectedItems, fpp)
        .toAggregateExpression())

  /** Union of serialized bloom states (same (expectedItems, fpp)). */
  def bloomUnionAgg(sketch: Column, expectedItems: Long, fpp: Double): Column =
    ColumnBridge.column(
      BloomUnionAgg(ColumnBridge.expression(sketch), expectedItems, fpp)
        .toAggregateExpression())

  /** Membership probe against fixed filter bytes — zero-join narrow
    * map. Bytes ride task serialization: right for filters up to a few
    * tens of MB; beyond that use the broadcast overload. */
  def mightContain(bloomBytes: Array[Byte], value: Column): Column =
    ColumnBridge.column(BloomMightContain(ColumnBridge.expression(value), bloomBytes))

  /** Membership probe with executor-side broadcast state — the carrier
    * for corpus-scale filters (fetched once per executor, not per
    * task). */
  def mightContain(bc: org.apache.spark.broadcast.Broadcast[Array[Byte]],
                   value: Column): Column =
    ColumnBridge.column(BloomMightContainBc(ColumnBridge.expression(value), bc))

  /** Driver-side probe of serialized filter bytes — same UTF-8-bytes
    * insert/probe contract as the expressions (for file-list-bounded
    * sidecar scans like [[graft.sources.BloomIndex]], where the
    * decision happens on the driver before any scan is planned). */
  def mightContainValue(bloomBytes: Array[Byte], value: String): Boolean =
    fromBytes(bloomBytes).mightContainBinary(
      org.apache.spark.unsafe.types.UTF8String.fromString(value).getBytes)

  /** Build filter bytes over a whole column (one aggregate, one row
    * collected — bounded driver state like the classifier weights). */
  def build(df: org.apache.spark.sql.DataFrame, value: Column,
            expectedItems: Long, fpp: Double): Array[Byte] =
    df.agg(bloomAgg(value, expectedItems, fpp).as("bf"))
      .head().getAs[Array[Byte]](0)
}
