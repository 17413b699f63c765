package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Gear rolling-hash tables and the chunking loop shared by the
  * expression and its tests. The gear table is 256 pseudo-random longs
  * from splitmix64 under a FIXED seed — part of the chunking contract
  * (two clusters chunking the same bytes MUST agree), never
  * regenerated per session. */
object Gear {
  /** splitmix64-derived gear table, seed fixed by contract. */
  val Table: Array[Long] = {
    var x = 0x9E3779B97F4A7C15L
    Array.fill(256) {
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
  }
}

/** Native one-pass content-defined chunker — the production form of
  * [[graft.dedup.Cdc.cdcChunks]]'s windowed-md5 rule (D83): a Gear
  * rolling hash (`h = (h << 1) + G[byte]`, the FastCDC recurrence)
  * tested against a `2^avgBits − 1` mask, with REAL min/max chunk
  * guards — the guards a declarative oracle-mirrorable rule must forgo
  * (each boundary depends on the previous ACCEPTED boundary, a
  * sequential dependency that is free here and unreachable in SQL).
  *
  * O(n) per document — one table lookup + shift per byte, vs the
  * windowed form's O(window·n) md5 calls — and byte-oriented: accepts
  * STRING (UTF-8 bytes) or BINARY input unchanged, so the same operator
  * chunks text, images, and checkpoints. Output is
  * `array<struct<offset int, len int, hash string>>` with 0-BASED BYTE
  * offsets (the windowed form's offsets are 1-based characters — the
  * two chunk tables are deliberately not mixable) and md5-hex chunk
  * hashes; chunks tile the input exactly. Guards: no boundary fires
  * before `minLen` bytes of the current chunk; a boundary is forced at
  * `maxLen`. Null input → null; empty input → empty array.
  */
case class GearChunks(child: Expression, minLen: Int, avgBits: Int, maxLen: Int)
    extends UnaryExpression {

  require(minLen >= 1, s"minLen must be >= 1, got $minLen")
  require(avgBits >= 1 && avgBits <= 48, s"avgBits must be in [1, 48], got $avgBits")
  require(maxLen >= minLen, s"maxLen ($maxLen) must be >= minLen ($minLen)")

  private val mask = (1L << avgBits) - 1

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string or binary input, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("offset", IntegerType, nullable = false),
    StructField("len", IntegerType, nullable = false),
    StructField("hash", StringType, nullable = false))), containsNull = false)

  override def prettyName: String = "graft_gear_chunks"

  /** The rolling sweep; public so generated code makes one virtual
    * call. */
  def chunk(input: Any): ArrayData = {
    val bytes = input match {
      case s: UTF8String => s.getBytes
      case b: Array[Byte] => b
    }
    val n = bytes.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new scala.collection.mutable.ArrayBuffer[Any]
    var start = 0
    var h = 0L
    var i = 0
    while (i < n) {
      h = (h << 1) + Gear.Table(bytes(i) & 0xFF)
      val clen = i - start + 1
      if ((clen >= minLen && (h & mask) == 0L) || clen == maxLen || i == n - 1) {
        md.reset()
        md.update(bytes, start, clen)
        val hex = md.digest().map("%02x".format(_)).mkString
        out += new GenericInternalRow(
          Array[Any](start, clen, UTF8String.fromString(hex)))
        start = i + 1
        h = 0L
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(v: Any): Any = chunk(v)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("gearChunks", this, classOf[GearChunks].getName)
      s"$ref.chunk($c)"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcExpressions {
  /** Column API for [[GearChunks]]. */
  def gearChunks(input: Column, minLen: Int = 64, avgBits: Int = 8,
      maxLen: Int = 1024): Column =
    ColumnBridge.column(GearChunks(
      ColumnBridge.expression(input), minLen, avgBits, maxLen))
}
