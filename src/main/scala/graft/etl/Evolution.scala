package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema evolution: conform heterogeneous batches to a target schema.
  *
  * A long-lived Bronze/Silver table accumulates files written under
  * different schema generations (new columns appear, ints become longs
  * as ids outgrow 32 bits, structs gain fields). Readers need ONE
  * declared schema; this operator reconciles each batch to it:
  *
  *  - columns missing from the batch → typed nulls,
  *  - extra columns in the batch → dropped,
  *  - type mismatches → cast ONLY along lossless widenings
  *    (byte→short→int→long, int→double, float→double, date→timestamp,
  *    decimal precision growth); anything lossy throws with the exact
  *    field path — silent narrowing is how a 100 TB table corrupts,
  *  - struct fields and array elements recurse with the same rules.
  *
  * Pairs with `spark.read.option("mergeSchema", true)` ([[readEvolved]])
  * for parquet directories that already hold mixed generations; for
  * single-generation batches, [[conform]] alone avoids the mergeSchema
  * footer-union cost (at 100 TB, reading N file footers twice matters —
  * prefer a declared target and per-batch conform).
  *
  * Reference origin: the reference declares per-stage StructTypes
  * (src/schemas.py) but crashes on drift; this is the at-scale upgrade.
  */
object Evolution {

  /** True when `from` → `to` loses no information. */
  def canWiden(from: DataType, to: DataType): Boolean = (from, to) match {
    case (a, b) if a == b => true
    case (ByteType, ShortType | IntegerType | LongType | FloatType | DoubleType) => true
    case (ShortType, IntegerType | LongType | FloatType | DoubleType) => true
    case (IntegerType, LongType | DoubleType) => true // int→float would drop bits (2^31 > 2^24)
    case (FloatType, DoubleType) => true
    case (DateType, TimestampType) => true
    case (a: DecimalType, b: DecimalType) =>
      b.scale >= a.scale && (b.precision - b.scale) >= (a.precision - a.scale)
    case _ => false
  }

  private def conformColumn(c: Column, from: DataType, to: DataType, path: String): Column =
    (from, to) match {
      case (a, b) if a == b => c
      case (a: StructType, b: StructType) =>
        val fields = b.fields.map { tf =>
          a.fields.find(_.name == tf.name) match {
            case Some(sf) =>
              conformColumn(c.getField(sf.name), sf.dataType, tf.dataType, s"$path.${tf.name}").as(tf.name)
            case None => lit(null).cast(tf.dataType).as(tf.name)
          }
        }
        // a null struct must stay null, not become a struct of nulls
        when(c.isNull, lit(null).cast(b)).otherwise(struct(fields: _*))
      case (ArrayType(ae, _), ArrayType(be, bn)) =>
        val conformed = transform(c, e => conformColumn(e, ae, be, s"$path[]"))
        conformed.cast(ArrayType(be, bn))
      case (a, b) if canWiden(a, b) => c.cast(b)
      case (a, b) =>
        throw new IllegalArgumentException(
          s"cannot conform $path: $a → $b is not a lossless widening")
    }

  /** Conform `df` to `target` (see object doc for the rules). Pure
    * narrow map — the cast/restructure work happens inside the scan's
    * projection at any scale. */
  def conform(df: DataFrame, target: StructType): DataFrame = {
    val source = df.schema
    val cols = target.fields.map { tf =>
      source.fields.find(_.name == tf.name) match {
        case Some(sf) => conformColumn(col(sf.name), sf.dataType, tf.dataType, tf.name).as(tf.name)
        case None     => lit(null).cast(tf.dataType).as(tf.name)
      }
    }
    df.select(cols: _*)
  }

  /** One field-level difference between two schema generations.
    * `kind` ∈ added | removed | widened | incompatible; `from`/`to`
    * are absent for added/removed. Nullability differences are ignored
    * (Spark treats nullability as advisory, not part of the contract). */
  final case class SchemaChange(
      path: String, kind: String, from: Option[DataType], to: Option[DataType])

  /** Structural diff between two schema generations — the introspection
    * half of [[conform]]: BEFORE conforming a new generation (or after
    * an upstream regeneration, the round-8 events.ts lesson), report
    * exactly what moved and whether each move is safe. `widened`
    * changes are what [[conform]] casts silently; `incompatible` ones
    * are what it throws on — a pipeline can gate on
    * `schemaDiff(old, new).exists(_.kind == "incompatible")` and route
    * the generation to quarantine instead of discovering the drift as
    * N scattered analysis errors downstream. Struct fields, array
    * elements, and map values recurse; order changes are not drift. */
  def schemaDiff(from: StructType, to: StructType): Seq[SchemaChange] = {
    def diffType(f: DataType, t: DataType, path: String): Seq[SchemaChange] = (f, t) match {
      case (a, b) if a == b => Nil
      case (a: StructType, b: StructType) => diffStruct(a, b, path)
      case (ArrayType(ae, _), ArrayType(be, _)) => diffType(ae, be, s"$path[]")
      case (MapType(ak, av, _), MapType(bk, bv, _)) =>
        // a key-type change is never safe (lookups silently miss)
        val keys =
          if (ak == bk) Nil
          else Seq(SchemaChange(s"$path{key}", "incompatible", Some(ak), Some(bk)))
        keys ++ diffType(av, bv, s"$path{value}")
      case (a, b) if canWiden(a, b) => Seq(SchemaChange(path, "widened", Some(a), Some(b)))
      case (a, b) => Seq(SchemaChange(path, "incompatible", Some(a), Some(b)))
    }
    def diffStruct(a: StructType, b: StructType, prefix: String): Seq[SchemaChange] = {
      def at(name: String) = if (prefix.isEmpty) name else s"$prefix.$name"
      val aByName = a.fields.map(f => f.name -> f).toMap
      val bByName = b.fields.map(f => f.name -> f).toMap
      val removed = a.fields.filterNot(f => bByName.contains(f.name))
        .map(f => SchemaChange(at(f.name), "removed", Some(f.dataType), None))
      val added = b.fields.filterNot(f => aByName.contains(f.name))
        .map(f => SchemaChange(at(f.name), "added", None, Some(f.dataType)))
      val changed = a.fields.filter(f => bByName.contains(f.name))
        .flatMap(f => diffType(f.dataType, bByName(f.name).dataType, at(f.name)))
      (removed ++ added ++ changed).toSeq
    }
    diffStruct(from, to, "")
  }

  /** Read a parquet directory holding mixed schema generations,
    * reconciled to `target` AT THE SCAN: reading with a declared schema
    * nulls columns a generation lacks, prunes columns the target
    * dropped, and (Spark 4 parquet reader) widens numeric types per
    * file — all without `mergeSchema`'s union-every-file-footer
    * pre-pass, which both costs an extra distributed metadata job at
    * 100 TB AND hard-fails on int→long generation drift
    * (CANNOT_MERGE_INCOMPATIBLE_DATA_TYPE). A generation whose type
    * genuinely conflicts with the target (e.g. string where the target
    * says long) still fails loudly at scan time, per file. */
  def readEvolved(spark: SparkSession, path: String, target: StructType): DataFrame =
    spark.read.schema(target).parquet(path)
}
