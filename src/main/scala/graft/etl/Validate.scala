package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** Record validation with valid/rejected routing.
  *
  * Re-expresses the reference's ingestion-time validation
  * (reference: ingestion/fetch_movies.py:67-105 — required fields,
  * API-error detection, valid vs rejected record routing) as a
  * rule-based, single-pass operator: each rule is a named predicate
  * that must hold; the first failing rule names the rejection reason.
  */
object Validate {

  /** A validation rule: `name` is recorded as the rejection reason when
    * `valid` evaluates false (or null). */
  final case class Rule(name: String, valid: Column)

  /** Adds `reject_reason` (null ⇒ valid). One narrow map, codegen'd —
    * no shuffle, applies at 100 TB as a streaming pass. */
  def withRejectReason(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val reason = rules.foldRight(lit(null).cast("string")) { (r, acc) =>
      when(!coalesce(r.valid, lit(false)), lit(r.name)).otherwise(acc)
    }
    df.withColumn("reject_reason", reason)
  }

  /** Valid records only (the reference's "valid" routing). */
  def valid(df: DataFrame, rules: Seq[Rule]): DataFrame =
    withRejectReason(df, rules).filter(col("reject_reason").isNull).drop("reject_reason")

  /** Rejected records with their first failing rule (the reference's
    * "rejected" routing with rejection reasons). */
  def rejected(df: DataFrame, rules: Seq[Rule]): DataFrame =
    withRejectReason(df, rules).filter(col("reject_reason").isNotNull)
}

/** Declared-schema validation (reference: src/schemas.py validate_schema):
  * structural diff of an actual DataFrame schema against an expected
  * StructType. Driver-side metadata only — touches no data.
  */
object SchemaCheck {

  final case class Mismatch(field: String, problem: String)

  /** Fields missing, type-mismatched, or unexpectedly nullable relative
    * to `expected`. Extra actual fields are reported too (the reference
    * rejects schema drift in either direction). */
  def diff(actual: StructType, expected: StructType): Seq[Mismatch] = {
    val actualByName = actual.fields.map(f => f.name -> f).toMap
    val expectedNames = expected.fields.map(_.name).toSet
    val missingOrWrong = expected.fields.flatMap { ef =>
      actualByName.get(ef.name) match {
        case None => Some(Mismatch(ef.name, "missing"))
        case Some(af) if af.dataType != ef.dataType =>
          Some(Mismatch(ef.name, s"type ${af.dataType.simpleString} != expected ${ef.dataType.simpleString}"))
        case Some(af) if af.nullable && !ef.nullable =>
          Some(Mismatch(ef.name, "nullable but expected non-nullable"))
        case _ => None
      }
    }
    val extra = actual.fields.collect {
      case StructField(name, _, _, _) if !expectedNames.contains(name) =>
        Mismatch(name, "unexpected")
    }
    (missingOrWrong ++ extra).toSeq
  }

  def conforms(actual: StructType, expected: StructType): Boolean =
    diff(actual, expected).isEmpty
}
