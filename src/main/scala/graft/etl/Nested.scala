package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Array-of-struct flattening — the reference's signature Silver
  * transform (reference: transform/clean_transform.py:78-113):
  * `genres[].name` → pipe-joined string, `credits.crew` filtered by
  * `job == "Director"` → first element's name, `size()` cast/crew
  * counts.
  *
  * Everything is `from_json` + array higher-order functions
  * (`transform`/`filter`/`array_join`/`get`) — per-row expressions, no
  * explode, no shuffle: flattening a nested column at 100 TB stays a
  * single narrow pass with column pruning intact.
  */
object Nested {

  /** Parse a JSON string column against a declared DDL schema (the
    * reference declares Bronze schemas in src/schemas.py and parses
    * nested payloads against them). Malformed rows yield null structs —
    * route them with [[Validate]] rules. */
  def parseJson(c: Column, ddl: String): Column =
    from_json(c, StructType.fromDDL(ddl))

  /** `arr[].field` joined into one delimited string (reference:
    * clean_transform.py:88-95 — `genres[].name` → "Action|Drama").
    * Null array → null; empty array → empty string. */
  def joinField(arr: Column, field: String, sep: String = "|"): Column =
    array_join(transform(arr, x => x.getField(field)), sep)

  /** First array element matching `pred`, or null when none match
    * (reference: clean_transform.py:97-105 — first crew member with
    * `job == "Director"`). `get` (not `element_at`) so an empty filter
    * result is null under ANSI mode rather than an error. */
  def firstWhere(arr: Column, pred: Column => Column): Column =
    get(filter(arr, pred), lit(0))

  /** Field of the first matching element (the director-name pattern). */
  def fieldOfFirstWhere(arr: Column, pred: Column => Column, field: String): Column =
    firstWhere(arr, pred).getField(field)

  /** Element count with null → 0 (reference: clean_transform.py:107-113
    * `size()` cast/crew counts; `size(null)` is -1 or null depending on
    * legacy flags, so normalize explicitly). */
  def countOf(arr: Column): Column =
    when(arr.isNotNull, size(arr)).otherwise(lit(0)).cast("long")
}
