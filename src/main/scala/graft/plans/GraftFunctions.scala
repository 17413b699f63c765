package graft.plans

import graft.expressions._
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, StringType}

/** SQL surface for graft's native expressions. Without this, `graft_dot`,
  * hyperplane signatures, and the KLL/Theta sketch aggregates are
  * Scala-API-only and a SQL-first user cannot reach them; registered
  * through the same `spark.sql.extensions=graft.plans.GraftExtensions`
  * hook that already carries the dot-product optimizer rule, they work
  * in `spark.sql(...)`, views, and thrift-server queries exactly like
  * built-ins.
  *
  * Config arguments (k, lgK, tables/bits/dims, set op) must be LITERALS
  * — they parameterize the expression itself (sketch size, plane count)
  * and cannot vary per row, mirroring how Spark's own
  * `approx_count_distinct` treats its precision argument.
  */
object GraftFunctions {

  type Builder = Seq[Expression] => Expression

  private def intArg(fn: String, arg: String, e: Expression): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got ${other.sql}")
  }

  private def dblArg(fn: String, arg: String, e: Expression): Double = e match {
    case Literal(v: Double, org.apache.spark.sql.types.DoubleType) => v
    case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be a numeric literal, got ${other.sql}")
  }

  private def strArg(fn: String, arg: String, e: Expression): String = e match {
    case Literal(s, StringType) if s != null => s.toString
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be a string literal, got ${other.sql}")
  }

  private def arity(fn: String, expected: String, got: Seq[Expression]): Nothing =
    throw new IllegalArgumentException(
      s"$fn expects $expected arguments, got ${got.length}")

  private def fn(name: String, usage: String)(builder: Builder): (FunctionIdentifier, ExpressionInfo, Builder) =
    (FunctionIdentifier(name),
      new ExpressionInfo("graft.plans.GraftFunctions", null, name, usage, ""),
      builder)

  /** Every registered SQL function. One list so the extensions hook and
    * any direct registry use stay in lockstep. */
  val all: Seq[(FunctionIdentifier, ExpressionInfo, Builder)] = Seq(
    fn("graft_dot",
      "graft_dot(a array<double>, b array<double>) - fused native dot product") {
      case Seq(a, b) => DotProduct(a, b)
      case args => arity("graft_dot", "2", args)
    },
    fn("graft_hyperplane_sigs",
      "graft_hyperplane_sigs(v array<double>, tables int, bits int, dims int) - LSH band signatures") {
      case Seq(v, t, b, d) =>
        HyperplaneSigs(v, intArg("graft_hyperplane_sigs", "tables", t),
          intArg("graft_hyperplane_sigs", "bits", b),
          intArg("graft_hyperplane_sigs", "dims", d))
      case args => arity("graft_hyperplane_sigs", "4", args)
    },
    fn("graft_kll_sketch_agg",
      "graft_kll_sketch_agg(x double, k int) - mergeable KLL quantile sketch (binary)") {
      case Seq(x, k) => KllSketchAgg(x, intArg("graft_kll_sketch_agg", "k", k))
      case args => arity("graft_kll_sketch_agg", "2", args)
    },
    fn("graft_kll_union_agg",
      "graft_kll_union_agg(sketch binary, k int) - union of serialized KLL sketches") {
      case Seq(s, k) => KllUnionAgg(s, intArg("graft_kll_union_agg", "k", k))
      case args => arity("graft_kll_union_agg", "2", args)
    },
    fn("graft_kll_quantile",
      "graft_kll_quantile(sketch binary, q double) - quantile estimate from a KLL sketch") {
      case Seq(s, q) => KllQuantile(s, q)
      case args => arity("graft_kll_quantile", "2", args)
    },
    fn("graft_theta_sketch_agg",
      "graft_theta_sketch_agg(x string|long, lgK int) - mergeable Theta distinct sketch (binary)") {
      case Seq(x, lgK) => ThetaSketchAgg(x, intArg("graft_theta_sketch_agg", "lgK", lgK))
      case args => arity("graft_theta_sketch_agg", "2", args)
    },
    fn("graft_theta_union_agg",
      "graft_theta_union_agg(sketch binary, lgK int) - union of serialized Theta sketches") {
      case Seq(s, lgK) => ThetaUnionAgg(s, intArg("graft_theta_union_agg", "lgK", lgK))
      case args => arity("graft_theta_union_agg", "2", args)
    },
    fn("graft_theta_estimate",
      "graft_theta_estimate(a binary, b binary, op string, lgK int) - union/intersect/diff estimate") {
      case Seq(a, b, op, lgK) =>
        ThetaSetEstimate(a, b, strArg("graft_theta_estimate", "op", op),
          intArg("graft_theta_estimate", "lgK", lgK))
      case args => arity("graft_theta_estimate", "4", args)
    },
    fn("graft_bloom_agg",
      "graft_bloom_agg(x string|long|binary, items int, fpp double) - mergeable bloom membership state (binary)") {
      case Seq(x, items, fpp) =>
        BloomFilterAgg(x, intArg("graft_bloom_agg", "items", items).toLong,
          dblArg("graft_bloom_agg", "fpp", fpp))
      case args => arity("graft_bloom_agg", "3", args)
    },
    fn("graft_bloom_union_agg",
      "graft_bloom_union_agg(bloom binary, items int, fpp double) - union of serialized bloom filters") {
      case Seq(b, items, fpp) =>
        BloomUnionAgg(b, intArg("graft_bloom_union_agg", "items", items).toLong,
          dblArg("graft_bloom_union_agg", "fpp", fpp))
      case args => arity("graft_bloom_union_agg", "3", args)
    },
    fn("graft_cm_agg",
      "graft_cm_agg(x string|long|binary, depth int, width int, seed int) - mergeable count-min frequency state (binary)") {
      case Seq(x, d, w, s) =>
        CountMinAgg(x, intArg("graft_cm_agg", "depth", d),
          intArg("graft_cm_agg", "width", w), intArg("graft_cm_agg", "seed", s))
      case args => arity("graft_cm_agg", "4", args)
    },
    fn("graft_cm_union_agg",
      "graft_cm_union_agg(cm binary, depth int, width int, seed int) - merge of serialized count-min sketches") {
      case Seq(c, d, w, s) =>
        CountMinUnionAgg(c, intArg("graft_cm_union_agg", "depth", d),
          intArg("graft_cm_union_agg", "width", w), intArg("graft_cm_union_agg", "seed", s))
      case args => arity("graft_cm_union_agg", "4", args)
    },
    fn("graft_ngram_rep_stats",
      "graft_ngram_rep_stats(tokens array<string>, n1 int, ...) - per-width [top_chars, dup_chars] of word n-grams") {
      case args if args.length >= 2 =>
        NgramRepStats(args.head,
          args.tail.map(e => intArg("graft_ngram_rep_stats", "n", e)))
      case args => arity("graft_ngram_rep_stats", "at least 2", args)
    },
    fn("graft_c4_line_clean",
      "graft_c4_line_clean(text string, min_line_words int) - C4 line cleaning: struct(n_lines, n_kept, clean_text)") {
      case Seq(t, m) => C4LineClean(t, intArg("graft_c4_line_clean", "min_line_words", m))
      case args => arity("graft_c4_line_clean", "2", args)
    },
    fn("graft_text_normalize",
      "graft_text_normalize(text string) - unicode + whitespace-structure normalization (one pass)") {
      case Seq(t) => TextNormalize(t)
      case args => arity("graft_text_normalize", "1", args)
    },
    fn("graft_fix_mojibake",
      "graft_fix_mojibake(text string) - repair whole-string Latin-1/cp1252 misdecodes of UTF-8 (self-guarding)") {
      case Seq(t) => FixMojibake(t)
      case args => arity("graft_fix_mojibake", "1", args)
    },
    fn("graft_gear_chunks",
      "graft_gear_chunks(data string|binary, min_len int, avg_bits int, max_len int) - Gear rolling-hash CDC chunks: array<struct<offset,len,hash>>") {
      case Seq(d, mn, ab, mx) => GearChunks(d,
        intArg("graft_gear_chunks", "min_len", mn),
        intArg("graft_gear_chunks", "avg_bits", ab),
        intArg("graft_gear_chunks", "max_len", mx))
      case args => arity("graft_gear_chunks", "4", args)
    })
}
