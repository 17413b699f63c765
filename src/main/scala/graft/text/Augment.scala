package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic text augmentation for denoising objectives: T5-style
  * span corruption — replace token spans with `<extra_id_k>` sentinels
  * in the input and emit the masked spans (sentinel-prefixed, in
  * order) as the target. The (input, target) pair IS the training
  * example for a span-corruption LM objective.
  *
  * Mask decisions are HASH-SEEDED, never `rand()`: every row's
  * corruption is a pure function of (doc_id, position, seed), so
  * re-runs, retries, and the DuckDB oracle all reproduce the same
  * examples bit-for-bit (the D14/D33 determinism discipline), and a
  * new epoch is just a new seed.
  *
  * Span shape is STATELESS on purpose: position i starts a span iff
  * its hash clears `startRate`, and a token is masked iff ANY of the
  * `spanLen` positions ending at it started one — an overlapping-runs
  * formulation a windowed max computes exactly, with no sequential
  * scan state (the greedy "skip starts inside a span" variant needs a
  * stateful pass and is NOT SQL-replayable; overlaps here simply merge
  * into longer spans). Masked fraction ≈ 1−(1−startRate)^spanLen.
  *
  * Plan: one explode (token grid), then TWO doc-keyed window passes
  * sharing one exchange — the mask maxes, then the sentinel-index
  * cumsum (which consumes the first pass's run boundaries, so it
  * cannot fold into the same WindowExec) — and one per-doc aggregate
  * reassembling input/target with order-preserving
  * `sort_array(collect_list(struct(pos, …)))`. Token-empty documents
  * are absent from the output (nothing to corrupt).
  */
object Augment {

  def spanCorrupt(df: DataFrame, id: Column, text: Column,
      startRate: Double = 0.05, spanLen: Int = 3, seed: Int = 0): DataFrame = {
    require(startRate > 0 && startRate < 1, s"startRate must be in (0,1), got $startRate")
    require(spanLen >= 1, s"spanLen must be >= 1, got $spanLen")
    val cut = math.round(startRate * 1000000L)
    val grid = df
      .select(id.as("doc_id"), TextFunctions.tokens(text).as("__t"))
      .select(col("doc_id"), posexplode(col("__t")).as(Seq("__p0", "__tok")))
      .filter(col("__tok") =!= "")
      .select(col("doc_id"), (col("__p0") + 1).as("__i"), col("__tok"))
    val bucket = pmod(conv(substring(md5(concat(
      col("doc_id").cast("string"), lit(":"), col("__i").cast("string"),
      lit(":"), lit(seed.toString))), 1, 15), 16, 10).cast("long"), lit(1000000L))
    val w = Window.partitionBy("doc_id").orderBy("__i")
    val trailing = w.rowsBetween(-(spanLen - 1), Window.currentRow)
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // run boundary: masked here, not masked at i-1. masked(i-1) covers
    // starts in [i-spanLen, i-1] — hence the [-spanLen, -1] frame. Both
    // frames share one (doc, i) spec → one WindowExec for the maxes;
    // the __grp cumsum below needs their OUTPUT, so it is a second
    // WindowExec on the same exchange, not a second shuffle.
    val flagged = grid
      .withColumn("__start", (bucket < cut).cast("int"))
      .select(col("doc_id"), col("__i"), col("__tok"),
        (max(col("__start")).over(trailing) === 1).as("__m"),
        (coalesce(max(col("__start")).over(w.rowsBetween(-spanLen, -1)), lit(0)) === 1)
          .as("__pm"))
      .withColumn("__new", col("__m") && !col("__pm"))
      .withColumn("__grp", sum(col("__new").cast("long")).over(cum))
    val sentinel = concat(lit("<extra_id_"), (col("__grp") - 1).cast("string"), lit(">"))
    val inputPiece = when(!col("__m"), col("__tok")).when(col("__new"), sentinel)
    val targetPiece = when(col("__new"), concat(sentinel, lit(" "), col("__tok")))
      .when(col("__m"), col("__tok"))
    def assemble(piece: Column): Column = array_join(
      transform(array_sort(collect_list(struct(col("__i"), piece.as("__x")))),
        s => s.getField("__x")), " ")
    flagged.groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("__m").cast("long")).as("n_masked"),
        sum(col("__new").cast("long")).as("n_spans"),
        assemble(inputPiece).as("input_text"),
        assemble(targetPiece).as("target_text"))
  }
}
