package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document chunking for context-window-bounded training: split each
  * document into fixed-token-budget windows with overlap — the step
  * between cleaning (A-series) and sequence packing (D17) in a training
  * pipeline.
  *
  * Fully native (tokens staged once, then `sequence`/`explode`/`slice`/
  * `array_join` — all codegen-friendly, no UDFs): a narrow map + one
  * generator per document, no shuffle at all, so chunking 100 TB is a
  * pure scan-speed pass. Row amplification is bounded by
  * ceil(n_tokens / stride) per document.
  */
object Chunking {

  /** (doc_id, chunk_id, n_tokens, chunk_text) — one row per chunk.
    * Chunk i covers tokens [i·stride, i·stride + chunkTokens) with
    * stride = chunkTokens − overlapTokens; the final chunk may be short
    * (both Spark's `slice` and the oracle's list slicing clamp at the
    * document end). Documents shorter than one chunk yield exactly one
    * chunk. Empty documents yield none. */
  def chunkDocuments(
      df: DataFrame,
      id: Column,
      text: Column,
      chunkTokens: Int,
      overlapTokens: Int): DataFrame = {
    require(chunkTokens > 0 && overlapTokens >= 0 && overlapTokens < chunkTokens,
      "need 0 <= overlapTokens < chunkTokens")
    val stride = chunkTokens - overlapTokens
    // whitespace-only docs are dropped BEFORE tokenizing: the tokenizer
    // maps "" to [""], which would otherwise yield one empty chunk
    df.filter(length(trim(text)) > 0)
      .select(id.as("doc_id"), TextFunctions.tokens(text).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .filter(col("__n") > 0)
      .withColumn("__chunks",
        greatest(lit(1L), ceil((col("__n") - lit(overlapTokens)) / lit(stride.toDouble)).cast("long")))
      .withColumn("chunk_id", explode(sequence(lit(0L), col("__chunks") - 1)))
      .select(col("doc_id"), col("chunk_id"),
        slice(col("__toks"), (col("chunk_id") * stride + 1).cast("int"), lit(chunkTokens)).as("__ct"))
      .select(col("doc_id"), col("chunk_id"),
        size(col("__ct")).cast("long").as("n_tokens"),
        array_join(col("__ct"), " ").as("chunk_text"))
  }
}
