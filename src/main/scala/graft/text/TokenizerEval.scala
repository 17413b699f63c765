package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tokenizer quality evaluation — the acceptance gate between training
  * a tokenizer (D34 BPE / D73 unigram) and spending GPU-months encoding
  * a corpus with it. The metrics practitioners actually gate on:
  *
  *  - **fertility** (pieces per word, per language slice): the standard
  *    cross-lingual equity number — a vocabulary trained on English web
  *    text quietly costs 2-3× the context budget for underrepresented
  *    languages, visible here before it becomes a training bill;
  *  - **compression** (chars per piece): overall subword efficiency;
  *  - **unk share** (pieces that fell through to the unk-floor
  *    single-char fallback): script coverage — a vocabulary with no CJK
  *    chars "works" (the round-trip invariant holds) but burns one
  *    piece per character exactly where fertility says it does.
  *
  * Plan shape: segmentation runs once per DISTINCT word (the D34/D73
  * encode discipline), membership is a join against the vocab table
  * (vocab-sized, broadcastable), and the report is one slice aggregate
  * weighted by word frequency — the corpus is scanned once.
  */
object TokenizerEval {

  /** Per-slice report: n_words, n_pieces, fertility, chars_per_piece,
    * unk_pieces, unk_share. `slice` is any grouping column (language,
    * source). */
  def report(
      df: DataFrame,
      text: Column,
      slice: Column,
      model: UnigramTokenizer.Model): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val words = df.select(slice.as("slice"),
        explode(TextFunctions.tokens(text)).as("__w"))
      .filter(length(col("__w")) > 0)
      .groupBy(col("slice"), col("__w")).agg(count(lit(1)).as("__wc"))
    val vocab = model.pieces.keys.toSeq.toDF("__piece")
    // distinct on the WORD alone (the unk aggregate's discipline): a
    // (slice, word) distinct here leaves k rows for a word shared by
    // k slices, and the word-keyed groupBy then counts every piece k
    // times — fertility inflated by exactly the word's slice
    // multiplicity (caught by the d76 driver oracle: 5 langs sharing
    // a vocabulary read 5x).
    val seg = words.select(col("__w")).distinct()
      .select(col("__w"), explode(model.segment(col("__w"))).as("__piece"))
      .groupBy(col("__w"))
      .agg(count(lit(1)).as("__n_pieces"), sum(length(col("__piece"))).as("__chars"))
    val unk = words.select(col("__w")).distinct()
      .select(col("__w"), explode(model.segment(col("__w"))).as("__piece"))
      .join(broadcast(vocab), Seq("__piece"), "left_anti")
      .groupBy(col("__w")).agg(count(lit(1)).as("__n_unk"))
    words
      .join(seg, Seq("__w"))
      .join(unk, Seq("__w"), "left")
      .na.fill(0L, Seq("__n_unk"))
      .groupBy(col("slice"))
      .agg(
        sum(col("__wc")).cast("long").as("n_words"),
        sum(col("__wc") * col("__n_pieces")).cast("long").as("n_pieces"),
        (sum(col("__wc") * col("__n_pieces")) / sum(col("__wc"))).as("fertility"),
        (sum(col("__wc") * col("__chars")) / sum(col("__wc") * col("__n_pieces")))
          .as("chars_per_piece"),
        sum(col("__wc") * col("__n_unk")).cast("long").as("unk_pieces"),
        (sum(col("__wc") * col("__n_unk")) / sum(col("__wc") * col("__n_pieces")))
          .as("unk_share"))
  }
}
