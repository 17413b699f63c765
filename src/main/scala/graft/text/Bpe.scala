package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) tokenizer training primitives.
  *
  * The classical BPE training loop (Sennrich et al. 2016) is: build a
  * word-frequency vocabulary, repeatedly count adjacent symbol pairs
  * weighted by word frequency, and merge the most frequent pair. The
  * scale insight — the reason this belongs in a 100 TB engine — is that
  * ONLY the first step touches the corpus: the word-frequency aggregate
  * collapses ~10^11 tokens into a vocabulary of ~10^6-10^7 distinct
  * words (map-side combine does most of the work inside the scan), and
  * every subsequent merge round is a narrow map + small aggregate over
  * that vocabulary table, never the raw text again.
  *
  * Reference scope: the reference pipeline tokenizes nothing; this comes
  * from the LLM-training-data brief (token counting's training-side
  * sibling — `TextFunctions.regexTokenCount` consumes a tokenizer like
  * the one trained here).
  */
object Bpe {

  /** (word, wc) frequency table of the corpus — the ONE corpus-wide
    * pass. At 100 TB this shuffles distinct words (vocabulary-sized,
    * not corpus-sized) after map-side partial aggregation. */
  def wordCounts(df: DataFrame, text: Column): DataFrame =
    df.select(explode(TextFunctions.tokens(text)).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("wc"))

  /** Adjacent character pairs of `w` as 2-char substrings (leftmost
    * first). Words shorter than 2 chars yield an empty array. */
  def charPairs(w: Column): Column =
    when(length(w) >= 2,
      transform(sequence(lit(1), length(w) - 1), i => substr(w, i, lit(2))))
      .otherwise(array().cast("array<string>"))

  /** Corpus-weighted adjacent character-pair counts — BPE training step
    * 1 as a relational plan: explode each DISTINCT word's pairs, weight
    * by word frequency, hash-aggregate. Pair table size is bounded by
    * alphabet², independent of corpus size. */
  def pairCounts(vocab: DataFrame): DataFrame =
    vocab.select(col("wc"), explode(charPairs(col("word"))).as("pair"))
      .groupBy("pair").agg(sum("wc").as("n"))

  /** Top-k most frequent pairs (count desc, pair asc tie-break) —
    * compiles to TakeOrderedAndProject, no global sort. */
  def topPairs(df: DataFrame, text: Column, k: Int): DataFrame =
    pairCounts(wordCounts(df, text))
      .orderBy(desc("n"), asc("pair")).limit(k)

  /** One greedy leftmost merge of adjacent symbols (a, b) → a+b over a
    * symbol array, as a fold: append each symbol, merging it into the
    * previous one when the previous equals `a` AND it equals `b` AND
    * the previous was not itself just produced by this round's merge
    * (BPE merges are non-overlapping left-to-right: in "aaa" with merge
    * (a,a), the first pair wins and the third `a` stays). */
  def mergeSymbols(symbols: Column, a: String, b: String): Column = {
    val empty = array().cast("array<string>")
    val acc0 = struct(empty.as("out"), lit(false).as("justMerged"))
    aggregate(symbols, acc0,
      (acc, s) => {
        val out  = acc.getField("out")
        val last = element_at(out, -1)
        val canMerge = size(out) > 0 && !acc.getField("justMerged") &&
          last === lit(a) && s === lit(b)
        when(canMerge,
          struct(concat(slice(out, lit(1), size(out) - 1), array(lit(a + b))).as("out"),
            lit(true).as("justMerged")))
          .otherwise(struct(concat(out, array(s)).as("out"), lit(false).as("justMerged")))
      },
      acc => acc.getField("out"))
  }

  /** Train `numMerges` BPE merges. Returns the learned merge list in
    * order, with the corpus-weighted count each merge had when chosen.
    *
    * The corpus is touched exactly once ([[wordCounts]]); each round
    * runs over the vocabulary table only: a pair-count aggregate, a
    * single-row argmax collect (a SCALAR per round, like d15's
    * convergence check — never data), and a narrow symbol-merge map.
    * The vocabulary's lineage is truncated per round via
    * [[graft.operators.Lineage.truncate]] (reliable checkpoint when the
    * session has a checkpoint dir, localCheckpoint otherwise), exactly
    * the d15 iteration pattern. */
  /** Encode each document into BPE subword units under an ORDERED merge
    * list (the (a, b) prefix of [[trainMerges]] output). Emits
    * (doc_id, bpe_tokens, n_bpe_tokens); documents with no tokens are
    * absent (the [[graft.dedup.Dedup.duplicatedSpanStats]] convention).
    *
    * Scale shape — the training insight applied to encoding: the merge
    * loop is O(merges × word length) PER DISTINCT WORD, so it runs on
    * the vocabulary table (~10^6-10^7 rows at 100 TB), never the
    * corpus. The corpus-side work is one tokenize/posexplode pass into
    * a (doc, pos, word) table joined back to the encoded vocabulary —
    * an equi-join on the word that AQE skew-handling can split when
    * Zipf-head words ("the" in ~5% of positions) pile up, and that
    * broadcasts outright when the vocabulary fits. The tokenize pass
    * deliberately has TWO plan parents (vocabulary + join-back): it is
    * an embarrassingly-parallel narrow map, and re-running it beats
    * checkpointing a corpus-sized (doc, pos, word) table — the
    * documented d35/d37 trade. Merges fold into the vocabulary as
    * `mergesPerStage`-deep expression chains with lineage truncated
    * between stages (one giant k-deep expression tree would bloat
    * analysis; thousands of un-truncated stages would bloat lineage). */
  def encode(df: DataFrame, id: Column, text: Column,
             merges: Seq[(String, String)], mergesPerStage: Int = 16): DataFrame = {
    require(mergesPerStage >= 1, s"mergesPerStage must be >= 1, got $mergesPerStage")
    import graft.operators.Lineage
    val toks = df
      .select(id.as("doc_id"), posexplode(TextFunctions.tokens(text)).as(Seq("__pos", "__w")))
      .filter(length(col("__w")) > 0)
    var enc = Lineage.truncate(toks.select(col("__w")).distinct()
      .select(col("__w"), transform(sequence(lit(1), length(col("__w"))),
        i => substr(col("__w"), i, lit(1))).as("__syms")))
    merges.grouped(mergesPerStage).foreach { grp =>
      enc = Lineage.truncate(enc.select(col("__w"),
        grp.foldLeft(col("__syms")) { case (c, (a, b)) => mergeSymbols(c, a, b) }.as("__syms")))
    }
    toks.join(enc, Seq("__w"))
      .groupBy("doc_id")
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("__pos"), col("__syms")))),
        s => s.getField("__syms"))).as("bpe_tokens"))
      .withColumn("n_bpe_tokens", size(col("bpe_tokens")).cast("long"))
  }

  def trainMerges(df: DataFrame, text: Column, numMerges: Int): Seq[(String, String, Long)] = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    import graft.operators.Lineage
    var vocab = Lineage.truncate(wordCounts(df, text)
      .select(transform(sequence(lit(1), length(col("word"))),
          i => substr(col("word"), i, lit(1))).as("syms"),
        col("wc")))
    val merges = Seq.newBuilder[(String, String, Long)]
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      // pairs over CURRENT symbol arrays: adjacent (sym_i, sym_i+1)
      val top = vocab
        .select(col("wc"), explode(
          when(size(col("syms")) >= 2,
            transform(sequence(lit(1), size(col("syms")) - 1),
              i => struct(element_at(col("syms"), i).as("a"),
                element_at(col("syms"), i + 1).as("b"))))
            .otherwise(array().cast("array<struct<a:string,b:string>>"))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("wc").as("n"))
        .orderBy(desc("n"), asc("a"), asc("b"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((a, b, n))
        vocab = Lineage.truncate(vocab
          .select(mergeSymbols(col("syms"), a, b).as("syms"), col("wc")))
      }
      round += 1
    }
    merges.result()
  }
}
