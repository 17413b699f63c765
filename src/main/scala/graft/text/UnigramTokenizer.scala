package graft.text

import graft.expressions.UnigramExpressions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SentencePiece-style UNIGRAM tokenizer training (Kudo 2018) — the
  * probabilistic sibling of [[Bpe]]'s greedy merges, and the other
  * mainstream subword algorithm an LLM-data engine must supply. A
  * unigram model scores a segmentation as Σ log p(piece); training
  * alternates Viterbi segmentation of the corpus under the current
  * model (E-step, hard-EM variant) with count-renormalization and
  * pruning of low-support pieces (M-step) until the vocabulary reaches
  * its target size.
  *
  * Scale decomposition (the D34 discipline): ONLY the word-frequency
  * aggregate touches the corpus — one partial-aggregating shuffle whose
  * output is the distinct-word table (~10^6-10^7 rows at 100 TB). Every
  * EM iteration is a narrow native-expression map over that table plus
  * a piece-count aggregate bounded by |vocab|; driver state is exactly
  * the vocabulary (≤ ~10^5 (piece, logp) pairs — the documented bounded
  * collect, same class as BPE's per-round argmax and DSIR's λ table).
  *
  * Simplifications vs full SentencePiece, both documented and
  * spec-visible: hard-EM (Viterbi counts, not forward-backward
  * expectations) and count-based pruning (drop least-used multi-char
  * pieces, not the likelihood-loss ranking). Single-character pieces
  * are NEVER pruned and carry add-one smoothing, so any string always
  * segments (`concat(pieces) == word` is a hard invariant, unknown
  * characters ride at `unkLogp`).
  */
object UnigramTokenizer {

  /** A trained model: piece → log p(piece), plus the inference
    * parameters segmentation needs. */
  case class Model(pieces: Map[String, Double], maxPieceLen: Int, unkLogp: Double) {
    require(pieces.nonEmpty, "empty vocabulary")
    /** Viterbi-segment a word column under this model. */
    def segment(word: Column): Column =
      UnigramExpressions.viterbiSegment(word, pieces, maxPieceLen, unkLogp)
  }

  /** Corpus-weighted substring seed vocabulary: every substring of
    * length 1..maxPieceLen of every distinct word, weighted by word
    * frequency — all single chars plus the `seedSize` heaviest
    * multi-char pieces. Runs over the distinct-word table. */
  def seedVocab(df: DataFrame, text: Column, maxPieceLen: Int, seedSize: Int): DataFrame = {
    require(maxPieceLen >= 2 && seedSize > 0)
    val wc = Bpe.wordCounts(df, text)
    val subs = wc.select(col("wc"), explode(flatten(
        transform(sequence(lit(1), length(col("word"))), i =>
          transform(sequence(lit(0), least(lit(maxPieceLen - 1), length(col("word")) - i)),
            j => substr(col("word"), i, j + lit(1)))))).as("piece"))
      .groupBy("piece").agg(sum("wc").as("freq"))
    val singles = subs.filter(length(col("piece")) === 1)
    val multis = subs.filter(length(col("piece")) > 1)
      .orderBy(desc("freq"), asc("piece")).limit(seedSize)
    singles.unionAll(multis)
  }

  /** Train a unigram vocabulary of (at most) `vocabSize` pieces.
    *
    * `seedMultiplier` controls the over-complete seed (standard
    * practice: seed several × the target and prune down); `iters`
    * hard-EM rounds each re-segment the distinct-word table and shrink
    * the multi-piece set by 25% until the target fits. */
  def train(
      df: DataFrame,
      text: Column,
      vocabSize: Int,
      maxPieceLen: Int = 8,
      iters: Int = 4,
      seedMultiplier: Int = 4): Model = {
    require(vocabSize >= 2 && iters >= 1 && seedMultiplier >= 1)
    val wc = Bpe.wordCounts(df, text).persist()
    try {
      val seed = seedVocab(df, text, maxPieceLen, vocabSize * seedMultiplier)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val unkLogp = -100.0
      def toModel(counts: Map[String, Long]): Model = {
        // add-one smoothing on singles keeps coverage alive even for
        // pieces Viterbi stopped using
        val smoothed = counts.map { case (p, c) =>
          p -> (if (p.length == 1) c + 1L else c)
        }.filter(_._2 > 0)
        val total = smoothed.values.map(_.toDouble).sum
        Model(smoothed.map { case (p, c) => p -> math.log(c / total) },
          maxPieceLen, unkLogp)
      }
      var model = toModel(seed)
      var multiTarget = seed.count(_._1.length > 1)
      val finalMultiTarget = math.max(0, vocabSize - seed.count(_._1.length == 1))
      var iter = 0
      while (iter < iters) {
        // E-step: Viterbi counts over the distinct-word table (the only
        // distributed work; output bounded by |vocab|)
        val used = wc
          .select(explode(model.segment(col("word"))).as("piece"), col("wc"))
          .groupBy("piece").agg(sum("wc").as("n"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        // M-step: prune multis on a 25% shrink schedule toward the target
        multiTarget =
          if (iter == iters - 1) finalMultiTarget
          else math.max(finalMultiTarget, (multiTarget * 3) / 4)
        val singles = model.pieces.keysIterator.filter(_.length == 1)
          .map(p => p -> used.getOrElse(p, 0L)).toMap
        val multis = used.view.filterNot(p => p._1.length == 1).toSeq
          .sortBy { case (p, n) => (-n, p) }.take(multiTarget).toMap
        model = toModel(singles ++ multis)
        iter += 1
      }
      model
    } finally wc.unpersist()
  }

  /** Encode documents into unigram pieces: Viterbi runs once per
    * DISTINCT word (vocabulary-sized table), the corpus side is a
    * tokenize + equi-join-back — the exact [[Bpe.encode]] shape. Emits
    * (doc_id, pieces, n_pieces); documents with no tokens are absent. */
  def encode(df: DataFrame, id: Column, text: Column, model: Model): DataFrame = {
    val toks = df
      .select(id.as("doc_id"), posexplode(TextFunctions.tokens(text)).as(Seq("__pos", "__w")))
      .filter(length(col("__w")) > 0)
    val enc = toks.select(col("__w")).distinct()
      .select(col("__w"), model.segment(col("__w")).as("__pieces"))
    toks.join(enc, Seq("__w"))
      .groupBy("doc_id")
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("__pos"), col("__pieces")))),
        s => s.getField("__pieces"))).as("pieces"))
      .withColumn("n_pieces", size(col("pieces")).cast("long"))
  }
}
