package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Line-level boilerplate removal — the jusText/trafilatura idea
  * (Pomikálek 2011) reduced to deterministic, engine-mirrorable rules:
  * navigation crumbs, cookie banners, and footer junk are SHORT lines
  * with almost no function words, while real prose is long or
  * stopword-dense. Classification and removal are narrow maps over
  * staged arrays (zero shuffle, composable into the scan ahead of the
  * [[GopherFilter]] document gates — strip the chrome, then judge the
  * document). A DataFrame→DataFrame API because the per-line token
  * arrays must be materialized between projections (the HOF-CSE rule:
  * a lambda body re-evaluates every subexpression per reference, so
  * tokenization happens once per line in its own `transform`, and the
  * keep rule only touches the already-built arrays).
  *
  * Keep rule (documented): a line survives iff
  *   - it has ≥ `minWords` alphanumeric words AND a stopword ratio
  *     ≥ `minStopRatio` (prose signature), OR
  *   - it is ≥ `longChars` characters (tables/code/foreign prose score
  *     zero stopwords but are content — the jusText long-block
  *     override).
  */
object Boilerplate {

  /** The prose-signature function words (GopherFilter's gate list). */
  val StopWords: Seq[String] = GopherFilter.StopWords

  /** Appends `prefix` = struct(n_lines, n_kept, clean_text): non-blank
    * lines kept by the rule, rejoined with a newline in original
    * order. */
  def addCleanLines(df: DataFrame, text: Column, prefix: String = "bl",
                    minWords: Int = 4, minStopRatio: Double = 0.08,
                    longChars: Int = 200): DataFrame = {
    val stage1 = df.select(col("*"),
      filter(transform(split(coalesce(text, lit("")), "\n"), l => trim(l)),
        l => length(l) > 0).as("__bl_lines"))
    val stage2 = stage1.select(col("*"),
      transform(col("__bl_lines"), l =>
        filter(split(lower(l), "\\s+"), w => w.rlike("[a-z0-9]"))).as("__bl_toks"))
    val stage3 = stage2.select(col("*"),
      zip_with(col("__bl_lines"), col("__bl_toks"), (l, t) =>
        (size(t) >= minWords &&
          size(filter(t, w => w.isin(StopWords: _*))).cast("double") >=
            lit(minStopRatio) * size(t).cast("double")) ||
          length(l) >= longChars).as("__bl_keep"))
    val pairs = zip_with(col("__bl_lines"), col("__bl_keep"),
      (l, k) => struct(l.as("l"), k.as("k")))
    val stage4 = stage3.select(col("*"), pairs.as("__bl_pairs"))
    val keptLines = transform(
      filter(col("__bl_pairs"), p => p.getField("k")), p => p.getField("l"))
    stage4
      .select(col("*"),
        struct(
          size(col("__bl_lines")).cast("long").as("n_lines"),
          size(filter(col("__bl_keep"), k => k)).cast("long").as("n_kept"),
          array_join(keptLines, "\n").as("clean_text")).as(prefix))
      .drop("__bl_lines", "__bl_toks", "__bl_keep", "__bl_pairs")
  }
}
