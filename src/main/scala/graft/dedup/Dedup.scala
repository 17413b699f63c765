package graft.dedup

import graft.text.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication for training-data pipelines: exact content
  * dedup, MinHash+LSH, SimHash, and exact n-gram Jaccard verification.
  *
  * Scale design (the invariant across all near-dup operators here):
  * signatures are computed as narrow maps over the text column, and
  * candidate generation is ALWAYS a bucket-keyed equi-join (LSH band,
  * SimHash chunk, or shared shingle) — never a cartesian self-join.
  * Comparisons are confined to rows that collide in at least one bucket,
  * which is O(collisions), not O(n²), and the join shuffles on the
  * bucket key so it parallelizes across executors.
  */
object Dedup {

  /** Exact content dedup groups: rows hashed by normalized content;
    * `keep_id` is the minimum id (deterministic keep-first).
    * One hash-shuffle on the 32-byte digest — at 100 TB this moves only
    * (hash, id) pairs, not document bodies. */
  def exactGroups(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(TextFunctions.contentFingerprint(text).as("content_hash"), id.as("__id"))
      .groupBy("content_hash")
      .agg(min("__id").as("keep_id"), count(lit(1)).as("n_dups"))

  /** Keep one row per exact-content group (min id wins). */
  def exactDedup(df: DataFrame, id: Column, text: Column): DataFrame = {
    val keep = exactGroups(df, id, text).select(col("keep_id").as("__keep"))
    df.join(keep, id === col("__keep"), "left_semi")
  }

  // ---------------------------------------------------------------- MinHash

  /** Mersenne prime 2^31-1: the universal-hash modulus. Products stay
    * under 2^62, so the expressions are safe under Spark 4's default
    * ANSI mode (no silent wraparound, no overflow errors). */
  private val P = 2147483647L

  /** Deterministic (a, b) parameters for the i-th (a·h + b) mod P
    * universal hash — derived from splitmix64-style mixing constants,
    * reduced into [1, P) / [0, P). */
  private def hashParams(i: Int): (Long, Long) = {
    def mix(x: Long): Long = {
      var h = x * 0x9E3779B97F4A7C15L
      h ^= (h >>> 32); h *= 0xBF58476D1CE4E5B9L; h ^= (h >>> 29)
      h
    }
    (Math.floorMod(mix(i + 1), P - 1) + 1, Math.floorMod(mix(i + 0x10001), P))
  }

  /** MinHash signature of the document's word-3-gram set: for each of
    * `numHashes` universal-hash functions, min over shingles of
    * (a·(xxhash64(s) mod P) + b) mod P. Pure column expression —
    * per-row, no shuffle.
    *
    * Perf note: higher-order-function expressions are interpreted (no
    * whole-stage codegen) and get NO common-subexpression elimination,
    * so the shingle array must be computed exactly once — a single
    * `aggregate` folds the hash array into all `numHashes` running
    * minima at once (array accumulator + zip_with against the constant
    * parameter array). A naive `array(min₁, …, min₃₂)` re-tokenizes the
    * document 32×. */
  def minHashSignature(text: Column, numHashes: Int): Column = {
    val hashes = transform(TextFunctions.shingles(text, 3), s => pmod(xxhash64(s), lit(P)))
    val params = array((0 until numHashes).map { i =>
      val (a, b) = hashParams(i)
      struct(lit(a).as("a"), lit(b).as("b"))
    }: _*)
    val folded = aggregate(hashes, array_repeat(lit(P), numHashes),
      (acc, h) => zip_with(acc, params,
        (m, p) => least(m, pmod(h * p.getField("a") + p.getField("b"), lit(P)))))
    // cheap guard (tokenize only, no shingle/hash work): <3 tokens ⇒ no
    // shingles ⇒ signature undefined
    when(size(TextFunctions.tokens(text)) >= 3, folded)
  }

  /** LSH band keys from a MinHash signature: `numBands` strings, each
    * hashing `rowsPerBand` consecutive signature values. Two documents
    * with Jaccard j collide in ≥1 band with prob 1-(1-j^r)^b. */
  def bandKeys(sig: Column, numBands: Int, rowsPerBand: Int): Column =
    array((0 until numBands).map { b =>
      val parts = (0 until rowsPerBand).map(r => element_at(sig, b * rowsPerBand + r + 1))
      concat_ws("_", lit(b) +: parts.map(_.cast("string")): _*)
    }: _*)

  /** MinHash+LSH candidate pairs: (doc_a < doc_b, n_bands collided).
    *
    * Plan: narrow signature map → explode bands (×numBands) → self-join
    * keyed on the band string → distinct pair. The join shuffles on the
    * band key, so work distributes by bucket; hot buckets are bounded by
    * band selectivity (r rows/band), and AQE skew-join splits any
    * residual hot bucket.
    */
  def minHashCandidates(
      df: DataFrame,
      id: Column,
      text: Column,
      numHashes: Int = 32,
      numBands: Int = 8): DataFrame = {
    val rowsPerBand = numHashes / numBands
    // Explode + hash-aggregate formulation: tokenize/hash each shingle
    // exactly once, then fold the 32 running minima inside a codegen'd
    // partial aggregate (map-side combine ⇒ the shuffle moves one
    // 32-long row per document, not per shingle). Strictly better than
    // the per-row expression at every scale.
    val grams = df.select(id.as("doc_id"), explode(TextFunctions.shingles(text, 3)).as("g"))
      .select(col("doc_id"), pmod(xxhash64(col("g")), lit(P)).as("h"))
    val minCols = (0 until numHashes).map { i =>
      val (a, b) = hashParams(i)
      min(pmod(col("h") * lit(a) + lit(b), lit(P))).as(s"m$i")
    }
    val sigs = grams.groupBy("doc_id").agg(minCols.head, minCols.tail: _*)
      .select(col("doc_id"), array((0 until numHashes).map(i => col(s"m$i")): _*).as("sig"))
    val bands = sigs.select(col("doc_id"), explode(bandKeys(col("sig"), numBands, rowsPerBand)).as("band"))
    val a = bands.select(col("band"), col("doc_id").as("doc_a"))
    val b = bands.select(col("band"), col("doc_id").as("doc_b"))
    a.join(b, Seq("band")).filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_bands"))
  }

  // ---------------------------------------------------------------- SimHash

  /** 64-bit SimHash of the document's token multiset: per bit, sum +1/-1
    * over tokens by that bit of xxhash64(token); bit set iff sum > 0.
    *
    * Single-pass formulation: ONE fold over the token-hash array carries
    * all 64 bit-vote counters as an array accumulator (zip_with against
    * a constant mask array), then a second tiny fold assembles the final
    * 64-bit value. Tokenization happens exactly once per row — 64
    * independent per-bit aggregates would re-tokenize 64× because
    * higher-order functions get no subexpression elimination. */
  def simHash(text: Column): Column = {
    val hashes = transform(TextFunctions.tokens(text), w => xxhash64(w))
    val masks = array((0 until 64).map(bit => lit(1L << bit)): _*)
    val votes = aggregate(hashes, array_repeat(lit(0L), 64),
      (acc, h) => zip_with(acc, masks,
        (v, m) => v + when(h.bitwiseAND(m) =!= 0L, 1L).otherwise(-1L)))
    aggregate(zip_with(votes, masks, (v, m) => when(v > 0, m).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ `maxHamming`.
    *
    * Pigeonhole bucketing: the 64-bit hash splits into `chunks` equal
    * chunks; any pair within Hamming ≤ chunks-1 shares at least one
    * exact chunk, so candidates are generated by equi-joining on
    * (chunk_index, chunk_value) and verified with bit_count(xor).
    * For maxHamming ≥ chunks, raise `chunks` (still equi-join, never
    * cartesian). */
  def simHashPairs(
      df: DataFrame,
      id: Column,
      text: Column,
      maxHamming: Int = 3,
      chunks: Int = 4): DataFrame = {
    require(maxHamming < chunks, "pigeonhole needs maxHamming < chunks")
    val chunkBits = 64 / chunks
    val sigs = df.select(id.as("doc_id"), simHash(text).as("sim"))
    val keyed = sigs.select(col("doc_id"), col("sim"), explode(array((0 until chunks).map { c =>
      concat_ws("_", lit(c),
        shiftright(col("sim"), c * chunkBits)
          .bitwiseAND((1L << chunkBits) - 1).cast("string"))
    }: _*)).as("chunk"))
    val a = keyed.select(col("chunk"), col("doc_id").as("doc_a"), col("sim").as("sim_a"))
    val b = keyed.select(col("chunk"), col("doc_id").as("doc_b"), col("sim").as("sim_b"))
    a.join(b, Seq("chunk")).filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  // ------------------------------------------------------- n-gram Jaccard

  /** Exact n-gram Jaccard similar pairs via the inverted-index join:
    * explode distinct shingles, self-join on the shingle, count the
    * intersection per pair, and compute |A∩B| / (|A|+|B|-|A∩B|).
    *
    * This is the exact-verification stage run after MinHash candidate
    * generation; candidates sharing zero shingles never materialize.
    * The shingle join shuffles on the shingle value — band-partitioned,
    * no cartesian. At 100 TB, cap hot shingles by dropping shingles with
    * document frequency above a threshold (stopword shingles contribute
    * nothing to near-dup detection).
    */
  def jaccardPairs(
      df: DataFrame,
      id: Column,
      text: Column,
      threshold: Double,
      k: Int = 3): DataFrame = {
    // Shingles join on their 64-bit hash, not the string: the self-join
    // shuffle moves 8-byte keys instead of ~20-byte strings, and the
    // intersection count is unchanged absent xxhash64 collisions
    // (negligible below ~2^32 distinct shingles per document pair).
    val sh = df.select(id.as("doc_id"), explode(TextFunctions.shingles(text, k)).as("gs"))
      .select(col("doc_id"), xxhash64(col("gs")).as("g"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val a = sh.select(col("g"), col("doc_id").as("doc_a"))
    val b = sh.select(col("g"), col("doc_id").as("doc_b"))
    val inter = a.join(b, Seq("g")).filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("n_a")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("n_b")), "doc_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
  }
}
