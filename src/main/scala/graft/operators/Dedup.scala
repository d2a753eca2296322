package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Deduplication operators for training-data pipelines, from exact to
  * approximate:
  *
  *   - exact: hash-groupBy (one shuffle on a 64-bit fingerprint, not the
  *     full text — at 100 TB the shuffle carries 8-byte keys);
  *   - n-gram Jaccard: exact set similarity on character shingles
  *     (bounded candidate sets; the test oracle for MinHash);
  *   - MinHash + LSH banding: shingle → signature → band → bucket-join;
  *     the scale path — candidate pairs come from Σ bucket² instead of n²;
  *   - SimHash: 64-bit sign-of-weighted-sum fingerprint; near-dup =
  *     small Hamming distance, bucketed by prefix;
  *   - embedding cosine near-dup: delegates to [[Similarity]].
  *
  * Everything is declarative Column expressions (codegen'd); the only
  * shuffles are the groupBys on compact keys.
  */
object Dedup {

  // ------------------------------------------------------------- exact

  /** Exact dedup: keep the lowest id per distinct value of `textCol`.
    * Grouping key is the 64-bit xxhash of the text so the shuffle moves
    * hashes, not documents; collision verification can be layered on by
    * grouping on (hash, text) — at 64 bits collisions are ~n²/2⁶⁵. */
  def exactKeepers(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    df.groupBy(xxhash64(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .select("keep_id", "n_copies")

  /** Exact dedup returning the surviving rows. */
  def exact(df: DataFrame, cols: Seq[String]): DataFrame =
    df.dropDuplicates(cols)

  // ----------------------------------------------------- n-gram Jaccard

  /** Distinct character n-gram shingles of a text column (codegen'd:
    * sequence + transform + substring, no UDF). Empty for texts shorter
    * than n. */
  def shingles(text: Column, n: Int): Column =
    when(length(text) < n, array().cast("array<string>"))
      .otherwise(array_distinct(
        transform(
          sequence(lit(1), length(text) - (n - 1)),
          i => substring(text, i, lit(n)))))

  /** Exact Jaccard similarity of two distinct-element array columns. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** Exact n-gram Jaccard pairs above `threshold`, via shingle inverted
    * index rather than an all-pairs nested loop: explode to (id, shingle),
    * self-join on shingle (shuffle hash join — parallel, no BNLJ), count
    * shared shingles per pair, then jac = |A∩B| / (|A|+|B|−|A∩B|).
    * Only pairs sharing ≥1 shingle are ever scored; with a similarity
    * threshold the non-sharing pairs are provably below it.
    *
    * Scale caveat: a shingle common to m docs contributes m² join rows —
    * at 100 TB apply a document-frequency cap on shingles (or use
    * [[minhashDedupPairs]], the sub-quadratic path). */
  def ngramJaccardPairs(
      df: DataFrame,
      n: Int,
      threshold: Double,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
      explode(shingles(col(textCol), n)).as("s"))
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val inter = sh.select(col("id").as("id_a"), col("s"))
      .join(sh.select(col("id").as("id_b"), col("s")), "s")
      .where(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("sz").as("sz_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("sz").as("sz_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        (col("inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("inter"))).as("jac"))
      .where(col("jac") > threshold)
  }

  // ------------------------------------------------------- MinHash LSH

  /** MinHash signature: `numHashes` independent min-hashes of the shingle
    * set. Hash family = xxhash64(shingle, seed_i) — deterministic, no RNG
    * state to broadcast. Pure higher-order column expression. */
  def minhashSignature(shingleCol: Column, numHashes: Int): Column =
    transform(
      sequence(lit(0), lit(numHashes - 1)),
      h => array_min(transform(shingleCol, s => xxhash64(s, h))))

  /** Candidate pairs via LSH banding: signature split into `bands` bands
    * of `rowsPerBand`; docs sharing any band hash become candidates.
    * Result is distinct (id_a < id_b) pairs; verify with exact Jaccard
    * downstream ([[minhashDedupPairs]]). */
  def minhashCandidates(
      df: DataFrame,
      n: Int,
      bands: Int,
      rowsPerBand: Int,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val numHashes = bands * rowsPerBand
    val sig = df
      .select(col(idCol).as("id"), shingles(col(textCol), n).as("sh"))
      .where(size(col("sh")) > 0)
      .select(col("id"), minhashSignature(col("sh"), numHashes).as("sig"))
    // band hash: xxhash64 over the band's slice rendered to one string
    val banded = sig.select(
      col("id"),
      posexplode(
        transform(
          sequence(lit(0), lit(bands - 1)),
          b =>
            xxhash64(
              concat_ws(",",
                transform(
                  slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)),
                  v => v.cast("string"))),
              b))).as(Seq("band", "bh")))
    val l = banded.select(col("band").as("band_l"), col("bh").as("bh_l"), col("id").as("id_a"))
    val r = banded.select(col("band").as("band_r"), col("bh").as("bh_r"), col("id").as("id_b"))
    l.join(r,
        l("band_l") === r("band_r") && l("bh_l") === r("bh_r") &&
          l("id_a") < r("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** MinHash LSH dedup: LSH candidates, then exact n-gram Jaccard filter
    * (so precision is exact; recall is the LSH knob). */
  def minhashDedupPairs(
      df: DataFrame,
      n: Int,
      threshold: Double,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val cand = minhashCandidates(df, n, bands, rowsPerBand, idCol, textCol)
    val sh = df.select(col(idCol).as("id"), shingles(col(textCol), n).as("sh"))
    cand
      .join(sh.withColumnsRenamed(Map("id" -> "id_a", "sh" -> "sh_a")), "id_a")
      .join(sh.withColumnsRenamed(Map("id" -> "id_b", "sh" -> "sh_b")), "id_b")
      .select(col("id_a"), col("id_b"), jaccard(col("sh_a"), col("sh_b")).as("jac"))
      .where(col("jac") > threshold)
  }

  // ----------------------------------------------------------- SimHash

  /** 64-bit SimHash over whitespace tokens: bit b of the fingerprint is
    * the sign of Σ_tokens (bit b of xxhash64(token) ? +1 : -1).
    * Declarative: 64 aggregate-over-tokens expressions folded into a
    * single long. */
  def simhash(text: Column): Column = {
    val toks = split(trim(text), "\\s+")
    val bits = (0 until 64).map { b =>
      val vote = aggregate(
        toks,
        lit(0L),
        (acc, t) =>
          acc + when(shiftright(xxhash64(t), b).bitwiseAND(1L) === 1L, 1L)
            .otherwise(-1L))
      when(vote > 0, lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: bucket by the fingerprint's high
    * `prefixBits` bits (near-dups usually share the prefix for small
    * Hamming radii), then exact Hamming filter within buckets. */
  def simhashPairs(
      df: DataFrame,
      maxHamming: Int,
      prefixBits: Int = 16,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val fp = df.select(col(idCol).as("id"), simhash(col(textCol)).as("fp"))
      .withColumn("bucket", shiftrightunsigned(col("fp"), 64 - prefixBits))
    val a = fp.select(col("bucket").as("bk_a"), col("id").as("id_a"), col("fp").as("fp_a"))
    val b = fp.select(col("bucket").as("bk_b"), col("id").as("id_b"), col("fp").as("fp_b"))
    a.join(b, a("bk_a") === b("bk_b") && a("id_a") < b("id_b"))
      .select(col("id_a"), col("id_b"),
        hamming(col("fp_a"), col("fp_b")).as("dist"))
      .where(col("dist") <= maxHamming)
  }

  // ------------------------------------------- embedding cosine near-dup

  /** Near-duplicate pairs by embedding cosine similarity (exact; the LSH
    * scale path is [[Similarity.lshTopK]]'s bucketing applied pairwise). */
  def embeddingNearDupPairs(
      df: DataFrame,
      threshold: Double,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame =
    Similarity.bruteForcePairs(df, threshold, idCol, embCol)
}
