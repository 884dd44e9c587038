package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import scala.util.Random

/** Near-duplicate detection over the text column: MinHash+LSH,
  * SimHash, and exact n-gram Jaccard verification.
  *
  * Reference analog: #1 ExtensionalConciseness detects duplicate
  * entities O(n²) pairwise (intrinsic/.../ExtensionalConciseness.java:92-134)
  * and #2 approximates it with Bloom filters
  * (EstimatedExtensionalConciseness.java:40-45). Here the scalable
  * re-expression is LSH banding: per-row signatures (linear, codegen'd
  * column expressions — no UDFs), explode to (band, bucket) keys, and a
  * bucket-local self-join — candidate pairs only, never the full cross
  * product. At 100 TB the shuffle carries one ~16-entry band array per
  * document, and bucket joins are bounded by bucket size.
  *
  * All hash seeds are fixed → identical output across runs and
  * parallelism levels.
  */
object Dedup {

  val NumHashes = 64
  val Bands = 16
  val RowsPerBand = 4 // NumHashes / Bands
  val ShingleSize = 3
  val JaccardThreshold = 0.7
  val HammingThreshold = 3

  // Fixed Carter-Wegman permutations h_j(x) = (a_j·x + b_j) mod P for
  // minhash (seeded). The mod is essential: an affine map without it is
  // order-preserving, so every "independent" hash would select the same
  // argmin and the bands would carry no independent information. The
  // 31-bit domain keeps a·x < 2^62 — ANSI mode (Spark 4 default) raises
  // on long overflow, so the overflow-wrapping trick is off the table.
  private[dedup] val MersenneP = 2147483647L // 2^31 - 1
  private val rnd = new Random(20240101L)
  private[dedup] val CoefA: IndexedSeq[Long] =
    IndexedSeq.fill(NumHashes)(1L + math.abs(rnd.nextLong()) % (MersenneP - 1))
  private[dedup] val CoefB: IndexedSeq[Long] =
    IndexedSeq.fill(NumHashes)(math.abs(rnd.nextLong()) % MersenneP)

  /** Distinct word n-gram shingles; whole text as single shingle when
    * shorter than n tokens.
    */
  def shingles(text: Column, n: Int = ShingleSize): Column = {
    val toks = split(trim(text), "\\s+")
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(array_distinct(
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
  }

  /** MinHash signature (NumHashes values) from the shingle set: one
    * xxhash64 per shingle, then NumHashes affine maps + array_min.
    */
  def signature(shingleCol: Column): Column = {
    val hs = transform(shingleCol, s => pmod(xxhash64(s), lit(1L << 31)))
    array((0 until NumHashes).map { j =>
      array_min(transform(hs, h => pmod(h * lit(CoefA(j)) + lit(CoefB(j)), lit(MersenneP))))
    }: _*)
  }

  /** LSH band keys: Bands entries of (band_id, xxhash64 of the band's
    * signature slice).
    */
  def bandKeys(sig: Column): Column =
    array((0 until Bands).map { b =>
      struct(lit(b).as("band_id"),
        xxhash64(lit(b), slice(sig, b * RowsPerBand + 1, RowsPerBand)).as("band_hash"))
    }: _*)

  /** Input normalization for the text-dedup family: distinct non-empty
    * (url, text) pairs.
    */
  def corpus(pages: DataFrame): DataFrame =
    pages.where(col("text").isNotNull && length(col("text")) > 0)
      .select(col("url"), col("text")).distinct()

  /** Exact Jaccard over shingle sets — used to verify LSH candidates. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** MinHash+LSH near-duplicate pairs, verified with exact Jaccard.
    * Output: (url_a, url_b, jaccard) with jaccard ≥ threshold, ordered.
    */
  def minhashPairs(pages: DataFrame, threshold: Double = JaccardThreshold): DataFrame = {
    val docs = corpus(pages)
      .withColumn("sh", shingles(col("text")))
      .withColumn("bands", bandKeys(signature(col("sh"))))
      .select(col("url"), col("sh"), explode(col("bands")).as("b"))
      .select(col("url"), col("sh"), col("b.band_id"), col("b.band_hash"))
    val l = docs.select(col("url").as("url_a"), col("sh").as("sh_a"),
      col("band_id"), col("band_hash"))
    val r = docs.select(col("url").as("url_b"), col("sh").as("sh_b"),
      col("band_id"), col("band_hash"))
    l.join(r, Seq("band_id", "band_hash"))
      .where(col("url_a") < col("url_b"))
      .select(col("url_a"), col("url_b"), round(jaccard(col("sh_a"), col("sh_b")), 6).as("jaccard"))
      .where(col("jaccard") >= threshold)
      .distinct()
      .orderBy("url_a", "url_b")
  }

  /** 64-bit SimHash over whitespace tokens (per-bit majority vote of
    * token hashes), as a pure column expression.
    */
  def simhash(text: Column): Column = {
    val hs = transform(split(trim(text), "\\s+"), t => xxhash64(t))
    (0 until 64).map { i =>
      val vote = aggregate(hs, lit(0L),
        (acc, h) => acc + (shiftright(h, i).bitwiseAND(lit(1L)) * 2 - 1))
      when(vote > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** SimHash near-duplicate pairs: candidates blocked on any equal
    * 16-bit chunk (pigeonhole: hamming ≤ 3 ⇒ at least one of 4 chunks
    * equal), verified with bit_count(xor) ≤ threshold.
    * Output: (url_a, url_b, hamming), ordered.
    */
  def simhashPairs(pages: DataFrame, maxHamming: Int = HammingThreshold): DataFrame = {
    val docs = corpus(pages).withColumn("sh64", simhash(col("text")))
    val chunks = docs.select(col("url"), col("sh64"),
      explode(array((0 until 4).map { c =>
        struct(lit(c).as("chunk_id"),
          shiftright(col("sh64"), c * 16).bitwiseAND(lit(0xFFFFL)).as("chunk_val"))
      }: _*)).as("c"))
      .select(col("url"), col("sh64"), col("c.chunk_id"), col("c.chunk_val"))
    val l = chunks.select(col("url").as("url_a"), col("sh64").as("h_a"),
      col("chunk_id"), col("chunk_val"))
    val r = chunks.select(col("url").as("url_b"), col("sh64").as("h_b"),
      col("chunk_id"), col("chunk_val"))
    l.join(r, Seq("chunk_id", "chunk_val"))
      .where(col("url_a") < col("url_b"))
      .select(col("url_a"), col("url_b"),
        bit_count(col("h_a").bitwiseXOR(col("h_b"))).cast("long").as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
      .orderBy("url_a", "url_b")
  }

  /** Brute-force n-gram Jaccard pairs (the small-scale oracle for the
    * LSH path; O(n²) — only for bounded inputs / tests).
    */
  def bruteJaccardPairs(pages: DataFrame, threshold: Double = JaccardThreshold): DataFrame = {
    val docs = corpus(pages).withColumn("sh", shingles(col("text")))
    val l = docs.select(col("url").as("url_a"), col("sh").as("sh_a"))
    val r = docs.select(col("url").as("url_b"), col("sh").as("sh_b"))
    l.crossJoin(r)
      .where(col("url_a") < col("url_b"))
      .select(col("url_a"), col("url_b"), round(jaccard(col("sh_a"), col("sh_b")), 6).as("jaccard"))
      .where(col("jaccard") >= threshold)
      .orderBy("url_a", "url_b")
  }

  /** Dedup-rate summary: documents, distinct fingerprints, near-dup
    * pairs found (minhash), as a one-row report.
    */
  def summary(pages: DataFrame): DataFrame = {
    val docs = corpus(pages)
    val spark = pages.sparkSession
    import spark.implicits._
    Seq((docs.count(), minhashPairs(pages).count()))
      .toDF("n_docs", "near_dup_pairs")
  }
}
