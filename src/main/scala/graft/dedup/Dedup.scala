package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import scala.util.Random

/** Near-duplicate detection over the text column: MinHash+LSH, SimHash,
  * exact n-gram Jaccard verification, and duplicate-cluster formation.
  *
  * Reference analog: #1 ExtensionalConciseness detects duplicate
  * entities O(n²) pairwise (intrinsic/.../ExtensionalConciseness.java:92-134)
  * and #2 approximates it with Bloom filters
  * (EstimatedExtensionalConciseness.java:40-45). The scalable
  * re-expression is LSH banding — candidate pairs only, never the full
  * cross product — with three structural guarantees for 100 TB inputs:
  *
  *  1. **Exact duplicates collapse first.** Web corpora are dominated by
  *     byte-identical boilerplate; every member of an exact-dup group
  *     shares every band, so running LSH on raw documents makes each
  *     boilerplate bucket quadratic (|group|²·bands candidate pairs —
  *     203 s at 5k docs in round 1). Grouping by normalized-text
  *     fingerprint first ([[corpusGroups]]) reduces the LSH input to
  *     *distinct texts* and re-attaches group sizes to the output.
  *  2. **Only 8–16-byte keys cross the band shuffle.** The band join
  *     carries (rep, band_id, band_hash); shingle arrays are joined
  *     back *after* candidate generation, from a compact
  *     (rep, array<long>) side, only for the pairs that need exact
  *     Jaccard verification.
  *  3. **No silent quadratic buckets.** Banding's residual hazard is
  *     many *distinct* templated texts agreeing on a band; buckets over
  *     [[MaxBucketSize]] reps are dropped from candidate generation
  *     with a logged drop count (the "no silent caps" rule) — an
  *     adversarial template cluster degrades recall measurably instead
  *     of detonating the join.
  *
  * Execution model (round 3): the pair operators are **eager** — they
  * materialize the verified pair list via `localCheckpoint` and
  * unpersist their compact intermediates before returning. Dataset
  * `persist` registers the plan in the session CacheManager, which
  * holds strong references — the ContextCleaner never reclaims those
  * blocks, so a lazily-returned plan over persisted intermediates
  * leaks corpus-scale cache for the driver's lifetime. The checkpoint
  * blocks themselves are plain RDD storage, which the ContextCleaner
  * *does* free once the returned frame is unreferenced.
  *
  * All hashing is md5-derived (no xxhash64) so the DuckDB oracle
  * recomputes the identical signatures/fingerprints — every operator
  * here is value-verified end-to-end, not just row-counted.
  */
object Dedup {

  val NumHashes = 96
  val Bands = 24
  val RowsPerBand = 4 // NumHashes / Bands; candidate threshold ≈ (1/24)^(1/4) ≈ 0.45
  val ShingleSize = 3
  val JaccardThreshold = 0.7

  /** Candidate-generation bucket cap: LSH buckets (equal band value /
    * chunk value) with more than this many distinct-text reps are
    * dropped, with a logged count. For healthy corpora buckets hold a
    * handful of reps (the exact-dup collapse already removed identical
    * texts); a bucket this size means a pathological template family
    * whose candidate pairs would be quadratic.
    */
  val MaxBucketSize = 10000L

  /** SimHash: 60 bits (15 hex digits of md5 per token), 4 chunks of 15
    * bits. Pigeonhole: hamming ≤ 3 ⇒ at least one chunk equal, so the
    * chunk join has recall 1 *by construction*. 15-bit chunks keep
    * buckets at N/32768 per chunk value — wider chunks are the only way
    * chunk-LSH survives 10^12 rows, which is why the hamming bound
    * stays small and the long-document C/C′ pair is the fixture for it.
    */
  val SimhashBits = 60
  val SimhashChunks = 4
  val ChunkBits = 15
  val HammingThreshold = 3

  // Fixed Carter-Wegman permutations h_j(x) = (a_j·x + b_j) mod P for
  // minhash (seeded). The mod is essential: an affine map without it is
  // order-preserving, so every "independent" hash would select the same
  // argmin and the bands would carry no independent information. The
  // 28-bit shingle domain keeps a·x < 2^59 — ANSI mode (Spark 4
  // default) raises on long overflow, and DuckDB checks BIGINT overflow
  // too, so both engines need the product bounded.
  private[dedup] val MersenneP = 2147483647L // 2^31 - 1
  private val rnd = new Random(20240101L)
  private[dedup] val CoefA: IndexedSeq[Long] =
    IndexedSeq.fill(NumHashes)(1L + math.abs(rnd.nextLong()) % (MersenneP - 1))
  private[dedup] val CoefB: IndexedSeq[Long] =
    IndexedSeq.fill(NumHashes)(math.abs(rnd.nextLong()) % MersenneP)

  /** Whitespace-normalized text (the fingerprint domain) — native byte
    * scan; [[normTextDeclarative]] is the parity-spec anchor.
    */
  def normText(text: Column): Column =
    graft.functions.TextScan2Fn.normText(text)

  /** The pre-round-5 declarative spelling, kept for the parity spec. */
  private[graft] def normTextDeclarative(text: Column): Column =
    regexp_replace(trim(text), "\\s+", " ")

  /** Distinct-text groups: one row per normalized-text fingerprint with
    * its representative (min url), the normalized text, and the member
    * count. This is the input to every near-dup operator — the exact-dup
    * collapse that bounds LSH bucket sizes.
    */
  def corpusGroups(pages: DataFrame): DataFrame =
    pages.where(col("text").isNotNull)
      .select(col("url"), normText(col("text")).as("norm"))
      .where(length(col("norm")) > 0)
      .groupBy(md5(col("norm")).as("fp"))
      .agg(min(col("url")).as("rep"), min(col("norm")).as("norm"),
        count(lit(1)).as("n_docs"))

  /** Distinct word n-gram shingles over normalized text; whole text as
    * single shingle when shorter than n tokens.
    */
  def shingles(norm: Column, n: Int = ShingleSize): Column = {
    val toks = split(norm, " ")
    when(size(toks) < n, array(norm))
      .otherwise(array_distinct(
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
  }

  /** First 7 hex digits of md5 → 28-bit integer (DuckDB mirrors this
    * digit-by-digit; `conv` is the Spark spelling of the same value).
    */
  private def hex7Int(c: Column): Column =
    conv(substring(md5(c), 1, 7), 16, 10).cast("long")

  /** 60-bit integer from the first 15 hex digits of md5. */
  private def hex15Int(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Shingle set as 28-bit integers — the compact verification payload
    * (an ~100-entry long array instead of the raw text n-grams).
    */
  def hashedShingles(norm: Column): Column =
    array_distinct(transform(shingles(norm), s => hex7Int(s)))

  /** MinHash signature (NumHashes values) from the hashed shingle set.
    * Native expression ([[graft.functions.MinHashSignature]]): the
    * declarative 96-way `array_min(transform(...))` spelling overflows
    * Janino's 64 KB method limit and drops the whole stage to
    * interpreted eval — 70 s for 5k docs in the round-2 bench; the
    * one-pass loop is bit-identical and stays codegen'd.
    */
  def signature(hs: Column): Column =
    graft.functions.MinHash.signature(hs, CoefA.toArray, CoefB.toArray, MersenneP)

  /** The pre-round-2 declarative signature, kept for the parity spec. */
  private[graft] def signatureDeclarative(hs: Column): Column =
    array((0 until NumHashes).map { j =>
      array_min(transform(hs, h => pmod(h * lit(CoefA(j)) + lit(CoefB(j)), lit(MersenneP))))
    }: _*)

  /** LSH band keys: Bands entries of (band_id, md5 of the band's
    * signature slice rendered as "v,v,v,v").
    */
  def bandKeys(sig: Column): Column =
    array((0 until Bands).map { b =>
      struct(lit(b).as("band_id"),
        md5(concat_ws(",", (0 until RowsPerBand).map(r =>
          element_at(sig, b * RowsPerBand + r + 1).cast("string")): _*)).as("band_hash"))
    }: _*)

  /** Exact Jaccard over hashed shingle sets, rounded for cross-engine
    * value parity.
    */
  def jaccard(a: Column, b: Column): Column =
    round(size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double"), 6)

  /** Drop candidate-generation rows in oversized buckets (keys
    * `keyCols`), returning the filtered frame and the number of dropped
    * buckets (also logged). `keyed` must already be materialized
    * (persisted/checkpointed) — the size pass and the anti-join both
    * re-read it. Shared by the text (minhash/simhash) and embedding
    * ([[graft.sim.Similarity]]) LSH paths; callers that fold the check
    * into the assessment lifecycle surface the dropped-bucket count in
    * their audit params so a capped (reduced-recall) run is
    * distinguishable downstream, not just in driver stderr.
    */
  private[graft] def capBucketsCounted(keyed: DataFrame, keyCols: Seq[String],
      what: String, maxBucket: Long): (DataFrame, Long) = {
    val oversized = keyed.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("bn"))
      .where(col("bn") > maxBucket)
      .localCheckpoint(true) // tiny by construction; also gives the count
    val nOver = oversized.count()
    if (nOver == 0) (keyed, 0L)
    else {
      // no silent caps: an adversarial template family degrades recall
      // measurably, with the evidence in the log + audit params, instead
      // of detonating the candidate join
      System.err.println(
        s"[dedup] $what: dropped $nOver LSH bucket(s) larger than $maxBucket reps " +
          s"from candidate generation (max size ${oversized.agg(max("bn")).head().getLong(0)})")
      (keyed.join(broadcast(oversized.select(keyCols.map(col): _*)), keyCols, "left_anti"),
        nOver)
    }
  }

  private def capBuckets(keyed: DataFrame, keyCols: Seq[String],
      what: String, maxBucket: Long): DataFrame =
    capBucketsCounted(keyed, keyCols, what, maxBucket)._1

  /** MinHash+LSH near-duplicate *representative* pairs, verified with
    * exact Jaccard. Output: (url_a, url_b, jaccard, n_docs_a, n_docs_b)
    * with jaccard ≥ threshold, ordered — url_a/url_b are the min-url
    * representatives of two distinct-text groups, n_docs_* the group
    * sizes (the fan-out accounting; emitting all member pairs would be
    * quadratic in group size by definition).
    *
    * Eager: the verified pair list (tiny — defect-rate-bounded) is
    * materialized before returning and the distinct-text intermediates
    * are unpersisted (see the class doc on CacheManager leaks).
    */
  def minhashPairs(pages: DataFrame, threshold: Double = JaccardThreshold,
      maxBucket: Long = MaxBucketSize): DataFrame =
    minhashPairsFromGroups(corpusGroups(pages), threshold, maxBucket)

  /** Eager pair list plus the dropped-bucket count (no silent caps —
    * the suite surfaces `cappedBuckets` in its audit params so a
    * reduced-recall run is distinguishable downstream).
    */
  final case class PairsCounted(pairs: DataFrame, cappedBuckets: Long)

  /** [[minhashPairs]] over a pre-built [[corpusGroups]] frame — callers
    * that already hold the distinct-text groups pass them in so the
    * corpus-scale group-collapse scan runs once, not once per consumer.
    */
  def minhashPairsFromGroups(groups: DataFrame, threshold: Double = JaccardThreshold,
      maxBucket: Long = MaxBucketSize): DataFrame =
    minhashPairsFromHashed(
      groups.select(col("rep"), col("n_docs"), hashedShingles(col("norm")).as("hs")),
      threshold, maxBucket).pairs

  /** [[minhashPairsFromGroups]] over groups that already carry hashed
    * shingles (`rep`, `n_docs`, `hs`): the signature is computed into a
    * row-format checkpoint (one materialization) and the LSH pipeline
    * proper runs from it ([[minhashPairsFromSigned]]).
    */
  def minhashPairsFromHashed(hashed: DataFrame, threshold: Double = JaccardThreshold,
      maxBucket: Long = MaxBucketSize): PairsCounted = {
    // The signature is materialized INTO the checkpointed side: bandKeys
    // references the signature array 96× (24 bands × 4 slice reads),
    // and expression-tree duplication means a non-materialized
    // signature(hs) subtree re-evaluates per reference wherever
    // codegen's subexpression elimination doesn't reach — measured as a
    // 10 s single-partition band materialization at sf0.1 (~40× the
    // one-pass cost). As an attribute it is computed exactly once per
    // row, during the compact checkpoint build.
    val signed = hashed
      .select(col("rep"), col("n_docs"), col("hs"), signature(col("hs")).as("sig"))
      .localCheckpoint(true)
    minhashPairsFromSigned(signed, threshold, maxBucket)
  }

  /** LSH pipeline over an ALREADY-MATERIALIZED (checkpointed) frame
    * carrying (`rep`, `n_docs`, `hs`, `sig`). The frame feeds four
    * consumers (both sides of the band self-join and both verification
    * sides); self-join sides get fresh attribute ids
    * (DeduplicateRelations) and AQE's stage-reuse cache does not
    * collapse these subtrees, so the caller-side materialization is
    * what keeps the shingling/signature pass from re-executing 4×
    * (measured in round 2: 3/4 of the operator's wall-clock).
    * Round-6: [[clusterLabels]] folds `sig` into its one groups
    * checkpoint, so the former second materialization (a columnar
    * persist of the same hs+sig data) is gone — one corpus-derived
    * materialization instead of two.
    */
  def minhashPairsFromSigned(signed: DataFrame, threshold: Double = JaccardThreshold,
      maxBucket: Long = MaxBucketSize): PairsCounted = {
    // band join: keys only, no arrays. Row-format localCheckpoint, NOT
    // persist — the columnar cache build of the two string columns runs
    // at ~10k rows/s/core (round-2 lesson #6) and inherits the input's
    // partitioning; checkpoint blocks are O(data) to write and
    // ContextCleaner-freed once unreferenced.
    val bandsAll = signed.select(col("rep"), explode(bandKeys(col("sig"))).as("b"))
      .select(col("rep"), col("b.band_id"), col("b.band_hash"))
      .localCheckpoint(true)
    val (bands, capped) = capBucketsCounted(bandsAll, Seq("band_id", "band_hash"), "minhash", maxBucket)
    val cand = bands.select(col("rep").as("rep_a"), col("band_id"), col("band_hash"))
      .join(bands.select(col("rep").as("rep_b"), col("band_id"), col("band_hash")),
        Seq("band_id", "band_hash"))
      .where(col("rep_a") < col("rep_b"))
      .select("rep_a", "rep_b").distinct()
    // verification join: compact (rep, int-array, size) side, pairs only
    val a = signed.select(col("rep").as("rep_a"), col("hs").as("hs_a"), col("n_docs").as("n_docs_a"))
    val b = signed.select(col("rep").as("rep_b"), col("hs").as("hs_b"), col("n_docs").as("n_docs_b"))
    val verified = cand.join(a, "rep_a").join(b, "rep_b")
      .select(col("rep_a").as("url_a"), col("rep_b").as("url_b"),
        jaccard(col("hs_a"), col("hs_b")).as("jaccard"),
        col("n_docs_a"), col("n_docs_b"))
      .where(col("jaccard") >= threshold)
      .localCheckpoint(true)
    PairsCounted(verified.orderBy("url_a", "url_b"), capped)
  }

  /** Per-token 60-bit hashes over normalized text (with repeats —
    * simhash weights by term frequency).
    */
  def tokenHashes(norm: Column): Column =
    transform(split(norm, " "), t => hex15Int(t))

  /** 60-bit SimHash (per-bit majority vote of token hashes). Native
    * one-pass expression ([[graft.functions.SimHash]]) — the 60-fold
    * `aggregate(...)` spelling re-walks the token array per bit in
    * interpreted eval (minutes at 5k docs); values are identical.
    */
  def simhash(norm: Column): Column =
    graft.functions.SimHashFn.simhash(tokenHashes(norm), SimhashBits)

  /** The pre-round-2 declarative simhash, kept for the parity spec. */
  private[graft] def simhashDeclarative(norm: Column): Column = {
    val hs = tokenHashes(norm)
    (0 until SimhashBits).map { i =>
      val vote = aggregate(hs, lit(0L),
        (acc, h) => acc + (shiftright(h, i).bitwiseAND(lit(1L)) * 2 - 1))
      when(vote > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** SimHash near-duplicate representative pairs: candidates blocked on
    * any equal 15-bit chunk (pigeonhole-complete for hamming ≤ 3),
    * verified with bit_count(xor). Output
    * (url_a, url_b, hamming, n_docs_a, n_docs_b), ordered. Eager, like
    * [[minhashPairs]].
    */
  def simhashPairs(pages: DataFrame, maxHamming: Int = HammingThreshold,
      maxBucket: Long = MaxBucketSize): DataFrame =
    simhashPairsFromHashes(
      corpusGroups(pages)
        .select(col("rep"), col("n_docs"), simhash(col("norm")).as("sh64")),
      maxHamming, maxBucket)

  /** [[simhashPairs]] over a [[clusterLabelsCounted]] groups frame that
    * already carries `sh64` (built with `withSimhash = true`): the
    * corpus-collapse scan and the per-token md5 hashing ran once,
    * inside the shared groups materialization — this path re-reads the
    * compact checkpoint instead of re-scanning the corpus.
    */
  def simhashPairsFromGroups(groups: DataFrame, maxHamming: Int = HammingThreshold,
      maxBucket: Long = MaxBucketSize): DataFrame =
    simhashPairsFromHashes(groups.select(col("rep"), col("n_docs"), col("sh64")),
      maxHamming, maxBucket)

  private def simhashPairsFromHashes(docs: DataFrame, maxHamming: Int,
      maxBucket: Long): DataFrame = {
    // shared materialization barrier (see minhashPairs): `chunks` feeds
    // the bucket-size pass and both sides of the chunk self-join
    val chunksAll = docs.select(col("rep"), col("sh64"), col("n_docs"),
      explode(array((0 until SimhashChunks).map { c =>
        struct(lit(c).as("chunk_id"),
          shiftright(col("sh64"), c * ChunkBits)
            .bitwiseAND(lit((1L << ChunkBits) - 1)).as("chunk_val"))
      }: _*)).as("c"))
      .select(col("rep"), col("sh64"), col("n_docs"), col("c.chunk_id"), col("c.chunk_val"))
      .localCheckpoint(true) // row-format, not the slow columnar cache (see minhashPairsFromHashed)
    val chunks = capBuckets(chunksAll, Seq("chunk_id", "chunk_val"), "simhash", maxBucket)
    val l = chunks.select(col("rep").as("url_a"), col("sh64").as("h_a"),
      col("n_docs").as("n_docs_a"), col("chunk_id"), col("chunk_val"))
    val r = chunks.select(col("rep").as("url_b"), col("sh64").as("h_b"),
      col("n_docs").as("n_docs_b"), col("chunk_id"), col("chunk_val"))
    val verified = l.join(r, Seq("chunk_id", "chunk_val"))
      .where(col("url_a") < col("url_b"))
      .select(col("url_a"), col("url_b"),
        bit_count(col("h_a").bitwiseXOR(col("h_b"))).cast("long").as("hamming"),
        col("n_docs_a"), col("n_docs_b"))
      .where(col("hamming") <= maxHamming)
      .distinct()
      .localCheckpoint(true)
    verified.orderBy("url_a", "url_b")
  }

  /** Brute-force Jaccard pairs over the collapsed groups (the O(g²)
    * exact baseline for the LSH path; tests / bounded inputs only).
    */
  def bruteJaccardPairs(pages: DataFrame, threshold: Double = JaccardThreshold): DataFrame = {
    val sh = corpusGroups(pages)
      .select(col("rep"), col("n_docs"), hashedShingles(col("norm")).as("hs"))
    val a = sh.select(col("rep").as("url_a"), col("hs").as("hs_a"), col("n_docs").as("n_docs_a"))
    val b = sh.select(col("rep").as("url_b"), col("hs").as("hs_b"), col("n_docs").as("n_docs_b"))
    a.crossJoin(b)
      .where(col("url_a") < col("url_b"))
      .select(col("url_a"), col("url_b"), jaccard(col("hs_a"), col("hs_b")).as("jaccard"),
        col("n_docs_a"), col("n_docs_b"))
      .where(col("jaccard") >= threshold)
      .orderBy("url_a", "url_b")
  }

  /** Above this many verified pairs, cluster formation switches from
    * driver-side union-find to the distributed label-propagation loop
    * ([[Components]]). The pair list is representative-level (post
    * exact-dup collapse, post Jaccard verification), so even web-scale
    * corpora typically stay far under it.
    */
  val UnionFindMaxPairs: Long = Components.MaxDriverPairs

  /** Materialized cluster-formation frames: `groups` the compact
    * distinct-text frame (fp, rep, n_docs, hs — hashed shingles, no raw
    * text), `labels` the (node, label) map over every clustered rep,
    * `pairs` the verified minhash pair list (the ordered
    * [[minhashPairs]] output — callers needing both the pairs and the
    * clusters reuse it instead of re-running the LSH pipeline), and
    * `cappedBuckets` the LSH drop count (0 = full recall).
    */
  final case class LabelsResult(groups: DataFrame, labels: DataFrame,
      pairs: DataFrame, cappedBuckets: Long)

  /** Connected-component labels over the verified near-dup pair graph,
    * plus exact-dup groups with no near-dup edge as singleton clusters.
    * Both returned frames are checkpoint-backed — no CacheManager
    * entries survive the call. The checkpointed groups are the COMPACT
    * hashed form (fp, rep, n_docs, hs): shingling runs before the
    * checkpoint because `norm` has no other downstream consumer, so the
    * materialization holds ~200 ints per distinct text instead of the
    * raw normalized text (~3-5× smaller at web scale).
    */
  def clusterLabelsCounted(pages: DataFrame,
      threshold: Double = JaccardThreshold,
      unionFindMaxPairs: Long = UnionFindMaxPairs,
      withSimhash: Boolean = false): LabelsResult = {
    // ONE corpus-scale collapse scan AND one materialization: the
    // checkpointed groups carry the hashed shingles, the minhash
    // signature (computed here, in the same codegen stage — the stacked
    // projection reuses `hs` without re-shingling) and, when requested,
    // the 60-bit simhash — so the LSH pipeline, the singleton-cluster
    // union, the callers' size/total aggregates AND the simhash-pair
    // consumer all read this one checkpoint. Round-5 shape paid a
    // second materialization (a columnar persist of hs+sig) plus, for
    // simhash consumers, a whole second corpus scan.
    val simCol = if (withSimhash) Seq(simhash(col("norm")).as("sh64")) else Nil
    val groups = corpusGroups(pages)
      .select(Seq(col("fp"), col("rep"), col("n_docs"),
        hashedShingles(col("norm")).as("hs")) ++ simCol: _*)
      // stacked projection: `sig` reads the `hs` attribute of the
      // projection below (CollapseProject keeps non-cheap exprs
      // single-evaluated), so shingles hash once per row
      .withColumn("sig", signature(col("hs")))
      .localCheckpoint(true)
    val pc = minhashPairsFromSigned(groups, threshold) // eager (checkpointed)
    val labels = Components.labels(
      pc.pairs.select(col("url_a"), col("url_b")), unionFindMaxPairs)

    // exact-dup groups with no near-dup edge form their own cluster
    // (left_anti: both sides are already duplicate-free — reps are
    // distinct across groups, labels carry one row per node — so the
    // anti-join is `except` minus its two distinct passes)
    val dupReps = groups.where(col("n_docs") > 1).select(col("rep").as("node"))
      .join(labels.select("node"), Seq("node"), "left_anti")
      .withColumn("label", col("node"))
    val allLabels = labels.select("node", "label").union(dupReps).localCheckpoint(true)
    LabelsResult(groups, allLabels, pc.pairs, pc.cappedBuckets)
  }

  /** Binary-compatible view of [[clusterLabelsCounted]]. */
  def clusterLabels(pages: DataFrame,
      threshold: Double = JaccardThreshold,
      unionFindMaxPairs: Long = UnionFindMaxPairs): (DataFrame, DataFrame) = {
    val r = clusterLabelsCounted(pages, threshold, unionFindMaxPairs)
    (r.groups, r.labels)
  }

  /** Duplicate-cluster formation: connected components over the
    * verified near-dup pair graph, plus exact-dup groups as singleton
    * clusters, fanned back out to every member document. Output:
    * (url, cluster_rep) for every document that belongs to a duplicate
    * cluster (exact or near), ordered — the map a training-data
    * pipeline uses to keep one representative per cluster.
    *
    * The pair graph is a small fraction of the corpus (defect-rate
    * bounded), so cluster formation runs over the *edge set only*; the
    * full corpus is touched exactly twice (group + fan-out), never
    * inside the labeling loop.
    *
    * Reference analog: ExtensionalConciseness counts unique *subjects*
    * (entities), not pairs (ExtensionalConciseness.java:92-140) — the
    * cluster map is what turns pairs back into entity-level dedup.
    */
  def clusters(pages: DataFrame, threshold: Double = JaccardThreshold,
      unionFindMaxPairs: Long = UnionFindMaxPairs): DataFrame = {
    val (groups, allLabels) = clusterLabels(pages, threshold, unionFindMaxPairs)
    clustersFrom(pages, groups, allLabels)
  }

  /** [[clusters]] fan-out from pre-built [[clusterLabels]] frames —
    * harness callers that run both the member map and the size table
    * share one cluster formation instead of executing the LSH pipeline
    * twice.
    */
  def clustersFrom(pages: DataFrame, groups: DataFrame,
      allLabels: DataFrame): DataFrame = {
    val docs = pages.where(col("text").isNotNull)
      .select(col("url"), normText(col("text")).as("norm"))
      .where(length(col("norm")) > 0)
      .select(col("url"), md5(col("norm")).as("fp"))
    docs
      .join(groups.select(col("fp"), col("rep")), "fp")
      .join(allLabels, col("rep") === col("node"))
      .select(col("url"), col("label").as("cluster_rep"))
      .distinct()
      .orderBy("url", "cluster_rep")
  }

  /** Per-cluster document counts — the fan-out accounting *without* a
    * second corpus scan: cluster members = Σ n_docs over the cluster's
    * distinct-text groups. Output (cluster_rep, n_docs, n_reps),
    * ordered. This is the suite's near-dup surface (verdict numerator +
    * violation listing).
    */
  def clusterSizes(pages: DataFrame, threshold: Double = JaccardThreshold): DataFrame = {
    val (groups, allLabels) = clusterLabels(pages, threshold)
    clusterSizesFrom(groups, allLabels)
  }

  /** [[clusterSizes]] from pre-built [[clusterLabels]] frames. */
  def clusterSizesFrom(groups: DataFrame, allLabels: DataFrame): DataFrame =
    allLabels.join(groups.select(col("rep").as("node"), col("n_docs")), "node")
      .groupBy(col("label").as("cluster_rep"))
      .agg(sum(col("n_docs")).as("n_docs"), count(lit(1)).as("n_reps"))
      .orderBy("cluster_rep")
}
