package graft.checks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.model.ViolationKind

/** Uniqueness / duplicate-detection checks.
  *
  * Reference analogs:
  *  - #6 ValidIFPUsage (intrinsic/.../ValidIFPUsage.java:59-78): a
  *    second subject sharing an inverse-functional (P,O) pair is a
  *    violation → here, a second row sharing a `url` is a violation.
  *  - #1 ExtensionalConciseness (intrinsic/.../ExtensionalConciseness.java:92-134):
  *    O(n²) pairwise duplicate-entity detection → here an O(n) hash
  *    aggregation on `sha2(text)`.
  *
  * Scale notes: `url` is a high-cardinality, low-skew key, so the
  * groupBy is a clean hash partial-agg + shuffle on url; AQE handles
  * residual skew. The duplicate *groups* are a tiny fraction of rows,
  * so the post-aggregation filter collapses the output immediately.
  */
object Uniqueness {

  /** Duplicate-url groups: (url, n_rows, n_days). Violations of the
    * url-uniqueness constraint (kind ResourceReplica).
    */
  def duplicateUrls(pages: DataFrame, ordered: Boolean = true): DataFrame = {
    val out = pages.groupBy(col("url"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(FusedChecks.pday).as("n_days"))
      .where(col("n_rows") > 1)
    if (ordered) out.orderBy("url") else out
  }

  /** Global uniqueness verdict: one row
    * (rows, distinct_urls, dup_urls, dup_rows, value).
    * value = distinct/rows, the reference's uniqueSubjects/totalSubjects
    * shape (ExtensionalConciseness.java:136-140).
    */
  def urlUniqueness(pages: DataFrame): DataFrame =
    // group on xxhash64(url), not the url string: the shuffle carries
    // 8-byte keys instead of ~50-byte urls (urls are mostly unique, so
    // partial aggregation cannot shrink this shuffle — key width is the
    // whole cost). Exact modulo 64-bit collisions: expected colliding
    // pairs at 10^12 rows ≈ (10^12)²/2^65 ≈ 27 — below any verdict
    // threshold's resolution; the violation listing re-verifies by url.
    pages.select(xxhash64(col("url")).as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("n"))
      .agg(
        sum(col("n")).as("n_rows"),
        count(lit(1)).as("distinct_urls"),
        sum(when(col("n") > 1, 1L).otherwise(0L)).as("dup_urls"),
        sum(when(col("n") > 1, col("n")).otherwise(0L)).as("dup_rows"))
      .withColumn("value",
        col("distinct_urls").cast("double") / col("n_rows").cast("double"))

  /** Exact duplicate-content groups via sha2(text): groups of 2+ rows
    * with byte-identical non-empty text. Output
    * (text_sha, n_rows, n_urls, min_url).
    */
  def duplicateTexts(pages: DataFrame): DataFrame =
    pages.where(col("text").isNotNull && length(col("text")) > 0)
      .select(sha2(col("text"), 256).as("text_sha"), col("url"))
      .groupBy(col("text_sha"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("url")).as("n_urls"),
        min(col("url")).as("min_url"))
      .where(col("n_rows") > 1)
      .orderBy("text_sha")

  /** Latest-snapshot dedup: keep the newest crawl of each url
    * (SURVEY §2.3: the engine's one window use —
    * `Window.partitionBy(url).orderBy(warc_ts desc)`).
    * Output (url, warc_epoch) of the surviving row, ordered.
    */
  def latestSnapshot(pages: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("url"))
      .orderBy(col("warc_ts").desc_nulls_last)
    pages.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("url"), col("warc_ts").cast("long").as("warc_epoch"))
      .orderBy("url")
  }

  /** Violation rows for the url-uniqueness check (one per replica
    * group), hash-first: (1) find duplicate *hashes* with an 8-byte-key
    * shuffle, (2) broadcast the (tiny, by construction) duplicate-hash
    * set back over the table and group the few matching rows by the
    * actual url — which also makes the listing exact under hash
    * collisions.
    */
  /** Above this many duplicate hashes, fall back from a broadcast to a
    * shuffle semi-join: "tiny by construction" only holds for healthy
    * data — a crawler bug that re-crawls everything makes dupHashes ≈
    * all urls, and broadcasting that would OOM the driver.
    */
  val MaxBroadcastDupHashes = 5000000L

  def violations(pages: DataFrame, ordered: Boolean = true): DataFrame = {
    // checkpoint, not persist: the frame is consumed lazily by the
    // returned listing, and a persist here would pin its blocks in the
    // session CacheManager forever (strong refs — the ContextCleaner
    // only reclaims plain RDD/checkpoint blocks on GC)
    val dupHashes = pages.select(xxhash64(col("url")).as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("hn"))
      .where(col("hn") > 1)
      .select(col("h"))
      .localCheckpoint(true)
    val dupSide =
      if (dupHashes.count() <= MaxBroadcastDupHashes) broadcast(dupHashes) else dupHashes
    val groups = pages
      .join(dupSide, xxhash64(col("url")) === col("h"), "left_semi")
      .groupBy(col("url")).agg(count(lit(1)).as("n_rows"))
      .where(col("n_rows") > 1)
    (if (ordered) groups.orderBy("url") else groups).select(
      lit("unique_url").as("check_id"),
      lit(ViolationKind.ResourceReplica).as("kind"),
      lit("*").as("pday"),
      col("url"),
      concat(lit("url crawled "), col("n_rows"), lit(" times")).as("detail"))
  }
}
