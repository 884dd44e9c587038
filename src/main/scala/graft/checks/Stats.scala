package graft.checks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column-statistics checks (SURVEY §7.0 "Completeness" row).
  * Single-pass multi-aggregate per partition-day — the Spark analog of
  * the reference folding every metric over one quad stream.
  */
object Stats {

  /** Per-pday min/max/avg profile of the numeric-ish columns.
    * Reference analog: the "exists / scalar profile" metrics
    * (#23 PresenceOfURIRegEx, #34/#35 accessibility booleans) — scalar
    * facts about the dataset computed in one pass.
    * Timestamps reported as epoch seconds (bigint) so the DuckDB oracle
    * never crosses a timezone boundary.
    */
  def minMaxByDay(pages: DataFrame): DataFrame =
    pages.withColumn("pday", FusedChecks.pday)
      .groupBy(col("pday"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("warc_ts").cast("long")).as("min_epoch"),
        max(col("warc_ts").cast("long")).as("max_epoch"),
        min(length(col("text"))).cast("long").as("min_text_len"),
        max(length(col("text"))).cast("long").as("max_text_len"),
        min(length(col("url"))).cast("long").as("min_url_len"),
        max(length(col("url"))).cast("long").as("max_url_len"))
      .orderBy("pday")

  /** Per-pday exact distinct counts (url, lang, host).
    * Implementation note: one `countDistinct` per column in a single
    * groupBy triggers Spark's expand-based multi-distinct — acceptable
    * because pday partitions are independent; at 100 TB each distinct
    * is a partial-agg per input partition then a per-pday merge.
    */
  def distinctByDay(pages: DataFrame): DataFrame =
    pages.withColumn("pday", FusedChecks.pday)
      .withColumn("host", regexp_extract(col("url"), "^https?://([^/?]+)", 1))
      .groupBy(col("pday"))
      .agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("url")).as("distinct_url"),
        countDistinct(col("lang")).as("distinct_lang"),
        countDistinct(when(col("host") =!= "", col("host"))).as("distinct_host"))
      .orderBy("pday")

  /** Per-entity language-count distribution (#21 MultipleLanguageUsage,
    * versatility/.../MultipleLanguageUsage.java:52-89: per-subject
    * label-language sets → here per-url distinct declared langs across
    * crawls). Output: (n_langs, n_urls) histogram, ordered. Two chained
    * hash aggregations — url is high-cardinality/low-skew, and the
    * second groupBy is over ≤ #langs tiny rows.
    */
  def multiLangUsage(pages: DataFrame): DataFrame =
    pages.where(col("lang").isNotNull)
      .groupBy(col("url")).agg(countDistinct(col("lang")).as("n_langs"))
      .groupBy(col("n_langs")).agg(count(lit(1)).as("n_urls"))
      .orderBy("n_langs")

  /** Approximate distinct via HyperLogLog++ next to the exact count.
    * Reference analog: #2 EstimatedExtensionalConciseness's RLBS Bloom
    * approximation (k=13, m=5.5e6, fpp 0.01); HLL++ rsd=0.01 is the
    * Spark-native equivalent. Output includes the relative error and an
    * `ok` flag — values are engine-specific, so this check is verified
    * rows-only by the driver (no SQL oracle), and by the bound in tests.
    */
  def approxDistinct(pages: DataFrame, rsd: Double = 0.01): DataFrame =
    pages.agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col("url")).as("exact_url"),
      approx_count_distinct(col("url"), rsd).as("approx_url"))
      .withColumn("rel_err",
        abs(col("approx_url").cast("double") / col("exact_url").cast("double") - 1.0))
      .withColumn("ok", col("rel_err") < 0.05)
}
