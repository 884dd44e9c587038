package graft.checks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-safe host-level aggregation via explicit salting
  * (SURVEY §4.2): hosts are Zipfian (one host owns ~40% of pages), so a
  * single-phase `groupBy(host)` with a heavy aggregate concentrates one
  * reducer. The two-phase form
  *
  * {{{ groupBy(host, pmod(xxhash64(url), S)) → partial   // S-way spread
  *     groupBy(host)                        → final merge }}}
  *
  * spreads the hot key over S reducers before the cheap final merge —
  * the same proportional-spread idea as the reference's stratified
  * re-sampling (EstimatedDereferenceabilityByStratified.java:152-173).
  *
  * For plain sums Spark's map-side partial aggregation already handles
  * skew; salting matters for aggregates with large per-group state —
  * here per-host distinct-url counting, whose single-phase form makes
  * the hot host's reducer hold its whole distinct set.
  */
object Salting {

  val DefaultSalts = 32

  /** Per-host profile with salted two-phase aggregation:
    * (host, n_rows, distinct_urls, n_days). Exact — identical to the
    * unsalted result (asserted in tests + DuckDB oracle) — but no
    * reducer ever sees more than ~1/S of the hottest host.
    */
  def hostProfile(pages: DataFrame, salts: Int = DefaultSalts): DataFrame = {
    val withHost = pages
      .withColumn("host", Referential.hostExpr)
      .where(col("host") =!= "")
      .withColumn("pday", FusedChecks.pday)
      .withColumn("salt", pmod(xxhash64(col("url")), lit(salts.toLong)))
    // phase 1: per (host, salt) partials — distinct within salt is exact
    // because the salt is a pure function of url (equal urls co-locate)
    val partial = withHost.groupBy(col("host"), col("salt"))
      .agg(
        count(lit(1)).as("p_rows"),
        countDistinct(col("url")).as("p_urls"),
        collect_set(col("pday")).as("p_days"))
    // phase 2: cheap final merge per host (≤ S small rows per host)
    partial.groupBy(col("host"))
      .agg(
        sum(col("p_rows")).as("n_rows"),
        sum(col("p_urls")).as("distinct_urls"),
        size(array_distinct(flatten(collect_list(col("p_days"))))).cast("long").as("n_days"))
      .orderBy("host")
  }

  /** Single-phase reference implementation (for the parity test). */
  def hostProfileUnsalted(pages: DataFrame): DataFrame =
    pages.withColumn("host", Referential.hostExpr)
      .where(col("host") =!= "")
      .withColumn("pday", FusedChecks.pday)
      .groupBy(col("host"))
      .agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("url")).as("distinct_urls"),
        countDistinct(col("pday")).as("n_days"))
      .orderBy("host")
}
