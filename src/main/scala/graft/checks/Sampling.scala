package graft.checks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic sampling operators.
  *
  * The reference's estimated metrics rely on uniform reservoirs
  * (accessibility/.../EstimatedDereferenceability.java:54 — k=100,000)
  * and stratified-by-TLD sampling with proportional allocation + a
  * per-stratum cap
  * (EstimatedDereferenceabilityByStratified.java:66-76,152-173 — 20% of
  * the population, ≤1,000 per stratum).
  *
  * We replace RNG reservoirs with **hash-based sampling**: a row is
  * sampled iff a uniform hash of its key falls under the target
  * fraction. This is (a) deterministic across runs and parallelism —
  * the reproducibility the reference never had, (b) shuffle-free for
  * the uniform case (a pure filter, pushed next to the scan), and
  * (c) exactly mergeable. md5 is used as the hash because the DuckDB
  * oracle computes the identical digest.
  */
object Sampling {

  /** First two hex digits of md5(url) → uniform value in 0..255.
    * Rendered as SQL text that parses identically in Spark and DuckDB.
    */
  val U256Sql = "(instr('0123456789abcdef', substr(md5(url), 1, 1)) - 1) * 16 + (instr('0123456789abcdef', substr(md5(url), 2, 1)) - 1)"

  /** Uniform ~20% sample (u256 < 51): deterministic analog of the
    * reference's uniform reservoirs. A pure filter — no shuffle.
    */
  def uniformSample(pages: DataFrame, threshold256: Int = 51): DataFrame =
    pages.where(expr(U256Sql) < threshold256)

  /** Verdict row for the uniform sample: sampled fraction must be within
    * tolerance of the target. Output (rows, sampled, frac).
    */
  def uniformSampleStats(pages: DataFrame, threshold256: Int = 51): DataFrame =
    pages.agg(
      count(lit(1)).as("n_rows"),
      sum(when(expr(U256Sql) < threshold256, 1L).otherwise(0L)).as("sampled"))
      .withColumn("frac", col("sampled").cast("double") / col("n_rows").cast("double"))

  /** Proportional-allocation stratified sample by host with a
    * per-stratum cap: per host take ceil(20%) of its rows, at most
    * `cap`, choosing rows by md5 order (deterministic).
    * Output (host, stratum_rows, sample_rows) per host — the allocation
    * table, mirroring EstimatedDereferenceabilityByStratified's
    * per-TLD share computation (:152-173).
    */
  def stratifiedAllocation(pages: DataFrame, cap: Int = 25): DataFrame = {
    val withHost = pages
      .withColumn("host", Referential.hostExpr)
      .where(col("host") =!= "")
    val w = Window.partitionBy(col("host"))
      .orderBy(md5(col("url")), col("url"), coalesce(col("warc_ts").cast("long"), lit(-1L)))
    withHost
      .withColumn("rnk", row_number().over(w))
      .withColumn("stratum_rows", count(lit(1)).over(Window.partitionBy(col("host"))))
      .withColumn("take",
        least(lit(cap.toLong), floor((col("stratum_rows") + 4) / lit(5.0)).cast("long")))
      .groupBy(col("host"))
      .agg(
        max(col("stratum_rows")).as("stratum_rows"),
        sum(when(col("rnk") <= col("take"), 1L).otherwise(0L)).as("sample_rows"))
      .orderBy("host")
  }

  /** The stratified sample rows themselves (url + host), for downstream
    * estimated checks.
    */
  def stratifiedSample(pages: DataFrame, cap: Int = 25): DataFrame = {
    val withHost = pages
      .withColumn("host", Referential.hostExpr)
      .where(col("host") =!= "")
    val w = Window.partitionBy(col("host"))
      .orderBy(md5(col("url")), col("url"), coalesce(col("warc_ts").cast("long"), lit(-1L)))
    val cnt = Window.partitionBy(col("host"))
    withHost
      .withColumn("rnk", row_number().over(w))
      .withColumn("take",
        least(lit(cap.toLong), floor((count(lit(1)).over(cnt) + 4) / lit(5.0)).cast("long")))
      .where(col("rnk") <= col("take"))
      .select(col("host"), col("url"))
      .orderBy("host", "url")
  }
}
