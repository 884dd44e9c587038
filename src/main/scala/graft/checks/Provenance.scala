package graft.checks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.model.{CheckId, ViolationKind}

/** Per-group provenance-flag checks.
  *
  * Reference: BasicProvenanceMetric / ExtendedProvenanceMetric
  * (C/provenance/BasicProvenanceMetric.java:47-84): per *dataset*, set a
  * flag when ≥1 statement declares a creator/publisher, metric = flagged
  * datasets / datasets. The web-table analog: the dataset is a host, and
  * its provenance markers are "≥1 page served over valid https" (the
  * attributable-publisher analog) and "≥1 page with non-empty extracted
  * text" (the human-readable attribution analog).
  *
  * Scale shape: `groupBy(host).agg(max(flag))` — a primitive hash
  * aggregate whose partial phase collapses every input partition to
  * ≤ |hosts| rows, so the shuffle is host-cardinality, not row-count.
  * This per-group *flag* aggregation (existence within group) is a
  * different fold than the per-row predicate family: a host with 10^6
  * pages and one https page passes, which no row-ratio check expresses.
  */
object Provenance {

  private val httpsOk: Column =
    col("url").isNotNull && graft.functions.NativeValidators.validHttpUrl(col("url")) &&
      col("url").startsWith("https://")
  private val textOk: Column = col("text").isNotNull && length(col("text")) > 0

  /** Per-host flag frame: (host, n_rows, has_https, has_text), ordered. */
  def hostFlags(pages: DataFrame): DataFrame =
    pages.withColumn("host", Referential.hostExpr).where(col("host") =!= "")
      .groupBy(col("host"))
      .agg(
        count(lit(1)).as("n_rows"),
        max(when(httpsOk, 1L).otherwise(0L)).as("has_https"),
        max(when(textOk, 1L).otherwise(0L)).as("has_text"))
      .orderBy("host")

  /** [[hostFlags]] over the suite's atoms frame: url validity and text
    * presence are pre-derived flags, host is pre-extracted — the
    * aggregation reads checkpoint blocks, not the corpus.
    */
  def hostFlagsFromAtoms(atoms: DataFrame): DataFrame =
    atoms.where(col("host") =!= "")
      .groupBy(col("host"))
      .agg(
        count(lit(1)).as("n_rows"),
        max(when(col("url_valid") && col("url").startsWith("https://"), 1L)
          .otherwise(0L)).as("has_https"),
        max(when(col("text_ok"), 1L).otherwise(0L)).as("has_text"))

  /** Whole-table verdict from a pre-built flag frame: value = hosts with
    * both provenance markers / hosts.
    */
  def verdictFrom(flags: DataFrame, threshold: Double = 0.9): DataFrame =
    flags.agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("has_https") === 1L && col("has_text") === 1L, 0L).otherwise(1L))
        .as("violations"))
      .select(col("n_rows"), col("violations"),
        (lit(1.0) - col("violations").cast("double") / col("n_rows").cast("double")).as("value"))
      .withColumn("pass", col("value") >= threshold)

  def verdict(pages: DataFrame, threshold: Double = 0.9): DataFrame =
    verdictFrom(hostFlags(pages), threshold)

  /** Violation rows (one per host missing a marker) from a pre-built
    * flag frame — the problem-report analog of the reference's
    * per-dataset provenance problem bag.
    */
  def violationsFrom(flags: DataFrame): DataFrame =
    flags.where(col("has_https") === 0L || col("has_text") === 0L)
      .select(
        lit(CheckId.ProvHostFlags).as("check_id"),
        lit(ViolationKind.MissingProvenance).as("kind"),
        lit("*").as("pday"),
        col("host").as("url"),
        concat(lit("missing:"),
          when(col("has_https") === 0L, lit(" https")).otherwise(lit("")),
          when(col("has_text") === 0L, lit(" text")).otherwise(lit(""))).as("detail"))
}
