package graft.checks

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import graft.model.{CheckId, ViolationKind}
import graft.synth.PageSynth

/** #37 licensing family — the reference ships three licensing metrics
  * over predicate whitelists + regex banks:
  *
  *  - `A/licensing/MachineReadableLicense.java:60-104` — a license
  *    statement via one of 11 license *properties* → here: the
  *    fixed-offset license value in the html head
  *    ([[graft.multimodal.Multimodal.licenseOf]]), "UNLICENSED" = no
  *    machine-readable license indicated.
  *  - `A/licensing/HumanReadableLicense.java:57-103` — license *text*
  *    matched by a phrase regex bank over description-ish values →
  *    here: [[HumanBank]] over the extracted text.
  *  - `A/licensing/LicensingModelClassifier.java:51-101,110-206` —
  *    classify the license value against copyleft URI regexes →
  *    [[CopyleftRegex]] over the license values.
  *
  * Both booleans are per-dataset in the reference; the page-table
  * dataset analog is the host (as in [[Provenance]]), so the family is
  * a per-host flag aggregation: one corpus scan, host-cardinality
  * output, `max()` flag semantics (any page carrying the marker
  * licenses the host).
  */
object Licensing {

  /** Human-readable license-statement phrase bank (the
    * HumanReadableLicense text regex analog).
    */
  val HumanBank: Seq[String] =
    Seq("terms and conditions", "all rights reserved", "creative commons", "public domain")

  /** Copyleft / open-license value bank (LicensingModelClassifier's
    * copyleft URI regexes). RE2-safe.
    */
  val CopyleftRegex = "^CC(-|0)"

  private[graft] def humanHit(text: Column): Column =
    HumanBank.map(w => text.contains(w)).reduce(_ || _)

  private def machineLic(html: Column): Column =
    when(html.isNotNull, graft.multimodal.Multimodal.licenseOf(html))

  /** Per-host license flags: (host, n_rows, has_machine, has_human).
    * One scan; the license value reads at a fixed offset (no parsing,
    * materialized once below the aggregate), the human bank is a
    * contains-OR over text.
    */
  def hostFlags(pages: DataFrame): DataFrame =
    pages.withColumn("host", Referential.hostExpr)
      .withColumn("lic", machineLic(col("html")))
      .where(col("host") =!= "")
      .groupBy(col("host"))
      .agg(
        count(lit(1)).as("n_rows"),
        max(when(col("lic").isNotNull &&
          col("lic") =!= PageSynth.NoLicense, 1L).otherwise(0L)).as("has_machine"),
        max(when(col("text").isNotNull && humanHit(col("text")), 1L).otherwise(0L)).as("has_human"))
      .orderBy("host")

  /** [[hostFlags]] over the suite's atoms frame (license value and
    * human-bank hit already materialized by the one corpus scan).
    */
  def hostFlagsFromAtoms(atoms: DataFrame): DataFrame =
    atoms.where(col("host") =!= "")
      .groupBy(col("host"))
      .agg(
        count(lit(1)).as("n_rows"),
        max(when(col("license").isNotNull &&
          col("license") =!= PageSynth.NoLicense, 1L).otherwise(0L)).as("has_machine"),
        max(when(col("lic_human"), 1L).otherwise(0L)).as("has_human"))

  /** Verdict from a pre-built flags frame: a host passes when it
    * indicates a license in EITHER form; violations = hosts with no
    * license indication at all. Empty input → value 1.0 (nothing to
    * license), matching the fused-family convention.
    */
  def verdictFromFlags(fl: DataFrame, threshold: Double = 0.5): DataFrame =
    fl.agg(count(lit(1)).as("n_rows"),
        sum(when(col("has_machine") === 0 && col("has_human") === 0, 1L)
          .otherwise(0L)).as("violations"))
      .withColumn("value",
        when(col("n_rows") === 0, 1.0).otherwise(
          lit(1.0) - col("violations").cast("double") / col("n_rows").cast("double")))
      .withColumn("pass", col("value") >= threshold)

  /** Single-row verdict: (n_rows = hosts, violations, value, pass). */
  def verdict(pages: DataFrame, threshold: Double = 0.5): DataFrame =
    verdictFromFlags(hostFlags(pages), threshold)

  /** LicensingModelClassifier analog: per license value, usage count +
    * copyleft classification. Output (license, n_pages, copyleft).
    */
  def models(pages: DataFrame): DataFrame =
    pages.where(col("html").isNotNull)
      .select(graft.multimodal.Multimodal.licenseOf(col("html")).as("license"))
      .groupBy(col("license"))
      .agg(count(lit(1)).as("n_pages"))
      .withColumn("copyleft", col("license").rlike(CopyleftRegex))
      .orderBy("license")

  // ——— suite adapters ———

  def verdictRowFromFlags(fl: DataFrame): DataFrame =
    verdictFromFlags(fl).select(
      lit(CheckId.LicenseIndication).as("check_id"), lit("*").as("pday"),
      col("n_rows"), col("violations"), col("value"), col("pass"))

  def violationsFromFlags(fl: DataFrame): DataFrame =
    fl.where(col("has_machine") === 0 && col("has_human") === 0)
      .select(
        lit(CheckId.LicenseIndication).as("check_id"),
        lit(ViolationKind.NoLicense).as("kind"),
        lit("*").as("pday"),
        col("host").as("url"),
        concat(lit("host indicates no license ("), col("n_rows"),
          lit(" pages)")).as("detail"))
}
