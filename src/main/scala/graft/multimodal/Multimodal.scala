package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.checks.FusedChecks

/** Opaque-binary (multimodal) column handling.
  *
  * `html` is carried as an opaque `binary` column with typed metadata
  * derived in-plan (byte length, content digest, sniffed type) — the
  * pattern a 100 TB training-data pipeline uses for image/audio/video
  * payloads. Real media decoding is *not* available in this container;
  * [[extractText]] is the deterministic "decode" for the html payload
  * and anchors the north-rule invariant: extracted text per url is
  * byte-identical across runs and parallelism levels.
  *
  * Reference analog: content parsing with bounded resources in
  * accessibility/.../helper/Dereferencer.java:176-214 (declared
  * content-type vs parsed content = MisreportedContentType #31).
  */
object Multimodal {

  /** Deterministic wrapper the synthesizer puts around (license, text).
    * The license slot is fixed-width (10 chars), so both the text and
    * the machine-readable license extract with pure substr — no
    * parsing, no regex on the hot path.
    */
  val PrefixLen: Int =
    graft.synth.PageSynth.HtmlHead.length + 10 + graft.synth.PageSynth.HtmlMid.length
  val Suffix: String = graft.synth.PageSynth.HtmlTail
  /** 0-based offset of the 10-char license value in the decoded html. */
  val LicenseOffset: Int = graft.synth.PageSynth.HtmlHead.length

  /** Pure, codegen'd text extraction from the html payload: UTF-8
    * decode + wrapper strip. No locale, no charset ambiguity.
    */
  def extractText(html: Column): Column = {
    val s = decode(html, "UTF-8")
    s.substr(lit(PrefixLen + 1),
      greatest(lit(0), length(s) - (PrefixLen + Suffix.length)))
  }

  /** Machine-readable license value from the html head (#37
    * MachineReadableLicense analog — the license "predicate" read
    * without touching the body). The 10-byte slice is taken on the
    * BINARY column first — the head region is pure ASCII, so byte
    * offsets equal char offsets and the ~KB body is never decoded.
    */
  def licenseOf(html: Column): Column =
    decode(substring(html, LicenseOffset + 1, 10), "UTF-8")

  /** Per-pday html metadata + round-trip verdict:
    * (pday, n_pages, n_html, total_bytes, n_roundtrip_ok).
    * `n_roundtrip_ok` counts pages where extractText(html) == text —
    * the byte-identity invariant as a first-class check.
    */
  def htmlMeta(pages: DataFrame): DataFrame =
    pages.withColumn("pday", FusedChecks.pday)
      .groupBy(col("pday"))
      .agg(
        count(lit(1)).as("n_pages"),
        count(col("html")).as("n_html"),
        coalesce(sum(octet_length(col("html"))), lit(0L)).cast("long").as("total_bytes"),
        sum(when(col("html").isNotNull && extractText(col("html")) === col("text"), 1L)
          .otherwise(0L)).as("n_roundtrip_ok"))
      .orderBy("pday")

  /** Content digest + sniffed type per page (binary-metadata pattern).
    * Sniffing = magic-prefix test on the decoded payload, the way a
    * media pipeline would dispatch on magic bytes.
    */
  def htmlDigests(pages: DataFrame): DataFrame =
    pages.where(col("html").isNotNull)
      .select(
        col("url"),
        sha2(col("html"), 256).as("html_sha"),
        octet_length(col("html")).cast("long").as("n_bytes"),
        when(decode(col("html"), "UTF-8").startsWith("<!DOCTYPE html>"), "text/html")
          .otherwise("application/octet-stream").as("sniffed_type"))
      .orderBy("url")
}
