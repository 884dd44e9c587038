package graft.runtime

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.checks.{FusedChecks, Formats, Licensing, Pred, Sampling}
import graft.functions.NativeValidators

/** The suite's shared **atoms frame**: ONE corpus scan reduced to a
  * narrow (~100 B) row per page carrying every derived value the
  * whole-table check families need — so licensing, hijack, dup-text,
  * uniqueness, vocabulary reuse/usage, serialisation formats, exists,
  * drift, disjointness, provenance, the per-day fused aggregate AND the
  * batch violation listing all read local checkpoint blocks instead of
  * re-decoding the (html/text-heavy) corpus once per family.
  *
  * This is the Spark re-expression of the reference's single-stream
  * fold: Luzzu pushes every quad through all 38 metrics' `compute()`
  * once (`utilities/.../commons/AbstractQualityMetric.java:14-24`);
  * here the one pass materializes the per-row *atoms* and each family
  * becomes a cheap aggregation over them. Round-4 measured ~10-12
  * independent corpus-scale scans in the concurrent phase; with the
  * atoms frame the assessment does exactly TWO corpus reads: this scan
  * and the near-dup shingling pipeline (which needs the raw text).
  *
  * Two content hashes are carried on purpose: `text_xxh` =
  * xxhash64(RAW text) keys exact-duplicate detection, while `fp` =
  * md5(whitespace-NORMALIZED text) keys hijack/sameAs content identity
  * — the families define identity differently and their oracles depend
  * on each.
  */
object Atoms {

  /** Build the atoms projection over a dim-joined, text-derived page
    * frame (the same input [[graft.checks.FusedChecks.maskFrame]]
    * takes: TextOps.withDerived + host + broadcast dim flags).
    *
    * Columns:
    *  - identity/partition: url, warc_ts, pday, host, lang, detected_lang
    *  - fused predicate bitmasks: __am (applicable), __bm (violated)
    *  - cheap re-derivable flags the families aggregate on:
    *    url_valid, text_ok, has_html, in_sample (u256 < 51), lic_human
    *  - content keys: fp (md5 of normalized text; null when text is
    *    null/blank), text_xxh (xxhash64 of raw text; null when empty)
    *  - per-row dimension values: license (machine-readable value from
    *    the html head; null when html is null), ext (url path extension)
    */
  def frame(joined: DataFrame, preds: Seq[Pred],
      threshold256: Int = 51): DataFrame = {
    val masked = FusedChecks.maskFrame(joined, preds)
    val norm: Column = graft.dedup.Dedup.normText(col("text"))
    masked.select(
      col("url"), col("warc_ts"), col("pday"), col("host"), col("lang"),
      col("detected_lang"), col("n_tok"), col("__am"), col("__bm"),
      (col("url").isNotNull && NativeValidators.validHttpUrl(col("url")))
        .as("url_valid"),
      (col("text").isNotNull && length(col("text")) > 0).as("text_ok"),
      col("html").isNotNull.as("has_html"),
      (expr(Sampling.U256Sql) < threshold256).as("in_sample"),
      when(col("text").isNotNull && length(norm) > 0, md5(norm)).as("fp"),
      when(col("text").isNotNull && length(col("text")) > 0,
        xxhash64(col("text"))).as("text_xxh"),
      when(col("html").isNotNull,
        graft.multimodal.Multimodal.licenseOf(col("html"))).as("license"),
      (col("text").isNotNull && Licensing.humanHit(col("text"))).as("lic_human"),
      when(col("url").isNotNull,
        regexp_extract(col("url"), Formats.ExtRegex, 1)).as("ext"))
  }
}
