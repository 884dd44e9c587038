package graft.checks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.CheckId

/** #20 DifferentSerialisationFormatsCount
  * (`R/versatility/DifferentSerialisationFormatsCount.java:58-113`):
  * the reference counts declared void:feature / dcat:mediaType values
  * that fall inside the 23-item W3C formats registry; the metric value
  * is that Integer count. Page-table analog: the serialisation a url
  * declares is its path extension; the registry maps known extensions
  * to canonical media types.
  *
  * Scale shape: extension extraction is a per-row regex on the already-
  * scanned url column; the registry is a constant broadcast dim; the
  * aggregation output is registry-cardinality (≤23 rows).
  */
object Formats {

  /** Extension → canonical format registry (23 entries, the W3C
    * formats-registry analog; DifferentSerialisationFormatsCount keeps
    * exactly such a fixed set).
    */
  val Registry: Seq[(String, String)] = Seq(
    "html" -> "text/html", "htm" -> "text/html", "xhtml" -> "application/xhtml+xml",
    "txt" -> "text/plain", "pdf" -> "application/pdf", "json" -> "application/json",
    "xml" -> "application/xml", "csv" -> "text/csv", "md" -> "text/markdown",
    "rdf" -> "application/rdf+xml", "ttl" -> "text/turtle", "nt" -> "application/n-triples",
    "nq" -> "application/n-quads", "trig" -> "application/trig", "jsonld" -> "application/ld+json",
    "svg" -> "image/svg+xml", "png" -> "image/png", "jpg" -> "image/jpeg",
    "gif" -> "image/gif", "webp" -> "image/webp", "mp4" -> "video/mp4",
    "wav" -> "audio/wav", "avif" -> "image/avif")

  def formatDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Registry.toDF("ext", "format")
  }

  /** DuckDB rendering of the registry for oracle SQL. */
  def formatDimDuck: String =
    Registry.map { case (e, f) => s"('$e', '$f')" }
      .mkString("SELECT * FROM (VALUES ", ", ", ") fmts(ext, format)")

  /** Url path extension (empty when none / query-string urls). */
  val ExtRegex = "\\.([a-z0-9]+)$"

  private def matched(pages: DataFrame, dim: DataFrame): DataFrame =
    pages.where(col("url").isNotNull)
      .select(regexp_extract(col("url"), ExtRegex, 1).as("ext"))
      .where(col("ext") =!= "")
      .join(broadcast(dim), Seq("ext"))

  /** Per-format usage counts: (format, n_rows), registry-matched only. */
  def formatCounts(pages: DataFrame, dim: DataFrame): DataFrame =
    matched(pages, dim)
      .groupBy(col("format"))
      .agg(count(lit(1)).as("n_rows"))
      .orderBy("format")

  /** The reference's Integer metric: distinct registry formats used.
    * (n_formats, n_rows = registry-matched urls).
    */
  def formatsCount(pages: DataFrame, dim: DataFrame): DataFrame =
    matched(pages, dim)
      .agg(countDistinct(col("format")).as("n_formats"),
        count(lit(1)).as("n_rows"))

  // ——— suite adapter: value = the Integer count (reference semantics;
  // pass = at least one registry format declared) ———

  def verdictRow(pages: DataFrame, dim: DataFrame): DataFrame =
    rowFromCounts(formatsCount(pages, dim))

  /** [[verdictRow]] over the suite's atoms frame (extension already
    * extracted by the one corpus scan).
    */
  def verdictRowFromAtoms(atoms: DataFrame, dim: DataFrame): DataFrame =
    rowFromCounts(
      atoms.where(col("ext").isNotNull && col("ext") =!= "")
        .select(col("ext"))
        .join(broadcast(dim), Seq("ext"))
        .agg(countDistinct(col("format")).as("n_formats"),
          count(lit(1)).as("n_rows")))

  private def rowFromCounts(counts: DataFrame): DataFrame =
    counts.select(
      lit(CheckId.SerialFormats).as("check_id"), lit("*").as("pday"),
      col("n_rows"), lit(0L).as("violations"),
      col("n_formats").cast("double").as("value"),
      (col("n_formats") >= 1).as("pass"))
}
