package graft.checks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.model.CheckId

/** Exists-style boolean checks: value ∈ {0,1} from a
  * `filter(pred).limit(1)` probe — the reference's accessibility /
  * presence shape (`PresenceOfURIRegEx.java:35-46` sets 1 on the first
  * matching quad; `RDFAccessibility.java:45-57` on the first reachable
  * dump). `limit(1)` makes Spark run the probe incrementally
  * (CollectLimit scans partitions until a row is found), so a positive
  * probe on a 10^12-row table touches one row group, not the table.
  */
object Exists {

  final case class ExistsCheck(id: String, pred: Column, desc: String)

  val checks: Seq[ExistsCheck] = Seq(
    // #34 RDFAccessibility: at least one fetchable payload exists
    ExistsCheck(CheckId.ExistsHtml, col("html").isNotNull, "a fetchable html payload exists"),
    // #23 PresenceOfURIRegEx: at least one url matching the pattern
    ExistsCheck(CheckId.ExistsHttpsUrl, col("url").startsWith("https://"), "an https url exists"),
    // #35 SPARQLAccessibility shape: at least one queryable (en, non-empty) doc
    ExistsCheck(CheckId.ExistsEnText,
      col("lang") === "en" && col("text").isNotNull && length(col("text")) > 0,
      "a queryable English document exists"))

  /** Rows scanned by the cheap positive probe before falling back to
    * the one fused full scan.
    */
  val ProbeRows = 100000

  /** Predicates projected to booleans — evaluated BEFORE the bounded
    * probe's limit, so the single-partition global-limit exchange
    * carries 3 booleans per row, never the html payloads / text the
    * predicates inspect (the round-3 probe funneled 100k full-width
    * rows through it).
    */
  private[graft] def flagsFrame(pages: DataFrame): DataFrame =
    pages.select(checks.map(c => c.pred.as(c.id)): _*)

  /** The same probe flags over the suite's atoms frame (payload
    * presence / text non-emptiness are pre-derived booleans there —
    * the probe never touches the corpus).
    */
  private[graft] def atomsFlags(atoms: DataFrame): DataFrame =
    atoms.select(
      col("has_html").as(CheckId.ExistsHtml),
      col("url").startsWith("https://").as(CheckId.ExistsHttpsUrl),
      (col("lang") === "en" && col("text_ok")).as(CheckId.ExistsEnText))

  /** Run every probe; output (check_id, value ∈ {0,1}, pass), one row
    * per check, in declaration order.
    *
    * Two-phase (round-3 shape): ONE bounded job evaluates every
    * predicate over the first [[ProbeRows]] rows (`limit` + fused
    * `max(when(p,1))` agg — positive evidence from any subset is
    * valid). Only predicates not witnessed there fall back to ONE fused
    * full-scan aggregate proving presence/absence exactly. The previous
    * per-check `filter(pred).limit(1).count()` probes were 3 serial
    * jobs, and each *negative* probe was its own full table scan.
    */
  def results(pages: DataFrame): DataFrame =
    resultsOverFlags(flagsFrame(pages))

  private def resultsOverFlags(flags: DataFrame): DataFrame = {
    val spark = flags.sparkSession
    import spark.implicits._
    def fusedScan(df: DataFrame, cs: Seq[ExistsCheck]): Map[String, Long] = {
      val aggs = cs.map(c =>
        coalesce(max(when(col(c.id), 1L).otherwise(0L)), lit(0L)).as(c.id))
      val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
      cs.map(c => c.id -> row.getAs[Long](c.id)).toMap
    }
    val head = fusedScan(flags.limit(ProbeRows), checks)
    val missing = checks.filter(c => head(c.id) == 0L)
    val full = if (missing.isEmpty) Map.empty[String, Long] else fusedScan(flags, missing)
    checks.map { c =>
      val v = full.getOrElse(c.id, head(c.id))
      (c.id, v, v == 1L)
    }.toDF("check_id", "value", "pass")
  }

  /** Probe rows in the suite's CheckResult shape (pday '*'). */
  def verdictRows(pages: DataFrame): DataFrame =
    rowsFrom(results(pages))

  /** [[verdictRows]] over the suite's atoms frame. */
  def verdictRowsFromAtoms(atoms: DataFrame): DataFrame =
    rowsFrom(resultsOverFlags(atomsFlags(atoms)))

  private def rowsFrom(res: DataFrame): DataFrame =
    res.select(
      col("check_id"), lit("*").as("pday"),
      lit(1L).as("n_rows"),
      (lit(1L) - col("value")).as("violations"),
      col("value").cast("double").as("value"),
      col("pass"))
}
