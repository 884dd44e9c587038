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

  /** Run every probe; output (check_id, value ∈ {0,1}, pass), one row
    * per check, in declaration order.
    */
  def results(pages: DataFrame): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    checks.map { c =>
      val found = pages.where(c.pred).limit(1).count() // early-stop probe
      (c.id, found, found == 1L)
    }.toDF("check_id", "value", "pass")
  }

  /** Probe rows in the suite's CheckResult shape (pday '*'). */
  def verdictRows(pages: DataFrame): DataFrame =
    results(pages).select(
      col("check_id"), lit("*").as("pday"),
      lit(1L).as("n_rows"),
      (lit(1L) - col("value")).as("violations"),
      col("value").cast("double").as("value"),
      col("pass"))
}
