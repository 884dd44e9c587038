package graft.checks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.model.ViolationKind

/** Referential-integrity checks: every fact-side foreign key must exist
  * in a (small) dimension snapshot.
  *
  * Reference analogs: #17 UndefinedClassesAndProperties
  * (representational/.../UndefinedClassesAndProperties.java:56-144 — a
  * term used but absent from its vocabulary), and the consistency
  * family #7–#14 (facts joined against VocabularyLoader dimension
  * lookups, memoized in LRU caches — VocabularyLoader.java:88-99).
  *
  * Scale notes: dimensions (hosts, langs) are orders of magnitude
  * smaller than the fact table → **broadcast** anti-join, no shuffle of
  * the 100 TB side. Violating *rows* can be huge in pathological data;
  * the violation listing aggregates to per-key groups first.
  */
object Referential {

  val hostExpr = regexp_extract(col("url"), "^https?://([^/?]+)", 1)

  /** Per-pday verdict for page.host → host_dim:
    * (pday, rows, violations, value, pass). `rows` counts pages with a
    * syntactically extractable host.
    */
  def hostCheckByDay(pages: DataFrame, hostDim: DataFrame, threshold: Double = 0.99): DataFrame = {
    val withHost = pages
      .withColumn("pday", FusedChecks.pday)
      .withColumn("host", hostExpr)
      .where(col("host") =!= "")
    val flagged = withHost.join(
      broadcast(hostDim.withColumn("known", lit(true))), Seq("host"), "left")
    flagged.groupBy(col("pday"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("known").isNull, 1L).otherwise(0L)).as("violations"))
      .withColumn("value",
        lit(1.0) - col("violations").cast("double") / col("n_rows").cast("double"))
      .withColumn("pass", col("value") >= threshold)
      .orderBy("pday")
  }

  /** Unknown-host groups: (host, n_rows, min_url), the compact violation
    * listing (kind UndefinedHost).
    */
  def unknownHosts(pages: DataFrame, hostDim: DataFrame): DataFrame =
    pages.withColumn("host", hostExpr)
      .where(col("host") =!= "")
      .join(broadcast(hostDim), Seq("host"), "left_anti")
      .groupBy(col("host"))
      .agg(count(lit(1)).as("n_rows"), min(col("url")).as("min_url"))
      .orderBy("host")

  /** Per-pday verdict for declared lang → lang_dim (only rows whose lang
    * is syntactically valid participate; bad syntax is conform_lang's
    * job, mirroring the reference's strict check separation).
    */
  def langCheckByDay(pages: DataFrame, langDim: DataFrame, threshold: Double = 0.98): DataFrame = {
    val applicable = pages
      .withColumn("pday", FusedChecks.pday)
      .where(col("lang").isNotNull && graft.functions.NativeValidators.validLangTag(col("lang")))
    applicable.join(broadcast(langDim.withColumn("known", lit(true))), Seq("lang"), "left")
      .groupBy(col("pday"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("known").isNull, 1L).otherwise(0L)).as("violations"))
      .withColumn("value",
        lit(1.0) - col("violations").cast("double") / col("n_rows").cast("double"))
      .withColumn("pass", col("value") >= threshold)
      .orderBy("pday")
  }

  /** Unknown-language violation rows (kind UndefinedLanguage), grouped. */
  def unknownLangs(pages: DataFrame, langDim: DataFrame): DataFrame =
    pages.where(col("lang").isNotNull && graft.functions.NativeValidators.validLangTag(col("lang")))
      .join(broadcast(langDim), Seq("lang"), "left_anti")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_rows"), min(col("url")).as("min_url"))
      .orderBy("lang")

  /** Violation rows in the engine's common shape. */
  def violations(pages: DataFrame, hostDim: DataFrame, langDim: DataFrame): DataFrame = {
    val h = unknownHosts(pages, hostDim).select(
      lit("ref_host_dim").as("check_id"),
      lit(ViolationKind.UnknownHost).as("kind"),
      lit("*").as("pday"),
      col("min_url").as("url"),
      concat(lit("unknown host "), col("host"), lit(" ("), col("n_rows"), lit(" rows)")).as("detail"))
    val l = unknownLangs(pages, langDim).select(
      lit("ref_lang_dim").as("check_id"),
      lit(ViolationKind.UnknownLanguage).as("kind"),
      lit("*").as("pday"),
      col("min_url").as("url"),
      concat(lit("unknown lang "), col("lang"), lit(" ("), col("n_rows"), lit(" rows)")).as("detail"))
    h.unionAll(l)
  }
}
