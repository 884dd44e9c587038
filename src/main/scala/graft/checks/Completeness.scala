package graft.checks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.model.{CheckId, ViolationKind}

/** Expected-member (dim→fact) completeness: every member of a
  * gold-standard dimension must appear in the data, per partition-day,
  * with a count-threshold condition.
  *
  * This is the *reverse* direction of the referential checks (which ask
  * "is every fact key known?"); here the question is "did any expected
  * source go dark?" — the reference's DataCubePopulationCompleteness,
  * which collects missing gold members into a problem bag
  * (intrinsic/.../DataCubePopulationCompleteness.java:117-134) and
  * evaluates per-property condition operators (:248-267). The condition
  * operator here is `observed count ≥ minCount`.
  *
  * Scale shape: the fact side collapses to (pday, lang) counts first —
  * a partial-agg'd groupBy producing #days×#langs tiny rows — and the
  * dim side is broadcast; nothing row-scale crosses the shuffle.
  */
object Completeness {

  val PassThreshold = 1.0 // all expected members must be present

  private def observed(pages: DataFrame, minCount: Long): DataFrame =
    pages.withColumn("pday", FusedChecks.pday)
      .where(col("lang").isNotNull)
      .groupBy(col("pday"), col("lang")).agg(count(lit(1)).as("n"))
      .where(col("n") >= minCount)

  private def expectedJoin(pages: DataFrame, langDim: DataFrame, minCount: Long): DataFrame = {
    val obs = observed(pages, minCount)
    val days = pages.withColumn("pday", FusedChecks.pday).select("pday").distinct()
    days.crossJoin(broadcast(langDim))
      .join(obs, Seq("pday", "lang"), "left")
  }

  /** Per-day verdict: (pday, n_rows = expected members, violations =
    * missing members, value, pass), ordered.
    */
  def expectedLangByDay(pages: DataFrame, langDim: DataFrame, minCount: Long = 1): DataFrame =
    expectedJoin(pages, langDim, minCount)
      .groupBy(col("pday"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("n").isNull, 1L).otherwise(0L)).as("violations"))
      .withColumn("value",
        lit(1.0) - col("violations").cast("double") / col("n_rows").cast("double"))
      .withColumn("pass", col("value") >= PassThreshold)
      .orderBy("pday")

  /** Verdict rows in the suite's CheckResult shape. */
  def verdictRows(pages: DataFrame, langDim: DataFrame, minCount: Long = 1): DataFrame =
    expectedLangByDay(pages, langDim, minCount).select(
      lit(CheckId.LangCompleteness).as("check_id"), col("pday"),
      col("n_rows"), col("violations"), col("value"), col("pass"))

  /** Missing-member listing — the problem bag: one row per (pday,
    * expected lang absent that day).
    */
  def missingLangMembers(pages: DataFrame, langDim: DataFrame, minCount: Long = 1): DataFrame =
    expectedJoin(pages, langDim, minCount)
      .where(col("n").isNull)
      .select(
        lit(CheckId.LangCompleteness).as("check_id"),
        lit(ViolationKind.MissingMember).as("kind"),
        col("pday"),
        lit("*").as("url"),
        concat(lit("expected lang '"), col("lang"), lit(s"' absent (min $minCount)")).as("detail"))
      .orderBy("pday", "detail")
}
