package graft.checks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.model.{CheckId, ViolationKind}

/** Expected-member (dim→fact) completeness: every member of a
  * gold-standard dimension must appear in the data, per partition-day,
  * satisfying its per-member count condition.
  *
  * This is the *reverse* direction of the referential checks (which ask
  * "is every fact key known?"); here the question is "did any expected
  * source go dark?" — the reference's DataCubePopulationCompleteness,
  * which collects missing gold members into a problem bag
  * (intrinsic/.../DataCubePopulationCompleteness.java:117-134) and
  * evaluates a per-property condition-operator table (:248-267): a
  * member violates when it is absent entirely OR its observed count
  * fails `count op value` for its configured op ∈ {< > = >= <=}.
  * Members without a configured condition default to `>= 1` (present).
  *
  * Scale shape: the fact side collapses to (pday, lang) counts first —
  * a partial-agg'd groupBy producing #days×#langs tiny rows — and the
  * dim + condition sides are broadcast; nothing row-scale crosses the
  * shuffle.
  */
object Completeness {

  val PassThreshold = 1.0 // all expected members must satisfy their condition

  /** `count op value` for the five reference operators
    * (DataCubePopulationCompleteness.java:256-260); `n` is never null
    * here (absent members are handled before the condition).
    */
  def condEval(n: Column, op: Column, v: Column): Column =
    when(op === "<", n < v)
      .when(op === ">", n > v)
      .when(op === "=", n === v)
      .when(op === "<=", n <= v)
      .otherwise(n >= v)

  private def observed(pages: DataFrame): DataFrame =
    pages.withColumn("pday", FusedChecks.pday)
      .where(col("lang").isNotNull)
      .groupBy(col("pday"), col("lang")).agg(count(lit(1)).as("n"))

  /** (pday, lang, cond_op, cond_val, n, viol) for every (day, expected
    * member): n null ⇔ absent that day.
    */
  private def expectedJoin(pages: DataFrame, langDim: DataFrame): DataFrame = {
    val spark = pages.sparkSession
    val conds = graft.synth.PageSynth.langCondDim(spark)
      .withColumnRenamed("cond_op", "c_op").withColumnRenamed("cond_val", "c_val")
    val obs = observed(pages)
    val days = pages.withColumn("pday", FusedChecks.pday).select("pday").distinct()
    days.crossJoin(broadcast(langDim.select("lang")))
      .join(broadcast(conds), Seq("lang"), "left")
      .join(obs, Seq("pday", "lang"), "left")
      .withColumn("cond_op", coalesce(col("c_op"), lit(">=")))
      .withColumn("cond_val", coalesce(col("c_val"), lit(1L)))
      .withColumn("viol",
        col("n").isNull || !condEval(col("n"), col("cond_op"), col("cond_val")))
  }

  /** Per-day verdict: (pday, n_rows = expected members, violations =
    * members absent or failing their condition, value, pass), ordered.
    */
  def expectedLangByDay(pages: DataFrame, langDim: DataFrame): DataFrame =
    expectedJoin(pages, langDim)
      .groupBy(col("pday"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("viol"), 1L).otherwise(0L)).as("violations"))
      .withColumn("value",
        lit(1.0) - col("violations").cast("double") / col("n_rows").cast("double"))
      .withColumn("pass", col("value") >= PassThreshold)
      .orderBy("pday")

  /** Verdict rows in the suite's CheckResult shape. */
  def verdictRows(pages: DataFrame, langDim: DataFrame): DataFrame =
    expectedLangByDay(pages, langDim).select(
      lit(CheckId.LangCompleteness).as("check_id"), col("pday"),
      col("n_rows"), col("violations"), col("value"), col("pass"))

  /** Violating-member listing — the problem bag: one row per (pday,
    * expected member) that is absent or fails its count condition
    * (the reference's returnResource set carries both cases).
    */
  def missingLangMembers(pages: DataFrame, langDim: DataFrame): DataFrame =
    expectedJoin(pages, langDim)
      .where(col("viol"))
      .select(
        lit(CheckId.LangCompleteness).as("check_id"),
        lit(ViolationKind.MissingMember).as("kind"),
        col("pday"),
        lit("*").as("url"),
        when(col("n").isNull,
            concat(lit("expected lang '"), col("lang"), lit("' absent (cond "),
              col("cond_op"), lit(" "), col("cond_val"), lit(")")))
          .otherwise(
            concat(lit("expected lang '"), col("lang"), lit("' count "), col("n"),
              lit(" fails cond "), col("cond_op"), lit(" "), col("cond_val")))
          .as("detail"))
      .orderBy("pday", "detail")
}
