package graft.runtime

import org.apache.spark.sql.{DataFrame, SparkSession, SaveMode}
import org.apache.spark.sql.functions._
import graft.checks._
import graft.model.CheckId

/** End-to-end constraint-suite runner with audit-table resume.
  *
  * Execution model (the Spark re-expression of the reference's
  * assessment lifecycle, SURVEY §3.1):
  *
  *  1. read the audit table → set of (check, pday) already assessed for
  *     this run_id;
  *  2. scan only the remaining partitions (partition-pruned read — the
  *     analog of Luzzu's resume caches,
  *     utilities/.../cache/LinkedDataMetricsCacheManager.java:25-26);
  *  3. per-partition checks (fused conformance/completeness family,
  *     referential) write one verdict row per (check, pday);
  *     whole-table checks (uniqueness, drift) run once under
  *     pday='*' when any partition was re-assessed;
  *  4. results + violations are written first, the audit rows **last**
  *     — a partition is only "done" once its outputs are durable
  *     (SURVEY §7.3 #5).
  *
  * Violations are capped per (check, partition) like the reference's
  * bounded problem collections; totals stay exact in the verdicts.
  */
class CheckSuite(spark: SparkSession, tableRoot: String) {

  private val auditPath = s"$tableRoot/audit"
  private val resultsPath = s"$tableRoot/results"
  private val violationsPath = s"$tableRoot/violations"

  def auditTable: DataFrame =
    if (new java.io.File(auditPath).exists())
      spark.read.parquet(auditPath)
    else spark.emptyDataFrame

  /** Partitions already fully assessed for `runId` (a partition is done
    * when every per-day check has an audit row for it).
    */
  def donePartitions(runId: String): Set[String] = {
    val audit = auditTable
    if (audit.isEmpty) Set.empty
    else audit.where(col("run_id") === runId && col("pday") =!= "*")
      .groupBy("pday").agg(countDistinct("check_id").as("n"))
      .where(col("n") >= CheckSuite.PerDayCheckCount)
      .collect().map(_.getString(0)).toSet
  }

  /** Run (or resume) the suite. `maxPartitions` bounds how many
    * partitions this invocation assesses (micro-batch / incremental
    * mode; also the test hook for resume). Whole-table checks run with
    * the final batch. Returns the verdict table for this run.
    */
  def run(runId: String, dims: Dims = Dims.default(spark),
      maxPartitions: Option[Int] = None): DataFrame = {
    val all = PageTable.partitions(tableRoot)
    val done = donePartitions(runId)
    val pending = all.filterNot(done).sorted
    val remaining = maxPartitions.fold(pending)(pending.take)
    val isFinalBatch = remaining.size == pending.size

    if (remaining.nonEmpty) {
      // partition-pruned scan: only un-assessed partitions are read
      val pages = PageTable.read(spark, tableRoot)
        .where(col("pday").isin(remaining: _*))
        .drop("pday")

      val perDay =
        FusedChecks.resultsByDay(pages)
          .unionByName(
            Referential.hostCheckByDay(pages, dims.hostDim)
              .withColumn("check_id", lit(CheckId.HostReferential))
              .select("check_id", "pday", "n_rows", "violations", "value", "pass"))
          .unionByName(
            Referential.langCheckByDay(pages, dims.langDim)
              .withColumn("check_id", lit(CheckId.LangReferential))
              .select("check_id", "pday", "n_rows", "violations", "value", "pass"))

      val viol =
        FusedChecks.violations(pages)
          .unionByName(Uniqueness.violations(pages))
          .unionByName(Referential.violations(pages, dims.hostDim, dims.langDim))
          .withColumn("run_id", lit(runId))
          .limit(CheckSuite.MaxViolationRows)

      // whole-table checks (full table, keyed pday='*') with the
      // final batch only — they are not per-partition decomposable
      val results = (if (isFinalBatch) {
        val full = PageTable.read(spark, tableRoot).drop("pday")
        val uniq = Uniqueness.urlUniqueness(full).select(
          lit(CheckId.UrlUniqueness).as("check_id"), lit("*").as("pday"),
          col("n_rows"), col("dup_rows").as("violations"), col("value"),
          (col("value") >= 0.99).as("pass"))
        val psi = Drift.langPsi(full).select(
          col("check_id"), lit("*").as("pday"),
          (col("base_rows") + col("cur_rows")).as("n_rows"),
          lit(0L).as("violations"), col("value"), col("pass"))
        val ks = Drift.hourKs(full).select(
          col("check_id"), lit("*").as("pday"),
          (col("base_rows") + col("cur_rows")).as("n_rows"),
          lit(0L).as("violations"), col("value"), col("pass"))
        perDay.unionByName(uniq).unionByName(psi).unionByName(ks)
      } else perDay)
        .withColumn("run_id", lit(runId))

      // durability order: violations → results → audit (audit marks done)
      viol.write.mode(SaveMode.Append).parquet(violationsPath)
      results.write.mode(SaveMode.Append).parquet(resultsPath)

      val audit = results.select(
        col("run_id"), col("check_id"), col("pday"),
        col("n_rows").as("rows_assessed"), col("violations"),
        col("value"), col("pass"),
        lit(false).as("estimate"),
        lit(CheckSuite.ParamsJson).as("params"),
        lit(System.currentTimeMillis()).as("finished_ts"))
      audit.write.mode(SaveMode.Append).parquet(auditPath)
    }

    // a crash between results-write and audit-write can leave duplicate
    // verdict rows after resume; values are deterministic, so dedupe is safe
    spark.read.parquet(resultsPath).where(col("run_id") === runId)
      .dropDuplicates("check_id", "pday")
  }
}

object CheckSuite {
  /** Number of distinct per-day check ids emitted for every partition
    * (fused preds + host/lang referential).
    */
  val PerDayCheckCount: Int = Conformance.preds.size + 2

  val MaxViolationRows = 100000

  /** Estimation / technique parameters recorded in every audit row —
    * the analog of the reference's observation-activity estimation
    * parameters (EstimatedExtensionalConciseness.java:183-207).
    */
  val ParamsJson: String =
    """{"psi_smoothing":0.5,"psi_threshold":0.2,"ks_threshold":0.1,"engine":"metricsspark-0.1"}"""
}

/** Dimension snapshots the suite joins against. */
case class Dims(hostDim: DataFrame, langDim: DataFrame)
object Dims {
  def default(spark: SparkSession): Dims =
    Dims(graft.synth.PageSynth.hostDim(spark), graft.synth.PageSynth.langDim(spark))
}
