package graft

import org.apache.spark.sql.{SparkSession, SaveMode}
import org.apache.spark.sql.functions._
import graft.checks._
import graft.runtime.{PageTable, CheckSuite, Dims, SuiteRunner}
import graft.model.CheckId
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Sub-step profiler for CheckSuite.run (diagnostic main, not part of
  * the driver contract). Mirrors the phases of CheckSuite.run over the
  * pre-built scaling table so each component's share of the end-to-end
  * assessment is visible.
  */
object ProfileSuite {
  def main(args: Array[String]): Unit = {
    val benchDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "96000000").toLong
    val root = sys.env.getOrElse("SPARK_GRAFT_TABLE_DIR",
      s"/dev/shm/metricsspark_scaling_$benchDocs")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "128")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", "/dev/shm/spark_local")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def clearOut(): Unit =
      Seq("audit", "results", "violations").foreach { d =>
        val p = Paths.get(root, d)
        if (Files.exists(p)) Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
      }
    clearOut()
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[psuite] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    val dims = Dims.default(spark)
    val pages = PageTable.read(spark, root).drop("pday")
    val joined = CheckSuite.joinDims(pages, dims)
    val allPreds = Conformance.preds ++ CheckSuite.refPreds ++ graft.text.TextOps.preds
    t("warm_count")(pages.count())
    // the ONE corpus scan: atoms build + checkpoint materialization
    val atoms = graft.runtime.Atoms.frame(joined, allPreds).localCheckpoint(false)
    t("atoms_scan")(atoms.count())
    // everything below aggregates atoms checkpoint blocks
    t("perday_fused_agg")(FusedChecks.wideByDay(atoms, allPreds,
      Sampling.estUrlAggsAtoms() ++ Sampling.estDeclaredAggsAtoms()).count())
    t("completeness")(Completeness.verdictRows(atoms, dims.langDim).count())
    t("viol_fused")(
      FusedChecks.violationsFromMasks(atoms, allPreds, ordered = false).count())
    t("viol_missing_members")(Completeness.missingLangMembers(atoms, dims.langDim).count())
    t("uniq_verdict")(Uniqueness.urlUniqueness(atoms).count())
    t("dup_text_verdict")(CheckSuite.dupTextVerdictFromAtoms(atoms).count())
    t("drift_combined")(Drift.combined(atoms).count())
    t("exists")(Exists.verdictRowsFromAtoms(atoms).count())
    val masks = Disjoint.entityMasks(atoms, dims.famDim)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("disjoint_verdict")(Disjoint.verdictFrom(masks).count())
    t("disjoint_violations")(
      CheckSuite.disjointViolations(atoms, dims.famDim, masks).count())
    masks.unpersist()
    t("prov_flags")(Provenance.hostFlagsFromAtoms(atoms).count())
    t("license_flags")(Licensing.hostFlagsFromAtoms(atoms).count())
    t("hijack_stats")(Hijack.groupHostStatsFromAtoms(atoms, dims.hostDim).count())
    t("serial_formats")(Formats.verdictRowFromAtoms(atoms, Formats.formatDim(spark)).count())
    t("vocab_used_terms")(Vocabulary.usedTermsFrame(atoms).count())
    t("viol_uniq")(Uniqueness.violations(atoms, ordered = false).count())
    t("neardup_labels") {
      val r = graft.dedup.Dedup.clusterLabelsCounted(pages)
      val sizes = graft.dedup.Dedup.clusterSizesFrom(r.groups, r.labels)
      CheckSuite.nearDupVerdict(r.groups, sizes).count()
    }
    t("batchviol_cap") {
      CheckSuite.capViolations(
        FusedChecks.violationsFromMasks(atoms, allPreds, ordered = false)
          .unionByName(Completeness.missingLangMembers(atoms, dims.langDim)),
        CheckSuite.MaxViolationRows).count()
    }
    t("viol_cap_write")(
      CheckSuite.capViolations(
        FusedChecks.violationsFromMasks(atoms, allPreds, ordered = false)
          .unionByName(Uniqueness.violations(atoms, ordered = false)),
        CheckSuite.MaxViolationRows)
        .withColumn("run_id", lit("prof"))
        .write.mode(SaveMode.Append).parquet(s"$root/violations"))
    clearOut()
    t("suite_end_to_end")(SuiteRunner.assess(spark, root, "prof_e2e").count())
    spark.stop()
  }
}
