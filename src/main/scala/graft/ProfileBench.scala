package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.checks._
import graft.runtime.PageTable

/** Ad-hoc stage profiler for the suite hot path (not part of the
  * driver contract). Times each component of CheckSuite.run separately
  * on the pre-built scaling table.
  */
object ProfileBench {
  def main(args: Array[String]): Unit = {
    val benchDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "2000000").toLong
    val root = s"${sys.props("java.io.tmpdir")}/metricsspark_scaling_$benchDocs"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val pages = PageTable.read(spark, root).drop("pday")
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    t("count")(pages.count())
    t("fused_results")(FusedChecks.resultsByDay(pages).count())
    t("fused_violations")(FusedChecks.violations(pages).count())
    t("ref_host_day")(Referential.hostCheckByDay(pages, graft.synth.PageSynth.hostDim(spark)).count())
    t("ref_lang_day")(Referential.langCheckByDay(pages, graft.synth.PageSynth.langDim(spark)).count())
    t("uniqueness")(Uniqueness.urlUniqueness(pages).count())
    t("uniq_violations")(Uniqueness.violations(pages).count())
    t("drift_psi")(Drift.langPsi(pages).count())
    t("drift_ks")(Drift.hourKs(pages).count())
    spark.stop()
  }
}
