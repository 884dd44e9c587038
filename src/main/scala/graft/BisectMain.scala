package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.checks._
import graft.runtime.{PageTable, CheckSuite, Dims}

/** Diagnostic bisect of the violations-plan cost (temporary). */
object BisectMain {
  def main(args: Array[String]): Unit = {
    val root = s"${sys.props("java.io.tmpdir")}/metricsspark_scaling_32000000"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dims = Dims.default(spark)
    val pages = PageTable.read(spark, root).drop("pday")
    val joined = pages
      .withColumn("host", Referential.hostExpr)
      .join(broadcast(dims.hostDim.withColumn("host_known", lit(true))), Seq("host"), "left")
      .join(broadcast(dims.langDim.withColumn("lang_known", lit(true))), Seq("lang"), "left")
    val allPreds = Conformance.preds ++ CheckSuite.refPreds
    val anyBadAll = allPreds.map(p => p.applicable && p.bad).reduce(_ || _)
    val anyBadConf = Conformance.preds.map(p => p.applicable && p.bad).reduce(_ || _)
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[bisect] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    t("scan_count")(pages.count())
    t("pages_prefilter_conf")(pages.where(anyBadConf).count())
    t("joined_count")(joined.count())
    t("joined_prefilter_all")(joined.where(anyBadAll).count())
    t("viol_no_join")(FusedChecks.violations(pages, Conformance.preds, ordered = false).count())
    t("viol_joined")(FusedChecks.violations(joined, allPreds, ordered = false).count())
    spark.stop()
  }
}
