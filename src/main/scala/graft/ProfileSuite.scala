package graft

import org.apache.spark.sql.{SparkSession, SaveMode}
import org.apache.spark.sql.functions._
import graft.checks._
import graft.runtime.{PageTable, CheckSuite, Dims}
import graft.model.CheckId
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Sub-step profiler for CheckSuite.run (diagnostic main, not part of
  * the driver contract).
  */
object ProfileSuite {
  def main(args: Array[String]): Unit = {
    val benchDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "32000000").toLong
    val root = sys.env.getOrElse("SPARK_GRAFT_TABLE_DIR",
      s"/dev/shm/metricsspark_scaling_$benchDocs")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("audit", "results", "violations").foreach { d =>
      val p = Paths.get(root, d)
      if (Files.exists(p)) Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[psuite] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    val dims = Dims.default(spark)
    val pages = PageTable.read(spark, root).drop("pday")
    val joined = pages
      .withColumn("host", Referential.hostExpr)
      .join(broadcast(dims.hostDim.withColumn("host_known", lit(true))), Seq("host"), "left")
      .join(broadcast(dims.langDim.withColumn("lang_known", lit(true))), Seq("lang"), "left")
    val allPreds = Conformance.preds ++ CheckSuite.refPreds
    t("warm_count")(pages.count())
    t("perday_agg")(FusedChecks.resultsByDay(joined, allPreds).count())
    t("viol_fused")(FusedChecks.violations(joined, allPreds, ordered = false).count())
    t("viol_uniq")(Uniqueness.violations(pages, ordered = false).count())
    t("viol_write")(
      FusedChecks.violations(joined, allPreds, ordered = false)
        .unionByName(Uniqueness.violations(pages, ordered = false))
        .withColumn("run_id", lit("prof"))
        .write.mode(SaveMode.Append).parquet(s"$root/violations"))
    t("uniq_verdict")(Uniqueness.urlUniqueness(pages).count())
    t("drift_combined")(Drift.combined(pages).count())
    spark.stop()
  }
}
