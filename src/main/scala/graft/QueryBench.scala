package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc timer for a named subset of SparkEntry.queries (not part of
  * the driver contract). Usage:
  *   tools/run_main.sh QueryBench <sfDir> <query> [query ...]
  */
object QueryBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(n)(spark, sfDir).count()
      println(f"[qbench] $n%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s ($rows rows)")
    }
    spark.stop()
  }
}
