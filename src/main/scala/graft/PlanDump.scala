package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` evidence for named harness queries (not
  * part of the driver contract). For lazy queries the returned frame's
  * plan is the whole story; for the eager pipeline operators (dedup,
  * graph, embedding LSH, suite) a QueryExecutionListener additionally
  * captures every internal execution the operator runs (checkpoint /
  * count / collect actions), so the committed file shows the real
  * executed plans, not just the trivial scan of an already-materialized
  * checkpoint.
  *
  * Usage: tools/run_main.sh PlanDump <outDir> <sfDir> <query> [query...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val sfDir = args(1)
    val names = args.drop(2).toSeq
    Files.createDirectories(Paths.get(outDir))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val buf = new StringBuilder
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        buf.synchronized {
          buf.append(s"== internal execution: $funcName (${durationNs / 1e6}%.0f ms) ==\n")
          buf.append(qe.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
          buf.append("\n")
        }
      override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)

    names.foreach { n =>
      // listener events fire asynchronously on the listener bus: drain
      // before clearing (so the previous query's late events don't leak
      // into this file) and again before snapshotting
      Thread.sleep(3000)
      buf.synchronized(buf.clear())
      val df = SparkEntry.queries(n)(spark, sfDir)
      Thread.sleep(3000)
      val internal = buf.synchronized(buf.toString)
      val top = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val txt = s"== query: $n ==\n== returned frame plan ==\n$top\n$internal"
      Files.writeString(Paths.get(outDir, s"$n.txt"), txt)
      println(s"[plandump] wrote $outDir/$n.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
