package graft.runtime

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.synth.PageSynth

/** Convenience entry: synthesize → write Iceberg-shaped table → run the
  * full check suite → verdicts. This is the end-to-end "validated
  * docs/sec" path the bench measures.
  */
object SuiteRunner {

  def tableRoot(sfDir: String): String = {
    val tag = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    // tmpfs when available — the same scratch-placement rule the bench
    // applies to its replicated table: the VM disk's writeback stalls
    // add up to 3× run-to-run variance on the write-heavy suite path
    // (build + violations/results/audit). Production analog: table
    // scratch on node-local NVMe, not a throttled boot volume.
    val base =
      if (new java.io.File("/dev/shm").isDirectory) "/dev/shm"
      else sys.props("java.io.tmpdir")
    s"$base/metricsspark_table$tag"
  }

  /** Build (or rebuild) the partitioned table for a testdata dir. */
  def buildTable(spark: SparkSession, sfDir: String): String = {
    val root = tableRoot(sfDir)
    PageTable.write(PageSynth.pages(spark, sfDir), root)
    root
  }

  /** Full pipeline: build + fresh suite run; returns verdicts ordered,
    * without run-scoped columns (deterministic output).
    */
  def verdicts(spark: SparkSession, sfDir: String): DataFrame = {
    val root = buildTable(spark, sfDir)
    // a verdicts() invocation is always a fresh, complete assessment
    // (fresh run id over a just-rebuilt table): accumulated
    // results/violations/audit files from prior invocations are dead
    // weight that only grows the resume-scan (donePartitions read) and
    // the violation-log listing, run over run
    Seq("audit", "results", "violations").foreach { d =>
      val p = java.nio.file.Paths.get(root, d)
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
    }
    // fresh audit per invocation for a deterministic full assessment
    val runId = s"verify_${System.nanoTime()}"
    new CheckSuite(spark, root).run(runId,
        embeddings = Some(graft.synth.EmbSynth.vectors(spark, sfDir)))
      .select("check_id", "pday", "n_rows", "violations", "value", "pass")
      .orderBy("check_id", "pday")
  }

  /** Suite run on an already-built table (the benched hot path). The
    * embedding corpus rides along when the caller has one — the
    * `near_dup_emb` family is part of the assessed scope.
    */
  def assess(spark: SparkSession, root: String, runId: String,
      embeddings: Option[DataFrame] = None): DataFrame =
    new CheckSuite(spark, root).run(runId, embeddings = embeddings)
}
