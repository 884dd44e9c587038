package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.runtime.{CheckSuite, PageTable}
import graft.synth.PageSynth
import java.nio.file.Files

/** Runtime: Iceberg-shaped table, audit lineage, resume (SURVEY §5.2 #6). */
class RuntimeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshTable(): String = {
    val root = Files.createTempDirectory("metricsspark_t").toString
    PageTable.write(PageSynth.pages(spark, TestSpark.sf0001), root)
    root
  }

  test("partitioned write + manifest round-trip") {
    val root = freshTable()
    val parts = PageTable.partitions(root)
    assert(parts.size == 47) // 45 crawl days + 'null' + '1985-10-26'
    assert(parts.contains("null") && parts.contains("1985-10-26"))
    val back = PageTable.read(spark, root)
    assert(back.count() == 500)
    // partition pruning visible in the physical plan
    val plan = back.where(col("pday") === "2024-01-05").queryExecution.executedPlan.toString
    assert(back.where(col("pday") === "2024-01-05").count() > 0)
    // pday predicate becomes a partition filter at the scan, never a row filter
    assert(plan.contains("PartitionFilters: [isnotnull(pday"))
    assert(plan.contains("DataFilters: []"))
  }

  test("suite run produces per-partition verdicts + audit rows, and resume is a no-op") {
    val root = freshTable()
    val suite = new CheckSuite(spark, root)
    val r1 = suite.run("run1")
    val perDay = r1.where(col("pday") =!= "*")
    assert(perDay.groupBy("pday").count().count() == 47)
    assert(r1.where(col("pday") === "*").count() == 3) // uniqueness + psi + ks
    val auditN = suite.auditTable.count()
    // resume with nothing left: no new audit rows, same verdicts
    val r2 = suite.run("run1")
    assert(suite.auditTable.count() == auditN)
    assert(r2.collect().map(_.toString).sorted.toSeq == r1.collect().map(_.toString).sorted.toSeq)
  }

  test("interrupted run resumes: each partition assessed exactly once, verdicts equal a fresh run") {
    val root = freshTable()
    val suite = new CheckSuite(spark, root)
    suite.run("runA", maxPartitions = Some(10)) // simulate a run that stopped after 10 partitions
    assert(suite.donePartitions("runA").size == 10)
    val resumed = suite.run("runA") // resume to completion
    // every per-day (check, pday) assessed exactly once
    val dupAssessments = suite.auditTable
      .where(col("run_id") === "runA" && col("pday") =!= "*")
      .groupBy("check_id", "pday").count().where(col("count") > 1).count()
    assert(dupAssessments == 0)
    // verdicts identical to an uninterrupted run on a fresh table
    val root2 = freshTable()
    val fresh = new CheckSuite(spark, root2).run("runB")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("check_id", "pday", "n_rows", "violations", "value", "pass")
        .collect().map(_.toString).sorted.toSeq
    assert(key(resumed) == key(fresh))
  }

  test("violations are persisted with the run") {
    val root = freshTable()
    new CheckSuite(spark, root).run("runV")
    val viol = spark.read.parquet(s"$root/violations")
    assert(viol.where(col("run_id") === "runV").count() > 0)
    assert(viol.columns.contains("kind"))
  }
}
