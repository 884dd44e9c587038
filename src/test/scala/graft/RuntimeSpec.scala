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
    val vecs = graft.synth.EmbSynth.vectors(spark, TestSpark.sf0001)
    val r1 = suite.run("run1", embeddings = Some(vecs))
    val perDay = r1.where(col("pday") =!= "*")
    assert(perDay.groupBy("pday").count().count() == 47)
    // uniqueness + dup_text + psi + ks + 3 exists probes + disjoint_lang
    // + prov_host_flags + near_dup_text + near_dup_emb
    assert(r1.where(col("pday") === "*").count() == CheckSuite.WholeTableCheckCount)
    // the embedding near-dup family found the injected copies
    val embRow = r1.where(col("check_id") === "near_dup_emb").collect()(0)
    assert(embRow.getAs[Long]("violations") ==
      vecs.where(col("is_copy")).count())
    // the sampled-estimate check is flagged estimate=true in the audit
    val estFlags = suite.auditTable.select("check_id", "estimate").distinct()
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(estFlags("est_conform_url"))
    assert(!estFlags("conform_url"))
    // LSH families surface their capped-bucket count in the audit params
    val ndParams = suite.auditTable
      .where(col("check_id").isin("near_dup_text", "near_dup_emb"))
      .select("params").collect().map(_.getString(0))
    assert(ndParams.length == 2)
    ndParams.foreach(p => assert(p.contains("\"capped_buckets\":0"), p))
    val auditN = suite.auditTable.count()
    // resume with nothing left: no new audit rows, same verdicts
    val r2 = suite.run("run1", embeddings = Some(vecs))
    assert(suite.auditTable.count() == auditN)
    assert(r2.collect().map(_.toString).sorted.toSeq == r1.collect().map(_.toString).sorted.toSeq)
  }

  test("interrupted run resumes: each partition assessed exactly once, verdicts equal a fresh run") {
    val root = freshTable()
    val suite = new CheckSuite(spark, root)
    val vecs = graft.synth.EmbSynth.vectors(spark, TestSpark.sf0001)
    // simulate a run that stopped after 10 partitions
    suite.run("runA", maxPartitions = Some(10), embeddings = Some(vecs))
    assert(suite.donePartitions("runA").size == 10)
    val resumed = suite.run("runA", embeddings = Some(vecs)) // resume to completion
    // every per-day (check, pday) assessed exactly once
    val dupAssessments = suite.auditTable
      .where(col("run_id") === "runA" && col("pday") =!= "*")
      .groupBy("check_id", "pday").count().where(col("count") > 1).count()
    assert(dupAssessments == 0)
    // whole-table families (incl. near_dup_emb) assessed exactly once too
    assert(suite.auditTable
      .where(col("run_id") === "runA" && col("pday") === "*")
      .groupBy("check_id").count().where(col("count") > 1).count() == 0)
    assert(resumed.where(col("check_id") === "near_dup_emb").count() == 1)
    // verdicts identical to an uninterrupted run on a fresh table
    val root2 = freshTable()
    val fresh = new CheckSuite(spark, root2).run("runB", embeddings = Some(vecs))
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

  test("violation listings are capped per (check, pday), deterministically") {
    import spark.implicits._
    val viol = (1 to 500).map(i => ("c1", "K", "d1", f"u$i%03d", "x"))
      .toDF("check_id", "kind", "pday", "url", "detail")
      .union(Seq(("c2", "K", "d1", "u1", "x")).toDF("check_id", "kind", "pday", "url", "detail"))
    val capped = CheckSuite.capViolations(viol, 100).collect()
    assert(capped.count(_.getString(0) == "c1") == 100)
    assert(capped.count(_.getString(0) == "c2") == 1)
    // deterministic prefix: the first 100 urls in order survive
    val kept = capped.filter(_.getString(0) == "c1").map(_.getString(3)).sorted
    assert(kept.toSeq == (1 to 100).map(i => f"u$i%03d"))
  }

  test("whole-table violation listings appear exactly once after an interrupted+resumed run") {
    val root = freshTable()
    val suite = new CheckSuite(spark, root)
    suite.run("runW", maxPartitions = Some(5))
    suite.run("runW") // resume to completion
    // url uniqueness is a whole-table property: groups straddling batch
    // boundaries must not be lost (they would be, if listed per batch)
    val expected = graft.checks.Uniqueness
      .violations(PageTable.read(spark, root).drop("pday")).count()
    assert(expected > 0)
    assert(suite.violationsTable("runW")
      .where(col("check_id") === "unique_url").count() == expected)
    // and the raw (un-deduped) log has them exactly once too
    assert(spark.read.parquet(s"$root/violations")
      .where(col("run_id") === "runW" && col("check_id") === "unique_url")
      .count() == expected)
  }
}
