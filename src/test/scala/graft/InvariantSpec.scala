package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.checks._
import graft.multimodal.Multimodal
import graft.synth.PageSynth

/** The hard determinism guarantees the reference never had to provide
  * (single-threaded) but a distributed engine must (SURVEY §7.3 #1–#2):
  * identical results at any parallelism, byte-identical text per url.
  */
class InvariantSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def collectSorted(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("byte-identical extracted text per url (north-rule invariant)") {
    val p = PageSynth.pages(spark, TestSpark.sf001)
    val mismatches = p.where(col("html").isNotNull)
      .where(Multimodal.extractText(col("html")) =!= col("text"))
      .count()
    assert(mismatches == 0)
  }

  test("text digests stable across two independent derivations") {
    val d1 = PageSynth.pages(spark, TestSpark.sf001)
      .where(col("text").isNotNull)
      .select(col("url"), sha2(col("text"), 256).as("sha"))
    val d2 = PageSynth.pages(spark, TestSpark.sf001)
      .repartition(13)
      .where(col("text").isNotNull)
      .select(col("url"), sha2(col("text"), 256).as("sha"))
    assert(collectSorted(d1) == collectSorted(d2))
  }

  test("check results invariant under repartitioning (merge correctness)") {
    val base = PageSynth.pages(spark, TestSpark.sf001)
    for (parts <- Seq(1, 3, 17)) {
      val p = base.repartition(parts)
      assert(collectSorted(FusedChecks.resultsByDay(p)) ==
        collectSorted(FusedChecks.resultsByDay(base)), s"fused @ $parts")
      assert(Uniqueness.urlUniqueness(p).collect()(0).toString ==
        Uniqueness.urlUniqueness(base).collect()(0).toString, s"unique @ $parts")
      assert(Drift.langPsi(p).collect()(0).toString ==
        Drift.langPsi(base).collect()(0).toString, s"psi @ $parts")
      assert(Drift.hourKs(p).collect()(0).toString ==
        Drift.hourKs(base).collect()(0).toString, s"ks @ $parts")
    }
  }

  test("violation listing is deterministic across runs") {
    val a = FusedChecks.violations(PageSynth.pages(spark, TestSpark.sf0001)).collect()
    val b = FusedChecks.violations(PageSynth.pages(spark, TestSpark.sf0001).repartition(7)).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }
}
