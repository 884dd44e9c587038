package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.multimodal.Features
import graft.synth.PageSynth

/** Per-payload feature extraction: golden histogram values plus the
  * conservation invariants the driver's hex-nibble oracle also relies
  * on (Σ hist buckets == payload bytes).
  */
class FeaturesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val pages = PageSynth.pages(spark, TestSpark.sf0001)

  test("byteHistogram buckets by high nibble") {
    val bytes = Array[Byte](0x00, 0x0F, 0x10, 0x7F, -1 /*0xFF*/, -128 /*0x80*/)
    val h = Features.byteHistogram(bytes)
    assert(h(0) == 2 && h(1) == 1 && h(7) == 1 && h(15) == 1 && h(8) == 1)
    assert(h.sum == bytes.length)
  }

  test("featuresByDay conserves bytes and payload counts") {
    val f = Features.featuresByDay(pages)
    val histSum = (0 until 16).map(k => col(f"h$k%02d")).reduce(_ + _)
    assert(f.where(histSum =!= col("total_bytes")).count() == 0)
    val totals = f.agg(sum("n_payloads"), sum("total_bytes")).collect()(0)
    val exp = pages.where(col("html").isNotNull)
      .agg(count(lit(1)), sum(length(col("html")))).collect()(0)
    assert(totals.getLong(0) == exp.getLong(0))
    assert(totals.getLong(1) == exp.getLong(1))
    assert(totals.getLong(0) > 0)
  }

  test("pseudo-embedding is deterministic and normalized input") {
    val h = Features.byteHistogram("hello world".getBytes("UTF-8"))
    val e1 = Features.pseudoEmbedding(h)
    val e2 = Features.pseudoEmbedding(h)
    assert(e1.toSeq == e2.toSeq)
    assert(e1.length == 8)
  }
}
