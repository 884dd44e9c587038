package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.StreamingChecks
import graft.synth.PageSynth
import java.nio.file.Files

/** Structured-Streaming conformance: streamed windowed counts must
  * equal the batch fused counts for the same input.
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streamed per-day conformance equals batch over the same files") {
    val dir = Files.createTempDirectory("metricsspark_stream").toString
    val pages = PageSynth.pages(spark, TestSpark.sf0001)
    pages.repartition(6).write.mode("overwrite").parquet(dir)

    val q = StreamingChecks.start(spark, dir, "stream_conf")
    q.processAllAvailable()
    q.stop()

    // update mode re-emits a day each time a batch touches it; counts
    // are monotone, so the final state per day is the max
    val streamed = spark.table("stream_conf")
      .groupBy(col("pday"))
      .agg(max(col("conform_url__n_rows")).as("n"), max(col("conform_url__bad")).as("b"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

    val batch = graft.checks.FusedChecks.resultsByDay(pages.where(col("warc_ts").isNotNull))
      .where(col("check_id") === "conform_url")
      .collect()
      .map(r => r.getString(1) -> (r.getAs[Long]("n_rows"), r.getAs[Long]("violations")))
      .toMap

    assert(streamed.keySet == batch.keySet)
    streamed.foreach { case (day, v) => assert(v == batch(day), s"day $day") }
  }

  test("streamed referential family (broadcast dims in-stream) equals batch") {
    val dir = Files.createTempDirectory("metricsspark_stream_ref").toString
    val pages = PageSynth.pages(spark, TestSpark.sf0001)
    pages.repartition(6).write.mode("overwrite").parquet(dir)

    val q = StreamingChecks.start(spark, dir, "stream_ref",
      dims = Some((PageSynth.hostDim(spark), PageSynth.langDim(spark))))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("stream_ref")
      .groupBy(col("pday"))
      .agg(
        max(col("ref_host_dim__n_rows")).as("hn"), max(col("ref_host_dim__bad")).as("hb"),
        max(col("ref_lang_dim__n_rows")).as("ln"), max(col("ref_lang_dim__bad")).as("lb"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap

    def batchOf(checkId: String) = {
      val joined = pages.where(col("warc_ts").isNotNull)
        .withColumn("host", graft.checks.Referential.hostExpr)
        .join(broadcast(PageSynth.hostDim(spark).withColumn("host_known", lit(true))), Seq("host"), "left")
        .join(broadcast(PageSynth.langDim(spark).withColumn("lang_known", lit(true))), Seq("lang"), "left")
      graft.checks.FusedChecks.resultsByDay(joined,
          graft.checks.Conformance.preds ++ graft.runtime.CheckSuite.refPreds)
        .where(col("check_id") === checkId)
        .collect()
        .map(r => r.getString(1) -> (r.getAs[Long]("n_rows"), r.getAs[Long]("violations")))
        .toMap
    }
    val bh = batchOf("ref_host_dim"); val bl = batchOf("ref_lang_dim")
    assert(streamed.keySet == bh.keySet)
    streamed.foreach { case (day, (hn, hb, ln, lb)) =>
      assert((hn, hb) == bh(day), s"host family, day $day")
      assert((ln, lb) == bl(day), s"lang family, day $day")
    }
    // the referential violation count is non-trivial on the fixture
    assert(streamed.values.map(_._2).sum > 0)
  }

  test("multimodal feature extraction is deterministic and shuffle-free") {
    val pages = PageSynth.pages(spark, TestSpark.sf0001)
    def key(f: graft.multimodal.Features.PayloadFeatures) =
      (f.url, f.n_bytes, f.byte_hist16.toSeq, f.pseudo_embedding.toSeq).toString
    val f1 = graft.multimodal.Features.extract(pages).collect().map(key).sorted.toSeq
    val f2 = graft.multimodal.Features.extract(pages.repartition(9)).collect().map(key).sorted.toSeq
    assert(f1 == f2)
    assert(f1.nonEmpty)
    // no exchange in the plan: extraction is partition-local
    val plan = graft.multimodal.Features.extract(pages).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }
}
