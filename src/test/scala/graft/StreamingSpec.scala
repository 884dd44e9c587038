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

  test("streamed referential + text families (broadcast dims in-stream) equal batch") {
    val dir = Files.createTempDirectory("metricsspark_stream_ref").toString
    val pages = PageSynth.pages(spark, TestSpark.sf0001)
    pages.repartition(6).write.mode("overwrite").parquet(dir)

    val q = StreamingChecks.start(spark, dir, "stream_ref",
      dims = Some((PageSynth.hostDim(spark), PageSynth.langDim(spark),
        graft.checks.Vocabulary.deprecatedDim(spark))))
    q.processAllAvailable()
    q.stop()

    // streamed final state per (day, family): counts are monotone under
    // update mode, so max is the converged value
    val famCols = Seq("ref_host_dim", "ref_lang_dim",
      graft.model.CheckId.DeprecatedTerms,
      graft.model.CheckId.DeclaredVsDerivedLang, graft.model.CheckId.TextQuality)
    val streamed = spark.table("stream_ref")
      .groupBy(col("pday"))
      .agg(max(col(s"${famCols.head}__n_rows")).as(s"${famCols.head}__n"),
        (famCols.tail.flatMap(c => Seq(max(col(s"${c}__n_rows")).as(s"${c}__n"))) ++
          famCols.map(c => max(col(s"${c}__bad")).as(s"${c}__b"))): _*)
      .collect()
      .map(r => r.getString(0) ->
        famCols.map(c => c -> (r.getAs[Long](s"${c}__n"), r.getAs[Long](s"${c}__b"))).toMap)
      .toMap

    // batch twin: same derived columns, same dim joins, same pred bank
    val joined = graft.text.TextOps.withDerived(pages.where(col("warc_ts").isNotNull))
      .withColumn("host", graft.checks.Referential.hostExpr)
      .join(broadcast(PageSynth.hostDim(spark).withColumn("host_known", lit(true))), Seq("host"), "left")
      .join(broadcast(PageSynth.langDim(spark).withColumn("lang_known", lit(true))), Seq("lang"), "left")
      .join(broadcast(graft.checks.Vocabulary.deprecatedDim(spark)
        .withColumn("lang_deprecated", lit(true))), Seq("lang"), "left")
      .join(broadcast(PageSynth.hostDim(spark).withColumnRenamed("host", "lang")
        .withColumn("lang_is_hostterm", lit(true))), Seq("lang"), "left")
      .join(broadcast(PageSynth.langDim(spark).withColumnRenamed("lang", "host")
        .withColumn("host_is_langterm", lit(true))), Seq("host"), "left")
    val batchRows = graft.checks.FusedChecks.resultsByDay(joined,
        graft.checks.Conformance.preds ++ graft.runtime.CheckSuite.refPreds ++
          graft.text.TextOps.preds)
      .where(col("check_id").isin(famCols: _*))
      .collect()
      .map(r => (r.getString(1), r.getString(0)) ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("violations")))
      .toMap

    assert(streamed.keySet == batchRows.keySet.map(_._1))
    for ((day, fams) <- streamed; (fam, v) <- fams)
      assert(v == batchRows((day, fam)), s"family $fam, day $day")
    // referential + declared-vs-derived violations are non-trivial on the fixture
    assert(streamed.values.map(_("ref_host_dim")._2).sum > 0)
    assert(streamed.values.map(_(graft.model.CheckId.DeclaredVsDerivedLang)._2).sum > 0)
  }

  test("streamed violation EVENTS (append mode) equal the batch listing per (check, day)") {
    val dir = Files.createTempDirectory("metricsspark_stream_viol").toString
    val pages = PageSynth.pages(spark, TestSpark.sf0001)
    pages.repartition(6).write.mode("overwrite").parquet(dir)

    val q = StreamingChecks.startViolations(spark, dir, "stream_viol",
      PageSynth.hostDim(spark), PageSynth.langDim(spark),
      graft.checks.Vocabulary.deprecatedDim(spark))
    q.processAllAvailable()
    q.stop()

    // append mode: each violation event appears exactly once, so plain
    // counts (no max/dedup) must equal the batch listing
    val streamed = spark.table("stream_viol")
      .groupBy(col("check_id"), col("pday")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

    val preds = graft.checks.Conformance.preds ++
      graft.runtime.CheckSuite.refPreds ++ graft.text.TextOps.preds
    val batch = graft.checks.FusedChecks.violationsFromMasks(
        graft.checks.FusedChecks.maskFrame(
          graft.runtime.CheckSuite.joinDims(pages, graft.runtime.Dims.default(spark)), preds),
        preds, ordered = false)
      .groupBy(col("check_id"), col("pday")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

    assert(streamed == batch)
    assert(streamed.nonEmpty) // the fixture corpus injects violations
  }

  test("streamed stateful dedup (flatMapGroupsWithState) equals batch fingerprint groups") {
    val dir = Files.createTempDirectory("metricsspark_stream_dedup").toString
    val pages = PageSynth.pages(spark, TestSpark.sf0001)
    pages.repartition(6).write.mode("overwrite").parquet(dir)

    val q = graft.streaming.StreamingDedup.start(spark, dir, "stream_dedup")
    q.processAllAvailable()
    q.stop()

    // batch twin: per-fingerprint doc counts over the same rows
    val batch = pages.where(col("text").isNotNull && col("warc_ts").isNotNull)
      .groupBy(graft.text.TextOps.fingerprint(col("text")).as("fp")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    // append mode emits exactly one event per arrival; with the default
    // (unbounded-within-fixture) horizon nothing is evicted, so every
    // fingerprint has exactly one first-seen event, n-1 duplicates, and
    // a single retained representative across all its events
    val streamed = spark.table("stream_dedup")
      .groupBy("fp")
      .agg(count("*").as("n"),
        sum(when(col("is_duplicate"), 1L).otherwise(0L)).as("dups"),
        countDistinct("dup_of").as("reps"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap

    assert(streamed.keySet == batch.keySet)
    streamed.foreach { case (fp, (n, dups, reps)) =>
      assert(n == batch(fp), s"fp $fp arrivals")
      assert(dups == n - 1, s"fp $fp duplicates")
      assert(reps == 1L, s"fp $fp must keep one representative")
    }
    // the fixture injects real duplicate texts — the event log must flag some
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
