package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.checks.{Conformance, Pred}

/** Structured-Streaming variant of the conformance family.
  *
  * The reference's "stream" is a single-pass iterator with no
  * watermarks, no event-time windows, and no late-data handling
  * (SURVEY §2.3); batch metricsspark is its faithful equivalent. This
  * module goes beyond the reference: the same fused predicate bank
  * evaluated continuously over arriving page files, aggregated into
  * event-time day windows with a watermark, so late crawl records
  * update their own day until the watermark closes it.
  */
object StreamingChecks {

  val pageSchema: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("warc_ts", TimestampType),
    StructField("html", BinaryType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  /** File-source stream over a directory of page parquet files. */
  def pageStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(pageSchema)
      .option("maxFilesPerTrigger", 8)
      .parquet(dir)

  /** Fused per-day conformance counts over the stream: one event-time
    * day window per row, all predicates aggregated in a single
    * stateful operator. Run in **update** output mode: each micro-batch
    * emits the days it touched (counts are monotone, so a consumer
    * keeps the latest row per day), and the watermark evicts window
    * state once a day falls `watermark` behind the max event time —
    * that eviction is what bounds state on an unbounded stream.
    * (Complete mode — round 1 — retained every window forever, making
    * the watermark a no-op.)
    */
  def conformanceByWindow(stream: DataFrame,
      preds: Seq[Pred] = Conformance.preds,
      watermark: String = "2 days"): DataFrame = {
    def safe(id: String): String = id.replace('.', '_')
    val aggs = preds.flatMap { p =>
      Seq(
        sum(when(p.applicable, 1L).otherwise(0L)).as(s"${safe(p.id)}__n_rows"),
        sum(when(p.applicable && p.bad, 1L).otherwise(0L)).as(s"${safe(p.id)}__bad"))
    }
    stream
      .where(col("warc_ts").isNotNull) // null event time has no window; batch path owns it
      .withWatermark("warc_ts", watermark)
      .groupBy(window(col("warc_ts"), "1 day").as("day"))
      .agg(aggs.head, aggs.tail: _*)
      .select(date_format(col("day.start"), "yyyy-MM-dd").as("pday") +: preds.flatMap(p =>
        Seq(col(s"${safe(p.id)}__n_rows"), col(s"${safe(p.id)}__bad"))): _*)
  }

  /** Streaming variant of the suite's *referential + text* families:
    * broadcast the dimension snapshots into the stream (a stream–static
    * equi-join is stateless — each micro-batch probes the broadcast
    * table, no watermark interaction), derive the text columns (ONE
    * native byte scan per row — [[graft.text.TextOps.withDerived]] is a
    * deterministic stateless projection, so it fuses into the stream
    * exactly as in batch), and run conformance + referential + text
    * quality + declared-vs-derived as one windowed aggregation. This is
    * the full per-day predicate bank CheckSuite fuses in batch, so
    * streamed days converge to the batch verdict counts for all three
    * families.
    */
  def conformanceWithDims(stream: DataFrame, hostDim: DataFrame,
      langDim: DataFrame, depDim: DataFrame,
      watermark: String = "2 days"): DataFrame = {
    val joined = graft.text.TextOps.withDerived(stream)
      .withColumn("host", graft.checks.Referential.hostExpr)
      .join(broadcast(hostDim.withColumn("host_known", lit(true))), Seq("host"), "left")
      .join(broadcast(langDim.withColumn("lang_known", lit(true))), Seq("lang"), "left")
      .join(broadcast(depDim.withColumn("lang_deprecated", lit(true))), Seq("lang"), "left")
      .join(broadcast(hostDim.withColumnRenamed("host", "lang")
        .withColumn("lang_is_hostterm", lit(true))), Seq("lang"), "left")
      .join(broadcast(langDim.withColumnRenamed("lang", "host")
        .withColumn("host_is_langterm", lit(true))), Seq("host"), "left")
    conformanceByWindow(joined,
      Conformance.preds ++ graft.runtime.CheckSuite.refPreds ++ graft.text.TextOps.preds,
      watermark)
  }

  /** Append-mode violation-EVENT stream for the full fused predicate
    * bank: each arriving page emits its violation rows (check_id, kind,
    * pday, url, detail) exactly once — the problem-bag analog of the
    * update-mode counters above, so a streamed deployment gets problem
    * rows, not just counts.
    *
    * Scale shape: the whole pipeline is STATELESS — dim decoration is a
    * broadcast stream-static join, the bitmask fold and the
    * `__bm != 0` filter + explode are deterministic projections — so
    * there is no state store, no watermark, and nothing accumulates on
    * an unbounded stream; detail strings are built only for flagged
    * rows, exactly like the batch listing
    * ([[graft.checks.FusedChecks.violationsFromMasks]], which this
    * reuses verbatim — one definition, two execution modes).
    */
  def violationEvents(stream: DataFrame, hostDim: DataFrame,
      langDim: DataFrame, depDim: DataFrame): DataFrame = {
    val joined = graft.text.TextOps.withDerived(stream)
      .withColumn("host", graft.checks.Referential.hostExpr)
      .join(broadcast(hostDim.withColumn("host_known", lit(true))), Seq("host"), "left")
      .join(broadcast(langDim.withColumn("lang_known", lit(true))), Seq("lang"), "left")
      .join(broadcast(depDim.withColumn("lang_deprecated", lit(true))), Seq("lang"), "left")
      .join(broadcast(hostDim.withColumnRenamed("host", "lang")
        .withColumn("lang_is_hostterm", lit(true))), Seq("lang"), "left")
      .join(broadcast(langDim.withColumnRenamed("lang", "host")
        .withColumn("host_is_langterm", lit(true))), Seq("host"), "left")
    val preds = Conformance.preds ++ graft.runtime.CheckSuite.refPreds ++
      graft.text.TextOps.preds
    val masks = graft.checks.FusedChecks.maskFrame(joined, preds)
    // ordered = false: a global sort is meaningless (and illegal in
    // append mode without an aggregation) on an unbounded stream
    graft.checks.FusedChecks.violationsFromMasks(masks, preds, ordered = false)
  }

  /** Start the append-mode violation-event stream into a memory sink. */
  def startViolations(spark: SparkSession, dir: String, queryName: String,
      hostDim: DataFrame, langDim: DataFrame, depDim: DataFrame): StreamingQuery =
    violationEvents(pageStream(spark, dir), hostDim, langDim, depDim)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .start()

  /** Start the streaming assessment into an in-memory table (tests /
    * local monitoring) or a parquet sink. With dims, the referential
    * family streams too.
    */
  def start(spark: SparkSession, dir: String, queryName: String,
      dims: Option[(DataFrame, DataFrame, DataFrame)] = None): StreamingQuery = {
    val src = pageStream(spark, dir)
    val out = dims match {
      case Some((hostDim, langDim, depDim)) => conformanceWithDims(src, hostDim, langDim, depDim)
      case None => conformanceByWindow(src)
    }
    out.writeStream
      .outputMode("update")
      .format("memory")
      .queryName(queryName)
      .start()
  }
}
