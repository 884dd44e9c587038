package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}
import java.sql.Timestamp

/** Stateful streaming exact-dedup: the continuous twin of the batch
  * uniqueness family (`Uniqueness.duplicateTexts` /
  * `TextOps.fingerprintGroups`), keyed by the same whitespace-normalized
  * md5 fingerprint, built on `flatMapGroupsWithState` — the custom-state
  * streaming surface (`KeyValueGroupedDataset`) the rest of the module
  * deliberately avoids because its aggregations are expressible as
  * windowed built-ins; first-seen-wins dedup is not (it needs an
  * arbitrary per-key record, not a commutative aggregate).
  *
  * Reference analog: the reference's conciseness metrics
  * (`ExtensionalConciseness`) fold duplicates over a one-pass iterator
  * with an in-memory seen-set; this is the same contract made
  * distributed and unbounded — state lives in the state store
  * (HDFS/RocksDB-backed on a cluster), partitioned by fingerprint.
  *
  * Scale design:
  *  - The shuffle key is the 32-char md5 (fits the state store's key
  *    space); page text/html never enters the stateful operator — the
  *    projection below the groupByKey carries (fp, url, warc_ts) only.
  *  - State per distinct fingerprint is ~(first url, count): O(distinct
  *    docs) total, the floor for exact dedup. The event-time timeout
  *    bounds it to a *dedup horizon*: a fingerprint idle past the
  *    horizon is evicted (and a later recurrence re-reported as first
  *    seen) — the standard production trade-off; an unbounded-horizon
  *    run is exact.
  *  - Emission is append-mode and incremental: each arrival produces
  *    exactly one event, flagged against the state as of its batch, so
  *    downstream sinks get a monotone duplicate log, not a re-emitted
  *    table.
  */
object StreamingDedup {

  /** Projected arrival: fingerprint key + the two audit columns. */
  case class DocArrival(fp: String, url: String, warc_ts: Timestamp)

  /** Per-fingerprint state: the first-seen url and arrivals so far. */
  case class DedupState(firstUrl: String, nSeen: Long)

  /** One output event per arrival. `dup_of` is the retained (first)
    * url; `n_seen_before` is the duplicate's 0-based arrival index.
    */
  case class DedupEvent(fp: String, url: String, is_duplicate: Boolean,
      dup_of: String, n_seen_before: Long)

  /** Continuous first-seen-wins dedup over a page stream. `watermark`
    * drives event-time progress; `horizonMs` is the dedup horizon —
    * state idle past it (in event time) is evicted. Within one
    * micro-batch, arrivals of a fingerprint are ordered by
    * (warc_ts, url) so the batch split never changes which of two
    * same-batch docs is the duplicate. (That per-group sort materializes
    * one fingerprint's arrivals *within one micro-batch* — bounded by
    * the trigger size (`maxFilesPerTrigger`), not the corpus; a viral
    * text spread over many batches costs one state row, not one group.)
    */
  def dedupEvents(stream: DataFrame, watermark: String = "2 days",
      horizonMs: Long = 365L * 24 * 3600 * 1000): Dataset[DedupEvent] = {
    val spark = stream.sparkSession
    import spark.implicits._

    def fn(fp: String, rows: Iterator[DocArrival],
        state: GroupState[DedupState]): Iterator[DedupEvent] = {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        val arrivals = rows.toSeq.sortBy(a => (a.warc_ts.getTime, a.url))
        var st = state.getOption.getOrElse(DedupState("", 0L))
        val out = arrivals.map { a =>
          val ev =
            if (st.nSeen == 0L) DedupEvent(fp, a.url, is_duplicate = false, a.url, 0L)
            else DedupEvent(fp, a.url, is_duplicate = true, st.firstUrl, st.nSeen)
          st = DedupState(if (st.nSeen == 0L) a.url else st.firstUrl, st.nSeen + 1)
          ev
        }
        state.update(st)
        state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + horizonMs)
        out.iterator
      }
    }

    stream
      .where(col("text").isNotNull && col("warc_ts").isNotNull)
      .withWatermark("warc_ts", watermark)
      .select(graft.text.TextOps.fingerprint(col("text")).as("fp"),
        col("url"), col("warc_ts"))
      .as[DocArrival]
      .groupByKey(_.fp)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn _)
  }

  /** Start the dedup stream from a page directory into an in-memory
    * sink (tests / local monitoring); a deployment swaps the sink for
    * parquet/Kafka — the event log is append-only by construction.
    */
  def start(spark: org.apache.spark.sql.SparkSession, dir: String,
      queryName: String): StreamingQuery =
    dedupEvents(StreamingChecks.pageStream(spark, dir))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .start()
}
