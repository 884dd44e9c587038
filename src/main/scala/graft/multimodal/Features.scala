package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Per-payload feature extraction over the opaque binary column — the
  * plumbing a media pipeline (image decode / resize / frame-sample /
  * audio features) plugs into.
  *
  * The actual media codecs are NOT available in this environment, so
  * the "decode" is a clearly-marked deterministic stand-in
  * ([[byteHistogram]] + a hash-projected pseudo-embedding). Everything
  * around it is the real production shape: an imperative per-partition
  * iterator (`mapPartitions` — the documented last-resort tier, which
  * is exactly where a JNI/native decoder belongs), a typed output
  * schema, and no shuffle — feature extraction stays embarrassingly
  * parallel over the input partitions.
  */
object Features {

  /** Typed feature row. `byte_hist16` = 16-bucket histogram of payload
    * bytes; `pseudo_embedding` = deterministic 8-dim projection
    * (STUB for the real decoder's embedding head).
    */
  case class PayloadFeatures(
      url: String,
      n_bytes: Long,
      byte_hist16: Array[Long],
      pseudo_embedding: Array[Double])

  /** Deterministic stand-in for media decode: bucketed byte histogram. */
  def byteHistogram(bytes: Array[Byte], buckets: Int = 16): Array[Long] = {
    val h = new Array[Long](buckets)
    var i = 0
    while (i < bytes.length) {
      h((bytes(i) & 0xFF) * buckets / 256) += 1
      i += 1
    }
    h
  }

  /** Deterministic pseudo-embedding: normalized histogram folded through
    * fixed affine taps. STUB — replace with the real decoder output.
    */
  def pseudoEmbedding(hist: Array[Long], dim: Int = 8): Array[Double] = {
    val n = math.max(1L, hist.sum).toDouble
    Array.tabulate(dim) { d =>
      var acc = 0.0
      var i = 0
      while (i < hist.length) {
        acc += (hist(i) / n) * math.sin((d + 1) * (i + 1)) // fixed taps
        i += 1
      }
      acc
    }
  }

  /** Extract features for every page with a payload. Runs as a
    * per-partition iterator — the seam where a native decoder
    * (image/audio/video) would be invoked batch-wise.
    */
  def extract(pages: DataFrame): Dataset[PayloadFeatures] = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.where(col("html").isNotNull)
      .select(col("url"), col("html"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (url, payload) =>
          val hist = byteHistogram(payload)
          PayloadFeatures(url, payload.length.toLong, hist, pseudoEmbedding(hist))
        }
      }
  }

  /** Typed feature row carrying the partition day, for the per-day
    * driver surface.
    */
  case class PayloadFeaturesDay(
      pday: String,
      url: String,
      n_bytes: Long,
      byte_hist16: Array[Long])

  /** Per-pday feature profile through the real extraction seam
    * (`mapPartitions`, where a native media decoder would run): payload
    * count, total bytes, and the element-wise-summed 16-bucket byte
    * histogram as columns h00..h15. All-integer output — the DuckDB
    * oracle (`mm_features`) recomputes the histogram from `hex(html)`
    * high nibbles (bucket k of a 16-bucket byte histogram IS the high
    * nibble), so the stubbed decode path is fully value-verified.
    */
  def featuresByDay(pages: DataFrame): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    val rows = pages.where(col("html").isNotNull)
      .select(
        coalesce(date_format(col("warc_ts"), "yyyy-MM-dd"), lit("null")).as("pday"),
        col("url"), col("html"))
      .as[(String, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (pday, url, payload) =>
          PayloadFeaturesDay(pday, url, payload.length.toLong, byteHistogram(payload))
        }
      }
    val histAggs = (0 until 16).map(k =>
      sum(element_at(col("byte_hist16"), k + 1)).as(f"h$k%02d"))
    rows.groupBy(col("pday"))
      .agg(count(lit(1)).as("n_payloads"),
        (sum(col("n_bytes")).as("total_bytes") +: histAggs): _*)
      .orderBy("pday")
  }

  /** Aggregated feature profile per pday (DataFrame surface for the
    * driver): rows, total bytes, mean embedding norm (rounded).
    */
  def profile(pages: DataFrame): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    val f = extract(pages)
    val withNorm = f.select(col("url"), col("n_bytes"),
      sqrt(aggregate(transform(col("pseudo_embedding"), x => x * x),
        lit(0.0), (a, v) => a + v)).as("emb_norm"))
    withNorm.agg(
      count(lit(1)).as("n_payloads"),
      sum(col("n_bytes")).as("total_bytes"),
      round(avg(col("emb_norm")), 6).as("avg_emb_norm"))
  }
}
