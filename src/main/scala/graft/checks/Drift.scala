package graft.checks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.agg.HistAggregator

/** Distribution-drift checks: two-sample PSI and KS over binned
  * histograms of `lang` and `hour(warc_ts)`, comparing the second half
  * of the crawl window against the first (current vs baseline
  * snapshot).
  *
  * Reference analogs: #21 MultipleLanguageUsage / #24
  * VocabularyUsageIndication capture distribution *shape*; the
  * KS/PSI machinery itself is new (north rule requirement), built on
  * the typed [[HistAggregator]] so histogram construction is a
  * partial-agg + tiny-map merge — the only data that crosses the
  * shuffle boundary for a 100 TB input is one ≤K-entry map per input
  * partition.
  *
  * Determinism: statistics are folded over *sorted* bin keys so the
  * floating-point sum order is fixed regardless of parallelism.
  */
object Drift {

  /** Baseline = crawl days before this date, current = this date on. */
  val SplitDay = "2024-01-23"
  val WindowLo = "2024-01-01"
  val WindowHi = "2024-02-15" // exclusive

  val PsiThreshold = 0.2
  val KsThreshold  = 0.1

  /** Two histograms in one pass: side ("base"/"cur") → bin → count.
    *
    * Implementation note: the relational `groupBy(side, bin).count()`
    * is the scalable form — a codegen'd hash partial-agg per input
    * partition, shuffling only ≤2·K tiny rows. It is semantically the
    * [[HistAggregator]] monoid (same zero/reduce/merge laws, verified
    * in AggregatorSpec); the typed Aggregator remains the extension
    * point for sketches that have no relational equivalent, but the
    * row-at-a-time typed path deserializes every row and was measured
    * 8× slower at 2M docs.
    */
  /** Bin-count bound for the driver-side fold: `bin` values come from
    * attacker-controlled input (`lang` is whatever the crawl declared),
    * so the collected histogram is capped at the top-K bins by total
    * count, everything else folded into '(other)'. The cap runs on the
    * *already aggregated* cells — no extra table scan — and keeps the
    * '(other)' mass, so PSI/KS still see the full population.
    */
  val MaxBins = 1000

  private def capBins(cells: DataFrame, maxBins: Int): DataFrame = {
    val top = cells.groupBy("bin").agg(sum("count").as("t"))
      .orderBy(col("t").desc, col("bin")).limit(maxBins)
      .select(col("bin"), lit(true).as("keep"))
    cells.join(broadcast(top), Seq("bin"), "left")
      .select(col("side"),
        when(col("keep"), col("bin")).otherwise(lit("(other)")).as("bin"),
        col("count"))
      .groupBy("side", "bin").agg(sum("count").as("count"))
  }

  def twoSampleHist(pages: DataFrame, bin: org.apache.spark.sql.Column): Map[String, Map[String, Long]] = {
    val cells = pages.withColumn("pday", FusedChecks.pday)
      .where(col("pday") >= WindowLo && col("pday") < WindowHi)
      .select(
        when(col("pday") >= SplitDay, "cur").otherwise("base").as("side"),
        bin.cast("string").as("bin"))
      .groupBy("side", "bin").count()
    capBins(cells, MaxBins)
      .collect()
      .groupBy(_.getString(0))
      .map { case (side, rows) =>
        side -> rows.map(r => r.getString(1) -> r.getLong(2)).toMap
      }
  }

  /** Both drift checks (lang PSI + hour KS) from ONE table scan: a
    * single (side, lang, hour) grouping — ≤ 2·K_lang·24 cells, so the
    * partial agg collapses each input partition to a few hundred rows
    * and both marginals fall out driver-side. (An earlier explode-based
    * variant doubled the rows through the aggregate; the joint-cell
    * grouping does strictly less work.)
    */
  def combined(pages: DataFrame): DataFrame = {
    val joint = pages.withColumn("pday", FusedChecks.pday)
      .where(col("pday") >= WindowLo && col("pday") < WindowHi)
      .select(
        when(col("pday") >= SplitDay, "cur").otherwise("base").as("side"),
        coalesce(col("lang"), lit("null")).as("lang_bin"),
        lpad(hour(col("warc_ts")).cast("string"), 2, "0").as("hour_bin"))
      .groupBy("side", "lang_bin", "hour_bin").count()
    // cap the unbounded (lang) dimension on the aggregated cells; hour
    // is structurally ≤ 25 bins
    val top = joint.groupBy("lang_bin").agg(sum("count").as("t"))
      .orderBy(col("t").desc, col("lang_bin")).limit(MaxBins)
      .select(col("lang_bin"), lit(true).as("keep"))
    val cells = joint.join(broadcast(top), Seq("lang_bin"), "left")
      .select(col("side"),
        when(col("keep"), col("lang_bin")).otherwise(lit("(other)")).as("lang_bin"),
        col("hour_bin"), col("count"))
      .groupBy("side", "lang_bin", "hour_bin").agg(sum("count").as("count"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    def marginal(bin: ((String, String, String, Long)) => String): Map[String, Map[String, Long]] =
      cells.groupBy(_._1).map { case (side, rs) =>
        side -> rs.groupBy(bin).map { case (b, bs) => b -> bs.map(_._4).sum }
      }
    val langH = marginal(_._2); val hourH = marginal(_._3)
    val spark = pages.sparkSession
    result(spark, "drift_lang_psi", "psi", langH,
      psi(langH.getOrElse("base", Map.empty), langH.getOrElse("cur", Map.empty)), PsiThreshold)
      .unionByName(
        result(spark, "drift_hour_ks", "ks", hourH,
          ks(hourH.getOrElse("base", Map.empty), hourH.getOrElse("cur", Map.empty)), KsThreshold))
  }

  /** Population-stability index with add-λ smoothing over the union of
    * bins; deterministic fold over sorted bin keys.
    */
  def psi(base: Map[String, Long], cur: Map[String, Long], lambda: Double = 0.5): Double = {
    val bins = (base.keySet ++ cur.keySet).toSeq.sorted
    val k = bins.size.toDouble
    val tb = base.values.sum.toDouble
    val tc = cur.values.sum.toDouble
    bins.foldLeft(0.0) { (acc, b) =>
      val pb = (base.getOrElse(b, 0L) + lambda) / (tb + lambda * k)
      val pc = (cur.getOrElse(b, 0L) + lambda) / (tc + lambda * k)
      acc + (pc - pb) * math.log(pc / pb)
    }
  }

  /** Two-sample KS statistic over ordered bins: max |CDF_base − CDF_cur|.
    * Cumulates exact long counts and divides once per bin, so the float
    * arithmetic is bit-identical to the SQL-oracle formulation
    * (`sum(count) over (order by bin) / total`).
    */
  def ks(base: Map[String, Long], cur: Map[String, Long]): Double = {
    val bins = (base.keySet ++ cur.keySet).toSeq.sorted
    val tb = base.values.sum.toDouble
    val tc = cur.values.sum.toDouble
    var cb = 0L; var cc = 0L; var m = 0.0
    bins.foreach { b =>
      cb += base.getOrElse(b, 0L)
      cc += cur.getOrElse(b, 0L)
      m = math.max(m, math.abs(cb / tb - cc / tc))
    }
    m
  }

  private def result(spark: SparkSession, checkId: String, stat: String,
      hists: Map[String, Map[String, Long]], value: Double, threshold: Double): DataFrame = {
    import spark.implicits._
    val base = hists.getOrElse("base", Map.empty)
    val cur = hists.getOrElse("cur", Map.empty)
    Seq((checkId, stat, base.values.sum, cur.values.sum,
      (base.keySet ++ cur.keySet).size.toLong,
      BigDecimal(value).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      value <= threshold))
      .toDF("check_id", "stat", "base_rows", "cur_rows", "bins", "value", "pass")
  }

  /** PSI drift on the lang histogram (null → 'null' bin). */
  def langPsi(pages: DataFrame): DataFrame = {
    val h = twoSampleHist(pages, coalesce(col("lang"), lit("null")))
    result(pages.sparkSession, "drift_lang_psi", "psi", h,
      psi(h.getOrElse("base", Map.empty), h.getOrElse("cur", Map.empty)), PsiThreshold)
  }

  /** KS drift on the hour-of-day histogram (bins zero-padded so the
    * lexicographic sort equals the numeric order).
    */
  def hourKs(pages: DataFrame): DataFrame = {
    val h = twoSampleHist(pages, lpad(hour(col("warc_ts")).cast("string"), 2, "0"))
    result(pages.sparkSession, "drift_hour_ks", "ks", h,
      ks(h.getOrElse("base", Map.empty), h.getOrElse("cur", Map.empty)), KsThreshold)
  }

  /** Per-side lang histogram as a DataFrame (oracle-checkable shape). */
  def langHistogram(pages: DataFrame): DataFrame =
    pages.withColumn("pday", FusedChecks.pday)
      .where(col("pday") >= WindowLo && col("pday") < WindowHi)
      .select(
        when(col("pday") >= SplitDay, "cur").otherwise("base").as("side"),
        coalesce(col("lang"), lit("null")).as("bin"))
      .groupBy("side", "bin").agg(count(lit(1)).as("n"))
      .orderBy("side", "bin")
}
