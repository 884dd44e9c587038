package graft.checks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic sampling operators.
  *
  * The reference's estimated metrics rely on uniform reservoirs
  * (accessibility/.../EstimatedDereferenceability.java:54 — k=100,000)
  * and stratified-by-TLD sampling with proportional allocation + a
  * per-stratum cap
  * (EstimatedDereferenceabilityByStratified.java:66-76,152-173 — 20% of
  * the population, ≤1,000 per stratum).
  *
  * We replace RNG reservoirs with **hash-based sampling**: a row is
  * sampled iff a uniform hash of its key falls under the target
  * fraction. This is (a) deterministic across runs and parallelism —
  * the reproducibility the reference never had, (b) shuffle-free for
  * the uniform case (a pure filter, pushed next to the scan), and
  * (c) exactly mergeable. md5 is used as the hash because the DuckDB
  * oracle computes the identical digest.
  *
  * Skew (round-2 fix): the host key is 40%-skewed by construction, so a
  * `Window.partitionBy(host)` over the full table sorts the head host
  * in one task. The allocation table needs no window at all (a count
  * aggregate determines the per-stratum take exactly), and the sample
  * rows use a salted two-phase top-k: rank within (host, salt) first —
  * bounding every sort group to ~1/32 of a stratum — then rank the
  * ≤32·cap survivors per host. The union of per-salt top-`take` rows
  * provably contains the global top-`take`, so the result is exact.
  */
object Sampling {

  /** First two hex digits of md5(url) → uniform value in 0..255.
    * Rendered as SQL text that parses identically in Spark and DuckDB.
    */
  val U256Sql = "(instr('0123456789abcdef', substr(md5(url), 1, 1)) - 1) * 16 + (instr('0123456789abcdef', substr(md5(url), 2, 1)) - 1)"

  /** Salt fan-out for the two-phase top-k. */
  val Salts = 32

  /** Uniform ~20% sample (u256 < 51): deterministic analog of the
    * reference's uniform reservoirs. A pure filter — no shuffle.
    */
  def uniformSample(pages: DataFrame, threshold256: Int = 51): DataFrame =
    pages.where(expr(U256Sql) < threshold256)

  /** Verdict row for the uniform sample: sampled fraction must be within
    * tolerance of the target. Output (rows, sampled, frac).
    */
  def uniformSampleStats(pages: DataFrame, threshold256: Int = 51): DataFrame =
    pages.agg(
      count(lit(1)).as("n_rows"),
      sum(when(expr(U256Sql) < threshold256, 1L).otherwise(0L)).as("sampled"))
      .withColumn("frac", col("sampled").cast("double") / col("n_rows").cast("double"))

  /** Sampled-check composition (the reference's Estimated* family,
    * e.g. EstimatedUsageOfIncorrectDomainOrRangeDatatypes.java:153-224):
    * run the url-conformance predicate over the deterministic ~20%
    * uniform sample, scale the violation count back up by the measured
    * sampling ratio, and report the estimated per-day verdict. One
    * column-pruned scan computes full counts, sample counts, and sample
    * violations together. Audit rows for this check carry
    * `estimate = true` (CheckSuite flags `est_*` ids).
    *
    * Output: (pday, n_rows, sampled, violations, value, pass) where
    * `violations` is the scaled estimate and `value` the in-sample
    * conformance ratio (the ratio estimator — the sampling fraction
    * cancels).
    */
  def estimatedUrlConformance(pages: DataFrame, threshold256: Int = 51): DataFrame = {
    val p = graft.checks.Conformance.byId("conform_url")
    val inSample = expr(U256Sql) < threshold256
    pages.withColumn("pday", FusedChecks.pday)
      .groupBy(col("pday"))
      .agg(
        sum(when(p.applicable, 1L).otherwise(0L)).as("n_rows"),
        sum(when(p.applicable && inSample, 1L).otherwise(0L)).as("sampled"),
        sum(when(p.applicable && inSample && p.bad, 1L).otherwise(0L)).as("bad_sampled"))
      .withColumn("violations",
        when(col("sampled") === 0, 0L).otherwise(
          round(col("bad_sampled").cast("double") * col("n_rows").cast("double")
            / col("sampled").cast("double"), 0).cast("long")))
      .withColumn("value",
        when(col("sampled") === 0, 1.0).otherwise(
          lit(1.0) - col("bad_sampled").cast("double") / col("sampled").cast("double")))
      .withColumn("pass", col("value") >= p.threshold)
      .select("pday", "n_rows", "sampled", "violations", "value", "pass")
      .orderBy("pday")
  }

  /** Sampled composition for the *expensive* text-derivation check
    * (#32 EstimatedMisreportedContentType: the declared-vs-derived
    * comparison run over the sample only, scaled back up). The
    * language derivation — the costly part at 100 TB — is evaluated
    * under `when(inSample, …)`, so only ~20% of rows pay for it;
    * `n_rows` (the scaling denominator) needs only null/length checks.
    *
    * Output: (pday, n_rows, sampled, violations, value, pass) where
    * `sampled` counts in-sample rows with a confident derivation,
    * `violations` the scaled misreport estimate, `value` the in-sample
    * conformance ratio.
    */
  def estimatedDeclaredVsDerived(pages: DataFrame, threshold256: Int = 51,
      threshold: Double = 0.5): DataFrame = {
    val inSample = expr(U256Sql) < threshold256
    val applicable = col("text").isNotNull && length(col("text")) > 0 && col("lang").isNotNull
    val detected = graft.text.TextOps.detectedLang(col("text"))
    pages.withColumn("pday", FusedChecks.pday)
      .withColumn("det", when(inSample && applicable, detected))
      .groupBy(col("pday"))
      .agg(
        sum(when(applicable, 1L).otherwise(0L)).as("n_rows"),
        sum(when(col("det").isNotNull && col("det") =!= "und", 1L).otherwise(0L)).as("sampled"),
        sum(when(col("det").isNotNull && col("det") =!= "und" && col("det") =!= col("lang"), 1L)
          .otherwise(0L)).as("bad_sampled"))
      .withColumn("violations",
        when(col("sampled") === 0, 0L).otherwise(
          round(col("bad_sampled").cast("double") * col("n_rows").cast("double")
            / col("sampled").cast("double"), 0).cast("long")))
      .withColumn("value",
        when(col("sampled") === 0, 1.0).otherwise(
          lit(1.0) - col("bad_sampled").cast("double") / col("sampled").cast("double")))
      .withColumn("pass", col("value") >= threshold)
      .select("pday", "n_rows", "sampled", "violations", "value", "pass")
      .orderBy("pday")
  }

  // ——— suite integration: the estimate counters as extra aggregate
  // columns riding the suite's ONE per-pday scan (FusedChecks.wideByDay)
  // instead of a separate table pass per estimate family. Row builders
  // reuse the exact double-op order of the standalone queries, so the
  // suite verdicts stay value-identical to the oracles. ———

  /** Aggregates for [[estimatedUrlConformance]] over the fused scan. */
  def estUrlAggs(threshold256: Int = 51): Seq[org.apache.spark.sql.Column] = {
    val p = graft.checks.Conformance.byId("conform_url")
    val inS = expr(U256Sql) < threshold256
    Seq(
      sum(when(p.applicable, 1L).otherwise(0L)).as("estu_n"),
      sum(when(p.applicable && inS, 1L).otherwise(0L)).as("estu_s"),
      sum(when(p.applicable && inS && p.bad, 1L).otherwise(0L)).as("estu_b"))
  }

  /** Aggregates for [[estimatedDeclaredVsDerived]] over the fused scan —
    * requires the `detected_lang` column (TextOps.withDerived), which
    * the suite's joined frame already carries.
    */
  def estDeclaredAggs(threshold256: Int = 51): Seq[org.apache.spark.sql.Column] = {
    val inS = expr(U256Sql) < threshold256
    val appl = col("text").isNotNull && length(col("text")) > 0 && col("lang").isNotNull
    val confident = appl && inS && col("detected_lang") =!= "und"
    Seq(
      sum(when(appl, 1L).otherwise(0L)).as("estd_n"),
      sum(when(confident, 1L).otherwise(0L)).as("estd_s"),
      sum(when(confident && col("detected_lang") =!= col("lang"), 1L).otherwise(0L)).as("estd_b"))
  }

  /** [[estUrlAggs]] over the suite's atoms frame: url validity and the
    * u256 sample gate are pre-derived columns there, so the counters
    * are pure boolean arithmetic (no md5 recomputation). Counted sets
    * are identical to [[estUrlAggs]] — url_valid ≡ (url IS NOT NULL AND
    * valid), so ¬url_valid under the applicable (non-null) gate ≡ the
    * predicate's `bad`.
    */
  def estUrlAggsAtoms(): Seq[org.apache.spark.sql.Column] = Seq(
    sum(when(col("url").isNotNull, 1L).otherwise(0L)).as("estu_n"),
    sum(when(col("url").isNotNull && col("in_sample"), 1L).otherwise(0L)).as("estu_s"),
    sum(when(col("url").isNotNull && col("in_sample") && !col("url_valid"), 1L)
      .otherwise(0L)).as("estu_b"))

  /** [[estDeclaredAggs]] over the suite's atoms frame (text_ok ≡
    * text IS NOT NULL AND length > 0).
    */
  def estDeclaredAggsAtoms(): Seq[org.apache.spark.sql.Column] = {
    val appl = col("text_ok") && col("lang").isNotNull
    val confident = appl && col("in_sample") && col("detected_lang") =!= "und"
    Seq(
      sum(when(appl, 1L).otherwise(0L)).as("estd_n"),
      sum(when(confident, 1L).otherwise(0L)).as("estd_s"),
      sum(when(confident && col("detected_lang") =!= col("lang"), 1L)
        .otherwise(0L)).as("estd_b"))
  }

  /** Estimate verdict rows from the wide frame's (n, sampled, bad)
    * counters; identical arithmetic to the standalone queries.
    */
  def estRowsFromWide(wide: DataFrame, checkId: String, nCol: String,
      sCol: String, bCol: String, threshold: Double): DataFrame =
    wide.select(
      lit(checkId).as("check_id"), col("pday"),
      col(nCol).as("n_rows"),
      when(col(sCol) === 0, 0L).otherwise(
        round(col(bCol).cast("double") * col(nCol).cast("double")
          / col(sCol).cast("double"), 0).cast("long")).as("violations"),
      when(col(sCol) === 0, 1.0).otherwise(
        lit(1.0) - col(bCol).cast("double") / col(sCol).cast("double")).as("value"))
      .withColumn("pass", col("value") >= threshold)

  private def withHost(pages: DataFrame): DataFrame =
    pages.withColumn("host", Referential.hostExpr).where(col("host") =!= "")

  private def takeExpr(n: org.apache.spark.sql.Column, cap: Int) =
    least(lit(cap.toLong), floor((n + 4) / lit(5.0)).cast("long"))

  /** Equal-allocation take: a fixed cap per stratum regardless of its
    * size (the reference's per-TLD fixed-cap scheme,
    * EstimatedDereferenceabilityByTld.java:56-71 — every TLD gets the
    * same budget, small strata are fully sampled).
    */
  private def takeEqualExpr(n: org.apache.spark.sql.Column, cap: Int) =
    least(lit(cap.toLong), n)

  /** Proportional-allocation table by host with a per-stratum cap:
    * per host take ceil(20%) of its rows, at most `cap`. Pure count
    * aggregate — no window, no skew exposure. Output
    * (host, stratum_rows, sample_rows), mirroring
    * EstimatedDereferenceabilityByStratified's per-TLD share
    * computation (:152-173).
    */
  def stratifiedAllocation(pages: DataFrame, cap: Int = 25): DataFrame =
    withHost(pages)
      .groupBy(col("host"))
      .agg(count(lit(1)).as("stratum_rows"))
      .select(col("host"), col("stratum_rows"),
        takeExpr(col("stratum_rows"), cap).as("sample_rows"))
      .orderBy("host")

  /** The stratified sample rows themselves (host, url): per host the
    * `take` rows with the smallest md5(url) (deterministic choice).
    * Exact, via the salted two-phase top-k described in the class doc.
    */
  def stratifiedSample(pages: DataFrame, cap: Int = 25): DataFrame =
    stratifiedSampleBy(pages, takeExpr(_, cap))

  /** Equal-allocation variant of [[stratifiedAllocation]] (#29): fixed
    * per-stratum budget, equal shares. Output
    * (host, stratum_rows, sample_rows).
    */
  def stratifiedEqualAllocation(pages: DataFrame, cap: Int = 10): DataFrame =
    withHost(pages)
      .groupBy(col("host"))
      .agg(count(lit(1)).as("stratum_rows"))
      .select(col("host"), col("stratum_rows"),
        takeEqualExpr(col("stratum_rows"), cap).as("sample_rows"))
      .orderBy("host")

  /** Equal-allocation sample rows: per host the `min(cap, n)` rows with
    * the smallest md5(url); same salted two-phase machinery.
    */
  def stratifiedSampleEqual(pages: DataFrame, cap: Int = 10): DataFrame =
    stratifiedSampleBy(pages, takeEqualExpr(_, cap))

  /** #33 EstimatedMisreportedContentTypeByStratified — the actual
    * *composition* of the stratified sample and the expensive
    * declared-vs-derived check (reference:
    * A/availability/EstimatedMisreportedContentTypeByStratified.java):
    * per host, take the equal-allocation sample of distinct urls
    * (min(cap, n) smallest md5(url) — deterministic), evaluate the
    * language derivation ONLY on the sampled rows, and scale each
    * host's misreport count back by its own sampling ratio.
    *
    * Scale shape: the sample-url set is broadcast-sized (hosts × cap),
    * so membership is a broadcast join; the corpus-scale aggregation is
    * one groupBy(host) whose derivation column is evaluated under
    * `when(in_sample, …)` — only ≤cap·hosts rows pay for it. The
    * distinct-url pass ranks with the same salted two-phase window as
    * [[stratifiedSampleEqual]] (no full-stratum sort on the 40%-skewed
    * head host).
    *
    * Output: (host, n_rows, sampled, violations, value, pass) where
    * `violations` is the per-host scaled estimate and `value` the
    * in-sample conformance ratio, ordered by host.
    */
  def estimatedDeclaredVsDerivedStratified(pages: DataFrame, cap: Int = 10,
      threshold: Double = 0.5): DataFrame = {
    val applicable = col("text").isNotNull && length(col("text")) > 0 && col("lang").isNotNull
    val rows = withHost(pages).where(applicable)
    // equal-allocation sample at the URL (entity) level: every snapshot
    // of a sampled url is in, none of an unsampled one
    val urls = rows.select(col("host"), col("url")).distinct()
    val salted = urls.withColumn("salt", pmod(xxhash64(col("url")), lit(Salts.toLong)))
    val w1 = Window.partitionBy(col("host"), col("salt")).orderBy(md5(col("url")), col("url"))
    val w2 = Window.partitionBy(col("host")).orderBy(md5(col("url")), col("url"))
    val sampleUrls = salted
      .withColumn("r1", row_number().over(w1)).where(col("r1") <= cap)
      .withColumn("rnk", row_number().over(w2)).where(col("rnk") <= cap)
      .select(col("host"), col("url"), lit(true).as("in_s"))
    val detected = graft.text.TextOps.detectedLang(col("text"))
    rows.join(broadcast(sampleUrls), Seq("host", "url"), "left")
      .withColumn("det", when(coalesce(col("in_s"), lit(false)), detected))
      .groupBy(col("host"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("det").isNotNull && col("det") =!= "und", 1L).otherwise(0L)).as("sampled"),
        sum(when(col("det").isNotNull && col("det") =!= "und" && col("det") =!= col("lang"), 1L)
          .otherwise(0L)).as("bad_sampled"))
      .withColumn("violations",
        when(col("sampled") === 0, 0L).otherwise(
          round(col("bad_sampled").cast("double") * col("n_rows").cast("double")
            / col("sampled").cast("double"), 0).cast("long")))
      .withColumn("value",
        when(col("sampled") === 0, 1.0).otherwise(
          lit(1.0) - col("bad_sampled").cast("double") / col("sampled").cast("double")))
      .withColumn("pass", col("value") >= threshold)
      .select("host", "n_rows", "sampled", "violations", "value", "pass")
      .orderBy("host")
  }

  private def stratifiedSampleBy(pages: DataFrame,
      takeOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column): DataFrame = {
    val rows = withHost(pages)
      .select(col("host"), col("url"),
        coalesce(col("warc_ts").cast("long"), lit(-1L)).as("ts"))
    val takes = rows.groupBy("host").agg(count(lit(1)).as("n"))
      .select(col("host"), takeOf(col("n")).as("take"))
    val salted = rows.withColumn("salt", pmod(xxhash64(col("url")), lit(Salts.toLong)))
    val w1 = Window.partitionBy(col("host"), col("salt"))
      .orderBy(md5(col("url")), col("url"), col("ts"))
    val survivors = salted
      .withColumn("r1", row_number().over(w1))
      .join(broadcast(takes), "host")
      .where(col("r1") <= col("take")) // ≤ Salts·cap rows per host remain
    val w2 = Window.partitionBy(col("host"))
      .orderBy(md5(col("url")), col("url"), col("ts"))
    survivors
      .withColumn("rnk", row_number().over(w2))
      .where(col("rnk") <= col("take"))
      .select(col("host"), col("url"))
      .orderBy("host", "url")
  }
}
