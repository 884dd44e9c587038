package graft.checks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{CheckId, ViolationKind}
import graft.synth.PageSynth

/** Vocabulary-dimension checks — the reference metrics that test *which
  * terms* a dataset uses against small external vocabulary snapshots:
  *
  *  - #14 UsageOfDeprecatedClassesOrProperties
  *    (`I/consistency/UsageOfDeprecatedClassesOrProperties.java:52-96`,
  *    deprecation lookup `U/commons/VocabularyLoader.java:650-665`):
  *    value = 1 − deprecated-term usages / total. Page-table analog:
  *    declared `lang` appearing in a deprecated-terms dimension.
  *  - #18 ReuseExistingTerms
  *    (`R/interoperability/ReuseExistingTerms.java:102-155,158-172`):
  *    value = |used ∩ suggested| / |used|; suggested-but-unused vocab
  *    members become problem rows (`:200-253`).
  *  - #24 VocabularyUsageIndication
  *    (`C/understandability/VocabularyUsageIndication.java:64-98,118-131`):
  *    value = |used ∩ declared| / |used| over the dataset's declared
  *    vocabulary indication (here: the lang_dim snapshot the dataset
  *    ships with).
  *
  * Scale shapes: the dimensions are constant-size snapshots →
  * **broadcast** joins only; the "used terms" sets are
  * lang-cardinality (≤ a few hundred distinct tags even at 100 TB), so
  * the distinct-aggregation shuffles carry tag strings, never page
  * rows; the per-day deprecated verdict is one hash-agg over the
  * broadcast-joined scan.
  */
object Vocabulary {

  /** Deprecated terms snapshot (owl:DeprecatedClass/Property analog):
    * 'de' is present in the corpus (a live deprecated-usage signal);
    * 'ja' is dim-only (deprecation of an unused term must not count).
    */
  val DeprecatedLangs: Seq[String] = Seq("de", "ja")

  def deprecatedDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    DeprecatedLangs.toDF("lang")
  }

  /** DuckDB rendering of the deprecated dim for oracle SQL. */
  def deprecatedDimDuck: String =
    DeprecatedLangs.map(l => s"('$l')").mkString("SELECT * FROM (VALUES ", ", ", ") dep(lang)")

  /** Suggested-vocabulary config (the per-domain suggestion list
    * ReuseExistingTerms.before() loads, `:66-81`): 'it' is suggested
    * but absent from the corpus → an unused-suggested problem row.
    */
  val SuggestedLangs: Seq[String] = Seq("en", "fr", "es", "it")

  def suggestedDimDuck: String =
    SuggestedLangs.map(l => s"('$l')").mkString("SELECT * FROM (VALUES ", ", ", ") sug(lang)")

  private val validLang =
    col("lang").isNotNull && graft.functions.NativeValidators.validLangTag(col("lang"))

  /** #14 per-pday verdict: (pday, n_rows, violations, value, pass) —
    * usages of deprecated terms among syntactically valid declared
    * tags. Broadcast left join against the deprecated dim.
    */
  def deprecatedByDay(pages: DataFrame, depDim: DataFrame,
      threshold: Double = 0.8): DataFrame =
    pages.withColumn("pday", FusedChecks.pday)
      .where(validLang)
      .join(broadcast(depDim.withColumn("dep", lit(true))), Seq("lang"), "left")
      .groupBy(col("pday"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("dep"), 1L).otherwise(0L)).as("violations"))
      .withColumn("value",
        lit(1.0) - col("violations").cast("double") / col("n_rows").cast("double"))
      .withColumn("pass", col("value") >= threshold)
      .orderBy("pday")

  /** #14 problem rows, grouped per deprecated term (bounded listing):
    * (lang, n_rows, min_url).
    */
  def deprecatedUsages(pages: DataFrame, depDim: DataFrame): DataFrame =
    pages.where(validLang)
      .join(broadcast(depDim), Seq("lang"), "left_semi")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_rows"), min(col("url")).as("min_url"))
      .orderBy("lang")

  /** Distinct syntactically-valid terms used by the corpus — the shared
    * "used vocabulary" set of #18/#24. Tag-cardinality frame: ONE
    * corpus-scale distinct serves both checks (the suite materializes
    * it once and derives both verdicts from it).
    */
  def usedTermsFrame(pages: DataFrame): DataFrame =
    pages.where(validLang).select(col("lang")).distinct()

  /** #18 verdict over a pre-built used-terms frame. */
  def reuseTermsFromUsed(used: DataFrame, suggested: Seq[String] = SuggestedLangs,
      threshold: Double = 0.4): DataFrame =
    used
      .agg(count(lit(1)).as("n_used"),
        sum(when(col("lang").isin(suggested: _*), 1L).otherwise(0L)).as("n_overlap"))
      .select(col("n_used"), col("n_overlap"),
        (col("n_used") - col("n_overlap")).as("violations"),
        // empty-corpus guard (nothing used → vacuously conformant),
        // matching the fused-family NaN → 1.0 convention
        when(col("n_used") === 0, 1.0).otherwise(
          col("n_overlap").cast("double") / col("n_used").cast("double")).as("value"))
      .withColumn("pass", col("value") >= threshold)

  /** #18 single-row verdict: value = |used ∩ suggested| / |used|.
    * (n_used, n_overlap, violations = used − overlap, value, pass).
    */
  def reuseTerms(pages: DataFrame, suggested: Seq[String] = SuggestedLangs,
      threshold: Double = 0.4): DataFrame =
    reuseTermsFromUsed(usedTermsFrame(pages), suggested, threshold)

  /** #18 problem bag over a pre-built used-terms frame. */
  def unusedSuggestedFromUsed(used: DataFrame,
      suggested: Seq[String] = SuggestedLangs): DataFrame = {
    val spark = used.sparkSession
    import spark.implicits._
    suggested.toDF("lang")
      .join(used, Seq("lang"), "left_anti")
      .orderBy("lang")
  }

  /** #18 problem bag: suggested terms the corpus never uses
    * (`ReuseExistingTerms.java:200-253` emits exactly this). Output
    * (lang), ordered.
    */
  def unusedSuggested(pages: DataFrame, suggested: Seq[String] = SuggestedLangs): DataFrame =
    unusedSuggestedFromUsed(usedTermsFrame(pages), suggested)

  /** #24 verdict over a pre-built used-terms frame. */
  def vocabUsageFromUsed(used: DataFrame, langDim: DataFrame,
      threshold: Double = 0.8): DataFrame = {
    // the declared-vocabulary cardinality is a broadcast-size constant;
    // resolving it driver-side drops the 1-row crossJoin from the plan
    val nDeclared = langDim.count()
    used
      .join(broadcast(langDim.withColumn("decl", lit(true))), Seq("lang"), "left")
      .agg(count(lit(1)).as("n_used"),
        sum(when(col("decl"), 1L).otherwise(0L)).as("n_overlap"))
      .select(col("n_used"), lit(nDeclared).as("n_declared"), col("n_overlap"),
        // empty-corpus guard, matching the fused-family convention
        when(col("n_used") === 0, 1.0).otherwise(
          col("n_overlap").cast("double") / col("n_used").cast("double")).as("value"))
      .withColumn("pass", col("value") >= threshold)
  }

  /** #24 single-row verdict: value = |used ∩ declared| / |used| against
    * the dataset's declared vocabulary indication (lang_dim).
    * (n_used, n_declared, n_overlap, value, pass).
    */
  def vocabUsage(pages: DataFrame, langDim: DataFrame,
      threshold: Double = 0.8): DataFrame =
    vocabUsageFromUsed(usedTermsFrame(pages), langDim, threshold)

  // ——— #11 MisplacedClassesOrProperties ———
  //
  // Reference (`I/consistency/MisplacedClassesOrProperties.java:60-115`):
  // a term used in property position that the vocabulary knows as a
  // class (and vice versa), value = 1 − misplaced/total. Page-table
  // positions: the `lang` column holds lang-kind terms, the url host
  // position holds host-kind terms; the term-kind dimension is the
  // union of both vocabularies.

  /** Term-kind dimension: every known term with its kind. */
  def termDim(spark: SparkSession): DataFrame =
    PageSynth.hostDim(spark).select(col("host").as("term"), lit("host").as("kind"))
      .unionAll(PageSynth.langDim(spark).select(col("lang").as("term"), lit("lang").as("kind")))

  /** Pages with both positions resolved against the term dim:
    * adds (pday, host, lang_kind, host_kind).
    */
  private def withTermKinds(pages: DataFrame, termDim: DataFrame): DataFrame =
    pages.withColumn("pday", FusedChecks.pday)
      .withColumn("host", Referential.hostExpr)
      .join(broadcast(termDim.select(col("term").as("lang"), col("kind").as("lang_kind"))),
        Seq("lang"), "left")
      .join(broadcast(termDim.select(col("term").as("host"), col("kind").as("host_kind"))),
        Seq("host"), "left")

  /** #11 per-pday verdict: a row is misplaced when either position
    * holds a known term of the WRONG kind. Unknown terms are the
    * referential family's job (reference keeps the same separation:
    * only vocabulary-known terms can be "misplaced").
    */
  def misplacedByDay(pages: DataFrame, termDim: DataFrame,
      threshold: Double = 0.99): DataFrame =
    withTermKinds(pages, termDim)
      .where(col("lang").isNotNull || col("host") =!= "")
      .groupBy(col("pday"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("lang_kind") === "host" || col("host_kind") === "lang", 1L)
          .otherwise(0L)).as("violations"))
      .withColumn("value",
        lit(1.0) - col("violations").cast("double") / col("n_rows").cast("double"))
      .withColumn("pass", col("value") >= threshold)
      .orderBy("pday")

  /** #11 problem listing, grouped per (position, term):
    * (position, term, n_rows, min_url).
    */
  def misplacedUsages(pages: DataFrame, termDim: DataFrame): DataFrame = {
    val k = withTermKinds(pages, termDim)
    val langPos = k.where(col("lang_kind") === "host")
      .groupBy(col("lang").as("term"))
      .agg(count(lit(1)).as("n_rows"), min(col("url")).as("min_url"))
      .select(lit("lang").as("position"), col("term"), col("n_rows"), col("min_url"))
    val hostPos = k.where(col("host_kind") === "lang")
      .groupBy(col("host").as("term"))
      .agg(count(lit(1)).as("n_rows"), min(col("url")).as("min_url"))
      .select(lit("host").as("position"), col("term"), col("n_rows"), col("min_url"))
    langPos.unionAll(hostPos).orderBy("position", "term")
  }

  // ——— suite verdict-row adapters (pday='*', CheckResult shape) ———

  def reuseVerdictRow(used: DataFrame): DataFrame =
    reuseTermsFromUsed(used).select(
      lit(CheckId.ReuseTerms).as("check_id"), lit("*").as("pday"),
      col("n_used").as("n_rows"), col("violations"), col("value"), col("pass"))

  def vocabUsageVerdictRow(used: DataFrame, langDim: DataFrame): DataFrame =
    vocabUsageFromUsed(used, langDim).select(
      lit(CheckId.VocabUsage).as("check_id"), lit("*").as("pday"),
      col("n_used").as("n_rows"),
      (col("n_used") - col("n_overlap")).as("violations"),
      col("value"), col("pass"))

  /** #18's problem bag in the engine's Violation shape. */
  def reuseViolations(used: DataFrame): DataFrame =
    unusedSuggestedFromUsed(used).select(
      lit(CheckId.ReuseTerms).as("check_id"),
      lit(ViolationKind.UnusedSuggestedTerm).as("kind"),
      lit("*").as("pday"),
      lit("*").as("url"),
      concat(lit("suggested vocabulary term '"), col("lang"),
        lit("' is never used")).as("detail"))
}
