package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.checks.FusedChecks

/** Text-analysis operators for a large-scale training-data pipeline:
  * token counting, quality scoring, n-gram/stopword language ID, and
  * document fingerprinting. All pure column expressions (codegen'd, no
  * UDFs) — per-row compute that scales linearly and never shuffles
  * until the final small aggregation.
  *
  * Reference analogs: #5 CorrectLanguageTag's n-gram detector
  * (intrinsic/.../helper/LanguageDetector.java:27-51) for [[detectedLang]];
  * #31 MisreportedContentType (declared vs derived) for
  * [[declaredVsDerived]].
  */
object TextOps {

  /** `[token_count, s_en, s_fr, s_es, s_de]` in ONE native byte scan
    * ([[graft.functions.TextStats]]) — the declarative regex/contains
    * spellings below are kept only for the parity spec; they were the
    * dominant per-row cost of the suite scan and their wall-clock swung
    * 10-50× with optimizer plan shape.
    */
  def textStats(text: Column): Column = graft.functions.TextStatsFn.textStats(text)

  /** Whitespace token count; empty/null-safe. */
  def tokenCount(text: Column): Column =
    coalesce(element_at(textStats(text), 1), lit(0L))

  /** The pre-round-2 declarative token count, kept for the parity spec. */
  private[graft] def tokenCountDeclarative(text: Column): Column =
    when(text.isNull || length(trim(text)) === 0, 0L)
      .otherwise((regexp_count(trim(text), lit("\\s+")) + 1).cast("long"))

  /** Stopword profiles per language (the deterministic stand-in for an
    * n-gram model; lookup by padded-substring so Spark and DuckDB agree
    * byte-for-byte).
    */
  val StopwordProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "fr" -> Seq("le", "la", "les", "et", "un", "des", "est"),
    "es" -> Seq("el", "los", "las", "y", "una", "que", "es"),
    "de" -> Seq("der", "die", "das", "und", "ein", "ist", "nicht"))

  private def hitsOnPadded(padded: Column, words: Seq[String]): Column =
    words.map(w => when(padded.contains(s" $w "), 1).otherwise(0))
      .reduce(_ + _)

  /** Number of distinct profile stopwords present in the text.
    * Profile lists route through the native scan; arbitrary word lists
    * fall back to the declarative contains-chain.
    */
  def profileHits(text: Column, words: Seq[String]): Column =
    StopwordProfiles.indexWhere(_._2 == words) match {
      case -1 => profileHitsDeclarative(text, words)
      case i  => coalesce(element_at(textStats(text), i + 2), lit(0L)).cast("int")
    }

  /** Declarative contains-chain, kept for the parity spec. */
  private[graft] def profileHitsDeclarative(text: Column, words: Seq[String]): Column =
    hitsOnPadded(concat(lit(" "), coalesce(text, lit("")), lit(" ")), words)

  /** Length-banded confidence thresholds — the reference's detector
    * gates (intrinsic/.../CorrectLanguageTag.java:58-59,146-184): full
    * detector at confidence 0.90 for sentences of > 15 tokens, the
    * short-message profile at 0.70 for 3..15 tokens, and a per-word
    * lexicon path (no statistical detector) for 1-2 word strings.
    */
  val LongConfidence = 0.90
  val ShortConfidence = 0.70
  val LongBandTokens = 16 // ntok ≥ 16 ⇔ reference's `splited.length > 15`
  val WordBandTokens = 2  // ntok ≤ 2 ⇔ reference's one-word lexicon path

  /** Heuristic language ID: argmax of profile hits, ties resolved in
    * profile order. Confidence = best / total hits across profiles;
    * sentence bands require the length-banded confidence AND the ≥2-hit
    * evidence floor; 1-2 word strings resolve only when every lexicon
    * hit lands in one profile. 'und' otherwise.
    */
  def detectedLang(text: Column): Column =
    detectedFromStats(textStats(text))

  /** Language-ID argmax over a (possibly shared) [[textStats]] column. */
  def detectedFromStats(stats: Column): Column = {
    val ntok = coalesce(element_at(stats, 1), lit(0L))
    val scores = StopwordProfiles.zipWithIndex.map { case ((l, _), i) =>
      l -> coalesce(element_at(stats, i + 2), lit(0L))
    }
    bandedArgmax(ntok, scores)
  }

  /** Shared banded-argmax shape for the native and declarative
    * spellings (and mirrored by OracleSql.detectedDuck).
    */
  private def bandedArgmax(ntok: Column, scores: Seq[(String, Column)]): Column = {
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val tot = scores.map(_._2).reduce(_ + _)
    // first-profile-wins tie-break: foldRight keeps the en branch outermost
    val argmax = scores.foldRight(lit("und"): Column) { case ((l, s), acc) =>
      when(s === best, lit(l)).otherwise(acc)
    }
    val conf = best.cast("double") / tot.cast("double")
    val thr = when(ntok >= LongBandTokens, LongConfidence).otherwise(ShortConfidence)
    when(ntok <= WordBandTokens,
        when(tot >= 1 && best === tot, argmax).otherwise(lit("und")))
      .otherwise(when(best >= 2 && conf >= thr, argmax).otherwise(lit("und")))
  }

  /** Declarative language ID, kept for the parity spec. */
  private[graft] def detectedLangDeclarative(text: Column): Column = {
    val scores = StopwordProfiles.map { case (l, ws) =>
      l -> profileHitsDeclarative(text, ws).cast("long") }
    bandedArgmax(tokenCountDeclarative(text), scores)
  }

  /** Quality score in [0,1]: weighted mix of length band, mean token
    * length band, and stopword presence — the shape of production
    * web-text quality filters, fully deterministic.
    */
  def qualityScore(text: Column): Column =
    qualityFromStats(textStats(text), text)

  /** Quality score over a (possibly shared) [[textStats]] column. */
  def qualityFromStats(stats: Column, text: Column): Column = {
    val nTok = coalesce(element_at(stats, 1), lit(0L)).cast("double")
    val nChars = coalesce(length(text), lit(0)).cast("double")
    val meanTokLen = when(nTok > 0, (nChars - (nTok - 1)) / nTok).otherwise(0.0)
    val enHits = coalesce(element_at(stats, 2), lit(0L)).cast("double")
    val lenScore = least(nTok / 20.0, lit(1.0))                       // ≥20 tokens → full marks
    val tokLenScore = when(meanTokLen >= 3.0 && meanTokLen <= 10.0, 1.0).otherwise(0.5)
    val stopScore = least(enHits / 3.0, lit(1.0))
    lenScore * 0.4 + tokLenScore * 0.3 + stopScore * 0.3
  }

  /** Document fingerprint: md5 of whitespace-normalized text (stable
    * boilerplate / exact-duplicate key that survives reformatting).
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(trim(text), "\\s+", " "))

  // ——— suite integration (fused-predicate forms) ———

  /** Adds the derived columns the text predicates reference. The whole
    * token/stopword derivation is ONE native byte scan (`__ts`,
    * [[textStats]]); `detected_lang` and `quality` are cheap arithmetic
    * over it, so fusing both text checks into the suite's single scan
    * costs one text pass per row regardless of how the optimizer
    * rearranges the plan. Values are identical to
    * [[detectedLang]]/[[qualityScore]].
    */
  def withDerived(pages: DataFrame): DataFrame = {
    val df = pages.withColumn("__ts", textStats(col("text")))
    df.withColumn("detected_lang", detectedFromStats(col("__ts")))
      .withColumn("quality", qualityFromStats(col("__ts"), col("text")))
      .withColumn("n_tok", coalesce(element_at(col("__ts"), 1), lit(0L)))
      // lexicon hits for the DECLARED language (the reference's one-word
      // lexvo lookup, CorrectLanguageTag.java:146-184): 0 when the
      // declared tag has no profile
      .withColumn("decl_hits", declaredHitsFromStats(col("__ts"), col("lang")))
      .drop("__ts")
  }

  /** Profile-hit count of the declared language's lexicon over a shared
    * [[textStats]] column; 0 when the declared tag has no profile.
    */
  def declaredHitsFromStats(stats: Column, lang: Column): Column =
    StopwordProfiles.zipWithIndex.foldRight(lit(0L): Column) {
      case (((l, _), i), acc) =>
        when(lang === l, coalesce(element_at(stats, i + 2), lit(0L))).otherwise(acc)
    }

  /** Languages the word-band lexicon covers. */
  val ProfileLangs: Seq[String] = StopwordProfiles.map(_._1)

  val QualityThreshold = 0.5

  /** Text checks as fused predicates over [[withDerived]] columns:
    * declared-vs-derived language (#31 MisreportedContentType shape) and
    * quality floor (#22 HumanReadableLabelling shape). These join the
    * conformance bank in CheckSuite's one-scan family.
    */
  val preds: Seq[graft.checks.Pred] = Seq(
    // #5/#31 unified declared-vs-derived: sentence bands compare against
    // the banded detector; 1-2 word strings check the word against the
    // DECLARED language's lexicon (the reference's lexvo path) — one
    // check id across all bands, like CorrectLanguageTag's single metric
    graft.checks.Pred(graft.model.CheckId.DeclaredVsDerivedLang,
      graft.model.ViolationKind.MisreportedLanguage,
      col("text").isNotNull && length(col("text")) > 0 && col("lang").isNotNull &&
        when(col("n_tok") <= WordBandTokens, col("lang").isin(ProfileLangs: _*))
          .otherwise(col("detected_lang") =!= "und"),
      when(col("n_tok") <= WordBandTokens, col("decl_hits") === 0L)
        .otherwise(col("lang") =!= col("detected_lang")),
      when(col("n_tok") <= WordBandTokens,
          concat(lit("word not in '"), col("lang"), lit("' lexicon")))
        .otherwise(concat(col("lang"), lit("!="), col("detected_lang"))), 0.5),
    // #5's "confidently wrong vs undetermined" split: sentences where
    // the banded detector stays below its confidence threshold (the
    // reference counts these against the metric; here they get their
    // own verdict so the two failure modes are distinguishable)
    graft.checks.Pred(graft.model.CheckId.LangUndetermined,
      graft.model.ViolationKind.UndeterminedLanguage,
      col("text").isNotNull && length(col("text")) > 0 &&
        col("lang").isNotNull && col("n_tok") > WordBandTokens,
      col("detected_lang") === "und",
      lit("detector below banded confidence"), 0.5),
    graft.checks.Pred(graft.model.CheckId.TextQuality,
      graft.model.ViolationKind.LowQualityText,
      col("text").isNotNull && length(col("text")) > 0,
      col("quality") < QualityThreshold,
      lit(s"quality<$QualityThreshold"), 0.8))

  // ——— query surfaces ———

  /** Per-pday token stats. */
  def tokenStatsByDay(pages: DataFrame): DataFrame =
    pages.withColumn("pday", FusedChecks.pday)
      .withColumn("n_tok", tokenCount(col("text")))
      .groupBy(col("pday"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("total_tokens"),
        min(col("n_tok")).as("min_tokens"),
        max(col("n_tok")).as("max_tokens"))
      .orderBy("pday")

  /** Per-pday quality profile; avg rounded for cross-engine parity. */
  def qualityByDay(pages: DataFrame): DataFrame =
    pages.where(col("text").isNotNull)
      .withColumn("pday", FusedChecks.pday)
      .withColumn("q", qualityScore(col("text")))
      .groupBy(col("pday"))
      .agg(
        count(lit(1)).as("n_docs"),
        round(avg(col("q")), 6).as("avg_quality"),
        sum(when(col("q") < 0.5, 1L).otherwise(0L)).as("n_low_quality"))
      .orderBy("pday")

  /** Declared-vs-detected language confusion matrix. */
  def langConfusion(pages: DataFrame): DataFrame =
    pages.where(col("text").isNotNull && length(col("text")) > 0)
      .select(coalesce(col("lang"), lit("null")).as("declared"),
        detectedLang(col("text")).as("detected"))
      .groupBy("declared", "detected")
      .agg(count(lit(1)).as("n"))
      .orderBy("declared", "detected")

  /** Declared-vs-derived conformance verdict per pday (check #5/#31
    * analog, all reference bands): sentence rows are applicable when
    * the banded detector resolves, violated when declared ≠ detected;
    * 1-2 word rows are applicable when the declared tag has a lexicon,
    * violated when no word of the text is in it; `n_und` counts the
    * below-confidence sentences (the reference's unidentifiable case),
    * keeping "confidently wrong" and "undetermined" distinguishable.
    */
  def declaredVsDerived(pages: DataFrame, threshold: Double = 0.5): DataFrame =
    pages.where(col("text").isNotNull && length(col("text")) > 0 && col("lang").isNotNull)
      .withColumn("pday", FusedChecks.pday)
      .withColumn("__ts", textStats(col("text")))
      .withColumn("detected", detectedFromStats(col("__ts")))
      .withColumn("ntok", coalesce(element_at(col("__ts"), 1), lit(0L)))
      .withColumn("dhits", declaredHitsFromStats(col("__ts"), col("lang")))
      .groupBy(col("pday"))
      .agg(
        sum(when(col("ntok") <= WordBandTokens,
            when(col("lang").isin(ProfileLangs: _*), 1L).otherwise(0L))
          .otherwise(when(col("detected") =!= "und", 1L).otherwise(0L))).as("n_rows"),
        sum(when(col("ntok") <= WordBandTokens,
            when(col("lang").isin(ProfileLangs: _*) && col("dhits") === 0L, 1L).otherwise(0L))
          .otherwise(when(col("detected") =!= "und" && col("lang") =!= col("detected"), 1L)
            .otherwise(0L))).as("violations"),
        sum(when(col("ntok") > WordBandTokens && col("detected") === "und", 1L)
          .otherwise(0L)).as("n_und"))
      .withColumn("value",
        when(col("n_rows") === 0, 1.0).otherwise(
          lit(1.0) - col("violations").cast("double") / col("n_rows").cast("double")))
      .withColumn("pass", col("value") >= threshold)
      .orderBy("pday")

  /** Shared-fingerprint groups (normalized exact duplicates). */
  def fingerprintGroups(pages: DataFrame): DataFrame =
    pages.where(col("text").isNotNull && length(col("text")) > 0)
      .select(fingerprint(col("text")).as("fp"), col("url"))
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("n_rows"), min(col("url")).as("min_url"))
      .where(col("n_rows") > 1)
      .orderBy("fp")
}
