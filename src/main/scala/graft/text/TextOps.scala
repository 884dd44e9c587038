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

  /** Heuristic language ID: argmax of profile hits, ties resolved in
    * profile order; 'und' (undetermined) when no profile scores ≥ 2.
    */
  def detectedLang(text: Column): Column =
    detectedFromStats(textStats(text))

  /** Language-ID argmax over a (possibly shared) [[textStats]] column. */
  def detectedFromStats(stats: Column): Column = {
    val scores = StopwordProfiles.zipWithIndex.map { case ((l, _), i) =>
      l -> coalesce(element_at(stats, i + 2), lit(0L))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((l, s), acc) =>
      when(best >= 2 && s === best, lit(l)).otherwise(acc)
    }
  }

  /** Declarative language ID, kept for the parity spec. */
  private[graft] def detectedLangDeclarative(text: Column): Column = {
    val scores = StopwordProfiles.map { case (l, ws) =>
      l -> profileHitsDeclarative(text, ws) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((l, s), acc) =>
      when(best >= 2 && s === best, lit(l)).otherwise(acc)
    }
  }

  // NOTE: foldRight + "s === best" keeps first-profile-wins tie-break:
  // en wins over fr only if en's when() is evaluated first, so build
  // with foldRight over the profile order (en branch outermost).

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
      .drop("__ts")
  }

  val QualityThreshold = 0.5

  /** Text checks as fused predicates over [[withDerived]] columns:
    * declared-vs-derived language (#31 MisreportedContentType shape) and
    * quality floor (#22 HumanReadableLabelling shape). These join the
    * conformance bank in CheckSuite's one-scan family.
    */
  val preds: Seq[graft.checks.Pred] = Seq(
    graft.checks.Pred(graft.model.CheckId.DeclaredVsDerivedLang,
      graft.model.ViolationKind.MisreportedLanguage,
      col("text").isNotNull && length(col("text")) > 0 &&
        col("detected_lang") =!= "und" && col("lang").isNotNull,
      col("lang") =!= col("detected_lang"),
      concat(col("lang"), lit("!="), col("detected_lang")), 0.5),
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

  /** Declared-vs-derived conformance verdict per pday (check #31
    * analog): applicable = confidently detected docs; violation =
    * declared ≠ detected.
    */
  def declaredVsDerived(pages: DataFrame, threshold: Double = 0.5): DataFrame =
    pages.where(col("text").isNotNull && length(col("text")) > 0)
      .withColumn("pday", FusedChecks.pday)
      .withColumn("detected", detectedLang(col("text")))
      .where(col("detected") =!= "und" && col("lang").isNotNull)
      .groupBy(col("pday"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("lang") =!= col("detected"), 1L).otherwise(0L)).as("violations"))
      .withColumn("value",
        lit(1.0) - col("violations").cast("double") / col("n_rows").cast("double"))
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
