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

  /** Whitespace token count; empty/null-safe. `regexp_count` instead of
    * `size(split(...))`: same value (separator runs + 1), but no
    * per-row string-array allocation — this runs on every row of the
    * benched suite scan.
    */
  def tokenCount(text: Column): Column =
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

  /** Number of distinct profile stopwords present in the text. */
  def profileHits(text: Column, words: Seq[String]): Column =
    hitsOnPadded(concat(lit(" "), coalesce(text, lit("")), lit(" ")), words)

  /** Heuristic language ID: argmax of profile hits, ties resolved in
    * profile order; 'und' (undetermined) when no profile scores ≥ 2.
    */
  def detectedLang(text: Column): Column = {
    val scores = StopwordProfiles.map { case (l, ws) => l -> profileHits(text, ws) }
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
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val nChars = coalesce(length(text), lit(0)).cast("double")
    val meanTokLen = when(nTok > 0, (nChars - (nTok - 1)) / nTok).otherwise(0.0)
    val enHits = profileHits(text, StopwordProfiles.head._2).cast("double")
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

  /** Adds the derived columns the text predicates reference — the
    * padded haystack and the per-profile hit counts become real
    * intermediate columns, each computed ONCE per row (a
    * multi-referenced projection alias survives CollapseProject), so
    * fusing both text checks into the suite's single scan does not
    * re-run the 28-substring detector or the tokenizer per predicate.
    * Values are identical to [[detectedLang]]/[[qualityScore]].
    */
  def withDerived(pages: DataFrame): DataFrame = {
    var df = pages.withColumn("__padded",
      concat(lit(" "), coalesce(col("text"), lit("")), lit(" ")))
    StopwordProfiles.foreach { case (l, ws) =>
      df = df.withColumn(s"__s_$l", hitsOnPadded(col("__padded"), ws))
    }
    val best = StopwordProfiles.map(p => col(s"__s_${p._1}")).reduce((a, b) => greatest(a, b))
    val detected = StopwordProfiles.foldRight(lit("und"): Column) { case ((l, _), acc) =>
      when(best >= 2 && col(s"__s_$l") === best, lit(l)).otherwise(acc)
    }
    val nTok = tokenCount(col("text")).cast("double")
    val nChars = coalesce(length(col("text")), lit(0)).cast("double")
    val meanTokLen = when(nTok > 0, (nChars - (nTok - 1)) / nTok).otherwise(0.0)
    val q = least(nTok / 20.0, lit(1.0)) * 0.4 +
      when(meanTokLen >= 3.0 && meanTokLen <= 10.0, 1.0).otherwise(0.5) * 0.3 +
      least(col("__s_en").cast("double") / 3.0, lit(1.0)) * 0.3
    df.withColumn("detected_lang", detected)
      .withColumn("quality", q)
      .drop("__padded" +: StopwordProfiles.map(p => s"__s_${p._1}"): _*)
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
