package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.checks._
import graft.synth.PageSynth

/** Vocabulary-dimension checks (#14 deprecated, #16 prolix, #18 reuse,
  * #24 usage indication) and #13 content hijacking — golden values from
  * the independent SynthModel plus hand-built fixtures for the
  * hijacking authority rules.
  */
class VocabularySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val pages = PageSynth.pages(spark, TestSpark.sf0001).cache()
  private lazy val model: Seq[SynthModel.MPage] = {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      .select("doc_id", "text", "lang").collect()
    docs.map(r => SynthModel.page(r.getLong(0), r.getString(1), r.getString(2))).toSeq
  }

  private val langRe = Conformance.LangRegex.r
  private def validLang(p: SynthModel.MPage): Option[String] =
    p.lang.filter(l => langRe.findFirstIn(l).isDefined)

  test("deprecated_terms totals match model") {
    val got = Vocabulary.deprecatedByDay(pages, Vocabulary.deprecatedDim(spark))
      .agg(sum("n_rows"), sum("violations")).collect()(0)
    val applicable = model.flatMap(validLang)
    val dep = applicable.count(Vocabulary.DeprecatedLangs.contains)
    assert(got.getLong(0) == applicable.size)
    assert(got.getLong(1) == dep)
    assert(dep > 0, "fixture must exercise a live deprecated usage")
  }

  test("deprecated_usages lists each deprecated term with its usage count") {
    val got = Vocabulary.deprecatedUsages(pages, Vocabulary.deprecatedDim(spark))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exp = model.flatMap(validLang)
      .filter(Vocabulary.DeprecatedLangs.contains)
      .groupBy(identity).map { case (l, xs) => l -> xs.size.toLong }
    assert(got == exp)
    // 'ja' is dim-only: deprecation of an unused term must not appear
    assert(!got.contains("ja"))
  }

  test("prolix_text pred totals match model") {
    val got = FusedChecks.resultsByDay(pages)
      .where(col("check_id") === "prolix_text")
      .agg(sum("n_rows"), sum("violations")).collect()(0)
    val runRe = Conformance.ProlixRunRegex.r
    val applicable = model.flatMap(_.text).filter(_.nonEmpty)
    val bad = applicable.count(t =>
      t.contains(Conformance.ProlixPhrase) || runRe.findFirstIn(t).isDefined)
    assert(got.getLong(0) == applicable.size)
    assert(got.getLong(1) == bad)
    assert(bad > 0, "fixture must contain prolix boilerplate")
  }

  test("reuse_terms + vocab_usage match the model's used-terms set") {
    val used = model.flatMap(validLang).toSet
    val reuse = Vocabulary.reuseTerms(pages).collect()(0)
    val overlap = used.count(Vocabulary.SuggestedLangs.contains)
    assert(reuse.getLong(0) == used.size)
    assert(reuse.getLong(1) == overlap)
    assert(reuse.getAs[Double]("value") == overlap.toDouble / used.size)

    val vu = Vocabulary.vocabUsage(pages, PageSynth.langDim(spark)).collect()(0)
    val declared = PageSynth.KnownLangs.toSet
    assert(vu.getLong(0) == used.size)
    assert(vu.getLong(1) == declared.size)
    assert(vu.getLong(2) == used.count(declared.contains))
  }

  test("unused suggested terms form the #18 problem bag") {
    val used = model.flatMap(validLang).toSet
    val got = Vocabulary.unusedSuggested(pages).collect().map(_.getString(0)).toSeq
    val exp = Vocabulary.SuggestedLangs.filterNot(used.contains).sorted
    assert(got == exp)
    assert(exp.nonEmpty, "fixture must include a suggested-but-unused term")
  }

  test("hijack authority rules on a hand-built fixture") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2024-01-05 00:00:00")
    def p(url: String, text: String) =
      (url, ts, null.asInstanceOf[Array[Byte]], text, "en")
    val fx = Seq(
      // group 1: authoritative rep on known h001 → other-host members hijack
      p("https://h001.example.com/a", "shared content one"),
      p("https://h002.example.com/b", "shared content one"),
      p("https://h999.example.com/c", "shared content one"),
      // group 2: rep (min url) on an UNKNOWN host → no hijacks, still possible
      p("https://a-unknown.example.org/x", "shared content two"),
      p("https://h003.example.com/y", "shared content two"),
      // group 3: single-host duplicate → not rule-matching at all
      p("https://h004.example.com/u", "same host dup"),
      p("https://h004.example.com/v", "same host dup"),
      // non-duplicate page
      p("https://h005.example.com/w", "unique content")
    ).toDF("url", "warc_ts", "html", "text", "lang")

    val v = Hijack.verdict(fx, PageSynth.hostDim(spark)).collect()(0)
    assert(v.getLong(0) == 5, "possible = members of cross-host groups")
    assert(v.getLong(1) == 2, "hijacks = non-rep-host members with known authority")
    assert(v.getAs[Double]("value") == math.abs(1.0 - 2.0 / 5.0))

    val listed = Hijack.hijackPages(fx, PageSynth.hostDim(spark))
      .collect().map(_.getString(0)).toSeq
    assert(listed == Seq("https://h002.example.com/b", "https://h999.example.com/c"))
  }

  test("misplaced_terms totals match model (both positions)") {
    val knownHosts = (0 to PageSynth.KnownHostMax).map(i => f"h$i%03d.example.com").toSet
    val knownLangs = PageSynth.KnownLangs.toSet
    def hostOf(u: String) =
      "^https?://([^/?]+)".r.findFirstMatchIn(u).map(_.group(1)).getOrElse("")
    val applicable = model.filter(p => p.lang.isDefined || hostOf(p.url).nonEmpty)
    val bad = applicable.count(p =>
      p.lang.exists(knownHosts.contains) || knownLangs.contains(hostOf(p.url)))
    val got = Vocabulary.misplacedByDay(pages, Vocabulary.termDim(spark))
      .agg(sum("n_rows"), sum("violations")).collect()(0)
    assert(got.getLong(0) == applicable.size)
    assert(got.getLong(1) == bad)
    assert(bad > 0, "fixture must contain a misplaced term")

    val usages = Vocabulary.misplacedUsages(pages, Vocabulary.termDim(spark))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(usages.keys.exists(_._1 == "lang"))
  }

  test("misused_shape preds match model (markup in literal, scheme-less resource)") {
    val res = FusedChecks.resultsByDay(pages)
    val markupRe = Conformance.MarkupRegex.r
    val schemeRe = Conformance.SchemeRegex.r
    val gotLit = res.where(col("check_id") === graft.model.CheckId.MisusedLiteral)
      .agg(sum("violations")).collect()(0).getLong(0)
    val gotRes = res.where(col("check_id") === graft.model.CheckId.MisusedResource)
      .agg(sum("violations")).collect()(0).getLong(0)
    val expLit = model.flatMap(_.text).filter(_.nonEmpty)
      .count(t => markupRe.findFirstIn(t).isDefined)
    val expRes = model.map(_.url).count(u => schemeRe.findFirstIn(u).isEmpty)
    assert(gotLit == expLit)
    assert(gotRes == expRes)
    assert(expLit > 0 && expRes > 0, "fixture must exercise both misuse directions")
  }

  test("serialisation-format registry counts match model") {
    val extRe = "\\.([a-z0-9]+)$".r
    val reg = Formats.Registry.toMap
    val fmts = model.map(_.url)
      .flatMap(u => extRe.findFirstMatchIn(u).map(_.group(1)))
      .flatMap(reg.get)
    val gotCounts = Formats.formatCounts(pages, Formats.formatDim(spark))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expCounts = fmts.groupBy(identity).map { case (f, xs) => f -> xs.size.toLong }
    assert(gotCounts == expCounts)
    val cnt = Formats.formatsCount(pages, Formats.formatDim(spark)).collect()(0)
    assert(cnt.getLong(0) == fmts.distinct.size)
    assert(cnt.getLong(0) >= 3, "fixture must declare several registry formats")
  }

  test("license flags + models match model") {
    val byHost = model.filter(_.text.isDefined).groupBy(_.host)
    val expFlags = byHost.map { case (h, ps) =>
      h -> (
        ps.exists(p => SynthModel.license(p.docId) != PageSynth.NoLicense),
        ps.exists(_.text.exists(t => Licensing.HumanBank.exists(t.contains))))
    }
    val got = Licensing.hostFlags(pages).collect()
      .map(r => r.getString(0) -> (r.getLong(2) == 1L, r.getLong(3) == 1L)).toMap
    // hosts whose every page lost its text still appear (html null ⇒ no flags)
    for ((h, f) <- expFlags) assert(got(h) == f, s"host $h")
    assert(expFlags.values.exists(!_._1), "fixture must include an unlicensed host")

    val models = Licensing.models(pages).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    val expModels = model.filter(_.text.isDefined)
      .groupBy(p => SynthModel.license(p.docId))
      .map { case (l, xs) => l -> xs.size.toLong }
    assert(models.map { case (l, v) => l -> v._1 } == expModels)
    assert(models("CC-BY-SA-4")._2 && models("CC0-PUBLIC")._2)
    assert(!models("UNLICENSED")._2 && !models("PROPRIETRY")._2)
  }

  test("hijack verdict over the synth corpus matches a plain-Scala model") {
    def norm(t: String) = t.trim.replaceAll("\\s+", " ")
    val defs = model.flatMap { p =>
      p.text.map(norm).filter(_.nonEmpty)
        .filter(_ => p.url.matches("^https?://[^/?]+.*"))
        .map(n => (p.url, "^https?://([^/?]+)".r.findFirstMatchIn(p.url).get.group(1), n))
    }
    val known = (0 to PageSynth.KnownHostMax)
      .map(i => f"h$i%03d.example.com").toSet
    val groups = defs.groupBy(_._3).filter(_._2.map(_._2).distinct.size > 1)
    val possible = groups.values.map(_.size).sum
    val hijacks = groups.values.map { ms =>
      val rep = ms.map(_._1).min
      val repHost = "^https?://([^/?]+)".r.findFirstMatchIn(rep).get.group(1)
      if (known.contains(repHost)) ms.count(_._2 != repHost) else 0
    }.sum
    val v = Hijack.verdict(pages, PageSynth.hostDim(spark)).collect()(0)
    assert(v.getLong(0) == possible)
    assert(v.getLong(1) == hijacks)
    assert(possible > 0, "synth corpus must contain cross-host duplicate groups")
  }
}
