package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.checks.Conformance
import graft.functions.{NativeValidators, UrlScan}

/** The byte-scan validators must be observably identical to the regexes
  * they replace — both via direct eval and through the codegen'd
  * DataFrame path (which is what the suite actually runs).
  *
  * Known deliberate divergence: Java's `$` also matches before a final
  * '\n' (so `rlike` accepts "http://a\n"); the scanners use strict
  * end-of-string anchoring like RE2/DuckDB `regexp_matches` — the
  * engine must agree with its own oracle, not with java.util.regex
  * lenience. Generated inputs therefore strip trailing newlines.
  */
class ValidatorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val urlRe = Conformance.UrlRegex.r
  private val langRe = Conformance.LangRegex.r

  private val urlCases = Seq(
    "http://a", "https://a", "http://a.b-c.d", "http://a:80", "http://a:80/",
    "http://a/", "http://a/p/q?x=1&y=2", "https://x.y:8080/p%20q", // %20 is fine, raw space is not
    "http://a/p q", "http://a b", "http://", "https://", "http:/a", "ftp://a",
    "http://a:", "http://a:x", "http://a:80x", "http://a:1.2/x", "Http://a",
    "http://a?q", "http://a#f", "https://a./.-", "http://a//", "http://a/\t",
    "http://a/é", "http://é", "http://a/ç/ü", "https://a:0123456789/",
    " http://a", "http://a ", "", "h", "http", "https:", "http://-", "http://."
  )

  private val langCases = Seq(
    "en", "eng", "EN", "en-US", "en-us-x-twain", "zh-Hant-TW", "de-DE-1996",
    "e", "engl", "en-", "-en", "en--us", "en-verylongsub", "en-12345678",
    "en-123456789", "en US", "en_US", "ën", "en-ÜS", "", "a-b", "abcd", "ab1",
    "en-a-b-c-d-e-f-g-h"
  )

  private def rng = new scala.util.Random(20260816L)

  private def fuzz(alphabet: String, maxLen: Int, n: Int): Seq[String] = {
    val r = rng
    (1 to n).map { _ =>
      val len = r.nextInt(maxLen + 1)
      val s = (1 to len).map(_ => alphabet(r.nextInt(alphabet.length))).mkString
      s.reverse.dropWhile(_ == '\n').reverse // strip Java-$ divergence zone
    }
  }

  // alphabets biased toward the grammar's boundary characters
  private val urlFuzz = fuzz("htps:/.-ab01 ?x\n\té", 24, 4000) ++
    fuzz("htps:/.-ab01", 16, 4000).map("http" + _)
  private val langFuzz = fuzz("en-US019é _", 14, 6000)

  test("UrlScan.isValidUrl == UrlRegex on adversarial + fuzz corpus") {
    (urlCases ++ urlFuzz).foreach { s =>
      assert(UrlScan.isValidUrl(UTF8String.fromString(s)) ==
        urlRe.pattern.matcher(s).matches(), s"url case: ${s.replace("\n", "\\n")}")
    }
  }

  test("UrlScan.isValidLang == LangRegex on adversarial + fuzz corpus") {
    (langCases ++ langFuzz).foreach { s =>
      assert(UrlScan.isValidLang(UTF8String.fromString(s)) ==
        langRe.pattern.matcher(s).matches(), s"lang case: $s")
    }
  }

  test("codegen path agrees with rlike over a DataFrame (incl. nulls)") {
    import spark.implicits._
    val df = ((urlCases ++ langCases ++ urlFuzz ++ langFuzz).map(Option(_)) :+
      Option.empty[String]).toDF("s")
    val mismatches = df.select(
        (NativeValidators.validHttpUrl(col("s")) <=>
          col("s").rlike(Conformance.UrlRegex)).as("url_eq"),
        (NativeValidators.validLangTag(col("s")) <=>
          col("s").rlike(Conformance.LangRegex)).as("lang_eq"))
      .where(!col("url_eq") || !col("lang_eq"))
      .count()
    assert(mismatches == 0)
  }

  // — round-5 scanners: norm-text, markup, prolix-run —

  private val unit = "w123 "
  private val textCases = Seq(
    "", " ", "  a  b  ", "\ta\tb\n", " \t \n x  y \f z \r ",
    "a<b>c", "<a>", "<A>", "< a>", "<1x>", "<a", "a>b<c", "<zz  >", "<a\nx>",
    "<é>", "é<a>é", "<a><b>", "text with <em>markup</em> inside",
    unit * 10, unit * 9, unit * 9 + "w12 " + unit, "x" + unit * 10,
    unit * 5 + "w1234 " + unit * 5, ("w999 " * 10), "w000 " * 11,
    "the boilerplate cookie consent page", "wwww w123 w456 ",
    unit * 9 + "w123", unit.trim
  )
  private val textFuzz = fuzz("w0129 <a>ébz\t\n", 60, 4000) ++
    fuzz("w123 <a>x", 80, 4000)

  test("native norm-text / markup / prolix-run == declarative regexes (codegen path, incl. nulls)") {
    import spark.implicits._
    val corpus = graft.synth.PageSynth.pages(spark, TestSpark.sf0001)
      .select(col("text")).as[String].collect().toSeq
    val df = ((textCases ++ textFuzz ++ corpus).map(Option(_)) :+
      Option.empty[String]).toDF("s")
    val mismatches = df.select(
        (graft.dedup.Dedup.normText(col("s")) <=>
          graft.dedup.Dedup.normTextDeclarative(col("s"))).as("norm_eq"),
        (graft.functions.TextScan2Fn.hasMarkup(col("s")) <=>
          col("s").rlike(Conformance.MarkupRegex)).as("markup_eq"),
        (graft.functions.TextScan2Fn.hasProlixRun(col("s")) <=>
          col("s").rlike(Conformance.ProlixRunRegex)).as("prolix_eq"))
      .where(!col("norm_eq") || !col("markup_eq") || !col("prolix_eq"))
      .count()
    assert(mismatches == 0)
  }
}
