package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.text.TextOps
import graft.functions.TextStatsImpl
import graft.synth.PageSynth

/** The native TextStats scan must be observably identical to the
  * declarative regex/contains spellings it replaced, over both the
  * synth corpus and whitespace-adversarial cases (Spark `trim` strips
  * 0x20 only; Java `\s` includes tab/newline; `contains(" w ")` is
  * 0x20-delimited — all three quirks reproduced exactly).
  */
class TextStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("profile word lists stay in lockstep with TextOps") {
    assert(TextStatsImpl.Profiles.map(_.map(new String(_, "UTF-8")).toSeq).toSeq ==
      TextOps.StopwordProfiles.map(_._2))
  }

  private val edgeCases = Seq(
    null, "", " ", "  ", "\t", " \t ", "the", " the ", "the\tcat",
    "the cat", "a  b   c", "\tthe cat\n", " le la les ", "und und und",
    "the the the", "a b", "der die das und", "x  y \f z \r w",
    "the\ncat is in the hat", "é the ü", "is", "is is", " is\t", "nicht"
  )

  test("native == declarative on synth corpus + whitespace edge cases") {
    import spark.implicits._
    val corpus = PageSynth.pages(spark, TestSpark.sf0001)
      .select(col("text")).as[String].collect().toSeq
    val df = (edgeCases ++ corpus).map(Option(_)).toDF("text")
    val eqCols =
      (TextOps.tokenCount(col("text")) <=>
        TextOps.tokenCountDeclarative(col("text"))).as("tok_eq") +:
      (TextOps.detectedLang(col("text")) <=>
        TextOps.detectedLangDeclarative(col("text"))).as("lang_eq") +:
      TextOps.StopwordProfiles.map { case (l, ws) =>
        (TextOps.profileHits(col("text"), ws).cast("long") <=>
          TextOps.profileHitsDeclarative(col("text"), ws).cast("long")).as(s"s_$l")
      }
    val mismatches = df.select(eqCols: _*)
      .where(not(col("tok_eq")) || not(col("lang_eq")) ||
        TextOps.StopwordProfiles.map(p => not(col(s"s_${p._1}"))).reduce(_ || _))
      .count()
    assert(mismatches == 0)
  }

  test("direct eval matches known values") {
    def stats(s: String): Seq[Long] =
      TextStatsImpl.compute(UTF8String.fromString(s)).toLongArray().toSeq
    assert(stats("") == Seq(0L, 0, 0, 0, 0))
    assert(stats("the cat") == Seq(2L, 1, 0, 0, 0))
    assert(stats("the\tcat") == Seq(2L, 0, 0, 0, 0)) // tab: token split, no 0x20-delimited 'the'
    assert(stats("the the of and to in is a") == Seq(8L, 7, 0, 0, 0))
    assert(stats("  le la  ") == Seq(2L, 0, 2, 0, 0))
  }
}
