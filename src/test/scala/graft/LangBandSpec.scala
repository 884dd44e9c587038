package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.text.TextOps
import graft.checks.Completeness
import graft.synth.PageSynth

/** #5 CorrectLanguageTag fidelity: the banded detector
  * (CorrectLanguageTag.java:58-59 — 0.90 confidence for >15-token
  * sentences, 0.70 for 3..15, per-word lexicon for 1-2 words) and the
  * #3 per-member condition-operator table
  * (DataCubePopulationCompleteness.java:248-267).
  */
class LangBandSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def detect(texts: Seq[String]): Seq[String] = {
    import spark.implicits._
    texts.toDF("text").select(TextOps.detectedLang(col("text")).as("d"))
      .as[String].collect().toSeq
  }

  test("word band (1-2 tokens): single-profile lexicon hit resolves, ambiguity does not") {
    assert(detect(Seq("the")) == Seq("en"))        // one en lexicon word
    assert(detect(Seq("le")) == Seq("fr"))
    assert(detect(Seq("the le")) == Seq("und"))    // hits split across profiles
    assert(detect(Seq("cat")) == Seq("und"))       // no lexicon hit
  }

  test("short band (3..15 tokens): confidence 0.70") {
    // en=3 fr=1 → conf 0.75 ≥ 0.70 → en
    assert(detect(Seq("the of and le cat runs")) == Seq("en"))
    // en=2 fr=2 → conf 0.50 < 0.70 → und
    assert(detect(Seq("the of le la cat runs")) == Seq("und"))
    // single profile, conf 1.0
    assert(detect(Seq("the cat of war and peace to win")) == Seq("en"))
  }

  test("long band (>15 tokens): confidence 0.90 — the same 0.75 mix goes undetermined") {
    val filler = (1 to 12).map(i => s"w$i").mkString(" ")
    // 16 tokens, en=3 fr=1 → conf 0.75 < 0.90 → und (short band said en)
    assert(detect(Seq(s"the of and le $filler")) == Seq("und"))
    // 16+ tokens, pure en → conf 1.0 → en
    assert(detect(Seq(s"the a of and to in is $filler")) == Seq("en"))
  }

  test("declared-language lexicon hits (word-band check input)") {
    import spark.implicits._
    val rows = Seq(("the", "en"), ("the", "fr"), ("the", "zh"), ("nicht", "de"))
      .toDF("text", "lang")
      .select(TextOps.declaredHitsFromStats(TextOps.textStats(col("text")), col("lang")).as("h"))
      .as[Long].collect().toSeq
    assert(rows == Seq(1L, 0L, 0L, 1L)) // zh has no profile → 0; 'nicht' is a de lexicon word
  }

  test("completeness condition ops: '=' fails on over-count while '>=' passes") {
    import spark.implicits._
    // conditions (PageSynth.LangConds): en >=1, fr >0, es =1, zh <=2,
    // de >=2, it >=1, pt >0, ja =1
    val day = "2024-01-01"
    val rows =
      Seq.fill(1)("en") ++ Seq.fill(1)("fr") ++ Seq.fill(2)("es") ++
        Seq.fill(3)("zh") ++ Seq.fill(1)("de") ++ Seq.fill(1)("it") ++
        Seq.fill(1)("ja") // pt absent
    val pages = rows.map(l => (s"https://h000.example.com/$l", s"$day 10:00:00", l))
      .toDF("url", "warc_ts", "lang")
      .withColumn("warc_ts", to_timestamp(col("warc_ts")))
    val v = Completeness.expectedLangByDay(pages, PageSynth.langDim(spark)).collect()
    assert(v.length == 1)
    // violations: es (count 2 fails =1), zh (count 3 fails <=2),
    // de (count 1 fails >=2), pt (absent) = 4 of 8
    assert(v.head.getAs[Long]("n_rows") == 8L)
    assert(v.head.getAs[Long]("violations") == 4L)
    val details = Completeness.missingLangMembers(pages, PageSynth.langDim(spark))
      .select("detail").collect().map(_.getString(0)).toSeq
    assert(details.exists(_.contains("'es' count 2 fails cond = 1")))
    assert(details.exists(_.contains("'pt' absent (cond > 0)")))
    assert(!details.exists(_.contains("'en'"))) // >=1 satisfied
  }
}
