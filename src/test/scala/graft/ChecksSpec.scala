package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.checks._
import graft.synth.PageSynth

/** Golden-value checks vs expectations derived from the independent
  * SynthModel (the analog of the reference's hand-computed fixture
  * goldens, e.g. CompatibleDatatypeTest.java:44-57).
  */
class ChecksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val pages = PageSynth.pages(spark, TestSpark.sf0001).cache()
  private lazy val model: Seq[SynthModel.MPage] = {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      .select("doc_id", "text", "lang").collect()
    docs.map(r => SynthModel.page(r.getLong(0), r.getString(1), r.getString(2))).toSeq
  }

  private val urlRe = Conformance.UrlRegex.r
  private val langRe = Conformance.LangRegex.r

  test("conform_url totals match model") {
    val got = FusedChecks.resultsByDay(pages)
      .where(col("check_id") === "conform_url")
      .agg(sum("n_rows"), sum("violations")).collect()(0)
    val expBad = model.count(p => urlRe.findFirstIn(p.url).isEmpty)
    assert(got.getLong(0) == model.size)
    assert(got.getLong(1) == expBad)
    assert(expBad > 0)
  }

  test("conform_lang + stats_null_ratio.lang totals match model") {
    val res = FusedChecks.resultsByDay(pages)
    val badLang = res.where(col("check_id") === "conform_lang")
      .agg(sum("violations")).collect()(0).getLong(0)
    val nullLang = res.where(col("check_id") === "stats_null_ratio.lang")
      .agg(sum("violations")).collect()(0).getLong(0)
    assert(badLang == model.count(p => p.lang.exists(l => langRe.findFirstIn(l).isEmpty)))
    assert(nullLang == model.count(_.lang.isEmpty))
    assert(badLang > 0 && nullLang > 0)
  }

  test("conform_ts flags the 1985 rows, null stats flag the null rows") {
    val res = FusedChecks.resultsByDay(pages)
    val tsBad = res.where(col("check_id") === "conform_ts")
      .agg(sum("violations")).collect()(0).getLong(0)
    assert(tsBad == model.count(_.warcEpoch.exists(e => e < PageSynth.TsMin || e >= PageSynth.TsMax)))
    val tsNull = res.where(col("check_id") === "stats_null_ratio.warc_ts")
      .agg(sum("violations")).collect()(0).getLong(0)
    assert(tsNull == model.count(_.warcEpoch.isEmpty))
  }

  test("url uniqueness matches model duplicate groups") {
    val r = Uniqueness.urlUniqueness(pages).collect()(0)
    val byUrl = model.groupBy(_.url)
    assert(r.getAs[Long]("n_rows") == model.size)
    assert(r.getAs[Long]("distinct_urls") == byUrl.size)
    assert(r.getAs[Long]("dup_urls") == byUrl.count(_._2.size > 1))
    assert(byUrl.count(_._2.size > 1) > 0)
  }

  test("duplicate texts find the boilerplate groups") {
    val groups = Uniqueness.duplicateTexts(pages).collect()
    val expected = model.flatMap(_.text).filter(_.nonEmpty)
      .groupBy(identity).filter(_._2.size > 1)
    assert(groups.length == expected.size)
    assert(groups.map(_.getAs[Long]("n_rows")).sorted.toSeq ==
      expected.values.map(_.size.toLong).toSeq.sorted)
  }

  test("referential: unknown hosts are exactly the tail hosts above h090") {
    val unknown = Referential.unknownHosts(pages, PageSynth.hostDim(spark)).collect()
    val expHosts = model.filter(p => urlRe.findFirstIn(p.url).isDefined)
      .map(_.host).filter(h => h.drop(1).take(3).toInt > PageSynth.KnownHostMax).distinct.sorted
    assert(unknown.map(_.getString(0)).toSeq == expHosts)
    assert(expHosts.nonEmpty)
  }

  test("referential: only 'zz' is an unknown language") {
    val unknown = Referential.unknownLangs(pages, PageSynth.langDim(spark)).collect()
    assert(unknown.map(_.getString(0)).toSeq == Seq("zz"))
  }

  test("drift is detected on lang (PSI) and hour (KS)") {
    val psiRow = Drift.langPsi(pages).collect()(0)
    val ksRow = Drift.hourKs(pages).collect()(0)
    assert(psiRow.getAs[Double]("value") > Drift.PsiThreshold, "lang drift must trip PSI")
    assert(!psiRow.getAs[Boolean]("pass"))
    assert(ksRow.getAs[Double]("value") > Drift.KsThreshold, "hour drift must trip KS")
    assert(!ksRow.getAs[Boolean]("pass"))
  }

  test("approx distinct is within 5% of exact") {
    val r = Stats.approxDistinct(pages).collect()(0)
    assert(r.getAs[Boolean]("ok"))
  }

  test("stratified allocation: per-host cap and proportional share hold") {
    val alloc = Sampling.stratifiedAllocation(pages).collect()
    alloc.foreach { r =>
      val n = r.getAs[Long]("stratum_rows"); val s = r.getAs[Long]("sample_rows")
      assert(s == math.min(25L, (n + 4) / 5), s"host ${r.getString(0)}")
    }
  }
}
