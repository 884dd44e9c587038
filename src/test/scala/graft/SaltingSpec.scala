package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.checks.Salting
import graft.synth.PageSynth

/** Salted two-phase aggregation must be value-identical to the
  * single-phase form at any salt count (SURVEY §4.2 skew handling).
  */
class SaltingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val pages = PageSynth.pages(spark, TestSpark.sf0001).cache()

  test("salted host profile equals unsalted for several salt counts") {
    val expected = Salting.hostProfileUnsalted(pages).collect().map(_.toString).toSeq
    for (s <- Seq(1, 4, 32)) {
      val got = Salting.hostProfile(pages, s).collect().map(_.toString).toSeq
      assert(got == expected, s"salts=$s")
    }
  }

  test("salted profile sees the Zipf head host") {
    val head = Salting.hostProfile(pages).collect()
      .maxBy(_.getAs[Long]("n_rows"))
    assert(head.getString(0) == "h000.example.com")
  }
}
