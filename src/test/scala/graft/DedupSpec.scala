package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.synth.PageSynth

/** Near-duplicate detection: LSH results vs the O(n²) exact baseline. */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val pages = PageSynth.pages(spark, TestSpark.sf0001).cache()

  test("minhash+LSH finds every brute-force Jaccard pair at sf0.001") {
    // with 16 bands × 4 rows, P(candidate | J≥0.7) ≈ 1-(1-0.7^4)^16 ≈ 0.99;
    // on this corpus every true pair must surface (verified exactly).
    val brute = Dedup.bruteJaccardPairs(pages).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    val lsh = Dedup.minhashPairs(pages).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(brute.nonEmpty, "fixture must contain near-dup pairs")
    assert(lsh == brute, s"LSH missed ${(brute -- lsh).size}, extra ${(lsh -- brute).size}")
  }

  test("boilerplate groups appear as jaccard-1.0 pairs") {
    val ones = Dedup.minhashPairs(pages).where(col("jaccard") === 1.0).count()
    assert(ones > 0)
  }

  test("simhash: identical texts have hamming 0, boiler A-B pairs are close") {
    val pairs = Dedup.simhashPairs(pages).collect()
    assert(pairs.nonEmpty)
    val zero = pairs.count(_.getAs[Long]("hamming") == 0L)
    assert(zero > 0, "exact dup texts must collide at hamming 0")
  }

  test("dedup outputs are deterministic across repartitioning") {
    val a = Dedup.minhashPairs(pages).collect().map(_.toString).toSeq
    val b = Dedup.minhashPairs(pages.repartition(11)).collect().map(_.toString).toSeq
    assert(a == b)
    val c = Dedup.simhashPairs(pages).collect().map(_.toString).toSeq
    val d = Dedup.simhashPairs(pages.repartition(5)).collect().map(_.toString).toSeq
    assert(c == d)
  }

  test("shingles: short text degenerates to whole-text shingle") {
    import spark.implicits._
    val df = Seq(("u1", "one two"), ("u2", "a b c d")).toDF("url", "text")
    val sh = df.select(Dedup.shingles(col("text")).as("sh")).collect()
    assert(sh(0).getSeq[String](0) == Seq("one two"))
    assert(sh(1).getSeq[String](0) == Seq("a b c", "b c d"))
  }
}
