package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.synth.PageSynth

/** Near-duplicate detection: LSH results vs the O(g²) exact baseline,
  * over collapsed distinct-text groups.
  */
class DedupSpec extends AnyFunSuite {

  test("native minhash signature is bit-identical to the declarative spelling") {
    val spark = TestSpark.spark
    val pages = graft.synth.PageSynth.pages(spark, TestSpark.sf0001)
    val sh = Dedup.corpusGroups(pages)
      .select(col("rep"), Dedup.hashedShingles(col("norm")).as("hs"))
    val diff = sh.select(col("rep"),
        Dedup.signature(col("hs")).as("native"),
        Dedup.signatureDeclarative(col("hs")).as("decl"))
      .where(not(col("native") <=> col("decl")))
      .count()
    assert(diff == 0)
  }

  test("cluster formation: driver union-find equals distributed label propagation") {
    val spark = TestSpark.spark
    val pages = PageSynth.pages(spark, TestSpark.sf001)
    val fast = Dedup.clusters(pages).collect().map(_.toString).sorted.toSeq
    val dist = Dedup.clusters(pages, unionFindMaxPairs = 0L)
      .collect().map(_.toString).sorted.toSeq
    assert(fast == dist)
    assert(fast.nonEmpty)
  }

  test("native simhash is bit-identical to the declarative spelling") {
    val spark = TestSpark.spark
    val pages = graft.synth.PageSynth.pages(spark, TestSpark.sf0001)
    val diff = Dedup.corpusGroups(pages)
      .select(Dedup.simhash(col("norm")).as("native"),
        Dedup.simhashDeclarative(col("norm")).as("decl"))
      .where(not(col("native") <=> col("decl")))
      .count()
    assert(diff == 0)
  }
  private lazy val spark = TestSpark.spark
  private lazy val pages = PageSynth.pages(spark, TestSpark.sf0001).cache()

  test("minhash+LSH finds exactly the brute-force Jaccard pairs at sf0.001") {
    val brute = Dedup.bruteJaccardPairs(pages).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    val lsh = Dedup.minhashPairs(pages).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(brute.nonEmpty, "fixture must contain near-dup pairs")
    assert(lsh == brute, s"LSH missed ${(brute -- lsh).size}, extra ${(lsh -- brute).size}")
  }

  test("exact-dup groups are collapsed: the A/B pair carries group sizes") {
    val rows = Dedup.minhashPairs(pages).collect()
    assert(rows.forall(_.getAs[Double]("jaccard") < 1.0),
      "distinct-fp representatives should never be byte-identical")
    // the boilerplate A/B pair (J = 15/17 ≈ 0.88): both sides are
    // multi-doc exact-dup groups, so the fan-out counts exceed 1
    val boilerUrls = pages.where(col("text").startsWith("boilerplate cookie"))
      .select("url").collect().map(_.getString(0)).toSet
    val ab = rows.filter(r =>
      boilerUrls.contains(r.getAs[String]("url_a")) && boilerUrls.contains(r.getAs[String]("url_b")))
    assert(ab.length == 1, "exactly one A-rep/B-rep pair expected")
    assert(ab.head.getAs[Double]("jaccard") > 0.7 && ab.head.getAs[Double]("jaccard") < 0.9)
    assert(ab.head.getAs[Long]("n_docs_a") > 1 && ab.head.getAs[Long]("n_docs_b") > 1)
  }

  test("simhash finds the long-document C/C' pair within hamming<=3") {
    val pairs = Dedup.simhashPairs(pages).collect()
    assert(pairs.forall(_.getAs[Long]("hamming") <= Dedup.HammingThreshold))
    // C/C' (1 of 400 tokens changed): deterministic hamming 3
    val cUrls = pages.where(col("text").startsWith("w001 w002"))
      .select("url").collect().map(_.getString(0)).toSet
    val cc = pairs.filter(r =>
      cUrls.contains(r.getAs[String]("url_a")) && cUrls.contains(r.getAs[String]("url_b")))
    assert(cc.length == 1, "exactly one C-rep/C'-rep pair expected")
    assert(cc.head.getAs[Long]("hamming") == 3L)
  }

  test("clusters: A+B groups form one cluster keyed by the min member url") {
    val cl = Dedup.clusters(pages).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(cl.nonEmpty)
    // every member of the A and B boilerplate groups shares one rep
    val boilerUrls = pages.where(col("text").startsWith("boilerplate cookie"))
      .select("url").collect().map(_.getString(0)).toSet
    val reps = cl.filter(c => boilerUrls.contains(c._1)).map(_._2).toSet
    assert(reps.size == 1, s"A∪B must be one cluster, got reps=$reps")
    assert(reps.head == boilerUrls.min)
    // cluster map covers every boilerplate member document
    assert(boilerUrls.subsetOf(cl.map(_._1).toSet))
  }

  test("dedup outputs are deterministic across repartitioning") {
    val a = Dedup.minhashPairs(pages).collect().map(_.toString).toSeq
    val b = Dedup.minhashPairs(pages.repartition(11)).collect().map(_.toString).toSeq
    assert(a == b)
    val c = Dedup.simhashPairs(pages).collect().map(_.toString).toSeq
    val d = Dedup.simhashPairs(pages.repartition(5)).collect().map(_.toString).toSeq
    assert(c == d)
    val e = Dedup.clusters(pages).collect().map(_.toString).toSeq
    val f = Dedup.clusters(pages.repartition(7)).collect().map(_.toString).toSeq
    assert(e == f)
  }

  test("oversized LSH buckets are dropped with a logged count, not joined quadratically") {
    import spark.implicits._
    // pathological template family: 50 *distinct* texts sharing 58 of
    // ~60 shingles — every band bucket holds most of the family, the
    // worst case the exact-dup collapse cannot absorb
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val docs = (1 to 50).map(k => (f"http://t.example.com/$k%03d", s"$base unique$k"))
      .toDF("url", "text")
    val uncapped = Dedup.minhashPairs(docs).count()
    assert(uncapped == 50L * 49 / 2, "all template pairs verify above threshold")
    // with a tight cap the oversized buckets are dropped (stderr logs
    // the count) and the candidate join stays sub-quadratic
    val capped = Dedup.minhashPairs(docs, maxBucket = 10L).count()
    assert(capped < uncapped)
    // the normal corpus is unaffected by the default cap (buckets are
    // tiny after exact-dup collapse): LSH still equals brute force
    val brute = Dedup.bruteJaccardPairs(pages).count()
    assert(Dedup.minhashPairs(pages).count() == brute)
  }

  test("shingles: short text degenerates to whole-text shingle") {
    import spark.implicits._
    val df = Seq(("u1", "one two"), ("u2", "a b c d")).toDF("url", "text")
    val sh = df.select(Dedup.shingles(Dedup.normText(col("text"))).as("sh")).collect()
    assert(sh(0).getSeq[String](0) == Seq("one two"))
    assert(sh(1).getSeq[String](0) == Seq("a b c", "b c d"))
  }
}
