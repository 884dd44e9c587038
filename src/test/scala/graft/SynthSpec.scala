package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.synth.PageSynth

/** Page synthesis vs the independent plain-Scala model (SynthModel). */
class SynthSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("pages schema matches the input_hint contract") {
    val p = PageSynth.pages(spark, TestSpark.sf0001)
    assert(p.columns.toSeq == Seq("url", "warc_ts", "html", "text", "lang"))
    val types = p.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(types("url") == "string" && types("warc_ts") == "timestamp" &&
      types("html") == "binary" && types("text") == "string" && types("lang") == "string")
  }

  test("every synthesized row matches the independent model") {
    val rows = PageSynth.pagesWithMeta(spark, TestSpark.sf0001)
      .select("doc_id", "url", "warc_epoch", "pday", "text", "lang", "host")
      .collect()
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      .select("doc_id", "text", "lang").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(rows.length == docs.size)
    rows.foreach { r =>
      val id = r.getLong(0)
      val (bt, bl) = docs(id)
      val m = SynthModel.page(id, bt, bl)
      assert(r.getString(1) == m.url, s"url doc $id")
      assert(Option(r.get(2)).map(_.asInstanceOf[Long]) == m.warcEpoch, s"epoch doc $id")
      assert(r.getString(3) == m.pday, s"pday doc $id")
      assert(Option(r.getString(4)) == m.text, s"text doc $id")
      assert(Option(r.getString(5)) == m.lang, s"lang doc $id")
      assert(r.getString(6) == m.host, s"host doc $id")
    }
  }

  test("host skew is Zipf-ish: top host owns ~40% of pages") {
    val counts = PageSynth.pagesWithMeta(spark, TestSpark.sf001)
      .groupBy("host").count().orderBy(desc("count")).collect()
    val total = counts.map(_.getLong(1)).sum.toDouble
    assert(counts.head.getString(0) == "h000.example.com")
    assert(counts.head.getLong(1) / total > 0.35 && counts.head.getLong(1) / total < 0.45)
    assert(counts.length > 20) // long tail exists (26 tail hosts at 500 docs)
  }

  test("replicatedPages: k deterministic replicas, synthesis fans out") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val n = docs.count()
    val rep = PageSynth.replicatedPages(spark, TestSpark.sf0001, 3 * n)
    assert(rep.count() == 3 * n)
    // Content is layout-independent: exactly the re-keyed cross product,
    // whatever partitioning the builder chose for write parallelism.
    val naive = PageSynth.pagesFromDocs(
      docs.crossJoin(spark.range(3).toDF("rep"))
        .select((col("rep") * n + col("doc_id")).as("doc_id"),
          col("text"), col("lang")))
      .select("url", "warc_ts", "html", "text", "lang")
    assert(naive.exceptAll(rep).isEmpty && rep.exceptAll(naive).isEmpty)
    // The single-file base input must NOT collapse synthesis to one task
    // (one task = ~1 core-hour at the 96M-doc bench scale).
    assert(rep.rdd.getNumPartitions > 1)
  }
}
