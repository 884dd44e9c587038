package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.synth.PageSynth

/** Ad-hoc stage profiler for the near-dup pipeline (not driver contract). */
object DedupProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val pages = PageSynth.pages(spark, sfDir)
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"[dprof] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($r)")
    }
    t("pages.count")(pages.count())
    val groups = Dedup.corpusGroups(pages)
    t("corpusGroups")(groups.count())
    val sh = groups.select(col("rep"), col("n_docs"), Dedup.hashedShingles(col("norm")).as("hs"))
    t("hashedShingles")(sh.agg(sum(size(col("hs")))).collect()(0).getLong(0))
    t("signature")(sh.select(Dedup.signature(col("hs")).as("sig"))
      .agg(sum(element_at(col("sig"), 1))).collect()(0))
    t("bandKeys")(sh.select(explode(Dedup.bandKeys(Dedup.signature(col("hs")))).as("b")).count())
    t("minhashPairs")(Dedup.minhashPairs(pages).count())
    t("minhashPairs2")(Dedup.minhashPairs(pages).count())
    val norm = groups.select(col("rep"), col("norm"))
    t("tokenHashes")(norm.select(Dedup.tokenHashes(col("norm")).as("th"))
      .agg(sum(size(col("th")))).collect()(0))
    t("simhash")(norm.select(Dedup.simhash(col("norm")).as("sh"))
      .agg(sum(pmod(col("sh"), lit(1000003L)))).collect()(0))
    t("simhashPairs")(Dedup.simhashPairs(pages).count())
    t("clusters")(Dedup.clusters(pages).count())
    // clusterLabels stage split
    val g2 = Dedup.corpusGroups(pages)
      .select(col("fp"), col("rep"), col("n_docs"), Dedup.hashedShingles(col("norm")).as("hs"))
    var g2c: org.apache.spark.sql.DataFrame = null
    t("cl.groupsCheckpoint") { g2c = g2.localCheckpoint(true); g2c.count() }
    var pc: Dedup.PairsCounted = null
    t("cl.pairsFromHashed") { pc = Dedup.minhashPairsFromHashed(g2c); pc.pairs.count() }
    var lbl: org.apache.spark.sql.DataFrame = null
    t("cl.components") {
      lbl = graft.dedup.Components.labels(pc.pairs.select(col("url_a"), col("url_b")))
      lbl.count()
    }
    t("cl.singletons+final") {
      val dupReps = g2c.where(col("n_docs") > 1).select(col("rep").as("node"))
        .except(lbl.select("node")).withColumn("label", col("node"))
      lbl.select("node", "label").union(dupReps).localCheckpoint(true).count()
    }
    val mp = Dedup.minhashPairs(pages)
    mp.count()
    val plan = mp.queryExecution.executedPlan.toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/minhash_plan.txt"), plan)
    println(s"[dprof] plan dumped, Exchange=${"Exchange".r.findAllIn(plan).size}")
    spark.stop()
  }
}
