package graft

import org.apache.spark.sql.SparkSession
import graft.runtime.{PageTable, SuiteRunner}
import graft.synth.PageSynth

/** Driver-run benchmark: one JSON line with per-query seconds plus the
  * headline end-to-end suite assessment (validated docs/sec path) over
  * a deterministically replicated corpus.
  */
object Bench {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val benchDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "200000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "64")
      // the suite generates >100 codegen units; the default 100-entry
      // LRU recompiles the big classes every run (see ScalingBench)
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      // row-heavy compressed synth input (~10 B/row): split scans by
      // rows, not the 128 MB byte default (see ScalingBench.session)
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // untimed warm-up: classloading, parquet reader init and
    // whole-stage-codegen compilation belong to the JVM, not to
    // whichever query happens to sort first (previously the
    // alphabetically-first query absorbed ~5 s of it every run)
    for (w <- Seq("pages_dump", "stats_minmax"); fn <- SparkEntry.queries.get(w))
      try fn(spark, sfDir).count() catch { case e: Throwable =>
        // visible failure: a broken warm-up silently reverts the bench
        // to cold-first-query skew
        System.err.println(s"[bench] warm-up query $w failed: $e")
      }

    // per-operator timings on the raw sfDir corpus
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      results(name) = try time(fn(spark, sfDir).count()) catch { case _: Throwable => -1.0 }
    }

    // headline: full constraint suite over a replicated corpus.
    // tmpfs when available — the VM disk's writeback stalls add up to
    // 3x run-to-run variance (same rationale as ScalingBench)
    val tmpBase =
      if (new java.io.File("/dev/shm").isDirectory) "/dev/shm"
      else sys.props("java.io.tmpdir")
    val root = s"$tmpBase/metricsspark_bench_$benchDocs"
    val tBuild = time {
      PageTable.write(PageSynth.replicatedPages(spark, sfDir, benchDocs), root)
    }
    val nDocs = PageTable.read(spark, root).count()
    val tSuite = time {
      SuiteRunner.assess(spark, root, s"bench_${System.nanoTime()}",
        embeddings = Some(graft.synth.EmbSynth.vectors(spark, sfDir))).count()
    }
    results("suite_build_table") = tBuild
    results("suite_assess") = tSuite

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    val docsPerSec = (nDocs / tSuite).round
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","suite_docs":$nDocs,"suite_docs_per_sec":$docsPerSec}"""
    println(line)
    // durable copy: the driver captures stdout tails, which truncated
    // the round-4 per-query head — cross-round comparisons read this
    try {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get("BENCH"))
      java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH/last_run.json"), line + "\n")
    } catch { case e: Throwable => System.err.println(s"[bench] BENCH/last_run.json write failed: $e") }
    spark.stop()
  }
}
