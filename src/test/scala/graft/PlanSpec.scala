package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.checks._
import graft.synth.PageSynth

/** Physical-plan quality gates (SURVEY §4): the optimizer must produce
  * the plan we designed for — broadcast dims, whole-stage codegen in
  * the hot path, scan-level pushdown. These are the properties that
  * decide 100 TB behavior, so they are asserted, not eyeballed.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val pages = PageSynth.pages(spark, TestSpark.sf0001)

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("referential checks broadcast the dimension (no shuffle of the fact side)") {
    val p = plan(Referential.hostCheckByDay(pages, PageSynth.hostDim(spark)))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p.take(500))
    assert(!p.contains("SortMergeJoin"))
  }

  test("fused conformance agg runs inside whole-stage codegen") {
    // AQE finalizes the physical plan lazily: the codegen stars only
    // appear after execution, so run the query before reading the plan
    val df = FusedChecks.resultsByDay(pages)
    df.collect()
    val p = plan(df)
    assert(p.contains("*(")) // whole-stage-codegen stages are starred in toString
    assert(p.contains("HashAggregate")) // hash agg, not sort-based
  }

  test("column pruning reaches the parquet scan") {
    val dir = s"${sys.props("java.io.tmpdir")}/metricsspark_prune_test"
    pages.write.mode("overwrite").parquet(dir)
    val two = spark.read.parquet(dir).select(count(col("url")), avg(length(col("lang"))))
    val p = plan(two)
    assert(p.contains("ReadSchema: struct<url:string,lang:string>"), p.take(800))
  }

  test("filter pushdown reaches the parquet scan") {
    val dir = s"${sys.props("java.io.tmpdir")}/metricsspark_prune_test"
    val filtered = spark.read.parquet(dir).where(col("lang") === "fr").select(col("url"))
    val p = plan(filtered)
    assert(p.contains("PushedFilters: [IsNotNull(lang), EqualTo(lang,fr)]"), p.take(800))
  }

  test("stratified sample has no full-table window partitioned by the skewed key alone") {
    val p = plan(Sampling.stratifiedSample(pages))
    // phase 1 must rank within (host, salt): the first (bottom-most)
    // window in the plan carries both partition keys, so no task ever
    // sorts a whole host stratum (the head host owns 40% of all rows)
    val windows = "Window \\[row_number".r.findAllMatchIn(p).toSeq
    assert(windows.size == 2, s"expected the two-phase rank, got:\n${p.take(1200)}")
    val firstWindow = p.split("\n").filter(_.contains("Window [row_number")).last // bottom-most
    assert(firstWindow.contains("host") && firstWindow.contains("salt"),
      s"phase-1 window must partition by (host, salt): $firstWindow")
    // the allocation table needs no window at all
    val alloc = plan(Sampling.stratifiedAllocation(pages))
    assert(!alloc.contains("Window"), alloc.take(800))
  }

  test("exists probe hauls only predicate booleans through the bounded limit") {
    import org.apache.spark.sql.types.BooleanType
    val probe = Exists.flagsFrame(pages).limit(Exists.ProbeRows)
    // every column crossing the limit (and its single-partition
    // exchange) is a boolean — payloads are consumed by the projection
    // below it
    assert(probe.queryExecution.analyzed.output.forall(_.dataType == BooleanType),
      probe.queryExecution.analyzed.output.map(a => s"${a.name}:${a.dataType}").mkString(", "))
    assert(probe.queryExecution.executedPlan.toString.contains("Limit"))
  }

  test("knn brute plan broadcasts the query side") {
    val v = graft.synth.EmbSynth.vectors(spark, TestSpark.sf0001)
    val p = plan(graft.sim.Similarity.knnBrute(v, v.where(col("vec_id") < 5)))
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(500))
  }

  test("LSH band exchanges carry keys only — no embedding column below the band join") {
    import org.apache.spark.sql.execution.exchange.Exchange
    import org.apache.spark.sql.types.ArrayType
    // the round-3 plan replicated every ~512-byte embedding ×bands
    // through the candidate shuffle; the keys-only rebuild must keep
    // every band-keyed exchange at (id, band_id, band_val) width
    val v = graft.synth.EmbSynth.vectors(spark, TestSpark.sf0001)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      for (df <- Seq(
          graft.sim.Similarity.nearDupPlan(v),
          graft.sim.Similarity.knnLshPlan(v, v.where(col("vec_id") < 5)))) {
        val exchanges = df.queryExecution.executedPlan.collect { case e: Exchange => e }
        val bandExchanges = exchanges.filter(_.output.exists(_.name == "band_val"))
        assert(bandExchanges.nonEmpty, "expected band-keyed exchanges in the plan")
        for (e <- bandExchanges)
          assert(!e.output.exists(_.dataType.isInstanceOf[ArrayType]),
            "band exchange must be keys-only, got: " +
              e.output.map(a => s"${a.name}:${a.dataType.simpleString}").mkString(", "))
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("IVF plan: corpus is never shuffled — probes broadcast, shuffles carry scored keys only") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.ArrayType
    // cell assignment is a narrow projection over the corpus and the
    // probe list is broadcast, so the only shuffles in the whole plan
    // are the salted top-k windows over (query_id, neighbor_id, cos) —
    // at 100 TB no embedding ever crosses an exchange
    val v = graft.synth.EmbSynth.vectors(spark, TestSpark.sf0001)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val cents = graft.sim.Similarity.ivfCentroids(v)
      val df = graft.sim.Similarity.knnIvfPlan(v, v.where(col("vec_id") < 5), cents,
        5, graft.sim.Similarity.NumProbes)
      val p = df.queryExecution.executedPlan
      assert(p.toString.contains("BroadcastHashJoin"), p.toString.take(500))
      val shuffles = p.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.nonEmpty, "expected the top-k window shuffles")
      for (e <- shuffles)
        assert(!e.output.exists(_.dataType.isInstanceOf[ArrayType]),
          "IVF shuffle must carry scored keys only, got: " +
            e.output.map(a => s"${a.name}:${a.dataType.simpleString}").mkString(", "))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("hijack exchanges carry (url, host, fp) keys only — no text/html below the fp shuffle") {
    import org.apache.spark.sql.execution.exchange.Exchange
    import org.apache.spark.sql.types.BinaryType
    // the content column must reduce to its md5 fingerprint BEFORE the
    // group-by/join shuffles: at 100 TB the exchanges carry ~50-byte
    // key rows, never page text or html payloads
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = Hijack.verdict(pages, PageSynth.hostDim(spark))
      val exchanges = df.queryExecution.executedPlan.collect { case e: Exchange => e }
      assert(exchanges.nonEmpty)
      for (e <- exchanges) {
        assert(!e.output.exists(a => a.name == "text" || a.name == "html" ||
          a.dataType.isInstanceOf[BinaryType]),
          "hijack exchange must be fingerprint-keyed, got: " +
            e.output.map(_.name).mkString(", "))
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("vocabulary-dimension checks broadcast their dims (no fact-side shuffle joins)") {
    for (df <- Seq(
        Vocabulary.deprecatedByDay(pages, Vocabulary.deprecatedDim(spark)),
        Vocabulary.misplacedByDay(pages, Vocabulary.termDim(spark)),
        Formats.formatCounts(pages, Formats.formatDim(spark)))) {
      val p = plan(df)
      assert(p.contains("BroadcastHashJoin"), p.take(400))
      assert(!p.contains("SortMergeJoin"), p.take(400))
    }
  }

  test("license family is one scan: partial-aggregated host flags, no window, no join") {
    val df = Licensing.hostFlags(pages)
    val p = plan(df)
    assert(p.contains("HashAggregate"))
    assert(!p.contains("Window") && !p.contains("Join"), p.take(400))
    // exactly one exchange: the host-keyed final agg (map-side partials first)
    import org.apache.spark.sql.execution.exchange.Exchange
    val exchanges = df.queryExecution.executedPlan.collect { case e: Exchange => e }
    assert(exchanges.size <= 2, s"expected host agg + order-by only, got ${exchanges.size}")
  }

  test("graph sameAs edges shuffle fingerprints, never document text") {
    import org.apache.spark.sql.execution.exchange.Exchange
    import org.apache.spark.sql.types.BinaryType
    // content identity reduces to md5(fp) BEFORE the group/join
    // exchanges: at corpus scale the edge derivation moves ~50-byte
    // (fp, url) rows, never normalized text
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = graft.graph.Interlinking.sameAsEdges(pages)
      val exchanges = df.queryExecution.executedPlan.collect { case e: Exchange => e }
      assert(exchanges.nonEmpty)
      for (e <- exchanges)
        assert(!e.output.exists(a => a.name == "text" || a.name == "html" ||
          a.name == "n" || a.dataType.isInstanceOf[BinaryType]),
          "sameAs exchange must be fingerprint-keyed, got: " +
            e.output.map(_.name).mkString(", "))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("knn top-k bottom-most window partitions by (query_id, salt)") {
    // the scored set is corpus-sized: a single Window.partitionBy(query_id)
    // would sort all of one query's N scores in one task at 10^12 rows,
    // so phase 1 must carry the neighbor-hash salt in its partition keys
    val v = graft.synth.EmbSynth.vectors(spark, TestSpark.sf0001)
    for (df <- Seq(
        graft.sim.Similarity.knnBrute(v, v.where(col("vec_id") < 5)),
        // knnLsh is eager (checkpointed result) — assert on its lazy plan twin
        graft.sim.Similarity.knnLshPlan(v, v.where(col("vec_id") < 5)))) {
      val p = plan(df)
      val windows = p.split("\n").filter(_.contains("Window [row_number"))
      assert(windows.length == 2, s"expected the two-phase rank:\n${p.take(1200)}")
      // the salt expression is pre-projected as _w0, so the bottom-most
      // window's partition spec must carry query_id plus that extra key
      val bottom = windows.last
      assert(bottom.contains("query_id") && bottom.contains("_w0"),
        s"phase-1 window must partition by (query_id, salt): $bottom")
    }
  }
}
