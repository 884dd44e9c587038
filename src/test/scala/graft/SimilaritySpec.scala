package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sim.Similarity
import graft.synth.EmbSynth

/** ANN search + embedding near-dup over the injected-copy corpus. */
class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val vectors = EmbSynth.vectors(spark, TestSpark.sf0001).cache()

  test("injected copies are found as near-dup pairs, and nothing else at 0.99") {
    val pairs = Similarity.nearDupPairs(vectors).collect()
    val nCopies = vectors.where(col("is_copy")).count()
    assert(pairs.length == nCopies)
    pairs.foreach { r =>
      assert(r.getLong(1) == r.getLong(0) + EmbSynth.CopyIdOffset)
      assert(r.getDouble(2) > 0.999)
    }
  }

  test("brute-force top-1 of a copied query is its copy") {
    val queries = vectors.where(col("vec_id") % EmbSynth.CopyEvery === 0 && !col("is_copy"))
      .limit(5)
    val knn = Similarity.knnBrute(vectors, queries, k = 3).where(col("rank") === 1).collect()
    knn.foreach { r =>
      assert(r.getLong(1) == r.getLong(0) + EmbSynth.CopyIdOffset,
        s"top-1 of ${r.getLong(0)} should be its copy")
    }
  }

  test("LSH knn recall on high-similarity neighbors is >= 0.9") {
    // LSH retrieval is a function of query-neighbor cosine: the
    // guarantee the scale parameterization makes is for close pairs
    // (the training-pipeline use case), so recall is measured on the
    // injected cos≈0.9999 copies — every copied query must retrieve
    // its copy.
    val queries = vectors.where(col("vec_id") % EmbSynth.CopyEvery === 0 && !col("is_copy"))
    val nq = queries.count().toDouble
    val hits = Similarity.knnLsh(vectors, queries, k = 5)
      .where(col("neighbor_id") === col("query_id") + EmbSynth.CopyIdOffset)
      .count().toDouble
    assert(hits / nq >= 0.9, s"copy recall = ${hits / nq}")
  }

  test("IVF knn recall on high-similarity neighbors is >= 0.9") {
    // a cos≈0.9999 copy shares its source's nearest coarse cell
    // essentially always, so every copied query must retrieve its copy
    // within NumProbes probed cells
    val queries = vectors.where(col("vec_id") % EmbSynth.CopyEvery === 0 && !col("is_copy"))
    val nq = queries.count().toDouble
    val hits = Similarity.knnIvf(vectors, queries, k = 5)
      .where(col("neighbor_id") === col("query_id") + EmbSynth.CopyIdOffset)
      .count().toDouble
    assert(hits / nq >= 0.9, s"copy recall = ${hits / nq}")
  }

  test("IVF with nProbe = nCells degenerates to exact brute-force top-k") {
    // probing every cell removes the candidate restriction entirely, so
    // the result must match knnBrute row-for-row — an end-to-end check
    // that cell assignment partitions the corpus (no vector lost or
    // duplicated across cells)
    val queries = vectors.where(col("vec_id") < 7)
    val brute = Similarity.knnBrute(vectors, queries, k = 4).collect().toSeq
    val full = Similarity.knnIvf(vectors, queries, k = 4,
      nProbe = Similarity.NumCells).collect().toSeq
    assert(full == brute)
  }

  test("trained k-means quantizer: deterministic, and nProbe = nCells still equals brute") {
    val c1 = Similarity.ivfCentroidsTrained(vectors)
    val c2 = Similarity.ivfCentroidsTrained(vectors)
    assert(c1.map(_._1) == (0L until Similarity.NumCells.toLong))
    assert(c1.zip(c2).forall { case ((i, a), (j, b)) => i == j && a.sameElements(b) })
    // training moved the centroids off their seeds (Lloyd's did work)
    val seeds = Similarity.ivfCentroids(vectors)
    assert(c1.zip(seeds).exists { case ((_, a), (_, s)) => !a.sameElements(s) })
    val queries = vectors.where(col("vec_id") < 7)
    val brute = Similarity.knnBrute(vectors, queries, k = 4).collect().toSeq
    val full = Similarity.knnIvfTrained(vectors, queries, k = 4,
      nProbe = Similarity.NumCells).collect().toSeq
    assert(full == brute)
  }

  test("cell-partitioned IVF table: probes read only the probed cells' files") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val cents = Similarity.ivfCentroidsTrained(vectors)
    val path = s"${sys.props("java.io.tmpdir")}/graft_ivf_table_spec"
    Similarity.writeIvfTable(vectors, cents, path)
    val totalCells = spark.read.parquet(path).select("cell_id").distinct().count()
    val queries = vectors.where(col("vec_id") < 3)
    val pruned = Similarity.knnIvfOnTable(spark, path, queries, cents, k = 4)
    // value parity with the in-memory plan over the same centroids
    val inMem = Similarity.knnIvfTrained(vectors, queries, k = 4).collect().toSeq
    assert(pruned.collect().toSeq == inMem)
    // the scan's partition filters prune the file index to the probed
    // cells' directories — strictly fewer files than the table holds
    // (the 100-TB prune claim, asserted on the listing the scan reads)
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p.collect {
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(s.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => scans(r.child)
        case f: FileSourceScanExec => Seq(f)
      }.flatten
    val tableScans = scans(pruned.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("graft_ivf_table_spec")))
    assert(tableScans.nonEmpty)
    assert(tableScans.forall(_.partitionFilters.nonEmpty),
      "cell_id IN (...) must reach the scan as a partition filter")
    val scanned = tableScans.map(f =>
      f.relation.location.listFiles(f.partitionFilters, f.dataFilters)
        .map(_.files.size).sum).sum
    val allFiles = spark.read.parquet(path).inputFiles.length
    assert(totalCells == Similarity.NumCells.toLong)
    assert(scanned > 0 && scanned < allFiles,
      s"expected partition pruning: listed $scanned of $allFiles files")
  }

  test("LSH bucket sizes are bounded (max band bucket < 1% of corpus)") {
    val n = vectors.count().toDouble
    val maxBucket = vectors
      .select(explode(Similarity.bucketBands(col("embedding"), Similarity.NearDupBandBits)).as("b"))
      .groupBy("b.band_id", "b.band_val").count()
      .agg(max("count")).collect()(0).getLong(0).toDouble
    assert(maxBucket / n < 0.01, s"max bucket fraction = ${maxBucket / n}")
  }

  test("pathological shared-band cluster is capped, not quadratic, and the cap is surfaced") {
    import spark.implicits._
    // 40 near-identical vectors: every one shares every band value (same
    // sign on every hyperplane) — the adversarial-template hazard. With
    // a bucket cap of 10 the band join must drop the buckets (surfacing
    // the count) instead of generating 40·39/2 candidate pairs per band.
    val base = Array.tabulate(Similarity.Dim)(i => math.sin(i + 1.0))
    val rows = (0 until 40).map(i => (i.toLong, base.map(x => x * (1.0 + i * 1e-9)).toSeq))
    val corpus = rows.toDF("vec_id", "embedding")
    val capped = Similarity.nearDupPairsCounted(corpus, 0.99, maxBucket = 10)
    assert(capped.cappedBuckets > 0, "oversized buckets must be counted")
    assert(capped.result.count() == 0, "capped run must not emit the quadratic pair set")
    // uncapped run on the same corpus finds the full pair set — the cap
    // trades recall, measurably, never correctness of what it emits
    val full = Similarity.nearDupPairsCounted(corpus, 0.99, maxBucket = Long.MaxValue)
    assert(full.cappedBuckets == 0)
    assert(full.result.count() == 40L * 39 / 2)
  }

  test("native cosine is bit-identical to the declarative aggregate/zip_with fold") {
    val sample = vectors.limit(200)
      .select(col("vec_id"), col("embedding").as("a"))
      .crossJoin(vectors.limit(7).select(col("embedding").as("b")))
    val diffs = sample.select(
      Similarity.cosine(col("a"), col("b")).as("native"),
      Similarity.cosineDeclarative(col("a"), col("b")).as("decl"))
      .where(col("native") =!= col("decl")) // bitwise: NaN-free corpus
      .count()
    assert(diffs == 0)
  }

  test("native hyperplane bands are identical to the declarative per-band dots") {
    for (bandBits <- Seq(Similarity.NearDupBandBits, Similarity.KnnBandBits)) {
      val numBands = Similarity.NumPlanes / bandBits
      val decl = array((0 until numBands).map(b =>
        Similarity.bandValDeclarative(col("embedding"), b, bandBits)): _*)
      val diffs = vectors.limit(500)
        .select(Similarity.bandVals(col("embedding"), bandBits).as("native"), decl.as("decl"))
        .where(col("native") =!= col("decl"))
        .count()
      assert(diffs == 0, s"bandBits=$bandBits")
    }
  }

  test("cosine of a vector with itself is 1") {
    val self = vectors.limit(10)
      .select(round(Similarity.cosine(col("embedding"), col("embedding")), 9).as("c"))
      .collect()
    self.foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-9))
  }

  test("knn results deterministic across repartitioning") {
    val q = vectors.where(col("vec_id") < 10 && !col("is_copy"))
    val a = Similarity.knnBrute(vectors, q).collect().map(_.toString).toSeq
    val b = Similarity.knnBrute(vectors.repartition(9), q).collect().map(_.toString).toSeq
    assert(a == b)
  }
}
