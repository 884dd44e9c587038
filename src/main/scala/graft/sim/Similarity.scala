package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import scala.util.Random

/** Approximate-nearest-neighbor search and embedding near-duplicate
  * detection over an `embedding: array<double>` column.
  *
  * Two paths:
  *  - [[knnBrute]]: exact cosine top-k — the baseline. The query set is
  *    broadcast (small side), so the plan is a broadcast nested-loop
  *    join + per-partition top-k: the corpus is never shuffled, which
  *    is the only layout that survives a 100 TB corpus.
  *  - [[knnLsh]] / [[nearDupPairs]]: random-hyperplane LSH — banded
  *    sign-bit keys per vector (seeded, deterministic), candidates only
  *    within equal bands.
  *
  * Scale parameterization (round-2 fix): 96 hyperplanes total. Round 1
  * used 16 planes with 2–4-bit bands — a 4–16-value key domain, i.e.
  * buckets of N/4..N/16 and a near-cartesian candidate join at scale.
  * Now near-dup uses 6 bands × 16 bits (65,536-value domain per band —
  * expected bucket N/65536; miss probability for a cos ≈ 0.9999 copy
  * pair ≈ (1−0.9955^16)^6 ≈ 1e-7) and knn uses 8 bands × 12 bits
  * (recall is a function of query-neighbor cosine: ≈ 1 for cos ≥ 0.95,
  * low for isotropic-random neighbors — brute force is the exhaustive
  * path, LSH the high-similarity retrieval path; SimilaritySpec
  * measures both recall and the bucket-size bound).
  *
  * Round-3 hot-path fixes:
  *  - band hashing and cosine are native codegen'd expressions
  *    ([[graft.functions.VectorOps]]); the `aggregate(zip_with(...))`
  *    spellings remain only as parity-spec anchors — higher-order
  *    functions evaluate interpreted, and 96 of them per row was the
  *    dominant cost of `emb_near_dup` (4.8 s at 20k vectors).
  *  - top-k ranking is a salted two-phase window (the capViolations
  *    pattern): rank within (query_id, salt) first — every sort group
  *    is ~1/[[Salts]] of one query's candidates — then rank the
  *    ≤ Salts·k survivors. One reducer never sorts a whole corpus'
  *    scores for a query, which the single
  *    `Window.partitionBy(query_id)` forced at 10^12 rows.
  *
  * Round-4 scale-shape fixes (the Dedup pattern, Dedup.scala band
  * join): candidate generation is **keys-only** — the band join carries
  * (id, band_id, band_val) ≈ 24 bytes/row, and embeddings are joined
  * back from the compact id-keyed side only for matched pairs, so a
  * vector crosses a shuffle at most once instead of ×bands with its
  * ~512-byte payload attached. Oversized band buckets (templated /
  * near-zero embeddings sharing sign bits) are dropped from candidate
  * generation with a logged + surfaced count ([[CappedResult]]) — no
  * silent caps, no quadratic self-join.
  */
object Similarity {

  val Dim = 64
  val NumPlanes = 96
  val NearDupBandBits = 16 // 6 bands
  val KnnBandBits = 12     // 8 bands

  /** Salt fan-out for the two-phase top-k. */
  val Salts = 32

  /** Seeded random hyperplanes (deterministic across runs; read by the
    * DuckDB oracle renderer, which unrolls the same dots as literals).
    */
  private[graft] val Planes: IndexedSeq[IndexedSeq[Double]] = {
    val rnd = new Random(77L)
    IndexedSeq.fill(NumPlanes)(IndexedSeq.fill(Dim)(rnd.nextGaussian()))
  }

  /** Planes flattened row-major for the native expression. */
  private val PlanesFlat: Array[Double] = Planes.flatten.toArray

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, v) => acc + v))

  /** Native one-pass cosine (codegen'd; bit-identical to
    * [[cosineDeclarative]] — same fold order).
    */
  def cosine(a: Column, b: Column): Column = graft.functions.VectorOps.cosine(a, b)

  /** The declarative cosine, kept for the parity spec. */
  private[graft] def cosineDeclarative(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** All band values as one `array<long>` in one native pass: entry b
    * packs `bandBits` sign bits of this band's plane subset.
    * (With 96 planes the full signature exceeds 64 bits, so bands are
    * computed directly — there is no single "bucket" integer.)
    */
  def bandVals(v: Column, bandBits: Int): Column = {
    require(NumPlanes % bandBits == 0, s"bandBits $bandBits must divide $NumPlanes")
    graft.functions.VectorOps.hyperplaneBands(v, PlanesFlat, Dim, bandBits)
  }

  /** One band value, declarative (parity-spec anchor for [[bandVals]]). */
  private[graft] def bandValDeclarative(v: Column, band: Int, bandBits: Int): Column =
    (0 until bandBits).map { j =>
      val p = Planes(band * bandBits + j)
      when(dot(v, array(p.map(lit): _*)) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Banded LSH keys: NumPlanes/bandBits structs of (band_id, band_val).
    * Two vectors are candidates iff they share at least one band.
    */
  def bucketBands(v: Column, bandBits: Int): Column = {
    val bv = bandVals(v, bandBits)
    // NB: the Scala-DSL two-arg transform lambda receives a 1-based
    // element index (same quirk EmbSynth documents)
    transform(bv, (x, i) => struct((i - 1).cast("int").as("band_id"), x.as("band_val")))
  }

  /** Candidate-generation bucket cap (same rationale and default as
    * [[graft.dedup.Dedup.MaxBucketSize]]): a degenerate band value — a
    * mass of templated or near-zero embeddings sharing sign bits —
    * would make the band join quadratic; buckets above this are dropped
    * from candidate generation with a logged + surfaced count.
    */
  val MaxBucketSize = 10000L

  /** Banded LSH keys only — (id, band_id, band_val), ~24 bytes/row.
    * This is the ONLY shape allowed below the band join: the round-3
    * version kept the ~512-byte embedding attached, replicating every
    * corpus vector ×bands through the candidate shuffle. Embeddings are
    * joined back from the compact id-keyed side *after* candidate
    * generation (the [[graft.dedup.Dedup]] keys-only pattern), so each
    * vector crosses a shuffle at most once, not ×bands.
    */
  private def bandsKeysOnly(df: DataFrame, idCol: String, vecCol: String,
      bandBits: Int): DataFrame =
    df.select(col(idCol),
      posexplode(bandVals(col(vecCol), bandBits)).as(Seq("band_id", "band_val")))

  /** Exact top-k per query via the salted two-phase rank: phase 1 ranks
    * within (query_id, salt-of-neighbor) — bounded sort groups — and
    * keeps k; the per-salt top-k union provably contains the global
    * top-k, so phase 2 ranks ≤ Salts·k survivors. Deterministic: the
    * order key (cos desc, neighbor_id) is duplicate-free.
    */
  private def topK(scored: DataFrame, k: Int): DataFrame = {
    val w1 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"), pmod(xxhash64(col("neighbor_id")), lit(Salts.toLong)))
      .orderBy(col("cos").desc, col("neighbor_id"))
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("r1", row_number().over(w1))
      .where(col("r1") <= k)
      .withColumn("rank", row_number().over(w2).cast("long"))
      .where(col("rank") <= k)
      .drop("r1")
      .orderBy("query_id", "rank")
  }

  /** Exact cosine top-k for a bounded query set. Ranking is over the
    * *rounded* cosine (ties broken by neighbor_id), so the order is
    * deterministic and engine-independent.
    * Output: (query_id, neighbor_id, cos, rank), ordered.
    */
  def knnBrute(corpus: DataFrame, queries: DataFrame, k: Int = 5): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("query_id"), col("embedding").as("qv")))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
    val scored = c.join(q, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qv"), col("cv")), 6).as("cos"))
    topK(scored, k)
  }

  /** Lazy knn-LSH plan over pre-built sides: keys-only candidates
    * (band join = corpus keys vs *broadcast* query keys — no shuffle at
    * all for candidate generation), embeddings joined back per matched
    * pair. Shared by the eager operator and the plan spec, which
    * asserts no array column below the band join.
    */
  private[graft] def knnLshScored(cVec: DataFrame, cBands: DataFrame,
      qVec: DataFrame, k: Int): DataFrame = {
    val qBands = broadcast(bandsKeysOnly(qVec, "query_id", "qv", KnnBandBits))
    val cand = cBands.join(qBands, Seq("band_id", "band_val"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id").distinct()
    val scored = cand.join(cVec, "neighbor_id").join(broadcast(qVec), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qv"), col("cv")), 6).as("cos"))
    topK(scored, k)
  }

  /** Lazy plan twin of [[knnLsh]] (no persist/cap/checkpoint) for the
    * plan spec.
    */
  private[graft] def knnLshPlan(corpus: DataFrame, queries: DataFrame,
      k: Int = 5): DataFrame = {
    val qVec = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val cVec = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
    knnLshScored(cVec, bandsKeysOnly(cVec, "neighbor_id", "cv", KnnBandBits), qVec, k)
  }

  /** LSH-bucketed top-k: identical output shape to [[knnBrute]] but
    * candidates restricted to vectors sharing ≥1 band with the query
    * (scale path; recall measured against brute in tests). Eager, like
    * the [[graft.dedup.Dedup]] pair operators: the (queries×k)-bounded
    * result is materialized and the compact intermediates unpersisted
    * before returning.
    */
  def knnLsh(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      maxBucket: Long = MaxBucketSize): DataFrame =
    knnLshCounted(corpus, queries, k, maxBucket).result

  /** [[knnLsh]] plus the dropped-bucket count (no silent caps). */
  def knnLshCounted(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      maxBucket: Long = MaxBucketSize): CappedResult = {
    val qVec = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val cVec = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cBandsAll = bandsKeysOnly(cVec, "neighbor_id", "cv", KnnBandBits)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (cBands, capped) = graft.dedup.Dedup.capBucketsCounted(
      cBandsAll, Seq("band_id", "band_val"), "knn_lsh", maxBucket)
    val out = knnLshScored(cVec, cBands, qVec, k).localCheckpoint(true)
    cVec.unpersist(); cBandsAll.unpersist()
    CappedResult(out, capped)
  }

  /** Lazy near-dup plan over pre-built sides: keys-only band self-join
    * → distinct candidate id pairs → embeddings joined back (once per
    * id, not ×bands) for the cosine verify.
    */
  private[graft] def nearDupScored(vecs: DataFrame, bands: DataFrame,
      threshold: Double): DataFrame = {
    val cand = bands.select(col("vec_id").as("id_a"), col("band_id"), col("band_val"))
      .join(bands.select(col("vec_id").as("id_b"), col("band_id"), col("band_val")),
        Seq("band_id", "band_val"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    cand
      .join(vecs.select(col("vec_id").as("id_a"), col("embedding").as("va")), "id_a")
      .join(vecs.select(col("vec_id").as("id_b"), col("embedding").as("vb")), "id_b")
      .select(col("id_a"), col("id_b"), round(cosine(col("va"), col("vb")), 6).as("cos"))
      .where(col("cos") >= threshold)
  }

  /** Lazy plan twin of [[nearDupPairs]] for the plan spec. */
  private[graft] def nearDupPlan(corpus: DataFrame, threshold: Double = 0.99): DataFrame = {
    val vecs = corpus.select(col("vec_id"), col("embedding"))
    nearDupScored(vecs, bandsKeysOnly(vecs, "vec_id", "embedding", NearDupBandBits), threshold)
      .orderBy("id_a", "id_b")
  }

  /** Eager result + the dropped-bucket count ("no silent caps" — the
    * suite surfaces it in the audit params).
    */
  final case class CappedResult(result: DataFrame, cappedBuckets: Long)

  /** Embedding near-duplicate pairs via banded LSH + cosine verify.
    * Output: (id_a, id_b, cos) with rounded cos ≥ threshold, ordered.
    * Eager (checkpointed result, intermediates unpersisted).
    */
  def nearDupPairs(corpus: DataFrame, threshold: Double = 0.99,
      maxBucket: Long = MaxBucketSize): DataFrame =
    nearDupPairsCounted(corpus, threshold, maxBucket).result

  // ——— IVF-Flat: the coarse-quantizer ANN scale path ———

  /** Coarse-quantizer cells / probed cells per query. 16 cells suit the
    * test corpora (10²–10⁵ vectors); a 10⁹-vector deployment raises
    * NumCells to ~√n and trains the quantizer offline — the operator
    * takes any centroid set.
    */
  val NumCells = 16
  val NumProbes = 4

  /** Deterministic seed centroids: the nCells sample vectors with the
    * smallest vec_id (k-means initialization; cell ids 0..nCells-1).
    */
  def ivfCentroids(corpus: DataFrame, nCells: Int = NumCells): Seq[(Long, Array[Double])] =
    corpus.select(col("vec_id"), col("embedding")).orderBy("vec_id").limit(nCells)
      .collect().zipWithIndex
      .map { case (r, i) => (i.toLong, r.getSeq[Double](1).toArray) }.toSeq

  // ——— deterministic k-means training (Lloyd's over a hash sample) ———

  /** Knuth-multiplicative hash sample gate: vec_id * Mul % Mod < Lt.
    * 25% at the test corpora (the sample must cover NumCells cells); a
    * 10⁹-vector deployment lowers Lt toward ~1% — the knob, not the
    * shape, changes. [[MaxTrainSample]] bounds the driver-side collect
    * regardless of corpus size.
    */
  val TrainHashMul = 2654435761L
  val TrainHashMod = 100L
  val TrainSampleLt = 25L
  val MaxTrainSample = 4096
  val TrainIters = 3

  private def round6(x: Double): Double =
    BigDecimal.decimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Driver-side cosine with the exact op order of the native
    * [[cosine]] expression and the oracle's unrolled SQL (left-to-right
    * index-order sums), so trained centroids are bit-reproducible.
    */
  private def cosScalar(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** The bounded, vec_id-ordered training sample (driver-side). */
  def ivfTrainSample(corpus: DataFrame): Seq[(Long, Array[Double])] =
    corpus.select(col("vec_id"), col("embedding"))
      .where(pmod(col("vec_id") * TrainHashMul, lit(TrainHashMod)) < TrainSampleLt)
      .orderBy("vec_id").limit(MaxTrainSample)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq

  /** Deterministic k-means coarse quantizer: Lloyd's over the
    * hash-sampled, vec_id-ordered training set — seeds = the nCells
    * smallest-vec_id sample vectors, assignment by rounded cosine
    * (ties → smallest cell_id, like [[cellRanks]]), centroid update =
    * coordinate means accumulated in vec_id order and rounded to 6
    * decimals, empty cells keep their previous centroid. Every step is
    * order-pinned so the DuckDB oracle recomputes bit-identical
    * centroids (OracleSql.ivfTrainCtes). Training is the bounded
    * offline step real IVF does (sample collect ≤ [[MaxTrainSample]]
    * rows); the resulting centroid table broadcasts as literals into
    * the assignment scan exactly like the seeds did.
    */
  def ivfCentroidsTrained(corpus: DataFrame, nCells: Int = NumCells,
      iters: Int = TrainIters): Seq[(Long, Array[Double])] = {
    val sample = ivfTrainSample(corpus)
    require(sample.size >= nCells, s"IVF training sample ${sample.size} < $nCells cells")
    val dim = sample.head._2.length
    var cents: Seq[(Long, Array[Double])] =
      sample.take(nCells).zipWithIndex.map { case ((_, v), i) => (i.toLong, v) }
    for (_ <- 1 to iters) {
      val assigned = sample.map { case (vid, v) =>
        val cell = cents.map { case (cid, c) => (round6(cosScalar(v, c)), cid) }
          .maxBy { case (cc, cid) => (cc, -cid) }._2 // best cosine, tie → smallest cell
        (cell, vid, v)
      }
      cents = cents.map { case (cid, prev) =>
        val members = assigned.filter(_._1 == cid) // vec_id order (sample is sorted)
        if (members.isEmpty) (cid, prev)
        else {
          val n = members.size
          (cid, Array.tabulate(dim) { i =>
            round6(members.foldLeft(0.0)((acc, m) => acc + m._3(i)) / n)
          })
        }
      }
    }
    cents
  }

  /** Cells ranked nearest-first for one vector: a 16-entry array of
    * (−cos, cell_id) structs, sorted ascending — i.e. by rounded cosine
    * descending, ties to the smallest cell_id (the DuckDB oracle's
    * `ORDER BY cc DESC, cell_id`). Each centroid is a folded literal
    * array, so the whole ranking is nCells native [[cosine]] calls +
    * one 16-element sort inside whole-stage codegen — no join, no
    * shuffle, no UDF.
    */
  private def cellRanks(v: Column, centroids: Seq[(Long, Array[Double])]): Column =
    sort_array(array(centroids.map { case (cid, cv) =>
      struct((-round(cosine(v, array(cv.toIndexedSeq.map(lit): _*)), 6)).as("neg_cc"),
        lit(cid).as("cell_id"))
    }: _*))

  /** Lazy IVF plan over an explicit centroid set (shared by the eager
    * operator and the plan spec). Corpus side: one narrow projection
    * computes each vector's cell (argmax centroid cosine) — the corpus
    * is NEVER shuffled; candidates come from a broadcast join of the
    * (bounded) query probe list against the cell-keyed corpus, scored
    * with the native cosine, then the salted two-phase [[topK]]. At
    * 100 TB the corpus is written cell-partitioned ([[writeIvfTable]])
    * and probed through [[knnIvfOnTable]], whose static cell filter
    * prunes to nProbe/nCells of the files before the scan — the reason
    * IVF is the scale path over LSH's ×bands explosion.
    */
  private[graft] def knnIvfPlan(corpus: DataFrame, queries: DataFrame,
      centroids: Seq[(Long, Array[Double])], k: Int, nProbe: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
      .withColumn("cell_id", element_at(cellRanks(col("cv"), centroids), 1).getField("cell_id"))
    val qProbes = broadcast(
      queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
        .withColumn("probe", explode(slice(cellRanks(col("qv"), centroids), 1, nProbe)))
        .select(col("query_id"), col("qv"), col("probe.cell_id").as("cell_id")))
    // each corpus vector lives in exactly one cell and a query's probe
    // cells are distinct, so (query_id, neighbor_id) pairs are already
    // unique — no distinct() pass
    val scored = c.join(qProbes, "cell_id")
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qv"), col("cv")), 6).as("cos"))
    topK(scored, k)
  }

  /** IVF-Flat top-k: identical output shape to [[knnBrute]]/[[knnLsh]],
    * candidates restricted to the nProbe nearest coarse cells of each
    * query. Recall, like LSH, is a function of query–neighbor cosine
    * (a cos ≈ 0.9999 copy shares its source's top cell essentially
    * always); brute force remains the exhaustive path.
    */
  def knnIvf(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      nCells: Int = NumCells, nProbe: Int = NumProbes): DataFrame =
    knnIvfPlan(corpus, queries, ivfCentroids(corpus, nCells), k, nProbe)

  /** [[knnIvf]] with the k-means-trained quantizer. */
  def knnIvfTrained(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      nCells: Int = NumCells, nProbe: Int = NumProbes): DataFrame =
    knnIvfPlan(corpus, queries, ivfCentroidsTrained(corpus, nCells), k, nProbe)

  /** Write the vector corpus as an IVF table: the same narrow
    * codegen'd projection assigns each vector's cell, and the table is
    * directory-partitioned by `cell_id` — the 100-TB layout where a
    * probe prunes to nProbe/nCells of the files before any scan.
    */
  def writeIvfTable(corpus: DataFrame, centroids: Seq[(Long, Array[Double])],
      path: String): Unit =
    corpus.select(col("vec_id"), col("embedding"))
      .withColumn("cell_id",
        element_at(cellRanks(col("embedding"), centroids), 1).getField("cell_id"))
      .write.mode("overwrite").partitionBy("cell_id").parquet(path)

  /** IVF top-k over a [[writeIvfTable]] layout: probe cells are a
    * bounded driver-side set (queries are bounded by construction), so
    * the `cell_id IN (...)` predicate is a STATIC partition filter —
    * Spark's file index drops non-probed cell directories before the
    * scan (PlanSpec asserts files-read < files-total). Candidate
    * scoring then matches [[knnIvfPlan]]: broadcast probes, native
    * cosine, salted two-phase top-k.
    */
  def knnIvfOnTable(spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, centroids: Seq[(Long, Array[Double])], k: Int = 5,
      nProbe: Int = NumProbes): DataFrame = {
    val qProbes = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      .withColumn("probe", explode(slice(cellRanks(col("qv"), centroids), 1, nProbe)))
      .select(col("query_id"), col("qv"), col("probe.cell_id").as("cell_id"))
    val probeCells = qProbes.select("cell_id").distinct()
      .collect().map(_.getLong(0)).toSeq
    val table = spark.read.parquet(path)
      .where(col("cell_id").isin(probeCells: _*))
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"),
        col("cell_id").cast("long").as("cell_id"))
    val scored = table.join(broadcast(qProbes), "cell_id")
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qv"), col("cv")), 6).as("cos"))
    topK(scored, k)
  }

  /** [[nearDupPairs]] plus the dropped-bucket count. */
  def nearDupPairsCounted(corpus: DataFrame, threshold: Double = 0.99,
      maxBucket: Long = MaxBucketSize): CappedResult = {
    val vecs = corpus.select(col("vec_id"), col("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bandsAll = bandsKeysOnly(vecs, "vec_id", "embedding", NearDupBandBits)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (bands, capped) = graft.dedup.Dedup.capBucketsCounted(
      bandsAll, Seq("band_id", "band_val"), "emb_near_dup", maxBucket)
    val verified = nearDupScored(vecs, bands, threshold).localCheckpoint(true)
    vecs.unpersist(); bandsAll.unpersist()
    CappedResult(verified.orderBy("id_a", "id_b"), capped)
  }
}
