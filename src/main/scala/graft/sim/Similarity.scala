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

  /** Explode a side into (…, band_id, band_val) rows via the native
    * band array (posexplode → no per-element struct allocation).
    */
  private def explodeBands(df: DataFrame, vecCol: String, bandBits: Int,
      keep: Seq[String]): DataFrame =
    df.withColumn("__bv", bandVals(col(vecCol), bandBits))
      .select(keep.map(col) :+ posexplode(col("__bv")).as(Seq("band_id", "band_val")): _*)

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

  /** LSH-bucketed top-k: identical output shape to [[knnBrute]] but
    * candidates restricted to vectors sharing ≥1 band with the query
    * (scale path; recall measured against brute in tests).
    */
  def knnLsh(corpus: DataFrame, queries: DataFrame, k: Int = 5): DataFrame = {
    val q = broadcast(explodeBands(
      queries.select(col("vec_id").as("query_id"), col("embedding").as("qv")),
      "qv", KnnBandBits, Seq("query_id", "qv")))
    val c = explodeBands(
      corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv")),
      "cv", KnnBandBits, Seq("neighbor_id", "cv"))
    val scored = c.join(q, Seq("band_id", "band_val"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qv"), col("cv")), 6).as("cos"))
      .distinct()
    topK(scored, k)
  }

  /** Embedding near-duplicate pairs via banded LSH + cosine verify.
    * Output: (id_a, id_b, cos) with rounded cos ≥ threshold, ordered.
    */
  def nearDupPairs(corpus: DataFrame, threshold: Double = 0.99): DataFrame = {
    val b = explodeBands(
      corpus.select(col("vec_id"), col("embedding")),
      "embedding", NearDupBandBits, Seq("vec_id", "embedding"))
    val l = b.select(col("vec_id").as("id_a"), col("embedding").as("va"),
      col("band_id"), col("band_val"))
    val r = b.select(col("vec_id").as("id_b"), col("embedding").as("vb"),
      col("band_id"), col("band_val"))
    l.join(r, Seq("band_id", "band_val"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), round(cosine(col("va"), col("vb")), 6).as("cos"))
      .where(col("cos") >= threshold)
      .distinct()
      .orderBy("id_a", "id_b")
  }
}
