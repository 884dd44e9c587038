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
  * All arithmetic is `functions`-level (zip_with/aggregate — left-fold
  * summation, bit-identical to the DuckDB oracle's unrolled
  * left-associated sum).
  */
object Similarity {

  val Dim = 64
  val NumPlanes = 96
  val NearDupBandBits = 16 // 6 bands
  val KnnBandBits = 12     // 8 bands

  /** Seeded random hyperplanes (deterministic across runs). */
  private[sim] val Planes: IndexedSeq[IndexedSeq[Double]] = {
    val rnd = new Random(77L)
    IndexedSeq.fill(NumPlanes)(IndexedSeq.fill(Dim)(rnd.nextGaussian()))
  }

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, v) => acc + v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** One band value: `bandBits` sign bits from this band's own plane
    * subset, packed into a long. (With 96 planes the full signature
    * exceeds 64 bits, so bands are computed directly — there is no
    * single "bucket" integer.)
    */
  private def bandVal(v: Column, band: Int, bandBits: Int): Column =
    (0 until bandBits).map { j =>
      val p = Planes(band * bandBits + j)
      when(dot(v, array(p.map(lit): _*)) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Banded LSH keys: NumPlanes/bandBits structs of (band_id, band_val).
    * Two vectors are candidates iff they share at least one band.
    */
  def bucketBands(v: Column, bandBits: Int): Column = {
    require(NumPlanes % bandBits == 0, s"bandBits $bandBits must divide $NumPlanes")
    val numBands = NumPlanes / bandBits
    array((0 until numBands).map { b =>
      struct(lit(b).as("band_id"), bandVal(v, b, bandBits).as("band_val"))
    }: _*)
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
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .orderBy("query_id", "rank")
  }

  /** LSH-bucketed top-k: identical output shape to [[knnBrute]] but
    * candidates restricted to vectors sharing ≥1 band with the query
    * (scale path; recall measured against brute in tests).
    */
  def knnLsh(corpus: DataFrame, queries: DataFrame, k: Int = 5): DataFrame = {
    val q = broadcast(queries
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        explode(bucketBands(col("embedding"), KnnBandBits)).as("b"))
      .select(col("query_id"), col("qv"), col("b.band_id"), col("b.band_val")))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"),
      explode(bucketBands(col("embedding"), KnnBandBits)).as("b"))
      .select(col("neighbor_id"), col("cv"), col("b.band_id"), col("b.band_val"))
    val scored = c.join(q, Seq("band_id", "band_val"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qv"), col("cv")), 6).as("cos"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .orderBy("query_id", "rank")
  }

  /** Embedding near-duplicate pairs via banded LSH + cosine verify.
    * Output: (id_a, id_b, cos) with rounded cos ≥ threshold, ordered.
    */
  def nearDupPairs(corpus: DataFrame, threshold: Double = 0.99): DataFrame = {
    val b = corpus.select(col("vec_id"), col("embedding"),
      explode(bucketBands(col("embedding"), NearDupBandBits)).as("bb"))
      .select(col("vec_id"), col("embedding"), col("bb.band_id"), col("bb.band_val"))
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
