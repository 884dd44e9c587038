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
  *  - [[knnLsh]] / [[nearDupPairs]]: random-hyperplane LSH — sign-bit
  *    bucket per vector (seeded, deterministic), candidates only within
  *    equal buckets.
  *
  * All arithmetic is `functions`-level (zip_with/aggregate — codegen'd,
  * no UDFs).
  */
object Similarity {

  val Dim = 64
  val NumPlanes = 16

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

  /** Sign-bit LSH bucket (NumPlanes-bit integer) of a vector. */
  def bucket(v: Column): Column =
    Planes.zipWithIndex.map { case (p, i) =>
      val planeLit = array(p.map(lit): _*)
      when(dot(v, planeLit) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Banded LSH keys: NumPlanes/bandBits structs of (band_id, band_val)
    * where band_val is bandBits sign bits. Two vectors are candidates
    * iff they share at least one band. Fewer bits per band → higher
    * recall at lower cosine (more candidates); more bits → tighter
    * candidate sets for near-dup (cos ≈ 1) work.
    */
  def bucketBands(v: Column, bandBits: Int): Column = {
    val bkt = bucket(v)
    val numBands = NumPlanes / bandBits
    array((0 until numBands).map { b =>
      struct(lit(b).as("band_id"),
        shiftright(bkt, b * bandBits).bitwiseAND(lit((1L << bandBits) - 1)).as("band_val"))
    }: _*)
  }

  /** Exact cosine top-k for a bounded query set.
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
    * candidates restricted to the query's bucket (scale path; recall
    * measured against brute in tests).
    */
  def knnLsh(corpus: DataFrame, queries: DataFrame, k: Int = 5): DataFrame = {
    val q = broadcast(queries
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        explode(bucketBands(col("embedding"), 2)).as("b"))
      .select(col("query_id"), col("qv"), col("b.band_id"), col("b.band_val")))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"),
      explode(bucketBands(col("embedding"), 2)).as("b"))
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

  /** Embedding near-duplicate pairs via LSH buckets + cosine verify.
    * Output: (id_a, id_b, cos) with cos ≥ threshold, ordered.
    */
  def nearDupPairs(corpus: DataFrame, threshold: Double = 0.99): DataFrame = {
    val b = corpus.select(col("vec_id"), col("embedding"),
      explode(bucketBands(col("embedding"), 4)).as("bb"))
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
