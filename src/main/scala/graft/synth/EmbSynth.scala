package graft.synth

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic embedding-corpus derivation from the driver-provided
  * `embeddings` parquet: the raw vectors are isotropic noise (no
  * near-duplicate pairs exist), so — like [[PageSynth]]'s defect
  * injection — we append perturbed copies of every 25th vector. Each
  * copy is its source plus a tiny deterministic offset, giving
  * cosine ≈ 0.9999 true near-dups for the similarity/dedup operators
  * to find.
  */
object EmbSynth {

  /** vec_id offset for injected near-duplicate copies. */
  val CopyIdOffset = 1000000L
  val CopyEvery = 25L

  /** Corpus: original vectors (cast to double[]) + perturbed copies.
    * Columns: (vec_id, embedding: array<double>, label, is_copy).
    */
  def vectors(spark: SparkSession, sfDir: String): DataFrame = {
    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"),
        col("label"))
    val originals = base.withColumn("is_copy", lit(false))
    val copies = base.where(col("vec_id") % CopyEvery === 0)
      .select(
        (col("vec_id") + CopyIdOffset).as("vec_id"),
        // NB: Spark's Scala-DSL two-arg transform passes a 1-based
        // element index (verified empirically; the DuckDB oracle's
        // generate_series(1, len) mirrors it exactly)
        transform(col("embedding"),
          (x, i) => x + (pmod(col("vec_id") + i.cast("long"), lit(7L)).cast("double") - 3.0) * 0.001)
          .as("embedding"),
        col("label"),
        lit(true).as("is_copy"))
    originals.unionByName(copies)
  }
}
