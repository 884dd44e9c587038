package graft.checks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Entities (urls) observed as members of declared-disjoint classes.
  *
  * Reference: AdvancedEntitiesAsMembersOfDisjointClasses
  * (intrinsic/.../consistency/AdvancedEntitiesAsMembersOfDisjointClasses.java:77-188):
  * group each entity with the set of classes it's typed with, flag the
  * entity when that set intersects a declared `owl:disjointWith` pair,
  * metric = 1 − flagged/total. The web-table analog: an entity is a
  * url, its "classes" are the script families of the languages it is
  * observed with across snapshots (dup urls re-crawled with conflicting
  * declarations), and disjointness is declared between families — a url
  * seen as both latin-script and cjk-script content is inconsistently
  * typed.
  *
  * Scale shape: one hash `groupBy(url)` (the families dim is a
  * broadcast join; `collect_set(family)` partial-aggregates map-side
  * into ≤ |families| elements, so the shuffle carries tiny sets, not
  * row multiplicity). No windows, no self-joins.
  */
object Disjoint {

  /** lang → script family. Langs outside the dim (zz, x!) have no
    * declared family and don't participate — unknown terms are the
    * referential check's job, mirroring the reference's
    * `VocabularyLoader.checkTerm` gate (:129).
    */
  val Families: Seq[(String, String)] = Seq(
    "en" -> "latin", "fr" -> "latin", "es" -> "latin", "de" -> "latin",
    "it" -> "latin", "pt" -> "latin", "zh" -> "cjk", "ja" -> "cjk")

  /** Declared disjoint family pairs (the `owl:disjointWith` axioms). */
  val DisjointPairs: Seq[(String, String)] = Seq(("latin", "cjk"))

  def famDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Families.toDF("lang", "family")
  }

  /** DuckDB rendering of the family dim for oracle SQL. */
  def famDimDuck: String =
    Families.map { case (l, f) => s"('$l', '$f')" }
      .mkString("SELECT * FROM (VALUES ", ", ", ") fams(lang, family)")

  private def isDisjoint(fams: org.apache.spark.sql.Column) =
    DisjointPairs.map { case (a, b) =>
      array_contains(fams, a) && array_contains(fams, b)
    }.reduce(_ || _)

  private def entityFamilies(pages: DataFrame, dim: DataFrame): DataFrame =
    pages.where(col("lang").isNotNull)
      .join(broadcast(dim), Seq("lang"))
      .groupBy(col("url"))
      .agg(collect_set(col("family")).as("fams"),
        collect_set(col("lang")).as("langs"))

  /** Whole-table verdict: 1 − disjoint-membership entities / entities. */
  def verdict(pages: DataFrame, dim: DataFrame, threshold: Double = 0.99): DataFrame =
    entityFamilies(pages, dim)
      .agg(count(lit(1)).as("n_entities"),
        sum(when(isDisjoint(col("fams")), 1L).otherwise(0L)).as("violations"))
      .select(col("n_entities"), col("violations"),
        (lit(1.0) - col("violations").cast("double") / col("n_entities").cast("double"))
          .as("value"))
      .withColumn("pass", col("value") >= threshold)

  /** Violating entities with their conflicting language sets (the
    * problem-report analog of `createProblemModel`, :154-168).
    */
  def violatingEntities(pages: DataFrame, dim: DataFrame): DataFrame =
    entityFamilies(pages, dim)
      .where(isDisjoint(col("fams")))
      .select(col("url"),
        array_join(array_sort(col("fams")), ",").as("families"),
        array_join(array_sort(col("langs")), ",").as("langs"))
      .orderBy("url")
}
