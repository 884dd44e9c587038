package graft.checks

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  * Scale shape: the per-entity "class set" is a **long bitmask**
  * aggregated with `bit_or` — a codegen'd primitive hash aggregate over
  * one groupBy(url), not a `collect_set` object aggregate (which
  * measured 146 s vs seconds at 96M rows). The families dim is a
  * broadcast join; the human-readable family/lang sets are only
  * reconstructed for the (tiny) violating subset via a broadcast
  * semi-join back to the corpus.
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

  /** Family hierarchy: `rdfs:subClassOf` edges (family → parent class).
    * The taxonomy here is script → writing-system macro-class; the
    * declared `owl:disjointWith` axiom lives at the TOP of the
    * hierarchy only, so base-family disjointness is *inherited* through
    * the closure — the reference resolves exactly this via the
    * subClassOf* closure query (U/commons/VocabularyLoader.java:755-786)
    * feeding the disjointWith closure (:888-912), and
    * AdvancedEntitiesAsMembersOfDisjointClasses.java:115-149 flags
    * entities whose type sets intersect the CLOSED pair set.
    */
  val SubClassOf: Seq[(String, String)] = Seq(
    "latin" -> "alphabetic", "cjk" -> "logographic")

  /** Declared `owl:disjointWith` axioms — top-of-hierarchy classes only;
    * nothing directly declares latin ⟂ cjk.
    */
  val DeclaredDisjoint: Seq[(String, String)] = Seq(("alphabetic", "logographic"))

  /** Reflexive-transitive ancestor set under `subClassOf` (the
    * subClassOf* closure; multi-parent edges supported).
    */
  private[graft] def ancestors(f: String, subClassOf: Seq[(String, String)]): Set[String] = {
    val up = subClassOf.groupMap(_._1)(_._2)
    @annotation.tailrec
    def walk(frontier: Set[String], seen: Set[String]): Set[String] =
      if (frontier.isEmpty) seen
      else {
        val next = frontier.flatMap(up.getOrElse(_, Nil)) -- seen
        walk(next, seen ++ next)
      }
    walk(Set(f), Set(f))
  }

  /** Disjoint closure over base families: (f, g) is effectively disjoint
    * iff some declared pair (a, b) has a ∈ anc*(f) and b ∈ anc*(g) (or
    * swapped) — disjointness of ancestors is inherited by every
    * descendant pair. Materialized offline (driver-side, the dim is
    * tiny) — the Spark-side check machinery consumes only the closed
    * pair set, exactly like the reference materializes the closure into
    * its vocabulary cache before streaming quads.
    */
  private[graft] def closedDisjointPairs(base: Seq[String],
      subClassOf: Seq[(String, String)],
      declared: Seq[(String, String)]): Seq[(String, String)] = {
    val anc = base.map(f => f -> ancestors(f, subClassOf)).toMap
    for {
      (f, i) <- base.zipWithIndex
      g <- base.drop(i + 1)
      if declared.exists { case (a, b) =>
        (anc(f)(a) && anc(g)(b)) || (anc(g)(a) && anc(f)(b))
      }
    } yield (f, g)
  }

  /** Effective disjoint base-family pairs: the declared axioms pushed
    * down through the subClassOf* closure. With the default taxonomy
    * this yields (latin, cjk) — reachable only via the inherited
    * (alphabetic, logographic) axiom.
    */
  val DisjointPairs: Seq[(String, String)] =
    closedDisjointPairs(Families.map(_._2).distinct, SubClassOf, DeclaredDisjoint)

  /** Stable family → bit assignment (declaration order). */
  val FamilyBit: Map[String, Long] =
    Families.map(_._2).distinct.zipWithIndex
      .map { case (f, i) => f -> (1L << i) }.toMap

  def famDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Families.map { case (l, f) => (l, f, FamilyBit(f)) }
      .toDF("lang", "family", "fam_bit")
  }

  /** DuckDB rendering of the family dim for oracle SQL. */
  def famDimDuck: String =
    Families.map { case (l, f) => s"('$l', '$f')" }
      .mkString("SELECT * FROM (VALUES ", ", ", ") fams(lang, family)")

  private def maskDisjoint(mask: Column): Column =
    DisjointPairs.map { case (a, b) =>
      (mask.bitwiseAND(lit(FamilyBit(a))) =!= 0L) &&
        (mask.bitwiseAND(lit(FamilyBit(b))) =!= 0L)
    }.reduce(_ || _)

  /** Per-entity family bitmask — the one corpus-scale aggregation of
    * this check (primitive `bit_or` hash agg). The entity key is a
    * **128-bit** pair of independent xxhash64 values (plain + seeded) —
    * the same small-key trade [[Uniqueness]] makes (the shuffle carries
    * 16 bytes instead of url strings; measured 156 s → seconds at 96M
    * rows), but collision-safe at design scale: a single 64-bit key at
    * 10^12 entities expects tens of thousands of colliding pairs, each
    * of which would merge two urls' masks and mint spurious disjoint
    * verdicts with no exact-recovery step to catch them; at 128 bits
    * the expectation is ~1e-14. The violating urls are recovered
    * afterwards by a broadcast semi-join on the (tiny) flagged key set.
    * Callers needing both the verdict and the violation listing
    * (CheckSuite) persist this frame and pass it to [[verdictFrom]] /
    * [[violatingFrom]].
    */
  def entityMasks(pages: DataFrame, dim: DataFrame): DataFrame =
    pages.where(col("lang").isNotNull)
      .join(broadcast(dim.select("lang", "fam_bit")), Seq("lang"))
      .groupBy(xxhash64(col("url")).as("url_h"),
        xxhash64(lit(1L), col("url")).as("url_h2"))
      .agg(bit_or(col("fam_bit")).as("fam_mask"))

  /** Whole-table verdict from a pre-built mask frame. */
  def verdictFrom(masks: DataFrame, threshold: Double = 0.99): DataFrame =
    masks
      .agg(count(lit(1)).as("n_entities"),
        sum(when(maskDisjoint(col("fam_mask")), 1L).otherwise(0L)).as("violations"))
      .select(col("n_entities"), col("violations"),
        (lit(1.0) - col("violations").cast("double") / col("n_entities").cast("double"))
          .as("value"))
      .withColumn("pass", col("value") >= threshold)

  /** Violating entities with their conflicting family/language sets
    * (the problem-report analog of `createProblemModel`, :154-168).
    * The disjoint urls are a broadcast-scale set, so the readable
    * listing re-reads only their rows (broadcast semi-join) and
    * collect_set runs on the tiny subset.
    */
  def violatingFrom(pages: DataFrame, dim: DataFrame, masks: DataFrame): DataFrame = {
    val bad = masks.where(maskDisjoint(col("fam_mask"))).select("url_h", "url_h2")
    pages.where(col("lang").isNotNull)
      .withColumn("url_h", xxhash64(col("url")))
      .withColumn("url_h2", xxhash64(lit(1L), col("url")))
      .join(broadcast(bad), Seq("url_h", "url_h2"), "left_semi")
      .join(broadcast(dim.select("lang", "family")), Seq("lang"))
      .groupBy(col("url"))
      .agg(collect_set(col("family")).as("fams"),
        collect_set(col("lang")).as("langs"))
      .select(col("url"),
        array_join(array_sort(col("fams")), ",").as("families"),
        array_join(array_sort(col("langs")), ",").as("langs"))
      .orderBy("url")
  }

  /** Whole-table verdict: 1 − disjoint-membership entities / entities. */
  def verdict(pages: DataFrame, dim: DataFrame, threshold: Double = 0.99): DataFrame =
    verdictFrom(entityMasks(pages, dim), threshold)

  /** Sampled composition (#10 EstimateSimpleEntities…: the disjoint
    * check over the deterministic uniform sample). The sample key is
    * md5(url) — the *entity* key — so every snapshot of a sampled url
    * is in, none of an unsampled one: the entity's full family set is
    * observed, making the sampled ratio an unbiased estimate of the
    * entity-level metric (a row-level sample would see partial family
    * sets and systematically under-count conflicts). Output
    * (n_entities, violations, value, pass) over the ~20% entity
    * sample; audit rows flag `estimate=true` via the est_ prefix.
    */
  def estimatedVerdict(pages: DataFrame, dim: DataFrame,
      threshold: Double = 0.99, threshold256: Int = 51): DataFrame =
    verdictFrom(
      entityMasks(pages.where(expr(Sampling.U256Sql) < threshold256), dim),
      threshold)

  /** Violating entities with their conflicting language sets. */
  def violatingEntities(pages: DataFrame, dim: DataFrame): DataFrame =
    violatingFrom(pages, dim, entityMasks(pages, dim))
}
