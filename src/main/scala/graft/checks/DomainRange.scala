package graft.checks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** #7 UsageOfIncorrectDomainOrRangeDatatypes — the reference's hardest
  * consistency shape (I/consistency/UsageOfIncorrectDomainOrRangeDatatypes.java:120-190):
  * pass 1 builds an entity→type map from the type triples; pass 2
  * checks every non-type triple against its property's declared
  * domain/range, widened through the subClassOf* closure.
  *
  * Page-table analog: an entity is a url and its "types" are the script
  * families of its observed languages (exactly [[Disjoint]]'s typing);
  * the "property" is the host a url is served from, and each host_dim
  * member declares an expected DOMAIN class — at the macro-class level
  * of the [[Disjoint.SubClassOf]] taxonomy, so membership is reachable
  * only through the closure (latin content satisfies an 'alphabetic'
  * domain because latin ⊑ alphabetic, never directly). A row violates
  * when its url's full type set has no family whose ancestor closure
  * contains the host's declared domain.
  *
  * Scale shape: pass 1 is [[Disjoint.entityMasks]] — one bit_or hash
  * aggregate over 128-bit url keys; pass 2 re-keys the corpus rows by
  * the same 16-byte keys and shuffle-joins them to the (entity-
  * cardinality) mask frame — the typed-subset self-join — with the
  * domain dim broadcast. Counting is per ROW (the reference counts
  * predicates assessed, not entities).
  */
object DomainRange {

  /** Declared domain class per host: most hosts expect 'alphabetic'
    * content (satisfied by any latin-family language via the closure);
    * every (host_id % 10 == 7) host expects 'logographic' (cjk).
    */
  val CjkDomainMod = 10L
  val CjkDomainRem = 7L

  /** allowed-families bitmask for a domain class: families whose
    * subClassOf* closure contains it (driver-side over the tiny
    * taxonomy, like the reference's materialized vocabulary closure).
    */
  private[graft] def allowedMask(domainClass: String): Long =
    Disjoint.Families.map(_._2).distinct
      .filter(f => Disjoint.ancestors(f, Disjoint.SubClassOf).contains(domainClass))
      .map(Disjoint.FamilyBit)
      .foldLeft(0L)(_ | _)

  /** (host, domain_class, allowed_mask) — broadcast-size dim. */
  def hostDomainDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val hostId = regexp_extract(col("host"), "^h([0-9]{3})\\.", 1).cast("long")
    graft.synth.PageSynth.hostDim(spark)
      .withColumn("domain_class",
        when(pmod(hostId, lit(CjkDomainMod)) === CjkDomainRem, "logographic")
          .otherwise("alphabetic"))
      .withColumn("allowed_mask",
        when(col("domain_class") === "logographic", allowedMask("logographic"))
          .otherwise(allowedMask("alphabetic")))
  }

  /** Pass-2 row frame: every (url, host) row carrying its entity's full
    * family mask and its host's allowed mask. `viol` = the type set
    * never reaches the declared domain through the closure.
    */
  private def joined(pages: DataFrame, domainDim: DataFrame,
      masks: DataFrame): DataFrame =
    pages.where(col("lang").isNotNull)
      .withColumn("host", Referential.hostExpr)
      .where(col("host") =!= "")
      .join(broadcast(domainDim.select("host", "domain_class", "allowed_mask")), Seq("host"))
      .withColumn("url_h", xxhash64(col("url")))
      .withColumn("url_h2", xxhash64(lit(1L), col("url")))
      .join(masks, Seq("url_h", "url_h2"))
      .withColumn("viol", (col("fam_mask").bitwiseAND(col("allowed_mask"))) === 0L)

  /** Whole-table verdict: (n_rows = assessed rows, violations, value,
    * pass). Rows with unknown hosts or un-famed languages are not
    * applicable (the referential checks own those).
    */
  def verdict(pages: DataFrame, domainDim: DataFrame, famDim: DataFrame,
      threshold: Double = 0.8): DataFrame = {
    val masks = Disjoint.entityMasks(pages, famDim)
    joined(pages, domainDim, masks)
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("viol"), 1L).otherwise(0L)).as("violations"))
      .select(col("n_rows"), col("violations"),
        when(col("n_rows") === 0, 1.0).otherwise(
          lit(1.0) - col("violations").cast("double") / col("n_rows").cast("double"))
          .as("value"))
      .withColumn("pass", col("value") >= threshold)
  }

  /** Grouped problem bag (the createProblemModel analog, bounded by
    * host cardinality): per host, the violating usage count, distinct
    * violating urls, and a representative url.
    */
  def usages(pages: DataFrame, domainDim: DataFrame, famDim: DataFrame): DataFrame = {
    val masks = Disjoint.entityMasks(pages, famDim)
    joined(pages, domainDim, masks)
      .where(col("viol"))
      .groupBy(col("host"), col("domain_class"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("url")).as("n_urls"),
        min(col("url")).as("min_url"))
      .orderBy("host")
  }

  /** #8's estimated variant: the same two-pass check over the
    * deterministic md5(url) entity sample — entity-keyed, like
    * [[Disjoint.estimatedVerdict]], so every sampled url contributes
    * its FULL type set and the sampled ratio is unbiased.
    */
  def estimatedVerdict(pages: DataFrame, domainDim: DataFrame, famDim: DataFrame,
      threshold: Double = 0.8, threshold256: Int = 51): DataFrame =
    verdict(pages.where(expr(Sampling.U256Sql) < threshold256),
      domainDim, famDim, threshold)
}
