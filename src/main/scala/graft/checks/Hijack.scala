package graft.checks

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import graft.model.{CheckId, ViolationKind}

/** #13 OntologyHijacking — non-authoritative redefinition of another
  * authority's resources (`I/consistency/OntologyHijacking.java`: the
  * 19-rule definition-triple table `:52-72`, the authoritative-PLD test
  * `:143-155`, value = |1 − hijacks/possible| `:163-169`).
  *
  * Page-table analog: a "definition" is a page serving a piece of
  * content (its normalized-text fingerprint — the same content-identity
  * relation [[graft.graph.Interlinking]] builds sameAs edges from). The
  * authoritative origin of a fingerprint group is the PLD of its
  * representative (min url — the sameAs star root). A **hijack** is a
  * page on a *different* host re-serving ("redefining") content whose
  * authoritative host is known to the host dimension — the analog of
  * "the triple redefines a term that exists in a vocabulary but is
  * outside the local PLD". `possible` = all pages participating in
  * cross-host content groups (the rule-matching triples).
  *
  * Scale shapes: one groupBy on the 16-byte md5 fingerprint (the
  * corpus-scale shuffle; text never moves — only (url, fp, host)), a
  * fingerprint-keyed join back, and a broadcast join against host_dim
  * for the authority test. Group stats are fingerprint-cardinality.
  */
object Hijack {

  /** Pages decorated with (fp, host): the definition-triples relation. */
  private def defs(pages: DataFrame): DataFrame = {
    val n = graft.dedup.Dedup.normText(col("text"))
    pages.where(col("text").isNotNull)
      .select(col("url"), Referential.hostExpr.as("host"), n.as("n"))
      .where(length(col("n")) > 0 && col("host") =!= "")
      .select(col("url"), col("host"), md5(col("n")).as("fp"))
  }

  /** Cross-host fingerprint groups with their authoritative
    * representative: (fp, rep, rep_host, n_hosts>1 only).
    */
  private def crossHostGroups(d: DataFrame): DataFrame =
    d.groupBy(col("fp"))
      .agg(min(col("url")).as("rep"), countDistinct(col("host")).as("n_hosts"))
      .where(col("n_hosts") > 1)
      .withColumn("rep_host", regexp_extract(col("rep"), "^https?://([^/?]+)", 1))

  /** ONE-corpus-scan hijack statistics, per (cross-host group, host):
    * (fp, host, n, rep, rep_host, rep_known, hijack_n). The corpus
    * reduces to (fp, host, n, min_url) in the first aggregation; the
    * representative/authority resolution is a group-cardinality
    * self-aggregation + broadcast dim join — no per-page join-back, so
    * the verdict never shuffles page rows twice.
    */
  def groupHostStats(pages: DataFrame, hostDim: DataFrame): DataFrame =
    statsFromDefs(defs(pages), hostDim)

  /** [[groupHostStats]] over the suite's atoms frame: the md5
    * content fingerprint is already materialized by the one corpus
    * scan, so the family starts at the (fp, host) aggregation.
    */
  def groupHostStatsFromAtoms(atoms: DataFrame, hostDim: DataFrame): DataFrame =
    statsFromDefs(
      atoms.where(col("fp").isNotNull && col("host") =!= "")
        .select(col("url"), col("host"), col("fp")),
      hostDim)

  private def statsFromDefs(d: DataFrame, hostDim: DataFrame): DataFrame = {
    val byHost = d
      .groupBy(col("fp"), col("host"))
      .agg(count(lit(1)).as("n"), min(col("url")).as("min_url"))
    val byFp = byHost.groupBy(col("fp"))
      .agg(count(lit(1)).as("n_hosts"), min(col("min_url")).as("rep"))
      .where(col("n_hosts") > 1)
      .withColumn("rep_host", regexp_extract(col("rep"), "^https?://([^/?]+)", 1))
      .join(broadcast(hostDim.withColumnRenamed("host", "rep_host")
        .withColumn("rep_known", lit(true))), Seq("rep_host"), "left")
    byHost.join(byFp, "fp")
      .withColumn("hijack_n",
        when(col("host") =!= col("rep_host") && coalesce(col("rep_known"), lit(false)),
          col("n")).otherwise(0L))
  }

  /** Verdict from [[groupHostStats]] — identical counts to the
    * per-page [[flags]] path (possible = Σ n over cross-host group
    * members, hijacks = Σ n over wrong-host members with known
    * authority), at one corpus scan instead of scan + join-back.
    */
  def verdictFromStats(st: DataFrame, threshold: Double = 0.5): DataFrame =
    st.agg(coalesce(sum(col("n")), lit(0L)).as("n_rows"),
        coalesce(sum(col("hijack_n")), lit(0L)).as("violations"))
      .select(col("n_rows"), col("violations"),
        when(col("n_rows") === 0, 1.0)
          .otherwise(abs(lit(1.0) - col("violations").cast("double") / col("n_rows").cast("double")))
          .as("value"))
      .withColumn("pass", col("value") >= threshold)

  /** Per-page hijack flags over the rule-matching (cross-host-group)
    * pages: (url, host, rep, rep_host, rep_known, is_hijack).
    */
  def flags(pages: DataFrame, hostDim: DataFrame): DataFrame = {
    val d = defs(pages)
    val g = crossHostGroups(d)
      .join(broadcast(hostDim.withColumnRenamed("host", "rep_host")
        .withColumn("rep_known", lit(true))), Seq("rep_host"), "left")
    d.join(g, "fp")
      .withColumn("is_hijack",
        col("host") =!= col("rep_host") && coalesce(col("rep_known"), lit(false)))
  }

  /** Single-row verdict: (n_rows = possible, violations = hijacks,
    * value = |1 − hijacks/possible|, pass). Empty rule-match set →
    * value 1.0 (the reference returns 1 when possible = 0). Computed
    * from the one-scan [[groupHostStats]] path.
    */
  def verdict(pages: DataFrame, hostDim: DataFrame,
      threshold: Double = 0.5): DataFrame =
    verdictFromStats(groupHostStats(pages, hostDim), threshold)

  /** Hijacking problem rows: (url, host, rep, rep_host), ordered —
    * one per hijacking page, naming the authoritative resource it
    * redefines (the problem-model shape of
    * OntologyHijacking.createProblemModel).
    */
  def hijackPages(pages: DataFrame, hostDim: DataFrame): DataFrame =
    flags(pages, hostDim)
      .where(col("is_hijack"))
      .select(col("url"), col("host"), col("rep"), col("rep_host"))
      .orderBy("url", "rep")

  // ——— suite adapters (both derive from ONE materialized
  // group-cardinality stats frame; the suite never joins page rows) ———

  def verdictRowFromStats(st: DataFrame): DataFrame =
    verdictFromStats(st).select(
      lit(CheckId.HijackContent).as("check_id"), lit("*").as("pday"),
      col("n_rows"), col("violations"), col("value"), col("pass"))

  /** Suite problem rows, grouped per (offending host, group) — the
    * same bounded-listing shape as [[Referential.unknownHosts]]; exact
    * page counts stay in `detail`, per-page urls are [[hijackPages]]'
    * job (query surface).
    */
  def violationsFromStats(st: DataFrame): DataFrame =
    st.where(col("hijack_n") > 0)
      .select(
        lit(CheckId.HijackContent).as("check_id"),
        lit(ViolationKind.HijackedContent).as("kind"),
        lit("*").as("pday"),
        col("min_url").as("url"),
        concat(lit("host "), col("host"), lit(" redefines content of "),
          col("rep"), lit(" (authority "), col("rep_host"),
          lit(", "), col("hijack_n"), lit(" pages)")).as("detail"))
}
