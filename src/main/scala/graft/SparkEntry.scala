package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.checks._
import org.apache.spark.sql.functions.col
import graft.synth.PageSynth

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query derives the deterministic page table from
  * `<sfDir>/documents.parquet` via [[PageSynth]] and runs one check of
  * the metricsspark validation engine over it; the matching DuckDB SQL
  * in [[OracleSql]] recomputes the same result independently.
  */
object SparkEntry {

  private def pages(s: SparkSession, dir: String): DataFrame =
    PageSynth.pages(s, dir)

  /** Cluster formation shared across the `dedup_clusters` /
    * `dedup_cluster_sizes` harness queries: both derive from the same
    * [[graft.dedup.Dedup.clusterLabels]] frames, so the LSH pipeline
    * runs once per (session, dir), not once per query. The memoized
    * frames are checkpoint-backed (compact: fp/rep/n_docs/hashed
    * shingles + the label map) — no lazy plan or CacheManager entry is
    * retained.
    */
  private val dedupLabelCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), graft.dedup.Dedup.LabelsResult]()
  private def sharedClusterLabels(s: SparkSession, dir: String): graft.dedup.Dedup.LabelsResult =
    dedupLabelCache.computeIfAbsent((s, dir),
      // withSimhash: the one collapse scan also materializes the 60-bit
      // simhash per distinct text, so `dedup_simhash_pairs` reads the
      // shared groups checkpoint instead of re-scanning the corpus
      _ => graft.dedup.Dedup.clusterLabelsCounted(pages(s, dir), withSimhash = true))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    FusedChecks.resultsByDay(pages(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // whole-pipeline synthesis parity (validates every derived column
    // against the DuckDB rendering; html bytes compared via sha256 —
    // the driver's pandas sort chokes on raw bytearray columns)
    "pages_dump" -> ((s, dir) =>
      PageSynth.pagesWithMeta(s, dir)
        .select(col("doc_id"), col("url"), col("warc_epoch"), col("pday"),
          org.apache.spark.sql.functions.sha2(col("html"), 256).as("html_sha"),
          col("text"), col("lang"), col("host_id"), col("host"))
        .orderBy("doc_id")),
    // fused completeness + conformance family (one scan)
    "fused_results" -> ((s, dir) => FusedChecks.resultsByDay(pages(s, dir))),
    "fused_violations" -> ((s, dir) => FusedChecks.violations(pages(s, dir))),
    // column stats
    "stats_minmax" -> ((s, dir) => Stats.minMaxByDay(pages(s, dir))),
    "stats_distinct" -> ((s, dir) => Stats.distinctByDay(pages(s, dir))),
    "stats_approx_distinct" -> ((s, dir) => Stats.approxDistinct(pages(s, dir))),
    // uniqueness / duplicates
    "unique_url" -> ((s, dir) => Uniqueness.urlUniqueness(pages(s, dir))),
    "unique_url_groups" -> ((s, dir) => Uniqueness.duplicateUrls(pages(s, dir))),
    "dup_text_groups" -> ((s, dir) => Uniqueness.duplicateTexts(pages(s, dir))),
    "latest_snapshot" -> ((s, dir) => Uniqueness.latestSnapshot(pages(s, dir))),
    // dim→fact expected-member completeness (#3: gold members + condition op)
    "completeness_expected" -> ((s, dir) =>
      Completeness.expectedLangByDay(pages(s, dir), PageSynth.langDim(s))),
    "completeness_missing" -> ((s, dir) =>
      Completeness.missingLangMembers(pages(s, dir), PageSynth.langDim(s))),
    // exists-style boolean probes (#23 PresenceOfURIRegEx, #34/#35 accessibility)
    "exists_checks" -> ((s, dir) => Exists.results(pages(s, dir))),
    // sampled-estimate composition (#28/#32 Estimated* family)
    "est_conform_url" -> ((s, dir) => Sampling.estimatedUrlConformance(pages(s, dir))),
    // per-entity language-count distribution (#21 MultipleLanguageUsage)
    "multi_lang_usage" -> ((s, dir) => Stats.multiLangUsage(pages(s, dir))),
    // entities as members of disjoint classes (#9, collect_set shape)
    "disjoint_lang" -> ((s, dir) =>
      Disjoint.verdict(pages(s, dir), Disjoint.famDim(s))),
    "disjoint_lang_entities" -> ((s, dir) =>
      Disjoint.violatingEntities(pages(s, dir), Disjoint.famDim(s))),
    // sampled disjoint composition (#10: check over the entity-keyed
    // uniform sample)
    "est_disjoint_lang" -> ((s, dir) =>
      Disjoint.estimatedVerdict(pages(s, dir), Disjoint.famDim(s))),
    // #7 domain/range two-pass: entity→type map, then every row checked
    // against its host's declared domain through the subClassOf* closure
    "domain_range" -> ((s, dir) =>
      DomainRange.verdict(pages(s, dir), DomainRange.hostDomainDim(s), Disjoint.famDim(s))),
    "domain_range_usages" -> ((s, dir) =>
      DomainRange.usages(pages(s, dir), DomainRange.hostDomainDim(s), Disjoint.famDim(s))),
    // #8's estimated variant over the entity-keyed sample
    "est_domain_range" -> ((s, dir) =>
      DomainRange.estimatedVerdict(pages(s, dir), DomainRange.hostDomainDim(s), Disjoint.famDim(s))),
    // referential vs dimension snapshots
    "ref_host_day" -> ((s, dir) =>
      Referential.hostCheckByDay(pages(s, dir), PageSynth.hostDim(s))),
    "ref_host_unknown" -> ((s, dir) =>
      Referential.unknownHosts(pages(s, dir), PageSynth.hostDim(s))),
    "ref_lang_day" -> ((s, dir) =>
      Referential.langCheckByDay(pages(s, dir), PageSynth.langDim(s))),
    "ref_lang_unknown" -> ((s, dir) =>
      Referential.unknownLangs(pages(s, dir), PageSynth.langDim(s))),
    // distribution drift (typed-Aggregator histograms + KS/PSI)
    "drift_lang_hist" -> ((s, dir) => Drift.langHistogram(pages(s, dir))),
    "drift_lang_psi" -> ((s, dir) => Drift.langPsi(pages(s, dir))),
    "drift_hour_ks" -> ((s, dir) => Drift.hourKs(pages(s, dir))),
    // deterministic sampling (#29/#30: proportional-with-cap and
    // equal-allocation stratified variants)
    "sample_uniform" -> ((s, dir) => Sampling.uniformSampleStats(pages(s, dir))),
    "sample_stratified_alloc" -> ((s, dir) => Sampling.stratifiedAllocation(pages(s, dir))),
    "sample_stratified_rows" -> ((s, dir) => Sampling.stratifiedSample(pages(s, dir))),
    "sample_stratified_equal_alloc" -> ((s, dir) => Sampling.stratifiedEqualAllocation(pages(s, dir))),
    "sample_stratified_equal_rows" -> ((s, dir) => Sampling.stratifiedSampleEqual(pages(s, dir))),
    // sampled composition over the expensive derivation check (#32)
    "est_declared_vs_derived" -> ((s, dir) => Sampling.estimatedDeclaredVsDerived(pages(s, dir))),
    // #33: the stratified composition — equal-allocation sample ×
    // declared-vs-derived, scaled per host
    "est_declared_vs_derived_stratified" -> ((s, dir) =>
      Sampling.estimatedDeclaredVsDerivedStratified(pages(s, dir))),
    // vocabulary-dimension checks (#14 deprecated, #18 reuse, #24 usage
    // indication): broadcast dims, tag-cardinality aggregations
    "deprecated_terms" -> ((s, dir) =>
      Vocabulary.deprecatedByDay(pages(s, dir), Vocabulary.deprecatedDim(s))),
    "deprecated_usages" -> ((s, dir) =>
      Vocabulary.deprecatedUsages(pages(s, dir), Vocabulary.deprecatedDim(s))),
    "reuse_terms" -> ((s, dir) => Vocabulary.reuseTerms(pages(s, dir))),
    "reuse_unused_suggested" -> ((s, dir) => Vocabulary.unusedSuggested(pages(s, dir))),
    "vocab_usage" -> ((s, dir) =>
      Vocabulary.vocabUsage(pages(s, dir), PageSynth.langDim(s))),
    // #13 OntologyHijacking analog: cross-host content redefinition vs
    // the authoritative (representative) PLD
    "hijack_verdict" -> ((s, dir) =>
      Hijack.verdict(pages(s, dir), PageSynth.hostDim(s))),
    "hijack_pages" -> ((s, dir) =>
      Hijack.hijackPages(pages(s, dir), PageSynth.hostDim(s))),
    // #11 misplaced terms: known term of the wrong kind in a position
    "misplaced_terms" -> ((s, dir) =>
      Vocabulary.misplacedByDay(pages(s, dir), Vocabulary.termDim(s))),
    "misplaced_usages" -> ((s, dir) =>
      Vocabulary.misplacedUsages(pages(s, dir), Vocabulary.termDim(s))),
    // #20 serialisation-format registry counts (Integer metric)
    "serial_formats" -> ((s, dir) =>
      Formats.formatCounts(pages(s, dir), Formats.formatDim(s))),
    "serial_formats_count" -> ((s, dir) =>
      Formats.formatsCount(pages(s, dir), Formats.formatDim(s))),
    // #37 licensing banks: machine-readable value + human phrase bank +
    // copyleft classifier
    "license_host_flags" -> ((s, dir) => Licensing.hostFlags(pages(s, dir))),
    "license_verdict" -> ((s, dir) => Licensing.verdict(pages(s, dir))),
    "license_models" -> ((s, dir) => Licensing.models(pages(s, dir))),
    // per-group provenance flags (#25/#26 groupBy(host).agg(max(flag)))
    "prov_host_flags" -> ((s, dir) => Provenance.hostFlags(pages(s, dir))),
    "prov_verdict" -> ((s, dir) => Provenance.verdict(pages(s, dir))),
    // multimodal binary-column plumbing + byte-identity invariant
    "mm_html_meta" -> ((s, dir) => graft.multimodal.Multimodal.htmlMeta(pages(s, dir))),
    "mm_html_digests" -> ((s, dir) => graft.multimodal.Multimodal.htmlDigests(pages(s, dir))),
    // per-payload feature extraction (mapPartitions decode seam);
    // all-integer byte-histogram profile, value-oracled via hex nibbles
    "mm_features" -> ((s, dir) => graft.multimodal.Features.featuresByDay(pages(s, dir))),
    // text analysis
    "text_tokens" -> ((s, dir) => graft.text.TextOps.tokenStatsByDay(pages(s, dir))),
    "text_quality" -> ((s, dir) => graft.text.TextOps.qualityByDay(pages(s, dir))),
    "text_langid" -> ((s, dir) => graft.text.TextOps.langConfusion(pages(s, dir))),
    "text_declared_vs_derived" -> ((s, dir) => graft.text.TextOps.declaredVsDerived(pages(s, dir))),
    "text_fingerprint_groups" -> ((s, dir) => graft.text.TextOps.fingerprintGroups(pages(s, dir))),
    // near-duplicate detection (LSH over collapsed distinct-text
    // groups; full DuckDB value oracles — both engines hash via md5)
    "dedup_minhash_pairs" -> ((s, dir) => sharedClusterLabels(s, dir).pairs),
    "dedup_simhash_pairs" -> ((s, dir) =>
      graft.dedup.Dedup.simhashPairsFromGroups(sharedClusterLabels(s, dir).groups)),
    "dedup_clusters" -> ((s, dir) => {
      val r = sharedClusterLabels(s, dir)
      graft.dedup.Dedup.clustersFrom(pages(s, dir), r.groups, r.labels)
    }),
    "dedup_cluster_sizes" -> ((s, dir) => {
      val r = sharedClusterLabels(s, dir)
      graft.dedup.Dedup.clusterSizesFrom(r.groups, r.labels)
    }),
    // similarity search over embeddings (+ injected near-dup copies)
    "knn_brute" -> ((s, dir) => {
      val v = graft.synth.EmbSynth.vectors(s, dir)
      graft.sim.Similarity.knnBrute(v, v.where(col("vec_id") < 10))
    }),
    "knn_lsh" -> ((s, dir) => {
      val v = graft.synth.EmbSynth.vectors(s, dir)
      graft.sim.Similarity.knnLsh(v, v.where(col("vec_id") < 10))
    }),
    // IVF-Flat ANN (coarse-quantizer scale path: cell-pruned candidate
    // scan, corpus never shuffled; quantizer = deterministic k-means,
    // re-trained by the oracle in SQL)
    "knn_ivf" -> ((s, dir) => {
      val v = graft.synth.EmbSynth.vectors(s, dir)
      graft.sim.Similarity.knnIvfTrained(v, v.where(col("vec_id") < 10))
    }),
    "emb_near_dup" -> ((s, dir) =>
      graft.sim.Similarity.nearDupPairs(graft.synth.EmbSynth.vectors(s, dir))),
    // graph / interlinking analysis (MapDBGraph sameAs + degree/neighbor
    // query analog): content-identity star edges + host adjacency
    "graph_sameas_edges" -> ((s, dir) => graft.graph.Interlinking.sameAsEdges(pages(s, dir))),
    "graph_host_neighbors" -> ((s, dir) => graft.graph.Interlinking.hostNeighbors(pages(s, dir))),
    // whole-pipeline: write Iceberg-shaped table + full resumable suite
    "suite_verdicts" -> ((s, dir) => graft.runtime.SuiteRunner.verdicts(s, dir)),
    // skew-safe two-phase (salted) host aggregation; oracle = unsalted SQL
    "salted_host_profile" -> ((s, dir) => Salting.hostProfile(pages(s, dir)))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    OracleSql.all - "stats_approx_distinct" // HLL++ values are engine-specific
}
