package graft.runtime

import org.apache.spark.sql.{DataFrame, SparkSession, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.checks._
import graft.model.CheckId

/** End-to-end constraint-suite runner with audit-table resume.
  *
  * Execution model (the Spark re-expression of the reference's
  * assessment lifecycle, SURVEY §3.1):
  *
  *  1. read the audit table → set of (check, pday) already assessed for
  *     this run_id;
  *  2. scan only the remaining partitions (partition-pruned read — the
  *     analog of Luzzu's resume caches,
  *     utilities/.../cache/LinkedDataMetricsCacheManager.java:25-26);
  *  3. per-partition checks write one verdict row per (check, pday):
  *     the fused predicate family (conformance + completeness-stats +
  *     referential + text quality + declared-vs-derived) runs in ONE
  *     scan; the expected-member completeness and the sampled-estimate
  *     check are two more tiny aggregations over the same batch;
  *  4. whole-table checks (uniqueness, exact-dup text, drift, exists
  *     probes) run once under pday='*' with the final batch — including
  *     their violation listings, so an interrupted+resumed run emits
  *     whole-table violations exactly once;
  *  5. results + violations are written first, the audit rows **last**
  *     — a partition is only "done" once its outputs are durable
  *     (SURVEY §7.3 #5).
  *
  * Violations are capped at [[CheckSuite.MaxViolationRows]] per
  * (check, pday) — the reference bounds every problem collection the
  * same way (e.g. representational/.../ShortURIs.java:47's LRU) —
  * deterministically: the cap keeps the first `cap` rows in (url,
  * detail) order via a salted two-phase rank, so no single reducer ever
  * sorts a whole check's violations. Exact totals stay in the verdicts.
  */
class CheckSuite(spark: SparkSession, tableRoot: String) {

  private val auditPath = s"$tableRoot/audit"
  private val resultsPath = s"$tableRoot/results"
  private val violationsPath = s"$tableRoot/violations"

  def auditTable: DataFrame =
    if (new java.io.File(auditPath).exists())
      spark.read.parquet(auditPath)
    else spark.emptyDataFrame

  /** Violation log for a run, deduplicated on read: a crash between the
    * violations write and the audit write makes the resumed run re-emit
    * the same (deterministic) rows, so distinct is exact.
    */
  def violationsTable(runId: String): DataFrame =
    spark.read.parquet(violationsPath)
      .where(col("run_id") === runId)
      .distinct()

  /** Partitions already fully assessed for `runId` (a partition is done
    * when every per-day check has an audit row for it).
    */
  def donePartitions(runId: String): Set[String] = {
    val audit = auditTable
    if (audit.isEmpty) Set.empty
    else audit.where(col("run_id") === runId && col("pday") =!= "*")
      .groupBy("pday").agg(countDistinct("check_id").as("n"))
      .where(col("n") >= CheckSuite.PerDayCheckCount)
      .collect().map(_.getString(0)).toSet
  }

  // env-gated phase timer (SPARK_GRAFT_PROFILE=1): finds serial tails
  // without touching the benched path when off
  private def phase[A](name: String)(f: => A): A =
    if (sys.env.get("SPARK_GRAFT_PROFILE").isEmpty) f
    else {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[suite-phase] $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

  /** Run (or resume) the suite. `maxPartitions` bounds how many
    * partitions this invocation assesses (micro-batch / incremental
    * mode; also the test hook for resume). Whole-table checks run with
    * the final batch. Returns the verdict table for this run.
    */
  def run(runId: String, dims: Dims = Dims.default(spark),
      maxPartitions: Option[Int] = None,
      embeddings: Option[DataFrame] = None): DataFrame = {
    val all = phase("list_partitions")(PageTable.partitions(tableRoot))
    val done = phase("done_partitions")(donePartitions(runId))
    val pending = all.filterNot(done).sorted
    val remaining = maxPartitions.fold(pending)(pending.take)
    val isFinalBatch = remaining.size == pending.size

    if (remaining.nonEmpty) {
      // partition-pruned scan: only un-assessed partitions are read
      val pages = PageTable.read(spark, tableRoot)
        .where(col("pday").isin(remaining: _*))
        .drop("pday")

      // ONE corpus scan for EVERYTHING: broadcast-join the dimension
      // snapshots, derive the text columns once, fold the predicate
      // bank into two long bitmasks (FusedChecks.maskFrame — the
      // verdict agg is pure bit-math; the round-2 profile measured ~12
      // heavy re-evaluations per row on the naive fused spelling), then
      // reduce every row to the narrow checkpointed "atoms" projection
      // ([[Atoms.frame]], ~100 B/row). The per-day fused aggregate, the
      // batch violation listing AND every whole-table family aggregate
      // the atoms blocks — round 4 paid ~10-12 independent corpus-scale
      // scans in the concurrent phase; this pays one.
      val joined = CheckSuite.joinDims(pages, dims)
      val allPreds = Conformance.preds ++ CheckSuite.refPreds ++ graft.text.TextOps.preds
      val atoms = Atoms.frame(joined, allPreds).localCheckpoint(false)
      // Both sampled-estimate families ride the per-day aggregate as
      // extra counter columns — one atoms pass for the whole per-day
      // family, not one per estimate. The 47-row wide frame is lazily
      // checkpointed: materialized once, then every consumer reads it.
      val wide = FusedChecks.wideByDay(atoms, allPreds,
          Sampling.estUrlAggsAtoms() ++ Sampling.estDeclaredAggsAtoms())
        .localCheckpoint(false)
      val fusedByDay = FusedChecks.resultsFromWide(wide, allPreds)

      // expected-member completeness stays its own tiny aggregation
      // (different grouping); the estimates come from `wide`
      val completeness = Completeness.verdictRows(atoms, dims.langDim)
      val estimated = Sampling.estRowsFromWide(wide, CheckId.EstUrlConformance,
        "estu_n", "estu_s", "estu_b", Conformance.byId("conform_url").threshold)
      val estDeclared = Sampling.estRowsFromWide(wide, CheckId.EstDeclaredVsDerived,
        "estd_n", "estd_s", "estd_b", 0.5)
      val perDay = fusedByDay.unionByName(completeness).unionByName(estimated)
        .unionByName(estDeclared)

      val batchViol =
        FusedChecks.violationsFromMasks(atoms, allPreds, ordered = false)
          .unionByName(Completeness.missingLangMembers(atoms, dims.langDim))

      // whole-table checks (full table, keyed pday='*') with the final
      // batch only — they are not per-partition decomposable. Their
      // violation listings run here too (once per run, not per batch —
      // url uniqueness is a whole-table property, so per-batch listings
      // would silently drop groups that straddle batches).
      // Whole-table checks are INDEPENDENT jobs — they run concurrently
      // (Spark schedules jobs submitted from multiple threads into the
      // same pool of task slots). Serially, each job's stage tails and
      // driver gaps idle most cores, and that idle time is exactly what
      // the N→4N scaling efficiency pays for: the more cores, the larger
      // the share of wall-clock the serial chain wastes. Total work is
      // unchanged, so the saturated low-core level is unaffected.
      // the per-day (batch) violation listing is independent of every
      // whole-table job — in the final batch its write joins the
      // concurrent phase instead of serializing after it. Capping the
      // batch and whole-table listings separately is exact: their
      // (check_id, pday) key spaces are disjoint (per-day ids never
      // carry pday='*').
      val violBatchRun = CheckSuite
        .capViolations(batchViol, CheckSuite.MaxViolationRows)
        .withColumn("run_id", lit(runId))

      // per-check audit params overrides (e.g. LSH capped-bucket counts —
      // a reduced-recall run must be distinguishable in the audit table,
      // not just in driver stderr)
      var capParams = Map.empty[String, String]
      val (results, wholeViolOpt) = if (isFinalBatch) {
        import scala.concurrent.{Await, Future, Promise}
        import scala.concurrent.duration.Duration
        implicit val ec: scala.concurrent.ExecutionContext = CheckSuite.SuiteEc
        // fail-fast: the first failed family aborts the phase at the
        // NEXT await and cancels sibling jobs. Without it, a failure in
        // a late-awaited future surfaced only after the earlier Awaits
        // while sibling daemon threads kept appending parquet for a run
        // whose results/audit would never land.
        val failP = Promise[Nothing]()
        failP.future.failed.foreach { e =>
          System.err.println(s"[suite] whole-table phase failed, cancelling sibling jobs: $e")
          spark.sparkContext.cancelAllJobs()
        }
        def track[A](body: => A): Future[A] = {
          val f = Future(body)
          f.failed.foreach(e => failP.tryFailure(e))
          f
        }
        def await[A](f: Future[A]): A =
          Await.result(Future.firstCompletedOf(Seq(f, failP.future)), Duration.Inf)
        def snap(df: DataFrame): DataFrame = df.localCheckpoint(true)
        // violation listings are capped per family BEFORE the eager
        // checkpoint (key spaces are disjoint across families, so
        // per-family capping is exact): on a duplicate-heavy corpus the
        // uncapped listing is corpus-scale, and materializing it just to
        // throw most of it away at write time stored corpus-scale blocks.
        // Single-key cap (not the windowed capViolations): a family
        // listing has ONE (check_id, pday) pair, both literals — the
        // optimizer folds literal partition keys out of the window spec,
        // so the round-5 plans ran a GLOBAL single-partition window
        // (sort of the whole listing in one task — the exact straggler
        // the salted two-phase was built to avoid). sort+limit plans as
        // a distributed top-k instead: a bounded heap per partition, one
        // merge of ≤ cap·partitions pre-limited rows.
        def cappedSnap(df: DataFrame): DataFrame =
          snap(CheckSuite.capViolationsSingleKey(df, CheckSuite.MaxViolationRows))
        // raw corpus: read ONLY by the near-dup shingling pipeline
        // (which needs the text bytes); every other family reads atoms
        val full = PageTable.read(spark, tableRoot).drop("pday")
        // fresh complete run (the common, benched path): the batch IS
        // the table, so the whole-table families share the batch atoms.
        // Resumed final batch: the batch is a subset — build full-table
        // atoms for the whole-table families (one extra corpus scan,
        // paid only on resume).
        val wholeAtoms =
          if (done.isEmpty) atoms
          else Atoms.frame(CheckSuite.joinDims(full, dims), allPreds)
            .localCheckpoint(false)
        // Materialize the atoms checkpoint FIRST — this is THE corpus
        // scan (fully parallel); everything after it aggregates local
        // checkpoint blocks. Launching the families concurrently over a
        // still-lazy checkpoint would compute the scan once per racing
        // job.
        phase("atoms_scan") { atoms.count(); () }
        if (sys.env.contains("SPARK_GRAFT_PROFILE")) {
          // diagnosis: a warm re-count of a materialized checkpoint is
          // near-free; a slow second count means the blocks never landed
          phase("atoms_recount") { atoms.count(); () }
          System.err.println("[suite-phase] storage: " +
            spark.sparkContext.getRDDStorageInfo.map(i =>
              s"rdd${i.id}:${i.numCachedPartitions}/${i.numPartitions} mem=${i.memSize} disk=${i.diskSize}").mkString(" "))
        }
        if (!(wholeAtoms eq atoms)) phase("atoms_full_scan") { wholeAtoms.count(); () }
        // one groupBy(url-hash-pair) bit_or shuffle serves both the
        // disjoint verdict and its violation listing; the per-host flag
        // frame serves the provenance verdict + listing. Both are
        // unpersisted as soon as their family future has materialized
        // its (tiny, checkpointed) verdict + listing frames.
        val disjointMasks = Disjoint.entityMasks(wholeAtoms, dims.famDim)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val provFlags = Provenance.hostFlagsFromAtoms(wholeAtoms)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // Every whole-table family materializes its verdict + listing
        // as a tiny checkpointed frame INSIDE the concurrent phase —
        // after the joins below, assembling results/violations touches
        // no corpus-scale plan, so the post-phase tail is near zero.
        val fWide = track(phase("perday_agg") { wide.count(); () })
        val fCompl = track(phase("completeness_agg")(snap(completeness)))
        val fDrift = track(phase("drift_collect")(Drift.combined(wholeAtoms)))
        val fExists = track(phase("exists_probes")(Exists.verdictRowsFromAtoms(wholeAtoms)))
        val fUniqV = track(phase("uniq_verdict")(snap(
          Uniqueness.urlUniqueness(wholeAtoms).select(
            lit(CheckId.UrlUniqueness).as("check_id"), lit("*").as("pday"),
            col("n_rows"), col("dup_rows").as("violations"), col("value"),
            (col("value") >= 0.99).as("pass")))))
        val fUniqViol = track(phase("uniq_dup_hashes")(cappedSnap(
          Uniqueness.violations(wholeAtoms, ordered = false))))
        val fDupTextV = track(phase("duptext_verdict")(snap(
          CheckSuite.dupTextVerdictFromAtoms(wholeAtoms))))
        val fDupTextViol = track(phase("duptext_viol")(cappedSnap(
          CheckSuite.dupTextViolationsFromAtoms(wholeAtoms))))
        val fDisjoint = track(phase("disjoint_family") {
          disjointMasks.count()
          val v = snap(Disjoint.verdictFrom(disjointMasks).select(
            lit(CheckId.DisjointLang).as("check_id"), lit("*").as("pday"),
            col("n_entities").as("n_rows"), col("violations"), col("value"),
            col("pass")))
          val viol = cappedSnap(CheckSuite.disjointViolations(wholeAtoms, dims.famDim, disjointMasks))
          disjointMasks.unpersist()
          (v, viol)
        })
        val fProvF = track(phase("prov_family") {
          provFlags.count()
          val v = snap(Provenance.verdictFrom(provFlags).select(
            lit(CheckId.ProvHostFlags).as("check_id"), lit("*").as("pday"),
            col("n_rows"), col("violations"), col("value"), col("pass")))
          val viol = cappedSnap(Provenance.violationsFrom(provFlags))
          provFlags.unpersist()
          (v, viol)
        })
        val fNd = track(phase("neardup_pipeline") {
          val r = graft.dedup.Dedup.clusterLabelsCounted(full)
          val sizes = snap(graft.dedup.Dedup.clusterSizesFrom(r.groups, r.labels))
          (snap(CheckSuite.nearDupVerdict(r.groups, sizes)),
            cappedSnap(CheckSuite.nearDupViolations(sizes)), r.cappedBuckets)
        })
        // #1's analog over the embedding corpus: hyperplane-LSH pairs →
        // connected components → verdict + per-cluster problem bag, the
        // same value/violation shape as near_dup_text
        // #18 + #24 share one tag-cardinality distinct-terms frame
        val fVocabFam = track(phase("vocab_family") {
          val used = Vocabulary.usedTermsFrame(wholeAtoms).localCheckpoint(true)
          (snap(Vocabulary.reuseVerdictRow(used)),
            snap(Vocabulary.vocabUsageVerdictRow(used, dims.langDim)),
            cappedSnap(Vocabulary.reuseViolations(used)))
        })
        // #37: per-host license flags (host-cardinality) materialized
        // once; verdict + no-license listing derive from them
        val fLicense = track(phase("license_family") {
          val fl = Licensing.hostFlagsFromAtoms(wholeAtoms).localCheckpoint(true)
          (snap(Licensing.verdictRowFromFlags(fl)),
            cappedSnap(Licensing.violationsFromFlags(fl)))
        })
        // #20: registry-format count (Integer-valued metric)
        val fSerial = track(phase("serial_formats")(snap(
          Formats.verdictRowFromAtoms(wholeAtoms, Formats.formatDim(spark)))))
        // #13: atoms reduce to group-cardinality hijack stats;
        // verdict + grouped listing derive from that tiny frame
        val fHijack = track(phase("hijack_family") {
          val st = Hijack.groupHostStatsFromAtoms(wholeAtoms, dims.hostDim).localCheckpoint(true)
          (snap(Hijack.verdictRowFromStats(st)),
            cappedSnap(Hijack.violationsFromStats(st)))
        })
        val fEmbNd = embeddings.map(vecs => track(phase("embdup_pipeline") {
          val r = graft.sim.Similarity.nearDupPairsCounted(vecs)
          val labels = graft.dedup.Components.labels(r.result.select("id_a", "id_b"))
          val sizes = snap(labels.groupBy(col("label").as("cluster_rep"))
            .agg(count(lit(1)).as("n_vecs")))
          (snap(CheckSuite.embNearDupVerdict(vecs, sizes)),
            cappedSnap(CheckSuite.embNearDupViolations(sizes)), r.cappedBuckets)
        }))
        val fBatchViol = track(phase("batchviol_write")(
          violBatchRun.write.mode(SaveMode.Append).parquet(violationsPath)))
        val drift = await(fDrift).select(
          col("check_id"), lit("*").as("pday"),
          (col("base_rows") + col("cur_rows")).as("n_rows"),
          lit(0L).as("violations"), col("value"), col("pass"))
        val exists = await(fExists)
        val complSnap = await(fCompl)
        val uniq = await(fUniqV)
        val dupText = await(fDupTextV)
        val (disjoint, disjointViol) = await(fDisjoint)
        val (prov, provViol) = await(fProvF)
        val (nearDup, nearDupViol, ndCapped) = await(fNd)
        val (reuse, vocab, reuseViol) = await(fVocabFam)
        val (hijack, hijackViol) = await(fHijack)
        val (license, licenseViol) = await(fLicense)
        val serial = await(fSerial)
        val embFam = fEmbNd.map(await)
        val uniqViolRows = await(fUniqViol)
        val dupTextViol = await(fDupTextViol)
        await(fWide)
        await(fBatchViol)
        capParams = Map(CheckId.NearDupText -> CheckSuite.paramsWithCap(ndCapped)) ++
          embFam.map(e => CheckId.NearDupEmb -> CheckSuite.paramsWithCap(e._3))
        val wholeViol = (Seq(dupTextViol, disjointViol, provViol, nearDupViol,
          reuseViol, hijackViol, licenseViol) ++
          embFam.map(_._2)).foldLeft(uniqViolRows)(_ unionByName _)
        val perDaySnapped = fusedByDay.unionByName(complSnap)
          .unionByName(estimated).unionByName(estDeclared)
        val wholeResults = Seq(uniq, dupText, drift, exists, disjoint, prov, nearDup,
          reuse, vocab, hijack, license, serial) ++
          embFam.map(_._1)
        (wholeResults.foldLeft(perDaySnapped)(_ unionByName _), Some(wholeViol))
      } else {
        phase("violations_write")(
          violBatchRun.write.mode(SaveMode.Append).parquet(violationsPath))
        (perDay, None)
      }

      val resultsRun = results.withColumn("run_id", lit(runId))

      // durability order: violations → results → audit (audit marks
      // done). The verdict computation runs CONCURRENTLY with the
      // whole-table violations write — only the parquet write order is
      // load-bearing for resume correctness, not the compute order. The
      // snapshot is a few hundred rows; checkpoint blocks (unlike
      // CacheManager entries) are freed by the ContextCleaner once
      // unreferenced.
      val fResults = {
        import scala.concurrent.Future
        implicit val ec: scala.concurrent.ExecutionContext = CheckSuite.SuiteEc
        Future(phase("results_compute")(resultsRun.localCheckpoint(true)))
      }
      wholeViolOpt.foreach { wv =>
        // already capped per family (inside the concurrent phase, before
        // the eager checkpoint) — nothing uncapped was ever stored
        val wvRun = wv.withColumn("run_id", lit(runId))
        phase("wholeviol_write")(
          wvRun.write.mode(SaveMode.Append).parquet(violationsPath))
      }
      val resultsSnap =
        scala.concurrent.Await.result(fResults, scala.concurrent.duration.Duration.Inf)
      phase("results_write")(
        resultsSnap.write.mode(SaveMode.Append).parquet(resultsPath))

      val audit = resultsSnap.select(
        col("run_id"), col("check_id"), col("pday"),
        col("n_rows").as("rows_assessed"), col("violations"),
        col("value"), col("pass"),
        // the reference's isEstimate() observation-activity flag
        col("check_id").startsWith("est_").as("estimate"),
        // per-check params: LSH families carry their capped-bucket count
        // so a reduced-recall (capped) run is distinguishable downstream
        capParams.foldLeft(lit(CheckSuite.ParamsJson)) { case (acc, (id, js)) =>
          when(col("check_id") === id, lit(js)).otherwise(acc)
        }.as("params"),
        lit(System.currentTimeMillis()).as("finished_ts"))
      phase("audit_write")(audit.write.mode(SaveMode.Append).parquet(auditPath))
      // Fresh complete run: this batch IS the whole verdict table —
      // return the materialized snapshot instead of re-reading the
      // parquet (the read-back is a constant serial tail the bench
      // would charge to every assessment).
      if (done.isEmpty && isFinalBatch) return resultsSnap
    }

    // a crash between results-write and audit-write can leave duplicate
    // verdict rows after resume; values are deterministic, so dedupe is safe
    spark.read.parquet(resultsPath).where(col("run_id") === runId)
      .dropDuplicates("check_id", "pday")
  }
}

object CheckSuite {
  /** Daemon pool for concurrent whole-table check jobs (Spark job
    * submission is thread-safe; jobs from different threads share the
    * task-slot pool).
    */
  private[runtime] lazy val SuiteEc: scala.concurrent.ExecutionContext =
    scala.concurrent.ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newCachedThreadPool(r => {
        val t = new Thread(r, "suite-parallel")
        t.setDaemon(true)
        t
      }))

  /** Page frame decorated for the fused predicate bank: derived text
    * columns, extracted host, and the broadcast dimension-snapshot
    * flags every referential/vocabulary predicate reads.
    */
  def joinDims(pages: DataFrame, dims: Dims): DataFrame =
    graft.text.TextOps.withDerived(pages)
      .withColumn("host", Referential.hostExpr)
      .join(broadcast(dims.hostDim.withColumn("host_known", lit(true))), Seq("host"), "left")
      .join(broadcast(dims.langDim.withColumn("lang_known", lit(true))), Seq("lang"), "left")
      .join(broadcast(dims.depDim.withColumn("lang_deprecated", lit(true))), Seq("lang"), "left")
      // #11 misplaced-term flags: the wrong-kind vocabulary per position
      .join(broadcast(dims.hostDim.withColumnRenamed("host", "lang")
        .withColumn("lang_is_hostterm", lit(true))), Seq("lang"), "left")
      .join(broadcast(dims.langDim.withColumnRenamed("lang", "host")
        .withColumn("host_is_langterm", lit(true))), Seq("host"), "left")

  /** Referential checks expressed as fused predicates over the
    * dim-joined frame (host_known/lang_known null ⇔ missing from the
    * snapshot) — this is what lets the whole per-day family run in one
    * scan.
    */
  val refPreds: Seq[Pred] = Seq(
    Pred(CheckId.HostReferential, graft.model.ViolationKind.UnknownHost,
      col("host") =!= "", col("host_known").isNull, col("host"), 0.99),
    Pred(CheckId.LangReferential, graft.model.ViolationKind.UnknownLanguage,
      col("lang").isNotNull && graft.functions.NativeValidators.validLangTag(col("lang")),
      col("lang_known").isNull, col("lang"), 0.98),
    // #14 deprecated-term usage, riding the same dim-joined fused scan
    Pred(CheckId.DeprecatedTerms, graft.model.ViolationKind.DeprecatedTerm,
      col("lang").isNotNull && graft.functions.NativeValidators.validLangTag(col("lang")),
      col("lang_deprecated").isNotNull, col("lang"), 0.8),
    // #11 misplaced terms: a known term of the WRONG kind in a position
    Pred(CheckId.MisplacedTerms, graft.model.ViolationKind.MisplacedTerm,
      col("lang").isNotNull || col("host") =!= "",
      col("lang_is_hostterm").isNotNull || col("host_is_langterm").isNotNull,
      concat_ws("|", col("lang"), col("host")), 0.99))

  /** Number of distinct per-day check ids emitted for every partition:
    * fused preds (conformance + referential + text) + expected-member
    * completeness + the two sampled estimates (url conformance,
    * declared-vs-derived).
    */
  val PerDayCheckCount: Int =
    Conformance.preds.size + refPreds.size + graft.text.TextOps.preds.size + 3

  /** Whole-table check ids emitted with the final batch (pday='*'):
    * uniqueness, exact-dup text, psi, ks, 3 exists probes, disjoint,
    * provenance, text near-dup, embedding near-dup, reuse-terms,
    * vocab-usage, content hijacking, license indication, serialisation
    * formats.
    */
  val WholeTableCheckCount: Int = 16

  /** Near-dup verdict floor: ≥ this fraction of docs must survive
    * one-representative-per-cluster dedup.
    */
  val NearDupThreshold = 0.85

  /** Whole-table near-duplicate verdict (#1 ExtensionalConciseness's
    * entity-level value over LSH clusters instead of O(n²) pairs):
    * violations = redundant docs (cluster members minus one kept
    * representative per cluster), value = surviving docs / docs. Both
    * inputs are the compact frames [[graft.dedup.Dedup.clusterLabels]]
    * already materialized — no corpus rescan.
    */
  def nearDupVerdict(groups: DataFrame, sizes: DataFrame): DataFrame = {
    val tot = groups.agg(coalesce(sum(col("n_docs")), lit(0L)).as("n_rows"))
    val red = sizes.agg(
      (coalesce(sum(col("n_docs")), lit(0L)) - count(lit(1))).as("violations"))
    tot.crossJoin(red).select(
      lit(CheckId.NearDupText).as("check_id"), lit("*").as("pday"),
      col("n_rows"), col("violations"),
      when(col("n_rows") === 0, 1.0)
        .otherwise(lit(1.0) - col("violations").cast("double") / col("n_rows").cast("double"))
        .as("value"))
      .withColumn("pass", col("value") >= NearDupThreshold)
  }

  /** Whole-table embedding near-duplicate verdict (the [[nearDupVerdict]]
    * shape over the embedding corpus): violations = redundant vectors
    * (cluster members minus one representative per hyperplane-LSH
    * cluster), value = surviving vectors / vectors.
    */
  def embNearDupVerdict(vecs: DataFrame, sizes: DataFrame): DataFrame = {
    val tot = vecs.agg(count(lit(1)).as("n_rows"))
    val red = sizes.agg(
      (coalesce(sum(col("n_vecs")), lit(0L)) - count(lit(1))).as("violations"))
    tot.crossJoin(red).select(
      lit(CheckId.NearDupEmb).as("check_id"), lit("*").as("pday"),
      col("n_rows"), col("violations"),
      when(col("n_rows") === 0, 1.0)
        .otherwise(lit(1.0) - col("violations").cast("double") / col("n_rows").cast("double"))
        .as("value"))
      .withColumn("pass", col("value") >= NearDupThreshold)
  }

  /** Embedding near-dup violation rows: one per cluster, keyed by the
    * minimum member vec_id.
    */
  def embNearDupViolations(sizes: DataFrame): DataFrame =
    sizes.select(
      lit(CheckId.NearDupEmb).as("check_id"),
      lit(graft.model.ViolationKind.NearDuplicate).as("kind"),
      lit("*").as("pday"),
      concat(lit("vec:"), col("cluster_rep")).as("url"),
      concat(lit("near-duplicate embedding cluster: "), col("n_vecs"),
        lit(" vectors")).as("detail"))

  /** Near-duplicate violation rows: one per cluster, keyed by the
    * cluster representative (DQMPROB ResourceReplica analog — the
    * problem bag lists the replica group, not the quadratic member
    * pairs).
    */
  def nearDupViolations(sizes: DataFrame): DataFrame =
    sizes.select(
      lit(CheckId.NearDupText).as("check_id"),
      lit(graft.model.ViolationKind.NearDuplicate).as("kind"),
      lit("*").as("pday"),
      col("cluster_rep").as("url"),
      concat(lit("near-duplicate cluster: "), col("n_docs"), lit(" docs across "),
        col("n_reps"), lit(" distinct texts")).as("detail"))

  /** Per-(check, pday) violation-listing cap — the analog of the
    * reference's bounded problem collections (ShortURIs.java:47).
    */
  val MaxViolationRows = 100000

  /** Salt fan-out for the capped-listing rank. */
  private val CapSalts = 64

  /** Deterministically keep the first `cap` violations of a listing
    * whose (check_id, pday) is a SINGLE literal pair — every whole-table
    * family listing. sort+limit is planned as TakeOrderedAndProject
    * (given the fallback threshold below): each partition keeps a
    * `cap`-bounded heap, one task merges the ≤ cap·partitions
    * survivors — no full sort, no salted two-phase, and no global
    * window (which is what [[capViolations]] degenerates into here
    * once the optimizer folds the literal partition keys away).
    */
  def capViolationsSingleKey(viol: DataFrame, cap: Int): DataFrame = {
    // sort+limit only plans as top-k below this threshold (default
    // 10000); raise it so the 100k cap stays a bounded-heap top-k
    // instead of a full sort + single-partition global limit
    viol.sparkSession.conf.set(
      "spark.sql.execution.topKSortFallbackThreshold", (cap * 2).toString)
    viol.orderBy(col("url"), col("detail")).limit(cap)
  }

  /** Deterministically keep the first `cap` violations per (check_id,
    * pday) in (url, detail) order.
    *
    * Cheap pre-pass first: per-key counts (bounded by the check×day key
    * space, so the collect is tiny) decide whether any listing exceeds
    * the cap at all. In the common case none does, and the answer is
    * the input unchanged — the round-5 spelling paid two full
    * shuffles+sorts of every violation row to keep 100% of them.
    * When keys do overflow, only THEIR rows go through the two-phase
    * rank (rank within (check, pday, salt) — every sort group is ~1/64
    * of the listing — then rank the ≤ 64·cap survivors; the per-salt
    * top-cap union contains the global top-cap, so the result is
    * exact); rows of under-cap keys pass through untouched.
    */
  def capViolations(viol: DataFrame, cap: Int): DataFrame = {
    val over = viol.groupBy(col("check_id"), col("pday"))
      .agg(count(lit(1)).as("vn")).where(col("vn") > cap)
      .select("check_id", "pday").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    if (over.isEmpty) viol
    else {
      // key-membership test as one isin over a joined key (bounded by
      // the check×day key space; '\\u0001' appears in neither component)
      val key = concat_ws("\u0001", col("check_id"), col("pday"))
      val isOver = key.isin(over.toSeq.map { case (c, p) => s"$c\u0001$p" }: _*)
      val w1 = Window.partitionBy(col("check_id"), col("pday"),
          pmod(xxhash64(col("url"), col("detail")), lit(CapSalts.toLong)))
        .orderBy(col("url"), col("detail"))
      val w2 = Window.partitionBy(col("check_id"), col("pday"))
        .orderBy(col("url"), col("detail"))
      val capped = viol.where(isOver)
        .withColumn("r1", row_number().over(w1))
        .where(col("r1") <= cap)
        .withColumn("r2", row_number().over(w2))
        .where(col("r2") <= cap)
        .drop("r1", "r2")
      viol.where(!isOver).unionByName(capped)
    }
  }

  /** Whole-table exact-duplicate-text verdict (#1
    * ExtensionalConciseness's uniqueSubjects/totalSubjects shape,
    * ExtensionalConciseness.java:136-140): value = distinct texts /
    * non-empty docs. Hash-keyed groupBy — the shuffle carries 8-byte
    * keys, like [[Uniqueness.urlUniqueness]].
    */
  def dupTextVerdict(pages: DataFrame): DataFrame =
    pages.where(col("text").isNotNull && length(col("text")) > 0)
      .select(xxhash64(col("text")).as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("n"))
      .agg(
        sum(col("n")).as("n_rows"),
        count(lit(1)).as("distinct_texts"),
        sum(when(col("n") > 1, col("n")).otherwise(0L)).as("violations"))
      .select(
        lit(CheckId.TextDuplicates).as("check_id"), lit("*").as("pday"),
        col("n_rows"), col("violations"),
        (col("distinct_texts").cast("double") / col("n_rows").cast("double")).as("value"))
      .withColumn("pass", col("value") >= 0.9)

  /** [[dupTextVerdict]] over the atoms frame: the text hash is already
    * materialized (`text_xxh`, null unless non-empty), so the family
    * never touches the corpus. Identical grouping — equal texts hash
    * equal; the 64-bit collision analysis in
    * [[graft.checks.Uniqueness.urlUniqueness]] applies.
    */
  def dupTextVerdictFromAtoms(atoms: DataFrame): DataFrame =
    atoms.where(col("text_ok"))
      .select(col("text_xxh").as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("n"))
      .agg(
        sum(col("n")).as("n_rows"),
        count(lit(1)).as("distinct_texts"),
        sum(when(col("n") > 1, col("n")).otherwise(0L)).as("violations"))
      .select(
        lit(CheckId.TextDuplicates).as("check_id"), lit("*").as("pday"),
        col("n_rows"), col("violations"),
        (col("distinct_texts").cast("double") / col("n_rows").cast("double")).as("value"))
      .withColumn("pass", col("value") >= 0.9)

  /** [[dupTextViolations]] over the atoms frame (same group counts and
    * representative min_url; keyed by the pre-materialized text hash).
    */
  def dupTextViolationsFromAtoms(atoms: DataFrame): DataFrame =
    atoms.where(col("text_ok"))
      .groupBy(col("text_xxh"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("url")).as("n_urls"),
        min(col("url")).as("min_url"))
      .where(col("n_rows") > 1)
      .select(
        lit(CheckId.TextDuplicates).as("check_id"),
        lit(graft.model.ViolationKind.DuplicateContent).as("kind"),
        lit("*").as("pday"),
        col("min_url").as("url"),
        concat(col("n_rows"), lit(" docs share identical text ("),
          col("n_urls"), lit(" urls)")).as("detail"))

  /** Disjoint-membership violation rows (the problem-report analog of
    * AdvancedEntitiesAsMembersOfDisjointClasses.createProblemModel),
    * from a pre-built [[Disjoint.entityMasks]] frame.
    */
  def disjointViolations(pages: DataFrame, famDim: DataFrame,
      masks: DataFrame): DataFrame =
    Disjoint.violatingFrom(pages, famDim, masks).select(
      lit(CheckId.DisjointLang).as("check_id"),
      lit(graft.model.ViolationKind.DisjointMembership).as("kind"),
      lit("*").as("pday"),
      col("url"),
      concat(lit("families="), col("families"),
        lit(" langs="), col("langs")).as("detail"))

  /** Duplicate-text violation rows (one per group). */
  def dupTextViolations(pages: DataFrame): DataFrame =
    Uniqueness.duplicateTexts(pages).select(
      lit(CheckId.TextDuplicates).as("check_id"),
      lit(graft.model.ViolationKind.DuplicateContent).as("kind"),
      lit("*").as("pday"),
      col("min_url").as("url"),
      concat(col("n_rows"), lit(" docs share identical text ("),
        col("n_urls"), lit(" urls)")).as("detail"))

  /** Estimation / technique parameters recorded in every audit row —
    * the analog of the reference's observation-activity estimation
    * parameters (EstimatedExtensionalConciseness.java:183-207).
    */
  val ParamsJson: String =
    """{"psi_smoothing":0.5,"psi_threshold":0.2,"ks_threshold":0.1,"sample_u256":51,"violation_cap":100000,"engine":"metricsspark-0.2"}"""

  /** [[ParamsJson]] plus the LSH capped-bucket count for the near-dup
    * families — 0 means full recall; >0 means candidate generation
    * dropped that many oversized buckets (the audit-visible half of the
    * "no silent caps" rule).
    */
  def paramsWithCap(cappedBuckets: Long): String =
    ParamsJson.dropRight(1) + s""","capped_buckets":$cappedBuckets}"""
}

/** Dimension snapshots the suite joins against. */
case class Dims(hostDim: DataFrame, langDim: DataFrame, famDim: DataFrame,
    depDim: DataFrame)
object Dims {
  def default(spark: SparkSession): Dims =
    Dims(graft.synth.PageSynth.hostDim(spark), graft.synth.PageSynth.langDim(spark),
      Disjoint.famDim(spark), Vocabulary.deprecatedDim(spark))
}
