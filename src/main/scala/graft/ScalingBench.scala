package graft

import org.apache.spark.sql.SparkSession
import graft.runtime.{PageTable, SuiteRunner}
import graft.synth.PageSynth
import java.nio.file.{Files, Paths, Path}
import scala.jdk.CollectionConverters._

/** North-rule scaling evidence: the identical end-to-end suite
  * assessment at two parallelism levels (local[N] and local[4N] — the
  * sandbox stand-in for N vs 4N executors) on the same pre-built
  * partitioned table.
  *
  * Run via tools/scaling_bench.sh, which invokes each phase in its own
  * JVM (same-JVM back-to-back SparkContexts skew the second level via
  * GC/JIT state):
  *   - `build`            — synthesize + write the replicated table
  *   - `measure <cpus>`   — 1 warm-up + 2 timed assessments, best-of
  *   - `report <n> <4n>`  — efficiency = (T_N / T_4N) / 4 → BENCH/BASELINE.md
  */
object ScalingBench {

  private def benchDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "2000000").toLong
  private def sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
  // default to tmpfs: the VM disk (/tmp on virtio) has erratic writeback
  // stalls that add up to 3x run-to-run variance; the scaling evidence
  // measures the engine, not the disk
  private def root = sys.env.getOrElse("SPARK_GRAFT_TABLE_DIR",
    s"/dev/shm/metricsspark_scaling_$benchDocs")

  private def session(cpus: Int): SparkSession = {
    // shuffle.partitions is deliberately DECOUPLED from the cpu level:
    // pinning it to `cpus` gave the 4-core level 24M-row reduce
    // partitions (spill-bound → superlinear 4→8 "scaling") and handed
    // the 32-core level 8× the reduce parallelism AND different plan
    // shapes. A fixed fan-out keeps the plan identical across levels —
    // the only variable is the core budget, which is what the N→4N
    // efficiency claim is about. AQE coalesces the excess at runtime.
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"metricsspark-scaling-$cpus")
      .config("spark.sql.shuffle.partitions", "128")
      // one assessment generates well over the default 100 cached
      // codegen units (15 concurrent families × several stages each +
      // the per-day plans), so the 100-entry LRU recompiles the big
      // fused classes on every run — pure driver CPU burned per
      // assessment. Static conf: must be set before the first session.
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      // row-heavy, byte-light input: the dedup-laden corpus compresses
      // to ~10 B/row, so the default 128 MB split planning caps every
      // scan stage at ~20 tasks — an N-independent floor that murders
      // N→4N efficiency (measured S≈108 s at 96M docs). Split by ~2
      // files (≈2 M rows) per task instead; a real cluster tunes the
      // same knobs for the same reason.
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", "/dev/shm/spark_local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def rmrf(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)

  def main(args: Array[String]): Unit = args.toList match {
    case "build" :: Nil =>
      if (Files.exists(Paths.get(root, "_manifest.json"))
          && sys.env.get("SPARK_GRAFT_REBUILD").isEmpty) {
        println(s"[scaling] table exists, skipping build: $root")
      } else {
        val s = session(Runtime.getRuntime.availableProcessors())
        PageTable.write(PageSynth.replicatedPages(s, sfDir, benchDocs), root)
        println(s"[scaling] built $root: ${PageTable.read(s, root).count()} docs")
        s.stop()
      }

    case "measure" :: cpus :: Nil =>
      val s = session(cpus.toInt)
      val docs = PageTable.read(s, root).count()
      var verdictRows = 0L
      def once(): Double = {
        // identical starting state per run: assessment outputs cleared
        Seq("audit", "results", "violations").foreach(d => rmrf(Paths.get(root, d)))
        // free the previous run's checkpoint blocks BEFORE timing: local-
        // checkpoint RDDs are reclaimed by the ContextCleaner only after
        // the driver GCs their weak refs, and at bench scale the atoms
        // checkpoint is ~36 GB/run — three un-reclaimed runs would
        // exhaust tmpfs+heap. Two gc passes + a settle window let the
        // async cleaner drop the blocks; run-to-run isolation, not a
        // speedup of the measured engine.
        System.gc(); System.gc(); Thread.sleep(5000)
        val t0 = System.nanoTime()
        verdictRows = SuiteRunner.assess(s, root, s"scal_${cpus}_${System.nanoTime()}",
          embeddings = Some(graft.synth.EmbSynth.vectors(s, sfDir))).count()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm-up (codegen + JIT)
      // min-of-k (default 3): the sandbox host has noisy neighbors, min
      // is robust; SPARK_GRAFT_RUNS trims long low-level sweeps
      val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
      val best = Seq.fill(runs)(once()).min
      Files.createDirectories(Paths.get("BENCH"))
      Files.writeString(Paths.get(s"BENCH/level_$cpus.json"),
        s"""{"cpus":$cpus,"secs":$best,"docs":$docs,"verdict_rows":$verdictRows}""")
      println(f"[scaling] local[$cpus]: $best%.2f s, ${docs / best}%.0f docs/sec, $verdictRows verdict rows")
      s.stop()

    case "report" :: n :: n4 :: Nil =>
      def read(c: String) = {
        val t = Files.readString(Paths.get(s"BENCH/level_$c.json"))
        def f(k: String) = s""""$k":([0-9.E-]+)""".r.findFirstMatchIn(t).get.group(1).toDouble
        (f("secs"), f("docs"))
      }
      def verdictRowsOf(c: String): Option[Long] = {
        val t = Files.readString(Paths.get(s"BENCH/level_$c.json"))
        """"verdict_rows":([0-9]+)""".r.findFirstMatchIn(t).map(_.group(1).toLong)
      }
      val (tN, docs) = read(n); val (t4N, _) = read(n4)
      val eff = (tN / t4N) / (n4.toDouble / n.toDouble)
      val vRowsScope: Option[Double] =
        verdictRowsOf(n4).orElse(verdictRowsOf(n)).map(_.toDouble)
      val nChecks: Double =
        graft.runtime.CheckSuite.PerDayCheckCount.toDouble +
          graft.runtime.CheckSuite.WholeTableCheckCount
      // machine ceiling from tools/spin_calibrate.py (pure-CPU spin at
      // the same pinned levels): the engine cannot scale better than
      // the host backs its vCPUs
      def ceilingOf(key: String): Option[Double] = {
        val p = Paths.get("BENCH/spin_ceiling.json")
        if (Files.exists(p))
          s""""$key":\\s*([0-9.]+)""".r
            .findFirstMatchIn(Files.readString(p)).map(_.group(1).toDouble)
        else None
      }
      val ceiling = ceilingOf(s"ceiling_${n}_to_$n4")
      val ceilingSingle = ceilingOf(s"best_single_window_ceiling_${n}_to_$n4")
      // round-5 ADVICE: merged and single-window ceilings can land on
      // either side of each other (a contended 4-worker sample depresses
      // the single-window denominator past 1.0), so neither is an upper
      // envelope by construction. Normalize by the MOST generous ceiling
      // the host demonstrated, capped at 1.0 — pure-CPU spin cannot
      // scale superlinearly, so any ceiling above 1.0 is denominator
      // noise, not host capacity.
      val ceilingLine = ceiling.map { c =>
        val best = math.min(1.0, math.max(c, ceilingSingle.getOrElse(c)))
        f"\n**Machine ceiling at the same levels** (pure-CPU spin, zero shared state — " +
        f"tools/spin_calibrate.py): merged per-level-best **$c%.3f**" +
        ceilingSingle.map(b => f"; best single-window (one real host operating " +
          f"point, all levels in one pass) **$b%.3f**").getOrElse("") +
        f". The headline relative figure divides by max(merged, single-window) capped " +
        f"at 1.0 = **$best%.3f** — the most generous demonstrated host ceiling, so the " +
        f"relative figure is never inflated by a noisy calibration denominator. Engine " +
        f"efficiency relative to what the host actually backs: **${eff / best}%.3f**" +
        ".\n"
      }.getOrElse("")
      // secondary pair (transparency): 8→32 where the host itself stops
      // backing its vCPUs (SMT beyond 16 physical cores)
      val secondary = {
        val p8 = Paths.get("BENCH/level_8.json"); val p32 = Paths.get("BENCH/level_32.json")
        if (n == "4" && n4 == "16" && Files.exists(p8) && Files.exists(p32)) {
          val (t8, _) = read("8"); val (t32, _) = read("32")
          val eff2 = (t8 / t32) / 4.0
          val c2 = ceilingOf("ceiling_8_to_32")
          val c2s = ceilingOf("best_single_window_ceiling_8_to_32")
          f"\n**Secondary pair 8→32** (transparency): T_8 = $t8%.2f s, T_32 = $t32%.2f s → " +
            f"efficiency **$eff2%.3f**" +
            c2s.map(c => f" (single-window ceiling **$c%.3f**)").getOrElse("") +
            c2.map(c => f" against a register-compute ceiling of **$c%.3f** at the same " +
              f"levels (relative: **${eff2 / c}%.3f**); the binding shared resource past " +
              f"~8-16 workers is memory bandwidth — see BENCH/stream_ceiling.json, where " +
              f"aggregate large-array streaming saturates between 8 and 32 pinned workers").getOrElse("") + ".\n"
        } else ""
      }
      val scopeLine = verdictRowsOf(n4).orElse(verdictRowsOf(n)).map(v =>
        s"""|- suite scope: $v verdict rows per assessment
            |  (${graft.runtime.CheckSuite.PerDayCheckCount} per-day checks ×
            |  47 partitions + ${graft.runtime.CheckSuite.WholeTableCheckCount}
            |  whole-table checks incl. text AND embedding LSH near-dup
            |  clustering, per-host provenance flags, vocabulary/licensing/
            |  hijack/format families) — "validated docs/sec" is docs ÷
            |  wall-clock at THIS scope; see the per-verdict-row
            |  normalization below for cross-round comparability
            |  (round 2: 713 rows, round 3: 762, round 4: 1003, round 5: 1050)
            |""".stripMargin).getOrElse("")
      val md =
        s"""# BENCH — metricsspark scaling evidence
           |
           |End-to-end constraint-suite assessment (`CheckSuite.run`: fused
           |conformance/completeness/estimate family + host/lang referential +
           |url uniqueness + exact/near-duplicate text (MinHash LSH +
           |union-find clusters) + disjoint-class membership + per-host
           |provenance flags + KS/PSI drift + exists probes + violation &
           |audit writes) over the same Iceberg-shaped partitioned table,
           |identical input at two parallelism levels — the sandbox stand-in
           |for N vs 4N executors. Independent whole-table checks run as
           |concurrent Spark jobs; the verdict snapshot computes concurrently
           |with the violation writes (write order viol→results→audit is
           |preserved for resume).
           |$scopeLine
           |- corpus: ${docs.toLong} docs (deterministic replication of $sfDir), 47 day-partitions
           |- method: fresh JVM per level, pinned to its cpu budget with taskset
           |  (local[N] alone caps only task slots — GC/shuffle/writer threads
           |  would otherwise borrow the idle cores and inflate the small level);
           |  table + shuffle dirs on tmpfs (the VM disk adds 3x writeback
           |  variance); 1 warm-up + SPARK_GRAFT_RUNS timed full assessments,
           |  best-of (min); all levels measured in one sweep on one code
           |  version (single classpath snapshot);
           |  assessment outputs cleared before each run (identical starting state)
           |
           || level | wall-clock (s) | validated docs/sec | verdict rows/sec | docs·checks/sec |
           ||---|---|---|---|---|
           || local[$n] | ${"%.2f".format(tN)} | ${(docs / tN).round} | ${vRowsScope.map(v => f"${v / tN}%.2f").getOrElse("-")} | ${vRowsScope.map(_ => (docs * nChecks / tN).round.toString).getOrElse("-")} |
           || local[$n4] | ${"%.2f".format(t4N)} | ${(docs / t4N).round} | ${vRowsScope.map(v => f"${v / t4N}%.2f").getOrElse("-")} | ${vRowsScope.map(_ => (docs * nChecks / t4N).round.toString).getOrElse("-")} |
           |
           |(verdict rows/sec and docs·checks/sec normalize throughput by the
           |assessed scope — rows = (check, partition) verdicts per run,
           |checks = ${graft.runtime.CheckSuite.PerDayCheckCount} per-day +
           |${graft.runtime.CheckSuite.WholeTableCheckCount} whole-table ids — so
           |rounds with different suite scopes stay comparable.)
           |
           |**Scaling efficiency (N→4N)** = (T_$n / T_$n4) / 4 = **${"%.3f".format(eff)}**
           |(north-rule target ≥ 0.8)
           |$ceilingLine$secondary
           |Audit: every (check, partition) assessed exactly once per run —
           |verified by RuntimeSpec "interrupted run resumes" and the audit
           |table row counts.
           |""".stripMargin
      Files.writeString(Paths.get("BENCH/BASELINE.md"), md)
      println(md)
      println(s"""{"metric":"scaling_efficiency","value":${"%.4f".format(eff)},"unit":"ratio","docs_per_sec_n":${(docs / tN).round},"docs_per_sec_4n":${(docs / t4N).round}}""")

    case other =>
      System.err.println(s"usage: build | measure <cpus> | report <n> <4n> (got: $other)")
      sys.exit(2)
  }
}
