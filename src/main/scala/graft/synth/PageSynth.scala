package graft.synth

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthesis of the Common-Crawl-style page table
  * `(url, warc_ts, html, text, lang)` (BASELINE.json `input_hint`) from
  * the driver-provided `documents` parquet.
  *
  * Design constraints:
  *   - **Pure integer / string arithmetic** on `doc_id` — no RNG, no
  *     floats, no timezone-dependent ops — so the exact same table is
  *     derivable in both Spark SQL and DuckDB SQL. One template,
  *     rendered per dialect ([[pagesSelect]]), keeps the two in
  *     lockstep; every downstream check therefore has a DuckDB oracle.
  *   - **Zipf-ish host skew** (4 hosts own 90% of pages, a 97-host tail
  *     owns the rest) to exercise the salting / stratified-sampling
  *     paths the reference needed for skewed TLDs (reference:
  *     accessibility/.../EstimatedDereferenceabilityByStratified.java:152-173).
  *   - **Controlled defect rates** via prime moduli of `doc_id`, the
  *     analog of the reference fixtures' `#incorrect`-annotated triples
  *     (e.g. intrinsic test SampleInput_CompatibleDatatype.ttl).
  *
  * Defect classes injected (prime modulus → class):
  *   - `%131==7`  duplicate url (page re-crawl of doc_id-7's url)
  *   - `%439==0`  url contains a space           (syntax violation)
  *   - `%433==0`  url missing scheme             (syntax violation)
  *   - `%211==0`  url long + parametarised `?session=xxx…` (style violation)
  *   - `%353==0`  warc_ts NULL
  *   - `%359==0`  warc_ts 1985-10-26             (out of accepted range)
  *   - `%349==0`  text NULL (html NULL too)
  *   - `%347==0`  text empty
  *   - `%127==3`  text replaced by boilerplate A (exact-duplicate group)
  *   - `%127==4`  text replaced by boilerplate B (near-duplicate of A: one token differs)
  *   - `%127==5`  text replaced by boilerplate C (400-token exact-dup group)
  *   - `%127==6`  text replaced by boilerplate C′ (C with one token changed —
  *                a *simhash-detectable* near-dup: 1/400 tokens differ ⇒
  *                token-vector cosine ≈ 0.9975 ⇒ expected hamming ≈ 2 of 60 bits;
  *                the 20-token A/B pair is only minhash-detectable)
  *   - `%421==0`  lang NULL
  *   - `%419==0`  lang `'x!'`                    (syntax violation)
  *   - `%443==0`  lang `'h002.example.com'`      (a host-KIND term in lang position —
  *                #11 MisplacedClassesOrProperties analog; also fails lang syntax)
  *   - `%97==0`   lang `'zz'`   (valid syntax, absent from lang_dim → referential violation)
  *   - `%457==0`  text wrapped in `<a href=…>…</a>` markup (resource-shaped value in a
  *                literal position — #12 MisusedOwlDatatypeOrObjectProperties analog)
  *   - `pid%463==0 / %467==0 / %479==0` url extension `.xhtml` / `.htm` / `.txt`
  *                (serialisation-format variety — #20 DifferentSerialisationFormatsCount)
  *   - every non-null html carries a fixed-width machine-readable license meta
  *                (`host_id%4` → CC-BY-SA-4 / CC0-PUBLIC / PROPRIETRY / UNLICENSED —
  *                #37 licensing bank; UNLICENSED = no license indicated)
  *   - crawl day ≥ 23 with `%7<3` → lang forced `'fr'`  (lang drift, second half)
  *   - crawl day ≥ 23 with `%11<3` → hour forced to 03:xx (hour drift, second half)
  */
object PageSynth {

  /** 2024-01-01T00:00:00Z — base of the 45-day crawl window. */
  val Epoch0 = 1704067200L
  val Days = 45
  /** Accepted warc_ts window for the range-conformance check. */
  val TsMin = Epoch0                      // 2024-01-01
  val TsMax = Epoch0 + Days * 86400L      // 2024-02-15

  /** Known-language dimension (lang_dim). 'zz' deliberately absent. */
  val KnownLangs = Seq("en", "fr", "es", "zh", "de", "it", "pt", "ja")

  /** host_dim covers host ids 0..90; tail ids 91..100 are "unknown". */
  val KnownHostMax = 90

  /** 400 distinct tokens — long enough that a one-token edit keeps the
    * simhash within the hamming-≤3 detection bound (see class doc).
    */
  val BoilerC: String = (1 to 400).map(i => f"w$i%03d").mkString(" ")
  /** C with token #200 changed. */
  val BoilerCPrime: String = BoilerC.replace(" w200 ", " wzzz ")

  /** Fixed-width (10-char) machine-readable license values carried in
    * every html head; `host_id % 4` selects one. [[NoLicense]] means
    * "no license indicated" (#37 MachineReadableLicense analog).
    */
  val LicenseValues: Seq[String] = Seq("CC-BY-SA-4", "CC0-PUBLIC", "PROPRIETRY", "UNLICENSED")
  val NoLicense = "UNLICENSED"
  /** html template around (license, text); all three pieces are fixed
    * strings and the license slot is fixed-width, so text extraction
    * stays a pure substr (no parsing).
    */
  val HtmlHead = "<!DOCTYPE html><html><head><meta name=\"license\" content=\""
  val HtmlMid = "\"/></head><body><p>"
  val HtmlTail = "</p></body></html>"

  private val licSql: String =
    s"CASE host_id % 4 WHEN 0 THEN '${LicenseValues(0)}' WHEN 1 THEN '${LicenseValues(1)}' " +
      s"WHEN 2 THEN '${LicenseValues(2)}' ELSE '${LicenseValues(3)}' END"

  sealed trait Dialect { def str: String; def enc(x: String): String; def day(e: String): String }
  /** Spark SQL rendering. */
  case object SparkSql extends Dialect {
    val str = "string"
    def enc(x: String) = s"encode($x, 'UTF-8')"
    def day(e: String) = s"date_format(date_add(date'2024-01-01', cast($e as int)), 'yyyy-MM-dd')"
  }
  /** DuckDB rendering (for the driver's oracle). */
  case object DuckSql extends Dialect {
    val str = "varchar"
    def enc(x: String) = s"encode($x)"
    def day(e: String) = s"strftime(DATE '2024-01-01' + cast($e as int), '%Y-%m-%d')"
  }

  /** The page-derivation SELECT over a `documents` relation, shared by
    * both engines. Produces columns:
    * `doc_id, url, warc_epoch, pday, html, text, lang, host_id, host`.
    * (`warc_epoch` bigint instead of a timestamp so the oracle never
    * crosses a timezone boundary; Spark materializes `warc_ts` from it.)
    */
  def pagesSelect(d: Dialect, docs: String = "documents"): String = {
    val str = d.str
    s"""SELECT doc_id, url, warc_epoch, pday,
       |  CASE WHEN text IS NULL THEN NULL
       |       ELSE ${d.enc(s"'$HtmlHead' || $licSql || '$HtmlMid' || text || '$HtmlTail'")} END AS html,
       |  text, lang, host_id, host
       |FROM (
       |  SELECT doc_id, pid, host_id, host,
       |    CASE WHEN pid % 439 = 0 THEN 'http://' || host || '/bad path/' || cast(pid as $str)
       |         WHEN pid % 433 = 0 THEN 'notaurl-' || cast(pid as $str)
       |         WHEN pid % 211 = 0 THEN 'https://' || host || '/p/' || cast(pid as $str) || '.html?session=' || repeat('x', 60)
       |         ELSE 'https://' || host || '/p/' || cast(pid as $str) ||
       |           CASE WHEN pid % 463 = 0 THEN '.xhtml' WHEN pid % 467 = 0 THEN '.htm'
       |                WHEN pid % 479 = 0 THEN '.txt' ELSE '.html' END END AS url,
       |    CASE WHEN doc_id % 353 = 0 THEN NULL
       |         WHEN doc_id % 359 = 0 THEN 499162500
       |         WHEN doc_id % $Days >= 23 AND doc_id % 11 < 3
       |           THEN ${Epoch0}+ (doc_id % $Days) * 86400 + 10800 + (doc_id * 7919) % 3600
       |         ELSE ${Epoch0}+ (doc_id % $Days) * 86400 + (doc_id * 7919) % 86400 END AS warc_epoch,
       |    CASE WHEN doc_id % 353 = 0 THEN 'null'
       |         WHEN doc_id % 359 = 0 THEN '1985-10-26'
       |         ELSE ${d.day(s"doc_id % $Days")} END AS pday,
       |    CASE WHEN doc_id % 349 = 0 THEN NULL
       |         WHEN doc_id % 347 = 0 THEN ''
       |         WHEN doc_id % 127 = 3 THEN 'boilerplate cookie consent page please accept our terms and conditions to continue reading the content of this site'
       |         WHEN doc_id % 127 = 4 THEN 'boilerplate cookie consent page please accept our terms and conditions to continue reading the content of this website'
       |         WHEN doc_id % 127 = 5 THEN '$BoilerC'
       |         WHEN doc_id % 127 = 6 THEN '$BoilerCPrime'
       |         WHEN doc_id % 457 = 0 THEN '<a href="https://h000.example.com/ref">' || text || '</a>'
       |         ELSE text END AS text,
       |    CASE WHEN doc_id % 421 = 0 THEN NULL
       |         WHEN doc_id % 419 = 0 THEN 'x!'
       |         WHEN doc_id % 443 = 0 THEN 'h002.example.com'
       |         WHEN doc_id % 97 = 0 THEN 'zz'
       |         WHEN doc_id % $Days >= 23 AND doc_id % 7 < 3 THEN 'fr'
       |         ELSE lang END AS lang
       |  FROM (
       |    SELECT doc_id, text, lang, pid,
       |      CASE WHEN pid % 100 < 40 THEN 0
       |           WHEN pid % 100 < 65 THEN 1
       |           WHEN pid % 100 < 80 THEN 2
       |           WHEN pid % 100 < 90 THEN 3
       |           ELSE (pid % 97) + 4 END AS host_id,
       |      'h' || lpad(cast(CASE WHEN pid % 100 < 40 THEN 0
       |           WHEN pid % 100 < 65 THEN 1
       |           WHEN pid % 100 < 80 THEN 2
       |           WHEN pid % 100 < 90 THEN 3
       |           ELSE (pid % 97) + 4 END as $str), 3, '0') || '.example.com' AS host
       |    FROM (
       |      SELECT doc_id, text, lang,
       |        CASE WHEN doc_id % 131 = 7 THEN doc_id - 7 ELSE doc_id END AS pid
       |      FROM $docs
       |    ) t0
       |  ) t1
       |) t2""".stripMargin
  }

  /** DuckDB CTE prelude used by every oracle SQL: `WITH pages AS (…)`.
    * Relies on the driver registering the parquet as table `documents`.
    */
  def duckCte: String = s"WITH pages AS (${pagesSelect(DuckSql)})"

  /** Page derivation over an arbitrary documents DataFrame
    * (doc_id, text, lang …).
    */
  def pagesFromDocs(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    docs.createOrReplaceTempView("documents")
    spark.sql(pagesSelect(SparkSql))
      .withColumn("warc_ts", col("warc_epoch").cast("timestamp"))
  }

  /** Analyzed-plan memo for [[pagesWithMeta]]: the synthesis SELECT is
    * a large tree that every harness query re-parsed and re-analyzed
    * (~0.1–0.3 s of serial driver time each). The memo holds the
    * *unexecuted* DataFrame — a plan object, no data; every action
    * still computes from the parquet input.
    */
  private val planCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  /** Full page table incl. synthesis metadata (doc_id, host, pday,
    * warc_epoch) — used by tests and oracle-parity harness.
    */
  def pagesWithMeta(spark: SparkSession, sfDir: String): DataFrame =
    planCache.computeIfAbsent((spark, sfDir),
      _ => pagesFromDocs(spark.read.parquet(s"$sfDir/documents.parquet")))

  /** Deterministically replicated corpus for benchmarking: documents
    * crossed with a replica index, re-keyed doc_id = rep·N + doc_id so
    * every replica gets a distinct slice of the defect-injection
    * pattern. No external data; same seed ⇒ same corpus.
    */
  def replicatedPages(spark: SparkSession, sfDir: String, targetDocs: Long): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val n = docs.count()
    val k = math.max(1L, (targetDocs + n - 1) / n)
    // The base parquet is one small file = ONE input split. A bare
    // crossJoin broadcasts the replica range and leaves the entire
    // k·n-row synthesis + shuffle write in a single task (~1 core-hour
    // at 96M docs, 31 cores idle). Spread the n base rows first — that
    // shuffle is tiny — so the synthesis fans out cores-wide.
    val fanout = spark.sparkContext.defaultParallelism * 2
    val rep = docs.repartition(fanout, col("doc_id"))
      .crossJoin(broadcast(spark.range(k).toDF("rep")))
      .select((col("rep") * n + col("doc_id")).as("doc_id"),
        col("text"), col("lang"))
    pagesFromDocs(rep).select("url", "warc_ts", "html", "text", "lang")
  }

  /** The engine's input contract: exactly (url, warc_ts, html, text, lang). */
  def pages(spark: SparkSession, sfDir: String): DataFrame =
    pagesWithMeta(spark, sfDir).select("url", "warc_ts", "html", "text", "lang")

  /** host_dim snapshot: the authoritative hosts (ids 0..90) — the analog
    * of the reference's VocabularyLoader vocabulary dimension
    * (utilities/.../VocabularyLoader.java:82-165).
    */
  def hostDim(spark: SparkSession): DataFrame =
    spark.range(0, KnownHostMax + 1L)
      .select(concat(lit("h"), lpad(col("id").cast("string"), 3, "0"), lit(".example.com")).as("host"))

  /** DuckDB rendering of host_dim for oracle SQL. */
  def hostDimDuck: String =
    s"SELECT 'h' || lpad(cast(range as varchar), 3, '0') || '.example.com' AS host FROM range(0, ${KnownHostMax + 1})"

  /** lang_dim snapshot. */
  def langDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    KnownLangs.toDF("lang")
  }

  /** DuckDB rendering of lang_dim for oracle SQL. */
  def langDimDuck: String =
    KnownLangs.map(l => s"('$l')").mkString("SELECT * FROM (VALUES ", ", ", ") langs(lang)")

  /** Per-member completeness conditions — the reference's per-property
    * condition-operator table (#3,
    * intrinsic/.../DataCubePopulationCompleteness.java:248-267: the
    * observed count must satisfy `count op value`; an absent member
    * always violates). Ops cycle deterministically over the member
    * list so every operator kind is exercised.
    */
  val CondOps: Seq[(String, Long)] =
    Seq((">=", 1L), (">", 0L), ("=", 1L), ("<=", 2L), (">=", 2L))

  /** (lang, cond_op, cond_val) rows for [[KnownLangs]]. */
  val LangConds: Seq[(String, String, Long)] =
    KnownLangs.zipWithIndex.map { case (l, i) =>
      val (op, v) = CondOps(i % CondOps.size); (l, op, v)
    }

  /** lang_dim extended with the per-member condition columns. */
  def langCondDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    LangConds.toDF("lang", "cond_op", "cond_val")
  }

  /** DuckDB rendering of [[langCondDim]]. */
  def langCondDimDuck: String =
    LangConds.map { case (l, op, v) => s"('$l', '$op', $v)" }
      .mkString("SELECT * FROM (VALUES ", ", ", ") lc(lang, cond_op, cond_val)")
}
