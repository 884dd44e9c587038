package graft.checks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.NativeValidators.{validHttpUrl, validLangTag}
import graft.model.ViolationKind
import graft.synth.PageSynth

/** A predicate-style check: over the rows where `applicable`, count the
  * rows where `bad`. value = 1 - bad/applicable (NaN → 1.0, mirroring
  * the reference's CompatibleDatatype NaN → 1.0 finalization,
  * intrinsic/.../CompatibleDatatype.java:84-92).
  *
  * All predicate checks are **fused into one scan** by [[FusedChecks]]:
  * a single `groupBy(pday)` with 2×N conditional-count aggregates, and a
  * single violation pass that emits an array of failing-check structs
  * per row and explodes it. At 100 TB this means the page table is read
  * once for the whole conformance/completeness family, not once per
  * check (the reference similarly folds all metrics over one stream).
  */
final case class Pred(
    id: String,
    kind: String,
    applicable: Column,
    bad: Column,
    detail: Column,
    threshold: Double)

object Conformance {

  /** RFC-3986-lite absolute http(s) URL. RE2-compatible (no backrefs)
    * so Spark `rlike` and DuckDB `regexp_matches` agree.
    * Reference analog: UrlValidator gate in
    * accessibility/.../HTTPRetriever.java:519-522.
    */
  val UrlRegex = "^https?://[A-Za-z0-9.-]+(:[0-9]+)?(/[^ ]*)?$"

  /** BCP-47-lite language tag. Reference analog: declared-tag syntax gate
    * in intrinsic/.../CorrectLanguageTag.java:72-115.
    */
  val LangRegex = "^[a-zA-Z]{2,3}(-[A-Za-z0-9]{1,8})*$"

  /** Long/parametarised URI thresholds — reference values from
    * representational/.../ShortURIs.java:80-93 (`length>80`, contains '?').
    */
  val MaxUrlLen = 80

  /** #16 NoProlixRDF analog — the reference flags reification/container/
    * collection constructs via a fixed URI set + the `rdf:_[0-9]+`
    * member regex (representational/.../NoProlixRDF.java:46-112). The
    * page-table constructs: a fixed boilerplate phrase (the URI-set
    * analog) and a run of container-member-style tokens (the regex
    * analog). RE2-compatible so rlike and regexp_matches agree.
    */
  val ProlixPhrase = "boilerplate cookie consent page"
  val ProlixRunRegex = "(w[0-9]{3} ){10}"

  /** #12 MisusedOwlDatatypeOrObjectProperties analog — a value whose
    * SHAPE contradicts its position's declared kind
    * (I/consistency/MisusedOwlDatatypeOrObjectProperties.java:59-85):
    * markup (resource-shaped) content in the text (literal) position,
    * and scheme-less (literal-shaped) values in the url (resource)
    * position. RE2-compatible.
    */
  val MarkupRegex = "<[a-z][^>]*>"
  val SchemeRegex = "^[a-z][a-z0-9+.-]*://"

  // Hot path: byte-scan validators (graft.functions.UrlScan), not
  // java.util.regex — same semantics as UrlRegex/LangRegex (the oracle
  // still checks via regexp_matches; ValidatorSpec proves equivalence).
  private val urlOk = col("url").isNotNull && validHttpUrl(col("url"))

  /** The fused predicate-check bank. */
  val preds: Seq[Pred] = Seq(
    // — completeness family (null/empty ratios; refs #3 #19 #22 #25 #26) —
    Pred("stats_null_ratio.url", ViolationKind.MissingValue,
      lit(true), col("url").isNull, lit("url is null"), 0.999),
    Pred("stats_null_ratio.warc_ts", ViolationKind.MissingValue,
      lit(true), col("warc_ts").isNull, lit("warc_ts is null"), 0.99),
    Pred("stats_null_ratio.html", ViolationKind.MissingValue,
      lit(true), col("html").isNull, lit("html is null"), 0.99),
    Pred("stats_null_ratio.text", ViolationKind.MissingValue,
      lit(true), col("text").isNull || length(col("text")) === 0,
      lit("text is null or empty"), 0.99),
    Pred("stats_null_ratio.lang", ViolationKind.MissingValue,
      lit(true), col("lang").isNull, lit("lang is null"), 0.99),
    // — syntactic validity family (refs #4 #5 #27) —
    Pred("conform_url", ViolationKind.MalformedUri,
      col("url").isNotNull, !validHttpUrl(col("url")), col("url"), 0.99),
    Pred("conform_lang", ViolationKind.BadLanguageTag,
      col("lang").isNotNull, !validLangTag(col("lang")), col("lang"), 0.99),
    Pred("conform_ts", ViolationKind.OutOfRange,
      col("warc_ts").isNotNull,
      col("warc_ts").cast("long") < PageSynth.TsMin ||
        col("warc_ts").cast("long") >= PageSynth.TsMax,
      col("warc_ts").cast("long").cast("string"), 0.99),
    // — URI style family (refs #15 ShortURIs, #37 regex banks) —
    Pred("conform_url_style", ViolationKind.ParametarisedUri,
      urlOk,
      length(col("url")) > MaxUrlLen || col("url").contains("?"),
      col("url"), 0.99),
    // — prolix constructs (#16 NoProlixRDF: fixed set + member regex;
    //   the member-run regex runs as a native byte scan, ValidatorSpec
    //   asserts ≡ rlike(ProlixRunRegex)) —
    Pred("prolix_text", ViolationKind.ProlixConstruct,
      col("text").isNotNull && length(col("text")) > 0,
      col("text").contains(ProlixPhrase) ||
        graft.functions.TextScan2Fn.hasProlixRun(col("text")),
      lit("prolix boilerplate construct"), 0.9),
    // — shape-vs-position misuse (#12, both directions; markup probe is
    //   a native byte scan, ValidatorSpec asserts ≡ rlike(MarkupRegex)) —
    Pred(graft.model.CheckId.MisusedLiteral, ViolationKind.MisusedDatatype,
      col("text").isNotNull && length(col("text")) > 0,
      graft.functions.TextScan2Fn.hasMarkup(col("text")),
      lit("markup in literal position"), 0.99),
    Pred(graft.model.CheckId.MisusedResource, ViolationKind.MisusedObject,
      col("url").isNotNull,
      !col("url").rlike(SchemeRegex),
      col("url"), 0.99)
  )

  def byId(id: String): Pred = preds.find(_.id == id).get
}

object FusedChecks {

  /** Partition-day key: `yyyy-MM-dd` of warc_ts, `'null'` when absent.
    * (Session timezone is pinned to UTC so this is deterministic.)
    */
  val pday: Column = coalesce(date_format(col("warc_ts"), "yyyy-MM-dd"), lit("null"))

  /** Every predicate folded into TWO long bitmask columns: bit i of
    * `__am` = pred i applicable, bit i of `__bm` = pred i violated.
    * All other input columns pass through (violation details read
    * them).
    *
    * This shape is what keeps the fused family fast at 96M rows: the
    * verdict aggregation becomes pure long bit-math (measured 0.43 s vs
    * 21.8 s for per-pred string/flag columns at 4.2M rows — conditional
    * string columns defeat the aggregate's subexpression elimination),
    * and the violations pass filters on `__bm != 0` before any detail
    * string is built, so detail expressions run only on flagged rows.
    * No caching needed — the mask pass is cheap enough to run once per
    * consumer.
    */
  def maskFrame(pages: DataFrame, preds: Seq[Pred] = Conformance.preds): DataFrame = {
    require(preds.size <= 64, s"bitmask fold supports at most 64 preds, got ${preds.size}")
    val am = preds.zipWithIndex.map { case (p, i) =>
      when(p.applicable, lit(1L << i)).otherwise(0L) }.reduce(_ + _)
    val bm = preds.zipWithIndex.map { case (p, i) =>
      when(p.applicable && p.bad, lit(1L << i)).otherwise(0L) }.reduce(_ + _)
    pages.withColumn("pday", pday)
      .withColumn("__am", am)
      .withColumn("__bm", bm)
  }

  // '.' in a check id would read as struct-field access in col()
  private def safe(id: String): String = id.replace('.', '_')

  /** The per-pred bitmask aggregate columns of the fused scan. */
  def predAggs(preds: Seq[Pred]): Seq[Column] =
    preds.zipWithIndex.flatMap { case (p, i) =>
      Seq(
        sum(shiftright(col("__am"), i).bitwiseAND(lit(1L))).as(s"${safe(p.id)}__n_rows"),
        sum(shiftright(col("__bm"), i).bitwiseAND(lit(1L))).as(s"${safe(p.id)}__bad"))
    }

  /** One wide per-pday aggregate over a [[maskFrame]]: the bitmask sums
    * plus caller-supplied extra aggregates — this is how the suite
    * rides its sampled-estimate counters on the SAME scan instead of
    * re-reading the table once per estimate family.
    */
  def wideByDay(masks: DataFrame, preds: Seq[Pred],
      extras: Seq[Column] = Nil): DataFrame = {
    val aggs = predAggs(preds) ++ extras
    masks.groupBy(col("pday")).agg(aggs.head, aggs.tail: _*)
  }

  /** Per-pday CheckResult rows from a [[wideByDay]] frame (wide → long:
    * one struct per check, exploded).
    */
  def resultsFromWide(wide: DataFrame, preds: Seq[Pred]): DataFrame = {
    val perCheck = preds.map { p =>
      struct(
        lit(p.id).as("check_id"),
        col(s"${safe(p.id)}__n_rows").as("n_rows"),
        col(s"${safe(p.id)}__bad").as("violations"),
        lit(p.threshold).as("threshold"))
    }
    wide.select(col("pday"), explode(array(perCheck: _*)).as("c"))
      .select(
        col("c.check_id"), col("pday"), col("c.n_rows"), col("c.violations"),
        when(col("c.n_rows") === 0, 1.0)
          .otherwise(lit(1.0) - col("c.violations").cast("double") / col("c.n_rows").cast("double"))
          .as("value"),
        col("c.threshold"))
      .withColumn("pass", col("value") >= col("threshold"))
      .drop("threshold")
      .orderBy("check_id", "pday")
  }

  /** Per-pday CheckResult rows from a [[maskFrame]]. */
  def resultsFromMasks(masks: DataFrame, preds: Seq[Pred]): DataFrame =
    resultsFromWide(wideByDay(masks, preds), preds)

  /** All predicate checks in ONE scan: per-pday CheckResult rows.
    * Output schema: (check_id, pday, rows, violations, value, pass),
    * sorted for determinism.
    */
  def resultsByDay(pages: DataFrame, preds: Seq[Pred] = Conformance.preds): DataFrame =
    resultsFromMasks(maskFrame(pages, preds), preds)

  /** Violation rows from a [[maskFrame]]: filter on `__bm != 0` (long
    * compare — the only expression pushed below the mask projection),
    * then explode one struct per set bit; detail strings are built only
    * for rows that passed the filter. Null entries are dropped AFTER
    * explode — the higher-order `filter(arr, lambda)` (ArrayFilter) is
    * CodegenFallback and would pull the projection out of whole-stage
    * codegen; explode + null-filter stays codegen'd.
    */
  def violationsFromMasks(masks: DataFrame, preds: Seq[Pred],
      ordered: Boolean = true): DataFrame = {
    val structs = preds.zipWithIndex.map { case (p, i) =>
      when(shiftright(col("__bm"), i).bitwiseAND(lit(1L)) === 1L,
        struct(lit(p.id).as("check_id"), lit(p.kind).as("kind"),
          coalesce(p.detail.cast("string"), lit("null")).as("detail")))
        .otherwise(lit(null))
    }
    val out = masks.where(col("__bm") =!= 0L)
      .select(explode(array(structs: _*)).as("f"), col("pday"),
        coalesce(col("url"), lit("null")).as("url"))
      .where(col("f").isNotNull)
      .select(col("f.check_id"), col("f.kind"), col("pday"), col("url"),
        col("f.detail"))
    if (ordered) out.orderBy("check_id", "url", "pday", "detail") else out
  }

  /** All predicate-check violations in ONE scan. `ordered=false` skips
    * the global sort (a range-partitioned sort executes the upstream
    * twice — sampling + sort — so sinks that don't need order, like the
    * suite's parquet violation log, must not pay for it).
    */
  def violations(pages: DataFrame, preds: Seq[Pred] = Conformance.preds,
      ordered: Boolean = true): DataFrame = {
    // Split the plan at the selective `__bm != 0` filter with a narrow,
    // defect-rate-bounded checkpoint. Two reasons:
    //  1. codegen: fused into ONE whole-stage span, the 23-pred mask
    //     bank + the 23-way detail-struct explode generate an 18.6k-line
    //     class whose processNext exceeds Janino's 64 KB method limit —
    //     the span silently fell back to interpreted eval AND re-ran
    //     the failing 18k-line compile on every execution (`ERROR
    //     CodeGenerator: ... Code grows beyond 64 KB` in every round-5
    //     bench log). Each half compiles fine on its own (the mask half
    //     is fused_results' span; the explode half is the suite's
    //     atoms-side span).
    //  2. the ordered spelling's range-partitioned sort executes its
    //     child twice (sampling + shuffle); after the checkpoint the
    //     child is a cheap explode of flagged narrow rows, not the
    //     corpus-scale mask scan.
    // The checkpoint holds only flagged rows with the payload columns
    // (text/html) dropped — details reference url/lang/warc_ts-class
    // columns only.
    val narrowPlan = maskFrame(pages, preds)
      .where(col("__bm") =!= 0L)
      .select(col("pday"), col("url"), col("lang"), col("warc_ts"), col("__bm"))
    // Materialize with whole-stage codegen OFF for this one plan: fused,
    // the synthesis CASE pyramid + the pred bank + the filter form a
    // single consume chain over the vectorized scan's currentVars, where
    // codegen cannot split methods — the result is a >64 KB processNext
    // that Janino rejects, a ~1.5 s failed compile, and a silent
    // per-operator fallback on EVERY execution (present in every
    // round-5 bench log). Per-operator codegen compiles the same
    // expressions split across operators and runs them compiled.
    val spark = pages.sparkSession
    val wscgKey = "spark.sql.codegen.wholeStage"
    val prev = spark.conf.get(wscgKey)
    val narrow =
      try { spark.conf.set(wscgKey, "false"); narrowPlan.localCheckpoint(true) }
      finally spark.conf.set(wscgKey, prev)
    violationsFromMasks(narrow, preds, ordered)
  }
}
