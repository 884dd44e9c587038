package graft

import graft.synth.PageSynth
import graft.checks.{Conformance, Drift}

/** DuckDB oracle SQL for every SQL-expressible query in [[SparkEntry]].
  *
  * Every oracle starts from the same deterministic page-table CTE
  * ([[PageSynth.duckCte]]) so the oracle validates the *whole* pipeline:
  * synthesis + check semantics. Column names and physical types
  * (BIGINT/DOUBLE/VARCHAR/BOOLEAN) are kept identical to the Spark
  * outputs because the driver hash-compares values under sorted column
  * names.
  */
object OracleSql {

  private val cte = PageSynth.duckCte
  private val hostRe = "^https?://([^/?]+)"
  private val hostExpr = s"regexp_extract(url, '$hostRe', 1)"

  /** (id, kind, applicableSql, badSql, detailSql, threshold) — DuckDB
    * renderings of [[Conformance.preds]], kept in lockstep by the
    * oracle-parity harness (tools/oracle_check.py).
    */
  val predsDuck: Seq[(String, String, String, String, String, Double)] = Seq(
    ("stats_null_ratio.url", "MissingValue", "TRUE", "url IS NULL", "'url is null'", 0.999),
    ("stats_null_ratio.warc_ts", "MissingValue", "TRUE", "warc_epoch IS NULL", "'warc_ts is null'", 0.99),
    ("stats_null_ratio.html", "MissingValue", "TRUE", "html IS NULL", "'html is null'", 0.99),
    ("stats_null_ratio.text", "MissingValue", "TRUE", "text IS NULL OR length(text) = 0", "'text is null or empty'", 0.99),
    ("stats_null_ratio.lang", "MissingValue", "TRUE", "lang IS NULL", "'lang is null'", 0.99),
    ("conform_url", "MalformedURI", "url IS NOT NULL",
      s"NOT regexp_matches(url, '${Conformance.UrlRegex}')", "url", 0.99),
    ("conform_lang", "IncorrectLanguageTag", "lang IS NOT NULL",
      s"NOT regexp_matches(lang, '${Conformance.LangRegex}')", "lang", 0.99),
    ("conform_ts", "OutOfRangeTimestamp", "warc_epoch IS NOT NULL",
      s"warc_epoch < ${PageSynth.TsMin} OR warc_epoch >= ${PageSynth.TsMax}",
      "cast(warc_epoch as varchar)", 0.99),
    ("conform_url_style", "ParametarisedURI",
      s"url IS NOT NULL AND regexp_matches(url, '${Conformance.UrlRegex}')",
      s"length(url) > ${Conformance.MaxUrlLen} OR strpos(url, '?') > 0", "url", 0.99),
    ("prolix_text", "ProlixConstruct",
      "text IS NOT NULL AND length(text) > 0",
      s"strpos(text, '${Conformance.ProlixPhrase}') > 0 OR regexp_matches(text, '${Conformance.ProlixRunRegex}')",
      "'prolix boilerplate construct'", 0.9),
    ("misused_shape.literal", "MisusedDatatypeProperty",
      "text IS NOT NULL AND length(text) > 0",
      s"regexp_matches(text, '${Conformance.MarkupRegex}')",
      "'markup in literal position'", 0.99),
    ("misused_shape.resource", "MisusedObjectProperty",
      "url IS NOT NULL",
      s"NOT regexp_matches(url, '${Conformance.SchemeRegex}')",
      "url", 0.99)
  )

  val pagesDump: String =
    s"$cte SELECT doc_id, url, warc_epoch, pday, sha256(decode(html)) AS html_sha, text, lang, host_id, host FROM pages ORDER BY doc_id"

  val fusedResults: String = {
    val parts = predsDuck.map { case (id, _, app, bad, _, thr) =>
      s"""SELECT '$id' AS check_id, pday,
         | CAST(sum(CASE WHEN $app THEN 1 ELSE 0 END) AS BIGINT) AS n_rows,
         | CAST(sum(CASE WHEN ($app) AND ($bad) THEN 1 ELSE 0 END) AS BIGINT) AS violations,
         | CAST($thr AS DOUBLE) AS threshold
         |FROM pages GROUP BY pday""".stripMargin
    }
    s"""$cte, per AS (${parts.mkString("\nUNION ALL\n")})
       |SELECT check_id, pday, n_rows, violations, value, value >= threshold AS pass FROM (
       |  SELECT check_id, pday, n_rows, violations, threshold,
       |    CASE WHEN n_rows = 0 THEN CAST(1.0 AS DOUBLE)
       |         ELSE 1.0 - CAST(violations AS DOUBLE) / CAST(n_rows AS DOUBLE) END AS value
       |  FROM per) t
       |ORDER BY check_id, pday""".stripMargin
  }

  val fusedViolations: String = {
    val parts = predsDuck.map { case (id, kind, app, bad, detail, _) =>
      s"""SELECT '$id' AS check_id, '$kind' AS kind, pday,
         | coalesce(url, 'null') AS url, coalesce(CAST($detail AS VARCHAR), 'null') AS detail
         |FROM pages WHERE ($app) AND ($bad)""".stripMargin
    }
    s"""$cte SELECT * FROM (${parts.mkString("\nUNION ALL\n")}) v
       |ORDER BY check_id, url, pday, detail""".stripMargin
  }

  val statsMinMax: String =
    s"""$cte SELECT pday, CAST(count(*) AS BIGINT) AS n_rows,
       | CAST(min(warc_epoch) AS BIGINT) AS min_epoch,
       | CAST(max(warc_epoch) AS BIGINT) AS max_epoch,
       | CAST(min(length(text)) AS BIGINT) AS min_text_len,
       | CAST(max(length(text)) AS BIGINT) AS max_text_len,
       | CAST(min(length(url)) AS BIGINT) AS min_url_len,
       | CAST(max(length(url)) AS BIGINT) AS max_url_len
       |FROM pages GROUP BY pday ORDER BY pday""".stripMargin

  val statsDistinct: String =
    s"""$cte SELECT pday, CAST(count(*) AS BIGINT) AS n_rows,
       | CAST(count(DISTINCT url) AS BIGINT) AS distinct_url,
       | CAST(count(DISTINCT lang) AS BIGINT) AS distinct_lang,
       | CAST(count(DISTINCT CASE WHEN $hostExpr <> '' THEN $hostExpr END) AS BIGINT) AS distinct_host
       |FROM pages GROUP BY pday ORDER BY pday""".stripMargin

  val uniqueUrl: String =
    s"""$cte, g AS (SELECT url, count(*) AS n FROM pages GROUP BY url)
       |SELECT CAST(sum(n) AS BIGINT) AS n_rows,
       | CAST(count(*) AS BIGINT) AS distinct_urls,
       | CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_urls,
       | CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT) AS dup_rows,
       | CAST(count(*) AS DOUBLE) / CAST(sum(n) AS DOUBLE) AS value
       |FROM g""".stripMargin

  val uniqueUrlGroups: String =
    s"""$cte SELECT url, CAST(count(*) AS BIGINT) AS n_rows,
       | CAST(count(DISTINCT pday) AS BIGINT) AS n_days
       |FROM pages GROUP BY url HAVING count(*) > 1 ORDER BY url""".stripMargin

  val dupTextGroups: String =
    s"""$cte SELECT sha256(text) AS text_sha, CAST(count(*) AS BIGINT) AS n_rows,
       | CAST(count(DISTINCT url) AS BIGINT) AS n_urls, min(url) AS min_url
       |FROM pages WHERE text IS NOT NULL AND length(text) > 0
       |GROUP BY sha256(text) HAVING count(*) > 1 ORDER BY text_sha""".stripMargin

  val latestSnapshot: String =
    s"""$cte SELECT url, CAST(warc_epoch AS BIGINT) AS warc_epoch FROM (
       | SELECT url, warc_epoch,
       |   row_number() OVER (PARTITION BY url ORDER BY warc_epoch DESC NULLS LAST) AS rn
       | FROM pages) t WHERE rn = 1 ORDER BY url""".stripMargin

  private def refDayOracle(factCte: String, dimSql: String, threshold: Double): String =
    s"""$cte, dim AS ($dimSql), wh AS ($factCte)
       |SELECT pday, n_rows, violations, value, value >= $threshold AS pass FROM (
       |  SELECT pday, CAST(count(*) AS BIGINT) AS n_rows,
       |    CAST(sum(CASE WHEN dim.k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS violations,
       |    1.0 - CAST(sum(CASE WHEN dim.k IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS value
       |  FROM wh LEFT JOIN dim ON wh.k = dim.k GROUP BY pday) t
       |ORDER BY pday""".stripMargin

  val refHostDay: String = refDayOracle(
    s"SELECT pday, $hostExpr AS k FROM pages WHERE $hostExpr <> ''",
    s"SELECT host AS k FROM (${PageSynth.hostDimDuck}) d", 0.99)

  val refHostUnknown: String =
    s"""$cte, dim AS (${PageSynth.hostDimDuck})
       |SELECT host, CAST(count(*) AS BIGINT) AS n_rows, min(url) AS min_url FROM (
       |  SELECT url, $hostExpr AS host FROM pages WHERE $hostExpr <> '') p
       |WHERE NOT EXISTS (SELECT 1 FROM dim WHERE dim.host = p.host)
       |GROUP BY host ORDER BY host""".stripMargin

  val refLangDay: String = refDayOracle(
    s"SELECT pday, lang AS k FROM pages WHERE lang IS NOT NULL AND regexp_matches(lang, '${Conformance.LangRegex}')",
    s"SELECT lang AS k FROM (${PageSynth.langDimDuck}) d", 0.98)

  val refLangUnknown: String =
    s"""$cte, dim AS (${PageSynth.langDimDuck})
       |SELECT lang, CAST(count(*) AS BIGINT) AS n_rows, min(url) AS min_url
       |FROM pages p
       |WHERE lang IS NOT NULL AND regexp_matches(lang, '${Conformance.LangRegex}')
       |  AND NOT EXISTS (SELECT 1 FROM dim WHERE dim.lang = p.lang)
       |GROUP BY lang ORDER BY lang""".stripMargin

  private val driftWindow =
    s"pday >= '${Drift.WindowLo}' AND pday < '${Drift.WindowHi}'"
  private val sideExpr =
    s"CASE WHEN pday >= '${Drift.SplitDay}' THEN 'cur' ELSE 'base' END"

  val driftLangHist: String =
    s"""$cte SELECT $sideExpr AS side, coalesce(lang, 'null') AS bin,
       | CAST(count(*) AS BIGINT) AS n
       |FROM pages WHERE $driftWindow GROUP BY 1, 2 ORDER BY side, bin""".stripMargin

  private def driftHists(binExpr: String): String =
    s"""w AS (SELECT $sideExpr AS side, $binExpr AS bin FROM pages WHERE $driftWindow),
       |h AS (SELECT side, bin, count(*) AS n FROM w GROUP BY side, bin),
       |b AS (SELECT DISTINCT bin FROM h),
       |j AS (SELECT b.bin,
       |  coalesce((SELECT n FROM h WHERE h.side = 'base' AND h.bin = b.bin), 0) AS cb,
       |  coalesce((SELECT n FROM h WHERE h.side = 'cur' AND h.bin = b.bin), 0) AS cc FROM b),
       |t AS (SELECT CAST(sum(cb) AS DOUBLE) AS tb, CAST(sum(cc) AS DOUBLE) AS tc,
       |  CAST(count(*) AS DOUBLE) AS k,
       |  CAST(sum(cb) AS BIGINT) AS base_rows, CAST(sum(cc) AS BIGINT) AS cur_rows,
       |  CAST(count(*) AS BIGINT) AS bins FROM j)""".stripMargin

  val driftLangPsi: String =
    s"""$cte, ${driftHists("coalesce(lang, 'null')")},
       |v AS (SELECT sum(
       |   ((CAST(cc AS DOUBLE) + 0.5) / (t.tc + 0.5 * t.k) - (CAST(cb AS DOUBLE) + 0.5) / (t.tb + 0.5 * t.k))
       |   * ln(((CAST(cc AS DOUBLE) + 0.5) / (t.tc + 0.5 * t.k)) / ((CAST(cb AS DOUBLE) + 0.5) / (t.tb + 0.5 * t.k)))
       | ) AS s FROM j, t)
       |SELECT 'drift_lang_psi' AS check_id, 'psi' AS stat, t.base_rows, t.cur_rows, t.bins,
       | round(v.s, 6) AS value, v.s <= ${Drift.PsiThreshold} AS pass FROM t, v""".stripMargin

  private val hourBin =
    "lpad(cast(CAST(floor((warc_epoch % 86400) / 3600.0) AS INT) as varchar), 2, '0')"

  val driftHourKs: String =
    s"""$cte, ${driftHists(hourBin)},
       |c AS (SELECT bin, sum(cb) OVER (ORDER BY bin) AS ab, sum(cc) OVER (ORDER BY bin) AS ac FROM j),
       |v AS (SELECT max(abs(CAST(ab AS DOUBLE) / t.tb - CAST(ac AS DOUBLE) / t.tc)) AS s FROM c, t)
       |SELECT 'drift_hour_ks' AS check_id, 'ks' AS stat, t.base_rows, t.cur_rows, t.bins,
       | round(v.s, 6) AS value, v.s <= ${Drift.KsThreshold} AS pass FROM t, v""".stripMargin

  private val u256 = graft.checks.Sampling.U256Sql

  val sampleUniform: String =
    s"""$cte SELECT CAST(count(*) AS BIGINT) AS n_rows,
       | CAST(sum(CASE WHEN $u256 < 51 THEN 1 ELSE 0 END) AS BIGINT) AS sampled,
       | CAST(sum(CASE WHEN $u256 < 51 THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS frac
       |FROM pages""".stripMargin

  val sampleStratifiedAlloc: String =
    s"""$cte SELECT host, stratum_rows,
       | least(CAST(25 AS BIGINT), CAST(floor((stratum_rows + 4) / 5.0) AS BIGINT)) AS sample_rows
       |FROM (
       |  SELECT $hostExpr AS host, CAST(count(*) AS BIGINT) AS stratum_rows
       |  FROM pages WHERE $hostExpr <> '' GROUP BY 1) t
       |ORDER BY host""".stripMargin

  val sampleStratifiedEqualAlloc: String =
    s"""$cte SELECT host, stratum_rows,
       | least(CAST(10 AS BIGINT), stratum_rows) AS sample_rows
       |FROM (
       |  SELECT $hostExpr AS host, CAST(count(*) AS BIGINT) AS stratum_rows
       |  FROM pages WHERE $hostExpr <> '' GROUP BY 1) t
       |ORDER BY host""".stripMargin

  val sampleStratifiedEqualRows: String =
    s"""$cte, wh AS (SELECT url, warc_epoch, $hostExpr AS host FROM pages WHERE $hostExpr <> ''),
       |r AS (SELECT host, url,
       |  row_number() OVER (PARTITION BY host ORDER BY md5(url), url, coalesce(warc_epoch, -1)) AS rnk,
       |  count(*) OVER (PARTITION BY host) AS n FROM wh)
       |SELECT host, url FROM r
       |WHERE rnk <= least(CAST(10 AS BIGINT), n)
       |ORDER BY host, url""".stripMargin

  val sampleStratifiedRows: String =
    s"""$cte, wh AS (SELECT url, warc_epoch, $hostExpr AS host FROM pages WHERE $hostExpr <> ''),
       |r AS (SELECT host, url,
       |  row_number() OVER (PARTITION BY host ORDER BY md5(url), url, coalesce(warc_epoch, -1)) AS rnk,
       |  count(*) OVER (PARTITION BY host) AS n FROM wh)
       |SELECT host, url FROM r
       |WHERE rnk <= least(CAST(25 AS BIGINT), CAST(floor((n + 4) / 5.0) AS BIGINT))
       |ORDER BY host, url""".stripMargin

  // ——— embedding / similarity oracles ———
  //
  // The vectors are derived from the driver's `embeddings` parquet
  // exactly as EmbSynth.vectors does (float→double widening + the
  // deterministic perturbed copies), and every cosine is an unrolled
  // left-associated sum — the same summation order as Spark's
  // aggregate() left fold — so the doubles match bit-for-bit before
  // rounding.

  private val simDim = graft.sim.Similarity.Dim
  private val copyOffset = graft.synth.EmbSynth.CopyIdOffset
  private val copyEvery = graft.synth.EmbSynth.CopyEvery

  private val vecCte: String =
    s"""WITH vecs AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + $copyOffset,
       |    list_transform(generate_series(1, len(embedding)), i ->
       |      CAST(embedding[i] AS DOUBLE) + (CAST((vec_id + i) % 7 AS DOUBLE) - 3.0) * 0.001) AS e
       |  FROM embeddings WHERE vec_id % $copyEvery = 0)""".stripMargin

  private def dotDuck(a: String, b: String): String =
    (1 to simDim).map(i => s"$a[$i] * $b[$i]").mkString(" + ")
  private def normDuckVec(a: String): String =
    s"sqrt(${(1 to simDim).map(i => s"$a[$i] * $a[$i]").mkString(" + ")})"
  private def cosDuck(a: String, b: String): String =
    s"(${dotDuck(a, b)}) / (${normDuckVec(a)} * ${normDuckVec(b)})"

  val knnBrute: String =
    s"""$vecCte,
       |q AS (SELECT vec_id AS query_id, e AS qv FROM vecs WHERE vec_id < 10),
       |s AS (SELECT query_id, v.vec_id AS neighbor_id,
       |        round(${cosDuck("qv", "v.e")}, 6) AS cos
       |      FROM vecs v JOIN q ON v.vec_id <> q.query_id),
       |r AS (SELECT query_id, neighbor_id, cos,
       |        CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
       |      FROM s)
       |SELECT query_id, neighbor_id, cos, rank FROM r WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin

  // knn_lsh oracle: the hyperplane band values are deterministic
  // literals (Similarity.Planes), so DuckDB recomputes each band's
  // sign-bit packing from the same unrolled left-associated dots and
  // restricts the ranked candidates to band-sharing pairs — end-to-end
  // value verification of the LSH retrieval path, not just the cosines.
  private def planeDotDuck(e: String, p: Int): String =
    (1 to simDim).map(i => s"$e[$i] * ${graft.sim.Similarity.Planes(p)(i - 1)}")
      .mkString(" + ")

  private def bandValDuck(e: String, band: Int, bandBits: Int): String =
    (0 until bandBits).map { j =>
      s"(CASE WHEN (${planeDotDuck(e, band * bandBits + j)}) > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  val knnLsh: String = {
    val bandBits = graft.sim.Similarity.KnnBandBits
    val numBands = graft.sim.Similarity.NumPlanes / bandBits
    val bandCols = (0 until numBands)
      .map(b => s"${bandValDuck("e", b, bandBits)} AS b$b").mkString(",\n|  ")
    val unioned = (0 until numBands)
      .map(b => s"SELECT vec_id, $b AS band_id, b$b AS band_val FROM cb")
      .mkString("\nUNION ALL\n")
    s"""$vecCte,
       |cb AS (SELECT vec_id,
       |  $bandCols
       |  FROM vecs),
       |cbl AS ($unioned),
       |qbl AS (SELECT vec_id AS query_id, band_id, band_val FROM cbl WHERE vec_id < 10),
       |cand AS (SELECT DISTINCT qbl.query_id, c.vec_id AS neighbor_id
       |         FROM cbl c JOIN qbl ON c.band_id = qbl.band_id AND c.band_val = qbl.band_val
       |         WHERE c.vec_id <> qbl.query_id),
       |s AS (SELECT cand.query_id, cand.neighbor_id,
       |        round(${cosDuck("vq.e", "vn.e")}, 6) AS cos
       |      FROM cand
       |      JOIN vecs vq ON vq.vec_id = cand.query_id
       |      JOIN vecs vn ON vn.vec_id = cand.neighbor_id),
       |r AS (SELECT query_id, neighbor_id, cos,
       |        CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
       |      FROM s)
       |SELECT query_id, neighbor_id, cos, rank FROM r WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin
  }

  // knn_ivf oracle: the k-means coarse quantizer is RE-TRAINED in SQL
  // (Similarity.ivfCentroidsTrained's exact procedure: hash-sampled
  // vec_id-ordered training set, smallest-vec_id seeds, rounded-cosine
  // assignment with ties → smallest cell_id, coordinate means summed in
  // vec_id order via list_aggregate and rounded to 6 dp, empty cells
  // keeping their previous centroid), then every vector is assigned to
  // its nearest trained cell, queries probe their NumProbes nearest
  // cells, and the ranked top-k is restricted to candidates in probed
  // cells — end-to-end value verification of the IVF retrieval path
  // including the TRAINING, quantizer and cell assignment.
  private def ivfTrainCtes(nCells: Int, iters: Int): (String, String) = {
    import graft.sim.Similarity.{TrainHashMul, TrainHashMod, TrainSampleLt, MaxTrainSample}
    // AS MATERIALIZED: without it DuckDB re-inlines each iteration's
    // CTEs into the next, and the unrolled 64-term cosine trees grow
    // exponentially across iterations (measured: the optimizer dies at
    // iteration 3)
    val sample =
      s"""vsamp AS MATERIALIZED (SELECT vec_id, e FROM vecs
         | WHERE (vec_id * $TrainHashMul) % $TrainHashMod < $TrainSampleLt
         | ORDER BY vec_id LIMIT $MaxTrainSample)""".stripMargin
    val init =
      s"""c0 AS MATERIALIZED (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cell_id, e AS ce
         | FROM (SELECT * FROM vsamp ORDER BY vec_id LIMIT $nCells) t0)""".stripMargin
    val meanList = (1 to simDim).map(i =>
      s"round(list_aggregate(list(e[$i] ORDER BY vec_id), 'sum') / count(*), 6)")
      .mkString("[", ", ", "]")
    val its = (1 to iters).map { k =>
      val p = k - 1
      s"""a$k AS MATERIALIZED (SELECT vec_id, e, cell_id FROM (
         |  SELECT s.vec_id, s.e, c.cell_id,
         |    row_number() OVER (PARTITION BY s.vec_id ORDER BY round(${cosDuck("s.e", "c.ce")}, 6) DESC, c.cell_id) AS rn
         |  FROM vsamp s CROSS JOIN c$p c) t$k WHERE rn = 1),
         |c$k AS MATERIALIZED (SELECT cell_id, $meanList AS ce FROM a$k GROUP BY cell_id
         |  UNION ALL SELECT c.cell_id, c.ce FROM c$p c
         |  WHERE NOT EXISTS (SELECT 1 FROM a$k a WHERE a.cell_id = c.cell_id))""".stripMargin
    }
    ((sample +: init +: its).mkString(",\n"), s"c$iters")
  }

  val knnIvf: String = {
    val nCells = graft.sim.Similarity.NumCells
    val nProbe = graft.sim.Similarity.NumProbes
    val (trainCtes, cFinal) = ivfTrainCtes(nCells, graft.sim.Similarity.TrainIters)
    s"""$vecCte,
       |$trainCtes,
       |cent AS (SELECT cell_id, ce FROM $cFinal),
       |a0 AS (SELECT v.vec_id, c.cell_id, round(${cosDuck("v.e", "c.ce")}, 6) AS cc
       |       FROM vecs v CROSS JOIN cent c),
       |ar AS (SELECT vec_id, cell_id,
       |         row_number() OVER (PARTITION BY vec_id ORDER BY cc DESC, cell_id) AS rn
       |       FROM a0),
       |asg AS (SELECT vec_id, cell_id FROM ar WHERE rn = 1),
       |probe AS (SELECT vec_id AS query_id, cell_id FROM ar WHERE rn <= $nProbe AND vec_id < 10),
       |cand AS (SELECT probe.query_id, asg.vec_id AS neighbor_id
       |         FROM probe JOIN asg USING (cell_id)
       |         WHERE asg.vec_id <> probe.query_id),
       |s AS (SELECT cand.query_id, cand.neighbor_id,
       |        round(${cosDuck("vq.e", "vn.e")}, 6) AS cos
       |      FROM cand
       |      JOIN vecs vq ON vq.vec_id = cand.query_id
       |      JOIN vecs vn ON vn.vec_id = cand.neighbor_id),
       |r AS (SELECT query_id, neighbor_id, cos,
       |        CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
       |      FROM s)
       |SELECT query_id, neighbor_id, cos, rank FROM r WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin
  }

  val embNearDup: String =
    s"""$vecCte,
       |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |        round(${cosDuck("a.e", "b.e")}, 6) AS cos
       |      FROM vecs a JOIN vecs b ON a.vec_id < b.vec_id)
       |SELECT id_a, id_b, cos FROM p WHERE cos >= 0.99 ORDER BY id_a, id_b""".stripMargin

  /** substr-based text extraction from decoded html; derived from the
    * same template constants as graft.multimodal.Multimodal.extractText
    * (lockstep by construction).
    */
  private val mmPrefixLen = graft.multimodal.Multimodal.PrefixLen
  private val mmStripLen = mmPrefixLen + graft.multimodal.Multimodal.Suffix.length
  private val extractTextDuck =
    s"substr(decode(html), ${mmPrefixLen + 1}, greatest(0, length(decode(html)) - $mmStripLen))"

  /** Fixed-offset license extraction; mirrors Multimodal.licenseOf. */
  private val licenseDuck =
    s"substr(decode(html), ${graft.multimodal.Multimodal.LicenseOffset + 1}, 10)"

  val mmHtmlMeta: String =
    s"""$cte SELECT pday, CAST(count(*) AS BIGINT) AS n_pages,
       | CAST(count(html) AS BIGINT) AS n_html,
       | CAST(coalesce(sum(octet_length(html)), 0) AS BIGINT) AS total_bytes,
       | CAST(sum(CASE WHEN html IS NOT NULL AND $extractTextDuck = text THEN 1 ELSE 0 END) AS BIGINT) AS n_roundtrip_ok
       |FROM pages GROUP BY pday ORDER BY pday""".stripMargin

  val mmHtmlDigests: String =
    s"""$cte SELECT url, sha256(decode(html)) AS html_sha,
       | CAST(octet_length(html) AS BIGINT) AS n_bytes,
       | CASE WHEN decode(html) LIKE '<!DOCTYPE html>%' THEN 'text/html'
       |      ELSE 'application/octet-stream' END AS sniffed_type
       |FROM pages WHERE html IS NOT NULL ORDER BY url""".stripMargin

  /** 16-bucket byte histogram oracle: bucket k of `(b*16)/256` is the
    * high nibble of byte b, i.e. the characters at odd positions of
    * `hex(html)`. `regexp_replace(h, '(.).', '\\1', 'g')` keeps exactly
    * those, and per-digit counts are length differences after replace.
    */
  val mmFeatures: String = {
    val nibbles = "regexp_replace(hex(html), '(.).', '\\1', 'g')"
    val histCols = "0123456789ABCDEF".zipWithIndex.map { case (d, k) =>
      s"CAST(sum(length(nibs) - length(replace(nibs, '$d', ''))) AS BIGINT) AS h${"%02d".format(k)}"
    }.mkString(",\n|       ")
    s"""$cte, feats AS (
       | SELECT pday, $nibbles AS nibs, octet_length(html) AS n_bytes
       | FROM pages WHERE html IS NOT NULL)
       |SELECT pday, CAST(count(*) AS BIGINT) AS n_payloads,
       |       CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
       |       $histCols
       |FROM feats GROUP BY pday ORDER BY pday""".stripMargin
  }

  // ——— text-analysis oracles ———

  private val nTokDuck =
    "CASE WHEN text IS NULL OR length(trim(text)) = 0 THEN 0 ELSE CAST(length(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) END"

  private def hitsDuck(words: Seq[String]): String =
    words.map(w =>
      s"(CASE WHEN strpos(' ' || coalesce(text, '') || ' ', ' $w ') > 0 THEN 1 ELSE 0 END)")
      .mkString("(", " + ", ")")

  private val profiles = graft.text.TextOps.StopwordProfiles
  private val scoreCols = profiles.map { case (l, ws) => s"${hitsDuck(ws)} AS s_$l" }.mkString(", ")
  private val bestExpr = profiles.map(p => s"s_${p._1}").mkString("greatest(", ", ", ")")
  private val totExpr = profiles.map(p => s"s_${p._1}").mkString("(", " + ", ")")
  /** Banded detector (mirrors TextOps.bandedArgmax): relations must
    * expose `ntok`, `best`, `tot` alongside the s_* scores.
    */
  private val detectedDuck = {
    val argmax = profiles.map { case (l, _) => s"WHEN s_$l = best THEN '$l'" }
    val amx = s"CASE ${argmax.mkString(" ")} ELSE 'und' END"
    val thr = s"(CASE WHEN ntok >= ${graft.text.TextOps.LongBandTokens} " +
      s"THEN ${graft.text.TextOps.LongConfidence} ELSE ${graft.text.TextOps.ShortConfidence} END)"
    s"""(CASE WHEN ntok <= ${graft.text.TextOps.WordBandTokens}
       | THEN (CASE WHEN tot >= 1 AND best = tot THEN $amx ELSE 'und' END)
       | WHEN best >= 2 AND CAST(best AS DOUBLE) / CAST(tot AS DOUBLE) >= $thr THEN $amx
       | ELSE 'und' END)""".stripMargin.replace('\n', ' ')
  }
  /** Lexicon hits of the DECLARED language (TextOps.declaredHitsFromStats). */
  private val declHitsDuck = {
    val cases = profiles.map { case (l, _) => s"WHEN lang = '$l' THEN s_$l" }
    s"(CASE ${cases.mkString(" ")} ELSE 0 END)"
  }
  private val profLangList = profiles.map(p => s"'${p._1}'").mkString(", ")

  val textTokens: String =
    s"""$cte SELECT pday, CAST(count(*) AS BIGINT) AS n_docs,
       | CAST(sum(n_tok) AS BIGINT) AS total_tokens,
       | CAST(min(n_tok) AS BIGINT) AS min_tokens,
       | CAST(max(n_tok) AS BIGINT) AS max_tokens
       |FROM (SELECT pday, $nTokDuck AS n_tok FROM pages) t
       |GROUP BY pday ORDER BY pday""".stripMargin

  val textQuality: String =
    s"""$cte, q0 AS (
       | SELECT pday, CAST($nTokDuck AS DOUBLE) AS n_tok,
       |   CAST(coalesce(length(text), 0) AS DOUBLE) AS n_chars,
       |   CAST(${hitsDuck(profiles.head._2)} AS DOUBLE) AS s_en
       | FROM pages WHERE text IS NOT NULL),
       |q1 AS (
       | SELECT pday,
       |   least(n_tok / CAST(20.0 AS DOUBLE), CAST(1.0 AS DOUBLE)) * 0.4
       |   + (CASE WHEN n_tok > 0 AND (n_chars - (n_tok - 1)) / n_tok >= CAST(3.0 AS DOUBLE)
       |           AND (n_chars - (n_tok - 1)) / n_tok <= CAST(10.0 AS DOUBLE)
       |      THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.5 AS DOUBLE) END) * 0.3
       |   + least(s_en / CAST(3.0 AS DOUBLE), CAST(1.0 AS DOUBLE)) * 0.3 AS q
       | FROM q0)
       |SELECT pday, CAST(count(*) AS BIGINT) AS n_docs, round(avg(q), 6) AS avg_quality,
       | CAST(sum(CASE WHEN q < 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_low_quality
       |FROM q1 GROUP BY pday ORDER BY pday""".stripMargin

  val textLangId: String =
    s"""$cte, s AS (
       | SELECT coalesce(lang, 'null') AS declared, $nTokDuck AS ntok, $scoreCols
       | FROM pages WHERE text IS NOT NULL AND length(text) > 0),
       |d AS (SELECT declared, $detectedDuck AS detected FROM (SELECT *, $bestExpr AS best, $totExpr AS tot FROM s) t)
       |SELECT declared, detected, CAST(count(*) AS BIGINT) AS n
       |FROM d GROUP BY declared, detected ORDER BY declared, detected""".stripMargin

  val textDeclaredVsDerived: String = {
    val wb = graft.text.TextOps.WordBandTokens
    s"""$cte, s AS (
       | SELECT pday, lang, $nTokDuck AS ntok, $scoreCols
       | FROM pages WHERE text IS NOT NULL AND length(text) > 0 AND lang IS NOT NULL),
       |d AS (SELECT pday, lang, ntok, $declHitsDuck AS dhits, $detectedDuck AS detected
       |      FROM (SELECT *, $bestExpr AS best, $totExpr AS tot FROM s) t)
       |SELECT pday, n_rows, violations, n_und, value, value >= 0.5 AS pass FROM (
       | SELECT pday,
       |   CAST(sum(CASE WHEN ntok <= $wb THEN (CASE WHEN lang IN ($profLangList) THEN 1 ELSE 0 END)
       |                 ELSE (CASE WHEN detected <> 'und' THEN 1 ELSE 0 END) END) AS BIGINT) AS n_rows,
       |   CAST(sum(CASE WHEN ntok <= $wb THEN (CASE WHEN lang IN ($profLangList) AND dhits = 0 THEN 1 ELSE 0 END)
       |                 ELSE (CASE WHEN detected <> 'und' AND lang <> detected THEN 1 ELSE 0 END) END) AS BIGINT) AS violations,
       |   CAST(sum(CASE WHEN ntok > $wb AND detected = 'und' THEN 1 ELSE 0 END) AS BIGINT) AS n_und
       | FROM d GROUP BY pday) a,
       |LATERAL (SELECT CASE WHEN n_rows = 0 THEN CAST(1.0 AS DOUBLE)
       |    ELSE 1.0 - CAST(violations AS DOUBLE) / CAST(n_rows AS DOUBLE) END AS value) v
       |ORDER BY pday""".stripMargin
  }

  // ——— near-duplicate (dedup) oracles ———
  //
  // Full value oracles for the LSH family: both engines hash with md5
  // (shingles → 28-bit ints, tokens → 60-bit ints), so DuckDB can
  // recompute the exact jaccard / simhash values. The oracle side is
  // brute force over the *collapsed* distinct-text groups (O(g²), g ≈
  // distinct texts — fine at oracle scale); the Spark side is banded
  // LSH. They agree iff LSH candidate recall is 1 on the fixture's
  // true pairs, which holds deterministically for the injected A/B
  // (J = 0.8, miss ≈ 3e-6) and C/C′ (J ≈ 0.98) pairs — and simhash
  // chunking has recall 1 *by construction* (pigeonhole).

  private def hex7Duck(e: String): String =
    (1 to 7).map(i =>
      s"(instr('0123456789abcdef', substr($e, $i, 1)) - 1) * ${1L << (4 * (7 - i))}")
      .mkString("(", " + ", ")")

  private def hex15Duck(e: String): String =
    (1 to 15).map(i =>
      s"(instr('0123456789abcdef', substr($e, $i, 1)) - 1) * ${1L << (4 * (15 - i))}")
      .mkString("(", " + ", ")")

  private val normDuckExpr = "regexp_replace(trim(text), '\\s+', ' ', 'g')"

  /** Collapsed distinct-text groups (mirror of Dedup.corpusGroups). */
  private val dedupGroupsCte: String =
    s""", ddocs AS (
       |  SELECT url, norm FROM (SELECT url, $normDuckExpr AS norm FROM pages WHERE text IS NOT NULL) t
       |  WHERE length(norm) > 0),
       |grp AS (
       |  SELECT md5(norm) AS fp, min(url) AS rep, min(norm) AS norm,
       |    CAST(count(*) AS BIGINT) AS n_docs
       |  FROM ddocs GROUP BY md5(norm))""".stripMargin

  /** Hashed shingle sets + brute-force verified jaccard pairs. */
  private val minhashPairsCte: String = {
    val n = graft.dedup.Dedup.ShingleSize
    s""", w AS (SELECT rep, n_docs, norm, string_split(norm, ' ') AS toks FROM grp),
       |shl AS (SELECT rep, n_docs,
       |  CASE WHEN len(toks) < $n THEN [norm]
       |       ELSE list_distinct(list_transform(generate_series(1, len(toks) - ${n - 1}),
       |              i -> ${(0 until n).map(k => s"toks[i+$k]").mkString(" || ' ' || ")})) END AS sgs
       |  FROM w),
       |shs AS (SELECT rep, n_docs,
       |  list_distinct(list_transform(sgs, s -> ${hex7Duck("md5(s)")})) AS hs
       |  FROM shl),
       |bp AS (
       |  SELECT a.rep AS url_a, b.rep AS url_b,
       |    round(CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE)
       |        / CAST(len(list_distinct(list_concat(a.hs, b.hs))) AS DOUBLE), 6) AS jaccard,
       |    a.n_docs AS n_docs_a, b.n_docs AS n_docs_b
       |  FROM shs a JOIN shs b ON a.rep < b.rep)""".stripMargin
  }

  val dedupMinhashPairs: String =
    s"""$cte$dedupGroupsCte$minhashPairsCte
       |SELECT url_a, url_b, jaccard, n_docs_a, n_docs_b FROM bp
       |WHERE jaccard >= ${graft.dedup.Dedup.JaccardThreshold}
       |ORDER BY url_a, url_b""".stripMargin

  private val simhashExprDuck: String =
    (0 until graft.dedup.Dedup.SimhashBits).map { i =>
      s"(CASE WHEN list_sum(list_transform(ts, t -> ((t >> $i) & 1) * 2 - 1)) > 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  val dedupSimhashPairs: String =
    s"""$cte$dedupGroupsCte, tok AS (
       |  SELECT rep, n_docs,
       |    list_transform(string_split(norm, ' '), t -> ${hex15Duck("md5(t)")}) AS ts
       |  FROM grp),
       |sh AS (SELECT rep, n_docs, $simhashExprDuck AS h FROM tok)
       |SELECT a.rep AS url_a, b.rep AS url_b,
       |  CAST(bit_count(xor(a.h, b.h)) AS BIGINT) AS hamming,
       |  a.n_docs AS n_docs_a, b.n_docs AS n_docs_b
       |FROM sh a JOIN sh b ON a.rep < b.rep
       |WHERE bit_count(xor(a.h, b.h)) <= ${graft.dedup.Dedup.HammingThreshold}
       |ORDER BY url_a, url_b""".stripMargin

  /** Connected components over the verified pair graph via a recursive
    * min-reachable-label CTE, fanned out to member documents.
    */
  val dedupClusters: String = {
    val cteRec = cte.replaceFirst("WITH ", "WITH RECURSIVE ")
    s"""$cteRec$dedupGroupsCte$minhashPairsCte,
       |e0 AS (SELECT url_a, url_b FROM bp WHERE jaccard >= ${graft.dedup.Dedup.JaccardThreshold}),
       |bidir AS (SELECT url_a AS src, url_b AS dst FROM e0 UNION ALL SELECT url_b, url_a FROM e0),
       |nodes AS (SELECT DISTINCT src AS n FROM bidir UNION SELECT rep FROM grp WHERE n_docs > 1),
       |reach(n, m) AS (
       |  SELECT n, n FROM nodes
       |  UNION
       |  SELECT b.dst, r.m FROM reach r JOIN bidir b ON b.src = r.n),
       |lab AS (SELECT n, min(m) AS cluster_rep FROM reach GROUP BY n)
       |SELECT DISTINCT d.url, l.cluster_rep
       |FROM (SELECT url, md5(norm) AS fp FROM ddocs) d
       |JOIN grp g ON g.fp = d.fp
       |JOIN lab l ON l.n = g.rep
       |ORDER BY url, cluster_rep""".stripMargin
  }

  /** Per-cluster doc counts from the same recursive component CTE:
    * members = Σ n_docs over the cluster's distinct-text groups.
    */
  val dedupClusterSizes: String = {
    val cteRec = cte.replaceFirst("WITH ", "WITH RECURSIVE ")
    s"""$cteRec$dedupGroupsCte$minhashPairsCte,
       |e0 AS (SELECT url_a, url_b FROM bp WHERE jaccard >= ${graft.dedup.Dedup.JaccardThreshold}),
       |bidir AS (SELECT url_a AS src, url_b AS dst FROM e0 UNION ALL SELECT url_b, url_a FROM e0),
       |nodes AS (SELECT DISTINCT src AS n FROM bidir UNION SELECT rep FROM grp WHERE n_docs > 1),
       |reach(n, m) AS (
       |  SELECT n, n FROM nodes
       |  UNION
       |  SELECT b.dst, r.m FROM reach r JOIN bidir b ON b.src = r.n),
       |lab AS (SELECT n, min(m) AS cluster_rep FROM reach GROUP BY n)
       |SELECT l.cluster_rep, CAST(sum(g.n_docs) AS BIGINT) AS n_docs,
       |  CAST(count(*) AS BIGINT) AS n_reps
       |FROM lab l JOIN grp g ON g.rep = l.n
       |GROUP BY l.cluster_rep ORDER BY cluster_rep""".stripMargin
  }

  // ——— graph / interlinking oracles (MapDBGraph analog) ———

  /** Mirrors Interlinking.sameAsEdges: content-identity star edges. */
  val graphSameAsEdges: String =
    s"""$cte, d0 AS (SELECT url, md5($normDuckExpr) AS fp FROM pages
       |  WHERE text IS NOT NULL AND length($normDuckExpr) > 0),
       |r AS (SELECT fp, min(url) AS same_as FROM d0 GROUP BY fp HAVING count(*) > 1)
       |SELECT DISTINCT d0.url, r.same_as FROM d0 JOIN r ON d0.fp = r.fp
       |WHERE d0.url <> r.same_as ORDER BY url, same_as""".stripMargin

  /** Mirrors Interlinking.hostNeighbors: shared-content host adjacency
    * with the same hosts-per-fingerprint cap.
    */
  val graphHostNeighbors: String =
    s"""$cte, fh AS (SELECT DISTINCT md5($normDuckExpr) AS fp, $hostExpr AS host FROM pages
       |  WHERE text IS NOT NULL AND length($normDuckExpr) > 0 AND $hostExpr <> ''),
       |keep AS (SELECT fp FROM fh GROUP BY fp HAVING count(*) <= ${graft.graph.Interlinking.MaxHostsPerFp}),
       |k AS (SELECT fh.fp, fh.host FROM fh JOIN keep ON fh.fp = keep.fp),
       |e AS (SELECT DISTINCT a.host AS host, b.host AS nbr
       |      FROM k a JOIN k b ON a.fp = b.fp AND a.host <> b.host)
       |SELECT host, CAST(count(*) AS BIGINT) AS n_neighbors,
       |  string_agg(nbr, ',' ORDER BY nbr) AS neighbors
       |FROM e GROUP BY host ORDER BY host""".stripMargin

  val textFingerprintGroups: String =
    s"""$cte SELECT fp, CAST(count(*) AS BIGINT) AS n_rows, min(url) AS min_url FROM (
       | SELECT md5(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS fp, url
       | FROM pages WHERE text IS NOT NULL AND length(text) > 0) t
       |GROUP BY fp HAVING count(*) > 1 ORDER BY fp""".stripMargin

  // ——— completeness / exists / estimated / multi-lang oracles ———

  /** Mirrors Completeness.condEval: absent member always violates;
    * present member violates when `count op value` fails.
    */
  private val condViolDuck: String =
    """(o.lang IS NULL OR NOT (CASE cld.cond_op
      |  WHEN '<' THEN o.n < cld.cond_val WHEN '>' THEN o.n > cld.cond_val
      |  WHEN '=' THEN o.n = cld.cond_val WHEN '<=' THEN o.n <= cld.cond_val
      |  ELSE o.n >= cld.cond_val END))""".stripMargin.replace('\n', ' ')

  private val completenessBase: String =
    s""", cobs AS (
       |  SELECT pday, lang, CAST(count(*) AS BIGINT) AS n FROM pages
       |  WHERE lang IS NOT NULL GROUP BY pday, lang),
       |cdays AS (SELECT DISTINCT pday FROM pages),
       |cld AS (${PageSynth.langCondDimDuck})""".stripMargin

  val completenessExpected: String =
    s"""$cte$completenessBase
       |SELECT pday, n_rows, violations, value, value >= 1.0 AS pass FROM (
       |  SELECT d.pday, CAST(count(*) AS BIGINT) AS n_rows,
       |    CAST(sum(CASE WHEN $condViolDuck THEN 1 ELSE 0 END) AS BIGINT) AS violations,
       |    1.0 - CAST(sum(CASE WHEN $condViolDuck THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS value
       |  FROM cdays d CROSS JOIN cld
       |  LEFT JOIN cobs o ON o.pday = d.pday AND o.lang = cld.lang
       |  GROUP BY d.pday) t
       |ORDER BY pday""".stripMargin

  val completenessMissing: String =
    s"""$cte$completenessBase
       |SELECT 'completeness_lang_day' AS check_id, 'MissingExpectedMember' AS kind,
       |  d.pday AS pday, '*' AS url,
       |  CASE WHEN o.lang IS NULL
       |    THEN 'expected lang ''' || cld.lang || ''' absent (cond ' || cld.cond_op || ' ' || cld.cond_val || ')'
       |    ELSE 'expected lang ''' || cld.lang || ''' count ' || o.n || ' fails cond ' || cld.cond_op || ' ' || cld.cond_val
       |  END AS detail
       |FROM cdays d CROSS JOIN cld
       |LEFT JOIN cobs o ON o.pday = d.pday AND o.lang = cld.lang
       |WHERE $condViolDuck
       |ORDER BY d.pday, detail""".stripMargin

  private val existsPreds: Seq[(String, String)] = Seq(
    ("exists_html", "html IS NOT NULL"),
    ("exists_https_url", "url LIKE 'https://%'"),
    ("exists_en_text", "lang = 'en' AND text IS NOT NULL AND length(text) > 0"))

  val existsChecks: String = {
    val parts = existsPreds.map { case (id, w) =>
      s"""SELECT '$id' AS check_id,
         | CAST(CASE WHEN EXISTS(SELECT 1 FROM pages WHERE $w) THEN 1 ELSE 0 END AS BIGINT) AS value,
         | EXISTS(SELECT 1 FROM pages WHERE $w) AS pass""".stripMargin
    }
    s"$cte ${parts.mkString("\nUNION ALL\n")}"
  }

  /** Mirrors Sampling.estimatedUrlConformance: the conform_url check
    * over the deterministic u256<51 sample, scaled by the measured
    * ratio (identical double-op order → identical estimates).
    */
  val estConformUrl: String =
    s"""$cte SELECT pday, n_rows, sampled, violations, value, value >= 0.99 AS pass FROM (
       | SELECT pday, n_rows, sampled,
       |   CASE WHEN sampled = 0 THEN CAST(0 AS BIGINT)
       |        ELSE CAST(round(CAST(bad_sampled AS DOUBLE) * CAST(n_rows AS DOUBLE) / CAST(sampled AS DOUBLE), 0) AS BIGINT) END AS violations,
       |   CASE WHEN sampled = 0 THEN CAST(1.0 AS DOUBLE)
       |        ELSE 1.0 - CAST(bad_sampled AS DOUBLE) / CAST(sampled AS DOUBLE) END AS value
       | FROM (
       |   SELECT pday,
       |     CAST(sum(CASE WHEN url IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_rows,
       |     CAST(sum(CASE WHEN url IS NOT NULL AND $u256 < 51 THEN 1 ELSE 0 END) AS BIGINT) AS sampled,
       |     CAST(sum(CASE WHEN url IS NOT NULL AND $u256 < 51 AND NOT regexp_matches(url, '${Conformance.UrlRegex}') THEN 1 ELSE 0 END) AS BIGINT) AS bad_sampled
       |   FROM pages GROUP BY pday) a) b
       |ORDER BY pday""".stripMargin

  /** Mirrors Sampling.estimatedDeclaredVsDerived: the declared-vs-
    * derived check over the deterministic u256<51 sample, scaled by the
    * measured ratio (identical double-op order → identical estimates).
    */
  val estDeclaredVsDerived: String =
    s"""$cte, s AS (
       | SELECT pday, lang, text, url, $nTokDuck AS ntok, $scoreCols FROM pages),
       |d AS (SELECT pday, lang, text, url, $detectedDuck AS detected
       |      FROM (SELECT *, $bestExpr AS best, $totExpr AS tot FROM s) t)
       |SELECT pday, n_rows, sampled, violations, value, value >= 0.5 AS pass FROM (
       | SELECT pday, n_rows, sampled,
       |   CASE WHEN sampled = 0 THEN CAST(0 AS BIGINT)
       |        ELSE CAST(round(CAST(bad_sampled AS DOUBLE) * CAST(n_rows AS DOUBLE) / CAST(sampled AS DOUBLE), 0) AS BIGINT) END AS violations,
       |   CASE WHEN sampled = 0 THEN CAST(1.0 AS DOUBLE)
       |        ELSE 1.0 - CAST(bad_sampled AS DOUBLE) / CAST(sampled AS DOUBLE) END AS value
       | FROM (
       |   SELECT pday,
       |     CAST(sum(CASE WHEN text IS NOT NULL AND length(text) > 0 AND lang IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_rows,
       |     CAST(sum(CASE WHEN text IS NOT NULL AND length(text) > 0 AND lang IS NOT NULL AND $u256 < 51 AND detected <> 'und' THEN 1 ELSE 0 END) AS BIGINT) AS sampled,
       |     CAST(sum(CASE WHEN text IS NOT NULL AND length(text) > 0 AND lang IS NOT NULL AND $u256 < 51 AND detected <> 'und' AND detected <> lang THEN 1 ELSE 0 END) AS BIGINT) AS bad_sampled
       |   FROM d GROUP BY pday) a) b
       |ORDER BY pday""".stripMargin

  /** #33's composition: equal-allocation stratified sample (distinct
    * urls, min(cap, n) smallest md5 per host) × declared-vs-derived,
    * scaled per host. Mirrors
    * Sampling.estimatedDeclaredVsDerivedStratified.
    */
  val estDeclaredVsDerivedStratified: String =
    s"""$cte,
       |wh AS (SELECT host, url, text, lang FROM (
       |  SELECT $hostExpr AS host, url, text, lang FROM pages
       |  WHERE text IS NOT NULL AND length(text) > 0 AND lang IS NOT NULL) x
       |  WHERE host <> ''),
       |u AS (SELECT DISTINCT host, url FROM wh),
       |rk AS (SELECT host, url,
       |  row_number() OVER (PARTITION BY host ORDER BY md5(url), url) AS rnk FROM u),
       |smp AS (SELECT host, url FROM rk WHERE rnk <= 10),
       |j AS (SELECT wh.host, wh.lang, $nTokDuck AS ntok, $scoreCols, (smp.url IS NOT NULL) AS in_s
       |      FROM wh LEFT JOIN smp ON wh.host = smp.host AND wh.url = smp.url),
       |d AS (SELECT host, lang, in_s, $detectedDuck AS detected
       |      FROM (SELECT *, $bestExpr AS best, $totExpr AS tot FROM j) t),
       |a AS (SELECT host, CAST(count(*) AS BIGINT) AS n_rows,
       |  CAST(sum(CASE WHEN in_s AND detected <> 'und' THEN 1 ELSE 0 END) AS BIGINT) AS sampled,
       |  CAST(sum(CASE WHEN in_s AND detected <> 'und' AND detected <> lang THEN 1 ELSE 0 END) AS BIGINT) AS bad
       |  FROM d GROUP BY host)
       |SELECT host, n_rows, sampled, violations, value, value >= 0.5 AS pass FROM (
       | SELECT host, n_rows, sampled,
       |   CASE WHEN sampled = 0 THEN CAST(0 AS BIGINT)
       |        ELSE CAST(round(CAST(bad AS DOUBLE) * CAST(n_rows AS DOUBLE) / CAST(sampled AS DOUBLE), 0) AS BIGINT) END AS violations,
       |   CASE WHEN sampled = 0 THEN CAST(1.0 AS DOUBLE)
       |        ELSE 1.0 - CAST(bad AS DOUBLE) / CAST(sampled AS DOUBLE) END AS value
       | FROM a) t ORDER BY host""".stripMargin

  /** Mirrors Provenance.hostFlags / verdict: per-dataset (host)
    * provenance-marker flags via groupBy + max (#25/#26 analog).
    */
  private val provFlagsBase: String =
    s"""pflags AS (
       | SELECT $hostExpr AS host, CAST(count(*) AS BIGINT) AS n_rows,
       |   CAST(max(CASE WHEN url IS NOT NULL AND regexp_matches(url, '${Conformance.UrlRegex}') AND url LIKE 'https://%' THEN 1 ELSE 0 END) AS BIGINT) AS has_https,
       |   CAST(max(CASE WHEN text IS NOT NULL AND length(text) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS has_text
       | FROM pages WHERE $hostExpr <> '' GROUP BY 1)""".stripMargin

  val provHostFlags: String =
    s"""$cte, $provFlagsBase
       |SELECT host, n_rows, has_https, has_text FROM pflags ORDER BY host""".stripMargin

  val provVerdict: String =
    s"""$cte, $provFlagsBase
       |SELECT CAST(count(*) AS BIGINT) AS n_rows,
       | CAST(sum(CASE WHEN has_https = 1 AND has_text = 1 THEN 0 ELSE 1 END) AS BIGINT) AS violations,
       | 1.0 - CAST(sum(CASE WHEN has_https = 1 AND has_text = 1 THEN 0 ELSE 1 END) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS value,
       | (1.0 - CAST(sum(CASE WHEN has_https = 1 AND has_text = 1 THEN 0 ELSE 1 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)) >= 0.9 AS pass
       |FROM pflags""".stripMargin

  /** Mirrors Disjoint.verdict / violatingEntities: entity = url,
    * classes = script families of its observed langs, disjoint pair =
    * (latin, cjk).
    */
  private val disjointEnt =
    s"""fams AS (${graft.checks.Disjoint.famDimDuck}), ent AS (
       | SELECT p.url,
       |   bool_or(f.family = 'latin') AS latin, bool_or(f.family = 'cjk') AS cjk,
       |   list_sort(list(DISTINCT f.family)) AS fam_list,
       |   list_sort(list(DISTINCT p.lang)) AS lang_list
       | FROM pages p JOIN fams f ON p.lang = f.lang
       | GROUP BY p.url)""".stripMargin

  val disjointLang: String =
    s"""$cte, $disjointEnt
       |SELECT CAST(count(*) AS BIGINT) AS n_entities,
       |  CAST(sum(CASE WHEN latin AND cjk THEN 1 ELSE 0 END) AS BIGINT) AS violations,
       |  1.0 - CAST(sum(CASE WHEN latin AND cjk THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS value,
       |  (1.0 - CAST(sum(CASE WHEN latin AND cjk THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)) >= 0.99 AS pass
       |FROM ent""".stripMargin

  // ——— #7/#8 domain/range two-pass oracles ———

  /** Mirrors DomainRange: pass-1 entity families, pass-2 per-row check
    * against the host's declared domain class, closure-widened (the
    * allowed-family sets are resolved from the same Scala taxonomy the
    * Spark side uses, so 'alphabetic' accepts latin only via
    * latin ⊑ alphabetic).
    */
  private def domainRangeBase(sampled: Boolean): String = {
    import graft.checks.{Disjoint, DomainRange}
    val sampleW = if (sampled) s" AND $u256 < 51" else ""
    val fams = Disjoint.Families.map(_._2).distinct
    val famCols = fams.map(f => s"bool_or(f.family = '$f') AS f_$f").mkString(", ")
    def allowed(dc: String): Seq[String] =
      fams.filter(f => Disjoint.ancestors(f, Disjoint.SubClassOf).contains(dc))
    val violExpr = Seq("alphabetic", "logographic").map(dc =>
      s"WHEN '$dc' THEN NOT (${allowed(dc).map(f => s"em.f_$f").mkString(" OR ")})")
      .mkString("CASE dd.domain_class ", " ", " END")
    s""", ddim AS (${PageSynth.hostDimDuck}),
       |dd AS (SELECT host,
       |  CASE WHEN CAST(regexp_extract(host, '^h([0-9]{3})\\.', 1) AS BIGINT) % ${DomainRange.CjkDomainMod} = ${DomainRange.CjkDomainRem}
       |       THEN 'logographic' ELSE 'alphabetic' END AS domain_class FROM ddim),
       |drfams AS (${Disjoint.famDimDuck}),
       |em AS (SELECT p.url, $famCols
       |  FROM pages p JOIN drfams f ON p.lang = f.lang
       |  WHERE TRUE$sampleW GROUP BY p.url),
       |drj AS (SELECT ph.url, ph.host, dd.domain_class, $violExpr AS viol
       |  FROM (SELECT url, lang, $hostExpr AS host FROM pages) ph
       |  JOIN dd ON dd.host = ph.host JOIN em ON em.url = ph.url
       |  WHERE ph.lang IS NOT NULL AND ph.host <> '')""".stripMargin
  }

  private def domainRangeVerdict(sampled: Boolean): String =
    s"""$cte${domainRangeBase(sampled)}
       |SELECT n_rows, violations,
       |  CASE WHEN n_rows = 0 THEN 1.0
       |       ELSE 1.0 - CAST(violations AS DOUBLE) / CAST(n_rows AS DOUBLE) END AS value,
       |  (CASE WHEN n_rows = 0 THEN 1.0
       |       ELSE 1.0 - CAST(violations AS DOUBLE) / CAST(n_rows AS DOUBLE) END) >= 0.8 AS pass
       |FROM (SELECT CAST(count(*) AS BIGINT) AS n_rows,
       |  CAST(sum(CASE WHEN viol THEN 1 ELSE 0 END) AS BIGINT) AS violations FROM drj) t""".stripMargin

  val domainRange: String = domainRangeVerdict(sampled = false)
  val estDomainRange: String = domainRangeVerdict(sampled = true)

  /** Mirrors DomainRange.usages: the grouped problem bag. */
  val domainRangeUsages: String =
    s"""$cte${domainRangeBase(sampled = false)}
       |SELECT host, domain_class, CAST(count(*) AS BIGINT) AS n_rows,
       |  CAST(count(DISTINCT url) AS BIGINT) AS n_urls, min(url) AS min_url
       |FROM drj WHERE viol GROUP BY host, domain_class ORDER BY host""".stripMargin

  /** Mirrors Disjoint.estimatedVerdict: the disjoint check over the
    * entity-keyed (md5(url)) uniform sample.
    */
  val estDisjointLang: String =
    s"""$cte, fams AS (${graft.checks.Disjoint.famDimDuck}), ent AS (
       | SELECT p.url,
       |   bool_or(f.family = 'latin') AS latin, bool_or(f.family = 'cjk') AS cjk
       | FROM pages p JOIN fams f ON p.lang = f.lang
       | WHERE $u256 < 51
       | GROUP BY p.url)
       |SELECT CAST(count(*) AS BIGINT) AS n_entities,
       |  CAST(sum(CASE WHEN latin AND cjk THEN 1 ELSE 0 END) AS BIGINT) AS violations,
       |  1.0 - CAST(sum(CASE WHEN latin AND cjk THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS value,
       |  (1.0 - CAST(sum(CASE WHEN latin AND cjk THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)) >= 0.99 AS pass
       |FROM ent""".stripMargin

  val disjointLangEntities: String =
    s"""$cte, $disjointEnt
       |SELECT url, array_to_string(fam_list, ',') AS families,
       |  array_to_string(lang_list, ',') AS langs
       |FROM ent WHERE latin AND cjk ORDER BY url""".stripMargin

  // ——— vocabulary-dimension oracles (#13/#14/#18/#24) ———

  private val validLangDuck =
    s"lang IS NOT NULL AND regexp_matches(lang, '${Conformance.LangRegex}')"
  private val depDuck = graft.checks.Vocabulary.deprecatedDimDuck
  private val sugDuck = graft.checks.Vocabulary.suggestedDimDuck

  /** Mirrors Vocabulary.deprecatedByDay (#14): deprecated-dim usage
    * ratio among syntactically valid declared tags.
    */
  val deprecatedTerms: String =
    s"""$cte, dep AS ($depDuck)
       |SELECT pday, n_rows, violations, value, value >= 0.8 AS pass FROM (
       |  SELECT pday, CAST(count(*) AS BIGINT) AS n_rows,
       |    CAST(sum(CASE WHEN dep.lang IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS violations,
       |    1.0 - CAST(sum(CASE WHEN dep.lang IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS value
       |  FROM (SELECT pday, lang FROM pages WHERE $validLangDuck) p
       |  LEFT JOIN dep ON p.lang = dep.lang GROUP BY pday) t
       |ORDER BY pday""".stripMargin

  /** Mirrors Vocabulary.deprecatedUsages: grouped problem listing. */
  val deprecatedUsages: String =
    s"""$cte, dep AS ($depDuck)
       |SELECT lang, CAST(count(*) AS BIGINT) AS n_rows, min(url) AS min_url
       |FROM pages p WHERE $validLangDuck
       |  AND EXISTS (SELECT 1 FROM dep WHERE dep.lang = p.lang)
       |GROUP BY lang ORDER BY lang""".stripMargin

  private val usedTermsCte =
    s"used AS (SELECT DISTINCT lang FROM pages WHERE $validLangDuck)"

  private val sugList =
    graft.checks.Vocabulary.SuggestedLangs.map(l => s"'$l'").mkString(", ")

  /** Mirrors Vocabulary.reuseTerms (#18). */
  val reuseTerms: String =
    s"""$cte, $usedTermsCte
       |SELECT n_used, n_overlap, violations, value, value >= 0.4 AS pass FROM (
       |  SELECT n_used, n_overlap, n_used - n_overlap AS violations,
       |    CASE WHEN n_used = 0 THEN 1.0
       |         ELSE CAST(n_overlap AS DOUBLE) / CAST(n_used AS DOUBLE) END AS value
       |  FROM (
       |    SELECT CAST(count(*) AS BIGINT) AS n_used,
       |      CAST(sum(CASE WHEN lang IN ($sugList) THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap
       |    FROM used) a) b""".stripMargin

  /** Mirrors Vocabulary.unusedSuggested: the #18 problem bag. */
  val reuseUnusedSuggested: String =
    s"""$cte, $usedTermsCte, sug AS ($sugDuck)
       |SELECT sug.lang FROM sug
       |WHERE NOT EXISTS (SELECT 1 FROM used WHERE used.lang = sug.lang)
       |ORDER BY sug.lang""".stripMargin

  /** Mirrors Vocabulary.vocabUsage (#24). */
  val vocabUsage: String =
    s"""$cte, $usedTermsCte, decl AS (${PageSynth.langDimDuck})
       |SELECT n_used, n_declared, n_overlap, value, value >= 0.8 AS pass FROM (
       |  SELECT n_used, n_declared, n_overlap,
       |    CASE WHEN n_used = 0 THEN 1.0
       |         ELSE CAST(n_overlap AS DOUBLE) / CAST(n_used AS DOUBLE) END AS value
       |  FROM (
       |    SELECT CAST(count(*) AS BIGINT) AS n_used,
       |      (SELECT CAST(count(*) AS BIGINT) FROM decl) AS n_declared,
       |      CAST(sum(CASE WHEN EXISTS (SELECT 1 FROM decl WHERE decl.lang = used.lang) THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap
       |    FROM used) a) b""".stripMargin

  /** #11 misplaced-term flag expressions over a pages-shaped relation
    * (the host/lang dims are the two term-kind vocabularies).
    */
  private def langIsHostTerm(rel: String): String =
    s"EXISTS (SELECT 1 FROM (${PageSynth.hostDimDuck}) thd WHERE thd.host = $rel.lang)"
  private def hostIsLangTerm(rel: String): String =
    s"EXISTS (SELECT 1 FROM (${PageSynth.langDimDuck}) tld WHERE tld.lang = regexp_extract($rel.url, '$hostRe', 1))"

  /** Mirrors Vocabulary.misplacedByDay (#11). */
  val misplacedTerms: String =
    s"""$cte
       |SELECT pday, n_rows, violations, value, value >= 0.99 AS pass FROM (
       |  SELECT pday, CAST(count(*) AS BIGINT) AS n_rows,
       |    CAST(sum(CASE WHEN ${langIsHostTerm("pages")} OR ${hostIsLangTerm("pages")} THEN 1 ELSE 0 END) AS BIGINT) AS violations,
       |    1.0 - CAST(sum(CASE WHEN ${langIsHostTerm("pages")} OR ${hostIsLangTerm("pages")} THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS value
       |  FROM pages WHERE lang IS NOT NULL OR $hostExpr <> ''
       |  GROUP BY pday) t
       |ORDER BY pday""".stripMargin

  /** Mirrors Vocabulary.misplacedUsages: grouped problem listing. */
  val misplacedUsages: String =
    s"""$cte
       |SELECT * FROM (
       |  SELECT 'lang' AS position, lang AS term, CAST(count(*) AS BIGINT) AS n_rows, min(url) AS min_url
       |  FROM pages WHERE ${langIsHostTerm("pages")} GROUP BY lang
       |  UNION ALL
       |  SELECT 'host' AS position, $hostExpr AS term, CAST(count(*) AS BIGINT) AS n_rows, min(url) AS min_url
       |  FROM pages WHERE ${hostIsLangTerm("pages")} GROUP BY $hostExpr) u
       |ORDER BY position, term""".stripMargin

  // ——— #20 serialisation-format registry oracles ———

  private val fmtDuck = graft.checks.Formats.formatDimDuck
  private val extDuck = s"regexp_extract(url, '${graft.checks.Formats.ExtRegex}', 1)"

  private val fmtMatchedCte =
    s""", fmatch AS (
       |  SELECT f.format FROM (
       |    SELECT $extDuck AS ext FROM pages WHERE url IS NOT NULL) e
       |  JOIN ($fmtDuck) f ON e.ext = f.ext AND e.ext <> '')""".stripMargin

  /** Mirrors Formats.formatCounts. */
  val serialFormats: String =
    s"""$cte$fmtMatchedCte
       |SELECT format, CAST(count(*) AS BIGINT) AS n_rows FROM fmatch
       |GROUP BY format ORDER BY format""".stripMargin

  /** Mirrors Formats.formatsCount (the reference's Integer value). */
  val serialFormatsCount: String =
    s"""$cte$fmtMatchedCte
       |SELECT CAST(count(DISTINCT format) AS BIGINT) AS n_formats,
       | CAST(count(*) AS BIGINT) AS n_rows FROM fmatch""".stripMargin

  // ——— #37 licensing oracles ———

  private val humanHitDuck: String =
    graft.checks.Licensing.HumanBank
      .map(w => s"strpos(text, '$w') > 0").mkString("(", " OR ", ")")

  private val licFlagsCte: String =
    s"""lflags AS (
       | SELECT $hostExpr AS host, CAST(count(*) AS BIGINT) AS n_rows,
       |   CAST(max(CASE WHEN html IS NOT NULL AND $licenseDuck <> '${PageSynth.NoLicense}' THEN 1 ELSE 0 END) AS BIGINT) AS has_machine,
       |   CAST(max(CASE WHEN text IS NOT NULL AND $humanHitDuck THEN 1 ELSE 0 END) AS BIGINT) AS has_human
       | FROM pages WHERE $hostExpr <> '' GROUP BY 1)""".stripMargin

  /** Mirrors Licensing.hostFlags. */
  val licenseHostFlags: String =
    s"""$cte, $licFlagsCte
       |SELECT host, n_rows, has_machine, has_human FROM lflags ORDER BY host""".stripMargin

  /** Mirrors Licensing.verdict. */
  val licenseVerdict: String =
    s"""$cte, $licFlagsCte
       |SELECT n_rows, violations, value, value >= 0.5 AS pass FROM (
       |  SELECT CAST(count(*) AS BIGINT) AS n_rows,
       |   CAST(sum(CASE WHEN has_machine = 0 AND has_human = 0 THEN 1 ELSE 0 END) AS BIGINT) AS violations,
       |   CASE WHEN count(*) = 0 THEN 1.0
       |        ELSE 1.0 - CAST(sum(CASE WHEN has_machine = 0 AND has_human = 0 THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE) END AS value
       |  FROM lflags) t""".stripMargin

  /** Mirrors Licensing.models (copyleft classifier). */
  val licenseModels: String =
    s"""$cte
       |SELECT license, CAST(count(*) AS BIGINT) AS n_pages,
       | regexp_matches(license, '${graft.checks.Licensing.CopyleftRegex}') AS copyleft
       |FROM (SELECT $licenseDuck AS license FROM pages WHERE html IS NOT NULL) t
       |GROUP BY license ORDER BY license""".stripMargin

  /** Hijack base relations (#13): definition pages, cross-host groups
    * with their authoritative representative, per-page hijack flags.
    * Mirrors Hijack.flags.
    */
  private val hijackCte: String =
    s""", hd0 AS (SELECT url, $hostExpr AS host, md5($normDuckExpr) AS fp FROM pages
       |  WHERE text IS NOT NULL AND length($normDuckExpr) > 0 AND $hostExpr <> ''),
       |hg AS (SELECT fp, min(url) AS rep, count(DISTINCT host) AS nh FROM hd0 GROUP BY fp),
       |hg2 AS (SELECT fp, rep, regexp_extract(rep, '$hostRe', 1) AS rep_host FROM hg WHERE nh > 1),
       |hg3 AS (SELECT hg2.*,
       |  EXISTS(SELECT 1 FROM (${PageSynth.hostDimDuck}) hdim WHERE hdim.host = hg2.rep_host) AS rep_known
       |  FROM hg2),
       |hf AS (SELECT hd0.url, hd0.host, hg3.rep, hg3.rep_host,
       |  (hd0.host <> hg3.rep_host AND hg3.rep_known) AS is_hijack
       |  FROM hd0 JOIN hg3 ON hd0.fp = hg3.fp)""".stripMargin

  /** Mirrors Hijack.verdict (#13): value = |1 − hijacks/possible|. */
  val hijackVerdict: String =
    s"""$cte$hijackCte
       |SELECT n_rows, violations, value, value >= 0.5 AS pass FROM (
       |  SELECT CAST(count(*) AS BIGINT) AS n_rows,
       |    CAST(coalesce(sum(CASE WHEN is_hijack THEN 1 ELSE 0 END), 0) AS BIGINT) AS violations,
       |    CASE WHEN count(*) = 0 THEN CAST(1.0 AS DOUBLE)
       |         ELSE abs(1.0 - CAST(sum(CASE WHEN is_hijack THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)) END AS value
       |  FROM hf) t""".stripMargin

  /** Mirrors Hijack.hijackPages: the problem listing. */
  val hijackPages: String =
    s"""$cte$hijackCte
       |SELECT url, host, rep, rep_host FROM hf WHERE is_hijack
       |ORDER BY url, rep""".stripMargin

  val multiLangUsage: String =
    s"""$cte SELECT n_langs, CAST(count(*) AS BIGINT) AS n_urls FROM (
       |  SELECT url, CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
       |  FROM pages WHERE lang IS NOT NULL GROUP BY url) t
       |GROUP BY n_langs ORDER BY n_langs""".stripMargin

  /** Whole-suite verdict oracle: the union of the per-family oracles in
    * the CheckSuite's verdict shape.
    */
  val suiteVerdicts: String = {
    // derived-column relation for the fused family: stopword scores +
    // argmax + token stats computed once, exactly like the Spark side's
    // TextOps.withDerived
    val psCte =
      s"""ps AS (SELECT *, $bestExpr AS best, $totExpr AS tot,
         |  CAST($nTokDuck AS BIGINT) AS ntok,
         |  CAST($nTokDuck AS DOUBLE) AS n_tok_d,
         |  CAST(coalesce(length(text), 0) AS DOUBLE) AS n_chars_d
         |FROM (SELECT *, $scoreCols FROM pages) s1)""".stripMargin
    val qExpr =
      """least(n_tok_d / CAST(20.0 AS DOUBLE), CAST(1.0 AS DOUBLE)) * 0.4 + (CASE WHEN n_tok_d > 0 AND (n_chars_d - (n_tok_d - 1)) / n_tok_d >= CAST(3.0 AS DOUBLE) AND (n_chars_d - (n_tok_d - 1)) / n_tok_d <= CAST(10.0 AS DOUBLE) THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.5 AS DOUBLE) END) * 0.3 + least(CAST(s_en AS DOUBLE) / CAST(3.0 AS DOUBLE), CAST(1.0 AS DOUBLE)) * 0.3"""
    val depList = graft.checks.Vocabulary.DeprecatedLangs.map(l => s"'$l'").mkString(", ")
    val wb = graft.text.TextOps.WordBandTokens
    val suitePredsDuck = predsDuck ++ Seq(
      (graft.model.CheckId.DeclaredVsDerivedLang, "MisreportedLanguage",
        s"text IS NOT NULL AND length(text) > 0 AND lang IS NOT NULL AND " +
          s"(CASE WHEN ntok <= $wb THEN lang IN ($profLangList) ELSE $detectedDuck <> 'und' END)",
        s"(CASE WHEN ntok <= $wb THEN $declHitsDuck = 0 ELSE lang <> $detectedDuck END)", "lang", 0.5),
      (graft.model.CheckId.LangUndetermined, "UndeterminedLanguage",
        s"text IS NOT NULL AND length(text) > 0 AND lang IS NOT NULL AND ntok > $wb",
        s"$detectedDuck = 'und'", "'detector below banded confidence'", 0.5),
      (graft.model.CheckId.TextQuality, "LowQualityText",
        "text IS NOT NULL AND length(text) > 0",
        s"($qExpr) < 0.5", "'quality'", 0.8),
      (graft.model.CheckId.DeprecatedTerms, "UsageOfDeprecatedTerm",
        validLangDuck, s"lang IN ($depList)", "lang", 0.8),
      (graft.model.CheckId.MisplacedTerms, "MisplacedClass",
        s"lang IS NOT NULL OR $hostExpr <> ''",
        s"${langIsHostTerm("ps")} OR ${hostIsLangTerm("ps")}", "lang", 0.99))
    val fusedPart = {
      val parts = suitePredsDuck.map { case (id, _, app, bad, _, thr) =>
        s"""SELECT '$id' AS check_id, pday,
           | CAST(sum(CASE WHEN $app THEN 1 ELSE 0 END) AS BIGINT) AS n_rows,
           | CAST(sum(CASE WHEN ($app) AND ($bad) THEN 1 ELSE 0 END) AS BIGINT) AS violations,
           | CAST($thr AS DOUBLE) AS threshold
           |FROM ps GROUP BY pday""".stripMargin
      }
      s"""SELECT check_id, pday, n_rows, violations, value, value >= threshold AS pass FROM (
         |  SELECT check_id, pday, n_rows, violations, threshold,
         |    CASE WHEN n_rows = 0 THEN CAST(1.0 AS DOUBLE)
         |         ELSE 1.0 - CAST(violations AS DOUBLE) / CAST(n_rows AS DOUBLE) END AS value
         |  FROM (${parts.mkString("\nUNION ALL\n")}) p) t""".stripMargin
    }
    val completenessPart =
      s"""SELECT 'completeness_lang_day' AS check_id, pday, n_rows, violations, value, value >= 1.0 AS pass FROM (
         |  SELECT d.pday, CAST(count(*) AS BIGINT) AS n_rows,
         |    CAST(sum(CASE WHEN $condViolDuck THEN 1 ELSE 0 END) AS BIGINT) AS violations,
         |    1.0 - CAST(sum(CASE WHEN $condViolDuck THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS value
         |  FROM cdays d CROSS JOIN cld
         |  LEFT JOIN cobs o ON o.pday = d.pday AND o.lang = cld.lang
         |  GROUP BY d.pday) t""".stripMargin
    val estDeclaredPart =
      s"""SELECT 'est_declared_vs_derived' AS check_id, pday, n_rows, violations, value, value >= 0.5 AS pass FROM (
         | SELECT pday, n_rows,
         |   CASE WHEN sampled = 0 THEN CAST(0 AS BIGINT)
         |        ELSE CAST(round(CAST(bad_sampled AS DOUBLE) * CAST(n_rows AS DOUBLE) / CAST(sampled AS DOUBLE), 0) AS BIGINT) END AS violations,
         |   CASE WHEN sampled = 0 THEN CAST(1.0 AS DOUBLE)
         |        ELSE 1.0 - CAST(bad_sampled AS DOUBLE) / CAST(sampled AS DOUBLE) END AS value
         | FROM (
         |   SELECT pday,
         |     CAST(sum(CASE WHEN text IS NOT NULL AND length(text) > 0 AND lang IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_rows,
         |     CAST(sum(CASE WHEN text IS NOT NULL AND length(text) > 0 AND lang IS NOT NULL AND $u256 < 51 AND $detectedDuck <> 'und' THEN 1 ELSE 0 END) AS BIGINT) AS sampled,
         |     CAST(sum(CASE WHEN text IS NOT NULL AND length(text) > 0 AND lang IS NOT NULL AND $u256 < 51 AND $detectedDuck <> 'und' AND $detectedDuck <> lang THEN 1 ELSE 0 END) AS BIGINT) AS bad_sampled
         |   FROM ps GROUP BY pday) a) b""".stripMargin
    val provPart =
      s"""SELECT 'prov_host_flags' AS check_id, '*' AS pday,
         | CAST(count(*) AS BIGINT) AS n_rows,
         | CAST(sum(CASE WHEN has_https = 1 AND has_text = 1 THEN 0 ELSE 1 END) AS BIGINT) AS violations,
         | 1.0 - CAST(sum(CASE WHEN has_https = 1 AND has_text = 1 THEN 0 ELSE 1 END) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS value,
         | (1.0 - CAST(sum(CASE WHEN has_https = 1 AND has_text = 1 THEN 0 ELSE 1 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)) >= 0.9 AS pass
         |FROM pflags""".stripMargin
    val nearDupPart =
      s"""SELECT check_id, pday, n_rows, violations, value, value >= 0.85 AS pass FROM (
         | SELECT 'near_dup_text' AS check_id, '*' AS pday, t.n_rows, t.violations,
         |   CASE WHEN t.n_rows = 0 THEN CAST(1.0 AS DOUBLE)
         |        ELSE 1.0 - CAST(t.violations AS DOUBLE) / CAST(t.n_rows AS DOUBLE) END AS value
         | FROM (SELECT
         |   (SELECT CAST(coalesce(sum(n_docs), 0) AS BIGINT) FROM grp) AS n_rows,
         |   (SELECT CAST(coalesce(sum(nd), 0) - count(*) AS BIGINT) FROM nd_sizes) AS violations) t) u""".stripMargin
    val estPart =
      s"""SELECT 'est_conform_url' AS check_id, pday, n_rows, violations, value, value >= 0.99 AS pass FROM (
         | SELECT pday, n_rows,
         |   CASE WHEN sampled = 0 THEN CAST(0 AS BIGINT)
         |        ELSE CAST(round(CAST(bad_sampled AS DOUBLE) * CAST(n_rows AS DOUBLE) / CAST(sampled AS DOUBLE), 0) AS BIGINT) END AS violations,
         |   CASE WHEN sampled = 0 THEN CAST(1.0 AS DOUBLE)
         |        ELSE 1.0 - CAST(bad_sampled AS DOUBLE) / CAST(sampled AS DOUBLE) END AS value
         | FROM (
         |   SELECT pday,
         |     CAST(sum(CASE WHEN url IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_rows,
         |     CAST(sum(CASE WHEN url IS NOT NULL AND $u256 < 51 THEN 1 ELSE 0 END) AS BIGINT) AS sampled,
         |     CAST(sum(CASE WHEN url IS NOT NULL AND $u256 < 51 AND NOT regexp_matches(url, '${Conformance.UrlRegex}') THEN 1 ELSE 0 END) AS BIGINT) AS bad_sampled
         |   FROM pages GROUP BY pday) a) b""".stripMargin
    val dupTextPart =
      s"""SELECT 'dup_text_exact' AS check_id, '*' AS pday,
         | CAST(sum(n) AS BIGINT) AS n_rows,
         | CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT) AS violations,
         | CAST(count(*) AS DOUBLE) / CAST(sum(n) AS DOUBLE) AS value,
         | CAST(count(*) AS DOUBLE) / CAST(sum(n) AS DOUBLE) >= 0.9 AS pass
         |FROM (SELECT text, count(*) AS n FROM pages WHERE text IS NOT NULL AND length(text) > 0 GROUP BY text) g""".stripMargin
    val existsParts = existsPreds.map { case (id, w) =>
      s"""SELECT '$id' AS check_id, '*' AS pday, CAST(1 AS BIGINT) AS n_rows,
         | CAST(CASE WHEN EXISTS(SELECT 1 FROM pages WHERE $w) THEN 0 ELSE 1 END AS BIGINT) AS violations,
         | CAST(CASE WHEN EXISTS(SELECT 1 FROM pages WHERE $w) THEN 1.0 ELSE 0.0 END AS DOUBLE) AS value,
         | EXISTS(SELECT 1 FROM pages WHERE $w) AS pass""".stripMargin
    }
    def refPart(checkId: String, factSel: String, dimSql: String, thr: Double) =
      s"""SELECT '$checkId' AS check_id, pday, n_rows, violations, value, value >= $thr AS pass FROM (
         |  SELECT pday, CAST(count(*) AS BIGINT) AS n_rows,
         |    CAST(sum(CASE WHEN d.k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS violations,
         |    1.0 - CAST(sum(CASE WHEN d.k IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS value
         |  FROM ($factSel) f LEFT JOIN ($dimSql) d ON f.k = d.k GROUP BY pday) t""".stripMargin
    val hostPart = refPart("ref_host_dim",
      s"SELECT pday, $hostExpr AS k FROM pages WHERE $hostExpr <> ''",
      s"SELECT host AS k FROM (${PageSynth.hostDimDuck}) hd", 0.99)
    val langPart = refPart("ref_lang_dim",
      s"SELECT pday, lang AS k FROM pages WHERE lang IS NOT NULL AND regexp_matches(lang, '${Conformance.LangRegex}')",
      s"SELECT lang AS k FROM (${PageSynth.langDimDuck}) ld", 0.98)
    val uniqPart =
      s"""SELECT 'unique_url' AS check_id, '*' AS pday,
         | CAST(sum(n) AS BIGINT) AS n_rows,
         | CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT) AS violations,
         | CAST(count(*) AS DOUBLE) / CAST(sum(n) AS DOUBLE) AS value,
         | CAST(count(*) AS DOUBLE) / CAST(sum(n) AS DOUBLE) >= 0.99 AS pass
         |FROM (SELECT url, count(*) AS n FROM pages GROUP BY url) g""".stripMargin
    def driftPart(checkId: String, binExpr: String, isKs: Boolean, thr: Double) = {
      val hists = driftHists(binExpr)
      val valueSql =
        if (isKs)
          s"""c AS (SELECT bin, sum(cb) OVER (ORDER BY bin) AS ab, sum(cc) OVER (ORDER BY bin) AS ac FROM j),
             |v AS (SELECT max(abs(CAST(ab AS DOUBLE) / t.tb - CAST(ac AS DOUBLE) / t.tc)) AS s FROM c, t)""".stripMargin
        else
          s"""v AS (SELECT sum(
             |   ((CAST(cc AS DOUBLE) + 0.5) / (t.tc + 0.5 * t.k) - (CAST(cb AS DOUBLE) + 0.5) / (t.tb + 0.5 * t.k))
             |   * ln(((CAST(cc AS DOUBLE) + 0.5) / (t.tc + 0.5 * t.k)) / ((CAST(cb AS DOUBLE) + 0.5) / (t.tb + 0.5 * t.k)))
             | ) AS s FROM j, t)""".stripMargin
      s"""SELECT '$checkId' AS check_id, '*' AS pday,
         | (SELECT base_rows + cur_rows FROM (WITH $hists SELECT * FROM t) tt) AS n_rows,
         | CAST(0 AS BIGINT) AS violations,
         | (SELECT round(s, 6) FROM (WITH $hists, $valueSql SELECT * FROM v) vv) AS value,
         | (SELECT s <= $thr FROM (WITH $hists, $valueSql SELECT * FROM v) vv) AS pass""".stripMargin
    }
    val psiPart = driftPart("drift_lang_psi", "coalesce(lang, 'null')", isKs = false, Drift.PsiThreshold)
    val ksPart = driftPart("drift_hour_ks", hourBin, isKs = true, Drift.KsThreshold)
    val disjointPart =
      s"""SELECT 'disjoint_lang' AS check_id, '*' AS pday,
         | CAST(count(*) AS BIGINT) AS n_rows,
         | CAST(sum(CASE WHEN latin AND cjk THEN 1 ELSE 0 END) AS BIGINT) AS violations,
         | 1.0 - CAST(sum(CASE WHEN latin AND cjk THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS value,
         | (1.0 - CAST(sum(CASE WHEN latin AND cjk THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)) >= 0.99 AS pass
         |FROM (SELECT p.url, bool_or(f.family = 'latin') AS latin, bool_or(f.family = 'cjk') AS cjk
         |      FROM pages p JOIN (${graft.checks.Disjoint.famDimDuck}) f ON p.lang = f.lang
         |      GROUP BY p.url) ent""".stripMargin
    // near_dup_emb: brute-force cosine pairs over the embedding corpus
    // (same vecs CTE as emb_near_dup) → connected components (second
    // recursive CTE) → redundant vectors = nodes − components
    val nearDupEmbPart =
      s"""SELECT check_id, pday, n_rows, violations, value, value >= 0.85 AS pass FROM (
         | SELECT 'near_dup_emb' AS check_id, '*' AS pday, t.n_rows, t.violations,
         |   CASE WHEN t.n_rows = 0 THEN CAST(1.0 AS DOUBLE)
         |        ELSE 1.0 - CAST(t.violations AS DOUBLE) / CAST(t.n_rows AS DOUBLE) END AS value
         | FROM (SELECT
         |   (SELECT CAST(count(*) AS BIGINT) FROM vecs) AS n_rows,
         |   (SELECT CAST(count(*) - count(DISTINCT lab) AS BIGINT) FROM emblab) AS violations) t) u""".stripMargin
    // #18/#24 whole-table verdicts over the shared used-terms set
    val reusePart =
      s"""SELECT check_id, pday, n_rows, violations, value, value >= 0.4 AS pass FROM (
         | SELECT 'reuse_terms' AS check_id, '*' AS pday,
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(count(*) - sum(CASE WHEN lang IN ($sugList) THEN 1 ELSE 0 END) AS BIGINT) AS violations,
         |  CASE WHEN count(*) = 0 THEN 1.0
         |       ELSE CAST(sum(CASE WHEN lang IN ($sugList) THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE) END AS value
         | FROM used) t""".stripMargin
    val vocabPart =
      s"""SELECT check_id, pday, n_rows, violations, value, value >= 0.8 AS pass FROM (
         | SELECT 'vocab_usage' AS check_id, '*' AS pday,
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(count(*) - sum(CASE WHEN EXISTS (SELECT 1 FROM (${PageSynth.langDimDuck}) decl WHERE decl.lang = used.lang) THEN 1 ELSE 0 END) AS BIGINT) AS violations,
         |  CASE WHEN count(*) = 0 THEN 1.0
         |       ELSE CAST(sum(CASE WHEN EXISTS (SELECT 1 FROM (${PageSynth.langDimDuck}) decl WHERE decl.lang = used.lang) THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE) END AS value
         | FROM used) t""".stripMargin
    val hijackPart =
      s"""SELECT 'hijack_content' AS check_id, '*' AS pday, n_rows, violations, value, value >= 0.5 AS pass FROM (
         |  SELECT CAST(count(*) AS BIGINT) AS n_rows,
         |    CAST(coalesce(sum(CASE WHEN is_hijack THEN 1 ELSE 0 END), 0) AS BIGINT) AS violations,
         |    CASE WHEN count(*) = 0 THEN CAST(1.0 AS DOUBLE)
         |         ELSE abs(1.0 - CAST(sum(CASE WHEN is_hijack THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)) END AS value
         |  FROM hf) t""".stripMargin
    // #37 license-indication + #20 registry-format whole-table verdicts
    val licensePart =
      s"""SELECT check_id, pday, n_rows, violations, value, value >= 0.5 AS pass FROM (
         | SELECT 'license_indication' AS check_id, '*' AS pday,
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(sum(CASE WHEN has_machine = 0 AND has_human = 0 THEN 1 ELSE 0 END) AS BIGINT) AS violations,
         |  CASE WHEN count(*) = 0 THEN 1.0
         |       ELSE 1.0 - CAST(sum(CASE WHEN has_machine = 0 AND has_human = 0 THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE) END AS value
         | FROM lflags) t""".stripMargin
    val serialPart =
      s"""SELECT 'serial_formats' AS check_id, '*' AS pday,
         | (SELECT CAST(count(*) AS BIGINT) FROM fmatch) AS n_rows,
         | CAST(0 AS BIGINT) AS violations,
         | (SELECT CAST(count(DISTINCT format) AS DOUBLE) FROM fmatch) AS value,
         | (SELECT count(DISTINCT format) >= 1 FROM fmatch) AS pass""".stripMargin
    val parts = Seq(fusedPart, completenessPart, estPart, estDeclaredPart,
      hostPart, langPart, uniqPart, dupTextPart, psiPart, ksPart,
      disjointPart, provPart, nearDupPart, nearDupEmbPart,
      reusePart, vocabPart, hijackPart, licensePart, serialPart) ++ existsParts
    // RECURSIVE for the near-dup connected-component CTEs (reach, embreach)
    val cteRec = cte.replaceFirst("WITH ", "WITH RECURSIVE ")
    s"""$cteRec, $psCte$completenessBase, $provFlagsBase, $usedTermsCte, $licFlagsCte$fmtMatchedCte$hijackCte$dedupGroupsCte$minhashPairsCte,
       |e0 AS (SELECT url_a, url_b FROM bp WHERE jaccard >= ${graft.dedup.Dedup.JaccardThreshold}),
       |bidir AS (SELECT url_a AS src, url_b AS dst FROM e0 UNION ALL SELECT url_b, url_a FROM e0),
       |nodes AS (SELECT DISTINCT src AS n FROM bidir UNION SELECT rep FROM grp WHERE n_docs > 1),
       |reach(n, m) AS (
       |  SELECT n, n FROM nodes
       |  UNION
       |  SELECT b.dst, r.m FROM reach r JOIN bidir b ON b.src = r.n),
       |lab AS (SELECT n, min(m) AS cluster_rep FROM reach GROUP BY n),
       |nd_sizes AS (SELECT l.cluster_rep, sum(g.n_docs) AS nd
       |  FROM lab l JOIN grp g ON g.rep = l.n GROUP BY l.cluster_rep),
       |${vecCte.stripPrefix("WITH ")},
       |embp AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
       |      FROM vecs a JOIN vecs b ON a.vec_id < b.vec_id
       |      WHERE round(${cosDuck("a.e", "b.e")}, 6) >= 0.99),
       |embbidir AS (SELECT id_a AS src, id_b AS dst FROM embp UNION ALL SELECT id_b, id_a FROM embp),
       |embreach(n, m) AS (
       |  SELECT src, src FROM (SELECT DISTINCT src FROM embbidir) s0
       |  UNION
       |  SELECT b.dst, r.m FROM embreach r JOIN embbidir b ON b.src = r.n),
       |emblab AS (SELECT n, min(m) AS lab FROM embreach GROUP BY n)
       |SELECT * FROM (
       |${parts.mkString("\nUNION ALL\n")}
       |) s ORDER BY check_id, pday""".stripMargin
  }

  val saltedHostProfile: String =
    s"""$cte SELECT host, CAST(count(*) AS BIGINT) AS n_rows,
       | CAST(count(DISTINCT url) AS BIGINT) AS distinct_urls,
       | CAST(count(DISTINCT pday) AS BIGINT) AS n_days
       |FROM (SELECT url, pday, $hostExpr AS host FROM pages WHERE $hostExpr <> '') p
       |GROUP BY host ORDER BY host""".stripMargin

  /** All oracles, keyed by query name. */
  val all: Map[String, String] = Map(
    "salted_host_profile" -> saltedHostProfile,
    "suite_verdicts" -> suiteVerdicts,
    "text_tokens" -> textTokens,
    "text_quality" -> textQuality,
    "text_langid" -> textLangId,
    "text_declared_vs_derived" -> textDeclaredVsDerived,
    "text_fingerprint_groups" -> textFingerprintGroups,
    "dedup_minhash_pairs" -> dedupMinhashPairs,
    "dedup_simhash_pairs" -> dedupSimhashPairs,
    "dedup_clusters" -> dedupClusters,
    "mm_html_meta" -> mmHtmlMeta,
    "mm_html_digests" -> mmHtmlDigests,
    "mm_features" -> mmFeatures,
    "pages_dump" -> pagesDump,
    "fused_results" -> fusedResults,
    "fused_violations" -> fusedViolations,
    "stats_minmax" -> statsMinMax,
    "stats_distinct" -> statsDistinct,
    "unique_url" -> uniqueUrl,
    "unique_url_groups" -> uniqueUrlGroups,
    "dup_text_groups" -> dupTextGroups,
    "latest_snapshot" -> latestSnapshot,
    "ref_host_day" -> refHostDay,
    "ref_host_unknown" -> refHostUnknown,
    "ref_lang_day" -> refLangDay,
    "ref_lang_unknown" -> refLangUnknown,
    "drift_lang_hist" -> driftLangHist,
    "drift_lang_psi" -> driftLangPsi,
    "drift_hour_ks" -> driftHourKs,
    "sample_uniform" -> sampleUniform,
    "sample_stratified_alloc" -> sampleStratifiedAlloc,
    "sample_stratified_rows" -> sampleStratifiedRows,
    "sample_stratified_equal_alloc" -> sampleStratifiedEqualAlloc,
    "sample_stratified_equal_rows" -> sampleStratifiedEqualRows,
    "est_declared_vs_derived" -> estDeclaredVsDerived,
    "est_declared_vs_derived_stratified" -> estDeclaredVsDerivedStratified,
    "graph_sameas_edges" -> graphSameAsEdges,
    "graph_host_neighbors" -> graphHostNeighbors,
    "prov_host_flags" -> provHostFlags,
    "prov_verdict" -> provVerdict,
    "dedup_cluster_sizes" -> dedupClusterSizes,
    "knn_brute" -> knnBrute,
    "knn_lsh" -> knnLsh,
    "knn_ivf" -> knnIvf,
    "emb_near_dup" -> embNearDup,
    "deprecated_terms" -> deprecatedTerms,
    "deprecated_usages" -> deprecatedUsages,
    "misplaced_terms" -> misplacedTerms,
    "misplaced_usages" -> misplacedUsages,
    "serial_formats" -> serialFormats,
    "serial_formats_count" -> serialFormatsCount,
    "license_host_flags" -> licenseHostFlags,
    "license_verdict" -> licenseVerdict,
    "license_models" -> licenseModels,
    "reuse_terms" -> reuseTerms,
    "reuse_unused_suggested" -> reuseUnusedSuggested,
    "vocab_usage" -> vocabUsage,
    "hijack_verdict" -> hijackVerdict,
    "hijack_pages" -> hijackPages,
    "completeness_expected" -> completenessExpected,
    "completeness_missing" -> completenessMissing,
    "exists_checks" -> existsChecks,
    "est_conform_url" -> estConformUrl,
    "multi_lang_usage" -> multiLangUsage,
    "disjoint_lang" -> disjointLang,
    "disjoint_lang_entities" -> disjointLangEntities,
    "est_disjoint_lang" -> estDisjointLang,
    "domain_range" -> domainRange,
    "domain_range_usages" -> domainRangeUsages,
    "est_domain_range" -> estDomainRange
  )
}
