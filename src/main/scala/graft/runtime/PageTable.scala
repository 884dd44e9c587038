package graft.runtime

import org.apache.spark.sql.{DataFrame, SparkSession, SaveMode}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import graft.checks.FusedChecks

/** Iceberg-*shaped* partitioned table (SURVEY §7.2: no Iceberg runtime
  * ships in /opt/spark/jars offline, so the layout is partitioned
  * Parquet + an explicit snapshot manifest, behind an interface a real
  * Iceberg catalog can replace):
  *
  * {{{
  * root/
  *   data/pday=YYYY-MM-DD/part-*.parquet   // days(warc_ts) partitioning
  *   _manifest.json                        // snapshot: partition list + row counts
  *   audit/part-*.parquet                  // AuditRow lineage table (append-only)
  *   results/part-*.parquet                // CheckResult verdicts per run
  *   violations/part-*.parquet             // violation rows per run
  * }}}
  *
  * `pday` is a real partition column, so `WHERE pday NOT IN (done)`
  * prunes files at planning time — that is what makes audit-based
  * resume skip completed partitions without reading them.
  */
object PageTable {

  /** Target on-disk bytes per data file. Guide §6: aim for output
    * files in the 128 MB – 1 GB range — small files cost listing time
    * on the driver and per-file open overhead on executors; huge files
    * cap scan parallelism.
    */
  val TargetFileBytes: Long = 128L << 20

  /** Upper bound on url-hash buckets per day (write parallelism =
    * days·buckets tasks; 4096 buckets × 47 days ≈ 190k files — beyond
    * any input this engine meets in one table).
    */
  val MaxFilesPerDay = 4096L

  /** Buckets per day derived from the input's estimated size (guide §2:
    * partitioning must be scale-adaptive, not a constant tuned for one
    * deployment). One file per day (round 1) capped write parallelism
    * at #days and made each file ~2 TB at 10^12 rows; the round-5 fixed
    * 8 buckets/day produced 376 ~13 KB files at sf0.1 and would produce
    * ~270 GB files at 100 TB. Deriving k from the optimizer's size
    * estimate keeps files near [[TargetFileBytes]] at every scale.
    */
  def filesPerDay(pages: DataFrame, days: Int): Long = {
    // analyzed-plan stats, not optimizedPlan: both give the same
    // size-only leaf estimate, but optimizedPlan runs the whole
    // optimizer over the (large) synthesis tree a second time just for
    // this heuristic
    val est = pages.queryExecution.analyzed.stats.sizeInBytes
    val perDay =
      if (est.isValidLong) est.toLong / days / TargetFileBytes else MaxFilesPerDay
    math.max(1L, math.min(MaxFilesPerDay, perDay))
  }

  /** Write the page table partitioned by day. Dynamic partition
    * overwrite keeps re-writes idempotent per partition.
    */
  def write(pages: DataFrame, root: String): Unit = {
    val spark = pages.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val days = graft.synth.PageSynth.Days + 2 // + 'null' + out-of-range days
    val k = filesPerDay(pages, days)
    pages
      .withColumn("pday", FusedChecks.pday)
      .withColumn("bucket", pmod(xxhash64(col("url")), lit(k)))
      .repartition((days * k).toInt, col("pday"), col("bucket"))
      .drop("bucket")
      .write.mode(SaveMode.Overwrite)
      .partitionBy("pday")
      .parquet(s"$root/data")
    writeManifest(spark, root)
  }

  /** Snapshot manifest: one JSON with per-partition row counts — the
    * stand-in for an Iceberg snapshot + manifest list. Written last so
    * a complete manifest implies complete data.
    */
  def writeManifest(spark: SparkSession, root: String): Unit = {
    val counts = spark.read.parquet(s"$root/data")
      .groupBy("pday").count().orderBy("pday")
      .collect().map(r => s"""    {"pday": "${r.getString(0)}", "rows": ${r.getLong(1)}}""")
    val json =
      s"""{
         |  "format": "metricsspark-manifest-v1",
         |  "partition_spec": "days(warc_ts)",
         |  "partitions": [
         |${counts.mkString(",\n")}
         |  ]
         |}""".stripMargin
    Files.writeString(Paths.get(root, "_manifest.json"), json)
  }

  /** Read with partition pruning available on `pday`. */
  def read(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/data")

  /** Partition list from the manifest (cheap, no file listing). */
  def partitions(root: String): Seq[String] = {
    val txt = Files.readString(Paths.get(root, "_manifest.json"))
    """"pday": "([^"]+)"""".r.findAllMatchIn(txt).map(_.group(1)).toSeq
  }
}
