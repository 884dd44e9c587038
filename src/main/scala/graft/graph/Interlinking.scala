package graft.graph

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Graph / interlinking analysis — the Spark re-expression of the
  * reference's MapDB adjacency graph (`U/commons/mapdb/MapDBGraph.java:
  * 39-88` sameAs edge maps, `:152-238` degree/neighbor queries), which
  * backs its interlinking-style metrics. SURVEY §2.2 maps the whole
  * structure to `groupBy(src).agg(collect_set(dst))` — no graph
  * library needed; the page-table analog of a `owl:sameAs` edge is
  * *content identity*: two urls carrying the same normalized text are
  * the same document.
  *
  * Scale shapes:
  *  - sameAs edges are emitted as a STAR per content group (member →
  *    min-url representative) — linear in members, never the
  *    O(|group|²) member-pair expansion (the same fan-out rule
  *    [[graft.dedup.Dedup]] applies to its pair outputs).
  *  - the host interlink graph joins on the content fingerprint — an
  *    8/16-byte key — and fingerprints shared by more than
  *    [[MaxHostsPerFp]] hosts are dropped from edge generation with a
  *    logged count (a universal boilerplate fingerprint would otherwise
  *    make the self-join quadratic in hosts; the capBuckets rule).
  *  - neighbor sets are per-host and deduplicated before collect_set,
  *    so the object agg runs on host-cardinality data, never corpus
  *    rows.
  */
object Interlinking {

  /** Hosts-per-fingerprint cap for the interlink self-join. */
  val MaxHostsPerFp = 100L

  private def norm(text: Column): Column = graft.dedup.Dedup.normText(text)

  /** (url, fp) rows over non-empty documents. */
  private def docFps(pages: DataFrame): DataFrame =
    pages.where(col("text").isNotNull)
      .select(col("url"), norm(col("text")).as("n"))
      .where(length(col("n")) > 0)
      .select(col("url"), md5(col("n")).as("fp"))

  /** Content-identity sameAs star edges: every member url of a shared-
    * content group links to the group's min-url representative.
    * Output (url, same_as), url ≠ same_as, ordered.
    */
  def sameAsEdges(pages: DataFrame): DataFrame = {
    val docs = docFps(pages)
    val reps = docs.groupBy(col("fp"))
      .agg(min(col("url")).as("same_as"), count(lit(1)).as("n"))
      .where(col("n") > 1)
      .select(col("fp"), col("same_as"))
    docs.join(reps, "fp")
      .where(col("url") =!= col("same_as"))
      .select(col("url"), col("same_as")).distinct()
      .orderBy("url", "same_as")
  }

  /** Host interlink adjacency (the degree/neighbor query surface of
    * MapDBGraph.java:211-227): hosts are linked when they serve the
    * same content fingerprint. Output
    * (host, n_neighbors, neighbors) with the neighbor set sorted and
    * comma-joined, ordered by host.
    */
  def hostNeighbors(pages: DataFrame,
      maxHostsPerFp: Long = MaxHostsPerFp): DataFrame = {
    // row-format localCheckpoint, not the columnar MEMORY_AND_DISK
    // persist (two string columns — the slow columnar-cache-build case
    // from the dedup pipeline); three consumers read it (bucket-size
    // pass + both self-join sides)
    val fpHost = pages.where(col("text").isNotNull)
      .select(norm(col("text")).as("n"), graft.checks.Referential.hostExpr.as("host"))
      .where(length(col("n")) > 0 && col("host") =!= "")
      .select(md5(col("n")).as("fp"), col("host"))
      .distinct()
      .localCheckpoint(true)
    val oversized = fpHost.groupBy("fp").agg(count(lit(1)).as("nh"))
      .where(col("nh") > maxHostsPerFp)
      .localCheckpoint(true)
    val nOver = oversized.count()
    if (nOver > 0)
      System.err.println(s"[graph] host interlink: dropped $nOver fingerprint(s) " +
        s"shared by more than $maxHostsPerFp hosts from edge generation")
    val kept = fpHost.join(broadcast(oversized.select("fp")), Seq("fp"), "left_anti")
    // no distinct() pass on the edge list: collect_set deduplicates
    // neighbors per host, and n_neighbors = the set's size — identical
    // to counting pre-distinct'd edges, one whole shuffle cheaper
    val edges = kept.select(col("fp"), col("host"))
      .join(kept.select(col("fp"), col("host").as("nbr")), "fp")
      .where(col("host") =!= col("nbr"))
      .select("host", "nbr")
    edges.groupBy("host")
      .agg(collect_set(col("nbr")).as("nbrs"))
      .select(col("host"), size(col("nbrs")).cast("long").as("n_neighbors"),
        array_join(array_sort(col("nbrs")), ",").as("neighbors"))
      .orderBy("host")
      .localCheckpoint(true)
  }
}
