package graft.dedup

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** Connected-component labeling over a verified near-duplicate pair
  * graph — the shared cluster-formation core of the text
  * ([[Dedup.clusterLabels]]) and embedding
  * ([[graft.runtime.CheckSuite]]'s `near_dup_emb` family) paths.
  *
  * The edge set is a small fraction of the corpus (defect-rate
  * bounded), so labeling runs over the *edge set only* — the corpus is
  * never touched here. Two regimes:
  *
  *  - ≤ [[MaxDriverPairs]] edges: exact driver-side union-find — O(E·α)
  *    and zero iterative Spark jobs (round-2 measurement: beats the
  *    distributed loop by the per-round job overhead alone below ~2M
  *    pairs).
  *  - above it: distributed min-label propagation over the edges with a
  *    pointer-jumping step per round (label ← min(label,
  *    label-of-label)): O(log diameter) rounds, so long transitive
  *    chains converge instead of tripping a fixed-round bound.
  *
  * Labels are the component-minimum node (deterministic; mirrors the
  * DuckDB oracle's `min(m) GROUP BY n` over the recursive reach CTE).
  * Node type is whatever the pair columns carry (string urls for text,
  * long vec ids for embeddings) — min/least are evaluated in that
  * type's native ordering on both engines.
  */
object Components {

  /** Above this many verified pairs, switch from driver-side union-find
    * to the distributed label-propagation loop. 2M pairs ≈ a few
    * hundred MB of driver strings.
    */
  val MaxDriverPairs = 2000000L

  /** (node, label) for every node of `pairs` — a two-column frame of
    * identical orderable type ((a, b) per undirected edge). The result
    * is materialized (localCheckpoint) — no lazy plan over the inputs
    * survives the call.
    */
  def labels(pairs: DataFrame, maxDriverPairs: Long = MaxDriverPairs): DataFrame = {
    val spark = pairs.sparkSession
    val p2 = pairs.toDF("a", "b")
    val nPairs = p2.count()
    if (nPairs <= maxDriverPairs) {
      // exact union-find over the bounded pair list; min-label root for
      // determinism. Node type is only ordered, never assumed.
      def lt(x: Any, y: Any): Boolean = (x, y) match {
        case (a: String, b: String) => a < b
        case (a: Long, b: Long)     => a < b
        case (a: Int, b: Int)       => a < b
        case (a, b)                 => a.toString < b.toString
      }
      val parent = scala.collection.mutable.HashMap.empty[Any, Any]
      def find(x: Any): Any = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      val edgeRows = p2.collect()
      edgeRows.foreach { row =>
        val (a, b) = (row.get(0), row.get(1))
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) {
          if (lt(ra, rb)) parent(rb) = ra else parent(ra) = rb
        }
      }
      val nodes = edgeRows.flatMap(r => Seq(r.get(0), r.get(1))).distinct
      val dt = p2.schema.fields(0).dataType
      val schema = StructType(Seq(StructField("node", dt), StructField("label", dt)))
      spark.createDataFrame(
        spark.sparkContext.parallelize(nodes.map(n => Row(n, find(n))).toSeq),
        schema).localCheckpoint(true)
    } else {
      // distributed min-label propagation over the edge set only, with
      // a pointer-jumping step per round
      val edges = p2.select(col("a").as("src"), col("b").as("dst"))
        .union(p2.select(col("b"), col("a")))
        .persist()
      var lbl = edges.select(col("src").as("node")).distinct()
        .withColumn("label", col("node")).persist()
      var changed = 1L
      var iter = 0
      // 64 rounds bounds components of diameter 2^64 — structurally
      // unreachable; the loop exits on convergence
      while (changed > 0 && iter < 64) {
        val msgs = edges.join(lbl, edges("src") === lbl("node"))
          .select(col("dst").as("node"), col("label"))
        val viaEdges = lbl.select("node", "label").union(msgs)
          .groupBy("node").agg(min("label").as("label"))
        // pointer jump: follow node → label → label(label)
        val jumped = viaEdges.as("x")
          .join(lbl.select(col("node").as("jn"), col("label").as("jl")).as("y"),
            col("x.label") === col("jn"), "left")
          .select(col("x.node").as("node"),
            least(col("x.label"), coalesce(col("jl"), col("x.label"))).as("label"))
        val next = jumped.persist()
        changed = next.as("n").join(lbl.as("o"), "node")
          .where(col("n.label") =!= col("o.label")).count()
        lbl.unpersist()
        lbl = next
        iter += 1
      }
      require(changed == 0, s"cluster label propagation did not converge in $iter rounds")
      val out = lbl.localCheckpoint(true)
      lbl.unpersist()
      edges.unpersist()
      out
    }
  }
}
