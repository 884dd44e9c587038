package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.graph.Interlinking
import graft.synth.PageSynth

/** Graph / interlinking analysis (MapDBGraph analog). */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val pages = PageSynth.pages(spark, TestSpark.sf001)

  test("sameAs edges are star-shaped: every edge targets the group min url") {
    val edges = Interlinking.sameAsEdges(pages).collect()
    assert(edges.nonEmpty, "fixture must contain shared-content groups")
    edges.foreach { r =>
      assert(r.getString(0) > r.getString(1),
        s"member ${r.getString(0)} must link to a smaller representative ${r.getString(1)}")
    }
    // star, not clique: edge count = members − 1 per group, so the
    // number of distinct representatives equals the number of groups
    val reps = edges.map(_.getString(1)).toSet
    assert(edges.length >= reps.size)
    // no representative appears as a source (would make it a chain)
    assert(edges.map(_.getString(0)).toSet.intersect(reps).isEmpty)
  }

  test("host adjacency is symmetric and respects the fingerprint cap") {
    val nbrs = Interlinking.hostNeighbors(pages).collect()
      .map(r => r.getString(0) -> r.getString(2).split(",").toSet).toMap
    assert(nbrs.nonEmpty, "fixture must contain cross-host shared content")
    for ((h, ns) <- nbrs; n <- ns)
      assert(nbrs(n).contains(h), s"edge $h->$n must be symmetric")
    // a cap of 1 host per fingerprint removes every cross-host edge
    assert(Interlinking.hostNeighbors(pages, maxHostsPerFp = 1).count() == 0)
  }
}
