package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.checks.Disjoint
import graft.synth.PageSynth

/** Disjoint-membership check vs the independent SynthModel re-derivation
  * (entity = url, classes = script families of observed langs).
  */
class DisjointSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  // sf0.01: big enough that disjoint entities actually occur (sf0.001
  // has no multi-family url)
  private lazy val pages = PageSynth.pages(spark, TestSpark.sf001)
  private lazy val model: Seq[SynthModel.MPage] = {
    val docs = spark.read.parquet(s"${TestSpark.sf001}/documents.parquet")
      .select("doc_id", "text", "lang").collect()
    docs.map(r => SynthModel.page(r.getLong(0), r.getString(1), r.getString(2))).toSeq
  }

  private val famOf = Disjoint.Families.toMap

  private def modelEntities: Map[String, Set[String]] =
    model.filter(_.lang.isDefined)
      .flatMap(p => famOf.get(p.lang.get).map(f => p.url -> f))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  test("disjointness is inherited through the subClassOf* closure") {
    // default taxonomy: latin ⟂ cjk is NOT declared directly — the only
    // axiom is (alphabetic, logographic) at the top of the hierarchy, so
    // every disjoint_lang violation the end-to-end tests below flag is
    // reachable ONLY via the closure
    assert(!Disjoint.DeclaredDisjoint.contains(("latin", "cjk")))
    assert(Disjoint.DisjointPairs == Seq(("latin", "cjk")))
    // deeper fixture: axiom two levels up; a sibling pair under a COMMON
    // ancestor must NOT become disjoint
    val sub = Seq("a" -> "p", "b" -> "q", "p" -> "top1", "q" -> "top2", "c" -> "p")
    val closed = Disjoint.closedDisjointPairs(Seq("a", "b", "c"), sub, Seq(("top1", "top2")))
    assert(closed.toSet == Set(("a", "b"), ("b", "c")),
      s"a,c share ancestor p/top1 and must stay compatible; got $closed")
    // reflexive guard: a family is never disjoint with itself
    assert(!closed.contains(("a", "a")))
    // axiom naming a base family directly still closes over the OTHER side
    val mixed = Disjoint.closedDisjointPairs(Seq("a", "b"), sub, Seq(("a", "top2")))
    assert(mixed == Seq(("a", "b")))
  }

  test("verdict matches model-derived entity/violation counts") {
    val exp = modelEntities
    val expViol = exp.count(_._2.size > 1) // two families total ⇒ >1 = disjoint pair
    val row = Disjoint.verdict(pages, Disjoint.famDim(spark)).collect()(0)
    assert(row.getAs[Long]("n_entities") == exp.size)
    assert(row.getAs[Long]("violations") == expViol)
    assert(expViol > 0, "fixture must contain at least one disjoint entity")
  }

  test("violating entities list the conflicting families") {
    val got = Disjoint.violatingEntities(pages, Disjoint.famDim(spark)).collect()
    val expUrls = modelEntities.filter(_._2.size > 1).keySet
    assert(got.map(_.getString(0)).toSet == expUrls)
    got.foreach(r => assert(r.getAs[String]("families") == "cjk,latin"))
  }

  test("estimated disjoint verdict runs over the entity-keyed ~20% sample") {
    val bigPages = graft.synth.PageSynth.pages(spark, TestSpark.sf001)
    val dim = Disjoint.famDim(spark)
    val full = Disjoint.verdict(bigPages, dim).collect()(0)
    val est = Disjoint.estimatedVerdict(bigPages, dim).collect()(0)
    val (nFull, nEst) = (full.getAs[Long]("n_entities"), est.getAs[Long]("n_entities"))
    // entity sample ≈ 20% of entities (hash-uniform over urls)
    assert(nEst > 0 && nEst < nFull)
    assert(math.abs(nEst.toDouble / nFull - 0.2) < 0.05, s"sampled frac ${nEst.toDouble / nFull}")
    // the sampled ratio estimates the full entity-level metric
    assert(math.abs(est.getAs[Double]("value") - full.getAs[Double]("value")) < 0.01)
  }
}
