package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.checks.{Disjoint, DomainRange}

/** #7/#8 two-pass domain/range semantics: the declared domain lives at
  * the macro-class level of the subClassOf taxonomy, so conformance is
  * reachable ONLY through the closure (latin ⊑ alphabetic) — exactly
  * UsageOfIncorrectDomainOrRangeDatatypes.java:120-190's type-closure ∩
  * domain test.
  */
class DomainRangeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("allowed-family masks come from the subClassOf* closure, not direct declaration") {
    // nothing declares latin or cjk directly as a domain class; the
    // masks must still resolve through latin ⊑ alphabetic, cjk ⊑ logographic
    assert(DomainRange.allowedMask("alphabetic") == Disjoint.FamilyBit("latin"))
    assert(DomainRange.allowedMask("logographic") == Disjoint.FamilyBit("cjk"))
    assert(DomainRange.allowedMask("nonexistent") == 0L)
  }

  test("rows violate iff the entity's full type set misses the host's domain closure") {
    import spark.implicits._
    // h007 declares 'logographic' (7 % 10 == 7); h000 'alphabetic'
    val rows = Seq(
      ("http://h000.example.com/a", "en"), // latin on alphabetic: pass (via closure)
      ("http://h007.example.com/b", "en"), // latin on logographic: violation
      ("http://h007.example.com/c", "zh"), // cjk on logographic: pass
      ("http://h000.example.com/d", "zh"), // cjk on alphabetic: violation
      // multi-typed entity: two rows, the url's FULL set has latin →
      // BOTH rows pass on the alphabetic host (pass-1 map is entity-level)
      ("http://h000.example.com/e", "zh"),
      ("http://h000.example.com/e", "en"),
      ("http://h000.example.com/f", "zz")  // un-famed lang only: not applicable
    ).toDF("url", "lang")
      .withColumn("warc_ts", to_timestamp(lit("2024-01-01 10:00:00")))
    val dd = DomainRange.hostDomainDim(spark)
    val v = DomainRange.verdict(rows, dd, Disjoint.famDim(spark)).collect().head
    // applicable: a, b, c, d, e(×2 rows); f has no entity mask
    assert(v.getAs[Long]("n_rows") == 6L)
    assert(v.getAs[Long]("violations") == 2L) // b and d only — e passes via full set
    val u = DomainRange.usages(rows, dd, Disjoint.famDim(spark)).collect()
    assert(u.map(_.getAs[String]("host")).toSet ==
      Set("h000.example.com", "h007.example.com"))
  }
}
