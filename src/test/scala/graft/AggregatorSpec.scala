package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random
import graft.agg.HistAggregator
import graft.checks.Drift

/** Property tests (seeded-random, 200 cases each) for the mergeable
  * aggregation state + drift stats — the merge-correctness obligations
  * SURVEY §2.3 calls out: the reference's fold has no merge step; ours
  * must be a commutative monoid.
  */
class AggregatorSpec extends AnyFunSuite {
  private val keys = Vector("a", "b", "c", "d", "e")
  private def genHist(rnd: Random): Map[String, Long] =
    keys.take(1 + rnd.nextInt(keys.size))
      .map(k => k -> (1L + rnd.nextInt(1000))).toMap

  test("HistAggregator.merge is commutative and associative") {
    val rnd = new Random(42)
    for (_ <- 1 to 200) {
      val (x, y, z) = (genHist(rnd), genHist(rnd), genHist(rnd))
      assert(HistAggregator.merge(x, y) == HistAggregator.merge(y, x))
      assert(HistAggregator.merge(HistAggregator.merge(x, y), z) ==
        HistAggregator.merge(x, HistAggregator.merge(y, z)))
    }
  }

  test("HistAggregator: reduce over a split equals merge of partial folds") {
    val rnd = new Random(43)
    for (_ <- 1 to 200) {
      val xs = List.fill(rnd.nextInt(30))(keys(rnd.nextInt(keys.size)))
      val cut = if (xs.isEmpty) 0 else rnd.nextInt(xs.size + 1)
      val (l, r) = xs.splitAt(cut)
      def fold(ys: List[String]) = ys.foldLeft(HistAggregator.zero)(HistAggregator.reduce)
      assert(HistAggregator.merge(fold(l), fold(r)) == fold(xs))
    }
  }

  test("KS(x, x) == 0 and KS ∈ [0, 1]") {
    val rnd = new Random(44)
    for (_ <- 1 to 200) {
      val (x, y) = (genHist(rnd), genHist(rnd))
      assert(Drift.ks(x, x) == 0.0)
      val v = Drift.ks(x, y)
      assert(v >= 0.0 && v <= 1.0 + 1e-12)
    }
  }

  test("PSI(x, x) == 0 and PSI >= 0") {
    val rnd = new Random(45)
    for (_ <- 1 to 200) {
      val (x, y) = (genHist(rnd), genHist(rnd))
      assert(math.abs(Drift.psi(x, x)) < 1e-12)
      assert(Drift.psi(x, y) >= -1e-12)
    }
  }

  test("PSI grows as mass shifts") {
    val base = Map("a" -> 500L, "b" -> 500L)
    val shifts = Seq(0L, 100L, 250L, 400L).map(d => Map("a" -> (500L + d), "b" -> (500L - d)))
    val vals = shifts.map(Drift.psi(base, _))
    assert(vals == vals.sorted)
  }
}
