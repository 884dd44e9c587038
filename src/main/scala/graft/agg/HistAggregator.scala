package graft.agg

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed histogram aggregator: bin label → count.
  *
  * This is the mergeable replacement for the reference's single-threaded
  * per-metric fold state (SURVEY §2.3: the reference's `compute(Quad)`
  * has no merge step — per-partition partial maps with an associative,
  * commutative `merge` are the core new obligation for distributed
  * execution). Used by the drift checks (KS/PSI inputs).
  *
  * The buffer stays small (≤ #bins entries), so map-side partial
  * aggregation collapses each input partition to one tiny map before
  * the shuffle.
  */
object HistAggregator extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  override def zero: Map[String, Long] = Map.empty
  override def reduce(b: Map[String, Long], bin: String): Map[String, Long] =
    b.updated(bin, b.getOrElse(bin, 0L) + 1L)
  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    b.foldLeft(a) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0L) + v) }
  override def finish(r: Map[String, Long]): Map[String, Long] = r
  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
}
