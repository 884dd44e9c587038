package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native MinHash signature: `sig[j] = min over shingles x of
  * (a_j·x + b_j) mod P` for all j in one pass.
  *
  * The declarative spelling — 96 separate
  * `array_min(transform(hs, h -> pmod(h*a+b, P)))` column expressions —
  * produces an expression tree whose generated Java exceeds Janino's
  * 64 KB method limit ("Code grows beyond 64 KB" in the round-2 bench
  * log), so Spark silently falls back to *interpreted* evaluation:
  * 96 allocated intermediate arrays per row, lambda dispatch per
  * element. This expression is the SURVEY §4.1 "drop to a custom
  * Expression" move: one tight primitive loop, `doGenCode` keeps it
  * inside whole-stage codegen, zero intermediate allocation.
  *
  * Value semantics are bit-identical to the declarative version (and to
  * the DuckDB oracle, which recomputes signatures independently in
  * SQL): Carter-Wegman over 28-bit shingle hashes, products bounded by
  * 2^59 so neither engine's overflow checks trip.
  */
object MinHashImpl {
  /** One pass over the shingle set computing all hash mins. */
  def compute(shingles: ArrayData, a: Array[Long], b: Array[Long], p: Long): ArrayData = {
    val n = shingles.numElements()
    val k = a.length
    val out = new Array[Long](k)
    var j = 0
    while (j < k) {
      var best = Long.MaxValue
      val aj = a(j); val bj = b(j)
      var i = 0
      while (i < n) {
        val v = (aj * shingles.getLong(i) + bj) % p
        if (v < best) best = v
        i += 1
      }
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }
}

case class MinHashSignature(
    child: Expression,
    coefA: Array[Long],
    coefB: Array[Long],
    modP: Long)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    MinHashImpl.compute(input.asInstanceOf[ArrayData], coefA, coefB, modP)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("coefA", coefA, "long[]")
    val bRef = ctx.addReferenceObj("coefB", coefB, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashImpl.compute($c, $aRef, $bRef, ${modP}L)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHash {
  def signature(hashedShingles: Column, coefA: Array[Long], coefB: Array[Long],
      modP: Long): Column =
    bridge.column(MinHashSignature(bridge.expression(hashedShingles), coefA, coefB, modP))
}
