package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native vector ops for the similarity family: hyperplane LSH band
  * keys and cosine similarity in one codegen'd pass each.
  *
  * The declarative spellings — `aggregate(zip_with(a, b, *))` per dot
  * product, 96 of them for the band keys — are higher-order-function
  * trees: every lambda evaluates interpreted with boxed doubles, the
  * same CodegenFallback trap already documented for MinHash/SimHash
  * (round-2 bench: 4.8 s at 20k vectors just for band hashing; at 10^9
  * embeddings it is the dominant cost). These expressions make one
  * primitive-loop pass per row and stay inside whole-stage codegen.
  *
  * Value parity: every accumulation is the identical left-to-right
  * fold the declarative version and the DuckDB oracle's unrolled
  * left-associated sums perform, so the doubles match bit-for-bit
  * (parity specs in SimilaritySpec).
  */
object VectorOpsImpl {

  /** All LSH band values in one pass: band b's bit j is the sign of
    * `dot(vec, planes[b*bandBits + j])`, planes flattened row-major.
    */
  def hyperplaneBands(vec: ArrayData, planes: Array[Double], dim: Int,
      bandBits: Int): ArrayData = {
    val numPlanes = planes.length / dim
    val out = new Array[Long](numPlanes / bandBits)
    var p = 0
    while (p < numPlanes) {
      var acc = 0.0
      val off = p * dim
      var i = 0
      while (i < dim) { acc += vec.getDouble(i) * planes(off + i); i += 1 }
      if (acc > 0) out(p / bandBits) |= 1L << (p % bandBits)
      p += 1
    }
    new GenericArrayData(out)
  }

  /** Cosine similarity; fold order matches the declarative
    * `dot(a,b) / (norm(a) * norm(b))` exactly (three independent
    * left-to-right sums, sqrt each norm, multiply, divide).
    */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var dot = 0.0
    var i = 0
    while (i < n) { dot += a.getDouble(i) * b.getDouble(i); i += 1 }
    var na = 0.0
    i = 0
    while (i < n) { val x = a.getDouble(i); na += x * x; i += 1 }
    var nb = 0.0
    i = 0
    while (i < n) { val x = b.getDouble(i); nb += x * x; i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

case class HyperplaneBands(child: Expression, planes: Array[Double],
    dim: Int, bandBits: Int)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    VectorOpsImpl.hyperplaneBands(input.asInstanceOf[ArrayData], planes, dim, bandBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("planes", planes, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorOpsImpl.hyperplaneBands($c, $pRef, $dim, $bandBits)")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBands =
    copy(child = newChild)
}

case class CosineSim(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOpsImpl.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOpsImpl.cosine($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CosineSim = copy(left = newLeft, right = newRight)
}

object VectorOps {
  def hyperplaneBands(vec: Column, planes: Array[Double], dim: Int,
      bandBits: Int): Column =
    bridge.column(HyperplaneBands(bridge.expression(vec), planes, dim, bandBits))

  def cosine(a: Column, b: Column): Column =
    bridge.column(CosineSim(bridge.expression(a), bridge.expression(b)))
}
