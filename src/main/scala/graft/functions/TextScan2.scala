package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Round-5 additions to the native byte-scan family: the three
  * remaining java.util.regex full-text passes of the atoms corpus scan.
  *
  * The round-5 profile (8M docs, 4 pinned cores) put ~190 s of the
  * 292 s assessment in the single fused corpus scan, and its per-row
  * cost is dominated by three java-regex evaluations over the text
  * body: `regexp_replace(trim(text), "\\s+", " ")` (the normalized
  * duplicate/hijack fingerprint input), `rlike("<[a-z][^>]*>")`
  * (misused_shape.literal) and `rlike("(w[0-9]{3} ){10}")`
  * (prolix_text's member-run mechanism). Each allocates a matcher per
  * row and re-walks the full body; these scanners walk the UTF8String
  * bytes once, allocation-free (NormText allocates only its output),
  * and stay inside whole-stage codegen via `doGenCode`.
  *
  * Parity contracts (asserted by ValidatorSpec against the declarative
  * spellings, which stay in the codebase as the spec anchors):
  *
  *  - [[NormTextImpl.compute]] ≡ `regexp_replace(trim(text), "\\s+", " ")`:
  *    strip 0x20 (only) from both ends — Spark `trim` semantics — then
  *    collapse every maximal run of Java `\s` = [ \t\n\x0B\f\r] into a
  *    single 0x20. ASCII-only byte tests are UTF-8-safe (multi-byte
  *    units never contain ASCII bytes).
  *  - [[MarkupScanImpl.hasMarkup]] ≡ `rlike("<[a-z][^>]*>")` (find
  *    semantics): some '<' + lowercase-ASCII opener is followed by a
  *    later '>'.
  *  - [[ProlixScanImpl.hasProlixRun]] ≡ `rlike("(w[0-9]{3} ){10}")`:
  *    10 back-to-back `w<digit><digit><digit><space>` units.
  */
object NormTextImpl {

  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  def compute(text: UTF8String): UTF8String = {
    val n = text.numBytes()
    var lo = 0
    while (lo < n && text.getByte(lo) == ' ') lo += 1
    var hi = n
    while (hi > lo && text.getByte(hi - 1) == ' ') hi -= 1
    if (hi == lo) return UTF8String.EMPTY_UTF8
    val out = new Array[Byte](hi - lo)
    var o = 0
    var i = lo
    var inRun = false
    while (i < hi) {
      val b = text.getByte(i)
      if (isWs(b)) {
        if (!inRun) { out(o) = ' '; o += 1; inRun = true }
      } else {
        out(o) = b; o += 1; inRun = false
      }
      i += 1
    }
    if (o == out.length) UTF8String.fromBytes(out)
    else UTF8String.fromBytes(java.util.Arrays.copyOf(out, o))
  }
}

object MarkupScanImpl {
  def hasMarkup(text: UTF8String): Boolean = {
    val n = text.numBytes()
    var open = false
    var i = 0
    while (i < n) {
      val b = text.getByte(i)
      if (open && b == '>') return true
      if (b == '<' && i + 1 < n) {
        val c = text.getByte(i + 1)
        if (c >= 'a' && c <= 'z') open = true
      }
      i += 1
    }
    false
  }
}

object ProlixScanImpl {
  val Units = 10 // "(w[0-9]{3} ){10}" — ten 5-byte units

  @inline private def unitAt(text: UTF8String, p: Int): Boolean =
    text.getByte(p) == 'w' &&
      text.getByte(p + 1) >= '0' && text.getByte(p + 1) <= '9' &&
      text.getByte(p + 2) >= '0' && text.getByte(p + 2) <= '9' &&
      text.getByte(p + 3) >= '0' && text.getByte(p + 3) <= '9' &&
      text.getByte(p + 4) == ' '

  def hasProlixRun(text: UTF8String): Boolean = {
    val n = text.numBytes() - 5 * Units
    var i = 0
    while (i <= n) {
      if (text.getByte(i) == 'w') {
        var cnt = 0
        var p = i
        while (cnt < Units && unitAt(text, p)) { cnt += 1; p += 5 }
        if (cnt == Units) return true
      }
      i += 1
    }
    false
  }
}

case class NormText(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    NormTextImpl.compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormTextImpl.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): NormText =
    copy(child = newChild)
}

case class HasMarkup(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    MarkupScanImpl.hasMarkup(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MarkupScanImpl.hasMarkup($c)")
  override protected def withNewChildInternal(newChild: Expression): HasMarkup =
    copy(child = newChild)
}

case class HasProlixRun(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    ProlixScanImpl.hasProlixRun(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ProlixScanImpl.hasProlixRun($c)")
  override protected def withNewChildInternal(newChild: Expression): HasProlixRun =
    copy(child = newChild)
}

object TextScan2Fn {
  /** Whitespace-normalized text (trim + \s-run collapse), native. */
  def normText(text: Column): Column =
    bridge.column(NormText(bridge.expression(text)))

  /** `rlike("<[a-z][^>]*>")`, native. */
  def hasMarkup(text: Column): Column =
    bridge.column(HasMarkup(bridge.expression(text)))

  /** `rlike("(w[0-9]{3} ){10}")`, native. */
  def hasProlixRun(text: Column): Column =
    bridge.column(HasProlixRun(bridge.expression(text)))
}
