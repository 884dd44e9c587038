package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text statistics: ONE allocation-free byte scan producing
  * `[token_count, s_en, s_fr, s_es, s_de]`.
  *
  * These five values feed every text check (token stats, quality score,
  * language ID, declared-vs-derived), and their declarative spellings —
  * `regexp_count(trim(text), '\\s+')` plus 28 `contains` probes over a
  * per-row `concat(' ', text, ' ')` — were the dominant per-row cost of
  * the 96M-row suite scan (java.util.regex + a ~1 KB string allocation
  * per probe chain, with wall-clock swinging 10-50× depending on
  * whether the optimizer's subexpression elimination happened to fire
  * for a given plan shape). A native expression makes the cost flat and
  * plan-shape-independent.
  *
  * Exact value parity with the declarative forms (and the DuckDB
  * oracle, which recomputes them in SQL):
  *
  *  - `token_count` = `regexp_count(trim(text), '\\s+') + 1` for
  *    space-trimmed-nonempty text, else 0: i.e. count maximal
  *    ASCII-whitespace runs in the space-trimmed region, plus one.
  *    (Spark `trim` strips 0x20 only; Java regex `\s` =
  *    [ \t\n\x0B\f\r] — both reproduced byte-for-byte.)
  *  - `s_<lang>` = number of the profile's stopwords w for which
  *    `(' ' || text || ' ') CONTAINS (' ' || w || ' ')` — i.e. the word
  *    appears delimited by 0x20 spaces (string boundaries count as
  *    spaces; tabs/newlines do NOT delimit, exactly like `contains`).
  */
object TextStatsImpl {

  /** Profile word lists — must stay in lockstep with
    * graft.text.TextOps.StopwordProfiles (asserted by TextStatsSpec).
    */
  val Profiles: Array[Array[Array[Byte]]] = Array(
    Array("the", "a", "of", "and", "to", "in", "is"),
    Array("le", "la", "les", "et", "un", "des", "est"),
    Array("el", "los", "las", "y", "una", "que", "es"),
    Array("der", "die", "das", "und", "ein", "ist", "nicht")
  ).map(_.map(_.getBytes("UTF-8")))

  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  def compute(text: UTF8String): GenericArrayData = {
    val n = text.numBytes()
    // — token count: space-trim, then count \s+ runs —
    var lo = 0
    while (lo < n && text.getByte(lo) == ' ') lo += 1
    var hi = n
    while (hi > lo && text.getByte(hi - 1) == ' ') hi -= 1
    var nTok = 0L
    if (hi > lo) {
      var runs = 0L
      var inRun = false
      var i = lo
      while (i < hi) {
        val ws = isWs(text.getByte(i))
        if (ws && !inRun) { runs += 1; inRun = true }
        else if (!ws) inRun = false
        i += 1
      }
      nTok = runs + 1
    }
    // — stopword presence: space-delimited tokens over ' '+text+' ' —
    // seen(p) = bitmask over the profile's 7 words
    val seen = new Array[Int](Profiles.length)
    var start = 0 // start of current space-token (0 == after virtual pad)
    var i = 0
    while (i <= n) {
      val atEnd = i == n
      if (atEnd || text.getByte(i) == ' ') {
        val len = i - start
        if (len > 0) {
          var p = 0
          while (p < Profiles.length) {
            val words = Profiles(p)
            var w = 0
            while (w < words.length) {
              if ((seen(p) & (1 << w)) == 0 && words(w).length == len) {
                val wb = words(w)
                var k = 0
                while (k < len && wb(k) == text.getByte(start + k)) k += 1
                if (k == len) seen(p) |= (1 << w)
              }
              w += 1
            }
            p += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    val out = new Array[Long](1 + Profiles.length)
    out(0) = nTok
    var p = 0
    while (p < Profiles.length) {
      out(1 + p) = java.lang.Integer.bitCount(seen(p)).toLong
      p += 1
    }
    new GenericArrayData(out)
  }
}

case class TextStats(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    TextStatsImpl.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStatsImpl.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
}

object TextStatsFn {
  /** `[token_count, s_en, s_fr, s_es, s_de]`, null for null text. */
  def textStats(text: Column): Column =
    bridge.column(TextStats(bridge.expression(text)))
}
