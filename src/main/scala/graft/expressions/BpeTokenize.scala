package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE tokenizer apply as a native Catalyst expression: segment `text`
  * under `rules` (an array of two-character merge pairs in rank order) and
  * return the token array, whitespace excluded.
  *
  * This replaces the engine's one interpreted hot-path kernel — the
  * `aggregate()` replace-fold ([[graft.ops.Bpe]]) — with a fused
  * symbol-scan inside whole-stage codegen: higher-order functions are
  * CodegenFallback, and ScaleCheck measured their eval path both paying a
  * per-row interpretation tax and JIT-deoptimizing at a data-size
  * threshold (14–36 s first-run vs ~3 s steady on the identical leg). The
  * scan is O(rules × length) with no per-pass allocation: because every
  * learned rule is a single-char pair, merged two-char tokens are inert,
  * so one boolean `used[]` + `pairStart[]` pass per rule reproduces the
  * symbol-list semantics exactly.
  *
  * Semantics are pinned three ways: within a pass, merges apply
  * left-to-right over non-overlapping occurrences (the `replace` contract
  * the DuckDB oracle's recursive CTE still uses — the oracle remains an
  * INDEPENDENT algorithm); across passes, rank order, earlier merges
  * consuming their characters; code-point addressing throughout (matching
  * `substring`/`regexp_replace` in the declarative spelling). Null text or
  * rules → null. `BpePropertySpec` holds all three implementations — this
  * expression, the oracle's replace chain, and a plain symbol-list
  * reference — to the same answers.
  */
final case class BpeTokenize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"bpe_tokenize expects (string, array<string>), got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  override def nullSafeEval(t: Any, r: Any): Any =
    BpeKernel.tokenize(t.asInstanceOf[UTF8String], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, r) => {
      s"${ev.value} = graft.expressions.BpeKernel.tokenize($t, $r);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BpeTokenize =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "bpe_tokenize"
}

object BpeTokenize {
  /** Column-API entry point used by graft.ops.Bpe. */
  def apply(text: Column, rules: Column): Column =
    bridge.column(BpeTokenize(bridge.expression(text), bridge.expression(rules)))
}

/** The static kernel `BpeTokenize` compiles calls to (same shape as
  * Spark's own codegen'd expressions delegating to static helpers).
  */
object BpeKernel {

  /** Tokenize `text` under rank-ordered 2-code-point merge `rules`.
    * Words are maximal runs between spaces; merges never cross spaces
    * (no rule contains one — rules are learned within words). Returns a
    * non-null array of non-null strings; empty text → empty array.
    */
  def tokenize(text: UTF8String, rules: ArrayData): ArrayData = {
    val s = text.toString
    val nr = rules.numElements()
    val ra = new Array[Int](nr)
    val rb = new Array[Int](nr)
    var nRules = 0
    var k = 0
    while (k < nr) {
      val p = rules.getUTF8String(k)
      if (p != null) {
        val ps = p.toString
        // rules are two CODE POINTS (the learned pair statistic counts
        // substring(w, i, 1) characters); skip anything else defensively.
        if (ps.codePointCount(0, ps.length) == 2) {
          ra(nRules) = ps.codePointAt(0)
          rb(nRules) = ps.codePointAt(ps.offsetByCodePoints(0, 1))
          nRules += 1
        }
      }
      k += 1
    }
    val out = new java.util.ArrayList[AnyRef]()
    var i = 0
    val n = s.length
    while (i < n) {
      val sp = s.indexOf(' ', i)
      val end = if (sp < 0) n else sp
      if (end > i) tokenizeWord(s, i, end, ra, rb, nRules, out)
      i = end + 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Segment one word (s[from, to)) and append its tokens to `out`.
    * One pass per rule, left-to-right non-overlapping, over code points;
    * `used` marks positions already inside a 2-point token (inert to all
    * later rules, because every rule side is a single code point).
    */
  private def tokenizeWord(s: String, from: Int, to: Int,
      ra: Array[Int], rb: Array[Int], nRules: Int,
      out: java.util.ArrayList[AnyRef]): Unit = {
    val nCp = s.codePointCount(from, to)
    val cps = new Array[Int](nCp)
    val offs = new Array[Int](nCp + 1) // char offset of each code point
    var ci = from
    var j = 0
    while (j < nCp) {
      offs(j) = ci
      val cp = s.codePointAt(ci)
      cps(j) = cp
      ci += Character.charCount(cp)
      j += 1
    }
    offs(nCp) = to
    val used = new Array[Boolean](nCp)
    val pairStart = new Array[Boolean](nCp)
    var r = 0
    while (r < nRules) {
      val a = ra(r)
      val b = rb(r)
      var p = 0
      while (p < nCp - 1) {
        if (!used(p) && !used(p + 1) && cps(p) == a && cps(p + 1) == b) {
          used(p) = true; used(p + 1) = true; pairStart(p) = true
          p += 2
        } else p += 1
      }
      r += 1
    }
    var p = 0
    while (p < nCp) {
      if (pairStart(p)) {
        out.add(UTF8String.fromString(s.substring(offs(p), offs(p + 2))))
        p += 2
      } else {
        out.add(UTF8String.fromString(s.substring(offs(p), offs(p + 1))))
        p += 1
      }
    }
  }
}
