package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All distinct n-token shingle STRINGS (space-joined) of a token array in
  * one fused pass — the string-valued sibling of [[ShingleHashes]], for
  * operators whose downstream hashing must be engine-portable (MinHash
  * signatures are md5-of-shingle-string so a DuckDB oracle can reproduce
  * them byte-for-byte; an internal 64-bit hash would not be).
  *
  * Replaces `array_distinct(transform(sequence(...), i ->
  * concat_ws(' ', slice(t, i+1, n))))` — four interpreted HOFs and an
  * n-element array copy per shingle — with a single per-document pass.
  * Windows shorter than n produce one partial shingle, mirroring the
  * declarative form's `greatest(len-n, 0)` bound.
  */
final case class ShingleStrings(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"shingle length must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_strings expects array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    if (len == 0) return new GenericArrayData(Array.empty[Any])
    val tokens = new Array[UTF8String](len)
    var i = 0
    while (i < len) { tokens(i) = arr.getUTF8String(i); i += 1 }

    val m = math.max(len - n + 1, 1)
    val seen = new java.util.LinkedHashSet[UTF8String](m * 2)
    i = 0
    while (i < m) {
      val end = math.min(i + n, len)
      val parts = new Array[UTF8String](end - i)
      var j = i
      while (j < end) { parts(j - i) = tokens(j); j += 1 }
      seen.add(UTF8String.concatWs(UTF8String.fromString(" "), parts: _*))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleStrings =
    copy(child = newChild)

  override def prettyName: String = "shingle_strings"
}

object ShingleStrings {
  def apply(tokens: Column, n: Int): Column =
    bridge.column(ShingleStrings(bridge.expression(tokens), n))
}
