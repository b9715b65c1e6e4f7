package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** All distinct n-token shingle hashes of a token array, in one fused pass.
  *
  * The declarative spelling —
  * `array_distinct(transform(sequence(0, len-n), i -> xxhash64(slice(t, i+1, n))))`
  * — evaluates four nested higher-order functions per document and copies an
  * n-element array per shingle; at millions of shingles the interpreted HOF
  * machinery dominates the near-dup pipeline. This expression hashes each
  * token once (xxhash64), combines token hashes over a sliding window with a
  * mixed polynomial, and dedups — O(tokens) per document with zero
  * intermediate arrays.
  *
  * Runs once per DOCUMENT row (not per shingle), so interpreted eval
  * (CodegenFallback) costs one virtual call per row — nothing to win from
  * codegen here.
  *
  * Windows shorter than n (documents with < n tokens) produce one partial
  * shingle, mirroring the declarative form's `greatest(len-n, 0)` bound.
  * Hash values are internal join keys only (64-bit, ~2⁻⁶⁴ collision rate);
  * no oracle compares them.
  */
final case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"shingle length must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes expects array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    if (len == 0) return new GenericArrayData(Array.empty[Long])

    val tokenHash = new Array[Long](len)
    var i = 0
    while (i < len) {
      tokenHash(i) =
        XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
      i += 1
    }

    val m = math.max(len - n + 1, 1)
    val out = new Array[Long](m)
    i = 0
    while (i < m) {
      var h = 0x9e3779b97f4a7c15L
      var j = i
      val end = math.min(i + n, len)
      while (j < end) {
        h ^= tokenHash(j)
        h *= 0xc2b2ae3d27d4eb4fL
        h = java.lang.Long.rotateLeft(h, 31)
        j += 1
      }
      out(i) = h
      i += 1
    }

    // Dedup (sorted; downstream is explode → groupBy, order-insensitive).
    java.util.Arrays.sort(out)
    var w = 0
    i = 0
    while (i < m) {
      if (i == 0 || out(i) != out(i - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)

  override def prettyName: String = "shingle_hashes"
}

object ShingleHashes {
  def apply(tokens: Column, n: Int): Column =
    bridge.column(ShingleHashes(bridge.expression(tokens), n))
}
