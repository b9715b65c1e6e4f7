package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fixed-width token chunks, space-joined, in one fused pass — the line
  * constructor of the CCNet line-dedup pass (t45) and the documented
  * native escalation of its declarative spelling
  * `transform(sequence(0, ceil(len/w)-1), i -> array_join(slice(t,
  * i*w+1, w), ' '))`: three nested interpreted higher-order functions
  * whose lambda eval path JIT-deoptimizes on its first large run in a JVM
  * (ScaleCheck measured a rep=30 leg at 16.4 s first-run vs 3.7 s warmed
  * — the same cliff class as the pre-native BPE fold, PERF.md round-7).
  * One eval call per document sidesteps the nested-lambda interpreter
  * entirely; output is byte-identical to the declarative form, including
  * the short final chunk and the empty-array → empty-result edge.
  */
final case class ChunkJoin(child: Expression, width: Int)
    extends UnaryExpression with CodegenFallback {

  require(width >= 1, s"chunk width must be >= 1, got $width")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"chunk_join expects array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    if (len == 0) return new GenericArrayData(Array.empty[Any])
    val sep = UTF8String.fromString(" ")
    val nChunks = (len + width - 1) / width
    val out = new Array[Any](nChunks)
    var c = 0
    while (c < nChunks) {
      val start = c * width
      val end = math.min(start + width, len)
      val parts = new Array[UTF8String](end - start)
      var j = start
      while (j < end) { parts(j - start) = arr.getUTF8String(j); j += 1 }
      out(c) = UTF8String.concatWs(sep, parts: _*)
      c += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): ChunkJoin =
    copy(child = newChild)

  override def prettyName: String = "chunk_join"
}

object ChunkJoin {
  def apply(tokens: Column, width: Int): Column =
    bridge.column(ChunkJoin(bridge.expression(tokens), width))
}
