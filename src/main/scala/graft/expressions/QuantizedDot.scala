package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Integer dot product over two int8-quantized vectors (stored as
  * array<int>), accumulated in LONG, with whole-stage codegen — the
  * [[DotProduct]] counterpart for the quantized search path
  * ([[graft.ops.Similarity.quantizedTopK]]).
  *
  * The quantized scan scores O(|queries| · |corpus|) pairs at dim
  * multiplies each; the declarative spelling
  * (`aggregate(zip_with(a, b, (x, y) => x.cast(long) * y), 0L, _ + _)`)
  * pays higher-order-function machinery per element. This generates the
  * fused loop instead. Integer accumulation is exact and
  * order-independent, so results are bit-identical to the declarative
  * form — the property that keeps quantized scoring hash-verifiable
  * against the DuckDB oracle.
  *
  * Null semantics: null array → null result; elements are assumed
  * non-null (quantization output contract). Mismatched lengths use the
  * shorter prefix. Overflow is impossible for real inputs: |q| ≤ 127, so
  * dim · 127² needs dim > 5.7×10¹⁴ to overflow a long.
  */
final case class QuantizedDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"quantized_dot expects array<int> inputs, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0L
    var i = 0
    while (i < n) {
      sum += x.getInt(i).toLong * y.getInt(i)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $sum = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += (long) $a.getInt($i) * (long) $b.getInt($i);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantizedDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "quantized_dot"
}

object QuantizedDot {
  /** Column-API entry point used by graft.ops.Similarity. */
  def apply(a: Column, b: Column): Column =
    bridge.column(QuantizedDot(bridge.expression(a), bridge.expression(b)))
}
