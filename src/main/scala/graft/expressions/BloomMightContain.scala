package graft.expressions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a pre-built [[BloomFilter]] sketch — the
  * prefilter behind incremental dedup against an existing corpus
  * ([[graft.ops.Dedup.incrementalNew]]). The serialized sketch travels as
  * a constructor payload inside the plan, so it ships to executors once
  * via the task-binary broadcast (Spark serializes each stage's plan once
  * and torrent-broadcasts it — the same path a `broadcast()` relation
  * takes), and each executor deserializes it lazily exactly once.
  *
  * Sketch semantics: no false negatives — a `false` here PROVES the key
  * is not in the corpus — so downstream only bloom-positive rows (true
  * dups + the fpp sliver of false positives) need the exact verification
  * join. At a 100 TB corpus the shuffled verify side shrinks from |batch|
  * to ~fpp·|batch| + |true dups|, while this probe stays a map-side scan.
  *
  * Hash contract: probes the UTF-8 bytes of the string key, which is
  * bit-identical to how `DataFrameStatFunctions.bloomFilter` inserted the
  * string column (`putString` == `putBinary(utf8 bytes)` in the public
  * sketch implementation), so probe and build always agree.
  */
final case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects a string key, got ${other.catalogString}")
  }

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  override def nullSafeEval(input: Any): Any =
    bloom.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)

  override def prettyName: String = "bloom_might_contain"
}

object BloomMightContain {
  def apply(key: Column, bloom: BloomFilter): Column = {
    val out = new java.io.ByteArrayOutputStream()
    bloom.writeTo(out)
    bridge.column(BloomMightContain(bridge.expression(key), out.toByteArray))
  }
}
