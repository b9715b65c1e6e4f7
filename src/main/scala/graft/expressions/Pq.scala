package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native product-quantization kernels.
  *
  * The declarative PQ spelling (a `greatest(struct(dot, code), …)` chain
  * per subspace, with every centroid an 8-literal `array(...)`) builds
  * `subspaces × codes` array-literal subtrees — ~2 000 Catalyst nodes at
  * the 8×32 default. The tree is re-analyzed/optimized for every training
  * iteration and every encode plan, which put ~15 s of DRIVER time on a
  * 2 s of executor work (JobProf, sf0.1). These expressions collapse each
  * kernel to ONE node holding the codebook as a plain `double[][][]`
  * reference object — the same data the literals carried, minus the tree.
  *
  * Numerics are bit-identical to the declarative spelling: per-element
  * float→double widening (exact), sequential per-subspace dots, score
  * `dot − ‖c‖²/2`, argmax ties → higher code.
  */
object Pq {
  /** Precomputed `‖c‖²/2` per (sub, code) — matches the driver-side fold
    * the declarative spelling embedded as a literal.
    */
  def halfNorms(cb: Array[Array[Array[Double]]]): Array[Array[Double]] =
    cb.map(_.map(c => c.map(x => x * x).sum / 2))
}

/** `pq_codes(vec)` → `array<int>`: the PQ code of every subspace — the
  * 8-byte row a billion-vector index stores. One fused loop per row:
  * `subspaces × codes` dots of `subDim` elements.
  */
final case class PqCodes(child: Expression,
    codebook: Array[Array[Array[Double]]]) extends UnaryExpression {

  private val subDim = codebook(0)(0).length
  @transient private lazy val halfNorm = Pq.halfNorms(codebook)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_codes expects array<float|double>, got ${other.catalogString}")
  }

  private def isFloat = child.dataType.asInstanceOf[ArrayType]
    .elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val fl = isFloat
    val out = new Array[Int](codebook.length)
    var m = 0
    while (m < codebook.length) {
      val base = m * subDim
      var bestScore = Double.NegativeInfinity
      var bestCode = 0
      var c = 0
      while (c < codebook(m).length) {
        val cen = codebook(m)(c)
        var dot = 0.0
        var i = 0
        while (i < subDim && base + i < n) {
          val x = if (fl) v.getFloat(base + i).toDouble else v.getDouble(base + i)
          dot += x * cen(i)
          i += 1
        }
        val score = dot - halfNorm(m)(c)
        if (score >= bestScore) { bestScore = score; bestCode = c }
        c += 1
      }
      out(m) = bestCode
      m += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "double[][][]")
    val hnRef = ctx.addReferenceObj("pqHalfNorm", halfNorm, "double[][]")
    val get =
      if (isFloat) (v: String, i: String) => s"(double) $v.getFloat($i)"
      else (v: String, i: String) => s"$v.getDouble($i)"
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val m = ctx.freshName("m")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val score = ctx.freshName("score")
      val best = ctx.freshName("best")
      val bestCode = ctx.freshName("bestCode")
      val base = ctx.freshName("base")
      s"""
         |int $n = $v.numElements();
         |int[] $out = new int[$cbRef.length];
         |for (int $m = 0; $m < $cbRef.length; $m++) {
         |  int $base = $m * $subDim;
         |  double $best = Double.NEGATIVE_INFINITY;
         |  int $bestCode = 0;
         |  for (int $c = 0; $c < $cbRef[$m].length; $c++) {
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $subDim && $base + $i < $n; $i++) {
         |      $dot += ${get(v, s"$base + $i")} * $cbRef[$m][$c][$i];
         |    }
         |    double $score = $dot - $hnRef[$m][$c];
         |    if ($score >= $best) { $best = $score; $bestCode = $c; }
         |  }
         |  $out[$m] = $bestCode;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)

  override def prettyName: String = "pq_codes"
}

object PqCodes {
  def apply(vec: Column, codebook: Array[Array[Array[Double]]]): Column =
    bridge.column(PqCodes(bridge.expression(vec), codebook))
}

/** `pq_lut(vec)` → `array<array<double>>`: the per-query ADC lookup table
  * `lut(m)(c) = dot(q_sub_m, centroid_m_c)`. Evaluated once per QUERY row
  * (the broadcast side — tens of rows), so interpreter-only is fine;
  * keeping it off the codegen path keeps the expression trivial.
  */
final case class PqLut(child: Expression,
    codebook: Array[Array[Array[Double]]])
    extends UnaryExpression with CodegenFallback {

  private val subDim = codebook(0)(0).length

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_lut expects array<float|double>, got ${other.catalogString}")
  }

  private def isFloat = child.dataType.asInstanceOf[ArrayType]
    .elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val fl = isFloat
    val rows = new Array[Any](codebook.length)
    var m = 0
    while (m < codebook.length) {
      val base = m * subDim
      val tbl = new Array[Double](codebook(m).length)
      var c = 0
      while (c < codebook(m).length) {
        val cen = codebook(m)(c)
        var dot = 0.0
        var i = 0
        while (i < subDim && base + i < n) {
          val x = if (fl) v.getFloat(base + i).toDouble else v.getDouble(base + i)
          dot += x * cen(i)
          i += 1
        }
        tbl(c) = dot
        c += 1
      }
      rows(m) = new GenericArrayData(tbl)
      m += 1
    }
    new GenericArrayData(rows)
  }

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)

  override def prettyName: String = "pq_lut"
}

object PqLut {
  def apply(vec: Column, codebook: Array[Array[Array[Double]]]): Column =
    bridge.column(PqLut(bridge.expression(vec), codebook))
}

/** `pq_adc_score(codes, lut)` → double: `Σ_m lut(m)(codes(m))` — the ADC
  * hot path, one table lookup + add per subspace per (query, corpus-row)
  * pair. Codegen'd: this runs O(|corpus|·|queries|) times. Summation is in
  * subspace order, matching the declarative `aggregate(zip_with(...))`
  * spelling bit for bit.
  */
final case class PqAdcScore(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc_score expects (array<int>, array<array<double>>), got " +
          s"${l.catalogString} and ${r.catalogString}")
    }

  override def nullSafeEval(codesAny: Any, lutAny: Any): Any = {
    val codes = codesAny.asInstanceOf[ArrayData]
    val lut = lutAny.asInstanceOf[ArrayData]
    val n = math.min(codes.numElements(), lut.numElements())
    var sum = 0.0
    var m = 0
    while (m < n) {
      sum += lut.getArray(m).getDouble(codes.getInt(m))
      m += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, lut) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($codes.numElements(), $lut.numElements());
         |double $sum = 0.0;
         |for (int $m = 0; $m < $n; $m++) {
         |  $sum += $lut.getArray($m).getDouble($codes.getInt($m));
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcScore =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "pq_adc_score"
}

object PqAdcScore {
  def apply(codes: Column, lut: Column): Column =
    bridge.column(PqAdcScore(bridge.expression(codes), bridge.expression(lut)))
}
