package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Symmetric per-vector int8 quantization as ONE native pass:
  * `struct(scale: double, quantized: array<int>)` — the composable
  * form ran an interpreted `aggregate` fold for max|x| plus two
  * interpreted `transform` passes (HigherOrderFunction is
  * CodegenFallback) with a boxed intermediate array each.
  *
  * Semantics mirror the chain branch-for-branch:
  *  - max|x| folds with `Math.max` (null elements skipped exactly like
  *    `greatest(acc, abs(null))`; NaN wins the fold like Spark's
  *    NaN-greatest ordering);
  *  - `scale = round(max/127, 6)`: Spark Round on double — NaN/Inf
  *    pass through, else BigDecimal HALF_UP (the semantics-defining
  *    per-row BigDecimal this keeps);
  *  - `scale == 0` ⇒ all-zero codes of the same length (the chain's
  *    `transform(_, _ => 0)` maps null elements to 0 too);
  *  - else `round(x/scale, 0).cast(int)` per element: null stays
  *    null, NaN/Inf ride Round's passthrough into the non-ANSI
  *    double→int cast (`.toInt`: NaN→0, ±Inf→Int.{Max,Min}Value).
  */
case class QuantizeInt8(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double>, got ${other.sql}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("quantized", ArrayType(IntegerType,
      containsNull = child.dataType.asInstanceOf[ArrayType].containsNull),
      nullable = false)))
  override def prettyName: String = "graft_quantize_int8"

  private def fromFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any): Any =
    QuantizeInt8.quantize(a.asInstanceOf[ArrayData], fromFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = graft.functions.QuantizeInt8$$.MODULE$$.quantize($a, $fromFloat);
    """)

  override protected def withNewChildInternal(newChild: Expression): QuantizeInt8 =
    copy(child = newChild)
}

object QuantizeInt8 {

  private def round0(q: Double): Double =
    if (java.lang.Double.isNaN(q) || java.lang.Double.isInfinite(q)) q
    else java.math.BigDecimal.valueOf(q)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()

  def quantize(xs: ArrayData, fromFloat: Boolean): InternalRow = {
    val n = xs.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      if (!xs.isNullAt(i)) {
        val d = if (fromFloat) xs.getFloat(i).toDouble else xs.getDouble(i)
        maxAbs = Math.max(maxAbs, Math.abs(d))
      }
      i += 1
    }
    val pre = maxAbs / 127.0
    val scale =
      if (java.lang.Double.isNaN(pre) || java.lang.Double.isInfinite(pre)) pre
      else java.math.BigDecimal.valueOf(pre)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val out: ArrayData =
      if (scale == 0.0) {
        // the chain's transform(_, _ => 0): EVERY element (nulls too) → 0
        val v = new Array[Int](n)
        org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray(v)
      } else {
        var hasNull = false
        i = 0
        while (i < n && !hasNull) { if (xs.isNullAt(i)) hasNull = true; i += 1 }
        if (!hasNull) {
          val v = new Array[Int](n)
          i = 0
          while (i < n) {
            val d = if (fromFloat) xs.getFloat(i).toDouble else xs.getDouble(i)
            v(i) = round0(d / scale).toInt
            i += 1
          }
          org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
            .fromPrimitiveArray(v)
        } else {
          val v = new Array[Any](n)
          i = 0
          while (i < n) {
            if (!xs.isNullAt(i)) {
              val d = if (fromFloat) xs.getFloat(i).toDouble else xs.getDouble(i)
              v(i) = round0(d / scale).toInt
            }
            i += 1
          }
          new GenericArrayData(v)
        }
      }
    InternalRow(scale, out)
  }
}

/** `array_join(transform(arr, _.cast(string)), ",")` over array<int>
  * as one pass (null elements omitted, like array_join). */
case class IntCsv(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<int>, got ${other.sql}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_int_csv"

  override protected def nullSafeEval(a: Any): Any =
    IntCsv.format(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.IntCsv$$.MODULE$$.format($a);")

  override protected def withNewChildInternal(newChild: Expression): IntCsv =
    copy(child = newChild)
}

object IntCsv {
  def format(xs: ArrayData): UTF8String = {
    val n = xs.numElements()
    val sb = new java.lang.StringBuilder(n * 4)
    var first = true
    var i = 0
    while (i < n) {
      if (!xs.isNullAt(i)) {
        if (!first) sb.append(',')
        sb.append(xs.getInt(i))
        first = false
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}
