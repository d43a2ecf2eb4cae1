package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd L2 normalization of a float/double array:
  * `v / ||v||`, zero-norm vectors unchanged — one fused loop replacing
  * the composable `transform(cast) → graft_dot → transform(divide)`
  * chain, whose two ArrayTransform passes run interpreted
  * (HigherOrderFunction is CodegenFallback) and allocate a boxed
  * intermediate array each per row.
  *
  * Semantics mirror the chain exactly: null elements contribute 0 to
  * the norm and stay null in the output; an all-null/empty/zero vector
  * has norm 0 and is returned unchanged (cast to double); a NaN/Inf
  * element poisons the norm exactly like the double arithmetic of the
  * chain (norm NaN/Inf ≠ 0 ⇒ the divide arm runs). The no-null fast
  * path emits an UnsafeArrayData primitive array (zero boxing).
  */
case class L2Normalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(DoubleType,
    containsNull = child.dataType.asInstanceOf[ArrayType].containsNull)
  override def prettyName: String = "graft_l2_normalize"

  private def fromFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any): Any =
    L2Normalize.normalize(a.asInstanceOf[ArrayData], fromFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = graft.functions.L2Normalize$$.MODULE$$.normalize($a, $fromFloat);
    """)

  override protected def withNewChildInternal(newChild: Expression): L2Normalize =
    copy(child = newChild)
}

object L2Normalize {
  def normalize(xs: ArrayData, fromFloat: Boolean): ArrayData = {
    val n = xs.numElements()
    var hasNull = false
    var i = 0
    while (i < n && !hasNull) { if (xs.isNullAt(i)) hasNull = true; i += 1 }
    if (!hasNull) {
      val v = new Array[Double](n)
      var s = 0.0
      i = 0
      while (i < n) {
        val d = if (fromFloat) xs.getFloat(i).toDouble else xs.getDouble(i)
        v(i) = d
        s += d * d
        i += 1
      }
      val norm = math.sqrt(s)
      if (norm != 0.0) {
        i = 0
        while (i < n) { v(i) = v(i) / norm; i += 1 }
      }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(v)
    } else {
      // null-element path: nulls contribute 0 to the norm and stay null
      val v = new Array[Any](n)
      var s = 0.0
      i = 0
      while (i < n) {
        if (!xs.isNullAt(i)) {
          val d = if (fromFloat) xs.getFloat(i).toDouble else xs.getDouble(i)
          v(i) = d
          s += d * d
        }
        i += 1
      }
      val norm = math.sqrt(s)
      if (norm != 0.0) {
        i = 0
        while (i < n) {
          if (v(i) != null) v(i) = v(i).asInstanceOf[Double] / norm
          i += 1
        }
      }
      new GenericArrayData(v)
    }
  }
}

/** The gate-shaped vector rendering
  * `array_join(transform(v, x -> cast(cast(round(x, 6) as decimal(10,6))
  * as string)), ",")` as one fused native pass. Mirrors each step of
  * the chain branch-for-branch:
  *  - Spark `round(double, 6)`: NaN/Inf pass through, else
  *    `BigDecimal.valueOf(x).setScale(6, HALF_UP).doubleValue`;
  *  - `cast(double AS decimal(10,6))`: NaN/Inf → null, else
  *    `valueOf(d).setScale(6, HALF_UP)`, precision > 10 → null;
  *  - `cast(decimal AS string)`: BigDecimal.toString (scale-6 plain
  *    form, trailing zeros kept);
  *  - `array_join(_, ",")`: null elements omitted (no separator).
  * Both semantics-defining BigDecimal roundings are kept (the skip/keep
  * decision near the precision fence must follow the double round-trip
  * exactly); everything else — the two interpreted ArrayTransform
  * passes, the per-element Decimal and UTF8String allocations, the
  * array_join pass — collapses into this loop.
  */
case class FormatDec6Csv(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.sql}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_format_dec6_csv"

  override protected def nullSafeEval(a: Any): Any =
    FormatDec6Csv.format(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = graft.functions.FormatDec6Csv$$.MODULE$$.format($a);
    """)

  override protected def withNewChildInternal(newChild: Expression): FormatDec6Csv =
    copy(child = newChild)
}

object FormatDec6Csv {
  def format(xs: ArrayData): UTF8String = {
    val n = xs.numElements()
    val sb = new java.lang.StringBuilder(n * 10)
    var first = true
    var i = 0
    while (i < n) {
      if (!xs.isNullAt(i)) {
        val x = xs.getDouble(i)
        // round(x, 6): NaN/Inf unchanged, else decimal HALF_UP at 6
        val d =
          if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
          else java.math.BigDecimal.valueOf(x)
            .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
        // cast to decimal(10,6): NaN/Inf → null; precision fence → null;
        // null elements are omitted by array_join
        if (!java.lang.Double.isNaN(d) && !java.lang.Double.isInfinite(d)) {
          val bd = java.math.BigDecimal.valueOf(d)
            .setScale(6, java.math.RoundingMode.HALF_UP)
          if (bd.precision <= 10) {
            if (!first) sb.append(',')
            sb.append(bd.toString)
            first = false
          }
        }
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}
