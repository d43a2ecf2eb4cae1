package graft.functions

/** Shared rounding for the native expressions whose results must agree
  * with Spark's `round` and the DuckDB oracles: HALF_UP via BigDecimal,
  * NaN/Infinity passed through (Spark's Round does the same). This is
  * the load-bearing oracle-equivalence contract — keep it in ONE place.
  */
private[functions] object NativeMath {
  def roundHalfUp(x: Double, scale: Int): Double =
    if (x.isNaN || x.isInfinite) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue()
}
