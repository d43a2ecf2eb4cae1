package graft.functions

import graft.core.RowCounts
import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.functions.sum

/** Footer-proven dispatch between a plain LONG sum and the int128
  * [[Sum128]] accumulator for exact decimal aggregates.
  *
  * [[Sum128]] is always correct but pays ~6 long ops and three buffer
  * slots per (row, aggregate). When parquet footer statistics PROVE the
  * whole-dataset sum of |unscaled values| fits a signed 64-bit long —
  * `max|unscaled| x rowCount < 2^63` — a plain `sum(LongType)` can never
  * wrap at any intermediate partial sum either (every partial sum is
  * bounded by the sum of absolute values), so the cheapest possible
  * accumulator is exact: one buffer slot, one add per row, and the
  * terminal [[org.apache.spark.sql.catalyst.expressions.MakeDecimal]]
  * reinterprets the long as decimal(38, scale) — bit-identical to
  * Sum128's result by construction (both are the exact integer sum at
  * the same scale; both are null for empty/all-null groups).
  *
  * This generalizes Spark's own `DecimalAggregates` optimizer rule
  * (which does the same unscaled-long rewrite but only up to precision 8,
  * where 10^9 x 2^33 rows can't wrap): footer stats substitute a proof
  * for the static precision cutoff. The decision is ZERO jobs — footers
  * are read driver-side at plan-build time (same pattern as
  * [[graft.core.RowCounts.of]]) — and fails SAFE: any unprovable input
  * (opaque plan, missing stats, non-finite bound, overflowing product)
  * keeps the Sum128 fallback. There is no way to force the long path
  * without a footer proof.
  */
object ExactSum {

  /** Upper bound on |unscaled| of `cast(column as decimal(_, scale))`
    * from footer stats of the BASE table scan, or None when unprovable.
    * Exact BigDecimal arithmetic, rounded toward +inf, +1 for the
    * HALF_UP rounding of the cast itself.
    */
  def unscaledAbsBound(base: DataFrame, column: String, scale: Int): Option[BigInt] =
    RowCounts.columnAbsBound(base, column).map { a =>
      (BigDecimal(a) * BigDecimal(10).pow(scale))
        .setScale(0, BigDecimal.RoundingMode.CEILING).toBigInt + 1
    }

  /** True when footer evidence proves the dataset-wide sum of absolute
    * unscaled values stays below 2^63 with `headroom`-fold margin.
    * `rows` must upper-bound how many input rows the summed expression
    * can see (for plans that only filter the base table,
    * [[RowCounts.upperBound]] of the base table is sound; callers whose
    * plan JOINS the fact side through unique-key dimensions pass the
    * fact-table bound plus a headroom factor and document the premise).
    */
  def fitsLong(perRowAbs: Option[BigInt], rows: Option[Long],
               headroom: Long = 1L): Boolean =
    (perRowAbs, rows) match {
      case (Some(b), Some(n)) if b > 0 && n >= 0 =>
        b * BigInt(n) * BigInt(headroom) < (BigInt(1) << 63)
      case _ => false
    }

  /** The dispatched aggregate: plain long sum reinterpreted as
    * decimal(38, scale) under a footer proof, [[Sum128]] otherwise.
    * `c` must be the unscaled long of the decimal input (same contract
    * as [[org.apache.spark.sql.GraftBridge.sum128Long]]).
    */
  def sumExact(c: Column, scale: Int, provenFitsLong: Boolean): Column =
    if (provenFitsLong) GraftBridge.makeDecimal38(sum(c), scale)
    else GraftBridge.sum128Long(c, scale)
}
