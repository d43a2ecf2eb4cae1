package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Intersection size of two SORTED-DISTINCT long arrays as one codegen'd
  * two-pointer merge — the exact-verification kernel of the LSH dedup
  * family.
  *
  * Semantically `size(array_intersect(a, b))` when both inputs are sorted
  * and duplicate-free (exactly what [[ShingleHashes]] emits — it sorts and
  * uniques before returning), but the builtin builds an OpenHashSet per
  * row; the merge walks both arrays once with zero allocation. The sorted
  * contract is the caller's: on unsorted input the result is undefined
  * (spec-pinned against the builtin on ShingleHashes output, not arbitrary
  * arrays).
  *
  * This changes the SHAPE of exact verification, not just its constant:
  * verifying candidates against per-doc arrays is two id-equi joins plus a
  * per-row merge, where the exploded formulation joined every candidate
  * against the full (doc, shingle) table twice and paid a groupBy shuffle
  * of all matched shingle rows to count them. The candidate-pair frame
  * shrinks from O(sum of intersecting shingles) rows to O(pairs).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCount.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SortedIntersectCount.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {

  /** Two-pointer merge count over sorted-distinct long arrays. Static +
    * JVM-typed so generated code calls it directly. Null elements cannot
    * occur ([[ShingleHashes]] emits containsNull = false); arrays from
    * other producers with nulls would have failed the sorted contract
    * already.
    */
  def compute(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { c += 1L; i += 1; j += 1 }
    }
    c
  }
}
