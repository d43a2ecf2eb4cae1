package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused nearest-centroid assignment for trained (k-means) centers:
  * argmax over cells of the squared-distance-monotone score
  * 2·c·x − ||c||² (ties to the smaller cell index), returning
  * struct(cell, ccos) where ccos = round(cos(vec, winner), 9) — the
  * centroid-cosine [[graft.operators.Dedup.semanticDedupKMeans]]'s
  * keepFarthest survivor rank uses.
  *
  * Same motivation and structure as [[NearestSeed]] (the composable
  * array-of-structs + array_max chain pays ~100x the k·d multiply-adds
  * in literal-array and struct-ordering overhead); the difference is the
  * metric — k-means assignment is Euclidean, which only coincides with
  * cosine on normalized vectors — and that the old formulation computed
  * ALL k centroid cosines per row to index one; here only the winner's
  * is computed. Accumulation order matches [[DoubleDotProduct]] (null
  * elements contribute 0, shorter-prefix length); ||c||² folds at
  * construction with the same sequential sum.
  */
case class NearestCenter(child: Expression, centers: Array[Array[Double]],
                         tieHigh: Boolean = false)
    extends UnaryExpression {

  require(centers.nonEmpty, "at least one center")

  @transient private lazy val cNorm2: Array[Double] =
    centers.map(_.map(x => x * x).sum)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${dt.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("cell", IntegerType, nullable = false),
    StructField("ccos", DoubleType, nullable = false)))

  override def prettyName: String = "graft_nearest_center"


  def compute(a: Any): InternalRow = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    var bestScore = Double.NegativeInfinity
    var bestCell = 0
    var bestDot = 0.0
    var c = 0
    while (c < centers.length) {
      val ctr = centers(c)
      val m = math.min(n, ctr.length)
      var d = 0.0
      var j = 0
      while (j < m) {
        if (!v.isNullAt(j)) d += v.getDouble(j) * ctr(j)
        j += 1
      }
      val score = d * 2 - cNorm2(c)
      // tieHigh replicates array_max over struct(score, cell): among
      // equal scores the HIGHEST cell index wins (lexicographic struct
      // max); the default keeps the original smaller-index rule.
      // NaN arm: a NaN-poisoned vector makes every score NaN, and IEEE
      // `>`/`==` are always false on NaN — without it the loop would
      // silently return cell 0 while Spark's struct ordering (array_max)
      // treats NaN as GREATER than everything and NaN == NaN for ties.
      // Double.compare implements exactly that total order, but is only
      // consulted when a NaN is actually present: for finite scores the
      // IEEE operators are kept so -0.0 == 0.0 stays a tie (Double
      // .compare would rank them, silently changing finite tie-breaks).
      val better =
        if (java.lang.Double.isNaN(score) || java.lang.Double.isNaN(bestScore)) {
          val cmp = java.lang.Double.compare(score, bestScore)
          cmp > 0 || (tieHigh && cmp == 0)
        } else score > bestScore || (tieHigh && score == bestScore)
      if (better) {
        bestScore = score; bestCell = c; bestDot = d
      }
      c += 1
    }
    var ss = 0.0
    var i = 0
    while (i < n) {
      if (!v.isNullAt(i)) { val x = v.getDouble(i); ss += x * x }
      i += 1
    }
    val ccos = NativeMath.roundHalfUp(
      bestDot / (math.sqrt(ss) * math.sqrt(cNorm2(bestCell))), 9)
    InternalRow(bestCell, ccos)
  }

  override protected def nullSafeEval(a: Any): Any = compute(a)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("nearestCenter", this, classOf[NearestCenter].getName)
      s"${ev.value} = $ref.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCenter =
    copy(child = newChild)
}
