package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused nearest-seed assignment: argmax over k fixed seed vectors of
  * round(cos(vec, seed), 6), ties to the smaller seed id — one tight loop
  * over a baked-in primitive matrix, returning struct(cluster, ccos).
  *
  * The composable formulation (array of k struct(cos, -sid) literals ->
  * array_max) measured ~0.9 ms/row at k=8: the k 64-element literal
  * arrays, the per-row k-struct array allocation, and array_max's
  * interpreted struct ordering dominate the actual k·d multiply-adds by
  * ~100x. This expression computes the identical result — same dot
  * accumulation order as [[DoubleDotProduct]] (null elements contribute
  * 0, shorter-prefix length), same staged-norm division shape
  * `d / (nrm * seedNorm)`, same Spark HALF_UP round-to-6, same
  * ascending-seed-id tie break (iteration keeps the first maximum, and
  * seeds are ordered by id) — with zero per-row allocation beyond the
  * 2-field result row.
  *
  * NaN cosines (a zero-norm vector) are never selected (comparison
  * false), diverging from array_max's NaN-is-greatest ordering; vector
  * domains with zero-norm rows are outside every caller's contract.
  */
case class NearestSeed(child: Expression, sids: Array[Long],
                       seeds: Array[Array[Double]])
    extends UnaryExpression {

  require(sids.length == seeds.length && seeds.nonEmpty,
    "one seed id per seed vector, at least one seed")

  @transient private lazy val seedNorms: Array[Double] =
    seeds.map(s => math.sqrt(s.map(x => x * x).sum))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${dt.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("cluster", LongType, nullable = false),
    StructField("ccos", DoubleType, nullable = false)))

  override def prettyName: String = "graft_nearest_seed"


  def compute(a: Any): InternalRow = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    var ss = 0.0
    var i = 0
    while (i < n) {
      if (!v.isNullAt(i)) { val x = v.getDouble(i); ss += x * x }
      i += 1
    }
    val nrm = math.sqrt(ss)
    var bestCos = Double.NegativeInfinity
    var bestSid = sids(0)
    var s = 0
    while (s < seeds.length) {
      val sv = seeds(s)
      val m = math.min(n, sv.length)
      var d = 0.0
      var j = 0
      while (j < m) {
        if (!v.isNullAt(j)) d += v.getDouble(j) * sv(j)
        j += 1
      }
      val cos = NativeMath.roundHalfUp(d / (nrm * seedNorms(s)), 6)
      if (cos > bestCos) { bestCos = cos; bestSid = sids(s) }
      s += 1
    }
    InternalRow(bestSid, bestCos)
  }

  override protected def nullSafeEval(a: Any): Any = compute(a)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      // the loop lives in this class (referenced object), not in generated
      // source: k·d literals inlined into Janino were the original problem
      val ref = ctx.addReferenceObj("nearestSeed", this, classOf[NearestSeed].getName)
      s"${ev.value} = $ref.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): NearestSeed =
    copy(child = newChild)
}
