package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fused product-quantization encoder: split the vector into m
  * contiguous subspaces of `subDim` dims; in each subspace pick the
  * nearest codebook entry by rounded squared distance (ties to the
  * smaller code index). Returns array of struct(subspace, code, dist) —
  * one entry per subspace, dist = round(||x||² − 2·c·x + ||c||², 6)
  * of the winner (the exact expansion an external engine reproduces
  * term-for-term; ||c||² folds at construction with the same sequential
  * sum as the dot loop).
  *
  * Same single-loop referenced-object structure as [[NearestSeed]] — a
  * composable m×k literal-array formulation pays ~100x the multiply-adds
  * in interpreted overhead. Null elements contribute 0 (the
  * [[DoubleDotProduct]] convention); a vector shorter than a subspace's
  * end treats missing dims as 0.
  */
case class PqEncode(child: Expression,
                    codebooks: Array[Array[Array[Double]]], subDim: Int)
    extends UnaryExpression {

  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty) && subDim > 0,
    "m >= 1 subspaces, each with a non-empty codebook, subDim > 0")

  @transient private lazy val cNorm2: Array[Array[Double]] =
    codebooks.map(_.map(_.map(x => x * x).sum))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${dt.sql}")
  }

  private val entryType = StructType(Seq(
    StructField("subspace", IntegerType, nullable = false),
    StructField("code", IntegerType, nullable = false),
    StructField("dist", DoubleType, nullable = false)))

  override def dataType: DataType = ArrayType(entryType, containsNull = false)

  override def prettyName: String = "graft_pq_encode"


  def compute(a: Any): ArrayData = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    val out = new Array[Any](codebooks.length)
    var s = 0
    while (s < codebooks.length) {
      val off = s * subDim
      val end = math.min(off + subDim, n)
      var lx2 = 0.0
      var j = off
      while (j < end) {
        if (!v.isNullAt(j)) { val x = v.getDouble(j); lx2 += x * x }
        j += 1
      }
      val book = codebooks(s)
      var bestDist = Double.PositiveInfinity
      var bestCode = 0
      var c = 0
      while (c < book.length) {
        val ctr = book(c)
        var d = 0.0
        var k = off
        // bound by the ENTRY's length too: a ragged codebook entry's
        // missing dims contribute 0, the same convention as the input side
        val endC = math.min(end, off + ctr.length)
        while (k < endC) {
          if (!v.isNullAt(k)) d += v.getDouble(k) * ctr(k - off)
          k += 1
        }
        val dist = NativeMath.roundHalfUp(lx2 - 2 * d + cNorm2(s)(c), 6)
        if (dist < bestDist) { bestDist = dist; bestCode = c }
        c += 1
      }
      out(s) = InternalRow(s, bestCode, bestDist)
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(a: Any): Any = compute(a)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("pqEncode", this, classOf[PqEncode].getName)
      s"${ev.value} = $ref.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}
