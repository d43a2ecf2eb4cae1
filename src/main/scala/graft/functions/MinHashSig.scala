package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Whole MinHash signature from a document's shingle-hash array, in-row:
  * `minhash_i = min over shingles of (a_i * h + b_i) mod p` with the
  * fixed LCG-generated permutation family (seed 42 — deterministic
  * across runs and engines).
  *
  * The per-doc shingle set already exists as one in-row array (see
  * [[ShingleHashes]]), so signature computation is a MAP — the previous
  * explode → groupBy(doc) aggregation re-assembled what the row already
  * held, paying a full shuffle of every shingle occurrence plus typed-
  * aggregator encoder overhead per row. At 100 TB the signature pass is
  * now scan-bound with zero shuffle.
  *
  * Empty arrays (docs with fewer tokens than the shingle width) yield
  * Long.MaxValue in every slot — callers drop them before banding,
  * exactly as such docs previously produced no aggregation group.
  */
case class MinHashSig(child: Expression, numPerm: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if numPerm >= 1 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<long> and numPerm >= 1, got ${other.sql}, numPerm=$numPerm")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  @transient private lazy val perms: Array[Long] = MinHashSig.permutations(numPerm)

  override protected def nullSafeEval(a: Any): Any =
    MinHashSig.compute(a.asInstanceOf[ArrayData], perms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("perms", perms, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSig.compute($c, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {

  /** Mersenne prime 2^31 - 1: a*h+b stays inside signed 64-bit. */
  val Prime: Long = 2147483647L

  /** Flattened (a_0, b_0, a_1, b_1, ...) LCG-generated coefficients —
    * the single source of the permutation family.
    */
  def permutations(n: Int, seed: Long = 42L): Array[Long] = {
    var s = seed
    def next(): Long = {
      s = s * 6364136223846793005L + 1442695040888963407L
      (s >>> 33) % (Prime - 1) + 1
    }
    Array.fill(n * 2)(next())
  }

  def compute(arr: ArrayData, perms: Array[Long]): ArrayData = {
    val np = perms.length / 2
    val buf = new Array[Long](np)
    java.util.Arrays.fill(buf, Long.MaxValue)
    val m = arr.numElements()
    var j = 0
    while (j < m) {
      val h = ((arr.getLong(j) % Prime) + Prime) % Prime
      var i = 0
      while (i < np) {
        val v = (h * perms(2 * i) + perms(2 * i + 1)) % Prime
        if (v < buf(i)) buf(i) = v
        i += 1
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(buf)
  }
}
