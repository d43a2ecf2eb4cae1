package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Bounded per-group top-k: the k smallest (score, id) pairs of the
  * group, as an array of struct(score, id) sorted ascending by
  * (score, id) — exactly the rows a
  * `row_number() OVER (PARTITION BY g ORDER BY score, id) <= k` window
  * keeps, WITHOUT the window's full shuffle: this runs under
  * ObjectHashAggregate with map-side partial aggregation (typed object
  * state is the right call HERE — the buffer is a bounded heap, not
  * fixed-width slots, unlike Sum128 which went declarative in r13), so
  * each task ships AT MOST k pairs per group into the
  * exchange instead of every candidate row. For the ANN join
  * ([[graft.operators.Similarity.IvfPqIndex.topKJoin]]) that turns a
  * candidates-sized shuffle (|probes| × nProbe × cellSize pairs) into a
  * bounded |probes| × k × tasks one — the difference between a window
  * and a TakeOrdered at 100 TB.
  *
  * Determinism: (score, id) is a total order (callers pre-round score;
  * ids are distinct within a group), so the min-k SET and its sorted
  * order are exact — bit-identical to the window formulation, pinned by
  * spec. Scores compare under Spark's SQL double ordering (NaN greater
  * than every number, -0.0 == 0.0), so a NaN score ranks LAST exactly as
  * the window's ascending sort ranks it. NULL inputs are rejected at
  * type-check time: Spark's ascending ORDER BY is NULLS FIRST, so the
  * window formulation would rank null-score rows at the TOP of each
  * group — silently skipping them (the only sane aggregate behavior)
  * would diverge. A caller with a nullable score/id column must decide
  * (filter the nulls or coalesce them) before aggregating; the
  * type-check failure makes that decision explicit instead of latent.
  */
case class BoundedTopK(scoreExpr: Expression, idExpr: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BoundedTopK.Buf] {

  require(k >= 1, "k >= 1")

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_bounded_topk"

  override def checkInputDataTypes(): TypeCheckResult =
    if (scoreExpr.dataType != DoubleType || idExpr.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (double, bigint), got " +
          s"(${scoreExpr.dataType.sql}, ${idExpr.dataType.sql})")
    else if (scoreExpr.nullable || idExpr.nullable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires non-nullable inputs (a null row has no " +
          "defined rank here: the equivalent row_number window ranks " +
          "null scores FIRST under NULLS FIRST while an aggregate can " +
          "only skip them) — filter or coalesce nulls before aggregating; " +
        s"got (nullable=${scoreExpr.nullable}, nullable=${idExpr.nullable})")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): BoundedTopK.Buf =
    new BoundedTopK.Buf(k)

  override def update(b: BoundedTopK.Buf, input: InternalRow): BoundedTopK.Buf = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null)
      b.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    b
  }

  override def merge(b: BoundedTopK.Buf, o: BoundedTopK.Buf): BoundedTopK.Buf = {
    var i = 0
    while (i < o.size) { b.offer(o.scores(i), o.ids(i)); i += 1 }
    b
  }

  override def eval(b: BoundedTopK.Buf): Any = {
    // same comparator as the keep/reject path (Spark SQL double order),
    // so the emitted order can't disagree with the retained set on NaN
    val idx = Array.range(0, b.size).sortWith { (i, j) =>
      val c = BoundedTopK.cmpScore(b.scores(i), b.scores(j))
      c < 0 || (c == 0 && b.ids(i) < b.ids(j))
    }
    val rows = new Array[Any](b.size)
    var r = 0
    while (r < rows.length) {
      rows(r) = InternalRow(b.scores(idx(r)), b.ids(idx(r)))
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }

  override def serialize(b: BoundedTopK.Buf): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(4 + b.size * 16)
    out.putInt(b.size)
    var i = 0
    while (i < b.size) { out.putDouble(b.scores(i)); out.putLong(b.ids(i)); i += 1 }
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): BoundedTopK.Buf = {
    val in = java.nio.ByteBuffer.wrap(bytes)
    val n = in.getInt
    val b = new BoundedTopK.Buf(k)
    var i = 0
    while (i < n) { b.offer(in.getDouble, in.getLong); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedTopK =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
}

object BoundedTopK {

  /** Spark's SQL ordering for doubles: equal-by-== first (so -0.0 == 0.0,
    * as Spark's float normalization guarantees at sort time), then IEEE
    * total order for the rest — which places NaN above every number,
    * exactly where an ascending window sort ranks it. Primitive `>` here
    * would instead make NaN incomparable (every comparison false): a NaN
    * score could neither be rejected once the buffer is full nor ever be
    * replaced — a silent divergence from the pinned window equivalence.
    */
  private[functions] def cmpScore(s1: Double, s2: Double): Int =
    if (s1 == s2) 0 else java.lang.Double.compare(s1, s2)

  /** k-bounded pair set: flat arrays plus the index of the current
    * WORST kept pair — O(1) reject for the common below-threshold row,
    * O(k) replace (k is small: a top-k query's k, not a corpus bound).
    */
  final class Buf(k: Int) {
    val scores = new Array[Double](k)
    val ids = new Array[Long](k)
    var size = 0
    private var worst = -1 // index of max (score, id) among kept, -1 = unknown

    private def gt(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
      val c = cmpScore(s1, s2)
      c > 0 || (c == 0 && i1 > i2)
    }

    private def findWorst(): Unit = {
      worst = 0
      var i = 1
      while (i < size) {
        if (gt(scores(i), ids(i), scores(worst), ids(worst))) worst = i
        i += 1
      }
    }

    def offer(s: Double, id: Long): Unit = {
      if (size < k) {
        scores(size) = s; ids(size) = id; size += 1
        if (size == k) findWorst()
      } else {
        if (worst < 0) findWorst()
        if (gt(scores(worst), ids(worst), s, id)) {
          scores(worst) = s; ids(worst) = id
          findWorst()
        }
      }
    }
  }
}
