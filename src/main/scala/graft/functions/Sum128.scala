package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, Decimal, DecimalType, LongType}

/** Exact decimal sum over an int128 (two-long) accumulator.
  *
  * Spark's builtin `sum` over decimals with result precision > 18 boxes
  * every row through BigDecimal (profiled at ~5-10x the cost of the
  * whole surrounding scan for TPC-H-style aggregates), while the
  * unscaled values of decimal(<=18, s) inputs are plain longs. This
  * aggregate adds those longs into a 128-bit two's-complement
  * accumulator — pure JVM long arithmetic per row, exact to 38 digits —
  * and converts to Decimal once per group at evaluation.
  *
  * Input: the UNSCALED long of the decimal input (wrap the column in
  * [[org.apache.spark.sql.catalyst.expressions.UnscaledValue]]; see
  * GraftBridge.sum128). Result: decimal(38, scale), null for empty /
  * all-null groups — the exact semantics and value of
  * `sum(x).cast(DecimalType(38, scale))`.
  *
  * Scale safety: a 128-bit accumulator holds +-1.7e38 — sums that
  * overflow it would overflow decimal(38) regardless of engine. Runs
  * under ObjectHashAggregate (same path as the MinHash/SimHash
  * aggregators; map-side partial aggregation preserved).
  */
case class Sum128(child: Expression, scale: Int,
                  mutableAggBufferOffset: Int = 0,
                  inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = DecimalType(38, scale)
  override def prettyName: String = "graft_sum128"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects the UNSCALED long of a decimal column, " +
        s"got ${child.dataType.sql}")

  // buffer = [hi, lo, nonNullCount]
  override def createAggregationBuffer(): Array[Long] = new Array[Long](3)

  override def update(b: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      val lo = b(1)
      val newLo = lo + x
      // unsigned carry out of the low word, sign-extended high word of x
      b(0) += (x >> 63) + (((lo & x) | ((lo | x) & ~newLo)) >>> 63)
      b(1) = newLo
      b(2) += 1
    }
    b
  }

  override def merge(b: Array[Long], o: Array[Long]): Array[Long] = {
    val lo = b(1)
    val newLo = lo + o(1)
    b(0) += o(0) + (((lo & o(1)) | ((lo | o(1)) & ~newLo)) >>> 63)
    b(1) = newLo
    b(2) += o(2)
    b
  }

  override def eval(b: Array[Long]): Any = {
    if (b(2) == 0) return null
    val bytes = new Array[Byte](16)
    var i = 0
    while (i < 8) {
      bytes(i) = (b(0) >>> (56 - i * 8)).toByte
      bytes(8 + i) = (b(1) >>> (56 - i * 8)).toByte
      i += 1
    }
    val bd = new java.math.BigDecimal(new java.math.BigInteger(bytes), scale)
    // a group sum whose magnitude lies between 10^38 and the int128 max
    // (~1.7e38) fits the accumulator but not decimal(38): return null,
    // matching the non-ANSI overflow semantics of the
    // sum(x).cast(DecimalType(38, scale)) this aggregate replaces
    if (bd.precision > 38) null
    else Decimal(bd, 38, scale)
  }

  override def serialize(b: Array[Long]): Array[Byte] = {
    val out = new Array[Byte](24)
    var i = 0
    while (i < 3) {
      var j = 0
      while (j < 8) {
        out(i * 8 + j) = (b(i) >>> (56 - j * 8)).toByte
        j += 1
      }
      i += 1
    }
    out
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val b = new Array[Long](3)
    var i = 0
    while (i < 3) {
      var v = 0L
      var j = 0
      while (j < 8) { v = (v << 8) | (bytes(i * 8 + j) & 0xFFL); j += 1 }
      b(i) = v
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): Sum128 =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): Sum128 =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Sum128 =
    copy(child = newChildren.head)
}
