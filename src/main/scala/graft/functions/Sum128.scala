package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.types.{DataType, Decimal, DecimalType, LongType}

/** Exact decimal sum over an int128 (two-long) accumulator.
  *
  * Spark's builtin `sum` over decimals with result precision > 18 boxes
  * every row through BigDecimal (profiled at ~5-10x the cost of the
  * whole surrounding scan for TPC-H-style aggregates), while the
  * unscaled values of decimal(<=18, s) inputs are plain longs. This
  * aggregate adds those longs into a 128-bit two's-complement
  * accumulator — pure long arithmetic per row, exact to 38 digits —
  * and converts to Decimal once per group at evaluation.
  *
  * DECLARATIVE, deliberately: the round-12 form was a
  * TypedImperativeAggregate, which forces ObjectHashAggregate — no
  * whole-stage codegen for the entire aggregation stage, an
  * interpreted `child.eval` (boxing one java.lang.Long PER ROW PER
  * AGGREGATE — q1 runs five of these over every lineitem row), and an
  * Array[Long] buffer object per group. Expressed declaratively over
  * three LongType buffer slots, the same carry arithmetic compiles into
  * HashAggregate's generated update loop: primitive longs end to end,
  * zero allocation per row. The adds use EvalMode.LEGACY explicitly —
  * two's-complement WRAPPING of the low word is the algorithm, not an
  * overflow to detect, and the expression must keep wrapping even if a
  * future session flips spark.sql.ansi.enabled.
  *
  * Input: the UNSCALED long of the decimal input (wrap the column in
  * [[org.apache.spark.sql.catalyst.expressions.UnscaledValue]]; see
  * GraftBridge.sum128). Result: decimal(38, scale), null for empty /
  * all-null groups — the exact semantics and value of
  * `sum(x).cast(DecimalType(38, scale))`.
  *
  * Scale safety: a 128-bit accumulator holds +-1.7e38 — sums that
  * overflow it would overflow decimal(38) regardless of engine; a group
  * sum between 10^38 and the int128 max returns null, matching the
  * non-ANSI overflow semantics of the cast form this replaces.
  */
case class Sum128(child: Expression, scale: Int) extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = DecimalType(38, scale)
  override def prettyName: String = "graft_sum128"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects the UNSCALED long of a decimal column, " +
        s"got ${child.dataType.sql}")

  private lazy val hi = AttributeReference("hi", LongType, nullable = false)()
  private lazy val lo = AttributeReference("lo", LongType, nullable = false)()
  private lazy val cnt = AttributeReference("cnt", LongType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(hi, lo, cnt)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(0L))

  /** (hi1, lo1) + (hi2, lo2) in two's-complement int128: low words add
    * with wrap; the unsigned carry-out of the low add is
    * `((lo1 & lo2) | ((lo1 | lo2) & ~newLo)) >>> 63` (carry iff both top
    * bits set, or either set and the result's top bit clear); high words
    * add the carry. Identical arithmetic to the imperative r12 form —
    * the spec's random-128-bit fold pins value equality against
    * BigInteger.
    */
  private def addWide(hi1: Expression, lo1: Expression,
                      hi2: Expression, lo2: Expression): (Expression, Expression) = {
    def add(a: Expression, b: Expression) = Add(a, b, EvalMode.LEGACY)
    val newLo = add(lo1, lo2)
    val carry = ShiftRightUnsigned(
      BitwiseOr(BitwiseAnd(lo1, lo2),
        BitwiseAnd(BitwiseOr(lo1, lo2), BitwiseNot(newLo))),
      Literal(63))
    (add(add(hi1, hi2), carry), newLo)
  }

  override lazy val updateExpressions: Seq[Expression] = {
    // sign-extended high word of the input: (x >> 63, x)
    val (nh, nl) = addWide(hi, lo, ShiftRight(child, Literal(63)), child)
    Seq(
      If(IsNull(child), hi, nh),
      If(IsNull(child), lo, nl),
      If(IsNull(child), cnt, Add(cnt, Literal(1L), EvalMode.LEGACY)))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val (nh, nl) = addWide(hi.left, lo.left, hi.right, lo.right)
    Seq(nh, nl, Add(cnt.left, cnt.right, EvalMode.LEGACY))
  }

  override lazy val evaluateExpression: Expression =
    If(EqualTo(cnt, Literal(0L)),
      Literal(null, dataType),
      Int128ToDecimal(hi, lo, scale))

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Sum128 =
    copy(child = newChildren.head)
}

/** (hi, lo) int128 → decimal(38, scale); null when the exact value needs
  * more than 38 digits (see [[Sum128]]'s overflow contract). Runs once
  * per GROUP (Sum128's evaluateExpression). It carries a REAL doGenCode
  * (one static call into [[Int128ToDecimal.convert]]) — a CodegenFallback
  * here would poison the whole aggregation stage's codegen: HashAggregate
  * compiles the result projection into the generated class, where the
  * fallback path's INPUT_ROW reference is null and code generation
  * itself crashes (hit in spec, not a theoretical concern).
  */
case class Int128ToDecimal(hiExpr: Expression, loExpr: Expression, scale: Int)
    extends BinaryExpression {

  override def left: Expression = hiExpr
  override def right: Expression = loExpr
  override def dataType: DataType = DecimalType(38, scale)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_int128_to_decimal"

  override protected def nullSafeEval(h: Any, l: Any): Any =
    Int128ToDecimal.convert(h.asInstanceOf[Long], l.asInstanceOf[Long], scale)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (h, l) => s"""
      ${ev.value} = graft.functions.Int128ToDecimal$$.MODULE$$.convert($h, $l, $scale);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Int128ToDecimal =
    copy(hiExpr = newLeft, loExpr = newRight)
}

object Int128ToDecimal {
  /** Static conversion target for both eval and generated code. */
  def convert(hiV: Long, loV: Long, scale: Int): Decimal = {
    val bytes = new Array[Byte](16)
    var i = 0
    while (i < 8) {
      bytes(i) = (hiV >>> (56 - i * 8)).toByte
      bytes(8 + i) = (loV >>> (56 - i * 8)).toByte
      i += 1
    }
    val bd = new java.math.BigDecimal(new java.math.BigInteger(bytes), scale)
    if (bd.precision > 38) null
    else Decimal(bd, 38, scale)
  }
}
