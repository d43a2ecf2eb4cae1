package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Per-row exact product `weight × value` as an int128 pair
  * `struct(hi, lo)` of the unscaled decimal(38,18) result — the
  * codegen-friendly replacement for
  * `weight.cast(decimal(9,0)) * value.cast(decimal(28,18))`, whose
  * decimal multiply (result precision 38 > 18) boxes through
  * BigDecimal on EVERY row and whose decimal(38,18) `sum` boxes again
  * per row.
  *
  * Bit-identical semantics chain, mirrored branch by branch:
  *  - `cast(long AS decimal(9,0))` overflows (|w| >= 1e9) → null;
  *  - `cast(double AS decimal(28,18))`: `Decimal(BigDecimal.decimal(x))
  *    .changePrecision(28,18)` = `BigDecimal.valueOf(x).setScale(18,
  *    HALF_UP)` (both go through Double.toString; scala's DECIMAL128
  *    MathContext never rounds a <=17-digit double literal), null on
  *    NaN/Infinity or precision > 28;
  *  - decimal(9,0) × decimal(28,18) → decimal(38,18) is EXACT (result
  *    precision 9+28+1 = 38, scale 0+18): unscaled38(product) =
  *    w × unscaled18(value), computed here as a signed 128×64-bit long
  *    multiply (|w| < 1e9, |unscaled18| < 1e28 ⇒ |product| < 1e37,
  *    no 128-bit overflow).
  *
  * The ONE BigDecimal op this keeps per row is the
  * `valueOf(x).setScale(18, HALF_UP)` that defines the cast's rounding
  * (Double.toString shortest-representation semantics are not
  * reproducible in long arithmetic); the multiply and the sum both
  * leave BigDecimal entirely. Feed the struct to [[Sum128Pair]].
  */
case class ProductUnscaled18(weight: Expression, value: Expression)
    extends BinaryExpression {

  override def left: Expression = weight
  override def right: Expression = value
  override def prettyName: String = "graft_product_unscaled18"

  override def checkInputDataTypes(): TypeCheckResult =
    if (weight.dataType == LongType && value.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (long, double), got " +
        s"(${weight.dataType.sql}, ${value.dataType.sql})")

  override def dataType: DataType = StructType(Seq(
    StructField("hi", LongType, nullable = false),
    StructField("lo", LongType, nullable = false)))
  override def nullable: Boolean = true

  override protected def nullSafeEval(w: Any, x: Any): Any =
    ProductUnscaled18.prod(w.asInstanceOf[Long], x.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, x) => s"""
      ${ev.value} = graft.functions.ProductUnscaled18$$.MODULE$$.prod($w, $x);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ProductUnscaled18 =
    copy(weight = newLeft, value = newRight)
}

object ProductUnscaled18 {

  /** HashAggregate's generated update evaluates the agg child
    * expression ONCE PER BUFFER SLOT (hi/lo/cnt plus their null
    * guards — measured 6 call sites per row, no subexpression
    * elimination across slot expressions), and CollapseProject inlines
    * a single-consumer projected alias straight back into the
    * aggregate, so the expression cannot be staged once in the plan
    * either. This per-thread last-input memo collapses those
    * same-row re-evaluations to one BigDecimal compute: the key is the
    * raw (weight, value-bits) pair and every slot expression runs on
    * the same thread within a row. Measured: the unmemoized form was
    * ~10% SLOWER than the boxed decimal chain it replaces at the 100x
    * tier; memoized it wins (SCALE_STRESS r14).
    *
    * The memo caches the two RESULT LONGS, never a row object: each
    * call allocates a fresh GenericInternalRow (nursery-cheap next to
    * the BigDecimal setScale the memo exists to skip), so a consumer
    * that retains or defers reading the struct (sort buffering,
    * collect of the raw struct) can never observe a later row's values
    * through an aliased buffer. The expression is also deliberately
    * unregistered in SQL and only reachable through
    * GraftBridge.sum128Product, whose Sum128Pair reads the two fields
    * immediately.
    */
  private val memo = new ThreadLocal[Memo] {
    override def initialValue(): Memo = new Memo
  }
  private final class Memo {
    var has = false
    var w = 0L
    var bits = 0L
    var isNull = false
    var hi = 0L
    var lo = 0L
  }

  /** Static target for both eval and generated code; null mirrors the
    * cast chain's null arms (see class doc). */
  def prod(w: Long, x: Double): InternalRow = {
    val m = memo.get()
    val bits = java.lang.Double.doubleToRawLongBits(x)
    if (!(m.has && m.w == w && m.bits == bits)) {
      m.has = true; m.w = w; m.bits = bits
      compute(w, x, m)
    }
    if (m.isNull) null else new GenericInternalRow(Array[Any](m.hi, m.lo))
  }

  private def compute(w: Long, x: Double, m: Memo): Unit = {
    m.isNull = true
    if (w <= -1000000000L || w >= 1000000000L) return
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) return
    val bd = java.math.BigDecimal.valueOf(x)
      .setScale(18, java.math.RoundingMode.HALF_UP)
    if (bd.precision > 28) return
    val u = bd.unscaledValue()
    // int128 of unscaled18(value), two's complement (arithmetic shift
    // sign-extends the high word for negative values)
    val lo0 = u.longValue()
    val hi0 = u.shiftRight(64).longValue()
    // signed 128×64 multiply, exact in 128 bits for |result| < 2^127:
    // value = hi0·2^64 + lo0ᵤ; w·lo0ᵤ has high word multiplyHigh(w,lo0)
    // + w·[lo0 < 0] (unsigned-operand correction), low word wraps
    val lo = lo0 * w
    var hi = hi0 * w + Math.multiplyHigh(w, lo0)
    if (lo0 < 0) hi += w
    m.isNull = false; m.hi = hi; m.lo = lo
  }
}

/** [[Sum128]] over pre-multiplied int128 `struct(hi, lo)` inputs (see
  * [[ProductUnscaled18]]): exact decimal(38, scale) sum with a two-long
  * declarative accumulator — whole-stage-codegen'd primitive long
  * arithmetic per row, one Decimal materialization per GROUP. Same
  * carry arithmetic, overflow contract, and empty/all-null-group null
  * semantics as [[Sum128]].
  */
case class Sum128Pair(child: Expression, scale: Int) extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = DecimalType(38, scale)
  override def prettyName: String = "graft_sum128_pair"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StructType(Array(StructField(_, LongType, _, _), StructField(_, LongType, _, _))) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects struct(hi: long, lo: long), got ${other.sql}")
  }

  private lazy val hi = AttributeReference("hi", LongType, nullable = false)()
  private lazy val lo = AttributeReference("lo", LongType, nullable = false)()
  private lazy val cnt = AttributeReference("cnt", LongType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(hi, lo, cnt)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(0L))

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
    val inHi = GetStructField(child, 0, Some("hi"))
    val inLo = GetStructField(child, 1, Some("lo"))
    val (nh, nl) = addWide(hi, lo, inHi, inLo)
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
      newChildren: IndexedSeq[Expression]): Sum128Pair =
    copy(child = newChildren.head)
}
