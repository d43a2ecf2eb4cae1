package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused count-and-replace over one java-regex pattern:
  * `struct(n: long, redacted: string)` in ONE Matcher pass — the exact
  * values of `size(regexp_extract_all(text, re, 0))` and
  * `regexp_replace(text, re, repl)` computed together. The composable
  * formulation runs TWO full regex scans per pattern (count, then
  * replace); a PII-redaction chain of three patterns paid six scans of
  * every document where three suffice. Same engine (java.util.regex),
  * same non-overlapping left-to-right match discipline — bit-identical
  * outputs by construction, pinned by spec against the composable form.
  *
  * `replacement` is treated LITERALLY (no $-group or backslash
  * interpolation) — the redaction tokens this exists for never carry
  * them, and literal quoting sidesteps the regexp_replace
  * dollar-escaping rules entirely.
  */
case class RegexRedact(child: Expression, pattern: String, replacement: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("redacted", StringType, nullable = false)))
  override def prettyName: String = "graft_regex_redact"

  @transient private lazy val compiled = RegexRedact.compile(pattern, replacement)

  override protected def nullSafeEval(s: Any): Any =
    compiled.apply(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("redactor", compiled,
      classOf[RegexRedact.Compiled].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.apply($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): RegexRedact =
    copy(child = newChild)
}

object RegexRedact {

  def compile(pattern: String, replacement: String): Compiled =
    new Compiled(pattern, replacement)

  /** Serializable per-expression state: the compiled pattern rides to
    * executors once (Pattern is serializable), the quoted replacement is
    * applied literally.
    */
  final class Compiled(pattern: String, replacement: String) extends Serializable {
    @transient private lazy val p = java.util.regex.Pattern.compile(pattern)

    def apply(text: UTF8String): InternalRow = {
      val s = text.toString
      val m = p.matcher(s)
      var n = 0L
      val sb = new java.lang.StringBuilder(s.length)
      var last = 0
      while (m.find()) {
        n += 1
        sb.append(s, last, m.start()).append(replacement)
        last = m.end()
      }
      sb.append(s, last, s.length)
      InternalRow(n, UTF8String.fromString(sb.toString))
    }
  }
}
