package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The full three-pattern PII redaction chain (email → IPv4 → digit-run)
  * as ONE hand-rolled scanner expression:
  * `struct(n_emails, n_ipv4, n_digit_runs: long, redacted: string)`.
  *
  * Replaces three chained [[RegexRedact]] java-regex passes. The java
  * regex engine memoizes nothing: the email pattern's greedy
  * `[A-Za-z0-9._%+-]+` re-consumes each word from every start offset it
  * retries (O(w²) char work per w-length word of ordinary text that
  * never matches), and every pass pays a UTF8String→String decode plus
  * a fresh String re-encode. This scanner is a single decode, three
  * linear char passes with run-skipping (a failed candidate resumes
  * AFTER the run that failed, never inside it), and one re-encode.
  *
  * Bit-identical by construction to the java-regex chain over
  * [[graft.operators.TextAnalysis.EmailRe]] / `Ipv4Re` / `DigitRunRe`
  * (same matches, same non-overlapping left-to-right discipline, same
  * resume-at-match-end), argued per pattern below and pinned by a
  * randomized differential spec against `java.util.regex` plus the
  * composable `regexp_*` plan form (ScaleTechniquesSpec):
  *
  *  - `[L]+@[D]+\.[A-Za-z]{2,}` (L = local class, D = domain class):
  *    `@ ∉ L`, so backtracking `[L]+` can never expose the `@` — a
  *    start p matches iff the maximal L-run from p is immediately
  *    followed by `@`. All starts inside one L-run share that run's
  *    end, so on failure the scan resumes after the run (at the first
  *    char past it — which, `D ⊂ L`, re-enters scanning inside a failed
  *    domain region exactly like the regex engine's start+1 retries
  *    reach it). The domain: greedy `[D]+` then backtrack means the
  *    LAST `.` inside the maximal D-run with ≥2 following alphas wins;
  *    `[A-Za-z]{2,}` is greedy and final, so the match ends at the end
  *    of the maximal alpha run after that dot.
  *  - `\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b`: candidate starts are digits
  *    with a non-word predecessor (java's default `\b` is ASCII-word);
  *    the {1,3} greedy backtracking is replayed literally (≤3⁴ probes,
  *    all bounded), and the trailing `\b` is checked per probe.
  *  - `\b[0-9]{7,}\b`: `{7,}` greedy eats the maximal digit run; any
  *    backtrack lands the trailing `\b` between two digits, which can
  *    never hold — so a run matches iff it is ≥7 long AND bounded by
  *    non-word chars on both sides, and a failed run is skipped whole.
  *
  * Replacement strings are appended literally (the redaction tokens
  * carry no `$`/`\` interpolation), matching RegexRedact's contract.
  */
case class PiiRedact(child: Expression,
                     emailToken: String = "<EMAIL>",
                     ipToken: String = "<IP>",
                     idToken: String = "<ID>")
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = StructType(Seq(
    StructField("n_emails", LongType, nullable = false),
    StructField("n_ipv4", LongType, nullable = false),
    StructField("n_digit_runs", LongType, nullable = false),
    StructField("redacted", StringType, nullable = false)))
  override def prettyName: String = "graft_pii_redact"

  @transient private lazy val scanner =
    new PiiRedact.Scanner(emailToken, ipToken, idToken)

  override protected def nullSafeEval(s: Any): Any =
    scanner.apply(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("piiScanner", scanner,
      classOf[PiiRedact.Scanner].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.apply($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): PiiRedact =
    copy(child = newChild)
}

object PiiRedact {

  @inline private def isAlpha(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  @inline private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'
  // java.util.regex default \b is defined over ASCII \w = [A-Za-z0-9_]
  @inline private def isWord(c: Char): Boolean =
    isAlpha(c) || isDigit(c) || c == '_'
  // [A-Za-z0-9._%+-]
  @inline private def isLocal(c: Char): Boolean =
    isAlpha(c) || isDigit(c) || c == '.' || c == '_' || c == '%' ||
      c == '+' || c == '-'
  // [A-Za-z0-9.-]
  @inline private def isDomain(c: Char): Boolean =
    isAlpha(c) || isDigit(c) || c == '.' || c == '-'

  /** One pass: email redaction. Appends the redacted text to `out`
    * and returns the match count. */
  def emailPass(s: String, token: String, out: java.lang.StringBuilder): Long = {
    val n = s.length
    var count = 0L
    var last = 0          // copied-up-to watermark
    var i = 0
    while (i < n) {
      if (isLocal(s.charAt(i))) {
        // maximal local run [i, e)
        var e = i + 1
        while (e < n && isLocal(s.charAt(e))) e += 1
        var matched = false
        if (e < n && s.charAt(e) == '@') {
          // maximal domain run [d0, d1)
          val d0 = e + 1
          var d1 = d0
          while (d1 < n && isDomain(s.charAt(d1))) d1 += 1
          if (d1 > d0) {
            // greedy [D]+ then backtrack = the LAST '.' in (d0, d1)
            // with >= 2 alphas following wins; [D]+ must keep >= 1
            // char before the dot => dot > d0. Alphas are domain
            // chars, so "inside the maximal run" bounds them for free.
            var dot = d1 - 1
            var end = -1
            while (dot > d0 && end < 0) {
              if (s.charAt(dot) == '.' && dot + 2 < d1 &&
                  isAlpha(s.charAt(dot + 1)) && isAlpha(s.charAt(dot + 2))) {
                // greedy [A-Za-z]{2,}: the match ends at the end of
                // the maximal alpha run after the dot
                var a = dot + 3
                while (a < d1 && isAlpha(s.charAt(a))) a += 1
                end = a
              } else {
                dot -= 1
              }
            }
            if (end > 0) {
              count += 1
              out.append(s, last, i).append(token)
              last = end
              i = end
              matched = true
            }
          }
        }
        if (!matched) {
          // every start inside [i, e) fails identically; resume after
          // the run (at e) — e itself is non-local or the '@' whose
          // domain failed; either way the next candidate is past it
          i = e
        }
      } else {
        i += 1
      }
    }
    out.append(s, last, n)
    count
  }

  /** One pass: IPv4 redaction with literal {1,3}-greedy backtracking. */
  def ipv4Pass(s: String, token: String, out: java.lang.StringBuilder): Long = {
    val n = s.length
    var count = 0L
    var last = 0
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (isDigit(c) && (i == 0 || !isWord(s.charAt(i - 1)))) {
        val end = matchIpv4(s, i)
        if (end > 0) {
          count += 1
          out.append(s, last, i).append(token)
          last = end
          i = end
        } else {
          // java retries at i+1; the only candidates are digits with a
          // non-word predecessor, which the outer scan finds — but we
          // must not skip the run blindly ('.' is non-word, so a digit
          // after '.' inside this dotted region IS a candidate)
          i += 1
        }
      } else {
        i += 1
      }
    }
    out.append(s, last, n)
    count
  }

  /** Exact replay of `\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b` at start
    * p (leading \b already checked): greedy lengths 3→1 per component,
    * trailing \b per probe. Returns match end, or -1. */
  private def matchIpv4(s: String, p: Int): Int = {
    val n = s.length
    @inline def digitsFrom(q: Int): Int = {
      var e = q
      while (e < n && e < q + 3 && isDigit(s.charAt(e))) e += 1
      e - q
    }
    val m1 = digitsFrom(p)
    var l1 = m1
    while (l1 >= 1) {
      val q1 = p + l1
      if (q1 < n && s.charAt(q1) == '.') {
        val m2 = digitsFrom(q1 + 1)
        var l2 = m2
        while (l2 >= 1) {
          val q2 = q1 + 1 + l2
          if (q2 < n && s.charAt(q2) == '.') {
            val m3 = digitsFrom(q2 + 1)
            var l3 = m3
            while (l3 >= 1) {
              val q3 = q2 + 1 + l3
              if (q3 < n && s.charAt(q3) == '.') {
                val m4 = digitsFrom(q3 + 1)
                var l4 = m4
                while (l4 >= 1) {
                  val q4 = q3 + 1 + l4
                  // trailing \b: last char is a digit (word), so the
                  // next char must be non-word (or end)
                  if (q4 == n || !isWord(s.charAt(q4))) return q4
                  l4 -= 1
                }
              }
              l3 -= 1
            }
          }
          l2 -= 1
        }
      }
      l1 -= 1
    }
    -1
  }

  /** One pass: >=7 digit runs bounded by \b on both sides. */
  def digitRunPass(s: String, token: String, out: java.lang.StringBuilder): Long = {
    val n = s.length
    var count = 0L
    var last = 0
    var i = 0
    while (i < n) {
      if (isDigit(s.charAt(i)) && (i == 0 || !isWord(s.charAt(i - 1)))) {
        var e = i + 1
        while (e < n && isDigit(s.charAt(e))) e += 1
        // {7,} greedy + trailing \b: match iff run >= 7 and the char
        // after the run is non-word/end (backtracking inside the run
        // can never satisfy \b between two digits)
        if (e - i >= 7 && (e == n || !isWord(s.charAt(e)))) {
          count += 1
          out.append(s, last, i).append(token)
          last = e
        }
        // matched or not, no candidate can start before the run ends
        // (every interior digit has a digit predecessor)
        i = e
      } else {
        i += 1
      }
    }
    out.append(s, last, n)
    count
  }

  /** Serializable per-expression state; ships the replacement tokens. */
  final class Scanner(emailToken: String, ipToken: String, idToken: String)
      extends Serializable {

    def apply(text: UTF8String): InternalRow = {
      val s0 = text.toString
      val b1 = new java.lang.StringBuilder(s0.length)
      val nE = emailPass(s0, emailToken, b1)
      val s1 = if (nE == 0) s0 else b1.toString
      val b2 = new java.lang.StringBuilder(s1.length)
      val nI = ipv4Pass(s1, ipToken, b2)
      val s2 = if (nI == 0) s1 else b2.toString
      val b3 = new java.lang.StringBuilder(s2.length)
      val nD = digitRunPass(s2, idToken, b3)
      val s3 = if (nD == 0) s2 else b3.toString
      InternalRow(nE, nI, nD, UTF8String.fromString(s3))
    }
  }
}
