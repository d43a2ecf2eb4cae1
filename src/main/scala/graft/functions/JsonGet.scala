package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused single-pass extraction of one top-level field from a JSON object
  * string — the `props ->> 'k'` hot path (reference:
  * haf_plug_play/server/normalize.py json field access and the
  * `json->>'...'` projections across plug SQL). Matches
  * `get_json_object(col, "$.key")` on every VALID document:
  *
  *   - missing key, non-object root, or JSON `null` value  -> SQL NULL
  *   - string value  -> unescaped content (`\uXXXX` incl. surrogate
  *     pairs; an unpaired surrogate or invalid escape is malformed ->
  *     NULL, same as Jackson inside the builtin)
  *   - number / true / false -> the literal source text
  *   - object / array value  -> compact re-serialization byte-identical
  *     to the builtin's Jackson writer (whitespace dropped, strings
  *     unescaped then re-escaped — see [[JsonGetField.reserialize]])
  *
  * Intentional divergences, pinned in JsonGetSpec: on MALFORMED input the
  * builtin throws inside Jackson and yields NULL for the whole document,
  * while this scanner is best-effort lenient — it validates the path it
  * walks (structure, escapes, number shape of the extracted value) but
  * does not re-validate the interior of values it skips, so a document
  * that is broken only in a skipped sibling can still yield the target
  * field. Exotic non-canonical numbers (`1e2`, `12.50`) echo as written
  * here; the builtin reformats them through a double (`100.0`, `12.5`) —
  * canonical integers and doubles round-trip identically in both.
  * (Duplicate keys: both return the first occurrence.)
  *
  * Why native: GetJsonObject allocates a Jackson parser and decodes
  * UTF-8 -> UTF-16 -> UTF-8 per row; at 100 TB the per-row constant is
  * the dominant CPU of every dispatch/extract stage. This expression
  * scans the UTF8String bytes once, allocates nothing until the result
  * slice, and stays inside whole-stage codegen via a static call.
  */
case class JsonGetField(child: Expression, key: String) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_json_get"

  @transient private lazy val keyBytes: Array[Byte] =
    UTF8String.fromString(key).getBytes

  override protected def nullSafeEval(s: Any): Any =
    JsonGetField.extract(s.asInstanceOf[UTF8String], keyBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("key", keyBytes, "byte[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.JsonGetField.extract($c, $ref);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): JsonGetField =
    copy(child = newChild)
}

object JsonGetField {

  /** Extract top-level `key` from the JSON object in `json`; null when
    * absent/null/invalid (see class doc for exact semantics).
    */
  def extract(json: UTF8String, key: Array[Byte]): UTF8String = {
    val b = json.getBytes
    val n = b.length
    var i = ws(b, 0, n)
    if (i >= n || b(i) != '{') return null
    i += 1
    // empty object fast-exit is handled by the '}' check in the loop
    while (true) {
      i = ws(b, i, n)
      if (i >= n) return null
      if (b(i) == '}') return null // key absent
      if (b(i) != '"') return null
      val m = matchKey(b, i, n, key)
      if (m < 0L) return null
      val matched = (m & 1L) == 1L
      i = ws(b, (m >>> 1).toInt, n)
      if (i >= n || b(i) != ':') return null
      i = ws(b, i + 1, n)
      if (i >= n) return null
      if (matched) return value(b, i, n)
      i = skipValue(b, i, n)
      if (i < 0) return null
      i = ws(b, i, n)
      if (i < n && b(i) == ',') i += 1
      else return null // '}' (absent) or trailing garbage
    }
    null // unreachable
  }

  private def ws(b: Array[Byte], start: Int, n: Int): Int = {
    var i = start
    while (i < n && (b(i) == ' ' || b(i) == '\t' || b(i) == '\n' || b(i) == '\r')) i += 1
    i
  }

  /** At an opening quote: scan the key string, compare (unescaped) to
    * `key`. Returns (indexAfterClosingQuote << 1) | matched, or -1 on
    * malformed.
    */
  private def matchKey(b: Array[Byte], start: Int, n: Int, key: Array[Byte]): Long = {
    var i = start + 1
    var esc = false
    while (i < n && b(i) != '"') {
      if (b(i) == '\\') { esc = true; i += 2 } else i += 1
    }
    if (i >= n) return -1L
    val end = i // closing quote
    val matched =
      if (!esc) regionEquals(b, start + 1, end, key)
      else {
        val un = unescape(b, start + 1, end)
        un != null && java.util.Arrays.equals(un, key)
      }
    ((end + 1).toLong << 1) | (if (matched) 1L else 0L)
  }

  private def regionEquals(b: Array[Byte], from: Int, until: Int, key: Array[Byte]): Boolean = {
    if (until - from != key.length) return false
    var i = 0
    while (i < key.length) {
      if (b(from + i) != key(i)) return false
      i += 1
    }
    true
  }

  /** Extract the value starting at b(i) (not whitespace). */
  private def value(b: Array[Byte], i: Int, n: Int): UTF8String = (b(i): @annotation.switch) match {
    case '"' =>
      var j = i + 1
      var esc = false
      while (j < n && b(j) != '"') {
        if (b(j) == '\\') { esc = true; j += 2 } else j += 1
      }
      if (j >= n) null
      else if (!esc) UTF8String.fromBytes(b, i + 1, j - i - 1)
      else {
        val un = unescape(b, i + 1, j)
        if (un == null) null else UTF8String.fromBytes(un)
      }
    case '{' | '[' =>
      val j = skipValue(b, i, n)
      if (j < 0) null else reserialize(b, i, j)
    case 'n' =>
      if (literalAt(b, i, n, "null")) null else null
    case 't' =>
      if (literalAt(b, i, n, "true")) UTF8String.fromString("true") else null
    case 'f' =>
      if (literalAt(b, i, n, "false")) UTF8String.fromString("false") else null
    case _ =>
      val j = numberEnd(b, i, n)
      if (j < 0) null else UTF8String.fromBytes(b, i, j - i)
  }

  private def literalAt(b: Array[Byte], i: Int, n: Int, lit: String): Boolean = {
    if (i + lit.length > n) return false
    var k = 0
    while (k < lit.length) {
      if (b(i + k) != lit.charAt(k)) return false
      k += 1
    }
    true
  }

  /** Validate + find the end of a JSON number at i; -1 if not a number. */
  private def numberEnd(b: Array[Byte], start: Int, n: Int): Int = {
    var i = start
    if (i < n && b(i) == '-') i += 1
    val intStart = i
    while (i < n && b(i) >= '0' && b(i) <= '9') i += 1
    if (i == intStart) return -1
    // JSON forbids leading zeros ("01"); Jackson rejects them too
    if (b(intStart) == '0' && i > intStart + 1) return -1
    if (i < n && b(i) == '.') {
      i += 1
      val fs = i
      while (i < n && b(i) >= '0' && b(i) <= '9') i += 1
      if (i == fs) return -1
    }
    if (i < n && (b(i) == 'e' || b(i) == 'E')) {
      i += 1
      if (i < n && (b(i) == '+' || b(i) == '-')) i += 1
      val es = i
      while (i < n && b(i) >= '0' && b(i) <= '9') i += 1
      if (i == es) return -1
    }
    i
  }

  /** Skip one value starting at b(i); returns index after it, -1 on
    * malformed. Objects/arrays skip by depth with string awareness (the
    * interior is NOT fully validated — see class doc).
    */
  private def skipValue(b: Array[Byte], start: Int, n: Int): Int = {
    var i = start
    (b(i): @annotation.switch) match {
      case '"' =>
        i += 1
        while (i < n && b(i) != '"') {
          if (b(i) == '\\') i += 2 else i += 1
        }
        if (i >= n) -1 else i + 1
      case '{' | '[' =>
        var depth = 0
        while (i < n) {
          val c = b(i)
          if (c == '"') {
            i += 1
            while (i < n && b(i) != '"') {
              if (b(i) == '\\') i += 2 else i += 1
            }
            if (i >= n) return -1
            i += 1
          } else {
            if (c == '{' || c == '[') depth += 1
            else if (c == '}' || c == ']') {
              depth -= 1
              if (depth == 0) return i + 1
            }
            i += 1
          }
        }
        -1
      case 'n' => if (literalAt(b, i, n, "null")) i + 4 else -1
      case 't' => if (literalAt(b, i, n, "true")) i + 4 else -1
      case 'f' => if (literalAt(b, i, n, "false")) i + 5 else -1
      case _ => numberEnd(b, i, n)
    }
  }

  private val HEX = "0123456789ABCDEF".getBytes

  /** Re-serialize the object/array value b[from, until) exactly as the
    * builtin's Jackson writer does: whitespace outside strings dropped,
    * every string (keys included) unescaped then re-escaped — `"`/`\`
    * backslashed, controls < 0x20 as `\b \t \n \f \r` or uppercase
    * `\u00XX`, BMP text raw, non-BMP as an uppercase surrogate-pair
    * escape. Null on a malformed interior string (builtin: NULL).
    */
  private def reserialize(b: Array[Byte], from: Int, until: Int): UTF8String = {
    var out = new Array[Byte](until - from + 16)
    var o = 0
    def ensure(extra: Int): Unit =
      if (o + extra > out.length) {
        var cap = out.length * 2
        while (cap < o + extra) cap *= 2
        out = java.util.Arrays.copyOf(out, cap)
      }
    var i = from
    while (i < until) {
      val c = b(i)
      if (c == '"') {
        var j = i + 1
        while (j < until && b(j) != '"') {
          if (b(j) == '\\') j += 2 else j += 1
        }
        if (j >= until) return null
        val content = unescape(b, i + 1, j)
        if (content == null) return null
        ensure(content.length * 6 + 2)
        out(o) = '"'; o += 1
        var p = 0
        while (p < content.length) {
          val x = content(p) & 0xFF
          if (x == '"' || x == '\\') {
            out(o) = '\\'; out(o + 1) = x.toByte; o += 2; p += 1
          } else if (x < 0x20) {
            val short: Int = x match {
              case 0x08 => 'b'; case 0x09 => 't'; case 0x0A => 'n'
              case 0x0C => 'f'; case 0x0D => 'r'; case _ => 0
            }
            if (short != 0) { out(o) = '\\'; out(o + 1) = short.toByte; o += 2 }
            else {
              out(o) = '\\'; out(o + 1) = 'u'; out(o + 2) = '0'; out(o + 3) = '0'
              out(o + 4) = HEX(x >> 4); out(o + 5) = HEX(x & 0xF); o += 6
            }
            p += 1
          } else if (x < 0xF0 || p + 3 >= content.length) {
            out(o) = x.toByte; o += 1; p += 1 // ASCII + 2/3-byte UTF-8 raw
          } else {
            // 4-byte UTF-8 (non-BMP) -> uppercase surrogate-pair escape
            val cp = ((x & 0x07) << 18) | ((content(p + 1) & 0x3F) << 12) |
              ((content(p + 2) & 0x3F) << 6) | (content(p + 3) & 0x3F)
            val hi = 0xD800 + ((cp - 0x10000) >> 10)
            val lo = 0xDC00 + ((cp - 0x10000) & 0x3FF)
            out(o) = '\\'; out(o + 1) = 'u'
            out(o + 2) = HEX((hi >> 12) & 0xF); out(o + 3) = HEX((hi >> 8) & 0xF)
            out(o + 4) = HEX((hi >> 4) & 0xF); out(o + 5) = HEX(hi & 0xF)
            out(o + 6) = '\\'; out(o + 7) = 'u'
            out(o + 8) = HEX((lo >> 12) & 0xF); out(o + 9) = HEX((lo >> 8) & 0xF)
            out(o + 10) = HEX((lo >> 4) & 0xF); out(o + 11) = HEX(lo & 0xF)
            o += 12; p += 4
          }
        }
        out(o) = '"'; o += 1
        i = j + 1
      } else if (c == ' ' || c == '\t' || c == '\n' || c == '\r') {
        i += 1
      } else {
        ensure(1); out(o) = c; o += 1; i += 1
      }
    }
    UTF8String.fromBytes(out, 0, o)
  }

  /** Unescape the string content b[from, until) (between the quotes).
    * Null on an invalid escape or unpaired surrogate (both malformed to
    * Jackson, hence NULL from the builtin).
    */
  private def unescape(b: Array[Byte], from: Int, until: Int): Array[Byte] = {
    val out = new Array[Byte](until - from) // unescaping never grows (\X -> 1 byte, \uXXXX 6 -> <=4)
    var o = 0
    var i = from
    while (i < until) {
      val c = b(i)
      if (c != '\\') { out(o) = c; o += 1; i += 1 }
      else {
        if (i + 1 >= until) return null
        (b(i + 1): @annotation.switch) match {
          case '"' => out(o) = '"'; o += 1; i += 2
          case '\\' => out(o) = '\\'; o += 1; i += 2
          case '/' => out(o) = '/'; o += 1; i += 2
          case 'b' => out(o) = '\b'; o += 1; i += 2
          case 'f' => out(o) = '\f'; o += 1; i += 2
          case 'n' => out(o) = '\n'; o += 1; i += 2
          case 'r' => out(o) = '\r'; o += 1; i += 2
          case 't' => out(o) = '\t'; o += 1; i += 2
          case 'u' =>
            if (i + 6 > until) return null
            val h = hex4(b, i + 2)
            if (h < 0) return null
            i += 6
            var cp = h
            if (h >= 0xD800 && h <= 0xDBFF) {
              // high surrogate: MUST pair with a following \uXXXX low
              // surrogate — Jackson (and so the builtin) rejects a lone
              // surrogate as malformed
              if (i + 6 <= until && b(i) == '\\' && b(i + 1) == 'u') {
                val lo = hex4(b, i + 2)
                if (lo >= 0xDC00 && lo <= 0xDFFF) {
                  cp = 0x10000 + ((h - 0xD800) << 10) + (lo - 0xDC00)
                  i += 6
                } else return null
              } else return null
            } else if (h >= 0xDC00 && h <= 0xDFFF) return null // lone low
            o = encodeUtf8(cp, out, o)
          case _ => return null
        }
      }
    }
    if (o == out.length) out else java.util.Arrays.copyOf(out, o)
  }

  private def hex4(b: Array[Byte], i: Int): Int = {
    var v = 0
    var k = 0
    while (k < 4) {
      val c = b(i + k)
      val d =
        if (c >= '0' && c <= '9') c - '0'
        else if (c >= 'a' && c <= 'f') c - 'a' + 10
        else if (c >= 'A' && c <= 'F') c - 'A' + 10
        else return -1
      v = (v << 4) | d
      k += 1
    }
    v
  }

  private def encodeUtf8(cp: Int, out: Array[Byte], o0: Int): Int = {
    var o = o0
    if (cp < 0x80) { out(o) = cp.toByte; o += 1 }
    else if (cp < 0x800) {
      out(o) = (0xC0 | (cp >> 6)).toByte
      out(o + 1) = (0x80 | (cp & 0x3F)).toByte
      o += 2
    } else if (cp < 0x10000) {
      out(o) = (0xE0 | (cp >> 12)).toByte
      out(o + 1) = (0x80 | ((cp >> 6) & 0x3F)).toByte
      out(o + 2) = (0x80 | (cp & 0x3F)).toByte
      o += 3
    } else {
      out(o) = (0xF0 | (cp >> 18)).toByte
      out(o + 1) = (0x80 | ((cp >> 12) & 0x3F)).toByte
      out(o + 2) = (0x80 | ((cp >> 6) & 0x3F)).toByte
      out(o + 3) = (0x80 | (cp & 0x3F)).toByte
      o += 4
    }
    o
  }
}
