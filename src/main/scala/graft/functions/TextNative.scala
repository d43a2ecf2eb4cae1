package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared byte-level tokenizer for the native text expressions: single
  * 0x20 separators (a space byte never appears inside a UTF-8 multibyte
  * sequence), empty tokens skipped — exactly the semantics of
  * `array_remove(split(text, " ", -1), "")` used across the text family.
  */
private[functions] object Tok {
  /** Fills `starts`/`ends` (grown copies returned) and returns
    * (starts, ends, count).
    */
  def scan(b: Array[Byte]): (Array[Int], Array[Int], Int) = {
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var t = 0
    var i = 0
    val n = b.length
    while (i <= n) {
      val s = i
      while (i < n && b(i) != ' ') i += 1
      if (i > s) {
        if (t == starts.length) {
          starts = java.util.Arrays.copyOf(starts, t * 2)
          ends = java.util.Arrays.copyOf(ends, t * 2)
        }
        starts(t) = s; ends(t) = i; t += 1
      }
      i += 1
    }
    (starts, ends, t)
  }

  /** xxhash64 (seed 42) of the w-token window ending shingle-style —
    * identical value scheme to [[ShingleHashes]]; keeps duplicates.
    */
  def windowHashes(b: Array[Byte], starts: Array[Int], ends: Array[Int],
                   t: Int, w: Int): Array[Long] = {
    if (t < w) return Array.emptyLongArray
    val m = t - w + 1
    val out = new Array[Long](m)
    var scratch: Array[Byte] = null
    var k = 0
    while (k < m) {
      val last = k + w - 1
      var contiguous = true
      var j = k
      while (contiguous && j < last) {
        if (starts(j + 1) != ends(j) + 1) contiguous = false
        j += 1
      }
      if (contiguous) {
        val off = starts(k)
        out(k) = XXH64.hashUnsafeBytes(
          b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + off,
          ends(last) - off, 42L)
      } else {
        var len = w - 1
        j = k
        while (j <= last) { len += ends(j) - starts(j); j += 1 }
        if (scratch == null || scratch.length < len) scratch = new Array[Byte](len)
        var p = 0
        j = k
        while (j <= last) {
          if (j > k) { scratch(p) = ' '; p += 1 }
          val l = ends(j) - starts(j)
          System.arraycopy(b, starts(j), scratch, p, l)
          p += l
          j += 1
        }
        out(k) = XXH64.hashUnsafeBytes(
          scratch, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len, 42L)
      }
      k += 1
    }
    out
  }

  /** Sorts IN PLACE; returns (distinctCount, longestEqualRun,
    * slotsInGroupsLargerThanOne).
    */
  def runStats(h: Array[Long]): (Long, Long, Long) = {
    if (h.length == 0) return (0L, 0L, 0L)
    java.util.Arrays.sort(h)
    var distinct = 1L
    var run = 1L
    var best = 1L
    var dupSlots = 0L
    var i = 1
    while (i < h.length) {
      if (h(i) == h(i - 1)) run += 1
      else {
        if (run > 1) dupSlots += run
        if (run > best) best = run
        distinct += 1; run = 1
      }
      i += 1
    }
    if (run > 1) dupSlots += run
    if (run > best) best = run
    (distinct, best, dupSlots)
  }
}

/** Whitespace token COUNT without materializing tokens: the number of
  * maximal runs of non-space bytes — exactly
  * `size(array_remove(split(text, " ", -1), ""))` (single-0x20
  * separators; a space byte never appears inside a UTF-8 multibyte
  * sequence), but with no regex split, no 50M-strings-per-pass token
  * array, no array_remove copy. The length-only call sites (Gini,
  * corpus mixture, token budget packing, token counting) were paying
  * the full tokenize allocation to read one integer per document —
  * measured ~17 of gini's 20 core-s at the 100x tier.
  */
case class TokenCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_token_count"

  override protected def nullSafeEval(s: Any): Any =
    TokenCount.count(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenCount$$.MODULE$$.count($c);")

  override protected def withNewChildInternal(newChild: Expression): TokenCount =
    copy(child = newChild)
}

object TokenCount {
  def count(text: UTF8String): Long = {
    val b = text.getBytes
    val n = b.length
    var t = 0L
    var i = 0
    while (i < n) {
      while (i < n && b(i) == ' ') i += 1
      if (i < n) {
        t += 1
        while (i < n && b(i) != ' ') i += 1
      }
    }
    t
  }
}

/** COUNT of `[a-z]+|[0-9]+` regex matches without materializing them —
  * apply to ALREADY-LOWERCASED text, mirroring
  * `size(regexp_extract_all(lower(text), '[a-z]+|[0-9]+', 0))`.
  * The regex's leftmost-greedy discipline makes every match a maximal
  * homogeneous run (all-letters or all-digits): a letter run adjacent
  * to a digit run yields two matches, so the count is the number of
  * maximal single-class runs — one byte scan, no Matcher, no per-match
  * string. ASCII classes only, exactly like the pattern: multibyte
  * UTF-8 lead/continuation bytes are all ≥ 0x80 and never match.
  */
case class AlnumRunCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_alnum_run_count"

  override protected def nullSafeEval(s: Any): Any =
    AlnumRunCount.count(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.AlnumRunCount$$.MODULE$$.count($c);")

  override protected def withNewChildInternal(newChild: Expression): AlnumRunCount =
    copy(child = newChild)
}

object AlnumRunCount {
  def count(text: UTF8String): Long = {
    val b = text.getBytes
    val n = b.length
    var t = 0L
    var i = 0
    while (i < n) {
      val c = b(i)
      if (c >= 'a' && c <= 'z') {
        t += 1
        i += 1
        while (i < n && b(i) >= 'a' && b(i) <= 'z') i += 1
      } else if (c >= '0' && c <= '9') {
        t += 1
        i += 1
        while (i < n && b(i) >= '0' && b(i) <= '9') i += 1
      } else {
        i += 1
      }
    }
    t
  }
}

/** Token membership counts against small static word sets, fused with
  * token, token-character, and punctuation counts — one codegen'd pass
  * over the raw text.
  *
  * Returns `array<long>` of `[n_tokens, token_chars, punct_chars,
  * hits(set_0), ..., hits(set_k), alpha_tokens]` where `token_chars` is
  * the summed CODE-POINT length of the tokens (matching
  * `aggregate(transform(toks, length), ...)`), `punct_chars` counts code
  * points outside `[a-zA-Z0-9 ]` (matching `length(text) -
  * length(regexp_replace(text, "[^a-zA-Z0-9 ]", ""))` — non-ASCII code
  * points count as punctuation, exactly like the ASCII-only regex
  * class), `hits(set_i)` counts tokens contained in the i-th set
  * (matching `size(filter(toks, _.isin(set_i)))`), and the trailing
  * `alpha_tokens` counts tokens containing at least one ASCII letter
  * (matching `size(filter(toks, _.rlike("[A-Za-z]")))` — the Gopher
  * alphabetic-word rule).
  *
  * The composable formulation routes every row through interpreted
  * HigherOrderFunction plumbing once per set (quality + language-ID ran
  * SIX such chains per document) plus a regex scan; here the text is
  * scanned once and each token probes the hash sets. At 100 TB these map
  * passes are the dominant CPU of corpus curation.
  */
case class TokenSetHits(child: Expression, sets: Seq[Seq[String]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_token_set_hits"

  @transient private lazy val prepared: Array[java.util.HashSet[UTF8String]] =
    sets.map { ws =>
      val s = new java.util.HashSet[UTF8String](ws.length * 2)
      ws.foreach(w => s.add(UTF8String.fromString(w)))
      s
    }.toArray

  override protected def nullSafeEval(s: Any): Any =
    TokenSetHits.compute(s.asInstanceOf[UTF8String], prepared)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sets", prepared, "java.util.HashSet[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenSetHits.compute($c, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenSetHits =
    copy(child = newChild)
}

object TokenSetHits {
  def compute(text: UTF8String,
              sets: Array[java.util.HashSet[UTF8String]]): ArrayData = {
    val b = text.getBytes
    val (starts, ends, t) = Tok.scan(b)
    val out = new Array[Long](4 + sets.length)
    out(0) = t
    var i = 0
    while (i < b.length) {
      val c = b(i)
      // count code points (non-continuation bytes); ASCII alnum/space is
      // the kept class, every other code point is "punctuation"
      if ((c & 0xC0) != 0x80) {
        val keep = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
          (c >= '0' && c <= '9') || c == ' '
        if (!keep) out(2) += 1
      }
      i += 1
    }
    var k = 0
    while (k < t) {
      i = starts(k)
      var alpha = false
      while (i < ends(k)) {
        val c = b(i)
        if ((c & 0xC0) != 0x80) out(1) += 1
        if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')) alpha = true
        i += 1
      }
      if (alpha) out(3 + sets.length) += 1
      val tok = UTF8String.fromBytes(b, starts(k), ends(k) - starts(k))
      var j = 0
      while (j < sets.length) {
        if (sets(j).contains(tok)) out(3 + j) += 1
        j += 1
      }
      k += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** Per-document repetition statistics in one codegen'd pass:
  * `array<long>` of `[n_tokens, distinct_tokens, n_bigrams,
  * top_bigram_count, n_trigrams, dup_trigram_slots]`.
  *
  * n-gram identity is the 64-bit xxhash of the ' '-joined window (the
  * [[ShingleHashes]] scheme): within a document the collision odds are
  * ~(n^2/2)/2^64 — negligible against the repetition ratios these feed.
  * Replaces a chain of interpreted higher-order functions (three
  * zip_with, an aggregate fold for the longest run, a filter-over-
  * sequence for singleton detection) with sort + linear run counting on
  * primitive longs.
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_repetition_stats"

  override protected def nullSafeEval(s: Any): Any =
    RepetitionStats.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RepetitionStats.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

/** Per-document term frequencies, aggregated IN-ROW: array<struct<h:
  * long, tf: long>> of (xxhash64(token), occurrence count), sorted by
  * hash. Replaces the explode-every-token → groupBy(doc, term) pattern:
  * the per-(doc, term) aggregation happens inside the row, so the first
  * shuffle of a unigram-LM / tf-idf style pipeline moves one row per
  * DISTINCT term per doc instead of one per token occurrence — and
  * downstream joins/rollups key on an 8-byte hash. Term identity is the
  * 64-bit hash (vocabulary-squared / 2^65 collision odds — negligible);
  * use only where the term string itself is not part of the output.
  */
case class TokenTfs(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("h", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("tf", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_token_tfs"

  override protected def nullSafeEval(s: Any): Any =
    TokenTfs.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenTfs.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): TokenTfs =
    copy(child = newChild)
}

object TokenTfs {
  def compute(text: UTF8String): ArrayData = {
    val b = text.getBytes
    val (starts, ends, t) = Tok.scan(b)
    val hs = Tok.windowHashes(b, starts, ends, t, 1)
    java.util.Arrays.sort(hs)
    var u = 0
    var i = 0
    while (i < hs.length) {
      var j = i + 1
      while (j < hs.length && hs(j) == hs(i)) j += 1
      u += 1
      i = j
    }
    val rows = new Array[Any](u)
    var k = 0
    i = 0
    while (i < hs.length) {
      var j = i + 1
      while (j < hs.length && hs(j) == hs(i)) j += 1
      rows(k) = org.apache.spark.sql.catalyst.InternalRow(hs(i), (j - i).toLong)
      k += 1
      i = j
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }
}

/** Fixed-stride token chunks as strings: array of `' '`-joined windows
  * of `window` tokens taken every `stride` tokens — identical to
  * `transform(sequence(1, size(toks), stride),
  *            st => array_join(slice(toks, st, window), " "))`,
  * which routes every chunk through interpreted ArrayTransform + Slice +
  * ArrayJoin plumbing. Single-spaced regions are emitted as zero-copy
  * slices of the original text bytes. Empty token lists yield an empty
  * array (callers guard with size() like the composable form's filter).
  */
case class TokenChunks(child: Expression, window: Int, stride: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && window >= 1 && stride >= 1)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument and positive window/stride, " +
        s"got ${child.dataType.sql}, window=$window, stride=$stride")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_token_chunks"

  override protected def nullSafeEval(s: Any): Any =
    TokenChunks.compute(s.asInstanceOf[UTF8String], window, stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenChunks.compute($c, $window, $stride);")

  override protected def withNewChildInternal(newChild: Expression): TokenChunks =
    copy(child = newChild)
}

object TokenChunks {
  def compute(text: UTF8String, window: Int, stride: Int): ArrayData = {
    val b = text.getBytes
    val (starts, ends, t) = Tok.scan(b)
    if (t == 0) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val m = (t + stride - 1) / stride
    val out = new Array[Any](m)
    var k = 0
    while (k < m) {
      val first = k * stride
      val last = math.min(first + window, t) - 1
      var contiguous = true
      var j = first
      while (contiguous && j < last) {
        if (starts(j + 1) != ends(j) + 1) contiguous = false
        j += 1
      }
      if (contiguous) {
        out(k) = UTF8String.fromBytes(b, starts(first), ends(last) - starts(first))
      } else {
        var len = last - first
        j = first
        while (j <= last) { len += ends(j) - starts(j); j += 1 }
        val seg = new Array[Byte](len)
        var p = 0
        j = first
        while (j <= last) {
          if (j > first) { seg(p) = ' '; p += 1 }
          val l = ends(j) - starts(j)
          System.arraycopy(b, starts(j), seg, p, l)
          p += l
          j += 1
        }
        out(k) = UTF8String.fromBytes(seg)
      }
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Per-document term frequencies with the term STRING retained:
  * array<struct<term: string, tf: long>> — the string-keyed sibling of
  * [[TokenTfs]] for consumers whose output carries the term itself
  * (tf-idf). One pass, in-row aggregation: the emitted rows are distinct
  * per (doc, term) by construction, so a document-frequency rollup is a
  * plain count over the exploded rows — no per-(doc, term) shuffle and
  * no separate distinct pass exist in the consuming plan.
  */
case class TokenTermTfs(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("term", StringType, nullable = false),
      org.apache.spark.sql.types.StructField("tf", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_token_term_tfs"

  override protected def nullSafeEval(s: Any): Any =
    TokenTermTfs.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenTermTfs.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): TokenTermTfs =
    copy(child = newChild)
}

object TokenTermTfs {
  def compute(text: UTF8String): ArrayData = {
    val b = text.getBytes
    val (starts, ends, t) = Tok.scan(b)
    val counts = new java.util.LinkedHashMap[UTF8String, java.lang.Long](t * 2)
    var k = 0
    while (k < t) {
      val tok = UTF8String.fromBytes(b, starts(k), ends(k) - starts(k))
      val c = counts.get(tok)
      counts.put(tok, if (c == null) 1L else c.longValue() + 1L)
      k += 1
    }
    val rows = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      rows(i) = org.apache.spark.sql.catalyst.InternalRow(e.getKey, e.getValue)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }
}

/** First 60 bits of the md5 of a string as an unsigned long —
  * bit-identical to `conv(substring(md5(s), 1, 15), 16, 10)::long` (the
  * engine-reproducible token hash of the SimHash contract, which the
  * DuckDB oracle recomputes) without materializing the 32-char hex
  * string or routing a 15-digit decimal through string radix conversion
  * per token.
  */
case class Md5Hash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_md5_hash60"

  override protected def nullSafeEval(s: Any): Any =
    Md5Hash60.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5Hash60.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Md5Hash60 =
    copy(child = newChild)
}

object Md5Hash60 {
  private val digests = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  def compute(s: UTF8String): Long = {
    val b = s.getBytes
    hashBytes(b, 0, b.length)
  }

  private[functions] def hashBytes(b: Array[Byte], off: Int, len: Int): Long = {
    val md = digests.get()
    md.reset()
    md.update(b, off, len)
    val d = md.digest()
    // first 15 hex digits = bytes 0..6 plus the high nibble of byte 7
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
    (v << 4) | ((d(7) >> 4) & 0xFL)
  }
}

/** Whole SimHash fingerprint in one fused pass: tokenize the (already
  * lowercased) text, distinct the tokens by exact string equality, hash
  * each with [[Md5Hash60]], accumulate the per-bit +-1 sums, and
  * assemble the fingerprint (bit j set iff the sum is positive) —
  * bit-identical to the explode(array_distinct(tokens)) -> md5Hash60 ->
  * per-bit sum aggregation -> assembly chain, with no explode fanout, no
  * aggregation, and no shuffle: the fingerprint pass is a pure map at
  * any corpus scale.
  *
  * Token-less text (empty or whitespace-only) yields NULL, matching the
  * explode/aggregate chain it replaces, where a doc with no tokens
  * produced no aggregation group and was dropped — NOT fingerprint 0,
  * which would make every pair of empty docs a hamming-0 "near-dup"
  * clique in [[graft.operators.Dedup.simhashPairs]].
  */
case class SimHashFp(child: Expression, bits: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && bits >= 1 && bits <= 60)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument and 1 <= bits <= 60, " +
        s"got ${child.dataType.sql}, bits=$bits")

  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash_fp"

  override protected def nullSafeEval(s: Any): Any = {
    val fp = SimHashFp.compute(s.asInstanceOf[UTF8String], bits)
    if (fp == SimHashFp.NoTokens) null else fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.SimHashFp.compute($c, $bits);
         |if (${ev.value} == java.lang.Long.MIN_VALUE) {
         |  ${ev.isNull} = true;
         |  ${ev.value} = -1L;
         |}
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): SimHashFp =
    copy(child = newChild)
}

object SimHashFp {
  /** Sentinel for "no tokens" — outside the fingerprint range [0, 2^60). */
  val NoTokens: Long = Long.MinValue

  def compute(text: UTF8String, bits: Int): Long = {
    val b = text.getBytes
    val (starts, ends, t) = Tok.scan(b)
    if (t == 0) return NoTokens
    val seen = new java.util.HashSet[UTF8String](t * 2)
    val sums = new Array[Int](bits)
    var k = 0
    while (k < t) {
      val tok = UTF8String.fromBytes(b, starts(k), ends(k) - starts(k))
      if (seen.add(tok)) {
        val h = Md5Hash60.hashBytes(b, starts(k), ends(k) - starts(k))
        var j = 0
        while (j < bits) {
          sums(j) += (((h >>> j) & 1L).toInt * 2 - 1)
          j += 1
        }
      }
      k += 1
    }
    var fp = 0L
    var j = 0
    while (j < bits) {
      if (sums(j) > 0) fp |= 1L << j
      j += 1
    }
    fp
  }
}

/** Canonical-form document fingerprint in one codegen'd pass: the md5
  * hex of lowercased, non-[a-z0-9 ]-stripped, space-collapsed, trimmed
  * text — byte-identical to
  * `md5(trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " ")))`,
  * which runs two full regex scans plus an intermediate string per row.
  * ASCII text (the overwhelming case) canonicalizes in a single byte
  * scan; text containing multibyte code points falls back to
  * UTF8String.toLowerCase first (the exact builtin lower() semantics —
  * Unicode lowercasing can map non-ASCII into [a-z], e.g. Kelvin K) and
  * then the same scan.
  */
case class CanonFingerprint(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_canon_fingerprint"

  override protected def nullSafeEval(s: Any): Any =
    CanonFingerprint.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CanonFingerprint.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): CanonFingerprint =
    copy(child = newChild)
}

object CanonFingerprint {
  private val HexDigits = "0123456789abcdef".toCharArray

  def compute(text0: UTF8String): UTF8String = {
    var b = text0.getBytes
    var i = 0
    var ascii = true
    while (ascii && i < b.length) { if (b(i) < 0) ascii = false; i += 1 }
    // non-ASCII: exact lower() semantics first (can introduce ASCII
    // letters); the canonical scan below then drops remaining multibyte
    // sequences exactly like the [^a-z0-9 ] regex
    if (!ascii) b = text0.toLowerCase.getBytes
    val out = new Array[Byte](b.length)
    var p = 0
    var pendingSpace = false
    i = 0
    while (i < b.length) {
      var c = b(i)
      if (c >= 'A' && c <= 'Z') c = (c + 32).toByte
      val keep = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
      if (keep) {
        if (pendingSpace && p > 0) { out(p) = ' '; p += 1 }
        out(p) = c; p += 1
        pendingSpace = false
      } else if (c == ' ') pendingSpace = true
      // other bytes (punctuation, multibyte sequences): dropped, and they
      // do NOT produce a separator — exactly the strip-then-collapse
      // order of the regex chain
      i += 1
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(out, 0, p)
    val d = md.digest()
    val hex = new Array[Byte](32)
    var j = 0
    while (j < 16) {
      hex(j * 2) = HexDigits((d(j) >> 4) & 0xF).toByte
      hex(j * 2 + 1) = HexDigits(d(j) & 0xF).toByte
      j += 1
    }
    UTF8String.fromBytes(hex)
  }
}

/** C4-style line filtering in one codegen'd pass: struct<n_lines,
  * n_kept_lines, text_filtered> where a line is kept iff it has at least
  * `minWords` space-separated words AND ends in '.', '!' or '?' —
  * byte-identical to the composable
  * `filter(split(text,"\n"), l => size(split-words) >= minWords && ends)`
  * + `array_join(..., "\n")` chain, which evaluates interpreted
  * (ArrayFilter is CodegenFallback) and re-splits every line.
  */
case class C4LineStats(child: Expression, minWords: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && minWords >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument and minWords >= 1, " +
        s"got ${child.dataType.sql}, minWords=$minWords")

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n_lines", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("n_kept_lines", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("text_filtered", StringType, nullable = false)))
  override def prettyName: String = "graft_c4_line_stats"

  override protected def nullSafeEval(s: Any): Any =
    C4LineStats.compute(s.asInstanceOf[UTF8String], minWords)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.C4LineStats.compute($c, $minWords);")

  override protected def withNewChildInternal(newChild: Expression): C4LineStats =
    copy(child = newChild)
}

object C4LineStats {
  def compute(text: UTF8String, minWords: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val b = text.getBytes
    val n = b.length
    var nLines = 0L
    var nKept = 0L
    val out = new java.io.ByteArrayOutputStream(n)
    var lineStart = 0
    var i = 0
    while (i <= n) {
      if (i == n || b(i) == '\n') {
        nLines += 1
        // word count: non-empty runs between single spaces
        var words = 0
        var j = lineStart
        while (j < i && words < minWords) {
          while (j < i && b(j) == ' ') j += 1
          if (j < i) { words += 1; while (j < i && b(j) != ' ') j += 1 }
        }
        val last = if (i > lineStart) b(i - 1) else 0
        if (words >= minWords && (last == '.' || last == '!' || last == '?')) {
          if (nKept > 0) out.write('\n')
          out.write(b, lineStart, i - lineStart)
          nKept += 1
        }
        lineStart = i + 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(
      nLines, nKept, UTF8String.fromBytes(out.toByteArray))
  }
}

object RepetitionStats {
  def compute(text: UTF8String): ArrayData = {
    val b = text.getBytes
    val (starts, ends, t) = Tok.scan(b)
    val toks = Tok.windowHashes(b, starts, ends, t, 1)
    val (distinct, _, _) = Tok.runStats(toks)
    val bigrams = Tok.windowHashes(b, starts, ends, t, 2)
    val nBg = bigrams.length.toLong
    val (_, topBg, _) = Tok.runStats(bigrams)
    val trigrams = Tok.windowHashes(b, starts, ends, t, 3)
    val nTg = trigrams.length.toLong
    val (_, _, dupTg) = Tok.runStats(trigrams)
    UnsafeArrayData.fromPrimitiveArray(Array(
      t.toLong, distinct, nBg, if (nBg == 0) 0L else topBg, nTg, dupTg))
  }
}

/** Per-document hashed n-gram bucket counts in one fused pass — the
  * DSIR featurizer ([[graft.operators.Sampling.importanceResample]]):
  * tokenize on single spaces (`split(text, ' ')` minus empties), form
  * every unigram and bigram, hash each with [[Md5Hash60]], reduce mod
  * `buckets`, and return the per-bucket occurrence counts as an array
  * of (b, n) structs sorted by bucket. Bit-identical counts to the
  * explode(unigrams ∪ bigrams) → md5-bucket → groupBy(doc, b) chain it
  * replaces, but as a pure map: no per-feature explode fanout, no
  * interpreted zip_with/slice bigram plumbing, and the (doc, bucket)
  * aggregate arrives already combined in-row — at 100 TB the per-doc
  * array (≤ min(2·tokens−1, buckets) entries) replaces one shuffle row
  * PER FEATURE OCCURRENCE.
  *
  * Bigram features are hashed over the canonical single-space join:
  * single-spaced regions hash zero-copy over the original text bytes;
  * multi-space gaps go through one reused scratch buffer (the
  * [[Tok.windowHashes]] rule, with md5-60 instead of xxhash64).
  *
  * Token-less text yields an EMPTY array (the doc has no features —
  * callers drop it, matching the chain where it produced no groups);
  * null text yields null.
  */
case class NgramBucketCounts(child: Expression, buckets: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && buckets >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument and buckets >= 1, " +
        s"got ${child.dataType.sql}, buckets=$buckets")

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("b", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("n", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_ngram_bucket_counts"

  override protected def nullSafeEval(s: Any): Any =
    NgramBucketCounts.compute(s.asInstanceOf[UTF8String], buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NgramBucketCounts.compute($c, $buckets);")

  override protected def withNewChildInternal(newChild: Expression): NgramBucketCounts =
    copy(child = newChild)
}

object NgramBucketCounts {
  def compute(text: UTF8String, buckets: Int): ArrayData = {
    val b = text.getBytes
    val (starts, ends, t) = Tok.scan(b)
    if (t == 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val m = t + (if (t >= 2) t - 1 else 0)
    val bs = new Array[Long](m)
    var k = 0
    var i = 0
    while (i < t) { // unigrams hash in place over the token's bytes
      bs(k) = Md5Hash60.hashBytes(b, starts(i), ends(i) - starts(i)) % buckets
      k += 1
      i += 1
    }
    var scratch: Array[Byte] = null
    i = 0
    while (i < t - 1) { // bigrams: canonical "tok_i tok_{i+1}" join
      val h =
        if (starts(i + 1) == ends(i) + 1) // already single-spaced: zero copy
          Md5Hash60.hashBytes(b, starts(i), ends(i + 1) - starts(i))
        else {
          val l0 = ends(i) - starts(i)
          val l1 = ends(i + 1) - starts(i + 1)
          val len = l0 + 1 + l1
          if (scratch == null || scratch.length < len) scratch = new Array[Byte](len)
          System.arraycopy(b, starts(i), scratch, 0, l0)
          scratch(l0) = ' '
          System.arraycopy(b, starts(i + 1), scratch, l0 + 1, l1)
          Md5Hash60.hashBytes(scratch, 0, len)
        }
      bs(k) = h % buckets // md5-60 is non-negative, so % == pmod
      k += 1
      i += 1
    }
    java.util.Arrays.sort(bs)
    var u = 0
    i = 0
    while (i < bs.length) {
      var j = i + 1
      while (j < bs.length && bs(j) == bs(i)) j += 1
      u += 1
      i = j
    }
    val rows = new Array[Any](u)
    var r = 0
    i = 0
    while (i < bs.length) {
      var j = i + 1
      while (j < bs.length && bs(j) == bs(i)) j += 1
      rows(r) = org.apache.spark.sql.catalyst.InternalRow(bs(i), (j - i).toLong)
      r += 1
      i = j
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }
}

/** DSIR per-doc score over a [[NgramBucketCounts]] array: one fused pass
  * producing struct(n_feats = Σ n, raw_weight = Σ n · lr(b)) — the same
  * left-to-right bucket-ascending fold as the composable
  * `aggregate(bc, ...)` pair it replaces, which routes every element
  * through interpreted ArrayAggregate (CodegenFallback) twice. The
  * per-bucket log-ratio table rides as a JVM double array baked into the
  * expression (B entries — dimension-sized driver state, the broadcast
  * pattern of NearestSeed/PqEncode). Callers apply round(..., 6)
  * downstream so the rounding contract stays in one visible place.
  */
case class DsirScore(child: Expression, lr: Array[Double])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(s: org.apache.spark.sql.types.StructType, _)
      if s.length == 2 && s(0).dataType == LongType && s(1).dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<struct<b:bigint,n:bigint>>, got ${other.sql}")
  }

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n_feats", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("raw_weight",
      org.apache.spark.sql.types.DoubleType, nullable = false)))
  override def prettyName: String = "graft_dsir_score"

  // the lr table must participate in expression equality/semanticHash
  // (two scores with different tables are different expressions), but
  // Array[Double] equals by reference — compare contents
  override def equals(o: Any): Boolean = o match {
    case d: DsirScore => child == d.child && java.util.Arrays.equals(lr, d.lr)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(lr)

  override protected def nullSafeEval(a: Any): Any =
    DsirScore.compute(a.asInstanceOf[ArrayData], lr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lrRef = ctx.addReferenceObj("lr", lr, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.DsirScore.compute($c, $lrRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): DsirScore =
    copy(child = newChild)
}

object DsirScore {
  def compute(bc: ArrayData, lr: Array[Double]): org.apache.spark.sql.catalyst.InternalRow = {
    val m = bc.numElements()
    var nFeats = 0L
    var w = 0.0
    var i = 0
    while (i < m) {
      val row = bc.getStruct(i, 2)
      val b = row.getLong(0)
      val n = row.getLong(1)
      // the expression can't validate bucket-count-vs-table-size at
      // analysis time (buckets arrive as data); a mismatch must fail
      // with the cause named, not a bare AIOOBE from inside codegen
      if (b < 0 || b >= lr.length)
        throw new IllegalArgumentException(
          s"graft_dsir_score: ngram bucket $b outside the log-ratio table " +
            s"(size ${lr.length}) — the ngramBucketCounts bucket count and " +
            "the table's bucket count must match")
      nFeats += n
      w += n * lr(b.toInt)
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(nFeats, w)
  }
}
