package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-w-shingle hashes of a text column, as one codegen'd
  * native expression.
  *
  * Produces exactly the multiset-distinct of
  * `xxhash64(concat_ws(' ', tok_i, ..., tok_{i+w-1}))` over the space-split
  * non-empty tokens (bit-identical hashes, seed 42 — the MinHash/SimHash
  * signature inputs therefore do not change), but in a single fused pass:
  * the composable formulation
  * `array_distinct(transform(sequence(...), concat_ws(element_at...)))`
  * routes every shingle through interpreted HigherOrderFunction plumbing
  * (ArrayTransform is CodegenFallback) plus a per-shingle string
  * allocation, which profiling shows is the dominant CPU of the whole
  * n-gram dedup family. Here each window is hashed either in place over
  * the original text bytes (single-space case — zero copy) or via one
  * reused scratch buffer; only the 8-byte hashes are retained.
  *
  * Fewer than `w` tokens yields an EMPTY array (callers explode behind a
  * `when(size(...) > 0, ...)` guard); a null text yields null.
  *
  * Downstream consumers join and aggregate on the 64-bit hash instead of
  * the shingle string: at 100 TB this also shrinks the shingle shuffle to
  * a fixed 8 bytes per shingle regardless of n-gram width. (A 64-bit
  * collision between distinct shingles is ~p^2/2^65 for corpus shingle
  * count p — negligible against the gate; the reference's own LSH path
  * tolerates far more.)
  */
case class ShingleHashes(child: Expression, w: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && w >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument and window >= 1, " +
        s"got ${child.dataType.sql}, w=$w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  override protected def nullSafeEval(s: Any): Any =
    ShingleHashes.compute(s.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleHashes.compute($c, $w);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {

  private val Seed = 42L // xxhash64's fixed seed — bit-compat with the builtin

  /** Distinct xxhash64 values of the w-token shingles of `text`.
    * Static + JVM-typed so generated code calls it directly.
    */
  def compute(text: UTF8String, w: Int): ArrayData = {
    val b = text.getBytes
    val n = b.length
    // token boundaries: split on single 0x20 (a space byte never occurs
    // inside a UTF-8 multibyte sequence), skipping empty tokens — the
    // exact semantics of array_remove(split(text, " ", -1), "")
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var t = 0
    var i = 0
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
    if (t < w) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val m = t - w + 1
    val hashes = new Array[Long](m)
    var scratch: Array[Byte] = null
    var k = 0
    while (k < m) {
      val last = k + w - 1
      // single-space fast path: when the window's tokens are adjacent in
      // the original bytes with exactly one separator each, the in-place
      // range IS the ' '-joined shingle — hash it with zero copies
      var contiguous = true
      var j = k
      while (contiguous && j < last) {
        if (starts(j + 1) != ends(j) + 1) contiguous = false
        j += 1
      }
      if (contiguous) {
        val off = starts(k)
        hashes(k) = XXH64.hashUnsafeBytes(
          b, Platform.BYTE_ARRAY_OFFSET + off, ends(last) - off, Seed)
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
        hashes(k) = XXH64.hashUnsafeBytes(scratch, Platform.BYTE_ARRAY_OFFSET, len, Seed)
      }
      k += 1
    }
    // distinct via sort + in-place unique (order is irrelevant to every
    // consumer: the array is exploded into joins/aggregates)
    java.util.Arrays.sort(hashes)
    var u = 1
    k = 1
    while (k < m) {
      if (hashes(k) != hashes(k - 1)) { hashes(u) = hashes(k); u += 1 }
      k += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (u == m) hashes else java.util.Arrays.copyOf(hashes, u))
  }
}
