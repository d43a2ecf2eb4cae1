package graft

import graft.functions.{DoubleDotProduct, ShingleHashes}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.IntegerType
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Spark extension point wiring graft's native Catalyst expressions into
  * the SQL function registry, so `spark.sql("... graft_dot(a, b) ...")`
  * works anywhere the DataFrame helpers do. Enable on any cluster with
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * (the standard injection path — no code changes to the application),
  * or rely on [[graft.core.GraftSession.configure]], which registers the
  * same functions directly on an already-running session (the extensions
  * conf is only read at session construction, which a driver-provided
  * session is past).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit =
    GraftExtensions.registrations.foreach(extensions.injectFunction)
}

object GraftExtensions {

  private def arity(name: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    children => {
      require(children.length == n,
        s"$name requires exactly $n arguments, got ${children.length}")
      build(children)
    }

  /** (identifier, info, builder) triples for every SQL-expressible graft
    * expression. Column-level helpers composed from builtins (cosine,
    * fingerprints, quality scores) need no registration — they already
    * parse as plain SQL; only native expressions live here.
    */
  private def intLit(name: String, e: Expression): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$name expects an int literal, got $other")
  }

  private def strLit(name: String, e: Expression): String = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) => v.toString
    case other => throw new IllegalArgumentException(
      s"$name expects a string literal, got $other")
  }

  val registrations: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (FunctionIdentifier("graft_json_get"),
        new ExpressionInfo(classOf[graft.functions.JsonGetField].getName,
          "graft_json_get"),
        arity("graft_json_get", 2)(c =>
          graft.functions.JsonGetField(c.head, strLit("graft_json_get key", c(1))))),
      (FunctionIdentifier("graft_dot"),
        new ExpressionInfo(classOf[DoubleDotProduct].getName, "graft_dot"),
        arity("graft_dot", 2)(c => DoubleDotProduct(c.head, c(1)))),
      (FunctionIdentifier("graft_intersect_count"),
        new ExpressionInfo(classOf[graft.functions.SortedIntersectCount].getName,
          "graft_intersect_count"),
        arity("graft_intersect_count", 2)(c =>
          graft.functions.SortedIntersectCount(c.head, c(1)))),
      (FunctionIdentifier("graft_shingle_hashes"),
        new ExpressionInfo(classOf[ShingleHashes].getName, "graft_shingle_hashes"),
        arity("graft_shingle_hashes", 2)(c =>
          ShingleHashes(c.head, intLit("graft_shingle_hashes window", c(1))))),
      (FunctionIdentifier("graft_repetition_stats"),
        new ExpressionInfo(classOf[graft.functions.RepetitionStats].getName,
          "graft_repetition_stats"),
        arity("graft_repetition_stats", 1)(c =>
          graft.functions.RepetitionStats(c.head))),
      (FunctionIdentifier("graft_canon_fingerprint"),
        new ExpressionInfo(classOf[graft.functions.CanonFingerprint].getName,
          "graft_canon_fingerprint"),
        arity("graft_canon_fingerprint", 1)(c =>
          graft.functions.CanonFingerprint(c.head))),
      (FunctionIdentifier("graft_md5_hash60"),
        new ExpressionInfo(classOf[graft.functions.Md5Hash60].getName,
          "graft_md5_hash60"),
        arity("graft_md5_hash60", 1)(c => graft.functions.Md5Hash60(c.head))),
      (FunctionIdentifier("graft_simhash_fp"),
        new ExpressionInfo(classOf[graft.functions.SimHashFp].getName,
          "graft_simhash_fp"),
        arity("graft_simhash_fp", 2)(c =>
          graft.functions.SimHashFp(c.head, intLit("graft_simhash_fp bits", c(1))))),
      (FunctionIdentifier("graft_minhash_sig"),
        new ExpressionInfo(classOf[graft.functions.MinHashSig].getName,
          "graft_minhash_sig"),
        arity("graft_minhash_sig", 2)(c =>
          graft.functions.MinHashSig(c.head, intLit("graft_minhash_sig numPerm", c(1))))),
      (FunctionIdentifier("graft_token_chunks"),
        new ExpressionInfo(classOf[graft.functions.TokenChunks].getName,
          "graft_token_chunks"),
        arity("graft_token_chunks", 3)(c =>
          graft.functions.TokenChunks(c.head,
            intLit("graft_token_chunks window", c(1)),
            intLit("graft_token_chunks stride", c(2))))),
      (FunctionIdentifier("graft_ngram_bucket_counts"),
        new ExpressionInfo(classOf[graft.functions.NgramBucketCounts].getName,
          "graft_ngram_bucket_counts"),
        arity("graft_ngram_bucket_counts", 2)(c =>
          graft.functions.NgramBucketCounts(c.head,
            intLit("graft_ngram_bucket_counts buckets", c(1))))),
      (FunctionIdentifier("graft_token_tfs"),
        new ExpressionInfo(classOf[graft.functions.TokenTfs].getName,
          "graft_token_tfs"),
        arity("graft_token_tfs", 1)(c => graft.functions.TokenTfs(c.head))),
      (FunctionIdentifier("graft_token_term_tfs"),
        new ExpressionInfo(classOf[graft.functions.TokenTermTfs].getName,
          "graft_token_term_tfs"),
        arity("graft_token_term_tfs", 1)(c => graft.functions.TokenTermTfs(c.head))),
      (FunctionIdentifier("graft_token_count"),
        new ExpressionInfo(classOf[graft.functions.TokenCount].getName,
          "graft_token_count"),
        arity("graft_token_count", 1)(c => graft.functions.TokenCount(c.head))),
      (FunctionIdentifier("graft_alnum_run_count"),
        new ExpressionInfo(classOf[graft.functions.AlnumRunCount].getName,
          "graft_alnum_run_count"),
        arity("graft_alnum_run_count", 1)(c => graft.functions.AlnumRunCount(c.head))),
      (FunctionIdentifier("graft_l2_normalize"),
        new ExpressionInfo(classOf[graft.functions.L2Normalize].getName,
          "graft_l2_normalize"),
        arity("graft_l2_normalize", 1)(c => graft.functions.L2Normalize(c.head))),
      (FunctionIdentifier("graft_quantize_int8"),
        new ExpressionInfo(classOf[graft.functions.QuantizeInt8].getName,
          "graft_quantize_int8"),
        arity("graft_quantize_int8", 1)(c => graft.functions.QuantizeInt8(c.head))),
      (FunctionIdentifier("graft_pii_redact"),
        new ExpressionInfo(classOf[graft.functions.PiiRedact].getName,
          "graft_pii_redact"),
        arity("graft_pii_redact", 1)(c => graft.functions.PiiRedact(c.head))),
      (FunctionIdentifier("graft_sum128"),
        new ExpressionInfo(classOf[graft.functions.Sum128].getName, "graft_sum128"),
        arity("graft_sum128", 2)(c =>
          // aggregate: the analyzer wraps a bare AggregateFunction; input
          // is the UNSCALED long (see GraftBridge.sum128Long)
          graft.functions.Sum128(c.head, intLit("graft_sum128 scale", c(1))))))
}
