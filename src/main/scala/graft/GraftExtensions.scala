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
  val registrations: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (FunctionIdentifier("graft_dot"),
        new ExpressionInfo(classOf[DoubleDotProduct].getName, "graft_dot"),
        arity("graft_dot", 2)(c => DoubleDotProduct(c.head, c(1)))),
      (FunctionIdentifier("graft_shingle_hashes"),
        new ExpressionInfo(classOf[ShingleHashes].getName, "graft_shingle_hashes"),
        arity("graft_shingle_hashes", 2) { c =>
          val w = c(1) match {
            case Literal(v: Int, IntegerType) => v
            case other => throw new IllegalArgumentException(
              s"graft_shingle_hashes window must be an int literal, got $other")
          }
          ShingleHashes(c.head, w)
        }),
      (FunctionIdentifier("graft_repetition_stats"),
        new ExpressionInfo(classOf[graft.functions.RepetitionStats].getName,
          "graft_repetition_stats"),
        arity("graft_repetition_stats", 1)(c =>
          graft.functions.RepetitionStats(c.head))),
      (FunctionIdentifier("graft_canon_fingerprint"),
        new ExpressionInfo(classOf[graft.functions.CanonFingerprint].getName,
          "graft_canon_fingerprint"),
        arity("graft_canon_fingerprint", 1)(c =>
          graft.functions.CanonFingerprint(c.head))))
}
