package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (AQE's skew-join handles sort-merge
  * skew at runtime; explicit salting is the deterministic fallback for
  * hash-partitioned aggregations and joins where one key dominates —
  * e.g. a podping URL with millions of pings).
  */
object Skew {

  /** Salted equi join: the skewed (large) side gets a random-ish salt in
    * [0, factor) derived from a stable row hash; the small side is
    * replicated `factor` times. Join keys become (key, salt) so the hot
    * key spreads over `factor` reducers. Semantics identical to
    * `large.join(small, keys)` for 1:N joins (small side unique on keys).
    */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
                 factor: Int = 8): DataFrame = {
    require(factor > 0)
    val salted = large.withColumn("_salt",
      pmod(xxhash64(struct(large.columns.map(col).toSeq: _*)), lit(factor)).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, keys :+ "_salt").drop("_salt")
  }

  /** Two-phase (salted partial, then final) aggregation for skewed group
    * keys: count per (key, salt) map-side-combines within salt buckets,
    * then the tiny per-key rollup sums the buckets. For algebraic
    * aggregates this is semantically identical to a direct groupBy.
    */
  def saltedCount(df: DataFrame, keys: Seq[String], factor: Int = 8): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(xxhash64(struct(df.columns.map(col).toSeq: _*)), lit(factor)).cast("int"))
    salted
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(count(lit(1)).as("_partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_partial")).as("cnt"))
  }
}
