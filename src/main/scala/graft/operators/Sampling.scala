package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * `rand()`-based sampling is irreproducible across runs/engines; hashing
  * a stable key gives the same sample everywhere — the property that
  * makes train/validation splits and downsampling auditable. The hash is
  * md5-derived so any engine can recompute membership.
  *
  * Scale shape: a map-side filter — no shuffle, no state; composes with
  * partition pruning.
  */
object Sampling {

  /** Stable bucket in [0, buckets) for a key column. */
  def hashBucket(key: Column, buckets: Int): Column =
    pmod(conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long"),
      lit(buckets))

  /** Keep rows whose key hashes into [0, keep) of [0, buckets): a
    * deterministic keep-rate of keep/buckets, uniform per stratum when
    * the key is uniform within strata.
    */
  def deterministicSample(df: DataFrame, keyCol: String,
                          keep: Int, buckets: Int): DataFrame = {
    require(keep >= 0 && keep <= buckets && buckets > 0)
    df.filter(hashBucket(col(keyCol), buckets) < keep)
  }

  /** Train/validation/test split labels from the same stable hash —
    * fractions in per-mille to stay integer-exact.
    */
  def splitLabel(key: Column, trainPerMille: Int, validPerMille: Int): Column = {
    val b = hashBucket(key, 1000)
    when(b < trainPerMille, "train")
      .when(b < trainPerMille + validPerMille, "valid")
      .otherwise("test")
  }
}
