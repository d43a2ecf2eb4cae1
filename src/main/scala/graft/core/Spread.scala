package graft.core

import org.apache.spark.sql.DataFrame

/** Conditional parallelism widening for CPU-heavy map stages. */
object Spread {

  /** Round-robin repartition ONLY when the source arrives with fewer
    * splits than the cluster's default parallelism — the single-file /
    * few-file local case where downstream CPU work (shingle explode,
    * JSON synthesis, vector math) would otherwise run on a handful of
    * cores. A well-split source (parquet at scale) passes through
    * untouched: the unconditional form inserted a full round-robin
    * Exchange of every row before map-side work that the file splits
    * already parallelize, and CAPPED partitioning at total core count.
    *
    * Partition-count probe is `df.rdd.getNumPartitions` — physical
    * planning only, no job.
    */
  def ensureParallel(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }
}
