package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical._

/** Conditional parallelism widening for CPU-heavy map stages. */
object Spread {

  /** True when the analyzed plan already contains a shuffle-inducing
    * operator (exchange). For such plans the partition-count probe below
    * is unsafe: with AQE enabled, `Dataset.rdd` materializes every
    * non-final shuffle stage — real jobs whose work is discarded when the
    * frame re-executes downstream — and the shuffle already redistributes
    * to `spark.sql.shuffle.partitions`, so widening is moot anyway.
    */
  private def hasShuffle(plan: LogicalPlan): Boolean = plan.exists {
    case r: Repartition       => r.shuffle // coalesce() is narrow: probe-safe
    case _: RepartitionOperation | _: RebalancePartitions => true
    case _: Join | _: Aggregate | _: Distinct | _: Deduplicate | _: Window => true
    case s: Sort              => s.global
    case _: Intersect | _: Except => true
    case _ => false
  }

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
    * planning only (no job) for exchange-free plans. Plans that already
    * contain a shuffle skip both the probe and the widening (see
    * [[hasShuffle]]): under AQE the probe would actually RUN the
    * upstream stages, and their shuffle already sets the parallelism.
    */
  def ensureParallel(df: DataFrame): DataFrame = {
    // streaming frames: no .rdd (illegal on an unstarted streaming plan),
    // and no widening — micro-batch parallelism comes from the source's
    // own file/offset splitting; the operators stay shape-identical
    if (df.isStreaming || hasShuffle(df.queryExecution.analyzed)) df
    else {
      val p = df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions < p) df.repartition(p) else df
    }
  }
}
