package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus distribution statistics for training-data pipelines.
  *
  * Curation decisions (length cutoffs, source mixing, outlier trims) are
  * made against the corpus' own distribution, so the engine needs per-group
  * quantiles as a first-class operator.
  *
  * Two formulations:
  *  - `exactQuantiles` — `percentile(...)`: Spark aggregates a per-group
  *    value->count map and interpolates exactly (linear interpolation on the
  *    sorted values, the same definition DuckDB's `quantile_cont` uses, which
  *    is what makes the oracle gate possible). The map is proportional to the
  *    number of DISTINCT values per group — fine for bounded-cardinality
  *    metrics (lengths, token counts), not for high-cardinality doubles.
  *  - `approxQuantiles` — `approx_percentile` (KLL-style sketch, bounded
  *    memory regardless of cardinality): the 100 TB path when values are
  *    unbounded. Unit-tested against the exact form within its accuracy
  *    bound, mirroring how the HLL distinct-count operator is validated.
  *
  * Both are single-shuffle group-bys with map-side partial aggregation.
  */
object Stats {

  /** Exact per-group quantiles of a numeric column, one output row per
    * (group, probability). Output quantile is rounded to 4 decimals and
    * emitted as a string: the driver's gate hashes representations, and
    * a fixed-scale string is the only form two engines agree on.
    */
  def exactQuantiles(df: DataFrame, valueCol: String, groupCol: String,
                     probs: Seq[Double]): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0))
    // Labels and values go out as fixed-scale decimal strings: the gate
    // hashes representations, and a fixed scale is the one form engines
    // agree on (same move as the decimal aggregates).
    val probLabels = array(probs.map(p => lit(f"$p%.2f")): _*)
    df.groupBy(col(groupCol))
      .agg(expr(s"percentile($valueCol, array(${probs.mkString(",")}))").as("qs"),
        count(lit(1)).as("n"))
      .select(col(groupCol), posexplode(col("qs")).as(Seq("pos", "q")), col("n"))
      .select(col(groupCol),
        element_at(probLabels, col("pos") + 1).as("p"),
        round(col("q"), 4).cast("decimal(18,4)").cast("string").as("quantile"),
        col("n"))
  }

  /** Sketch-based per-group quantiles: bounded memory at any cardinality.
    * `accuracy` is Spark's 1/eps knob (10000 ~= 0.01% rank error).
    */
  def approxQuantiles(df: DataFrame, valueCol: String, groupCol: String,
                      probs: Seq[Double], accuracy: Int = 10000): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0))
    df.groupBy(col(groupCol))
      .agg(expr(s"approx_percentile($valueCol, array(${probs.mkString(",")}), $accuracy)")
        .as("qs"))
      .select(col(groupCol), posexplode(col("qs")).as(Seq("pos", "q")))
      .select(col(groupCol), (col("pos") + 1).as("which"), col("q"))
  }

  /** Corpus composition report: per stratum (e.g. language × source) the
    * document count, token total, share of all corpus tokens, and the
    * cumulative share in descending-size order — the table a data-mixing
    * decision ("cap source X", "upsample language Y") reads first.
    *
    * One shuffle (the groupBy); the two windows that follow run over the
    * AGGREGATED frame, whose cardinality is the number of strata —
    * dimension-sized at any input scale, so the unpartitioned window is
    * safe here (unlike over raw rows; cf. packByTokenBudget's sharding).
    */
  def corpusMixture(docs: DataFrame, strata: Seq[String],
                    textCol: String = "text"): DataFrame = {
    require(strata.nonEmpty)
    import org.apache.spark.sql.expressions.Window
    val ord = col("n_tokens").desc +: strata.map(col)
    // These windows run UNPARTITIONED on purpose: the frame below them is
    // the aggregated strata table (dimension-sized at any input scale),
    // so single-partition execution is the correct plan. A constant
    // partition key would silence WindowExec's WARN, but Spark 4's
    // EliminateWindowPartitions optimizer rule strips foldable partition
    // expressions back out (verified: the lit-keyed form plans
    // identically and still warns) — the mains scope the logger instead,
    // and the PlanShapeSpec fence polices that every unpartitioned window
    // in the suite sits above an aggregate where it belongs.
    val w = Window.orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val total = Window.partitionBy()
    docs
      .groupBy(strata.map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(size(TextAnalysis.tokens(col(textCol))).cast("long")).as("n_tokens"))
      .withColumn("token_share",
        round(col("n_tokens").cast("double") / sum(col("n_tokens")).over(total), 6))
      .withColumn("cum_share",
        round(sum(col("n_tokens")).over(w).cast("double")
          / sum(col("n_tokens")).over(total), 6))
  }
}
