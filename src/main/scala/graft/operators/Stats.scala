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

  /** Per-group quantiles by HISTOGRAM CENSUS + exact in-bin selection —
    * the codegen path for values with a KNOWN RANGE (parquet footer
    * min/max) and bounded per-bin distinct counts (fixed-tick decimals
    * like prices, bounded-granularity measurements). Returns the EXACT
    * k-th smallest element for k = max(1, ceil(p*n)) — rank error ZERO,
    * strictly stronger than any sketch bound.
    *
    * Cost honesty (sf10 A/B, tools/QuantProbe): this is NOT a speedup
    * over `approx_percentile` — the sketch does one pass at ~30-40
    * core-s where the census + selection's two full scans measure
    * ~130-170. Its value is EXACTNESS at scale: `exactQuantiles`'
    * value->count map explodes on high-cardinality doubles, the sketch
    * answers within a rank bound, and this returns the true k-th
    * element in two bounded-memory codegen'd scans. Reach for it when
    * the answer must be exact and the cardinality forbids `percentile`.
    *
    * Shape: (1) census — `groupBy(group, bin)` with count/min/max, pure
    * HashAggregate with map-side combine, output ≤ groups x bins rows;
    * (2) cumulative ranks + crossing-bin selection on that aggregated
    * (dimension-sized) frame; single-valued crossing bins answer
    * directly, multi-valued ones go to (3) a second scan filtered to the
    * ≤ groups x |probs| candidate bins (broadcast semi join), reduced to
    * per-(bin, value) counts map-side, and the k'-th element is picked
    * by an in-row sorted-prefix walk. Bin edges ride in as parameters —
    * derive them with [[graft.core.RowCounts.columnRange]] for a
    * zero-job footer proof, or pay one tiny min/max pre-pass.
    *
    * Contract: per-bin DISTINCT value counts must be bounded (the pass-3
    * reduction is per-bin-distinct-sized). Unbounded-cardinality doubles
    * concentrated in one bin want the sketch ([[approxQuantiles]]) or a
    * recursive re-bin; this operator targets the fixed-tick case.
    */
  def histogramQuantiles(df: DataFrame, valueCol: String, groupCol: String,
                         probs: Seq[Double], lo: Double, hi: Double,
                         bins: Int = 1 << 16): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0))
    require(hi >= lo && bins > 0)
    import org.apache.spark.sql.expressions.Window
    val width = math.max((hi - lo) / bins, java.lang.Double.MIN_NORMAL)
    val v = col(valueCol)
    val binCol = least(lit(bins - 1), greatest(lit(0),
      floor((v - lit(lo)) / lit(width)).cast("int")))
    val census = df
      .filter(v.isNotNull)
      .groupBy(col(groupCol), binCol.as("_bin"))
      .agg(count(lit(1)).as("_c"), min(v).as("_bmn"), max(v).as("_bmx"))
    // cumulative ranks over the aggregated (≤ groups x bins) frame
    val wCum = Window.partitionBy(col(groupCol)).orderBy(col("_bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col(groupCol))
    val ranked = census
      .withColumn("_cum", sum(col("_c")).over(wCum))
      .withColumn("_n", sum(col("_c")).over(wAll))
    // crossing bin per (group, prob): first bin whose cum reaches the
    // target rank k = max(1, ceil(p*n)); k' = k - rows before the bin
    val probsDf = {
      import org.apache.spark.sql.{Row => SRow}
      import org.apache.spark.sql.types.{StructType, StructField, IntegerType, DoubleType}
      df.sparkSession.createDataFrame(
        java.util.Arrays.asList(probs.zipWithIndex.map {
          case (p, i) => SRow(i + 1, p) }: _*),
        StructType(Seq(StructField("which", IntegerType, nullable = false),
          StructField("p", DoubleType, nullable = false))))
    }
    // cached: the tiny crossing frame is read three times (direct arm,
    // pending arm, and the pending-emptiness probe) — without the cache
    // each consumer would re-run the full census scan
    val crossing = graft.core.CacheScope.cached(
      ranked.crossJoin(broadcast(probsDf))
        .withColumn("_k", greatest(lit(1L), ceil(col("p") * col("_n")).cast("long")))
        .filter(col("_cum") >= col("_k") && col("_cum") - col("_c") < col("_k"))
        .withColumn("_kp", col("_k") - (col("_cum") - col("_c"))))
    val direct = crossing.filter(col("_bmn") === col("_bmx"))
      .select(col(groupCol), col("which"), col("_bmn").as("q"))
    val pending = crossing.filter(col("_bmn") =!= col("_bmx"))
      .select(col(groupCol), col("_bin"), col("which"), col("_kp"))
    // second scan only when some crossing bin is multi-valued: reduce
    // candidate-bin rows to (value, count) map-side, then pick the k'-th
    // element with an in-row sorted-prefix walk
    val q2 =
      if (pending.isEmpty) direct
      else {
        val cand = df
          .filter(v.isNotNull)
          .withColumn("_bin", binCol)
          .join(broadcast(pending), Seq(groupCol, "_bin"))
          .groupBy(col(groupCol), col("which"), col("_kp"), v.as("_v"))
          .agg(count(lit(1)).as("_vc"))
          .groupBy(col(groupCol), col("which"), col("_kp"))
          .agg(sort_array(collect_list(struct(col("_v"), col("_vc")))).as("_vs"))
          .select(col(groupCol), col("which"),
            aggregate(col("_vs"),
              struct(lit(0L).as("c"), lit(Double.NaN).as("q"), lit(false).as("done")),
              (acc, x) => when(acc.getField("done"), acc).otherwise(
                struct((acc.getField("c") + x.getField("_vc")).as("c"),
                  x.getField("_v").as("q"),
                  (acc.getField("c") + x.getField("_vc") >= col("_kp")).as("done"))),
              acc => acc.getField("q")).as("q"))
        direct.unionByName(cand)
      }
    q2.select(col(groupCol), col("which").cast("long").as("which"), col("q"))
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
