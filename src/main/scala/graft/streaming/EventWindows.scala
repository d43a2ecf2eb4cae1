package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Windowed aggregation over the event stream (T8 generalization — the
  * reference only has query-time block-range windows; real deployments
  * want standing tumbling-window aggregates).
  *
  * The same plan runs batch (watermark is a no-op) and streaming (append
  * mode: a window emits once the event-time watermark passes its end, so
  * results are final — the streaming analogue of processing only
  * finalized blocks).
  */
object EventWindows {

  /** Session windows per key: events within `gap` of each other merge into
    * one session (`session_window` — streaming-capable with a watermark;
    * in batch it equals the gaps-and-islands SQL formulation).
    */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
                    tsCol: String = "ts", keyCol: String = "user_id"): DataFrame =
    events
      .groupBy(session_window(col(tsCol), gap).as("w"), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))

  /** Tumbling windows = sliding with slide == duration. */
  def tumblingCounts(events: DataFrame, windowLen: String = "1 hour",
                     watermarkDelay: String = "2 hours",
                     tsCol: String = "ts", keyCol: String = "event_type"): DataFrame =
    slidingCounts(events, windowLen, windowLen, watermarkDelay, tsCol, keyCol)

  /** Watermarked stream-stream inner join: enrich a fact stream with a
    * second stream on an equi key plus an event-time bound (the streaming
    * analogue of J4's FK lookup when both sides arrive continuously).
    * Both sides carry watermarks and the join condition bounds the
    * event-time skew, so each side's buffered state is evicted once the
    * watermark passes — bounded state, the requirement for an unbounded
    * run.
    */
  def enrichStream(facts: DataFrame, dim: DataFrame, key: String,
                   factsTs: String, dimTs: String,
                   delay: String = "1 hour", skew: String = "2 hours"): DataFrame = {
    // prefix the dim side's non-key columns so a shared payload column
    // name can't produce an ambiguous duplicate in the result
    val prefixed = dim.columns.filter(_ != key).foldLeft(dim)((df, c) =>
      df.withColumnRenamed(c, if (c == dimTs) c else s"dim_$c"))
    val f = facts.withWatermark(factsTs, delay)
    val d = prefixed.withWatermark(dimTs, delay)
    val sk = expr(s"INTERVAL $skew")
    f.join(d,
      f(key) === d(key) &&
        d(dimTs).between(f(factsTs) - sk, f(factsTs) + sk))
      .drop(d(key)).drop(d(dimTs))
  }

  /** Sliding (hopping) windows: each event lands in duration/slide
    * overlapping windows (`window` with a slide interval — the fanout is
    * per-row, map-side; the shuffle keys on (window, key) exactly like
    * tumbling). Streaming-capable with the same watermark finalization.
    */
  def slidingCounts(events: DataFrame, windowLen: String = "1 hour",
                    slide: String = "30 minutes",
                    watermarkDelay: String = "2 hours",
                    tsCol: String = "ts", keyCol: String = "event_type"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark(tsCol, watermarkDelay) else events
    src
      .groupBy(window(col(tsCol), windowLen, slide).as("w"), col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("window_start"), col(keyCol), col("cnt"))
  }
}
