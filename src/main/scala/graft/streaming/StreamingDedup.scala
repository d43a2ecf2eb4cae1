package graft.streaming

import graft.operators.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming deduplication for the ingest path: drop exact/normalized
  * duplicates as documents arrive, instead of a full-corpus batch dedup
  * after the fact.
  *
  * State design: `dropDuplicatesWithinWatermark` keeps one state row per
  * key seen within the watermark horizon and evicts older keys — bounded
  * state, unlike plain `dropDuplicates` on a stream (whose state grows
  * with every distinct key forever). The horizon is the dedup guarantee:
  * a duplicate arriving later than the watermark delay after its first
  * copy can slip through; batch dedup (operators.Dedup) remains the
  * periodic exact sweep. This mirrors production pipelines: streaming
  * dedup bounds the working set, batch dedup is the ground truth.
  */
object StreamingDedup {

  /** Exact dedup on an existing key column. */
  def exactWithinWatermark(stream: DataFrame, keyCol: String, tsCol: String,
                           delay: String): DataFrame =
    stream.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keyCol)

  /** Normalized-text dedup: fingerprint (lowercase, strip punctuation,
    * collapse whitespace, md5) computed map-side, then keyed dedup on it.
    */
  def normalizedWithinWatermark(stream: DataFrame, textCol: String, tsCol: String,
                                delay: String): DataFrame =
    stream.withColumn("_fp", TextAnalysis.fingerprint(col(textCol)))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("_fp")
      .drop("_fp")
}
