package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-column operators for training-data pipelines: normalization
  * and storage quantization. Builtins only (higher-order array functions +
  * the native dot expression) — map-side, no shuffle, linear at 100 TB.
  */
object Embeddings {

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** L2-normalize: v / ||v||; zero vectors pass through unchanged. */
  def l2Normalize(vec: Column): Column = {
    val n = Similarity.norm(vec)
    when(n === 0.0, vec).otherwise(transform(vec, x => x / n))
  }

  /** Symmetric per-vector int8 quantization: scale = max|x| / 127,
    * q_i = round(x_i / scale) ∈ [-127, 127]. The dequantized error is
    * bounded by scale/2 per component; `scale` rides along for decode.
    * This is the standard storage/serving compression for ANN corpora —
    * 4x smaller than float32, 8x smaller than float64.
    */
  def quantizeInt8(emb: DataFrame, idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame = {
    // Quantize with the SAME rounded scale that is emitted, so decode
    // (q * scale) reconstructs within the documented scale/2 bound —
    // encoding with an unrounded scale while reporting the rounded one
    // would add a systematic bias for large-magnitude components.
    //
    // Two-stage select: `scale` (a per-row array fold) becomes an
    // attribute before the quantization pass references it twice — the
    // single projection form re-evaluated the fold per reference.
    val staged = emb.select(
      col(idCol), asDouble(col(vecCol)).as("_v"),
      round(aggregate(asDouble(col(vecCol)), lit(0.0),
        (acc, x) => greatest(acc, abs(x))) / 127.0, 6).as("scale"))
    staged.select(
      col(idCol),
      col("scale"),
      when(col("scale") === 0.0, transform(col("_v"), _ => lit(0)))
        .otherwise(transform(col("_v"),
          x => round(x / col("scale"), 0).cast("int")))
        .as("quantized"))
  }
}
