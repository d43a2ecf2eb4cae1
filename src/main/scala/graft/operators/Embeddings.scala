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
    val v = asDouble(col(vecCol))
    // Quantize with the SAME rounded scale that is emitted, so decode
    // (q * scale) reconstructs within the documented scale/2 bound —
    // encoding with an unrounded scale while reporting the rounded one
    // would add a systematic bias for large-magnitude components.
    val scale = round(
      aggregate(v, lit(0.0), (acc, x) => greatest(acc, abs(x))) / 127.0, 6)
    emb.select(
      col(idCol),
      scale.as("scale"),
      when(scale === 0.0, transform(v, _ => lit(0)))
        .otherwise(transform(v, x => round(x / scale, 0).cast("int")))
        .as("quantized"))
  }
}
