package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-column operators for training-data pipelines: normalization
  * and storage quantization. Builtins only (higher-order array functions +
  * the native dot expression) — map-side, no shuffle, linear at 100 TB.
  */
object Embeddings {

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** L2-normalized embeddings: v / ||v||, zero vectors unchanged — the
    * preprocessing step that turns dot products into cosines for every
    * downstream ANN / near-dup operator.
    *
    * The norm (a whole-array reduction via the native dot expression) is
    * staged as an ATTRIBUTE before the per-element divide references it:
    * embedding the norm inside the transform lambda would re-evaluate
    * the O(d) reduction per component — O(d²) per row (the same
    * CollapseProject staging rule as quantizeInt8's scale).
    */
  def l2Normalize(emb: DataFrame, idCol: String = "vec_id",
                  vecCol: String = "embedding"): DataFrame = {
    // spread: the per-element HOF math is CPU-bound interpreted work — a
    // single-split source would run the whole corpus on one core
    val staged = graft.core.Spread.ensureParallel(emb)
      .select(col(idCol), asDouble(col(vecCol)).as("_v"))
      .withColumn("_n",
        sqrt(org.apache.spark.sql.GraftBridge.dotProduct(col("_v"), col("_v"))))
    staged.select(col(idCol),
      when(col("_n") === 0.0, col("_v"))
        .otherwise(transform(col("_v"), x => x / col("_n")))
        .as("normalized"))
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
    val staged = graft.core.Spread.ensureParallel(emb).select(
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
