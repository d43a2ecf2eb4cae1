package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-column operators for training-data pipelines: normalization
  * and storage quantization. Builtins only (higher-order array functions +
  * the native dot expression) — map-side, no shuffle, linear at 100 TB.
  */
object Embeddings {

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
                  vecCol: String = "embedding"): DataFrame =
    // native fused loop (L2Normalize): the composable cast → dot →
    // divide chain ran its two ArrayTransform passes interpreted
    // (HigherOrderFunction is CodegenFallback) with a boxed
    // intermediate array each per row; semantics pinned bit-identical
    // by spec (null elements, zero vectors, NaN poisoning)
    graft.core.Spread.ensureParallel(emb)
      .select(col(idCol),
        org.apache.spark.sql.GraftBridge.l2Normalize(col(vecCol)).as("normalized"))

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
    // One native pass (QuantizeInt8): the composable form ran an
    // interpreted aggregate fold plus two interpreted transform passes;
    // bit-identity (incl. null elements, zero/NaN scales, the non-ANSI
    // double→int cast arms) pinned by differential spec.
    graft.core.Spread.ensureParallel(emb)
      .select(col(idCol),
        org.apache.spark.sql.GraftBridge.quantizeInt8(col(vecCol)).as("_q"))
      .select(col(idCol), col("_q.scale").as("scale"),
        col("_q.quantized").as("quantized"))
  }

  // --------------------------------------------------- product quantization

  /** Product quantization (Jégou et al., "Product quantization for
    * nearest neighbor search", TPAMI 2011) — THE storage compression for
    * web-scale ANN: split each vector into m contiguous subspaces, code
    * each subspace as its nearest codebook entry, store m small code ids
    * instead of d floats (64 dims × f32 → 8 bytes of codes at m=8).
    *
    * This overload derives the per-subspace codebooks from the data
    * deterministically — codebook s = the subspace-s slices of the k
    * smallest-id vectors — so an external engine can replicate the whole
    * operator (the DuckDB gate); production trains per-subspace k-means
    * exactly as [[graft.operators.Dedup.semanticDedupKMeans]] trains its
    * centers. Output is flat (id, subspace, code, dist): one row per
    * (vector, subspace), dist = the winner's rounded squared distance
    * (sums over subspaces = the reconstruction error).
    *
    * Scale shape: codebooks are k·m·subDim doubles (collect + broadcast,
    * dimension-sized); encoding is ONE map pass through the fused native
    * [[graft.functions.PqEncode]] — no shuffle; the explode is m rows per
    * vector of three scalars (the compressed representation, tiny next
    * to the input).
    */
  def productQuantize(emb: DataFrame, idCol: String = "vec_id",
                      vecCol: String = "embedding",
                      m: Int = 8, k: Int = 16): DataFrame =
    buildPq(emb, idCol, vecCol, m, k).codes

  /** Build a PQ index: deterministic codebooks + the coded corpus.
    * `codes` is the flat (id, subspace, code, dist) frame — at scale it
    * is what you PERSIST (8 bytes of codes per 64-dim vector instead of
    * 256 of float32); [[PqIndex.topK]] answers queries from it without
    * touching raw corpus vectors.
    */
  def buildPq(emb: DataFrame, idCol: String = "vec_id",
              vecCol: String = "embedding",
              m: Int = 8, k: Int = 16): PqIndex = {
    // same prep + deterministic k-smallest-ids seed harvest as the
    // semantic-dedup family — the seed rule is single-sourced in Dedup
    val v = Dedup.prepVecs(emb, idCol, vecCol)
    val seeds = Dedup.collectSeeds(v, k).map(_._2)
    val d = seeds.head.length
    require(d % m == 0, s"dim $d not divisible into $m subspaces")
    val subDim = d / m
    val codebooks = Array.tabulate(m)(s =>
      seeds.map(_.slice(s * subDim, (s + 1) * subDim)))
    val codes = v.select(col("vid").as(idCol),
        explode(org.apache.spark.sql.GraftBridge.pqEncode(
          col("vec"), codebooks, subDim)).as("_e"))
      .select(col(idCol), col("_e.subspace").as("subspace"),
        col("_e.code").as("code"), col("_e.dist").as("dist"))
    new PqIndex(codes, codebooks, subDim, idCol)
  }

  /** [[buildPq]] with TRAINED codebooks — the production path: one
    * fixed-seed MLlib k-means per subspace learns k entries from the
    * actual subvector distribution (m small jobs over w-dim slices;
    * at 100 TB train on a sample, exactly like the other trained
    * quantizers here). Same encoder, same ADC search; measured recall
    * improves substantially over the deterministic seed codebooks
    * (OperatorsSpec pins the ordering).
    */
  def buildPqTrained(emb: DataFrame, idCol: String = "vec_id",
                     vecCol: String = "embedding",
                     m: Int = 8, k: Int = 16, seed: Long = 42): PqIndex = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val v = Dedup.prepVecs(emb, idCol, vecCol).cache()
    val d = v.select(size(col("vec"))).head().getInt(0)
    require(d % m == 0, s"dim $d not divisible into $m subspaces")
    val subDim = d / m
    val codebooks = Array.tabulate(m) { s =>
      val sub = v.withColumn("features",
        array_to_vector(slice(col("vec"), s * subDim + 1, subDim)))
      new KMeans().setK(k).setMaxIter(5).setSeed(seed)
        .setFeaturesCol("features").fit(sub)
        .clusterCenters.map(_.toArray)
    }
    val codes = v.select(col("vid").as(idCol),
        explode(org.apache.spark.sql.GraftBridge.pqEncode(
          col("vec"), codebooks, subDim)).as("_e"))
      .select(col(idCol), col("_e.subspace").as("subspace"),
        col("_e.code").as("code"), col("_e.dist").as("dist"))
    v.unpersist()
    new PqIndex(codes, codebooks, subDim, idCol)
  }

  /** Asymmetric-distance (ADC) search over PQ codes — the PQ trick: a
    * probe pays d·k multiply-adds ONCE to build its (subspace, code) →
    * exact-squared-distance table; every corpus vector then costs m table
    * lookups + adds instead of d multiplies, and never needs its raw
    * floats again.
    */
  class PqIndex private[operators] (
      /** Coded corpus: (id, subspace, code, dist). */
      val codes: DataFrame,
      /** codebooks(s)(c) = the subspace-s vector of code c. */
      val codebooks: Array[Array[Array[Double]]],
      subDim: Int, idCol: String) {

    /** Approximate top-k nearest corpus vectors per probe:
      * (probe_id, neighbor_id, approx_dist, rank) — approx_dist =
      * Σ_s exactDist(probe_s, codebook[s][code_s]), ties by neighbor id.
      *
      * Scale shape: the probe table is m·k rows PER PROBE (a query batch
      * — broadcast); the join against codes is map-side, the only
      * shuffle is the (probe, vector) sum — m rows in per vector.
      */
    def topK(probes: DataFrame, kNN: Int,
             probeIdCol: String = "vec_id",
             probeVecCol: String = "embedding"): DataFrame = {
      val spark = codes.sparkSession
      import spark.implicits._
      val pv = probes.select(col(probeIdCol).cast("long").as("probe_id"),
          transform(col(probeVecCol), x => x.cast("double")).as("_p"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      val table = for {
        (pid, p) <- pv.toSeq
        s <- codebooks.indices
        (ctr, c) <- codebooks(s).zipWithIndex
      } yield {
        var dist = 0.0
        var j = 0
        while (j < ctr.length) {
          val off = s * subDim + j
          val x = if (off < p.length) p(off) else 0.0
          val diff = x - ctr(j)
          dist += diff * diff
          j += 1
        }
        (pid, s, c, dist)
      }
      val t = broadcast(table.toDF("probe_id", "subspace", "code", "pd"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("probe_id")).orderBy(col("approx_dist"), col("neighbor_id"))
      // round BEFORE ranking: the m-term shuffle sum merges partials in
      // arrival order, so last-ulp values can differ across runs — every
      // ranking in this operator family pins determinism by rounding first
      codes.join(t, Seq("subspace", "code"))
        .groupBy(col("probe_id"), col(idCol).as("neighbor_id"))
        .agg(round(sum(col("pd")), 6).as("approx_dist"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= kNN)
    }
  }
}
