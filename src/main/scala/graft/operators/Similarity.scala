package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Baseline: brute-force cosine top-k (broadcast the probe set, scan the
  * corpus once — at 100 TB this is one map-side pass per probe batch, no
  * shuffle until the per-probe top-k aggregation, which TakeOrdered keeps
  * tiny). Scale path: sign-random-projection LSH bucketing that prunes the
  * candidate set before exact scoring.
  *
  * Dot products use `zip_with` + `aggregate` (sequential left fold) over
  * doubles — bitwise-deterministic and engine-reproducible.
  */
object Similarity {

  /** Sequential-fold dot product of two double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Brute-force cosine top-k: for each probe vector, the k nearest corpus
    * vectors (excluding itself). The probe side is broadcast — the corpus
    * is scanned exactly once regardless of probe count.
    */
  def bruteForceTopK(corpus: DataFrame, probes: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("_cv"))
    val p = probes.select(col(idCol).as("probe_id"), asDouble(col(vecCol)).as("_pv"))
    val scored = c.join(broadcast(p), col("probe_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("_pv"), col("_cv")))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .select(col("probe_id"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"), col("_rn").cast("int").as("rank"))
  }

  /** Deterministic pseudo-random hyperplanes for sign-LSH (fixed LCG seed —
    * reproducible across runs; components in [-1, 1)).
    */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 7L): Array[Array[Double]] = {
    var s = seed
    def next(): Double = {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0
    }
    Array.fill(nPlanes)(Array.fill(dim)(next()))
  }

  /** Sign-random-projection bucket id: one bit per hyperplane. */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val planeCol = array(p.map(lit(_)): _*)
      when(dot(vec, planeCol) > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** LSH-bucketed ANN: candidates share a bucket with the probe (plus, for
    * recall, buckets at hamming distance 1 — probe-side fanout only), then
    * exact cosine + top-k within candidates. Trades recall for a candidate
    * set ~n/2^bits per bucket; at 100 TB the bucket id doubles as the
    * partition key so each probe touches a few partitions, not the corpus.
    */
  def lshTopK(corpus: DataFrame, probes: DataFrame, k: Int,
              nPlanes: Int = 8, dim: Int = 64,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val planes = hyperplanes(nPlanes, dim)
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("_cv"))
      .withColumn("bucket", lshBucket(col("_cv"), planes))
    val p0 = probes.select(col(idCol).as("probe_id"), asDouble(col(vecCol)).as("_pv"))
      .withColumn("bucket", lshBucket(col("_pv"), planes))
    // probe-side fanout to hamming<=1 neighbor buckets
    val fan = p0.withColumn("bucket",
      explode(array((lit(0L) +: (0 until nPlanes).map(i => shiftleft(lit(1L), i)))
        .map(m => col("bucket").bitwiseXOR(m)): _*)))
    val scored = c.join(broadcast(fan), Seq("bucket"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("_pv"), col("_cv")))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .select(col("probe_id"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"), col("_rn").cast("int").as("rank"))
  }
}
