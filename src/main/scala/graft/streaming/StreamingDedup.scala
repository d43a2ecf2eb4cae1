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

  /** SemDeDup on the ingest path — a `foreachBatch` sink: each arriving
    * micro-batch is judged against the accumulated corpus with
    * [[graft.operators.Dedup.semanticDedupIncremental]] (the first batch
    * with [[graft.operators.Dedup.semanticDedup]]), keep flags land in
    * `resultDir`, and the batch's vectors (kept AND dropped — the
    * contract judges against all prior arrivals) append to the corpus
    * store.
    *
    * Similarity has no equality key, so
    * `dropDuplicatesWithinWatermark` cannot express this; the corpus
    * store IS the state, unbounded by design (it's the curated dataset
    * itself, not an eviction cache).
    *
    * Exactly-once: both writes are per-batch-directory overwrites
    * (`batch_id=N`), and the corpus read excludes partitions >= the
    * current batch id — a crash-replayed batch re-judges against exactly
    * the pre-crash corpus and overwrites its own partitions. Idempotent.
    *
    * With ids that grow over time (blockchain/ingest order), the seed set
    * (the corpus's k smallest ids) freezes after the first batch, so
    * assignment is stable across the stream and the folded result equals
    * the one-shot batch dedup — the OperatorsSpec sequential-equivalence
    * property.
    */
  /** MinHash-LSH near-dup detection on the ingest path — a
    * `foreachBatch` sink over [[graft.operators.Dedup.NearDupIndex]]:
    * each arriving micro-batch is shingled/signed ONCE (one
    * batch-proportional pass), judged for near-dup pairs WITHIN itself
    * (`selfPairs`) and AGAINST the accumulated corpus (`pairsWith`), and
    * its arrays/buckets — a pure function of the batch — append to the
    * corpus store. Later batches therefore never re-shingle the corpus:
    * the corpus side of every bucket join is a plain parquet read, the
    * production incremental-LSH lifecycle (at 100 TB the store is
    * partitioned by band like [[graft.operators.Dedup.NearDupIndex.save]]).
    *
    * Pair contract: (doc_a < doc_b, exact-verified jaccard) — cross
    * pairs are normalized with least/greatest so the folded result is
    * id-order-agnostic. With batches arriving in id order the folded
    * results equal the one-shot [[graft.operators.Dedup.minhashLshPairs]]
    * over the union EXACTLY (not just probabilistically: a doc's
    * signature depends only on the doc, so one-shot and incremental see
    * identical band-bucket candidates) — the StreamingSpec
    * sequential-equivalence property.
    *
    * Exactly-once: all three writes (pairs result, arrays part, buckets
    * part) are per-batch-directory overwrites, and the corpus read lists
    * only _SUCCESS-committed parts with batch id < the current one — a
    * crash-replayed batch re-judges against exactly the pre-crash corpus
    * and overwrites its own directories. Empty batches are a no-op
    * (same guard as [[semanticBatchSink]]).
    */
  def nearDupBatchSink(corpusDir: String, resultDir: String,
                       textCol: String, idCol: String,
                       w: Int = 3, numPerm: Int = 128, bands: Int = 32,
                       threshold: Double = 0.8): (DataFrame, Long) => Unit =
    (batchDf, batchId) => {
      val spark = batchDf.sparkSession
      import org.apache.hadoop.fs.Path
      val fs = new Path(corpusDir).getFileSystem(spark.sessionState.newHadoopConf())
      def committed(sub: String): Seq[String] = {
        val p = new Path(corpusDir, sub)
        if (!fs.exists(p)) Seq.empty
        else fs.listStatus(p).toSeq
          .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch_id="))
          .filter(_.getPath.getName.stripPrefix("batch_id=")
            .toLongOption.exists(_ < batchId))
          .filter(s => fs.exists(new Path(s.getPath, "_SUCCESS")))
          .map(_.getPath.toString)
      }
      try if (!batchDf.isEmpty) {
        val parts = graft.operators.Dedup.buildNearDupIndex(
          batchDf.select(col(idCol), col(textCol)), textCol, idCol,
          w, numPerm, bands, cache = false)
        val within = parts.selfPairs(threshold)
        // a batch part is committed only when BOTH its arrays and buckets
        // dirs carry _SUCCESS (they are written back to back; the
        // intersection guards the never-expected half-written stray)
        val aParts = committed("arrays")
        val bByBatch = committed("buckets")
          .map(p => p.substring(p.lastIndexOf("batch_id=")) -> p).toMap
        val pairedParts = aParts.flatMap(a =>
          bByBatch.get(a.substring(a.lastIndexOf("batch_id="))).map(a -> _))
        val pairs =
          if (pairedParts.isEmpty) within
          else {
            val corpus = graft.operators.Dedup.nearDupIndexFromParts(
              spark.read.parquet(pairedParts.map(_._1): _*),
              spark.read.parquet(pairedParts.map(_._2): _*), w, numPerm, bands)
            val cross = corpus.pairsWith(parts, threshold)
              .filter(col("doc_a") =!= col("doc_b"))
              .select(least(col("doc_a"), col("doc_b")).as("doc_a"),
                greatest(col("doc_a"), col("doc_b")).as("doc_b"), col("jaccard"))
            within.unionByName(cross)
          }
        pairs.write.mode("overwrite").parquet(s"$resultDir/batch_id=$batchId")
        parts.arrays.write.mode("overwrite")
          .parquet(s"$corpusDir/arrays/batch_id=$batchId")
        parts.buckets.write.mode("overwrite")
          .parquet(s"$corpusDir/buckets/batch_id=$batchId")
      } finally graft.core.CacheScope.release()
    }

  def semanticBatchSink(corpusDir: String, resultDir: String,
                        idCol: String, vecCol: String,
                        k: Int = 32, threshold: Double = 0.35)
      : (DataFrame, Long) => Unit = (batchDf, batchId) => {
    val spark = batchDf.sparkSession
    import org.apache.hadoop.fs.Path
    val root = new Path(corpusDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    // COMMITTED prior batches only, by explicit directory list: a crash
    // mid corpus write can leave corpusDir existing with zero committed
    // files (just a _temporary dir), where a bare read of the root would
    // throw "unable to infer schema" on every replay — wedging the
    // stream. The _SUCCESS check is the commit marker; listing also makes
    // the < batchId exclusion structural instead of a partition filter.
    val committed =
      if (!fs.exists(root)) Seq.empty
      else fs.listStatus(root).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch_id="))
        .filter(_.getPath.getName.stripPrefix("batch_id=")
          .toLongOption.exists(_ < batchId))
        .filter(s => fs.exists(new Path(s.getPath, "_SUCCESS")))
        .map(_.getPath.toString)
    // Empty micro-batch guard: Spark can hand foreachBatch an empty
    // DataFrame (replay of a fully-committed offset range, no-new-data
    // triggers with availableNow). An empty batch has no rows to judge
    // and would otherwise crash the stream on the seed-selection
    // require(seeds.nonEmpty) inside semanticDedup — writing nothing is
    // the correct (and idempotent) outcome: no result partition, no
    // corpus partition, and the _SUCCESS-committed listing already
    // tolerates the gap in batch ids.
    try if (!batchDf.isEmpty) {
      val judged =
        if (committed.nonEmpty) graft.operators.Dedup.semanticDedupIncremental(
          batchDf, spark.read.parquet(committed: _*).select(col(idCol), col(vecCol)),
          idCol, vecCol, k, threshold)
        else graft.operators.Dedup
          .semanticDedup(batchDf, idCol, vecCol, k, threshold)
      judged.write.mode("overwrite").parquet(s"$resultDir/batch_id=$batchId")
      batchDf.select(col(idCol), col(vecCol))
        .write.mode("overwrite").parquet(s"$corpusDir/batch_id=$batchId")
    } finally graft.core.CacheScope.release()
  }

  /** Roll a [[nearDupBatchSink]] store pair back to batches BELOW
    * `fromBatch` — the corpus-store counterpart of
    * [[PlugRunner.truncateFromBatch]] for a past-horizon fork. Replay
    * alone is NOT enough after a fork that yields FEWER batches: stale
    * `batch_id=N` dirs above the corrected feed's high-water mark stay
    * _SUCCESS-committed and would pollute the corpus reads of every
    * later batch. Call this alongside the plug-table truncation, then
    * replay the corrected feed from `fromBatch` (with its checkpoint
    * rewound or recreated — the sinks themselves are idempotent per
    * batch id).
    *
    * Crash-safe and idempotent: each doomed dir loses its _SUCCESS
    * marker FIRST — readers exclude it from that instant — and the
    * recursive delete after is pure GC (same order as the append-table
    * truncation in PlugRunner).
    */
  def truncateNearDupFrom(spark: org.apache.spark.sql.SparkSession,
                          corpusDir: String, resultDir: String,
                          fromBatch: Long): Unit =
    truncateBatchDirsFrom(spark, fromBatch,
      Seq(s"$corpusDir/arrays", s"$corpusDir/buckets", resultDir))

  /** [[truncateNearDupFrom]] for a [[semanticBatchSink]] store pair. */
  def truncateSemanticFrom(spark: org.apache.spark.sql.SparkSession,
                           corpusDir: String, resultDir: String,
                           fromBatch: Long): Unit =
    truncateBatchDirsFrom(spark, fromBatch, Seq(corpusDir, resultDir))

  private def truncateBatchDirsFrom(spark: org.apache.spark.sql.SparkSession,
                                    fromBatch: Long, roots: Seq[String]): Unit = {
    import org.apache.hadoop.fs.Path
    roots.foreach { rootStr =>
      val root = new Path(rootStr)
      val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(root))
        fs.listStatus(root).toSeq
          .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch_id="))
          .filter(_.getPath.getName.stripPrefix("batch_id=")
            .toLongOption.exists(_ >= fromBatch))
          .foreach { s =>
            fs.delete(new Path(s.getPath, "_SUCCESS"), false)
            fs.delete(s.getPath, true)
          }
    }
  }
}
