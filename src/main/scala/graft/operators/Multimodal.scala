package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata alongside. The Spark-side contract —
  * schema, partition-preserving batch iteration, output shape — is real;
  * the actual codec call is STUBBED (media libraries are not available in
  * this environment) behind the [[Multimodal.MediaCodec]] trait, whose
  * default [[Multimodal.StubCodec]] instance a deployment replaces with a
  * JNI/external-process decoder without touching the plan.
  *
  * Scale notes: decode runs per-partition (`mapPartitions`), so codec
  * initialization amortizes across a partition's rows exactly like a Pandas
  * UDF batch; binary columns should be stored in their own parquet column
  * chunk so metadata-only queries never read the bytes (column pruning).
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])
  case class MediaMeta(doc_id: Long, media_type: String, byte_len: Long,
                       width: Int, height: Int, n_frames: Int, sha: String)

  /** Decoded media dimensions — what a codec extracts from one payload. */
  case class Decoded(width: Int, height: Int, nFrames: Int)

  /** The codec boundary: a deployment swaps a real decoder (JNI,
    * external process, ...) in as a constructor argument / DI binding
    * WITHOUT touching the operator or the plan. Implementations are
    * shipped to executors (Serializable) and [[MediaCodec.init]] runs
    * once per partition, so per-codec setup (native lib load, process
    * spawn) amortizes across the partition's rows exactly like a
    * Pandas-UDF batch.
    */
  trait MediaCodec extends Serializable {
    /** Once-per-partition setup hook; default no-op. */
    def init(): Unit = ()
    def decode(payload: Array[Byte], mediaType: String): Decoded
  }

  /** STUB decoder (default): deterministic fake metadata derived from
    * the payload bytes — media libraries are not available in this
    * environment, so the decode itself is the one declared stub in the
    * engine; everything around it (schema, partition-preserving batch
    * iteration, output shape) is real and tested.
    */
  object StubCodec extends MediaCodec {
    def decode(payload: Array[Byte], mediaType: String): Decoded = {
      val n = payload.length
      mediaType match {
        case "image" => Decoded(320 + n % 320, 240 + n % 240, 1)
        case "video" => Decoded(640, 360, 1 + n % 300)
        case _       => Decoded(0, 0, 1 + n % 9000)
      }
    }
  }

  /** Batch feature extraction over binary payloads. Partition-preserving;
    * no shuffle. The codec defaults to the [[StubCodec]] boundary.
    */
  def extractMeta(media: Dataset[MediaRow],
                  codec: MediaCodec = StubCodec): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      codec.init() // per-partition codec setup (amortized like a Pandas-UDF batch)
      val digest = java.security.MessageDigest.getInstance("SHA-256")
      it.map { r =>
        val d = codec.decode(r.payload, r.media_type)
        val sha = digest.digest(r.payload).map("%02x".format(_)).mkString
        MediaMeta(r.doc_id, r.media_type, r.payload.length.toLong,
          d.width, d.height, d.nFrames, sha)
      }
    }
  }

  /** Frame-sampling plumbing: every k-th frame index, exploded — shape of a
    * video->frames fanout without a real decoder.
    */
  def sampleFrames(meta: DataFrame, every: Int): DataFrame =
    meta.filter(col("n_frames") > 1)
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(every))))
      .select("doc_id", "media_type", "frame_idx")

  /** Exact binary dedup: group identical payloads by content hash, keep
    * the smallest id — the media twin of text `Dedup.exact` (re-uploads
    * and mirror copies dominate crawled media corpora). Hashing is
    * map-side; the groupBy shuffles only (hash, id) pairs, never the
    * payload bytes — at 100 TB that is the difference between shuffling
    * 32-byte digests and shuffling the corpus.
    */
  def dedupBinary(media: DataFrame, payloadCol: String = "payload",
                  idCol: String = "doc_id"): DataFrame =
    media
      .select(col(idCol), sha2(col(payloadCol), 256).as("content_sha"))
      .groupBy(col("content_sha"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Build a synthetic media table from the documents table (text bytes as
    * payload) — exercises the plumbing on driver test data.
    */
  def fromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }
}
