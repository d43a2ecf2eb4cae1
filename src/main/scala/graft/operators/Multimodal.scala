package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata alongside. The Spark-side contract —
  * schema, partition-preserving batch iteration, output shape — is real;
  * decode goes through the [[Multimodal.MediaCodec]] trait. The default
  * [[Multimodal.HeaderCodec]] REALLY decodes image dimensions (PNG/GIF/
  * JPEG headers) and WAV audio duration/sample-rate (RIFF chunks), all
  * pure JVM byte reads, and falls back to the deterministic
  * [[Multimodal.StubCodec]] for video and unrecognized payloads
  * (full media libraries are not available in this environment); a
  * deployment swaps in a JNI/external-process decoder through the same
  * trait without touching the plan.
  *
  * Scale notes: decode runs per-partition (`mapPartitions`), so codec
  * initialization amortizes across a partition's rows exactly like a Pandas
  * UDF batch; binary columns should be stored in their own parquet column
  * chunk so metadata-only queries never read the bytes (column pruning).
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])
  case class MediaMeta(doc_id: Long, media_type: String, byte_len: Long,
                       width: Int, height: Int, n_frames: Int,
                       sample_rate: Int, duration_ms: Long, sha: String)

  /** Decoded media dimensions — what a codec extracts from one payload.
    * For audio, `nFrames` counts sample frames, `sampleRate` is Hz and
    * `durationMs` = nFrames * 1000 / sampleRate; both default to 0 for
    * visual media so image-only codecs ignore them.
    */
  case class Decoded(width: Int, height: Int, nFrames: Int,
                     sampleRate: Int = 0, durationMs: Long = 0L)

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

  /** STUB decoder: deterministic fake metadata derived from the payload
    * bytes — [[HeaderCodec]]'s fallback for non-image / unrecognized
    * payloads (full media libraries are not available in this
    * environment), and the explicit codec of the oracle-gated queries,
    * whose DuckDB oracle replicates exactly this arithmetic. Everything
    * around it (schema, partition-preserving batch iteration, output
    * shape) is real and tested.
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

  /** Real media-header decode in pure JVM byte reads — no media
    * libraries: PNG (IHDR), GIF (logical screen descriptor) and JPEG
    * (SOF0-SOF15 scan) carry width/height in their headers, and WAV
    * (RIFF fmt/data chunks) carries sample rate + frame count, so
    * "decode" for the metadata contract needs no codec library at all.
    * Payloads that are not a recognized format (video, and the synthetic
    * text-byte fixtures) fall back to [[StubCodec]]'s deterministic
    * fake — which keeps this safe as the DEFAULT codec: the stubbed
    * families behave exactly as before, real headers get real metadata.
    */
  object HeaderCodec extends MediaCodec {
    private def u16be(b: Array[Byte], i: Int): Int =
      ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)
    private def u16le(b: Array[Byte], i: Int): Int =
      ((b(i + 1) & 0xFF) << 8) | (b(i) & 0xFF)
    private def u32be(b: Array[Byte], i: Int): Int =
      ((b(i) & 0xFF) << 24) | ((b(i + 1) & 0xFF) << 16) |
        ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)
    private def u32le(b: Array[Byte], i: Int): Long =
      (((b(i + 3) & 0xFF) << 24) | ((b(i + 2) & 0xFF) << 16) |
        ((b(i + 1) & 0xFF) << 8) | (b(i) & 0xFF)) & 0xFFFFFFFFL

    /** Positive-dimension guard: a structurally-valid-looking header
      * with zero or sign-bit-set dimensions (malformed per every spec,
      * trivially present in crawled bytes) must fall back to the stub,
      * never emit negative/zero metadata.
      */
    private def validated(w: Int, h: Int): Option[(Int, Int)] =
      if (w > 0 && h > 0) Some((w, h)) else None

    /** (width, height) if the payload is a recognizable PNG/GIF/JPEG. */
    private[operators] def imageDims(b: Array[Byte]): Option[(Int, Int)] = {
      // PNG: 8-byte signature, IHDR chunk fixed at offset 8 (len+type),
      // width/height big-endian at 16/20
      if (b.length >= 24 && (b(0) & 0xFF) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
          b(3) == 'G' && b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
        validated(u32be(b, 16), u32be(b, 20))
      // GIF87a/GIF89a: logical screen w/h little-endian at 6/8
      else if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
          b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a')
        validated(u16le(b, 6), u16le(b, 8))
      // JPEG: SOI then marker scan for a start-of-frame (C0-CF minus the
      // non-frame C4/C8/CC); height/width big-endian at +5/+7 from marker
      else if (b.length >= 4 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8) {
        var i = 2
        while (i + 1 < b.length && (b(i) & 0xFF) == 0xFF) {
          val m = b(i + 1) & 0xFF
          if (m == 0xFF) i += 1 // fill byte (spec-legal padding) — not a marker
          else if (m == 0x00) return None // byte-stuffed 0xFF00: we're inside entropy-coded data
          else if (m == 0xDA) return None // SOS with no prior SOF: stop before entropy-coded data
          else if (m == 0x01 || (m >= 0xD0 && m <= 0xD9)) i += 2 // TEM/RST/SOI/EOI: length-less
          else if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC)
            return if (i + 9 <= b.length) validated(u16be(b, i + 7), u16be(b, i + 5))
                   else None
          else if (i + 4 <= b.length) i += 2 + u16be(b, i + 2)
          else return None
        }
        None
      } else None
    }

    /** (sampleRate, sampleFrames) if the payload is a RIFF/WAVE file.
      * Same pure-JVM header-read trick as the image branches: the fmt
      * chunk carries sample rate + block align, the data chunk's declared
      * size divided by block align is the sample-frame count (duration =
      * frames / rate). Chunk walk honors the RIFF word-alignment pad byte
      * and bails on any size that walks past the buffer arithmetic.
      */
    private[operators] def wavMeta(b: Array[Byte]): Option[(Int, Long)] = {
      if (b.length < 12 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' ||
          b(3) != 'F' || b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E')
        return None
      var i = 12L
      var sampleRate = 0; var blockAlign = 0; var dataLen = -1L
      while (i + 8 <= b.length && (sampleRate == 0 || dataLen < 0)) {
        val p = i.toInt
        val sz = u32le(b, p + 4)
        if (b(p) == 'f' && b(p + 1) == 'm' && b(p + 2) == 't' && b(p + 3) == ' ') {
          if (sz < 16 || p + 24 > b.length) return None
          sampleRate = u32le(b, p + 12).toInt // fmt data +4
          blockAlign = u16le(b, p + 20)       // fmt data +12
        } else if (b(p) == 'd' && b(p + 1) == 'a' && b(p + 2) == 't' && b(p + 3) == 'a')
          dataLen = sz // declared size: header-only fixtures may truncate the bytes
        i += 8 + sz + (sz & 1) // chunks are word-aligned
      }
      if (sampleRate > 0 && blockAlign > 0 && dataLen >= 0)
        Some((sampleRate, dataLen / blockAlign))
      else None
    }

    private def u64be(b: Array[Byte], i: Int): Long = {
      var v = 0L
      var k = 0
      while (k < 8) { v = (v << 8) | (b(i + k) & 0xFFL); k += 1 }
      v
    }
    private def box4(b: Array[Byte], i: Int, t: String): Boolean =
      b(i) == t(0).toByte && b(i + 1) == t(1).toByte &&
        b(i + 2) == t(2).toByte && b(i + 3) == t(3).toByte

    /** (width, height, durationMs) if the payload is an ISO BMFF (MP4/MOV)
      * file with a `moov`/`mvhd` — the same pure-JVM byte walk as
      * [[wavMeta]], over big-endian boxes instead of little-endian RIFF
      * chunks. Duration comes from mvhd (duration / timescale, version 0
      * and 1 layouts both handled); width/height from the first `trak`'s
      * `tkhd` 16.16 fixed-point fields when present, else 0. Box sizes
      * are attacker-controlled: the walk carries them in Long arithmetic,
      * bails on any size that escapes the buffer or regresses (size < 8;
      * 64-bit largesize boxes are out of scope and bail), and — as with
      * WAV — nothing length-declared ever becomes a row fanout: n_frames
      * stays 1.
      */
    private[operators] def mp4Meta(b: Array[Byte]): Option[(Int, Int, Long)] = {
      // ISO BMFF files start with a box; require the conventional ftyp
      // leader so arbitrary text bytes can't alias (box sizes are
      // unconstrained ints, so the structure alone is weak evidence)
      if (b.length < 16 || !box4(b, 4, "ftyp")) return None
      var durationMs = -1L
      var w = 0; var h = 0
      var i = 0L
      while (i + 8 <= b.length && durationMs < 0) {
        val p = i.toInt
        val size = (((b(p) & 0xFFL) << 24) | ((b(p + 1) & 0xFFL) << 16) |
          ((b(p + 2) & 0xFFL) << 8) | (b(p + 3) & 0xFFL))
        // strict: a declared size that escapes the buffer (or regresses)
        // is malformed — bail to the stub rather than trusting any field
        // of a structure that already lied about its extent
        if (size < 8 || i + size > b.length) return None
        if (box4(b, p + 4, "moov")) {
          val end = i + size
          var j = i + 8
          while (j + 8 <= end) {
            val q = j.toInt
            val csz = (((b(q) & 0xFFL) << 24) | ((b(q + 1) & 0xFFL) << 16) |
              ((b(q + 2) & 0xFFL) << 8) | (b(q + 3) & 0xFFL))
            if (csz < 8) return None
            if (box4(b, q + 4, "mvhd") && j + csz <= end) {
              val v = b(q + 8) & 0xFF
              if (v == 0 && q + 32 <= b.length) {
                val ts = u32be(b, q + 20) & 0xFFFFFFFFL
                val dur = u32be(b, q + 24) & 0xFFFFFFFFL
                if (ts > 0) durationMs = dur * 1000L / ts
              } else if (v == 1 && q + 44 <= b.length) {
                val ts = u32be(b, q + 28) & 0xFFFFFFFFL
                val dur = u64be(b, q + 32)
                if (ts > 0 && dur >= 0) durationMs = dur * 1000L / ts
              }
              if (durationMs < 0) return None
            } else if (box4(b, q + 4, "trak") && w == 0) {
              // first trak's tkhd carries presentation w/h as 16.16 fixed
              val tend = math.min(j + csz, end)
              var t = j + 8
              while (t + 8 <= tend && w == 0) {
                val r = t.toInt
                val tsz = (((b(r) & 0xFFL) << 24) | ((b(r + 1) & 0xFFL) << 16) |
                  ((b(r + 2) & 0xFFL) << 8) | (b(r + 3) & 0xFFL))
                if (tsz < 8) return None
                if (box4(b, r + 4, "tkhd") && t + tsz <= tend) {
                  val tv = b(r + 8) & 0xFF
                  val wOff = if (tv == 1) r + 96 else r + 84
                  if (wOff + 8 <= b.length) {
                    val pw = u16be(b, wOff)      // integer part of 16.16
                    val ph = u16be(b, wOff + 4)
                    if (pw > 0 && ph > 0) { w = pw; h = ph }
                  }
                }
                t += tsz
              }
            }
            j += csz
          }
          if (durationMs < 0) return None // moov without a readable mvhd
        }
        i += size
      }
      if (durationMs >= 0) Some((w, h, durationMs)) else None
    }

    def decode(payload: Array[Byte], mediaType: String): Decoded =
      if (mediaType == "image")
        imageDims(payload).map { case (w, h) => Decoded(w, h, 1) }
          .getOrElse(StubCodec.decode(payload, mediaType))
      else if (mediaType == "audio")
        // audio decodes to duration/sample-rate, NEVER a frame count:
        // n_frames is the VISUAL fanout knob (sampleFrames explodes it),
        // and a declared data-chunk length is attacker-controlled — a
        // 100-byte payload claiming 2^32 bytes of samples must not turn
        // into a 2-billion-element frame explode downstream
        wavMeta(payload).map { case (rate, frames) =>
          Decoded(0, 0, 1, sampleRate = rate, durationMs = frames * 1000L / rate)
        }.getOrElse(StubCodec.decode(payload, mediaType))
      else if (mediaType == "video")
        // same fanout discipline as audio: a parsed MP4 keeps n_frames=1
        // (mvhd carries duration, not a frame count — and a declared
        // count would be attacker-controlled anyway)
        mp4Meta(payload).map { case (w, h, ms) =>
          Decoded(w, h, 1, durationMs = ms)
        }.getOrElse(StubCodec.decode(payload, mediaType))
      else StubCodec.decode(payload, mediaType)
  }

  /** Batch feature extraction over binary payloads. Partition-preserving;
    * no shuffle. The codec defaults to [[HeaderCodec]]: real header
    * decode for images, the deterministic stub for everything else.
    */
  def extractMeta(media: Dataset[MediaRow],
                  codec: MediaCodec = HeaderCodec): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    // spread: decode + SHA-256 are CPU-bound per row; widen a
    // single-split source before the partition-wise pass
    graft.core.Spread.ensureParallel(media.toDF).as[MediaRow].mapPartitions { it =>
      codec.init() // per-partition codec setup (amortized like a Pandas-UDF batch)
      val digest = java.security.MessageDigest.getInstance("SHA-256")
      it.map { r =>
        val d = codec.decode(r.payload, r.media_type)
        val sha = digest.digest(r.payload).map("%02x".format(_)).mkString
        MediaMeta(r.doc_id, r.media_type, r.payload.length.toLong,
          d.width, d.height, d.nFrames, d.sampleRate, d.durationMs, sha)
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
    graft.core.Spread.ensureParallel(media)
      .select(col(idCol), sha2(col(payloadCol), 256).as("content_sha"))
      .groupBy(col("content_sha"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  // uppercase hex on both sides: Spark `hex` and DuckDB `to_hex` agree
  private def le32(c: Column): Column = {
    val h = lpad(hex(c), 8, "0")
    concat(substring(h, 7, 2), substring(h, 5, 2), substring(h, 3, 2), substring(h, 1, 2))
  }
  private def le16(c: Column): Column = {
    val h = lpad(hex(c), 4, "0")
    concat(substring(h, 3, 2), substring(h, 1, 2))
  }

  /** Hex of a VALID 44-byte RIFF/WAVE header whose parameters
    * derive deterministically from `docId`: channels = 1 + id%2, sample
    * rate = 8000 * (1 + id%3), sample frames = 100 + id%900, 16-bit PCM;
    * the data chunk declares its size but carries no bytes (the codec
    * reads declared sizes — truncated fixtures are the documented
    * contract, [[HeaderCodec.wavMeta]]). Exists so the REAL header
    * parser can sit under an arithmetic DuckDB oracle: the oracle
    * rebuilds this hex string and the expected metadata independently,
    * so a parse defect (endianness, chunk offset, block-align math) or a
    * synthesis divergence both fail the gate.
    */
  def wavHex(docId: Column): Column = {
    val ch = lit(1) + docId % 2
    val rate = lit(8000) * (lit(1) + docId % 3)
    val frames = lit(100) + docId % 900
    val ba = ch * 2
    val dlen = frames * ba
    val brate = rate * ba
    concat(
      lit("52494646"), le32(lit(36) + dlen), // "RIFF" + riff size
      lit("57415645666d742010000000"), // "WAVE" + "fmt " + fmt size 16
      lit("0100"), le16(ch), le32(rate), le32(brate), le16(ba),
      lit("1000"), // 16 bits/sample
      lit("64617461"), le32(dlen)) // "data" + declared size
  }

  /** The binary payload for [[wavHex]] — what the codec actually parses. */
  def syntheticWav(docId: Column): Column = unhex(wavHex(docId))

  private def be32(c: Column): Column = lpad(hex(c), 8, "0")
  // 16.16 fixed-point with a zero fractional part (tkhd width/height)
  private def fixed1616(c: Column): Column = concat(lpad(hex(c), 4, "0"), lit("0000"))

  /** Hex of a VALID 232-byte ISO BMFF file (`ftyp` + `moov`(`mvhd` +
    * `trak`(`tkhd`))) whose parameters derive deterministically from
    * `docId`: timescale = 600 + 200*(id%5), duration ticks =
    * timescale*(1 + id%30) + id%7 (so the ms conversion exercises
    * truncation), width = 320*(1 + id%4), height = 240*(1 + id%3).
    * Same purpose as [[wavHex]]: the REAL MP4 box walk sits under an
    * arithmetic DuckDB oracle that rebuilds the bytes and the expected
    * metadata independently, so a parse defect (box offsets, version
    * layout, fixed-point split) or a synthesis divergence both fail.
    */
  def mp4Hex(docId: Column): Column = {
    val ts = lit(600) + (docId % 5) * 200
    val dur = ts * (lit(1) + docId % 30) + docId % 7
    val w = lit(320) * (lit(1) + docId % 4)
    val h = lit(240) * (lit(1) + docId % 3)
    val matrix = "000100000000000000000000000000000001000000000000000000000000000040000000"
    concat(
      lit("0000001066747970" + "69736f6d" + "00000000"), // ftyp isom
      lit("000000d8" + "6d6f6f76"), // moov, size 216
      lit("0000006c" + "6d766864" + "00000000" + "00000000" + "00000000"), // mvhd v0
      be32(ts), be32(dur),
      lit("00010000" + "01000000" + "0000000000000000" + matrix +
        "000000000000000000000000000000000000000000000000" + "00000002"),
      lit("00000064" + "7472616b"), // trak, size 100
      lit("0000005c" + "746b6864" + "00000007" + "00000000" + "00000000" +
        "00000001" + "00000000"), // tkhd v0, track 1
      be32(dur),
      lit("0000000000000000" + "00000000" + "00000000" + matrix),
      fixed1616(w), fixed1616(h))
  }

  /** The binary payload for [[mp4Hex]] — what the codec actually parses. */
  def syntheticMp4(docId: Column): Column = unhex(mp4Hex(docId))

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

  // ------------------------------------------------------------ media store

  /** Write a media table in the split storage layout: typed metadata and
    * the opaque payload bytes land in SEPARATE parquet datasets.
    *
    * Why split, at 100 TB: payload bytes dominate the footprint by 2-4
    * orders of magnitude. Stored as one table, every metadata-only scan
    * plans over files whose row groups are megabytes of binary per row —
    * column pruning skips the payload CHUNKS, but file sizing, row-group
    * geometry, footer stats, and scan split planning are all dictated by
    * the binary column, and any row-shaped consumer (shuffle of the full
    * row, cache, UDF batch) drags the bytes along. Split, the meta
    * dataset is a normal thin analytic table (hot: filters, joins,
    * aggregations), and the payload dataset is touched only by the
    * decode/fetch paths that actually need bytes.
    *
    * Payload layout: range-partitioned and sorted by id, written with
    * small row groups (`payloadRowGroupBytes`) so a point fetch prunes by
    * parquet min/max id stats to a handful of row groups instead of
    * decompressing monster groups for one row. The meta side carries
    * (byte_len, sha) so integrity checks and size accounting never read
    * payloads.
    */
  def writeMediaStore(media: Dataset[MediaRow], dir: String,
                      payloadRowGroupBytes: Long = 8L << 20): Unit = {
    // two independent map-only passes over the source, deliberately NOT
    // cached: caching would persist exactly the payload bytes this layout
    // exists to keep out of hot storage — at the stated scale re-reading
    // the source is cheaper than materializing it twice
    val df = media.toDF()
    df.select(col("doc_id"), col("media_type"),
        length(col("payload")).cast("long").as("byte_len"),
        sha2(col("payload"), 256).as("sha"))
      .write.mode("overwrite").parquet(s"$dir/meta")
    df.select(col("doc_id"), col("payload"))
      .repartitionByRange(col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
      .write.mode("overwrite")
      .option("parquet.block.size", payloadRowGroupBytes)
      .parquet(s"$dir/payload")
  }

  /** The hot analytic side of a media store: metadata only — scanning it
    * never opens a payload file.
    */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/meta")

  /** Point-fetch payload bytes for a set of ids. The id predicate reaches
    * the parquet scan (PushedFilters) and, with the sorted small-row-group
    * layout [[writeMediaStore]] produces, prunes to the few row groups
    * whose min/max id range covers the request.
    */
  def fetchPayloads(spark: SparkSession, dir: String, ids: Seq[Long]): DataFrame =
    spark.read.parquet(s"$dir/payload").filter(col("doc_id").isin(ids: _*))
}
