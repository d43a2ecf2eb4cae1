package graft.serving

import java.sql.Timestamp
import java.time.format.DateTimeFormatter
import java.time.ZoneOffset

/** API-edge shaping & validation helpers (reference: §2.9 —
  * server/plug_endpoints/polls.py:37-75,118-121, tools.py:14-74).
  * Pure functions; the HTTP layer is a thin wrapper over these plus the
  * query builders.
  */
object ApiShaping {

  private val isoFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss")
    .withZone(ZoneOffset.UTC)

  /** `normalize_types` (tools.py:57-74): JSON-ready scalar — Decimal ->
    * double, Timestamp -> `%Y-%m-%dT%H:%M:%S` string, pass-through
    * otherwise.
    */
  def normalizeValue(v: Any): Any = v match {
    case null => null
    case d: java.math.BigDecimal => d.doubleValue()
    case d: BigDecimal => d.toDouble
    case t: Timestamp => isoFmt.format(t.toInstant)
    case b: Array[Byte] => b.map("%02x".format(_)).mkString
    case other => other
  }

  /** `populate_by_schema` (tools.py:51-55): positional tuple -> named map. */
  def populateBySchema(row: Seq[Any], schema: Seq[String]): Map[String, Any] =
    schema.zip(row.map(normalizeValue)).toMap

  /** `range_split` (tools.py:38-49): chunk [first, last] into inclusive
    * sub-ranges of at most `size` blocks (the massive-sync chunker).
    */
  def rangeSplit(first: Long, last: Long, size: Long): Seq[(Long, Long)] = {
    require(size > 0 && last >= first)
    (first to last by size).map(s => (s, math.min(s + size - 1, last)))
  }

  /** Permlink slug pipeline (polls.py:54-75): '&' -> ' and ', whitespace
    * split, accumulate words joined by '-' while <= 32 chars, lowercase,
    * strip everything outside [a-z-].
    */
  def slug(question: String): String = {
    val words = question.replace("&", " and ").trim.split("\\s+").filter(_.nonEmpty)
    val joined = words.foldLeft("") { (acc, w) =>
      val cand = if (acc.isEmpty) w else s"$acc-$w"
      if (cand.length <= 32) cand else acc
    }
    joined.toLowerCase.replaceAll("[^a-z-]+", "")
  }

  /** Unique-permlink generation (polls.py:58-74): append `-2`, `-3`, ...
    * until no collision. `exists` probes current state (a left-semi lookup
    * in the engine).
    */
  def uniqueSlug(question: String, exists: String => Boolean): String = {
    val base = slug(question)
    if (!exists(base)) base
    else Iterator.from(2).map(n => s"$base-$n").find(s => !exists(s)).get
  }

  /** Input validation (§2.9): max lengths from the reference DDL/endpoint
    * checks. Returns Left(error) like the reference's 400 responses.
    */
  def validateAuthor(author: String): Either[String, String] =
    if (author.nonEmpty && author.length <= 16) Right(author)
    else Left(s"invalid author: '$author' (must be 1-16 chars)")

  def validatePermlink(permlink: String): Either[String, String] =
    if (permlink.nonEmpty && permlink.length <= 255) Right(permlink)
    else Left(s"invalid permlink (must be 1-255 chars)")

  def validateBlockRange(first: Long, last: Long): Either[String, (Long, Long)] =
    if (first >= 0 && last >= first) Right((first, last))
    else Left(s"invalid block range [$first, $last]")

  /** `time_since` (podping.py:57-58 — implemented with total seconds, the
    * reference's `.seconds` truncation is a documented bug, §2.12).
    */
  def timeSinceSeconds(last: Timestamp, now: Timestamp): Long =
    (now.getTime - last.getTime) / 1000

  /** Key-set validators (`check_required_keys` / `check_allowed_keys`,
    * tools.py:17-29): payload envelopes must carry every required key and
    * nothing outside the allowed set.
    */
  def checkRequiredKeys(payload: Map[String, Any],
                        required: Set[String]): Either[String, Map[String, Any]] = {
    val missing = required -- payload.keySet
    if (missing.isEmpty) Right(payload)
    else Left(s"missing required keys: ${missing.toSeq.sorted.mkString(", ")}")
  }

  def checkAllowedKeys(payload: Map[String, Any],
                       allowed: Set[String]): Either[String, Map[String, Any]] = {
    val extra = payload.keySet -- allowed
    if (extra.isEmpty) Right(payload)
    else Left(s"unexpected keys: ${extra.toSeq.sorted.mkString(", ")}")
  }
}
