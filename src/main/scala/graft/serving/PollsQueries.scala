package graft.serving

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Serving queries of the polls API (reference:
  * haf_plug_play/plugs/polls/polls.py; intended semantics per SURVEY §2.12).
  * `now` is an injected clock (SURVEY §7.3.4) replacing the reference's
  * `NOW() AT TIME ZONE 'utc'`.
  */
object PollsQueries {

  /** Active polls (polls.py:38-44): not expired, not deleted (F3 + F4),
    * optionally filtered by tag (plug_endpoints/polls.py:103-129).
    */
  def activePolls(content: DataFrame, now: Timestamp,
                  tag: Option[String] = None): DataFrame = {
    val base = content.filter(col("expires") >= lit(now) && !col("deleted"))
    tag.fold(base)(t => base.filter(col("tag") === t))
      .select("author", "permlink", "question", "answers", "expires", "tag", "created")
  }

  /** Polls by tag (polls.py:47-56). */
  def pollsByTag(content: DataFrame, tag: String): DataFrame =
    content.filter(col("tag") === tag && !col("deleted"))
      .select("author", "permlink", "question", "answers", "expires", "tag", "created")

  /** Poll vote summary (polls.py:59-73): J2 equi join with the vote-validity
    * theta residual `v.created <= coalesce(expires, c.created + 7 days)`,
    * then per-answer distinct-voter counts (A2). `element_at` is 1-based,
    * matching Postgres `answers[answer]` (polls.py:62).
    *
    * Intentional divergence (SURVEY §2.12): the reference writes
    * `created - INTERVAL '7 DAYS'` (polls.py:69-70), which would
    * invalidate every vote on an expiry-less poll (no vote can be ≤
    * creation − 7d); the evident intent is a 7-day default voting
    * window, so this uses PLUS. Pinned by PollsSpec.
    */
  def pollSummary(content: DataFrame, votes: DataFrame): DataFrame = {
    val c = content.filter(!col("deleted"))
      .select(col("author"), col("permlink"), col("answers"),
        col("expires"), col("created").as("c_created"))
    val v = votes.select(col("author"), col("permlink"),
      col("account"), col("answer"), col("created").as("v_created"))
    c.join(v, Seq("author", "permlink"))
      .filter(col("v_created") <=
        coalesce(col("expires"), col("c_created") + expr("INTERVAL 7 DAYS")))
      // 1-based like Postgres `answers[answer]`; out-of-range yields null
      // (filtered below), matching Postgres array-index semantics. The
      // zero guard is load-bearing: Postgres/DuckDB answers[0] is NULL,
      // but Spark's try_element_at THROWS on index 0 (only out-of-bounds
      // is nullified) — a single answer=0 vote anywhere in the log would
      // fail the whole query instead of dropping that vote.
      .withColumn("parsed_answer",
        when(col("answer") >= 1,
          try_element_at(col("answers"), col("answer").cast("int"))))
      .filter(col("parsed_answer").isNotNull)
      .groupBy(col("author"), col("permlink"), col("parsed_answer"))
      .agg(countDistinct(col("account")).as("votes"))
  }

  /** Full vote list for a poll (polls.py:76-84, J3). */
  def pollVotes(content: DataFrame, votes: DataFrame, author: String, permlink: String): DataFrame =
    content.filter(!col("deleted") &&
        col("author") === author && col("permlink") === permlink)
      .select("author", "permlink")
      .join(votes, Seq("author", "permlink"))
      .select("account", "answer", "created")

  /** A user's polls, newest first (polls.py:87-100, O5), with the
    * reference endpoint's optional filters (plug_endpoints/polls.py:231+):
    * `activeAt` — when set, only polls still live at that clock — and
    * `tag`.
    */
  def userPolls(content: DataFrame, author: String,
                activeAt: Option[Timestamp] = None,
                tag: Option[String] = None): DataFrame = {
    val base = content.filter(col("author") === author && !col("deleted"))
    val withActive = activeAt.fold(base)(now => base.filter(col("expires") >= lit(now)))
    tag.fold(withActive)(t => withActive.filter(col("tag") === t))
      .orderBy(col("created").desc, col("permlink"))
      .select("author", "permlink", "question", "answers", "expires", "tag", "created")
  }

  /** Raw poll ops over a block range with optional op-type filter
    * (SearchQuery.poll_ops, plugs/polls/polls.py:13-27 + the
    * /api/polls/ops endpoint). Block-range predicate prunes partitions
    * (F1); op_type is a residual pushed filter.
    */
  def pollOps(ops: DataFrame, first: Long, last: Long,
              opType: Option[String] = None): DataFrame = {
    val ranged = ops.filter(col("block_num").between(first, last))
    opType.fold(ranged)(t => ranged.filter(col("op_type") === t))
      .orderBy(col("id"))
  }
}
