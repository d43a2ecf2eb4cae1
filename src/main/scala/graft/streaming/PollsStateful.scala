package graft.streaming

import java.sql.Timestamp
import graft.core.OpLog
import graft.plugs.Polls
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The polls state machine as *arbitrary stateful processing* —
  * `flatMapGroupsWithState` keyed by (author, permlink), the formulation
  * SURVEY §2 T9 calls out for exactly-once ordered application when the
  * batch-merge form (PollsStreaming) isn't enough (e.g. continuous update
  * emission of live tallies).
  *
  * State per poll: the winning create (first in chain order) + the set of
  * distinct (account, answer) votes within validity — the SAME tally
  * semantics as the batch formulation ([[graft.serving.PollsQueries
  * .pollSummary]], reference polls.py:59-73): an account that votes two
  * different answers appears in both tallies. Each trigger emits the
  * poll's refreshed per-answer distinct-voter tallies (Update mode).
  */
object PollsStateful {

  case class PollOp(author: String, permlink: String, op_type: String,
                    created: Timestamp, account: String,
                    answer: Option[Int], answers: Seq[String],
                    expires: Option[Timestamp],
                    block_num: Int, trx_in_block: Int, id: Long)

  case class PollState(created: Timestamp, answers: Seq[String],
                       expires: Option[Timestamp], deleted: Boolean,
                       votes: Map[String, Seq[Int]])

  case class Tally(author: String, permlink: String, parsed_answer: String,
                   votes: Long)

  /** Decompose raw op-log rows into typed poll ops (same CJOS parsing as
    * the batch plug; vote ops carry the TARGET poll's author from the
    * payload, creates/deletes the signer's).
    */
  def toPollOps(raw: DataFrame): Dataset[PollOp] = {
    val env = OpLog.parseEnvelope(Polls.filter(raw))
      .filter(col("op_id") === Polls.opId)
    val signer = coalesce(
      try_element_at(col("req_posting_auths"), lit(1)),
      try_element_at(col("req_auths"), lit(1)))
    val cjos = OpLog.withCjosColumns(env)
      .withColumn("_t", col("op_type"))
      .withColumn("_p", col("_payload"))
      .withColumn("_signer", signer)
    val spark = raw.sparkSession
    import spark.implicits._
    val jg = org.apache.spark.sql.GraftBridge.jsonGet _
    cjos.select(
      when(col("_t") === "vote",
        jg(col("_p"), "author")).otherwise(col("_signer")).as("author"),
      coalesce(jg(col("_p"), "permlink"), lit("")).as("permlink"),
      col("_t").as("op_type"),
      col("timestamp").as("created"),
      col("_signer").as("account"),
      jg(col("_p"), "answer").cast("int").as("answer"),
      from_json(jg(col("_p"), "answers"),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType)).as("answers"),
      to_timestamp(jg(col("_p"), "expires")).as("expires"),
      col("block_num"), col("trx_in_block"), col("id"))
      .filter(col("author").isNotNull && col("permlink") =!= "")
      .as[PollOp]
  }

  /** Apply one group's ops (chain order) to its state; returns the new
    * state and the refreshed tallies.
    */
  def applyOps(state: Option[PollState], ops: Seq[PollOp]): (Option[PollState], Seq[Tally]) = {
    var s = state
    ops.sortBy(o => (o.block_num, o.trx_in_block, o.id)).foreach { op =>
      op.op_type match {
        case "create" if s.isEmpty =>
          s = Some(PollState(op.created, Option(op.answers).getOrElse(Seq.empty),
            op.expires, deleted = false, votes = Map.empty))
        case "vote" =>
          s.foreach { st =>
            val validUntil = st.expires.getOrElse(
              new Timestamp(st.created.getTime + 7L * 24 * 3600 * 1000))
            val idx = op.answer.getOrElse(-1)
            if (!st.deleted && !op.created.after(validUntil) &&
                idx >= 1 && idx <= st.answers.size) {
              // distinct (account, answer): re-votes for the same answer
              // are no-ops, a different answer ADDS a tally membership —
              // matching pollSummary's countDistinct(account) per answer
              val prior = st.votes.getOrElse(op.account, Seq.empty)
              if (!prior.contains(idx))
                s = Some(st.copy(votes = st.votes + (op.account -> (prior :+ idx))))
            }
          }
        case "delete" =>
          s.foreach { st =>
            val live = st.expires.exists(e => !e.before(op.created)) &&
              !op.created.before(st.created)
            if (live) s = Some(st.copy(deleted = true))
          }
        case _ => ()
      }
    }
    (s, talliesOf(ops.head.author, ops.head.permlink, s))
  }

  /** The tallies a poll state currently implies — empty for deleted or
    * never-created polls. Shared by the live-tally stream and the
    * summary-table maintenance path.
    */
  def talliesOf(author: String, permlink: String,
                state: Option[PollState]): Seq[Tally] = state match {
    case Some(st) if !st.deleted =>
      st.votes.toSeq
        .flatMap { case (account, idxs) => idxs.map(_ -> account) }
        .groupBy(_._1).toSeq.map { case (idx, m) =>
          (st.answers(idx - 1), m.map(_._2).distinct.size.toLong)
        }.sortBy(_._1).map { case (ans, n) => Tally(author, permlink, ans, n) }
    case _ => Seq.empty
  }

  /** Streaming (or batch) tallies via flatMapGroupsWithState. */
  def tallies(ops: Dataset[PollOp]): Dataset[Tally] = {
    val spark = ops.sparkSession
    import spark.implicits._
    ops.groupByKey(o => (o.author, o.permlink))
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (key: (String, String), it: Iterator[PollOp], gs: GroupState[PollState]) => {
          val (next, out) = applyOps(gs.getOption, it.toSeq)
          next.foreach(gs.update)
          out.iterator
        })
  }

  /** One update per TOUCHED poll per trigger carrying its full refreshed
    * tally set — `tallies` empty means the poll has no live tallies
    * (deleted, or votes all invalid), i.e. a whole-poll TOMBSTONE. This
    * is the retraction signal the live [[tallies]] stream cannot express
    * in Update mode (a deleted poll simply emits nothing, so an append
    * sink keeps serving its stale rows forever) and the reason the batch
    * serving path re-filters deleted polls per query. A sink that
    * replaces each updated poll's rows wholesale ([[PollsSummaryTable]])
    * materializes exactly the batch `pollSummary` incrementally.
    */
  case class SummaryUpdate(author: String, permlink: String,
                           tallies: Seq[TallyEntry])
  case class TallyEntry(parsed_answer: String, votes: Long)

  def summaryUpdates(ops: Dataset[PollOp]): Dataset[SummaryUpdate] = {
    val spark = ops.sparkSession
    import spark.implicits._
    ops.groupByKey(o => (o.author, o.permlink))
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (key: (String, String), it: Iterator[PollOp], gs: GroupState[PollState]) => {
          val (next, _) = applyOps(gs.getOption, it.toSeq)
          next.foreach(gs.update)
          Iterator(SummaryUpdate(key._1, key._2,
            talliesOf(key._1, key._2, next.orElse(gs.getOption))
              .map(t => TallyEntry(t.parsed_answer, t.votes))))
        })
  }
}

/** Incrementally-materialized poll summary — the versioned-table sink for
  * [[PollsStateful.summaryUpdates]]: each batch replaces the updated
  * polls' rows wholesale (empty tally set = the poll's rows disappear)
  * and keeps everyone else's, committed through
  * [[graft.streaming.ParquetStateStore]] so a replayed batch is a pure
  * overwrite of its own version. The serving read is then a plain scan of
  * the latest version — no deleted-poll filter, no votes join at query
  * time: the summary IS the table the reference recomputes per request.
  */
object PollsSummaryTable {

  /** Fold one batch of updates into the prior summary. Pure frame
    * function (exposed for the equivalence spec); drive it per batch via
    * `store.commit(batchId, merge(store.readBefore(batchId), updates))`.
    */
  def merge(prior: Option[DataFrame],
            updates: Dataset[PollsStateful.SummaryUpdate]): DataFrame = {
    // tombstones (empty tally sets) contribute to `touched` — evicting
    // the poll's prior rows — and nothing to `fresh`: the poll is gone
    val fresh = updates.toDF()
      .select(col("author"), col("permlink"), explode(col("tallies")).as("t"))
      .select(col("author"), col("permlink"),
        col("t.parsed_answer").as("parsed_answer"), col("t.votes").as("votes"))
    val touched = updates.toDF().select("author", "permlink").distinct()
    val kept = prior match {
      case Some(p) => p.join(touched, Seq("author", "permlink"), "left_anti")
      case None => fresh.limit(0)
    }
    kept.unionByName(fresh)
  }
}
