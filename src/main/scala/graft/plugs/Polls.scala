package graft.plugs

import graft.core.OpLog
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Polls plug — implements the *intended* semantics (SURVEY §2.12: the
  * reference ships this plug inconsistent and disabled; we follow the
  * documented state machine in plugs/polls/functions.sql:97-129 and
  * docs/protocols/polls.md on the `polls.*` schema).
  *
  * Ops arrive in the CJOS-01 positional envelope
  * `[[version, app], op_name, payload]` (docs/op-standard.md:15-35).
  * State machine, applied in chain order `(block_num, trx_in_block, id)`:
  *  - `create`: first create per (author, permlink) wins
  *    (functions.sql:105-112 `IF NOT FOUND THEN INSERT`) — expressed
  *    order-insensitively as `row_number() == 1` over the chain-order key.
  *  - `vote`: append (functions.sql:114-119).
  *  - `delete`: soft-delete, honored only while the poll is live
  *    (functions.sql:120-128: guard `temprow.expires >= _created`).
  */
object Polls extends Plug {
  val name = "polls"
  val startBlock = 0
  val opTypeIds: Set[Int] = Set(OpLog.CustomJsonOpType)
  val opId = "polls"

  val createSchema: StructType = StructType(Seq(
    StructField("permlink", StringType),
    StructField("question", StringType),
    StructField("answers", ArrayType(StringType)),
    StructField("expires", StringType),
    StructField("tag", StringType)))

  val voteSchema: StructType = StructType(Seq(
    StructField("author", StringType),
    StructField("permlink", StringType),
    StructField("answer", ShortType)))

  val deleteSchema: StructType = StructType(Seq(
    StructField("permlink", StringType)))

  /** Cheap superset prefilter (see Podping.filter): exact op-id equality
    * still applies post-parse.
    */
  def filter(ops: DataFrame): DataFrame =
    ops.filter(col("op_type_id") === OpLog.CustomJsonOpType &&
      col("body").contains("\"polls\""))

  /** Chain-order window per poll key — deterministic first-writer-wins. */
  private val perPoll =
    Window.partitionBy(col("author"), col("permlink"))
      .orderBy(col("block_num"), col("trx_in_block"), col("poll_opid"))

  def transform(raw: DataFrame): Map[String, DataFrame] = {
    val env = OpLog.parseEnvelope(filter(raw)).filter(col("op_id") === opId)

    // CJOS decomposition (one materialized parse — see
    // OpLog.withCjosColumns); gate on op_version == 1 (functions.sql:97).
    val cjos = OpLog.withCjosHeader(OpLog.withCjosColumns(env))
      .filter(col("_op_version") === 1)

    // polls.ops (tables.sql:3-13)
    val opsTable = cjos.select(
      col("id"), col("block_num"), col("trx_in_block"),
      col("timestamp").as("created"),
      lower(hex(col("trx_hash"))).as("transaction_id"),
      col("req_auths"), col("req_posting_auths"),
      col("_op_header").as("op_header"), col("op_type"),
      col("_payload").as("op_payload"))

    // The acting account: first posting auth, else first active auth
    // (custom_json ops carry exactly one signer in practice).
    val signer = coalesce(
      try_element_at(col("req_posting_auths"), lit(1)),
      try_element_at(col("req_auths"), lit(1)))

    // -- create: first create per (author, permlink) wins ------------------
    val creates = cjos.filter(col("op_type") === "create")
      .withColumn("_c", from_json(col("_payload"), createSchema))
      .select(
        col("id").as("poll_opid"), col("block_num"), col("trx_in_block"),
        col("timestamp").as("created"),
        signer.as("author"),
        col("_c.permlink").as("permlink"),
        col("_c.question").as("question"),
        col("_c.answers").as("answers"),
        to_timestamp(col("_c.expires")).as("expires"),
        col("_c.tag").as("tag"))
      .filter(col("permlink").isNotNull)
    val content0 = creates
      .withColumn("_rn", row_number().over(perPoll))
      .filter(col("_rn") === 1).drop("_rn")

    // -- vote: append (vote targets the poll author in the payload) --------
    val votes = cjos.filter(col("op_type") === "vote")
      .withColumn("_v", from_json(col("_payload"), voteSchema))
      .select(
        col("id").as("pp_poll_opid"), col("block_num"), col("trx_in_block"),
        col("timestamp").as("created"),
        col("_v.author").as("author"),
        col("_v.permlink").as("permlink"),
        signer.as("account"),
        col("_v.answer").as("answer"))
      .filter(col("author").isNotNull && col("permlink").isNotNull)

    // -- delete: a delete soft-deletes the poll iff it comes AFTER the
    // winning create in chain order (the reference applies ops
    // sequentially — a delete preceding the create finds no poll and is a
    // no-op, even at equal timestamps) and lands while the poll is live
    // (functions.sql:120-128 guard `temprow.expires >= _created`). Batch
    // formulation: join ALL deletes to the winning create and keep the
    // qualifying ones — collapsing to the chain-earliest delete *first*
    // would let an early non-qualifying delete mask a later valid one.
    val deletes = cjos.filter(col("op_type") === "delete")
      .withColumn("_d", from_json(col("_payload"), deleteSchema))
      .select(
        signer.as("author"),
        col("_d.permlink").as("permlink"),
        col("timestamp").as("del_created"),
        col("block_num").as("del_block"),
        col("trx_in_block").as("del_trx"),
        col("id").as("del_opid"))
      .filter(col("permlink").isNotNull)

    val qualifying = content0
      .select(col("author"), col("permlink"), col("block_num"),
        col("trx_in_block"), col("poll_opid"), col("expires"))
      .join(deletes, Seq("author", "permlink"))
      .filter(
        struct(col("del_block"), col("del_trx"), col("del_opid")) >
          struct(col("block_num"), col("trx_in_block"), col("poll_opid")) &&
        col("expires").isNotNull && col("expires") >= col("del_created"))
      .select(col("author"), col("permlink")).distinct()

    val content = content0
      .join(qualifying.withColumn("_del", lit(true)), Seq("author", "permlink"), "left")
      .withColumn("deleted", coalesce(col("_del"), lit(false)))
      .drop("_del")

    Map("ops" -> opsTable, "content" -> content, "votes" -> votes,
        "deletes" -> deletes)
  }
}
