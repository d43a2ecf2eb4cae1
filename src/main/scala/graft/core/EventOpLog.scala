package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic mapping from the driver's `events` table onto the raw
  * op-log shape (OpLog.schema) so the real plug pipelines can run — and be
  * oracle-checked — against driver test data. The mapping is pure column
  * arithmetic on (event_id, user_id, props.k, ts):
  *
  *  - click/view  -> podping ops (click='podping', view='pp_video_update');
  *                   even k publishes v0.3 {urls:[url_(k%20), url_((k+1)%20)]},
  *                   odd k publishes v1.0 {iris:[...same...], medium:'podcast'}
  *  - purchase    -> hive-engine 'ssc-mainnet-hive' ops: k%7==0 nft issue,
  *                   else k%11==0 tokens issue, else tokens transfer —
  *                   symbol TK(k%5), to user_(uid%7), quantity "k.(k%10)"
  *                   (k%13==0 transfers go to 'null' = burns)
  *  - signup      -> polls 'create' for (author owner_(k%25), permlink
  *                   poll_(k%25), expires ts+7d) — poll identity derives
  *                   from k, so concurrent signups race on the same poll
  *                   key and first-create-wins is exercised globally
  *  - error, k even -> polls 'vote' on poll_(k%25) by user_(uid), answer
  *                   1+(k%4) (answer 4 is out of range -> dropped, the
  *                   Postgres array-index null semantic)
  *  - error, k odd, k%5==0 -> polls 'delete' of poll_(k%25) signed by its
  *                   owner (exercises the soft-delete liveness guard)
  *  - error, k odd otherwise -> corrupt body (must be isolated, not fail
  *                   the pipeline)
  *
  * block_num = event_id DIV 10, trx_in_block = event_id % 10 — ten ops per
  * block, preserving chain order == event order.
  *
  * Bodies are assembled with `concat` string literals rather than
  * `to_json`: StructsToJson is an interpreted (CodegenFallback) expression
  * and dominated the pipeline cost; plain concat stays inside whole-stage
  * codegen. The inner payload is emitted directly in its \"-escaped form
  * (it is a JSON string *inside* the envelope JSON — doubly encoded, like
  * the reference's `->>'json'` then `::json`).
  */
object EventOpLog {

  // `k` is materialized as a column up front: it feeds ~8 expressions per
  // row and inlining the JSON extraction into each would re-parse props
  // every time.
  private def k: Column = col("_k")
  private def acct: Column = concat(lit("user_"), col("user_id"))

  private def esc(parts: Column*): Column = concat(parts: _*)

  def fromEvents(events0: DataFrame): DataFrame = {
    // single-file source = one split; spread the JSON-heavy synthesis
    // (conditional — a well-split source gets no extra Exchange)
    val events = Spread.ensureParallel(events0)
      .withColumn("_k", org.apache.spark.sql.GraftBridge.jsonGet(col("props"), "k").cast("int"))

    // {"version": "0.3", "reason": "feed_update", "urls": ["url_A", "url_B"]}
    val podpingInner03 = esc(
      lit("{\\\"version\\\": \\\"0.3\\\", \\\"reason\\\": \\\"feed_update\\\", \\\"urls\\\": [\\\"url_"),
      k % 20, lit("\\\", \\\"url_"), (k + 1) % 20, lit("\\\"]}"))
    // {"version": "1.0", "reason": "update", "medium": "podcast", "iris": [...]}
    val podpingInner10 = esc(
      lit("{\\\"version\\\": \\\"1.0\\\", \\\"reason\\\": \\\"update\\\", \\\"medium\\\": \\\"podcast\\\", \\\"iris\\\": [\\\"url_"),
      k % 20, lit("\\\", \\\"url_"), (k + 1) % 20, lit("\\\"]}"))
    val podpingInner = when(k % 2 === 0, podpingInner03).otherwise(podpingInner10)

    // contract dispatch coverage: k%7==0 -> nft issue; else k%11==0 ->
    // tokens issue; k%13==0 -> burn (to='null'); otherwise a token transfer
    val hiveTo = when(k % 13 === 0, lit("null"))
      .otherwise(concat(lit("user_"), col("user_id") % 7))
    val hiveTokensInner = esc(
      lit("{\\\"contractName\\\": \\\"tokens\\\", \\\"contractAction\\\": \\\"transfer\\\", \\\"contractPayload\\\": {\\\"symbol\\\": \\\"TK"),
      k % 5,
      lit("\\\", \\\"to\\\": \\\""), hiveTo,
      lit("\\\", \\\"quantity\\\": \\\""), k, lit("."), k % 10,
      lit("\\\", \\\"memo\\\": \\\"memo\\\"}}"))
    val hiveIssueInner = esc(
      lit("{\\\"contractName\\\": \\\"tokens\\\", \\\"contractAction\\\": \\\"issue\\\", \\\"contractPayload\\\": {\\\"symbol\\\": \\\"TK"),
      k % 5,
      lit("\\\", \\\"to\\\": \\\"user_"), col("user_id") % 7,
      lit("\\\", \\\"quantity\\\": \\\""), k, lit("."), k % 10,
      lit("\\\"}}"))
    val hiveNftInner = esc(
      lit("{\\\"contractName\\\": \\\"nft\\\", \\\"contractAction\\\": \\\"issue\\\", \\\"contractPayload\\\": {\\\"symbol\\\": \\\"CITY"),
      k % 3,
      lit("\\\", \\\"to\\\": \\\"user_"), col("user_id") % 7,
      lit("\\\"}}"))
    val hiveInner = when(k % 7 === 0, hiveNftInner)
      .when(k % 11 === 0, hiveIssueInner)
      .otherwise(hiveTokensInner)

    // CJOS-01: [[1, "polls-app/0.01"], "create", {...}] (op-standard.md),
    // \"-escaped once for embedding in the envelope body
    val pollsCreateInner = esc(
      lit("[[1, \\\"polls-app/0.01\\\"], \\\"create\\\", {\\\"permlink\\\": \\\"poll_"),
      k % 25,
      lit("\\\", \\\"question\\\": \\\"q"), k,
      lit("\\\", \\\"answers\\\": [\\\"yes\\\", \\\"no\\\", \\\"maybe\\\"], \\\"expires\\\": \\\""),
      date_format(col("ts") + expr("INTERVAL 7 DAYS"), "yyyy-MM-dd HH:mm:ss"),
      lit("\\\", \\\"tag\\\": \\\"tag"), k % 3,
      lit("\\\"}]"))

    val pollsVoteInner = esc(
      lit("[[1, \\\"polls/0.01\\\"], \\\"vote\\\", {\\\"author\\\": \\\"owner_"),
      k % 25,
      lit("\\\", \\\"permlink\\\": \\\"poll_"), k % 25,
      lit("\\\", \\\"answer\\\": "), k % 4 + 1, lit("}]"))

    val pollsDeleteInner = esc(
      lit("[[1, \\\"polls/0.01\\\"], \\\"delete\\\", {\\\"permlink\\\": \\\"poll_"),
      k % 25, lit("\\\"}]"))

    val isVote = col("event_type") === "error" && k % 2 === 0
    // error, k odd: every 5th is a poll delete (signed by the poll owner,
    // exercising the liveness guard); the rest stay corrupt bodies
    val isDelete = col("event_type") === "error" && k % 2 === 1 && k % 5 === 0

    val opId = when(col("event_type") === "click", "podping")
      .when(col("event_type") === "view", "pp_video_update")
      .when(col("event_type") === "purchase", "ssc-mainnet-hive")
      .when(col("event_type") === "signup" || isVote || isDelete, "polls")

    val inner = when(col("event_type").isin("click", "view"), podpingInner)
      .when(col("event_type") === "purchase", hiveInner)
      .when(col("event_type") === "signup", pollsCreateInner)
      .when(isVote, pollsVoteInner)
      .when(isDelete, pollsDeleteInner)

    // creates and deletes are signed by the poll owner (derived from k);
    // votes and podping ops by the event's user
    val signer = when(col("event_type") === "signup" || isDelete,
        concat(lit("\"owner_"), k % 25, lit("\"")))
      .otherwise(concat(lit("\"user_"), col("user_id"), lit("\"")))
    val activeAuths = when(col("event_type") === "purchase", signer).otherwise(lit(""))
    val postingAuths = when(col("event_type") === "purchase", lit("")).otherwise(signer)

    val body = when(col("event_type") === "error" && !isVote && !isDelete,
        lit("{corrupt json!"))
      .otherwise(concat(
        lit("{\"value\": {\"required_auths\": ["), activeAuths,
        lit("], \"required_posting_auths\": ["), postingAuths,
        lit("], \"id\": \""), opId,
        lit("\", \"json\": \""), inner, lit("\"}}")))

    events.select(
      col("event_id").as("id"),
      lit(OpLog.CustomJsonOpType).cast("short").as("op_type_id"),
      expr("CAST(event_id DIV 10 AS INT)").as("block_num"),
      col("ts").as("timestamp"),
      (col("event_id") % 10).cast("int").as("trx_in_block"),
      unhex(md5(col("event_id").cast("string"))).as("trx_hash"),
      body.as("body"))
  }
}
