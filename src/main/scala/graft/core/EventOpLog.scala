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
  *  - purchase    -> hive-engine 'ssc-mainnet-hive' tokens/transfer ops:
  *                   symbol TK(k%5), to user_(uid%7), quantity "k.(k%10)"
  *  - signup      -> polls 'create' (permlink poll_(k%25), expires ts+7d)
  *  - error       -> corrupt body (must be isolated, not fail the pipeline)
  *
  * block_num = event_id DIV 10, trx_in_block = event_id % 10 — ten ops per
  * block, preserving chain order == event order.
  */
object EventOpLog {

  private def k: Column = get_json_object(col("props"), "$.k").cast("int")
  private def acct: Column = concat(lit("user_"), col("user_id"))

  def fromEvents(events: DataFrame): DataFrame = {
    val podpingInner =
      when(k % 2 === 0,
        to_json(struct(
          lit("0.3").as("version"), lit("feed_update").as("reason"),
          array(concat(lit("url_"), k % 20), concat(lit("url_"), (k + 1) % 20)).as("urls"))))
      .otherwise(
        to_json(struct(
          lit("1.0").as("version"), lit("update").as("reason"),
          lit("podcast").as("medium"),
          array(concat(lit("url_"), k % 20), concat(lit("url_"), (k + 1) % 20)).as("iris"))))

    val hiveInner = to_json(struct(
      lit("tokens").as("contractName"), lit("transfer").as("contractAction"),
      struct(
        concat(lit("TK"), k % 5).as("symbol"),
        concat(lit("user_"), col("user_id") % 7).as("to"),
        concat(k, lit("."), k % 10).as("quantity"),
        lit("memo").as("memo")).as("contractPayload")))

    val pollsInner = to_json(array(
      to_json(array(lit("1"), lit("polls-app/0.01"))),
      lit("create"),
      to_json(struct(
        concat(lit("poll_"), k % 25).as("permlink"),
        concat(lit("q"), k).as("question"),
        array(lit("yes"), lit("no"), lit("maybe")).as("answers"),
        date_format(col("ts") + expr("INTERVAL 7 DAYS"), "yyyy-MM-dd HH:mm:ss").as("expires"),
        concat(lit("tag"), k % 3).as("tag")))))

    val opId = when(col("event_type") === "click", "podping")
      .when(col("event_type") === "view", "pp_video_update")
      .when(col("event_type") === "purchase", "ssc-mainnet-hive")
      .when(col("event_type") === "signup", "polls")

    val inner = when(col("event_type").isin("click", "view"), podpingInner)
      .when(col("event_type") === "purchase", hiveInner)
      .when(col("event_type") === "signup", pollsInner)

    val activeAuths = when(col("event_type") === "purchase", array(acct))
      .otherwise(array().cast("array<string>"))
    val postingAuths = when(col("event_type") === "purchase", array().cast("array<string>"))
      .otherwise(array(acct))

    val body = when(col("event_type") === "error", lit("{corrupt json!"))
      .otherwise(to_json(struct(struct(
        activeAuths.as("required_auths"),
        postingAuths.as("required_posting_auths"),
        opId.as("id"),
        inner.as("json")).as("value"))))

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
