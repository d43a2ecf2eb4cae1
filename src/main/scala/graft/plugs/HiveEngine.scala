package graft.plugs

import graft.core.OpLog
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Hive-engine plug — the reference ships this abandoned mid-write
  * (SURVEY §2.12); we implement the specification sketch: parse
  * `ssc-mainnet-hive` custom_json ops (functions.sql:67) and dispatch on
  * `contractName` ('tokens' | 'nft', functions.sql:71-75) into
  * transfers / issuances / burns / nfts tables (tables.sql:14-57).
  */
object HiveEngine extends Plug {
  val name = "hive_engine"
  val startBlock = 0
  val opTypeIds: Set[Int] = Set(OpLog.CustomJsonOpType)
  val opId = "ssc-mainnet-hive"

  val payloadSchema: StructType = StructType(Seq(
    StructField("contractName", StringType),
    StructField("contractAction", StringType),
    StructField("contractPayload", StructType(Seq(
      StructField("symbol", StringType),
      StructField("to", StringType),
      StructField("quantity", StringType),
      StructField("memo", StringType),
      StructField("id", StringType),
      StructField("properties", StringType))))))

  /** Cheap superset prefilter (see Podping.filter): exact op-id equality
    * still applies post-parse.
    */
  def filter(ops: DataFrame): DataFrame =
    ops.filter(col("op_type_id") === OpLog.CustomJsonOpType &&
      col("body").contains("\"ssc-mainnet-hive\""))

  def transform(raw: DataFrame): Map[String, DataFrame] = {
    val env = OpLog.parseEnvelope(filter(raw)).filter(col("op_id") === opId)
    val signer = coalesce(
      try_element_at(col("req_auths"), lit(1)),
      try_element_at(col("req_posting_auths"), lit(1)))

    // no isNotNull filter on _p: a null parse yields null contract and
    // falls out of the contract dispatch below (an explicit filter here
    // would be pushed down with alias substitution and re-run from_json)
    val parsed = env
      .withColumn("_p", from_json(col("op_payload"), payloadSchema))
      .withColumn("from_acct", signer)

    val base = parsed.select(
      col("id"), col("block_num"), col("trx_in_block"),
      col("timestamp").as("created"),
      col("from_acct").as("from"),
      col("_p.contractName").as("contract"),
      col("_p.contractAction").as("action"),
      col("_p.contractPayload.symbol").as("symbol"),
      col("_p.contractPayload.to").as("to"),
      // NUMERIC(18,10) per tables.sql:22
      col("_p.contractPayload.quantity").cast(DecimalType(18, 10)).as("quantity"),
      col("_p.contractPayload.memo").as("memo"))

    val tokens = base.filter(col("contract") === "tokens")
    val transfers = tokens.filter(col("action") === "transfer")
      .select("id", "block_num", "created", "from", "to", "symbol", "quantity", "memo")
    val issuances = tokens.filter(col("action") === "issue")
      .select("id", "block_num", "created", "from", "to", "symbol", "quantity")
    val burns = transfers.filter(col("to") === "null")
    val nfts = base.filter(col("contract") === "nft")
      .select("id", "block_num", "created", "from", "action", "symbol", "to")

    Map("transfers" -> transfers, "issuances" -> issuances,
        "burns" -> burns, "nfts" -> nfts)
  }
}
