package graft.plugs

import graft.core.OpLog
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Podping plug — the only complete, enabled plug in the reference
  * (plugs/podping/defs.json; functions.sql; tables.sql).
  *
  * Semantics re-expressed set-oriented:
  *  - `ops`: matched custom_json ops with decomposed envelope
  *    (functions.sql:67-97 `process_cjop`).
  *  - `updates`: one row per URL per op — the reference's `FOREACH _url IN
  *    ARRAY` insert loop (functions.sql:20-33) is exactly `explode(urls)`.
  *    Version dispatch (functions.sql:15-34): v0.3 carries `urls` and forces
  *    medium='blog'; v1.0 carries `iris` and its own `medium`.
  *
  * Invalid payload JSON must not fail the pipeline (functions.sql:91-96):
  * `from_json` yields nulls, and null-url rows drop out of the explode.
  */
object Podping extends Plug {
  val name = "podping"
  val startBlock = 0
  val opTypeIds: Set[Int] = Set(OpLog.CustomJsonOpType)

  /** Accepted op ids (functions.sql:85). */
  val opIds: Seq[String] = Seq("podping", "pp_video_update")

  /** Podping payload — flat object, two live versions (FIXTURES.md §2). */
  val payloadSchema: StructType = StructType(Seq(
    StructField("version", StringType),
    StructField("num_urls", IntegerType),
    StructField("reason", StringType),
    StructField("medium", StringType),
    StructField("urls", ArrayType(StringType)),
    StructField("iris", ArrayType(StringType))))

  /** Cheap superset prefilter: op type + body substring probe. The exact
    * op-id equality still applies after envelope parsing; the substring
    * test just keeps non-matching ops away from the JSON parser (and is
    * pushable to the scan).
    */
  def filter(ops: DataFrame): DataFrame =
    ops.filter(col("op_type_id") === OpLog.CustomJsonOpType &&
      (col("body").contains("\"podping\"") || col("body").contains("\"pp_video_update\"")))

  def transform(raw: DataFrame): Map[String, DataFrame] = {
    val env = OpLog.parseEnvelope(filter(raw))
      .filter(col("op_id").isin(opIds: _*))

    // podping.ops (tables.sql:3-12): natural key replaces BIGSERIAL id.
    val opsTable = env.select(
      col("id"), col("block_num"), col("trx_in_block"),
      col("timestamp").as("created"), col("trx_hash").as("trx_id"),
      col("req_auths"), col("req_posting_auths"), col("op_id"), col("op_payload"))

    // Parse the payload ONCE into a materialized struct column, then
    // version-dispatch + explode in a separate projection. No explicit
    // null filter: explode() drops null/empty arrays itself — an isNotNull
    // filter here would be pushed down with full alias substitution and
    // re-evaluate the nested from_json many times per row
    // (PushDownPredicates duplicates expensive expressions).
    val withP = env.select(
      col("id"), col("block_num"), col("trx_in_block"), col("timestamp"),
      from_json(col("op_payload"), payloadSchema).as("_p"))

    val updates = withP
      .select(
        col("id").as("podping_id"), col("block_num"), col("trx_in_block"),
        col("timestamp").as("created"),
        explode(
          when(col("_p.version") === "0.3", col("_p.urls"))
            .when(col("_p.version") === "1.0", col("_p.iris"))).as("url"),
        col("_p.reason").as("reason"),
        when(col("_p.version") === "0.3", lit("blog"))
          .when(col("_p.version") === "1.0", col("_p.medium")).as("medium"))

    Map("ops" -> opsTable, "updates" -> updates)
  }
}
