package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The raw operation log — the engine's single source (reference:
  * `hive.operations_view` left-joined to `hive.transactions_view`;
  * haf_plug_play/database/sql/sync.sql:83-100).
  *
  * Ops are ordered by the composite natural key `(block_num, trx_in_block, id)`
  * (sync.sql:99); `block_num` is the logical clock / watermark column. The
  * `BIGSERIAL` surrogate ids of the reference are replaced by this natural key,
  * which is stable under distribution.
  */
object OpLog {

  /** Op-log row shape (FIXTURES.md §1). */
  val schema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("op_type_id", ShortType),
    StructField("block_num", IntegerType),
    StructField("timestamp", TimestampType),
    StructField("trx_in_block", IntegerType),
    StructField("trx_hash", BinaryType),
    StructField("body", StringType)))

  /** custom_json op type id (reference: docs/plug-definitions.md:27). */
  val CustomJsonOpType = 18

  /** Envelope of a custom_json op body:
    * `{"value": {"required_auths": [...], "required_posting_auths": [...],
    *   "id": "<op_id>", "json": "<doubly-encoded payload>"}}`
    * (reference: plugs/podping/functions.sql:80-83).
    */
  val bodySchema: StructType = StructType(Seq(
    StructField("value", StructType(Seq(
      StructField("required_auths", ArrayType(StringType)),
      StructField("required_posting_auths", ArrayType(StringType)),
      StructField("id", StringType),
      StructField("json", StringType))))))

  /** Block-range scan with op-type filter — the S1 source operator.
    * Declarative so Catalyst pushes both predicates to the parquet scan.
    */
  def blockRange(ops: DataFrame, first: Int, last: Int, opTypeIds: Seq[Int]): DataFrame = {
    val ranged = ops.filter(col("block_num").between(first, last))
    if (opTypeIds.isEmpty) ranged
    else ranged.filter(col("op_type_id").isin(opTypeIds: _*))
  }

  /** Decompose the custom_json envelope. Corrupt body JSON yields null
    * columns rather than failing the job (mirrors the reference's per-op
    * exception swallow, plugs/podping/functions.sql:91-96); route rows with
    * `op_id IS NULL` to a dead-letter sink if auditing is needed.
    *
    * Output adds: req_auths, req_posting_auths, op_id, op_payload (the
    * doubly-encoded inner JSON string, still unparsed).
    */
  def parseEnvelope(ops: DataFrame): DataFrame = {
    val parsed = from_json(col("body"), bodySchema)
    ops
      .withColumn("_env", parsed)
      .withColumn("req_auths", col("_env.value.required_auths"))
      .withColumn("req_posting_auths", col("_env.value.required_posting_auths"))
      .withColumn("op_id", col("_env.value.id"))
      .withColumn("op_payload", col("_env.value.json"))
      .drop("_env")
  }

  /** CJOS-01 positional envelope `[[version, app], op_name, payload]`
    * (reference: docs/op-standard.md:15-35); positional access maps to
    * `from_json(ArrayType(StringType))` + 1-based `element_at`, matching
    * Postgres `json->>0` semantics.
    *
    * The array parse is materialized ONCE as a non-cheap alias referenced
    * by all three positional columns — CollapseProject keeps such aliases
    * instead of inlining them, so each row pays one `from_json` of the
    * payload rather than one per derived column (dispatch + every branch
    * re-parsing it was measurable on the polls hot path).
    *
    * Adds: `_op_header` (raw header JSON), `op_type`, `_payload`.
    */
  def withCjosColumns(df: DataFrame, payload: Column = col("op_payload")): DataFrame =
    df.withColumn("_cjos", from_json(payload, ArrayType(StringType)))
      .withColumn("_op_header", element_at(col("_cjos"), 1))
      .withColumn("op_type", element_at(col("_cjos"), 2))
      .withColumn("_payload", element_at(col("_cjos"), 3))
      .drop("_cjos")

  /** Parse the CJOS header `[version, app]` (one materialized parse, as
    * above). Adds: `_op_version` (int), `_app`.
    */
  def withCjosHeader(df: DataFrame, header: Column = col("_op_header")): DataFrame =
    df.withColumn("_hdr", from_json(header, ArrayType(StringType)))
      .withColumn("_op_version", element_at(col("_hdr"), 1).cast(IntegerType))
      .withColumn("_app", element_at(col("_hdr"), 2))
      .drop("_hdr")

  /** Dead-letter routing (T10): ops whose envelope failed to parse. The
    * pipeline drops them silently (permissive `from_json` -> null op_id,
    * mirroring the reference's per-op exception swallow); this view keeps
    * them auditable — route it to a quarantine sink in production.
    */
  def deadLetter(ops: DataFrame): DataFrame =
    parseEnvelope(ops.filter(col("op_type_id") === CustomJsonOpType))
      .filter(col("op_id").isNull)
      .select(col("id"), col("block_num"), col("trx_in_block"),
        col("timestamp"), col("body"))

  /** Irreversibility watermark (T7): process only blocks at least
    * `horizon` behind the head. HAF handles forks by cascade-deleting
    * rolled-back rows (tables INHERIT the context, plug-schema.md:44); the
    * Spark engine instead never ingests blocks that can still be rolled
    * back — mirroring the reference's *detached-context* massive-sync mode
    * where fork tracking is off. ~1-2 min of chain (20-40 blocks) is the
    * practical horizon.
    */
  def finalizedOnly(ops: DataFrame, headBlock: Long, horizon: Int = 20): DataFrame =
    ops.filter(col("block_num") <= headBlock - horizon)

  /** Current head of an op-log DataFrame (S2). */
  def headBlock(ops: DataFrame): Option[Long] =
    ops.agg(max(col("block_num"))).collect().headOption
      .flatMap(r => if (r.isNullAt(0)) None else Some(r.getInt(0).toLong))
}
