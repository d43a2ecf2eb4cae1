package graft.sources

import graft.core.OpLog
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Literal-fidelity Postgres/HAF source (reference `database/core.py:8-21`
  * psycopg2 connector + the op-log scan `database/sql/sync.sql:83-100`).
  *
  * The reference's only source is `hive.operations_view` left-joined to
  * `hive.transactions_view` over a block range. This wrapper builds the
  * same scan as a JDBC pushdown subquery so Postgres executes the range
  * predicate and the join against its own indexes, and Spark parallelizes
  * the read by partitioning on `block_num` — the scan arrives already
  * split into executor-sized ranges instead of one serialized cursor.
  *
  * Untestable in this environment (no Postgres); the query construction
  * is unit-tested and the result schema matches [[OpLog.schema]], so the
  * rest of the engine is source-agnostic: `PlugRunner`/`Plug.transform`
  * run unchanged over either this or the parquet test source.
  */
object PostgresOpLog {

  /** The reference scan as a pushdown subquery (sync.sql:83-100): ops in
    * `[first, last]` restricted to the plug's op-type ids, with the
    * transaction hash recovered via the composite-key left join.
    */
  def scanSql(first: Long, last: Long, opTypeIds: Set[Int]): String = {
    require(last >= first, s"invalid block range [$first, $last]")
    require(opTypeIds.nonEmpty, "at least one op type id")
    val ids = opTypeIds.toSeq.sorted.mkString(", ")
    s"""SELECT ov.id, ov.op_type_id, ov.block_num, ov.timestamp,
       |       ov.trx_in_block, tv.trx_hash, ov.body
       |FROM hive.operations_view ov
       |LEFT JOIN hive.transactions_view tv
       |  ON tv.block_num = ov.block_num AND tv.trx_in_block = ov.trx_in_block
       |WHERE ov.block_num >= $first AND ov.block_num <= $last
       |  AND ov.op_type_id IN ($ids)""".stripMargin
  }

  /** Parallel JDBC read of one block range. `numPartitions` sub-ranges of
    * `block_num` are fetched concurrently (the JDBC source's
    * partitionColumn mechanism); each partition is a contiguous chain
    * slice, so chain-order processing per partition is preserved.
    */
  def read(spark: SparkSession, url: String, first: Long, last: Long,
           opTypeIds: Set[Int], numPartitions: Int = 8,
           props: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", s"(${scanSql(first, last, opTypeIds)}) AS oplog")
      .option("partitionColumn", "block_num")
      .option("lowerBound", first.toString)
      .option("upperBound", (last + 1).toString)
      .option("numPartitions", numPartitions.toString)
      .options(props)
      .load()
      .select(OpLog.schema.fieldNames.map(org.apache.spark.sql.functions.col): _*)

  /** Boot-config form: connection details from the ini, exactly as
    * `database/core.py:8-21` builds the psycopg2 connection from
    * `Config.config`.
    */
  def read(spark: SparkSession, cfg: graft.core.GraftConfig, first: Long,
           last: Long, opTypeIds: Set[Int], numPartitions: Int): DataFrame =
    read(spark, cfg.jdbcUrl, first, last, opTypeIds, numPartitions, cfg.jdbcProps)
}
