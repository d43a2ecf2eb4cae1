package graft

import graft.sources.PostgresOpLog

/** The JDBC source wrapper can't reach a Postgres here; pin the pushdown
  * query construction (the part with reference fidelity — sync.sql:83-100)
  * and its guards.
  */
class SourcesSpec extends SparkSpec {

  test("scan subquery mirrors the reference op-log scan") {
    val sql = PostgresOpLog.scanSql(100, 200, Set(18))
    assert(sql.contains("FROM hive.operations_view ov"))
    assert(sql.contains(
      "ON tv.block_num = ov.block_num AND tv.trx_in_block = ov.trx_in_block"))
    assert(sql.contains("ov.block_num >= 100 AND ov.block_num <= 200"))
    assert(sql.contains("op_type_id IN (18)"))
    // column order matches OpLog.schema so downstream plugs run unchanged
    val cols = "ov.id, ov.op_type_id, ov.block_num, ov.timestamp"
    assert(sql.contains(cols))
  }

  test("multiple op ids render sorted and deterministic") {
    val sql = PostgresOpLog.scanSql(0, 10, Set(41, 18, 12))
    assert(sql.contains("op_type_id IN (12, 18, 41)"))
  }

  test("invalid ranges and empty id sets are rejected") {
    intercept[IllegalArgumentException](PostgresOpLog.scanSql(10, 5, Set(18)))
    intercept[IllegalArgumentException](PostgresOpLog.scanSql(0, 10, Set.empty))
  }
}
