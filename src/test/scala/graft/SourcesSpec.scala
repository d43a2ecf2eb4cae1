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

  // ---- OpLogTail: the app_next_block loop over a simulated feed ----

  /** Simulated op-log backend: a mutable head plus a frame filtered by
    * block range (what the JDBC scan does server-side).
    */
  private def simulatedTail(ckpt: String, step: Long,
                            headRef: () => Long): graft.sources.OpLogTail = {
    import spark.implicits._
    new graft.sources.OpLogTail(
      spark, ckpt,
      head = headRef,
      readRange = (first, last) =>
        (first to last).map(b => (b, s"op_$b")).toDF("block_num", "body"),
      step = step)
  }

  test("OpLogTail chunks [cursor+1, min(head, cursor+step)] at step=100, cursor monotone") {
    val ckpt = java.nio.file.Files.createTempDirectory("tail1").toString
    var head = 350L
    val tail = simulatedTail(ckpt, 100L, () => head)
    val seen = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    val ranges = tail.runUntilCaughtUp { (df, first, last) =>
      seen += ((first, last, df.count()))
    }
    assert(ranges === Seq((1L, 100L), (101L, 200L), (201L, 300L), (301L, 350L)))
    // every emitted batch carries exactly its range's rows
    assert(seen.map { case (f, l, n) => n == l - f + 1 }.forall(identity))
    assert(tail.cursor === 350L)
    // caught up: no range until the head advances (app_next_block NULL)
    assert(tail.nextRange() === None)
    head = 425L
    assert(tail.nextRange() === Some((351L, 425L)))
  }

  test("OpLogTail restart resumes from the committed cursor") {
    val ckpt = java.nio.file.Files.createTempDirectory("tail2").toString
    val t1 = simulatedTail(ckpt, 50L, () => 120L)
    t1.runOnce((_, _, _) => ()) // [1, 50]
    t1.runOnce((_, _, _) => ()) // [51, 100]
    // a NEW instance over the same checkpoint (process restart) resumes
    val t2 = simulatedTail(ckpt, 50L, () => 120L)
    assert(t2.cursor === 100L)
    assert(t2.runOnce((_, _, _) => ()) === Some((101L, 120L)))
    assert(t2.cursor === 120L)
  }

  test("OpLogTail crash before commit replays the SAME range — never a gap") {
    val ckpt = java.nio.file.Files.createTempDirectory("tail3").toString
    val tail = simulatedTail(ckpt, 100L, () => 150L)
    tail.runOnce((_, _, _) => ())
    assert(tail.cursor === 100L)
    intercept[RuntimeException](tail.runOnce((_, _, _) =>
      throw new RuntimeException("sink crash")))
    assert(tail.cursor === 100L) // commit never happened
    assert(tail.runOnce((_, _, _) => ()) === Some((101L, 150L))) // exact replay
  }
}
