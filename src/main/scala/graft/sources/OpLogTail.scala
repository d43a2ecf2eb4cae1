package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Offset-tracked micro-batch tail of a JDBC op log — the reference's
  * live-sync loop (`database/sql/sync.sql:31-39`: `WHILE plug_enabled
  * LOOP _next_block_range := hive.app_next_block(...)`) re-expressed as
  * an explicit cursor + range feeder over the existing literal-fidelity
  * scan ([[PostgresOpLog.scanSql]]).
  *
  * Spark has no built-in JDBC streaming source, and for an op LOG none is
  * needed: the table is append-only and totally ordered by `block_num`,
  * so "streaming" is exactly (poll head) -> (read `[cursor+1,
  * min(head, cursor+step)]`) -> (process) -> (commit cursor) — the same
  * contract `hive.app_next_block` gives the reference's plpgsql loop.
  * Each emitted range rides the partitioned JDBC read, so one micro-batch
  * is a parallel scan, not a serialized cursor.
  *
  * Delivery: the cursor commits AFTER `process` returns — at-least-once
  * from this feeder, exactly-once end-to-end when the sink is per-batch
  * idempotent, which every engine sink is ([[graft.streaming.PlugRunner]]
  * overwrites per batch id; the dedup sinks overwrite per-batch dirs).
  * A crash between process and commit replays the SAME range (`ranges
  * are a pure function of the committed cursor), so the sink sees a
  * duplicate batch, never a gap.
  *
  * The cursor is one line in `<checkpointDir>/graft_oplog_cursor`,
  * swapped by write-tmp-then-rename (the engine's standard crash-safe
  * commit primitive — [[graft.streaming.PlugRunner.streamOrigin]] uses
  * the identical pattern): a restart resumes from the last committed
  * block, monotonically, with no rescan of history.
  *
  * At 100 TB this loop runs on the driver and moves only block NUMBERS;
  * all data movement is inside the partitioned JDBC scan it launches.
  */
final class OpLogTail(
    spark: SparkSession,
    checkpointDir: String,
    head: () => Long,
    readRange: (Long, Long) => DataFrame,
    step: Long = 100L,
    startAfterBlock: Long = 0L) {

  require(step >= 1, s"step must be >= 1, got $step")

  private val cursorPath = new Path(checkpointDir, "graft_oplog_cursor")
  private val fs = cursorPath.getFileSystem(spark.sessionState.newHadoopConf())

  /** Last PROCESSED-AND-COMMITTED block (inclusive); `startAfterBlock`
    * before the first commit. Read from the checkpoint each call so a
    * restarted instance resumes exactly where the last one committed.
    */
  def cursor: Long =
    if (!fs.exists(cursorPath)) startAfterBlock
    else {
      val in = fs.open(cursorPath)
      val raw = try scala.io.Source.fromInputStream(in).mkString.trim finally in.close()
      // a torn write cannot happen under rename-commit; an unreadable
      // value must fail loudly, not silently restart from zero (which
      // would replay all history into the sinks)
      raw.toLongOption.getOrElse(throw new IllegalStateException(
        s"unreadable op-log cursor at $cursorPath: '$raw'"))
    }

  private def commitCursor(block: Long): Unit = {
    val tmp = new Path(checkpointDir, "graft_oplog_cursor.tmp")
    val out = fs.create(tmp, true)
    try out.write(block.toString.getBytes("UTF-8")) finally out.close()
    fs.delete(cursorPath, false)
    fs.rename(tmp, cursorPath)
  }

  /** The next unprocessed range `[cursor+1, min(head, cursor+step)]`, or
    * None when caught up — `hive.app_next_block` returning NULL ("Waiting
    * for next block...").
    */
  def nextRange(): Option[(Long, Long)] = {
    val cur = cursor
    val h = head()
    if (h <= cur) None else Some((cur + 1, math.min(h, cur + step)))
  }

  /** Emit and process ONE micro-batch. Returns the processed range, or
    * None when caught up. `process` receives (ops, first, last) — the
    * range bounds ARE the batch identity for idempotent sinks.
    */
  def runOnce(process: (DataFrame, Long, Long) => Unit): Option[(Long, Long)] =
    nextRange().map { case (first, last) =>
      process(readRange(first, last), first, last)
      commitCursor(last)
      (first, last)
    }

  /** Drain to the CURRENT head (the backfill-then-live switchover:
    * [[graft.streaming.PlugRunner]]'s T2). Returns ranges processed.
    */
  def runUntilCaughtUp(process: (DataFrame, Long, Long) => Unit,
                       maxBatches: Int = Int.MaxValue): Seq[(Long, Long)] = {
    val done = Seq.newBuilder[(Long, Long)]
    var n = 0
    var more = true
    while (more && n < maxBatches) runOnce(process) match {
      case Some(r) => done += r; n += 1
      case None => more = false
    }
    done.result()
  }
}

object OpLogTail {

  /** Production wiring: head = `MAX(block_num)` via a one-row JDBC probe,
    * ranges = the partitioned [[PostgresOpLog.read]] scan. Untestable in
    * this environment (no Postgres) — the loop mechanics are spec-covered
    * through a simulated feed, and this factory only binds them to the
    * unit-tested scan construction.
    */
  def jdbc(spark: SparkSession, checkpointDir: String, url: String,
           opTypeIds: Set[Int], step: Long = 100L,
           numPartitions: Int = 8, props: Map[String, String] = Map.empty,
           startAfterBlock: Long = 0L): OpLogTail =
    new OpLogTail(
      spark, checkpointDir,
      head = () => {
        val opts = Map("url" -> url,
          "dbtable" -> "(SELECT COALESCE(MAX(block_num), 0) AS h FROM hive.operations_view) AS head_probe") ++ props
        spark.read.format("jdbc").options(opts).load()
          .collect()(0).getLong(0)
      },
      readRange = (first, last) =>
        PostgresOpLog.read(spark, url, first, last, opTypeIds, numPartitions, props),
      step = step, startAfterBlock = startAfterBlock)
}
