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
  * The cursor is a VERSIONED marker file
  * `<checkpointDir>/graft_oplog_cursor.v<block>` — the file NAME carries
  * the committed block, and a commit is one create-new rename (tmp →
  * versioned name), which is atomic on every Hadoop filesystem. The
  * previous delete-then-rename swap of a single unversioned file had a
  * crash window (between the delete and the rename) in which NO cursor
  * existed, and `cursor` would then silently restart from
  * `startAfterBlock` — replaying all history into the sinks, the exact
  * failure the loud-parse contract below forbids. With versioned names
  * there is no window: every crash point leaves at least the prior
  * version on disk (older versions are deleted only AFTER the new one is
  * committed, and that delete is pure GC — `cursor` reads the MAX
  * version). A restart resumes from the last committed block,
  * monotonically, with no rescan of history.
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

  private val ckptPath = new Path(checkpointDir)
  private val legacyPath = new Path(checkpointDir, "graft_oplog_cursor")
  private val fs = ckptPath.getFileSystem(spark.sessionState.newHadoopConf())
  private val VersionPrefix = "graft_oplog_cursor.v"

  /** Committed cursor versions on disk, parsed from the file NAMES (the
    * name is written by one atomic create-new rename, so it can never be
    * torn the way file CONTENT under a non-atomic swap could).
    */
  private def versionsOnDisk(): Seq[Long] =
    if (!fs.exists(ckptPath)) Seq.empty
    else fs.listStatus(ckptPath).toSeq
      .map(_.getPath.getName)
      .filter(n => n.startsWith(VersionPrefix) && !n.endsWith(".tmp"))
      .map { n =>
        val raw = n.stripPrefix(VersionPrefix)
        // an unparseable version must fail loudly, not silently restart
        // from zero (which would replay all history into the sinks)
        raw.toLongOption.getOrElse(throw new IllegalStateException(
          s"unreadable op-log cursor version at $ckptPath/$n"))
      }

  /** Last PROCESSED-AND-COMMITTED block (inclusive); `startAfterBlock`
    * before the first commit. Read from the checkpoint each call so a
    * restarted instance resumes exactly where the last one committed.
    * The max over versioned markers (plus a legacy single-file cursor
    * from a pre-versioning checkpoint, read once and honored the same
    * way) — a crash between a version commit and the old-version GC
    * leaves two markers, and max() picks the committed one.
    */
  def cursor: Long = {
    val legacy =
      if (!fs.exists(legacyPath)) None
      else {
        val in = fs.open(legacyPath)
        val raw = try scala.io.Source.fromInputStream(in).mkString.trim finally in.close()
        Some(raw.toLongOption.getOrElse(throw new IllegalStateException(
          s"unreadable op-log cursor at $legacyPath: '$raw'")))
      }
    (versionsOnDisk() ++ legacy).maxOption.getOrElse(startAfterBlock)
  }

  private def commitCursor(block: Long): Unit = {
    val target = new Path(checkpointDir, s"$VersionPrefix$block")
    val tmp = new Path(checkpointDir, s"$VersionPrefix$block.tmp")
    val out = fs.create(tmp, true)
    try out.write(block.toString.getBytes("UTF-8")) finally out.close()
    // create-new rename: atomic, and the only commit point. A replayed
    // range re-committing the same block finds the target already present
    // (rename returns false) — the commit already happened; drop the tmp.
    if (!fs.rename(tmp, target)) {
      if (!fs.exists(target)) throw new IllegalStateException(
        s"op-log cursor commit failed: could not rename $tmp -> $target")
      fs.delete(tmp, false)
    }
    // GC AFTER the new version is durable — a crash before or during this
    // sweep leaves extra markers that cursor's max() already supersedes,
    // plus possibly an orphaned .tmp from a crashed earlier commit, which
    // is never read and swept here
    versionsOnDisk().filter(_ < block)
      .foreach(v => fs.delete(new Path(checkpointDir, s"$VersionPrefix$v"), false))
    fs.listStatus(ckptPath).toSeq.map(_.getPath)
      .filter(p => p.getName.startsWith(VersionPrefix) && p.getName.endsWith(".tmp"))
      .foreach(fs.delete(_, false))
    fs.delete(legacyPath, false)
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
