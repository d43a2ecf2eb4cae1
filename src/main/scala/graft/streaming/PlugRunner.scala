package graft.streaming

import graft.plugs.Plug
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured-Streaming execution of a plug (reference: the hand-rolled
  * PL/pgSQL micro-batch loop `hpp.sync_plug`, database/sql/sync.sql:31-39 +
  * per-chunk cursor commit :106-111).
  *
  * Spark mapping: source offsets + checkpointing replace `app_next_block` /
  * `plug_state` cursors (T1-T3); `foreachBatch` applies the plug transform
  * and writes sinks *idempotently* so replays after failure are
  * exactly-once:
  *
  *  - append tables land under `_batch_id=<id>` partitions with dynamic
  *    partition overwrite — a replayed batch overwrites its own partition
  *    and nothing else;
  *  - stateful tables go through [[ParquetStateStore]]: state version N is
  *    derived from the latest version < N plus batch N, so recomputing
  *    batch N is a pure overwrite of version N.
  */
class PlugRunner(
    plug: Plug,
    outDir: String,
    mergeFns: Map[String, (Option[DataFrame], Map[String, DataFrame]) => DataFrame] = Map.empty) {

  /** Coarse block bucket for sink partitioning (~3.5 days of chain per
    * directory at 1 block / 3 s).
    */
  val BlockBucketSize: Int = 100000

  def tableDir(name: String): String = s"$outDir/${plug.name}/$name"

  /** Process one micro-batch (callable directly for batch backfill — the
    * reference's "massive sync" mode, sync.sql:58-77, is exactly this
    * function over a historical block range).
    *
    * Append tables carrying `block_num` are additionally partitioned by a
    * coarse block bucket — the storage-layout replacement for the
    * reference's B-tree indexes on block_num (SURVEY §4): block-range
    * predicates (F1) prune whole directories at scan planning time.
    */
  /** How many state versions to retain after each commit: old versions
    * only exist to serve replay of *their* batch, and the stream is never
    * more than one batch behind — keep the committed version plus its
    * predecessor. Without pruning the version directories grow without
    * bound (directory-listing cost at high batch counts).
    */
  val StateKeepLast: Int = 2

  def processBatch(batch: DataFrame, batchId: Long): Unit = {
    val tables = plug.transform(batch)
    tables.foreach { case (name, df) =>
      mergeFns.get(name) match {
        case Some(fn) =>
          val store = new ParquetStateStore(df.sparkSession, tableDir(name))
          val prior = store.readBefore(batchId)
          store.commit(batchId, fn(prior, tables))
          store.prune(StateKeepLast)
        case None =>
          val withBatch = df.withColumn("_batch_id", lit(batchId))
          val (partCols, out) =
            if (df.columns.contains("block_num"))
              (Seq("_batch_id", "_block_bucket"),
                withBatch.withColumn("_block_bucket",
                  expr(s"CAST(block_num DIV $BlockBucketSize AS INT)")))
            else (Seq("_batch_id"), withBatch)
          out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(partCols: _*)
            .parquet(tableDir(name))
          // manifest commit: record the batch id in the one-file commit
          // record (idempotent — a replayed id is already a member). The
          // data write lands first, so a crash between the two replays
          // the batch (offsets commit after processBatch) and re-runs
          // both steps. An EMPTY batch writes no partition directory at
          // all (dynamic overwrite of zero rows), so membership is
          // gated on the directory existing — recording a dir-less id
          // would point readers at a nonexistent path.
          val bDir = new org.apache.hadoop.fs.Path(
            tableDir(name), s"_batch_id=$batchId")
          val bFs = bDir.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
          if (bFs.exists(bDir)) {
            val m = manifest(df.sparkSession, name)
            writeManifest(df.sparkSession, name,
              m.copy(live = (m.live.toSet + batchId).toSeq.sorted))
          }
          // keep the directory count bounded: once enough per-batch
          // partitions accumulate, fold everything before this batch into
          // a compact segment (ids < batchId are past their replay window
          // — their source offsets committed before this batch started)
          if (CompactEvery > 0 && manifest(df.sparkSession, name).live.size >= CompactEvery)
            compactAppends(df.sparkSession, name, batchId - 1)
      }
    }
    // engine metadata (hpp.plug_state equivalent, §1.1-B): cursor + check-in
    PlugState.checkIn(batch.sparkSession, outDir, plug.name, batchId, batch)
  }

  /** Batch backfill over a historical block range in bounded chunks — the
    * reference's catch-up/massive-sync mode (T2): process the history as
    * plain batches (no streaming state), then start the stream from the
    * cursor. Chunking mirrors `_step := 100` (sync.sql:59) scaled up;
    * each chunk is an idempotent processBatch keyed by its ordinal.
    */
  def backfill(ops: DataFrame, first: Long, last: Long,
               chunk: Long = 100000, batchIdBase: Long = 0): Long = {
    val ranges = graft.serving.ApiShaping.rangeSplit(first, last, chunk)
    ranges.zipWithIndex.foreach { case ((lo, hi), i) =>
      processBatch(
        ops.filter(col("block_num").between(lo, hi)), batchIdBase + i)
    }
    batchIdBase + ranges.size
  }

  /** Stream batch ids restart at 0 with a fresh checkpoint, which would
    * collide with partitions a prior [[backfill]] wrote under the same
    * `_batch_id` key space (dynamic partition overwrite would clobber
    * them); and a stream pointed at a source overlapping the backfilled
    * history would re-ingest it. On first start each checkpoint pins the
    * stream's origin — batch-id base = cursor batch + 1, block cursor =
    * cursor block (the reference's `app_next_block` resume,
    * sync.sql:31-39) — and restarts reuse the pinned origin so replays
    * stay idempotent.
    */
  private def streamOrigin(spark: SparkSession, checkpoint: String): (Long, Long) = {
    // Hadoop FS, not java.io: checkpointLocation is any Hadoop path
    // (file:, hdfs:, s3a:, ...) — a java.io.File of a URI string would
    // silently resolve elsewhere and re-derive a different origin per
    // start, which is exactly the non-idempotence this file prevents.
    val path = new org.apache.hadoop.fs.Path(checkpoint, "graft_stream_origin")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def parse(raw: String): Option[(Long, Long)] = raw.trim.split(",") match {
      case Array(a, b) =>
        for (x <- a.toLongOption; y <- b.toLongOption) yield (x, y)
      case _ => None
    }
    val pinned =
      if (!fs.exists(path)) None
      else {
        val in = fs.open(path)
        val raw = try scala.io.Source.fromInputStream(in).mkString finally in.close()
        // tolerate a torn write (crash mid-create): fall through and
        // re-derive + re-pin instead of bricking every future start
        parse(raw)
      }
    pinned.getOrElse {
      // Base must clear EVERY committed batch id, not just the last one
      // with a non-null cursor: trailing empty batches still committed
      // state versions and check-ins, and colliding with them would make
      // readBefore(base) miss the prior state (post-prune) and silently
      // rebuild merge tables from scratch.
      val maxCheckIn = scala.util.Try(PlugState.maxBatchId(spark, outDir, plug.name))
        .toOption.flatten
      val maxMerge = mergeFns.keys
        .flatMap(n => new ParquetStateStore(spark, tableDir(n)).latestVersion)
        .reduceOption(_ max _)
      val base = (maxCheckIn.toSeq ++ maxMerge.toSeq)
        .map(_ + 1).maxOption.getOrElse(0L)
      val cursor = scala.util.Try(PlugState.latest(spark, outDir, plug.name))
        .toOption.flatten
      val origin = (base, cursor.map(_._2).getOrElse(-1L))
      // write-then-rename so a crash can't leave a half-written pin
      val tmp = new org.apache.hadoop.fs.Path(checkpoint, "graft_stream_origin.tmp")
      val out = fs.create(tmp, true)
      try out.write(s"${origin._1},${origin._2}".getBytes("UTF-8")) finally out.close()
      fs.delete(path, false)
      fs.rename(tmp, path)
      origin
    }
  }

  def start(source: DataFrame, checkpoint: String,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val (base, afterBlock) = streamOrigin(source.sparkSession, checkpoint)
    val fresh =
      if (afterBlock >= 0) source.filter(col("block_num") > afterBlock) else source
    fresh.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) => processBatch(batch, base + id) }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
  }

  /** Auto-compaction threshold for append tables: once this many live
    * `_batch_id=` partitions accumulate, [[processBatch]] folds them into
    * a segment. 0 disables. The point is bounded directory counts: a
    * year of minutely batches is ~500k directories, and every planner
    * listing pays for all of them; with folding it's
    * `CompactEvery + batches/CompactEvery` segment dirs.
    */
  val CompactEvery: Int = 64

  /** Segment-tier roll-up threshold: incremental folds still accumulate
    * one `_compact/v=` dir per [[CompactEvery]] batches forever (the
    * same unbounded-directory class, one level up — ~450 new segment
    * dirs/day at production block rates). Once this many segments are
    * committed they merge into ONE cumulative `_compact/m=<W>` dir
    * holding every batch `<= W`; the manifest's `merged` field commits
    * the swap atomically. The merge rewrites the table, amortized to
    * once per `MergeSegmentsAt * CompactEvery` batches — the LSM trade
    * that keeps the table's directory count bounded by
    * `MergeSegmentsAt + CompactEvery + 1` for the stream's lifetime.
    * 0 disables.
    */
  val MergeSegmentsAt: Int = 8

  private def appendStore(spark: SparkSession, name: String) =
    new ParquetStateStore(spark, s"${tableDir(name)}/_compact")

  /** The cumulative-merge dirs (`_compact/m=<W>`) as a store — the same
    * committed-version listing protocol as the segment tier, reused via
    * [[ParquetStateStore]]'s prefix parameter rather than re-implemented.
    * Only the manifest's `merged` entry is live data; other committed
    * dirs are strays a crashed merge left for GC.
    */
  private def mergedStore(spark: SparkSession, name: String) =
    new ParquetStateStore(spark, s"${tableDir(name)}/_compact", "m=")

  /** The append table's one-file commit record: which segment watermarks
    * and which live batch ids are committed. Readers and the compaction
    * trigger consult THIS, not a directory listing — at object-store
    * scale LIST is the slow (and on some stores eventually-consistent)
    * operation, and a 500k-batch year of `_batch_id=` history would pay
    * it on every plan. One `open` + `rename` pair per commit instead.
    *
    * Format: a single line `2|m|w1,w2|b1,b2,b3` (version | cumulative
    * merged watermark or empty | ascending segment watermarks | ascending
    * live batch ids), swapped into place by write-tmp-then-rename — the
    * same commit primitive Spark's own HDFSMetadataLog uses (atomic on
    * HDFS/local; object-store deployments point checkpoints at a
    * rename-capable store for the same reason). Version-1 records
    * (`1|segs|live`, pre-merge-tier) parse with `merged = None`.
    */
  private[streaming] case class AppendManifest(segments: Seq[Long], live: Seq[Long],
                                               merged: Option[Long] = None)

  private def manifestPath(name: String) =
    new org.apache.hadoop.fs.Path(tableDir(name), "_append_manifest")

  /** Read the manifest; if absent (pre-manifest layout, or first write),
    * derive it from a one-time directory listing — the migration path
    * for tables written before the manifest existed.
    */
  private[streaming] def manifest(spark: SparkSession, name: String): AppendManifest = {
    val path = manifestPath(name)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parsed =
      if (!fs.exists(path)) None
      else {
        val in = fs.open(path)
        val raw = try scala.io.Source.fromInputStream(in).mkString finally in.close()
        // tolerate a torn write (crash mid-create should be impossible
        // under rename, but a corrupt record must re-derive, not brick)
        def ids(s: String): Option[Seq[Long]] =
          if (s.isEmpty) Some(Nil)
          else {
            val parts = s.split(",").toSeq.map(_.toLongOption)
            if (parts.forall(_.isDefined)) Some(parts.flatten) else None
          }
        raw.trim.split("\\|", -1) match {
          case Array("1", segs, live) =>
            for (s <- ids(segs); l <- ids(live)) yield AppendManifest(s, l)
          case Array("2", merged, segs, live) =>
            for {
              m <- if (merged.isEmpty) Some(None)
                   else merged.toLongOption.map(Some(_))
              s <- ids(segs); l <- ids(live)
            } yield AppendManifest(s, l, m)
          case _ => None
        }
      }
    parsed.getOrElse {
      // pre-manifest (or deleted-manifest) derivation from one listing:
      // the highest committed merge supersedes everything at or below it
      val merged = mergedStore(spark, name).latestVersion
      val mw = merged.getOrElse(-1L)
      AppendManifest(
        appendStore(spark, name).allVersions.filter(_ > mw),
        listBatchIds(spark, name), merged)
    }
  }

  private[streaming] def writeManifest(spark: SparkSession, name: String,
                                       m: AppendManifest): Unit = {
    val path = manifestPath(name)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(tableDir(name), "._append_manifest.tmp")
    val out = fs.create(tmp, true)
    try out.write(
      s"2|${m.merged.map(_.toString).getOrElse("")}|${m.segments.mkString(",")}|${m.live.mkString(",")}"
        .getBytes("UTF-8"))
    finally out.close()
    fs.delete(path, false)
    fs.rename(tmp, path)
  }

  /** Batch-id partitions currently on disk for an append table — the
    * manifest-derivation fallback only; committed membership is the
    * manifest's.
    */
  private def listBatchIds(spark: SparkSession, name: String): Seq[Long] = {
    val root = new org.apache.hadoop.fs.Path(tableDir(name))
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith("_batch_id="))
      .map(_.stripPrefix("_batch_id=").toLong).sorted
  }

  /** Fold append batches `<= upToBatch` into one compact segment — the
    * manifest-commit answer to per-batch partition sprawl (NOTES: the
    * batch-id overwrite sink is "correct but directory-heavy at high
    * batch counts").
    *
    * Protocol: a segment `_compact/v=W` holds every batch in
    * `(prevW, W]`; the version number IS the fold watermark, committed
    * atomically by the parquet `_SUCCESS` marker. Readers take all
    * segments plus only batch dirs `> maxW`, so the deletion of folded
    * dirs afterwards is pure GC — a crash between commit and delete
    * leaves stale dirs that every reader already excludes, and a replayed
    * backfill chunk that re-materializes a folded id is excluded the same
    * way. Folding is incremental (each segment reads only its own
    * batches, never prior segments), so compaction cost is O(new data).
    *
    * Only call with `upToBatch` strictly below any batch id that may
    * still replay; [[processBatch]]'s auto-trigger uses `batchId - 1`,
    * whose source offsets committed before the current batch started.
    */
  def compactAppends(spark: SparkSession, name: String, upToBatch: Long): Unit = {
    require(!mergeFns.contains(name),
      s"$name is a merge table; its state store already compacts via prune")
    val store = appendStore(spark, name)
    val m = manifest(spark, name)
    // the MANIFEST decides progress, not the segment listing: a crash
    // between segment commit and manifest swap leaves a committed-but-
    // unreferenced segment, and the re-trigger must re-fold (idempotent
    // overwrite of the same version) rather than skip and strand the
    // manifest behind the segment store forever
    val prevW = math.max(m.merged.getOrElse(-1L),
      m.segments.lastOption.getOrElse(-1L))
    if (upToBatch <= prevW) return
    val foldable = m.live.filter(n => n > prevW && n <= upToBatch)
    if (foldable.isEmpty) return
    val dir = tableDir(name)
    val seg = spark.read.option("basePath", dir)
      .parquet(foldable.map(n => s"$dir/_batch_id=$n"): _*)
      .withColumn("_batch_id", col("_batch_id").cast("long"))
    val partCols = if (seg.columns.contains("_block_bucket")) Seq("_block_bucket") else Nil
    store.commit(upToBatch, seg, partCols)
    // everything <= the new watermark leaves the live set: the foldable
    // ids just landed in the segment, and any OTHER live id below the
    // watermark is a replayed-folded stray whose data a segment already
    // holds (readers were excluding it by the watermark rule; now its
    // dir gets GC'd too)
    val newLive = m.live.filter(_ > upToBatch)
    val folded = m.copy(
      segments = (m.segments :+ upToBatch).distinct.sorted, live = newLive)
    writeManifest(spark, name, folded)
    // GC last — everything below runs after the new manifest is visible,
    // so a crash anywhere here leaves only dirs every reader already
    // excludes. The listing (one per compaction, not per read) also
    // sweeps strays a previous crash-between-swap-and-GC left behind.
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    listBatchIds(spark, name)
      .filter(n => n <= upToBatch && !newLive.contains(n))
      .foreach(n =>
        fs.delete(new org.apache.hadoop.fs.Path(root, s"_batch_id=$n"), true))
    // the manifest just written is passed through — no re-read of the
    // file this method wrote moments ago
    mergeAppendSegments(spark, name, folded)
  }

  /** The SEGMENT-tier roll-up (see [[MergeSegmentsAt]]): once the
    * manifest lists enough incremental segments, rewrite (current merged
    * segment, if any) + all listed segments into one cumulative
    * `_compact/m=<maxW>` dir holding every batch `<= maxW`. Commit order
    * mirrors [[compactAppends]]: data first (parquet `_SUCCESS`), the
    * manifest swap is THE commit (merged=maxW, segments emptied), GC of
    * the superseded inputs strictly last — a crash at any point leaves
    * either the old manifest (stray m-dir ignored, idempotently
    * overwritten on re-trigger) or the new one (leftover v-dirs/old
    * m-dirs are ignored strays the next merge's GC sweeps).
    */
  private def mergeAppendSegments(spark: SparkSession, name: String,
                                  m: AppendManifest): Unit = {
    if (MergeSegmentsAt <= 0 || m.segments.size < MergeSegmentsAt) return
    val dir = tableDir(name)
    val maxW = m.segments.max
    val inputs =
      m.merged.map(w => s"$dir/_compact/m=$w").toSeq ++
        m.segments.map(w => s"$dir/_compact/v=$w")
    // per-dir reads + unionByName (NOT one multi-path read: segments may
    // be partitioned by _block_bucket, and multi-root partition
    // discovery needs a common base these dirs don't share)
    val all = inputs.map(spark.read.parquet(_)).reduce(_.unionByName(_))
    val partCols =
      if (all.columns.contains("_block_bucket")) Seq("_block_bucket") else Nil
    val w = all.write.mode("overwrite")
    (if (partCols.nonEmpty) w.partitionBy(partCols: _*) else w)
      .parquet(s"$dir/_compact/m=$maxW")
    writeManifest(spark, name,
      AppendManifest(Nil, m.live.filter(_ > maxW), Some(maxW)))
    // GC strictly last, COMMITTED OR NOT: an uncommitted m=/v= dir below
    // the watermark is a dead partial write from an earlier crash (the
    // fold/merge path is single-threaded per runner, so it can never be
    // a concurrent writer), and a committed one is a superseded stray —
    // every reader already takes merged=maxW from the manifest. Sweeping
    // only committed dirs would leak a near-table-sized partial per
    // crash, breaking the lifetime directory bound this tier exists for.
    mergedStore(spark, name).deleteUpTo(maxW, inclusive = false)
    appendStore(spark, name).deleteUpTo(maxW, inclusive = true)
  }

  /** Read the current contents of a derived table. Append tables are the
    * union of the manifest's compact segments and its live batch
    * partitions above the fold watermark (see [[compactAppends]] for why
    * manifest membership, not directory presence, decides — a replayed
    * backfill chunk can re-materialize a folded id's directory, and a
    * crashed compaction can leave folded dirs behind; both are excluded
    * here without any listing).
    */
  def table(spark: SparkSession, name: String): DataFrame =
    if (mergeFns.contains(name))
      new ParquetStateStore(spark, tableDir(name)).read()
        .getOrElse(spark.emptyDataFrame)
    else {
      val dir = tableDir(name)
      val m = manifest(spark, name)
      if (m.segments.isEmpty && m.live.isEmpty && m.merged.isEmpty)
        // nothing committed (or a pre-manifest dir with nothing listable):
        // let the plain read surface its own empty-path semantics
        spark.read.parquet(dir).drop("_batch_id", "_block_bucket")
      else {
        val mw = m.merged.getOrElse(-1L)
        val maxW = math.max(mw, m.segments.lastOption.getOrElse(-1L))
        val mergedFrames = m.merged.toSeq.map(w =>
          spark.read.parquet(s"$dir/_compact/m=$w")
            .drop("_batch_id", "_block_bucket"))
        val segFrames = m.segments.filter(_ > mw).map(w =>
          spark.read.parquet(s"$dir/_compact/v=$w")
            .drop("_batch_id", "_block_bucket"))
        val live = m.live.filter(_ > maxW)
        val liveFrames =
          if (live.isEmpty) Nil
          else Seq(spark.read.option("basePath", dir)
            .parquet(live.map(n => s"$dir/_batch_id=$n"): _*)
            .drop("_batch_id", "_block_bucket"))
        (mergedFrames ++ segFrames ++ liveFrames).reduce(_.unionByName(_))
      }
    }

  /** Fork recovery — truncate-and-replay from the fork point (T7 hard
    * path). The irreversibility watermark ([[graft.core.OpLog
    * .finalizedOnly]]) keeps ordinary forks out of derived state
    * entirely: blocks inside the horizon are never ingested, so a
    * re-emission with a different trx set simply arrives later as the
    * only version the engine ever sees. This method is the recovery for
    * the PAST-HORIZON emergency the reference handles with HAF cascade
    * deletes (plugs/podping/tables.sql:12-16): roll every sink back to
    * the state as of batches `< fromBatch` (the first batch that
    * ingested a forked block — the truncation unit is the batch), then
    * restart the stream with a FRESH checkpoint over the corrected feed.
    * The stream-origin pin re-derives base/cursor from the surviving
    * check-ins, so replay resumes exactly at the fork point and a fresh
    * build over the corrected chain is reproduced (pinned by spec).
    *
    * Bounds (enforced loudly, both by the depth the retention knobs
    * allow): append tables must not have folded `>= fromBatch` batches
    * into a compact segment (compaction lags by [[CompactEvery]], far
    * deeper than any watermark-bounded fork), and merge tables must
    * still retain a state version below the fork ([[StateKeepLast]]).
    * EVERY bound is validated before ANYTHING is mutated, so a
    * too-deep fork fails with all sinks and the cursor untouched —
    * never a half-truncated mix. The mutation order is cursor FIRST,
    * sinks after: once the check-ins report the pre-fork cursor, any
    * restart replays from the fork point (overwriting leftover
    * post-fork batch dirs idempotently), whereas the reverse order
    * would open a crash window where the cursor is post-fork while
    * sinks are pre-fork and a restart silently skips the truncated
    * range. The method is idempotent — after a crash mid-truncation,
    * re-run it to completion before restarting the stream (required
    * for merge tables, whose fold reads the latest retained version).
    */
  def truncateFromBatch(spark: SparkSession, tableNames: Seq[String],
                        fromBatch: Long): Unit = {
    // phase 1 — validate every retention bound up front; no mutation
    // happens unless every table (and the cursor history) can roll back
    val planned: Seq[(String, Either[ParquetStateStore, AppendManifest])] =
      tableNames.map { name =>
        if (mergeFns.contains(name)) {
          val st = new ParquetStateStore(spark, tableDir(name))
          st.validateTruncateFrom(fromBatch)
          name -> Left(st)
        } else {
          val m = manifest(spark, name)
          require((m.segments ++ m.merged).forall(_ < fromBatch),
            s"append table $name folded batches >= $fromBatch into segments " +
              s"(watermarks ${(m.segments ++ m.merged).mkString(",")}) — fork " +
              "deeper than the compaction lag; rebuild the table from scratch")
          name -> Right(m)
        }
      }
    PlugState.validateTruncateFrom(spark, outDir, plug.name, fromBatch)
    // phase 2 — cursor first (see scaladoc), then the sinks
    PlugState.truncateFrom(spark, outDir, plug.name, fromBatch)
    planned.foreach {
      case (_, Left(store)) => store.truncateFrom(fromBatch)
      case (name, Right(m)) =>
        val keep = m.live.filter(_ < fromBatch)
        if (keep.size != m.live.size) {
          // manifest first: readers exclude the doomed ids the instant it
          // swaps; the dir deletes after are pure GC (crash-safe, same
          // order as compactAppends)
          writeManifest(spark, name, m.copy(live = keep))
          val root = new org.apache.hadoop.fs.Path(tableDir(name))
          val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
          m.live.filter(_ >= fromBatch).foreach(n =>
            fs.delete(new org.apache.hadoop.fs.Path(root, s"_batch_id=$n"), true))
        }
    }
  }

  /** DDL-at-boot (S9; reference `database/haf.py:38-47,72-84` runs
    * idempotent CREATE SCHEMA/TABLE from per-plug .sql files): register
    * the plug's namespace and its sink directories as external tables in
    * the session catalog, so `spark.sql("SELECT ... FROM podping.updates")`
    * works like the reference's `<plug>.<table>` queries. Idempotent —
    * IF NOT EXISTS on both levels, safe to call at every boot.
    *
    * Stateful (merge-fn) tables are registered as `<plug>_<table>` temp
    * views over the latest committed version — a SNAPSHOT: the view pins
    * that version's directory, which `prune` retires as the stream
    * advances, so re-register (re-run this method) to refresh; tables
    * with no committed version yet are skipped rather than bound to an
    * empty schemaless frame.
    */
  def registerCatalog(spark: SparkSession, tableNames: Seq[String]): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS ${plug.name}")
    tableNames.foreach { name =>
      if (mergeFns.contains(name))
        new ParquetStateStore(spark, tableDir(name)).read()
          .foreach(_.createOrReplaceTempView(s"${plug.name}_$name"))
      else if ({ val m = manifest(spark, name)
                 m.segments.nonEmpty || m.merged.nonEmpty })
        // compacted: data lives in `_compact` segment/merged dirs the
        // external-table path can't see (hidden dir) — register the
        // watermark-aware union as a view, same refresh contract as the
        // merge tables. The merged check matters on its own: right after
        // a segment-tier merge the segments list is EMPTY while all
        // history sits under `merged`, and the raw-location fallback
        // would silently serve only the few live batch dirs.
        table(spark, name).createOrReplaceTempView(s"${plug.name}_$name")
      else {
        // nothing written yet -> schema inference would fail; register on
        // a later boot once the first batch has landed (same not-yet-
        // committed guard the merge tables get above)
        val dir = new org.apache.hadoop.fs.Path(tableDir(name))
        val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(dir)) {
          spark.sql(
            s"""CREATE TABLE IF NOT EXISTS ${plug.name}.$name
               |USING PARQUET LOCATION '${tableDir(name)}'""".stripMargin)
          // sinks are partitioned (_batch_id / _block_bucket): sync the
          // catalog's partition list with the directories on every boot
          spark.sql(s"MSCK REPAIR TABLE ${plug.name}.$name")
        }
      }
    }
  }
}

/** Engine metadata (reference `hpp.plug_state`, database/sql/tables.sql:8-15):
  * one row per processed batch — cursor (latest block), block time, wall
  * check-in. Mostly subsumed by Structured Streaming checkpoints; kept as a
  * queryable table because the status API (E3) reads it.
  */
object PlugState {

  /** Check-in directories retained verbatim; older ones fold into the
    * roll-up (see [[prune]]). Folding triggers at 2x this count so the
    * listing+fold cost amortizes to O(1) per batch instead of running
    * every check-in.
    */
  val KeepLast: Int = 8

  def checkIn(spark: SparkSession, outDir: String, plugName: String,
              batchId: Long, batch: DataFrame): Unit = {
    val cursor = batch.agg(
      max(col("block_num")).as("latest_block_num"),
      max(col("timestamp")).as("latest_block_time"))
    cursor
      .withColumn("plug", lit(plugName))
      .withColumn("batch_id", lit(batchId))
      .withColumn("check_in", current_timestamp())
      .write.mode("overwrite").parquet(s"$outDir/$plugName/_plug_state/v=$batchId")
    prune(spark, outDir, plugName)
  }

  private def stateRoot(outDir: String, plugName: String) =
    new org.apache.hadoop.fs.Path(s"$outDir/$plugName/_plug_state")

  private def versionIds(fs: org.apache.hadoop.fs.FileSystem,
                         root: org.apache.hadoop.fs.Path): Seq[Long] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith("v="))
      .map(_.stripPrefix("v=").toLong).sorted

  /** Bound the check-in directory count: without this, one `v=N` dir per
    * batch accumulates forever (a year of minutely batches is ~500k
    * directories, and [[read]]'s glob lists all of them on every status /
    * origin probe). Everything older than the newest [[KeepLast]] dirs
    * folds into a 1-2 row roll-up written AS the newest folded version
    * (`v=maxFolded`), so readers need no new code path. The roll-up
    * preserves exactly what the two consumers derive from history:
    *
    *  - the newest non-null-cursor row verbatim (for [[latest]] — the
    *    status endpoint and stream-origin block cursor), and
    *  - a null-cursor watermark row carrying the max folded batch id
    *    (for [[maxBatchId]] — batch-id allocation), when that id's own
    *    check-in had no cursor.
    *
    * The reference's `hpp.plug_state` is a single row per plug updated in
    * place (database/sql/tables.sql:8-15), so folding history is faithful;
    * the retained window is purely operational telemetry. Crash-safe:
    * the summary lands in a hidden tmp dir (invisible to the `v=*` glob)
    * and replaces `v=maxFolded` by rename; a crash before the source-dir
    * deletes leaves rows the roll-up already subsumes (duplicates change
    * neither argmax nor max), and the next check-in re-folds them.
    */
  def prune(spark: SparkSession, outDir: String, plugName: String,
            keepLast: Int = KeepLast): Unit = {
    val root = stateRoot(outDir, plugName)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val vs = versionIds(fs, root)
    if (vs.size <= 2 * keepLast) return
    val foldIds = vs.dropRight(keepLast)
    val folded = spark.read.parquet(foldIds.map(v => s"$root/v=$v"): _*)
    val schema = folded.schema
    val all = folded.collect().toSeq // 1 row/dir + <=2 in a prior roll-up
    val idOf = schema.fieldIndex("batch_id")
    val blockOf = schema.fieldIndex("latest_block_num")
    val maxId = foldIds.max
    val cursorRow = all.filter(!_.isNullAt(blockOf))
      .sortBy(_.getLong(idOf)).lastOption
    val watermark =
      if (cursorRow.exists(_.getLong(idOf) == maxId)) None
      else all.find(_.getLong(idOf) == maxId).map { r =>
        org.apache.spark.sql.Row.fromSeq(
          r.toSeq.zipWithIndex.map { case (v, i) =>
            if (i == blockOf || i == schema.fieldIndex("latest_block_time")) null else v
          })
      }
    val summary = spark.createDataFrame(
      spark.sparkContext.parallelize((cursorRow.toSeq ++ watermark.toSeq).toList, 1), schema)
    val tmp = new org.apache.hadoop.fs.Path(root, ".rollup_tmp")
    summary.write.mode("overwrite").parquet(tmp.toString)
    val target = new org.apache.hadoop.fs.Path(root, s"v=$maxId")
    fs.delete(target, true)
    fs.rename(tmp, target)
    foldIds.filter(_ != maxId)
      .foreach(v => fs.delete(new org.apache.hadoop.fs.Path(root, s"v=$v"), true))
  }

  def read(spark: SparkSession, outDir: String, plugName: String): DataFrame =
    spark.read.parquet(s"$outDir/$plugName/_plug_state/v=*")

  /** Highest committed batch id regardless of cursor content — empty
    * batches check in with a null cursor but still own their batch id
    * (and state version); anything allocating NEW batch ids must clear
    * this, not [[latest]].
    */
  def maxBatchId(spark: SparkSession, outDir: String, plugName: String): Option[Long] = {
    val r = read(spark, outDir, plugName).agg(max(col("batch_id"))).collect().head
    if (r.isNullAt(0)) None else Some(r.getLong(0))
  }

  /** Latest cursor per plug — the status-endpoint scan (S3). Check-ins of
    * empty batches carry a null cursor and are skipped (the cursor is the
    * newest batch that actually advanced the block high-water mark).
    */
  def latest(spark: SparkSession, outDir: String, plugName: String): Option[(Long, Long)] = {
    val rows = read(spark, outDir, plugName)
      .filter(col("latest_block_num").isNotNull)
      .orderBy(col("batch_id").desc).limit(1).collect()
    rows.headOption.map { r =>
      (r.getAs[Long]("batch_id"), r.getAs[Int]("latest_block_num").toLong)
    }
  }

  /** Fork rollback of the check-in history: drop every `v >= fromBatch`
    * so [[latest]]/[[maxBatchId]] answer as of the pre-fork cursor (the
    * stream-origin pin then resumes the feed from the fork point). Same
    * retained-window rule as [[ParquetStateStore.truncateFrom]]: the
    * roll-up ([[prune]]) may have folded history, so a rollback reaching
    * past every surviving check-in fails loudly instead of erasing the
    * cursor entirely.
    */
  def truncateFrom(spark: SparkSession, outDir: String, plugName: String,
                   fromBatch: Long): Unit = {
    validateTruncateFrom(spark, outDir, plugName, fromBatch)
    val root = stateRoot(outDir, plugName)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    versionIds(fs, root).filter(_ >= fromBatch).foreach(v =>
      fs.delete(new org.apache.hadoop.fs.Path(root, s"v=$v"), true))
  }

  /** The retained-check-in bound of [[truncateFrom]] alone, mutation-free
    * (same validate-all-before-mutating contract as
    * [[ParquetStateStore.validateTruncateFrom]]).
    */
  def validateTruncateFrom(spark: SparkSession, outDir: String,
                           plugName: String, fromBatch: Long): Unit = {
    val root = stateRoot(outDir, plugName)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val vs = versionIds(fs, root)
    if (vs.exists(_ >= fromBatch))
      require(vs.exists(_ < fromBatch),
        s"plug-state rollback to batch $fromBatch reaches past every " +
          s"retained check-in (${vs.mkString(",")}) — rebuild from scratch")
  }
}

/** Versioned parquet state table: `v=<batchId>` directories, latest wins.
  * Replaces the reference's transactional UPDATE/INSERT state maintenance
  * (T3/T9) without requiring a transactional table format: committing
  * version N twice (failure replay) simply rewrites the same directory.
  */
class ParquetStateStore(spark: SparkSession, dir: String,
                        prefix: String = "v=") {
  import org.apache.hadoop.fs.Path

  // Hadoop FS throughout, for the same reason streamOrigin is (see its
  // scaladoc): `dir` is any Hadoop path (file:, hdfs:, s3a:, ...). With
  // java.io.File a non-local checkpoint would list zero versions, so
  // readBefore() yields None and merge tables are silently rebuilt from
  // scratch every batch while prune never deletes anything.
  private val root = new Path(dir)
  private def fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def versions: Seq[Long] = {
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
      // toLongOption, not toLong: a stray non-numeric suffix (leftover
      // tool dir, editor droppings) must be ignored, not brick every
      // listing for the table's lifetime
      .flatMap(_.getPath.getName.stripPrefix(prefix).toLongOption)
      .filter(v => fs.exists(new Path(root, s"$prefix$v/_SUCCESS")))
      .sorted
  }

  def latestVersion: Option[Long] = versions.lastOption

  /** GC for additive (segment/merge) uses: delete EVERY dir named
    * `<prefix><id>` with id below the bound, COMMITTED OR NOT — an
    * uncommitted dir below an already-committed watermark is a dead
    * partial write from a crash (the fold/merge path is single-threaded
    * per runner, never a concurrent writer), and skipping it would leak
    * a near-table-sized directory per crash.
    */
  def deleteUpTo(bound: Long, inclusive: Boolean): Unit = {
    if (!fs.exists(root)) return
    fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
      .flatMap(s => s.getPath.getName.stripPrefix(prefix).toLongOption
        .map(_ -> s.getPath))
      .filter { case (v, _) => if (inclusive) v <= bound else v < bound }
      .foreach { case (_, p) => fs.delete(p, true) }
  }

  /** All committed versions, oldest first — for additive (segment) uses
    * where every version is live data, not just the newest snapshot.
    */
  def allVersions: Seq[Long] = versions

  def readBefore(batchId: Long): Option[DataFrame] =
    versions.filter(_ < batchId).lastOption.map(v => spark.read.parquet(s"$dir/$prefix$v"))

  def read(): Option[DataFrame] =
    latestVersion.map(v => spark.read.parquet(s"$dir/$prefix$v"))

  def commit(batchId: Long, df: DataFrame, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(s"$dir/$prefix$batchId")
  }

  /** Compaction: drop all but the newest `keepLast` committed versions
    * (old versions only exist to serve replay of *their* batch; once the
    * stream is `keepLast` batches past them they are unreachable).
    */
  def prune(keepLast: Int = 2): Unit =
    versions.dropRight(keepLast)
      .foreach(v => fs.delete(new Path(root, s"$prefix$v"), true))

  /** Fork rollback: drop every version `>= fromBatch`, leaving the last
    * version below the fork as the live snapshot. Versions are COMPLETE
    * snapshots (version N is derived from version <N plus batch N), so
    * surviving version M alone IS the state as of batch M — but [[prune]]
    * bounds how far back one exists: a rollback deeper than the retained
    * window must fail loudly (rebuilding from an empty store would
    * silently drop all pre-fork state) rather than truncate to nothing.
    */
  def truncateFrom(fromBatch: Long): Unit = {
    validateTruncateFrom(fromBatch)
    versions.filter(_ >= fromBatch)
      .foreach(v => fs.delete(new Path(root, s"$prefix$v"), true))
  }

  /** The retained-window bound of [[truncateFrom]] alone, mutation-free —
    * [[PlugRunner.truncateFromBatch]] validates every table before
    * truncating any, so a too-deep fork leaves all state untouched.
    */
  def validateTruncateFrom(fromBatch: Long): Unit = {
    val vs = versions
    if (vs.exists(_ >= fromBatch))
      require(vs.exists(_ < fromBatch),
        s"state rollback to batch $fromBatch reaches past every retained " +
          s"version (${vs.mkString(",")}) — deepen StateKeepLast or rebuild " +
          "this table from scratch")
  }
}
