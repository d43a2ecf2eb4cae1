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

  def tableDir(name: String): String = s"$outDir/${plug.name}/$name"

  /** Process one micro-batch (callable directly for batch backfill — the
    * reference's "massive sync" mode, sync.sql:58-77, is exactly this
    * function over a historical block range).
    */
  def processBatch(batch: DataFrame, batchId: Long): Unit = {
    val tables = plug.transform(batch)
    tables.foreach { case (name, df) =>
      mergeFns.get(name) match {
        case Some(fn) =>
          val store = new ParquetStateStore(df.sparkSession, tableDir(name))
          val prior = store.readBefore(batchId)
          store.commit(batchId, fn(prior, tables))
        case None =>
          df.withColumn("_batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(tableDir(name))
      }
    }
  }

  def start(source: DataFrame, checkpoint: String,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    source.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) => processBatch(batch, id) }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  /** Read the current contents of a derived table. */
  def table(spark: SparkSession, name: String): DataFrame =
    if (mergeFns.contains(name))
      new ParquetStateStore(spark, tableDir(name)).read()
        .getOrElse(spark.emptyDataFrame)
    else
      spark.read.parquet(tableDir(name)).drop("_batch_id")
}

/** Versioned parquet state table: `v=<batchId>` directories, latest wins.
  * Replaces the reference's transactional UPDATE/INSERT state maintenance
  * (T3/T9) without requiring a transactional table format: committing
  * version N twice (failure replay) simply rewrites the same directory.
  */
class ParquetStateStore(spark: SparkSession, dir: String) {

  private def versions: Seq[Long] = {
    val d = new java.io.File(dir)
    if (!d.exists()) Seq.empty
    else d.listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("v="))
      .map(_.getName.stripPrefix("v=").toLong)
      .filter(v => new java.io.File(d, s"v=$v/_SUCCESS").exists())
      .sorted
  }

  def latestVersion: Option[Long] = versions.lastOption

  def readBefore(batchId: Long): Option[DataFrame] =
    versions.filter(_ < batchId).lastOption.map(v => spark.read.parquet(s"$dir/v=$v"))

  def read(): Option[DataFrame] =
    latestVersion.map(v => spark.read.parquet(s"$dir/v=$v"))

  def commit(batchId: Long, df: DataFrame): Unit =
    df.write.mode("overwrite").parquet(s"$dir/v=$batchId")
}
