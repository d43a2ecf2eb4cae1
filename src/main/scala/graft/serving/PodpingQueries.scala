package graft.serving

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Serving queries of the podping API (reference:
  * haf_plug_play/plugs/podping/podping.py, server/plug_endpoints/podping.py).
  * Head block / wall clock are injected parameters for determinism
  * (SURVEY §7.3.4). Defaults mirror the reference: 30 d = 864,000 blocks,
  * top-20, latest-5.
  */
object PodpingQueries {

  /** `get_url_counts` (podping.py:14-27): group-count + top-k over a block
    * range. Catalyst plans partial+final hash agg and TakeOrderedAndProject;
    * ties broken by url for determinism (the reference leaves ties
    * unspecified).
    */
  def urlCounts(updates: DataFrame, first: Long, last: Long, limit: Int = 20): DataFrame =
    updates
      .filter(col("block_num").between(first, last))
      .groupBy(col("url"))
      .agg(count(lit(1)).as("url_count"))
      .orderBy(col("url_count").desc, col("url"))
      .limit(limit)

  /** `get_feed_updates` (podping.py:30-39): latest N pings for one URL,
    * joined back to ops for the hex trx id (J4). `trx_id` is carried
    * denormalized through `updates`' natural key join.
    */
  def feedUpdates(updates: DataFrame, ops: DataFrame, url: String, limit: Int = 5): DataFrame =
    updates
      .filter(col("url") === url)
      .join(ops.select(col("id").as("podping_id"),
        lower(hex(col("trx_id"))).as("trx_id")), Seq("podping_id"))
      .orderBy(col("block_num").desc, col("podping_id").desc)
      .limit(limit)
      .select("block_num", "created", "trx_id", "url", "reason", "medium")

  /** Per-key latest-N generalization (SURVEY §2.5): row_number over a
    * per-url chain-order window — the scalable form of `feedUpdates` for
    * all keys at once.
    */
  def latestPerUrl(updates: DataFrame, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("url"))
      .orderBy(col("block_num").desc, col("podping_id").desc)
    updates.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= n).drop("_rn")
  }
}
