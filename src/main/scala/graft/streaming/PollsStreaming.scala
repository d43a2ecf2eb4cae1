package graft.streaming

import graft.plugs.Polls
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-batch state maintenance for the polls plug: `content` is a keyed
  * state table (first-create-wins insert-if-absent + guarded soft-delete,
  * reference functions.sql:105-128), the rest are appends.
  */
object PollsStreaming {

  def runner(outDir: String): PlugRunner =
    new PlugRunner(Polls, outDir, Map("content" -> mergeContent _))

  /** prior ∪ (new creates not already present), then apply this batch's
    * deletes to *all* rows (a delete may target a poll created in an
    * earlier batch). Idempotent: re-merging the same batch is a no-op.
    */
  def mergeContent(prior: Option[DataFrame], batch: Map[String, DataFrame]): DataFrame = {
    val batchContent = batch("content")
    val deletes = batch("deletes")
      .groupBy("author", "permlink").agg(min("del_created").as("del_created"))
    val all = prior match {
      case Some(p) =>
        p.unionByName(
          batchContent.join(p.select("author", "permlink"), Seq("author", "permlink"), "left_anti"))
      case None => batchContent
    }
    all.join(deletes, Seq("author", "permlink"), "left")
      .withColumn("deleted",
        col("deleted") || (col("del_created").isNotNull &&
          col("del_created") >= col("created") &&
          col("expires").isNotNull && col("expires") >= col("del_created")))
      .drop("del_created")
  }
}
