package graft

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import graft.core.OpLog

/** Protocol-exact op-log fixtures (FIXTURES.md §1-3): CJOS envelopes, both
  * podping payload versions, corrupt JSON, the polls state-machine
  * scenarios.
  */
object Fixtures {

  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** Build a raw op-log row; body assembled from the envelope pieces. */
  def op(id: Long, block: Int, trxInBlock: Int, created: String, opId: String,
         payloadJson: String, postingAuth: String = "alice",
         opType: Int = OpLog.CustomJsonOpType): Row = {
    // payload is doubly encoded: a JSON string inside the envelope
    val escaped = payloadJson
      .replace("\\", "\\\\").replace("\"", "\\\"")
    val body =
      s"""{"value": {"required_auths": [], "required_posting_auths": ["$postingAuth"],
         | "id": "$opId", "json": "$escaped"}}""".stripMargin.replace("\n", "")
    Row(id, opType.toShort, block, ts(created), trxInBlock,
      Array.fill[Byte](4)((id % 127).toByte), body)
  }

  def corruptOp(id: Long, block: Int, created: String): Row =
    Row(id, OpLog.CustomJsonOpType.toShort, block, ts(created), 0,
      Array.fill[Byte](4)(1), "{this is not json")

  def opLog(spark: SparkSession, rows: Seq[Row]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), OpLog.schema)

  // -- podping payloads (FIXTURES.md §2) ---------------------------------
  def podpingV03(urls: Seq[String]): String =
    s"""{"version": "0.3", "num_urls": ${urls.size}, "reason": "feed_update",
       | "urls": [${urls.map(u => s""""$u"""").mkString(",")}]}""".stripMargin.replace("\n", "")

  def podpingV10(iris: Seq[String], medium: String = "podcast", reason: String = "update"): String =
    s"""{"version": "1.0", "medium": "$medium", "reason": "$reason",
       | "iris": [${iris.map(u => s""""$u"""").mkString(",")}]}""".stripMargin.replace("\n", "")

  // -- polls CJOS payloads (FIXTURES.md §3) ------------------------------
  def pollCreate(permlink: String, question: String, answers: Seq[String],
                 expires: String, tag: String): String =
    s"""[[1, "polls-app/0.01"], "create", {"permlink": "$permlink",
       | "question": "$question",
       | "answers": [${answers.map(a => s""""$a"""").mkString(",")}],
       | "expires": "$expires", "tag": "$tag"}]""".stripMargin.replace("\n", "")

  def pollVote(author: String, permlink: String, answer: Int): String =
    s"""[[1, "polls/0.01"], "vote", {"author": "$author", "permlink": "$permlink", "answer": $answer}]"""

  def pollDelete(permlink: String): String =
    s"""[[1, "polls/0.01"], "delete", {"permlink": "$permlink"}]"""

  def pollOpV2(permlink: String): String =
    s"""[[2, "polls/0.02"], "create", {"permlink": "$permlink", "question": "ignored"}]"""
}
