package graft

import graft.core.{EventOpLog, OpLog, Tables}
import graft.plugs.{HiveEngine, Podping, Polls}
import org.apache.spark.sql.functions._

/** The synthesizer is load-bearing for the oracle gate: pin its routing
  * invariants against the raw event-type counts.
  */
class EventOpLogSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val events = Tables.events(spark, sf).cache()
  private lazy val oplog = EventOpLog.fromEvents(events).cache()

  private def typeCount(t: String): Long = events.filter(col("event_type") === t).count()

  test("row conservation and chain-order key derivation") {
    assert(oplog.count() === events.count())
    val r = oplog.filter(col("id") === 42).collect().head
    assert(r.getAs[Int]("block_num") === 4 && r.getAs[Int]("trx_in_block") === 2)
  }

  test("podping ops = click + view, every one parseable") {
    val ops = Podping.transform(oplog)("ops")
    assert(ops.count() === typeCount("click") + typeCount("view"))
    assert(ops.filter(col("op_payload").isNull).count() === 0)
  }

  test("hive ops = purchases split across transfers, issuances and nfts") {
    val t = HiveEngine.transform(oplog)
    assert(t("issuances").count() > 0)
    assert(t("transfers").count() + t("issuances").count() + t("nfts").count()
      === typeCount("purchase"))
    assert(t("burns").count() ===
      t("transfers").filter(col("to") === "null").count())
  }

  private def kCol = get_json_object(col("props"), "$.k").cast("int")

  test("polls ops = creates (signups) + votes (even-k errors) + deletes (odd-k, k%5==0)") {
    val t = Polls.transform(oplog)
    val evenKErrors = events.filter(col("event_type") === "error" &&
      kCol % 2 === 0).count()
    val deleteErrors = events.filter(col("event_type") === "error" &&
      kCol % 2 === 1 && kCol % 5 === 0).count()
    assert(deleteErrors > 0) // the delete path must actually be exercised
    assert(t("votes").count() === evenKErrors)
    assert(t("deletes").count() === deleteErrors)
    assert(t("ops").count() === typeCount("signup") + evenKErrors + deleteErrors)
  }

  test("remaining odd-k errors are corrupt and fully isolated to the dead letter view") {
    val corrupt = events.filter(col("event_type") === "error" &&
      kCol % 2 === 1 && kCol % 5 =!= 0).count()
    assert(OpLog.deadLetter(oplog).count() === corrupt)
  }
}
