package graft

import graft.plugs.Podping
import graft.serving.PodpingQueries
import org.apache.spark.sql.functions._

/** Podping plug semantics (reference: plugs/podping/functions.sql):
  * version dispatch, explode conservation, corrupt isolation, id filter.
  */
class PodpingSpec extends SparkSpec {
  import Fixtures._

  private def fixture = opLog(spark, Seq(
    op(1, 100, 0, "2024-01-01 00:00:00", "podping",
      podpingV03(Seq("https://a.example/feed", "https://b.example/feed"))),
    op(2, 100, 1, "2024-01-01 00:00:03", "pp_video_update",
      podpingV10(Seq("https://c.example/feed"), medium = "video", reason = "live")),
    op(3, 101, 0, "2024-01-01 00:00:06", "podping",
      podpingV10(Seq("https://a.example/feed", "https://d.example/feed"))),
    op(4, 101, 1, "2024-01-01 00:00:09", "notify", """{"unrelated": true}"""),
    corruptOp(5, 102, "2024-01-01 00:00:12"),
    // matching op id but corrupt inner payload: must not fail, yields no urls
    op(6, 102, 1, "2024-01-01 00:00:15", "podping", """not json at all""")))

  test("ops table keeps only podping op ids; corrupt envelope isolated") {
    val ops = Podping.transform(fixture)("ops")
    assert(ops.count() === 4) // ids 1,2,3,6 — not the 'notify' op, not the corrupt envelope
    assert(ops.select("op_id").distinct().collect().map(_.getString(0)).toSet ===
      Set("podping", "pp_video_update"))
  }

  test("updates: v0.3 forces medium=blog, v1.0 carries its own; explode row conservation") {
    val updates = Podping.transform(fixture)("updates").collect()
    assert(updates.length === 5) // 2 + 1 + 2 urls; corrupt payload contributes 0
    val byId = updates.groupBy(_.getAs[Long]("podping_id"))
    assert(byId(1L).forall(r => r.getAs[String]("medium") == "blog" &&
      r.getAs[String]("reason") == "feed_update"))
    assert(byId(2L).head.getAs[String]("medium") === "video")
    assert(byId(2L).head.getAs[String]("reason") === "live")
    assert(byId(3L).map(_.getAs[String]("url")).toSet ===
      Set("https://a.example/feed", "https://d.example/feed"))
  }

  test("url counts: group-count + top-k with block range") {
    val updates = Podping.transform(fixture)("updates")
    val counts = PodpingQueries.urlCounts(updates, 0, 1000, 10).collect()
    assert(counts.head.getAs[String]("url") === "https://a.example/feed")
    assert(counts.head.getAs[Long]("url_count") === 2L)
  }

  test("feed updates: latest-N for one url joins back hex trx id") {
    val t = Podping.transform(fixture)
    val feed = PodpingQueries.feedUpdates(t("updates"), t("ops"),
      "https://a.example/feed", 5).collect()
    assert(feed.length === 2)
    assert(feed.head.getAs[Int]("block_num") === 101) // newest first
    assert(feed.head.getAs[String]("trx_id").matches("[0-9a-f]{8}"))
  }

  test("latest-per-url window form matches filter+limit form per key") {
    val updates = Podping.transform(fixture)("updates")
    val windowed = PodpingQueries.latestPerUrl(updates, 1)
      .filter(col("url") === "https://a.example/feed").collect()
    assert(windowed.length === 1 && windowed.head.getAs[Long]("podping_id") === 3L)
  }
}
