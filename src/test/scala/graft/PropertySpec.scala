package graft

import graft.plugs.{Podping, Polls}

/** Property-based invariants (SURVEY §5.3): explode conservation, replay
  * idempotency, arrival-order invariance — sampled over seeded random
  * inputs (plain deterministic generation; the scalatest/scalacheck bridge
  * artifact is not available offline).
  */
class PropertySpec extends SparkSpec {
  import Fixtures._

  private def randomUrlLists(seed: Long): Seq[Seq[String]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(1 + rnd.nextInt(8))(
      Seq.fill(1 + rnd.nextInt(5))(s"https://${rnd.alphanumeric.take(6).mkString.toLowerCase}.example/feed"))
  }

  test("explode row-count conservation: sum(len(urls)) == count(updates)") {
    for (seed <- Seq(1L, 42L, 99L, 2024L)) {
      val urlLists = randomUrlLists(seed)
      val rows = urlLists.zipWithIndex.map { case (urls, i) =>
        op(i.toLong, 100 + i, i % 10, "2024-01-01 00:00:00", "podping", podpingV03(urls))
      }
      val updates = Podping.transform(opLog(spark, rows))("updates")
      assert(updates.count() === urlLists.map(_.size).sum.toLong, s"seed=$seed")
    }
  }

  test("re-processing a block range is idempotent (same state)") {
    val rows = (0 until 20).map { i =>
      op(i.toLong, 100 + i / 10, i % 10, "2024-01-01 00:00:00", "podping",
        podpingV03(Seq(s"u${i % 3}")))
    }
    val a = Podping.transform(opLog(spark, rows))("updates")
      .orderBy("podping_id", "url").collect().toSeq
    val b = Podping.transform(opLog(spark, rows))("updates")
      .orderBy("podping_id", "url").collect().toSeq
    assert(a === b)
  }

  test("polls outcome independent of row arrival order within a range") {
    val base = Seq(
      op(1, 100, 0, "2024-01-01 00:00:00", "polls",
        pollCreate("p", "first", Seq("a"), "2024-02-01 00:00:00", "t"), postingAuth = "u"),
      op(2, 100, 1, "2024-01-01 00:00:01", "polls",
        pollCreate("p", "second", Seq("b"), "2024-02-01 00:00:00", "t"), postingAuth = "u"),
      op(3, 101, 0, "2024-01-01 00:00:02", "polls",
        pollVote("u", "p", 1), postingAuth = "v"))
    for (seed <- Seq(0L, 7L, 123L)) {
      val shuffled = new scala.util.Random(seed).shuffle(base)
      val t = Polls.transform(opLog(spark, shuffled))
      val c = t("content").collect()
      assert(c.length === 1 && c.head.getAs[String]("question") === "first", s"seed=$seed")
      assert(t("votes").count() === 1)
    }
  }
}
