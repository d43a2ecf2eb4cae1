package graft

import java.nio.file.Files
import graft.core.OpLog
import graft.streaming.PollsStateful
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** flatMapGroupsWithState polls tallies: cross-batch state, live vote
  * updates, validity/delete guards — the arbitrary-stateful streaming
  * formulation of T9.
  */
class PollsStatefulSpec extends SparkSpec {
  import Fixtures._

  private def tmp(): String = Files.createTempDirectory("graft").toString

  test("streaming tallies accumulate across micro-batches with state") {
    val src = tmp(); val ckpt = tmp()
    opLog(spark, Seq(
      op(1, 100, 0, "2024-01-01 00:00:00", "polls",
        pollCreate("p", "Q?", Seq("red", "blue"), "2024-06-01 00:00:00", "t"),
        postingAuth = "alice"),
      op(2, 101, 0, "2024-01-01 01:00:00", "polls",
        pollVote("alice", "p", 1), postingAuth = "bob")))
      .write.mode("append").parquet(s"$src/b1")

    val sink = tmp()
    def run(): Unit = {
      val stream = spark.readStream.schema(OpLog.schema).parquet(s"$src/b*")
      PollsStateful.tallies(PollsStateful.toPollOps(stream))
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[PollsStateful.Tally], id: Long) =>
          batch.toDF().withColumn("_b", org.apache.spark.sql.functions.lit(id))
            .write.mode("append").parquet(sink): Unit
        }
        .outputMode(OutputMode.Update())
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    run()
    def emitted() = {
      val df = spark.read.parquet(sink)
      val maxB = df.agg(org.apache.spark.sql.functions.max("_b")).collect()(0).getLong(0)
      df.filter(org.apache.spark.sql.functions.col("_b") === maxB).collect()
        .map(r => (r.getAs[String]("parsed_answer"), r.getAs[Long]("votes"))).toSet
    }
    assert(emitted() === Set(("red", 1L)))

    // batch 2: carol votes blue, bob ALSO votes blue (he voted red in
    // batch 1 — distinct-answer semantics keep him in both tallies, like
    // the batch pollSummary), dave votes out-of-range (dropped), eve
    // votes after expiry (dropped)
    opLog(spark, Seq(
      op(3, 200, 0, "2024-01-02 00:00:00", "polls",
        pollVote("alice", "p", 2), postingAuth = "carol"),
      op(4, 200, 1, "2024-01-02 00:00:10", "polls",
        pollVote("alice", "p", 2), postingAuth = "bob"),
      op(5, 200, 2, "2024-01-02 00:00:20", "polls",
        pollVote("alice", "p", 9), postingAuth = "dave"),
      op(6, 900, 0, "2024-07-01 00:00:00", "polls",
        pollVote("alice", "p", 1), postingAuth = "eve")))
      .write.mode("append").parquet(s"$src/b2")
    run()
    // latest emission: bob counted once per DISTINCT answer he voted
    assert(emitted() === Set(("red", 1L), ("blue", 2L)))
  }

  test("stateful tallies agree with the batch pollSummary when an account votes two answers") {
    val rows = Seq(
      op(1, 100, 0, "2024-01-01 00:00:00", "polls",
        pollCreate("p", "Q?", Seq("red", "blue"), "2024-06-01 00:00:00", "t"),
        postingAuth = "alice"),
      op(2, 101, 0, "2024-01-01 01:00:00", "polls",
        pollVote("alice", "p", 1), postingAuth = "bob"),
      op(3, 102, 0, "2024-01-01 02:00:00", "polls",
        pollVote("alice", "p", 2), postingAuth = "bob"), // second answer
      op(4, 102, 1, "2024-01-01 02:00:10", "polls",
        pollVote("alice", "p", 1), postingAuth = "bob"), // re-vote, no-op
      op(5, 103, 0, "2024-01-01 03:00:00", "polls",
        pollVote("alice", "p", 2), postingAuth = "carol"))
    val raw = opLog(spark, rows)
    val tables = graft.plugs.Polls.transform(raw)
    val batch = graft.serving.PollsQueries
      .pollSummary(tables("content"), tables("votes")).collect()
      .map(r => (r.getAs[String]("author"), r.getAs[String]("permlink"),
        r.getAs[String]("parsed_answer"), r.getAs[Long]("votes"))).toSet
    val stateful = PollsStateful.tallies(PollsStateful.toPollOps(raw)).collect()
      .map(t => (t.author, t.permlink, t.parsed_answer, t.votes)).toSet
    assert(batch === Set(("alice", "p", "red", 1L), ("alice", "p", "blue", 2L)))
    assert(stateful === batch)
  }

  test("incremental summary table equals batch pollSummary on randomized multi-batch streams") {
    // VERDICT r9 item 6: the materialized-summary path must match the
    // batch join+filter formulation on arbitrary create/vote/delete
    // interleavings split across micro-batches — INCLUDING deletes that
    // land batches after the votes they retract (the case query-time
    // filtering handled and an append sink cannot)
    val rnd = new scala.util.Random(2024)
    val accounts = (0 until 8).map(i => s"acct$i")
    val polls = (0 until 6).map(i => (s"author${i % 3}", s"poll$i"))
    var nextId = 0L
    def chainOp(created: String, opId: String, payload: String, auth: String) = {
      nextId += 1
      // id IS the chain order here: block = id, trx 0 — batches are
      // ordered chunks of the chain, the real stream shape
      op(nextId, 1000 + nextId.toInt, 0, created, opId, payload, postingAuth = auth)
    }
    def t(h: Int) = f"2024-01-01 ${h % 24}%02d:00:00"
    val ops = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
    polls.zipWithIndex.foreach { case ((author, permlink), i) =>
      ops += chainOp(t(i), "polls",
        pollCreate(permlink, s"Q$i?", Seq("red", "blue", "green"),
          "2024-06-01 00:00:00", "t"), author)
      // a hijack attempt after the real create (first-create-wins)
      if (i % 2 == 0)
        ops += chainOp(t(i + 1), "polls",
          pollCreate(permlink, "HIJACK?", Seq("zzz"), "2024-06-01 00:00:00", "t"),
          author)
      (0 until 5 + rnd.nextInt(10)).foreach { _ =>
        // answers 0..4: 0 and 4 are out of range and must drop
        ops += chainOp(t(2 + rnd.nextInt(20)), "polls",
          pollVote(author, permlink, rnd.nextInt(5)), accounts(rnd.nextInt(accounts.size)))
      }
      // polls 0 and 3 get deleted AFTER their votes
      if (i == 0 || i == 3)
        ops += chainOp(t(23), "polls", pollDelete(permlink), author)
    }
    val rows = ops.toSeq
    val src = tmp(); val ckpt = tmp(); val summaryDir = tmp()
    val store = new graft.streaming.ParquetStateStore(spark, summaryDir)
    // ordered chunks of the chain arrive one run at a time (a fresh
    // AvailableNow pass per chunk over the same checkpoint) — one
    // micro-batch per chunk with state carried across, and chain order
    // preserved regardless of file-source mtime tie-breaking
    val k = 5
    rows.grouped((rows.size + k - 1) / k).zipWithIndex.foreach { case (chunk, i) =>
      opLog(spark, chunk).write.mode("append").parquet(f"$src/b$i%02d")
      val stream = spark.readStream.schema(OpLog.schema).parquet(s"$src/b*")
      PollsStateful.summaryUpdates(PollsStateful.toPollOps(stream))
        .writeStream
        .foreachBatch {
          (updates: org.apache.spark.sql.Dataset[PollsStateful.SummaryUpdate], id: Long) =>
            store.commit(id, graft.streaming.PollsSummaryTable
              .merge(store.readBefore(id), updates))
            store.prune(2)
        }
        .outputMode(OutputMode.Update())
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }

    def rowSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[String]("author"), r.getAs[String]("permlink"),
        r.getAs[String]("parsed_answer"), r.getAs[Long]("votes"))).toSet
    val incremental = rowSet(store.read().get)
    val tables = graft.plugs.Polls.transform(opLog(spark, rows))
    val batch = rowSet(graft.serving.PollsQueries
      .pollSummary(tables("content"), tables("votes")))
    assert(batch.nonEmpty && incremental === batch)
    // the deleted polls' tallies were RETRACTED, not merely filtered
    assert(!incremental.exists(r => r._2 == "poll0" || r._2 == "poll3"))
  }

  test("applyOps unit semantics: first create wins, delete guard honored") {
    import PollsStateful._
    val create = PollOp("a", "p", "create", ts("2024-01-01 00:00:00"), "a",
      None, Seq("x", "y"), Some(ts("2024-02-01 00:00:00")), 100, 0, 1)
    val hijack = create.copy(answers = Seq("z"), id = 2, trx_in_block = 1)
    val (s1, _) = applyOps(None, Seq(hijack, create)) // arrival order shuffled
    assert(s1.get.answers === Seq("x", "y")) // chain order decides
    val lateDelete = PollOp("a", "p", "delete", ts("2024-03-01 00:00:00"), "a",
      None, null, None, 300, 0, 3)
    val (s2, _) = applyOps(s1, Seq(lateDelete))
    assert(!s2.get.deleted) // post-expiry delete ignored
    val earlyDelete = lateDelete.copy(created = ts("2024-01-15 00:00:00"))
    val (s3, _) = applyOps(s1, Seq(earlyDelete))
    assert(s3.get.deleted)
  }
}
