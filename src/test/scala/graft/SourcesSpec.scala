package graft

import graft.sources.PostgresOpLog

/** The JDBC source wrapper can't reach a Postgres here; pin the pushdown
  * query construction (the part with reference fidelity — sync.sql:83-100)
  * and its guards.
  */
class SourcesSpec extends SparkSpec {

  test("scan subquery mirrors the reference op-log scan") {
    val sql = PostgresOpLog.scanSql(100, 200, Set(18))
    assert(sql.contains("FROM hive.operations_view ov"))
    assert(sql.contains(
      "ON tv.block_num = ov.block_num AND tv.trx_in_block = ov.trx_in_block"))
    assert(sql.contains("ov.block_num >= 100 AND ov.block_num <= 200"))
    assert(sql.contains("op_type_id IN (18)"))
    // column order matches OpLog.schema so downstream plugs run unchanged
    val cols = "ov.id, ov.op_type_id, ov.block_num, ov.timestamp"
    assert(sql.contains(cols))
  }

  test("multiple op ids render sorted and deterministic") {
    val sql = PostgresOpLog.scanSql(0, 10, Set(41, 18, 12))
    assert(sql.contains("op_type_id IN (12, 18, 41)"))
  }

  test("invalid ranges and empty id sets are rejected") {
    intercept[IllegalArgumentException](PostgresOpLog.scanSql(10, 5, Set(18)))
    intercept[IllegalArgumentException](PostgresOpLog.scanSql(0, 10, Set.empty))
  }

  // ---- OpLogTail: the app_next_block loop over a simulated feed ----

  /** Simulated op-log backend: a mutable head plus a frame filtered by
    * block range (what the JDBC scan does server-side).
    */
  private def simulatedTail(ckpt: String, step: Long,
                            headRef: () => Long): graft.sources.OpLogTail = {
    import spark.implicits._
    new graft.sources.OpLogTail(
      spark, ckpt,
      head = headRef,
      readRange = (first, last) =>
        (first to last).map(b => (b, s"op_$b")).toDF("block_num", "body"),
      step = step)
  }

  test("OpLogTail chunks [cursor+1, min(head, cursor+step)] at step=100, cursor monotone") {
    val ckpt = java.nio.file.Files.createTempDirectory("tail1").toString
    var head = 350L
    val tail = simulatedTail(ckpt, 100L, () => head)
    val seen = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    val ranges = tail.runUntilCaughtUp { (df, first, last) =>
      seen += ((first, last, df.count()))
    }
    assert(ranges === Seq((1L, 100L), (101L, 200L), (201L, 300L), (301L, 350L)))
    // every emitted batch carries exactly its range's rows
    assert(seen.map { case (f, l, n) => n == l - f + 1 }.forall(identity))
    assert(tail.cursor === 350L)
    // caught up: no range until the head advances (app_next_block NULL)
    assert(tail.nextRange() === None)
    head = 425L
    assert(tail.nextRange() === Some((351L, 425L)))
  }

  test("OpLogTail restart resumes from the committed cursor") {
    val ckpt = java.nio.file.Files.createTempDirectory("tail2").toString
    val t1 = simulatedTail(ckpt, 50L, () => 120L)
    t1.runOnce((_, _, _) => ()) // [1, 50]
    t1.runOnce((_, _, _) => ()) // [51, 100]
    // a NEW instance over the same checkpoint (process restart) resumes
    val t2 = simulatedTail(ckpt, 50L, () => 120L)
    assert(t2.cursor === 100L)
    assert(t2.runOnce((_, _, _) => ()) === Some((101L, 120L)))
    assert(t2.cursor === 120L)
  }

  test("OpLogTail crash before commit replays the SAME range — never a gap") {
    val ckpt = java.nio.file.Files.createTempDirectory("tail3").toString
    val tail = simulatedTail(ckpt, 100L, () => 150L)
    tail.runOnce((_, _, _) => ())
    assert(tail.cursor === 100L)
    intercept[RuntimeException](tail.runOnce((_, _, _) =>
      throw new RuntimeException("sink crash")))
    assert(tail.cursor === 100L) // commit never happened
    assert(tail.runOnce((_, _, _) => ()) === Some((101L, 150L))) // exact replay
  }

  test("OpLogTail cursor commit has NO crash window: every mid-commit crash point resumes from the last committed block") {
    // the pre-versioning protocol (delete old cursor, then rename tmp
    // over it) had a window where NO cursor file existed and a restart
    // silently replayed all history from startAfterBlock; the versioned
    // protocol's crash points each leave a recoverable on-disk state,
    // enumerated here by constructing them directly
    val ckpt = java.nio.file.Files.createTempDirectory("tail4").toString
    val dir = new java.io.File(ckpt)
    val tail = simulatedTail(ckpt, 100L, () => 500L)
    tail.runOnce((_, _, _) => ()) // commits v100
    assert(tail.cursor === 100L)
    // crash point A: tmp written for the NEXT commit, rename never ran —
    // tmp files are not commits; cursor stays at the committed version
    java.nio.file.Files.write(dir.toPath.resolve("graft_oplog_cursor.v200.tmp"),
      "200".getBytes)
    assert(simulatedTail(ckpt, 100L, () => 500L).cursor === 100L)
    // crash point B: new version renamed in, old-version GC never ran —
    // two markers on disk; max() picks the committed one
    java.nio.file.Files.write(dir.toPath.resolve("graft_oplog_cursor.v200"),
      "200".getBytes)
    assert(simulatedTail(ckpt, 100L, () => 500L).cursor === 200L)
    // the next real commit GCs the strays and stays monotone
    val t2 = simulatedTail(ckpt, 100L, () => 500L)
    assert(t2.runOnce((_, _, _) => ()) === Some((201L, 300L)))
    assert(t2.cursor === 300L)
    assert(!dir.listFiles().exists(_.getName.endsWith(".tmp")))
    assert(dir.listFiles().count(_.getName.startsWith("graft_oplog_cursor.v")) === 1)
    // a replayed range re-committing an already-committed block (rename
    // onto an existing target) is a no-op commit, not a failure
    java.nio.file.Files.write(dir.toPath.resolve("graft_oplog_cursor.v300.tmp"),
      "300".getBytes)
    val t3 = simulatedTail(ckpt, 100L, () => 300L)
    assert(t3.nextRange() === None)
    assert(t3.cursor === 300L)
    // an unparseable version name still fails loudly (never a silent
    // restart from zero)
    java.nio.file.Files.write(dir.toPath.resolve("graft_oplog_cursor.vBAD"),
      "bad".getBytes)
    intercept[IllegalStateException](simulatedTail(ckpt, 100L, () => 500L).cursor)
  }

  test("OpLogTail honors a legacy single-file cursor and upgrades it on the next commit") {
    val ckpt = java.nio.file.Files.createTempDirectory("tail5").toString
    val dir = new java.io.File(ckpt)
    java.nio.file.Files.write(dir.toPath.resolve("graft_oplog_cursor"),
      "150".getBytes)
    val tail = simulatedTail(ckpt, 100L, () => 400L)
    assert(tail.cursor === 150L) // pre-versioning checkpoint resumes in place
    assert(tail.runOnce((_, _, _) => ()) === Some((151L, 250L)))
    assert(tail.cursor === 250L)
    assert(!new java.io.File(dir, "graft_oplog_cursor").exists()) // upgraded
    assert(new java.io.File(dir, "graft_oplog_cursor.v250").exists())
  }

  test("OpLogTail -> PlugRunner end to end: tail-fed tables equal a one-shot transform through a crash replay") {
    // the feeder's exactly-once claim is "at-least-once feeder +
    // idempotent sinks"; this demonstrates it END TO END: a live tail
    // (growing head) drives a real podping PlugRunner, a mid-stream
    // crash replays an uncommitted range, and the resulting plug tables
    // are value-identical to a one-shot batch transform of the full feed
    import Fixtures._
    import org.apache.spark.sql.functions.col
    val feed = opLog(spark, (1 to 12).map(b =>
      op(b.toLong, 100 + b, 0, f"2024-01-01 00:00:$b%02d", "podping",
        podpingV03(Seq(s"https://u$b.example/feed", s"https://shared.example/$b")))))
    feed.persist().count()
    val ckpt = java.nio.file.Files.createTempDirectory("tailE2E").toString
    val out = java.nio.file.Files.createTempDirectory("tailE2EOut").toString
    var head = 106L // chain mid-growth: 6 of 12 blocks visible
    val tail = new graft.sources.OpLogTail(
      spark, ckpt, head = () => head,
      readRange = (first, last) => feed.filter(col("block_num").between(first, last)),
      step = 4L, startAfterBlock = 100L)
    val runner = new graft.streaming.PlugRunner(graft.plugs.Podping, out)
    def ingest(ops: org.apache.spark.sql.DataFrame, first: Long, last: Long): Unit =
      runner.processBatch(ops, first) // range identity IS the batch id
    // drain the visible chain: [101,104], [105,106]
    assert(tail.runUntilCaughtUp(ingest(_, _, _)).map(_._1) === Seq(101L, 105L))
    head = 112L
    // crash AFTER the sink committed [107,110] but BEFORE the cursor
    // commit: the sink now holds an orphan batch the replay must absorb
    intercept[RuntimeException](tail.runOnce { (ops, f, l) =>
      ingest(ops, f, l); throw new RuntimeException("crash between sink and cursor")
    })
    assert(tail.cursor === 106L)
    // resume: [107,110] replays into the SAME batch id (idempotent
    // overwrite), then [111,112] completes the chain
    assert(tail.runUntilCaughtUp(ingest(_, _, _)).map(_._1) === Seq(107L, 111L))
    val oneShot = graft.plugs.Podping.transform(feed)
    Seq("updates", "ops").foreach { t =>
      val streamed = runner.table(spark, t)
      val batch = oneShot(t)
      val cols = batch.columns.toSeq.sorted.map(col)
      assert(streamed.count() === batch.count(), s"$t row count diverged")
      assert(streamed.orderBy(cols: _*).collect().toSeq ===
        batch.orderBy(cols: _*).collect().toSeq, s"$t rows diverged from one-shot")
    }
    feed.unpersist()
  }

  test("defs.json boot: a plug registers from a definition file and matches the compiled transform") {
    import graft.plugs.{PlugDefs, PlugRegistry}
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("plug_defs").toFile
    def write(sub: String, json: String): Unit = {
      val d = new java.io.File(dir, sub); d.mkdirs()
      java.nio.file.Files.writeString(new java.io.File(d, "defs.json").toPath, json)
    }
    // reference-shaped definitions (docs/plug-definitions.md example):
    // podping enabled with a custom start block, polls shipped disabled
    write("podping",
      """{"name": "podping",
        | "props": {"enabled": true, "schema": "podping",
        |           "context": "podping", "start_block": 101},
        | "ops": {"18": "podping.process_cjop"}}""".stripMargin)
    write("polls",
      """{"name": "polls",
        | "props": {"enabled": false, "schema": "polls",
        |           "context": "polls", "start_block": 0},
        | "ops": {"18": "polls.process_cjop"}}""".stripMargin)
    // a directory without defs.json is not a plug (haf.py _is_valid_plug)
    new java.io.File(dir, "not_a_plug").mkdirs()
    // parse keeps every declared field
    val defs = PlugDefs.load(dir)
    assert(defs.map(_.name) === Seq("podping", "polls"))
    assert(defs.find(_.name == "polls").exists(!_.enabled))
    // boot: only the enabled plug, identity from the JSON
    val booted = PlugRegistry.fromDefs(dir)
    assert(booted.map(_.name) === Seq("podping"))
    val p = booted.head
    assert(p.startBlock === 101)
    assert(p.opTypeIds === Set(18))
    // the booted plug's transform is byte-equal to the compiled plug's
    import Fixtures._
    val feed = opLog(spark, Seq(
      op(1, 100, 0, "2024-01-01 00:00:00", "podping",
        podpingV03(Seq("https://a.example/feed"))),
      op(2, 101, 0, "2024-01-01 00:00:03", "pp_video_update",
        podpingV10(Seq("https://c.example/feed"), medium = "video"))))
    val fromDef = p.transform(feed)
    val compiled = graft.plugs.Podping.transform(feed)
    assert(fromDef.keySet === compiled.keySet)
    fromDef.keySet.foreach { t =>
      val cols = compiled(t).columns.toSeq.sorted.map(col)
      assert(fromDef(t).orderBy(cols: _*).collect().toSeq ===
        compiled(t).orderBy(cols: _*).collect().toSeq, s"$t diverged")
    }
    // misconfigurations fail LOUDLY at boot, not silently at sync time
    write("misnamed", """{"name": "other",
      | "props": {"enabled": true, "schema": "o", "context": "o", "start_block": 0},
      | "ops": {"18": "podping.process_cjop"}}""".stripMargin)
    intercept[IllegalArgumentException](PlugDefs.load(dir))
    new java.io.File(new java.io.File(dir, "misnamed"), "defs.json").delete()
    new java.io.File(dir, "misnamed").delete()
    write("podping", """{"name": "podping",
      | "props": {"enabled": true, "schema": "podping", "context": "podping", "start_block": 0},
      | "ops": {"18": "podping.no_such_function"}}""".stripMargin)
    intercept[IllegalArgumentException](PlugRegistry.fromDefs(dir))
  }
}
