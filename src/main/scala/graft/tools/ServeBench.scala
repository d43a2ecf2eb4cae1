package graft.tools

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** Serving concurrency envelope: start the real HttpApi over plug-derived
  * tables and hammer it with N parallel clients — the measurement the
  * reference implicitly makes by running 50 uvicorn workers
  * (BASELINE.md (a)). Reports per-request p50/p90/p99/max latency and
  * aggregate throughput; README's serving section carries the recorded
  * numbers.
  *
  * The session is built with `spark.scheduler.mode=FAIR` (a static conf,
  * so it is set HERE at session build; production boots do the same) and
  * every handler tags its jobs into the `serving` pool — one heavy
  * request must not convoy every light one behind it in the FIFO queue.
  *
  * Usage: runMain graft.tools.ServeBench [sfDir] [clients] [reqsPerClient] [mix|uniq] [rollEveryMs] [ingest]
  * `uniq` makes every latest-feed request carry a distinct url, so the
  * result micro-cache and the per-params plan cache both miss — the
  * execution-path envelope, vs the default repeated-request mix.
  * `rollEveryMs` > 0 bumps the data epoch on that period for the whole
  * run (a fast-rolling ingest) — the probe for the point-index
  * epoch-roll path: rebuilds must run on their background thread while
  * requests serve the previous epoch's maps, so p99 must NOT spike at
  * the rolls (the inline-rebuild design convoyed every keyed request,
  * and through the shared admission gate every OTHER route, behind one
  * distributed build per roll).
  * `ingest` runs a REAL PlugRunner micro-batch stream (podping booted
  * from the reference's verbatim defs.json, fed through OpLogTail,
  * back-to-back batches, no pacing) on a background thread for the
  * whole client run — the reference's actual deployment shape, 50 API
  * workers sharing a host with per-plug sync. The ingest jobs run in
  * the DEFAULT scheduler pool; handlers tag into the `serving` FAIR
  * pool, which is precisely the isolation this mode measures (p99
  * under ingest must stay within 2× of idle, zero sheds).
  */
object ServeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val clients = args.lift(1).map(_.toInt).getOrElse(50)
    val perClient = args.lift(2).map(_.toInt).getOrElse(20)
    val uniq = args.lift(3).contains("uniq")
    val rollEveryMs = args.lift(4).map(_.toLong).getOrElse(0L)
    val ingest = args.lift(5).contains("ingest")

    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .appName("graft-serve-bench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.scheduler.mode", "FAIR")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.GraftSession.configure(spark)

    val tables = graft.SparkEntry.servingTables(spark, sfDir)
    tables.values.foreach(_.count()) // materialize the persisted tables
    val api = new graft.serving.HttpApi(tables)
    val port = api.start("127.0.0.1", 0, nThreads = clients)

    // the reference's own endpoint mix: status + counts + latest-feed +
    // poll reads (path + param forms)
    val routes = Seq(
      "/api",
      "/api/podping/history/counts",
      "/api/podping/feeds/latest?url=url_9",
      "/api/polls/active",
      "/api/polls/alice",
      "/api/polls/ops?block_range=%5B0,2000000%5D&op_type=create")

    val client = HttpClient.newHttpClient()
    def get(path: String): Int = client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString()).statusCode()
    routes.foreach(get) // warm: plans built + codegen'd once

    val lat = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val errors = new java.util.concurrent.atomic.AtomicLong
    val rolls = new java.util.concurrent.atomic.AtomicLong
    val roller = new Thread(() => {
      try while (!Thread.interrupted()) {
        Thread.sleep(rollEveryMs)
        graft.core.Tables.invalidate(Some(spark))
        rolls.incrementAndGet(): Unit
      } catch { case _: InterruptedException => }
    }, "serve-bench-epoch-roller")
    if (rollEveryMs > 0) { roller.setDaemon(true); roller.start() }
    // live-ingest thread: a real plug stream, back-to-back micro-batches
    // for the whole run, competing for the same executor threads
    val ingestBatches = new java.util.concurrent.atomic.AtomicLong
    @volatile var ingestStop = false
    // a dead ingest stream silently turns an "under live ingest" report
    // into an idle one — record the failure and FLAG the report below
    @volatile var ingestDied: Option[Throwable] = None
    val ingestThread = new Thread(() => {
      try {
        val base = java.nio.file.Files.createTempDirectory("serve-ingest").toString
        val plug = Soak.bootPodping(base)
        val runner = new graft.streaming.PlugRunner(plug, s"$base/plug") {
          override val CompactEvery = 8
        }
        val startB = plug.startBlock.toLong - 1
        var produced = 0L
        val tail = new graft.sources.OpLogTail(
          spark, s"$base/ckpt",
          head = () => startB + produced,
          readRange = (from, to) =>
            (from to to).map(b => Soak.podpingOp(spark, b)).reduce(_.unionByName(_)),
          step = 1L, startAfterBlock = startB)
        while (!ingestStop) {
          produced += 1
          tail.runOnce((df, _, to) => runner.processBatch(df, to))
          ingestBatches.incrementAndGet()
          graft.core.CacheScope.release()
        }
      } catch { case t: Throwable => ingestDied = Some(t) }
    }, "serve-bench-ingest")
    if (ingest) { ingestThread.setDaemon(true); ingestThread.start() }
    val t0 = System.nanoTime()
    val threads = (0 until clients).map { c =>
      new Thread(() => {
        val cl = HttpClient.newHttpClient()
        (0 until perClient).foreach { i =>
          val base = routes((c + i) % routes.size)
          val path =
            if (uniq && base.startsWith("/api/podping/feeds/latest"))
              s"/api/podping/feeds/latest?url=url_${(c * perClient + i) % 1000}"
            else base
          val s = System.nanoTime()
          val code = cl.send(
            HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
            HttpResponse.BodyHandlers.ofString()).statusCode()
          lat.add(System.nanoTime() - s)
          // 503 = explicit load-shed (bounded admission queue timed out),
          // reported separately below via api.shedCount — only unexpected
          // statuses count as errors
          if (code != 200 && code != 503) errors.incrementAndGet(): Unit
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val wallS = (System.nanoTime() - t0) / 1e9
    if (rollEveryMs > 0) { roller.interrupt(); roller.join(1000) }
    if (ingest) {
      ingestStop = true
      ingestThread.join(30000)
      println(f"[serve] live ingest: ${ingestBatches.get} micro-batches during the run " +
        f"(${ingestBatches.get / wallS}%.1f batches/s)")
      // an "under live ingest" report is only honest if the stream ran
      // the whole time — a dead or stalled ingest measured idle latencies
      ingestDied.foreach { t =>
        println(s"[serve] INGEST DIED mid-run: $t — latencies above were (partly) idle")
      }
      if (ingestDied.nonEmpty || ingestBatches.get < 1) {
        api.stop()
        sys.error("serve-bench: ingest stream failed before the client run finished")
      }
    }
    if (rolls.get > 0) println(s"[serve] epoch rolls during run: ${rolls.get}")
    api.stop()

    val sorted = lat.toArray(Array.empty[java.lang.Long]).map(_.toLong).sorted
    def pct(p: Double) = sorted(((sorted.length - 1) * p).toInt) / 1e6
    println(f"[serve] clients=$clients reqs=${sorted.length} errors=${errors.get} " +
      f"shed=${api.shedCount.get} " +
      f"wall=${wallS}%.2f s throughput=${sorted.length / wallS}%.0f req/s")
    println(f"[serve] latency ms: p50=${pct(0.50)}%.1f p90=${pct(0.90)}%.1f " +
      f"p99=${pct(0.99)}%.1f max=${sorted.last / 1e6}%.1f")
    val gated = math.max(1L, api.gatedCount.get)
    println(f"[serve] gate: admitted=${api.gatedCount.get} " +
      f"avgQueue=${api.queueNanos.get / gated / 1e6}%.1f ms " +
      f"avgExec=${api.execNanos.get / gated / 1e6}%.1f ms " +
      f"resultCacheHits=${api.resultCacheHits.get} " +
      f"coalesced=${api.coalescedHits.get} " +
      f"planCacheHits=${api.planCacheHits.get} " +
      f"pointIndex=${api.pointIndexStats._1}hits/${api.pointIndexStats._2}builds")
  }
}
