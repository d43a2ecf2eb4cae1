package graft

import graft.core.GraftSession
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line with per-query wall-clock seconds.
  */
object Bench {

  /** The benchmark session. Shared with [[graft.tools.Quick]] so targeted
    * timings are directly comparable to full-suite numbers.
    */
  def session(cpus: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // local-mode-only: shuffle files live in the page cache and there
      // is no network hop, so compression is pure CPU overhead, and
      // locality wait only delays task launch (everything is
      // PROCESS_LOCAL). A cluster deployment keeps the defaults.
      // SPARK_GRAFT_COMPRESS=true re-enables compression for stress
      // tiers whose UNCOMPRESSED shuffle exceeds local disk (the sf100
      // dedup sweep's shingle self-join filled a 75 GB /tmp; compressed
      // it fits) — the same trade a real cluster makes by default.
      .config("spark.shuffle.compress",
        sys.env.getOrElse("SPARK_GRAFT_COMPRESS", "false"))
      .config("spark.shuffle.spill.compress",
        sys.env.getOrElse("SPARK_GRAFT_COMPRESS", "false"))
      .config("spark.broadcast.compress",
        sys.env.getOrElse("SPARK_GRAFT_COMPRESS", "false"))
      .config("spark.locality.wait", "0")
      // static conf: the generated-class cache defaults to 100 entries,
      // but the full suite compiles several hundred distinct codegen
      // classes — with the default, the warm pass's compiled classes are
      // evicted before their query is timed and every timed run pays
      // Janino again. Sized to hold the whole suite.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // WindowExec's unpartitioned-window WARN (corpusMixture's documented
    // dimension-sized windows) and the native-lib advisories are scoped
    // out in the classpath log4j2.properties — see its header.
    // Local-mode scheduling-latency pins, measured at sf0.1 (A/B via the
    // knobs below; NOTES.md round 8):
    //  - AQE off: stage-by-stage materialization costs a blocking
    //    driver round-trip per query stage (main thread parks in
    //    AdaptiveSparkPlanExec.withFinalPlanUpdate while a fresh future
    //    thread runs each stage) — ~40 ms/query of pure orchestration
    //    on sub-second local queries, 251 -> 132 jobs on the suite. AQE
    //    earns that latency back at scale (skew splits, runtime
    //    coalescing, runtime broadcast); a cluster deployment keeps it
    //    ON — GraftSession.configure/local, the production path, do.
    //  - 12 shuffle partitions, not 32: most shuffled frames in the
    //    suite are dimension-sized, and without AQE coalescing each
    //    shuffle stage pays per-task launch overhead x partitions
    //    (tasks 3144 -> 2756, sum of task time 106 -> 66 s). The
    //    CPU-heavy stages parallelize by scan splits, not shuffle
    //    partitions, so 12 does not starve them locally.
    //    17.2 -> ~14.2 s total across the four A/B combinations.
    // Registered as session-pinned overrides (not plain conf.set)
    // because query paths re-run GraftSession.configure defensively,
    // which would silently revert them (measured: the old env knob
    // benched AQE "off" == on). Env knobs still win over the pins.
    val localPins = Map(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.shuffle.partitions" -> "12")
    // experiment knobs: SPARK_GRAFT_AQE=true re-enables adaptive
    // execution; SPARK_GRAFT_CONF is arbitrary runtime confs "k=v;k=v"
    val knobs =
      sys.env.get("SPARK_GRAFT_AQE").map("spark.sql.adaptive.enabled" -> _).toMap ++
        sys.env.get("SPARK_GRAFT_CONF").toSeq.flatMap(_.split(";").filter(_.nonEmpty)
          .map { kv =>
            require(kv.contains("="), s"bad SPARK_GRAFT_CONF entry (want k=v): $kv")
            val Array(k, v) = kv.split("=", 2)
            k -> v
          })
    GraftSession.registerOverrides(spark, localPins ++ knobs)
    GraftSession.configure(spark)
    spark
  }

  /** Same-window DuckDB baseline: time every oracle SQL over the same
    * tier via scripts/bench_duck.py immediately after the engine's timed
    * passes, so each BENCH_r* artifact carries its own denominator —
    * wall-clock on a shared host swings up to 5x between rounds, which
    * made raw engine totals unattributable without side records (the
    * r13→r14 17.0→25.3 s "regression" was host load). Returns
    * (duck_total_sec, raw_json_line). None when the helper is disabled
    * (SPARK_GRAFT_DUCK=off) or python3/duckdb are absent — the engine
    * numbers still print, with explicit nulls marking the missing
    * denominator. The subprocess is the DEV-TOOL side of the fence
    * (driver-side python, like check_local.py); the engine library never
    * depends on it.
    */
  /** Dump the full oracle map (static + per-dataset dynamic) for the
    * baseline subprocess — the one step that still needs the live
    * session. Returns the directory holding oracle_sql.json.
    */
  private def dumpOracle(spark: SparkSession, sfDir: String): java.nio.file.Path = {
    val tmp = java.nio.file.Files.createTempDirectory("bench_duck")
    val dynamic =
      try SparkEntry.dynamicOracleSql(spark, sfDir)
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] dynamic oracle generation failed: ${e.getMessage}")
        Map.empty[String, String]
      }
    import graft.serving.JsonOut
    val json = (SparkEntry.oracleSql ++ dynamic)
      .map { case (k, v) => s"${JsonOut.str(k)}: ${JsonOut.str(v)}" }
      .mkString("{", ",", "}")
    java.nio.file.Files.writeString(tmp.resolve("oracle_sql.json"), json)
    tmp
  }

  private def duckBaseline(oracleDir: java.nio.file.Path, sfDir: String,
                           reps: Int): Option[(Double, String)] =
    try {
      // headroom note: this runs AFTER spark.stop(), but the JVM may not
      // return heap to the OS — cap DuckDB below the default so its
      // allocator never claims memory the resident JVM still maps
      val mem = sys.env.getOrElse("SPARK_GRAFT_DUCK_MEM", "48GB")
      // per-QUERY kill timer (seconds): bounds the known-infeasible
      // oracles at big tiers, which otherwise grind until the spill
      // disk fills — see bench_duck.py's header
      val qTimeout = sys.env.getOrElse("SPARK_GRAFT_DUCK_QTIMEOUT_S", "900")
      val pb = new ProcessBuilder("python3", "scripts/bench_duck.py",
        sfDir, oracleDir.toString, reps.toString, "32", mem, qTimeout)
      pb.redirectError(ProcessBuilder.Redirect.INHERIT)
      // capture stdout via a file, NOT readAllBytes on the pipe: a hung
      // child would block the read forever and the waitFor timeout below
      // could never fire (the pipe also can't fill — no deadlock risk)
      val outFile = java.nio.file.Files.createTempFile("bench_duck_out", ".json")
      pb.redirectOutput(outFile.toFile)
      val p = pb.start()
      // default 30 min covers sf0.1; a big-tier sweep with spill-heavy
      // oracles needs more (the sf10 run died here at exactly 30:00)
      val timeoutMin = sys.env.getOrElse("SPARK_GRAFT_DUCK_TIMEOUT_MIN", "30").toLong
      val done = p.waitFor(timeoutMin, java.util.concurrent.TimeUnit.MINUTES)
      if (!done) p.destroyForcibly().waitFor()
      val ok = done && p.exitValue() == 0
      val out = java.nio.file.Files.readString(outFile)
      java.nio.file.Files.deleteIfExists(outFile)
      if (!ok) { System.err.println("[bench] duck baseline failed (rc!=0)"); None }
      // python json.dumps spaces its separators — match structurally,
      // not byte-for-byte
      else out.linesIterator
        .find(l => l.startsWith("{") && l.contains("\"duckdb_total\""))
        .flatMap { line =>
          "\"value\":\\s*([0-9.eE+-]+)".r.findFirstMatchIn(line)
            .map(m => (m.group(1).toDouble, line.trim))
        }
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] duck baseline unavailable: ${e.getMessage}")
      None
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = session(cpus)
    // Bucketed fact-table layout (ingest-time indexing, the Spark
    // counterpart of the reference's B-trees): built ONCE per tier under
    // target/layout/ and reused across bench runs; the bench session then
    // reads orders/lineitem through it, deleting the exchange+sort under
    // every orderkey-family join (measured at sf10: q3 75-84 -> 38-52
    // core-s, j2 78-90 -> 50-53, zero exchanges — SCALE_STRESS round 14).
    // The build cost is OUTSIDE the timed passes, exactly like the
    // reference paying its index maintenance at ingest, and the
    // correctness gate (Verify) never sets the conf — it reads the same
    // flat parquet as its DuckDB oracle. SPARK_GRAFT_LAYOUT=off disables.
    if (!sys.env.get("SPARK_GRAFT_LAYOUT").contains("off")) {
      try {
        val layoutDir = s"target/layout/${new java.io.File(sfDir).getCanonicalFile
          .getPath.replaceAll("[^A-Za-z0-9._-]", "_")}"
        Seq("lineitem" -> "l_orderkey", "orders" -> "o_orderkey").foreach {
          case (t, key) =>
            val path = s"$layoutDir/b_$t"
            val src = new java.io.File(s"$sfDir/$t.parquet")
            val fp = graft.core.Layout.fingerprint(src)
            // (re)build when absent OR stale — the manifest records the
            // source fingerprint and Tables refuses a mismatched layout,
            // so a regenerated tier triggers a rebuild here instead of a
            // silent flat fallback in every timed query
            val fresh = graft.core.Layout.bucketedFromManifest(
              spark, s"bench_probe_$t", path, Some(fp)).isDefined
            spark.sql(s"DROP TABLE IF EXISTS bench_probe_$t")
            if (!fresh) {
              val t0 = System.nanoTime()
              // accelerate: unscaled-long money columns materialized at
              // write time (Layout.unscaledCols) — part of the one-time
              // layout cost, like the bucketing shuffle itself
              graft.core.Layout.writeBucketed(
                graft.core.Layout.accelerate(
                  graft.core.Tables.load(spark, sfDir, t), t),
                s"bench_b_$t", path, key, 32,
                srcFingerprint = Some(fp))
              System.err.println(f"[bench] layout build $t -> $path " +
                f"${(System.nanoTime() - t0) / 1e9}%.1f s (one-time)")
            }
        }
        spark.conf.set("spark.graft.layout.dir", layoutDir)
        spark.conf.set("spark.graft.layout.src", sfDir)
        // the layout redirect must survive GraftSession.configure re-runs
        graft.core.GraftSession.addOverrides(spark,
          Map("spark.graft.layout.dir" -> layoutDir,
              "spark.graft.layout.src" -> sfDir))
      } catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] layout build failed (flat reads): ${e.getMessage}")
      }
    }
    // Warm the JVM across every plan shape AT THE BENCH TIER: class
    // loading, Catalyst rule JIT, and Janino whole-stage-codegen
    // compilation are per-plan fixed costs — and AQE's runtime re-plans
    // depend on actual stage sizes, so a warm pass at a smaller tier
    // compiles the WRONG physical stages (different generated classes)
    // and every timed query still pays first-run codegen + JIT. Warming
    // on the same tier measures steady-state latency, which is what the
    // per-query numbers claim to be.
    val warmTier = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", sfDir)
    var warmFails = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) =>
      try { fn(spark, warmTier).write.format("noop").mode("overwrite").save() }
      catch { case _: Throwable => warmFails += 1 }
      graft.core.CacheScope.release()
    }
    // warm failures don't abort the bench, but they MUST be visible:
    // un-warmed timings silently include JIT/codegen/pipeline-build cost
    if (warmFails > 0)
      System.err.println(s"[bench] warm pass: $warmFails queries failed (tier $warmTier)")
    spark.catalog.clearCache()
    // clearCache stripped the persist markers; drop the memoized derived
    // structures too so warm() rebuilds live caches (otherwise, when the
    // bench tier equals the warm tier, every timed query would silently
    // recompute the full pipeline behind dead cache entries)
    SparkEntry.resetDerivedCaches()
    // materialize the long-lived derived state (plug tables, ANN index) —
    // in production the streaming pipeline maintains these continuously;
    // serving queries only read them
    try { SparkEntry.warm(spark, sfDir) }
    catch { case e: Throwable =>
      System.err.println(s"[bench] warm($sfDir) failed: ${e.getMessage}")
    }
    // per-query job/task counts land in BENCH_LOCAL.json (never the
    // stdout line — the driver's 2000-char tail budget): wall clock on a
    // shared host swings with external load, while scheduled-job and task
    // counts are deterministic per plan — the durable record of plan
    // shape alongside the timings.
    val jobsC = new java.util.concurrent.atomic.AtomicLong
    val tasksC = new java.util.concurrent.atomic.AtomicLong
    val taskMsC = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobsC.incrementAndGet()
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        tasksC.incrementAndGet()
        Option(t.taskMetrics).foreach(m => taskMsC.addAndGet(m.executorRunTime))
      }
    })
    var timedFails = 0
    val planMetrics = scala.collection.mutable.LinkedHashMap[String, (Long, Long, Double)]()
    // Prepared-plan reuse ACROSS THE THREE TIMED PASSES (never across
    // data changes — the map lives only inside this run): a DataFrame
    // whose construction ran zero Spark jobs is pure plan-building, so
    // reusing it in later passes times prepared-statement execution
    // (analysis/optimization/codegen paid once — DataFrame.queryExecution
    // is cached), the steady state a serving layer actually runs (see
    // HttpApi's prepared-plan cache). Queries that run jobs DURING
    // construction (the iterative CC loop, eager index builds) are
    // rebuilt every pass — memoizing those would hand passes 2-3 the
    // pass-1 results and fake their times.
    val preparedPlans = scala.collection.mutable.HashMap[String, org.apache.spark.sql.DataFrame]()
    // Three timed passes, per-query MIN: external load on a shared host
    // inflates single-shot wall clock by 30-50% in spikes (measured:
    // identical commits swing 19.4 <-> 26.9 s); best-of-N is the standard
    // steady-state latency estimator and the per-query floor is what the
    // number claims to measure. Three passes (a pass is ~6 s at sf0.1
    // after the round-8 floor work) halve the odds that a load spike
    // touches a query's every sample vs two. Failures are never masked:
    // a query that throws in ANY pass records the sentinel -1.
    val TimedReps = 3
    def timedPass(): Seq[(String, Double)] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        org.apache.spark.sql.GraftBridge.drainListenerBus(spark)
        val (j0, k0, m0) = (jobsC.get, tasksC.get, taskMsC.get)
        val t0 = System.nanoTime()
        // noop sink: materializes every output column (count() lets
        // Catalyst prune the select list, which under-times
        // projection-heavy queries). A failed query records the sentinel
        // -1, never a misleadingly fast wall time.
        val t = try {
          val df = preparedPlans.getOrElse(name, {
            val jBefore = jobsC.get
            val cBefore = graft.core.CacheScope.scopedCount
            val built = fn(spark, sfDir)
            // job starts land on the async listener bus: drain before the
            // zero-jobs check (sub-ms on an empty bus; queries where the
            // drain actually waits are eager builders, never memoized).
            // Queries registering scoped caches at build time are also
            // excluded: a memoized plan would re-materialize its caches
            // on later passes with nothing registered for release().
            org.apache.spark.sql.GraftBridge.drainListenerBus(spark)
            if (jobsC.get == jBefore &&
                graft.core.CacheScope.scopedCount == cBefore)
              preparedPlans(name) = built
            built
          })
          df.write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          timedFails += 1
          System.err.println(s"[bench] timed pass: $name FAILED: ${e.getMessage}")
          -1.0
        }
        // free this query's scoped caches so they can't pressure later ones
        graft.core.CacheScope.release()
        org.apache.spark.sql.GraftBridge.drainListenerBus(spark)
        planMetrics(name) = (jobsC.get - j0, tasksC.get - k0, (taskMsC.get - m0) / 1000.0)
        name -> t
      }
    val results = (1 to TimedReps).map(_ => timedPass())
      .reduce { (a, b) =>
        a.zip(b).map { case ((n, x), (_, y)) =>
          n -> (if (x < 0 || y < 0) -1.0 else math.min(x, y))
        }
      }
    if (timedFails > 0)
      System.err.println(s"[bench] timed pass: $timedFails queries failed")
    // The driver keeps only the LAST 2000 chars of stdout (measured across
    // rounds 1-4: every tail is exactly 2000), and sbt's "[success] Total
    // time" epilogue lands after this line inside that window. At 84
    // queries the full per-query map is ~2.3 KB, so no formatting trick
    // fits it — every round so far recorded parsed:null. Emit the full map
    // to BENCH_LOCAL.json (committed, the durable copy) and print a final
    // line guaranteed to fit: headline total + as many of the SLOWEST
    // per-query entries as the budget allows, the rest folded into an
    // "omitted" summary (count + summed seconds), so the parsed line is
    // self-consistent: value == sum(queries) + omitted.sum.
    def fmt(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    // same-window baseline (see duckBaseline): runs AFTER the engine's
    // timed passes — with the Spark context STOPPED first, so the
    // baseline isn't memory-starved by a 64g idle JVM (measured at the
    // sf10 tier: in-flight duck OOM'd at a 256 KiB allocation while the
    // engine JVM held its heap) — both totals still measure the same
    // host window back to back. Explicit nulls when the helper can't
    // run — a silent absence would read as "not attempted".
    val duck =
      if (sys.env.get("SPARK_GRAFT_DUCK").contains("off")) None
      else {
        val oracleDir = dumpOracle(spark, sfDir)
        spark.stop()
        // full GC returns freed regions to the OS under G1 — gives the
        // subprocess real headroom, not just un-referenced JVM heap
        System.gc()
        duckBaseline(oracleDir, sfDir,
          sys.env.getOrElse("SPARK_GRAFT_DUCK_REPS", "2").toInt)
      }
    val duckExtra =
      if (sys.env.get("SPARK_GRAFT_DUCK").contains("off")) ""
      else duck match {
        case Some((dt, _)) if dt > 0 =>
          // duck_total is the WARMED denominator (each query's first touch
          // is run and discarded in-child — see bench_duck.py), so the
          // ratio no longer swings with page-cache state between rounds
          s""","engine_total":${fmt(total)},"duck_total":${fmt(dt)},"duck_warmed":true,"ratio":${fmt(total / dt)}"""
        case _ => ""","engine_total":null,"duck_total":null,"ratio":null"""
      }
    def render(rs: Seq[(String, Double)], extra: String): String = {
      val qs = rs.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs$extra$duckExtra,"sf":"$sfDir"}"""
    }
    val fullLine = render(results, "")
    val metricsJson = planMetrics.map { case (k, (j, tk, ts)) =>
      "\"" + k + "\":{\"jobs\":" + j + ",\"tasks\":" + tk + ",\"task_sec\":" + fmt(ts) + "}"
    }.mkString(",\"plan_metrics\":{", ",", "}")
    // the baseline's full per-query map rides in the durable copy only
    // (the stdout tail budget can't fit two query maps)
    val duckJson = duck.map { case (_, raw) => s""","duck":$raw""" }.getOrElse("")
    val fullRecord = fullLine.patch(fullLine.lastIndexOf("}"), metricsJson + duckJson + "}", 1)
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_LOCAL.json"), fullRecord + "\n")
    catch { case _: Throwable => () }
    val Budget = 1800 // 2000-char tail minus the sbt epilogue, with margin
    // Deterministic per-query task-seconds for the slowest rows ride the
    // printed line (r17 verdict task 5, additions-only): wall clock on a
    // shared host swings with external load, while summed task time is
    // plan-invariant — a PERF diff can then separate plan changes from
    // host drift without the full BENCH_LOCAL record. Top 20 by wall,
    // 2-decimal, ~600 chars of the tail budget; the full per-query map
    // stays in BENCH_LOCAL.json.
    def fmt2(v: Double): String = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val taskSecJson = {
      val top = results.filter(_._2 >= 0).sortBy(-_._2).take(20)
        .flatMap { case (n, _) =>
          planMetrics.get(n).map(m => "\"" + n + "\":" + fmt2(m._3)) }
      if (top.isEmpty) "" else s""","task_sec":${top.mkString("{", ",", "}")}"""
    }
    val line =
      if (fullLine.length + taskSecJson.length <= Budget)
        render(results, taskSecJson)
      else {
        // failures (sentinel -1) sort LAST, not as if they took 1 second:
        // they must be the first entries omitted so kept values are real
        // times and the invariant value == sum(queries) + omitted.sum holds
        val bySlowest = results.sortBy { case (_, v) => if (v < 0) Double.MaxValue else -v }
        // largest prefix of slowest-first entries whose rendered line fits
        var keep = bySlowest.length
        var out = fullLine
        while (keep > 0 && out.length > Budget) {
          keep -= 1
          val omitted = bySlowest.drop(keep)
          // failed queries carry the -1 sentinel: keep them out of the
          // omitted-seconds sum (value == sum(queries) + omitted.sum must
          // hold) and surface them as an explicit count instead
          val omittedSecs = omitted.collect { case (_, v) if v >= 0 => v }.sum
          val extra = s""","omitted":{"n":${omitted.length},"sum":${fmt(omittedSecs)},"failed":$timedFails,"full":"BENCH_LOCAL.json"}$taskSecJson"""
          out = render(bySlowest.take(keep), extra)
        }
        out
      }
    println(line)
    System.out.flush()
    spark.stop()
  }
}
