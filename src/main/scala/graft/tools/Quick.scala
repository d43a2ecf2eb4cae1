package graft.tools

import graft.{Bench, SparkEntry}

/** Targeted bench: time a comma-separated subset of SparkEntry queries
  * with the SAME session config and noop-sink protocol as [[graft.Bench]]
  * (shared via `Bench.session`) — for iterating on one query family
  * without paying the full suite. Bench's cross-query warm pass at
  * sf0.001 is replaced by reps: rep1 absorbs JIT/codegen, so compare
  * rep2+ against BENCH_LOCAL numbers.
  * Usage: runMain graft.tools.Quick <sfDir> <q1,q2,...> [reps]
  */
object Quick {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).map(_.split(",").toSeq)
      .getOrElse(SparkEntry.queries.keys.toSeq.sorted)
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = Bench.session("32")
    // same opt-in as Verify: point at a core.Layout dir to measure the
    // bench session's adopted bucketed-layout config
    sys.env.get("SPARK_GRAFT_LAYOUT_DIR").foreach { dir =>
      spark.conf.set("spark.graft.layout.dir", dir)
      spark.conf.set("spark.graft.layout.src", sfDir)
      graft.core.GraftSession.addOverrides(spark,
        Map("spark.graft.layout.dir" -> dir, "spark.graft.layout.src" -> sfDir))
    }
    // host-noise-robust A/B metrics: wall clock on a shared box swings
    // 2-5x with external load, but job count / task count / summed task
    // time are (near-)deterministic per plan — report both.
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        Option(t.taskMetrics).foreach(m => taskMs.addAndGet(m.executorRunTime))
      }
    })
    SparkEntry.warm(spark, sfDir)
    (1 to reps).foreach { rep =>
      names.foreach { n =>
        org.apache.spark.sql.GraftBridge.drainListenerBus(spark)
        val (j0, k0, m0) = (jobs.get, tasks.get, taskMs.get)
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        graft.core.CacheScope.release()
        org.apache.spark.sql.GraftBridge.drainListenerBus(spark)
        println(f"[quick] rep$rep $n%-28s $t%.3f s  jobs ${jobs.get - j0}%2d  tasks ${tasks.get - k0}%4d  taskTime ${(taskMs.get - m0) / 1000.0}%.1f s")
      }
    }
    spark.stop()
  }
}
