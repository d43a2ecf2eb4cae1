package graft.tools

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Scratch: q5 stage-graph floor A/B at a tier (r13 task 5). q5's sf10
  * record is ~1.3 s wall on ~11 core-s — scheduling, not work. Arms:
  *
  *  - gate: the shipped plan (orders streams, customer left to the
  *    size-based planner, nation/region broadcast) — 2+ stages when
  *    customer shuffle-joins;
  *  - collapsed: customer FORCE-broadcast too, so the whole query is one
  *    scan stage (3 BHJs + partial agg fused) + the final agg exchange —
  *    the minimum stage graph this shape admits. NOT shippable as the
  *    gate: customer scales with SF (15M rows at sf100 would blow the
  *    broadcast), the same trap the r9 gate comment documents; the probe
  *    exists to price the stage-count difference, not to adopt it.
  *
  * Usage: runMain graft.tools.Q5Probe [sfDir] [reps]
  */
object Q5Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("target/sf10")
    val reps = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = graft.Bench.session("32")
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    val jobs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        Option(t.taskMetrics).foreach(m => taskMs.addAndGet(m.executorRunTime))
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    def dec(p: Int, s: Int) = org.apache.spark.sql.types.DecimalType(p, s)
    val br = org.apache.spark.sql.GraftBridge

    def collapsed() =
      Tables.orders(spark, sfDir)
        .join(broadcast(Tables.customer(spark, sfDir)),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(spark, sfDir)),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(spark, sfDir)),
          col("n_regionkey") === col("r_regionkey"))
        .withColumn("_ut", br.unscaled(col("o_totalprice").cast(dec(18, 2))))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_orders"),
          br.makeDecimal38(sum(col("_ut")), 2).cast("string").as("total_value"))

    // noop SINK, never count(): Dataset.count() lets the optimizer PRUNE
    // unreferenced aggregate expressions (q5's sum would never be
    // computed under a count), so a count-based A/B compares pruned
    // plans. The noop write materializes every output column.
    def time(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val (m0, j0) = (taskMs.get, jobs.get)
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[q5] $tag%-16s ${(System.nanoTime() - t0) / 1e9}%.3f s" +
        f"  taskTime ${(taskMs.get - m0) / 1e3}%.1f s  jobs ${jobs.get - j0}")
    }
    (1 to reps).foreach { rep =>
      println(s"--- rep $rep")
      time("gate")(
        graft.SparkEntry.queries("q5_region_rollup")(spark, sfDir))
      time("collapsed (1-stage)")(collapsed())
    }
    spark.stop()
  }
}
