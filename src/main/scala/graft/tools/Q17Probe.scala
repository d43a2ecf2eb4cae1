package graft.tools

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Scratch: q17 shape A/B at a tier — the REJECTED two-scan agg+self-join
  * (per-partkey averages aggregated then joined back; inlined here so the
  * rejected shape stays runnable, the gate itself shipped the window form
  * in r13) vs the shipped one-scan window formulation (identical `avg`
  * function, so identical borderline semantics: the filter compares
  * against the SAME decimal average value either way).
  * Trade: 2 scans + 2 exchanges + join vs 1 scan + 1 exchange + sort.
  *
  * Usage: runMain graft.tools.Q17Probe [sfDir] [reps]
  */
object Q17Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("target/sf10")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.Bench.session("32")
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        Option(t.taskMetrics).foreach(m => taskMs.addAndGet(m.executorRunTime))
    })
    def dec(p: Int, s: Int) = org.apache.spark.sql.types.DecimalType(p, s)
    // the r12 shape the gate REJECTED: aggregate per-partkey averages,
    // self-join them back onto lineitem (second scan of the dominant
    // table), then filter + aggregate
    def aggJoin() = {
      val l = Tables.lineitem(spark, sfDir)
      val avgs = l.groupBy(col("l_partkey").as("p_key"))
        .agg(avg(col("l_quantity")).as("avg_qty"))
      l.join(avgs, col("l_partkey") === col("p_key"))
        .filter(col("l_quantity") < col("avg_qty") * 0.2)
        .withColumn("_up", org.apache.spark.sql.GraftBridge.unscaled(
          col("l_extendedprice").cast(dec(18, 2))))
        .groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n"),
          org.apache.spark.sql.GraftBridge.sum128Long(col("_up"), 2)
            .cast("string").as("total_price"))
    }
    def time(tag: String)(f: => Long): Unit = {
      val m0 = taskMs.get
      val t0 = System.nanoTime(); val n = f
      println(f"[q17] $tag%-16s ${(System.nanoTime() - t0) / 1e9}%.3f s" +
        f"  taskTime ${(taskMs.get - m0) / 1e3}%.1f s  rows $n")
    }
    (1 to reps).foreach { rep =>
      println(s"--- rep $rep")
      time("agg+join (old)")(aggJoin().count())
      time("window (gate)")(
        graft.SparkEntry.queries("q17_small_quantity")(spark, sfDir).count())
    }
    spark.stop()
  }
}
