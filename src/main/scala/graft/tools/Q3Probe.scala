package graft.tools

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Scratch: q3's fact⋈fact join-strategy A/B at a tier — the pinned
  * sort-merge (both sides sorted by orderkey) vs a partitioned
  * shuffle-hash build of the SMALLER (customer⋈orders) side. Both are
  * legitimate at-scale shapes: neither broadcasts a fact side, both
  * leave the orderkey partitioning in place for the groupBy; the trade
  * is two O(n log n) sorts vs a per-partition hash build
  * (rows/shufflePartitions — spillable since Spark 3.2). Dev harness.
  *
  * Usage: runMain graft.tools.Q3Probe [sfDir] [reps]
  */
object Q3Probe {
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
    def q3(hint: String) =
      Tables.customer(spark, sfDir).filter(col("c_mktsegment") === "BUILDING")
        .join(Tables.orders(spark, sfDir), col("c_custkey") === col("o_custkey"))
        .hint(hint)
        .join(Tables.lineitem(spark, sfDir), col("o_orderkey") === col("l_orderkey"))
        .withColumn("_ur",
          org.apache.spark.sql.GraftBridge.unscaled(
            col("l_extendedprice").cast(dec(18, 2))) *
            (lit(100L) - org.apache.spark.sql.GraftBridge.unscaled(
              col("l_discount").cast(dec(4, 2)))))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(org.apache.spark.sql.GraftBridge.sum128Long(col("_ur"), 4).as("_rev"))
        .orderBy(col("_rev").desc, col("o_orderkey")).limit(10)
    def time(tag: String)(f: => Unit): Unit = {
      val m0 = taskMs.get
      val t0 = System.nanoTime(); f
      println(f"[q3] $tag%-14s ${(System.nanoTime() - t0) / 1e9}%.3f s" +
        f"  taskTime ${(taskMs.get - m0) / 1e3}%.1f s")
    }
    (1 to reps).foreach { rep =>
      println(s"--- rep $rep")
      time("merge")(q3("merge").collect())
      time("shuffle_hash")(q3("shuffle_hash").collect())
    }
    spark.stop()
  }
}
