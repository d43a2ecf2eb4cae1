package graft.tools

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Scratch: exact-sum accumulator A/B at a tier — the footer-proven plain
  * LONG sum dispatch (the shipped gates, see functions.ExactSum) vs the
  * int128 Sum128 accumulator forced on the identical plan, for q1 and q3.
  * Both arms produce bit-identical values (the dispatch's contract); the
  * A/B prices the accumulator alone: 1 vs 3 buffer slots, 1 add vs ~6
  * long ops per (row, aggregate).
  *
  * Usage: runMain graft.tools.SumAB [sfDir] [reps]
  */
object SumAB {
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
    val br = org.apache.spark.sql.GraftBridge

    // q1 with every exact sum forced onto Sum128 — the r13 shape
    def q1Sum128() = {
      val price = col("l_extendedprice").cast(dec(18, 2))
      val sumQty = br.sum128Long(col("_uq"), 2)
      val sumPrice = br.sum128Long(col("_up"), 2)
      val up = br.unscaled(price)
      val udisc = br.unscaled(col("l_discount").cast(dec(4, 2)))
      val utax = br.unscaled(col("l_tax").cast(dec(4, 2)))
      Tables.lineitem(spark, sfDir)
        .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("2000-12-01 00:00:00")))
        .select(col("l_returnflag"), col("l_linestatus"),
          br.unscaled(col("l_quantity").cast(dec(18, 2))).as("_uq"),
          up.as("_up"),
          (up * (lit(100L) - udisc)).as("_ud"),
          (up * (lit(100L) - udisc) * (lit(100L) + utax)).as("_uc"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sumQty.cast("string").as("sum_qty"),
          sumPrice.cast("string").as("sum_base_price"),
          br.sum128Long(col("_ud"), 4).cast("string").as("sum_disc_price"),
          br.sum128Long(col("_uc"), 6).cast("string").as("sum_charge"),
          round(sumQty.cast("double") / count(lit(1)), 6).as("avg_qty"),
          round(sumPrice.cast("double") / count(lit(1)), 6).as("avg_price"),
          count(lit(1)).as("count_order"))
    }

    // q3 with the revenue sum forced onto Sum128 — the r13 shape
    def q3Sum128() =
      Tables.customer(spark, sfDir).filter(col("c_mktsegment") === "BUILDING")
        .join(Tables.orders(spark, sfDir), col("c_custkey") === col("o_custkey"))
        .hint("merge")
        .join(Tables.lineitem(spark, sfDir), col("o_orderkey") === col("l_orderkey"))
        .withColumn("_ur",
          br.unscaled(col("l_extendedprice").cast(dec(18, 2))) *
            (lit(100L) - br.unscaled(col("l_discount").cast(dec(4, 2)))))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(br.sum128Long(col("_ur"), 4).as("_rev"))
        .orderBy(col("_rev").desc, col("o_orderkey")).limit(10)
        .select(col("o_orderkey"), col("o_orderdate"),
          col("_rev").cast("string").as("revenue"))
        .orderBy(col("o_orderkey"))

    // noop SINK, never count(): Dataset.count() lets the optimizer PRUNE
    // unreferenced aggregate expressions (a count over q1's aggregate
    // never computes the sums at all — measured 9 vs 53 core-s), so a
    // count-based A/B of aggregate arms compares pruned plans. The noop
    // write materializes every output column, like the bench.
    def time(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val m0 = taskMs.get
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[sumab] $tag%-18s ${(System.nanoTime() - t0) / 1e9}%.3f s" +
        f"  taskTime ${(taskMs.get - m0) / 1e3}%.1f s")
    }
    (1 to reps).foreach { rep =>
      println(s"--- rep $rep")
      time("q1 sum128 (old)")(q1Sum128())
      time("q1 long (gate)")(
        graft.SparkEntry.queries("q1_pricing_summary")(spark, sfDir))
      time("q3 sum128 (old)")(q3Sum128())
      time("q3 long (gate)")(
        graft.SparkEntry.queries("q3_top_revenue")(spark, sfDir))
    }
    spark.stop()
  }
}
