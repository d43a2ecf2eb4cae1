package graft.tools

import org.apache.spark.sql.functions._
import graft.core.{Layout, Tables}

/** Scratch: bucketed-layout A/B for the orderkey join family (r13 task 2).
  * Writes orders+lineitem bucketed by orderkey (one-time, reused across
  * runs), then runs the q3 and j2 join shapes against (a) the flat driver
  * parquet — the shipped gates — and (b) the bucketed layout, reporting
  * wall/taskTime and the exchange/sort count of each plan.
  *
  * Usage: runMain graft.tools.BucketAB [sfDir] [reps] [buckets]
  */
object BucketAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("target/sf10")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val buckets = args.lift(2).map(_.toInt).getOrElse(32)
    val spark = graft.Bench.session("32")
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        Option(t.taskMetrics).foreach(m => taskMs.addAndGet(m.executorRunTime))
    })
    def dec(p: Int, s: Int) = org.apache.spark.sql.types.DecimalType(p, s)
    val br = org.apache.spark.sql.GraftBridge

    val base = s"$sfDir/bucketed$buckets"
    def ensure(table: String, src: => org.apache.spark.sql.DataFrame,
               key: String): org.apache.spark.sql.DataFrame = {
      val path = s"$base/$table"
      if (!new java.io.File(path, "_SUCCESS").exists()) {
        println(s"[bucket] writing $table bucketed($buckets, $key) -> $path")
        val t0 = System.nanoTime()
        val flat = new java.io.File(s"$sfDir/${table.stripPrefix("b_")}.parquet")
        Layout.writeBucketed(src, table, path, key, buckets,
          srcFingerprint = Some(Layout.fingerprint(flat)))
        println(f"[bucket]   layout write ${(System.nanoTime() - t0) / 1e9}%.1f s")
        spark.table(table)
      } else Layout.bucketed(spark, table, path, key, buckets, src)
    }
    val bLine = ensure("b_lineitem", Tables.lineitem(spark, sfDir), "l_orderkey")
    val bOrd = ensure("b_orders", Tables.orders(spark, sfDir), "o_orderkey")

    // q3 over arbitrary orders/lineitem frames (same shape as the gate,
    // Sum dispatched the same way the gate dispatches at this tier)
    def q3(ord: org.apache.spark.sql.DataFrame,
           li: org.apache.spark.sql.DataFrame) =
      Tables.customer(spark, sfDir).filter(col("c_mktsegment") === "BUILDING")
        .join(ord, col("c_custkey") === col("o_custkey"))
        .hint("merge")
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .withColumn("_ur",
          br.unscaled(col("l_extendedprice").cast(dec(18, 2))) *
            (lit(100L) - br.unscaled(col("l_discount").cast(dec(4, 2)))))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(br.makeDecimal38(sum(col("_ur")), 4).as("_rev"))
        .orderBy(col("_rev").desc, col("o_orderkey")).limit(10)
        .select(col("o_orderkey"), col("o_orderdate"),
          col("_rev").cast("string").as("revenue"))
        .orderBy(col("o_orderkey"))

    // j2 shape: orders |X| lineitem on orderkey + theta residual
    def j2(ord: org.apache.spark.sql.DataFrame,
           li: org.apache.spark.sql.DataFrame) =
      ord.hint("merge")
        .join(li, col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .withColumn("_uv", br.unscaled(col("l_extendedprice").cast(dec(18, 2))))
        .groupBy(col("o_orderkey"))
        .agg(count(lit(1)).as("n_lines"),
          br.makeDecimal38(sum(col("_uv")), 2).cast("string").as("early_value"))

    def shape(tag: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val p = df.queryExecution.executedPlan.toString
      val ex = "Exchange hashpartitioning".r.findAllIn(p).size
      val so = " Sort \\[".r.findAllIn(p).size
      println(s"[bucket] $tag plan: $ex hash exchanges, $so sorts")
    }
    shape("q3 flat    ", q3(Tables.orders(spark, sfDir), Tables.lineitem(spark, sfDir)))
    shape("q3 bucketed", q3(bOrd, bLine))
    shape("j2 flat    ", j2(Tables.orders(spark, sfDir), Tables.lineitem(spark, sfDir)))
    shape("j2 bucketed", j2(bOrd, bLine))

    // noop SINK, never count(): Dataset.count() lets the optimizer PRUNE
    // unreferenced aggregate expressions (a count over q1's aggregate
    // never computes the sums at all — measured 9 vs 53 core-s), so a
    // count-based A/B of aggregate arms compares pruned plans. The noop
    // write materializes every output column, like the bench.
    def time(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val m0 = taskMs.get
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[bucket] $tag%-14s ${(System.nanoTime() - t0) / 1e9}%.3f s" +
        f"  taskTime ${(taskMs.get - m0) / 1e3}%.1f s")
    }
    (1 to reps).foreach { rep =>
      println(s"--- rep $rep")
      time("q3 flat")(q3(Tables.orders(spark, sfDir), Tables.lineitem(spark, sfDir)))
      time("q3 bucketed")(q3(bOrd, bLine))
      time("j2 flat")(j2(Tables.orders(spark, sfDir), Tables.lineitem(spark, sfDir)))
      time("j2 bucketed")(j2(bOrd, bLine))
    }
    spark.stop()
  }
}
