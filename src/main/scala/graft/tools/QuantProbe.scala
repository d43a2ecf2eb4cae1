package graft.tools

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Scratch: decompose sketch_quantiles — quantile side alone
  * (approx_percentile vs histogramQuantiles) vs the rank-check pass.
  * Usage: runMain graft.tools.QuantProbe [sfDir] [reps]
  */
object QuantProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("target/sf10")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.Bench.session("32")
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        Option(t.taskMetrics).foreach(m => taskMs.addAndGet(m.executorRunTime))
    })
    val probs = Seq(0.25, 0.5, 0.95)
    def li = Tables.lineitem(spark, sfDir).select(col("l_returnflag").as("g"),
      col("l_extendedprice").cast("double").as("v"))
    val range = graft.core.RowCounts.columnRange(Tables.lineitem(spark, sfDir), "l_extendedprice").get
    def time(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val m0 = taskMs.get
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      graft.core.CacheScope.release()
      println(f"[quant] $tag%-22s ${(System.nanoTime() - t0) / 1e9}%.3f s" +
        f"  taskTime ${(taskMs.get - m0) / 1e3}%.1f s")
    }
    val eps = 0.01
    // old gate form: sketch + broadcast-join rank check (x3 row multiply)
    def oldGate() = {
      val approx = graft.operators.Stats.approxQuantiles(li, "v", "g", probs, 1000)
      val p = element_at(array(probs.map(lit): _*), col("which").cast("int"))
      li.join(broadcast(approx), "g")
        .groupBy(col("g"), col("which"), col("q"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("v") <= col("q"), 1L).otherwise(0L)).as("r_le"),
          sum(when(col("v") < col("q"), 1L).otherwise(0L)).as("r_lt"))
        .select(col("g"), col("which"), col("n"),
          (col("r_lt") <= (p + eps) * col("n") + 1 &&
            col("r_le") >= (p - eps) * col("n") - 1).as("within_bound"))
        .orderBy("g", "which")
    }
    // collected-threshold form: sketch collected (9 rows), check in ONE
    // un-multiplied pass of 9 conditional sums
    def collectedGate() = {
      val qs = graft.operators.Stats.approxQuantiles(li, "v", "g", probs, 1000)
        .collect().map(r => (r.getString(0), r.get(1).toString.toInt, r.getDouble(2)))
      val sums = qs.flatMap { case (g, w, q) => Seq(
        sum(when(col("g") === g && col("v") <= q, 1L).otherwise(0L)).as(s"le_${g}_$w"),
        sum(when(col("g") === g && col("v") < q, 1L).otherwise(0L)).as(s"lt_${g}_$w")) }
      val aggs = count(lit(1)).as("n") +: sums
      val n1 = li.groupBy(col("g")).agg(aggs.head, aggs.tail: _*)
      val rows = qs.map { case (g, w, q) =>
        val p = probs(w - 1)
        n1.filter(col("g") === g).select(col("g"), lit(w).as("which"), col("n"),
          (col(s"lt_${g}_$w") <= (lit(p) + eps) * col("n") + 1 &&
            col(s"le_${g}_$w") >= (lit(p) - eps) * col("n") - 1).as("within_bound"))
      }
      rows.reduce(_.unionByName(_)).orderBy("g", "which")
    }
    (1 to reps).foreach { rep =>
      println(s"--- rep $rep")
      time("old gate (joincheck)")(oldGate())
      time("collected check")(collectedGate())
      time("approx_percentile")(
        graft.operators.Stats.approxQuantiles(li, "v", "g", probs, 1000))
      time("histogram")(
        graft.operators.Stats.histogramQuantiles(li, "v", "g", probs, range._1, range._2))
      Seq(65536, 8192, 1024).foreach { nb =>
        time(s"census only $nb")(
          li.groupBy(col("g"), least(lit(nb - 1), greatest(lit(0),
            floor((col("v") - lit(range._1)) / lit((range._2 - range._1) / nb)).cast("int"))).as("b"))
            .agg(count(lit(1)).as("c"), max("v").as("mx")))
      }
      time("check pass only")(
        li.groupBy(col("g")).agg(count(lit(1)).as("n"),
          sum(when(col("v") <= 50000.0, 1L).otherwise(0L)).as("r_le")))
    }
    spark.stop()
  }
}
