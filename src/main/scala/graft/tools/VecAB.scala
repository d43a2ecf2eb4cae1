package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Scratch: emb_l2_normalize A/B — the composable HOF chain
  * (transform-cast → graft_dot → transform-divide, then
  * round/cast/cast + array_join rendering; two interpreted
  * ArrayTransform passes and per-element Decimal/UTF8String boxing)
  * vs the shipped native L2Normalize + FormatDec6Csv pair.
  * Bit-identical by spec; this prices CPU only.
  *
  * Usage: runMain graft.tools.VecAB [sfDir] [reps]
  */
object VecAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("target/sf10")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.Bench.session("32")
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        Option(t.taskMetrics).foreach(m => taskMs.addAndGet(m.executorRunTime))
    })
    val br = org.apache.spark.sql.GraftBridge

    // OLD gate form: composable chain end to end
    def l2Old(): DataFrame = {
      val staged = graft.core.Spread.ensureParallel(Tables.embeddings(spark, sfDir))
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("_v"))
        .withColumn("_n", sqrt(br.dotProduct(col("_v"), col("_v"))))
      staged.select(col("vec_id"),
        when(col("_n") === 0.0, col("_v"))
          .otherwise(transform(col("_v"), x => x / col("_n")))
          .as("normalized"))
        .select(col("vec_id"),
          array_join(transform(col("normalized"),
            x => round(x, 6).cast("decimal(10,6)").cast("string")), ",")
            .as("normalized"))
    }

    def time(tag: String)(df: => DataFrame): Unit = {
      val m0 = taskMs.get
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[vecab] $tag%-18s ${(System.nanoTime() - t0) / 1e9}%.3f s" +
        f"  taskTime ${(taskMs.get - m0) / 1e3}%.1f s")
    }
    (1 to reps).foreach { rep =>
      println(s"--- rep $rep")
      time("l2 chain (old)")(l2Old())
      time("l2 native (gate)")(
        graft.SparkEntry.queries("emb_l2_normalize")(spark, sfDir))
    }
    spark.stop()
  }
}
