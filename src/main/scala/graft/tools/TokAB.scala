package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Scratch: count-only tokenizer A/B — the materializing forms
  * (split → array_remove → size; regexp_extract_all → size) vs the
  * shipped native counting scans (TokenCount / AlnumRunCount), on the
  * gate shapes they feed. Bit-identical by spec; prices CPU only.
  *
  * Usage: runMain graft.tools.TokAB [sfDir] [reps]
  */
object TokAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("target/sf10")
    val reps = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = graft.Bench.session("32")
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        Option(t.taskMetrics).foreach(m => taskMs.addAndGet(m.executorRunTime))
    })

    def docs = graft.core.Spread.ensureParallel(Tables.documents(spark, sfDir))

    // OLD token_counts: both counts via materialized arrays
    def tokOld(): DataFrame = docs
      .withColumn("ws_tokens",
        size(graft.operators.TextAnalysis.tokens(col("text"))).cast("long"))
      .withColumn("re_tokens",
        size(graft.operators.TextAnalysis.regexTokens(col("text"))).cast("long"))
      .select(col("doc_id"), col("ws_tokens"), col("re_tokens"))

    // OLD gini: length census via materialized token arrays
    def giniOld(): DataFrame = {
      val lens = docs.select(
        size(graft.operators.TextAnalysis.tokens(col("text"))).cast("long").as("c"))
      lens.groupBy(col("c")).agg(count(lit(1)).as("m"))
        .agg(count(lit(1)).as("classes"), sum(col("c") * col("m")).as("sx"))
    }
    def giniNewCensus(): DataFrame = {
      val lens = docs.select(
        org.apache.spark.sql.GraftBridge.tokenCount(col("text")).as("c"))
      lens.groupBy(col("c")).agg(count(lit(1)).as("m"))
        .agg(count(lit(1)).as("classes"), sum(col("c") * col("m")).as("sx"))
    }

    def time(tag: String)(df: => DataFrame): Unit = {
      val m0 = taskMs.get
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[tokab] $tag%-22s ${(System.nanoTime() - t0) / 1e9}%.3f s" +
        f"  taskTime ${(taskMs.get - m0) / 1e3}%.1f s")
    }
    (1 to reps).foreach { rep =>
      println(s"--- rep $rep")
      time("token_counts old")(tokOld())
      time("token_counts gate")(
        graft.SparkEntry.queries("text_token_counts")(spark, sfDir))
      time("length census old")(giniOld())
      time("length census native")(giniNewCensus())
    }
    spark.stop()
  }
}
