package graft.tools

import org.apache.spark.sql.functions._

/** Scratch: tf-idf df-side join dispatch A/B at a tier — the shipped
  * footer-gated dictionary broadcast vs the shuffle join it replaced
  * (round-13 watch item: the residual sf10 gap was the df-join term
  * shuffle). Dev harness.
  *
  * Usage: runMain graft.tools.TfidfProbe [sfDir] [reps]
  */
object TfidfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("target/sf10")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = graft.Bench.session("32")
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        Option(t.taskMetrics).foreach(m => taskMs.addAndGet(m.executorRunTime))
    })
    val docs = graft.core.Tables.documents(spark, sfDir)
    def time[T](tag: String)(f: => T): T = {
      val m0 = taskMs.get
      val t0 = System.nanoTime(); val r = f
      println(f"[tfidf] $tag%-22s ${(System.nanoTime() - t0) / 1e9}%.3f s" +
        f"  taskTime ${(taskMs.get - m0) / 1e3}%.1f s"); r
    }
    // the OLD form: identical plan minus the dictionary broadcast (the
    // r12 shipped shape — shuffle join on term, in-row top-k after)
    def oldForm(): org.apache.spark.sql.DataFrame = {
      val k = 3
      val nDf = docs.select(count(lit(1)).cast("double").as("_n"))
      val tf = graft.core.Spread.ensureParallel(docs)
        .select(col("doc_id").as("doc"),
          org.apache.spark.sql.GraftBridge.tokenTermTfs(lower(col("text"))).as("_tc"))
        .select(col("doc"), explode(when(size(col("_tc")) > 0, col("_tc"))).as("t"))
        .select(col("doc"), col("t.term").as("term"), col("t.tf").as("tf"))
      val df_ = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      tf.join(df_, "term")
        .crossJoin(nDf)
        .withColumn("tfidf", round(col("tf") * log(col("_n") / col("df")), 6))
        .groupBy(col("doc"))
        .agg(slice(array_sort(collect_list(struct(
          (-col("tfidf")).as("_neg"), col("term"), col("tf"),
          col("df"), col("tfidf")))), 1, k).as("_top"))
        .select(col("doc"), posexplode(col("_top")))
        .select(col("doc"), col("col.term").as("term"))
    }
    (1 to reps).foreach { rep =>
      println(s"--- rep $rep")
      val nNew = time("broadcast df (shipped)")(
        graft.operators.TextAnalysis.tfidfTopTerms(docs).count())
      val nOld = time("shuffle join (old)")(oldForm().count())
      println(s"[tfidf] rows new=$nNew old=$nOld")
    }
    spark.stop()
  }
}
