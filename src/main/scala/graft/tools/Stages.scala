package graft.tools

import graft.{Bench, SparkEntry}
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Per-stage attribution for one query: run it once warm, then print each
  * stage's task count, summed executor run time, GC time, and shuffle
  * bytes — the missing level between Quick's per-query totals and a full
  * UI. Usage: runMain graft.tools.Stages <sfDir> <query> [reps]
  */
object Stages {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val name = args(1)
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = Bench.session("32")
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        stages.add(f"stage ${si.stageId}%3d tasks=${si.numTasks}%4d " +
          f"run=${m.executorRunTime / 1000.0}%7.2fs gc=${m.jvmGCTime / 1000.0}%5.2fs " +
          f"cpu=${m.executorCpuTime / 1e9}%7.2fs " +
          f"shW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%8.2fMB " +
          f"shR=${m.shuffleReadMetrics.totalBytesRead / 1e6}%8.2fMB  ${si.name.take(60)}")
      }
    })
    SparkEntry.warm(spark, sfDir)
    (1 to reps).foreach { rep =>
      org.apache.spark.sql.GraftBridge.drainListenerBus(spark)
      stages.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      graft.core.CacheScope.release()
      org.apache.spark.sql.GraftBridge.drainListenerBus(spark)
      println(f"[stages] rep$rep $name $t%.3f s")
      stages.forEach(s => println("[stages]   " + s))
    }
    spark.stop()
  }
}
