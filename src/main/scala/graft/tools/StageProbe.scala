package graft.tools

import graft.{Bench, SparkEntry}
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Dev tool: per-STAGE attribution for one query — where the
  * task-seconds actually go (guide §1: measure first, §7.1's stage view
  * without the UI). Runs the query `reps` times under the bench session
  * and prints, for the LAST rep, each completed stage's task count,
  * summed executor run time, shuffle read/write rows and bytes, and the
  * first line of the stage's call site.
  * Usage: runMain graft.tools.StageProbe <sfDir> <query> [reps]
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = Bench.session("32")
    sys.env.get("SPARK_GRAFT_LAYOUT_DIR").foreach { dir =>
      spark.conf.set("spark.graft.layout.dir", dir)
      spark.conf.set("spark.graft.layout.src", sfDir)
      graft.core.GraftSession.addOverrides(spark,
        Map("spark.graft.layout.dir" -> dir, "spark.graft.layout.src" -> sfDir))
    }
    val stages = scala.collection.mutable.ArrayBuffer[(Int, String, Int, Long, Long, Long, Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        stages += ((si.stageId, si.name.linesIterator.next(), si.numTasks,
          m.executorRunTime,
          m.shuffleReadMetrics.recordsRead, m.shuffleWriteMetrics.recordsWritten,
          m.shuffleReadMetrics.totalBytesRead, m.shuffleWriteMetrics.bytesWritten))
      }
    })
    SparkEntry.warm(spark, sfDir)
    (1 to reps).foreach { rep =>
      stages.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      graft.core.CacheScope.release()
      org.apache.spark.sql.GraftBridge.drainListenerBus(spark)
      println(f"[stageprobe] rep$rep $name wall $wall%.3f s, ${stages.size} stages")
      if (rep == reps) {
        println(f"${"stage"}%6s ${"tasks"}%5s ${"run_s"}%8s ${"shRdRows"}%10s ${"shWrRows"}%10s ${"shRdMB"}%7s ${"shWrMB"}%7s  site")
        stages.sortBy(-_._4).foreach { case (id, nm, nt, rt, rr, wr, rb, wb) =>
          println(f"$id%6d $nt%5d ${rt / 1000.0}%8.2f $rr%10d $wr%10d ${rb / 1e6}%7.1f ${wb / 1e6}%7.1f  $nm")
        }
      }
    }
    spark.stop()
  }
}
