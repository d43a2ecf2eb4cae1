package graft.tools

/** Scratch probe: where does dedup_semantic's wall go? (dev harness) */
object SemProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Bench.session("32")
    graft.SparkEntry.warm(spark, sfDir)
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag%-24s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    (1 to 4).foreach { rep =>
      println(s"--- rep $rep")
      val df = time("construct")(graft.SparkEntry.queries("dedup_semantic")(spark, sfDir))
      time("analyze")(df.queryExecution.assertAnalyzed())
      time("optimize+plan")(df.queryExecution.executedPlan)
      time("execute")(df.write.format("noop").mode("overwrite").save())
      if (rep == 1) {
        val plan = df.queryExecution.executedPlan.toString
        println("[probe] exchanges=" + "Exchange".r.findAllIn(plan).length +
          " broadcasts=" + "BroadcastExchange".r.findAllIn(plan).length +
          " smj=" + "SortMergeJoin".r.findAllIn(plan).length +
          " bhj=" + "BroadcastHashJoin".r.findAllIn(plan).length)
        println(df.queryExecution.executedPlan.treeString.split("\n").map(_.take(100)).take(60).mkString("\n"))
      }
      graft.core.CacheScope.release()
    }
    spark.stop()
  }
}
