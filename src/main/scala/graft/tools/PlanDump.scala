package graft.tools

import graft.SparkEntry

/** Dev tool: dump `explain("formatted")` for every declared query (or a
  * named subset) to one file per query — the plan evidence committed under
  * plans/r<n>/. Runs under the SAME session the bench uses (pins, layout
  * redirect) so the dumped plans are the shapes the timed runs execute.
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> [query...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, rest @ _*) = args: @unchecked
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    // the bench's layout redirect: reuse an existing build, never rebuild
    val layoutDir = s"target/layout/${new java.io.File(sfDir).getCanonicalFile
      .getPath.replaceAll("[^A-Za-z0-9._-]", "_")}"
    if (new java.io.File(layoutDir).isDirectory) {
      graft.core.GraftSession.addOverrides(spark,
        Map("spark.graft.layout.dir" -> layoutDir,
            "spark.graft.layout.src" -> sfDir))
      graft.core.GraftSession.configure(spark)
    }
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    try SparkEntry.warm(spark, sfDir)
    catch { case e: Throwable =>
      System.err.println(s"[plandump] warm failed: ${e.getMessage}")
    }
    val names =
      if (rest.nonEmpty) rest else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      val out = java.nio.file.Paths.get(outDir, s"${n}$suffix.txt")
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(out, txt)
        println(s"[plandump] $n -> $out")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $n FAILED: ${e.getMessage}")
      }
      graft.core.CacheScope.release()
    }
    spark.stop()
  }
}
