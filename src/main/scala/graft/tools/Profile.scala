package graft.tools

import graft.SparkEntry
import graft.core.GraftSession

/** Dev tool: time named queries and dump their formatted plans.
  * Usage: runMain graft.tools.Profile <sfDir> <query...>
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail
    val spark = GraftSession.local(32)
    names.foreach { n =>
      val q = SparkEntry.queries(n)
      if (sys.env.contains("PROFILE_EXPLAIN")) q(spark, sfDir).explain("formatted")
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        q(spark, sfDir).count()
        println(f"[profile] $n run$i ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    }
    spark.stop()
  }
}
