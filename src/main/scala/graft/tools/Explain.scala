package graft.tools

import graft.{Bench, SparkEntry}

/** Print the formatted physical plan of one SparkEntry query.
  * Usage: runMain graft.tools.Explain <sfDir> <query>
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val name = args(1)
    val spark = Bench.session("32")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    graft.core.CacheScope.release()
    spark.stop()
  }
}
