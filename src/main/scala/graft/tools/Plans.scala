package graft.tools
import graft.SparkEntry
import graft.core.GraftSession
/** Dev tool: dump formatted physical plans for plan-shape auditing.
  * Usage: runMain graft.tools.Plans <sfDir> <query...>
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    args.tail.foreach { n =>
      println(s"===== $n =====")
      SparkEntry.queries(n)(spark, args.head).explain("formatted")
    }
    spark.stop()
  }
}
