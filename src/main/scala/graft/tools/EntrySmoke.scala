package graft.tools
import org.apache.spark.sql.SparkSession
/** Dev tool: emulate the driver's entry() smoke test — a session built
  * WITHOUT graft configs (only what a generic driver would set).
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.entry(spark)
    println(s"[entry-smoke] rows=${df.count()}")
    df.show(5, false)
    spark.stop()
  }
}
