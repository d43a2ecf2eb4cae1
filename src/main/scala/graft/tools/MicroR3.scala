package graft.tools
import graft.core.{GraftSession, Tables}
import org.apache.spark.sql.functions._
object MicroR3 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val d = "/root/testdata/sf0.1"
    def time(n: String)(f: => Unit): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime(); f
        println(f"[micro] $n#$i ${(System.nanoTime()-t0)/1e9}%.2fs")
      }
    }
    time("emb_quantize_int8")(graft.SparkEntry.queries("emb_quantize_int8")(spark, d)
      .write.format("noop").mode("overwrite").save())
    time("text_repetition")(graft.SparkEntry.queries("text_repetition")(spark, d)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
