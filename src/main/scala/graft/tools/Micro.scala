package graft.tools
import graft.core.{GraftSession, Tables}
import graft.operators.Dedup
import org.apache.spark.sql.functions._
object Micro {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val d = "/root/testdata/sf0.1"
    def time(n: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val c = f
      println(f"[micro] $n -> $c rows ${(System.nanoTime()-t0)/1e9}%.2fs")
    }
    val docs = Tables.documents(spark, d)
    val sh = Dedup.shingles(docs, "text", "doc_id", 3)
    time("shingles")(sh.count())
    val shc = sh.cache()
    time("shingles cached")(shc.count())
    val sig = Dedup.minhashSignatures(shc, 128)
    time("signatures")(sig.count())
    time("signatures again")(sig.count())
    val pairs = Dedup.minhashLshPairs(docs, "text", "doc_id", 3, 128, 16, 0.8)
    time("full lsh pairs")(pairs.count())
    spark.stop()
  }
}
