package graft.tools

import graft.core.Tables
import org.apache.spark.sql.functions._

/** Scratch probe for embeddingCosinePairs sizing (dev harness). */
object CosProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Bench.session("32")
    val emb = Tables.embeddings(spark, sfDir)
    val v0 = emb.select(col("label").as("blk"), col("vec_id").as("vid"),
      transform(col("embedding"), x => x.cast("double")).as("vec"))
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    (1 to 2).foreach { rep =>
      println(s"--- rep $rep")
      val ex = time("exact distinct") {
        v0.groupBy("blk").agg(count(lit(1)).as("nr"), count_distinct(col("vec")).as("nd"))
          .agg(max("nr"), max("nd"), sum("nr"), sum("nd")).collect()(0)
      }
      println(s"[probe] exact: maxNr=${ex.getLong(0)} maxNd=${ex.getLong(1)} totNr=${ex.getLong(2)} totNd=${ex.getLong(3)}")
      val hl = time("hll distinct") {
        v0.groupBy("blk").agg(count(lit(1)).as("nr"), approx_count_distinct(col("vec"), 0.02).as("nd"))
          .agg(max("nr"), max("nd"), sum("nr"), sum("nd")).collect()(0)
      }
      println(s"[probe] hll:   maxNr=${hl.getLong(0)} maxNd=${hl.getLong(1)} totNr=${hl.getLong(2)} totNd=${hl.getLong(3)}")
      val nBlocks = time("block count")(v0.groupBy("blk").count().count())
      println(s"[probe] blocks=$nBlocks")
    }
    spark.stop()
  }
}
