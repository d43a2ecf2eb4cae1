package graft.tools

import org.apache.spark.sql.functions._

/** Scratch: stage-component timings of the ngram-Jaccard join at a tier
  * (dev harness).
  */
object JacProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("target/sf10")
    val spark = graft.Bench.session("32")
    val docs = graft.core.Tables.documents(spark, sfDir)
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag%-22s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    (1 to 2).foreach { rep =>
      println(s"--- rep $rep")
      val sh = graft.operators.Dedup.shinglesN(docs, "text", "doc_id", 3)
      val n = time("shingles scan+count")(sh.count())
      val shC = sh.cache()
      time("cache materialize")(shC.count())
      val shW = shC.repartition(32, col("shingle"))
      time("repartition+count")(shW.count())
      val joined = shW.as("a").hint("merge").join(shW.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc") < col("b.doc"))
      val pairsRaw = time("join fanout count")(joined.count())
      val agg = joined.groupBy(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"),
          col("a.n").as("na"), col("b.n").as("nb"))
        .agg(count(lit(1)).as("i"))
      val pairs = time("join+agg count")(agg.count())
      println(s"[probe] shingleRows=$n joinFanout=$pairsRaw pairs=$pairs")
      shC.unpersist()
    }
    spark.stop()
  }
}
