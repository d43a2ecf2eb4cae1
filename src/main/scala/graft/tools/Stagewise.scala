package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe: time the jaccard pair pipeline stage by stage. */
object Stagewise {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Bench.session("32")
    val docs = graft.core.Tables.documents(spark, sfDir)
    docs.write.format("noop").mode("overwrite").save()
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stage] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    (1 to 3).foreach { rep =>
      println(s"--- rep $rep")
      val sh = graft.operators.Dedup.shingles(docs, "text", "doc_id", 3).cache()
      time("shingles+cache")(sh.write.format("noop").mode("overwrite").save())
      val joined = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc") < col("b.doc"))
        .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
      time("self-join")(joined.write.format("noop").mode("overwrite").save())
      val inter = joined.groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("i"))
      time("join+groupBy")(inter.write.format("noop").mode("overwrite").save())
      val full = graft.operators.Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, 0.8)
      time("full jaccard")(full.write.format("noop").mode("overwrite").save())
      sh.unpersist(true)
      graft.core.CacheScope.release()
    }
    spark.stop()
  }
}
