package graft.tools
object PathProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Bench.session("8")
    val d = args.headOption.getOrElse("target/sf10")
    val docs = graft.core.Tables.documents(spark, d)
    import org.apache.spark.sql.functions._
    val corpus = docs.filter(col("doc_id") < 250).select(col("doc_id"), col("text"))
    println("[probe] upperBound=" + graft.core.RowCounts.upperBound(corpus))
    val plan = graft.SparkEntry.queries("dedup_incremental_neardup")(spark, d)
      .queryExecution.optimizedPlan.toString
    println("[probe] plan has minhash=" + plan.toLowerCase.contains("minhash") +
      " len=" + plan.length)
    graft.core.CacheScope.release()
    spark.stop()
  }
}
