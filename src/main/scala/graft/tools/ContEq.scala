package graft.tools

/** Scratch: row-for-row equality of [[graft.operators.Dedup]]'s two
  * containment forms (aggregation vs prefix-filtered) at a tier where
  * only sampled gates otherwise exercise the prefix path — the r18
  * dispatch's at-scale correctness evidence (exceptAll both directions
  * must be empty; doubles compare exactly because both forms compute
  * the identical i/na divisions).
  *
  * Usage: runMain graft.tools.ContEq [sfDir] [threshold]
  */
object ContEq {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("target/sf10")
    val t = args.lift(1).map(_.toDouble).getOrElse(0.8)
    val spark = graft.Bench.session("32")
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.core.Tables.documents(spark, sfDir)
    val agg = graft.operators.Dedup.containmentPairsAgg(docs, "text", "doc_id", 3, t)
    val pre = graft.operators.Dedup.containmentPairsPrefix(docs, "text", "doc_id", 3, t)
    val d1 = pre.exceptAll(agg).count()
    val d2 = agg.exceptAll(pre).count()
    val n = agg.count()
    graft.core.CacheScope.release()
    println(s"[conteq] t=$t rows=$n prefixMinusAgg=$d1 aggMinusPrefix=$d2")
    require(d1 == 0 && d2 == 0, "containment forms disagree")
    spark.stop()
  }
}
