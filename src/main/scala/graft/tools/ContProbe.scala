package graft.tools

import org.apache.spark.sql.functions._

/** Scratch: containment self-join strategy A/B at a tier — sort-merge vs
  * shuffle-hash on the shingle equi join (the sf10 watch item: SMJ sorts
  * two candidate-sized sides; DuckDB's hash join doesn't). Dev harness.
  *
  * Usage: runMain graft.tools.ContProbe [sfDir] [reps]
  */
object ContProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("target/sf10")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = graft.Bench.session("32")
    val docs = graft.core.Tables.documents(spark, sfDir)
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[cont] $tag%-26s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    def run(hintName: String): Unit = {
      val sh = graft.operators.Dedup.shinglesN(docs, "text", "doc_id", 3)
        .cache()
      sh.count()
      val wide = math.max(spark.sessionState.conf.numShufflePartitions,
        spark.sparkContext.defaultParallelism)
      val shW = sh.repartition(wide, col("shingle"))
      val joined = shW.as("a").hint(hintName).join(shW.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc") < col("b.doc"))
      val agg = joined.groupBy(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"),
          col("a.n").as("na"), col("b.n").as("nb"))
        .agg(count(lit(1)).as("i"))
        .withColumn("c_ab", round(col("i").cast("double") / col("na"), 6))
        .withColumn("c_ba", round(col("i").cast("double") / col("nb"), 6))
        .filter(col("c_ab") >= 0.8 || col("c_ba") >= 0.8)
      val n = time(s"$hintName join+agg")(agg.count())
      println(s"[cont] $hintName pairs=$n")
      sh.unpersist()
    }
    (1 to reps).foreach { rep =>
      println(s"--- rep $rep")
      run("merge")
      run("shuffle_hash")
    }
    spark.stop()
  }
}
