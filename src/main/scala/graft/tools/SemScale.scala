package graft.tools

import graft.operators.Dedup
import graft.core.Tables

/** Dev tool: measure SemDeDup's cluster-count knob — wall clock and kept
  * count of [[Dedup.semanticDedup]] across k on one tier. The within-
  * cluster pair space is quadratic in cluster size (n/k per cluster), so
  * doubling k should roughly halve the pair work; this prints the
  * measured curve that SCALE_STRESS.md quotes.
  * Usage: runMain graft.tools.SemScale <sfDir> [k1,k2,...] [reps]
  */
object SemScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/target/sf1")
    val ks = args.lift(1).map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(8, 32, 128, 512))
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = graft.Bench.session("32")
    val n = Tables.embeddings(spark, sfDir).count()
    println(s"[semscale] $sfDir rows=$n")
    for (k <- ks; r <- 1 to reps) {
      val t0 = System.nanoTime()
      val kept = Dedup.semanticDedup(Tables.embeddings(spark, sfDir),
          "vec_id", "embedding", k, 0.35)
        .filter(org.apache.spark.sql.functions.col("keep") === 1L).count()
      val dt = (System.nanoTime() - t0) / 1e9
      graft.core.CacheScope.release()
      println(f"[semscale] k=$k%4d rep$r  ${dt}%7.3f s  kept=$kept (block ~${n / k})")
    }
    spark.stop()
  }
}
