package graft.tools

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Similarity

/** Scratch: measured IVF recall@k vs exact brute-force per nProbe at a
  * tier — sets the sim_ivf_recall gate floors from evidence.
  * Usage: runMain graft.tools.RecallProbe [sfDir] [k] [nProbes,...]
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val k = args.lift(1).map(_.toInt).getOrElse(10)
    val nps = args.lift(2).map(_.split(",").toSeq.map(_.toInt))
      .getOrElse(Seq(1, 2, 4, 8))
    val spark = graft.Bench.session("32")
    val emb = Tables.embeddings(spark, sfDir)
    val probes = emb.filter(col("vec_id") < 50)
    val exact = Similarity.bruteForceTopK(emb, probes, k)
      .select(col("probe_id"), col("neighbor_id")).cache()
    val nExact = exact.count()
    val idx = Similarity.buildIvf(emb)
    nps.foreach { np =>
      val hits = idx.topK(probes, k, nProbe = np)
        .select(col("probe_id"), col("neighbor_id"))
        .join(exact, Seq("probe_id", "neighbor_id"), "left_semi").count()
      println(f"[recall] $sfDir k=$k nProbe=$np recall=${hits.toDouble / nExact}%.4f ($hits/$nExact)")
    }
    spark.stop()
  }
}
