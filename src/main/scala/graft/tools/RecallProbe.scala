package graft.tools

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Similarity

/** Scratch: measured IVF / IVF-PQ recall@k vs exact brute-force per
  * nProbe at a tier — sets the sim_ivf_recall / sim_ivfpq_recall gate
  * floors from evidence.
  * Usage: runMain graft.tools.RecallProbe [sfDir] [k] [nProbes,...] [ivf|pq]
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val k = args.lift(1).map(_.toInt).getOrElse(10)
    val nps = args.lift(2).map(_.split(",").toSeq.map(_.toInt))
      .getOrElse(Seq(1, 2, 4, 8))
    val mode = args.lift(3).getOrElse("ivf")
    val spark = graft.Bench.session("32")
    val emb = Tables.embeddings(spark, sfDir)
    val probes = emb.filter(col("vec_id") < 50)
    val exact = Similarity.bruteForceTopK(emb, probes, k)
      .select(col("probe_id"), col("neighbor_id")).cache()
    val nExact = exact.count()
    def hitsOf(df: org.apache.spark.sql.DataFrame): Long = df
      .select(col("probe_id"), col("neighbor_id"))
      .join(exact, Seq("probe_id", "neighbor_id"), "left_semi").count()
    if (mode == "pq") {
      // exact excludes self-pairs, PQ topK keeps them (serving contract)
      // — rank candidates without self so one slot isn't always burned
      val idx = Similarity.buildIvfPq(emb)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("probe_id"))
        .orderBy(col("approx_dist"), col("neighbor_id"))
      val cand = idx.rankedCandidates(probes, maxProbe = nps.max)
        .filter(col("probe_id") =!= col("neighbor_id")).cache()
      nps.foreach { np =>
        val hits = hitsOf(cand.filter(col("cell_rank") <= np)
          .withColumn("_rn", row_number().over(w)).filter(col("_rn") <= k))
        println(f"[recall-pq] $sfDir k=$k m=${idx.codebooks.length} nProbe=$np recall=${hits.toDouble / nExact}%.4f ($hits/$nExact)")
      }
    } else {
      val idx = Similarity.buildIvf(emb)
      nps.foreach { np =>
        val hits = hitsOf(idx.topK(probes, k, nProbe = np))
        println(f"[recall] $sfDir k=$k nProbe=$np recall=${hits.toDouble / nExact}%.4f ($hits/$nExact)")
      }
    }
    spark.stop()
  }
}
