package graft.tools

import graft.Bench

/** Decompose the per-query floor: minimal-job scheduling cost vs
  * Catalyst planning cost vs AQE stage overhead, measured warm.
  * Usage: runMain graft.tools.Floor <sfDir>
  */
object Floor {
  def time(label: String, reps: Int)(f: => Unit): Unit = {
    f // warm
    val t0 = System.nanoTime()
    (1 to reps).foreach(_ => f)
    println(f"[floor] $label%-42s ${(System.nanoTime() - t0) / 1e6 / reps}%8.1f ms/op")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Bench.session("32")
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables.documents(spark, sfDir)

    time("range(1).count  [1 job, 1 task]", 20) { spark.range(1).count(): Unit }
    time("range(1e6,32p).count  [1 job, 32 tasks]", 20) {
      spark.range(1000000).repartition(32).count(): Unit }
    val cached = docs.cache(); cached.count()
    time("cached docs count  [1 job]", 20) { cached.count(): Unit }
    time("noop save of cached docs  [1 job]", 20) {
      cached.write.format("noop").mode("overwrite").save() }
    // planning-only: a complex plan analyzed+optimized, never executed
    time("plan-only: 4-table join optimize", 20) {
      val l = graft.core.Tables.lineitem(spark, sfDir)
      val o = graft.core.Tables.orders(spark, sfDir)
      val c = graft.core.Tables.customer(spark, sfDir)
      val n = graft.core.Tables.nation(spark, sfDir)
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name").agg(sum("l_extendedprice").as("s"))
        .queryExecution.executedPlan: Unit }
    // single groupBy over parquet: 2 AQE stages
    time("groupBy agg over parquet [2 stages]", 10) {
      docs.groupBy(length(col("text")) % 10).count()
        .write.format("noop").mode("overwrite").save() }
    // which Catalyst rules dominate the planning floor?
    org.apache.spark.sql.catalyst.rules.RuleExecutor.resetMetrics()
    (1 to 10).foreach { _ =>
      val l = graft.core.Tables.lineitem(spark, sfDir)
      val o = graft.core.Tables.orders(spark, sfDir)
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(sum("l_extendedprice").as("s"))
        .queryExecution.executedPlan: Unit
    }
    println("[floor] --- rule time over 10 plans ---")
    org.apache.spark.sql.catalyst.rules.RuleExecutor.dumpTimeSpent()
      .split("\n").take(25).foreach(l => println("[floor] " + l))
    cached.unpersist()
    spark.stop()
  }
}
