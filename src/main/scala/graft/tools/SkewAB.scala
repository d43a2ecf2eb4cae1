package graft.tools

import graft.{Bench, SparkEntry}
import graft.core.GraftSession

/** Skew-join A/B: run join-heavy queries on a skew-adversarial tier
  * (scripts/skew_up.py) under three session configs and report, per run,
  * wall time, the LONGEST SINGLE TASK (the straggler a skewed reduce
  * partition creates — the metric skew handling exists to fix), and how
  * many `skew=true` splits the final adaptive plan contains.
  *
  *   - `static`: AQE off (the bench pins) — the straggler shows up raw.
  *   - `aqe`: AQE on with DEFAULT skew thresholds (256 MB) — at local
  *     data sizes the skewed partition is far below the production
  *     threshold, so this measures AQE's coalescing only; a 100 TB
  *     deployment's skewed partitions clear the default threshold on
  *     their own.
  *   - `aqe_skew`: AQE on with the skew thresholds RESCALED to local
  *     partition sizes (16 MB / factor 3 / 8 MB advisory) — the same
  *     proportional trigger a production partition hits at 256 MB+.
  *     This is knob RESCALING for the local tier, not a semantics
  *     change: what's demonstrated is the runtime split mechanism.
  *
  * Sessions are `newSession()` clones (shared SparkContext, isolated
  * SQLConf) so each config's pins cannot leak into the others —
  * GraftSession overrides are per-session.
  *
  * Usage: runMain graft.tools.SkewAB <sfDir> [q1,q2,...] [reps]
  */
object SkewAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("target/sf1skew")
    val names = args.lift(1).map(_.split(",").toSeq)
      .getOrElse(Seq("q3_top_revenue", "j1_order_enrich", "j2_theta_residual"))
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val base = Bench.session("32")

    // straggler metric: longest single task per measured run
    val maxTaskMs = new java.util.concurrent.atomic.AtomicLong
    base.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        Option(t.taskMetrics).foreach { m =>
          var cur = maxTaskMs.get
          while (m.executorRunTime > cur && !maxTaskMs.compareAndSet(cur, m.executorRunTime))
            cur = maxTaskMs.get
        }
    })

    val configs: Seq[(String, Map[String, String])] = Seq(
      "static" -> Map("spark.sql.adaptive.enabled" -> "false"),
      "aqe" -> Map("spark.sql.adaptive.enabled" -> "true"),
      "aqe_skew" -> Map(
        "spark.sql.adaptive.enabled" -> "true",
        "spark.sql.adaptive.skewJoin.enabled" -> "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "4m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2m"),
      // q3-style plans make the downstream agg ride the join's hash
      // partitioning; splitting the skewed partition would break that
      // guarantee and add a shuffle, so OptimizeSkewedJoin SKIPS them
      // unless forced — the force run prices "skew split + extra
      // exchange" against "shuffle-free agg + straggler"
      "aqe_skew_force" -> Map(
        "spark.sql.adaptive.enabled" -> "true",
        "spark.sql.adaptive.skewJoin.enabled" -> "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "4m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2m",
        "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true"))

    configs.foreach { case (label, pins) =>
      val s = base.newSession()
      GraftSession.registerOverrides(s, pins)
      GraftSession.configure(s)
      // the write command runs its OWN QueryExecution (df.queryExecution
      // stays un-executed, isFinalPlan=false): the EXECUTED adaptive plan
      // is only observable through the execution listener
      @volatile var lastPlan = ""
      s.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(f: String, qe: org.apache.spark.sql.execution.QueryExecution,
                               d: Long): Unit = lastPlan = qe.executedPlan.toString
        override def onFailure(f: String, qe: org.apache.spark.sql.execution.QueryExecution,
                               e: Exception): Unit = ()
      })
      names.foreach { n =>
        var plan = ""
        val times = (0 until reps).map { _ =>
          maxTaskMs.set(0)
          val t0 = System.nanoTime()
          val df = SparkEntry.queries(n)(s, sfDir)
          df.write.format("noop").mode("overwrite").save()
          val wall = (System.nanoTime() - t0) / 1e9
          org.apache.spark.sql.GraftBridge.drainListenerBus(s)
          plan = lastPlan
          graft.core.CacheScope.release()
          (wall, maxTaskMs.get / 1000.0)
        }
        val skewSplits = "skew=true".r.findAllIn(plan).length +
          "skewed".r.findAllIn(plan).length
        try java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"target/skewab_${label}_$n.plan.txt"), plan)
        catch { case _: Throwable => () }
        // min over reps for BOTH metrics independently: external host
        // load only ever inflates, so the minima are the steady state
        val bw = times.map(_._1).min
        val bt = times.map(_._2).min
        println(f"[skewab] $label%-9s $n%-20s wall ${bw}%6.2f s  maxTask ${bt}%5.2f s  skewSplits $skewSplits%d")
      }
    }
    base.stop()
  }
}
