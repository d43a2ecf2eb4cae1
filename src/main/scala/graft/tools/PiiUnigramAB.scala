package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Scratch: same-session A/Bs for the two round-14 string/decimal hot
  * paths, old form inlined (TfidfProbe-style) so the rejected shapes
  * stay runnable:
  *  - text_redact_pii: the r13 three-pass java-regex RegexRedact chain
  *    vs the shipped hand-rolled fused PiiRedact scanner;
  *  - text_unigram_logprob: the boxed decimal cast-multiply weighted
  *    mean (dec(9,0) × dec(28,18) → sum dec(38,18)) vs the shipped
  *    sum128Product int128 accumulation.
  * Both pairs are bit-identical by spec; this prices the CPU only.
  *
  * Usage: runMain graft.tools.PiiUnigramAB [sfDir] [reps]
  */
object PiiUnigramAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("target/sf10")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.Bench.session("32")
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        Option(t.taskMetrics).foreach(m => taskMs.addAndGet(m.executorRunTime))
    })
    val br = org.apache.spark.sql.GraftBridge

    // the gate's PII-synthesis projection, shared by both redact arms
    def withPii = Tables.documents(spark, sfDir).select(col("doc_id"),
      concat(col("text"), lit(" contact user"), col("doc_id"),
        lit("@mail.example from 10."), col("doc_id") % 200,
        lit(".0."), col("doc_id") % 250, lit(" ref "),
        (col("doc_id") + 1000000L) * 37).as("text"))

    // OLD redact form: three chained java-regex RegexRedact passes
    def redactOld(): DataFrame = {
      import graft.operators.TextAnalysis.{EmailRe, Ipv4Re, DigitRunRe}
      graft.core.Spread.ensureParallel(withPii)
        .withColumn("_e", br.regexRedact(col("text"), EmailRe, "<EMAIL>"))
        .withColumn("_i", br.regexRedact(col("_e.redacted"), Ipv4Re, "<IP>"))
        .withColumn("_d", br.regexRedact(col("_i.redacted"), DigitRunRe, "<ID>"))
        .select(col("doc_id"), col("_e.n").as("n_emails"), col("_i.n").as("n_ipv4"),
          col("_d.n").as("n_digit_runs"), md5(col("_d.redacted")).as("redacted_md5"))
    }

    // OLD unigram form: the decimal cast-multiply weighted mean
    def unigramOld(): DataFrame = {
      def dec(p: Int, s: Int) = org.apache.spark.sql.types.DecimalType(p, s)
      val docTerm = graft.core.Spread.ensureParallel(
          Tables.documents(spark, sfDir))
        .select(col("doc_id").as("doc"), br.tokenTfs(lower(col("text"))).as("_tc"))
        .select(col("doc"), explode(when(size(col("_tc")) > 0, col("_tc"))).as("tc"))
        .select(col("doc"), col("tc.h").as("term"), col("tc.tf").as("tf"))
      val counts = docTerm.groupBy(col("term")).agg(sum(col("tf")).as("c"))
      val stats = counts.agg(sum(col("c")).cast("double").as("_T"),
        count(lit(1)).cast("double").as("_V"))
      docTerm.join(counts, "term").crossJoin(stats)
        .groupBy(col("doc"))
        .agg(sum(col("tf")).as("n_tokens"),
          round(sum(col("tf").cast(dec(9, 0))
              * log((col("c") + lit(1)) / (col("_T") + col("_V"))).cast(dec(28, 18)))
            / sum(col("tf")).cast(dec(20, 0)), 6)
            .cast("double").as("avg_logprob"))
        .select(col("doc").as("doc_id"), col("n_tokens"), col("avg_logprob"))
    }

    // noop sink, never count() (count() lets the optimizer prune the
    // expensive projections/aggregates — see SumAB)
    def time(tag: String)(df: => DataFrame): Unit = {
      val m0 = taskMs.get
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[piiab] $tag%-22s ${(System.nanoTime() - t0) / 1e9}%.3f s" +
        f"  taskTime ${(taskMs.get - m0) / 1e3}%.1f s")
    }
    (1 to reps).foreach { rep =>
      println(s"--- rep $rep")
      time("redact regex (old)")(redactOld())
      time("redact scanner (gate)")(
        graft.SparkEntry.queries("text_redact_pii")(spark, sfDir))
      time("unigram boxed (old)")(unigramOld())
      time("unigram int128 (gate)")(
        graft.SparkEntry.queries("text_unigram_logprob")(spark, sfDir))
    }
    spark.stop()
  }
}
