package graft.tools

import org.apache.spark.sql.functions._

/** Scratch: containment self-join strategy A/B at a tier — sort-merge vs
  * shuffle-hash on the shingle equi join (the sf10 watch item: SMJ sorts
  * two candidate-sized sides; DuckDB's hash join doesn't). Dev harness.
  *
  * Usage: runMain graft.tools.ContProbe [sfDir] [reps] [parts,parts,...]
  */
object ContProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("target/sf10")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val partList = args.lift(2).map(_.split(",").toSeq.map(_.toInt))
      .getOrElse(Seq(12, 32))
    // 5th arg: containment threshold (default 0.8; the exact gate runs 0.6)
    val thr = args.lift(4).map(_.toDouble).getOrElse(0.8)
    val spark = graft.Bench.session("32")
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        Option(t.taskMetrics).foreach(m => taskMs.addAndGet(m.executorRunTime))
    })
    val docs = graft.core.Tables.documents(spark, sfDir)
    def time[T](tag: String)(f: => T): T = {
      val m0 = taskMs.get
      val t0 = System.nanoTime(); val r = f
      println(f"[cont] $tag%-26s ${(System.nanoTime() - t0) / 1e9}%.3f s" +
        f"  taskTime ${(taskMs.get - m0) / 1e3}%.1f s"); r
    }
    def run(hintName: String, wide: Int): Unit = {
      val sh = graft.operators.Dedup.shinglesN(docs, "text", "doc_id", 3)
        .cache()
      sh.count()
      val shW = sh.repartition(wide, col("shingle"))
      val joined = shW.as("a").hint(hintName).join(shW.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc") < col("b.doc"))
      val agg = joined.groupBy(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"),
          col("a.n").as("na"), col("b.n").as("nb"))
        .agg(count(lit(1)).as("i"))
        .withColumn("c_ab", round(col("i").cast("double") / col("na"), 6))
        .withColumn("c_ba", round(col("i").cast("double") / col("nb"), 6))
        .filter(col("c_ab") >= thr || col("c_ba") >= thr)
      val n = time(s"$hintName p=$wide join+agg")(agg.count())
      println(s"[cont] $hintName p=$wide pairs=$n")
      sh.unpersist()
    }
    // Candidate-generation arm: per-pair two-sided prefix filter —
    // position + both sizes ride the join, so the Bayardo prefix bound
    // with k = ceil(t*min(na,nb)) is evaluated exactly — then distinct
    // candidates + array-fetch verify. Verdict history: REJECTED at r13
    // (2163 vs 1081 task-core-s at sf10, t=0.8); re-measured r18 under
    // the sorted-array natives, the verdict is THRESHOLD-dependent —
    // WINS at t=0.8 (median 464 vs 778 task-s over 10 alternated warm
    // reps), LOSES at t=0.6 (1651-2732 vs 931-1180, every rep) — which
    // is exactly the dispatch Dedup.containmentPairs now ships.
    def runPrefix(): Unit = {
      val t = thr
      val arrs = graft.core.CacheScope.cached(
        graft.operators.Dedup.shingleArrays(docs, "text", "doc_id", 3))
      val pos = arrs.select(col("doc"), size(col("_arr")).as("n"),
          posexplode(when(size(col("_arr")) > 0, col("_arr"))))
        .select(col("doc"), col("n"), (col("pos") + 1).as("pos"),
          col("col").as("shingle"))
        .repartition(32, col("shingle"))
      val k = ceil(lit(t) * least(col("a.n"), col("b.n")))
      val candidates = pos.as("a").hint("merge")
        .join(pos.as("b"),
          col("a.shingle") === col("b.shingle") && col("a.doc") < col("b.doc") &&
            col("a.pos") <= col("a.n") - k + 1 &&
            col("b.pos") <= col("b.n") - k + 1)
        .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
        .distinct()
      val verified = candidates.hint("merge")
        .join(arrs.select(col("doc").as("doc_a"), col("_arr").as("_arr_a")), Seq("doc_a"))
        .hint("merge")
        .join(arrs.select(col("doc").as("doc_b"), col("_arr").as("_arr_b")), Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          org.apache.spark.sql.GraftBridge
            .intersectCount(col("_arr_a"), col("_arr_b")).as("i"),
          size(col("_arr_a")).cast("long").as("na"),
          size(col("_arr_b")).cast("long").as("nb"))
        .filter(col("i") >= lit(t) * least(col("na"), col("nb")))
      val n = time("prefix+verify (rejected)")(verified.count())
      println(s"[cont] prefix+verify pairs=$n")
      graft.core.CacheScope.release()
    }
    // Round-15 arm (VERDICT r14 task 3): GROUP-LOCAL pair counting —
    // one exchange on shingle, per-shingle doc runs collected to in-row
    // sorted arrays, pairs generated in-row with HOFs (no join node, no
    // SMJ sort of the row-expanded stream). Same pair multiset as the
    // self-join by construction (sort_array orders by doc, pairing each
    // element with its strict successors = a.doc < b.doc).
    def runGroupLocal(wide: Int): Unit = {
      val sh = graft.operators.Dedup.shinglesN(docs, "text", "doc_id", 3)
        .cache()
      sh.count()
      val runs = sh.repartition(wide, col("shingle"))
        .groupBy(col("shingle"))
        .agg(sort_array(collect_list(struct(col("doc"), col("n")))).as("ds"))
        .filter(size(col("ds")) > 1)
      val pairs = runs.select(explode(flatten(transform(col("ds"), (a, i) =>
        transform(slice(col("ds"), i + 2, size(col("ds")) - i - 1),
          b => struct(a.getField("doc").as("doc_a"),
            b.getField("doc").as("doc_b"),
            a.getField("n").as("na"), b.getField("n").as("nb")))))).as("p"))
      val agg = pairs
        .groupBy(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"),
          col("p.na").as("na"), col("p.nb").as("nb"))
        .agg(count(lit(1)).as("i"))
        .withColumn("c_ab", round(col("i").cast("double") / col("na"), 6))
        .withColumn("c_ba", round(col("i").cast("double") / col("nb"), 6))
        .filter(col("c_ab") >= thr || col("c_ba") >= thr)
      val n = time(s"group-local p=$wide")(agg.count())
      println(s"[cont] group-local p=$wide pairs=$n")
      sh.unpersist()
    }
    (1 to reps).foreach { rep =>
      println(s"--- rep $rep")
      runPrefix()
      partList.foreach { p =>
        run("merge", p)
        // arms arg (4th): csv subset {prefix,merge,group} — default all;
        // a focused prefix/merge alternation needs group-local's 50 s of
        // noise out of the window
        if (args.lift(3).forall(_.contains("group"))) runGroupLocal(p)
      }
    }
    spark.stop()
  }
}
