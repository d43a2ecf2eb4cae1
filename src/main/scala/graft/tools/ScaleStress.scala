package graft.tools

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Dedup

/** sf100-tier scale-stress record for the four heavy dedup families
  * (r15 verdict task 1, carried from r14 task 6): measure the STRUCTURAL
  * counters that bound each operator's intermediate work — shingle df
  * census and candidate-pair bound (capped containment), band-bucket
  * census (MinHash-LSH), span-occurrence census (span removal), cluster
  * census and within-cluster pair bound (incremental SemDeDup) — plus
  * the end-to-end operator run with SHUFFLE volume and row counters.
  * Across two tiers built by scripts/scale_up.py with a disjoint
  * per-copy vocabulary, every per-key census is copy-local, so an N×
  * tier must grow every counter EXACTLY N× (the linearity claim a 100 TB
  * deployment rests on); wall/core-s are reported but explicitly NOT the
  * cross-tier comparable in the disk-bound regime — shuffle bytes and
  * row counts are.
  *
  * SemDeDup is the deliberate exception: with a FIXED cluster count k
  * the within-cluster pair space is Θ(N²/k) — quadratic, and the tool
  * PRINTS that bound at the gate's k to document it — so the scale path
  * holds k ∝ N (cluster population stays constant), which this tool
  * exercises by scaling k with the tier (`semanticK` arg). The operator
  * run uses the scaled k; the fixed-k bound is computed analytically
  * (census only — never materialized).
  *
  * Usage: runMain graft.tools.ScaleStress <tierDir> [families] [semanticK]
  *   families: csv of containment,minhash,span,semantic,ann (default all)
  *   semanticK: cluster count for the semantic run (default 32 — the
  *   gate's k; pass 320 at a 10× tier to hold cluster population fixed)
  */
object ScaleStress {

  def main(args: Array[String]): Unit = {
    val tier = args.headOption.getOrElse("/root/repo/target/sf10sub")
    val fams = args.lift(1).map(_.split(",").toSet)
      .getOrElse(Set("containment", "minhash", "span", "semantic", "ann"))
    val semanticK = args.lift(2).map(_.toInt).getOrElse(32)
    val spark = graft.Bench.session("32")
    spark.sparkContext.setLogLevel("ERROR")

    // per-phase task metrics (the cross-tier comparables): shuffle bytes
    // and records both directions, task core-seconds for the wall note
    val shufWB = new java.util.concurrent.atomic.AtomicLong
    val shufWR = new java.util.concurrent.atomic.AtomicLong
    val shufRB = new java.util.concurrent.atomic.AtomicLong
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        Option(t.taskMetrics).foreach { m =>
          shufWB.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufWR.addAndGet(m.shuffleWriteMetrics.recordsWritten)
          shufRB.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          taskMs.addAndGet(m.executorRunTime): Unit
        }
    })
    // TaskEnd events arrive asynchronously on the listener bus; snapshotting
    // right after an action returns can miss late events or attribute them
    // to the next phase. The bus itself is private[spark], so settle by
    // polling the counters until they hold still for two consecutive reads.
    def settle(): Unit = {
      var prev = (shufWB.get, shufWR.get, shufRB.get, taskMs.get)
      var stable = 0
      val deadline = System.nanoTime() + 3L * 1000 * 1000 * 1000
      while (stable < 2 && System.nanoTime() < deadline) {
        Thread.sleep(50)
        val cur = (shufWB.get, shufWR.get, shufRB.get, taskMs.get)
        if (cur == prev) stable += 1 else { stable = 0; prev = cur }
      }
    }
    def phase[T](fam: String, tag: String)(f: => T): T = {
      settle()
      val (w0, r0, b0, t0) = (shufWB.get, shufWR.get, shufRB.get, taskMs.get)
      val n0 = System.nanoTime()
      val res = f
      val wall = (System.nanoTime() - n0) / 1e9
      settle()
      println(f"[stress] tier=$tier family=$fam run=$tag wall=${wall}%.1fs " +
        f"coreS=${(taskMs.get - t0) / 1e3}%.1f " +
        f"shufWriteMB=${(shufWB.get - w0) / 1e6}%.1f " +
        f"shufWriteRows=${shufWR.get - r0} " +
        f"shufReadMB=${(shufRB.get - b0) / 1e6}%.1f")
      res
    }
    def counter(fam: String, name: String, v: Any): Unit =
      println(s"[stress] tier=$tier family=$fam counter=$name value=$v")

    val docs = Tables.documents(spark, tier).select("doc_id", "text")
    lazy val nDocs = docs.count()

    if (fams("containment")) {
      // gate config: w=3, threshold=0.6, maxDfFrac=0.05, sampleMod=8.
      // One df-census pass yields every structural counter: total
      // shingle rows, distinct keys, max df, exact-census hot keys, and
      // the candidate-pair bound Σ C(df,2) over the KEPT keys — the
      // merge self-join's exact output cardinality.
      counter("containment", "n_docs", nDocs)
      val cap = math.ceil(0.05 * nDocs)
      val dfc = phase("containment", "df_census") {
        Dedup.shinglesN(docs, "text", "doc_id", 3)
          .groupBy(col("shingle")).agg(count(lit(1)).as("df"))
          .agg(count(lit(1)).as("keys"), sum(col("df")).as("rows"),
            max(col("df")).as("max_df"),
            sum(when(col("df") > cap, 1L).otherwise(0L)).as("hot"),
            // n*(n-1) is even, so the double division is exact below
            // 2^53 — cast back to long so counters print as integers
            sum(when(col("df") <= cap,
              col("df") * (col("df") - 1) / 2).otherwise(0L))
              .cast("long").as("cand"))
          .collect().head
      }
      counter("containment", "shingle_keys", dfc.getAs[Long]("keys"))
      counter("containment", "shingle_rows", dfc.getAs[Long]("rows"))
      counter("containment", "max_df", dfc.getAs[Long]("max_df"))
      counter("containment", "hot_keys_exact", dfc.getAs[Long]("hot"))
      counter("containment", "candidate_pairs", dfc.getAs[Long]("cand"))
      val nSamp = docs.filter(col("doc_id") % 8 === 0).count()
      counter("containment", "census_sample", nSamp)
      val pairs = phase("containment", "capped_exact") {
        Dedup.containmentPairsCapped(docs, "text", "doc_id", 3, 0.6, 0.05).count()
      }
      graft.core.CacheScope.release()
      counter("containment", "result_pairs", pairs)
      val pairsA = phase("containment", "capped_approx") {
        Dedup.containmentPairsCappedApprox(
          docs, "text", "doc_id", 3, 0.6, 0.05, 8).count()
      }
      graft.core.CacheScope.release()
      counter("containment", "result_pairs_approx", pairsA)
    }

    if (fams("minhash")) {
      // gate config: w=3, numPerm=128, bands=32, threshold=0.8. Bucket
      // census: rows = docs × bands, distinct (band, bucket) keys, max
      // bucket, candidate bound Σ C(sz,2) — the banded equi join's
      // pre-distinct output cardinality.
      val bc = phase("minhash", "bucket_census") {
        val arrs = Dedup.shingleArrays(docs, "text", "doc_id", 3)
        Dedup.bandBuckets(Dedup.minhashSignaturesFromArrays(arrs, 128), 128, 32)
          .groupBy(col("band"), col("bucket")).agg(count(lit(1)).as("sz"))
          .agg(count(lit(1)).as("keys"), sum(col("sz")).as("rows"),
            max(col("sz")).as("max_bucket"),
            sum(col("sz") * (col("sz") - 1) / 2).cast("long").as("cand"))
          .collect().head
      }
      counter("minhash", "bucket_keys", bc.getAs[Long]("keys"))
      counter("minhash", "bucket_rows", bc.getAs[Long]("rows"))
      counter("minhash", "max_bucket", bc.getAs[Long]("max_bucket"))
      counter("minhash", "candidate_pairs", bc.getAs[Long]("cand"))
      val pairs = phase("minhash", "lsh_pairs") {
        Dedup.minhashLshPairs(docs, "text", "doc_id", 3, 128, 32, 0.8).count()
      }
      graft.core.CacheScope.release()
      counter("minhash", "result_pairs", pairs)
    }

    if (fams("span")) {
      // gate config: width=8. Span census: occurrence rows, distinct
      // spans, max occurrences per span, duplicate occurrences (the rows
      // the removal window marks covered — ×8 tokens each, pre-distinct).
      val sc = phase("span", "span_census") {
        Dedup.repeatedSpans(docs, "text", "doc_id", 8, minDocs = 1)
          .agg(count(lit(1)).as("keys"), sum(col("n_total")).as("rows"),
            max(col("n_total")).as("max_span"),
            sum(when(col("n_total") > 1, col("n_total") - 1)
              .otherwise(0L)).as("dups"))
          .collect().head
      }
      counter("span", "span_keys", sc.getAs[Long]("keys"))
      counter("span", "span_rows", sc.getAs[Long]("rows"))
      counter("span", "max_span_occurrences", sc.getAs[Long]("max_span"))
      counter("span", "duplicate_occurrences", sc.getAs[Long]("dups"))
      val rem = phase("span", "remove_spans") {
        Dedup.removeRepeatedSpans(docs, "text", "doc_id", 8)
          .agg(count(lit(1)).as("docs"), sum(col("n_removed")).as("removed"))
          .collect().head
      }
      graft.core.CacheScope.release()
      counter("span", "result_docs", rem.getAs[Long]("docs"))
      counter("span", "tokens_removed", rem.getAs[Long]("removed"))
    }

    if (fams("semantic")) {
      // gate config: batch = vec_id % 5 == 0, corpus = rest, threshold
      // 0.35. Cluster census at the gate's FIXED k=32 (prints the
      // quadratic Θ(N²/k) bound) and at the scaled `semanticK` (the
      // k ∝ N path — constant cluster population, linear bound); the
      // operator itself runs at the scaled k.
      val emb = Tables.embeddings(spark, tier)
      val batch = emb.filter(col("vec_id") % 5 === 0)
      val corpus = emb.filter(col("vec_id") % 5 =!= 0)
      counter("semantic", "batch_rows", batch.count())
      counter("semantic", "corpus_rows", corpus.count())
      // census under BOTH quantizers: min-id seeds (the oracle-expressible
      // gate fixture — id-skewed at high copy counts, all k seeds land in
      // copy 0) and trained k-means centroids (the production path,
      // semanticDedupKMeans) — so max-cell growth measures real balance,
      // not the fixture artifact
      def censusOf(assignCorpus: org.apache.spark.sql.DataFrame =>
          org.apache.spark.sql.DataFrame, tag: String, k: Int): Unit = {
        val cc = phase("semantic", s"cluster_census_$tag$k") {
          val aC = assignCorpus(Dedup.prepVecs(corpus, "vec_id", "embedding"))
            .groupBy(col("cluster")).agg(count(lit(1)).as("nc"))
          val aB = assignCorpus(Dedup.prepVecs(batch, "vec_id", "embedding"))
            .groupBy(col("cluster")).agg(count(lit(1)).as("nb"))
          aC.join(aB, Seq("cluster"), "full")
            .select(coalesce(col("nc"), lit(0L)).as("nc"),
              coalesce(col("nb"), lit(0L)).as("nb"))
            .agg(count(lit(1)).as("cells"), max(col("nc")).as("max_corpus_cell"),
              sum(col("nb") * col("nc") + col("nb") * (col("nb") - 1) / 2)
                .cast("long").as("pair_bound"))
            .collect().head
        }
        graft.core.CacheScope.release()
        counter("semantic", s"cells_$tag$k", cc.getAs[Long]("cells"))
        counter("semantic", s"max_corpus_cell_$tag$k", cc.getAs[Long]("max_corpus_cell"))
        counter("semantic", s"pair_bound_$tag$k", cc.getAs[Long]("pair_bound"))
      }
      for (k <- Seq(32, semanticK).distinct) {
        censusOf(vC => Dedup.assignToSeeds(vC, Dedup.collectSeeds(
          Dedup.prepVecs(corpus, "vec_id", "embedding"), k)), "k", k)
        val centers = phase("semantic", s"train_centers_k$k") {
          Dedup.trainCenters(Dedup.prepVecs(corpus, "vec_id", "embedding"), k)
        }
        censusOf(vC => Dedup.assignToCenters(vC, centers), "trained_k", k)
      }
      val dups = phase("semantic", s"incremental_k$semanticK") {
        Dedup.semanticDedupIncremental(batch, corpus, "vec_id", "embedding",
            semanticK, 0.35)
          .filter(col("keep") === 0L).count()
      }
      graft.core.CacheScope.release()
      counter("semantic", "result_dups", dups)
      // the production operator end-to-end at the scaled k: trained
      // centroids, full corpus (batch ∪ corpus), min-id survivor rule
      val kmDups = phase("semantic", s"kmeans_e2e_k$semanticK") {
        Dedup.semanticDedupKMeans(emb, "vec_id", "embedding", semanticK, 0.35)
          .filter(col("keep") === 0L).count()
      }
      graft.core.CacheScope.release()
      counter("semantic", "kmeans_result_dups", kmDups)
    }

    if (fams("ann")) {
      // ANN at the stress tier: cells = autoCells(n) ≈ √n, so per-probe
      // candidates grow ~√10 per 10× (avg cell = n/√n = √n) — the
      // comparable the cross-tier table checks. Probe count is pinned
      // ~512 per tier (stride over the id space) so totals divide out.
      import graft.operators.Similarity
      val emb = Tables.embeddings(spark, tier)
      val n = emb.count()
      counter("ann", "n_vecs", n)
      counter("ann", "auto_cells", Similarity.autoCells(n))
      val stride = math.max(1L, n / 512L)
      val probes = emb.filter(col("vec_id") % stride === 0)
      val nProbes = probes.count()
      counter("ann", "n_probes", nProbes)
      val idx = phase("ann", "build_ivf") {
        val i = Similarity.buildIvf(emb)
        i.cells.count() // materialize the inverted file inside the phase
        i
      }
      val cs = phase("ann", "cell_census") {
        idx.cells.groupBy(col("cell")).agg(count(lit(1)).as("c"))
          .agg(count(lit(1)).as("cells"), max(col("c")).as("max_cell"),
            sum(col("c")).as("rows"))
          .collect().head
      }
      counter("ann", "ivf_cells", cs.getAs[Long]("cells"))
      counter("ann", "ivf_max_cell", cs.getAs[Long]("max_cell"))
      counter("ann", "ivf_rows", cs.getAs[Long]("rows"))
      for (nProbe <- Seq(1, 4)) {
        val cand = phase("ann", s"ivf_candidates_nprobe$nProbe") {
          idx.rankedCandidates(probes, nProbe).count()
        }
        counter("ann", s"ivf_candidates_nprobe$nProbe", cand)
        counter("ann", s"ivf_cand_per_probe_nprobe$nProbe",
          if (nProbes > 0) cand / nProbes else 0L)
      }
      val tk = phase("ann", "ivf_topk_e2e") { idx.topK(probes, 10, 4).count() }
      counter("ann", "ivf_topk_rows", tk)
      idx.cells.unpersist()
      val pq = phase("ann", "build_ivfpq") {
        val i = Similarity.buildIvfPq(emb)
        i.codes.count()
        i
      }
      val adc = phase("ann", "pq_adc_rows_nprobe2") {
        pq.rankedCandidates(probes, 2).count()
      }
      counter("ann", "pq_adc_rows_nprobe2", adc)
      counter("ann", "pq_adc_per_probe_nprobe2",
        if (nProbes > 0) adc / nProbes else 0L)
      val tk2 = phase("ann", "ivfpq_topk_e2e") { pq.topK(probes, 10, 2).count() }
      counter("ann", "ivfpq_topk_rows", tk2)
      pq.codes.unpersist()
    }

    spark.stop()
  }
}
