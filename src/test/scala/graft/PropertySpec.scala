package graft

import graft.plugs.{Podping, Polls}

/** Property-based invariants (SURVEY §5.3): explode conservation, replay
  * idempotency, arrival-order invariance — sampled over seeded random
  * inputs (plain deterministic generation; the scalatest/scalacheck bridge
  * artifact is not available offline).
  */
class PropertySpec extends SparkSpec {
  import Fixtures._

  private def randomUrlLists(seed: Long): Seq[Seq[String]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(1 + rnd.nextInt(8))(
      Seq.fill(1 + rnd.nextInt(5))(s"https://${rnd.alphanumeric.take(6).mkString.toLowerCase}.example/feed"))
  }

  test("explode row-count conservation: sum(len(urls)) == count(updates)") {
    for (seed <- Seq(1L, 42L, 99L, 2024L)) {
      val urlLists = randomUrlLists(seed)
      val rows = urlLists.zipWithIndex.map { case (urls, i) =>
        op(i.toLong, 100 + i, i % 10, "2024-01-01 00:00:00", "podping", podpingV03(urls))
      }
      val updates = Podping.transform(opLog(spark, rows))("updates")
      assert(updates.count() === urlLists.map(_.size).sum.toLong, s"seed=$seed")
    }
  }

  test("re-processing a block range is idempotent (same state)") {
    val rows = (0 until 20).map { i =>
      op(i.toLong, 100 + i / 10, i % 10, "2024-01-01 00:00:00", "podping",
        podpingV03(Seq(s"u${i % 3}")))
    }
    val a = Podping.transform(opLog(spark, rows))("updates")
      .orderBy("podping_id", "url").collect().toSeq
    val b = Podping.transform(opLog(spark, rows))("updates")
      .orderBy("podping_id", "url").collect().toSeq
    assert(a === b)
  }

  test("polls outcome independent of row arrival order within a range") {
    val base = Seq(
      op(1, 100, 0, "2024-01-01 00:00:00", "polls",
        pollCreate("p", "first", Seq("a"), "2024-02-01 00:00:00", "t"), postingAuth = "u"),
      op(2, 100, 1, "2024-01-01 00:00:01", "polls",
        pollCreate("p", "second", Seq("b"), "2024-02-01 00:00:00", "t"), postingAuth = "u"),
      op(3, 101, 0, "2024-01-01 00:00:02", "polls",
        pollVote("u", "p", 1), postingAuth = "v"))
    for (seed <- Seq(0L, 7L, 123L)) {
      val shuffled = new scala.util.Random(seed).shuffle(base)
      val t = Polls.transform(opLog(spark, shuffled))
      val c = t("content").collect()
      assert(c.length === 1 && c.head.getAs[String]("question") === "first", s"seed=$seed")
      assert(t("votes").count() === 1)
    }
  }

  test("connected components match driver-side union-find on random graphs") {
    val s = spark
    import s.implicits._
    for (seed <- Seq(5L, 42L)) {
      val rnd = new scala.util.Random(seed)
      val nodes = 60
      val pairs = Seq.fill(50) {
        val a = rnd.nextInt(nodes).toLong; val b = rnd.nextInt(nodes).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2).distinct
      // reference: plain union-find on the driver
      val parent = Array.tabulate(nodes)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = pairs.flatMap(p => Seq(p._1, p._2)).distinct
        .map(n => n -> find(n.toInt).toLong).toMap
      val got = graft.operators.Dedup.nearDupClusters(pairs.toDF("doc_a", "doc_b"))
        .collect().map(r => r.getAs[Long]("doc") -> r.getAs[Long]("cluster")).toMap
      // the alternating large-star/small-star formulation must agree on
      // the same graphs (same contract, different round structure)
      val gotStar = graft.operators.Dedup.starCc(pairs.toDF("doc_a", "doc_b"))._1
        .collect().map(r => r.getAs[Long]("doc") -> r.getAs[Long]("cluster")).toMap
      // union-find roots are not necessarily component minima; normalize both
      def canon(m: Map[Long, Long]): Map[Long, Long] = {
        val byComp = m.groupBy(_._2).values
        byComp.flatMap(g => { val mn = g.keys.min; g.keys.map(_ -> mn) }).toMap
      }
      assert(canon(got) === canon(expected), s"seed=$seed")
      assert(gotStar === canon(expected), s"star seed=$seed")
    }
  }

  test("int8 quantization: reconstruction error <= scale/2 on random vectors") {
    val s = spark
    import s.implicits._
    for (seed <- Seq(7L, 42L)) {
      val rnd = new scala.util.Random(seed)
      val vecs = (0L until 50L).map(i =>
        (i, Array.fill(16)((rnd.nextDouble() * 200 - 100).toFloat)))
      val df = vecs.toDF("vec_id", "embedding")
      val q = graft.operators.Embeddings.quantizeInt8(df).collect()
        .map(r => r.getAs[Long]("vec_id") ->
          (r.getAs[Double]("scale"), r.getAs[scala.collection.Seq[Int]]("quantized"))).toMap
      vecs.foreach { case (id, v) =>
        val (scale, qv) = q(id)
        assert(qv.forall(x => x >= -127 && x <= 127), s"seed=$seed id=$id range")
        v.zip(qv).foreach { case (orig, x) =>
          // scale is rounded to 6 dp for output, widen the bound accordingly
          assert(math.abs(orig - x * scale) <= scale / 2 + 1e-4,
            s"seed=$seed id=$id err")
        }
      }
    }
  }

  test("split labels partition every key, stable under re-evaluation") {
    val s = spark
    import s.implicits._
    val keys = (0L until 3000L).toDF("id")
    val labeled = keys.select(org.apache.spark.sql.functions.col("id"),
      graft.operators.Sampling.splitLabel(
        org.apache.spark.sql.functions.col("id"), 700, 200).as("l"))
    val counts = labeled.groupBy("l").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum === 3000L)
    // loose concentration: 700/1000 of 3000 = 2100 expected
    assert(counts("train") > 1900 && counts("train") < 2300)
    assert(counts("valid") > 450 && counts("valid") < 750)
    // determinism across evaluations
    val again = labeled.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val first = labeled.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again === first)
  }

  test("token-budget packing: every bin's start offset is inside its budget window") {
    val s = spark
    import s.implicits._
    for (seed <- Seq(3L, 11L)) {
      val rnd = new scala.util.Random(seed)
      val docs = (0L until 200L).map(i =>
        (i, Seq.fill(1 + rnd.nextInt(40))("w").mkString(" "))).toDF("doc_id", "text")
      val budget = 100L
      val r = graft.operators.TextAnalysis.packByTokenBudget(docs, budget)
        .orderBy("doc_id").collect()
      var cum = 0L
      r.foreach { row =>
        val bin = row.getAs[Long]("bin")
        assert(bin === cum / budget, s"seed=$seed doc=${row.getAs[Long]("doc_id")}")
        cum += row.getAs[Long]("n_tokens")
      }
      // bins are dense: no gaps in the bin sequence
      val bins = r.map(_.getAs[Long]("bin")).distinct.sorted
      assert(bins.zipWithIndex.forall { case (b, i) => b == bins.head + i })
    }
  }

  test("chunking: stride == window reconstructs the token stream exactly") {
    val s = spark
    import s.implicits._
    for (seed <- Seq(5L, 17L)) {
      val rnd = new scala.util.Random(seed)
      val docs = (0L until 50L).map(i =>
        (i, Seq.fill(rnd.nextInt(120))(s"t${rnd.nextInt(9)}").mkString(" ")))
        .toDF("doc_id", "text")
      val chunks = graft.operators.TextAnalysis.chunkTokens(docs, 7, 7)
        .orderBy("doc_id", "chunk_id").collect()
      val rebuilt = chunks.groupBy(_.getAs[Long]("doc_id")).view
        .mapValues(_.sortBy(_.getAs[Long]("chunk_id"))
          .map(_.getAs[String]("chunk_text")).mkString(" ")).toMap
      docs.collect().foreach { r =>
        val id = r.getAs[Long]("doc_id")
        val toks = r.getAs[String]("text").split(" ").filter(_.nonEmpty).mkString(" ")
        assert(rebuilt.getOrElse(id, "") === toks, s"seed=$seed doc=$id")
      }
      // overlapping chunks never exceed the window and cover every token
      val over = graft.operators.TextAnalysis.chunkTokens(docs, 7, 3).collect()
      assert(over.forall(_.getAs[Long]("chunk_tokens") <= 7))
    }
  }

  test("PII redaction is idempotent: a second pass finds nothing") {
    val s = spark
    import s.implicits._
    val d = Seq(
      (0L, "a@b.example and 10.1.2.3 plus 99887766554 end"),
      (1L, "double x@y.example z@w.example"),
      (2L, "clean text only")).toDF("doc_id", "text")
    val once = graft.operators.TextAnalysis.redactPii(d)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text_redacted").as("text"))
    val twice = graft.operators.TextAnalysis.redactPii(once).collect()
    twice.foreach { r =>
      assert(r.getAs[Long]("n_emails") === 0L)
      assert(r.getAs[Long]("n_ipv4") === 0L)
      assert(r.getAs[Long]("n_digit_runs") === 0L)
      assert(r.getAs[String]("text_redacted") === r.getAs[String]("text"))
    }
  }

  test("stratified sample per stratum == deterministic sample at that stratum's rate") {
    val s = spark
    import s.implicits._
    val rows = (0L until 2000L).map(i =>
      (i, if (i % 2 == 0) "even" else "odd")).toDF("id", "grp")
    val strat = graft.operators.Sampling.stratifiedSample(rows, "id", "grp",
      Map("even" -> 30), defaultKeep = 70, buckets = 100)
    val even = graft.operators.Sampling.deterministicSample(
      rows.filter(org.apache.spark.sql.functions.col("grp") === "even"), "id", 30, 100)
    val odd = graft.operators.Sampling.deterministicSample(
      rows.filter(org.apache.spark.sql.functions.col("grp") === "odd"), "id", 70, 100)
    val got = strat.collect().map(_.getLong(0)).toSet
    val want = (even.collect().map(_.getLong(0)) ++ odd.collect().map(_.getLong(0))).toSet
    assert(got === want)
  }

  test("bloom incremental dedup == exact incremental dedup on random corpora") {
    val s = spark
    import s.implicits._
    for (seed <- Seq(3L, 77L, 500L)) {
      val rnd = new scala.util.Random(seed)
      def doc() = Seq.fill(5 + rnd.nextInt(10))(s"w${rnd.nextInt(20)}").mkString(" ")
      val corpusDocs = Seq.tabulate(60)(i => (i.toLong, doc()))
      // batch: fresh docs + re-ingests of random corpus docs + self-dups
      val fresh = Seq.tabulate(40)(i => (1000L + i, doc()))
      val reingest = Seq.fill(10)(corpusDocs(rnd.nextInt(60))).zipWithIndex
        .map { case ((_, t), i) => (2000L + i, t) }
      val selfdup = Seq.fill(5)(fresh(rnd.nextInt(40))).zipWithIndex
        .map { case ((_, t), i) => (3000L + i, t) }
      val corpus = corpusDocs.toDF("doc_id", "text")
      val batch = rnd.shuffle(fresh ++ reingest ++ selfdup).toDF("doc_id", "text")
        .repartition(4)
      val bloom = graft.operators.Dedup.fingerprintBloom(corpus, "text", 4096)
      val viaBloom = graft.operators.Dedup
        .incrementalNewBloom(batch, corpus, bloom, "text", "doc_id")
        .collect().map(_.getAs[Long]("doc_id")).toSet
      val exact = graft.operators.Dedup
        .incrementalNew(batch, corpus, "text", "doc_id")
        .collect().map(_.getAs[Long]("doc_id")).toSet
      assert(viaBloom === exact, s"seed=$seed")
    }
  }

  test("group cap: never exceeds k, subset of input, insensitive to row order") {
    val s = spark
    import s.implicits._
    for (seed <- Seq(11L, 222L)) {
      val rnd = new scala.util.Random(seed)
      val rows = Seq.tabulate(200)(i => (i.toLong, s"g${rnd.nextInt(7)}"))
      val k = 1 + rnd.nextInt(5)
      val a = graft.operators.Sampling
        .capPerGroup(rows.toDF("doc_id", "source"), "source", "doc_id", k, "s")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      val b = graft.operators.Sampling
        .capPerGroup(rnd.shuffle(rows).toDF("doc_id", "source").repartition(5),
          "source", "doc_id", k, "s")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      assert(a.toSet === b.toSet, s"seed=$seed") // order/partitioning invariant
      val perGroup = a.groupBy(_._2).view.mapValues(_.length)
      val groupSizes = rows.groupBy(_._2).view.mapValues(_.length)
      perGroup.foreach { case (g, n) => assert(n === math.min(k, groupSizes(g)), s"$g seed=$seed") }
      assert(a.toSet.subsetOf(rows.toSet), s"seed=$seed")
    }
  }

  test("l2 normalize: unit norm for nonzero vectors, direction preserved") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(9L)
    val vecs = Seq.tabulate(50)(i =>
      (i.toLong, Array.fill(16)(rnd.nextDouble() * 20 - 10)))
    val normed = graft.operators.Embeddings
      .l2Normalize(vecs.toDF("vec_id", "embedding"))
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getSeq[Double](1).toVector).toMap
    val byId = vecs.toMap
    normed.foreach { case (id, v) =>
      val norm = math.sqrt(v.map(x => x * x).sum)
      assert(math.abs(norm - 1.0) < 1e-9, s"id=$id norm=$norm")
      // direction: positive scalar multiple of the original
      val orig = byId(id)
      val ratios = v.zip(orig).filter(p => math.abs(p._2) > 1e-12).map(p => p._1 / p._2)
      assert(ratios.forall(r => math.abs(r - ratios.head) < 1e-9), s"id=$id")
      assert(ratios.head > 0, s"id=$id")
    }
  }

  /** Seeded random text: words of random alphabets (ASCII, digits,
    * punctuation, some multibyte), random multi-space runs, occasional
    * newlines and empty strings — the input space the fused text natives
    * must agree on with their composable formulations.
    */
  private def randomTexts(seed: Long, n: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    val alphabets = Seq("abc", "ABC", "019", ".,!?", "áé中", "ab .")
    Seq.fill(n) {
      if (rnd.nextInt(20) == 0) ""
      else (0 until 1 + rnd.nextInt(30)).map { _ =>
        val a = alphabets(rnd.nextInt(alphabets.length))
        val word = Seq.fill(1 + rnd.nextInt(5))(a(rnd.nextInt(a.length))).mkString
        val sep = if (rnd.nextInt(8) == 0) "  " else if (rnd.nextInt(15) == 0) "\n" else " "
        word + sep
      }.mkString
    }
  }

  test("fused text natives agree with composable formulations on random text") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val br = org.apache.spark.sql.GraftBridge
    for (seed <- Seq(7L, 42L, 777L)) {
      val df = randomTexts(seed, 60).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val toks = array_remove(split(col("text"), " ", -1), "")

      // shingle hashes (w=2): set equality per doc vs xxhash64(concat_ws)
      val refSh = df.filter(size(toks) >= 2).select(col("id"),
          transform(sequence(lit(0), size(toks) - 2),
            i => xxhash64(concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2))))
            .as("hs"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
      val natSh = df.select(col("id"), br.shingleHashes(col("text"), 2).as("hs"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
      refSh.foreach { case (k, v) => assert(natSh(k) === v, s"seed=$seed id=$k") }

      // canonical fingerprint vs the regex chain
      val refFp = df.select(col("id"),
          md5(trim(regexp_replace(regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))).as("fp"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val natFp = df.select(col("id"), br.canonFingerprint(col("text")).as("fp"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(natFp === refFp, s"seed=$seed")

      // token/set-hit/punct counts vs the HOF + regex formulations
      val ws = Seq("ab", "a", "019")
      val refTs = df.select(col("id"),
          size(toks).cast("long").as("nt"),
          coalesce(aggregate(transform(toks, t => length(t)), lit(0), (a, x) => a + x), lit(0))
            .cast("long").as("tc"),
          (length(col("text")) - length(regexp_replace(col("text"), "[^a-zA-Z0-9 ]", "")))
            .cast("long").as("pc"),
          size(filter(toks, t => t.isin(ws: _*))).cast("long").as("h0"),
          size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("long").as("alpha"))
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
      val natTs = df.select(col("id"), br.tokenSetHits(col("text"), Seq(ws)).as("a"))
        .collect().map { r =>
          val a = r.getSeq[Long](1); r.getLong(0) -> ((a(0), a(1), a(2), a(3), a(4)))
        }.toMap
      assert(natTs === refTs, s"seed=$seed")

      // token chunks vs transform/slice/array_join (w=3, stride=2)
      val refCh = df.filter(size(toks) > 0).select(col("id"),
          transform(sequence(lit(1), size(toks), lit(2)),
            st => array_join(slice(toks, st, lit(3)), " ")).as("c"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      val natCh = df.select(col("id"), br.tokenChunks(col("text"), 3, 2).as("c"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      refCh.foreach { case (k, v) => assert(natCh(k) === v, s"seed=$seed id=$k") }

      // term tfs (string) vs explode + groupBy
      val refTf = df.select(col("id"), explode(toks).as("t"))
        .groupBy(col("id"), col("t")).agg(count(lit(1)).as("tf"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val natTf = df.select(col("id"), explode(br.tokenTermTfs(col("text"))).as("tc"))
        .select(col("id"), col("tc.term"), col("tc.tf"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(natTf === refTf, s"seed=$seed")
    }
  }

  test("mixture resample invariants on random corpora: subset, quota law, determinism") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    for (seed <- Seq(5L, 77L, 1234L)) {
      val rnd = new scala.util.Random(seed)
      val nSources = 2 + rnd.nextInt(5)
      val rows = (0 until nSources).flatMap { si =>
        val n = 1 + rnd.nextInt(120)
        (0 until n).map(i => (si * 10000L + i, s"src$si"))
      }
      val df = rows.toDF("doc_id", "source")
      val counts = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val t = rnd.nextDouble() * 2.0
      val target = 1L + rnd.nextInt(300)
      val picked = operators.Sampling
        .mixtureResample(df, "source", "doc_id", t, target, s"p$seed")
        .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source")))
      // subset of the input, no duplicates
      assert(picked.map(_._1).distinct.length === picked.length, s"seed=$seed")
      assert(picked.map(_._1).toSet.subsetOf(rows.map(_._1).toSet), s"seed=$seed")
      // per-source quota law: exactly min(n_s, floor(target * share9)),
      // recomputed independently here with the same rounding contract
      val w = counts.view.mapValues(n => math.pow(n.toDouble, t)).toMap
      val wsum = w.values.sum
      val bySource = picked.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      counts.foreach { case (src, n) =>
        val share9 = BigDecimal(w(src) / wsum).setScale(9, BigDecimal.RoundingMode.HALF_UP)
        val quota = math.min(n, (BigDecimal(target) * share9).setScale(0, BigDecimal.RoundingMode.FLOOR).toLong)
        assert(bySource.getOrElse(src, 0L) === quota, s"seed=$seed src=$src t=$t target=$target")
      }
      // Σ picked <= target (floor law)
      assert(picked.length <= target, s"seed=$seed")
    }
  }
}
