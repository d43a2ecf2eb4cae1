package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard configuration.
  *
  * Tuned for correctness-determinism (UTC, ANSI off for permissive casts)
  * and for scale (AQE, modest shuffle partitions on local[*]; on a real
  * cluster `spark.sql.shuffle.partitions` should track 2-3x total cores
  * and AQE coalescing handles the rest).
  */
object GraftSession {

  /** Per-session conf overrides applied LAST by [[configure]]. Needed
    * because configure() is not called once per session: query paths
    * re-apply it defensively (e.g. Tables.events via SparkEntry), so an
    * A/B override set only at session build (the old Bench knob) was
    * silently reverted to the defaults by the first such call — the
    * AQE on/off experiment measured on == on. Keyed BY SESSION (weak, so
    * a torn-down session releases its entry): a process-global map would
    * leak Bench's local-only pins (AQE off, 12 shuffle partitions) into
    * every other session configured later in the same JVM — exactly the
    * production path the pins must not touch.
    */
  private val sessionOverrides =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, Map[String, String]]())

  /** Register overrides for ONE session; configure() re-applies them on
    * every call for that session and no other.
    */
  def registerOverrides(spark: SparkSession, overrides: Map[String, String]): Unit =
    sessionOverrides.put(spark, overrides)

  /** Merge additional overrides into a session's existing registration
    * (later wins) — for opt-ins layered after session build (e.g. the
    * bench layout redirect) that must not clobber the base pins.
    */
  def addOverrides(spark: SparkSession, overrides: Map[String, String]): Unit = {
    val prior = Option(sessionOverrides.get(spark)).getOrElse(Map.empty)
    sessionOverrides.put(spark, prior ++ overrides)
  }

  /** Apply engine configs onto an arbitrary (possibly driver-provided)
    * session. All of these are runtime-settable SQL confs.
    */
  def configure(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    // events.parquet carries TIMESTAMP(NANOS) which Spark's parquet reader
    // rejects; read as epoch-nanos long and convert (Tables.events).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    // Typed aggregators (MinHash signatures) run through
    // ObjectHashAggregate, whose default fallback-to-sort threshold is a
    // tiny 128 groups per partition — a per-partition SORT of the whole
    // shingle fanout. Group buffers are small (one Array[Long] per doc);
    // let the hash path run.
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
    // Bucketed layouts (core.Layout) are written per-bucket-SORTED with
    // one file per bucket; this conf lets the scan report that order so
    // sort-merge joins over bucket-matched tables elide their Sort nodes
    // as well as the Exchange. Spark parked the ordering calculation
    // behind this flag because multi-file buckets can't use it anyway —
    // the single-file check still guards correctness, our writer
    // guarantees the layout qualifies.
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    // Broadcast dimension-sized sides up to 64 MB (production clusters
    // with multi-GB executors run 100 MB+). Size-based, so genuinely big
    // sides still sort-merge; AQE re-plans to broadcast at runtime when
    // the post-filter size qualifies.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
    // Permissive evaluation: the reference swallows per-op errors (invalid
    // JSON, bad indexes — plugs/podping/functions.sql:91-96) instead of
    // failing the stream; ANSI strict mode would abort the job on the
    // first malformed op.
    spark.conf.set("spark.sql.ansi.enabled", "false")
    // SQL access to the native expressions (graft_dot, ...) even on
    // sessions built without spark.sql.extensions=graft.GraftExtensions.
    org.apache.spark.sql.GraftBridge.registerGraftFunctions(spark)
    Option(sessionOverrides.get(spark))
      .foreach(_.foreach { case (k, v) => spark.conf.set(k, v) })
    spark
  }

  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", math.min(cores * 2, 64).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      // static conf: default 100-entry generated-class cache thrashes on
      // a workload with hundreds of distinct plans — every re-execution
      // then re-pays Janino compilation (measured 1.8x on the full query
      // suite). Generated classes are small; hold the whole workload.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    configure(spark)
  }
}
