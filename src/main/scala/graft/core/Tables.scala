package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (see /root/repo/TESTDATA.md).
  *
  * All loads are plain parquet scans so Catalyst keeps pushdown/pruning;
  * the only normalization is `events.ts`, stored as parquet TIMESTAMP(NANOS)
  * (unreadable by Spark's reader) — we read it as epoch-nanos long
  * (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to microseconds,
  * which matches DuckDB's ns->us truncation when it reads the same file.
  */
object Tables {

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Memoized resolved relations, keyed by (session, file path).
    *
    * `spark.read.parquet(path)` resolves lazily — but resolution
    * (`ResolveDataSource`: file listing + parquet footer/schema read) runs
    * again for EVERY query that re-reads the table, and rule profiling
    * shows it at ~50-100 ms per table reference — the single largest
    * driver-side cost of short queries. Reusing the analyzed DataFrame
    * makes resolution once-per-session-per-table, exactly what a catalog
    * (metastore table / DSv2 catalog) provides at 100 TB, where schemas
    * are declared rather than re-inferred per query. Plan-object reuse
    * only: no data is cached, and Catalyst re-optimizes each consuming
    * query from scratch (a weak-keyed map would be nicer; sessions here
    * are few and long-lived).
    */
  private val resolved =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  /** Drop memoized resolutions — for ALL sessions, or one session's only.
    *
    * The memo captures the parquet file listing at first resolution, so
    * data REWRITTEN at the same path within a session would otherwise be
    * silently missed (stale InMemoryFileIndex; possibly missing-file task
    * failures). Data-regeneration tooling must call this after rewriting
    * any table it previously read. Also the release point for the map's
    * strong SparkSession references when a session is torn down mid-JVM.
    */
  def invalidate(session: Option[SparkSession] = None): Unit = {
    session match {
      case None => resolved.clear()
      case Some(s) => resolved.keys.filter(_._1 eq s).foreach(resolved.remove)
    }
    epochCounter.incrementAndGet()
  }

  /** Data-version epoch: bumped by every [[invalidate]] call. Downstream
    * plan caches (the serving layer's prepared plans) key on this so a
    * data rewrite invalidates every prepared plan without coupling the
    * cache to individual tables.
    */
  private val epochCounter = new java.util.concurrent.atomic.AtomicLong(0L)
  def epoch: Long = epochCounter.get

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    name match {
      case "events" => events(spark, sfDir)
      case other =>
        resolved.getOrElseUpdate((spark, s"$sfDir/$other.parquet"),
          spark.read.parquet(s"$sfDir/$other.parquet"))
    }

  /** events with `ts` as a proper TimestampType (microsecond precision),
    * whatever the file's physical type. Generations of the driver testdata
    * have stored `ts` three ways:
    *
    *  - parquet TIMESTAMP(NANOS): unreadable by Spark's reader natively —
    *    read as epoch-nanos long (`spark.sql.legacy.parquet.nanosAsLong`)
    *    and truncate to microseconds (`ts DIV 1000` is exact integer
    *    division; a double division would lose precision at 1.7e18 ns).
    *    Matches DuckDB's ns->us truncation on the same file.
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark reads
    *    TIMESTAMP_NTZ; cast to TimestampType — value-identical under the
    *    pinned UTC session timezone, and keeps every downstream window /
    *    interval expression on the single type they were written for.
    *  - TIMESTAMP(MICROS, utc): already TimestampType; passthrough.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    resolved.getOrElseUpdate((spark, s"$sfDir/events.parquet"), {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/events.parquet")
      import org.apache.spark.sql.types.{LongType, TimestampType}
      raw.schema("ts").dataType match {
        case LongType => raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
        case TimestampType => raw
        case _ => raw.withColumn("ts", col("ts").cast(TimestampType))
      }
    })

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
