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

  /** Tables eligible for a bucketed layout redirect: the SF-proportional
    * fact tables of the orderkey join family. Dimensions don't benefit
    * (they broadcast) and events/documents/embeddings have no hot
    * equi-join key worth a layout.
    */
  private val layoutTables = Set("lineitem", "orders")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    name match {
      case "events" => events(spark, sfDir)
      case other =>
        bucketedLayout(spark, sfDir, name).getOrElse(
          resolved.getOrElseUpdate((spark, s"$sfDir/$other.parquet"),
            spark.read.parquet(s"$sfDir/$other.parquet")))
    }

  /** The bucketed layout of `name` when the session opted in by setting
    * `spark.graft.layout.dir` to a directory of [[Layout.writeBucketed]]
    * outputs (one `b_<table>` child per table, self-describing via
    * `_layout.json`) and `spark.graft.layout.src` to the sfDir the layout
    * was BUILT FROM — reads of any other sfDir in the same session keep
    * the flat parquet (a layout must never answer for data it wasn't
    * built from). Opt-IN and per-session by design: the driver's
    * correctness gate reads the flat parquet exactly like its DuckDB
    * oracle, while the bench session points here after a one-time layout
    * build — the same ingest-time indexing discipline as the reference's
    * B-trees (plugs/podping/tables.sql:25-35). The catalog table name
    * carries a path hash so two layouts never collide in one session.
    */
  private def bucketedLayout(spark: SparkSession, sfDir: String,
                             name: String): Option[DataFrame] =
    if (!layoutTables.contains(name)) None
    else spark.conf.getOption("spark.graft.layout.dir").flatMap { dir =>
      val srcOk = spark.conf.getOption("spark.graft.layout.src").exists(src =>
        java.nio.file.Paths.get(src).toAbsolutePath.normalize ==
          java.nio.file.Paths.get(sfDir).toAbsolutePath.normalize)
      if (!srcOk) None
      else {
        val path = s"$dir/b_$name"
        val table = s"b_${name}_${Integer.toHexString(path.hashCode).takeRight(8)}"
        resolved.get((spark, path)).orElse {
          // staleness fence: the layout only answers if its recorded
          // source fingerprint matches the flat file AS IT IS NOW — a
          // regenerated tier silently falls back to flat reads
          val fp = Layout.fingerprint(new java.io.File(s"$sfDir/$name.parquet"))
          val df = Layout.bucketedFromManifest(spark, table, path, Some(fp))
          df.foreach(resolved.put((spark, path), _))
          df
        }
      }
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
    *
    * Dispatch is STRICT: the LongType branch only fires when the parquet
    * footer's logical annotation actually says TIMESTAMP(NANOS) (a future
    * generation storing plain INT64 epoch-micros/millis would otherwise be
    * silently scaled 1000x wrong), the cast branch only fires for
    * TIMESTAMP_NTZ, and any other encoding throws instead of being
    * coerced to nulls by a permissive cast.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    resolved.getOrElseUpdate((spark, s"$sfDir/events.parquet"), {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val path = s"$sfDir/events.parquet"
      val raw = spark.read.parquet(path)
      import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
      raw.schema("ts").dataType match {
        case LongType if tsAnnotationIsNanos(spark, path) =>
          raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
        case TimestampType => raw
        case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
        case other =>
          throw new IllegalStateException(
            s"events.ts at $path has unsupported encoding $other " +
              "(footer annotation: " + tsAnnotation(spark, path).getOrElse("none") + "); " +
              "known encodings are TIMESTAMP(NANOS), TIMESTAMP(MICROS,NTZ), TIMESTAMP(MICROS,UTC). " +
              "Refusing to guess a scale factor — extend Tables.events deliberately.")
      }
    })

  /** Parquet footer logical-type annotation of the `ts` column in the first
    * footer under `path` (file or directory) — one footer read, no data scan.
    */
  private def tsAnnotation(spark: SparkSession, path: String): Option[String] = {
    import org.apache.hadoop.fs.{FileSystem, Path => HPath}
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = spark.sessionState.newHadoopConf()
    val p = new HPath(path)
    val fs = FileSystem.get(p.toUri, conf)
    val first =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).iterator
          .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
          .toSeq.sortBy(_.getPath.getName).headOption.map(_.getPath)
      else Some(p)
    first.flatMap { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      try {
        val schema = reader.getFooter.getFileMetaData.getSchema
        Option(schema.getType(Seq("ts"): _*).asPrimitiveType().getLogicalTypeAnnotation)
          .map(_.toString)
      } finally reader.close()
    }
  }

  private def tsAnnotationIsNanos(spark: SparkSession, path: String): Boolean =
    tsAnnotation(spark, path).exists { ann =>
      val isNanos = ann.contains("NANOS")
      if (!isNanos) throw new IllegalStateException(
        s"events.ts at $path reads as INT64 but the footer annotation is $ann, " +
          "not TIMESTAMP(NANOS) — refusing to apply the nanos->micros truncation " +
          "to a value of unknown scale. Extend Tables.events deliberately.")
      isNanos
    }

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
