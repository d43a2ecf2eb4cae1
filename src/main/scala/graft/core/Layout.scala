package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed storage layout for the big fact tables — the Spark-native
  * replacement for the reference's B-tree indexes on join keys
  * (haf_plug_play/plugs/podping/tables.sql:25-35 indexes every lookup
  * column; a distributed engine instead pre-partitions DATA LAYOUT so
  * the hot joins need no runtime exchange).
  *
  * A table written `bucketBy(n, key).sortBy(key)` carries its hash
  * partitioning and sort order in the catalog: a join of two tables
  * bucketed on their join key with matching bucket counts plans as a
  * sort-merge join with NO Exchange and NO Sort on either side — at
  * 100 TB that deletes the two largest shuffles of every
  * orderkey-family query (q3/j2 shapes), paid once at write time and
  * amortized over every query against the layout.
  *
  * Spark reads bucket metadata from the CATALOG, not the files, so a
  * fresh session must [[register]] an existing layout before reading
  * it ([[bucketed]] does both). The files themselves are plain parquet.
  */
object Layout {

  /** Layout FORMAT version, recorded in every manifest and required to
    * match at read time: a layout written by an older engine (fewer
    * derived columns, different encoding) must trigger a rebuild, never
    * silently answer with the old physical shape. Bump on any change to
    * what [[writeBucketed]]/[[accelerate]] put on disk.
    *   v2: unscaled-long money columns ([[accelerate]]).
    */
  val version = 2

  /** Money columns materialized as exact unscaled longs at layout-write
    * time: `<name>_u2` = `unscaled(cast(<name> AS decimal(p, 2)))`,
    * computed by the SAME Catalyst cast the queries apply per row — so a
    * query reading the derived column is bit-identical to one casting
    * the double, by construction, while skipping the per-row
    * double→BigDecimal HALF_UP conversion that dominates the TPC-H
    * aggregate scans (the q1 "decode floor": 4 casts × 60M rows at the
    * 10x tier). The precision matches each query's cast exactly
    * (dec(4,2) for the rate columns nulls on |x| ≥ 100 where dec(18,2)
    * would not — same null arm as the query it replaces). This is the
    * ingest-time-compute trade every columnar warehouse makes (cf.
    * materialized virtual columns); the flat-parquet path — the
    * correctness gate and its DuckDB oracle — never sees these columns.
    */
  val unscaledCols: Map[String, Seq[(String, Int)]] = Map(
    "lineitem" -> Seq("l_quantity" -> 18, "l_extendedprice" -> 18,
      "l_discount" -> 4, "l_tax" -> 4),
    "orders" -> Seq("o_totalprice" -> 18))

  /** `df` plus the [[unscaledCols]] derived columns for `table` (pass
    * the LOGICAL table name, e.g. "lineitem"). Identity for tables with
    * no derived columns.
    */
  def accelerate(df: DataFrame, table: String): DataFrame =
    unscaledCols.getOrElse(table, Seq.empty).foldLeft(df) {
      case (d, (name, p)) =>
        d.withColumn(s"${name}_u2", org.apache.spark.sql.GraftBridge.unscaled(
          org.apache.spark.sql.functions.col(name)
            .cast(org.apache.spark.sql.types.DecimalType(p, 2))))
    }

  /** Write `df` as a bucketed, per-bucket-sorted external table at
    * `path`, registered as `table` in the session catalog. One-time
    * layout cost: a full shuffle of `df` into `buckets` output tasks.
    */
  /** Identity of a layout's SOURCE data (size + mtime, recursive for
    * directories): recorded in the manifest at write time and validated
    * at redirect time, so a layout built from since-regenerated source
    * files can never silently answer for the new data — the staleness
    * class every derived-artifact cache has to close.
    */
  def fingerprint(src: java.io.File): String = {
    def walk(f: java.io.File): (Long, Long) =
      if (f.isDirectory)
        Option(f.listFiles()).toSeq.flatten
          .filterNot(_.getName.startsWith("_layout"))
          .map(walk).foldLeft((0L, 0L)) {
            case ((sz, mt), (s2, m2)) => (sz + s2, math.max(mt, m2)) }
      else (f.length, f.lastModified)
    val (sz, mt) = walk(src)
    s"$sz:$mt"
  }

  def writeBucketed(df: DataFrame, table: String, rawPath: String,
                    key: String, buckets: Int,
                    srcFingerprint: Option[String] = None): Unit = {
    val spark = df.sparkSession
    // a relative location would silently resolve under the session
    // warehouse dir (and diverge from the manifest path below)
    val path = new java.io.File(rawPath).getAbsolutePath
    // REBUILD case (stale fingerprint or a pre-[[version]] layout): CTAS
    // refuses a non-empty location, so clear it — but only a directory
    // that is provably a layout of ours (a _layout.json that PARSES as
    // one — a stray foreign file of that name doesn't license deleting
    // someone's data), an interrupted build (our _layout.building
    // marker), or nothing but Spark write debris; anything else is
    // someone's data and aborting is the right failure.
    val dir = new java.io.File(path)
    if (dir.exists()) {
      val contents = Option(dir.listFiles()).toSeq.flatten
      // an unreadable/unparseable manifest (a directory named
      // _layout.json, permissions) is NOT ours — fall through to the
      // refusal below instead of escaping as a raw IOException
      val isLayout = contents.find(_.getName == "_layout.json").exists { f =>
        scala.util.Try {
          val m = new String(java.nio.file.Files.readAllBytes(f.toPath),
            java.nio.charset.StandardCharsets.UTF_8)
          Seq("\"v\":(\\d+)", "\"key\":\"[^\"]+\"", "\"buckets\":(\\d+)")
            .forall(_.r.findFirstIn(m).isDefined)
        }.getOrElse(false)
      }
      val isInterrupted =
        java.nio.file.Files.exists(java.nio.file.Paths.get(path + ".building"))
      def isDebris(n: String): Boolean =
        n == "_SUCCESS" || n == "_temporary" || n.startsWith("part-") ||
          n.endsWith(".crc") || n.startsWith("_started_") ||
          n.startsWith("_committed_")
      // _SUCCESS + part-* with no _temporary is exactly the shape of a
      // COMMITTED foreign df.write.parquet() dataset — someone's data,
      // not write debris; only our own manifest or .building marker
      // licenses clearing that shape
      val committedForeign =
        contents.exists(_.getName == "_SUCCESS") &&
          contents.exists(_.getName.startsWith("part-")) &&
          !contents.exists(_.getName == "_temporary")
      require(isLayout || isInterrupted ||
        (contents.forall(f => isDebris(f.getName)) && !committedForeign),
        s"refusing to clear non-layout directory $path")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(rm)
        f.delete()
      }
      contents.foreach(rm)
    }
    // build-started marker (a SIBLING of the location — CTAS refuses a
    // non-empty directory): a crash between here and the manifest write
    // leaves the marker behind, so the next build recognizes the debris
    // as an interrupted layout and clears it instead of aborting
    val buildingMarker = java.nio.file.Paths.get(path + ".building")
    Option(buildingMarker.getParent)
      .foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.write(buildingMarker, Array.emptyByteArray)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // repartition by the bucket key FIRST, with the bucket count:
    // repartition's HashPartitioning uses the same murmur3-pmod hash as
    // the bucket spec, so each write task holds exactly one bucket's rows
    // and every bucket lands in ONE file — the condition under which
    // Spark's scan reports the per-bucket sort order and the downstream
    // SMJ elides its Sort nodes as well as the Exchange (a multi-file
    // bucket only guarantees order within each file, so the scan must
    // re-sort). Costs one shuffle at write time, which the layout pays
    // anyway in spirit: this IS the exchange every future join skips.
    df.repartition(buckets, org.apache.spark.sql.functions.col(key))
      .write
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("path", path)
      .format("parquet")
      .saveAsTable(table)
    // self-describing layout: a later session re-registers from the
    // manifest instead of trusting a caller to repeat the bucket spec
    val esc = df.schema.toDDL.replace("\\", "\\\\").replace("\"", "\\\"")
    val fp = srcFingerprint.map(f => s""","src":"$f"""").getOrElse("")
    val manifest = s"""{"v":$version,"key":"$key","buckets":$buckets$fp,"schema":"$esc"}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path, "_layout.json"),
      manifest.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.deleteIfExists(buildingMarker)
  }

  /** Register-and-read a layout directory written by [[writeBucketed]],
    * taking the bucket spec from its `_layout.json` manifest. None when
    * the directory holds no committed layout, or when
    * `expectSrcFingerprint` is supplied and does not match the
    * manifest's recorded source identity (regenerated source data —
    * the layout is STALE and must not answer; mismatch also covers a
    * manifest written without a fingerprint).
    */
  def bucketedFromManifest(spark: SparkSession, table: String,
                           path: String,
                           expectSrcFingerprint: Option[String] = None)
      : Option[DataFrame] = {
    val p = java.nio.file.Paths.get(path, "_layout.json")
    val ok = java.nio.file.Files.exists(p) &&
      java.nio.file.Files.exists(java.nio.file.Paths.get(path, "_SUCCESS"))
    if (!ok) None
    else {
      val m = new String(java.nio.file.Files.readAllBytes(p),
        java.nio.charset.StandardCharsets.UTF_8)
      val recorded = "\"src\":\"([^\"]+)\"".r.findFirstMatchIn(m).map(_.group(1))
      // format fence: a pre-[[version]] layout (missing or older "v")
      // is STALE — rebuild, don't answer with the old physical shape
      val vOk = "\"v\":(\\d+)".r.findFirstMatchIn(m)
        .exists(_.group(1).toInt == version)
      if (!vOk) None
      else if (expectSrcFingerprint.isDefined && recorded != expectSrcFingerprint) None
      else {
        if (!spark.catalog.tableExists(table)) {
          // tiny fixed-shape manifest; extract the fields directly
          val key = "\"key\":\"([^\"]+)\"".r.findFirstMatchIn(m).get.group(1)
          val buckets = "\"buckets\":(\\d+)".r.findFirstMatchIn(m).get.group(1).toInt
          val schema = "\"schema\":\"(.*)\"\\}\\s*$".r.findFirstMatchIn(m).get.group(1)
            .replace("\\\"", "\"").replace("\\\\", "\\")
          register(spark, table, path, key, buckets, schema)
        }
        Some(spark.table(table))
      }
    }
  }

  /** Register an existing bucketed layout (written by [[writeBucketed]],
    * possibly in another session) in this session's catalog. The bucket
    * spec (`key`, `buckets`) must match what was written — Spark trusts
    * the catalog, so a wrong spec here would produce WRONG joins, same
    * as any external-catalog system.
    */
  def register(spark: SparkSession, table: String, rawPath: String,
               key: String, buckets: Int, schemaDdl: String): Unit = {
    val path = new java.io.File(rawPath).getAbsolutePath
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(
      s"""CREATE TABLE $table ($schemaDdl)
         |USING PARQUET
         |CLUSTERED BY ($key) SORTED BY ($key) INTO $buckets BUCKETS
         |LOCATION '$path'""".stripMargin)
  }

  /** The bucketed table as a DataFrame, registering it first when the
    * catalog doesn't know it yet. `schemaOf` supplies the DDL on first
    * registration (derived from the source table's schema).
    */
  def bucketed(spark: SparkSession, table: String, path: String,
               key: String, buckets: Int, schemaOf: => DataFrame): DataFrame = {
    if (!spark.catalog.tableExists(table))
      register(spark, table, path, key, buckets, schemaOf.schema.toDDL)
    spark.table(table)
  }
}
