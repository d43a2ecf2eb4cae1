package graft

import graft.core.GraftSession
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // Optional 3rd arg: comma-separated query names — dev-loop filter only;
    // the driver always runs the full dump with 2 args.
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(',').toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Known non-actionable warning classes are scoped out in the
    // classpath log4j2.properties (see its header) — programmatic
    // Configurator calls don't survive Spark's own log4j init.
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // The per-gate CacheScope.release() below unpersists each gate's
    // eager localCheckpoint once its parquet write has committed; the RDD
    // layer WARNs "locally checkpointed ... cannot be recomputed" on
    // every such unpersist. That is this tool's INTENDED lifecycle (the
    // data is already durable in outDir; nothing recomputes it), and ~100
    // copies of the warning bury real driver-log warnings. Suppress by
    // MESSAGE, not by logger level — a level cut on MapPartitionsRDD
    // would also hide its genuine warnings (lost-block recomputes etc.).
    locally {
      val ctx = org.apache.logging.log4j.LogManager.getContext(false)
        .asInstanceOf[org.apache.logging.log4j.core.LoggerContext]
      ctx.getConfiguration.getRootLogger.addFilter(
        org.apache.logging.log4j.core.filter.RegexFilter.createFilter(
          ".*was locally checkpointed, its lineage has been truncated.*",
          null, false,
          org.apache.logging.log4j.core.Filter.Result.DENY,
          org.apache.logging.log4j.core.Filter.Result.NEUTRAL))
      ctx.updateLoggers()
    }
    // Environment-noise one-liners with no in-repo remedy, scoped OUT so
    // the driver log is pure signal: native-hadoop and netlib-BLAS
    // native acceleration are absent from this container (both fall back
    // to the JVM implementations — a deployment with native libs loses
    // nothing by silencing the advisory here), and the plan-string
    // truncation notice only reflects spark.sql.debug.maxToStringFields
    // on the dump's widest plan.
    // plan-string truncation notice scales with the dump's widest plan
    spark.conf.set("spark.sql.debug.maxToStringFields", "200")
    GraftSession.configure(spark)
    // Dev knob: dump through a bucketed layout (core.Layout) instead of
    // the flat parquet — proves the layout path zero-diff against the
    // SAME flat-reading DuckDB oracle. The driver's gate never sets this.
    sys.env.get("SPARK_GRAFT_LAYOUT_DIR").foreach { dir =>
      spark.conf.set("spark.graft.layout.dir", dir)
      spark.conf.set("spark.graft.layout.src", sfDir)
      GraftSession.addOverrides(spark,
        Map("spark.graft.layout.dir" -> dir, "spark.graft.layout.src" -> sfDir))
    }
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      // localCheckpoint BEFORE coalesce(1): coalesce is shuffle-free, so
      // without the checkpoint the single-file write folds the WHOLE
      // upstream pipeline into one task (invisible at the driver's
      // sf0.01, a single-core grind at the sf10 stress tier). The eager
      // checkpoint computes with full parallelism; coalesce then just
      // concatenates the stored partitions in index order, preserving
      // any ORDER BY exactly like the direct coalesce did.
      // Registered with CacheScope so the per-query release() below frees
      // the checkpoint's MEMORY_AND_DISK blocks once the write commits —
      // without that, ~100 fully-materialized results accumulate across
      // the sweep and evict/OOM executor storage at the larger tiers.
      try {
        val ck = graft.core.CacheScope.register(
          fn(spark, sfDir).localCheckpoint(true))
        ck.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      finally graft.core.CacheScope.release()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Static oracles + per-dataset ones (trained-structure literals,
    // e.g. the IVF centroid matrix) generated from the same memoized
    // indexes the dumped queries ran on. A dynamic-oracle failure must
    // degrade THAT query to rows-only, never lose the whole dump — every
    // other gate's oracle rides in this file.
    val dynamic =
      try SparkEntry.dynamicOracleSql(spark, sfDir)
      catch { case e: Throwable =>
        System.err.println(s"[verify] dynamic oracle generation failed: ${e.getMessage}")
        Map.empty[String, String]
      }
    val json = (SparkEntry.oracleSql ++ dynamic)
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
