package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat

/** Exact row counts without a cluster job when the plan allows it.
  *
  * Operators that SIZE themselves from the corpus row count (SemDeDup's
  * sqrt-n cluster count, IVF's sqrt-n cell count) need `n` before they can
  * build their plan — an eager `df.count()` at plan-construction time.
  * When the input is a bare unfiltered parquet scan (the normal case: a
  * curated corpus read straight from storage), that count is already
  * sitting in the parquet footers; launching a scan job for it costs a
  * full job-launch round trip (~0.2 s locally, a scheduler round trip on
  * a cluster) to learn a number the metadata states outright.
  *
  * [[of]] reads the footers driver-side in that case and falls back to
  * `df.count()` for any plan with filters/joins/aggregates (where footer
  * counts would be WRONG, not just slow). Footer reads are capped at
  * [[maxFooterFiles]] files — beyond that the serial driver-side footer
  * walk loses to one parallel metadata-only scan job, and a table that
  * big should carry catalog statistics anyway.
  */
object RowCounts {

  private val maxFooterFiles = 256

  /** Parsed-footer memo, keyed by (path, length, modification time) — the
    * same invalidation rule Spark's own file-status caches use: a
    * rewritten file changes length or mtime and misses. Footer METADATA
    * only (a few KB per file), never data or results: every consumer
    * still derives its answer from the current file set per call, this
    * just stops a query that sizes itself from footers from re-parsing
    * the identical bytes on every plan construction (a 32-file bucketed
    * table costs 64 footer opens per [[columnRange]] call otherwise —
    * pure driver latency on the query path). Bounded: cleared wholesale
    * past [[maxFooterCacheEntries]] (footers of live tables are re-read
    * on the next call; correctness is untouched).
    */
  private val maxFooterCacheEntries = 4096
  private val footerCache = scala.collection.concurrent.TrieMap[
    (String, Long, Long), org.apache.parquet.hadoop.metadata.ParquetMetadata]()

  private def footerOf(f: String, conf: org.apache.hadoop.conf.Configuration)
      : org.apache.parquet.hadoop.metadata.ParquetMetadata = {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val p = new Path(f)
    val st = p.getFileSystem(conf).getFileStatus(p)
    if (footerCache.size > maxFooterCacheEntries) footerCache.clear()
    footerCache.getOrElseUpdate((f, st.getLen, st.getModificationTime), {
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
      try r.getFooter finally r.close()
    })
  }

  /** Exact row count of `df`: parquet footer metadata when the optimized
    * plan is a bare (possibly column-pruned) parquet scan, else
    * `df.count()`. Parsed footers are memoized per (path, length, mtime) —
    * the same invalidation rule Spark's own file-status cache uses — so a
    * rewritten table is re-read as soon as its length or mtime changes.
    * Granularity caveat: a file rewritten with an IDENTICAL byte length
    * within one mtime tick (filesystem timestamp resolution) would be
    * served the memoized footer; no engine path rewrites tables in place
    * like that (layout builds write fresh directories), and the entry
    * falls out on the next wholesale clear.
    */
  def of(df: DataFrame): Long =
    bareParquetRelation(df.queryExecution.optimizedPlan)
      .flatMap(footerCount(_, df)).getOrElse(df.count())

  /** UPPER BOUND on `df`'s row count with ZERO jobs, or None when no
    * bound is derivable. Walks the optimized plan through row-count-
    * preserving (Project) and row-count-REDUCING (Filter) operators down
    * to a parquet scan (footer count) or a local relation (in-memory
    * size); anything else — joins, generates, unions, opaque sources —
    * yields None. For sizing decisions of the form "is this input small
    * enough to skip scale machinery", an upper bound is the safe
    * direction: a filtered scan may be far smaller, never bigger.
    */
  def upperBound(df: DataFrame): Option[Long] =
    bound(df.queryExecution.optimizedPlan, df)

  private def bound(plan: LogicalPlan, df: DataFrame): Option[Long] = plan match {
    case p: Project => bound(p.child, df) // projections are 1:1
    case f: Filter => bound(f.child, df) // filters only shrink
    case l: LocalRelation => Some(l.data.length.toLong)
    case lr: LogicalRelation =>
      lr.relation match {
        case rel: HadoopFsRelation if rel.fileFormat.isInstanceOf[ParquetFileFormat] =>
          footerCount(rel, df)
        case _ => None
      }
    case _ => None
  }

  private def footerCount(rel: HadoopFsRelation, df: DataFrame): Option[Long] = {
    val files = rel.location.inputFiles
    if (files.isEmpty || files.length > maxFooterFiles) None
    else {
      import scala.jdk.CollectionConverters._
      val conf = df.sparkSession.sessionState.newHadoopConf()
      try Some(files.iterator.map { f =>
        footerOf(f, conf).getBlocks.asScala.iterator.map(_.getRowCount).sum
      }.sum)
      catch { case scala.util.control.NonFatal(_) => None } // unreadable footer -> scan job
    }
  }

  /** ZERO-JOB upper bound on |values| of a top-level numeric column, from
    * parquet footer column statistics (min/max per row group). Walks the
    * optimized plan through value-preserving operators: Project (the
    * named column must pass through as a bare attribute — possibly
    * renamed — never a computed expression) and Filter (removing rows can
    * only shrink the max). None when the plan is opaque, any file/chunk
    * lacks trustworthy stats, or a bound is non-finite (parquet double
    * stats omit NaN — a NaN casts to decimal null and never reaches a
    * sum, but an Infinity lands in the stats and correctly yields an
    * unbounded answer).
    *
    * This is the footer half of the exact-sum long dispatch (see
    * [[graft.functions.ExactSum]]): max|v| x rowCount < 2^63 proves a
    * plain long sum of unscaled decimals can never wrap.
    */
  def columnAbsBound(df: DataFrame, column: String): Option[Double] =
    absBound(df.queryExecution.optimizedPlan, column, df)

  private def absBound(plan: LogicalPlan, column: String, df: DataFrame): Option[Double] =
    plan match {
      case p: Project =>
        // follow the named output to the child attribute it renames; a
        // computed expression disqualifies (its values are not the file's)
        p.projectList.find(_.name == column).flatMap {
          case a: AttributeReference => absBound(p.child, a.name, df)
          case al: org.apache.spark.sql.catalyst.expressions.Alias =>
            al.child match {
              case a: AttributeReference => absBound(p.child, a.name, df)
              case _ => None
            }
          case _ => None
        }
      case f: Filter => absBound(f.child, column, df)
      case lr: LogicalRelation =>
        lr.relation match {
          case rel: HadoopFsRelation if rel.fileFormat.isInstanceOf[ParquetFileFormat] =>
            footerAbsBound(rel, column, df)
          case _ => None
        }
      case _ => None
    }

  private def footerAbsBound(rel: HadoopFsRelation, column: String,
                             df: DataFrame): Option[Double] = {
    val files = rel.location.inputFiles
    if (files.isEmpty || files.length > maxFooterFiles) None
    else {
      import scala.jdk.CollectionConverters._
      val conf = df.sparkSession.sessionState.newHadoopConf()
      try {
        val bounds = files.iterator.flatMap { f =>
          footerOf(f, conf).getBlocks.asScala.iterator.map { block =>
            block.getColumns.asScala
              .find(_.getPath.toDotString == column)
              .flatMap(chunkAbsBound)
          }.toVector
        }.toVector
        // every row group must state a trustworthy bound; all-null chunks
        // contribute 0 (handled in chunkAbsBound)
        if (bounds.exists(_.isEmpty)) None
        else {
          val m = bounds.flatten.foldLeft(0.0)(math.max)
          if (java.lang.Double.isFinite(m)) Some(m) else None
        }
      } catch { case scala.util.control.NonFatal(_) => None }
    }
  }

  /** ZERO-JOB (min, max) of a numeric column from parquet footer
    * statistics — same plan walk and trust rules as [[columnAbsBound]].
    * None when any chunk lacks trustworthy stats or the plan is opaque.
    * All-null chunks contribute nothing; an all-null COLUMN yields None.
    */
  def columnRange(df: DataFrame, column: String): Option[(Double, Double)] = {
    columnAbsBound(df, column) match {
      case None => None
      case Some(_) =>
        // bounded-abs proof succeeded; re-walk for the signed range
        rangeBound(df.queryExecution.optimizedPlan, column, df)
    }
  }

  private def rangeBound(plan: LogicalPlan, column: String,
                         df: DataFrame): Option[(Double, Double)] = plan match {
    case p: Project =>
      p.projectList.find(_.name == column).flatMap {
        case a: AttributeReference => rangeBound(p.child, a.name, df)
        case al: org.apache.spark.sql.catalyst.expressions.Alias =>
          al.child match {
            case a: AttributeReference => rangeBound(p.child, a.name, df)
            case _ => None
          }
        case _ => None
      }
    case f: Filter => rangeBound(f.child, column, df)
    case lr: LogicalRelation =>
      lr.relation match {
        case rel: HadoopFsRelation if rel.fileFormat.isInstanceOf[ParquetFileFormat] =>
          footerRange(rel, column, df)
        case _ => None
      }
    case _ => None
  }

  private def footerRange(rel: HadoopFsRelation, column: String,
                          df: DataFrame): Option[(Double, Double)] = {
    val files = rel.location.inputFiles
    if (files.isEmpty || files.length > maxFooterFiles) None
    else {
      import scala.jdk.CollectionConverters._
      val conf = df.sparkSession.sessionState.newHadoopConf()
      try {
        var mn = Double.PositiveInfinity
        var mx = Double.NegativeInfinity
        var any = false
        files.foreach { f =>
          footerOf(f, conf).getBlocks.asScala.foreach { block =>
            block.getColumns.asScala
              .find(_.getPath.toDotString == column)
              .foreach { c =>
                val s = c.getStatistics
                if (s != null && !s.isEmpty && s.hasNonNullValue) {
                  val (lo, hi) = s match {
                    case d: org.apache.parquet.column.statistics.DoubleStatistics =>
                      (d.getMin, d.getMax)
                    case fl: org.apache.parquet.column.statistics.FloatStatistics =>
                      (fl.getMin.toDouble, fl.getMax.toDouble)
                    case l: org.apache.parquet.column.statistics.LongStatistics =>
                      (l.getMin.toDouble, l.getMax.toDouble)
                    case i: org.apache.parquet.column.statistics.IntStatistics =>
                      (i.getMin.toDouble, i.getMax.toDouble)
                    case _ => (Double.NaN, Double.NaN)
                  }
                  if (!lo.isNaN) { mn = math.min(mn, lo); mx = math.max(mx, hi); any = true }
                }
              }
          }
        }
        if (any && java.lang.Double.isFinite(mn) && java.lang.Double.isFinite(mx))
          Some((mn, mx))
        else None
      } catch { case scala.util.control.NonFatal(_) => None }
    }
  }

  /** ZERO-JOB upper bound on the total UNCOMPRESSED bytes of one column,
    * from parquet footer chunk metadata — same plan walk as
    * [[columnAbsBound]] (Project pass-through, Filter only shrinks).
    * Unlike row counts, bytes bound VOCABULARY-type blowups: a corpus's
    * distinct-term dictionary can never serialize bigger than the text
    * it was tokenized from (every distinct term occurs in the text), so
    * a byte gate holds even for corpora of few-but-huge or high-entropy
    * documents where a document-count gate is vacuous.
    */
  def columnUncompressedBytes(df: DataFrame, column: String): Option[Long] =
    bytesBound(df.queryExecution.optimizedPlan, column, df)

  private def bytesBound(plan: LogicalPlan, column: String, df: DataFrame): Option[Long] =
    plan match {
      case p: Project =>
        p.projectList.find(_.name == column).flatMap {
          case a: AttributeReference => bytesBound(p.child, a.name, df)
          case al: org.apache.spark.sql.catalyst.expressions.Alias =>
            al.child match {
              case a: AttributeReference => bytesBound(p.child, a.name, df)
              case _ => None
            }
          case _ => None
        }
      case f: Filter => bytesBound(f.child, column, df)
      case lr: LogicalRelation =>
        lr.relation match {
          case rel: HadoopFsRelation if rel.fileFormat.isInstanceOf[ParquetFileFormat] =>
            footerBytes(rel, column, df)
          case _ => None
        }
      case _ => None
    }

  private def footerBytes(rel: HadoopFsRelation, column: String,
                          df: DataFrame): Option[Long] = {
    val files = rel.location.inputFiles
    if (files.isEmpty || files.length > maxFooterFiles) None
    else {
      import scala.jdk.CollectionConverters._
      val conf = df.sparkSession.sessionState.newHadoopConf()
      try {
        var total = 0L
        var found = false
        files.foreach { f =>
          footerOf(f, conf).getBlocks.asScala.foreach { block =>
            block.getColumns.asScala
              .find(_.getPath.toDotString == column)
              .foreach { c => total += c.getTotalUncompressedSize; found = true }
          }
        }
        if (found) Some(total) else None
      } catch { case scala.util.control.NonFatal(_) => None }
    }
  }

  /** max(|min|, |max|) of one column chunk's statistics; 0 for an all-null
    * chunk; None when stats are absent or of an unhandled physical type.
    */
  private def chunkAbsBound(
      c: org.apache.parquet.hadoop.metadata.ColumnChunkMetaData): Option[Double] = {
    val s = c.getStatistics
    if (s == null || s.isEmpty) None
    else if (!s.hasNonNullValue) Some(0.0)
    else s match {
      case d: org.apache.parquet.column.statistics.DoubleStatistics =>
        Some(math.max(math.abs(d.getMin), math.abs(d.getMax)))
      case f: org.apache.parquet.column.statistics.FloatStatistics =>
        Some(math.max(math.abs(f.getMin.toDouble), math.abs(f.getMax.toDouble)))
      // long -> double rounds to NEAREST and can understate by an ulp
      // beyond 2^53; nextUp keeps this an upper bound (ints are exact)
      case l: org.apache.parquet.column.statistics.LongStatistics =>
        Some(Math.nextUp(math.max(math.abs(l.getMin.toDouble),
          math.abs(l.getMax.toDouble))))
      case i: org.apache.parquet.column.statistics.IntStatistics =>
        Some(math.max(math.abs(i.getMin.toDouble), math.abs(i.getMax.toDouble)))
      case _ => None
    }
  }

  /** The HadoopFsRelation when the plan is exactly a parquet scan with no
    * row-changing operator above it. Attribute-only projections are
    * row-count-neutral and stripped; ANYTHING else (Filter, Join, ...)
    * disqualifies — correctness over cleverness.
    */
  private def bareParquetRelation(plan: LogicalPlan): Option[HadoopFsRelation] =
    plan match {
      case Project(exprs, child) if exprs.forall(_.isInstanceOf[AttributeReference]) =>
        bareParquetRelation(child)
      case lr: LogicalRelation =>
        lr.relation match {
          case rel: HadoopFsRelation if rel.fileFormat.isInstanceOf[ParquetFileFormat] =>
            Some(rel)
          case _ => None
        }
      case _ => None
    }
}
